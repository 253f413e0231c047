"""DSIR importance resampling (operators/dsir.py): independent pure-Python
replay of the hash/bucket/LLR/Gumbel math, selection-quality property,
determinism, plan shape, and guards."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from relex_spark.operators.dsir import (
    HASH_SPACE,
    dsir_llr_table,
    dsir_resample,
    dsir_scores,
)


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_grams(text: str) -> list[str]:
    toks = text.split()
    if len(toks) >= 2:
        return [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
    return [" ".join(toks)]


def _py_fit(texts, target_ids, m):
    t_cnt, s_cnt = [0] * m, [0] * m
    for i, txt in texts:
        for g in _py_grams(txt):
            b = _h64(g) % m
            s_cnt[b] += 1
            if i in target_ids:
                t_cnt[b] += 1
    T, S = sum(t_cnt), sum(s_cnt)
    llr = [
        math.floor(
            math.log(((t + 1) * (S + m)) / ((s + 1) * (T + m))) * 1e6 + 0.5
        )
        for t, s in zip(t_cnt, s_cnt)
    ]
    return t_cnt, s_cnt, llr


_CORPUS = [
    (i, ("spark shuffle join " * 4).strip())
    if i % 4 == 0
    else (i, f"row {i} scan filter value table part line order item batch")
    for i in range(40)
]


def test_llr_table_and_scores_match_python_replay(spark):
    m = 128
    docs = spark.createDataFrame(_CORPUS, ["doc_id", "text"])
    target = docs.where(F.col("doc_id") % 4 == 0)
    t_cnt, s_cnt, llr = _py_fit(_CORPUS, set(range(0, 40, 4)), m)

    tab = {
        r["bucket"]: (r["t_cnt"], r["s_cnt"], r["llr_u6"])
        for r in dsir_llr_table(docs, target, m_buckets=m).collect()
    }
    assert len(tab) == m
    for b in range(m):
        assert tab[b] == (t_cnt[b], s_cnt[b], llr[b]), f"bucket {b}"

    expected = {
        i: (
            len(_py_grams(txt)),
            sum(llr[_h64(g) % m] for g in _py_grams(txt)),
        )
        for i, txt in _CORPUS
    }
    got = {
        r["doc_id"]: (r["n_grams"], r["score_u6"])
        for r in dsir_scores(docs, target, m_buckets=m).collect()
    }
    assert got == expected


def test_resample_prefers_target_like_docs_and_replays(spark):
    m = 128
    docs = spark.createDataFrame(_CORPUS, ["doc_id", "text"])
    target = docs.where(F.col("doc_id") % 4 == 0)
    scored = dsir_scores(docs, target, m_buckets=m)
    sel = dsir_resample(scored, k=10, temperature=4).collect()
    assert len(sel) == 10
    picked = [r["doc_id"] for r in sel]
    # target-like docs dominate the selection (10 of 40 are target-like)
    assert sum(1 for i in picked if i % 4 == 0) >= 8

    # independent replay of the Gumbel key for every selected row
    t_cnt, s_cnt, llr = _py_fit(_CORPUS, set(range(0, 40, 4)), m)
    for r in sel:
        txt = dict(_CORPUS)[r["doc_id"]]
        score = sum(llr[_h64(g) % m] for g in _py_grams(txt))
        u = (_h64(f"dsir:{r['doc_id']}") + 0.5) / HASH_SPACE
        g = -math.log(-math.log(u))
        key = math.floor(score / 4.0) + math.floor(g * 1e6 + 0.5)
        assert r["score_u6"] == score and r["key_u6"] == key

    # deterministic across runs and partitionings
    sel2 = dsir_resample(
        dsir_scores(docs.repartition(7), target, m_buckets=m), k=10, temperature=4
    ).collect()
    assert sorted(picked) == sorted(r["doc_id"] for r in sel2)


def test_scores_plan_is_map_only(spark):
    """The 100-TB contract: after the m-row table collect (a bounded
    driver-side finalize), corpus scoring must compile to scan+project —
    no Exchange, no Join in the returned plan."""
    docs = spark.createDataFrame(_CORPUS, ["doc_id", "text"])
    target = docs.where(F.col("doc_id") % 4 == 0)
    plan = (
        dsir_scores(docs, target, m_buckets=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_guards(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        dsir_llr_table(docs, docs, m_buckets=1)
    scored = spark.createDataFrame([(1, 5)], ["doc_id", "score_u6"])
    with pytest.raises(ValueError):
        dsir_resample(scored, k=0)
    with pytest.raises(ValueError):
        dsir_resample(scored, k=1, temperature=0)
