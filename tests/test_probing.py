"""E8 probing-task evaluation: closed-form probe replay + id-keyed cache
contract (reference scripts/probing_task_evaluation.py:103-249)."""

import hashlib
import math
import os

import numpy as np
import pytest

from relex_spark.plans.probing import (
    PROBE_TASKS,
    RIDGE_LAMBDA,
    cached_representations,
    probe_direction,
    probe_scores,
    probing_task_labels,
    run_probing_evaluation,
)


def _fixture_candidates(spark):
    from relex_spark.sources.readers import (
        read_semeval_jsonl,
        semeval_to_candidates,
    )

    path = os.path.join(
        os.path.dirname(__file__), "..", "relex_spark", "data",
        "semeval_fixture.jsonl",
    )
    return semeval_to_candidates(read_semeval_jsonl(spark, path), max_len=100)


def _weights_bc(spark):
    from relex_spark.plans.kg_pipeline import KGPipelineConfig
    from relex_spark.scoring.scorer import broadcast_weights

    return broadcast_weights(spark, KGPipelineConfig().resolved_weights())


def test_probe_direction_is_seeded_and_replayable():
    d = probe_direction("length", 1, 64)
    assert len(d) == 64 and set(d) <= {-1, 0, 1}
    assert d == probe_direction("length", 1, 64)
    assert d != probe_direction("length", 2, 64)
    # spec replay: component j = md5("probe:<task>:<dir>:<j>")[0] % 3 - 1
    j = 17
    expect = hashlib.md5(f"probe:length:1:{j}".encode()).digest()[0] % 3 - 1
    assert d[j] == expect


def test_probe_scores_match_pure_python_replay(spark):
    """The full Spark probe (projection fold, milli-unit quantization,
    exact integer sufficient statistics, ridge closed form, R² from the
    sums) must equal an independent pure-Python replay over per-row kernel
    representations — any SQL-side slip in the fold order, the rounding,
    or the closed form breaks equality."""
    from relex_spark.scoring.kernels import forward_batch

    cands = _fixture_candidates(spark)
    wbc = _weights_bc(spark)
    w = wbc.value
    out = {
        (r["task"], r["direction"]): r
        for r in run_probing_evaluation(spark, cands, wbc).collect()
    }

    rows = cands.collect()
    ids_list = [w.token_ids(list(r["tokens"])) for r in rows]
    heads = np.array([[r["head_start"], r["head_end"]] for r in rows])
    tails = np.array([[r["tail_start"], r["tail_end"]] for r in rows])
    _, _, enc = forward_batch(w, ids_list, heads, tails, return_enc=True)
    dim = enc.shape[1]

    y_by_task = {
        "length": [len(r["tokens"]) for r in rows],
        "entity_distance": [
            max(
                max(r["head_start"], r["tail_start"])
                - min(r["head_end"], r["tail_end"])
                - 1,
                0,
            )
            for r in rows
        ],
        "argument_order": [
            int(r["head_start"] <= r["tail_start"]) for r in rows
        ],
    }
    assert set(PROBE_TASKS) == set(y_by_task)

    for task in PROBE_TASKS:
        for d in range(3):
            vec = np.array(probe_direction(task, d, dim), dtype=np.float64)
            xs = [
                int(math.floor(
                    # replay the JVM fold: sequential left-to-right sum
                    sum(float(a) * float(b) for a, b in zip(row, vec)) * 1000.0
                    + 0.5
                ))
                for row in enc.astype(np.float64)
            ]
            ys = y_by_task[task]
            n = len(xs)
            sx, sy = sum(xs), sum(ys)
            sxx = sum(x * x for x in xs)
            sxy = sum(x * y for x, y in zip(xs, ys))
            syy = sum(y * y for y in ys)
            num = n * sxy - sx * sy
            den = n * sxx - sx * sx + n * RIDGE_LAMBDA
            b = num / den
            a = (sy - b * sx) / n
            ss_res = (
                syy - 2.0 * a * sy - 2.0 * b * sxy
                + n * a * a + 2.0 * a * b * sx + b * b * sxx
            )
            ss_tot = syy - sy * sy / n
            r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
            got = out[(task, d)]
            assert got["n"] == n
            assert got["slope_num"] == num, (task, d)
            assert got["slope_den"] == den, (task, d)
            assert got["intercept_u6"] == math.floor(a * 1e6 + 0.5), (task, d)
            assert got["r2_u6"] == math.floor(r2 * 1e6 + 0.5), (task, d)
            assert 0 <= r2 <= 1 + 1e-12


def test_rep_cache_hits_are_not_rescored_and_probe_inputs_identical(spark):
    """Reference cache semantics (probing_task_evaluation.py:127-160): ids
    already cached are NOT re-scored; the probe input (id, embedding) set
    is identical whether every rep was recomputed or half came from the
    cache. Also pins the anti-join plan shape."""
    cands = _fixture_candidates(spark).cache()
    wbc = _weights_bc(spark)

    full = cached_representations(cands, wbc)
    base = {r["id"]: list(r["embedding"]) for r in full.collect()}

    cache_ids = sorted(base)[:5]
    cache_df = spark.createDataFrame(
        [(i, base[i]) for i in cache_ids], "id string, embedding array<float>"
    )
    mixed = cached_representations(cands, wbc, cache=cache_df)
    assert "LeftAnti" in mixed._jdf.queryExecution().toString()
    got = {r["id"]: list(r["embedding"]) for r in mixed.collect()}
    assert got == base

    # a poisoned cache row MUST be believed (proves hits bypass the kernel)
    poison = spark.createDataFrame(
        [(cache_ids[0], [0.0] * len(base[cache_ids[0]]))],
        "id string, embedding array<float>",
    )
    poisoned = {
        r["id"]: list(r["embedding"])
        for r in cached_representations(cands, wbc, cache=poison).collect()
    }
    assert poisoned[cache_ids[0]] == [0.0] * len(base[cache_ids[0]])
    assert all(poisoned[i] == base[i] for i in base if i != cache_ids[0])
    cands.unpersist()


def test_probe_scores_constant_label_is_safe(spark):
    """A constant task label (SStot = 0) must yield slope 0 / r2 0, not a
    divide-by-zero — the fixture's argument_order is all-ones."""
    cands = _fixture_candidates(spark)
    wbc = _weights_bc(spark)
    rows = {
        (r["task"], r["direction"]): r
        for r in run_probing_evaluation(spark, cands, wbc).collect()
    }
    for d in range(3):
        r = rows[("argument_order", d)]
        assert r["slope_num"] == 0 and r["r2_u6"] == 0
        assert r["intercept_u6"] == 1_000_000  # a = mean(y) = 1 exactly


def test_probe_is_invariant_to_duplicated_candidate_ids(spark):
    """Reference semantics: the probe sees each instance once (the cache is
    keyed by id) — duplicating candidate rows must not change any
    sufficient statistic (review finding, r5)."""
    cands = _fixture_candidates(spark)
    wbc = _weights_bc(spark)
    base = {
        (r["task"], r["direction"]): tuple(r)
        for r in run_probing_evaluation(spark, cands, wbc).collect()
    }
    doubled = {
        (r["task"], r["direction"]): tuple(r)
        for r in run_probing_evaluation(
            spark, cands.unionByName(cands), wbc
        ).collect()
    }
    assert doubled == base
