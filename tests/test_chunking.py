"""Sliding-window chunking (operators/chunking.py): window rule golden,
coverage/overlap invariants, edge cases, and the narrow-plan contract."""

import pytest
from pyspark.sql import functions as F

from relex_spark.operators.chunking import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_window_rule_golden(spark):
    # 7 tokens, chunk=3, overlap=1 (stride 2) -> starts 0,2,4
    out = sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"], r["chunk_id"])
        for r in chunk_documents(
            _docs(spark, [(9, "a b c d e f g")]), 3, 1
        ).collect()
    )
    assert out == [
        (0, "a b c", 3, "9:0"),
        (1, "c d e", 3, "9:1"),
        (2, "e f g", 3, "9:2"),
    ]


def test_short_doc_single_chunk_and_tail_shorter(spark):
    rows = chunk_documents(_docs(spark, [(1, "x y")]), 5, 2).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == "x y"
    # 6 tokens, chunk=4, overlap=2 (stride 2) -> starts 0,2; tail full here;
    # 7 tokens -> starts 0,2,4 with tail of 3
    tail = sorted(
        (r["chunk_idx"], r["n_chunk_tokens"])
        for r in chunk_documents(
            _docs(spark, [(1, "a b c d e f g")]), 4, 2
        ).collect()
    )
    assert tail == [(0, 4), (1, 4), (2, 3)]


def test_every_token_covered_and_overlap_exact(spark):
    text = " ".join(f"t{i}" for i in range(53))
    chunks = sorted(
        (r["chunk_idx"], r["chunk_text"].split(" "))
        for r in chunk_documents(_docs(spark, [(1, text)]), 16, 4).collect()
    )
    seen = set()
    for i, (idx, toks) in enumerate(chunks):
        assert idx == i
        if i + 1 < len(chunks):
            assert len(toks) == 16
            # consecutive windows share exactly `overlap` tokens
            assert toks[-4:] == chunks[i + 1][1][:4]
        seen.update(toks)
    assert seen == {f"t{i}" for i in range(53)}


def test_zero_overlap_partitions_tokens(spark):
    text = " ".join(str(i) for i in range(10))
    chunks = chunk_documents(_docs(spark, [(1, text)]), 4, 0).collect()
    joined = " ".join(
        r["chunk_text"] for r in sorted(chunks, key=lambda r: r["chunk_idx"])
    )
    assert joined == text


def test_validation_and_narrow_plan(spark):
    d = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        chunk_documents(d, 0, 0)
    with pytest.raises(ValueError):
        chunk_documents(d, 4, 4)
    plan = (
        chunk_documents(d, 4, 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # narrow: no shuffle anywhere


def test_split_evaluated_once_per_row(spark):
    """Double-reference guard (the explode-inlining footgun fixed in
    x_triangle_counts / generate_candidate_pairs): the token split must
    appear exactly once in the executed plan — n_chunks and the window
    slices all read the materialized __toks column, never re-derive
    split(text)."""
    d = _docs(spark, [(1, "a b c d e f")])
    plan = (
        chunk_documents(d, 4, 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("split(") == 1, plan


def test_window_rule_matches_python_replay_across_geometries(spark):
    """Batched property check: many random (n_tokens, chunk, overlap)
    geometries against a pure-Python replay of the documented rule."""
    import hashlib

    def replay(tokens, chunk, overlap):
        stride = chunk - overlap
        n = len(tokens)
        n_chunks = (
            1 if n <= chunk else (n - chunk + stride - 1) // stride + 1
        )
        return [
            " ".join(tokens[i * stride : i * stride + chunk])
            for i in range(n_chunks)
        ]

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)

    for chunk, overlap in [(1, 0), (2, 1), (5, 2), (16, 4), (64, 63)]:
        rows, expect = [], {}
        for d in range(12):
            n = 1 + h(f"{chunk}:{overlap}:{d}") % 150
            tokens = [f"w{h(f'{d}:{i}') % 97}" for i in range(n)]
            rows.append((d, " ".join(tokens)))
            expect[d] = replay(tokens, chunk, overlap)
        got = {}
        out = chunk_documents(
            _docs(spark, rows), chunk, overlap
        ).collect()
        for r in out:
            got.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk_text"]
        assert {
            d: [v[i] for i in range(len(v))] for d, v in got.items()
        } == expect, (chunk, overlap)
