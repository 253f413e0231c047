"""P1–P8 column-function parity with Python semantics (SURVEY §7 watch list:
str.split() vs Spark split() edge cases must be pinned before anything
depends on offsets)."""

from pyspark.sql import functions as F

from relex_spark.functions.text import (
    join_ws,
    lower_tokens,
    mask_entities,
    normalize_glove_tokens,
    split_ws,
    truncate_tokens,
)

TRICKY = [
    "a b c",
    "  leading",
    "trailing   ",
    "multi   spaces\tand\ttabs",
    "\n newlines \n mixed \t",
    "single",
    "",
    "   ",
]


def test_split_ws_matches_python_str_split(spark):
    df = spark.createDataFrame([(t,) for t in TRICKY], "text string")
    got = {
        r["text"]: r["toks"]
        for r in df.select("text", split_ws("text").alias("toks")).collect()
    }
    for t in TRICKY:
        assert got[t] == t.split(), repr(t)


def test_join_split_roundtrip_on_canonical_text(spark):
    # the per-turn invariant: canonical (single-space) text round-trips
    texts = ["a b c", "x", "The system as described ."]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    bad = df.where(join_ws(split_ws("text")) != F.col("text")).count()
    assert bad == 0


def test_glove_normalization(spark):
    df = spark.createDataFrame(
        [(["-LRB-", "x", "-RRB-", "-LSB-", "-RSB-", "-LCB-", "-RCB-", "-LRB"],)],
        "toks array<string>",
    )
    (r,) = df.select(normalize_glove_tokens("toks").alias("n")).collect()
    assert r["n"] == ["(", "x", ")", "[", "]", "{", "}", "-LRB"]


def test_mask_entities_overlap_tail_wins(spark):
    # reference applies head slice-assign then tail (tacred.py:198-199):
    # overlapping positions end up with the tail replacement.
    df = spark.createDataFrame([(["a", "b", "c", "d", "e"],)], "toks array<string>")
    out = df.select(
        mask_entities(
            F.col("toks"),
            F.lit(1), F.lit(3),
            F.lit(2), F.lit(4),
            F.lit("H"), F.lit("T"),
        ).alias("m")
    ).collect()[0]["m"]
    assert out == ["a", "H", "T", "T", "T"]


def test_truncate_and_lower(spark):
    df = spark.createDataFrame([(["A", "B", "C"],)], "toks array<string>")
    r = df.select(
        truncate_tokens("toks", 2).alias("t"), lower_tokens("toks").alias("l")
    ).collect()[0]
    assert r["t"] == ["A", "B"]
    assert r["l"] == ["a", "b", "c"]


def test_split_ws_unicode_whitespace_parity(spark):
    """P2 parity with Python str.split() on Unicode whitespace (NBSP, thin
    space, ideographic space) — Java's default \\s is ASCII-only, so the
    (?U) flag is load-bearing (semeval2010_task8.py:53-54 splitter)."""
    cases = [
        "a b",
        "a b",
        "a　b",
        " a b ",
        "  mixed  and\tascii  ",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = df.select(split_ws("text").alias("toks")).collect()
    for row, text in zip(got, cases):
        assert list(row["toks"]) == text.split(), text
