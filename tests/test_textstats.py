"""Unit goldens for the round-2 text-analysis additions: Gopher-style
repetition signals and PII detection/redaction (the full-corpus paths are
oracle-checked by the driver via text_repetition / text_pii_redact)."""

from pyspark.sql import functions as F

from relex_spark.operators.textstats import pii_signals, repetition_signals


def test_repetition_signals_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),   # 5 toks, 2 distinct; bigrams a-b x2, b-a x2
            (2, "x y z"),       # 3 toks, all distinct; bigrams x-y, y-z
            (3, "solo"),        # <2 tokens: excluded by contract
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert set(rows) == {1, 2}

    r1 = rows[1]
    assert r1["n_tokens"] == 5
    assert r1["distinct_token_ratio_u6"] == 400_000      # 2/5
    assert r1["top_bigram_count"] == 2
    assert r1["top_bigram_frac_u6"] == 500_000           # 2/4
    assert r1["dup_bigram_frac_u6"] == 500_000           # (4-2)/4

    r2 = rows[2]
    assert r2["n_tokens"] == 3
    assert r2["distinct_token_ratio_u6"] == 1_000_000
    assert r2["top_bigram_count"] == 1
    assert r2["top_bigram_frac_u6"] == 500_000           # 1/2
    assert r2["dup_bigram_frac_u6"] == 0


def test_pii_signals_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith@example.com or 555-123-4567 today"),
            (2, "no pii here 12-34 a@b"),  # near-misses must not match
            (3, "Upper Case John.Doe+tag@Gmail.COM here"),
        ],
        ["doc_id", "text"],
    )
    sig = pii_signals(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            sig["n_emails"].alias("n_emails"),
            sig["n_phones"].alias("n_phones"),
            sig["redacted"].alias("redacted"),
        ).collect()
    }
    assert rows[1]["n_emails"] == 1
    assert rows[1]["n_phones"] == 1
    assert rows[1]["redacted"] == "mail <EMAIL> or <PHONE> today"
    assert rows[2]["n_emails"] == 0
    assert rows[2]["n_phones"] == 0
    assert rows[2]["redacted"] == "no pii here 12-34 a@b"
    assert rows[3]["n_emails"] == 1
    assert rows[3]["redacted"] == "Upper Case <EMAIL> here"


def test_repetition_signals_match_python_reference_random(spark):
    """Seeded random token soups vs an independent pure-Python counter
    implementation (micro-unit equality)."""
    import math
    import random
    from collections import Counter

    rnd = random.Random(20260817)
    vocab = ["a", "b", "c", "dd", "ee"]
    docs = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(2, 25))))
        for i in range(30)
    ]
    u6 = lambda x: math.floor(x * 1_000_000 + 0.5)
    expect = {}
    for i, text in docs:
        toks = text.split()
        bigs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        c = Counter(bigs)
        expect[i] = (
            len(toks),
            u6(len(set(toks)) / len(toks)),
            max(c.values()),
            u6(max(c.values()) / len(bigs)),
            u6((len(bigs) - len(c)) / len(bigs)),
        )
    rows = {
        r["doc_id"]: (
            r["n_tokens"],
            r["distinct_token_ratio_u6"],
            r["top_bigram_count"],
            r["top_bigram_frac_u6"],
            r["dup_bigram_frac_u6"],
        )
        for r in repetition_signals(
            spark.createDataFrame(docs, ["doc_id", "text"])
        ).collect()
    }
    assert rows == expect


def test_simhash_pairs_golden(spark):
    """Identical docs pair at Hamming 0; a doc sharing no tokens with them
    only pairs if its signature lands within 3 bits (checked exactly)."""
    from relex_spark.operators.dedup import simhash_candidate_pairs, simhash16
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),       # identical -> hamming 0
            (3, "completely different words here x y z"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_candidate_pairs(docs).collect()
    }
    assert pairs[(1, 2)] == 0
    sigs = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", simhash16(F.col("text")).alias("s")
        ).collect()
    }
    ham13 = bin(sigs[1] ^ sigs[3]).count("1")
    assert ((1, 3) in pairs) == (ham13 <= 3)
