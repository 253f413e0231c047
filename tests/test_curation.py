"""Unit goldens for the corpus-curation operators (full-corpus paths are
oracle-checked by the driver via x_stratified_sample / x_decontaminate /
x_lm_score)."""

import math

from pyspark.sql import functions as F

from relex_spark.operators.curation import (
    benchmark_overlap,
    bigram_lm_scores,
    stratified_sample,
)


def test_stratified_sample_rates_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(200)],
        ["doc_id", "lang"],
    )
    # rate 1.0 keeps every row of the stratum; 0.0 keeps none
    all_de = stratified_sample(docs, {"de": 1.0}, default_rate=0.0)
    assert all_de.count() == 100
    assert all_de.where(F.col("lang") == "en").count() == 0

    # membership is a pure function of doc_id: partitioning-independent
    half = stratified_sample(docs, {"en": 0.5, "de": 0.5})
    a = sorted(r["doc_id"] for r in half.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(7), {"en": 0.5, "de": 0.5}
        ).collect()
    )
    assert a == b
    # rate is approximately honored (hash-uniformity, not exactness)
    assert 60 <= len(a) <= 140


def test_benchmark_overlap_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # shingles: 'a b c', 'b c d'
            (2, "x y z w"),      # no overlap with benchmark
            (3, "a b c q"),      # 'a b c' hits, 'b c q' misses
        ],
        ["doc_id", "text"],
    )
    benchmark = spark.createDataFrame([(9, "a b c d")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in benchmark_overlap(docs, benchmark).collect()}
    assert rows[1]["n_shingles"] == 2 and rows[1]["n_hits"] == 2
    assert rows[1]["contaminated"] is True
    assert rows[2]["n_hits"] == 0 and rows[2]["contaminated"] is False
    assert rows[3]["n_shingles"] == 2 and rows[3]["n_hits"] == 1
    assert rows[3]["overlap_frac_u6"] == 500_000
    assert rows[3]["contaminated"] is True  # 0.5 >= threshold


def test_bigram_lm_scores_golden(spark):
    # corpus: bigrams 'a b' x2, 'a c' x1; c1(a)=3; V={a,b,c}=3
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    # P(b|a) = (2+1)/(3+3) = 0.5 ; P(c|a) = (1+1)/(3+3) = 1/3
    u6 = lambda x: math.floor(x * 1_000_000 + 0.5)
    assert rows[1]["n_bigrams"] == 1
    assert rows[1]["mean_logp_u6"] == u6(math.log(0.5))
    assert rows[2]["mean_logp_u6"] == u6(math.log(0.5))
    assert rows[3]["mean_logp_u6"] == u6(math.log(1 / 3))


def test_duplicate_ngram_spans_golden(spark):
    """Hand-computed 3-gram duplication spans: cross-doc and within-doc
    repeats, gap-<=n merging, gap->n splitting, and short docs skipped."""
    from relex_spark.operators.dedup import duplicate_ngram_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c x y z a b c"),    # "a b c" at p0 and p6 (gap 6 > 3)
            (2, "a b c d a b c d e"),    # dup positions 0,1,4,5 merge
            (3, "too short"),            # < n tokens: no grams, no error
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["doc_id"], r["span_start"]): (r["span_end"], r["n_dup_grams"])
        for r in duplicate_ngram_spans(docs, n=3, min_count=2).collect()
    }
    assert got == {
        (1, 0): (3, 1),
        (1, 6): (9, 1),
        (2, 0): (8, 4),   # one maximal span [0, 8) absorbing 4 dup grams
    }


def test_curation_pipeline_each_stage_eliminates(spark):
    """One planted document per elimination stage: low quality, benchmark
    contamination, exact duplicate, near duplicate, over-budget — the
    survivors come out packed with (shard, pack_id, pack_pos)."""
    import hashlib

    from relex_spark.operators.curation import curation_pipeline

    def words(stem, n, stop_every=5):
        # all-ALPHA tokens (the quality alpha check is ^[A-Za-z]+$ — a
        # digit suffix would zero the ratio) + a stopword sprinkle
        return " ".join(
            "the" if i % stop_every == 0 else f"{stem}{chr(97 + i % 26)}{chr(97 + i // 26)}"
            for i in range(n)
        )

    bench_text = words("bench", 40)
    near_a = words("near", 40)
    near_b = " ".join(near_a.split()[:-2] + ["changed", "tail"])  # J ~ 0.9
    rows = [
        (0, bench_text, "en", "srcA"),          # benchmark member (0 % 31 == 0)
        (1, words("alpha", 40), "en", "srcA"),  # clean survivor
        (2, bench_text, "en", "srcA"),          # contaminated (copies benchmark)
        (3, words("dupe", 40), "en", "srcA"),   # exact-dup keeper (min id)
        (4, words("dupe", 40), "en", "srcA"),   # exact-dup victim
        (5, near_a, "en", "srcA"),              # near-dup keeper
        (6, near_b, "en", "srcA"),              # near-dup victim (J >= 0.5)
        (7, "short text", "en", "srcA"),        # low quality (2 tokens)
        (8, words("beta", 40), "en", "srcB"),   # srcB budget race...
        (9, words("gamma", 40), "en", "srcB"),  # ...only hash-first survives
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    out = curation_pipeline(
        docs, {"srcA": 100_000, "srcB": 1}, pack_budget=64, pack_shards=2
    ).collect()
    got_ids = {r["doc_id"] for r in out}

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    srcb_first = min((8, 9), key=lambda i: (h64(f"mix:{i}") % 16, h64(f"mix:{i}"), i))
    assert got_ids == {1, 3, 5, srcb_first}
    # packed output invariants: every multi-doc pack fits the budget
    fills = {}
    for r in out:
        fills.setdefault((r["shard"], r["pack_id"]), []).append(r["tok_count"])
    for toks in fills.values():
        assert len(toks) == 1 or sum(toks) <= 64


def _h64(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_shingles(text: str, n: int = 3) -> list[int]:
    toks = text.split()
    if len(toks) >= n:
        grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    else:
        grams = {" ".join(toks)}
    return sorted(_h64(g) for g in grams)


def _py_positions(h: int, k: int, m: int) -> list[int]:
    h1, h2 = h % m, 1 + (h >> 30) % (m - 1)
    return [(h1 + i * h2) % m for i in range(k)]


def test_bloom_decontaminate_matches_python_replay(spark):
    """Pin the bit packing (incl. the int64 sign bit: m_bits=64 puts every
    position in word 0, so bit 63 is exercised with near-certainty) against
    an independent pure-Python replay of the same hash/position math."""
    from relex_spark.operators.curation import bloom_decontaminate

    texts = [
        (i, " ".join(f"w{i}x{j}" for j in range(10)) + " common tail words")
        for i in range(30)
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    benchmark = docs.where(F.col("doc_id") % 5 == 0)
    m, k = 64, 3

    bench_bits = set()
    for i, t in texts:
        if i % 5 == 0:
            for h in _py_shingles(t):
                bench_bits.update(_py_positions(h, k, m))
    assert any(p == 63 for p in bench_bits), "sign bit not exercised; densify"

    expected = {}
    for i, t in texts:
        hs = _py_shingles(t)
        hits = sum(
            1 for h in hs if all(p in bench_bits for p in _py_positions(h, k, m))
        )
        frac = hits / len(hs)
        expected[i] = (
            len(hs),
            hits,
            math.floor(frac * 1_000_000 + 0.5),
            frac >= 0.5,
        )

    got = {
        r["doc_id"]: (
            r["n_shingles"],
            r["n_bloom_hits"],
            r["bloom_frac_u6"],
            r["flagged"],
        )
        for r in bloom_decontaminate(docs, benchmark, m_bits=m, k=k).collect()
    }
    assert got == expected
    # benchmark members self-hit completely at any width
    assert all(got[i][1] == got[i][0] for i in range(0, 30, 5))


def test_bloom_no_false_negatives_vs_exact(spark):
    """One-sided error contract: at any width every exact hit is a bloom
    hit; at a generous width (2^20 bits for ~60 shingles) the two signals
    coincide exactly on this corpus (deterministic, so pinned forever)."""
    from relex_spark.operators.curation import (
        benchmark_overlap,
        bloom_decontaminate,
    )

    texts = [(i, " ".join(f"t{(i * 7 + j) % 40}" for j in range(12))) for i in range(25)]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    benchmark = docs.where(F.col("doc_id") % 4 == 0)

    exact = {
        r["doc_id"]: r["n_hits"] for r in benchmark_overlap(docs, benchmark).collect()
    }
    for m in (64, 1 << 20):
        bloom = {
            r["doc_id"]: r["n_bloom_hits"]
            for r in bloom_decontaminate(docs, benchmark, m_bits=m).collect()
        }
        assert set(bloom) == set(exact)
        assert all(bloom[i] >= exact[i] for i in exact), f"false negative at m={m}"
    assert bloom == exact  # m=2^20: no collisions on this corpus


def test_bloom_decontaminate_guards(spark):
    import pytest

    from relex_spark.operators.curation import bloom_decontaminate

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        bloom_decontaminate(docs, docs, m_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom_decontaminate(docs, docs, k=0)
