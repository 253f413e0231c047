"""Corpus-curation operators for training-data pipelines: deterministic
stratified sampling, benchmark decontamination via n-gram overlap, and a
CCNet-style bigram-LM quality score.

All pure DataFrame/SQL (whole-stage codegen, no Python); all hashing uses
the portable md5-prefix form (functions.text.portable_hash64) so every
operator is DuckDB-oracle-checkable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from relex_spark.functions.text import portable_hash64, split_ws, word_bigrams
from relex_spark.operators.dedup import shingled_docs
from relex_spark.operators.textstats import micro_units

SAMPLE_MOD = 1_000_000


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: a row is kept iff
    ``portable_hash64(id) % 1e6 < floor(rate * 1e6)`` for its stratum's
    rate. The usual curation move (keep 100% of rare languages / trusted
    sources, x% of the head) — but reproducible: membership is a pure
    function of the id, so reruns, cluster sizes, and partitionings all
    select the identical sample (unlike ``df.sampleBy``, which is seeded
    per-partition-split).

    Scale shape: narrow map-only filter — no shuffle, no sort, no state.
    """
    h = portable_hash64(F.col(id_col).cast("string")) % SAMPLE_MOD
    expr = F.lit(int(math.floor(default_rate * SAMPLE_MOD)))
    for stratum, rate in sorted(rates.items()):
        expr = F.when(
            F.col(stratum_col) == stratum,
            F.lit(int(math.floor(rate * SAMPLE_MOD))),
        ).otherwise(expr)
    return docs.where(h < expr)


def benchmark_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Decontamination signal: per document, the count and fraction of its
    word n-gram shingles that also occur anywhere in ``benchmark`` (the
    GPT-3/PaLM-style eval-set overlap check), plus a ``contaminated`` flag
    at ``threshold``.

    Scale shape: both sides reduce to hashed-shingle sets first; the
    benchmark side collapses to DISTINCT int64 hashes; one equi-join on the
    hash — shuffle is proportional to the shingle sets, never to
    |docs| x |benchmark|. The join is left-outer so zero-overlap documents
    are reported (as contaminated = false), not dropped.
    """
    d = shingled_docs(docs, text_col, shingle_n, out_col="sh", hashed=True)
    dd = d.select(
        F.col(id_col),
        F.size("sh").cast("bigint").alias("n_shingles"),
        F.explode("sh").alias("h"),
    )
    b = (
        shingled_docs(benchmark, text_col, shingle_n, out_col="sh", hashed=True)
        .select(F.explode("sh").alias("h"))
        .distinct()
        .withColumn("hit", F.lit(1).cast("bigint"))
    )
    agg = (
        dd.join(b, "h", "left")
        .groupBy(id_col, "n_shingles")
        .agg(F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_hits"))
    )
    frac = F.col("n_hits").cast("double") / F.col("n_shingles").cast("double")
    return agg.select(
        id_col,
        "n_shingles",
        "n_hits",
        micro_units(frac).alias("overlap_frac_u6"),
        (frac >= F.lit(threshold)).alias("contaminated"),
    )


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style LM quality signal: train an add-one-smoothed bigram LM
    on the corpus itself, score each document by its mean bigram log-prob
    (Wenzek et al. 2020 filter perplexity, reduced to SQL-exact bigram
    counts).  P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V), V = |vocabulary|.

    Scale shape: ONE pass over the corpus — per-doc bigram multiplicities
    (two-level hash aggregate), materialized via lazy localCheckpoint
    because three consumers derive from it: the corpus bigram counts
    (c2 = Σ m), the prefix marginals (c1 from c2), and the vocabulary size
    (V = distinct {w1} ∪ {w2} over c2's keys, which equals the distinct
    tokens of all ≥2-token docs: every such token occurs in some bigram).
    The probability join then touches distinct (doc, bigram) pairs, not
    every occurrence; V is a 1-row aggregate cross-joined in (broadcast
    nested loop of one row). Docs with < 2 tokens carry no bigram and are
    excluded by contract.
    """
    toks = split_ws(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("toks")).where(
        F.size("toks") >= 2
    )
    big = base.select(
        id_col,
        F.explode(word_bigrams(F.col("toks"))).alias("bigram"),
    )
    # the only per-occurrence pass; checkpointed so c2/c1/V don't re-scan
    doc_big = big.groupBy(id_col, "bigram").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    ).localCheckpoint(eager=False)
    c2 = doc_big.groupBy("bigram").agg(F.sum("m").cast("bigint").alias("c2"))
    c2 = c2.localCheckpoint(eager=False)
    c1 = (
        c2.withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .groupBy("w1")
        .agg(F.sum("c2").cast("bigint").alias("c1"))
    )
    vocab = (
        c2.select(
            F.explode(
                F.array(
                    F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)),
                    F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)),
                )
            ).alias("tok")
        )
        .agg(F.count_distinct("tok").cast("bigint").alias("v"))
    )
    scored = (
        doc_big.join(c2, "bigram")
        .withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logp",
            F.log(
                (F.col("c2") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("v")).cast("double")
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("m").cast("bigint").alias("n_bigrams"),
            (F.sum(F.col("m") * F.col("logp")) / F.sum("m")).alias("_mean"),
        )
        .select(
            id_col,
            "n_bigrams",
            micro_units(F.col("_mean")).alias("mean_logp_u6"),
        )
    )
