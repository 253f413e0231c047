"""DSIR-style data selection via importance resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling") — pick the
slice of a raw 100-TB corpus that best matches a target distribution.

Pipeline, re-expressed Spark-first with an integer-exact oracle contract:

1. **Features**: hashed word-bigram counts (the paper's hashed n-gram
   feature space). Grams keep multiplicity — DSIR models bag-of-ngrams
   frequencies, not shingle sets (which is why this does not reuse
   ``dedup.shingled_docs``: that one is deliberately distinct-set-valued).
2. **Fit**: per-bucket counts over the target sample and over the raw
   corpus → add-one-smoothed log-likelihood ratio per bucket, quantized to
   micro-units as ``floor(1e6·ln(((t_b+1)(S+m)) / ((s_b+1)(T+m))) + 0.5)``.
   All ratio inputs are exact integers, so both engines hand the SAME
   rational number to ``ln`` — the only float op in the whole operator —
   and quantize immediately (double-precision libm drift ~1e-16 against a
   1e-6 grid: no flap; contrast the float32 lesson in BASELINE.md's
   determinism section).
3. **Score**: per-doc importance = INTEGER sum of its grams' bucket llr_u6
   values — order-independent, engine-portable, no per-row Python.
4. **Resample**: Gumbel-top-k without replacement ∝ exp(score/τ): key =
   ⌊score_u6/τ⌋ + ⌊1e6·g+0.5⌋ with g = −ln(−ln(u)) and u derived from the
   portable 60-bit hash of the doc id — deterministic, seedless, and
   reproducible in SQL.

Scale shape (the reason this layout was chosen):
- The two count aggregations group by bucket — cardinality is capped at
  ``m_buckets`` (default 4096), so the shuffle is m rows with full
  map-side combine regardless of corpus size.
- The fitted table is collected (m rows — a tiny-aggregate finalize, the
  same class as the vocab broadcast) and constant-folded into the plan as
  ONE array<bigint> literal, making document scoring a MAP-ONLY codegen
  pass: zero joins, zero shuffle over the corpus (same trick as
  curation.bloom_decontaminate's bitset).
- Resampling top-k compiles to TakeOrderedAndProject: per-partition heaps
  of size k, driver merges k·partitions rows — never a global sort.

Reference scope note: DSIR is a training-data selection method, not a
RelEx feature; it lives in the LLM-data-pipeline tier of this engine
(build brief) alongside dedup/decontamination/quality scoring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from relex_spark.functions.text import portable_hash64, split_ws

HASH_SPACE = 1 << 60  # portable_hash64 range (15 hex digits of md5)


def bigrams_from_tokens(toks: Column) -> Column:
    """Token-array → whitespace-joined bigrams WITH multiplicity
    (``array<string>``); a row shorter than 2 tokens contributes its
    joined tokens as one gram so no row is featureless."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


def word_bigrams(text_col: Column) -> Column:
    """Convenience single-expression form (fine for one-shot references;
    hot paths go through ``_with_grams`` so the token split runs ONCE per
    row — a multi-referenced non-cheap alias blocks CollapseProject, same
    device as ``dedup.shingled_docs``)."""
    return bigrams_from_tokens(split_ws(text_col))


def _with_grams(df: DataFrame, text_col: str) -> DataFrame:
    """df + ``__grams`` built via two projections: split once, gram once."""
    return (
        df.withColumn("__toks", split_ws(F.col(text_col)))
        .withColumn("__grams", bigrams_from_tokens(F.col("__toks")))
        .drop("__toks")
    )


def gram_buckets(grams: Column, m_buckets: int) -> Column:
    """Hash each gram into [0, m_buckets) via the engine-portable 60-bit
    md5 hash (nonnegative, so ``%`` agrees across engines)."""
    return F.transform(grams, lambda g: portable_hash64(g) % F.lit(m_buckets))


def _bucket_counts(docs: DataFrame, text_col: str, m_buckets: int) -> DataFrame:
    """(bucket, cnt) over the corpus — explode + groupBy(bucket): shuffle
    cardinality capped at m_buckets, partials combined map-side."""
    return (
        _with_grams(docs, text_col)
        .select(F.explode(gram_buckets(F.col("__grams"), m_buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_llr_table(
    docs: DataFrame,
    target: DataFrame,
    m_buckets: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """Fitted importance model: (bucket, t_cnt, s_cnt, llr_u6) for every
    bucket 0..m_buckets-1 (absent buckets materialize with zero counts so
    the smoothed prior applies uniformly)."""
    if m_buckets < 2:
        raise ValueError(f"m_buckets must be >= 2, got {m_buckets}")
    spark = docs.sparkSession
    tc = _bucket_counts(target, text_col, m_buckets).withColumnRenamed("cnt", "t_cnt")
    sc = _bucket_counts(docs, text_col, m_buckets).withColumnRenamed("cnt", "s_cnt")
    all_b = spark.range(m_buckets).select(F.col("id").alias("bucket"))
    joined = (
        all_b.join(tc, "bucket", "left")
        .join(sc, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).cast("bigint").alias("t_cnt"),
            F.coalesce("s_cnt", F.lit(0)).cast("bigint").alias("s_cnt"),
        )
    )
    t_tot = _with_grams(target, text_col).select(
        F.coalesce(F.sum(F.size("__grams")), F.lit(0)).alias("n")
    )
    s_tot = _with_grams(docs, text_col).select(
        F.coalesce(F.sum(F.size("__grams")), F.lit(0)).alias("n")
    )
    # single-row totals attach via broadcast cross join (scalar constants)
    joined = joined.crossJoin(
        F.broadcast(t_tot.select(F.col("n").alias("__t_total")))
    ).crossJoin(F.broadcast(s_tot.select(F.col("n").alias("__s_total"))))
    ratio = (
        (F.col("t_cnt") + 1).cast("double")
        * (F.col("__s_total") + F.lit(m_buckets)).cast("double")
    ) / (
        (F.col("s_cnt") + 1).cast("double")
        * (F.col("__t_total") + F.lit(m_buckets)).cast("double")
    )
    return joined.select(
        "bucket",
        "t_cnt",
        "s_cnt",
        F.floor(F.log(ratio) * 1_000_000 + F.lit(0.5)).cast("bigint").alias("llr_u6"),
    )


def dsir_scores(
    docs: DataFrame,
    target: DataFrame,
    m_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_grams, score_u6): per-document importance = integer sum of
    its grams' bucket llr_u6. The fitted m-row table is collected (bounded
    tiny finalize) and constant-folded into the plan as one literal array,
    so corpus scoring is a map-only pass — zero shuffle, zero join."""
    rows = dsir_llr_table(docs, target, m_buckets, text_col).collect()
    llr = [0] * m_buckets
    for r in rows:
        llr[r["bucket"]] = r["llr_u6"]
    llr_lit = F.array(*[F.lit(v).cast("bigint") for v in llr])
    score = F.aggregate(
        gram_buckets(F.col("__grams"), m_buckets),
        F.lit(0).cast("bigint"),
        lambda acc, b: acc + F.element_at(llr_lit, b.cast("int") + 1),
    )
    return _with_grams(docs, text_col).select(
        F.col(id_col),
        F.size(F.col("__grams")).cast("bigint").alias("n_grams"),
        score.alias("score_u6"),
    )


def gumbel_u6(id_col: Column) -> Column:
    """Deterministic per-row Gumbel(0,1) noise in micro-units: u is the
    centered portable hash of 'dsir:'||id mapped to (0,1), g = −ln(−ln u).
    Hash-derived, so reproducible in SQL and stable across runs/engines
    (quantization after double libm: flap risk ~1e-10 per row)."""
    h = portable_hash64(F.concat(F.lit("dsir:"), id_col.cast("string")))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(HASH_SPACE))
    g = -F.log(-F.log(u))
    return F.floor(g * 1_000_000 + F.lit(0.5)).cast("bigint")


def dsir_resample(
    scored: DataFrame,
    k: int,
    temperature: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel-top-k sample without replacement ∝ exp(score/τ) over a
    scored corpus → the k selected (id, score_u6, key_u6) rows, ordered by
    key desc. Integer τ keeps ⌊score_u6/τ⌋ exact in both engines (SQL
    twin: ``score_u6 // τ`` on nonneg, ``floor division`` semantics match
    via FLOOR(score/τ) on the integer-valued double — we use pmod-safe
    F.floor(score/τ) to agree with DuckDB on negatives too). Compiles to
    TakeOrderedAndProject — per-partition k-heaps, no global sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if temperature < 1:
        raise ValueError(f"temperature must be a positive integer, got {temperature}")
    key = (
        F.floor(F.col("score_u6").cast("double") / F.lit(float(temperature))).cast(
            "bigint"
        )
        + gumbel_u6(F.col(id_col))
    ).alias("key_u6")
    return (
        scored.select(id_col, "score_u6", key)
        .orderBy(F.col("key_u6").desc(), F.col(id_col).asc())
        .limit(k)
    )
