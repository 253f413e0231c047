"""BM25 sparse retrieval over a document corpus — the lexical complement
to the dense ANN paths (operators/similarity.py) in the similarity-search
tier of this engine.

Scoring follows the Lucene/Robertson formulation:

    idf(t)        = ln((N − df_t + 0.5) / (df_t + 0.5) + 1)       (≥ 0)
    contrib(t, d) = idf(t) · tf_{t,d}·(k1+1) / (tf_{t,d} + k1·(1 − b + b·dl_d/avgdl))
    score(d)      = Σ_{t ∈ query ∩ d} contrib(t, d)

Integer-exact oracle contract (the round-5 determinism discipline): the
only float ops are ln and one bounded rational per (term, doc) — both
computed from EXACT integers (N, df, tf, dl, Σdl) identically in Spark
and DuckDB, then quantized to micro-units per (term, doc) BEFORE the
per-document sum, which is therefore an order-independent integer sum.

Scale shape (zero-shuffle scoring, the bloom/DSIR device):
- Corpus statistics need ONE aggregate pass: df per query term (the
  query is a handful of terms — the groupBy cardinality is |query|) and
  (N, Σdl) scalars. Both are bounded collects (tiny finalize).
- The per-term idf_u6 values then ride the plan as literals inside a
  single codegen expression over each document's own tokens: scoring is
  MAP-ONLY — no join, no shuffle over the corpus.
- Top-k retrieval is ``orderBy(...).limit(k)`` → TakeOrderedAndProject:
  per-partition k-heaps, driver merges k·partitions rows, never a global
  sort.

A real inverted index (term → postings) is the right layout when queries
are many and the corpus is static; ``bm25_postings`` materializes it as a
DataFrame (one explode + one groupBy, map-side combined) for that
pattern. Single-query scoring deliberately does NOT build it — scanning
the corpus once per ad-hoc query beats materializing a trillion-row
postings table you use once.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from relex_spark.functions.text import split_ws


def bm25_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted-index postings (term, doc_id, tf) — one explode + one
    map-side-combined groupBy. Partition/bucket by ``term`` when writing
    so a query's postings co-locate."""
    return (
        docs.select(F.col(id_col), F.explode(split_ws(F.col(text_col))).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_scores(
    docs: DataFrame,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, dl, score_u6) for every document with score > 0 against the
    whitespace-tokenized ``query``. See module docstring for the exact
    quantization contract and the zero-shuffle plan shape."""
    terms = sorted(set(query.split()))
    if not terms:
        raise ValueError("query must contain at least one term")
    toks = docs.select(
        F.col(id_col), split_ws(F.col(text_col)).alias("__toks")
    )

    # ONE stats pass: N, Σdl, and df per query term (array of bounded size)
    df_cols = [
        F.sum(
            F.when(F.array_contains("__toks", F.lit(t)), F.lit(1)).otherwise(F.lit(0))
        ).alias(f"df_{i}")
        for i, t in enumerate(terms)
    ]
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("__toks")).alias("sum_dl"),
        *df_cols,
    ).collect()[0]
    n_docs, sum_dl = stats["n_docs"], stats["sum_dl"]
    if not n_docs:
        raise ValueError("corpus is empty")
    # idf from exact integers, driver-side ln (same libm class as the SQL
    # twin; quantization happens per-(term,doc) downstream, not here — idf
    # stays a double so the contrib product quantizes once, like the oracle)
    idf = {
        t: math.log((n_docs - stats[f"df_{i}"] + 0.5) / (stats[f"df_{i}"] + 0.5) + 1.0)
        for i, t in enumerate(terms)
    }

    dl = F.size("__toks").cast("double")
    avgdl_inv_dl = dl * F.lit(float(n_docs)) / F.lit(float(sum_dl))  # dl/avgdl exact-input rational
    contribs = []
    for t in terms:
        tf = F.size(F.filter("__toks", lambda x: x == F.lit(t))).cast("double")
        raw = (
            F.lit(idf[t])
            * (tf * F.lit(k1 + 1.0))
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * avgdl_inv_dl))
        )
        # per-(term, doc) micro-unit quantization; absent term -> exact 0
        contribs.append(
            F.when(tf > 0, F.floor(raw * 1_000_000 + F.lit(0.5)).cast("bigint"))
            .otherwise(F.lit(0).cast("bigint"))
        )
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return (
        toks.select(
            F.col(id_col),
            F.size("__toks").cast("bigint").alias("dl"),
            total.alias("score_u6"),
        )
        .where(F.col("score_u6") > 0)
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for ``query`` by BM25 — TakeOrderedAndProject, ties
    broken by ascending id for cross-engine determinism."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        bm25_scores(docs, query, k1=k1, b=b, text_col=text_col, id_col=id_col)
        .orderBy(F.col("score_u6").desc(), F.col(id_col).asc())
        .limit(k)
    )
