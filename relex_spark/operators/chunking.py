"""Sliding-window document chunking — retrieval/RAG prep (engine
extension; pairs with the BM25 and ANN operators, which consume the
chunks this stage emits).

The window rule is exact-integer and documented so a DuckDB oracle can
replay it: ``stride = chunk_tokens - overlap``; a document with n tokens
yields 1 chunk when ``n <= chunk_tokens``, else
``(n - chunk_tokens + stride - 1) div stride + 1`` chunks; chunk i covers
tokens ``[i*stride, i*stride + chunk_tokens)`` (the tail chunk may be
shorter, never empty). Every token is covered and consecutive chunks
share exactly ``overlap`` tokens except possibly the tail.

Scale shape: narrow — split / sequence / explode / slice are all
whole-stage codegen on the scan partitioning; NO shuffle, no Python, and
the ~chunk_tokens/stride fan-out is the semantic minimum. At 100 TB the
plan is a pure map whose output feeds the (bucketed) index builders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's whitespace tokens into overlapping windows.

    Output: (doc_id, chunk_idx INT, chunk_id STRING = doc_id:idx,
    n_chunk_tokens INT, chunk_text STRING). Deterministic, narrow,
    partitioning-independent by construction (pure per-row expressions).
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    # Two projections (the repo's double-reference guard): __toks is
    # referenced both as a column and inside the explode's sequence bound,
    # and a multi-referenced non-cheap alias blocks CollapseProject — so
    # split() runs ONCE per row instead of once per reference. n_chunks is
    # exact-integer ceil division over the bound column (`div` stays in
    # codegen); no user-supplied column name is interpolated into SQL text.
    with_toks = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    )
    n = F.size(F.col("__toks"))
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.expr(f"(size(__toks) - {chunk_tokens} + {stride - 1}) div {stride}")
        + 1
    )
    c = with_toks.select(
        "doc_id",
        "__toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    window = F.slice(
        F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_tokens
    )
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.concat_ws(":", F.col("doc_id").cast("string"), "chunk_idx").alias(
            "chunk_id"
        ),
        F.size(window).cast("int").alias("n_chunk_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )
