"""Incremental materialization: merge a new ingest slice's rollup into an
accumulated rollup with MERGE-INTO semantics (no catalog required — the
combine is pure DataFrame algebra, so the same code backs a parquet
stage table or an Iceberg MERGE target).

The correctness contract is *merge-equivalence*: merging per-slice rollups
must equal the single-pass rollup over the union of the slices. That holds
exactly when every measure is a commutative monoid (sum/min/max/count —
not avg; averages must be carried as (sum, count) pairs), which is the
same algebra Spark itself exploits for map-side partial aggregation.
The x_incremental_merge driver query pins it against a single-pass DuckDB
oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def merge_rollups(
    accumulated: DataFrame,
    update: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge two rollups keyed by ``keys``: matched keys combine measure
    columns (sum/min/max), unmatched keys pass through — i.e. MERGE INTO
    with an additive update clause.

    Scale shape: union + one hash aggregate on the keys with map-side
    partial combine; the accumulated side never rewrites rows whose keys
    are absent from the update when the sink supports row-level merge —
    here the aggregate produces the full merged table for a parquet
    stage-table swap.
    """
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    if not aggs:
        raise ValueError("at least one measure column required")
    cols = list(keys) + list(sum_cols) + list(min_cols) + list(max_cols)
    return (
        accumulated.select(*cols)
        .unionByName(update.select(*cols))
        .groupBy(*keys)
        .agg(*aggs)
    )
