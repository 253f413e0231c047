"""Gap-based sessionization + as-of join — transcript/event-stream
analytics operators (engine extensions; the reference has no event-time
processing).

Both are single-shuffle plans keyed by the entity column; the window sort
happens within each key's partition, so the shape survives a 1000-executor
scale-up (hot keys are handled by AQE skew splitting; a key's events must
be totally ordered anyway, which is the operator's semantic lower bound).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _micros(col) -> Column:
    """Exact integer epoch microseconds; tolerates TIMESTAMP_NTZ scans
    (session timezone is pinned to UTC, so the cast is value-preserving)."""
    return F.unix_micros(F.col(col).cast("timestamp") if isinstance(col, str) else col.cast("timestamp"))


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a per-key session index: a new session starts when the time
    since the key's previous event is strictly greater than ``gap_seconds``
    — the same merge rule as Spark's built-in ``session_window`` (sessions
    merge while next_ts <= last_ts + gap), so the batch and streaming
    formulations produce identical boundaries (pinned by a parity test).

    Classic two-window formulation sharing ONE partitioning (single
    shuffle): lag → boundary flag → running sum of flags = session index
    (1-based). Ties on ts are broken by ``order_col`` so the result is a
    total order (engine determinism rule).

    Output: input columns + ``session_idx INT``.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    prev_ts = F.lag(ts_col).over(w)
    # exact integer microsecond math (timestamps carry sub-second parts;
    # float epoch would round differently across engines)
    is_boundary = (
        prev_ts.isNull()
        | (_micros(ts_col) - _micros(prev_ts) > gap_seconds * 1_000_000)
    ).cast("int")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_idx", F.sum(is_boundary).over(wsum).cast("int")
    )


def session_bounds(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session summary: (key, session_idx, n_events, start/end epoch).

    The groupBy reuses the sessionize shuffle's partitioning (same key),
    so Catalyst plans it without a second exchange on the key column.
    """
    s = sessionize(df, key_col, ts_col, order_col, gap_seconds)
    return s.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(_micros(ts_col)).cast("bigint").alias("start_us"),
        F.max(_micros(ts_col)).cast("bigint").alias("end_us"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row's
    values at the greatest right.ts <= left.ts within the same key
    (the standard market-data/point-in-time join; DuckDB's native
    ASOF JOIN is the oracle formulation).

    Spark-first shape: no range join, no per-key collect — tag and UNION
    both sides, then one window per key ordered by (ts, right-before-left)
    carrying the last non-null right values forward. Exactly one shuffle
    (by key); the right side is NOT required to be small.

    ``right`` must be unique per (key, ts) — pre-aggregate if not.
    Output: left columns + the carried ``value_cols`` (null when no right
    row precedes).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key_col, ts_col)]
    left_cols = left.columns
    clash = sorted(set(value_cols) & set(left_cols))
    if clash:
        # the union-tag construction emits one column per name; a carried
        # value sharing a left column's name would be ambiguous — fail
        # loudly instead of letting resolution pick one silently
        raise ValueError(
            f"right value columns {clash} collide with left columns — "
            "rename them before asof_join (e.g. right.withColumnRenamed)"
        )

    def null_as(c: str, typ_src: DataFrame) -> Column:
        return F.lit(None).cast(typ_src.schema[c].dataType).alias(c)

    l_tag = left.select(
        *left_cols,
        *[null_as(c, right) for c in value_cols],
        F.lit(0).alias("__is_right"),
    )
    r_tag = right.select(
        *[null_as(c, left) if c not in (key_col, ts_col) else F.col(c) for c in left_cols],
        *value_cols,
        F.lit(1).alias("__is_right"),
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts => ts >= match semantics
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.desc("__is_right"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the last right ROW (as a struct), not the last non-null of each
    # value column: a struct is non-null for every right row even when the
    # values inside it are null, so a matched right row with a NULL value
    # yields NULL — matching ASOF semantics (carrying per-column non-nulls
    # would resurrect an OLDER row's value through the null). One window
    # expression for all columns instead of one per column, too.
    row_struct = F.last(
        F.when(F.col("__is_right") == 1, F.struct(*[F.col(c) for c in value_cols])),
        ignorenulls=True,
    ).over(w)
    carried = u.select(
        *left_cols,
        "__is_right",
        *[row_struct[c].alias(c) for c in value_cols],
    )
    return carried.where(F.col("__is_right") == 0).drop("__is_right")


def collapse_retries(
    turns: DataFrame,
    threshold_u6: int = 200_000,
    text_col: str = "text",
) -> DataFrame:
    """Collapse runs of consecutive near-duplicate turns within a
    conversation — the retry/repeat spam agent transcripts accumulate
    (the signal `x_turn_analysis` measures, turned into the curation
    action). A turn is a RETRY of its immediate predecessor when the
    normalized Levenshtein ratio (floor(dist/max_len*1e6+0.5), the exact
    integer form shared with x_turn_analysis) is <= ``threshold_u6``;
    each maximal run collapses to its FIRST turn, which carries the
    number of turns it absorbed.

    Exact-integer thresholding keeps the decision engine-portable (a
    DuckDB oracle replays it bit-for-bit). Scale shape: ONE shuffle (the
    shared per-conversation window partitioning) — lag, flag, running sum
    of keep-flags (= run id), then the per-run rollup rides the same
    partitioning since (conv_id, run) is a refinement of conv_id; JVM
    levenshtein, no Python.

    Output: (conv_id, turn_idx, text, n_collapsed INT) — kept turns only,
    n_collapsed = turns absorbed after this one (0 = no retries followed).
    """
    if not 0 <= threshold_u6 <= 1_000_000:
        raise ValueError(f"threshold_u6 must be in [0, 1e6], got {threshold_u6}")
    # Pin the window's conv_id partitioning (REPARTITION_BY_NUM, which AQE
    # never coalesces): the shuffle is byte-light but each row then pays an
    # O(len²) levenshtein against its predecessor, and AQE's byte-based
    # coalescing was collapsing the whole corpus into ONE task (measured
    # 3.7s -> 0.6s at sf0.1). The window and the per-run rollup both reuse
    # this exchange (conv_id ⊆ both keys), so the plan stays ONE shuffle.
    n_parts = int(
        turns.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    turns = turns.repartition(n_parts, "conv_id")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag(text_col).over(w)
    dist = F.levenshtein(F.col(text_col), prev)
    denom = F.greatest(
        F.length(text_col), F.length(prev), F.lit(1)
    ).cast("double")
    ratio_u6 = F.floor(dist.cast("double") / denom * 1_000_000 + F.lit(0.5))
    keep = F.when(
        prev.isNull() | (ratio_u6 > threshold_u6), F.lit(1)
    ).otherwise(F.lit(0))
    flagged = turns.select(
        "conv_id", "turn_idx", F.col(text_col).alias("text"), keep.alias("__keep")
    ).withColumn(
        "__run",
        F.sum("__keep").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy("conv_id", "__run")
        .agg(
            F.min("turn_idx").cast("int").alias("turn_idx"),
            F.min_by("text", "turn_idx").alias("text"),
            (F.count(F.lit(1)) - 1).cast("int").alias("n_collapsed"),
        )
        .drop("__run")
        .select("conv_id", "turn_idx", "text", "n_collapsed")
    )
