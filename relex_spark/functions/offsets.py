"""Offset-feature index arrays (reference §2.6 M4–M6) as pure SQL.

The reference's offset embedders compute an integer index per (row,
position), then look it up in an embedding table. The index computation is
data-parallel integer arithmetic — we keep it in Catalyst as an
``ARRAY<INT>`` column; only the table lookup happens inside the scoring
kernel (numpy ``take`` on a broadcast matrix).

References (/root/reference):
* M4 relative — relex/modules/offset_embedders/relative_offset_embedder.py:25-53
    left of span: index = 1 + n + (p - start)
    inside span:  index = 1 + n
    right of span: index = 1 + n + (p - end)
* M5 sine     — sine_offset_embedder.py:40-60: index = 1 + n + p - start
* M6 entity marker — entity_only_offset_embedder.py:20-39: 1.0 where
    p == span_start else 0.0
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _positions(seq_len: Column) -> Column:
    # sequence(0, -1) would be a descending range; guard empty rows.
    return F.when(seq_len > 0, F.sequence(F.lit(0), seq_len - 1)).otherwise(
        F.array().cast("array<int>")
    )


def relative_offset_indices(
    seq_len: Column, span_start: Column, span_end: Column, n_position: int
) -> Column:
    """M4: per-position relative-offset embedding index, shape ARRAY<INT>.

    Matches relative_offset_embedder.py:40-48 exactly (padding masking is
    applied at batch time in the kernel; rows here have no padding).
    """
    base = F.lit(1 + n_position)
    return F.transform(
        _positions(seq_len),
        lambda p: (
            base
            + F.when(p < span_start, p - span_start)
            .when(p > span_end, p - span_end)
            .otherwise(F.lit(0))
        ).cast("int"),
    )


def sine_offset_indices(
    seq_len: Column, span_start: Column, n_position: int
) -> Column:
    """M5: index = 1 + n_position + p - span_start (sine_offset_embedder.py:53-55)."""
    base = F.lit(1 + n_position)
    return F.transform(
        _positions(seq_len), lambda p: (base + p - span_start).cast("int")
    )


def entity_marker_indicators(seq_len: Column, span_start: Column) -> Column:
    """M6: 0/1 indicator array, 1 exactly at span_start
    (entity_only_offset_embedder.py:33-38)."""
    return F.transform(
        _positions(seq_len),
        lambda p: F.when(p == span_start, F.lit(1)).otherwise(F.lit(0)).cast("int"),
    )
