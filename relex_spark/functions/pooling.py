"""Array pooling (reference §2.6 M14–M15) as pure SQL.

The reference pools ``(B, L, d)`` tensors under masks
(relex/modules/seq2vec_encoders/utils.py:16-73). The batched form lives in
the scoring kernel; this module is the per-row SQL form over
``ARRAY<DOUBLE>`` columns — used for oracle-checkable feature columns and
for the bag-of-embeddings scale path where a whole encoder stays JVM-side.

* M14 pool  — utils.py:16-30: max / mean / sum / final
* M15 scoped pool — utils.py:33-73: pool restricted to the full sequence,
  the head span, or the tail span (inclusive), concatenated.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ZERO = "CAST(0.0 AS DOUBLE)"


def pool_array(arr: Column, pooling: str) -> Column:
    """M14 over one ARRAY<numeric> column → DOUBLE."""
    arr = arr.cast("array<double>")
    if pooling == "max":
        return F.array_max(arr)
    if pooling == "sum":
        return F.aggregate(arr, F.expr(_ZERO), lambda acc, v: acc + v)
    if pooling == "mean":
        total = F.aggregate(arr, F.expr(_ZERO), lambda acc, v: acc + v)
        return F.when(F.size(arr) > 0, total / F.size(arr))
    if pooling == "final":
        return F.element_at(arr, -1)
    raise ValueError(f"'{pooling}' is not a valid pooling operation.")


def scoped_pool_array(
    arr: Column, pooling: str, span_start: Column, span_end: Column
) -> Column:
    """M15 single scope: pool arr[start..end] (0-based inclusive span).

    Matches utils.py:53-66 (position-range mask between start and end);
    ``slice`` is 1-based, hence the +1.
    """
    scoped = F.slice(arr, span_start + 1, span_end - span_start + 1)
    return pool_array(scoped, pooling)
