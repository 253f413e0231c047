"""Evaluation metrics as DataFrame aggregations (reference §2.7 E1–E7)."""

from relex_spark.metrics.f1 import (  # noqa: F401
    f1_counts,
    f1_metrics,
    f1_overall,
    semeval_official_f1,
    tacred_micro_f1,
    trial_summary,
)
