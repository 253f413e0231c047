"""E5: end-to-end evaluation driver as one DataFrame pipeline
(reference: scripts/evaluation.py:40-60 dispatching to
semeval2010_task8_evaluation.py:56-85 / tacred_evaluation.py:101-117).

The reference aligns gold and predicted labels BY LIST POSITION after a
full in-driver materialization; here the alignment is an id equi-join and
the scorer math is the metrics-module aggregations — no process boundary,
no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from relex_spark.metrics.f1 import (
    f1_counts,
    f1_metrics,
    f1_overall,
    semeval_official_f1,
    tacred_micro_f1,
)
from relex_spark.scoring.scorer import score_candidates


def evaluate_candidates(
    candidates: DataFrame,
    weights_bc,
    dataset: str = "semeval2010",
    encoder: str = "cnn",
) -> dict[str, float]:
    """read → score → join gold → aggregate (E5).

    ``candidates`` must carry gold ``label``; returns the dataset's official
    headline metrics (SemEval: macro-F1 excluding Other w/ directionality;
    TACRED: micro-F1 excluding no_relation)."""
    gold = candidates.select("id", F.col("label").alias("gold"))
    pred = score_candidates(
        candidates.drop("label"), weights_bc, keep_columns=["id"], encoder=encoder
    ).select("id", F.col("label").alias("pred"))
    joined = gold.join(pred, "id")

    if dataset == "semeval2010":
        headline = semeval_official_f1(joined)
    elif dataset == "tacred":
        headline = tacred_micro_f1(joined)
    else:
        raise ValueError(dataset)

    # Macro denominator = the FULL model label vocabulary (reference
    # F1Measure seeds counters for every vocab label, f1_measure.py:64-83),
    # so slices missing a label still divide by the vocab size.
    macro = f1_overall(
        f1_metrics(f1_counts(joined, "gold", "pred")),
        "macro",
        labels=list(weights_bc.value.labels),
    )
    return {
        "precision": headline["precision"],
        "recall": headline["recall"],
        "f1": headline["f1"],
        "macro_precision": macro["precision"],
        "macro_recall": macro["recall"],
        "macro_f1": macro["f1"],
    }
