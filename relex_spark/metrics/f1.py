"""P/R/F1 metrics as two-stage aggregations (reference §2.7).

The reference accumulates per-label TP/FP/FN counters batch by batch
(relex/metrics/f1_measure.py:32-83) and finalizes with 1e-13-smoothed
ratios (:155-162). Here stage 1 is a gold⋈pred equi-join (by row id —
the reference aligns by list position, semeval2010_task8_evaluation.py:70-72)
followed by a partial+final hash aggregation; stage 2 is arithmetic over
the tiny per-label frame.

Quirk parity (f1_measure.py:128-146): the macro average does NOT exclude
``ignore_label`` — replicated verbatim so metric outputs are bit-comparable.

E3 (tacred_evaluation.py:9-98): micro P/R/F1 where a (gold, guess) pair
contributes guessed/gold counts only when the respective side is not
``no_relation`` — note this differs from one-vs-rest micro.

E4 (semeval2010_task8_evaluation.py:20-53): the official SemEval scorer's
headline = macro-F1 over the 9 undirected relation classes excluding Other,
directionality-aware (a directional confusion is both an FP and an FN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPS = 1e-13  # f1_measure.py:159-161


def f1_counts(joined: DataFrame, gold_col: str = "gold", pred_col: str = "pred") -> DataFrame:
    """E1: one-vs-rest TP/FP/FN per label from a (gold, pred) frame.

    Shuffle-free until the final agg: the label-level union is an explode
    of two (label, is_tp, …) contributions per row, aggregated map-side.
    """
    gold = F.col(gold_col)
    pred = F.col(pred_col)
    contrib = joined.select(
        F.explode(
            F.array(
                F.struct(
                    gold.alias("label"),
                    F.when(pred == gold, 1).otherwise(0).alias("tp"),
                    F.lit(0).alias("fp"),
                    F.when(pred != gold, 1).otherwise(0).alias("fn"),
                ),
                F.struct(
                    pred.alias("label"),
                    F.lit(0).alias("tp"),
                    F.when(pred != gold, 1).otherwise(0).alias("fp"),
                    F.lit(0).alias("fn"),
                ),
            )
        ).alias("c")
    )
    return (
        contrib.groupBy(F.col("c.label").alias("label"))
        .agg(
            F.sum("c.tp").alias("tp"),
            F.sum("c.fp").alias("fp"),
            F.sum("c.fn").alias("fn"),
        )
    )


def f1_metrics(counts: DataFrame) -> DataFrame:
    """E2 per-label finalize: P/R/F1 with the reference's 1e-13 smoothing."""
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    fn = F.col("fn").cast("double")
    precision = tp / (tp + fp + F.lit(EPS))
    recall = tp / (tp + fn + F.lit(EPS))
    f1 = F.lit(2.0) * precision * recall / (precision + recall + F.lit(EPS))
    return counts.select(
        "label",
        "tp",
        "fp",
        "fn",
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
    )


def f1_overall(
    metrics: DataFrame,
    average: str = "macro",
    ignore_label: str | None = None,
    labels: list[str] | None = None,
) -> dict[str, float]:
    """E2 overall: micro honors ignore_label; macro does NOT (reference
    quirk, f1_measure.py:128-146). Returns a 3-key dict (driver-side — the
    input frame has ≤ num_labels rows).

    ``labels``: the full vocabulary label list. The reference's F1Measure
    seeds its defaultdict counters with EVERY vocab label
    (f1_measure.py:64-83), so its macro denominators include zero-count
    labels (each contributing P=R=0 after smoothing). Pass the vocab
    labels (e.g. ``weights.labels``) to replicate that; with ``None`` the
    macro averages only labels observed in gold∪pred."""
    if average == "micro":
        df = metrics
        if ignore_label is not None:
            df = df.where(F.col("label") != ignore_label)
        row = df.agg(
            F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
        ).collect()[0]
        tp, fp, fn = float(row["tp"] or 0), float(row["fp"] or 0), float(row["fn"] or 0)
        precision = tp / (tp + fp + EPS)
        recall = tp / (tp + fn + EPS)
    elif average == "macro":
        rows = metrics.select("label", "precision", "recall").collect()
        observed = {r["label"] for r in rows}
        n = len(observed | set(labels)) if labels is not None else len(observed)
        precision = sum(r["precision"] for r in rows) / n if n else 0.0
        recall = sum(r["recall"] for r in rows) / n if n else 0.0
    else:
        raise ValueError(average)
    f1 = 2.0 * precision * recall / (precision + recall + EPS)
    return {"precision": precision, "recall": recall, "f1": f1}


def tacred_micro_f1(
    joined: DataFrame,
    gold_col: str = "gold",
    pred_col: str = "pred",
    no_relation: str = "no_relation",
) -> dict[str, float]:
    """E3: the TACRED scorer's micro P/R/F1 (tacred_evaluation.py:20-34,
    84-94): guessed = pred != no_relation, gold = gold != no_relation,
    correct = both non-null and equal."""
    gold = F.col(gold_col)
    pred = F.col(pred_col)
    row = joined.agg(
        F.sum(F.when(pred != no_relation, 1).otherwise(0)).alias("guessed"),
        F.sum(F.when(gold != no_relation, 1).otherwise(0)).alias("gold"),
        F.sum(
            F.when((pred != no_relation) & (gold == pred), 1).otherwise(0)
        ).alias("correct"),
    ).collect()[0]
    guessed, gold_n, correct = (
        float(row["guessed"] or 0),
        float(row["gold"] or 0),
        float(row["correct"] or 0),
    )
    prec = correct / guessed if guessed > 0 else 1.0
    rec = correct / gold_n if gold_n > 0 else 0.0
    f1 = 2.0 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
    return {"precision": prec, "recall": rec, "f1": f1}


def semeval_official_counts(
    joined: DataFrame, gold_col: str = "gold", pred_col: str = "pred"
) -> DataFrame:
    """E4 per-label table: directional collapse for the class axis, a wrong
    direction still counts as FP+FN, `Other` excluded — the per-label stage
    of the official scorer (semeval2010_task8_evaluation.py:24-27)."""
    base = F.regexp_replace(F.col(gold_col), r"\(e[12],e[21]\)", "")
    base_p = F.regexp_replace(F.col(pred_col), r"\(e[12],e[21]\)", "")
    df = joined.select(
        base.alias("gold_class"),
        base_p.alias("pred_class"),
        (F.col(gold_col) == F.col(pred_col)).cast("int").alias("exact"),
    )
    contrib = df.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("gold_class").alias("label"),
                    F.col("exact").alias("tp"),
                    F.lit(0).alias("fp"),
                    (1 - F.col("exact")).alias("fn"),
                ),
                F.struct(
                    F.col("pred_class").alias("label"),
                    F.lit(0).alias("tp"),
                    (1 - F.col("exact")).alias("fp"),
                    F.lit(0).alias("fn"),
                ),
            )
        ).alias("c")
    )
    return (
        contrib.groupBy(F.col("c.label").alias("label"))
        .agg(F.sum("c.tp").alias("tp"), F.sum("c.fp").alias("fp"), F.sum("c.fn").alias("fn"))
        .where(F.col("label") != "Other")
    )


SEMEVAL_NUM_CLASSES = 9  # direction-collapsed relation classes, excl. Other


def semeval_official_f1(
    joined: DataFrame,
    gold_col: str = "gold",
    pred_col: str = "pred",
    num_classes: int = SEMEVAL_NUM_CLASSES,
) -> dict[str, float]:
    """E4: official-scorer headline re-expressed as aggregations — macro
    over the 9 relation classes (directional collapse for the class axis,
    but a wrong direction still counts as FP+FN), excluding Other.

    The official perl scorer's macro line (which the reference runs and
    regex-parses, semeval2010_task8_evaluation.py:26-28,35-53) reports
    each of P, R, F1 as the MEAN of the per-class values — the headline F1
    is the mean of per-class F1s, NOT the harmonic mean of macro P and R
    (the two agree only when per-class P/R are symmetric).

    The official scorer's confusion matrix always carries all
    ``num_classes`` classes: a class absent from this slice contributes 0
    to every mean, so the denominator is ``num_classes`` — NOT the number
    of observed classes (dividing by the observed count inflates the
    headline whenever a class is missing)."""
    per_label = semeval_official_counts(joined, gold_col, pred_col)
    rows = f1_metrics(per_label).collect()
    if not rows:
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0}
    n = max(num_classes, len(rows))
    p = sum(r["precision"] for r in rows) / n
    r_ = sum(r["recall"] for r in rows) / n
    f1 = sum(r["f1"] for r in rows) / n
    return {"precision": p, "recall": r_, "f1": f1}


def format_semeval_official_report(
    macro: dict[str, float],
    micro: dict[str, float] | None = None,
    counts: tuple[int, int, int] | None = None,
) -> str:
    """Render E4 metrics in the official perl scorer's report shape — the
    text format the reference regex-parses rather than recomputes
    (semeval2010_task8_evaluation.py:20-27 pins PRECISION/RECALL/F1_REGEX,
    OFFICIAL_RESULT_REGEX and RESULT_LINE_REGEX against this layout). The
    macro headline line must sit immediately under the
    "MACRO-averaged result (excluding Other):" caption inside the
    "(9+1)-WAY ... -- OFFICIAL" section, with each value as a right-aligned
    ``%6.2f%%`` percentage (the perl scorer's printf), or the reference's
    parser returns None.

    ``counts`` renders the micro line's correct/guessed/gold fractions when
    provided (perl scorer cosmetics; not consumed by the reference parser).
    """

    def pct(v: float) -> str:
        return f"{v * 100.0:6.2f}%"

    lines = [
        "<<< (9+1)-WAY EVALUATION TAKING DIRECTIONALITY INTO ACCOUNT"
        " -- OFFICIAL >>>:",
        "",
    ]
    if micro is not None:
        if counts is not None:
            correct, guessed, gold_n = counts
            frac_p = f"{correct}/{guessed} = "
            frac_r = f"{correct}/{gold_n} = "
        else:
            frac_p = frac_r = ""
        lines += [
            "Micro-averaged result (excluding Other):",
            f"P = {frac_p}{pct(micro['precision'])}     "
            f"R = {frac_r}{pct(micro['recall'])}     "
            f"F1 = {pct(micro['f1'])}",
            "",
        ]
    lines += [
        "MACRO-averaged result (excluding Other):",
        f"P = {pct(macro['precision'])}     R = {pct(macro['recall'])}     "
        f"F1 = {pct(macro['f1'])}",
        "",
        f"<<< The official score is (9+1)-way evaluation with directionality"
        f" taken into account: macro-averaged F1 = {pct(macro['f1']).strip()}"
        f" >>>",
    ]
    return "\n".join(lines) + "\n"


def trial_summary(trials: DataFrame, group_col: str = "experiment") -> DataFrame:
    """E7: mean/stddev of P/R/F1 across trials (scripts/summary.py:49-99,
    population stddev per numpy default at :59-60)."""
    return trials.groupBy(group_col).agg(
        F.avg("precision").alias("mean_precision"),
        F.stddev_pop("precision").alias("std_precision"),
        F.avg("recall").alias("mean_recall"),
        F.stddev_pop("recall").alias("std_recall"),
        F.avg("f1").alias("mean_f1"),
        F.stddev_pop("f1").alias("std_f1"),
    )
