"""E1–E4/E7 metric parity: hand-computed goldens + replication of the
reference's exact math quirks (1e-13 smoothing; macro average NOT excluding
ignore_label, f1_measure.py:128-146; TACRED guessed/gold/correct counters,
tacred_evaluation.py:20-34)."""

import math

from relex_spark.metrics.f1 import (
    EPS,
    f1_counts,
    f1_metrics,
    f1_overall,
    semeval_official_f1,
    tacred_micro_f1,
    trial_summary,
)

# (gold, pred) — built so counts are easy to verify by hand:
# A: 2 gold, 1 predicted correctly, 1 miscalled as B
# B: 1 gold, predicted correctly; plus 1 false B (the A miss)
# C: 1 gold, miscalled as no_relation
# no_relation: 2 gold, 1 correct, 1 miscalled as A
ROWS = [
    ("A", "A"),
    ("A", "B"),
    ("B", "B"),
    ("C", "no_relation"),
    ("no_relation", "no_relation"),
    ("no_relation", "A"),
]


def _joined(spark):
    return spark.createDataFrame(ROWS, "gold string, pred string")


def test_f1_counts_golden(spark):
    counts = {r["label"]: (r["tp"], r["fp"], r["fn"]) for r in f1_counts(_joined(spark)).collect()}
    assert counts == {
        "A": (1, 1, 1),
        "B": (1, 1, 0),
        "C": (0, 0, 1),
        "no_relation": (1, 1, 1),
    }


def test_f1_metrics_smoothing(spark):
    m = {r["label"]: r for r in f1_metrics(f1_counts(_joined(spark))).collect()}
    # exact reference formula incl. 1e-13 smoothing (f1_measure.py:155-162)
    assert math.isclose(m["A"]["precision"], 1 / (2 + EPS), rel_tol=1e-12)
    assert math.isclose(m["A"]["recall"], 1 / (2 + EPS), rel_tol=1e-12)
    assert math.isclose(m["C"]["precision"], 0.0, abs_tol=1e-12)
    assert math.isclose(m["B"]["recall"], 1 / (1 + EPS), rel_tol=1e-12)


def test_macro_ignores_ignore_label_quirk(spark):
    """The reference macro branch averages over ALL labels even when
    ignore_label is set (f1_measure.py:128-146) — replicated exactly."""
    metrics = f1_metrics(f1_counts(_joined(spark)))
    macro_with = f1_overall(metrics, "macro", ignore_label="no_relation")
    macro_without = f1_overall(metrics, "macro", ignore_label=None)
    assert macro_with == macro_without  # the quirk: ignore_label is a no-op

    # micro DOES honor ignore_label (f1_measure.py:113-121)
    micro_with = f1_overall(metrics, "micro", ignore_label="no_relation")
    micro_without = f1_overall(metrics, "micro", ignore_label=None)
    assert micro_with != micro_without
    # by hand, excluding no_relation: tp=2, fp=2, fn=2
    assert math.isclose(micro_with["precision"], 2 / (4 + EPS), rel_tol=1e-12)
    assert math.isclose(micro_with["recall"], 2 / (4 + EPS), rel_tol=1e-12)


def test_tacred_micro_golden(spark):
    """Hand check (tacred_evaluation.py counter rules on ROWS):
    guessed (pred != no_relation) = 4; gold (gold != no_relation) = 4;
    correct (both non-null, equal) = 2."""
    m = tacred_micro_f1(_joined(spark))
    assert math.isclose(m["precision"], 2 / 4)
    assert math.isclose(m["recall"], 2 / 4)
    assert math.isclose(m["f1"], 0.5)


def test_semeval_official_directionality(spark):
    """Directional confusion counts as FP+FN even though the class matches
    after collapsing (e1,e2)/(e2,e1); Other excluded from the macro."""
    rows = [
        ("Cause-Effect(e1,e2)", "Cause-Effect(e1,e2)"),   # exact hit
        ("Cause-Effect(e1,e2)", "Cause-Effect(e2,e1)"),   # wrong direction
        ("Other", "Other"),
        ("Member-Collection(e1,e2)", "Other"),
    ]
    df = spark.createDataFrame(rows, "gold string, pred string")
    m = semeval_official_f1(df, num_classes=2)
    # Cause-Effect: tp=1, fp=1 (direction miss), fn=1 -> P=R=0.5
    # Member-Collection: tp=0, fn=1 -> P=0, R=0
    # macro over {Cause-Effect, Member-Collection}: P=0.25, R=0.25
    assert math.isclose(m["precision"], 0.25, rel_tol=1e-9)
    assert math.isclose(m["recall"], 0.25, rel_tol=1e-9)
    # official default: absent classes contribute 0 and the denominator is
    # the fixed 9 (2 observed classes -> scaled by 2/9)
    m9 = semeval_official_f1(df)
    assert math.isclose(m9["precision"], 0.25 * 2 / 9, rel_tol=1e-9)


def test_semeval_official_headline_is_mean_of_class_f1(spark):
    """Asymmetric per-class P/R: the official perl scorer's headline F1 is
    the MEAN of per-class F1s, not the harmonic mean of macro P/R — the two
    diverge here and the mean must win."""
    rows = [
        # Cause-Effect: tp=2, fp=0, fn=1 -> P=1, R=2/3, F1=0.8
        ("Cause-Effect(e1,e2)", "Cause-Effect(e1,e2)"),
        ("Cause-Effect(e1,e2)", "Cause-Effect(e1,e2)"),
        ("Cause-Effect(e1,e2)", "Member-Collection(e1,e2)"),
        # Member-Collection: tp=1, fp=1 (the miss above), fn=0 -> P=0.5, R=1, F1=2/3
        ("Member-Collection(e1,e2)", "Member-Collection(e1,e2)"),
    ]
    df = spark.createDataFrame(rows, "gold string, pred string")
    m = semeval_official_f1(df, num_classes=2)
    assert math.isclose(m["precision"], 0.75, rel_tol=1e-9)
    assert math.isclose(m["recall"], (2 / 3 + 1) / 2, rel_tol=1e-9)
    mean_f1 = (0.8 + 2 / 3) / 2
    harmonic = 2 * m["precision"] * m["recall"] / (m["precision"] + m["recall"])
    assert not math.isclose(mean_f1, harmonic, rel_tol=1e-6)  # genuinely asymmetric
    assert math.isclose(m["f1"], mean_f1, rel_tol=1e-9)


def test_macro_with_full_vocab_labels(spark):
    """Reference F1Measure seeds counters with every vocab label
    (f1_measure.py:64-83): zero-count labels dilute the macro average."""
    metrics = f1_metrics(f1_counts(_joined(spark)))
    base = f1_overall(metrics, "macro")
    vocab = ["A", "B", "C", "no_relation", "D_unseen", "E_unseen"]
    full = f1_overall(metrics, "macro", labels=vocab)
    assert math.isclose(full["precision"], base["precision"] * 4 / 6, rel_tol=1e-9)
    assert math.isclose(full["recall"], base["recall"] * 4 / 6, rel_tol=1e-9)
    # observed labels alone reproduce the default
    assert f1_overall(metrics, "macro", labels=["A", "B"]) == base


def test_trial_summary(spark):
    trials = spark.createDataFrame(
        [("exp1", 0.8, 0.6, 0.7), ("exp1", 0.6, 0.4, 0.5), ("exp2", 1.0, 1.0, 1.0)],
        "experiment string, precision double, recall double, f1 double",
    )
    s = {r["experiment"]: r for r in trial_summary(trials).collect()}
    assert math.isclose(s["exp1"]["mean_f1"], 0.6)
    assert math.isclose(s["exp1"]["std_f1"], 0.1)  # population stddev
    assert math.isclose(s["exp2"]["std_precision"], 0.0)


def test_semeval_official_report_regex_roundtrip(spark):
    """E4 report-format parity: format the repo's E4 aggregate into the
    official perl scorer's report shape and round-trip it through the
    REFERENCE's exact parsing regexes (literal copies of
    relex/evaluation/semeval2010_task8_evaluation.py:20-27,31-53) — pinning
    the output FORMAT, not just the math. A format drift (caption text,
    line order, percentage printf) makes the reference parser return None
    and this test fail."""
    import re

    from relex_spark.metrics.f1 import format_semeval_official_report

    rows = [
        ("Cause-Effect(e1,e2)", "Cause-Effect(e1,e2)"),
        ("Cause-Effect(e1,e2)", "Cause-Effect(e2,e1)"),
        ("Other", "Other"),
        ("Member-Collection(e1,e2)", "Other"),
        ("Entity-Origin(e1,e2)", "Entity-Origin(e1,e2)"),
    ]
    df = spark.createDataFrame(rows, "gold string, pred string")
    macro = semeval_official_f1(df)
    report = format_semeval_official_report(
        macro, micro={"precision": 0.5, "recall": 0.5, "f1": 0.5},
        counts=(2, 4, 4),
    )

    # --- literal copies of the reference's parser (cited above) ---------
    PRECISION_REGEX = r"P =\s*([0-9]{1,2}\.[0-9]{2})%"
    RECALL_REGEX = r"R =\s*([0-9]{1,2}\.[0-9]{2})%"
    F1_REGEX = r"F1 =\s*([0-9]{1,2}\.[0-9]{2})%"
    OFFICIAL_RESULT_REGEX = (
        r"\(9\+1\)-WAY EVALUATION TAKING DIRECTIONALITY "
        "INTO ACCOUNT -- OFFICIAL"
    )
    RESULT_LINE_REGEX = r"MACRO-averaged result \(excluding Other\):\n((.*\n){1})"

    official = re.search(OFFICIAL_RESULT_REGEX, report)
    assert official, "official section header missing or reworded"
    match = re.search(RESULT_LINE_REGEX, report[official.span(0)[1]:])
    assert match, "macro caption/result line not where the parser expects"
    line = match.group(1)
    got = {
        "precision": float(re.search(PRECISION_REGEX, line).group(1)),
        "recall": float(re.search(RECALL_REGEX, line).group(1)),
        "f1": float(re.search(F1_REGEX, line).group(1)),
    }
    for k in got:
        assert math.isclose(got[k], round(macro[k] * 100.0, 2), abs_tol=1e-9), (
            k, got[k], macro[k]
        )


def test_semeval_official_report_golden_text():
    """Byte-exact golden of the report layout (perl scorer's printf shape):
    pins spacing, captions, the count fractions, and the trailing official
    line — format drifts the regex round-trip can't see (e.g. padding
    changes that still match \\s*) fail here."""
    from relex_spark.metrics.f1 import format_semeval_official_report

    report = format_semeval_official_report(
        {"precision": 0.5, "recall": 0.25, "f1": 1 / 3},
        micro={"precision": 0.625, "recall": 0.5, "f1": 0.5555555555},
        counts=(5, 8, 10),
    )
    golden = (
        "<<< (9+1)-WAY EVALUATION TAKING DIRECTIONALITY INTO ACCOUNT"
        " -- OFFICIAL >>>:\n"
        "\n"
        "Micro-averaged result (excluding Other):\n"
        "P = 5/8 =  62.50%     R = 5/10 =  50.00%     F1 =  55.56%\n"
        "\n"
        "MACRO-averaged result (excluding Other):\n"
        "P =  50.00%     R =  25.00%     F1 =  33.33%\n"
        "\n"
        "<<< The official score is (9+1)-way evaluation with directionality"
        " taken into account: macro-averaged F1 = 33.33% >>>\n"
    )
    assert report == golden
