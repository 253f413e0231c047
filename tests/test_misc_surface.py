"""S6 TSV sink, S7/S8 experiment result sinks+scans, E6 multi-experiment
eval, mention-detection strategy parity (map-literal vs broadcast-join),
and the stage registry."""

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from relex_spark.functions.registry import lookup, names
from relex_spark.operators.candidates import (
    detect_mentions,
    detect_mentions_join,
    generate_candidate_pairs,
)
from relex_spark.plans.experiments import (
    evaluate_experiments,
    read_experiment_results,
    summarize_trials,
    write_result_json,
)
from relex_spark.plans.kg_pipeline import KGPipelineConfig
from relex_spark.scoring.scorer import broadcast_weights
from relex_spark.sources.readers import read_semeval_jsonl, semeval_to_candidates
from relex_spark.sources.sinks import write_id_label_tsv
from relex_spark.sources.transcripts import (
    fixture_gazetteer_rows,
    gazetteer_df,
    synthesize_transcripts,
)


def test_registry_names():
    assert "cnn" in names("encoder")
    assert lookup("dataset_reader", "semeval2010_task8") is not None
    try:
        lookup("encoder", "nope")
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "available" in str(e)


def test_mention_detection_strategies_agree(spark):
    """Zero-shuffle map-literal path ≡ broadcast-join path: identical
    candidate pair sets on the same transcripts."""
    t = synthesize_transcripts(spark, n_convs=12)
    rows = fixture_gazetteer_rows()

    m1 = detect_mentions(t, rows, keep_text=False)
    p1 = {
        (r["id"], r["subj"], r["obj"], r["head_start"], r["tail_start"])
        for r in generate_candidate_pairs(m1).collect()
    }
    m2 = detect_mentions_join(t, gazetteer_df(spark), max_phrase_len=2)
    p2 = {
        (r["id"], r["subj"], r["obj"], r["head_start"], r["tail_start"])
        for r in generate_candidate_pairs(m2).collect()
    }
    assert p1 == p2 and p1


def test_tsv_sink_roundtrip(spark):
    out = tempfile.mkdtemp(prefix="relex_tsv_")
    try:
        df = spark.createDataFrame(
            [("1", "Other"), ("2", "Cause-Effect(e1,e2)")], "id string, label string"
        )
        write_id_label_tsv(df, f"{out}/labels")
        lines = []
        for f_ in glob.glob(f"{out}/labels/part-*"):
            with open(f_) as fh:
                lines += [ln.strip().split("\t") for ln in fh if ln.strip()]
        assert sorted(lines) == [["1", "Other"], ["2", "Cause-Effect(e1,e2)"]]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_experiments_roundtrip(spark):
    """E6 eval → S7 json sink → S8 glob scan → E7 summary."""
    cands = semeval_to_candidates(
        read_semeval_jsonl(spark, "relex_spark/data/semeval_fixture.jsonl"), 100
    )
    wbc = broadcast_weights(spark, KGPipelineConfig().resolved_weights())
    trials = evaluate_experiments(
        spark, {"trial_a": (cands, wbc), "trial_b": (cands, wbc)}
    )
    rows = trials.collect()
    assert len(rows) == 2

    tmp = tempfile.mkdtemp(prefix="relex_exp_")
    try:
        for r in rows:
            os.makedirs(f"{tmp}/{r['experiment']}", exist_ok=True)
            write_result_json(
                {
                    "experiment": r["experiment"],
                    "precision": r["precision"],
                    "recall": r["recall"],
                    "f1": r["f1"],
                },
                f"{tmp}/{r['experiment']}/result.json",
            )
        scanned = read_experiment_results(spark, f"{tmp}/*/result.json")
        assert scanned.count() == 2
        assert scanned.where(F.col("result_file").contains("trial_a")).count() == 1

        summary = summarize_trials(
            scanned.select("experiment", "precision", "recall", "f1")
        ).collect()
        assert {r["experiment"] for r in summary} == {"trial_a", "trial_b"}
        # identical weights → identical metrics → zero stddev
        assert all(abs(r["std_f1"]) < 1e-12 for r in summary)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
