"""The golden-regen guard must refuse to launder a seeded behavior bug into
the goldens (scripts/regen_kg_goldens.py is the only writer of
relex_spark/plans/kg_goldens.py, and the goldens are generated FROM the
pipeline — so the refuse-on-divergence guards are the process invariant
that keeps them trustworthy)."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SMALL_SF_DIR", "/root/testdata/sf0.001")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def regen():
    for p in (os.path.join(_REPO, "scripts"), os.path.join(_REPO, "tests")):
        if p not in sys.path:
            sys.path.insert(0, p)
    spec = importlib.util.spec_from_file_location(
        "regen_kg_goldens", os.path.join(_REPO, "scripts", "regen_kg_goldens.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_guard_passes_on_healthy_pipeline(spark, regen):
    regen.verify_independent_oracles(spark, SF_DIR)


def test_guard_refuses_seeded_preprocess_mutation(spark, regen, monkeypatch):
    """A +1 shift seeded into preprocessing must make the independent-oracle
    guard refuse (this is the launder-a-bug-into-the-golden scenario)."""
    from pyspark.sql import functions as F

    from relex_spark.plans import kg_pipeline

    real = kg_pipeline.preprocess_candidates

    def mutated(candidates, max_len):
        return real(candidates, max_len).withColumn(
            "head_start", F.col("head_start") + 1
        )

    monkeypatch.setattr(kg_pipeline, "preprocess_candidates", mutated)
    with pytest.raises(RuntimeError, match="REFUSING regen"):
        regen.verify_independent_oracles(spark, SF_DIR)


def test_guard_refuses_seeded_kernel_mutation(spark, regen, monkeypatch):
    """A score perturbation seeded into the scoring stage must make the
    per-row kernel-parity guard refuse."""
    from pyspark.sql import functions as F

    from relex_spark.plans import kg_pipeline
    from relex_spark.plans.kg_pipeline import KGPipelineConfig
    from relex_spark.sources.transcripts import transcripts_from_documents

    real = kg_pipeline.score_candidates

    def mutated(*args, **kwargs):
        return real(*args, **kwargs).withColumn(
            "score", F.col("score") + F.lit(0.01)
        )

    monkeypatch.setattr(kg_pipeline, "score_candidates", mutated)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(RuntimeError, match="REFUSING regen"):
        regen.verify_kernel_parity(
            spark, transcripts_from_documents(docs), KGPipelineConfig()
        )
