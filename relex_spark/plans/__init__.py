"""End-to-end pipeline plans."""

from relex_spark.plans.kg_pipeline import KGPipelineConfig, run_kg_pipeline, build_triples  # noqa: F401
from relex_spark.plans.predict import predict_records  # noqa: F401
