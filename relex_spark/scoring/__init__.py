"""Relation-scoring stage: broadcast numpy weights + mapInPandas kernel."""

from relex_spark.scoring.weights import ModelWeights, build_fixture_weights  # noqa: F401
from relex_spark.scoring.scorer import score_candidates  # noqa: F401
