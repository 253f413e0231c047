"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship KG-construction pipeline: derive a transcript
table deterministically from sf0.001 documents (with planted SemEval gold
sentences), run mention detection → pair generation → CNN relation scoring
→ canonicalization, return canonical (subj, pred, obj) triples.

``queries()`` / ``oracle_sql()`` — operator registry from
relex_spark.plans.driver_queries (SURVEY.md §2 coverage; each Spark query
paired with an independent DuckDB formulation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    from relex_spark.plans.kg_pipeline import KGPipelineConfig, run_kg_pipeline
    from relex_spark.sources.transcripts import transcripts_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    transcripts = transcripts_from_documents(docs)
    return run_kg_pipeline(spark, transcripts, KGPipelineConfig())


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from relex_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from relex_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)
