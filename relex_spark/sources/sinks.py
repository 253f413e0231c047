"""Sinks + the stage checkpoint/commit protocol (reference §2.1 S6–S7; north
rule: "checkpoint after each stage so any partition can resume without
recomputation", per-partition lineage + counters).

Iceberg note: this sandbox has no Iceberg catalog jars, so stages commit as
parquet directories with an atomic JSON manifest — the same contract an
Iceberg snapshot commit provides (all-or-nothing visibility + metadata). On
a cluster with a catalog, ``write_stage`` switches to
``df.writeTo(table).createOrReplace()`` and the manifest content moves into
snapshot summary properties; callers are unaffected.

Lineage: every stage output carries provenance columns added by
``with_lineage`` — the partition id the row was produced by and the stage
name — and the manifest records per-partition row counts, so a resume can
verify which partitions are complete.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_relex_stage_manifest.json"


def with_lineage(df: DataFrame, stage: str) -> DataFrame:
    """Attach per-row lineage: producing stage + physical partition id.

    ``spark_partition_id`` is evaluated at write time, so it records the
    actual producing task — the north rule's per-partition lineage.
    """
    return df.withColumn("_stage", F.lit(stage)).withColumn(
        "_partition_id", F.spark_partition_id()
    )


def write_stage(
    df: DataFrame,
    path: str,
    stage: str,
    partition_by: list[str] | None = None,
    lineage: bool = True,
) -> dict:
    """Write a stage output with an atomic commit manifest.

    The parquet write itself is atomic-by-rename (Spark committer); the
    manifest is written only after success, so ``stage_is_complete`` is a
    reliable resume marker. Returns the manifest dict (counters included).
    """
    out = with_lineage(df, stage) if lineage else df
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

    spark = df.sparkSession
    committed = spark.read.parquet(path)
    if lineage:
        per_part = {
            str(r["_partition_id"]): r["cnt"]
            for r in committed.groupBy("_partition_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        rows = sum(per_part.values())
    else:
        per_part = {}
        rows = committed.count()

    manifest = {
        "stage": stage,
        "rows": rows,
        "partition_counts": per_part,
        "committed_at_unix": int(time.time()),
        "schema": committed.schema.simpleString(),
    }
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(path, MANIFEST))
    return manifest


def stage_is_complete(path: str, stage: str) -> bool:
    """Resume check: a stage directory counts as complete only with a
    matching committed manifest."""
    mpath = os.path.join(path, MANIFEST)
    if not os.path.exists(mpath):
        return False
    try:
        with open(mpath) as f:
            return json.load(f).get("stage") == stage
    except (json.JSONDecodeError, OSError):
        return False


def read_stage(spark: SparkSession, path: str, drop_lineage: bool = False) -> DataFrame:
    df = spark.read.parquet(path)
    if drop_lineage:
        df = df.drop("_stage", "_partition_id")
    return df


def write_id_label_tsv(df: DataFrame, path: str) -> None:
    """S6: (id, label) TSV sink for scorer parity
    (relex/evaluation/semeval2010_task8_evaluation.py:11-17)."""
    df.select("id", "label").write.mode("overwrite").option("sep", "\t").csv(path)


# ---------------------------------------------------------------------------
# Iceberg commit branch (feature-flagged: this sandbox ships no Iceberg
# catalog jars, so the parquet+manifest protocol above is the default).
#
# Cluster setup (spark-defaults or --conf):
#   spark.sql.catalog.<cat>                 org.apache.iceberg.spark.SparkCatalog
#   spark.sql.catalog.<cat>.type            hadoop           (or hive/rest)
#   spark.sql.catalog.<cat>.warehouse       s3://bucket/warehouse
#   spark.jars.packages  org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:<ver>
# then export RELEX_ICEBERG_CATALOG=<cat> and pass fully-qualified table
# names (<cat>.<db>.<table>) to write_stage_iceberg. The stage manifest's
# role is played by the Iceberg snapshot (atomic all-or-nothing commit);
# the stage marker moves into a table property so resume checks stay
# one lookup.
# ---------------------------------------------------------------------------

ICEBERG_CATALOG_ENV = "RELEX_ICEBERG_CATALOG"


def iceberg_enabled() -> bool:
    return bool(os.environ.get(ICEBERG_CATALOG_ENV))


def write_stage_iceberg(
    df: DataFrame,
    table: str,
    stage: str,
    partition_by: list[str] | None = None,
    lineage: bool = True,
):
    """Iceberg twin of ``write_stage``: same contract (atomic commit,
    per-row lineage columns, stage marker for resume), expressed as a V2
    ``writeTo(...).createOrReplace()`` — one snapshot, all-or-nothing.
    Returns the configured writer's result (None from pyspark)."""
    out = with_lineage(df, stage) if lineage else df
    writer = (
        out.writeTo(table)
        .using("iceberg")
        .tableProperty("relex.stage", stage)
        .tableProperty("relex.lineage", "true" if lineage else "false")
    )
    if partition_by:
        writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
    return writer.createOrReplace()


# AnalysisException error classes that mean "the stage table genuinely does
# not exist" — ONLY these may map to False in stage_is_complete_iceberg. On
# real catalogs (REST/Hive) AnalysisException also wraps auth failures and
# catalog outages, which must propagate: treating them as "not done" would
# silently recompute and replace a potentially-committed snapshot.
_ICEBERG_ABSENT_ERROR_CLASSES = {
    "TABLE_OR_VIEW_NOT_FOUND",
    "CATALOG_NOT_FOUND",
    # Spark routes an unknown catalog prefix through the session catalog and
    # fails multipart-name resolution with this class.
    "REQUIRES_SINGLE_PART_NAMESPACE",
}


def stage_is_complete_iceberg(spark: SparkSession, table: str, stage: str) -> bool:
    """Resume check on the Iceberg branch: the table exists and its
    ``relex.stage`` property matches (set atomically with the snapshot)."""
    from pyspark.errors import AnalysisException

    try:
        rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    except AnalysisException as e:
        # Narrow to "table/catalog genuinely absent" by error class (message
        # fallback for error-class-less exceptions from older connectors).
        # Spark 4 renamed getErrorClass -> getCondition (old name deprecated).
        get_cls = getattr(e, "getCondition", None) or getattr(
            e, "getErrorClass", None
        )
        cls = get_cls() if get_cls else None
        if cls in _ICEBERG_ABSENT_ERROR_CLASSES:
            return False
        if cls is None and (
            "TABLE_OR_VIEW_NOT_FOUND" in str(e)
            or "Table or view not found" in str(e)
        ):
            return False
        raise
    props = {r["key"]: r["value"] for r in rows}
    return props.get("relex.stage") == stage
