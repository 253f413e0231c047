"""Spark-vs-DuckDB column TYPE parity for every oracle-checked query.

The driver's value hash is width-sensitive in at least one class: an
uncast DuckDB SUM() over integers is HUGEINT (int128) and hash-mismatches
Spark's BIGINT — the exact failure CORRECTNESS_r01 recorded for
e1_f1_counts. This test pins every oracle's column types to Spark's, so
a new query can't reintroduce the class (the value-level comparator in
scripts/check_oracles.py normalizes ints and would NOT catch it)."""

import duckdb
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.001"

# duckdb type -> equivalent spark simpleString
TYPE_MAP = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "TIMESTAMP": "timestamp_ntz",
    "FLOAT": "float",
    "DATE": "date",
}


def test_every_oracle_matches_spark_column_types(spark):
    import __spark_entry__ as entry_mod
    from relex_spark.plans import driver_queries as dq

    queries = {**entry_mod.queries(), **dq.EXTRA_QUERIES}
    oracles = {**entry_mod.oracle_sql(), **dq.EXTRA_ORACLES}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    mismatches = []
    for name in sorted(oracles):
        sdf = queries[name](spark, SF_DIR)       # lazy — no execution
        stypes = dict(sdf.dtypes)
        rel = con.sql(oracles[name])
        dtypes = {c.lower(): str(t) for c, t in zip(rel.columns, rel.types)}
        for c, st in stypes.items():
            dt = dtypes.get(c.lower())
            if dt is None:
                mismatches.append((name, c, st, "MISSING IN ORACLE"))
                continue
            want = TYPE_MAP.get(dt.split("(")[0], dt.lower())
            if want == st:
                continue
            if want == "timestamp_ntz" and st.startswith("timestamp"):
                continue
            if dt.startswith("DECIMAL") and st.startswith("decimal"):
                continue
            mismatches.append((name, c, st, dt))
    con.close()
    assert not mismatches, (
        "oracle column types diverge from Spark (HUGEINT from an uncast "
        f"SUM is the classic driver hash-killer): {mismatches}"
    )


def test_no_query_emits_complex_typed_columns(spark):
    """The driver canonicalizes results through pandas sort_values, which
    dies on unhashable cells — an ARRAY<FLOAT> output column was
    CORRECTNESS_r01's one hard ERROR (mm_decode_features). Every
    registered query (including rows-only ones) must emit scalar columns
    only."""
    import __spark_entry__ as entry_mod
    from pyspark.sql import types as T

    from relex_spark.plans import driver_queries as dq

    offenders = []
    registry = {**entry_mod.queries(), **dq.EXTRA_QUERIES}
    for name, fn in sorted(registry.items()):
        sdf = fn(spark, SF_DIR)  # lazy
        for f in sdf.schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders
