"""JVM-local dimension tables from driver-side rows.

``spark.createDataFrame(rows)`` builds a PYTHON-RDD-backed plan: every
materialization (each broadcast build, each checkpoint, each collect) runs
``defaultParallelism`` tasks that each round-trip a Python worker —
measured ~150 ms per task, i.e. several seconds of pure overhead per query
for a 40-row gazetteer on local[32]. ``coalesce(1)`` is WORSE: the single
task pays all 32 Python-worker round-trips serially (interleaved A/B:
6.0 s vs 1.8 s on the negatives query).

``local_dim`` instead renders the rows as a SQL ``VALUES`` clause, which
parses straight to a ``LocalTableScan``: zero tasks, zero Python workers,
and broadcast builds read it driver-side. Intended for dim-sized data only
(gazetteers, label maps, fixture tables); the SQL text grows linearly with
the rows, so callers should stay under a few thousand rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SQL_TYPES = {"string", "int", "bigint", "double", "float", "boolean"}


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        import math

        # inline the cast so the VALUES column stays uniformly numeric
        # (a bare 'NaN' string cell makes the inline table type-incompatible)
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            sign = "" if v > 0 else "-"
            return f"CAST('{sign}Infinity' AS DOUBLE)"
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    raise TypeError(f"local_dim cell type not supported: {type(v)!r}")


def local_dim(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """DataFrame over driver-side rows as a pure-JVM LocalRelation.

    ``schema`` is a DDL string like ``"surface string, entity_id string"``;
    every cell is CAST to the declared type, so int/bigint and float/double
    distinctions are exact. Rows may be tuples or single values (1-column).
    """
    # String cells are escaped for Spark's DEFAULT string-literal mode
    # (backslash escapes). Under spark.sql.parser.escapedStringLiterals=true
    # neither backslash nor doubled-quote escaping applies inside
    # single-quoted literals, so quoting-sensitive cells cannot be rendered
    # safely — fail loudly instead of corrupting data.
    if (
        spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
        == "true"
        and any(
            isinstance(v, str) and ("'" in v or "\\" in v)
            for row in rows
            for v in (row if isinstance(row, (tuple, list)) else (row,))
        )
    ):
        raise ValueError(
            "local_dim cannot escape quotes/backslashes under "
            "spark.sql.parser.escapedStringLiterals=true — unset it or use "
            "createDataFrame for this dim"
        )
    fields = []
    for part in schema.split(","):
        name, typ = part.strip().rsplit(" ", 1)
        typ = typ.lower()
        if typ not in _SQL_TYPES:
            raise ValueError(f"local_dim type not supported: {typ}")
        fields.append((name.strip().strip("`"), typ))
    ncol = len(fields)
    select = ", ".join(
        f"CAST(c{i} AS {typ.upper()}) AS `{name}`"
        for i, (name, typ) in enumerate(fields)
    )
    colnames = ", ".join(f"c{i}" for i in range(ncol))
    if not rows:
        nulls = ", ".join("NULL" for _ in range(ncol))
        return spark.sql(
            f"SELECT {select} FROM (VALUES ({nulls})) AS t({colnames}) WHERE 1 = 0"
        )
    tuples = []
    for row in rows:
        if not isinstance(row, (tuple, list)):
            row = (row,)
        if len(row) != ncol:
            raise ValueError(f"row arity {len(row)} != schema arity {ncol}")
        tuples.append("(" + ", ".join(_lit(v) for v in row) + ")")
    return spark.sql(
        f"SELECT {select} FROM (VALUES {', '.join(tuples)}) AS t({colnames})"
    )
