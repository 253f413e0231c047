"""Graph analytics over materialized edge tables (the KG consumer side):
degree statistics and fixed-iteration PageRank.

PageRank here is the standard Pregel-shaped DataFrame loop: per iteration
one equi-join (edges x ranks on src) and one aggregation (sum of
contributions by dst) — shuffle per iteration is proportional to |edges|,
exactly like `canonicalize.connected_components`. Lineage is truncated
with a lazy localCheckpoint per iteration so the plan does not grow
exponentially with iterations (the same discipline as the CC loop).
Fixed iteration count (not convergence-tested) keeps it deterministic and
DuckDB-oracle-checkable via unrolled CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from relex_spark.operators.textstats import micro_units


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-node in/out degree over a (src, dst) edge table — one
    aggregation per direction, outer-merged so single-direction nodes
    appear with a zero."""
    out_d = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("out_degree")
    )
    in_d = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration simple PageRank (uniform init 1.0, no dangling-mass
    redistribution — the textbook simplification; dangling nodes keep
    rank (1-d) + inbound contributions, they just don't emit).

    Returns (node, rank) for every node appearing as src or dst.
    """
    edges = edges.select("src", "dst")
    out_deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    e = edges.join(out_deg, "src").localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inbound"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("inbound", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def pagerank_u6(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Oracle-facing projection: ranks in engine-portable micro-units."""
    r = pagerank(edges, iterations=iterations)
    return r.select("node", micro_units(F.col("rank")).alias("rank_u6"))
