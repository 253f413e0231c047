"""Similarity search over embedding columns (ARRAY<FLOAT>).

* ``cosine_topk`` — brute-force exact top-k: query set × corpus with the
  dot product as a pure SQL ``aggregate(zip_with(...))`` (JVM-side, no
  Python). Baseline and oracle-checkable.
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH buckets
  (signs of portable hashed projections), candidates restricted to matching
  buckets, exact rerank within. Bucket assignment is pure SQL; at 100 TB
  the corpus-side bucket id becomes a partition/bucket key so a query only
  shuffles against its own buckets.

Ranking determinism: rank on ROUND(cos, 6) with id tie-break, so float
association order across engines cannot flip ranks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, neighbor_id, rank, cos_sim).

    The query side is expected to be small (broadcast); corpus scan is a
    single pass, ranking via per-query window."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    cos = F.round(
        _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))),
        6,
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def hyperplane_bucket(vec: Column, n_planes: int, dim: int, seed: str = "lsh") -> Column:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1), pure SQL.

    Plane p's normal components are deterministic pseudo-randoms
    h(seed,p,j) mapped to ±1; the bucket bit is the projection's sign.
    Engine-independent (md5-based), so corpus bucketing is reproducible
    across runs and clusters — required for incremental index maintenance.
    """
    from relex_spark.functions.text import portable_hash64

    def signed_term(p: int):
        # two-parameter lambda REQUIRED: pyspark dispatches by arity, so the
        # plane index must be a closure, not a defaulted third parameter
        return lambda v, j: v.cast("double") * F.when(
            portable_hash64(F.concat(F.lit(f"{seed}:{p}:"), j.cast("string"))) % 2
            == 0,
            1.0,
        ).otherwise(-1.0)

    bucket = F.lit(0).cast("int")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.lit(dim - 1)), signed_term(p)),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**p)).otherwise(0)
    return bucket


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: candidates share the query's hyperplane bucket; exact cosine
    rerank within the bucket. Recall < 1 by construction (probe only one
    bucket); scale path for corpora where brute force is infeasible."""
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        hyperplane_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        hyperplane_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    cos = F.round(
        _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))),
        6,
    )
    scored = (
        F.broadcast(qb)
        .join(cb, (qb["bucket"] == cb["bucket"]) & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids (by cosine).

    Centroids are a tiny dimension (broadcast); assignment is a broadcast
    cross-join + per-vector top-nprobe window — one narrow pass over the
    corpus, the IVF build/probe primitive.
    Output: (id, v, centroid_id, crank) with crank in 1..nprobe.
    """
    cen = F.broadcast(
        centroids.select(
            F.col("centroid_id"), F.col("cv").alias("centroid_vec")
        )
    )
    sim = _dot(F.col("v"), F.col("centroid_vec")) / (
        _norm(F.col("v")) * _norm(F.col("centroid_vec"))
    )
    scored = (
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .crossJoin(cen)
        .select("id", "v", "centroid_id", sim.alias("csim"))
    )
    w = Window.partitionBy("id").orderBy(F.desc("csim"), F.asc("centroid_id"))
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .where(F.col("crank") <= nprobe)
        .select("id", "v", "centroid_id", "crank")
    )


def seeded_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF 'training': pick n_centroids corpus vectors by
    portable hash order (reproducible across runs/partitionings — the
    engine-wide determinism rule). A Lloyd refinement is one extra
    groupBy(centroid_id).agg(avg per dim) round if ever needed; seeded
    selection is the documented contract here."""
    from relex_spark.functions.text import portable_hash64

    w = Window.orderBy(
        portable_hash64(F.concat(F.lit("ivf:"), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    return (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= n_centroids)
        .select(
            (F.col("__r") - 1).cast("int").alias("centroid_id"),
            F.col(vec_col).alias("cv"),
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: corpus vectors bucketed by nearest centroid (inverted
    file); each query probes its ``nprobe`` nearest centroids' lists and
    exact-cosine-reranks only those candidates. Recall grows with nprobe
    (nprobe == n_centroids degenerates to brute force). The scale shape:
    centroid assignment is one narrow broadcast pass, the probe join is an
    equi-join on centroid_id — shuffle proportional to probed candidates,
    never |queries|×|corpus|.
    """
    cents = seeded_centroids(corpus, n_centroids, id_col, vec_col)
    lists = ivf_assign(corpus, cents, nprobe=1, id_col=id_col, vec_col=vec_col)
    probes = ivf_assign(queries, cents, nprobe=nprobe, id_col=id_col, vec_col=vec_col)
    cos = F.round(
        _dot(F.col("qv"), F.col("cv2")) / (_norm(F.col("qv")) * _norm(F.col("cv2"))),
        6,
    )
    cand = (
        probes.select(
            F.col("id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("centroid_id"),
        )
        .join(
            lists.select(
                F.col("id").alias("neighbor_id"),
                F.col("v").alias("cv2"),
                F.col("centroid_id"),
            ),
            "centroid_id",
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
