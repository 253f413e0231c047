"""Unit goldens for graph analytics + dedup representative selection
(full-corpus paths oracle-checked via x_pagerank / dedup_keep_best)."""

from relex_spark.operators.dedup import keep_best_per_cluster
from relex_spark.operators.graph_metrics import degree_stats, pagerank


def _edges(spark):
    return spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], ["src", "dst"]
    )


def test_degree_stats_golden(spark):
    rows = {r["node"]: r for r in degree_stats(_edges(spark)).collect()}
    assert (rows["a"]["out_degree"], rows["a"]["in_degree"]) == (2, 0)
    assert (rows["b"]["out_degree"], rows["b"]["in_degree"]) == (1, 1)
    assert (rows["c"]["out_degree"], rows["c"]["in_degree"]) == (0, 2)


def test_pagerank_two_iterations_golden(spark):
    # iter1: a=0.15, b=0.15+0.85*(1/2)=0.575, c=0.15+0.85*(1/2+1)=1.425
    # iter2: a=0.15, b=0.15+0.85*(0.15/2)=0.21375,
    #        c=0.15+0.85*(0.15/2+0.575)=0.7025
    rows = {r["node"]: r["rank"] for r in pagerank(_edges(spark), 2).collect()}
    assert abs(rows["a"] - 0.15) < 1e-12
    assert abs(rows["b"] - 0.21375) < 1e-12
    assert abs(rows["c"] - 0.7025) < 1e-12


def test_keep_best_per_cluster_golden(spark):
    docs = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (4, 1.0)], ["doc_id", "quality"]
    )
    clusters = spark.createDataFrame(
        [("1", "1"), ("2", "1"), ("3", "1")], ["node", "component"]
    )
    rows = {r["doc_id"]: r for r in keep_best_per_cluster(docs, clusters).collect()}
    assert rows[2]["is_kept"] is True          # max quality, tie -> min id
    assert rows[3]["is_kept"] is False
    assert rows[1]["is_kept"] is False
    assert rows[4]["is_kept"] is True          # unpaired -> own cluster
    assert rows[4]["cluster"] == "4"
    assert rows[1]["cluster"] == rows[2]["cluster"] == "1"


def test_pagerank_matches_numpy_reference_on_random_graph(spark):
    """Seeded random digraph: the DataFrame loop must match an independent
    dense numpy power-iteration implementation exactly (same simple-PageRank
    semantics: uniform init, no dangling redistribution)."""
    import numpy as np

    rng = np.random.default_rng(20260817)
    n = 12
    edges = sorted(
        {
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(40, 2))
            if a != b
        }
    )
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    out_deg = np.zeros(len(nodes))
    for a, _ in edges:
        out_deg[idx[a]] += 1
    rank = np.ones(len(nodes))
    for _ in range(3):
        nxt = np.full(len(nodes), 0.15)
        for a, b in edges:
            nxt[idx[b]] += 0.85 * rank[idx[a]] / out_deg[idx[a]]
        rank = nxt

    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges], ["src", "dst"]
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, 3).collect()}
    assert set(got) == {str(v) for v in nodes}
    for v in nodes:
        assert abs(got[str(v)] - rank[idx[v]]) < 1e-9, v


def test_triangle_counts_k4_plus_pendant(spark):
    from relex_spark.operators.graph_metrics import triangle_counts

    # K4 on a,b,c,d (4 triangles, each vertex in 3) + pendant edge d-e
    # (e has none); input deliberately messy: duplicates, self-loop,
    # reversed direction
    k4 = [(x, y) for i, x in enumerate("abcd") for y in "abcd"[i + 1:]]
    edges = spark.createDataFrame(
        k4 + [("b", "a"), ("c", "c"), ("d", "e"), ("a", "b")],
        "src string, dst string",
    )
    got = {r["node"]: r["triangles"] for r in triangle_counts(edges).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 0}


def test_triangle_counts_match_bruteforce_on_hashed_graph(spark):
    import hashlib
    from itertools import combinations

    from relex_spark.operators.graph_metrics import triangle_counts

    # deterministic pseudo-random graph on 12 nodes (~40% density)
    nodes = [f"n{i:02d}" for i in range(12)]
    und = set()
    for x, y in combinations(nodes, 2):
        h = int(hashlib.md5(f"{x}|{y}".encode()).hexdigest()[:4], 16)
        if h % 5 < 2:
            und.add((x, y))
    expect = {n: 0 for n in nodes}
    for t in combinations(nodes, 3):
        if all(tuple(sorted(p)) in und for p in combinations(t, 2)):
            for n in t:
                expect[n] += 1
    df = spark.createDataFrame(sorted(und), "src string, dst string")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    # operator reports nodes of the deduped graph; isolated nodes absent
    in_graph = {n for e in und for n in e}
    assert got == {n: c for n, c in expect.items() if n in in_graph}
