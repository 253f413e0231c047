"""G1–G5 goldens pinned from the reference's own tests
(tests/dataset_readers/tacred_test.py:323-371): 77 unpruned edges and 37
k=1 SDP-pruned edges for TACRED fixture row 1."""

import json

from relex_spark.graph.adjacency import clip_edges, densify, dep_tree_edges
from relex_spark.sources.readers import read_tacred_json, tacred_to_candidates
from relex_spark.graph.adjacency import with_adjacency

TACRED = "relex_spark/data/tacred_fixture.json"

UNPRUNED_77 = [
    (0, 0), (0, 3), (1, 1), (1, 3), (2, 2), (2, 3), (3, 0), (3, 1),
    (3, 2), (3, 3), (3, 11), (4, 4), (4, 11), (5, 5), (5, 9), (6, 6),
    (6, 9), (7, 7), (7, 9), (8, 8), (8, 9), (9, 5), (9, 6), (9, 7),
    (9, 8), (9, 9), (9, 11), (10, 10), (10, 11), (11, 3), (11, 4),
    (11, 9), (11, 10), (11, 11), (11, 12), (11, 13), (11, 14),
    (11, 25), (12, 11), (12, 12), (13, 11), (13, 13), (14, 11),
    (14, 14), (14, 16), (15, 15), (15, 16), (16, 14), (16, 15),
    (16, 16), (16, 19), (17, 17), (17, 19), (18, 18), (18, 19),
    (19, 16), (19, 17), (19, 18), (19, 19), (19, 21), (20, 20),
    (20, 21), (21, 19), (21, 20), (21, 21), (21, 24), (22, 22),
    (22, 24), (23, 23), (23, 24), (24, 21), (24, 22), (24, 23),
    (24, 24), (25, 11), (25, 25),
]

PRUNED_37 = [
    (3, 3), (3, 11), (4, 4), (4, 11), (5, 5), (5, 9), (6, 6), (6, 9),
    (7, 7), (7, 9), (8, 8), (8, 9), (9, 5), (9, 6), (9, 7), (9, 8),
    (9, 9), (9, 11), (10, 10), (10, 11), (11, 3), (11, 4), (11, 9),
    (11, 10), (11, 11), (11, 12), (11, 13), (11, 14), (11, 25),
    (12, 11), (12, 12), (13, 11), (13, 13), (14, 11), (14, 14),
    (25, 11), (25, 25),
]


def _fixture_row1():
    with open(TACRED) as f:
        data = json.load(f)
    ex = data[0]
    return (
        ex["stanford_head"],
        len(ex["token"]),
        (ex["subj_start"], ex["subj_end"]),
        (ex["obj_start"], ex["obj_end"]),
    )


def test_unpruned_adjacency_golden():
    heads, n, head, tail = _fixture_row1()
    edges = dep_tree_edges(heads, n, head, tail, prune=-1)
    assert edges == sorted(UNPRUNED_77)


def test_k1_pruned_adjacency_golden():
    heads, n, head, tail = _fixture_row1()
    edges = dep_tree_edges(heads, n, head, tail, prune=1)
    assert edges == sorted(PRUNED_37)


def test_edge_clipping_and_densify():
    heads, n, head, tail = _fixture_row1()
    edges = dep_tree_edges(heads, n, head, tail, prune=-1)
    clipped = clip_edges(edges, max_len=10)
    assert all(s < 10 and d < 10 for s, d in clipped)
    a = densify(clipped, 10)
    assert a.shape == (10, 10)
    assert a.sum() == len(clipped)
    # symmetric + self-loops on surviving nodes
    assert (a == a.T).all()


def test_with_adjacency_spark(spark):
    df = tacred_to_candidates(read_tacred_json(spark, TACRED), max_len=100)
    out = with_adjacency(df, prune=1, max_len=100)
    row = out.where(out["id"] == "e7798fb926b9403cfcd2").collect()[0]
    got = sorted((e["src"], e["dst"]) for e in row["adjacency"])
    assert got == sorted(PRUNED_37)


def test_sdp_forest_without_common_ancestor_keeps_both_paths():
    """Multi-root/fragment parses (or cycle-truncated chains) can leave the
    two spans with NO common ancestor — must keep both ancestor paths, not
    crash the Arrow task with StopIteration."""
    from relex_spark.graph.adjacency import sdp_kept_nodes

    # two roots: token 0 is its own root, token 2 is a second root with
    # child token 1... dep_heads are 1-based with 0 = root
    dep_heads = [0, 3, 0]
    kept, lca = sdp_kept_nodes(dep_heads, 3, (0, 0), (1, 1), prune=0)
    assert 0 in kept and 1 in kept
    assert lca in kept


def test_zero_token_rows_defined_for_all_encoders(spark):
    """Empty-text candidates (predict_json on whitespace input) must yield
    finite scores on EVERY encoder, not NaN from -inf max pools."""
    import math

    from relex_spark.plans.kg_pipeline import KGPipelineConfig
    from relex_spark.scoring.scorer import broadcast_weights, score_candidates

    w = KGPipelineConfig().resolved_weights()
    wbc = broadcast_weights(spark, w)
    rows = [("empty", [], 0, 0, 0, 0, [])]
    cands = spark.createDataFrame(
        rows,
        "id string, tokens array<string>, head_start int, head_end int, "
        "tail_start int, tail_end int, "
        "adjacency array<struct<src:int,dst:int>>",
    )
    for encoder in ("cnn", "boe_sum", "bilstm", "attention", "gcn", "gat"):
        out = score_candidates(
            cands, wbc, keep_columns=["id"], encoder=encoder, with_probs=True
        ).collect()
        assert len(out) == 1, encoder
        assert out[0]["label"] in w.labels, encoder
        assert all(math.isfinite(p) for p in out[0]["probs"]), encoder
