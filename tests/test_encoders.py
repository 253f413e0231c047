"""M9 BiLSTM / M10 self-attention / M13 GAT encoder kernels: batch
independence (padding/masking correctness — the bug class that matters),
shape contracts, determinism, and end-to-end scoring through the Spark
stage."""

import numpy as np
import pytest

from relex_spark.graph.adjacency import dep_tree_edges, with_adjacency
from relex_spark.plans.kg_pipeline import KGPipelineConfig
from relex_spark.scoring.kernels import forward_batch
from relex_spark.scoring.scorer import broadcast_weights, score_candidates
from relex_spark.sources.readers import read_tacred_json, tacred_to_candidates
from relex_spark.sources.transcripts import load_semeval_fixture

TACRED = "relex_spark/data/tacred_fixture.json"


@pytest.fixture(scope="module")
def weights():
    return KGPipelineConfig().resolved_weights()


def _fixture_batch(weights, idxs):
    fixture = load_semeval_fixture()
    ids_list, heads, tails = [], [], []
    for i in idxs:
        ex = fixture[i]
        ids_list.append(weights.token_ids(ex["tokens"]))
        (h0, h1), (t0, t1) = ex["entities"]
        heads.append((h0, h1 - 1))
        tails.append((t0, t1 - 1))
    return ids_list, np.array(heads), np.array(tails)


@pytest.mark.parametrize("encoder", ["bilstm", "attention"])
def test_encoder_batch_independence(weights, encoder):
    """Row 3 (8 tokens) scored alone vs padded next to row 6 (36 tokens):
    identical probabilities — masking/padding leaks would break this."""
    ids_a, h_a, t_a = _fixture_batch(weights, [3])
    ids_m, h_m, t_m = _fixture_batch(weights, [3, 6])
    solo, _ = forward_batch(weights, ids_a, h_a, t_a, encoder=encoder)
    mixed, _ = forward_batch(weights, ids_m, h_m, t_m, encoder=encoder)
    assert np.allclose(solo[0], mixed[0], atol=1e-5), encoder


@pytest.mark.parametrize("encoder", ["bilstm", "attention"])
def test_encoder_probs_valid_and_deterministic(weights, encoder):
    ids, h, t = _fixture_batch(weights, list(range(10)))
    p1, a1 = forward_batch(weights, ids, h, t, encoder=encoder)
    p2, a2 = forward_batch(weights, ids, h, t, encoder=encoder)
    assert np.allclose(p1.sum(axis=1), 1.0, atol=1e-5)
    assert (a1 == a2).all() and np.allclose(p1, p2)
    # different spans must be able to change the prediction distribution
    p3, _ = forward_batch(weights, ids, t, h, encoder=encoder)
    assert not np.allclose(p1, p3)


def test_gat_batch_independence(weights):
    heads_a = [2, 3, 0, 3]
    edges_a = dep_tree_edges(heads_a, 4, (1, 1), (3, 3), prune=-1)
    edges_b = [(i, i) for i in range(20)]
    ids_a = weights.token_ids(["the", "system", "works", "."])
    ids_b = weights.token_ids(["a"] * 20)
    solo, _ = forward_batch(
        weights, [ids_a], np.array([[1, 1]]), np.array([[3, 3]]),
        encoder="gat", adjacency=[edges_a],
    )
    mixed, _ = forward_batch(
        weights, [ids_a, ids_b],
        np.array([[1, 1], [0, 0]]), np.array([[3, 3], [5, 5]]),
        encoder="gat", adjacency=[edges_a, edges_b],
    )
    assert np.allclose(solo[0], mixed[0], atol=1e-5)


def test_all_encoders_end_to_end_spark(spark, weights):
    """Every encoder scores the TACRED fixture through the real Spark
    stage and emits one label per candidate."""
    cands = tacred_to_candidates(read_tacred_json(spark, TACRED), max_len=100)
    with_adj = with_adjacency(cands, prune=1, max_len=100)
    wbc = broadcast_weights(spark, weights)
    for encoder in ["cnn", "boe_sum", "bilstm", "attention", "gcn", "gat"]:
        scored = score_candidates(
            with_adj, wbc, keep_columns=["id"], encoder=encoder
        )
        rows = scored.collect()
        assert len(rows) == 3, encoder
        assert all(r["label"] in weights.labels for r in rows), encoder


def test_attention_matches_per_row_oracle(weights):
    """M10 kernel vs the independent per-row pure-Python oracle
    (tests/oracle_model.py): same labels and probabilities on fixture
    sentences — pins the AllenNLP block structure (ff sublayer + both
    layer norms), not just shape/masking behavior."""
    from tests.oracle_model import oracle_predict_attention

    fixture = load_semeval_fixture()
    idxs = [0, 3, 6]
    ids_list, hs, ts = _fixture_batch(weights, idxs)
    probs, argmax = forward_batch(weights, ids_list, hs, ts, encoder="attention")
    for row, i in enumerate(idxs):
        ex = fixture[i]
        (h0, h1), (t0, t1) = ex["entities"]
        label, oprobs = oracle_predict_attention(
            weights, ex["tokens"], (h0, h1 - 1), (t0, t1 - 1)
        )
        assert weights.labels[argmax[row]] == label, i
        assert np.allclose(probs[row], oprobs, atol=1e-4), i


def test_gat_matches_per_row_oracle(spark, weights):
    """M13 kernel vs the independent per-row pure-Python GAT oracle on the
    TACRED fixture's pruned adjacency — including SDP-isolated nodes,
    which must output 0 (the isolated-node uniform-attention defect this
    parity would have caught)."""
    import numpy as np

    from relex_spark.graph.adjacency import with_adjacency
    from relex_spark.scoring.scorer import broadcast_weights, score_candidates
    from relex_spark.sources.readers import read_tacred_json, tacred_to_candidates
    from tests.oracle_model import oracle_predict_gat

    import os

    fixture = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "relex_spark", "data", "tacred_fixture.json",
    )
    cands = with_adjacency(
        tacred_to_candidates(read_tacred_json(spark, fixture), max_len=100),
        prune=1,
        max_len=100,
    )
    wbc = broadcast_weights(spark, weights)
    got = {
        r["id"]: r
        for r in score_candidates(
            cands, wbc, keep_columns=["id"], encoder="gat", with_probs=True
        ).collect()
    }
    rows = cands.collect()
    assert rows
    for r in rows:
        edges = [(e["src"], e["dst"]) for e in r["adjacency"]]
        label, probs = oracle_predict_gat(
            weights,
            list(r["tokens"]),
            (r["head_start"], r["head_end"]),
            (r["tail_start"], r["tail_end"]),
            edges,
        )
        assert np.allclose(got[r["id"]]["probs"], probs, atol=1e-4), r["id"]
        assert got[r["id"]]["label"] == label, r["id"]
