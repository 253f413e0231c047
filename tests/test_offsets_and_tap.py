"""M5 sine table parity, M5/M6 offset-embedder variants, M19 representation
tap, and the tap → E8 export path."""

import math

import numpy as np

from relex_spark.plans.kg_pipeline import KGPipelineConfig
from relex_spark.scoring.kernels import forward_batch
from relex_spark.scoring.weights import build_fixture_weights, sine_offset_table
from relex_spark.sources.transcripts import load_semeval_fixture


def test_sine_table_matches_reference_formula():
    """Independent recomputation of position_encoding_init
    (sine_offset_embedder.py:7-17) values at spot positions."""
    d = 8
    t = sine_offset_table(21, d)
    assert np.allclose(t[0], 0.0)
    for pos in (1, 5, 20):
        for j in range(d):
            angle = pos / (10000 ** (2 * (j // 2) / d))
            expected = math.sin(angle) if j % 2 == 0 else math.cos(angle)
            assert abs(float(t[pos, j]) - expected) < 1e-5, (pos, j)


def _batch(weights, idxs=(0, 3, 6)):
    fixture = load_semeval_fixture()
    ids, heads, tails = [], [], []
    for i in idxs:
        ex = fixture[i]
        ids.append(weights.token_ids(ex["tokens"]))
        (h0, h1), (t0, t1) = ex["entities"]
        heads.append((h0, h1 - 1))
        tails.append((t0, t1 - 1))
    return ids, np.array(heads), np.array(tails)


def test_offset_embedder_variants_score():
    vocab = sorted({t.lower() for ex in load_semeval_fixture() for t in ex["tokens"]})
    for offset_type in ("relative", "sine", "entity_only"):
        w = build_fixture_weights(vocab, offset_type=offset_type)
        ids, h, t = _batch(w)
        probs, argmax = forward_batch(w, ids, h, t)
        assert np.allclose(probs.sum(axis=1), 1.0, atol=1e-5), offset_type
        # swapped spans must change the distribution (offsets are live)
        probs2, _ = forward_batch(w, ids, t, h)
        assert not np.allclose(probs, probs2), offset_type


def test_representation_tap_and_export(spark):
    """M19: the scored table can expose the encoder representation, and the
    E8 consumer pattern (dedupe by id, reuse across probes) works."""
    from pyspark.sql import functions as F

    from relex_spark.scoring.scorer import broadcast_weights, score_candidates
    from relex_spark.sources.readers import read_semeval_jsonl, semeval_to_candidates

    w = KGPipelineConfig().resolved_weights()
    cands = semeval_to_candidates(
        read_semeval_jsonl(spark, "relex_spark/data/semeval_fixture.jsonl"), 100
    )
    # duplicate the input to exercise the E8 id-dedupe
    doubled = cands.union(cands)
    scored = score_candidates(
        doubled, broadcast_weights(spark, w), keep_columns=["id"],
        with_representation=True,
    )
    cache = scored.dropDuplicates(["id"])
    rows = cache.collect()
    assert len(rows) == 10
    d_enc = w.cnn_filters[2][0].shape[1] * len(w.cnn_filters)
    assert all(len(r["embedding"]) == d_enc for r in rows)

    # representation is deterministic: same id → same vector across the
    # duplicated inputs (M19 cache-key contract)
    per_id = scored.groupBy("id").agg(
        F.countDistinct(F.col("embedding").cast("string")).alias("n")
    )
    assert per_id.where(F.col("n") > 1).count() == 0
