"""Stage registry — the engine's analogue of the reference's AllenNLP
registries (SURVEY §2.8: @DatasetReader.register, @Seq2VecEncoder.register,
@OffsetEmbedder.register, …).

Extension points are *stage factories*: named callables producing either a
Column expression (codegen path) or a DataFrame→DataFrame stage (Arrow
path). Registration is import-time, like the reference's decorators; lookup
is by (kind, name). The scoring kernel's encoder/offset families are
likewise enumerated here so a config can name them the way the reference's
jsonnet configs name registered types.
"""

from __future__ import annotations

from collections.abc import Callable

_REGISTRY: dict[tuple[str, str], Callable] = {}


def register(kind: str, name: str):
    """Decorator: ``@register("encoder", "cnn")``."""

    def deco(fn: Callable) -> Callable:
        key = (kind, name)
        if key in _REGISTRY and _REGISTRY[key] is not fn:
            raise ValueError(f"duplicate registration {key}")
        _REGISTRY[key] = fn
        return fn

    return deco


def lookup(kind: str, name: str) -> Callable:
    try:
        return _REGISTRY[(kind, name)]
    except KeyError:
        available = sorted(n for k, n in _REGISTRY if k == kind)
        raise KeyError(f"no {kind!r} named {name!r}; available: {available}") from None


def names(kind: str) -> list[str]:
    return sorted(n for k, n in _REGISTRY if k == kind)


def _bootstrap() -> None:
    """Register the built-in families (mirrors the reference's registered
    type names where one exists)."""
    from relex_spark.functions import offsets, pooling, text

    # dataset readers (@DatasetReader.register names)
    from relex_spark.sources import readers

    register("dataset_reader", "semeval2010_task8")(readers.semeval_to_candidates)
    register("dataset_reader", "tacred")(readers.tacred_to_candidates)

    # offset embedders (@OffsetEmbedder.register names)
    register("offset_embedder", "relative")(offsets.relative_offset_indices)
    register("offset_embedder", "sine")(offsets.sine_offset_indices)
    register("offset_embedder", "entity_only")(offsets.entity_marker_indicators)

    # column stages
    register("text_stage", "split_ws")(text.split_ws)
    register("text_stage", "join_ws")(text.join_ws)
    register("text_stage", "normalize_glove")(text.normalize_glove_tokens)
    register("text_stage", "mask_entities")(text.mask_entities)
    register("text_stage", "truncate")(text.truncate_tokens)
    register("text_stage", "lowercase")(text.lower_tokens)
    register("pooling", "array_pool")(pooling.pool_array)
    register("pooling", "scoped_pool")(pooling.scoped_pool_array)

    # seq2vec encoders (@Seq2VecEncoder.register names; kernel-side)
    from relex_spark.scoring import kernels

    register("encoder", "cnn")(kernels.cnn_encode)
    register("encoder", "bag_of_embeddings_pool")(kernels.boe_encode)
    register("encoder", "gcn")(kernels.gcn_encode)
    register("encoder", "gat")(kernels.gat_encode)
    register("encoder", "seq2seq_pool")(kernels.lstm_encode)
    register("encoder", "stacked_self_attention")(kernels.attention_encode)

    # engine-extension operator families (no reference analogue)
    from relex_spark.operators import dedup, similarity, textstats

    register("dedup", "exact")(dedup.exact_dedup_groups)
    register("dedup", "minhash_lsh")(dedup.minhash_lsh_candidates)
    register("dedup", "simhash")(dedup.simhash16)
    register("dedup", "ngram_jaccard")(dedup.jaccard_pairs)
    register("dedup", "embedding_cosine")(dedup.embedding_cosine_pairs)
    register("ann", "brute_force")(similarity.cosine_topk)
    register("ann", "lsh")(similarity.lsh_bucketed_topk)
    register("ann", "ivf")(similarity.ivf_topk)
    register("textstat", "lang_id")(textstats.lang_id)
    register("textstat", "quality_score")(textstats.quality_score)
    register("textstat", "token_counts")(textstats.token_counts)
    register("textstat", "fingerprint")(textstats.fingerprint)

    from relex_spark.streaming import pipeline as streaming

    register("streaming", "triples")(streaming.run_streaming_triples)
    register("streaming", "window_counts")(streaming.streaming_window_counts)
    register("streaming", "entity_state")(streaming.conversation_entity_state)


_bootstrap()
