"""Window-based anaphora resolution over multi-turn transcripts (engine
extension; the reference classifies relations between EXPLICIT mention
pairs only — reference relex/dataset_readers/semeval2010_task8.py reads
pre-annotated head/tail spans — so a turn saying "it failed again" never
yields a candidate pair). This operator recovers those references with
the standard recency heuristic: a trigger token (pronoun/determiner set,
configurable) resolves to the MOST RECENT entity mention in the previous
``lookback`` turns of the same conversation.

Scale shape: one shuffle (window partitioned by conv_id — the same
partitioning every other per-conversation stage reuses); everything else
is per-row array expressions inside whole-stage codegen (split / filter /
element_at against literal arrays), no Python, no join. Hot conversations
are bounded by the corpus (a conversation must be totally ordered to be
resolved at all), and AQE skew splitting handles the Zipf tail exactly as
it does for sessionize/x_turn_analysis.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# The English default a production transcript deployment would start from.
DEFAULT_TRIGGERS = ("it", "he", "she", "they", "them", "this", "that")


def _member(arr: Column):
    """Predicate factory: token membership in a literal array (codegen
    ``array_position`` scan — trigger/entity sets are gazetteer-sized)."""
    return lambda t: F.array_position(arr, t) > 0


def anaphora_features(
    turns: DataFrame,
    entities: Sequence[str],
    triggers: Sequence[str] = DEFAULT_TRIGGERS,
    text_col: str = "text",
) -> DataFrame:
    """Shared JVM-side per-turn projection for the batch AND streaming
    anaphora resolvers: (conv_id, turn_idx, turn_entity, trigger), where
    ``turn_entity`` is the LAST entity token by position (NULL if none)
    and ``trigger`` the FIRST trigger token (NULL if none). Pure codegen
    array expressions — the streaming path crosses into Python only to
    fold these four narrow columns through the per-conversation state."""
    if not entities:
        raise ValueError("empty entity set")
    if not triggers:
        raise ValueError("empty trigger set")
    ent_arr = F.array(*[F.lit(e) for e in sorted(set(entities))])
    trig_arr = F.array(*[F.lit(t) for t in sorted(set(triggers))])
    toks = F.split(F.col(text_col), " ")
    return turns.select(
        "conv_id",
        "turn_idx",
        # try_element_at: NULL (not an ANSI error) when the filtered list
        # is empty — "this turn mentions no entity / has no trigger".
        F.try_element_at(F.filter(toks, _member(ent_arr)), F.lit(-1)).alias(
            "turn_entity"
        ),
        F.try_element_at(F.filter(toks, _member(trig_arr)), F.lit(1)).alias(
            "trigger"
        ),
    )


def resolve_anaphora(
    turns: DataFrame,
    entities: Sequence[str],
    triggers: Sequence[str] = DEFAULT_TRIGGERS,
    lookback: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """For each turn containing a trigger token, emit a resolved link to
    the most recent prior entity mention within ``lookback`` turns of the
    same conversation.

    Semantics (deterministic by construction, so a DuckDB oracle can
    replay them exactly):

    * a turn's **mention** is the LAST entity token (by position) in its
      whitespace tokens — the recency heuristic applied within the turn;
    * a turn's **trigger** is the FIRST trigger token in its tokens;
    * the **antecedent** of a triggered turn is the most recent non-null
      mention over the previous ``lookback`` turns (strictly prior —
      ``ROWS BETWEEN lookback PRECEDING AND 1 PRECEDING``), i.e. a
      same-turn entity never resolves its own trigger;
    * turns with no trigger, or no antecedent in range, emit nothing.

    Output: (conv_id, turn_idx, trigger, antecedent, antecedent_turn_idx,
    gap) — ``gap`` is the turn distance, the confidence signal a
    downstream candidate-pair stage would threshold on before handing the
    resolved pair to the relation scorer.
    """
    if lookback < 1:
        raise ValueError(f"lookback must be >= 1, got {lookback}")
    # Pin the per-conversation partitioning up front (same rationale as
    # collapse_retries): the token-scan features then run AFTER the
    # exchange in parallel, the window and the final filter reuse the
    # partitioning (ONE shuffle still), and AQE's byte-based coalescing
    # cannot serialize the CPU-dense token scans into one task.
    n_parts = int(
        turns.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    turns = turns.repartition(n_parts, "conv_id")
    feat = anaphora_features(turns, entities, triggers, text_col)
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-lookback, -1)
    )
    resolved = feat.select(
        "conv_id",
        "turn_idx",
        "trigger",
        F.last("turn_entity", ignorenulls=True).over(w).alias("antecedent"),
        F.last(
            F.when(F.col("turn_entity").isNotNull(), F.col("turn_idx")),
            ignorenulls=True,
        )
        .over(w)
        .cast("int")
        .alias("antecedent_turn_idx"),
    )
    return resolved.where(
        F.col("trigger").isNotNull() & F.col("antecedent").isNotNull()
    ).select(
        "conv_id",
        "turn_idx",
        "trigger",
        "antecedent",
        "antecedent_turn_idx",
        (F.col("turn_idx") - F.col("antecedent_turn_idx"))
        .cast("int")
        .alias("gap"),
    )
