"""Corpus phrase mining (word2phrase / BPE-style merge loop): iteratively
find the most frequent adjacent token pair and merge it into one unit —
the first stage of tokenizer training, run as a driver-side loop of
aggregations (the same shape as connected_components / pagerank).

The merge REWRITE is a padded-string double-replace — pure SQL with
identical semantics in Spark and DuckDB, so the whole loop is
oracle-checkable:

    ' ' || text || ' '  →  replace(' a b ', ' a_b ')  twice

``replace`` substitutes non-overlapping occurrences left-to-right; an
occurrence immediately following a match loses its leading space to that
match and is skipped, but after pass one its left neighbour is a merged
token, so its leading space survives and pass two catches it — two passes
merge exactly the greedy left-to-right set (pinned by unit test on
adjacent-run inputs).

Scale shape per iteration: one bigram explode + count (map-side combined)
and one narrow rewrite; the top pair is a 1-row TakeOrdered collect.
Iterations are bounded (n_merges), and each rewritten frame is
localCheckpoint'd so lineage stays flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, functions as F

from relex_spark.functions.text import split_ws, word_bigrams


def merge_pair_in_text(text, pair: str):
    """Rewrite expression: merge every greedy left-to-right occurrence of
    the two-token ``pair`` ('a b') into 'a_b' inside a space-joined text."""
    merged = pair.replace(" ", "_")
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    once = F.replace(padded, F.lit(f" {pair} "), F.lit(f" {merged} "))
    twice = F.replace(once, F.lit(f" {pair} "), F.lit(f" {merged} "))
    return F.trim(twice)


def learn_phrases(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    min_count: int = 2,
) -> list[Row]:
    """Learn ``n_merges`` merges; returns [(rank, pair, n), ...] where rank
    is 1-based merge order, pair is 'a b', and n its count at merge time.
    Ties break lexicographically on the pair (deterministic). Stops early
    when no pair reaches ``min_count``."""
    cur = docs.select(F.col(text_col).alias("text"))
    merges: list[Row] = []
    for rank in range(1, n_merges + 1):
        top = (
            cur.select(F.explode(word_bigrams(split_ws(F.col("text")))).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") >= min_count)
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, n = top[0]["pair"], top[0]["n"]
        merges.append(Row(rank=rank, pair=pair, n=n))
        cur = cur.select(
            merge_pair_in_text(F.col("text"), pair).alias("text")
        ).localCheckpoint(eager=False)
    return merges
