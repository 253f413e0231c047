"""Vocabulary operators (reference §2.4 V1–V3).

The reference's AllenNLP ``Vocabulary`` is a driver-side dict built in one
full pass. Here the counting pass is a distributed aggregation (map-side
partial + final, free via Catalyst) and only the surviving vocab — small by
``min_count`` construction — is collected/broadcast.

Determinism: ids are assigned by ``row_number`` over (count DESC, token
ASC), a total order, so the same corpus yields the same vocab at any
parallelism (AllenNLP orders by count then insertion; count-then-lexical is
our stable equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_token_vocab(
    tokens_df: DataFrame,
    tokens_col: str = "tokens",
    min_count: int = 2,
    lowercase: bool = True,
) -> DataFrame:
    """V1: explode → count → min_count filter → contiguous ids from 2
    (0=pad, 1=oov, matching scoring.weights.PAD_ID/OOV_ID).

    Scale-safe total-order rank (a post-min_count vocab can still be 10⁷+
    rows at web scale, so no global-window single-task sort): range-
    partition by the sort key, rank within each partition in parallel,
    then add cumulative partition-size offsets (range partition i's rows
    all sort before partition i+1's, so offset+local_rank IS the global
    rank). The ids are identical to a global row_number over
    (cnt DESC, token ASC) — the oracle pins this.

    Returns DataFrame(token STRING, cnt BIGINT, id INT).
    """
    tok = F.explode(tokens_col).alias("token")
    df = tokens_df.select(tok)
    if lowercase:
        df = df.select(F.lower("token").alias("token"))
    counts = df.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    counts = counts.where(F.col("cnt") >= min_count)
    parts = (
        counts.repartitionByRange(F.desc("cnt"), F.asc("token"))
        .withColumn("pid", F.spark_partition_id())
        # pin pids across the two downstream computations (range-partitioner
        # boundary sampling is nondeterministic between job runs)
        .localCheckpoint()
    )
    sizes = sorted(
        (r["pid"], r["n"])
        for r in parts.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, n in sizes:
        offsets[pid] = acc
        acc += n
    if offsets:
        # one small int per partition — a literal map beats a join even at
        # thousands of partitions
        off_expr = F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("pid"),
        )
    else:
        off_expr = F.lit(0)
    w = Window.partitionBy("pid").orderBy(F.desc("cnt"), F.asc("token"))
    return (
        parts.withColumn("lrn", F.row_number().over(w))
        .select(
            "token",
            "cnt",
            (off_expr + F.col("lrn") + 1).cast("int").alias("id"),
        )
    )


def build_label_vocab(labels_df: DataFrame, label_col: str = "label") -> DataFrame:
    """V2: distinct labels → contiguous ids by lexical order.

    Returns DataFrame(label STRING, id INT)."""
    w = Window.orderBy(F.asc("label"))
    return (
        labels_df.select(F.col(label_col).alias("label"))
        .where(F.col("label").isNotNull())
        .distinct()
        .withColumn("id", (F.row_number().over(w) - 1).cast("int"))
    )


def collect_vocab(vocab_df: DataFrame, key: str = "token") -> dict[str, int]:
    """Collect a (small, post-filter) vocab for broadcasting (V3 map)."""
    return {r[key]: r["id"] for r in vocab_df.select(key, "id").collect()}


def token_id_expr(
    tokens_col,
    token_to_id: dict[str, int],
    *,
    lowercase: bool = True,
    oov_id: int = 1,
    target_bucket_entries: int = 8,
) -> F.Column:
    """V3, JVM-side: dictionary-encode ``ARRAY<STRING>`` tokens to
    ``ARRAY<INT>`` ids without crossing the Python boundary — semantics
    bit-identical to ``ModelWeights.token_ids`` (optional lowercase, OOV
    fallback, relex/predictors single_id lowercase_tokens behavior).

    Spark has no hash-map literal (``GetMapValue`` on a map literal is a
    linear scan), so the vocab is sharded into B buckets keyed by
    ``crc32(token) % B`` — CRC-32 is computed identically driver-side
    (``zlib.crc32``) and JVM-side (``F.crc32``, same standard polynomial)
    — giving ~``target_bucket_entries`` key comparisons per token instead
    of |V|. The whole bucket table is an all-literal expression, so
    Catalyst constant-folds it into ONE array<map> literal shared by every
    row; per-token work is crc32 + O(1) array index + a short map scan.

    Motivation (BENCH/BASELINE.md 8→32 analysis): shipping token *strings*
    through the Arrow boundary into ``mapInPandas`` costs serialize +
    transfer + per-token Python dict lookups; encoding JVM-side sends
    int32 arrays instead and drops the hot-path string columns entirely.
    """
    import zlib

    items = list(token_to_id.items())
    n_buckets = max(1, (len(items) + target_bucket_entries - 1) // target_bucket_entries)
    buckets: list[list[tuple[str, int]]] = [[] for _ in range(n_buckets)]
    # Bucket by the EXACT stored key: the runtime lookup key (lowered when
    # lowercase) only ever matches a stored key it is byte-equal to, so
    # equal keys hash to the same bucket by construction. A mixed-case
    # vocab key is unreachable under lowercase=True in the Python path
    # (dict.get(t.lower())) and stays unreachable here — parity preserved.
    for tok, tid in items:
        buckets[zlib.crc32(tok.encode("utf-8")) % n_buckets].append((tok, tid))
    bucket_cols = []
    for b in buckets:
        if not b:
            # a well-typed non-empty map; the sentinel key contains \x00 and
            # cannot collide with a real token lookup
            b = [("\x00relex:empty-bucket", oov_id)]
        bucket_cols.append(
            F.create_map(*[F.lit(x) for kv in sorted(b) for x in kv])
        )
    table = F.array(*bucket_cols)

    def lookup(t: F.Column) -> F.Column:
        key = F.lower(t) if lowercase else t
        idx = (F.pmod(F.crc32(F.encode(key, "UTF-8")), F.lit(n_buckets)) + 1).cast("int")
        return F.coalesce(
            F.try_element_at(F.element_at(table, idx), key),
            F.lit(oov_id),
        ).cast("int")

    return F.transform(tokens_col, lookup)
