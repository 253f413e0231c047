"""Synthetic multi-turn transcript corpus + gazetteer (FIXTURES.md §1, §4).

Input table per BASELINE.json ``input_hint``:

    conv_id STRING, turn_idx INT, role STRING, text STRING,
    tool STRING, ts TIMESTAMP

Properties:

* **Deterministic independent of partitioning** — every pseudo-random choice
  is a pure function of (conv_id, turn_idx) via md5 arithmetic, never
  ``rand(seed)`` (whose stream depends on partition layout). The same scale
  parameter yields bit-identical tables on local[1] and a 1000-executor
  cluster.
* **Distributed generation** — built from ``spark.range`` + SQL expressions;
  no driver-side loops, so the generator itself scales to 10^12 turns.
* **Zipf-skewed conversations** — a small set of "hot" conversations are
  ~64× longer than the median, to exercise AQE skew splitting and salting.
* **Planted gold sentences** — a seeded subset of turns embeds the 10
  SemEval-2010 Task 8 fixture sentences verbatim (reference
  tests/fixtures/semeval2010_task8.jsonl), space-joined, preserving the
  join/split round-trip invariant (semeval2010_task8.py:68,89). These turns
  are the P/R-comparable gold slice.
"""

from __future__ import annotations

import json
from importlib import resources

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

_FILLER_WORDS = [
    "please", "check", "the", "report", "and", "send", "an", "update",
    "we", "ran", "pipeline", "job", "with", "new", "settings", "today",
    "results", "look", "stable", "after", "retry", "queue", "was", "empty",
    "also", "note", "latency", "dropped", "since", "last", "deploy", "ok",
]

# Turns 0-mod-PLANT_EVERY (by turn hash) carry a planted gold sentence.
PLANT_EVERY = 3


def load_semeval_fixture() -> list[dict]:
    """The 10 SemEval fixture examples (id, tokens, label, entities)."""
    text = (
        resources.files("relex_spark.data")
        .joinpath("semeval_fixture.jsonl")
        .read_text()
    )
    return [json.loads(line) for line in text.splitlines() if line.strip()]


def fixture_gazetteer_rows() -> list[tuple[str, str, str]]:
    """(surface, entity_id, entity_type) rows derived from the fixture
    entity spans (FIXTURES.md §4), plus capitalization aliases so the
    canonicalization stage has alias edges to resolve.

    Surfaces are the literal (possibly multi-token) entity phrases; the
    entity_id is the lowercase phrase with underscores — shared by aliases.
    """
    rows: list[tuple[str, str, str]] = []
    seen: set[str] = set()
    for ex in load_semeval_fixture():
        for (start, end_ex) in ex["entities"]:
            phrase = " ".join(ex["tokens"][start:end_ex])
            eid = "ent:" + phrase.lower().replace(" ", "_")
            for alias in {phrase, phrase.lower(), phrase.capitalize()}:
                if alias not in seen:
                    seen.add(alias)
                    rows.append((alias, eid, "THING"))
    return rows


def gazetteer_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        fixture_gazetteer_rows(), "surface string, entity_id string, entity_type string"
    )


def _hash_expr(*cols: str) -> str:
    """60-bit deterministic hash of concatenated columns (portable md5 form)."""
    concat = " || ':' || ".join(f"cast({c} as string)" for c in cols)
    return f"cast(conv(substr(md5({concat}), 1, 15), 16, 10) as bigint)"


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    base_turns: int = 8,
    hot_convs: int = 2,
    hot_factor: int = 64,
    partitions: int | None = None,
) -> DataFrame:
    """Generate the transcript table at a given scale.

    conv c has ``base_turns + (h(c) % base_turns)`` turns, except the first
    ``hot_convs`` conversations which are ``hot_factor``× longer (skew).
    """
    fixture = load_semeval_fixture()
    sentences = [" ".join(ex["tokens"]) for ex in fixture]
    sent_array = F.array(*[F.lit(s) for s in sentences])
    filler_array = F.array(*[F.lit(w) for w in _FILLER_WORDS])

    convs = spark.range(n_convs).withColumnRenamed("id", "conv_no")
    if partitions:
        convs = convs.repartition(partitions, "conv_no")

    convs = convs.withColumn("conv_hash", F.expr(_hash_expr("conv_no")))
    convs = convs.withColumn(
        "n_turns",
        F.when(
            F.col("conv_no") < hot_convs,
            F.lit(base_turns * hot_factor),
        ).otherwise((F.lit(base_turns) + F.col("conv_hash") % base_turns)).cast("int"),
    )

    turns = convs.select(
        F.col("conv_no"),
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    turns = turns.withColumn("turn_hash", F.expr(_hash_expr("conv_no", "turn_idx")))

    # Filler text: 5-10 words picked by per-position hashes (element_at is
    # 1-based). Built as a SQL transform over a hash-derived index sequence.
    n_words = (F.col("turn_hash") % 6 + 5).cast("int")
    filler_text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(
                filler_array,
                (
                    # cast before abs: abs(Int.MinValue) overflows under ANSI
                    F.abs(
                        F.hash(
                            F.col("turn_hash").cast("string"), i.cast("string")
                        ).cast("bigint")
                    )
                    % len(_FILLER_WORDS)
                    + 1
                ).cast("int"),
            ),
        ),
        " ",
    )

    planted = F.col("turn_hash") % PLANT_EVERY == 0
    sent_idx = (F.col("turn_hash") % len(sentences) + 1).cast("int")
    text = F.when(planted, F.element_at(sent_array, sent_idx)).otherwise(filler_text)

    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.col("turn_idx") % 3 + 1).cast("int"),
    )
    tool = F.when(role == "tool", F.lit("search")).otherwise(F.lit(None).cast("string"))

    # Monotone-in-conversation timestamps from a fixed epoch (UTC session TZ).
    ts = F.timestamp_seconds(
        F.lit(1_700_000_000) + F.col("conv_no") * 100_000 + F.col("turn_idx") * 60
    )

    return turns.select(
        F.concat(F.lit("conv-"), F.col("conv_no")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def transcripts_from_documents(docs: DataFrame, convs: int = 40) -> DataFrame:
    """Derive a transcript table deterministically from a documents table
    (driver testdata): conv = doc_id % convs, turn order by doc_id; a
    hash-seeded third of turns carries a planted SemEval gold sentence, the
    rest carry the document text. Same determinism rules as
    synthesize_transcripts (pure function of doc_id)."""
    sentences = [" ".join(ex["tokens"]) for ex in load_semeval_fixture()]
    sent_array = F.array(*[F.lit(s) for s in sentences])

    d = docs.withColumn("doc_hash", F.expr(_hash_expr("doc_id")))
    planted = F.col("doc_hash") % PLANT_EVERY == 0
    sent_idx = (F.col("doc_hash") % len(sentences) + 1).cast("int")
    text = F.when(planted, F.element_at(sent_array, sent_idx)).otherwise(F.col("text"))
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        F.concat(F.lit("conv-"), F.col("doc_id") % convs).alias("conv_id"),
        (F.col("doc_id") / convs).cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(role == "tool", F.lit("search")).otherwise(F.lit(None).cast("string")).alias("tool"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("doc_id") % convs) * 100_000
            + (F.col("doc_id") / convs).cast("int") * 60
        ).alias("ts"),
    )


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Scan a persisted transcript table (parquet layout; Iceberg when a
    catalog is configured — see sinks.write_stage for the commit protocol)."""
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)
