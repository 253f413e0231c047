"""Streaming KG construction (engine extension; reference has no streaming
— SURVEY §2.8 notes the absence explicitly).

Because every pre-canonicalization stage is stateless-per-row (mention
detection, pair generation, preprocessing, Arrow-batched scoring are all
narrow), the SAME stage functions run unchanged on a streaming DataFrame —
one code path for batch and streaming (build_triples is reused verbatim).
Canonical-triple maintenance is an aggregation → done per micro-batch via
``foreachBatch`` appending scored triples; consumers aggregate on read or
run the batch canonicalizer over the accumulated table.

``streaming_window_counts`` is the watermark + tumbling-window aggregation
surface (late rows beyond the watermark are dropped), matching the batch
``events_tumbling_window`` query's grouping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from relex_spark.plans.kg_pipeline import KGPipelineConfig, build_triples
from relex_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def stream_transcripts(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of transcript turns (new parquet files appear as
    upstream ingest lands them; on a cluster this is the Iceberg/Kafka
    source with identical downstream code)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def run_streaming_triples(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    config: KGPipelineConfig | None = None,
    available_now: bool = True,
):
    """transcripts stream → scored (subj, pred, obj) triples, append sink.

    Exactly-once via the streaming checkpoint (file-source offsets +
    idempotent parquet append) — the streaming analogue of the batch stage
    manifest protocol in sources/sinks.py.
    """
    scored = build_triples(stream, config or KGPipelineConfig())
    writer = (
        scored.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_window_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts over an event stream
    (ts TIMESTAMP, event_type STRING, value DOUBLE): late data beyond the
    watermark is dropped; state is bounded by the watermark horizon."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
