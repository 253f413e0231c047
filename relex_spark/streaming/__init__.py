"""Structured Streaming surface (optional per SURVEY §1.5 — the reference
has no streaming; these are the engine-side extensions)."""

from relex_spark.streaming.pipeline import (  # noqa: F401
    run_streaming_triples,
    stream_transcripts,
    streaming_window_counts,
)
