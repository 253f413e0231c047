"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing is real — schema, partition-preserving
``mapInPandas`` feature extraction, Arrow batch shapes, deterministic
synthetic payloads — while the actual codec step is stubbed behind an
import-try (this container ships no image/audio libraries): with PIL/
soundfile installed, ``decode_features`` would decode for real; without
them it raises ``NotImplementedError`` unless ``allow_fake=True`` selects
the deterministic fake featurizer (md5-seeded), which keeps every
downstream shape and test real.

Schema:
    media_id BIGINT, kind STRING ('image'|'audio'|'video'),
    payload BINARY, meta STRUCT<width:INT, height:INT, frames:INT>
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

_KINDS = ["image", "audio", "video"]


def synthesize_media(spark: SparkSession, n: int = 256) -> DataFrame:
    """Deterministic opaque payloads, generated distributively: payload =
    repeated md5 bytes keyed by media_id (pure SQL: unhex(md5(...)))."""
    df = spark.range(n).withColumnRenamed("id", "media_id")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("media_id") % 3 + 1).cast("int")
    )
    payload = F.unhex(
        F.concat_ws(
            "",
            *[
                F.md5(F.concat(F.col("media_id").cast("string"), F.lit(f":{i}")))
                for i in range(8)
            ],
        )
    )  # 128 deterministic bytes
    meta = F.struct(
        (F.col("media_id") % 64 + 16).cast("int").alias("width"),
        (F.col("media_id") % 48 + 16).cast("int").alias("height"),
        F.when(kind == "video", (F.col("media_id") % 7 + 2).cast("int"))
        .otherwise(F.lit(1).cast("int"))
        .alias("frames"),
    )
    return df.select(
        "media_id", kind.alias("kind"), payload.alias("payload"), meta.alias("meta")
    )


def _codec_available() -> bool:
    try:  # pragma: no cover - env-dependent
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in featurizer, engine-portable by construction:
    feature j = int(md5(hex(payload) + ':' + j)[:15 hex], 16) / 2^60 as a
    DOUBLE in [0, 1). The same value is computable in ANSI-ish SQL from the
    payload hex (DuckDB: md5 + substr + hex→BIGINT cast), so the driver
    oracle can verify the full mapInPandas decode path value-for-value."""
    hexpayload = payload.hex()
    return [
        int(hashlib.md5(f"{hexpayload}:{j}".encode()).hexdigest()[:15], 16)
        / 1152921504606846976.0
        for j in range(dim)
    ]


def decode_features(
    media: DataFrame, dim: int = 16, allow_fake: bool = True
) -> DataFrame:
    """Decode + feature-extract per media row (Arrow-batched, partition-
    preserving; at 100 TB this stage is the bandwidth hog, so it runs
    directly on the scan partitioning — no shuffle before it)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )
    codec = _codec_available()

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec:  # pragma: no cover - not available in this container
                raise NotImplementedError(
                    "real image/audio decode: wire PIL/soundfile here"
                )
            if not allow_fake:
                raise NotImplementedError(
                    "no codec libraries available and allow_fake=False"
                )
            feats = [_fake_features(bytes(p), dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(extract, schema=out_schema)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for 'video' rows — pure SQL, no Python: slice the
    payload into ``meta.frames`` equal byte chunks (substr on BINARY),
    keep every ``every``-th frame. Output: media_id, frame_no, frame
    BINARY, frame_bytes INT."""
    frames = F.col("meta.frames")
    chunk = F.floor(F.length("payload") / frames).cast("int")
    exploded = (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            "payload",
            chunk.alias("chunk"),
            F.explode(F.sequence(F.lit(0), frames - 1)).alias("frame_no"),
        )
        .where(F.col("frame_no") % every == 0)
    )
    frame = F.expr("substring(payload, frame_no * chunk + 1, chunk)")
    return exploded.select(
        "media_id",
        F.col("frame_no").cast("int").alias("frame_no"),
        frame.alias("frame"),
        F.length(frame).cast("int").alias("frame_bytes"),
    )
