"""Dataset scans (reference §2.1 S1–S2) and the reader→candidate projection.

The reference readers stream ``Instance`` objects one at a time
(relex/dataset_readers/semeval2010_task8.py:57-78, tacred.py:83-113); here a
scan is a DataFrame with an explicit schema (schema-on-read, no inference
pass — at 100 TB an inference pass over JSON would double the scan cost) and
the per-example field extraction + span bookkeeping is a projection that
Catalyst pipelines into the scan.

The output "candidate" schema is the engine-wide relation-classification
row (SURVEY §1.5):

    id STRING, tokens ARRAY<STRING>,
    head_start INT, head_end INT, tail_start INT, tail_end INT  (inclusive),
    label STRING (nullable at predict time)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from relex_spark.functions.text import (
    clamp_span,
    mask_entities,
    masking_replacements,
    normalize_glove_tokens,
    truncate_tokens,
)

SEMEVAL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("label", T.StringType()),
        T.StructField("entities", T.ArrayType(T.ArrayType(T.IntegerType()))),
    ]
)

TACRED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("token", T.ArrayType(T.StringType())),
        T.StructField("relation", T.StringType()),
        T.StructField("subj_start", T.IntegerType()),
        T.StructField("subj_end", T.IntegerType()),
        T.StructField("obj_start", T.IntegerType()),
        T.StructField("obj_end", T.IntegerType()),
        T.StructField("subj_type", T.StringType()),
        T.StructField("obj_type", T.StringType()),
        T.StructField("stanford_ner", T.ArrayType(T.StringType())),
        T.StructField("stanford_pos", T.ArrayType(T.StringType())),
        T.StructField("stanford_deprel", T.ArrayType(T.StringType())),
        T.StructField("stanford_head", T.ArrayType(T.IntegerType())),
    ]
)


def read_semeval_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S1: line-delimited JSON scan with a declared schema
    (semeval2010_task8.py:57-78)."""
    return spark.read.schema(SEMEVAL_SCHEMA).json(path)


def read_tacred_json(spark: SparkSession, path: str) -> DataFrame:
    """S2: whole-file JSON array scan (tacred.py:83-90 ``json.load``)."""
    return spark.read.schema(TACRED_SCHEMA).option("multiLine", True).json(path)


def semeval_to_candidates(df: DataFrame, max_len: int) -> DataFrame:
    """SemEval reader semantics (semeval2010_task8.py:80-117):

    join-then-split round trip (P1/P2) is the identity on these token lists,
    so tokens pass through; truncate to ``max_len`` (P5); convert spans
    end-exclusive → inclusive (P6); clamp all four offsets (P7).
    """
    return df.select(
        F.col("id"),
        truncate_tokens("tokens", max_len).alias("tokens"),
        clamp_span(F.col("entities")[0][0], max_len).alias("head_start"),
        clamp_span(F.col("entities")[0][1] - 1, max_len).alias("head_end"),
        clamp_span(F.col("entities")[1][0], max_len).alias("tail_start"),
        clamp_span(F.col("entities")[1][1] - 1, max_len).alias("tail_end"),
        F.col("label"),
    )


def tacred_to_candidates(
    df: DataFrame, max_len: int, masking_mode: str | None = None
) -> DataFrame:
    """TACRED reader semantics (tacred.py:83-177).

    Stage order is a semantic barrier (SURVEY §4): masking applies to the
    *untruncated* token list with *unclamped* spans (tacred.py:105-110
    before :150), then GloVe normalization per token (:133), then
    truncation, then span clamping. Spans are already inclusive (no P6).
    """
    tokens = F.col("token")
    if masking_mode is not None:
        head_repl, tail_repl = masking_replacements(
            masking_mode, F.col("subj_type"), F.col("obj_type")
        )
        tokens = mask_entities(
            tokens,
            F.col("subj_start"),
            F.col("subj_end"),
            F.col("obj_start"),
            F.col("obj_end"),
            head_repl,
            tail_repl,
        )
    tokens = normalize_glove_tokens(tokens)
    return df.select(
        F.col("id"),
        truncate_tokens(tokens, max_len).alias("tokens"),
        clamp_span("subj_start", max_len).alias("head_start"),
        clamp_span("subj_end", max_len).alias("head_end"),
        clamp_span("obj_start", max_len).alias("tail_start"),
        clamp_span("obj_end", max_len).alias("tail_end"),
        F.col("relation").alias("label"),
        F.col("stanford_ner").alias("ner"),
        F.col("stanford_pos").alias("pos"),
        F.col("stanford_deprel").alias("dep"),
        F.col("stanford_head").alias("dep_heads"),
    )
