"""Cross-engine unicode parity: the oracle-paired text operators must
agree with their DuckDB formulations on non-ASCII input (accents, CJK,
emoji) — the corpus the driver checks is romanized, so this pins the
byte-vs-codepoint edge cases (length(), ascii(), \\s+ splitting) that the
corpus never exercises."""

import duckdb
import pytest
from pyspark.sql import functions as F

TEXTS = [
    "héllo wörld héllo",
    "你好 世界 你好 你好",
    "emoji 🙂 test 🙂",
    "mixed ascii café 東京",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in enumerate(TEXTS))
        + ") t(doc_id, text)"
    )
    yield con
    con.close()


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )


def test_fingerprint_unicode_parity(spark, duck):
    from relex_spark.operators.textstats import fingerprint

    got = {
        r["doc_id"]: r["fp"]
        for r in _docs(spark)
        .select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .collect()
    }
    want = dict(
        duck.sql(
            r"""
        WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                   FROM documents)
        SELECT doc_id,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(toks,
                     t -> CAST(length(t)*131 + ascii(substr(t,1,1)) AS BIGINT))),
                 (a, c) -> (a * 31 + c) % 1000000007)
        FROM t
        """
        ).fetchall()
    )
    assert got == want


def test_token_counts_unicode_parity(spark, duck):
    from relex_spark.operators.textstats import token_counts

    ws, bpe = token_counts(F.col("text"))
    got = {
        r["doc_id"]: (r["ws"], r["bpe"])
        for r in _docs(spark)
        .select("doc_id", ws.alias("ws"), bpe.alias("bpe"))
        .collect()
    }
    want = {
        r[0]: (r[1], r[2])
        for r in duck.sql(
            r"""
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT),
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INT)
        FROM documents
        """
        ).fetchall()
    }
    assert got == want


def test_repetition_unicode_parity(spark, duck):
    from relex_spark.operators.textstats import repetition_signals

    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["distinct_token_ratio_u6"],
            r["top_bigram_count"],
        )
        for r in repetition_signals(_docs(spark)).collect()
    }
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.sql(
            r"""
        WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                   FROM documents),
        b AS (
            SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS BIGINT) AS distinct_tokens,
                   unnest(list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i + 1])) AS bigram
            FROM t WHERE len(toks) >= 2
        ),
        c AS (SELECT doc_id, n_tokens, distinct_tokens, bigram, COUNT(*) AS cnt
              FROM b GROUP BY ALL)
        SELECT doc_id, n_tokens,
               CAST(floor(CAST(distinct_tokens AS DOUBLE) / n_tokens * 1000000 + 0.5) AS BIGINT),
               CAST(MAX(cnt) AS BIGINT)
        FROM c GROUP BY doc_id, n_tokens, distinct_tokens
        """
        ).fetchall()
    }
    assert got == want
