#!/usr/bin/env python3
"""Capture .explain('formatted') output for named registry queries.

Usage: python scripts/capture_plans.py OUT_DIR SUFFIX [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query (default: the benched
set). Run from the tree whose plans you want (e.g. a worktree of the
round-start commit for the _before files).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


BENCHED = [
    "q1_pricing_summary",
    "q3_order_revenue",
    "v1_token_vocab",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "text_quality",
    "text_repetition",
    "x_lm_score",
    "events_tumbling_window",
    "kg_candidate_pairs",
    "kg_canonical_triples",
    "text_chunk_windows",
    "x_coref_resolve",
    "x_negative_samples",
    "x_triangle_counts",
    "x_entity_pmi",
    "kg_pair_timeline",
    "x_collapse_retries",
]


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or BENCHED
    os.makedirs(out_dir, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from relex_spark.plans.driver_queries import EXTRA_QUERIES
    from relex_spark.plans.driver_queries import QUERIES as _DQ
    from relex_spark.session import get_spark

    QUERIES = {**_DQ, **EXTRA_QUERIES}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_capture", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in QUERIES:
            print(f"skip {name}", file=sys.stderr)
            continue
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
