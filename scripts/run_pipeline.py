#!/usr/bin/env python3
"""spark-submit entry point for the KG-construction pipeline (north rule:
"runs via spark-submit --py-files on a multi-executor cluster").

    zip -r relex_spark.zip relex_spark
    spark-submit --py-files relex_spark.zip \
        [--master spark://... --num-executors N ...] \
        scripts/run_pipeline.py \
        --input  <transcripts parquet/iceberg path> \
        --output <canonical triples path> \
        [--checkpoint-dir <stage checkpoint root>] \
        [--salt-buckets 16] [--encoder cnn] [--max-len 100]

The session factory sets SQL-level knobs only — master/executor topology
comes from spark-submit, so the same script runs local[N] or on a cluster.
Stage checkpoints (when --checkpoint-dir is given) make re-submission
resume from the last complete stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# under spark-submit --py-files the package ships in the zip; under a plain
# `python scripts/run_pipeline.py` only the scripts/ dir is on sys.path, so
# fall back to the repo root (same pattern as scaling_bench/check_oracles)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="transcripts table/path")
    p.add_argument("--output", required=True, help="canonical triples sink path")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--salt-buckets", type=int, default=0)
    p.add_argument("--encoder", default="cnn")
    p.add_argument("--max-len", type=int, default=100)
    p.add_argument(
        "--format", default="parquet", help="input format (parquet|iceberg)"
    )
    args = p.parse_args(argv)

    from relex_spark.plans.kg_pipeline import KGPipelineConfig, run_kg_pipeline
    from relex_spark.session import get_spark

    spark = get_spark("relex_kg_pipeline")
    spark.sparkContext.setLogLevel("WARN")

    transcripts = spark.read.format(args.format).load(args.input)
    config = KGPipelineConfig(
        max_len=args.max_len,
        encoder=args.encoder,
        checkpoint_dir=args.checkpoint_dir,
        salt_buckets=args.salt_buckets,
    )

    t0 = time.perf_counter()
    canonical = run_kg_pipeline(spark, transcripts, config)
    canonical.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "canonical_triples": n,
                "sec": round(time.perf_counter() - t0, 2),
                "output": args.output,
                "resumable": bool(args.checkpoint_dir),
            }
        ),
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
