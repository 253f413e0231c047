#!/usr/bin/env python3
"""Per-stage profiling of the benched queries (guide §1: measure first).

Runs each benched query once warm + once timed with the Spark UI enabled,
then dumps per-stage metrics (task count, executorRunTime, shuffle bytes)
from the REST status API so serial-floor stages and shuffle-bound stages
are visible without the interactive UI.

Not part of the frozen bench contract — bench.py is untouched.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = sys.argv[1:] or None

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from relex_spark.plans.driver_queries import EXTRA_QUERIES
    from relex_spark.plans.driver_queries import QUERIES as _DQ
    from relex_spark.session import get_spark

    QUERIES = {**_DQ, **EXTRA_QUERIES}

    spark = get_spark(
        "relex_profile",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4057"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    api = f"http://localhost:4057/api/v1/applications/{app_id}"

    def get(path: str):
        with urllib.request.urlopen(api + path) as r:
            return json.load(r)

    bench_queries = [
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
        "kg_canonical_triples",
        "kg_candidate_pairs",
        "x_entity_pmi",
        "text_chunk_windows",
        "x_coref_resolve",
        "x_negative_samples",
        "x_triangle_counts",
        "kg_pair_timeline",
        "x_collapse_retries",
    ]
    if only:
        bench_queries = only

    def run_noop(df):
        df.write.format("noop").mode("overwrite").save()

    report = {}
    for name in bench_queries:
        if name not in QUERIES:
            print(f"skip {name} (not in registry)", file=sys.stderr)
            continue
        fn = QUERIES[name]
        run_noop(fn(spark, sf_dir))  # warm
        jobs_before = {j["jobId"] for j in get("/jobs")}
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        run_noop(fn(spark, sf_dir))
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        stages = []
        for j in get("/jobs"):
            if j["jobId"] in jobs_before:
                continue
            for sid in j["stageIds"]:
                try:
                    for s in get(f"/stages/{sid}"):
                        stages.append(
                            {
                                "stage": sid,
                                "tasks": s.get("numCompleteTasks"),
                                "runTimeMs": s.get("executorRunTime"),
                                "cpuTimeMs": round(
                                    (s.get("executorCpuTime") or 0) / 1e6
                                ),
                                "shufW_MB": round(
                                    (s.get("shuffleWriteBytes") or 0) / 1e6, 2
                                ),
                                "shufR_MB": round(
                                    (s.get("shuffleReadBytes") or 0) / 1e6, 2
                                ),
                                "in_MB": round((s.get("inputBytes") or 0) / 1e6, 2),
                                "name": (s.get("name") or "")[:60],
                            }
                        )
                except Exception:
                    pass
        stages.sort(key=lambda s: -(s["runTimeMs"] or 0))
        report[name] = {"wall_s": round(wall, 3), "stages": stages}
        print(f"\n=== {name}: {wall:.3f}s")
        for s in stages[:8]:
            print(
                f"  stage {s['stage']:>4} tasks={s['tasks']:>3} "
                f"run={s['runTimeMs']:>6}ms cpu={s['cpuTimeMs']:>6}ms "
                f"shufW={s['shufW_MB']:>8} shufR={s['shufR_MB']:>8} "
                f"in={s['in_MB']:>7}  {s['name']}"
            )

    out = os.environ.get("PROFILE_OUT", "/tmp/profile_queries.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwrote {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
