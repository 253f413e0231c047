#!/usr/bin/env python3
"""Round-4 scaling evidence runner.

Regenerates the 480k-conv (5.52M-turn) corpus with the round-4 generator
(planted-sentence variety now scales with corpus size, so the distinct
scored inputs are realistic), then runs scaling_bench workers interleaved
base/jvm_token_ids per level — interleaving keeps the A/B comparison
inside the same host-noise window. Raw per-worker JSON (plus loadavg
before each worker) appends to BENCH/scaling_r4_480k.jsonl.

Usage: python3 scripts/run_scaling_r4.py [n_convs]
       python3 scripts/run_scaling_r4.py --redo 2:0,2:1,8:0,8:1

--redo re-runs the named (cpus:jvm) pairs even if already recorded,
appending fresh records; summarize_scaling_r4.py keys on (cpus, jvm)
taking the LAST record, so a quiet-window redo supersedes a noisy one
while the noisy raw record stays published in the jsonl.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRANSCRIPTS = "/tmp/relex_scaling_transcripts"
OUT = os.path.join(REPO, "BENCH", "scaling_r4_480k.jsonl")
REDO: list[tuple[int, int]] = []
if len(sys.argv) > 2 and sys.argv[1] == "--redo":
    REDO = [
        (int(p.split(":")[0]), int(p.split(":")[1]))
        for p in sys.argv[2].split(",")
    ]
N_CONVS = (
    int(sys.argv[1]) if len(sys.argv) > 1 and not REDO else 480_000
)
# interleaved: per level, base first then jvm-ids — A/B within one window
PLAN = REDO or [(2, 0), (2, 1), (8, 0), (8, 1), (32, 0), (32, 1)]


def regen_corpus() -> None:
    from relex_spark.session import get_spark
    from relex_spark.sources.transcripts import synthesize_transcripts

    shutil.rmtree(TRANSCRIPTS, ignore_errors=True)
    spark = get_spark("scaling_gen_r4", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    synthesize_transcripts(spark, n_convs=N_CONVS).repartition(256).write.mode(
        "overwrite"
    ).parquet(TRANSCRIPTS)
    spark.stop()
    print(f"regenerated {TRANSCRIPTS} (n_convs={N_CONVS})", file=sys.stderr)


def main() -> int:
    # resumable: reuse an existing corpus and skip (cpus, jvm) pairs already
    # recorded — the campaign spans ~1.5h and must survive session restarts
    if os.path.exists(os.path.join(TRANSCRIPTS, "_SUCCESS")) and (
        REDO or len(sys.argv) <= 1
    ):
        print(f"reusing existing corpus at {TRANSCRIPTS}", file=sys.stderr)
    else:
        regen_corpus()
    done = set()
    if os.path.exists(OUT) and not REDO:
        with open(OUT) as f:
            for line in f:
                if line.strip():
                    r = json.loads(line)
                    done.add((r["cpus"], int(r["jvm_token_ids"])))
    for cpus, jvm in PLAN:
        if (cpus, jvm) in done:
            print(f"local[{cpus}] jvm_ids={jvm}: already recorded, skipping",
                  flush=True)
            continue
        env = dict(os.environ)
        env["RELEX_SCALING_JVM_IDS"] = str(jvm)
        load_before = list(os.getloadavg())
        t0 = time.time()
        out = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "scripts", "scaling_bench.py"),
                "--worker",
                str(cpus),
            ],
            capture_output=True,
            text=True,
            timeout=3600,
            cwd=REPO,
            env=env,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        if not line:
            print(f"worker {cpus} jvm={jvm} FAILED:\n{out.stderr[-3000:]}")
            return 1
        rec = json.loads(line)
        rec["host_loadavg_before"] = load_before
        rec["wall_total_sec"] = round(time.time() - t0, 1)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"local[{cpus}] jvm_ids={jvm}: sec={rec['sec']} "
              f"runs={rec['all_runs_sec']} dedup={rec['sec_dedup']}",
              flush=True)
    print(f"done -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
