#!/usr/bin/env python3
"""Summarize BENCH/scaling_r5.jsonl: per-level throughput for the toy and
reference-capacity variants (per-occurrence + dedup paths), and N→4N
scaling efficiencies per variant. Pure arithmetic over the raw records
(last record per (cpus, variant) key wins, so quiet-window redos
supersede noisy ones while both stay published); used to fill
BENCH/BASELINE.md."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO, "BENCH", "scaling_r5.jsonl"
)


def main() -> int:
    recs = [json.loads(line) for line in open(PATH) if line.strip()]
    by = {(r["cpus"], r["variant"]): r for r in recs}  # last record wins
    levels = sorted({r["cpus"] for r in recs})
    variants = sorted({r["variant"] for r in recs})

    print(f"{'level':>9} {'variant':>8} {'sec':>8} {'turns/s':>10} "
          f"{'dedup s':>8} {'dedup t/s':>10}  raw")
    for c in levels:
        for v in variants:
            r = by.get((c, v))
            if not r:
                continue
            print(f"local[{c:>2}] {v:>8} {r['sec']:>8} "
                  f"{r['turns_per_sec']:>10} {r['sec_dedup']:>8} "
                  f"{r['turns_per_sec_dedup']:>10}  {r['all_runs_sec']} | "
                  f"dedup {r['all_runs_dedup_sec']} | load "
                  f"{r.get('host_loadavg_before')}→{r['host_loadavg_after']}")

    print()
    for v in variants:
        for lo, hi in zip(levels, levels[1:]):
            a, b = by.get((lo, v)), by.get((hi, v))
            if not (a and b):
                continue
            ratio = hi / lo
            sp = a["sec"] / b["sec"]
            sp_d = a["sec_dedup"] / b["sec_dedup"]
            print(f"{v}: {lo}->{hi} per-occ speedup {sp:.2f}x "
                  f"(eff {sp / ratio:.3f}); dedup speedup {sp_d:.2f}x "
                  f"(eff {sp_d / ratio:.3f})")

    # Fixed-cost decomposition (r3 methodology, now MEASURED per level):
    # refcap ran at two corpus sizes, so per level t = c + k*n gives the
    # fixed job cost c = (4*t_1x - t_4x) / 3 and the marginal per-turn
    # cost k = (t_4x - t_1x) / (3 * n_1x). Scaling efficiency on k is
    # fixed-cost-free by construction.
    if any(v == "refcap4x" for _, v in by):
        print()
        marg = {}
        for c_ in levels:
            a, b = by.get((c_, "refcap")), by.get((c_, "refcap4x"))
            if not (a and b):
                continue
            n1 = a["n_turns"]
            fixed = (4 * a["sec"] - b["sec"]) / 3
            k = (b["sec"] - a["sec"]) / (b["n_turns"] - a["n_turns"])
            marg[c_] = k
            print(f"refcap local[{c_}]: fixed job cost {fixed:.2f}s, "
                  f"marginal {1.0 / k:,.0f} turns/s "
                  f"(t1x={a['sec']}s @ {n1} turns, t4x={b['sec']}s)")
        for lo, hi in zip(levels, levels[1:]):
            if lo in marg and hi in marg:
                sp = marg[lo] / marg[hi]
                print(f"refcap marginal-cost {lo}->{hi}: speedup {sp:.2f}x "
                      f"(eff {sp / (hi / lo):.3f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
