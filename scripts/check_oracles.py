#!/usr/bin/env python3
"""Self-check harness mirroring the driver's DuckDB-oracle comparison.

Runs every __spark_entry__.queries() entry on Spark and the matching
oracle_sql() on DuckDB over the same sf directory; compares row count,
column names, and order-insensitive values (NaN-safe, float-tolerant at
1e-9 relative so true mismatches surface while representation noise
doesn't — the driver's hash compare is stricter, so we ALSO report exact
string-hash equality after canonical formatting).

Usage: python3 scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append("\x01".join(canon_value(row[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from relex_spark.plans import driver_queries as dq
    from relex_spark.session import get_spark

    # BOTH tiers: the 50 driver-facing queries (the per-round CORRECTNESS
    # window) plus the fine-grained EXTRA registry consolidated out of it.
    queries = dict(entry_mod.queries())
    oracles = dict(entry_mod.oracle_sql())
    tier = {n: "driver" for n in queries}
    queries.update(dq.EXTRA_QUERIES)
    oracles.update(dq.EXTRA_ORACLES)
    for n in dq.EXTRA_QUERIES:
        tier[n] = "extra"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark("oracle_check")
    spark.sparkContext.setLogLevel("ERROR")

    # Scale-pinned literal goldens are wrong at any other scale — compare
    # them only against the corpus they were generated from. Detection is by
    # corpus FINGERPRINT (row count + doc_id sum recorded at regen time),
    # not directory name: an sf0.01 corpus in a differently-named directory
    # must still get the golden check, and a foreign corpus in a directory
    # that happens to end in "sf0.01" must not be compared against
    # wrong-scale goldens.
    try:
        from relex_spark.plans import kg_goldens as kgold

        GOLDEN_CORPUS = kgold.GOLDEN_CORPUS
        EXTRA_GOLDEN_SETS = getattr(kgold, "EXTRA_GOLDEN_SETS", [])
    except ImportError:
        GOLDEN_CORPUS, EXTRA_GOLDEN_SETS = None, []
    if GOLDEN_CORPUS is not None:
        n_docs, docid_sum = con.execute(
            "SELECT CAST(count(*) AS BIGINT),"
            " CAST(COALESCE(sum(doc_id), 0) AS BIGINT) FROM documents"
        ).fetchone()
        fp = {"documents_rows": n_docs, "doc_id_sum": docid_sum}
        at_golden_sf = fp == GOLDEN_CORPUS
        if not at_golden_sf:
            # a non-primary fingerprinted corpus (e.g. the sf0.1 bench
            # scale): substitute that set's rows into the golden-query
            # oracles so this scale ALSO gets the full hash check
            extra = next(
                (s for s in EXTRA_GOLDEN_SETS if s["corpus"] == fp), None
            )
            if extra is not None:
                from relex_spark.plans.driver_queries import (
                    _CANONICAL_TRIPLE_COLS,
                    _SCORED_CANDIDATE_COLS,
                    _golden_oracle,
                )

                canonical = _golden_oracle(
                    _CANONICAL_TRIPLE_COLS, extra["canonical_triple_rows"]
                )
                oracles["kg_canonical_triples"] = canonical
                oracles["x_streaming_canonical_merge"] = canonical
                oracles["kg_scored_candidates"] = _golden_oracle(
                    _SCORED_CANDIDATE_COLS, extra["scored_candidate_rows"]
                )
                oracles["kg_tacred_canonical_triples"] = _golden_oracle(
                    _CANONICAL_TRIPLE_COLS,
                    extra["tacred_canonical_triple_rows"],
                )
                at_golden_sf = True
                print(
                    "INFO: corpus matches a non-primary golden fingerprint "
                    f"({fp}) — golden queries hash-checked against that set"
                )
    else:
        at_golden_sf = os.path.normpath(sf_dir).endswith("sf0.01")
        print(
            "WARN: kg_goldens has no GOLDEN_CORPUS fingerprint; falling back "
            "to directory-name scale detection (regen the goldens)"
        )
    if not at_golden_sf:
        print(
            "WARN: corpus does not match any golden fingerprint — "
            "golden-pinned queries are downgraded to rows-only checks"
        )

    failures = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name in dq.GOLDEN_SF01_QUERIES and not at_golden_sf:
            print(
                f"  ok {name} [{tier[name]}]: rows-only at this sf "
                f"(sf0.01-pinned golden), {len(srows)} rows"
            )
            continue
        if name not in oracles:
            print(f"  ok {name}: rows-only (no oracle), {len(srows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(c.lower() for c in scols) != sorted(dcols):
            problems.append(f"columns {sorted(scols)} vs {sorted(dcols)}")
        # type-width drift (tests/test_oracle_widths.py is the full gate;
        # flag the classic killer here too so ad-hoc runs catch it):
        # DuckDB HUGEINT from an uncast SUM() hash-mismatches in the
        # driver even though the value comparator below normalizes it
        for c, t in zip(rel.columns, rel.types):
            if str(t) in ("HUGEINT", "UHUGEINT"):
                problems.append(f"column {c} is {t} (cast the oracle to BIGINT)")
        if not problems:
            a = canon_rows([c.lower() for c in scols], srows)
            b = canon_rows(dcols, drows)
            if a != b:
                bad = next(
                    (i for i, (x, y) in enumerate(zip(a, b)) if x != y), None
                )
                detail = f" first diff at sorted row {bad}:\n  S: {a[bad][:200]}\n  D: {b[bad][:200]}" if bad is not None else ""
                problems.append("values differ" + detail)
        if problems:
            failures.append(name)
            print(f"FAIL {name} [{tier[name]}]: " + "; ".join(problems))
        else:
            print(f"  ok {name} [{tier[name]}]: {len(srows)} rows match")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
