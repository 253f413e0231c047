#!/usr/bin/env python3
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "kg": {...}}

The KG pipeline is benchmarked on a transcript corpus synthesized at a
size proportional to the scale factor (deterministic, partition-independent
generation — see sources/transcripts.py); its triples/sec is the
BASELINE.json headline metric and is reported under "kg".
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_noop(df) -> None:
    """Execute a DataFrame fully without driver-side collection."""
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from relex_spark.session import get_spark
    # Bench names are stable across rounds; some fine-grained queries moved
    # to the EXTRA tier when the driver registry was capped at 50, so the
    # bench looks up both.
    from relex_spark.plans.driver_queries import EXTRA_QUERIES
    from relex_spark.plans.driver_queries import QUERIES as _DRIVER_QUERIES

    QUERIES = {**_DRIVER_QUERIES, **EXTRA_QUERIES}
    from relex_spark.plans.kg_pipeline import KGPipelineConfig, build_triples, run_kg_pipeline
    from relex_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark("relex_bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    # Host-noise telemetry: this is a multi-tenant VM with measured 2-4x
    # run-to-run swings, and two straight rounds of "regression?" triage
    # were spent adjudicating interference. Publishing every raw sample plus
    # the loadavg envelope lets the BENCH artifact self-adjudicate drift
    # (spread >> delta-vs-last-round == noise, not code).
    raw_runs: dict[str, list[float]] = {}
    loadavg: dict[str, list[float]] = {"start": list(os.getloadavg())}

    # --- headline operator queries over the driver testdata ---------------
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
    ]
    # Protocol (same as scripts/scaling_bench.py): one discarded warm run
    # per query (codegen compile + JIT + page cache — one-time costs a real
    # cluster amortizes over its lifetime), then the timed run.
    run_noop(QUERIES["p2_tokenize_roundtrip"](spark, sf_dir))

    def best_of(name: str, fn, n: int = 2) -> float:
        """Min of n timed runs — the host is multi-tenant with measured
        interference spikes; min is the robust capacity estimator. Every
        raw sample is recorded into the published telemetry."""
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            samples.append(round(time.perf_counter() - t0, 3))
        raw_runs[name] = samples
        return min(samples)

    for name in bench_queries:
        run_noop(QUERIES[name](spark, sf_dir))  # discarded warm run
        # n=3: observed 3-4x swings between consecutive runs under the
        # host's multi-tenant load spikes; two samples can both land on one
        timings[name] = best_of(
            name, lambda: run_noop(QUERIES[name](spark, sf_dir)), n=3
        )
        log(f"{name}: {timings[name]}s {raw_runs[name]}")
    loadavg["after_operator_queries"] = list(os.getloadavg())

    # --- flagship KG pipeline at sf-proportional transcript scale ---------
    try:
        li_rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    except Exception:  # noqa: BLE001
        li_rows = 60_000
    # sf-proportional but large enough that per-job constants (~1-2 s of
    # scheduling/AQE/noop-commit) don't dominate the throughput number
    n_convs = max(200, li_rows // 20)

    # Headline corpus: plant_variants auto-derives from corpus size, so
    # distinct (tokens, spans) scoring inputs grow ∝ sf and the
    # dedup-before-inference win is measured against a REALISTIC duplication
    # factor (~VARIANT_DUP_TARGET occurrences per distinct input), not the
    # ~10^4 factor a fixed 10-sentence plant produces.
    transcripts = synthesize_transcripts(spark, n_convs=n_convs)
    # 4×cpus files: small corpora otherwise land in one 256 MB-split task
    # and the pipeline runs single-core (parallelism must come from the
    # table layout, same as a production ingest)
    transcripts.repartition(4 * cpus).write.mode("overwrite").parquet(
        "/tmp/relex_bench_transcripts"
    )
    tdf = spark.read.parquet("/tmp/relex_bench_transcripts")
    n_turns = tdf.count()

    # Throughput rows measure the PRODUCTION kernel dtype (float32).
    # float64 is the correctness dtype for the golden oracles only
    # (KGPipelineConfig.compute_dtype docstring; BENCH/BASELINE.md r5):
    # at 32 parallel workers it doubles kernel bytes on one memory bus
    # and degrades tail latency ~2x on this host.
    config = KGPipelineConfig(compute_dtype="float32")
    build_triples(tdf, config).write.format("noop").mode("overwrite").save()  # warm
    # n=4: this is the headline metric and the host shows multi-tenant load
    # spikes (load-avg >12 observed with no benchmark running); isolated
    # same-JVM runs of this exact job ranged 3.3-12.2 s back-to-back, so two
    # samples can both land on an interference spike
    scored_sec = best_of(
        "kg_scored_triples", lambda: run_noop(build_triples(tdf, config)), n=4
    )
    timings["kg_scored_triples"] = scored_sec

    # transparency: the same stage scoring every occurrence (the
    # reference's own per-instance semantics; also the streaming path) —
    # the gap between this and kg_scored_triples is what
    # dedup-before-inference buys on this corpus's duplication factor
    config_nodedup = KGPipelineConfig(score_distinct=False, compute_dtype="float32")
    config_nodedup.weights = config.resolved_weights()
    build_triples(tdf, config_nodedup).write.format("noop").mode(
        "overwrite"
    ).save()  # warm
    timings["kg_scored_triples_per_occurrence"] = best_of(
        "kg_scored_triples_per_occurrence",
        lambda: run_noop(build_triples(tdf, config_nodedup)),
        n=3,
    )

    # Second duplication factor: the SAME corpus size with plant_variants=1
    # (every planted turn repeats one of 10 fixed sentences — duplication
    # factor ~10^3-10^4). Publishing both paths at both factors shows where
    # the dedup win comes from and what it costs when there is little
    # duplication to harvest.
    synthesize_transcripts(
        spark, n_convs=n_convs, plant_variants=1
    ).repartition(4 * cpus).write.mode("overwrite").parquet(
        "/tmp/relex_bench_transcripts_hd"
    )
    tdf_hd = spark.read.parquet("/tmp/relex_bench_transcripts_hd")
    cfg_hd = KGPipelineConfig(compute_dtype="float32")
    cfg_hd.weights = config.resolved_weights()
    cfg_hd_nodedup = KGPipelineConfig(score_distinct=False, compute_dtype="float32")
    cfg_hd_nodedup.weights = config.resolved_weights()
    build_triples(tdf_hd, cfg_hd).write.format("noop").mode("overwrite").save()
    timings["kg_scored_triples_highdup"] = best_of(
        "kg_scored_triples_highdup",
        lambda: run_noop(build_triples(tdf_hd, cfg_hd)),
        n=2,
    )
    build_triples(tdf_hd, cfg_hd_nodedup).write.format("noop").mode(
        "overwrite"
    ).save()
    timings["kg_scored_triples_highdup_per_occurrence"] = best_of(
        "kg_scored_triples_highdup_per_occurrence",
        lambda: run_noop(build_triples(tdf_hd, cfg_hd_nodedup)),
        n=2,
    )

    # --- reference model capacity (VERDICT r4 item 1) -------------------
    # The headline rows above run the 2-dim toy fixture weights; these rows
    # run the SAME pipeline with seeded synthetic weights at the
    # reference's flagship capacity (GloVe-300d, 2x50d offsets, 150x[2..5]
    # filters = 600-d encoder, 19 labels — baseline_cnn.jsonnet:4-9), at
    # BOTH duplication factors, so the inference/scan balance and the
    # dedup-win arithmetic are MEASURED at production FLOP density.
    # Labels from synthetic weights carry no golden — throughput rows only,
    # excluded from the frozen headline sum.
    from relex_spark.plans.kg_pipeline import reference_capacity_weights

    w_ref = reference_capacity_weights()
    cfg_ref = KGPipelineConfig()
    cfg_ref.weights = w_ref
    build_triples(tdf, cfg_ref).write.format("noop").mode(
        "overwrite"
    ).save()  # warm
    refcap_sec = best_of(
        "kg_scored_triples_refcap",
        lambda: run_noop(build_triples(tdf, cfg_ref)),
        n=2,
    )
    timings["kg_scored_triples_refcap"] = refcap_sec
    cfg_ref_hd = KGPipelineConfig()
    cfg_ref_hd.weights = w_ref
    build_triples(tdf_hd, cfg_ref_hd).write.format("noop").mode(
        "overwrite"
    ).save()  # warm
    timings["kg_scored_triples_refcap_highdup"] = best_of(
        "kg_scored_triples_refcap_highdup",
        lambda: run_noop(build_triples(tdf_hd, cfg_ref_hd)),
        n=2,
    )
    # per-occurrence at reference capacity: ~dup_factor x the kernel work
    # (minutes of pure GEMM) — warm run discarded like every other row,
    # then n=1, informational: it exists to measure what
    # dedup-before-inference buys at production FLOP density, and the
    # quantity of interest (a ratio of minutes to seconds) dwarfs host
    # noise even at one sample
    cfg_ref_po = KGPipelineConfig(score_distinct=False)
    cfg_ref_po.weights = w_ref
    build_triples(tdf, cfg_ref_po).write.format("noop").mode(
        "overwrite"
    ).save()  # warm
    timings["kg_scored_triples_refcap_per_occurrence"] = best_of(
        "kg_scored_triples_refcap_per_occurrence",
        lambda: run_noop(build_triples(tdf, cfg_ref_po)),
        n=1,
    )

    scored = build_triples(tdf, config).cache()
    n_triples = scored.count()

    # canonicalization timed on the cached scored table (the pipeline's one
    # wide stage), not a recompute of the narrow scoring chain
    from relex_spark.operators.canonicalize import (
        alias_edges_from_gazetteer,
        canonicalize_triples,
        connected_components,
    )
    from relex_spark.sources.transcripts import gazetteer_df

    # CC over the gazetteer alias graph is untimed prep (same protocol as
    # scripts/scaling_bench.py): its input is O(|entities|), constant in
    # corpus size — timing it here just re-ran a multi-job driver loop per
    # sample and dominated the variance
    components = connected_components(
        alias_edges_from_gazetteer(gazetteer_df(spark))
    ).localCheckpoint(eager=True)

    def _canon_job() -> int:
        return canonicalize_triples(scored, components).count()

    n_canon = _canon_job()  # discarded warm run (codegen compile)
    timings["kg_canonicalize"] = best_of("kg_canonicalize", _canon_job, n=3)

    # Salted variant under the planted Zipf skew (transcripts.py: hot_convs
    # are hot_factor× longer, so their sentences repeat into hot
    # (subj, pred, obj) keys) — measured evidence for the salt_buckets knob
    # (salted == unsalted output parity is pinned in tests).
    def _canon_salted_job() -> int:
        return canonicalize_triples(scored, components, salt_buckets=8).count()

    _canon_salted_job()  # warm
    timings["kg_canonicalize_salted"] = best_of(
        "kg_canonicalize_salted", _canon_salted_job, n=3
    )
    scored.unpersist()

    # transparency for the dedup-before-inference default: how many
    # DISTINCT (tokens, spans) inputs the CNN actually scored vs the
    # candidate total (the synthetic corpus repeats sentences heavily;
    # config.score_distinct=False re-scores every occurrence)
    from relex_spark.operators.candidates import (
        detect_mentions,
        generate_candidate_pairs,
    )
    from relex_spark.plans.kg_pipeline import preprocess_candidates

    pairs = preprocess_candidates(
        generate_candidate_pairs(
            detect_mentions(tdf, config.gazetteer_rows, keep_text=False),
            config.max_pairs_per_turn,
        ),
        config.max_len,
    )
    from relex_spark.plans.kg_pipeline import score_key

    _, _key = score_key(config.encoder)  # the same key build_triples dedups on
    distinct_scored = pairs.select(_key.alias("k")).distinct().count()
    n_candidates = pairs.count()

    pairs_hd = preprocess_candidates(
        generate_candidate_pairs(
            detect_mentions(tdf_hd, config.gazetteer_rows, keep_text=False),
            config.max_pairs_per_turn,
        ),
        config.max_len,
    )
    distinct_scored_hd = pairs_hd.select(_key.alias("k")).distinct().count()
    n_candidates_hd = pairs_hd.count()

    # --- r5 extension operators (excluded from the frozen headline) -------
    for name in (
        "text_chunk_windows",
        "x_coref_resolve",
        "x_negative_samples",
        "x_triangle_counts",
        "kg_pair_timeline",
        "x_collapse_retries",
    ):
        run_noop(QUERIES[name](spark, sf_dir))  # discarded warm run
        timings[name] = best_of(
            name, lambda: run_noop(QUERIES[name](spark, sf_dir)), n=2
        )
        log(f"{name}: {timings[name]}s {raw_runs[name]}")

    loadavg["end"] = list(os.getloadavg())
    # Headline composition is FROZEN at the round-3 suite: rows added in
    # later rounds (the r4 highdup pair, the r5 reference-capacity rows
    # and extension-operator rows) are published as individual timings but
    # excluded from the summed headline, so headline_suite_sec stays
    # apples-to-apples across rounds.
    headline_exclude = {
        "kg_scored_triples_highdup",
        "kg_scored_triples_highdup_per_occurrence",
        "kg_scored_triples_refcap",
        "kg_scored_triples_refcap_highdup",
        "kg_scored_triples_refcap_per_occurrence",
        "text_chunk_windows",
        "x_coref_resolve",
        "x_negative_samples",
        "x_triangle_counts",
        "kg_pair_timeline",
        "x_collapse_retries",
    }
    total = round(
        sum(v for k, v in timings.items() if k not in headline_exclude), 3
    )
    result = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "headline_excludes": sorted(headline_exclude & set(timings)),
        "sf": sf,
        "kg": {
            "n_convs": n_convs,
            "n_turns": n_turns,
            "scored_triples": n_triples,
            "candidates": n_candidates,
            "distinct_scored_inputs": distinct_scored,
            "duplication_factor": round(
                n_candidates / max(distinct_scored, 1), 1
            ),
            "canonical_triples": n_canon,
            "triples_per_sec": round(n_triples / scored_sec, 1),
            "turns_per_sec": round(n_turns / scored_sec, 1),
            # the fixed-10-sentence corpus (plant_variants=1): same size,
            # ~10^3-10^4 duplication factor — the second published factor
            "highdup": {
                "candidates": n_candidates_hd,
                "distinct_scored_inputs": distinct_scored_hd,
                "duplication_factor": round(
                    n_candidates_hd / max(distinct_scored_hd, 1), 1
                ),
            },
            # reference-capacity (600-d CNN) throughput: the kernel rate is
            # a LOWER bound (the elapsed time includes scan + dedup +
            # join); dedup_speedup_refcap = what dedup-before-inference
            # buys at production FLOP density on this corpus's dup factor
            "refcap": {
                "turns_per_sec": round(n_turns / refcap_sec, 1),
                "kernel_distinct_inputs_per_sec": round(
                    distinct_scored / refcap_sec, 1
                ),
                "dedup_speedup_refcap": round(
                    timings["kg_scored_triples_refcap_per_occurrence"]
                    / refcap_sec,
                    2,
                ),
            },
        },
        "telemetry": {
            # min-of-n is the published number; every raw sample + the
            # loadavg envelope lets this artifact self-adjudicate host noise
            "raw_runs_sec": raw_runs,
            "loadavg": loadavg,
        },
        "config": {
            "cpus": cpus,
            "spark": spark.version,
            "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
            "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
            # the driver testdata is one single-row-group parquet file per
            # table, so every query's scan + narrow stage runs as ONE task
            # regardless of cores — per-query times here carry that serial
            # floor (the kg corpus is written as 128 files and does not)
            "input_layout": "single-file single-rowgroup parquet per table",
        },
    }
    print(json.dumps(result), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
