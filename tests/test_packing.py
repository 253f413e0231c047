"""Training-batch assembly: greedy sequence packing + token-budget mixing
(the corpus-level paths are oracle-checked by scripts/check_oracles.py via
x_pack_sequences / x_token_budget_mix; these pin the greedy recurrence and
the two-phase-cumsum order contract against hand-computed goldens and a
pure-Python replay)."""

import hashlib

from pyspark.sql import functions as F

from relex_spark.operators.packing import pack_greedy, token_budget_mix


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_pack_greedy_golden_single_shard(spark):
    # token counts: 4, 3, 5, 12 (oversized), 2, 9 — budget 10
    docs = _mkdocs(
        spark,
        [
            (1, "s", "a a a a"),
            (2, "s", "b b b"),
            (3, "s", "c c c c c"),
            (4, "s", "d d d d d d d d d d d d"),
            (5, "s", "e e"),
            (6, "s", "f f f f f f f f f"),
        ],
    )
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_pos"], r["tok_count"])
        for r in pack_greedy(docs, budget=10, n_shards=1).collect()
    }
    assert got == {
        1: (0, 0, 4),
        2: (0, 1, 3),   # 4+3 fits
        3: (1, 0, 5),   # 7+5 > 10 -> new pack
        4: (2, 0, 12),  # oversized: its own pack
        5: (3, 0, 2),   # after an over-full pack, always a fresh pack
        6: (4, 0, 9),   # 2+9 > 10
    }


def test_pack_greedy_invariants_and_determinism(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = pack_greedy(docs, budget=256, n_shards=8).cache()
    n_docs = docs.count()
    assert packed.count() == n_docs  # every doc assigned exactly once

    per_pack = packed.groupBy("shard", "pack_id").agg(
        F.sum("tok_count").alias("fill"),
        F.count(F.lit(1)).alias("n"),
        F.sort_array(F.collect_list("pack_pos")).alias("positions"),
    )
    # no multi-doc pack exceeds the budget; oversized docs ride alone
    assert per_pack.where((F.col("fill") > 256) & (F.col("n") > 1)).count() == 0
    # positions are contiguous 0..n-1 within each pack
    bad = per_pack.where(
        F.col("positions") != F.sequence(F.lit(0), F.col("n").cast("int") - 1)
    ).count()
    assert bad == 0

    # repartitioning the input cannot change the packing (shard+id order)
    again = {
        (r["doc_id"]): (r["shard"], r["pack_id"], r["pack_pos"])
        for r in pack_greedy(docs.repartition(13), budget=256, n_shards=8).collect()
    }
    base = {
        (r["doc_id"]): (r["shard"], r["pack_id"], r["pack_pos"])
        for r in packed.collect()
    }
    assert again == base
    # the session is shared across test modules: leaving this cached would
    # let Catalyst substitute InMemoryTableScan into OTHER tests'
    # identically-shaped pack plans (it broke the plan-shape test)
    packed.unpersist()


def test_token_budget_mix_python_replay(spark):
    rows = [
        (i, f"src{i % 3}", " ".join(["w"] * (5 + (i * 7) % 23))) for i in range(60)
    ]
    docs = _mkdocs(spark, rows)
    budgets = {"src0": 90, "src1": 40}
    got = {
        r["doc_id"]: (r["source"], r["tok_count"], r["cum_tokens"])
        for r in token_budget_mix(docs, budgets, n_buckets=4).collect()
    }

    # pure-Python replay of the order contract: (bucket, hash, id) per source
    expect = {}
    for src, budget in budgets.items():
        pool = [
            (doc_id, len(text.split()))
            for doc_id, s, text in rows
            if s == src
        ]
        order = sorted(
            pool,
            key=lambda t: (_h64(f"mix:{t[0]}") % 4, _h64(f"mix:{t[0]}"), t[0]),
        )
        cum = 0
        for doc_id, tok in order:
            if cum >= budget:  # budget already met BEFORE this doc -> cut
                break
            cum += tok
            expect[doc_id] = (src, tok, cum)
    assert got == expect
    # the crossing doc is kept: per source the final cum may exceed budget
    # by less than one doc, and every budgeted source contributed
    assert {s for s, _, _ in got.values()} == set(budgets)


def test_token_budget_mix_tiny_budget_keeps_one_doc(spark):
    docs = _mkdocs(spark, [(1, "a", "x y z"), (2, "a", "p q"), (3, "b", "k")])
    out = token_budget_mix(docs, {"a": 1}, n_buckets=2).collect()
    # budget smaller than any doc: exactly the first doc in contract order
    assert len(out) == 1 and out[0]["source"] == "a"


def test_epoch_order_permutation_properties(spark):
    """Different epochs give different permutations; the same epoch is
    stable under repartitioning; ord is dense 1..n per shard."""
    from relex_spark.operators.packing import epoch_order

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # n_shards pinned: layout-independent output is the contract only at a
    # fixed shard count (the derived default follows the input layout)
    e1 = {
        r["doc_id"]: (r["shard"], r["ord"])
        for r in epoch_order(docs, 1, n_shards=8).collect()
    }
    e2 = {
        r["doc_id"]: (r["shard"], r["ord"])
        for r in epoch_order(docs, 2, n_shards=8).collect()
    }
    r1 = {
        r["doc_id"]: (r["shard"], r["ord"])
        for r in epoch_order(docs.repartition(7), 1, n_shards=8).collect()
    }
    assert set(e1) == set(e2) == set(r1)     # a permutation, not a sample
    assert e1 == r1                           # partitioning-independent
    assert e1 != e2                           # epochs genuinely reshuffle
    by_shard: dict[int, list[int]] = {}
    for shard, ordn in e1.values():
        by_shard.setdefault(shard, []).append(ordn)
    for orders in by_shard.values():
        assert sorted(orders) == list(range(1, len(orders) + 1))  # dense


def test_derived_parallel_unit_defaults_follow_input_layout(spark):
    """n_shards/n_buckets default to max(8, input scan partitions): a wide
    input must not collapse into 8 single-task passes (VERDICT r4), and
    both packings remain complete/valid at the derived width."""
    from relex_spark.operators.packing import (
        _default_parallel_units,
        epoch_order,
        pack_greedy,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wide = docs.repartition(24)
    assert _default_parallel_units(docs) == 8  # small scan -> floor
    assert _default_parallel_units(wide) == 24

    packed = pack_greedy(wide, budget=256).collect()
    assert {r["shard"] for r in packed} <= set(range(24))
    assert max(r["shard"] for r in packed) >= 8  # actually spread wider
    assert len(packed) == docs.count()  # complete: every doc packed once

    ordered = epoch_order(wide, epoch=1).collect()
    assert len(ordered) == len(packed)
    assert max(r["shard"] for r in ordered) >= 8
