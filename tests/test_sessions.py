"""Sessionization + as-of join: hand-computed goldens, boundary semantics
(equal-ts match, pre-first-reference null, exact gap vs gap+ε)."""

from datetime import datetime

from pyspark.sql import functions as F

from relex_spark.operators.sessions import asof_join, session_bounds, sessionize


def _ts(m, s=0, us=0):
    return datetime(2024, 1, 1, 0, m, s, us)


def test_sessionize_gap_boundaries(spark):
    rows = [
        # user 1: events at 0:00, 0:10, 0:40 (gap 30min exact -> same
        # session at exactly gap, new session beyond), 1:20
        (1, 100, _ts(0)),
        (1, 101, _ts(10)),
        (1, 102, _ts(40)),          # 30:00.000000 after prev — NOT > gap
        (1, 103, _ts(10, 0, 1)),    # out-of-order insert, sorts second
        (2, 200, _ts(5)),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    # user 1 ordered: 100@0:00, 101@0:10, 103@0:10.000001, 102@0:40
    # 102 is exactly 1800s - (10m 0.000001s) after 103 => < gap, same session
    assert got == {100: 1, 101: 1, 103: 1, 102: 1, 200: 1}

    # shrink the gap to 9 minutes: 0:00 | 0:10,0:10.000001 | 0:40
    got2 = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(df, gap_seconds=540).collect()
    }
    assert got2 == {100: 1, 101: 2, 103: 2, 102: 3, 200: 1}


def test_sessionize_exact_gap_is_same_session(spark):
    """session_window merge semantics: sessions merge while
    next_ts <= last_ts + gap, so an event at exactly last+gap stays in the
    SAME session; one microsecond over opens a new one."""
    rows = [(1, 1, _ts(0)), (1, 2, _ts(30))]  # exactly 1800.000000s apart
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    got = {r["event_id"]: r["session_idx"] for r in sessionize(df, gap_seconds=1800).collect()}
    assert got == {1: 1, 2: 1}
    rows2 = [(1, 1, _ts(0)), (1, 2, _ts(30, 0, 1))]  # one microsecond over
    df2 = spark.createDataFrame(rows2, "user_id int, event_id int, ts timestamp")
    got2 = {r["event_id"]: r["session_idx"] for r in sessionize(df2, gap_seconds=1800).collect()}
    assert got2 == {1: 1, 2: 2}


def test_sessionize_matches_builtin_session_window(spark):
    """Batch/streaming parity: the index-based sessionize produces exactly
    the sessions Spark's built-in session_window produces (same boundary
    rule), on data with planted near-boundary gaps."""
    from relex_spark.operators.sessions import session_bounds

    rows = []
    for u in range(5):
        t = 0
        for i in range(40):
            # gap pattern cycles through under/exact/over the 600s gap
            t += [30, 599_999_999 // 1_000_000, 600, 601, 2000][(u + i) % 5]
            rows.append((u, u * 1000 + i, datetime(2024, 1, 1).timestamp() + t))
    df = spark.createDataFrame(
        [(u, e, datetime.fromtimestamp(ts)) for u, e, ts in rows],
        "user_id int, event_id int, ts timestamp",
    )
    mine = {
        (r["user_id"], r["start_us"]): r["n_events"]
        for r in session_bounds(df, gap_seconds=600).collect()
    }
    builtin = {
        (r["user_id"], r["start_us"]): r["n_events"]
        for r in df.groupBy(
            F.session_window("ts", "600 seconds").alias("win"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("win.start")).cast("bigint").alias("start_us"),
            "n_events",
        )
        .collect()
    }
    assert mine == builtin


def test_session_bounds(spark):
    rows = [(1, 1, _ts(0)), (1, 2, _ts(5)), (1, 3, _ts(59))]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    b = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in session_bounds(df, gap_seconds=1800).collect()
    }
    base = int(_ts(0).timestamp()) * 1_000_000
    assert b[(1, 1)] == (2, base, base + 5 * 60 * 1_000_000)
    assert b[(1, 2)][0] == 1


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "A", _ts(10)),   # matches ref@0:05 (value 5.0)
            (2, "A", _ts(20)),   # matches ref@0:20 (equal ts -> matches)
            (3, "A", _ts(2)),    # before first ref -> null
            (4, "B", _ts(30)),   # key with no refs -> null
        ],
        "event_id int, event_type string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", _ts(5), 5.0), ("A", _ts(20), 20.0), ("A", _ts(25), 25.0)],
        "event_type string, ts timestamp, ref_value double",
    )
    got = {
        r["event_id"]: r["ref_value"]
        for r in asof_join(left, right, key_col="event_type").collect()
    }
    assert got == {1: 5.0, 2: 20.0, 3: None, 4: None}
    # all left rows survive (left semantics)
    assert len(got) == 4


def test_asof_join_single_shuffle_plan(spark):
    """Plan shape: exactly one shuffle Exchange (by key) — no range join,
    no cross product."""
    left = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    right = spark.range(10).select(
        (F.col("id") % 3).cast("string").alias("k"),
        F.timestamp_seconds(F.col("id") * 500).alias("ts"),
        (F.col("id") * 1.0).alias("v"),
    )
    plan = (
        asof_join(left, right, key_col="k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2  # both sides feed one union shuffle
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_asof_join_matches_bruteforce_on_random_data(spark):
    """Seeded randomized check: union+window as-of join equals the per-row
    brute force (max right.ts <= left.ts per key) on data with duplicate
    left timestamps, equal-ts collisions, and keys missing on either side."""
    import random

    rng = random.Random(20240816)
    keys = ["a", "b", "c", "d", "nokey_right"]
    left_rows = [
        (i, rng.choice(keys), _ts(rng.randrange(60), rng.randrange(60), rng.choice([0, 500000])))
        for i in range(200)
    ]
    right_raw = [
        (rng.choice(keys[:4]), _ts(rng.randrange(60), rng.randrange(60), rng.choice([0, 500000])), float(i))
        for i in range(60)
    ]
    # unique per (key, ts): keep max value like the driver query does
    right_map = {}
    for k, ts, v in right_raw:
        right_map[(k, ts)] = max(right_map.get((k, ts), float("-inf")), v)
    right_rows = [(k, ts, v) for (k, ts), v in right_map.items()]

    left = spark.createDataFrame(left_rows, "event_id int, k string, ts timestamp")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp, ref double")
    got = {
        r["event_id"]: r["ref"]
        for r in asof_join(left, right, key_col="k").collect()
    }
    assert len(got) == len(left_rows)
    for eid, k, ts in left_rows:
        cands = [v for (rk, rts), v in right_map.items() if rk == k and rts <= ts]
        expected = (
            max(
                ((rts, v) for (rk, rts), v in right_map.items() if rk == k and rts <= ts),
                key=lambda t: t[0],
            )[1]
            if cands
            else None
        )
        assert got[eid] == expected, (eid, k, ts)


def test_asof_join_null_value_in_matched_row_stays_null(spark):
    """A matched right row whose value is NULL must yield NULL — not an
    older row's value resurrected through the null (ASOF semantics; the
    DuckDB native ASOF JOIN oracle agrees)."""
    import datetime as dt

    from relex_spark.operators.sessions import asof_join

    base = dt.datetime(2024, 1, 1)
    right = spark.createDataFrame(
        [
            ("A", base + dt.timedelta(minutes=5), 5.0),
            ("A", base + dt.timedelta(minutes=20), None),
        ],
        "k string, ts timestamp, v double",
    )
    left = spark.createDataFrame(
        [
            ("A", base + dt.timedelta(minutes=10)),   # matches 00:05 -> 5.0
            ("A", base + dt.timedelta(minutes=30)),   # matches 00:20 -> NULL
            ("A", base + dt.timedelta(minutes=1)),    # nothing before -> NULL
        ],
        "k string, ts timestamp",
    )
    rows = {r["ts"]: r["v"] for r in asof_join(left, right, "k").collect()}
    assert rows[base + dt.timedelta(minutes=10)] == 5.0
    assert rows[base + dt.timedelta(minutes=30)] is None
    assert rows[base + dt.timedelta(minutes=1)] is None


def test_asof_join_rejects_colliding_value_columns(spark):
    import datetime as dt

    import pytest

    from relex_spark.operators.sessions import asof_join

    ts = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([("A", ts, 1.0)], "k string, ts timestamp, price double")
    right = spark.createDataFrame([("A", ts, 2.0)], "k string, ts timestamp, price double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "k")


def test_collapse_retries_semantics(spark):
    from relex_spark.operators.sessions import collapse_retries

    t = spark.createDataFrame(
        [
            # c1: run of 3 near-identical retries after turn 0, then new text
            ("c1", 0, "please rerun the failing job now"),
            ("c1", 1, "please rerun the failing job nww"),   # retry of 0
            ("c1", 2, "please rerun the failing job nww!"),  # retry of 1
            ("c1", 3, "deploy finished without errors"),
            # c2: no retries at all
            ("c2", 0, "alpha beta gamma"),
            ("c2", 1, "completely different text here"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["n_collapsed"], r["text"])
        for r in collapse_retries(t, threshold_u6=200_000).collect()
    }
    assert got == {
        ("c1", 0): (2, "please rerun the failing job now"),
        ("c1", 3): (0, "deploy finished without errors"),
        ("c2", 0): (0, "alpha beta gamma"),
        ("c2", 1): (0, "completely different text here"),
    }
    # threshold 0 collapses only EXACT consecutive duplicates
    exact = collapse_retries(t, threshold_u6=0)
    assert exact.count() == 6
    # partitioning independence
    rep = {
        (r["conv_id"], r["turn_idx"]): (r["n_collapsed"], r["text"])
        for r in collapse_retries(
            t.repartition(5), threshold_u6=200_000
        ).collect()
    }
    assert rep == got
    import pytest as _pytest

    with _pytest.raises(ValueError):
        collapse_retries(t, threshold_u6=2_000_000)
