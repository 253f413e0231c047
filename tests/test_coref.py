"""Anaphora resolution (operators/coref.py): semantics on a real-pronoun
fixture conversation, lookback bounds, and partitioning independence."""

import pytest

from relex_spark.operators.coref import resolve_anaphora


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )


ENTS = ("alice", "server")


def test_resolves_to_most_recent_prior_mention(spark):
    t = _turns(
        spark,
        [
            ("c1", 0, "alice deployed the build"),
            ("c1", 1, "the server restarted"),
            ("c1", 2, "it looks healthy now"),
            ("c1", 3, "she confirmed the rollout"),
        ],
    )
    rows = {
        r["turn_idx"]: r
        for r in resolve_anaphora(t, ENTS, lookback=6).collect()
    }
    # turn 2's "it" -> most recent mention = server (turn 1), not alice
    assert rows[2]["trigger"] == "it"
    assert rows[2]["antecedent"] == "server"
    assert rows[2]["antecedent_turn_idx"] == 1
    assert rows[2]["gap"] == 1
    # turn 3's "she" -> still server: last mention by position in the most
    # recent mentioning turn (recency heuristic is turn-then-position)
    assert rows[3]["antecedent"] == "server"
    # turn 0 mentions alice but has no prior context -> no row; turn 1 has
    # no trigger token -> no row
    assert set(rows) == {2, 3}


def test_same_turn_mention_never_resolves_own_trigger(spark):
    t = _turns(
        spark,
        [
            ("c1", 0, "it was alice"),  # trigger + mention in ONE turn
        ],
    )
    assert resolve_anaphora(t, ENTS).count() == 0


def test_lookback_bound_is_strict(spark):
    t = _turns(
        spark,
        [
            ("c1", 0, "alice filed the report"),
            ("c1", 1, "nothing here"),
            ("c1", 2, "nothing here"),
            ("c1", 3, "it is still open"),
        ],
    )
    # gap of 3 resolves at lookback=3 but not lookback=2
    assert resolve_anaphora(t, ENTS, lookback=3).count() == 1
    assert resolve_anaphora(t, ENTS, lookback=2).count() == 0


def test_conversation_isolation_and_partitioning_independence(spark):
    rows = []
    for c in range(6):
        rows.append((f"c{c}", 0, f"alice owns conv {c}" if c % 2 else "x y"))
        rows.append((f"c{c}", 1, "it should resolve"))
    t = _turns(spark, rows)
    base = sorted(
        map(tuple, resolve_anaphora(t, ENTS).collect())
    )
    # odd conversations resolve, even ones have no antecedent
    assert len(base) == 3
    assert all(r[0] in {"c1", "c3", "c5"} for r in base)
    repart = sorted(
        map(tuple, resolve_anaphora(t.repartition(7), ENTS).collect())
    )
    assert base == repart


def test_argument_validation(spark):
    t = _turns(spark, [("c1", 0, "x")])
    with pytest.raises(ValueError):
        resolve_anaphora(t, ENTS, lookback=0)
    with pytest.raises(ValueError):
        resolve_anaphora(t, ())
    with pytest.raises(ValueError):
        resolve_anaphora(t, ENTS, triggers=())
