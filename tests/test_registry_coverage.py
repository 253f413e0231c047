"""Structural carrier-coverage guard for the two-tier query registry.

The driver's per-round correctness snapshot caps at 50 queries
(DRIVER_TIER); fine-grained originals live in the EXTRA tier. This test
makes the carrier mapping STRUCTURAL: a new EXTRA query registered without
an EXTRA_COVERAGE entry fails here, so nothing can silently land outside
the driver correctness window (previously the mapping lived only in
docs/COVERAGE.md prose).
"""

from relex_spark.plans import driver_queries as dq


def test_every_extra_query_is_mapped():
    unmapped = sorted(set(dq.EXTRA_QUERIES) - set(dq.EXTRA_COVERAGE))
    assert not unmapped, (
        f"EXTRA-tier queries without an EXTRA_COVERAGE entry: {unmapped} — "
        "declare their DRIVER_TIER carrier or a 'standalone: <reason>'"
    )


def test_no_stale_coverage_entries():
    stale = sorted(set(dq.EXTRA_COVERAGE) - set(dq.EXTRA_QUERIES))
    assert not stale, f"EXTRA_COVERAGE names unregistered queries: {stale}"


def test_carrier_entries_point_at_driver_tier():
    driver = set(dq.DRIVER_TIER)
    for name, target in dq.EXTRA_COVERAGE.items():
        if target.startswith("standalone:"):
            assert len(target) > len("standalone:") + 5, (
                f"{name}: standalone entry needs a real reason"
            )
        else:
            assert target in driver, (
                f"{name}: declared carrier {target!r} is not in DRIVER_TIER"
            )


def test_substring_composed_carriers_match_declaration():
    """Where a carrier oracle literally embeds the constituent's oracle (the
    _sub() composition), the declared mapping must agree with the embedding
    — catches a mapping edited out of sync with the SQL composition."""
    for name, target in dq.EXTRA_COVERAGE.items():
        osql = dq.EXTRA_ORACLES.get(name)
        if not osql:
            continue
        embedding = [
            d for d in dq.DRIVER_TIER
            if dq.ORACLES.get(d) and osql in dq.ORACLES[d]
        ]
        if embedding:
            assert target in embedding, (
                f"{name}: oracle is embedded in {embedding} but mapped to "
                f"{target!r}"
            )
