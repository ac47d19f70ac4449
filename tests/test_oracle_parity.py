"""Every registry query with an oracle must match DuckDB at sf0.01 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from mapreduce_rust_spark import registry
from tests.conftest import SF_CORRECT
from tests.oracle import assert_matches_oracle

CASES = sorted(registry.oracles().keys())


@pytest.mark.parametrize("name", CASES)
def test_matches_oracle(spark, duck, name):
    fn = registry.queries()[name]
    sql = registry.oracles()[name]
    assert_matches_oracle(spark, duck, fn, sql, SF_CORRECT)


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0


def test_all_queries_have_entries(spark):
    qs = registry.queries()
    assert len(qs) >= 2
    for name in registry.oracles():
        assert name in qs


def test_driver_window_spends_all_50_slots_on_oracled_queries():
    """The driver verifies only the first 50 registrations; every slot
    must be a real, oracled query (a rename or no-oracle entry here
    silently burns driver evidence)."""
    window = registry.DRIVER_WINDOW
    assert len(window) == 50 == len(set(window))
    assert list(registry.queries())[:50] == window
    oracled = registry.oracles()
    assert all(n in oracled for n in window)


@pytest.mark.parametrize("name", sorted(registry.queries().keys()))
def test_runs_at_tiny_scale(spark, name):
    """Every registered query must EXECUTE at sf0.001 — the
    empty-group / missing-event-type / single-partition edge cases a
    10x-smaller fixture surfaces and the sf0.01 oracle runs never
    hit. Row counts are not asserted (tiny inputs legitimately
    produce 0 rows for selective queries); not raising is the
    contract."""
    from tests.conftest import SF_SMOKE
    fn = registry.queries()[name]
    assert fn(spark, SF_SMOKE).count() >= 0
