"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql() agree."""

from __future__ import annotations

import __spark_entry__ as entrymod

from tests.conftest import SF_SMOKE


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_oracle_key_has_query():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # the overwhelming majority of the surface must be oracle-checked
    assert len(oracles) >= int(0.8 * len(qs))


def test_all_queries_run_at_smoke_sf(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
        df.limit(5).collect()
