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


def test_certification_window_holds_every_non_tail_query():
    """The driver's correctness gate certifies roughly the first 50
    registered queries. The rotation in workload/__init__.py only works if
    EVERYTHING outside _CERT_TAIL fits that window — so adding a new query
    without demoting a banked one to the tail must fail here, not silently
    push some query out of certification for every future round."""
    from eirepolitic_data_pipeline_spark import workload

    names = list(workload.QUERIES)
    assert len(names) - len(workload._CERT_TAIL) <= 50, (
        "too many non-tail queries for the driver's ~50-query gate: "
        "demote a long-stable, multiply-certified query to _CERT_TAIL")
    # priority queries must sit at the very front (tightest budgets first)
    assert names[:len(workload._CERT_PRIORITY)] == workload._CERT_PRIORITY
    assert names[-len(workload._CERT_TAIL):] == workload._CERT_TAIL
