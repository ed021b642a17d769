"""End-to-end incremental rollup refresh: delta-only aggregation merged
into the persisted rollup through the candidate-batch lifecycle, with
overlap re-delivery absorbed exactly-once and distinct counts maintained
by mergeable sketches — the O(delta) twin of the recompute refresh."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eirepolitic_data_pipeline_spark.io.catalog import BatchCatalog
from eirepolitic_data_pipeline_spark.jobs.incremental_refresh import (
    IncrementalRollup,
)


def _facts(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("fact_id"),
        (F.col("id") % 5).alias("year"),
        (F.col("id") % 37).cast("string").alias("member"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 60)
        .alias("ts"))


def _agg(df):
    return df.groupBy("year").agg(F.count(F.lit(1)).alias("n_votes"))


def test_incremental_refresh_matches_full_recompute(spark, tmp_path):
    catalog = BatchCatalog(root=str(tmp_path / "wh"))
    job = IncrementalRollup(
        catalog=catalog, spark=spark, table="votes_by_year",
        keys=["year"], fact_id_col="fact_id", count_cols=["n_votes"],
        distinct_col="member", fact_ts_col="ts")

    # window 1
    job.refresh(_facts(spark, 0, 600), _agg, batch_id="w1")
    catalog.promote("w1", job.tables)

    # window 2 OVERLAPS window 1 (rows 400-599 re-delivered) + new rows
    job.refresh(_facts(spark, 400, 1000), _agg, batch_id="w2")
    catalog.promote("w2", job.tables)

    got = {r["year"]: (r["n_votes"], r["approx_distinct"])
           for r in catalog.read_table(spark, "votes_by_year").collect()}
    full = _facts(spark, 0, 1000)
    want_counts = {r["year"]: r["n"] for r in full.groupBy("year").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    want_distinct = {r["year"]: r["n"] for r in full.groupBy("year").agg(
        F.countDistinct("member").alias("n")).collect()}
    for y in want_counts:
        n, d = got[y]
        assert n == want_counts[y], "re-delivered facts must count ONCE"
        assert d == want_distinct[y]  # 37 members « sketch error bound

    # the rollup survives rollback like any other table
    catalog.rollback("w1")
    w1 = {r["year"]: r["n_votes"] for r in
          catalog.read_table(spark, "votes_by_year").collect()}
    w1_want = {r["year"]: r["n"] for r in _facts(spark, 0, 600)
               .groupBy("year").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert w1 == w1_want


def test_processed_id_log_horizon_pruning(spark, tmp_path):
    catalog = BatchCatalog(root=str(tmp_path / "wh"))
    job = IncrementalRollup(
        catalog=catalog, spark=spark, table="t", keys=["year"],
        fact_id_col="fact_id", count_cols=["n_votes"], fact_ts_col="ts")
    job.refresh(_facts(spark, 0, 500), _agg, batch_id="w1")
    catalog.promote("w1", job.tables)
    n_ids_1 = catalog.read_table(spark, "t__processed_ids").count()
    assert n_ids_1 == 500

    # horizon past the first 300 facts' event times → log shrinks even as
    # new facts arrive (bounded by the re-delivery window, not history)
    import datetime
    horizon = datetime.datetime.fromtimestamp(
        1_700_000_000 + 300 * 60,
        tz=datetime.timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
    job.refresh(_facts(spark, 500, 700), _agg, batch_id="w2",
                horizon=horizon)
    catalog.promote("w2", job.tables)
    n_ids_2 = catalog.read_table(spark, "t__processed_ids").count()
    assert n_ids_2 == 400  # facts 300..699

    # counts still exact: pruned ids were outside any re-delivery window
    got = {r["year"]: r["n_votes"] for r in
           catalog.read_table(spark, "t").collect()}
    want = {r["year"]: r["n"] for r in _facts(spark, 0, 700)
            .groupBy("year").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want

    with pytest.raises(ValueError):
        IncrementalRollup(
            catalog=catalog, spark=spark, table="x", keys=["year"],
            fact_id_col="fact_id", count_cols=["n_votes"]).refresh(
            _facts(spark, 0, 10), _agg, batch_id="w3", horizon=horizon)


def test_incremental_refresh_null_group(spark, tmp_path):
    """A NULL group key flows through the whole job: additive merge,
    sketch estimate attach, and exactly-once re-delivery."""
    catalog = BatchCatalog(root=str(tmp_path / "wh"))
    job = IncrementalRollup(
        catalog=catalog, spark=spark, table="ng", keys=["year"],
        fact_id_col="fact_id", count_cols=["n_votes"],
        distinct_col="member", fact_ts_col="ts")

    def facts(lo, hi):
        return _facts(spark, lo, hi).withColumn(
            "year", F.when(F.col("year") == 0, None).otherwise(F.col("year")))

    job.refresh(facts(0, 300), _agg, batch_id="w1")
    catalog.promote("w1", job.tables)
    job.refresh(facts(200, 500), _agg, batch_id="w2")  # overlap 200-299
    catalog.promote("w2", job.tables)
    got = {r["year"]: (r["n_votes"], r["approx_distinct"])
           for r in catalog.read_table(spark, "ng").collect()}
    full = facts(0, 500)
    want = {r["year"]: (r["n"], r["d"]) for r in full.groupBy("year").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("member").alias("d")).collect()}
    assert None in got and got == want


def test_within_window_duplicates_count_once(spark, tmp_path):
    catalog = BatchCatalog(root=str(tmp_path / "wh"))
    job = IncrementalRollup(
        catalog=catalog, spark=spark, table="d", keys=["year"],
        fact_id_col="fact_id", count_cols=["n_votes"])
    doubled = _facts(spark, 0, 100).unionByName(_facts(spark, 0, 100))
    job.refresh(doubled, _agg, batch_id="w1")
    catalog.promote("w1", job.tables)
    got = {r["year"]: r["n_votes"] for r in
           catalog.read_table(spark, "d").collect()}
    assert sum(got.values()) == 100  # one source page delivered twice


def test_refresh_refuses_unpromoted_previous_batch(spark, tmp_path):
    from eirepolitic_data_pipeline_spark.io.catalog import CatalogError
    catalog = BatchCatalog(root=str(tmp_path / "wh"))
    job = IncrementalRollup(
        catalog=catalog, spark=spark, table="g", keys=["year"],
        fact_id_col="fact_id", count_cols=["n_votes"])
    job.refresh(_facts(spark, 0, 50), _agg, batch_id="w1")
    # w1 never promoted: its facts would silently vanish from w2's rollup
    with pytest.raises(CatalogError, match="unpromoted"):
        job.refresh(_facts(spark, 50, 100), _agg, batch_id="w2")
    # the guard is durable: a FRESH instance (new process after a crash
    # between refresh and promote) must refuse just the same
    job2 = IncrementalRollup(
        catalog=BatchCatalog(root=str(tmp_path / "wh")), spark=spark,
        table="g", keys=["year"], fact_id_col="fact_id",
        count_cols=["n_votes"])
    with pytest.raises(CatalogError, match="unpromoted"):
        job2.refresh(_facts(spark, 50, 100), _agg, batch_id="w2")
    catalog.promote("w1", job.tables)
    job.refresh(_facts(spark, 50, 100), _agg, batch_id="w2")  # now fine
    catalog.promote("w2", job.tables)
    assert sum(r["n_votes"] for r in
               catalog.read_table(spark, "g").collect()) == 100


def test_horizon_validation_before_any_write(spark, tmp_path):
    catalog = BatchCatalog(root=str(tmp_path / "wh"))
    job = IncrementalRollup(
        catalog=catalog, spark=spark, table="v", keys=["year"],
        fact_id_col="fact_id", count_cols=["n_votes"],
        distinct_col="member")  # no fact_ts_col
    with pytest.raises(ValueError, match="fact_ts_col"):
        job.refresh(_facts(spark, 0, 10), _agg, batch_id="w1",
                    horizon="2026-01-01")
    # nothing was written — the SAME batch id is still cleanly usable
    job.refresh(_facts(spark, 0, 10), _agg, batch_id="w1")
    catalog.promote("w1", job.tables)
