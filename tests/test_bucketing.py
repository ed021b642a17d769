"""Bucketed-table support: shuffle-free co-located joins (io/bucketing.py)."""

from __future__ import annotations

import pytest

from eirepolitic_data_pipeline_spark.io.bucketing import (
    bucketed_join,
    buckets_for,
    exchanges_in_plan,
    register_bucketed,
    write_bucketed,
)


def test_buckets_for_sizing():
    assert buckets_for(1) == 4
    assert buckets_for(10_000_000, rows_per_bucket=1_000_000) == 16
    assert buckets_for(10**12) == 4096  # clamped
    # power of two always
    for n in (3, 7, 100, 12345):
        b = buckets_for(n * 10**6, rows_per_bucket=10**6)
        assert b & (b - 1) == 0


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, tmp_path, no_broadcast):
    facts = spark.createDataFrame(
        [(i % 50, i, float(i)) for i in range(1000)],
        "member_id int, row_id long, v double")
    dims = spark.createDataFrame(
        [(i, f"m{i}") for i in range(50)], "member_id int, name string")

    write_bucketed(facts, "b_facts", ["member_id"], 8,
                   str(tmp_path / "facts"))
    write_bucketed(dims, "b_dims", ["member_id"], 8, str(tmp_path / "dims"))
    try:
        joined = bucketed_join(spark, "b_facts", "b_dims", ["member_id"])
        assert exchanges_in_plan(joined) == 0
        assert joined.count() == 1000

        # the same join on plain (non-bucketed) frames must shuffle —
        # proves the assertion above is not vacuous
        plain = facts.join(dims, ["member_id"])
        assert exchanges_in_plan(plain) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_facts")
        spark.sql("DROP TABLE IF EXISTS b_dims")


def test_register_bucketed_reattaches_metadata(spark, tmp_path, no_broadcast):
    df = spark.createDataFrame(
        [(i % 20, i) for i in range(200)], "k int, row_id long")
    write_bucketed(df, "b_left", ["k"], 4, str(tmp_path / "left"))
    write_bucketed(df, "b_right", ["k"], 4, str(tmp_path / "right"))
    try:
        # simulate a fresh session: drop the catalog entry, re-attach the
        # existing directory with explicit bucketing DDL
        spark.sql("DROP TABLE b_right")
        register_bucketed(spark, "b_right", str(tmp_path / "right"),
                          "k int, row_id long", ["k"], 4)
        joined = bucketed_join(spark, "b_left", "b_right", ["k"])
        assert exchanges_in_plan(joined) == 0
        assert joined.count() == 200 * 10  # 10 matches per key per side
    finally:
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")
