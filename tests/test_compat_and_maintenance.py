"""Compat adapters, X13/X16 formatting, and in-place column delete."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eirepolitic_data_pipeline_spark.functions import (
    int_or_2dp,
    ordinal_rank,
    percent_string,
)
from eirepolitic_data_pipeline_spark.io import delete_column
from eirepolitic_data_pipeline_spark.tables import (
    compat_summary,
    member_votes_compat,
    members_compat,
)


def test_members_compat_projection(spark):
    members = spark.createDataFrame(
        [("TD001", "Aoife Byrne", "Dublin Bay North", "Green", "34",
          "2026-08-01")],
        "member_code string, full_name string, "
        "latest_constituency_name string, latest_party_name string, "
        "latest_house_no string, snapshot_date string")
    out = members_compat(members)
    assert out.columns == ["member_code", "full_name", "constituency",
                           "party", "house_no", "source", "snapshot_date"]
    r = out.collect()[0]
    assert r["constituency"] == "Dublin Bay North"   # latest_* fallback
    assert r["source"] == "oireachtas_unified"


def test_member_votes_compat_vote_id_fallback(spark):
    votes = spark.createDataFrame(
        [("TD001", "Aoife Byrne", "div1", "v1", "2026-01-10", "Tá"),
         ("TD002", "Sean Park", "", "v2", "2026-01-10", "Níl")],
        "member_code string, member_name string, division_id string, "
        "vote_id string, division_date string, vote_label string")
    rows = {r["memberCode"]: r for r in member_votes_compat(votes).collect()}
    assert rows["TD001"]["unique_vote_id"] == "div1"
    assert rows["TD002"]["unique_vote_id"] == "v2"   # blank div → vote_id
    assert rows["TD001"]["party"] == ""              # missing col → blank


def test_compat_summary_dq(spark):
    members = spark.createDataFrame([("TD001", "A")],
                                    "member_code string, full_name string")
    out = members_compat(members)
    rows, dq = compat_summary([("members_roster", members, out,
                                "member_code")])
    assert rows[0]["status"] == "pass"
    assert rows[0]["output_rows"] == 1
    assert dq["dq_status"] == "pass"

    empty = members.limit(0)
    rows2, dq2 = compat_summary([("members_roster", empty,
                                  members_compat(empty), "member_code")])
    assert rows2[0]["status"] == "fail"
    assert dq2["dq_status"] == "fail"


def test_formatting_functions(spark):
    df = spark.createDataFrame(
        [("12.0", "1", "50"), ("12.345", "2", "33.333"), ("", "3", ""),
         ("oops", "11", "already 5%"), ("7.5", "22", "12.04"),
         (None, "-1", "text")],
        "num string, rank string, pct string")
    got = df.select(
        int_or_2dp("num").alias("n"), ordinal_rank("rank").alias("r"),
        percent_string("pct").alias("p")).collect()
    assert [g["n"] for g in got] == ["12", "12.35", "0", "0", "7.5", "0"]
    assert [g["r"] for g in got] == ["1st", "2nd", "3rd", "11th", "22nd",
                                     "N/A"]
    assert [g["p"] for g in got] == ["50%", "33.3%", "N/A", "already 5%",
                                     "12.0%", "text"]


@pytest.mark.parametrize("fmt", ["parquet", "csv"])
def test_delete_column_in_place(spark, tmp_path, fmt):
    path = str(tmp_path / f"tbl_{fmt}")
    df = spark.createDataFrame([(1, "a", "x"), (2, "b", "y")],
                               "id int, keep string, doomed string")
    w = df.write.format(fmt)
    if fmt == "csv":
        w = w.option("header", True)
    w.save(path)

    assert delete_column(spark, path, "doomed", fmt=fmt) is True
    again = spark.read.format(fmt)
    if fmt == "csv":
        again = again.option("header", True)
    out = again.load(path)
    assert set(out.columns) == {"id", "keep"}
    assert out.count() == 2

    # lax no-op vs strict error on a missing column
    assert delete_column(spark, path, "doomed", fmt=fmt) is False
    with pytest.raises(ValueError):
        delete_column(spark, path, "doomed", fmt=fmt, strict=True)


def test_compact_dataset_reduces_files(spark, tmp_path):
    from eirepolitic_data_pipeline_spark.io.maintenance import compact_dataset
    path = str(tmp_path / "frag")
    # fragment: 24 tiny files
    spark.range(2400).repartition(24).write.parquet(path)
    import os
    before = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(before) == 24
    tele = compact_dataset(spark, path, target_file_bytes=10**9)
    after = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert tele["files_before"] == 24 and tele["files_after"] == len(after) == 1
    assert spark.read.parquet(path).count() == 2400
    # idempotent second pass
    tele2 = compact_dataset(spark, path, target_file_bytes=10**9)
    assert tele2["files_after"] == 1


def test_profile_table_one_pass(spark):
    from eirepolitic_data_pipeline_spark.plans.quality import profile_table
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "", None), (3, None, 2.5), (3, "b", 2.5)],
        "id long, name string, v double")
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"id", "name", "v"}
    assert prof["id"]["row_count"] == 4 and prof["id"]["n_null"] == 0
    assert prof["name"]["n_null"] == 1 and prof["name"]["n_blank"] == 1
    assert prof["v"]["n_null"] == 1 and prof["v"]["n_blank"] is None
    assert prof["id"]["approx_distinct"] == 3      # exact at tiny NDV
    assert (prof["id"]["min_value"], prof["id"]["max_value"]) == ("1", "3")
    assert prof["v"]["max_value"] == "2.5"


def test_compact_dataset_preserves_hive_partitions(spark, tmp_path):
    """Compaction recurses per partition leaf: the snapshot_date= layout,
    the string-typed partition values, and the data all survive."""
    import os
    from eirepolitic_data_pipeline_spark.io.maintenance import compact_dataset
    from pyspark.sql import functions as F
    path = str(tmp_path / "part")
    df = spark.range(600).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "2026-8-1").otherwise("2026-08-02")
        .alias("snapshot_date"))
    df.repartition(6).write.partitionBy("snapshot_date").parquet(path)
    tele = compact_dataset(spark, path, target_file_bytes=10**9)
    assert tele["partitions"] == 2 and tele["files_after"] == 2
    # layout intact, incl. the NON-canonical date spelling
    assert sorted(n for n in os.listdir(path) if n.startswith("snap")) == \
        ["snapshot_date=2026-08-02", "snapshot_date=2026-8-1"]
    # full data survives; reading one leaf gives plain (layout-free) rows
    assert spark.read.parquet(path).count() == 600


def test_profile_table_tolerates_map_columns(spark):
    from eirepolitic_data_pipeline_spark.plans.quality import profile_table
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(1, "x")], "id long, k string").select(
        "id", F.create_map(F.col("k"), F.col("id")).alias("m"))
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["m"]["n_null"] == 0
    assert prof["m"]["approx_distinct"] is None
    assert prof["m"]["min_value"] is None
    assert prof["id"]["approx_distinct"] == 1


def test_maintenance_refuses_bucketed_layout(spark, tmp_path):
    """delete_column/compact_dataset must refuse an in-place plain rewrite
    of BUCKETED data files: the rewrite would silently drop the clustering
    a catalog manifest still claims, and a reader trusting a false
    bucketing claim returns wrong join results."""
    import pytest
    from pyspark.sql import functions as F

    from eirepolitic_data_pipeline_spark.io.bucketing import write_bucketed
    from eirepolitic_data_pipeline_spark.io.maintenance import (
        compact_dataset, delete_column)

    path = str(tmp_path / "bkt")
    df = spark.range(100).select(F.col("id").cast("string").alias("pk"),
                                 F.lit("x").alias("v"))
    write_bucketed(df, "maint_bkt_probe", ["pk"], 4, path)
    spark.sql("DROP TABLE IF EXISTS maint_bkt_probe")  # files remain

    with pytest.raises(ValueError, match="BUCKETED"):
        delete_column(spark, path, "v")
    with pytest.raises(ValueError, match="BUCKETED"):
        compact_dataset(spark, path)
    # the data is untouched by the refusals
    assert spark.read.parquet(path).count() == 100
