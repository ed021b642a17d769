"""End-to-end refresh lifecycle (reference §3.2): two OVERLAPPING incremental
refresh windows driven through ``normalize_refresh_inputs`` → ``MergeWriter``
→ ``BatchCatalog``, then promote, then rollback — the full
fetch-merge-publish-promote-rollback cycle the reference runs per cron window
(`process/oireachtas_refresh_inputs.py` + `extract/oireachtas/batch.py`),
asserting history preservation across the overlap and pointer semantics
after rollback.
"""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from eirepolitic_data_pipeline_spark.io.catalog import BatchCatalog, CatalogError
from eirepolitic_data_pipeline_spark.io.writers import MergeWriter
from eirepolitic_data_pipeline_spark.jobs.refresh import (
    default_window,
    normalize_refresh_inputs,
)
from eirepolitic_data_pipeline_spark.operators.merge import WritePolicy

TABLE = "silver_member_votes"
POLICY = WritePolicy(mode="upsert", primary_key=["member_vote_id"])


def _votes(spark, rows):
    return spark.createDataFrame(
        rows, "member_vote_id string, member_code string, division_date string, "
              "vote_code string")


def _window_rows(spark, start: str, end: str, votes):
    """The 'fetch' step: rows of the source whose date falls in [start, end]
    — the per-window incremental slice the reference's API fan-out returns."""
    return votes.filter(
        (F.col("division_date") >= start) & (F.col("division_date") <= end))


def test_overlapping_refresh_windows_promote_and_rollback(spark, tmp_path):
    catalog = BatchCatalog(root=str(tmp_path / "warehouse"))
    writer = MergeWriter(catalog=catalog, spark=spark)

    # Full source-of-truth timeline; each refresh sees only its window.
    all_votes = _votes(spark, [
        ("v1", "m1", "2026-06-20", "ta"),
        ("v2", "m2", "2026-07-05", "nil"),
        ("v3", "m1", "2026-07-20", "ta"),      # inside BOTH windows (overlap)
        ("v3", "m1", "2026-07-20", "staon"),   # corrected re-delivery in run 2
        ("v4", "m3", "2026-08-10", "ta"),
    ])

    # Refresh 1: weekly as of 2026-07-25 → window [06-20, 07-25].
    r1 = normalize_refresh_inputs(
        "weekly", date(2026, 7, 25), known_tables=[TABLE], tables=[TABLE])
    assert (r1.date_start, r1.date_end) == ("2026-06-20", "2026-07-25")
    w1 = _window_rows(spark, r1.date_start, r1.date_end,
                      all_votes.filter(F.col("vote_code") != "staon"))
    writer.write(w1, TABLE, POLICY, batch_id="b1")
    catalog.promote("b1", [TABLE])
    assert catalog.production_batch_id() == "b1"
    prod1 = {r["member_vote_id"]: r["vote_code"]
             for r in catalog.read_table(spark, TABLE).collect()}
    assert prod1 == {"v1": "ta", "v2": "nil", "v3": "ta"}

    # Refresh 2: weekly as of 2026-08-14 → [07-10, 08-14], OVERLAPPING run 1.
    # The overlap re-delivers v3 (now corrected to 'staon'); v1/v2 are
    # outside the window and must survive from retained history.
    r2 = normalize_refresh_inputs(
        "weekly", date(2026, 8, 14), known_tables=[TABLE], tables=[TABLE])
    assert r2.date_start == "2026-07-10"
    w2 = _window_rows(spark, r2.date_start, r2.date_end,
                      all_votes.filter(F.col("vote_code") != "ta")
                      .unionByName(all_votes.filter(F.col("member_vote_id") == "v4")))
    writer.write(w2, TABLE, POLICY, batch_id="b2")
    catalog.promote("b2", [TABLE])
    prod2 = {r["member_vote_id"]: r["vote_code"]
             for r in catalog.read_table(spark, TABLE).collect()}
    # history preserved (v1, v2), overlap reconciled incoming-wins (v3 →
    # staon), new window rows added (v4)
    assert prod2 == {"v1": "ta", "v2": "nil", "v3": "staon", "v4": "ta"}

    # Rollback: pointer returns to b1; contents are EXACTLY the promoted b1
    # state (no leakage from b2's corrections).
    catalog.rollback("b1")
    assert catalog.production_batch_id() == "b1"
    rolled = {r["member_vote_id"]: r["vote_code"]
              for r in catalog.read_table(spark, TABLE).collect()}
    assert rolled == prod1

    # Both ever-promoted batches are immutable rollback targets — even for
    # brand-new table names.
    for bid in ("b1", "b2"):
        with pytest.raises(CatalogError):
            catalog.write_table(w1, "some_new_table", bid)
        with pytest.raises(CatalogError):
            catalog.record_table(bid, "some_new_table", 1)

    # Roll forward again: b2 is untouched by the rollback round-trip.
    catalog.rollback("b2")
    assert {r["member_vote_id"]: r["vote_code"]
            for r in catalog.read_table(spark, TABLE).collect()} == prod2


def test_window_overlap_is_the_watermark_analog():
    """The weekly lookback (35d) must overlap any gap up to 4 missed runs —
    the property that makes at-least-once re-delivery + upsert idempotent."""
    s1, e1 = default_window("weekly", date(2026, 7, 25))
    s2, e2 = default_window("weekly", date(2026, 8, 14))
    assert s2 < e1, "consecutive weekly windows must overlap"
    assert (e1 - s1).days == 35
