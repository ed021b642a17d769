"""Renderer data packs (tables/renderer_packs.py): the inline-spec JSON the
reference's ranking-table / bar-chart generators consume, built from
member_profile_metrics output — the data side of the last reference
consumer (image rendering itself is out of scope)."""

from __future__ import annotations

import json

from eirepolitic_data_pipeline_spark.tables.renderer_packs import (
    bar_chart_spec, member_activity_packs, ranking_table_spec, write_spec)


def _metrics(spark):
    rows = [("M-1", "Alice A", "Dublin", "Party P", 12, 80, "Housing", 7),
            ("M-2", "Bob B", "Cork", "Party Q", 30, 95, "Health", 19),
            ("M-3", "Cara C", "Mayo", "Party P", 4, 10, "", 0),
            ("M-4", "Dan D", "Clare", "Party R", 21, 60, "Housing", 5)]
    return spark.createDataFrame(
        rows, "member_code string, full_name string, constituency string, "
              "party string, speech_count_2024 int, "
              "vote_participation_pct_2024 int, top_issue_2024 string, "
              "top_issue_count_2024 int")


def test_ranking_table_spec_shape_and_order(spark):
    spec = ranking_table_spec(
        _metrics(spark), "speech_count_2024", title="Most speeches",
        slug="speeches", sublabel_col="constituency", row_limit=3)
    assert spec["generator"] == "ranking_table"
    assert spec["input"]["mode"] == "inline"
    rows = spec["input"]["rows"]
    # top-3 by value desc, ranked 1..3 — the collect is bounded by
    # row_limit, never the full table
    assert [r["name"] for r in rows] == ["Bob B", "Dan D", "Alice A"]
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert rows[0] == {"rank": 1, "name": "Bob B", "sublabel": "Cork",
                       "value": 30.0}
    assert spec["params"]["row_limit"] == 3
    # the generator's normalise_rows re-sorts by value under params.sort —
    # our pre-sorted rows are a fixed point of that normalisation
    resorted = sorted(rows, key=lambda r: r["value"], reverse=True)
    assert resorted == rows


def test_bar_chart_spec_shape(spark):
    spec = bar_chart_spec(_metrics(spark), "vote_participation_pct_2024",
                          title="Participation", slug="votes", max_items=2)
    assert spec["generator"] == "horizontal_bar_chart"
    assert spec["input"]["rows"] == [
        {"label": "Bob B", "value": 95.0},
        {"label": "Alice A", "value": 80.0}]


def test_member_activity_packs_and_write(spark, tmp_path):
    packs = member_activity_packs(_metrics(spark), 2024)
    assert set(packs) == {"speech_ranking_2024", "vote_participation_2024",
                          "top_issue_activity_2024"}
    # top-issue ranking carries the issue as the sublabel
    top = packs["top_issue_activity_2024"]["input"]["rows"][0]
    assert top["name"] == "Bob B" and top["sublabel"] == "Health"
    for name, spec in packs.items():
        p = write_spec(spec, str(tmp_path / f"{name}.json"))
        loaded = json.load(open(p))
        assert loaded["generator"] in ("ranking_table",
                                       "horizontal_bar_chart")
        assert loaded["output"]["slug"]
        for r in loaded["input"]["rows"]:
            assert isinstance(r["value"], float)
