"""Gold mart + consumer builder tests on tiny string-typed fixtures.

Fixtures mirror the reference's silver CSV conventions (all strings, blank ==
missing) and its unit-test frames (SURVEY §5).
"""

from __future__ import annotations

import pytest

from eirepolitic_data_pipeline_spark.tables import (
    gold_constituency_activity_yearly,
    gold_content_fact_pool,
    gold_current_members,
    gold_member_activity_monthly,
    gold_member_activity_yearly,
    member_profile_metrics,
)

SNAP = "2026-08-13"


def _df(spark, rows, cols):
    ddl = ", ".join(f"`{c}` string" for c in cols)
    return spark.createDataFrame([tuple(r) for r in rows], ddl)


@pytest.fixture(scope="module")
def members(spark):
    return _df(spark, [
        ("TD001", "Aoife Byrne", "true", "Old Party", "Wicklow", "33"),
        ("TD002", "Brian Walsh", "true", "", "", ""),
        ("TD003", "Cara Nolan", "false", "Gone Party", "Kerry", "32"),
    ], ["member_code", "full_name", "is_current_member", "latest_party_name",
        "latest_constituency_name", "latest_house_no"])


@pytest.fixture(scope="module")
def memberships(spark):
    return _df(spark, [
        ("M1", "TD001", "34", "2024-01-01", "", "true"),
        ("M0", "TD001", "33", "2020-01-01", "2023-12-31", "false"),
        ("M2", "TD002", "34", "2024-02-01", "", "true"),
    ], ["membership_id", "member_code", "house_no", "membership_start",
        "membership_end", "is_current"])


@pytest.fixture(scope="module")
def parties(spark):
    return _df(spark, [
        ("TD001", "New Party", "2024-01-01", "", "true"),
        ("TD001", "Old Party", "2020-01-01", "2023-12-31", "false"),
        # TD002: no current row -> latest-by-end wins.
        ("TD002", "Latest Party", "2022-01-01", "2023-06-30", "false"),
        ("TD002", "Older Party", "2020-01-01", "2021-12-31", "false"),
    ], ["member_code", "party_name", "party_start", "party_end", "is_current"])


@pytest.fixture(scope="module")
def constituencies(spark):
    return _df(spark, [
        ("TD001", "Wicklow-Wexford", "2024-01-01", "", "true"),
        ("TD002", "", "2024-02-01", "", "true"),  # blank -> latest_* fallback
    ], ["member_code", "constituency_name", "represent_start",
        "represent_end", "is_current"])


@pytest.fixture(scope="module")
def offices(spark):
    return _df(spark, [
        ("TD001", "Minister for Housing", "2024-01-01", "", "true"),
        ("TD002", "", "2024-01-01", "", "true"),  # blank office dropped
    ], ["member_code", "office_name", "office_start", "office_end",
        "is_current"])


def test_gold_current_members(spark, members, memberships, parties,
                              constituencies, offices):
    out = gold_current_members(members, memberships, parties, constituencies,
                               offices, SNAP).collect()
    by_code = {r["member_code"]: r for r in out}
    # TD003 is not current -> filtered out.
    assert sorted(by_code) == ["TD001", "TD002"]
    td1 = by_code["TD001"]
    assert td1["party_name"] == "New Party"          # current beats latest_*
    assert td1["constituency_name"] == "Wicklow-Wexford"
    assert td1["house_no"] == "34"
    assert td1["office_name"] == "Minister for Housing"
    td2 = by_code["TD002"]
    assert td2["party_name"] == "Latest Party"       # latest-by-end fallback
    assert td2["constituency_name"] == ""            # blank stays blank
    assert td2["office_name"] == ""
    assert td1["snapshot_date"] == SNAP


def test_gold_current_members_semi_join_fallback(spark, memberships, parties,
                                                 constituencies, offices):
    """P9 fallback branch (`table_gold_current_members.py:124-128`): when NO
    member row is flagged current, the roster falls back to a semi-join
    against members holding any membership row — TD003 (no membership)
    drops, TD001/TD002 stay."""
    members = _df(spark, [
        ("TD001", "Aoife Byrne", "", "Old Party", "Wicklow", "33"),
        ("TD002", "Brian Walsh", "false", "", "", ""),
        ("TD003", "Cara Nolan", "", "Gone Party", "Kerry", "32"),
    ], ["member_code", "full_name", "is_current_member", "latest_party_name",
        "latest_constituency_name", "latest_house_no"])
    out = gold_current_members(members, memberships, parties, constituencies,
                               offices, SNAP).collect()
    assert sorted(r["member_code"] for r in out) == ["TD001", "TD002"]


@pytest.fixture(scope="module")
def speeches(spark):
    return _df(spark, [
        ("S1", "TD001", "2025-03-01"),
        ("S2", "TD001", "2025-03-01"),
        ("S3", "TD001", "2025-04-02"),
        ("S4", "TD002", "2025-03-01"),
        ("S5", "", "2025-03-01"),            # blank speaker dropped
        ("S6", "TD001", "not-a-date"),       # unparseable date dropped
        ("S7", "TD002", "2024-06-01"),
    ], ["speech_id", "speaker_member_code", "debate_date"])


@pytest.fixture(scope="module")
def member_votes(spark):
    return _df(spark, [
        ("V1", "TD001", "D1", "2025-03-05", "ta", "Tá", "Wicklow-Wexford"),
        ("V2", "TD001", "D2", "2025-05-05", "nil", "Níl", "Wicklow-Wexford"),
        ("V3", "TD002", "D1", "2025-03-05", "staon", "Staon", ""),
        ("V4", "TD002", "D2", "2025-05-05", "ta", "Tá", ""),
        ("V5", "TD001", "D3", "2024-01-05", "ta", "Tá", "Wicklow-Wexford"),
    ], ["member_vote_id", "member_code", "division_id", "division_date",
        "vote_code", "vote_label", "constituency_name_at_vote"])


@pytest.fixture(scope="module")
def divisions(spark):
    return _df(spark, [
        ("D1", "2025-03-05"), ("D2", "2025-05-05"), ("D3", "2024-01-05"),
        ("D4", "2025-06-01"),   # division with no votes still counts
    ], ["division_id", "division_date"])


def test_gold_member_activity_yearly(spark, members, speeches, member_votes,
                                     divisions):
    cm = members.selectExpr("member_code", "full_name")
    out = gold_member_activity_yearly(cm, speeches, member_votes, divisions,
                                      SNAP)
    rows = {(r["member_code"], r["year"]): r for r in out.collect()}
    # Grid: 3 members (roster incl. TD003) x 2 years.
    assert len(rows) == 6
    r = rows[("TD001", "2025")]
    assert (r["speech_count"], r["debate_day_count"]) == (3, 2)
    assert (r["votes_cast_count"], r["ta_count"], r["nil_count"],
            r["staon_count"]) == (2, 1, 1, 0)
    assert r["division_count"] == 3  # D1, D2, D4 in 2025
    assert r["vote_participation_pct"] == pytest.approx(66.67)
    assert r["speech_rank"] == 1
    r2 = rows[("TD002", "2025")]
    assert (r2["speech_count"], r2["staon_count"]) == (1, 1)
    assert r2["speech_rank"] == 2
    # Zero-activity grid cell is materialized with zeros.
    r3 = rows[("TD003", "2025")]
    assert (r3["speech_count"], r3["votes_cast_count"],
            r3["vote_participation_pct"]) == (0, 0, 0.0)
    assert r3["speech_rank"] == 3
    # Dense rank shares values on ties: TD002/TD003 both 0 speeches in 2024.
    assert rows[("TD002", "2024")]["speech_count"] == 1
    assert rows[("TD001", "2024")]["speech_rank"] == \
        rows[("TD003", "2024")]["speech_rank"]


def test_gold_member_activity_monthly(spark, members, speeches, member_votes):
    cm = members.selectExpr("member_code", "full_name")
    out = gold_member_activity_monthly(cm, speeches, member_votes, SNAP)
    rows = {(r["member_code"], r["year_month"]): r for r in out.collect()}
    r = rows[("TD001", "2025-03")]
    assert (r["speech_count"], r["debate_day_count"], r["votes_cast_count"]) \
        == (2, 1, 1)
    assert rows[("TD003", "2025-03")]["speech_count"] == 0


def test_gold_constituency_activity_yearly(spark, members, speeches,
                                           member_votes):
    cm = _df(spark, [
        ("TD001", "Wicklow-Wexford"), ("TD002", "Cork North"),
        ("TD003", "Cork North"),
    ], ["member_code", "constituency_name"])
    out = gold_constituency_activity_yearly(cm, speeches, member_votes, SNAP)
    rows = {(r["constituency_name"], r["year"]): r for r in out.collect()}
    ww25 = rows[("Wicklow-Wexford", "2025")]
    assert (ww25["member_count"], ww25["speech_count"],
            ww25["votes_cast_count"]) == (1, 3, 2)
    cn25 = rows[("Cork North", "2025")]
    # TD002 speeches attribute via lookup; votes via lookup fallback (blank
    # constituency_name_at_vote).
    assert (cn25["member_count"], cn25["speech_count"],
            cn25["votes_cast_count"]) == (2, 1, 2)


def test_gold_content_fact_pool(spark, members):
    my = _df(spark, [("TD001", "2025", "3", "66.67"),
                     ("TD002", "2025", "1", "100")],
             ["member_code", "year", "speech_count", "vote_participation_pct"])
    mm = _df(spark, [("TD001", "2025-03", "2", "1")],
             ["member_code", "year_month", "speech_count", "votes_cast_count"])
    cy = _df(spark, [("Wicklow-Wexford", "2025", "3", "2")],
             ["constituency_name", "year", "speech_count", "votes_cast_count"])
    cm = members.selectExpr("member_code", "full_name")
    out = gold_content_fact_pool(my, mm, cy, cm, SNAP)
    rows = out.collect()
    # 2 facts per member-year row (2) + 2 per member-month (1) + 2 per
    # constituency-year (1) = 8.
    assert len(rows) == 8
    by_type = {}
    for r in rows:
        by_type.setdefault(r["fact_type"], []).append(r)
    sp = [r for r in by_type["member_speech_yearly"]
          if r["entity_id"] == "TD001"][0]
    assert sp["headline"] == "Aoife Byrne made 3 speeches in 2025."
    assert (sp["period_start"], sp["period_end"]) == ("2025-01-01", "2025-12-31")
    assert sp["metric_value"] == "3"
    assert sp["fact_id"].startswith("fact:") and len(sp["fact_id"]) == 5 + 24
    vp = [r for r in by_type["member_vote_participation_yearly"]
          if r["entity_id"] == "TD001"][0]
    assert vp["headline"] == \
        "Aoife Byrne voted in 66.67% of recorded divisions in 2025."
    mo = by_type["member_speech_monthly"][0]
    assert (mo["period_start"], mo["period_end"]) == ("2025-03-01", "2025-03-31")
    co = by_type["constituency_speech_yearly"][0]
    assert co["headline"] == \
        "Members associated with Wicklow-Wexford made 3 speeches in 2025."
    # Deterministic IDs: rebuild -> same fact_ids.
    again = {r["fact_id"] for r in
             gold_content_fact_pool(my, mm, cy, cm, SNAP).collect()}
    assert {r["fact_id"] for r in rows} == again


def test_member_profile_metrics(spark):
    members = _df(spark, [
        ("TD001", "Aoife Byrne", "Wicklow", "Party A"),
        ("TD002", "Brian Walsh", "Cork", "Party B"),
    ], ["member_code", "full_name", "constituency", "party"])
    photos = _df(spark, [("TD001", "http://x/a.jpg")],
                 ["member_code", "photo_url"])
    debates = _df(spark, [
        ("Aoife Byrne", "Housing", "2025-01-10"),
        ("Aoife Byrne", "Housing", "2025-02-11"),
        ("Aoife Byrne", "Health", "2025-03-12"),
        ("Aoife Byrne", "NONE", "2025-03-13"),     # NONE filtered
        ("Brian Walsh", "Health", "2025-01-15"),
        ("Brian Walsh", "Health", "2024-01-15"),   # wrong year filtered
    ], ["Speaker Name", "issue", "date"])
    votes = _df(spark, [
        ("TD001", "V1", "2025-01-20"), ("TD001", "V2", "2025-02-20"),
        ("TD002", "V1", "2025-01-20"),
        ("TD001", "V1", "2025-01-20"),  # duplicate pair ignored
        ("TD002", "V9", "2024-01-20"),  # wrong year filtered
    ], ["member_code", "unique_vote_id", "date"])

    out = member_profile_metrics(members, votes, photos, debates, 2025)
    rows = out.collect()
    assert [r["member_code"] for r in rows] == ["TD001", "TD002"]
    a = rows[0]
    assert a["speech_count_2025"] == 3 and a["speech_rank_2025"] == 1
    assert a["top_issue_2025"] == "Housing" and a["top_issue_count_2025"] == 2
    assert a["distinct_votes_participated_2025"] == 2
    assert a["all_distinct_vote_ids_2025"] == 2
    assert a["vote_participation_pct_2025"] == 100
    assert a["photo_url"] == "http://x/a.jpg"
    b = rows[1]
    assert b["speech_count_2025"] == 1 and b["speech_rank_2025"] == 2
    assert b["vote_participation_pct_2025"] == 50


def test_member_profile_metrics_photo_name_fallback(spark):
    """J10: a photos set with no member_code column joins via the
    normalized-name key (accents/case folded) instead of dropping rows."""
    members = _df(spark, [
        ("TD001", "Aoife Byrne", "Wicklow", "Party A"),
        ("TD002", "Seán Ó Dálaigh", "Cork", "Party B"),
    ], ["member_code", "full_name", "constituency", "party"])
    photos = _df(spark, [
        ("sean o dalaigh", "http://x/sean.jpg"),   # normalized-name match
        ("AOIFE  BYRNE", "http://x/aoife.jpg"),    # case/space folded
    ], ["full_name", "photo_url"])
    debates = _df(spark, [("Aoife Byrne", "Housing", "2025-01-10")],
                  ["Speaker Name", "issue", "date"])
    votes = _df(spark, [("TD001", "V1", "2025-01-20")],
                ["member_code", "unique_vote_id", "date"])
    out = {r["member_code"]: r for r in member_profile_metrics(
        members, votes, photos, debates, 2025).collect()}
    assert out["TD001"]["photo_url"] == "http://x/aoife.jpg"
    assert out["TD002"]["photo_url"] == "http://x/sean.jpg"


def test_fuzzy_containment_join(spark):
    """J9: normalized equality OR substring containment either direction;
    exact match outranks containment; no match -> null payload."""
    from eirepolitic_data_pipeline_spark.tables.consumers import (
        fuzzy_containment_join)
    constituencies = _df(spark, [
        ("Dublin Bay North",),    # containment: key inside filename
        ("Cork",),                # exact + containment -> exact wins
        ("Galway West",),         # filename inside key
        ("Sligo-Leitrim",),       # no image
    ], ["constituency"])
    images = _df(spark, [
        ("dublin bay north winter.png", "http://img/dbn"),
        ("cork", "http://img/cork-exact"),
        ("cork city skyline", "http://img/cork-contain"),
        ("galway", "http://img/galway"),
    ], ["filename", "url"])
    out = {r["constituency"]: r["url"] for r in fuzzy_containment_join(
        constituencies, images, "constituency", "filename", ["url"]).collect()}
    assert out["Dublin Bay North"] == "http://img/dbn"
    assert out["Cork"] == "http://img/cork-exact"
    assert out["Galway West"] == "http://img/galway"
    assert out["Sligo-Leitrim"] is None
