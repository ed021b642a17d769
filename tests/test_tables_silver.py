"""Silver flattener tests: ragged nested JSON → normalized rows (F1/F2/F4)."""

from __future__ import annotations

import json
from datetime import date

import pytest

from eirepolitic_data_pipeline_spark.tables import (
    silver_division_tallies,
    silver_member_memberships,
    silver_member_votes,
    silver_members,
)
from eirepolitic_data_pipeline_spark.tables.silver import (
    record_hash_py,
    stable_hash_py,
)

TODAY = date(2026, 8, 13)
SNAP = "2026-08-13"


def _payload_df(spark, payload):
    return spark.createDataFrame([(json.dumps(payload),)], "payload string")


@pytest.fixture(scope="module")
def members_payload():
    return {"results": [
        # Wrapped member with list memberships (current + past).
        {"member": {
            "memberCode": "TD001", "fullName": "Aoife Byrne",
            "firstName": "Aoife", "lastName": "Byrne", "gender": "F",
            "uri": "/ie/oireachtas/member/id/TD001",
            "memberships": [
                {"membership": {
                    "uri": "/membership/1",
                    "house": {"houseNo": "34", "houseCode": "dail",
                              "uri": "/house/34"},
                    "dateRange": {"start": "2024-01-01", "end": None},
                    "party": {"showAs": "New Party"},
                    "constituency": {"showAs": "Wicklow-Wexford"}}},
                {"membership": {
                    "uri": "/membership/0",
                    "house": {"houseNo": "33", "houseCode": "dail"},
                    "dateRange": {"start": "2020-01-01",
                                  "end": "2023-12-31"},
                    "party": {"showAs": "Old Party"},
                    "constituency": {"showAs": "Wicklow"}}},
            ]}},
        # Bare record, no code (generated), no memberships.
        {"person": {"showAs": "Brian Walsh", "uri": "/member/id/TD002x"}},
        # memberList nesting.
        {"memberList": [{"member": {"memberCode": "TD003",
                                    "fullName": "Cara Nolan"}}]},
    ]}


def test_silver_members(spark, members_payload):
    out = silver_members(_payload_df(spark, members_payload),
                         snapshot_date=SNAP, today=TODAY)
    rows = {r["full_name"]: r for r in out.collect()}
    assert len(rows) == 3
    a = rows["Aoife Byrne"]
    assert a["member_code"] == "TD001"
    assert a["is_current_member"] == "true"
    assert a["latest_party_name"] == "New Party"
    assert a["latest_constituency_name"] == "Wicklow-Wexford"
    assert a["latest_house_no"] == "34"
    assert a["member_key"] == stable_hash_py(
        ["TD001", "/ie/oireachtas/member/id/TD001", "Aoife Byrne"])
    b = rows["Brian Walsh"]
    # No memberCode -> the SHARED recipe (_member_code_of): the
    # URI-embedded code, exactly what the child tables
    # (memberships/parties/...) generate for the same record — the two
    # recipes MUST agree or every child row is an FK orphan.
    assert b["member_code"] == "TD002x"
    assert b["is_current_member"] == ""
    assert rows["Cara Nolan"]["member_code"] == "TD003"


def test_member_code_recipe_is_shared_with_children(spark, members_payload):
    """A code-less member gets the SAME member_code in silver_members and
    in silver_member_memberships — the FK the registry declares."""
    parents = silver_members(_payload_df(spark, members_payload),
                             snapshot_date=SNAP, today=TODAY)
    children = silver_member_memberships(_payload_df(spark, members_payload),
                                         snapshot_date=SNAP, today=TODAY)
    parent_codes = {r["member_code"] for r in parents.collect()}
    child_codes = {r["member_code"] for r in children.collect()}
    assert child_codes <= parent_codes, \
        f"orphaned child member_codes: {child_codes - parent_codes}"


def test_silver_member_memberships(spark, members_payload):
    out = silver_member_memberships(_payload_df(spark, members_payload),
                                    snapshot_date=SNAP, today=TODAY)
    rows = {r["membership_id"]: r for r in out.collect()}
    assert len(rows) == 2
    m1 = rows["/membership/1"]
    assert (m1["member_code"], m1["house_no"], m1["chamber"]) \
        == ("TD001", "34", "dail")
    assert (m1["membership_start"], m1["membership_end"]) == ("2024-01-01", "")
    assert m1["is_current"] == "true"
    m0 = rows["/membership/0"]
    assert m0["is_current"] == "false"
    assert m0["membership_end"] == "2023-12-31"


def test_membership_id_stable_when_end_changes(spark):
    def payload(end):
        return {"results": [{"member": {
            "memberCode": "TD009", "fullName": "X",
            "memberships": [{"membership": {
                "house": {"houseNo": "34", "houseCode": "dail",
                          "uri": "/house/34"},
                "dateRange": {"start": "2024-01-01", "end": end}}}]}}]}

    id_open = silver_member_memberships(
        _payload_df(spark, payload(None)), today=TODAY).collect()[0]
    id_closed = silver_member_memberships(
        _payload_df(spark, payload("2026-01-01")), today=TODAY).collect()[0]
    # Generated bridge IDs ignore the end date (reference write-semantics
    # test: end-date updates hit the same row).
    assert id_open["membership_id"] == id_closed["membership_id"]
    assert id_open["membership_id"].startswith("generated:membership:")


@pytest.fixture(scope="module")
def divisions_payload():
    def member(code, name, party, cons):
        return {"member": {"memberCode": code, "showAs": name,
                           "party": {"showAs": party},
                           "constituency": {"showAs": cons}}}
    return {"results": [
        {"division": {
            "uri": "/division/D1", "voteId": "vote-1", "date": "2025-03-05",
            "tallies": {
                "taVotes": {"tally": 2, "showAs": "Tá", "members": [
                    member("TD001", "Aoife Byrne", "New Party",
                           "Wicklow-Wexford"),
                    member("TD002", "Brian Walsh", "Other Party", "Cork"),
                ]},
                "nilVotes": {"tally": 1, "members": [
                    member("TD003", "Cara Nolan", "Third Party", "Kerry"),
                ]},
                "staonVotes": {"tally": 0, "members": []},
            }}},
    ]}


def test_silver_member_votes(spark, divisions_payload):
    out = silver_member_votes(_payload_df(spark, divisions_payload),
                              snapshot_date=SNAP)
    rows = sorted(out.collect(), key=lambda r: r["member_code"])
    assert len(rows) == 3
    r = rows[0]
    assert r["member_vote_id"] == "member_vote:" + stable_hash_py(
        ["/division/D1", "TD001", "ta"], length=24)
    assert (r["division_id"], r["vote_id"], r["division_date"]) \
        == ("/division/D1", "vote-1", "2025-03-05")
    assert (r["vote_code"], r["vote_label"]) == ("ta", "yes")
    assert r["party_name_at_vote"] == "New Party"
    assert r["constituency_name_at_vote"] == "Wicklow-Wexford"
    assert rows[2]["vote_code"] == "nil"


def test_silver_division_tallies(spark, divisions_payload):
    out = silver_division_tallies(_payload_df(spark, divisions_payload),
                                  snapshot_date=SNAP)
    rows = {r["vote_code"]: r for r in out.collect()}
    assert sorted(rows) == ["nil", "staon", "ta"]
    assert rows["ta"]["member_count"] == "2"
    assert rows["ta"]["show_as"] == "Tá"
    assert rows["staon"]["member_count"] == "0"
    assert rows["nil"]["show_as"] == "no"  # no showAs -> vote_label fallback
    assert rows["ta"]["division_tally_id"] == "division_tally:" + \
        stable_hash_py(["/division/D1", "ta"], length=24)


def test_uriless_division_id_agrees_across_tables(spark):
    """A division with no uri/voteId/... keys gets ONE generated id across
    the header, vote and tally tables (the shared _division_id_of hashes
    the same division record) — a per-table recipe would orphan every
    child row of such a division."""
    payload = {"results": [
        {"division": {
            "date": "2025-03-05", "voteNumber": "7", "subject": "Motion X",
            "tallies": {
                "taVotes": {"tally": 1, "showAs": "Tá", "members": [
                    {"member": {"memberCode": "TD001",
                                "showAs": "Aoife Byrne"}}]},
            }}},
    ]}
    from eirepolitic_data_pipeline_spark.tables.silver import silver_divisions
    pdf = _payload_df(spark, payload)
    header_ids = {r["division_id"] for r in
                  silver_divisions(pdf, snapshot_date=SNAP).collect()}
    vote_ids = {r["division_id"] for r in
                silver_member_votes(pdf, snapshot_date=SNAP).collect()}
    tally_ids = {r["division_id"] for r in
                 silver_division_tallies(pdf, snapshot_date=SNAP).collect()}
    assert len(header_ids) == 1
    assert next(iter(header_ids)).startswith("generated:division:")
    assert vote_ids == header_ids
    assert tally_ids == header_ids


def test_tally_dq_checks_green(spark, divisions_payload):
    """A10/A11 wired against the tallies builder output: the fixture
    division has all three categories and declared counts that match the
    exploded member-vote rows (staon declared 0 with zero rows)."""
    from eirepolitic_data_pipeline_spark.plans.quality import (
        tally_completeness, tally_reconciliation)
    payload = _payload_df(spark, divisions_payload)
    tallies = silver_division_tallies(payload, snapshot_date=SNAP)
    votes = silver_member_votes(payload, snapshot_date=SNAP)

    complete, missing = tally_completeness(tallies)
    assert complete.passed and missing.count() == 0
    reconciled, mismatches = tally_reconciliation(tallies, votes)
    assert reconciled.passed and mismatches.count() == 0


def test_tally_completeness_red(spark):
    """A10 red case: a division lacking the staon category is reported with
    exactly the absent codes."""
    from eirepolitic_data_pipeline_spark.plans.quality import tally_completeness
    tallies = spark.createDataFrame(
        [("D1", "ta"), ("D1", "nil"), ("D1", "staon"),
         ("D2", "ta"), ("D2", "nil")],
        "division_id string, vote_code string")
    check, missing = tally_completeness(tallies)
    assert not check.passed and check.observed == 1
    rows = missing.collect()
    assert len(rows) == 1
    assert rows[0]["division_id"] == "D2"
    assert rows[0]["missing_codes"] == ["staon"]


def test_tally_reconciliation_red(spark):
    """A11 red cases: declared≠observed, declared-with-no-rows, and a
    non-numeric declared count skipped (reference comparable mask)."""
    from eirepolitic_data_pipeline_spark.plans.quality import tally_reconciliation
    tallies = spark.createDataFrame(
        [("D1", "ta", "2"),     # matches 2 rows -> ok
         ("D1", "nil", "3"),    # only 1 row -> mismatch
         ("D1", "staon", "1"),  # no rows -> mismatch vs 0
         ("D2", "ta", "n/a")],  # non-numeric declared -> skipped
        "division_id string, vote_code string, member_count string")
    votes = spark.createDataFrame(
        [("D1", "ta"), ("D1", "ta"), ("D1", "nil")],
        "division_id string, vote_code string")
    check, mism = tally_reconciliation(tallies, votes)
    assert not check.passed and check.observed == 2
    got = {(r["division_id"], r["vote_code"]):
           (r["declared_count"], r["observed_count"]) for r in mism.collect()}
    assert got == {("D1", "nil"): (3, 1), ("D1", "staon"): (1, 0)}


def test_hash_parity_with_column_expressions(spark):
    """Python-side stable_hash matches the JVM column expression."""
    from pyspark.sql import functions as F
    from eirepolitic_data_pipeline_spark.functions.scalar import stable_hash
    df = spark.createDataFrame([("abc", "DEF")], "a string, b string")
    jvm = df.select(stable_hash("a", "b", length=24).alias("h")).collect()[0]["h"]
    assert jvm == stable_hash_py(["abc", "DEF"], length=24)


def test_silver_questions(spark):
    from eirepolitic_data_pipeline_spark.tables import silver_questions
    payload = {"results": [
        {"question": {
            "uri": "/question/Q1", "date": "2025-02-01",
            "questionNumber": "12", "questionType": "oral",
            "showAs": "To ask the Minister about housing supply.",
            "by": {"memberCode": "TD001", "showAs": "Aoife Byrne"},
            "to": {"showAs": "Minister for Housing"},
            "debateSection": {
                "uri": "/debate/section/5",
                "formats": {"xml": {"uri": "/akn/ie/debate.xml"},
                            "pdf": {"uri": "https://x.example/q.pdf"}}},
        }},
        # Bare item, no uri/id -> generated id from record hash.
        {"question": {"showAs": "Untracked question"}},
    ]}
    out = silver_questions(_payload_df(spark, payload), snapshot_date=SNAP)
    rows = sorted(out.collect(), key=lambda r: r["question_id"])
    q1 = [r for r in rows if r["question_id"] == "/question/Q1"][0]
    assert q1["asked_by_member_code"] == "TD001"
    assert q1["to_minister_or_department"] == "Minister for Housing"
    assert q1["source_xml_url"] == "https://data.oireachtas.ie/akn/ie/debate.xml"
    assert q1["source_pdf_url"] == "https://x.example/q.pdf"  # absolute kept
    assert q1["source_file_id_xml"].startswith("source_file:")
    assert q1["question_date"] == "2025-02-01"
    gen = [r for r in rows if r["question_id"].startswith("generated:question:")]
    assert len(gen) == 1 and gen[0]["source_file_id_xml"] == ""


def test_silver_source_files(spark):
    from eirepolitic_data_pipeline_spark.tables import silver_source_files
    payload = {"results": [
        {"debateRecord": {
            "uri": "/debate/2025-02-01",
            "debateSections": [
                {"debateSection": {
                    "formats": {"xml": {"uri": "/akn/debate.xml"},
                                "pdf": {"url": "https://x.example/d.pdf"},
                                "writtens_pdf": None}}},
                # Shape 2: flat format record under a "format" key.
                {"attachment": {"format": {"formatType": "mp3",
                                           "url": "https://x.example/a.mp3"}}},
            ]}},
    ]}
    out = silver_source_files(_payload_df(spark, payload),
                              entity_type="debate", snapshot_date=SNAP)
    rows = {r["format_type"]: r for r in out.collect()}
    assert sorted(rows) == ["mp3", "pdf", "xml"]
    assert rows["xml"]["source_entity_id"] == "/debate/2025-02-01"
    assert rows["pdf"]["format_url"] == "https://x.example/d.pdf"
    assert rows["pdf"]["content_type"] == "application/pdf"
    assert rows["mp3"]["content_type"] == "audio/mpeg"
    for r in rows.values():
        assert r["source_file_id"].startswith("source_file:")
        assert r["download_status"] == "not_downloaded"
        assert r["s3_key"].startswith("source_files/debate/debate-2025-02-01/")


def test_silver_dimension_flatteners(spark):
    from eirepolitic_data_pipeline_spark.tables import (
        silver_constituencies,
        silver_houses,
        silver_parties,
    )
    houses = {"results": [
        {"house": {"uri": "/house/34", "houseNo": "34", "houseCode": "dail",
                   "showAs": "34th Dáil",
                   "dateRange": {"start": "2024-01-01", "end": None}}},
    ]}
    parties = {"results": [
        {"party": {"partyCode": "NP", "partyName": "New Party",
                   "showAs": "New Party",
                   "dateRange": {"start": "2010-01-01"}}},
    ]}
    cons = {"results": [
        {"house": {"uri": "/house/34", "houseNo": "34", "houseCode": "dail"},
         "constituencies": [
             {"constituency": {"uri": "/cons/ww", "code": "WW",
                               "name": "Wicklow-Wexford",
                               "dateRange": {"start": "2024-01-01"}}}]},
    ]}
    h = silver_houses(_payload_df(spark, houses), snapshot_date=SNAP,
                      today=TODAY).collect()[0]
    assert (h["house_uri"], h["chamber"], h["is_current"]) \
        == ("/house/34", "dail", "true")
    p = silver_parties(_payload_df(spark, parties), snapshot_date=SNAP,
                       today=TODAY).collect()[0]
    assert (p["party_uri"].startswith("generated:party:"),
            p["party_name"], p["is_current"]) == (True, "New Party", "true")
    c = silver_constituencies(_payload_df(spark, cons), snapshot_date=SNAP,
                              today=TODAY).collect()[0]
    assert (c["constituency_name"], c["house_uri"], c["house_no"]) \
        == ("Wicklow-Wexford", "/house/34", "34")


def test_key_paths_py_nested():
    """F9: dotted mapping paths, [] list markers, first-element sampling,
    depth cap."""
    from eirepolitic_data_pipeline_spark.tables.silver import key_paths_py
    payload = {
        "head": {"counts": {"memberCount": 2}},
        "results": [
            {"member": {"memberCode": "TD001",
                        "memberships": [{"membership": {"house": {}}}]}},
            {"member": {"IGNORED_not_first": 1}},
        ],
    }
    paths = key_paths_py(payload)
    assert "head.counts.memberCount" in paths
    assert "results[]" in paths
    assert "results[].member.memberCode" in paths
    assert "results[].member.memberships[].membership" in paths
    assert not any("IGNORED" in p for p in paths)  # first element only
    assert key_paths_py(payload, max_depth=1) == {"head", "results"}


def test_payload_key_paths_dataframe(spark):
    """F9 distributed diagnostic: per-path row counts; bad JSON skipped."""
    from eirepolitic_data_pipeline_spark.tables.silver import payload_key_paths
    df = spark.createDataFrame(
        [('{"a": {"b": 1}}',), ('{"a": 2, "c": [1]}',), ("not-json",)],
        "payload string")
    got = {r["key_path"]: r["n_rows"]
           for r in payload_key_paths(df).collect()}
    assert got == {"a": 2, "a.b": 1, "c": 1, "c[]": 1}


def test_membership_subdimensions(spark, members_payload):
    from eirepolitic_data_pipeline_spark.tables import (
        silver_member_constituencies, silver_member_offices,
        silver_member_parties)
    pdf = _payload_df(spark, members_payload)
    parties = {(r["membership_id"], r["party_name"]): r
               for r in silver_member_parties(
                   pdf, snapshot_date=SNAP, today=TODAY).collect()}
    assert set(parties) == {("/membership/1", "New Party"),
                            ("/membership/0", "Old Party")}
    p1 = parties[("/membership/1", "New Party")]
    assert p1["member_code"] == "TD001"
    assert p1["party_uri"].startswith("generated:party:")
    assert p1["member_party_id"].startswith("generated:member_party:")
    # party entries carry no own dateRange and parties do NOT inherit the
    # membership bounds (reference: _date_start over the party record only)
    assert (p1["party_start"], p1["party_end"]) == ("", "")
    assert p1["is_current"] == "true"

    cons = {(r["membership_id"], r["constituency_name"]): r
            for r in silver_member_constituencies(
                pdf, snapshot_date=SNAP, today=TODAY).collect()}
    assert set(cons) == {("/membership/1", "Wicklow-Wexford"),
                         ("/membership/0", "Wicklow")}
    c1 = cons[("/membership/1", "Wicklow-Wexford")]
    # constituencies DO inherit missing bounds from the membership interval
    assert (c1["represent_start"], c1["represent_end"]) == ("2024-01-01", "")
    assert c1["is_current"] == "true"
    c0 = cons[("/membership/0", "Wicklow")]
    assert (c0["represent_start"], c0["represent_end"]) \
        == ("2020-01-01", "2023-12-31")
    assert c0["is_current"] == "false"

    # offices: nested name fallback + own bounds
    office_payload = {"results": [{"member": {
        "memberCode": "TD010", "fullName": "Donal Kehoe",
        "memberships": [{"membership": {
            "uri": "/membership/10",
            "offices": [
                {"office": {
                    "officeName": {"nameEn": "Minister for Transport"},
                    "dateRange": {"start": "2024-02-01", "end": None}}},
                {"office": {"showAs": "Whip",
                            "dateRange": {"start": "2020-01-01",
                                          "end": "2021-06-30"}}},
            ]}}]}}]}
    offices = {r["office_name"]: r for r in silver_member_offices(
        _payload_df(spark, office_payload), snapshot_date=SNAP,
        today=TODAY).collect()}
    assert set(offices) == {"Minister for Transport", "Whip"}
    assert offices["Minister for Transport"]["office_start"] == "2024-02-01"
    assert offices["Minister for Transport"]["is_current"] == "true"
    assert offices["Whip"]["is_current"] == "false"
    assert offices["Whip"]["member_office_id"].startswith(
        "generated:member_office:")


def test_subdimension_membership_fk_matches_memberships_table(spark):
    """The generated membership_id recipe must agree between
    silver_member_memberships and every sub-dimension (FK integrity)."""
    from eirepolitic_data_pipeline_spark.tables import (
        silver_member_parties)
    payload = {"results": [{"member": {
        "memberCode": "TD011", "fullName": "E F",
        "memberships": [{"membership": {
            "house": {"houseNo": "34", "houseCode": "dail",
                      "uri": "/house/34"},
            "dateRange": {"start": "2024-01-01", "end": None},
            "parties": [{"party": {"showAs": "P1"}}]}}]}}]}
    pdf = _payload_df(spark, payload)
    mm = silver_member_memberships(pdf, today=TODAY).collect()[0]
    mp = silver_member_parties(pdf, today=TODAY).collect()[0]
    assert mp["membership_id"] == mm["membership_id"]
    assert mp["membership_id"].startswith("generated:membership:")


def test_silver_divisions(spark):
    from eirepolitic_data_pipeline_spark.tables import silver_divisions
    payload = {"contextDate": "2025-03-07", "results": [
        {"division": {
            "uri": "/div/D1", "voteId": "vote-1", "date": "2025-03-05",
            "house": {"houseNo": "34", "houseCode": "dail",
                      "uri": "/house/34"},
            "subject": {"showAs": "Second Stage"},
            "outcome": "Carried",
            "debate": {"uri": "/debate/2025-03-05/dail",
                       "debateSection": "dbsect_12"},
            "taVotes": []}},
        # minimal record: id generated, date from page contextDate,
        # locators via deep descent
        {"vote": {"nested": {"houseNo": "33",
                             "debateUri": "/debate/x"},
                  "result": "Lost"}},
    ]}
    out = {r["division_id"]: r for r in silver_divisions(
        _payload_df(spark, payload), snapshot_date=SNAP).collect()}
    d1 = out["/div/D1"]
    assert (d1["vote_id"], d1["division_date"], d1["chamber"]) \
        == ("vote-1", "2025-03-05", "dail")
    assert d1["subject"] == "Second Stage" and d1["outcome"] == "Carried"
    # section URI synthesized from debate uri + section eId
    assert d1["debate_section_id"] == "/debate/2025-03-05/dbsect_12"
    gen = [r for k, r in out.items() if k.startswith("generated:division:")]
    assert len(gen) == 1
    g = gen[0]
    assert g["division_date"] == "2025-03-07"        # page contextDate
    assert g["house_no"] == "33" and g["debate_id"] == "/debate/x"
    assert g["outcome"] == "Lost"


def test_subdimension_end_moved_collapses_to_one_pk_row(spark):
    """Two office entries identical except the end bound share a generated
    PK (the id ignores end, like the membership id); the open/current row
    must win and the PK stay unique."""
    from eirepolitic_data_pipeline_spark.tables import silver_member_offices
    payload = {"results": [{"member": {
        "memberCode": "TD012", "fullName": "G H",
        "memberships": [{"membership": {
            "uri": "/membership/12",
            "offices": [
                {"office": {"uri": "/office/7", "showAs": "Whip",
                            "dateRange": {"start": "2020-01-01",
                                          "end": None}}},
                {"office": {"uri": "/office/7", "showAs": "Whip",
                            "dateRange": {"start": "2020-01-01",
                                          "end": "2021-06-30"}}},
            ]}}]}}]}
    rows = silver_member_offices(_payload_df(spark, payload),
                                 today=TODAY).collect()
    assert len(rows) == 1
    assert rows[0]["office_end"] == ""        # open interval kept
    assert rows[0]["is_current"] == "true"
