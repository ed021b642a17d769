"""Debate record/section flattener tests over one /debates payload."""

from __future__ import annotations

import json

import pytest

from eirepolitic_data_pipeline_spark.tables import (
    silver_debate_records,
    silver_debate_sections,
)

SNAP = "2026-08-13"


@pytest.fixture(scope="module")
def debates_payload(spark):
    payload = {"results": [
        {"contextDate": "2025-03-10", "debateRecord": {
            "uri": "/debate/dail/2025-03-10",
            "date": "2025-03-10",
            "chamber": {"uri": "/house/dail/34", "showAs": "Dáil Éireann"},
            "house": {"uri": "/house/dail/34", "houseNo": "34",
                      "houseCode": "dail", "showAs": "Dáil Éireann"},
            "showAs": "Dáil debates 10 Mar 2025",
            "formats": {"xml": {"uri": "/akn/ie/debateRecord/10.xml"},
                        "pdf": {"url": "https://x.example/10.pdf"}},
            "debateSections": [
                {"debateSection": {
                    "uri": "/debate/dail/2025-03-10/s1",
                    "debateSectionId": "dbsect_1",
                    "heading": "Leaders' Questions"}},
                {"debateSection": {
                    "debateSectionId": "dbsect_2",
                    "showAs": "Housing Motion",
                    "parentDebateSection": {"uri": "/debate/dail/2025-03-10/s1"}}},
            ]}},
        # URI-less debate, no direct date: generated ID + contextDate fallback
        {"contextDate": "2025-03-11", "debateRecord": {
            "chamber": {"showAs": "Seanad Éireann"},
            "formats": {"xml": {"url": "https://x.example/11.xml"}},
            "debateSections": []}},
    ]}
    return spark.createDataFrame([(json.dumps(payload),)], "payload string")


def test_silver_debate_records(spark, debates_payload):
    rows = {r["debate_uri"]: r for r in
            silver_debate_records(debates_payload, snapshot_date=SNAP).collect()}
    assert len(rows) == 2
    r = rows["/debate/dail/2025-03-10"]
    assert r["debate_id"] == "/debate/dail/2025-03-10"
    assert r["debate_date"] == "2025-03-10"
    assert r["chamber"] == "dail"          # houseCode wins over showAs
    assert r["house_no"] == "34"
    assert r["show_as"] == "Dáil debates 10 Mar 2025"
    assert r["source_xml_uri"] == "/akn/ie/debateRecord/10.xml"
    assert r["source_pdf_uri"] == "https://x.example/10.pdf"
    assert r["source_pdf_url"] == "https://x.example/10.pdf"
    assert r["source_file_id_xml"].startswith("source_file:")
    assert r["source_file_id_pdf"].startswith("source_file:")

    g = rows[""]
    assert g["debate_id"].startswith("generated:debate:")
    assert g["debate_date"] == "2025-03-11"   # contextDate fallback
    assert g["chamber"] == "Seanad Éireann"   # showAs fallback, no houseCode
    assert g["show_as"] == "Seanad Éireann — 2025-03-11"
    assert g["source_file_id_pdf"] == ""      # no pdf locator → no ID


def test_silver_debate_sections(spark, debates_payload):
    rows = silver_debate_sections(debates_payload, snapshot_date=SNAP) \
        .orderBy("section_order").collect()
    assert len(rows) == 2
    s1, s2 = rows
    assert s1["debate_section_id"] == "/debate/dail/2025-03-10/s1"
    assert s1["debate_id"] == "/debate/dail/2025-03-10"
    assert s1["section_order"] == "1"
    assert s1["heading"] == "Leaders' Questions"
    assert s1["parent_section_id"] == ""
    assert s2["debate_section_id"].startswith("generated:debate_section:")
    assert s2["section_eid"] == "dbsect_2"
    assert s2["show_as"] == "Housing Motion"
    assert s2["parent_section_id"] == "/debate/dail/2025-03-10/s1"


def test_weekly_sentence_candidates(spark):
    """P10 wiring: date coerce-drop, week-id tagging, bounds filter (1..50
    words, must contain a letter), normalized dedupe, reference
    candidate_id recipe."""
    import hashlib

    from eirepolitic_data_pipeline_spark.tables import (
        weekly_sentence_candidates)

    long_run = " ".join(["word"] * 60)          # 60 words, no semicolon
    rows = [
        ("Aoife  Byrne", "2025-03-05",
         'This is ridiculous! Truly. "This is ridiculous!"'),
        ("Aoife Byrne", "2025-03-05", "42 99."),   # no letter -> dropped
        ("Brian Walsh", "not-a-date", "Dropped row."),
        ("Cara Nolan", "2025-03-06", long_run),
    ]
    df = spark.createDataFrame(
        rows, "speaker_name string, debate_date string, speech_text string")
    out = weekly_sentence_candidates(df).collect()
    by_sentence = {r["sentence"]: r for r in out}
    # "This is ridiculous!" appears twice (once quoted) -> one row after
    # normalized dedupe; the no-letter sentence drops; the 60-word run
    # exceeds the bound with no semicolon escape -> dropped; the
    # not-a-date row coerces away.
    assert sorted(by_sentence) == ["This is ridiculous!", "Truly."]
    r = by_sentence["This is ridiculous!"]
    assert r["speaker_name"] == "Aoife Byrne"      # whitespace normalized
    assert r["week_id"] == "202509" and r["debate_date"] == "2025-03-05"
    assert r["word_count"] == 3
    expected = hashlib.sha256(
        "||".join(["202509", "Aoife Byrne", "This is ridiculous!"])
        .encode()).hexdigest()[:24]
    assert r["candidate_id"] == expected


def test_silver_speeches_from_xml_corpus(spark):
    from tests.test_sources import DEBATE_XML
    from eirepolitic_data_pipeline_spark.tables import silver_speeches
    df = spark.createDataFrame(
        [("/debate/2025-03-05/dail", "2025-03-05",
          "/debate/xml", "https://host/debate.xml", DEBATE_XML)],
        "debate_id string, debate_date string, xml_uri string, "
        "xml_url string, xml string")
    out = {r["speech_order"]: r for r in
           silver_speeches(df, snapshot_date="2026-08-13").collect()}
    assert len(out) == 4
    s2 = out[2]
    assert s2["debate_id"] == "/debate/2025-03-05/dail"
    assert s2["speaker_member_code"] == "alice-1"
    assert s2["speaker_match_method"] == "xml_tlc_person_href"
    assert s2["speaker_match_confidence"] == 1.0
    assert s2["speech_text"] == "First housing point. Second point."
    assert s2["word_count"] == 5 and s2["char_count"] == len(s2["speech_text"])
    assert len(s2["speech_text_hash"]) == 24
    assert s2["debate_date"] == "2025-03-05"
    # section id = debate-uri base + section eId; fixture sections carry
    # no eId so the locator stays blank rather than inventing one
    assert s2["debate_section_id"] == ""
    assert s2["source_file_id"].startswith("source_file:")
    assert s2["xml_source_key"].startswith("raw/source_files/debate/")
    assert s2["xml_source_key"].endswith(".xml")
    # unmatched speaker: no method, null confidence, humanized ref name
    s4 = out[4]
    assert s4["speaker_member_code"] == ""
    assert s4["speaker_match_method"] == ""
    assert s4["speaker_match_confidence"] is None
    assert s4["speaker_name"] == "unknown"


def test_silver_speeches_section_eid_locator(spark):
    from eirepolitic_data_pipeline_spark.tables import silver_speeches
    xml = """<?xml version="1.0"?>
<akomaNtoso><debate>
  <debateSection name="housing" eId="dbsect_7">
    <speech by="#X"><p>Point made.</p></speech>
  </debateSection>
</debate></akomaNtoso>"""
    df = spark.createDataFrame(
        [("/debate/2025-03-05/dail", xml)], "debate_id string, xml string")
    row = silver_speeches(df, snapshot_date="2026-08-13").collect()[0]
    assert row["debate_section_id"] == "/debate/2025-03-05/dbsect_7"
