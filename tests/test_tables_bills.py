"""Bill-family flattener tests: one payload fans out into seven tables."""

from __future__ import annotations

import json

import pytest

from eirepolitic_data_pipeline_spark.tables import (
    silver_bill_debates,
    silver_bill_events,
    silver_bill_related_docs,
    silver_bill_sponsors,
    silver_bill_stages,
    silver_bill_versions,
    silver_bills,
)

SNAP = "2026-08-13"


@pytest.fixture(scope="module")
def bill_payload(spark):
    payload = {"results": [{"bill": {
        "uri": "/bill/2025/12", "billNo": "12", "billYear": "2025",
        "shortTitleEn": "Housing (Misc) Bill 2025", "billType": "Public",
        "status": "Current",
        "originHouse": {"uri": "/house/34", "showAs": "Dáil Éireann"},
        "lastUpdated": "2025-06-01",
        "versions": [{"version": {
            "uri": "/bill/2025/12/ver/1", "showAs": "As Initiated",
            "date": "2025-02-01",
            "formats": {"pdf": {"uri": "/bills/12.pdf"},
                        "xml": {"url": "https://x.example/12.xml"}}}}],
        "stages": [{"event": {
            "uri": "/bill/2025/12/stage/2", "showAs": "Second Stage",
            "progressStage": "2", "dates": [{"date": "2025-03-10"},
                                            {"date": "2025-03-12"}],
            "house": {"uri": "/house/34", "showAs": "Dáil Éireann"},
            "stageOutcome": "Passed"}}],
        "sponsors": [{"sponsor": {
            "by": {"uri": "/member/id/TD001", "showAs": "Aoife Byrne"},
            "as": {"showAs": "Minister for Housing"},
            "isPrimary": True}}],
        "relatedDocs": [{"relatedDoc": {
            "showAs": "Explanatory Memo", "date": "2025-02-02",
            "docType": "memo", "lang": "en",
            "formats": {"pdf": {"uri": "/bills/12-memo.pdf"}}}}],
        "debates": [{"uri": "/debate/2025-03-10", "date": "2025-03-10",
                     "showAs": "Second Stage Debate",
                     "chamber": {"uri": "/house/34", "showAs": "Dáil"}}],
        "events": [{"event": {
            "uri": "/bill/2025/12/event/1", "eventURI": "/event-type/lapse",
            "showAs": "Introduced", "dates": [{"date": "2025-02-01"}]}}],
    }}]}
    return spark.createDataFrame([(json.dumps(payload),)], "payload string")


def test_silver_bills(spark, bill_payload):
    b = silver_bills(bill_payload, snapshot_date=SNAP).collect()[0]
    assert b["bill_id"] == "/bill/2025/12"
    assert b["title"] == "Housing (Misc) Bill 2025"
    assert b["origin_house_name"] == "Dáil Éireann"
    # date span rolls up every *date-ish field in the record
    assert b["introduced_date"] == "2025-02-01"
    assert b["last_event_date"] == "2025-06-01"


def test_silver_bill_versions(spark, bill_payload):
    v = silver_bill_versions(bill_payload, snapshot_date=SNAP).collect()[0]
    assert v["bill_version_id"] == "/bill/2025/12/ver/1"
    assert v["version_label"] == "As Initiated"
    assert v["format_pdf_uri"] == "/bills/12.pdf"
    assert v["format_pdf_url"] == "https://data.oireachtas.ie/bills/12.pdf"
    assert v["format_xml_url"] == "https://x.example/12.xml"
    assert v["source_file_id_pdf"].startswith("source_file:")
    assert v["s3_pdf_key"].startswith(
        "raw/oireachtas_unified/source_files/legislation/")


def test_silver_bill_stages(spark, bill_payload):
    s = silver_bill_stages(bill_payload, snapshot_date=SNAP).collect()[0]
    assert s["stage_name"] == "Second Stage"
    assert s["stage_date"] == "2025-03-10"   # earliest of the dates list
    assert s["stage_outcome"] == "Passed"
    assert s["house_name"] == "Dáil Éireann"
    assert s["order_in_bill"] == "2"


def test_silver_bill_sponsors(spark, bill_payload):
    s = silver_bill_sponsors(bill_payload, snapshot_date=SNAP).collect()[0]
    assert s["sponsor_name"] == "Aoife Byrne"
    assert s["sponsor_role_name"] == "Minister for Housing"
    assert s["is_primary"] == "true"
    assert s["sponsor_order"] == "1"
    assert s["bill_sponsor_id"].startswith("bill_sponsor:")


def test_silver_bill_related_docs(spark, bill_payload):
    d = silver_bill_related_docs(bill_payload, snapshot_date=SNAP).collect()[0]
    assert d["related_doc_label"] == "Explanatory Memo"
    assert d["doc_type"] == "memo"
    assert d["related_doc_id"].startswith("generated:bill_related_doc:")
    assert d["source_file_id_pdf"].startswith("source_file:")
    assert d["source_file_id_xml"] == ""   # no xml format present


def test_silver_bill_debates_and_events(spark, bill_payload):
    db = silver_bill_debates(bill_payload, snapshot_date=SNAP).collect()[0]
    assert db["debate_id"] == "/debate/2025-03-10"
    assert db["chamber_name"] == "Dáil"
    assert db["bill_debate_id"].startswith("bill_debate:")
    ev = silver_bill_events(bill_payload, snapshot_date=SNAP).collect()[0]
    assert ev["bill_event_id"] == "/bill/2025/12/event/1"
    assert ev["event_name"] == "Introduced"
    assert ev["event_date"] == "2025-02-01"
