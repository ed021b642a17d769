"""REST pagination + date bisection + XML parser tests — porting the
reference's fake-client test behaviors (tests/test_oireachtas_pagination.py,
test_oireachtas_partitioned_fetch.py)."""

from __future__ import annotations

from datetime import date

import pytest

from eirepolitic_data_pipeline_spark.sources import (
    OffsetCeilingError,
    PageProgressError,
    PaginatedRestSource,
    RetryPolicy,
    bisect_date_windows,
    fetch_date_partitioned,
    parse_debate_xml,
    speeches_from_xml,
)

NO_SLEEP = RetryPolicy(retries=3, backoff_seconds=0.0, sleep=lambda s: None)


def paged_transport(rows, total_key=True, fail_statuses=()):
    """Fake server: serves `rows` in limit/skip pages."""
    calls = {"n": 0}

    def transport(endpoint, params):
        calls["n"] += 1
        if fail_statuses and calls["n"] <= len(fail_statuses):
            return fail_statuses[calls["n"] - 1], {}
        skip, limit = params.get("skip", 0), params.get("limit", 200)
        payload = {"results": rows[skip:skip + limit]}
        if total_key:
            payload["head"] = {"counts": {"totalCount": len(rows)}}
        return 200, payload

    transport.calls = calls
    return transport


def test_merges_pages_until_reported_total():
    rows = [{"id": i} for i in range(450)]
    src = PaginatedRestSource(transport=paged_transport(rows), page_size=200,
                              retry=NO_SLEEP)
    got, tele = src.fetch_all("/things")
    assert got == rows
    assert tele["stop_reason"] == "reported_total"
    assert tele["pages"] == 3


def test_short_page_completes_without_total():
    rows = [{"id": i} for i in range(250)]
    src = PaginatedRestSource(transport=paged_transport(rows, total_key=False),
                              page_size=200, retry=NO_SLEEP)
    got, tele = src.fetch_all("/things")
    assert len(got) == 250
    assert tele["stop_reason"] == "short_page"


def test_repeated_page_fails_instead_of_looping():
    def transport(endpoint, params):
        return 200, {"results": [{"id": 1}] * 200}  # same page forever

    src = PaginatedRestSource(transport=transport, page_size=200, retry=NO_SLEEP)
    with pytest.raises(PageProgressError):
        src.fetch_all("/things")


def test_retry_on_5xx_then_success():
    rows = [{"id": i} for i in range(10)]
    tr = paged_transport(rows, fail_statuses=(503, 429))
    src = PaginatedRestSource(transport=tr, page_size=200, retry=NO_SLEEP)
    got, tele = src.fetch_all("/things")
    assert len(got) == 10 and tele["stop_reason"] == "reported_total"


def test_limit_caps_rows_test_mode():
    rows = [{"id": i} for i in range(500)]
    src = PaginatedRestSource(transport=paged_transport(rows), page_size=200,
                              retry=NO_SLEEP)
    got, tele = src.fetch_all("/things", limit=50)
    assert len(got) == 50 and tele["stop_reason"] == "limit"


def test_offset_ceiling_bisects_into_nonoverlapping_windows():
    # server 422s whenever the window is wider than 1 day
    by_day = {f"2026-01-0{d}": [{"id": f"{d}-{i}"} for i in range(3)]
              for d in range(1, 5)}
    windows_seen = []

    def transport(endpoint, params):
        a, b = params["date_start"], params["date_end"]
        if a != b:
            return 422, {}
        windows_seen.append((a, b))
        return 200, {"results": by_day.get(a, []),
                     "head": {"counts": {"totalCount": len(by_day.get(a, []))}}}

    src = PaginatedRestSource(transport=transport, page_size=200, retry=NO_SLEEP)
    rows, tele = fetch_date_partitioned(
        src, "/things", date(2026, 1, 1), date(2026, 1, 4))
    assert len(rows) == 12
    # non-overlapping, complete coverage
    assert sorted(windows_seen) == [(f"2026-01-0{d}",) * 2 for d in range(1, 5)]
    assert all(t["stop_reason"] == "reported_total" for t in tele)


def test_single_day_ceiling_surfaces():
    def transport(endpoint, params):
        return 422, {}

    src = PaginatedRestSource(transport=transport, page_size=200, retry=NO_SLEEP)
    with pytest.raises(OffsetCeilingError):
        fetch_date_partitioned(src, "/things", date(2026, 1, 1), date(2026, 1, 1))


def test_bisect_date_windows():
    wins = bisect_date_windows(date(2026, 1, 1), date(2026, 1, 10), 4)
    assert wins == [(date(2026, 1, 1), date(2026, 1, 4)),
                    (date(2026, 1, 5), date(2026, 1, 8)),
                    (date(2026, 1, 9), date(2026, 1, 10))]


# ---------------------------------------------------------------------------
# XML parser
# ---------------------------------------------------------------------------

DEBATE_XML = """<?xml version="1.0" encoding="UTF-8"?>
<akomaNtoso xmlns="http://docs.oasis-open.org/legaldocml/ns/akn/3.0">
  <references>
    <TLCPerson eId="AlicePerson" href="/ie/oireachtas/member/id/alice-1/"/>
    <TLCPerson eId="BobPerson" href="/ie/oireachtas/member/id/bob-2/"/>
  </references>
  <debate xml:lang="en">
    <debateSection name="prelude">
      <speech by="#AlicePerson"><p>Opening remarks here.</p></speech>
    </debateSection>
    <debateSection name="housing">
      <speech by="#AlicePerson"><p>First housing point.</p><p>Second point.</p></speech>
      <debateSection name="division">
        <speech by="#BobPerson"><p>Vótáil anois.</p></speech>
      </debateSection>
      <speech by="#unknown"><p>Anonymous contribution.</p></speech>
    </debateSection>
  </debate>
</akomaNtoso>
"""


def test_parse_debate_xml_semantics():
    rows = parse_debate_xml("d1", DEBATE_XML.encode())
    assert [r["speech_order"] for r in rows] == [1, 2, 3, 4]
    by_order = {r["speech_order"]: r for r in rows}
    # prelude and division are non-joinable → not in section path
    assert by_order[1]["section_path"] == ""
    assert by_order[2]["section_path"] == "housing"
    assert by_order[3]["section_path"] == "housing"
    assert by_order[2]["member_code"] == "alice-1"
    assert by_order[3]["member_code"] == "bob-2"
    assert by_order[4]["member_code"] == ""
    assert by_order[2]["text"] == "First housing point. Second point."
    assert by_order[2]["word_count"] == 5
    assert by_order[1]["language"] == "en"
    # deterministic ids: reparse yields identical ids
    again = parse_debate_xml("d1", DEBATE_XML.encode())
    assert [r["speech_id"] for r in rows] == [r["speech_id"] for r in again]
    # different debate id → different ids
    other = parse_debate_xml("d2", DEBATE_XML.encode())
    assert rows[0]["speech_id"] != other[0]["speech_id"]


def test_speeches_from_xml_distributed(spark):
    df = spark.createDataFrame(
        [("d1", DEBATE_XML), ("d2", DEBATE_XML)], "debate_id string, xml string")
    out = speeches_from_xml(df)
    rows = out.collect()
    assert len(rows) == 8
    assert {r["debate_id"] for r in rows} == {"d1", "d2"}
    assert out.schema["speech_order"].dataType.simpleString() == "int"


# ---------------------------------------------------------------------------
# endpoint discovery (reference discovery.py)
# ---------------------------------------------------------------------------

def test_endpoint_discovery_shapes_and_failures():
    from eirepolitic_data_pipeline_spark.sources.rest import endpoint_discovery
    from eirepolitic_data_pipeline_spark.tables.silver import stable_hash_py

    def transport(endpoint, params):
        assert params["limit"] <= 5  # one small page, never paginated
        if endpoint == "/members":
            return 200, {"head": {"counts": {"totalCount": 2}}, "results": [
                {"member": {"memberCode": "m1",
                            "memberships": [{"house": {"houseNo": "34"}}]}},
                {"member": {"memberCode": "m2"}}]}
        if endpoint == "/houses":
            return 200, {"results": []}
        raise RuntimeError("connection refused")

    src = PaginatedRestSource(transport=transport, retry=NO_SLEEP)
    specs = [
        {"name": "members", "endpoint": "/members",
         "params": {"chamber": "dail", "limit": 5}},
        {"name": "houses", "endpoint": "/houses", "params": {"limit": 5}},
        {"name": "votes_probe", "endpoint": "/votes", "params": {"limit": 5}},
    ]
    rows, manifest = endpoint_discovery(src, specs)
    by = {r["endpoint_name"]: r for r in rows}

    m = by["members"]
    assert m["ok"] and m["result_count"] == 2
    assert m["top_keys"] == "head,results"
    assert m["result_wrapper_keys"] == "member"
    # schema hash = stable hash of the FIRST item's nested key paths (F9)
    expected_paths = sorted([
        "member", "member.memberCode", "member.memberships",
        "member.memberships[]", "member.memberships[].house"])
    assert m["schema_hash"] == stable_hash_py(expected_paths, length=16)
    assert manifest["payload_shapes"]["members"]["item_key_paths"] == \
        expected_paths

    h = by["houses"]
    assert h["ok"] and h["result_count"] == 0 and h["schema_hash"] is None

    v = by["votes_probe"]
    assert not v["ok"] and "retries exhausted" in v["error"]
    assert v["status_code"] == 0 and v["result_count"] == 0

    assert manifest["status"] == "success"
    assert (manifest["ok_count"], manifest["failed_count"]) == (2, 1)

    # all-dead discovery flips to failed, but still returns rows
    def dead(endpoint, params):
        raise RuntimeError("down")
    rows2, mani2 = endpoint_discovery(
        PaginatedRestSource(transport=dead, retry=NO_SLEEP), specs[:1])
    assert mani2["status"] == "failed" and len(rows2) == 1
