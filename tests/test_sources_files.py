"""File-corpus sources and export sinks (S5-S10, S15)."""

from __future__ import annotations

import json
import os

import pytest

from eirepolitic_data_pipeline_spark.sources import (
    RetryPolicy,
    PaginatedRestSource,
    archive_raw_payload,
    clean_column_name,
    fetch_documents,
    fetch_with_fallback,
    list_binary_files,
    normalize_column_names,
    read_csv_blank_preserving,
    write_csv_export,
)


class _FakeTransport:
    """Transport stub: endpoint → list of page payloads or an exception."""

    def __init__(self, pages_by_endpoint):
        self.pages = pages_by_endpoint
        self.calls = []

    def __call__(self, endpoint, params):
        self.calls.append(endpoint)
        spec = self.pages[endpoint]
        if isinstance(spec, Exception):
            raise spec
        return 200, {"results": spec}


def _source(transport):
    retry = RetryPolicy(retries=1, backoff_seconds=0.0, sleep=lambda s: None)
    return PaginatedRestSource(transport=transport, page_size=10,
                               max_pages=5, retry=retry)


def test_fetch_with_fallback_uses_second_endpoint():
    transport = _FakeTransport({
        "/divisions": RuntimeError("boom"),
        "/divisions-fallback": [{"id": 1}, {"id": 2}],
    })
    rows, tele = fetch_with_fallback(_source(transport),
                                     ["/divisions", "/divisions-fallback"])
    assert [r["id"] for r in rows] == [1, 2]
    assert tele["endpoint"] == "/divisions-fallback"
    assert transport.calls == ["/divisions", "/divisions-fallback"]


def test_fetch_with_fallback_reraises_last_error():
    transport = _FakeTransport({"/a": RuntimeError("a dead"),
                                "/b": RuntimeError("b dead")})
    with pytest.raises(RuntimeError, match="b dead"):
        fetch_with_fallback(_source(transport), ["/a", "/b"])


def test_list_binary_files(spark, tmp_path):
    (tmp_path / "d1.xml").write_bytes(b"<akn>one</akn>")
    (tmp_path / "d2.xml").write_bytes(b"<akn>two</akn>")
    (tmp_path / "skip.txt").write_bytes(b"nope")
    df = list_binary_files(spark, str(tmp_path), ext=".xml")
    rows = sorted(df.collect(), key=lambda r: r["path"])
    assert len(rows) == 2
    assert rows[0]["path"].endswith("d1.xml")
    assert bytes(rows[0]["content"]) == b"<akn>one</akn>"
    assert rows[0]["length"] == 14


def test_fetch_documents_retry_and_sniff(spark):
    df = spark.createDataFrame(
        [("u1",), ("u2",), ("u3",)], "url string")
    attempts = {}

    def fetcher(url: str) -> bytes:
        attempts[url] = attempts.get(url, 0) + 1
        if url == "u1":
            return b"<xml>ok</xml>"
        if url == "u2" and attempts[url] < 3:
            raise IOError("flaky")
        if url == "u2":
            return b"<xml>eventually</xml>"
        return b"error: an HTML-free failure page"   # never sniffs as XML

    out = {r["url"]: r["content"]
           for r in fetch_documents(df, "url", fetcher).collect()}
    assert bytes(out["u1"]) == b"<xml>ok</xml>"
    assert bytes(out["u2"]) == b"<xml>eventually</xml>"
    assert out["u3"] is None                      # sniff fail → null, no raise


def test_csv_blank_preserving_roundtrip(spark, tmp_path):
    path = str(tmp_path / "export")
    df = spark.createDataFrame(
        [("TD001", "", "Green"), ("TD002", "Clare", "")],
        "code string, constituency string, party string")
    write_csv_export(df, path, bom=True, single_file=True)

    parts = [p for p in os.listdir(path) if p.startswith("part-")]
    assert len(parts) == 1
    raw = open(os.path.join(path, parts[0]), "rb").read()
    assert raw.startswith(b"\xef\xbb\xbf")        # Excel BOM

    back = read_csv_blank_preserving(spark, path)
    rows = {r["code"]: r for r in back.collect()}
    assert rows["TD001"]["constituency"] == ""    # blank stays blank
    assert rows["TD002"]["party"] == ""
    assert rows["TD002"]["constituency"] == "Clare"


def test_clean_column_name():
    """P3 header cleanup: lower/underscore, accents DROPPED (not folded),
    symbols removed, collapse+trim, empty -> 'col'."""
    assert clean_column_name("  Debate Date ") == "debate_date"
    assert clean_column_name("Speaker-Name") == "speaker_name"
    assert clean_column_name("Dáil Éireann") == "dil_ireann"   # accents drop
    assert clean_column_name("Votes (%) Cast!!") == "votes_cast"
    assert clean_column_name("__a___b__") == "a_b"
    assert clean_column_name("***") == "col"


def test_normalize_column_names_collisions(spark):
    """P3 collision suffixing: duplicates get _2, _3 in first-seen order,
    including collisions created by the cleanup itself."""
    df = spark.createDataFrame(
        [(1, 2, 3, 4, 5)],
        ["Speaker Name", "speaker-name", "Speaker  NAME", "ok", "***"])
    out = normalize_column_names(df)
    assert out.columns == ["speaker_name", "speaker_name_2",
                           "speaker_name_3", "ok", "col"]
    assert out.collect()[0][:] == (1, 2, 3, 4, 5)


def test_archive_raw_payload_deterministic(tmp_path):
    payload = {"b": 2, "a": [1, {"z": None}]}
    p1 = archive_raw_payload(payload, str(tmp_path), "silver_members",
                             "2026-08-13", "r1")
    p2 = archive_raw_payload(payload, str(tmp_path), "silver_members",
                             "2026-08-13", "r2")
    assert "raw/silver_members/snapshot_date=2026-08-13/run_id=r1" in p1
    assert open(p1).read() == open(p2).read()     # sorted-key determinism
    assert json.load(open(p1)) == payload
