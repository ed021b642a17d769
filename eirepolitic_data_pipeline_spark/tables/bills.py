"""Bill-family silver flatteners — SURVEY §2.3 (legislation endpoint).

One fetched bill payload fans out into seven tables
(`extract/oireachtas/table_bills.py:147-190`, `table_bill_versions.py`,
`table_bill_stages.py`, `table_bill_sponsors.py`,
`table_bill_related_docs.py`, `table_bill_debates.py`,
`table_bill_events.py`): the bill header row plus exploded child lists
(versions / stages / sponsors / relatedDocs / debates / events), each with
wrapper-key unwrapping, generated IDs when URIs are absent, and
source-file locators for the downloadable formats.

All builders are Arrow-batched ``mapInPandas`` stages sharing the parity
helpers from ``tables.silver`` — same sha-256 ID recipe, same coerce-to-
blank date parsing, partition-parallel with no shuffle until dedupe.
"""

from __future__ import annotations

import re
from typing import Any, Iterator, Mapping, Optional

from pyspark.sql import DataFrame

from .silver import (
    _first,
    _first_map,
    _flatten_stage,
    _results_of,
    _txt,
    normalize_format_url_py,
    parse_iso_date_py,
    record_hash_py,
    stable_hash_py,
)

BILL_COLUMNS = ["bill_id", "bill_uri", "bill_no", "bill_year", "title",
                "short_title", "origin_house_uri", "origin_house_name",
                "bill_type", "status", "introduced_date", "last_event_date",
                "source_endpoint", "snapshot_date", "source_hash"]
VERSION_COLUMNS = ["bill_version_id", "bill_id", "version_label",
                   "version_date", "format_pdf_uri", "format_pdf_url",
                   "format_xml_uri", "format_xml_url", "source_file_id_pdf",
                   "source_file_id_xml", "s3_pdf_key", "s3_xml_key",
                   "snapshot_date"]
STAGE_COLUMNS = ["bill_stage_id", "bill_id", "stage_name", "stage_date",
                 "house_uri", "house_name", "stage_outcome", "order_in_bill",
                 "snapshot_date"]
SPONSOR_COLUMNS = ["bill_sponsor_id", "bill_id", "sponsor_uri",
                   "sponsor_name", "sponsor_role_uri", "sponsor_role_name",
                   "is_primary", "sponsor_order", "snapshot_date"]
RELATED_DOC_COLUMNS = ["related_doc_id", "bill_id", "related_doc_label",
                       "related_doc_date", "doc_type", "language",
                       "format_pdf_uri", "format_pdf_url", "format_xml_uri",
                       "format_xml_url", "source_file_id_pdf",
                       "source_file_id_xml", "s3_pdf_key", "s3_xml_key",
                       "snapshot_date"]
BILL_DEBATE_COLUMNS = ["bill_debate_id", "bill_id", "debate_id",
                       "debate_uri", "debate_date", "debate_show_as",
                       "debate_section_id", "chamber_uri", "chamber_name",
                       "debate_order", "snapshot_date"]
BILL_EVENT_COLUMNS = ["bill_event_id", "bill_id", "event_uri",
                      "event_type_uri", "event_name", "event_date",
                      "chamber_uri", "chamber_name", "event_order",
                      "snapshot_date"]


# ---------------------------------------------------------------------------
# Shared bill helpers
# ---------------------------------------------------------------------------

def _bill_ctx(item: Any) -> tuple[Mapping[str, Any], str]:
    bill = item.get("bill") if isinstance(item, Mapping) and \
        isinstance(item.get("bill"), Mapping) else item
    if not isinstance(bill, Mapping):
        return {}, ""
    uri = _first(bill, "uri", "billUri")
    bill_id = uri or _first(bill, "billId", "id") or \
        "generated:bill:" + record_hash_py(bill, length=24)
    return bill, bill_id


def _child_list(bill: Mapping[str, Any], key: str,
                wrapper: Optional[str]) -> Iterator[tuple[int, Mapping[str, Any]]]:
    """Enumerate a bill's child list, unwrapping {wrapper: {...}} entries."""
    entries = bill.get(key)
    if not isinstance(entries, list):
        return
    for i, entry in enumerate(entries):
        if not isinstance(entry, Mapping):
            continue
        inner = entry.get(wrapper) if wrapper and \
            isinstance(entry.get(wrapper), Mapping) else entry
        if isinstance(inner, Mapping):
            yield i, inner


def _earliest_date(rec: Mapping[str, Any]) -> str:
    """First of the record's dates[] entries plus its direct date."""
    found = []
    dates = rec.get("dates")
    if isinstance(dates, list):
        for d in dates:
            p = parse_iso_date_py(d.get("date") if isinstance(d, Mapping)
                                  else d)
            if p:
                found.append(p)
    direct = parse_iso_date_py(rec.get("date"))
    if direct:
        found.append(direct)
    return min(found) if found else ""


def _slug(value: str) -> str:
    text = _txt(value).replace("https://", "").replace("http://", "")
    return re.sub(r"[^A-Za-z0-9._-]+", "-", text).strip("-")


def _format_locator(formats: Mapping[str, Any], ftype: str,
                    bill_id: str) -> dict[str, str]:
    """(uri, normalized url, source_file_id, s3 key) for one format slot."""
    raw = formats.get(ftype) if isinstance(formats.get(ftype), Mapping) else {}
    uri = _first(raw, "uri", "formatUri")
    url_for_hash = _first(raw, "url", "href", "downloadUrl", "formatUrl")
    if not url_for_hash and uri.startswith("http"):
        url_for_hash = uri
    if not uri and url_for_hash.startswith("http"):
        uri = url_for_hash
    if not (uri or url_for_hash):
        return {"uri": "", "url": "", "sfid": "", "s3_key": ""}
    sfid = "source_file:" + stable_hash_py(
        ["legislation", bill_id, ftype, uri, url_for_hash], length=24)
    s3_key = (f"raw/oireachtas_unified/source_files/legislation/"
              f"{_slug(bill_id)[-120:] or 'entity'}/{_slug(sfid)}.{ftype}")
    return {"uri": uri, "url": normalize_format_url_py(url_for_hash or uri),
            "sfid": sfid, "s3_key": s3_key}


def _all_dates(value: Any) -> list[str]:
    """Every parseable *date-keyed value anywhere in the record."""
    out: set[str] = set()

    def walk(v: Any):
        if isinstance(v, Mapping):
            for k, child in v.items():
                kl = str(k).lower()
                if kl in {"date", "datetime", "lastupdated", "created",
                          "updated"} or kl.endswith(("date", "datetime")):
                    p = parse_iso_date_py(child)
                    if p:
                        out.add(p)
                walk(child)
        elif isinstance(v, list):
            for child in v:
                walk(child)

    walk(value)
    return sorted(out)


def _deep_first(value: Any, key: str) -> str:
    if isinstance(value, Mapping):
        direct = _first(value, key)
        if direct:
            return direct
        for child in value.values():
            found = _deep_first(child, key)
            if found:
                return found
    elif isinstance(value, list):
        for child in value:
            found = _deep_first(child, key)
            if found:
                return found
    return ""


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------

def silver_bills(df: DataFrame, json_col: str = "payload",
                 snapshot_date: str = "",
                 endpoint: str = "/legislation") -> DataFrame:
    """Bill header rows with date-span rollup (introduced = earliest date
    found anywhere in the record, last_event = latest)."""

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            bill, bill_id = _bill_ctx(item)
            if not bill:
                continue
            origin = _first_map(bill, "originHouse")
            dates = _all_dates(bill)
            yield {
                "bill_id": bill_id,
                "bill_uri": _first(bill, "uri", "billUri"),
                "bill_no": _first(bill, "billNo", "billNumber"),
                "bill_year": _first(bill, "billYear", "year"),
                "title": _first(bill, "shortTitleEn", "longTitleEn",
                                "shortTitleGa", "longTitleGa", "showAs",
                                "title"),
                "short_title": _first(bill, "shortTitleEn", "shortTitleGa"),
                "origin_house_uri": _first(origin, "uri")
                or _first(bill, "originHouseURI"),
                "origin_house_name": _first(origin, "showAs", "name"),
                "bill_type": _first(bill, "billType", "method"),
                "status": _first(bill, "status")
                or _deep_first(bill.get("mostRecentStage"), "stageOutcome")
                or _deep_first(bill.get("mostRecentStage"), "showAs"),
                "introduced_date": dates[0] if dates else "",
                "last_event_date": dates[-1] if dates else "",
                "source_endpoint": endpoint,
                "snapshot_date": snapshot_date,
                "source_hash": record_hash_py(item),
            }

    return _flatten_stage(df, json_col, BILL_COLUMNS,
                          rows_of).dropDuplicates(["bill_id"])


def silver_bill_versions(df: DataFrame, json_col: str = "payload",
                         snapshot_date: str = "") -> DataFrame:
    """Bill text versions with pdf/xml source-file locators."""

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            bill, bill_id = _bill_ctx(item)
            for i, v in _child_list(bill, "versions", "version"):
                label = _first(v, "showAs", "title", "label")
                vdate = parse_iso_date_py(v.get("date")) or ""
                doc_type = _first(v, "docType")
                lang = _first(v, "lang")
                vid = _first(v, "uri", "versionUri") or \
                    "generated:bill_version:" + stable_hash_py(
                        [bill_id, label, vdate, doc_type, lang, i], length=24)
                formats = _first_map(v, "formats")
                pdf = _format_locator(formats, "pdf", bill_id)
                xml = _format_locator(formats, "xml", bill_id)
                yield {
                    "bill_version_id": vid, "bill_id": bill_id,
                    "version_label": label, "version_date": vdate,
                    "format_pdf_uri": pdf["uri"], "format_pdf_url": pdf["url"],
                    "format_xml_uri": xml["uri"], "format_xml_url": xml["url"],
                    "source_file_id_pdf": pdf["sfid"],
                    "source_file_id_xml": xml["sfid"],
                    "s3_pdf_key": pdf["s3_key"], "s3_xml_key": xml["s3_key"],
                    "snapshot_date": snapshot_date,
                }

    return _flatten_stage(df, json_col, VERSION_COLUMNS,
                          rows_of).dropDuplicates(["bill_version_id"])


def silver_bill_stages(df: DataFrame, json_col: str = "payload",
                       snapshot_date: str = "") -> DataFrame:
    """Bill stage events with house context and earliest stage date."""

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            bill, bill_id = _bill_ctx(item)
            for i, ev in _child_list(bill, "stages", "event"):
                name = _first(ev, "showAs", "stageName", "name")
                sdate = _earliest_date(ev)
                order = _first(ev, "progressStage", "order", "stageOrder")
                house = _first_map(ev, "house")
                chamber = _first_map(ev, "chamber")
                h_uri = _first(house, "uri") or _first(chamber, "uri")
                sid = _first(ev, "uri", "stageUri", "stageURI") or \
                    "generated:bill_stage:" + stable_hash_py(
                        [bill_id, name, sdate, order, h_uri, i], length=24)
                yield {
                    "bill_stage_id": sid, "bill_id": bill_id,
                    "stage_name": name, "stage_date": sdate,
                    "house_uri": h_uri,
                    "house_name": _first(house, "showAs", "name")
                    or _first(chamber, "showAs", "name"),
                    "stage_outcome": _first(ev, "stageOutcome", "outcome"),
                    "order_in_bill": order,
                    "snapshot_date": snapshot_date,
                }

    return _flatten_stage(df, json_col, STAGE_COLUMNS,
                          rows_of).dropDuplicates(["bill_stage_id"])


def silver_bill_sponsors(df: DataFrame, json_col: str = "payload",
                         snapshot_date: str = "") -> DataFrame:
    """Bill sponsors (by/as structs) with 1-based sponsor order."""

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            bill, bill_id = _bill_ctx(item)
            for i, sp in _child_list(bill, "sponsors", "sponsor"):
                by, role = _first_map(sp, "by"), _first_map(sp, "as")
                raw_primary = sp.get("isPrimary")
                if isinstance(raw_primary, bool):
                    is_primary = "true" if raw_primary else "false"
                else:
                    p = _txt(raw_primary).lower()
                    is_primary = {"1": "true", "yes": "true", "y": "true",
                                  "0": "false", "no": "false",
                                  "n": "false"}.get(p, p)
                order = str(i + 1)
                fields = [_first(by, "uri"), _first(by, "showAs", "name"),
                          _first(role, "uri"), _first(role, "showAs", "name")]
                yield {
                    "bill_sponsor_id": "bill_sponsor:" + stable_hash_py(
                        [bill_id, *fields, is_primary, order], length=24),
                    "bill_id": bill_id,
                    "sponsor_uri": fields[0], "sponsor_name": fields[1],
                    "sponsor_role_uri": fields[2],
                    "sponsor_role_name": fields[3],
                    "is_primary": is_primary, "sponsor_order": order,
                    "snapshot_date": snapshot_date,
                }

    return _flatten_stage(df, json_col, SPONSOR_COLUMNS,
                          rows_of).dropDuplicates(["bill_sponsor_id"])


def silver_bill_related_docs(df: DataFrame, json_col: str = "payload",
                             snapshot_date: str = "") -> DataFrame:
    """Related documents with pdf/xml source-file locators."""

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            bill, bill_id = _bill_ctx(item)
            for i, doc in _child_list(bill, "relatedDocs", "relatedDoc"):
                label = _first(doc, "showAs", "title", "label")
                ddate = parse_iso_date_py(doc.get("date")) or ""
                dtype = _first(doc, "docType", "type")
                lang = _first(doc, "lang", "language")
                did = _first(doc, "uri", "relatedDocUri", "docUri") or \
                    "generated:bill_related_doc:" + stable_hash_py(
                        [bill_id, label, ddate, dtype, lang, i], length=24)
                formats = _first_map(doc, "formats")
                pdf = _format_locator(formats, "pdf", bill_id)
                xml = _format_locator(formats, "xml", bill_id)
                yield {
                    "related_doc_id": did, "bill_id": bill_id,
                    "related_doc_label": label, "related_doc_date": ddate,
                    "doc_type": dtype, "language": lang,
                    "format_pdf_uri": pdf["uri"], "format_pdf_url": pdf["url"],
                    "format_xml_uri": xml["uri"], "format_xml_url": xml["url"],
                    "source_file_id_pdf": pdf["sfid"],
                    "source_file_id_xml": xml["sfid"],
                    "s3_pdf_key": pdf["s3_key"], "s3_xml_key": xml["s3_key"],
                    "snapshot_date": snapshot_date,
                }

    return _flatten_stage(df, json_col, RELATED_DOC_COLUMNS,
                          rows_of).dropDuplicates(["related_doc_id"])


def silver_bill_debates(df: DataFrame, json_col: str = "payload",
                        snapshot_date: str = "") -> DataFrame:
    """Bill↔debate links with 1-based order and generated link IDs."""

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            bill, bill_id = _bill_ctx(item)
            for i, db in _child_list(bill, "debates", None):
                uri = _first(db, "uri", "debateUri")
                ddate = parse_iso_date_py(db.get("date")) or ""
                show_as = _first(db, "showAs", "title", "label")
                section = _first(db, "debateSectionId", "sectionId")
                chamber = _first_map(db, "chamber")
                order = str(i + 1)
                debate_id = uri or "generated:debate:" + stable_hash_py(
                    [bill_id, show_as, ddate, section, order], length=24)
                yield {
                    "bill_debate_id": "bill_debate:" + stable_hash_py(
                        [bill_id, uri, section, order], length=24),
                    "bill_id": bill_id, "debate_id": debate_id,
                    "debate_uri": uri, "debate_date": ddate,
                    "debate_show_as": show_as, "debate_section_id": section,
                    "chamber_uri": _first(chamber, "uri"),
                    "chamber_name": _first(chamber, "showAs", "name"),
                    "debate_order": order, "snapshot_date": snapshot_date,
                }

    return _flatten_stage(df, json_col, BILL_DEBATE_COLUMNS,
                          rows_of).dropDuplicates(["bill_debate_id"])


def silver_bill_events(df: DataFrame, json_col: str = "payload",
                       snapshot_date: str = "") -> DataFrame:
    """Bill lifecycle events with earliest event date and chamber context."""

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            bill, bill_id = _bill_ctx(item)
            for i, ev in _child_list(bill, "events", "event"):
                type_uri = _first(ev, "eventURI", "eventUri", "typeURI",
                                  "typeUri")
                name = _first(ev, "showAs", "name", "label")
                edate = _earliest_date(ev)
                chamber = _first_map(ev, "chamber")
                order = str(i + 1)
                eid = _first(ev, "uri") or \
                    "generated:bill_event:" + stable_hash_py(
                        [bill_id, type_uri, name, edate,
                         _first(chamber, "uri"), order], length=24)
                yield {
                    "bill_event_id": eid, "bill_id": bill_id,
                    "event_uri": _first(ev, "uri"),
                    "event_type_uri": type_uri, "event_name": name,
                    "event_date": edate,
                    "chamber_uri": _first(chamber, "uri"),
                    "chamber_name": _first(chamber, "showAs", "name"),
                    "event_order": order, "snapshot_date": snapshot_date,
                }

    return _flatten_stage(df, json_col, BILL_EVENT_COLUMNS,
                          rows_of).dropDuplicates(["bill_event_id"])
