"""Silver flatteners — SURVEY §2.3 F1/F2/F4: ragged API JSON → silver rows.

The reference normalizes deeply nested, multi-shaped API payloads with
defensive multi-key fallbacks and recursive descent
(`extract/oireachtas/table_members.py:151-257`,
`table_member_memberships.py:164-213`, `table_member_votes.py:80-160`).
That raggedness (any of several wrapper keys, mapping-or-list values,
recursive fallback walks) cannot be expressed as one fixed `from_json`
StructType, so these operators are Arrow-batched ``mapInPandas`` stages:
each task parses its partition's JSON payload strings and emits normalized
rows — the UDTF shape Spark gives for one-input→many-rows flattening.

Scale: payload rows (one per fetched page/record batch) partition freely;
flattening is embarrassingly parallel, no shuffle until the caller's
dedupe/merge. Surrogate IDs are the same sha-256 recipe as
``functions.scalar.stable_hash`` so JVM- and Python-side IDs agree.
"""

from __future__ import annotations

import hashlib
import json
import re
from datetime import date, datetime
from typing import Any, Iterable, Iterator, Mapping, Optional

import pandas as pd
from pyspark.sql import DataFrame

from ..operators.dedupe import dedupe_total_order

# ---------------------------------------------------------------------------
# Python-side parity helpers (same semantics as functions.scalar)
# ---------------------------------------------------------------------------

def _txt(value: Any) -> str:
    """None → ''; anything else → stripped str (blank == missing)."""
    return "" if value is None else str(value).strip()


def _first(d: Any, *keys: str) -> str:
    """First non-blank SCALAR text among candidate keys (schema-on-read
    fallback). Mapping/list values are skipped, not stringified — the
    reference's `_first_text` (`table_member_offices.py:229-237`) does the
    same, so a nested officeName map falls through to the dedicated
    nested-name walk instead of leaking a dict repr into the column."""
    if not isinstance(d, Mapping):
        return ""
    for k in keys:
        v = d.get(k)
        if v is None or isinstance(v, (Mapping, list)):
            continue
        t = _txt(v)
        if t:
            return t
    return ""


def _first_map(d: Any, *keys: str) -> Mapping[str, Any]:
    if isinstance(d, Mapping):
        for k in keys:
            v = d.get(k)
            if isinstance(v, Mapping):
                return v
    return {}


def stable_hash_py(parts: Iterable[Any], length: int = 16) -> str:
    """X6 parity: sha256('|'.join(lower(str(part)))) hex prefix."""
    joined = "|".join(_txt(p).lower() for p in parts)
    return hashlib.sha256(joined.encode("utf-8")).hexdigest()[:length]


def record_hash_py(record: Any, length: int = 16) -> str:
    """X7 parity: sha256 of canonical sorted-key compact JSON."""
    canon = json.dumps(record, ensure_ascii=False, sort_keys=True,
                       separators=(",", ":"), default=str)
    return hashlib.sha256(canon.encode("utf-8")).hexdigest()[:length]


_ISO_PREFIX = re.compile(r"^(\d{4}-\d{2}-\d{2})")


def parse_iso_date_py(value: Any) -> Optional[str]:
    """X4 parity: ISO prefix match, then dd/MM/yyyy, yyyy/MM/dd, dd-MM-yyyy."""
    text = _txt(value)
    if not text:
        return None
    m = _ISO_PREFIX.match(text)
    if m:
        return m.group(1)
    for fmt in ("%d/%m/%Y", "%Y/%m/%d", "%d-%m-%Y"):
        try:
            return datetime.strptime(text, fmt).date().isoformat()
        except ValueError:
            continue
    return None


def is_current_range_py(start: Any, end: Any,
                        today: Optional[date] = None) -> bool:
    """X5 parity: today within [start, end]; open bounds ok; a supplied but
    unparsable bound is invalid (never current); future start not current."""
    now = today or date.today()
    s_txt, e_txt = _txt(start), _txt(end)
    s_iso, e_iso = parse_iso_date_py(start), parse_iso_date_py(end)
    if s_txt and not s_iso:
        return False
    if e_txt and not e_iso:
        return False
    if s_iso and date.fromisoformat(s_iso) > now:
        return False
    if e_iso and date.fromisoformat(e_iso) < now:
        return False
    return True


# ---------------------------------------------------------------------------
# Shared payload walkers
# ---------------------------------------------------------------------------

_MEMBER_WRAPPERS = ("member", "person", "memberDetails")
_MEMBER_LISTS = ("members", "memberList")
_MEMBERSHIP_KEYS = ("memberships", "membership", "memberMemberships")
_MEMBERSHIP_WRAPPERS = ("membership", "memberMembership")


def _unwrap(entry: Mapping[str, Any], wrappers: tuple[str, ...]) -> Mapping[str, Any]:
    for k in wrappers:
        v = entry.get(k)
        if isinstance(v, Mapping):
            return v
    return entry


def iter_member_records(item: Any) -> Iterator[Mapping[str, Any]]:
    """F1 record discovery: direct wrappers, list wrappers, self-shaped
    records, then a recursive-descent fallback over unknown nesting."""
    if not isinstance(item, Mapping):
        return
    found = False
    for k in _MEMBER_WRAPPERS:
        v = item.get(k)
        if isinstance(v, Mapping):
            found = True
            yield v
    for k in _MEMBER_LISTS:
        v = item.get(k)
        if isinstance(v, list):
            for entry in v:
                if isinstance(entry, Mapping):
                    found = True
                    yield _unwrap(entry, _MEMBER_WRAPPERS)
    if found:
        return
    if any(k in item for k in ("memberCode", "fullName", "showAs", "uri")):
        yield item
        return
    for child in item.values():
        if isinstance(child, Mapping):
            yield from iter_member_records(child)


def iter_memberships(record: Any, wrapper: Any) -> Iterator[Mapping[str, Any]]:
    """F2 membership discovery on both the member record and its wrapper."""
    for parent in (record, wrapper):
        if not isinstance(parent, Mapping):
            continue
        for k in _MEMBERSHIP_KEYS:
            v = parent.get(k)
            if isinstance(v, list):
                for entry in v:
                    if isinstance(entry, Mapping):
                        yield _unwrap(entry, _MEMBERSHIP_WRAPPERS)
            elif isinstance(v, Mapping):
                yield _unwrap(v, _MEMBERSHIP_WRAPPERS)


def _membership_bound(m: Mapping[str, Any], which: str) -> Optional[str]:
    for rng_key in ("dateRange", "date_range", "memberDateRange"):
        rng = m.get(rng_key)
        if isinstance(rng, Mapping) and _txt(rng.get(which)):
            return parse_iso_date_py(rng.get(which))
    flat = {"start": ("membershipStart", "startDate", "dateStart"),
            "end": ("membershipEnd", "endDate", "dateEnd")}[which]
    v = _first(m, *flat)
    return parse_iso_date_py(v) if v else None


def _nested_latest(value: Any, wrapper_key: str,
                   today: Optional[date] = None) -> Mapping[str, Any]:
    """F3: pick current-else-latest entry from a nested interval list."""
    if isinstance(value, Mapping):
        inner = value.get(wrapper_key)
        return inner if isinstance(inner, Mapping) else value
    if not isinstance(value, list):
        return {}
    records = []
    for entry in value:
        if isinstance(entry, Mapping):
            inner = entry.get(wrapper_key)
            records.append(inner if isinstance(inner, Mapping) else entry)
    if not records:
        return {}

    def bounds(r: Mapping[str, Any]) -> tuple[Optional[str], Optional[str]]:
        rng = _first_map(r, "dateRange", "date_range")
        s = parse_iso_date_py(rng.get("start") if rng else r.get("start"))
        e = parse_iso_date_py(rng.get("end") if rng else r.get("end"))
        return s, e

    current = [r for r in records
               if is_current_range_py(*bounds(r), today=today)]
    pool = current or records
    return sorted(pool, key=lambda r: ((bounds(r)[1] or "9999-12-31"),
                                       (bounds(r)[0] or "")), reverse=True)[0]


def _party_of(m: Mapping[str, Any]) -> str:
    direct = _first(_first_map(m, "party", "partyDetails"),
                    "showAs", "partyName", "name") \
        or _first(m, "partyName", "party")
    if direct:
        return direct
    return _first(_nested_latest(m.get("parties"), "party"),
                  "showAs", "partyName", "name")


def _constituency_of(m: Mapping[str, Any]) -> str:
    direct = _first(_first_map(m, "constituency", "constituencyOrPanel",
                               "represent"),
                    "showAs", "name", "constituencyName") \
        or _first(m, "constituencyName", "represent")
    if direct:
        return direct
    return _first(_nested_latest(m.get("represents"), "represent"),
                  "showAs", "name", "constituencyName", "representName")


def _house_no_of(m: Mapping[str, Any]) -> str:
    house = _first_map(m, "house", "houseRecord")
    return _first(house, "houseNo") or _first(m, "houseNo", "house_no")


_MEMBER_CODE_URI = re.compile(r"/member/id/([^/]+)")


def _member_code_of(record: Mapping[str, Any]) -> str:
    """THE member_code recipe — every member-keyed silver table derives the
    code through this one function, so a code-less record gets the SAME
    generated code in silver_members and in every child table
    (memberships/parties/constituencies/offices/votes). The reference's
    builders disagree with each other here (table_members.py:213 hashes,
    table_member_memberships.py:186 leaves blank), which orphans the child
    rows of any code-less member; the registry declares member_code a
    non-null FK, so this engine unifies the chain instead of copying the
    mismatch: declared keys → URI-embedded code (readable, survives name
    edits) → content hash (same fields the reference's members table
    hashes)."""
    code = _first(record, "memberCode", "code", "id")
    if code:
        return code
    uri = _first(record, "uri", "memberUri")
    m = _MEMBER_CODE_URI.search(uri)
    if m:
        return m.group(1)
    full = _first(record, "fullName", "showAs", "name", "displayName")
    first = _first(record, "firstName", "forename", "givenName")
    last = _first(record, "lastName", "surname", "familyName")
    if not full:
        full = _normalize_ws_name(
            " ".join(p for p in (first, last) if p))
    if not (uri or full or first or last):
        return ""
    return stable_hash_py([uri, full, first, last])


def _results_of(payload: Any) -> list:
    """Top-level result list under the usual envelope keys."""
    if isinstance(payload, list):
        return payload
    if isinstance(payload, Mapping):
        for k in ("results", "items", "rows", "data"):
            v = payload.get(k)
            if isinstance(v, list):
                return v
    return []


# ---------------------------------------------------------------------------
# mapInPandas stage factory
# ---------------------------------------------------------------------------

def _flatten_stage(df: DataFrame, json_col: str, columns: list[str],
                   per_payload) -> DataFrame:
    """Run `per_payload(payload_obj) -> Iterator[dict]` over a JSON column."""
    schema = ", ".join(f"`{c}` string" for c in columns)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: list[dict[str, Any]] = []
            for raw in batch[json_col]:
                if not raw:
                    continue
                try:
                    payload = json.loads(raw)
                except (TypeError, ValueError):
                    continue
                rows.extend(per_payload(payload))
            yield pd.DataFrame(
                [{c: r.get(c, "") for c in columns} for r in rows],
                columns=columns, dtype=str) if rows else pd.DataFrame(
                    {c: pd.Series(dtype=str) for c in columns})

    return df.mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# silver_members (F1 + F3)
# ---------------------------------------------------------------------------

MEMBER_COLUMNS = [
    "member_code", "member_uri", "full_name", "first_name", "last_name",
    "display_name", "gender", "member_key", "is_current_member",
    "latest_party_name", "latest_constituency_name", "latest_house_no",
    "source_endpoint", "snapshot_date", "source_hash",
]


def _normalize_ws_name(value: str) -> str:
    import unicodedata
    text = unicodedata.normalize("NFKD", value.lower()) \
        .encode("ascii", "ignore").decode("ascii")
    text = re.sub(r"[^a-z0-9]+", " ", text)
    return re.sub(r"\s+", " ", text).strip()


def silver_members(df: DataFrame, json_col: str = "payload",
                   snapshot_date: str = "", endpoint: str = "/members",
                   today: Optional[date] = None) -> DataFrame:
    """Member roster rows from raw API payload JSON (one payload per row).

    Mirrors `table_members.py:221-257`: multi-key name/code fallbacks,
    generated member_code when absent, current-else-latest membership
    context (party/constituency/house), deterministic member_key and
    source_hash.
    """

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            for record in iter_member_records(item):
                full = _first(record, "fullName", "showAs", "name",
                              "displayName")
                first = _first(record, "firstName", "forename", "givenName")
                last = _first(record, "lastName", "surname", "familyName")
                display = _first(record, "showAs", "displayName", "fullName",
                                 "name") or full
                # the ONE shared recipe (_member_code_of) — an inline
                # fallback here would disagree with the child tables'
                # generated codes and orphan their FK rows
                code = _member_code_of(record)
                uri = _first(record, "uri", "memberUri")
                gender = _first(record, "gender", "sex")
                if not full:
                    full = _normalize_ws_name(
                        " ".join(p for p in (first, last) if p))
                if not display:
                    display = full

                memberships = list(iter_memberships(record, item))
                if memberships:
                    curr = [m for m in memberships if is_current_range_py(
                        _membership_bound(m, "start"),
                        _membership_bound(m, "end"), today=today)]
                    pool = curr or memberships
                    latest = sorted(
                        pool,
                        key=lambda m: ((_membership_bound(m, "end")
                                        or "9999-12-31"),
                                       (_membership_bound(m, "start") or "")),
                        reverse=True)[0]
                    is_curr = str(bool(curr)).lower()
                    party, cons = _party_of(latest), _constituency_of(latest)
                    house = _house_no_of(latest)
                else:
                    is_curr, party, cons, house = "", "", "", ""

                yield {
                    "member_code": code,
                    "member_uri": uri,
                    "full_name": full,
                    "first_name": first,
                    "last_name": last,
                    "display_name": display,
                    "gender": gender,
                    "member_key": stable_hash_py([code, uri, full]),
                    "is_current_member": is_curr,
                    "latest_party_name": party,
                    "latest_constituency_name": cons,
                    "latest_house_no": house,
                    "source_endpoint": endpoint,
                    "snapshot_date": snapshot_date,
                    "source_hash": record_hash_py(record),
                }

    out = _flatten_stage(df, json_col, MEMBER_COLUMNS, rows_of)
    return dedupe_total_order(out, ["member_code"])


# ---------------------------------------------------------------------------
# silver_member_memberships (F2)
# ---------------------------------------------------------------------------

MEMBERSHIP_COLUMNS = [
    "membership_id", "member_code", "member_uri", "house_uri", "house_no",
    "house_code", "chamber", "membership_start", "membership_end",
    "is_current", "source_hash", "snapshot_date",
]


def _membership_identity(m: Mapping[str, Any], code: str, uri: str) -> str:
    """THE membership id: URI when present, else a generated hash that
    ignores the end date (so an interval whose end moved updates the same
    row). Shared by silver_member_memberships and the three membership
    sub-dimension tables, whose membership_id column is an FK to it —
    divergent recipes would orphan every generated-id sub-row."""
    mem_uri = _first(m, "uri", "membershipUri")
    if mem_uri:
        return mem_uri
    house = _first_map(m, "house", "houseRecord")
    start = _membership_bound(m, "start") or ""
    h_uri = _first(house, "uri", "houseUri")
    h_no = _house_no_of(m)
    h_code = _first(house, "houseCode", "chamberCode") \
        or _first(m, "houseCode", "chamber")
    return "generated:membership:" + \
        stable_hash_py([code, uri, h_uri, h_no, h_code, start])


def silver_member_memberships(df: DataFrame, json_col: str = "payload",
                              snapshot_date: str = "",
                              today: Optional[date] = None) -> DataFrame:
    """One row per (member, membership interval) — SCD-2-style bridge.

    Mirrors `table_member_memberships.py:186-213`: membership_id is the
    membership URI else a generated hash that ignores the end date, so
    re-fetching an interval whose end moved updates the SAME row (tested in
    the reference's write-semantics suite).
    """

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            for record in iter_member_records(item):
                code = _member_code_of(record)
                uri = _first(record, "uri", "memberUri")
                for m in iter_memberships(record, item):
                    house = _first_map(m, "house", "houseRecord")
                    start = _membership_bound(m, "start") or ""
                    end = _membership_bound(m, "end") or ""
                    h_uri = _first(house, "uri", "houseUri")
                    h_no = _house_no_of(m)
                    h_code = _first(house, "houseCode", "chamberCode") \
                        or _first(m, "houseCode", "chamber")
                    chamber = h_code or _first(house, "chamber", "chamberType")
                    mem_id = _membership_identity(m, code, uri)
                    yield {
                        "membership_id": mem_id,
                        "member_code": code,
                        "member_uri": uri,
                        "house_uri": h_uri,
                        "house_no": h_no,
                        "house_code": h_code,
                        "chamber": chamber,
                        "membership_start": start,
                        "membership_end": end,
                        "is_current": str(is_current_range_py(
                            start, end, today=today)).lower(),
                        "source_hash": record_hash_py(m),
                        "snapshot_date": snapshot_date,
                    }

    out = _flatten_stage(df, json_col, MEMBERSHIP_COLUMNS, rows_of)
    return dedupe_total_order(out, ["membership_id"])


# ---------------------------------------------------------------------------
# membership sub-dimensions: parties / constituencies / offices (F2 + F3)
# ---------------------------------------------------------------------------

def _record_bound(r: Mapping[str, Any], which: str) -> str:
    """Interval bound of a nested party/represent/office record
    (`table_member_parties.py:240-247`): dateRange else flat keys."""
    rng = _first_map(r, "dateRange", "date_range", "memberDateRange")
    v = _txt(rng.get(which)) if rng else ""
    if not v:
        v = _first(r, {"start": "startDate", "end": "endDate"}[which],
                   {"start": "dateStart", "end": "dateEnd"}[which])
    return parse_iso_date_py(v) or "" if v else ""


def _office_name_of(office: Mapping[str, Any]) -> str:
    """Office display name with the reference's nested-name fallback walk
    (`table_member_offices.py:174-212`): direct keys, then officeName /
    names / name entries carrying showAs/nameEn/nameGa/name/title."""
    direct = _first(office, "showAs", "officeName", "name", "title",
                    "role", "position")
    if direct:
        return direct
    for key in ("officeName", "names", "name"):
        value = office.get(key)
        entries = value if isinstance(value, list) else [value]
        for entry in entries:
            if isinstance(entry, Mapping):
                text = _first(entry, "showAs", "nameEn", "nameGa",
                              "name", "title")
                if text:
                    return text
    return ""


#: (table-name suffix, membership keys, entry wrappers, uri keys,
#:  name resolver, fall back missing bounds to the membership's,
#:  generated-uri hash parts) — one spec per sub-dimension table.
_SUBDIM_SPECS: dict[str, dict[str, Any]] = {
    "party": {
        "keys": ("parties", "party"),
        "wrappers": ("party", "partyDetails"),
        "uri_keys": ("uri", "partyUri"),
        "name_of": lambda r: _first(r, "showAs", "partyName", "name"),
        "bounds_from_membership": False,
        "uri_hash_parts": lambda name, mem_id: [name],
        "columns": ["member_party_id", "membership_id", "member_code",
                    "party_uri", "party_name", "party_start", "party_end",
                    "is_current", "snapshot_date"],
    },
    "constituency": {
        # reference reads represents/represent; real payloads also carry a
        # direct constituency/constituencyOrPanel map (cf. _constituency_of)
        "keys": ("represents", "represent", "constituency",
                 "constituencyOrPanel"),
        "wrappers": ("represent", "constituencyOrPanel", "constituency"),
        "uri_keys": ("uri", "constituencyUri"),
        "name_of": lambda r: _first(r, "showAs", "name", "constituencyName",
                                    "representName"),
        "bounds_from_membership": True,
        "uri_hash_parts": lambda name, mem_id: [name, mem_id],
        "columns": ["member_constituency_id", "membership_id", "member_code",
                    "constituency_uri", "constituency_name",
                    "represent_start", "represent_end", "is_current",
                    "snapshot_date"],
    },
    "office": {
        "keys": ("offices", "office"),
        "wrappers": ("office", "officeDetails"),
        "uri_keys": ("uri", "officeUri"),
        "name_of": _office_name_of,
        "bounds_from_membership": False,
        "uri_hash_parts": lambda name, mem_id: [name],
        "columns": ["member_office_id", "membership_id", "member_code",
                    "office_uri", "office_name", "office_start",
                    "office_end", "is_current", "snapshot_date"],
    },
}


def _membership_subdimension(df: DataFrame, kind: str, json_col: str,
                             snapshot_date: str,
                             today: Optional[date]) -> DataFrame:
    """One row per (membership, nested interval entry) for parties /
    constituencies / offices — the F2 second-level explosion plus the
    reference's id recipes (`table_member_parties.py:186-225`,
    `table_member_constituencies.py:206-261`,
    `table_member_offices.py:156-195`).

    The reference collapses exact business-key duplicates keeping the
    first row (history_dedupe.py:16-60); Spark has no input order, so the
    translation is a DETERMINISTIC keep-first ordered by the compared
    fields — same kept set whenever duplicates agree, stable pick when
    they conflict."""
    spec = _SUBDIM_SPECS[kind]
    id_col = spec["columns"][0]
    uri_col, name_col = spec["columns"][3], spec["columns"][4]
    start_col, end_col = spec["columns"][5], spec["columns"][6]

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            for record in iter_member_records(item):
                code = _member_code_of(record)
                uri = _first(record, "uri", "memberUri")
                for m in iter_memberships(record, item):
                    mem_id = _membership_identity(m, code, uri)
                    value = None
                    for k in spec["keys"]:
                        value = m.get(k)
                        if value:
                            break
                    entries = value if isinstance(value, list) else \
                        [value] if isinstance(value, Mapping) else []
                    for entry in entries:
                        if not isinstance(entry, Mapping):
                            continue
                        r = _unwrap(entry, spec["wrappers"])
                        name = spec["name_of"](r)
                        start = _record_bound(r, "start")
                        end = _record_bound(r, "end")
                        if spec["bounds_from_membership"]:
                            start = start or _membership_bound(m, "start") or ""
                            end = end or _membership_bound(m, "end") or ""
                        sub_uri = _first(r, *spec["uri_keys"]) or \
                            f"generated:{kind}:" + stable_hash_py(
                                spec["uri_hash_parts"](name, mem_id))
                        yield {
                            id_col: f"generated:member_{kind}:" +
                            stable_hash_py([mem_id, code, sub_uri, start]),
                            "membership_id": mem_id,
                            "member_code": code,
                            uri_col: sub_uri,
                            name_col: name,
                            start_col: start,
                            end_col: end,
                            "is_current": str(is_current_range_py(
                                start, end, today=today)).lower(),
                            "snapshot_date": snapshot_date,
                        }

    out = _flatten_stage(df, json_col, spec["columns"], rows_of)
    from pyspark.sql import functions as F

    from ..operators.dedupe import dedupe_keep_first
    deduped = dedupe_keep_first(
        out, ["member_code", uri_col, start_col, end_col],
        order_by=[name_col, "is_current", id_col])
    # The generated row id ignores the END date (like the membership id:
    # an interval whose end moved must update the same row), so entries
    # differing only in end share a PK and survive the business-key
    # dedupe above — collapse them keeping the current/open row, then
    # latest end, deterministically.
    return dedupe_keep_first(
        deduped, [id_col],
        order_by=[F.col("is_current").desc(),
                  F.col(end_col).desc_nulls_last(), F.col(name_col)])


def silver_member_parties(df: DataFrame, json_col: str = "payload",
                          snapshot_date: str = "",
                          today: Optional[date] = None) -> DataFrame:
    """Member ↔ party intervals (`table_member_parties.py`)."""
    return _membership_subdimension(df, "party", json_col, snapshot_date,
                                    today)


def silver_member_constituencies(df: DataFrame, json_col: str = "payload",
                                 snapshot_date: str = "",
                                 today: Optional[date] = None) -> DataFrame:
    """Member ↔ constituency/panel intervals
    (`table_member_constituencies.py`); bounds fall back to the membership
    interval when the represent entry carries none."""
    return _membership_subdimension(df, "constituency", json_col,
                                    snapshot_date, today)


def silver_member_offices(df: DataFrame, json_col: str = "payload",
                          snapshot_date: str = "",
                          today: Optional[date] = None) -> DataFrame:
    """Member ↔ office intervals (`table_member_offices.py`), including the
    nested office-name fallback walk."""
    return _membership_subdimension(df, "office", json_col, snapshot_date,
                                    today)


# ---------------------------------------------------------------------------
# silver_member_votes + silver_division_tallies (F4 double explosion)
# ---------------------------------------------------------------------------

VOTE_CATEGORIES = {"taVotes": ("ta", "yes"), "nilVotes": ("nil", "no"),
                   "staonVotes": ("staon", "abstain")}

MEMBER_VOTE_COLUMNS = [
    "member_vote_id", "division_id", "vote_id", "division_date",
    "member_code", "member_name", "vote_code", "vote_label",
    "party_name_at_vote", "constituency_name_at_vote", "snapshot_date",
]

TALLY_COLUMNS = [
    "division_tally_id", "division_id", "vote_code", "vote_label", "show_as",
    "member_count", "snapshot_date",
]


def _generic_vote_code(source_key: str) -> str:
    cleaned = re.sub(r"[^a-z0-9]+", "_", source_key.lower()).strip("_")
    return cleaned or "other"


def _division_id_of(record: Mapping[str, Any]) -> str:
    """THE division_id recipe, shared by silver_divisions,
    silver_member_votes and silver_division_tallies — all three hash the
    SAME ``_division_record(item)`` dict, so a URI-less division gets one
    id across the header, vote and tally tables (the generated fallback is
    the full-record hash, as the reference's `table_divisions.py:159` and
    `table_member_votes.py:264` both use; a field-subset hash here would
    orphan every child row of such a division)."""
    did = _first(record, "uri", "divisionUri", "voteUri", "voteId",
                 "divisionId", "id", "eId")
    if did:
        return did
    return "generated:division:" + record_hash_py(record, 24)


def _division_record(item: Mapping[str, Any]) -> Mapping[str, Any]:
    return _first_map(item, "division", "vote", "divisionRecord") or item


def _deep_first(value: Any, target_key: str) -> str:
    """Recursive-descent first scalar text for ``target_key`` — the
    reference's `_deep_first_text` (`table_divisions.py:241-255`)."""
    if isinstance(value, Mapping):
        v = value.get(target_key)
        if v is not None and not isinstance(v, (Mapping, list)):
            t = _txt(v)
            if t:
                return t
        for child in value.values():
            found = _deep_first(child, target_key)
            if found:
                return found
    elif isinstance(value, list):
        for child in value:
            found = _deep_first(child, target_key)
            if found:
                return found
    return ""


DIVISION_COLUMNS = [
    "division_id", "vote_id", "division_date", "chamber", "house_uri",
    "house_no", "committee_code", "subject", "outcome", "debate_id",
    "debate_section_id", "debate_show_as", "api_result_hash",
    "snapshot_date",
]


def silver_divisions(df: DataFrame, json_col: str = "payload",
                     snapshot_date: str = "") -> DataFrame:
    """One row per division/vote header (`table_divisions.py:155-206`):
    id precedence uri > voteId > generated record hash, date fallback chain
    ending at the page's contextDate, deep-descent fallbacks for house /
    debate locators, and the debate-section URI synthesized from the
    debate URI + section eId when only the eId is present."""

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        ctx_date = ""
        if isinstance(payload, Mapping):
            ctx_date = parse_iso_date_py(payload.get("contextDate")) or ""
        for item in _results_of(payload):
            if not isinstance(item, Mapping):
                continue
            record = _division_record(item)
            vote_id = _first(record, "voteId", "divisionId", "id", "eId")
            # the shared recipe (_division_id_of) — votes/tallies derive
            # the id from the same record, so the chains must be identical
            division_id = _division_id_of(record)
            item_ctx = parse_iso_date_py(item.get("contextDate")) \
                if isinstance(item, Mapping) else None
            division_date = parse_iso_date_py(record.get("date")) \
                or parse_iso_date_py(record.get("voteDate")) \
                or parse_iso_date_py(record.get("divisionDate")) \
                or item_ctx or ctx_date or ""

            house = _first_map(record, "house")
            chamber_rec = _first_map(record, "chamber")
            house_uri = _first(house, "uri") or _first(chamber_rec, "uri") \
                or _deep_first(record, "houseUri")
            house_no = _first(house, "houseNo", "number") \
                or _deep_first(record, "houseNo")
            chamber = _first(house, "houseCode", "chamberCode", "showAs") \
                or _first(chamber_rec, "houseCode", "chamberCode", "showAs") \
                or _deep_first(record, "chamberCode")

            debate = _first_map(record, "debate", "debateRecord")
            debate_uri = _first(debate, "uri", "debateUri") \
                or _deep_first(record, "debateUri")
            section = _first_map(record, "debateSection")
            section_uri = _first(section, "uri", "sectionUri") \
                or _deep_first(record, "debateSectionUri")
            section_eid = _first(debate, "debateSection") \
                or _first(section, "debateSectionId", "sectionId", "eId") \
                or _deep_first(record, "debateSectionId")
            if not section_uri and section_eid and debate_uri:
                section_uri = debate_uri.rsplit("/", 1)[0] + "/" + section_eid
            debate_show_as = _first(section, "showAs", "heading", "title") \
                or _first(debate, "showAs", "title") \
                or _deep_first(record, "debateShowAs")

            subject_rec = _first_map(record, "subject")
            subject = _first(subject_rec, "showAs", "title", "text", "name") \
                or _first(record, "subject", "showAs", "title", "motion",
                          "question") \
                or _deep_first(record, "subjectText")
            outcome = _first(record, "outcome", "result", "decision",
                             "voteResult") \
                or _deep_first(record, "outcome") \
                or _deep_first(record, "result")
            committee = _first(house, "committeeCode") \
                or _first(record, "committeeCode") \
                or _deep_first(record, "committeeId")

            yield {
                "division_id": division_id,
                "vote_id": vote_id,
                "division_date": division_date,
                "chamber": chamber,
                "house_uri": house_uri,
                "house_no": house_no,
                "committee_code": committee,
                "subject": subject,
                "outcome": outcome,
                "debate_id": debate_uri,
                "debate_section_id": section_uri,
                "debate_show_as": debate_show_as,
                "api_result_hash": record_hash_py(item),
                "snapshot_date": snapshot_date,
            }

    out = _flatten_stage(df, json_col, DIVISION_COLUMNS, rows_of)
    return dedupe_total_order(out, ["division_id"])


def silver_member_votes(df: DataFrame, json_col: str = "payload",
                        snapshot_date: str = "") -> DataFrame:
    """Division → tally category (ta/nil/staon) → member vote rows.

    Mirrors `table_member_votes.py:80-160`: one output row per member per
    tally category, vote attributes (party/constituency at vote time) read
    from the nested member record, deterministic member_vote_id.
    """

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            record = _division_record(item)
            division_id = _division_id_of(record)
            vote_id = _first(record, "voteId", "divisionId")
            division_date = (
                parse_iso_date_py(record.get("date"))
                or parse_iso_date_py(record.get("voteDate"))
                or parse_iso_date_py(record.get("divisionDate"))
                or parse_iso_date_py(
                    item.get("contextDate") if isinstance(item, Mapping)
                    else None) or "")
            tallies = record.get("tallies")
            if not isinstance(tallies, Mapping):
                continue
            for source_key, tally in tallies.items():
                if not isinstance(tally, Mapping):
                    continue
                vote_code, vote_label = VOTE_CATEGORIES.get(
                    str(source_key),
                    (_generic_vote_code(str(source_key)),
                     _generic_vote_code(str(source_key)).replace("_", " ")))
                members = tally.get("members")
                for member_item in (members if isinstance(members, list)
                                    else []):
                    if not isinstance(member_item, Mapping):
                        continue
                    member = member_item.get("member")
                    if not isinstance(member, Mapping):
                        member = member_item
                    code = _member_code_of(member)
                    yield {
                        "member_vote_id": "member_vote:" + stable_hash_py(
                            [division_id, code, vote_code], length=24),
                        "division_id": division_id,
                        "vote_id": vote_id,
                        "division_date": division_date,
                        "member_code": code,
                        "member_name": _first(member, "showAs", "fullName",
                                              "displayName", "name"),
                        "vote_code": vote_code,
                        "vote_label": vote_label,
                        "party_name_at_vote": _first(
                            _first_map(member, "party"), "showAs", "name")
                            or _first(member, "partyName", "partyCode"),
                        "constituency_name_at_vote": _first(
                            _first_map(member, "constituency"),
                            "showAs", "name")
                            or _first(member, "constituencyName",
                                      "representName"),
                        "snapshot_date": snapshot_date,
                    }

    out = _flatten_stage(df, json_col, MEMBER_VOTE_COLUMNS, rows_of)
    return dedupe_total_order(out, ["member_vote_id"])


def silver_division_tallies(df: DataFrame, json_col: str = "payload",
                            snapshot_date: str = "") -> DataFrame:
    """One row per (division, vote category) with declared-vs-observed count.

    Mirrors `table_division_tallies.py:171-196`: member_count prefers the
    API-declared tally, falling back to the member list length.
    """

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            record = _division_record(item)
            division_id = _division_id_of(record)
            tallies = record.get("tallies")
            if not isinstance(tallies, Mapping):
                continue
            for source_key, tally in tallies.items():
                if not isinstance(tally, Mapping):
                    continue
                vote_code, vote_label = VOTE_CATEGORIES.get(
                    str(source_key),
                    (_generic_vote_code(str(source_key)),
                     _generic_vote_code(str(source_key)).replace("_", " ")))
                members = tally.get("members")
                n_members = len(members) if isinstance(members, list) else 0
                declared = tally.get("tally")
                try:
                    declared_n = int(declared)
                    if declared_n < 0:
                        declared_n = None
                except (TypeError, ValueError):
                    declared_n = None
                yield {
                    "division_tally_id": "division_tally:" + stable_hash_py(
                        [division_id, vote_code], length=24),
                    "division_id": division_id,
                    "vote_code": vote_code,
                    "vote_label": vote_label,
                    "show_as": _txt(tally.get("showAs")) or vote_label,
                    "member_count": str(declared_n if declared_n is not None
                                        else n_members),
                    "snapshot_date": snapshot_date,
                }

    out = _flatten_stage(df, json_col, TALLY_COLUMNS, rows_of)
    return dedupe_total_order(out, ["division_tally_id"])


# ---------------------------------------------------------------------------
# silver_questions (F5)
# ---------------------------------------------------------------------------

QUESTION_COLUMNS = [
    "question_id", "question_uri", "question_date", "question_no",
    "question_type", "question_text", "answer_text", "asked_by_member_code",
    "asked_by_name", "to_minister_or_department", "debate_section_id",
    "source_xml_uri", "source_xml_url", "source_pdf_uri", "source_pdf_url",
    "source_file_id_xml", "source_file_id_pdf", "snapshot_date",
    "source_hash",
]

_DATA_BASE_URL = "https://data.oireachtas.ie"


def normalize_format_url_py(uri: Any) -> str:
    """X8 parity: relative format URI → absolute data.oireachtas.ie URL."""
    text = _txt(uri)
    if not text:
        return ""
    if text.startswith(("http://", "https://")):
        return text
    if not text.startswith("/"):
        text = "/" + text
    return _DATA_BASE_URL + text


def silver_questions(df: DataFrame, json_col: str = "payload",
                     snapshot_date: str = "") -> DataFrame:
    """Parliamentary question rows (`table_questions.py:165-213`): by/to/
    debateSection struct extraction, format URL normalization, generated
    question and source-file IDs."""

    def _fmt_ids(question_id: str, fmt: str, uri: str, url: str) -> str:
        if not (uri or url):
            return ""
        return "source_file:" + stable_hash_py(
            ["question", question_id, fmt, uri, url], length=24)

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            if not isinstance(item, Mapping):
                continue
            q = item.get("question") if isinstance(item.get("question"),
                                                   Mapping) else item
            q_uri = _first(q, "uri", "questionUri")
            q_id = q_uri or _first(q, "questionId", "id") or \
                "generated:question:" + record_hash_py(q, length=24)
            section = _first_map(q, "debateSection")
            formats = _first_map(section, "formats")
            xml_uri = _first(_first_map(formats, "xml"), "uri", "url", "href")
            pdf_uri = _first(_first_map(formats, "pdf"), "uri", "url", "href")
            xml_url = normalize_format_url_py(xml_uri)
            pdf_url = normalize_format_url_py(pdf_uri)
            yield {
                "question_id": q_id,
                "question_uri": q_uri,
                "question_date": parse_iso_date_py(q.get("date"))
                or parse_iso_date_py(item.get("contextDate")) or "",
                "question_no": _first(q, "questionNumber", "questionNo",
                                      "number"),
                "question_type": _first(q, "questionType", "type"),
                "question_text": _first(q, "showAs", "questionText",
                                        "subject", "title"),
                "answer_text": _first(q, "answerText", "answer",
                                      "responseText"),
                "asked_by_member_code": _first(_first_map(q, "by"),
                                               "memberCode", "code", "id"),
                "asked_by_name": _first(_first_map(q, "by"), "showAs",
                                        "name", "fullName"),
                "to_minister_or_department": _first(
                    _first_map(q, "to"), "showAs", "roleCode", "roleType",
                    "name"),
                "debate_section_id": _first(section, "uri",
                                            "debateSectionId", "sectionId"),
                "source_xml_uri": xml_uri,
                "source_xml_url": xml_url,
                "source_pdf_uri": pdf_uri,
                "source_pdf_url": pdf_url,
                "source_file_id_xml": _fmt_ids(q_id, "xml", xml_uri, xml_url),
                "source_file_id_pdf": _fmt_ids(q_id, "pdf", pdf_uri, pdf_url),
                "snapshot_date": snapshot_date,
                "source_hash": record_hash_py(item),
            }

    out = _flatten_stage(df, json_col, QUESTION_COLUMNS, rows_of)
    return dedupe_total_order(out, ["question_id"])


# ---------------------------------------------------------------------------
# silver_source_files (F6 — recursive format/file-reference harvest)
# ---------------------------------------------------------------------------

SOURCE_FILE_COLUMNS = [
    "source_file_id", "source_entity_type", "source_entity_id",
    "format_type", "format_uri", "format_url", "s3_key", "content_type",
    "download_status", "downloaded_at_utc", "byte_size", "etag_or_hash",
    "snapshot_date",
]

_FORMAT_KEYS = ("pdf", "xml", "doc", "docx", "html", "mp3", "mp4", "json")
_CONTENT_TYPES = {"pdf": "application/pdf", "xml": "application/xml",
                  "html": "text/html", "json": "application/json",
                  "doc": "application/msword", "mp3": "audio/mpeg",
                  "mp4": "video/mp4"}


def _looks_like_format_key(key: str) -> bool:
    k = key.lower()
    return any(k == f or k.endswith("_" + f) for f in _FORMAT_KEYS)


def _format_entries(container: Any) -> Iterator[tuple[str, str, str]]:
    """(type, uri, url) triples from one formats container, both shapes:
    {"pdf": {"uri": ...}} and {"formatType": "pdf", "uri": ...}."""
    if isinstance(container, list):
        for entry in container:
            yield from _format_entries(entry)
        return
    if not isinstance(container, Mapping):
        return

    def triple(raw: Mapping[str, Any], fallback: Optional[str]):
        ftype = _first(raw, "formatType", "type", "mediaType", "name",
                       "label") or (fallback or "")
        uri = _first(raw, "uri", "formatUri")
        url = _first(raw, "url", "href", "downloadUrl", "formatUrl")
        if not url and uri.startswith("http"):
            url = uri
        if not uri and url.startswith("http"):
            uri = url
        return ftype.lower(), uri, url

    emitted = False
    format_like = any(_looks_like_format_key(str(k)) for k in container)
    for key, child in container.items():
        if isinstance(child, Mapping) and (
                _first(child, "uri", "url", "href", "downloadUrl")
                or _looks_like_format_key(str(key))):
            ftype, uri, url = triple(child, str(key))
            if uri or url:
                emitted = True
                yield ftype, uri, url
        elif isinstance(child, list) and _looks_like_format_key(str(key)):
            for entry in child:
                if isinstance(entry, Mapping):
                    ftype, uri, url = triple(entry, str(key))
                    if uri or url:
                        emitted = True
                        yield ftype, uri, url
    if emitted or format_like:
        return
    ftype, uri, url = triple(container, None)
    if uri or url:
        yield ftype, uri, url


def _walk_formats(value: Any) -> Iterator[tuple[str, str, str]]:
    """Recursive walk for `formats`/`format` containers anywhere (F6)."""
    if isinstance(value, Mapping):
        for key, child in value.items():
            if str(key).lower() in ("formats", "format"):
                yield from _format_entries(child)
            else:
                yield from _walk_formats(child)
    elif isinstance(value, list):
        for entry in value:
            yield from _walk_formats(entry)


def _entity_id_of(item: Any, entity_type: str, index: int) -> str:
    """First uri/id found anywhere in the item, else a generated id."""
    def mappings(v):
        if isinstance(v, Mapping):
            yield v
            for c in v.values():
                yield from mappings(c)
        elif isinstance(v, list):
            for c in v:
                yield from mappings(c)

    keys = ("uri", f"{entity_type}Uri", "debateUri", "questionUri",
            "billUri", "id", f"{entity_type}Id")
    for m in mappings(item):
        v = _first(m, *keys)
        if v:
            return v
    return f"generated:{entity_type}:{index}:{record_hash_py(item)}"


def silver_source_files(df: DataFrame, json_col: str = "payload",
                        entity_type: str = "debate",
                        snapshot_date: str = "") -> DataFrame:
    """File inventory harvested from `formats` containers anywhere in the
    payload (`table_source_files.py:231-327`): recursive walk, two container
    shapes, extension-inferred format types, deterministic source_file_id,
    and a slugged target key for the downloader."""

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for index, item in enumerate(_results_of(payload)):
            entity_id = _entity_id_of(item, entity_type, index)
            for ftype, uri, url in _walk_formats(item):
                ref = url or uri
                if not ftype or ftype not in _CONTENT_TYPES:
                    ext = re.search(r"\.([a-z0-9]{2,5})(?:$|\?)", ref.lower())
                    ftype = ext.group(1) if ext and ext.group(1) in \
                        _CONTENT_TYPES else (ftype or "unknown")
                sfid = "source_file:" + stable_hash_py(
                    [entity_type, entity_id, ftype, uri, url], length=24)
                slug = re.sub(r"[^a-z0-9]+", "-",
                              entity_id.lower()).strip("-")[:80]
                yield {
                    "source_file_id": sfid,
                    "source_entity_type": entity_type,
                    "source_entity_id": entity_id,
                    "format_type": ftype,
                    "format_uri": uri,
                    "format_url": url,
                    "s3_key": f"source_files/{entity_type}/{slug}/"
                              f"{sfid.split(':', 1)[1]}.{ftype}",
                    "content_type": _CONTENT_TYPES.get(ftype,
                                                       "application/octet-stream"),
                    "download_status": "not_downloaded",
                    "downloaded_at_utc": "",
                    "byte_size": "",
                    "etag_or_hash": "",
                    "snapshot_date": snapshot_date,
                }

    out = _flatten_stage(df, json_col, SOURCE_FILE_COLUMNS, rows_of)
    return dedupe_total_order(out, ["source_file_id"])


# ---------------------------------------------------------------------------
# Simple dimension flatteners: houses / parties / constituencies
# ---------------------------------------------------------------------------

HOUSE_COLUMNS = ["house_uri", "house_no", "house_code", "chamber", "show_as",
                 "date_start", "date_end", "is_current", "source_endpoint",
                 "snapshot_date", "source_hash"]
PARTY_COLUMNS = ["party_uri", "party_code", "party_name", "show_as",
                 "date_start", "date_end", "is_current", "source_endpoint",
                 "snapshot_date", "source_hash"]
CONSTITUENCY_COLUMNS = ["constituency_uri", "constituency_code",
                        "constituency_name", "show_as", "house_uri",
                        "house_no", "chamber", "date_start", "date_end",
                        "is_current", "source_endpoint", "snapshot_date",
                        "source_hash"]


def _iter_wrapped(item: Any, wrappers: tuple[str, ...],
                  list_keys: tuple[str, ...]) -> Iterator[Mapping[str, Any]]:
    """Generic wrapped-record discovery with recursive fallback (the F1
    walk shape shared by the house/party/constituency endpoints)."""
    if not isinstance(item, Mapping):
        return
    found = False
    for k in wrappers:
        v = item.get(k)
        if isinstance(v, Mapping):
            found = True
            yield v
    for k in list_keys:
        v = item.get(k)
        if isinstance(v, list):
            for entry in v:
                if isinstance(entry, Mapping):
                    found = True
                    yield _unwrap(entry, wrappers)
    if found:
        return
    for child in item.values():
        if isinstance(child, Mapping):
            yield from _iter_wrapped(child, wrappers, list_keys)


def _interval_of(record: Mapping[str, Any]) -> tuple[str, str]:
    rng = _first_map(record, "dateRange", "date_range")
    start = parse_iso_date_py(
        (rng.get("start") if rng else None) or record.get("dateStart")
        or record.get("startDate")) or ""
    end = parse_iso_date_py(
        (rng.get("end") if rng else None) or record.get("dateEnd")
        or record.get("endDate")) or ""
    return start, end


def silver_houses(df: DataFrame, json_col: str = "payload",
                  snapshot_date: str = "", endpoint: str = "/houses",
                  today: Optional[date] = None) -> DataFrame:
    """House dimension (`table_houses.py:130-150`)."""

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            for h in _iter_wrapped(item, ("house", "houseRecord"),
                                   ("houses",)):
                start, end = _interval_of(h)
                code = _first(h, "houseCode", "chamberCode")
                uri = _first(h, "uri") or "generated:house:" + stable_hash_py(
                    [code, _first(h, "houseNo"), _first(h, "showAs")])
                yield {
                    "house_uri": uri,
                    "house_no": _first(h, "houseNo"),
                    "house_code": code,
                    "chamber": code or _first(h, "chamberCode",
                                              "chamberType", "houseType"),
                    "show_as": _first(h, "showAs"),
                    "date_start": start, "date_end": end,
                    "is_current": str(is_current_range_py(
                        start, end, today=today)).lower(),
                    "source_endpoint": endpoint,
                    "snapshot_date": snapshot_date,
                    "source_hash": record_hash_py(item),
                }

    return _flatten_stage(df, json_col, HOUSE_COLUMNS,
                          rows_of).transform(lambda d: dedupe_total_order(d, ["house_uri"]))


def silver_parties(df: DataFrame, json_col: str = "payload",
                   snapshot_date: str = "", endpoint: str = "/parties",
                   today: Optional[date] = None) -> DataFrame:
    """Party dimension (`table_parties.py:196-218`)."""

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            for p in _iter_wrapped(
                    item, ("party", "partyDetails", "organisation",
                           "organization"), ("parties", "partyList")):
                start, end = _interval_of(p)
                show_as = _first(p, "showAs", "show_as", "name", "partyName",
                                 "label")
                name = _first(p, "partyName", "name", "showAs", "show_as",
                              "label")
                code = _first(p, "partyCode", "code", "id", "representCode")
                uri = _first(p, "uri", "partyUri") or \
                    "generated:party:" + stable_hash_py(
                        [code, name, show_as, start, end])
                yield {
                    "party_uri": uri, "party_code": code,
                    "party_name": name or _normalize_ws_name(show_as),
                    "show_as": show_as or name,
                    "date_start": start, "date_end": end,
                    "is_current": str(is_current_range_py(
                        start, end, today=today)).lower(),
                    "source_endpoint": endpoint,
                    "snapshot_date": snapshot_date,
                    "source_hash": record_hash_py(p),
                }

    return _flatten_stage(df, json_col, PARTY_COLUMNS,
                          rows_of).transform(lambda d: dedupe_total_order(d, ["party_uri"]))


def silver_constituencies(df: DataFrame, json_col: str = "payload",
                          snapshot_date: str = "",
                          endpoint: str = "/constituencies",
                          today: Optional[date] = None) -> DataFrame:
    """Constituency dimension with enclosing-house context
    (`table_constituencies.py:168-210`)."""

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            house = _first_map(item, "house", "houseRecord")
            for c in _iter_wrapped(item, ("constituencyOrPanel",
                                          "constituency"),
                                   ("constituencies", "panels")):
                h = _first_map(c, "house", "houseRecord") or house
                start, end = _interval_of(c)
                show_as = _first(c, "showAs", "show_as", "name",
                                 "constituencyName")
                name = _first(c, "name", "constituencyName", "showAs",
                              "show_as")
                code = _first(c, "constituencyCode", "representCode",
                              "code", "id")
                h_uri = _first(h, "uri", "houseUri")
                h_no = _first(h, "houseNo", "house_no")
                chamber = _first(h, "houseCode", "chamberCode", "chamber",
                                 "houseType")
                uri = _first(c, "uri", "constituencyUri") or \
                    "generated:constituency:" + stable_hash_py(
                        [name, show_as, h_uri, h_no, chamber, start, end])
                yield {
                    "constituency_uri": uri, "constituency_code": code,
                    "constituency_name": name or _normalize_ws_name(show_as),
                    "show_as": show_as or name,
                    "house_uri": h_uri, "house_no": h_no, "chamber": chamber,
                    "date_start": start, "date_end": end,
                    "is_current": str(is_current_range_py(
                        start, end, today=today)).lower(),
                    "source_endpoint": endpoint,
                    "snapshot_date": snapshot_date,
                    "source_hash": record_hash_py(c),
                }

    return _flatten_stage(df, json_col, CONSTITUENCY_COLUMNS,
                          rows_of).transform(lambda d: dedupe_total_order(d, ["constituency_uri"]))


# ---------------------------------------------------------------------------
# F9 — key-path introspection (schema-discovery diagnostics)
# ---------------------------------------------------------------------------

def key_paths_py(value: Any, *, prefix: str = "", depth: int = 0,
                 max_depth: int = 6) -> set[str]:
    """F9 — recursive key-path set of a payload
    (`table_members.py:419-433`, `discovery.py:153-168`): mapping keys
    extend the dotted path; a list contributes ``prefix[]`` and is sampled
    via its FIRST element only (reference behavior); recursion stops at
    ``max_depth``."""
    if depth >= max_depth:
        return set()
    paths: set[str] = set()
    if isinstance(value, Mapping):
        for key, child in value.items():
            child_path = f"{prefix}.{key}" if prefix else str(key)
            paths.add(child_path)
            paths.update(key_paths_py(child, prefix=child_path,
                                      depth=depth + 1, max_depth=max_depth))
    elif isinstance(value, list):
        list_path = f"{prefix}[]" if prefix else "[]"
        paths.add(list_path)
        if value:
            paths.update(key_paths_py(value[0], prefix=list_path,
                                      depth=depth + 1, max_depth=max_depth))
    return paths


def payload_key_paths(df: DataFrame, json_col: str = "payload",
                      max_depth: int = 6) -> DataFrame:
    """F9 as a distributed diagnostic: distinct key paths across a JSON
    payload column with the number of payload rows exhibiting each path.

    mapInPandas walker (the payloads are ragged, same reason as the
    flatteners above) emits per-partition partial counts, then ONE groupBy
    reduces them — map-side combined, shuffle size bounded by the distinct
    path set, never by table size. Unparseable payloads contribute nothing.
    """
    from pyspark.sql import functions as F

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter
        for pdf in batches:
            counts: Counter = Counter()
            for raw in pdf[json_col]:
                payload = raw
                if isinstance(raw, (str, bytes)):
                    try:
                        payload = json.loads(raw)
                    except (TypeError, ValueError):
                        continue
                for p in key_paths_py(payload, max_depth=max_depth):
                    counts[p] += 1
            yield pd.DataFrame({
                "key_path": pd.Series(list(counts), dtype=object),
                "n_rows": pd.Series(list(counts.values()), dtype="int64"),
            })

    return (df.select(json_col)
            .mapInPandas(walk, "key_path string, n_rows long")
            .groupBy("key_path")
            .agg(F.sum("n_rows").alias("n_rows")))
