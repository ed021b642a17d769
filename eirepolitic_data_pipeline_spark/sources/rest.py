"""Paginated REST source with retry/backoff and adaptive date bisection —
SURVEY §2.1 S1-S5 (`extract/oireachtas/client.py:76-313`,
`partitioned_fetch.py:11-136`) re-expressed for Spark.

Control plane stays on the driver (page sequencing is inherently serial per
window); the DATA plane scales by date-window fan-out: pre-split windows are
distributed one-per-task and each task runs its own page loop, with Spark
unioning results natively. The transport is an injected callable so tests
(and offline runs) use fakes — mirroring the reference's fake-client tests.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from datetime import date, timedelta
from typing import Callable, Optional, Sequence

# transport: (endpoint, params) -> (status_code, payload_dict)
Transport = Callable[[str, dict], tuple[int, dict]]


class PageProgressError(RuntimeError):
    """Same page signature returned twice — pagination is not progressing
    (reference fails instead of looping, `client.py:180-203`)."""


class OffsetCeilingError(RuntimeError):
    """Server refuses offsets beyond a ceiling (reference: HTTP 422) —
    signals the caller to bisect the date window."""


@dataclass(frozen=True)
class RetryPolicy:
    retries: int = 5
    backoff_seconds: float = 2.0  # linear: attempt i sleeps i*backoff
    retryable_statuses: tuple[int, ...] = (429, 500, 502, 503, 504)
    sleep: Callable[[float], None] = time.sleep


@dataclass
class PaginatedRestSource:
    """Offset-paginated fetch-all with the reference's stop conditions:
    empty page, reported-total reached, short page, max-pages backstop;
    repeated-page → error. (`client.py:115-223`)"""

    transport: Transport
    page_size: int = 200
    max_pages: int = 1000
    retry: RetryPolicy = field(default_factory=RetryPolicy)
    results_key: str = "results"
    total_keys: Sequence[str] = ("head.counts.totalCount", "pagination.total", "total")

    # -- single GET with retry/backoff (S2) ----------------------------------
    def _get(self, endpoint: str, params: dict) -> dict:
        last_err: Optional[Exception] = None
        for attempt in range(self.retry.retries):
            # no backoff sleep after the FINAL failed attempt — there is
            # no retry left to wait for, only the exhausted-retries raise
            final = attempt == self.retry.retries - 1
            try:
                status, payload = self.transport(endpoint, params)
            except Exception as e:  # transport-level failure is retryable
                last_err = e
                if not final:
                    self.retry.sleep((attempt + 1) * self.retry.backoff_seconds)
                continue
            if status == 422:
                raise OffsetCeilingError(f"{endpoint} offset ceiling at {params}")
            if status in self.retry.retryable_statuses:
                last_err = RuntimeError(f"HTTP {status}")
                if not final:
                    self.retry.sleep((attempt + 1) * self.retry.backoff_seconds)
                continue
            if status != 200:
                raise RuntimeError(f"HTTP {status} from {endpoint}")
            if not isinstance(payload, dict):
                raise RuntimeError(f"non-object JSON from {endpoint}")
            return payload
        raise RuntimeError(f"retries exhausted for {endpoint}: {last_err}")

    # -- reported-total probe (S3) -------------------------------------------
    def _reported_total(self, payload: dict) -> Optional[int]:
        best: Optional[int] = None
        for dotted in self.total_keys:
            node = payload
            for part in dotted.split("."):
                if isinstance(node, dict) and part in node:
                    node = node[part]
                else:
                    node = None
                    break
            if isinstance(node, int):
                best = node if best is None else max(best, node)
        return best

    # -- fetch-all page loop (S1) --------------------------------------------
    def fetch_all(self, endpoint: str, params: Optional[dict] = None,
                  limit: Optional[int] = None) -> tuple[list, dict]:
        """Returns (rows, telemetry). ``limit`` caps returned rows (the
        reference's test-mode cap, P11)."""
        params = dict(params or {})
        rows: list = []
        seen_signatures: set[str] = set()
        stop_reason = "max_pages"
        reported_total: Optional[int] = None
        pages = 0
        for page_no in range(self.max_pages):
            page_params = {**params, "limit": self.page_size,
                           "skip": page_no * self.page_size}
            payload = self._get(endpoint, page_params)
            page_rows = payload.get(self.results_key) or []
            pages += 1
            if reported_total is None:
                reported_total = self._reported_total(payload)
            if not page_rows:
                stop_reason = "empty_page"
                break
            sig = _page_signature(page_rows)
            if sig in seen_signatures:
                raise PageProgressError(
                    f"page {page_no} repeated a previous page signature")
            seen_signatures.add(sig)
            rows.extend(page_rows)
            if limit is not None and len(rows) >= limit:
                rows = rows[:limit]
                stop_reason = "limit"
                break
            if reported_total is not None and len(rows) >= reported_total:
                stop_reason = "reported_total"
                break
            if len(page_rows) < self.page_size:
                stop_reason = "short_page"
                break
        telemetry = {"pages": pages, "rows": len(rows),
                     "reported_total": reported_total, "stop_reason": stop_reason}
        return rows, telemetry


def _page_signature(page_rows: list) -> str:
    """Digest of the WHOLE page: a prefix-only signature (first rows,
    truncated) flagged legitimately different pages that shared their
    leading rows (sort-tie boundaries, offset drift) as repeats and
    aborted the fetch. Hashing every row costs microseconds next to the
    network round-trip."""
    import hashlib
    payload = json.dumps(page_rows, sort_keys=True, default=str)
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------------
# Adaptive date bisection (S4)
# ---------------------------------------------------------------------------

def fetch_date_partitioned(source: PaginatedRestSource, endpoint: str,
                           date_start: date, date_end: date,
                           params: Optional[dict] = None,
                           _depth: int = 0, _max_depth: int = 16) -> tuple[list, list]:
    """On an offset ceiling, recursively bisect [date_start, date_end] into
    non-overlapping halves (mid / mid+1, reference
    `partitioned_fetch.py:40-61`) and merge the partition results.

    Returns (rows, partitions_telemetry)."""
    params = dict(params or {})
    window_params = {**params, "date_start": date_start.isoformat(),
                     "date_end": date_end.isoformat()}
    try:
        rows, tele = source.fetch_all(endpoint, window_params)
        return rows, [{**tele, "date_start": date_start.isoformat(),
                       "date_end": date_end.isoformat()}]
    except OffsetCeilingError:
        if date_start >= date_end or _depth >= _max_depth:
            raise
        mid = date_start + (date_end - date_start) // 2
        left_rows, left_t = fetch_date_partitioned(
            source, endpoint, date_start, mid, params, _depth + 1, _max_depth)
        right_rows, right_t = fetch_date_partitioned(
            source, endpoint, mid + timedelta(days=1), date_end, params,
            _depth + 1, _max_depth)
        return left_rows + right_rows, left_t + right_t


def bisect_date_windows(date_start: date, date_end: date,
                        max_days: int) -> list[tuple[date, date]]:
    """Pre-split a range into ≤max_days non-overlapping windows — the scale
    path: one Spark task per window, union handled natively."""
    if max_days <= 0:
        raise ValueError("max_days must be positive")
    out = []
    cur = date_start
    while cur <= date_end:
        end = min(cur + timedelta(days=max_days - 1), date_end)
        out.append((cur, end))
        cur = end + timedelta(days=1)
    return out


def fetch_distributed(spark, source_factory: Callable[[], PaginatedRestSource],
                      endpoint: str, windows: Sequence[tuple[date, date]],
                      params: Optional[dict] = None):
    """Distributed fetch: one task per date window, each running the serial
    page loop; rows come back as JSON strings for schema-on-read with
    from_json. ``source_factory`` must be picklable (build the transport
    inside it)."""
    import pandas as pd

    if not windows:
        # repartition(0) is rejected with an error naming the wrong thing;
        # an empty window list simply has nothing to fetch
        return spark.createDataFrame([], "raw string")
    win_df = spark.createDataFrame(
        [(a.isoformat(), b.isoformat()) for a, b in windows],
        "date_start string, date_end string",
    ).repartition(len(windows))

    base_params = dict(params or {})

    def fetch(batches):
        src = source_factory()
        for pdf in batches:
            out = []
            for a, b in zip(pdf.date_start, pdf.date_end):
                rows, _ = src.fetch_all(
                    endpoint, {**base_params, "date_start": a, "date_end": b})
                out.extend(json.dumps(r, sort_keys=True, default=str) for r in rows)
            yield pd.DataFrame({"raw": out})

    return win_df.mapInPandas(fetch, schema="raw string")


def fetch_with_fallback(source: "PaginatedRestSource", endpoints: Sequence[str],
                        params: Optional[dict] = None,
                        limit: Optional[int] = None) -> tuple[list, dict]:
    """S5 — endpoint fallback (`table_divisions.py:147-152`): try each
    endpoint in order, return the first success; re-raise the last failure
    if every endpoint fails. Telemetry records which endpoint answered.

    Only TRANSPORT failures fall through to the next endpoint.
    OffsetCeilingError and PageProgressError are pagination-protocol
    SIGNALS from an endpoint that is answering fine — the caller must
    bisect the window (fetch_date_partitioned), not switch endpoints:
    swallowing the ceiling here would return a different endpoint's
    (partial) data with healthy-looking telemetry and silently truncate
    the dataset to whatever fits under one endpoint's offset ceiling."""
    last_exc: Optional[Exception] = None
    for ep in endpoints:
        try:
            rows, tele = source.fetch_all(ep, params, limit=limit)
            return rows, {**tele, "endpoint": ep}
        except (OffsetCeilingError, PageProgressError):
            raise
        except Exception as exc:  # noqa: BLE001 — transport failures fall through
            last_exc = exc
    raise last_exc if last_exc else ValueError("no endpoints supplied")


def endpoint_discovery(source: "PaginatedRestSource",
                       endpoint_specs: Sequence[dict],
                       limit: int = 5,
                       max_depth: int = 4) -> tuple[list[dict], dict]:
    """One-page endpoint discovery (`discovery.py:64-128`): probe each
    declared endpoint with a single small page (never paginate), summarize
    payload shape — result count, top-level keys, first-item wrapper keys,
    and a stable 16-hex schema hash of the item's nested key paths (F9
    introspection, shared with tables/silver.py) — and report ok/error per
    endpoint plus an aggregate manifest.

    Probe failures are DATA here, not exceptions: discovery's job is to
    report which endpoints answer, so transport errors land in the row's
    ``error`` column (`status_code`/``result_count`` zeroed) and only the
    all-endpoints-dead case flips the manifest status. Specs are
    ``{"name", "endpoint", "params"}`` dicts, mirroring the reference's
    DISCOVERY_ENDPOINTS table.
    """
    from ..tables.silver import key_paths_py, stable_hash_py

    rows: list[dict] = []
    payload_shapes: dict[str, dict] = {}
    for spec in endpoint_specs:
        params = dict(spec.get("params") or {})
        params["limit"] = min(int(params.get("limit", limit)), limit)
        ok, status_code, error, payload = True, 200, None, {}
        try:
            payload = source._get(spec["endpoint"], params)
        except Exception as exc:  # noqa: BLE001 — probe failure is data
            ok, status_code, error, payload = False, 0, str(exc)[:300], {}
        results = payload.get(source.results_key) \
            if isinstance(payload, dict) else None
        results_list = results if isinstance(results, list) else []
        first = results_list[0] if results_list \
            and isinstance(results_list[0], dict) else {}
        item_key_paths = sorted(key_paths_py(first, max_depth=max_depth)) \
            if first else []
        top_keys = sorted(payload.keys()) if isinstance(payload, dict) else []
        wrapper_keys = sorted(first.keys())
        row = {
            "endpoint_name": spec["name"],
            "endpoint": spec["endpoint"],
            "ok": ok,
            "status_code": status_code,
            "result_count": len(results_list),
            "top_keys": ",".join(top_keys),
            "result_wrapper_keys": ",".join(wrapper_keys),
            "schema_hash": stable_hash_py(item_key_paths, length=16)
            if item_key_paths else None,
            "error": error,
        }
        rows.append(row)
        payload_shapes[spec["name"]] = {
            "endpoint": spec["endpoint"], "params": params, "ok": ok,
            "status_code": status_code, "result_count": len(results_list),
            "top_keys": top_keys, "result_wrapper_keys": wrapper_keys,
            "item_key_paths": item_key_paths, "error": error,
        }
    manifest = {
        "table": "_discovery",
        "mode": "discover",
        "status": "success" if any(r["ok"] for r in rows) else "failed",
        "endpoint_count": len(rows),
        "ok_count": sum(1 for r in rows if r["ok"]),
        "failed_count": sum(1 for r in rows if not r["ok"]),
        "payload_shapes": payload_shapes,
    }
    return rows, manifest
