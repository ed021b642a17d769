"""Refresh orchestration inputs — SURVEY §3.2 / §2.10.

Re-expresses `process/oireachtas_refresh_inputs.py:20-135`: per-refresh-type
default table lists (encoding the silver→gold dependency order), default
overlapping incremental date windows (the reference's late-data handling —
weekly = as_of−35d, monthly = previous month with 7-day lookback overlap,
yearly = previous calendar year), mode/page-size validation, and control
tables forced to the tail of the build order.

The overlapping windows are the batch analog of a streaming watermark:
re-delivered rows are reconciled downstream by the upsert keep-last merge
(`operators.merge.merge_for_policy`), making reprocessing idempotent.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date, timedelta
from typing import Optional, Sequence

CONTROL_TAIL = (
    "control_pipeline_runs",
    "control_data_quality_results",
    "control_table_manifests",
)

_SILVER_MEMBER_TABLES = (
    "silver_members silver_member_memberships silver_member_parties "
    "silver_member_constituencies silver_member_offices"
).split()
_SILVER_DEBATE_TABLES = (
    "silver_debate_records silver_debate_sections silver_speeches "
    "silver_divisions silver_division_tallies silver_member_votes "
    "silver_questions"
).split()
_SILVER_BILL_TABLES = (
    "silver_bills silver_bill_versions silver_bill_stages "
    "silver_bill_related_docs silver_bill_sponsors silver_bill_debates "
    "silver_bill_events"
).split()
_GOLD_WEEKLY = (
    "gold_current_members gold_member_activity_yearly "
    "gold_member_activity_monthly gold_constituency_activity_yearly "
    "gold_content_fact_pool"
).split()

DEFAULT_TABLES: dict[str, list[str]] = {
    "weekly": [*_SILVER_MEMBER_TABLES, *_SILVER_DEBATE_TABLES,
               *_GOLD_WEEKLY, *CONTROL_TAIL],
    "monthly": ["silver_constituencies", "silver_parties",
                "silver_source_files", *_SILVER_BILL_TABLES,
                "gold_constituency_activity_yearly", "gold_content_fact_pool",
                *CONTROL_TAIL],
    "yearly": ["silver_houses", "silver_constituencies", "silver_parties",
               *_SILVER_MEMBER_TABLES, "silver_bills", "silver_bill_versions",
               "silver_bill_stages", "gold_current_members",
               "gold_member_activity_yearly",
               "gold_constituency_activity_yearly", "gold_content_fact_pool",
               *CONTROL_TAIL],
}
DEFAULT_MODES = {"weekly": "incremental", "monthly": "incremental",
                 "yearly": "full"}
DEFAULT_PAGE_SIZES = {"weekly": 100, "monthly": 200, "yearly": 200}
VALID_MODES = {
    "weekly": {"test", "incremental", "full"},
    "monthly": {"test", "incremental", "full"},
    "yearly": {"test", "full", "backfill"},
}
PAGE_SIZE_MAX = 200


@dataclass(frozen=True)
class RefreshInputs:
    refresh_type: str
    mode: str
    tables: tuple[str, ...]
    chamber: str
    house_no: str
    date_start: str
    date_end: str
    page_size: int
    sample_rows: int

    @property
    def table_count(self) -> int:
        return len(self.tables)


def default_window(refresh_type: str, as_of: date) -> tuple[date, date]:
    """Default overlapping incremental window per refresh type."""
    if refresh_type == "weekly":
        return as_of - timedelta(days=35), as_of
    if refresh_type == "monthly":
        month_start = as_of.replace(day=1)
        previous_end = month_start - timedelta(days=1)
        previous_start = previous_end.replace(day=1)
        return previous_start - timedelta(days=7), previous_end
    previous_year = as_of.year - 1
    return date(previous_year, 1, 1), date(previous_year, 12, 31)


def order_control_tables_last(requested: Sequence[str]) -> list[str]:
    """Control tables always build after the data tables they summarize."""
    controls = set(CONTROL_TAIL)
    ordered = [t for t in requested if t not in controls]
    ordered.extend(t for t in CONTROL_TAIL if t in requested)
    return ordered


def normalize_refresh_inputs(
    refresh_type: str,
    as_of: date,
    known_tables: Sequence[str],
    mode: str = "",
    tables: Optional[Sequence[str]] = None,
    chamber: str = "dail",
    house_no: str = "34",
    date_start: str = "",
    date_end: str = "",
    page_size: Optional[int] = None,
    sample_rows: int = 10,
) -> RefreshInputs:
    """Validate + default the orchestration inputs for one refresh run."""
    if refresh_type not in DEFAULT_TABLES:
        raise ValueError(f"unknown refresh_type {refresh_type!r}")
    mode = (mode or DEFAULT_MODES[refresh_type]).strip()
    if mode not in VALID_MODES[refresh_type]:
        raise ValueError(
            f"mode {mode!r} is invalid for {refresh_type}; expected one of "
            f"{sorted(VALID_MODES[refresh_type])}")

    chamber = chamber.strip().lower()
    if chamber not in {"dail", "seanad"}:
        raise ValueError("chamber must be dail or seanad")
    house_no = house_no.strip()
    if not house_no.isdigit() or int(house_no) <= 0:
        raise ValueError("house_no must be a positive integer")

    d_start, d_end = default_window(refresh_type, as_of)
    start = date_start or d_start.isoformat()
    end = date_end or d_end.isoformat()
    if start > end:
        raise ValueError(f"date_start {start} must not be after date_end {end}")

    size = page_size if page_size is not None else DEFAULT_PAGE_SIZES[refresh_type]
    if not 1 <= size <= PAGE_SIZE_MAX:
        raise ValueError(f"page_size must be in [1, {PAGE_SIZE_MAX}]")
    if not 1 <= sample_rows <= 100:
        raise ValueError("sample_rows must be in [1, 100]")

    requested = list(tables) if tables else list(DEFAULT_TABLES[refresh_type])
    if not requested:
        raise ValueError("at least one table is required")
    duplicates = sorted({t for t in requested if requested.count(t) > 1})
    if duplicates:
        raise ValueError(f"duplicate tables are not allowed: {duplicates}")
    unknown = sorted(set(requested) - set(known_tables))
    if unknown:
        raise ValueError(f"unknown tables: {unknown}")

    return RefreshInputs(
        refresh_type=refresh_type, mode=mode,
        tables=tuple(order_control_tables_last(requested)),
        chamber=chamber, house_no=house_no,
        date_start=start, date_end=end,
        page_size=size, sample_rows=sample_rows,
    )
