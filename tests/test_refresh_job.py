"""Refresh input normalization tests (SURVEY §3.2, §5 orchestration invariants)."""

from __future__ import annotations

from datetime import date

import pytest

from eirepolitic_data_pipeline_spark.jobs import (
    DEFAULT_TABLES,
    default_window,
    normalize_refresh_inputs,
    order_control_tables_last,
)

KNOWN = sorted({t for tables in DEFAULT_TABLES.values() for t in tables})
AS_OF = date(2026, 8, 13)


def test_default_windows():
    assert default_window("weekly", AS_OF) == (date(2026, 7, 9), AS_OF)
    # Monthly: previous calendar month with a 7-day lookback overlap.
    assert default_window("monthly", AS_OF) == (date(2026, 6, 24),
                                                date(2026, 7, 31))
    assert default_window("yearly", AS_OF) == (date(2025, 1, 1),
                                               date(2025, 12, 31))


def test_control_tables_forced_to_tail():
    ordered = order_control_tables_last(
        ["control_pipeline_runs", "silver_members", "gold_current_members",
         "control_table_manifests"])
    assert ordered == ["silver_members", "gold_current_members",
                       "control_pipeline_runs", "control_table_manifests"]


def test_defaults_and_dependency_order():
    out = normalize_refresh_inputs("weekly", AS_OF, KNOWN)
    assert out.mode == "incremental"
    assert out.date_start == "2026-07-09" and out.date_end == "2026-08-13"
    assert out.page_size == 100
    tables = list(out.tables)
    # Dependency order: silver dims before gold marts before control tail.
    assert tables.index("silver_members") < tables.index("gold_current_members")
    assert tables.index("gold_constituency_activity_yearly") < \
        tables.index("gold_content_fact_pool")
    assert tables[-3:] == ["control_pipeline_runs",
                           "control_data_quality_results",
                           "control_table_manifests"]


def test_validation_rejections():
    with pytest.raises(ValueError, match="unknown tables"):
        normalize_refresh_inputs("weekly", AS_OF, KNOWN, tables=["nope"])
    with pytest.raises(ValueError, match="duplicate"):
        normalize_refresh_inputs("weekly", AS_OF, KNOWN,
                                 tables=["silver_members", "silver_members"])
    with pytest.raises(ValueError, match="invalid for yearly"):
        normalize_refresh_inputs("yearly", AS_OF, KNOWN, mode="incremental")
    with pytest.raises(ValueError, match="chamber"):
        normalize_refresh_inputs("weekly", AS_OF, KNOWN, chamber="commons")
    with pytest.raises(ValueError, match="page_size"):
        normalize_refresh_inputs("weekly", AS_OF, KNOWN, page_size=500)
    with pytest.raises(ValueError, match="must not be after"):
        normalize_refresh_inputs("weekly", AS_OF, KNOWN,
                                 date_start="2026-09-01",
                                 date_end="2026-08-01")
