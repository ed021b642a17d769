"""Renderer data packs: the inline-spec JSON the reference's Instagram
media generators consume, emitted from the engine's metric tables.

The reference renders ranking-table / bar-chart PNGs from a spec dict
(`process/instagram_generate_media.py:22-60` merges base_spec + inline
rows; `instagram/media_generators/ranking_table/generator.py:59-85`
normalises rows of ``{name, sublabel, value[, rank]}``;
`horizontal_bar_chart/generator.py:32-50`: rows of ``{label, value}``).
Image rendering itself is out of scope for an analytics engine — these
builders close the data side of that consumer: given a metrics frame
(e.g. ``consumers.member_profile_metrics``), they produce the exact spec
dict the generators' ``render(spec, output_dir)`` accepts, so a renderer
host can consume the engine's output without reshaping.

Scale: each pack is a TOP-N projection — the orderBy/limit runs
distributed and only ``row_limit`` rows (default 10) are ever collected,
so the driver-side JSON stays O(row_limit) no matter how large the
metrics table is.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _top_rows(metrics: DataFrame, value_col: str, row_limit: int,
              ascending: bool, tiebreak_col: str) -> list:
    """Distributed top-N: only row_limit rows reach the driver. The
    tiebreak column makes equal-value packs rerun-stable — a media post
    regenerated from identical data must not reshuffle its rows."""
    order = F.col(value_col).asc() if ascending else F.col(value_col).desc()
    return metrics.orderBy(order, F.col(tiebreak_col).asc()) \
        .limit(row_limit).collect()


def ranking_table_spec(metrics: DataFrame, value_col: str, *,
                       title: str, slug: str,
                       name_col: str = "full_name",
                       sublabel_col: Optional[str] = "party",
                       row_limit: int = 10, sort: str = "descending",
                       value_format: str = "integer",
                       palette: str = "eirepolitic_dark",
                       subtitle: str = "") -> dict:
    """Spec dict for the reference's ranking-table generator: top
    ``row_limit`` rows of ``metrics`` by ``value_col``, rows shaped
    ``{rank, name, sublabel, value}`` exactly as
    ``ranking_table/generator.py:normalise_rows`` expects (it re-sorts and
    re-ranks under the spec's ``sort``, so pre-sorting here only bounds
    what is collected)."""
    rows = _top_rows(metrics, value_col, row_limit,
                     sort == "ascending", name_col)
    pack = [{"rank": i + 1,
             "name": str(r[name_col] or ""),
             "sublabel": str(r[sublabel_col] or "") if sublabel_col else "",
             "value": float(r[value_col] or 0)}
            for i, r in enumerate(rows)]
    return {
        "generator": "ranking_table",
        "input": {"mode": "inline", "rows": pack},
        "params": {"title": title, "subtitle": subtitle,
                   "row_limit": row_limit, "sort": sort,
                   "value_format": value_format, "palette": palette},
        "output": {"slug": slug},
    }


def bar_chart_spec(metrics: DataFrame, value_col: str, *,
                   title: str, slug: str, label_col: str = "full_name",
                   max_items: int = 10, sort: str = "descending",
                   palette: str = "eirepolitic_dark",
                   subtitle: str = "") -> dict:
    """Spec dict for the reference's horizontal-bar-chart generator: rows
    shaped ``{label, value}`` (`horizontal_bar_chart/generator.py:32-50`)."""
    rows = _top_rows(metrics, value_col, max_items,
                     sort == "ascending", label_col)
    pack = [{"label": str(r[label_col] or ""),
             "value": float(r[value_col] or 0)} for r in rows]
    return {
        "generator": "horizontal_bar_chart",
        "input": {"mode": "inline", "rows": pack},
        "params": {"title": title, "subtitle": subtitle,
                   "max_items": max_items, "sort": sort, "palette": palette},
        "output": {"slug": slug},
    }


def write_spec(spec: dict, path: str) -> str:
    """Write one spec as JSON (the generators' runner loads YAML, and JSON
    is a YAML subset — one artifact serves both loaders)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(spec, f, ensure_ascii=False, indent=2, sort_keys=True)
    return path


def member_activity_packs(metrics: DataFrame, target_year: int) -> dict:
    """The standard pack set off ``member_profile_metrics``: speech-count
    ranking table, vote-participation bar chart, top-issue-count ranking.
    Returns {pack name → spec dict}; write with ``write_spec``."""
    y = target_year
    return {
        f"speech_ranking_{y}": ranking_table_spec(
            metrics, f"speech_count_{y}",
            title=f"Most speeches in the Dáil, {y}",
            sublabel_col="constituency", slug=f"speech_ranking_{y}"),
        f"vote_participation_{y}": bar_chart_spec(
            metrics, f"vote_participation_pct_{y}",
            title=f"Vote participation, {y} (%)",
            slug=f"vote_participation_{y}"),
        f"top_issue_activity_{y}": ranking_table_spec(
            metrics, f"top_issue_count_{y}",
            title=f"Most speeches on their top issue, {y}",
            sublabel_col=f"top_issue_{y}", slug=f"top_issue_activity_{y}"),
    }
