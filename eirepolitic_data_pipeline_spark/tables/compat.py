"""Downstream compatibility adapters — SURVEY §3.2/§2.9 Q5 surface.

The reference publishes two "compat" CSVs so legacy consumers survive the
cutover to the unified pipeline
(`extract/oireachtas/downstream_compat.py:157-181`):

* a members roster (`member_code, full_name, constituency, party,
  house_no, source, snapshot_date`) sorted by (full_name, member_code),
* a per-member vote record (`memberCode, member_name, unique_vote_id,
  date, vote, party, constituency, source, snapshot_date`) sorted by
  (date, unique_vote_id, memberCode), where unique_vote_id prefers the
  division_id and falls back to vote_id.

Both adapters are column-rename/coalesce projections: first-existing
source column wins (`downstream_compat.py:189-193`), a missing column
becomes a blank string (never a read failure), and blank-vs-null
semantics follow the reference's keep_default_na=False reads.

Spark-first: pure `select` projections — no shuffle at all; the sort is
left to the writer (`orderBy` here would be a global sort; at 100 TB the
consumer contract is per-file ordering, so we expose `sort_columns`
metadata and let callers `sortWithinPartitions`).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEMBERS_COMPAT_SORT = ["full_name", "member_code"]
MEMBER_VOTES_COMPAT_SORT = ["date", "unique_vote_id", "memberCode"]


def _col_or_blank(df: DataFrame, *candidates: str):
    """First-existing column as blank-filled string, else a blank literal
    (`downstream_compat.py:184-193` _col/_first_col)."""
    for name in candidates:
        if name in df.columns:
            return F.coalesce(F.col(name).cast("string"), F.lit(""))
    return F.lit("")


def members_compat(members: DataFrame) -> DataFrame:
    """Legacy roster projection (`downstream_compat.py:157-164`)."""
    return members.select(
        _col_or_blank(members, "member_code").alias("member_code"),
        _col_or_blank(members, "full_name").alias("full_name"),
        _col_or_blank(members, "constituency_name",
                      "latest_constituency_name").alias("constituency"),
        _col_or_blank(members, "party_name",
                      "latest_party_name").alias("party"),
        _col_or_blank(members, "house_no",
                      "latest_house_no").alias("house_no"),
        F.lit("oireachtas_unified").alias("source"),
        _col_or_blank(members, "snapshot_date").alias("snapshot_date"),
    )


def member_votes_compat(votes: DataFrame) -> DataFrame:
    """Legacy vote-record projection (`downstream_compat.py:169-181`).

    unique_vote_id = division_id unless blank, else vote_id — the
    reference's `.where(div != "", vote_id)` blank-aware fallback.
    """
    division_id = _col_or_blank(votes, "division_id")
    vote_id = _col_or_blank(votes, "vote_id")
    return votes.select(
        _col_or_blank(votes, "member_code").alias("memberCode"),
        _col_or_blank(votes, "member_name").alias("member_name"),
        F.when(division_id != "", division_id)
        .otherwise(vote_id).alias("unique_vote_id"),
        _col_or_blank(votes, "division_date").alias("date"),
        _col_or_blank(votes, "vote_label").alias("vote"),
        _col_or_blank(votes, "party_name_at_vote").alias("party"),
        _col_or_blank(votes, "constituency_name_at_vote")
        .alias("constituency"),
        F.lit("oireachtas_unified").alias("source"),
        _col_or_blank(votes, "snapshot_date").alias("snapshot_date"),
    )


def compat_summary(adapters: list[tuple[str, DataFrame, DataFrame, str]]
                   ) -> tuple[list[dict[str, Any]], dict[str, Any]]:
    """Adapter summary rows + DQ verdict (`downstream_compat.py:197-231`).

    ``adapters`` is [(name, source_df, output_df, pk_column)]. Each output
    is scanned once with a single aggregate (count + blank-PK count) —
    no collect of data rows, so the check is safe at any scale.
    """
    rows: list[dict[str, Any]] = []
    for name, source_df, output_df, pk in adapters:
        stats = output_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(
                F.trim(F.coalesce(F.col(pk).cast("string"), F.lit(""))) == "",
                1)).alias("blank_pk"),
        ).collect()[0]
        pk_populated = stats["n"] > 0 and stats["blank_pk"] == 0
        rows.append({
            "adapter_name": name,
            "status": "pass" if stats["n"] > 0 and pk_populated else "fail",
            "source_rows": int(source_df.count()),
            "output_rows": int(stats["n"]),
            "source_columns": len(source_df.columns),
            "output_columns": len(output_df.columns),
            "primary_key_column": pk,
            "primary_key_populated": str(pk_populated).lower(),
        })
    names = [r["adapter_name"] for r in rows]
    dq = {
        "table": "compat_downstream_adapters",
        "dq_status": "pass" if rows and len(set(names)) == len(names)
        and all(r["status"] == "pass" for r in rows) else "fail",
        "row_count": len(rows),
        "primary_key": ["adapter_name"],
        "checks": [
            {"check_name": "row_count_gt_zero",
             "status": "pass" if rows else "fail"},
            {"check_name": "primary_key_unique",
             "status": "pass" if len(set(names)) == len(names) else "fail"},
            {"check_name": "all_adapters_pass",
             "status": "pass" if rows and all(
                 r["status"] == "pass" for r in rows) else "fail"},
        ],
    }
    return rows, dq
