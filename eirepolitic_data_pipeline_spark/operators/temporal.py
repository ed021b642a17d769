"""Temporal / interval operators — SURVEY §2.6 W4/W6, §2.9 Q2, §2.7 O9.

The reference models SCD-2-style validity with string date columns,
open-ended ends as blank/null, and a `9999-12-31` sentinel for ordering
(`table_gold_current_members.py:209-218`, `merge.py:33-115`). These
operators keep those exact semantics over proper DateType columns.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

OPEN_END = "9999-12-31"


def _end_or_sentinel(end: str) -> Column:
    return F.coalesce(F.col(end), F.lit(OPEN_END).cast("date"))


def current_else_latest(df: DataFrame, entity: Sequence[str],
                        start: str, end: str,
                        is_current: Optional[str] = None) -> DataFrame:
    """W4 — one row per entity: the current record if any, else the latest.

    Ordering (reference `table_gold_current_members.py:209-218`):
    is_current desc, end desc (null end = open = sentinel max), start desc.
    A final orderBy on start/end alone is ambiguous for identical intervals,
    so callers should ensure (entity, start) uniqueness upstream; ties fall
    back to the full ordering deterministically via monotonically stable
    column ordering in row_number.
    """
    order = []
    if is_current:
        order.append(F.col(is_current).cast("boolean").desc_nulls_last())
    order += [_end_or_sentinel(end).desc(), F.col(start).desc_nulls_last()]
    w = Window.partitionBy(*entity).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def interval_overlap_counts(df: DataFrame, entity: Sequence[str],
                            start: str, end: str) -> DataFrame:
    """W6 — per entity, count successive interval pairs that overlap:
    next.start <= prev.end (open end → sentinel). lag over (entity, start)."""
    w = Window.partitionBy(*entity).orderBy(F.col(start), _end_or_sentinel(end))
    prev_end = F.lag(_end_or_sentinel(end)).over(w)
    return (
        df.withColumn("__prev_end", prev_end)
        .groupBy(*entity)
        .agg(F.sum(F.when(F.col("__prev_end").isNotNull()
                          & (F.col(start) <= F.col("__prev_end")), 1).otherwise(0))
             .cast("long").alias("overlap_count"))
    )


def temporal_integrity_report(df: DataFrame, start: str, end: str,
                              is_current: Optional[str] = None,
                              today: Optional[Column] = None) -> DataFrame:
    """Q2 — one-row report: rows with start>end; rows flagged current whose
    start is in the future (reference `merge.py:33-73`)."""
    now = today if today is not None else F.current_date()
    checks = [
        F.sum(F.when(F.col(start).isNotNull() & F.col(end).isNotNull()
                     & (F.col(start) > F.col(end)), 1).otherwise(0))
        .cast("long").alias("start_after_end"),
    ]
    if is_current:
        checks.append(
            F.sum(F.when(F.col(is_current).cast("boolean")
                         & (F.col(start) > now), 1).otherwise(0))
            .cast("long").alias("future_dated_current"))
    return df.agg(*checks)


def scope_replace_union(existing: DataFrame, incoming: DataFrame,
                        scope_predicate: Column) -> DataFrame:
    """O9 — delete-matching-scope then insert (reference weekly-scope
    replace, `ridiculous_sentences_weekly.py:435-458`): drop existing rows in
    the incoming scope, union the incoming rows. With partitioned storage
    this is dynamic partition overwrite; as algebra it is filter + union."""
    return existing.filter(~scope_predicate).unionByName(
        incoming, allowMissingColumns=True)
