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


def parse_step_seconds(step: str, what: str = "step") -> int:
    """'<n> second|minute|hour|day(s)' -> seconds. Unrecognized units are a
    hard error: a silent fallback to seconds would turn '2 weeks' into a
    2-SECOND step and explode week-long grids/intervals by ~300000x with no
    diagnostic. Shared by point_in_interval_join and resample_periodic."""
    import re
    m = re.fullmatch(r"\s*(\d+)\s*(second|minute|hour|day)s?\s*", step)
    if not m:
        raise ValueError(
            f"{what} {step!r} must be '<n> second|minute|hour|day(s)'")
    return int(m.group(1)) * {"second": 1, "minute": 60,
                              "hour": 3600, "day": 86400}[m.group(2)]


def _end_or_sentinel(end: str) -> Column:
    return F.coalesce(F.col(end), F.lit(OPEN_END).cast("date"))


def current_else_latest(df: DataFrame, entity: Sequence[str],
                        start: str, end: str,
                        is_current: Optional[str] = None) -> DataFrame:
    """W4 — one row per entity: the current record if any, else the latest.

    Ordering (reference `table_gold_current_members.py:209-218`):
    is_current desc, end desc (null end = open = sentinel max), start desc.
    Rows tied on all three (identical intervals with different payloads)
    break by a TOTAL order over the remaining orderable columns — the same
    determinism contract as merge._keep_first_by_priority; row_number over
    a tied ordering would otherwise promote whichever row the shuffle
    delivered first, flipping payloads between runs.
    """
    order = []
    if is_current:
        order.append(F.col(is_current).cast("boolean").desc_nulls_last())
    order += [_end_or_sentinel(end).desc(), F.col(start).desc_nulls_last()]
    named = set(entity) | {start, end} | ({is_current} if is_current else set())
    order += [F.col(f.name).desc_nulls_last() for f in df.schema.fields
              if f.name not in named
              and "map<" not in f.dataType.simpleString()]
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
    # coalesce to 0: F.sum over ZERO rows is NULL, and a gate like
    # `report.start_after_end == 0` on an empty (healthy) table would
    # evaluate NULL instead of passing
    checks = [
        F.coalesce(
            F.sum(F.when(F.col(start).isNotNull() & F.col(end).isNotNull()
                         & (F.col(start) > F.col(end)), 1).otherwise(0)),
            F.lit(0)).cast("long").alias("start_after_end"),
    ]
    if is_current:
        checks.append(
            F.coalesce(
                F.sum(F.when(F.col(is_current).cast("boolean")
                             & (F.col(start) > now), 1).otherwise(0)),
                F.lit(0)).cast("long").alias("future_dated_current"))
    return df.agg(*checks)


def scope_replace_union(existing: DataFrame, incoming: DataFrame,
                        scope_predicate: Column) -> DataFrame:
    """O9 — delete-matching-scope then insert (reference weekly-scope
    replace, `ridiculous_sentences_weekly.py:435-458`): drop existing rows in
    the incoming scope, union the incoming rows. With partitioned storage
    this is dynamic partition overwrite; as algebra it is filter + union.

    Rows where the predicate evaluates NULL (e.g. a NULL scope column
    under `col == literal`) are OUTSIDE the scope and must be KEPT: a bare
    `filter(~pred)` drops them (~NULL is NULL), silently deleting
    out-of-scope rows on every refresh — the coalesce pins NULL to
    False before negating, matching DPO semantics (only partitions
    present in incoming are replaced)."""
    return existing.filter(
        ~F.coalesce(scope_predicate, F.lit(False))).unionByName(
        incoming, allowMissingColumns=True)


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           ts_col: str, start_col: str, end_col: str,
                           bucket: str = "1 hour",
                           equi_keys: Sequence[str] = (),
                           how: str = "inner") -> DataFrame:
    """Range join: each point row matched to interval rows containing it
    (``start <= ts < end``), with optional extra equi keys.

    Spark has no native range join, and the naive formulation is a
    cross/theta join — O(|points| x |intervals|) with everything in one
    task. This is the bucketized plan: explode each interval into the
    ``bucket``-grain time buckets it spans, equi-join points to intervals
    on (bucket [+ equi_keys]) — a plain shuffled hash join — then filter
    the exact containment predicate. Cost is O(|points| + |intervals| x
    span/bucket + true matches): linear, partitioned, AQE-skew-splittable.
    Pick ``bucket`` near the typical interval length so intervals explode
    into a handful of buckets each.

    Intervals that overlap each other are fine (a point matches each
    container); a point in no interval is dropped (inner) or kept with
    null interval columns (``how='left'``, implemented as inner + anti
    union so the bucket join itself stays an equi-join).

    The two sides must not share column names beyond ``equi_keys``: the
    output carries both sides' columns, so a shared name is ambiguous
    (Spark would emit duplicate columns on inner and throw
    AMBIGUOUS_REFERENCE on the left path's re-select). Validated up
    front with a clear error — rename before joining.
    """
    clash = (set(points.columns) & set(intervals.columns)) \
        - set(equi_keys)
    if clash:
        raise ValueError(
            f"point_in_interval_join: columns {sorted(clash)} exist on "
            "BOTH sides but are not equi_keys; rename one side (the "
            "output carries both sides' columns)")
    reserved = {"__bucket", "__buckets"} & (
        set(points.columns) | set(intervals.columns))
    if reserved:
        # withColumn would silently OVERWRITE a caller column of the
        # internal working name, and the final drop would then remove it
        # from the output entirely
        raise ValueError(
            f"point_in_interval_join: columns {sorted(reserved)} are "
            "reserved internal names; rename them before joining")
    # Bucket bounds via integer epoch arithmetic — engine-portable (the
    # oracle mirrors it with the same floor-division) and cheap. The unit
    # is validated driver-side: a silent fallback to seconds would turn
    # '2 weeks' into a 2-SECOND step and explode a week-long interval into
    # ~300k sequence elements per row with no diagnostic.
    step_secs = parse_step_seconds(bucket, what="bucket")
    step = F.lit(step_secs)
    iv = intervals.filter(
        # A malformed interval (end < start, or null bound) would make
        # sequence() throw and fail the whole job; the containment filter
        # would match nothing for it anyway — drop it up front (tolerant
        # semantics, consistent with try_cast-style coercion elsewhere).
        F.col(end_col).isNotNull() & F.col(start_col).isNotNull()
        & (F.col(end_col) >= F.col(start_col))
    ).withColumn(
        "__buckets",
        # floor, not cast('long'): truncation-toward-zero would fold the
        # two buckets around epoch into one for negative timestamps. The
        # mapping is applied identically to both sides so candidates were
        # still consistent, but floor keeps buckets uniform-width (and
        # matches resample_periodic's arithmetic).
        F.sequence(
            F.floor(F.unix_timestamp(F.col(start_col)) / step) * step,
            # end is exclusive, but a point in the end's bucket before the
            # end still matches — include the end bucket
            F.floor(F.unix_timestamp(F.col(end_col)) / step) * step,
            step,
        )).withColumn("__bucket", F.explode("__buckets")).drop("__buckets")
    p2 = points.withColumn(
        "__bucket",
        F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step)
    on = ["__bucket", *equi_keys]
    joined = (p2.join(iv, on, "inner")
              .filter((F.col(ts_col) >= F.col(start_col))
                      & (F.col(ts_col) < F.col(end_col)))
              .drop("__bucket"))
    if how == "inner":
        return joined
    if how != "left":
        raise ValueError("how must be 'inner' or 'left'")
    # The left path consumes `joined` TWICE (matched-keys derivation and
    # the final union); persist so the explode + shuffle join + containment
    # filter — the operator's dominant cost — executes once, not per
    # consumer. Same cache-release contract as the curation stage
    # boundaries: batch callers' sessions end, long-lived callers release
    # after materializing.
    joined = joined.persist()
    # Null-SAFE anti-join: with the default equality condition a matched
    # point row containing any NULL column would never equal itself and be
    # re-emitted as "unmatched" (duplicate output).
    matched_keys = joined.select(*points.columns).distinct()
    cond = None
    for c in points.columns:
        eq = points[c].eqNullSafe(matched_keys[c])
        cond = eq if cond is None else (cond & eq)
    unmatched = points.join(matched_keys, cond, "left_anti")
    for c in intervals.columns:
        if c not in points.columns:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return joined.unionByName(unmatched)
