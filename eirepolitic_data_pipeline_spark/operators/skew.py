"""Skew-resilient operators for hot-key workloads.

AQE handles skew in *joins* (`spark.sql.adaptive.skewJoin` splits an
oversized sort-merge partition at runtime), but it cannot split a WINDOW
partition or a `collect_*` aggregation group: every row of a hot key must
land in one task, so one celebrity user / default-value key stalls the
stage no matter how many executors exist. These helpers break that by
salting — a deterministic per-row bucket within the key — and combining in
two phases, trading one extra (much smaller) shuffle for bounded task size.

Algebra requirements, stated per operator: two-phase top-N needs only that
the ordering is total (enforced here by requiring a unique tiebreak, the
same rule the ranking module uses); the salted aggregations need the
combine step to be associative+commutative over partial states (sum/count/
min/max/collect_set — NOT avg or countDistinct directly, which must be
decomposed first; `salted_agg` therefore accepts only re-combinable specs).

The salt is `pmod(hash(tiebreak-or-row), buckets)` — deterministic, so
re-runs and retried tasks produce identical buckets (speculative execution
safe), with no RNG anywhere (reference pitfall: pandas order-dependence,
SURVEY §7 hard-parts #2).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SALT = "__salt"


def _salt_col(salt_on: Sequence[Column], buckets: int) -> Column:
    if buckets < 1:
        # pmod(x, 0) is NULL (or a runtime divide-by-zero under ANSI), so
        # every row of a key would land in ONE null salt bucket — silently
        # recreating the single-task pile-up the salt exists to prevent
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    return F.pmod(F.hash(*salt_on), F.lit(buckets)).cast("int")


def _default_salt(df: DataFrame) -> list[Column]:
    """Every HASHABLE input column plus the physical partition id —
    ``F.hash`` rejects map-typed columns outright (the same exclusion
    merge.py applies to orderings), so a frame carrying a map attribute
    column must not break the default salt."""
    return [F.col(f.name) for f in df.schema.fields
            if "map<" not in f.dataType.simpleString()] + \
        [F.spark_partition_id()]


def salted_top_n(df: DataFrame, partition: Sequence[str],
                 order_by: Sequence[Column], n: int, *,
                 buckets: int = 32, salt_on: Sequence[Column] | None = None,
                 rank_col: str = "rank") -> DataFrame:
    """Top-N per group that survives hot keys.

    Phase 1 ranks within (key, salt) and keeps each bucket's top N — the
    per-task working set is bounded by the largest *bucket*, not the
    largest key. Phase 2 re-ranks the ≤ buckets·N survivors per key, a
    partition bounded by buckets·N rows regardless of input skew. Result is
    row-for-row identical to `ranking.top_n_per_group` (same rank values)
    because keeping a bucket's top N can never discard a row that belongs
    to the key's true top N.

    ``order_by`` must totally order rows within a key (include a unique
    tiebreak) — the same determinism contract as the one-phase operator.
    ``salt_on`` defaults to every input column PLUS the physical partition
    id: a hot key whose duplicate rows are byte-identical (dirty feeds'
    default values) hashes every copy to ONE bucket under a pure
    content-hash salt, recreating exactly the single-task pile-up this
    operator exists to bound. spark_partition_id varies per run's physical
    layout, but the RESULT stays deterministic: identical rows are
    interchangeable, and phase 2 re-ranks with the caller's total order —
    the salt only chooses which indistinguishable copies each bucket
    sees. Pass explicit columns to control bucket placement.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    salt_src = (list(salt_on) if salt_on is not None
                else _default_salt(df))
    salted = df.withColumn(_SALT, _salt_col(salt_src, buckets))
    w1 = Window.partitionBy(*partition, _SALT).orderBy(*order_by)
    survivors = (salted.withColumn("__rn1", F.row_number().over(w1))
                 .filter(F.col("__rn1") <= n)
                 .drop("__rn1", _SALT))
    w2 = Window.partitionBy(*partition).orderBy(*order_by)
    return (survivors.withColumn(rank_col, F.row_number().over(w2).cast("int"))
            .filter(F.col(rank_col) <= n))


# Re-combinable aggregation specs: name -> (phase1 agg, phase2 re-combine).
# Each phase-2 fn takes the phase-1 output column name.
_RECOMBINE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "collect_set": (F.collect_set,
                    lambda c: F.array_distinct(F.flatten(F.collect_list(c)))),
}


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: Mapping[str, tuple[str, str]], *,
               buckets: int = 32,
               salt_on: Sequence[Column] | None = None) -> DataFrame:
    """Two-phase groupBy for aggregations whose per-key state is large.

    ``aggs`` maps output column -> (agg_name, input_column) with agg_name in
    {sum, count, min, max, collect_set}. For sum/count/min/max Spark's own
    partial aggregation already bounds task state and this helper is
    unnecessary; its real use is `collect_set`-shaped aggregations (A8
    string-agg, posting lists) where map-side combine still ships one huge
    array per hot key into a single reduce task. Salting splits that array
    across ``buckets`` reducers, then flattens the ≤ buckets partials.

    avg/countDistinct are intentionally rejected: decompose them
    (sum+count / two-level distinct) before salting.

    The default salt includes the physical partition id for the same
    reason as salted_top_n's: byte-identical duplicate rows of a hot key
    would all content-hash into ONE bucket. The re-combine phase is
    bucket-placement-insensitive (that is what _RECOMBINE certifies), so
    the result is unchanged.
    """
    for out, (name, _) in aggs.items():
        if name not in _RECOMBINE:
            raise ValueError(
                f"{out}: '{name}' is not re-combinable; use one of "
                f"{sorted(_RECOMBINE)} or decompose the aggregate first")
    salt_src = list(salt_on) if salt_on is not None else _default_salt(df)
    salted = df.withColumn(_SALT, _salt_col(salt_src, buckets))
    phase1 = salted.groupBy(*keys, _SALT).agg(*[
        _RECOMBINE[name][0](col).alias(out)
        for out, (name, col) in aggs.items()])
    return phase1.groupBy(*keys).agg(*[
        _RECOMBINE[name][1](out).alias(out)
        for out, (name, _) in aggs.items()])


def salted_string_agg(df: DataFrame, keys: Sequence[str], value: str,
                      sep: str = "; ", *, buckets: int = 32,
                      out_col: str = "agg") -> DataFrame:
    """A8 (sorted-distinct string agg) hardened against hot keys: salted
    collect_set, flatten, distinct, sort, join — byte-identical to the
    single-phase `array_join(array_sort(collect_set(...)))`."""
    sets = salted_agg(df, keys, {out_col: ("collect_set", value)},
                      buckets=buckets, salt_on=[F.col(value)])
    return sets.withColumn(
        out_col, F.array_join(F.array_sort(F.col(out_col)), sep))
