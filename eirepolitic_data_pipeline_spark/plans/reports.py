"""Review-only comparison reports — the reference's cutover / trial
diagnostics re-expressed as DataFrame plans.

- ``cutover_comparison_report`` — legacy-vs-unified table pairs
  (`extract/oireachtas/cutover_comparison.py:21-122`): per pair, existence,
  row/column counts, join-key coverage, matched / one-side-only key counts,
  and a stable comparison id. One row per pair; each pair's metrics are
  1-row aggregates cross-joined into the row (anti/semi-join key algebra —
  the same J5/O10 operators behind ``comparison_gates``), the rows unioned
  into ONE DataFrame — nothing materializes driver-side, so the report
  stays cheap however large the tables are.
- ``member_profile_trial_report`` — side-by-side trial summary
  (`extract/oireachtas/member_profile_trial_report.py:87-100`): the fixed
  check-name rows (row counts, distinct member counts, overlap, common
  columns) with the reference's status semantics.
- ``render_markdown_report`` — the review bundle's escaped markdown table
  (`cutover_comparison.py:158-184`).

Both reports are REVIEW-ONLY by contract: they read production tables and
write nothing — callers hand the result to the catalog/review sink.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import nonblank, stable_hash

CUTOVER_COLUMNS = (
    "comparison_name status legacy_exists unified_exists legacy_rows "
    "unified_rows legacy_columns unified_columns legacy_join_column "
    "unified_join_column legacy_join_coverage_pct unified_join_coverage_pct "
    "matched_key_count legacy_only_key_count unified_only_key_count "
    "comparison_id"
).split()


@dataclass(frozen=True)
class ComparisonPair:
    """One legacy/unified table pair (`cutover_comparison.py:21-27` minus
    the bucket keys — resolution is the caller's lookup function)."""
    comparison_name: str
    legacy_table: str
    unified_table: str
    legacy_join_column: str
    unified_join_column: str


def _keys(df: DataFrame, col: str) -> DataFrame:
    """Distinct trimmed non-blank key values (`cutover_comparison.py:95-96`);
    blank==missing is the canonical ``functions.scalar.nonblank`` predicate."""
    return (df.filter(nonblank(col))
            .select(F.trim(F.col(col).cast("string")).alias("__k"))
            .distinct())


def _coverage_pct(df: DataFrame, col: str) -> F.Column:
    """Populated-key percentage as the reference's 2dp string (blank when
    the column is absent — handled by the caller). The sum is coalesced:
    over an EXISTING table with zero rows, sum() is NULL and the cell
    would otherwise surface as a literal null in the all-string report
    instead of '0.00'."""
    populated = F.coalesce(
        F.sum(F.when(nonblank(col), 1).otherwise(0)), F.lit(0))
    return F.format_number(
        populated * 100.0 / F.greatest(F.count(F.lit(1)), F.lit(1)), 2)


def _pair_row(spark: SparkSession, pair: ComparisonPair,
              legacy: Optional[DataFrame],
              unified: Optional[DataFrame]) -> DataFrame:
    """One report row as a 1-row DataFrame plan."""
    legacy_exists, unified_exists = legacy is not None, unified is not None
    # status semantics (`cutover_comparison.py:100-102`): fail unless the
    # unified side exists with rows; missing legacy downgrades to warn.
    lits = {
        "comparison_name": F.lit(pair.comparison_name),
        "legacy_exists": F.lit(str(legacy_exists).lower()),
        "unified_exists": F.lit(str(unified_exists).lower()),
        "legacy_join_column": F.lit(pair.legacy_join_column),
        "unified_join_column": F.lit(pair.unified_join_column),
        "comparison_id": F.concat(F.lit("cmp:"), stable_hash(
            F.lit(pair.comparison_name), F.lit(pair.legacy_table),
            F.lit(pair.unified_table), length=24)),
    }

    def side_aggs(df: Optional[DataFrame], join_col: str, prefix: str):
        if df is None:
            return spark.range(1).select(
                F.lit(0).cast("long").alias(f"{prefix}_rows"),
                F.lit(0).alias(f"{prefix}_columns"),
                F.lit("").alias(f"{prefix}_join_coverage_pct"))
        cov = (_coverage_pct(df, join_col) if join_col in df.columns
               else F.lit(""))
        return df.agg(
            F.count(F.lit(1)).alias(f"{prefix}_rows"),
            F.lit(len(df.columns)).alias(f"{prefix}_columns"),
            cov.alias(f"{prefix}_join_coverage_pct"))

    row = side_aggs(legacy, pair.legacy_join_column, "legacy").crossJoin(
        side_aggs(unified, pair.unified_join_column, "unified"))

    both_joinable = (legacy_exists and unified_exists
                     and pair.legacy_join_column in legacy.columns
                     and pair.unified_join_column in unified.columns)
    if both_joinable:
        # ONE full-outer join of the two distinct key sets yields matched /
        # legacy-only / unified-only in a single aggregate — each table is
        # scanned and distinct-shuffled once (separate semi+anti+anti joins
        # would re-evaluate both key-set subtrees three times each).
        lk = _keys(legacy, pair.legacy_join_column).withColumn("__l", F.lit(1))
        uk = _keys(unified, pair.unified_join_column).withColumn("__u", F.lit(1))
        key_stats = (
            lk.join(uk, "__k", "full_outer").agg(
                F.coalesce(F.sum(F.when(F.col("__l").isNotNull()
                                        & F.col("__u").isNotNull(), 1)
                                 .otherwise(0)), F.lit(0))
                .cast("string").alias("matched_key_count"),
                F.coalesce(F.sum(F.when(F.col("__u").isNull(), 1)
                                 .otherwise(0)), F.lit(0))
                .cast("string").alias("legacy_only_key_count"),
                F.coalesce(F.sum(F.when(F.col("__l").isNull(), 1)
                                 .otherwise(0)), F.lit(0))
                .cast("string").alias("unified_only_key_count")))
        row = row.crossJoin(key_stats)
    else:
        # blank, as the reference leaves unjoinable pairs ("" not 0)
        row = row.select(
            "*", F.lit("").alias("matched_key_count"),
            F.lit("").alias("legacy_only_key_count"),
            F.lit("").alias("unified_only_key_count"))

    # reference order (`cutover_comparison.py:100-102`): the missing-legacy
    # "warn" is assigned AFTER the pass/fail decision, so it overrides fail
    status = (F.when(F.lit(not legacy_exists), "warn")
              .when(F.lit(not unified_exists) | (F.col("unified_rows") == 0),
                    "fail")
              .otherwise("pass"))
    out = row.select(*[
        lits[c] .alias(c) if c in lits
        else status.alias(c) if c == "status"
        else F.col(c).cast("string").alias(c)
        for c in CUTOVER_COLUMNS])
    return out


def cutover_comparison_report(
        spark: SparkSession, pairs: Sequence[ComparisonPair],
        resolve: Callable[[str], Optional[DataFrame]]) -> DataFrame:
    """Cutover report: one row per legacy/unified pair, PK comparison_name.

    ``resolve`` maps a table name to its DataFrame, or None when the object
    does not exist (the reference's object_exists probe)."""
    if not pairs:
        return spark.createDataFrame(
            [], ", ".join(f"{c} string" for c in CUTOVER_COLUMNS))
    rows = [_pair_row(spark, p, resolve(p.legacy_table),
                      resolve(p.unified_table)) for p in pairs]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def member_profile_trial_report(spark: SparkSession, legacy: DataFrame,
                                trial: DataFrame,
                                legacy_name: str = "legacy",
                                trial_name: str = "trial") -> DataFrame:
    """Side-by-side trial summary: the reference's fixed check rows
    (`member_profile_trial_report.py:87-100`) with identical status
    semantics, computed as cross-joined 1-row aggregates + key-set
    semi/anti joins and exploded into (check_name, status, legacy_value,
    trial_value, message) rows."""
    lm, tm = _keys(legacy, "member_code"), _keys(trial, "member_code")
    common = sorted(set(legacy.columns) & set(trial.columns))
    # ONE full-outer join of the two distinct key sets yields every
    # key-based metric (per-side distinct counts, overlap, both
    # exclusives) in a single aggregate — the separate semi+anti+anti
    # joins plus per-side counts this replaces re-evaluated each
    # scan+distinct subtree ~4x per report (the same shape _pair_row
    # documents and uses). Coalesce: both-empty inputs make every sum
    # NULL, which must surface as 0 in the check rows.
    zsum = lambda c: F.coalesce(F.sum(c), F.lit(0))  # noqa: E731
    key_stats = (
        lm.withColumn("__l", F.lit(1))
        .join(tm.withColumn("__t", F.lit(1)), "__k", "full_outer")
        .agg(zsum(F.when(F.col("__l").isNotNull(), 1)).alias("lmc"),
             zsum(F.when(F.col("__t").isNotNull(), 1)).alias("tmc"),
             zsum(F.when(F.col("__l").isNotNull()
                         & F.col("__t").isNotNull(), 1)).alias("match"),
             zsum(F.when(F.col("__l").isNull(), 1)).alias("trial_only"),
             zsum(F.when(F.col("__t").isNull(), 1)).alias("legacy_only")))
    m = (legacy.agg(F.count(F.lit(1)).alias("ln"))
         .crossJoin(trial.agg(F.count(F.lit(1)).alias("tn")))
         .crossJoin(key_stats))

    s = lambda c: F.col(c).cast("string")  # noqa: E731
    blank = F.lit("")
    pf = lambda cond: F.when(cond, "pass").otherwise("fail")  # noqa: E731

    def check(name, status, legacy_value, trial_value, message):
        return F.struct(
            F.lit(name).alias("check_name"), status.alias("status"),
            legacy_value.alias("legacy_value"),
            trial_value.alias("trial_value"), message.alias("message"))

    checks = F.array(
        check("legacy_rows", F.lit("info"), s("ln"), blank,
              F.lit(legacy_name)),
        check("trial_rows", pf(F.col("tn") > 0), blank, s("tn"),
              F.lit(trial_name)),
        check("legacy_member_count", F.lit("info"), s("lmc"), blank,
              F.lit("distinct legacy member_code")),
        check("trial_member_count", pf(F.col("tmc") > 0), blank, s("tmc"),
              F.lit("distinct trial member_code")),
        check("matched_member_count",
              F.when(F.col("match") > 0, "pass").otherwise("warn"),
              s("lmc"), s("match"),
              F.lit("legacy/trial member_code overlap")),
        check("trial_only_member_count", F.lit("info"), blank,
              s("trial_only"), F.lit("member_code only in trial")),
        check("legacy_only_member_count", F.lit("info"), s("legacy_only"),
              blank, F.lit("member_code only in legacy")),
        check("common_column_count", F.lit("pass" if common else "warn"),
              F.lit(str(len(legacy.columns))), F.lit(str(len(common))),
              F.lit(",".join(common))),
    )
    return m.select(F.explode(checks).alias("c")).select("c.*")


def render_markdown_report(title: str, df: DataFrame, preamble: str = "",
                           max_cell: int = 300) -> str:
    """Escaped markdown table for the review bundle
    (`cutover_comparison.py:158-184`). The report frames above are
    row-bounded by construction (one row per pair / per check), so the
    collect here is safe."""
    cols = df.columns
    lines = [f"# {title}", ""]
    if preamble:
        lines += [preamble, ""]
    lines += ["| " + " | ".join(cols) + " |",
              "| " + " | ".join(["---"] * len(cols)) + " |"]
    for r in df.collect():
        cells = []
        for c in cols:
            v = "" if r[c] is None else str(r[c])
            # normalize CR/LF FIRST, truncate on the raw value, escape
            # LAST — truncating after escaping could cut an escape in
            # half (dangling backslash), and a bare \r from CRLF data
            # would survive a \n-only replace into the table row
            v = v.replace("\r", " ").replace("\n", " ")[:max_cell]
            cells.append(v.replace("|", "\\|"))
        lines.append("| " + " | ".join(cells) + " |")
    return "\n".join(lines + [""])
