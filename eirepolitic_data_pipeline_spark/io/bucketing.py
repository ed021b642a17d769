"""Bucketed-table support: co-located joins without a shuffle.

The reference never needs this (≤50k-row pandas frames), but at 100 TB the
dominant cost of the engine's recurring joins — silver facts re-joined to
the same keys every refresh (member_code, division_id, orderkey-shaped
keys) — is re-shuffling both sides on every run. Writing both sides
bucketed on the join key makes the join's clustering a property of the
STORAGE, paid once at write time: Spark's scan reports the bucketing as the
output partitioning, and the sort-merge join planner drops both Exchanges
(and, with a matching sortBy, both Sorts).

Usage contract:
- same ``num_buckets`` and key order on both sides (mismatched bucket
  counts fall back to shuffling the smaller side);
- tables are registered in the session catalog with data at an explicit
  external ``path`` — the catalog entry carries the bucketing metadata, the
  parquet carries the rows, so re-registering after a session restart is
  one `register_bucketed` call per table;
- bucket count is a scale decision: pick ``rows_per_bucket`` so one bucket
  fits an executor core's working set (the helper computes it from a row
  estimate rather than hard-coding).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def buckets_for(row_estimate: int, rows_per_bucket: int = 5_000_000,
                min_buckets: int = 4, max_buckets: int = 4096) -> int:
    """Bucket count sized to the data: ceil(rows / rows_per_bucket), clamped,
    rounded up to a power of two so downstream bucket coalescing (Spark can
    merge 2^k buckets into 2^j) stays exact."""
    raw = max(min_buckets, math.ceil(max(row_estimate, 1) / rows_per_bucket))
    return min(max_buckets, 1 << (raw - 1).bit_length())


def write_bucketed(df: DataFrame, table: str, keys: Sequence[str],
                   num_buckets: int, path: str,
                   sort_by: Optional[Sequence[str]] = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as an external bucketed parquet table.

    ``sort_by`` defaults to the bucket keys — pre-sorted buckets let the
    sort-merge join skip its per-partition Sort as well as the Exchange.
    """
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (df.write.format("parquet").mode(mode)
              .option("path", path)
              .bucketBy(num_buckets, *keys)
              .sortBy(*(sort_by if sort_by is not None else keys)))
    writer.saveAsTable(table)


def register_bucketed(spark: SparkSession, table: str, path: str,
                      schema_ddl: str, keys: Sequence[str], num_buckets: int,
                      sort_by: Optional[Sequence[str]] = None) -> None:
    """Re-attach an existing bucketed parquet directory to a (new) session's
    catalog — the bucketing lives in table metadata, so a fresh session must
    re-declare it to get shuffle-free planning."""
    sorted_cols = ", ".join(sort_by if sort_by is not None else keys)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({schema_ddl}) USING parquet "
        f"CLUSTERED BY ({', '.join(keys)}) "
        f"SORTED BY ({sorted_cols}) INTO {num_buckets} BUCKETS "
        f"LOCATION '{path}'")


def bucketed_join(spark: SparkSession, left: str, right: str,
                  keys: Sequence[str], how: str = "inner") -> DataFrame:
    """Join two registered bucketed tables on their bucket keys."""
    return spark.table(left).join(spark.table(right), list(keys), how)


def persist_silver_bucketed(frames: dict, base_path: str,
                            num_buckets: int,
                            table_prefix: str = "bkt_") -> dict:
    """Persist silver fact/dim frames bucketed on their recurring join/agg
    key and return the re-read (bucketed-scan) frames.

    ``frames`` maps table name → (DataFrame, bucket key columns). Each value
    is written with ``write_bucketed`` (keys also sort keys) and read back
    through the session catalog so the scan reports the bucketing as its
    output partitioning. Feed the returned frames to the gold builders with
    ``normalized_inputs=True`` (tables/gold.py) and the per-member fact
    aggregations plan with ZERO Exchanges — the recurring-refresh shuffle of
    the fact logs is paid once, at silver write time.

    The silver writers trim string keys at write time, which is what makes
    the normalized-inputs contract sound; this helper asserts nothing about
    it — callers own the contract.
    """
    if not frames:
        raise ValueError("persist_silver_bucketed: frames must not be empty")
    spark = next(iter(frames.values()))[0].sparkSession
    out = {}
    for name, (df, keys) in frames.items():
        table = f"{table_prefix}{name}"
        write_bucketed(df, table, list(keys), num_buckets,
                       f"{base_path}/{name}")
        out[name] = spark.table(table)
    return out


def exchanges_in_plan(df: DataFrame) -> int:
    """Count shuffle Exchanges in the physical plan (0 for a co-located
    bucketed join) — the assertion the tests and plan audits use."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines() if "Exchange" in line
               and "BroadcastExchange" not in line)


def write_range_sorted(df: DataFrame, path: str, cols: Sequence[str],
                       mode: str = "overwrite",
                       num_files: Optional[int] = None) -> None:
    """Range-partition + sort-within-partitions on ``cols`` before writing
    parquet — the data-skipping layout lever that complements hive
    partitioning (coarse pruning) and bucketing (join clustering).

    Sorting clusters each value range into few row groups, so parquet's
    min/max row-group statistics let a pushed-down predicate skip almost
    the whole table for selective filters; unsorted data scatters every
    value across all row groups and the same pushed filter reads everything.
    Use on high-selectivity query columns (ids, timestamps) that are not
    the partition key. ``num_files`` pins the range-partition count (and so
    the output file count); default lets AQE size it from the data, which
    on small inputs collapses to one file."""
    if num_files is not None and num_files <= 0:
        # a bytes//target computation that rounds to 0 must not silently
        # drop the explicit file-count pin and fall back to AQE sizing
        raise ValueError(
            f"write_range_sorted: num_files must be positive, got "
            f"{num_files} (pass None for AQE-sized output)")
    parts = [F.col(c) for c in cols]
    rp = (df.repartitionByRange(num_files, *parts) if num_files is not None
          else df.repartitionByRange(*parts))
    rp.sortWithinPartitions(*cols).write.mode(mode).parquet(path)
