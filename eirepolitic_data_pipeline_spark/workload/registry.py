"""Workload registry plumbing shared by the query modules."""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # DuckDB oracle; None → rows-only check (non-SQL op)
    survey_ref: str = ""  # SURVEY.md §2 operator ids this query exercises


QUERIES: dict[str, Query] = {}


def register(name: str, sql: Optional[str], survey_ref: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""
    def deco(fn):
        QUERIES[name] = Query(name=name, fn=fn, sql=sql, survey_ref=survey_ref)
        return fn
    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table. Parquet scan → Catalyst gets pushdown +
    pruning for free; callers filter/select immediately after.

    events.parquet has shipped with two physical types for `ts` across
    driver testdata generations: TIMESTAMP(NANOS) (rejected by Spark's
    reader unless read as long) and TIMESTAMP(MICROS) without UTC
    adjustment (read as TIMESTAMP_NTZ, which Spark 4 won't cast to
    numeric). Normalize both to session-zone TIMESTAMP so downstream
    epoch arithmetic (`ts.cast("long")`) and the DuckDB oracle (naive
    timestamps, session tz pinned to UTC) agree exactly.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type in ("bigint", "long"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # NTZ -> LTZ is wall-clock-preserving under the UTC session tz.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition a tiny scan up to the session's parallelism.

    A small parquet fixture arrives as ONE input split, so CPU-heavy
    per-row stages (shingling, hashing, tokenizing) would run on one core
    while 31 idle. A bare repartition does NOT fix this: Catalyst pushes the
    downstream projection below the round-robin exchange, putting the heavy
    compute back into the single scan task. localCheckpoint materializes the
    spread rows and is an optimizer barrier, so later stages really run on
    all cores. At production scale the scan has plenty of splits and this is
    a no-op; when it does fire it materializes only the tiny input.
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p).localCheckpoint()
    return df
