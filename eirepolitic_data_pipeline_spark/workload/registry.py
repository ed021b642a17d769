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
    #: False for builders whose CONSTRUCTION materializes data (eager
    #: localCheckpoint): memoizing those would turn the workload's
    #: plan-reuse memo into result caching — see workload.__init__._tuned.
    memoize: bool = True


QUERIES: dict[str, Query] = {}

# Runtime-settable SQL confs the engine's plans assume. The bench/test
# harnesses get these from session.get_spark, but the driver's correctness
# gate hands us a PLAIN session (Spark defaults: 200 shuffle partitions,
# cached plans pinning their shuffle partitioning). On a tiny fixture that
# turns every mart stage into hundreds of near-empty tasks — measured 48s vs
# ~3s for the yearly mart at sf0.01 — so each query entry re-applies the
# confs idempotently before building its plan. All of them are per-session
# SQL confs (safe to set at runtime, no core/cluster settings touched).
_SESSION_CONFS = (
    ("spark.sql.adaptive.enabled", "true"),
    ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
    ("spark.sql.adaptive.skewJoin.enabled", "true"),
    # Without this a .cache() pins the cached sub-plan's 200-partition
    # shuffle; with it AQE re-plans cached frames like everything else.
    ("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"),
    ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    # The oracle comparison assumes naive-UTC timestamp semantics.
    ("spark.sql.session.timeZone", "UTC"),
)


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime SQL confs to a caller-provided session."""
    conf = spark.conf
    n = max(spark.sparkContext.defaultParallelism, 8)
    for k, v in _SESSION_CONFS + (("spark.sql.shuffle.partitions", str(n)),):
        try:
            if conf.get(k, None) != v:
                conf.set(k, v)
        except Exception:  # pragma: no cover - read-only/unknown conf
            pass
    return spark


def register(name: str, sql: Optional[str], survey_ref: str = "",
             memoize: bool = True):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""
    def deco(fn):
        QUERIES[name] = Query(name=name, fn=fn, sql=sql,
                              survey_ref=survey_ref, memoize=memoize)
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


def scan_partitions(df: DataFrame) -> int:
    """The scan's ACTUAL partition count — not ``len(df.inputFiles())``:
    Spark bin-packs small files into few splits (maxPartitionBytes /
    openCostInBytes), so a directory of many tiny files can still arrive
    as one or two partitions and a file-count check would skip the
    fan-out exactly when it is needed. Converting to the RDD instantiates
    the plan's RDD lineage on the driver (no job runs); that cost is paid
    once per fan-out decision on fixture-scale frames only — at
    production scale the caller's threshold is already met."""
    return df.rdd.getNumPartitions()


#: Per-slice input-byte densities for ``spread`` — how many SCAN bytes one
#: task should own, by the cost of the work that runs above the exchange
#: (r11 optimization round, guide §2/§6: derive the fan-out from input
#: size, never from a core-count constant).
#:
#: TEXT: per-row Python/interpreted work (shingling, md5 loops, tokenize)
#: dominates the bytes, but the r11 16 KB density (full 32-way fan-out
#: at sf0.1) over-split: the driver's r11 scaling block measured
#: q22/q24/q25/q50/q54/q61 FASTER on 8 cores than 32 — per-task
#: scheduling + Python-worker round trips beat the per-row CPU the
#: extra width bought. The r12 density sweep at 32 cores
#: (tools/width_sweep.py over all 19 text sites, densities
#: 16K/40K/80K/160K = widths 32/15/8/4 at sf0.1) put the family
#: optimum at 80 KB/slice — q22 0.68→0.41 s, q61 1.49→0.94, q69
#: 1.77→0.99, q70 1.80→1.11, q64 1.36→0.96, q62/q63/q74/q77 all
#: better, nothing meaningfully worse (q63/q23 "losses" in one walk
#: did not reproduce over 5 reps: 4.03→3.79 and 1.47→1.15 medians).
#: 80 KB also matches the 8-core cap (ceil(594 KB / 80 KB) = 8), so
#: the 8-beats-32 inversion disappears by construction at this SF.
#: Env-overridable (r12): the density is a measured host-dependent
#: trade (per-row kernel CPU vs per-task scheduling+Python-worker
#: cost), so production deployments tune it per cluster without a code
#: change; the default keeps the driver's bench comparable.
TEXT_SLICE_BYTES = int(os.environ.get("SPARK_GRAFT_TEXT_SLICE_BYTES",
                                      80 << 10))
#: VEC: downstream is vectorized Arrow/numpy kernels and bounded folds —
#: per-row cost is tiny, so wide fan-outs only buy task-scheduling and
#: Python-worker overhead. Measured at sf0.1 (2 000 x 64 embeddings, 32
#: cores): the fused Lloyd pass runs 0.95-1.0 s at width 32 vs 0.57 s at
#: width 8, and the serving-fold chains 1.2-2.0 s at 32 vs 0.56 s at 8.
#: Env-overridable (r12), same rationale as TEXT_SLICE_BYTES.
VEC_SLICE_BYTES = int(os.environ.get("SPARK_GRAFT_VEC_SLICE_BYTES",
                                     96 << 10))
#: KERNEL: chains whose repeated corpus passes are Arrow numpy kernels
#: (Lloyd/PQ/moments fits, projection/covariance kernels, the batch
#: cogroup serves). Each kernel pass pays a fixed per-task
#: Python-worker round trip, so these chains want FEWER, larger slices
#: than the interpreted-fold serves above. r12 density sweep
#: (96K/224K/448K/896K = widths 9/4/2/1 at the 798 KB sf0.1 scan, 32
#: cores, medians of 3): width 4 is the optimum — q91 4.25→3.31,
#: q73 1.17→0.93, q87/q88/q90/q92/q96 and the whole PCA/JL family
#: (q94–q101, −4% to −18%) best at 224 KB, set total 24.7→21.9 s;
#: width 2 over-narrows the serving joins. The interpreted-fold
#: chains measured the OPPOSITE (q37 0.51→0.83 at width 4), hence the
#: split; at production scale both are no-ops once the scan has more
#: splits than the derived width.
KERNEL_SLICE_BYTES = int(os.environ.get("SPARK_GRAFT_KERNEL_SLICE_BYTES",
                                        224 << 10))


def spread(df: DataFrame, per_slice_bytes: int | None = None) -> DataFrame:
    """Round-robin repartition a tiny scan up to a SIZE-DERIVED width.

    A small parquet fixture arrives as ONE input split, so CPU-heavy
    per-row stages (shingling, hashing, tokenizing) would run on one core
    while 31 idle. A bare repartition is sufficient: on Spark 4.x the
    heavy downstream operators (Project with scalar chains, Generate,
    MapInPandas — all three probed on 4.1.2) plan ABOVE the
    REPARTITION_BY_NUM exchange, which AQE never coalesces, so the compute
    genuinely fans out. No localCheckpoint: an eager materialization at
    plan-construction time would pin non-recoverable blocks for the
    session and break the workload memo's plan-reuse-not-result-caching
    contract (workload.__init__._tuned). At production scale the scan has
    plenty of splits and this is a no-op.

    ``per_slice_bytes`` (r11 optimization round) derives the width from
    the scan's estimated input size — ``min(parallelism,
    ceil(size / per_slice_bytes))`` — instead of the flat parallelism
    constant, so cheap vectorized-kernel consumers (``VEC_SLICE_BYTES``)
    stop paying 32-task scheduling and Python-worker fan-out for a
    2 000-row frame while CPU-dense text consumers (``TEXT_SLICE_BYTES``)
    keep every core. The size estimate comes from the optimized plan's
    Catalyst statistics (driver-side metadata, no job). ``None``
    preserves the original full-parallelism behavior."""
    p = df.sparkSession.sparkContext.defaultParallelism
    want = p
    if per_slice_bytes:
        est = int(str(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
        want = min(p, max(1, -(-est // per_slice_bytes)))
    if want > 1 and df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
