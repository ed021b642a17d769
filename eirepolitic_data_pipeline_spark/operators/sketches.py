"""Mergeable-sketch rollups (beyond-ref): incremental distinct counts and
membership summaries that compose across refresh batches.

The reference recomputes every distinct-count metric from full history each
run (fine at 50k rows). At 100 TB the right shape is a MERGEABLE summary:
each refresh window aggregates its own slice into a sketch, sketches union
in dimension-sized work, and estimates read off the union — history is
never rescanned. Built on Spark 4's Apache DataSketches HLL bindings
(``hll_sketch_agg`` / ``hll_union_agg``), so sketch bytes written by one
job merge in any later job (or any other DataSketches-speaking engine).

Pattern (the incremental twin of A4 "distinct count per year"):

    per-batch:  b = hll_rollup(batch, ["year"], "member_code")
                b.write.parquet(f".../sketches/batch={id}")
    serving:    hll_estimate(hll_merge(read_all_sketches, ["year"]))
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: log2(k) for the HLL sketch: 12 → ~1.6% relative error, 4 KiB per group.
DEFAULT_LG_K = 12


def hll_rollup(df: DataFrame, keys: Sequence[str], col: str,
               lg_k: int = DEFAULT_LG_K,
               sketch_col: str = "distinct_sketch") -> DataFrame:
    """Per-key HLL sketch of ``col`` for ONE batch/window: a single
    map-side-combined aggregation; output is dimension-sized (one row per
    key group) with a binary sketch column."""
    return (df.groupBy(*keys)
            .agg(F.hll_sketch_agg(col, F.lit(lg_k)).alias(sketch_col)))


def hll_merge(sketches: DataFrame, keys: Sequence[str],
              sketch_col: str = "distinct_sketch") -> DataFrame:
    """Union per-batch sketch frames (stack them with unionByName first)
    back to one sketch per key group — dimension-sized work no matter how
    many batches or how large the original fact slices were.

    allowDifferentLgConfigK: batches written at different precisions merge
    at the coarser one instead of failing the refresh."""
    return (sketches.groupBy(*keys)
            .agg(F.hll_union_agg(F.col(sketch_col), F.lit(True))
                 .alias(sketch_col)))


def hll_estimate(sketches: DataFrame,
                 sketch_col: str = "distinct_sketch",
                 out_col: str = "approx_distinct") -> DataFrame:
    """Read the distinct-count estimate off each sketch (pure projection)."""
    return sketches.withColumn(
        out_col, F.hll_sketch_estimate(sketch_col)).drop(sketch_col)
