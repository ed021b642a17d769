"""Ranking operators — SURVEY §2.6 W1/W2/W3/W5.

All orderings require an explicit unique tiebreak (reference pandas relies
on frame order; Spark must not)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_rank_in(df: DataFrame, partition: Sequence[str],
                  order_by: Sequence[Column], out_col: str) -> DataFrame:
    """W1/W2 — dense rank per partition (empty partition → global rank)."""
    w = (Window.partitionBy(*partition) if partition else Window.partitionBy(F.lit(1)))
    return df.withColumn(out_col, F.dense_rank().over(w.orderBy(*order_by)).cast("int"))


def top_n_per_group(df: DataFrame, partition: Sequence[str],
                    order_by: Sequence[Column], n: int,
                    rank_col: str = "rank") -> DataFrame:
    """W5 — top-N rows per group with rank retained."""
    w = Window.partitionBy(*partition).orderBy(*order_by)
    return (df.withColumn(rank_col, F.row_number().over(w).cast("int"))
            .filter(F.col(rank_col) <= n))


def argmax_per_group(df: DataFrame, partition: Sequence[str],
                     order_by: Sequence[Column]) -> DataFrame:
    """W3 — single best row per group (top_n with n=1, rank dropped)."""
    w = Window.partitionBy(*partition).orderBy(*order_by)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))
