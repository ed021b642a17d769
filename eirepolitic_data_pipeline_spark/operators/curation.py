"""Dataset-curation operators: deterministic splits, hash sampling, and
token-budget sequence packing — the selection/layout stages of a
training-data pipeline.

Everything here is DETERMINISTIC — no RNG, no row-order dependence — for
three reasons that matter at 100 TB: re-runs and retried tasks produce the
same assignment (speculative execution safe), incremental refreshes keep
every existing document in its original split (no silent train/test
contamination between snapshots), and any SQL engine can reproduce the
assignment for auditing (the md5-based bucket is plain arithmetic, not a
Spark-internal hash).

Split keys should be the LEAKAGE BOUNDARY, not the row id: splitting on
``source`` (site/domain/document-family) keeps near-duplicate rows from the
same origin on one side of the train/val fence — the standard guard against
benchmark contamination.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Bucket space for split/sample decisions. 10k gives 0.01% resolution.
BUCKETS = 10_000


def hash_bucket(col: Column | str, buckets: int = BUCKETS,
                salt: str = "") -> Column:
    """Uniform deterministic bucket in [0, buckets): first 8 hex chars of
    md5(salt || key) as an integer, mod buckets. Engine-portable: any SQL
    runtime computes the identical bucket (md5 + hex-to-int + mod).

    NULL keys map to the bucket of the literal "__null__" — deterministic
    and non-null, so NULL-key rows get a real split label and appear in
    samples instead of silently falling through every comparison."""
    c = F.col(col) if isinstance(col, str) else col
    key = F.coalesce(c.cast("string"), F.lit("__null__"))
    h8 = F.substring(F.md5(F.concat(F.lit(salt), key)), 1, 8)
    return F.pmod(F.conv(h8, 16, 10).cast("long"), F.lit(buckets)).cast("int")


def split_column(key: Column | str, weights: Mapping[str, float],
                 salt: str = "split") -> Column:
    """Split label from cumulative weight thresholds over the hash bucket.

    ``weights`` maps label -> fraction (must sum to ~1; the last label
    absorbs rounding). Same key + salt ⇒ same label, forever — append-only
    refreshes cannot migrate a document across the fence.
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights sum to {total}, expected 1")
    b = hash_bucket(key, BUCKETS, salt)
    labels = list(weights)
    out = F.lit(labels[-1])
    acc = 0.0
    ladder = []
    for name, wgt in zip(labels[:-1], [weights[k] for k in labels[:-1]]):
        acc += wgt
        ladder.append((name, int(round(acc * BUCKETS))))
    for name, threshold in reversed(ladder):
        out = F.when(b < threshold, F.lit(name)).otherwise(out)
    return out


def dataset_split(df: DataFrame, key_col: str,
                  weights: Mapping[str, float] | None = None,
                  salt: str = "split", out_col: str = "split") -> DataFrame:
    """Attach a deterministic, group-preserving split label keyed on
    ``key_col`` (use the leakage boundary — source/domain — not the row id).
    Pure projection: no shuffle, no state."""
    w = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    return df.withColumn(out_col, split_column(key_col, w, salt))


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                salt: str = "sample") -> DataFrame:
    """Deterministic ``fraction`` sample by hash bucket — re-runs select the
    SAME rows (unlike df.sample), and enlarging the fraction strictly grows
    the previous sample (nested samples for scaling-law runs)."""
    if not 0 < fraction <= 1:
        raise ValueError("fraction must be in (0, 1]")
    threshold = int(round(fraction * BUCKETS))
    return df.filter(hash_bucket(key_col, BUCKETS, salt) < threshold)


def pack_sequences(df: DataFrame, id_col: str, token_col: Column | str,
                   budget: int, shards: int = 32,
                   order_by: Sequence[str] | None = None) -> DataFrame:
    """Token-budget sequence packing: assign each document to a (shard,
    batch) so each batch's cumulative token count stays near ``budget``.

    Deterministic contiguous packing: documents are sharded by
    ``pmod(id, shards)`` (so packing parallelizes — one sequential scan per
    shard, never a global order), ordered within the shard by ``order_by``
    (default: the id), and cut into batches where the running token total
    crosses a budget multiple: ``batch_id = floor(cum_before / budget)``.
    A batch may overflow by at most one document — the standard streaming-
    packer guarantee; oversized single documents get batches of their own.

    One window shuffle on the shard key; batch sizes are bounded by
    ``budget + max_doc_tokens`` regardless of corpus size.
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    order = list(order_by) if order_by else [id_col]
    out = df.withColumn("__shard", F.pmod(F.col(id_col), F.lit(shards)).cast("int"))
    w = (Window.partitionBy("__shard").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (out
            .withColumn("__cum", F.sum(tok).over(w))
            .withColumn("batch_id",
                        F.floor((F.col("__cum") - tok) / budget).cast("int"))
            .withColumnRenamed("__shard", "shard")
            .drop("__cum"))
