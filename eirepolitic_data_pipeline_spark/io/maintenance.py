"""In-place dataset maintenance — reference S16 (`process/delete_s3_column.py`)
plus small-file compaction.

All rewrites go through io/atomic.py's crash-safe swap (fixed-suffix temp +
two renames + heal-on-next-touch): a failed rewrite NEVER leaves the live
path destroyed, and a crash mid-swap is recoverable because the backup sits
at a deterministic suffix the next run can find — unlike a random-suffix
backup dir, which no later run can tell from garbage.
"""

from __future__ import annotations

import os
import re

from . import atomic

_HIVE_DIR_RE = re.compile(r"^[^=/]+=[^/]*$")


def _hive_partition_dirs(path: str) -> list[str]:
    """Top-level hive partition entries (``col=value`` dirs) under path.

    Atomic-swap siblings are NOT partitions: ``col=value.__replaced`` /
    ``.__incoming`` match the ``k=v`` shape, but treating them as leaves
    would (a) compact a stranded backup under a bogus partition value and
    (b) never heal the crashed leaf it belongs to — so each genuine leaf is
    healed here, BEFORE the listing decides what exists (a leaf whose only
    copy sits at ``.__replaced`` would otherwise be invisible)."""
    swap_suffixes = (atomic.INCOMING_SUFFIX, atomic.REPLACED_SUFFIX)
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    for n in names:
        # a dir named 'col=value.__replaced' with no live 'col=value'
        # sibling is a crashed leaf swap — restore it (writer-side heal)
        if n.endswith(atomic.REPLACED_SUFFIX):
            atomic.heal_interrupted_swap(
                os.path.join(path, n[: -len(atomic.REPLACED_SUFFIX)]))
    return sorted(n for n in os.listdir(path)
                  if _HIVE_DIR_RE.match(n)
                  and not n.endswith(swap_suffixes)
                  and os.path.isdir(os.path.join(path, n)))


#: Spark bucket files carry the bucket id after the task uuid:
#: part-00000-<uuid>_00003.c000.snappy.parquet
_BUCKET_FILE_RE = re.compile(r"_\d{5}\.c\d+")


def _refuse_bucketed_layout(path: str, op: str):
    """In-place rewrites must not touch a BUCKETED dataset: a plain rewrite
    silently drops the bucket file layout while any catalog manifest (or
    session-catalog entry) still CLAIMS the clustering — and a reader that
    trusts a false bucketing claim produces wrong join results, not just a
    slow plan. Re-layout bucketed tables through a bucketed write
    (io/bucketing.py or the catalog's bucket_by path) instead."""
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return
    for n in names:
        if _BUCKET_FILE_RE.search(n):
            raise ValueError(
                f"{op}: {path} holds BUCKETED data files ({n!r}); an "
                "in-place plain rewrite would break the clustering its "
                "manifest records — rewrite through a bucketed write "
                "instead")


def _swap_rewrite(df, path: str, fmt: str):
    tmp = atomic.incoming_path(path)
    writer = df.write.format(fmt).mode("errorifexists")
    if fmt == "csv":
        writer = writer.option("header", True)
    elif fmt == "parquet":
        writer = writer.option("compression", "snappy")
    writer.save(tmp)
    atomic.swap_in(path)


def delete_column(spark, path: str, column: str, *, fmt: str = "parquet",
                  strict: bool = False) -> bool:
    """Drop ``column`` from the dataset at ``path``, rewriting it in place.

    Returns True if the column existed and was removed; False for the lax
    no-op. ``strict=True`` raises instead of no-op'ing, mirroring the
    reference's STRICT=1 (`delete_s3_column.py:17-19,58,68`).

    Hive-partitioned layouts recurse PER LEAF PARTITION, same as
    compact_dataset and for the same reason: reading the root folds the
    ``col=value`` dirs into inferred typed data columns and a flat rewrite
    would destroy the layout (pruning gone) and silently canonicalize the
    partition-value spellings. Deleting a partition column itself is
    refused — that is a re-layout, not a column delete.
    """
    parts = _hive_partition_dirs(path)
    if parts:
        if any(p.split("=", 1)[0] == column for p in parts):
            raise ValueError(
                f"{column!r} is a hive PARTITION column of {path}; deleting "
                "it changes the physical layout — rewrite via "
                "compact/re-partition instead")
        removed = False
        for p in parts:
            removed |= delete_column(spark, os.path.join(path, p),
                                     column, fmt=fmt, strict=False)
        if strict and not removed:
            raise ValueError(f"Column {column!r} not found in {path}")
        return removed
    atomic.heal_interrupted_swap(path)
    _refuse_bucketed_layout(path, "delete_column")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", True)
    df = reader.load(path)
    if column not in df.columns:
        if strict:
            raise ValueError(f"Column {column!r} not found in {path}")
        return False
    _swap_rewrite(df.drop(column), path, fmt)
    return True


def compact_dataset(spark, path: str, *, target_file_bytes: int = 128 * 2**20,
                    fmt: str = "parquet") -> dict:
    """Small-file compaction: rewrite the dataset at ``path`` into files of
    ~``target_file_bytes`` each (beyond-ref; the standard remedy for the
    small-files problem every incremental-refresh layout accumulates —
    thousands of micro-batch part files turn scan planning and listing
    pressure into the bottleneck long before data volume does).

    Hive-partitioned layouts are compacted PER LEAF PARTITION (each
    ``col=value`` subtree recursed independently): reading the root and
    rewriting flat would fold the partition dirs into inferred typed data
    columns and destroy both the layout and the string-typed partition
    values. Leaf-wise compaction touches only files inside each partition
    dir, so layout, pruning, and partition-value spelling are untouched.

    File count per leaf = ceil(on-disk bytes / target); the rewrite
    round-robins to exactly that many partitions and swaps atomically.
    Returns {files_before, files_after, bytes, partitions} telemetry.
    """
    parts = _hive_partition_dirs(path)
    if parts:
        total = {"files_before": 0, "files_after": 0, "bytes": 0,
                 "partitions": 0}
        for p in parts:
            sub = compact_dataset(spark, os.path.join(path, p),
                                  target_file_bytes=target_file_bytes,
                                  fmt=fmt)
            for k in total:
                total[k] += sub[k]
        return total

    atomic.heal_interrupted_swap(path)
    _refuse_bucketed_layout(path, "compact_dataset")

    def _du(p):
        files = []
        for root, _dirs, names in os.walk(p):
            files += [os.path.join(root, n) for n in names
                      if not n.startswith(("_", "."))]
        return files, sum(os.path.getsize(f) for f in files)

    files_before, n_bytes = _du(path)
    n_files = max(1, -(-n_bytes // target_file_bytes))  # ceil
    reader = spark.read.format(fmt)
    if fmt == "csv":
        # MUST match _swap_rewrite's header=True: a headerless read of a
        # headered CSV turns every file's header line into a data row and
        # rewrites the columns as _c0/_c1/... — corrupting the dataset
        reader = reader.option("header", True)
    df = reader.load(path)
    _swap_rewrite(df.repartition(n_files), path, fmt)
    files_after, _ = _du(path)
    return {"files_before": len(files_before),
            "files_after": len(files_after), "bytes": n_bytes,
            "partitions": 1}
