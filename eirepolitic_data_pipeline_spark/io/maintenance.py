"""In-place dataset maintenance — reference S16 (`process/delete_s3_column.py`).

The reference ships a one-off utility that drops a single column from a
published CSV + Parquet pair in place (`delete_s3_column.py:56-74`), with
a STRICT switch: strict → error if the column is absent, lax → no-op.

Spark-first shape: read the dataset, `df.drop(col)`, rewrite atomically
(write to a sibling temp dir, then swap) — never rewrite a live path in
place, because a failed overwrite would destroy the only copy. Parquet
column drops are metadata-cheap to plan (the scan prunes to the kept
columns), and the rewrite parallelizes across partitions.
"""

from __future__ import annotations

import os
import shutil
import uuid


def delete_column(spark, path: str, column: str, *, fmt: str = "parquet",
                  strict: bool = False) -> bool:
    """Drop ``column`` from the dataset at ``path``, rewriting it in place.

    Returns True if the column existed and was removed; False for the lax
    no-op. ``strict=True`` raises instead of no-op'ing, mirroring the
    reference's STRICT=1 (`delete_s3_column.py:17-19,58,68`).
    """
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", True)
    df = reader.load(path)
    if column not in df.columns:
        if strict:
            raise ValueError(f"Column {column!r} not found in {path}")
        return False

    tmp = f"{path.rstrip('/')}__rewrite_{uuid.uuid4().hex[:8]}"
    writer = df.drop(column).write.format(fmt).mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", True)
    elif fmt == "parquet":
        writer = writer.option("compression", "snappy")
    writer.save(tmp)

    backup = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    return True


def compact_dataset(spark, path: str, *, target_file_bytes: int = 128 * 2**20,
                    fmt: str = "parquet") -> dict:
    """Small-file compaction: rewrite the dataset at ``path`` into files of
    ~``target_file_bytes`` each (beyond-ref; the standard remedy for the
    small-files problem every incremental-refresh layout accumulates —
    thousands of micro-batch part files turn scan planning and NameNode/
    listing pressure into the bottleneck long before data volume does).

    File count = ceil(on-disk bytes / target); the rewrite round-robins to
    exactly that many partitions and swaps atomically (temp dir + two
    renames — same crash-safe recipe as delete_column and the catalog's
    candidate swap). Returns {files_before, files_after, bytes} telemetry.
    """
    def _du(p):
        files = []
        for root, _dirs, names in os.walk(p):
            files += [os.path.join(root, n) for n in names
                      if not n.startswith(("_", "."))]
        return files, sum(os.path.getsize(f) for f in files)

    files_before, n_bytes = _du(path)
    n_files = max(1, -(-n_bytes // target_file_bytes))  # ceil
    df = spark.read.format(fmt).load(path)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    (df.repartition(n_files).write.format(fmt).mode("overwrite")
     .option("compression", "snappy").save(tmp))
    backup = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    files_after, _ = _du(path)
    return {"files_before": len(files_before),
            "files_after": len(files_after), "bytes": n_bytes}
