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
