"""File-corpus sources and export sinks — SURVEY §2.1 S6-S10, S15.

The reference reads whole objects off S3 (CSV with blanks preserved,
binary XML corpora via paginated listing) and writes CSV exports with an
optional Excel byte-order mark. Spark-first equivalents:

* object listing scan → ``spark.read.format("binaryFile")`` with a glob
  filter (S7, `debates_xml_to_csv_s3.py:22-41`) — the listing itself is
  distributed, no driver-side pagination loop;
* per-row document download → an Arrow-batched ``mapInPandas`` stage with
  retry + content sniff (S6, `table_speeches.py:213-227`), transport
  injected so tests run without a network;
* blank-preserving CSV reads (S8, ``dtype=str, keep_default_na=False`` —
  `table_gold_member_activity_yearly.py:149-151`);
* CSV export with optional UTF-8 BOM post-step (S10, `io_s3.py:104-107`);
* raw payload archival to the raw zone (S15, `table_members.py:71,119`).
"""

from __future__ import annotations

import glob as _glob
import json
import os
from typing import Any, Callable, Iterator, Optional

from pyspark.sql import DataFrame, SparkSession

_BOM = b"\xef\xbb\xbf"


def list_binary_files(spark: SparkSession, path: str,
                      ext: Optional[str] = None,
                      with_content: bool = True) -> DataFrame:
    """S7 — corpus listing scan. Returns (path, modificationTime, length
    [, content]) rows; the extension filter is pushed into the listing via
    pathGlobFilter so non-matching objects are never opened."""
    reader = spark.read.format("binaryFile")
    if ext:
        reader = reader.option("pathGlobFilter", f"*{ext}")
    df = reader.load(path)
    cols = ["path", "modificationTime", "length"]
    return df.select(*cols, "content") if with_content else df.select(*cols)


def fetch_documents(df: DataFrame, url_col: str,
                    fetcher: Callable[[str], bytes],
                    out_col: str = "content", attempts: int = 3,
                    sniff_prefix: bytes = b"<") -> DataFrame:
    """S6 — per-row document download as a distributed stage. ``fetcher``
    (url → bytes) is retried up to ``attempts`` times per row; a response
    that does not contain ``sniff_prefix`` in its first 500 bytes counts
    as a failed attempt (the reference's HTML-error-page guard). Failed
    rows get null content rather than failing the job."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.BinaryType())])

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents: list[Optional[bytes]] = []
            for url in pdf[url_col]:
                blob: Optional[bytes] = None
                for _ in range(attempts):
                    try:
                        data = fetcher(str(url))
                    except Exception:  # noqa: BLE001 — retry any transport error
                        continue
                    if data and sniff_prefix in data[:500]:
                        blob = data
                        break
                contents.append(blob)
            out = pdf.copy()
            out[out_col] = contents
            yield out

    return df.mapInPandas(fetch, schema=schema)


def read_csv_blank_preserving(spark: SparkSession, path: str) -> DataFrame:
    """S8 — CSV read with the reference's ``dtype=str,
    keep_default_na=False`` semantics: every column is a string and an
    empty field stays '' instead of becoming null."""
    return (
        spark.read.option("header", True)
        .option("inferSchema", False)
        .option("nullValue", "\u0000")  # no field maps to null
        .option("emptyValue", "")
        .csv(path)
        .na.fill("")
    )


def clean_column_name(name: str) -> str:
    """P3 — one legacy CSV header → a safe snake identifier
    (`process/debate_speeches_csv_to_parquet.py:35-44`): strip+lower,
    whitespace/hyphens → underscore, DROP everything outside [a-z0-9_]
    (accents are removed, not folded — reference behavior), collapse and
    trim underscores; an empty result becomes 'col'."""
    import re

    s = str(name).strip().lower()
    s = re.sub(r"[\s\-]+", "_", s)
    s = re.sub(r"[^a-z0-9_]", "", s)
    s = re.sub(r"_+", "_", s).strip("_")
    return s or "col"


def normalize_column_names(df: DataFrame) -> DataFrame:
    """P3 — normalize every column name, suffixing collisions ``_2, _3…``
    in first-seen order (`debate_speeches_csv_to_parquet.py:47-63`). Rename
    is pure metadata (one projection node, no data movement), so arbitrary
    legacy CSVs can be ingested at any scale."""
    seen: set[str] = set()
    renamed: list[str] = []
    for c in df.columns:
        base = clean_column_name(c)
        candidate, i = base, 2
        while candidate in seen:
            candidate = f"{base}_{i}"
            i += 1
        seen.add(candidate)
        renamed.append(candidate)
    return df.toDF(*renamed)


def write_csv_export(df: DataFrame, path: str, *, bom: bool = False,
                     single_file: bool = False) -> None:
    """S10 — CSV export sink. ``bom=True`` prepends the UTF-8 BOM to every
    part file afterwards (Excel consumers, `io_s3.py:106`); the rewrite is
    a driver-side prefix splice per part file, not a data rewrite.
    ``single_file=True`` coalesces to one part — export-sized tables only
    (the reference's CSVs are single objects)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)
    if bom:
        parts = _glob.glob(os.path.join(path, "part-*.csv"))
        if not parts:
            # glob runs on the DRIVER's local filesystem: an s3://-style
            # path (or a compression codec changing the extension) matches
            # nothing, and a silent no-op would hand Excel consumers
            # BOM-less mojibake while the caller believes bom was applied
            raise RuntimeError(
                f"bom=True found no local part-*.csv under {path!r}; the "
                "BOM splice needs a driver-local uncompressed export — "
                "write locally, splice, then upload")
        for part in parts:
            with open(part, "rb") as f:
                data = f.read()
            if not data.startswith(_BOM):
                with open(part, "wb") as f:
                    f.write(_BOM + data)
                # The splice invalidates Hadoop's checksum sidecar; a stale
                # .crc makes the next spark.read.csv throw ChecksumException.
                crc = os.path.join(os.path.dirname(part),
                                   "." + os.path.basename(part) + ".crc")
                if os.path.exists(crc):
                    os.remove(crc)


def archive_raw_payload(payload: Any, root: str, table: str,
                        snapshot_date: str, run_id: str) -> str:
    """S15 — persist the full merged API payload into the raw zone beside
    the silver outputs (`table_members.py:71,119`), hive-style keys. The
    JSON is rendered deterministically (sorted keys) so re-runs of the
    same payload produce byte-identical archives."""
    dir_ = os.path.join(root, "raw", table,
                        f"snapshot_date={snapshot_date}", f"run_id={run_id}")
    os.makedirs(dir_, exist_ok=True)
    path = os.path.join(dir_, "page-00000.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(payload, f, ensure_ascii=False, sort_keys=True,
                  separators=(",", ":"), default=str)
    return path
