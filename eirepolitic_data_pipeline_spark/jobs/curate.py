"""`curate` — end-to-end corpus-curation entry point over
``operators.curation.curate_corpus`` (the flagship LLM-training-data
recipe), giving the composed quality→line-dedup→exact→near-dup→
decontaminate→split chain the same one-command ergonomics `build_table`
gives the registry tables:

    python -m eirepolitic_data_pipeline_spark.jobs.curate \
        --input /data/documents --output /data/curated \
        [--benchmark /data/benchmarks] \
        [--splits train=0.98,val=0.01,test=0.01] \
        [--partition-by-split] [--report report.json] [--test-limit 500]

Behavioral contract:

- the OUTPUT write is crash-safe: the curated parquet is written to the
  ``io.atomic`` incoming sibling and renamed into place, so an
  interrupted run leaves the previous curated dataset untouched (and a
  prior interrupted swap is healed before the new write starts);
- ``--report`` emits per-stage attrition counts (rows surviving each
  curation stage) plus per-split row/token totals. Stage counting
  persists each intermediate frame so the chain is computed ONCE — the
  stage frames feed both the counts and the next stage — never
  re-derived per count;
- ``--partition-by-split`` lays the output out hive-style by the split
  label (``split=train/``…), so downstream training readers prune to
  their split at the parquet-scan level instead of filtering 100 TB;
- ``--test-limit`` is the reference's P11 test-mode semantics (cap input
  rows before any heavy stage) applied to curation.

Scale: everything heavy happens inside the already-stress-tested
operators (STRESS.md: curate-corpus end-to-end section); this module
adds only argument plumbing, one pass of bounded aggregates for the
report, and a driver-side rename.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.atomic import incoming_path, swap_in
from ..operators.curation import curate_corpus_stages


def parse_split_weights(spec: str) -> dict[str, float]:
    """``train=0.98,val=0.01,test=0.01`` → ordered label→fraction dict.
    Validation (labels non-empty/unique, fractions numeric, sum ≈ 1) is
    split between here and ``split_column`` — duplicates must be caught
    HERE because a dict literal would silently keep only the last one."""
    weights: dict[str, float] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, eq, frac = part.partition("=")
        name = name.strip()
        if not eq or not name:
            raise ValueError(f"bad split spec {part!r} (want label=fraction)")
        if name in weights:
            raise ValueError(f"duplicate split label {name!r}")
        try:
            weights[name] = float(frac)
        except ValueError:
            raise ValueError(f"bad fraction for split {name!r}: {frac!r}")
    if not weights:
        raise ValueError("empty --splits spec")
    return weights


def _atomic_parquet_write(df: DataFrame, output: str,
                          partition_by: Sequence[str] = ()) -> None:
    """Write ``df`` as parquet into ``output`` via the engine's crash-safe
    rename protocol: the previous dataset (if any) stays live until the
    replacement is fully written."""
    tmp = incoming_path(output)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    if partition_by and not any(
            name.endswith(".parquet")
            for _root, _dirs, files in os.walk(tmp) for name in files):
        # a 0-row partitionBy write emits only _SUCCESS (no data files, so
        # no schema to infer) — committing it would replace the previous
        # dataset with an UNREADABLE path and crash the read-back below.
        # Rewrite as one empty unpartitioned file that carries the schema.
        df.limit(0).write.mode("overwrite").parquet(tmp)
    if os.path.isdir(output):
        swap_in(output)
    else:
        parent = os.path.dirname(os.path.abspath(output))
        os.makedirs(parent, exist_ok=True)
        os.rename(tmp, output)


def run_curate(spark: SparkSession, input_path: str, output_path: str, *,
               text_col: str = "text", id_col: str = "doc_id",
               source_col: str = "source",
               benchmark_path: Optional[str] = None,
               min_tokens: int = 5, min_alpha_ratio: float = 0.5,
               max_line_df: int = 100, near_dup_threshold: float = 0.7,
               near_dup_hashes: int = 32, near_dup_band_rows: int = 4,
               split_weights: Optional[Mapping[str, float]] = None,
               partition_by_split: bool = False,
               report: bool = False,
               test_limit: Optional[int] = None) -> dict:
    """Run the curation recipe ``input_path`` → ``output_path`` and return
    a summary dict (always: output path + final row count; with
    ``report=True``: per-stage attrition + per-split rows/tokens)."""
    docs = spark.read.parquet(input_path)
    missing = [c for c in (id_col, text_col, source_col)
               if c not in docs.columns]
    if missing:
        raise ValueError(
            f"input {input_path} lacks column(s) {missing}; available: "
            f"{docs.columns}. Map names with --id-col/--text-col/"
            "--source-col (for a single-source corpus point --source-col "
            "at any stable grouping column — it is the split's leakage "
            "boundary, so the row id is a LAST resort).")
    if test_limit is not None:
        docs = docs.limit(test_limit)

    benchmark = (spark.read.parquet(benchmark_path)
                 if benchmark_path else None)
    if benchmark is not None and text_col not in benchmark.columns:
        raise ValueError(f"benchmark {benchmark_path} lacks column "
                         f"{text_col!r}; available: {benchmark.columns}")

    summary: dict = {"input": input_path, "output": output_path}
    stages: list[dict] = []
    persisted: list[DataFrame] = []
    curated = None
    try:
        for name, frame in curate_corpus_stages(
                docs, text_col=text_col, id_col=id_col,
                source_col=source_col, benchmark=benchmark,
                min_tokens=min_tokens, min_alpha_ratio=min_alpha_ratio,
                max_line_df=max_line_df,
                near_dup_threshold=near_dup_threshold,
                near_dup_hashes=near_dup_hashes,
                near_dup_band_rows=near_dup_band_rows,
                split_weights=split_weights):
            curated = frame
            if report and name != "split":
                # persist so the count AND the next stage reuse one
                # materialization; the final frame is counted via the
                # split rollup below instead of a second action
                frame.persist()
                stages.append({"stage": name, "rows": frame.count()})
            if frame.is_cached:
                # covers both this loop's persists and the three stage
                # boundaries the generator persists itself — once the
                # output parquet is committed the cache has served its
                # purpose, so the finally below releases every entry
                # (not just report-mode ones)
                persisted.append(frame)

        _atomic_parquet_write(
            curated, output_path,
            partition_by=("split",) if partition_by_split else ())

        if report:
            from ..functions.text import quality_features
            n_tok = quality_features(text_col)["n_tokens"]
            # one bounded aggregate over the COMMITTED files (reading
            # back what was written also verifies the swap landed)
            split_rows = (spark.read.parquet(output_path)
                          .groupBy("split")
                          .agg(F.count(F.lit(1)).alias("rows"),
                               F.sum(n_tok).alias("tokens"))
                          .collect())
            summary["stages"] = stages
            summary["splits"] = {
                r["split"]: {"rows": r["rows"], "tokens": int(r["tokens"] or 0)}
                for r in split_rows}
            summary["output_rows"] = sum(r["rows"] for r in split_rows)
        else:
            summary["output_rows"] = (
                spark.read.parquet(output_path).count())
    finally:
        for frame in persisted:
            frame.unpersist()
    return summary


def main(argv: Optional[Sequence[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="curate")
    ap.add_argument("--input", required=True,
                    help="parquet dir of documents")
    ap.add_argument("--output", required=True,
                    help="parquet dir for the curated corpus (atomically "
                         "replaced if it exists)")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--source-col", default="source",
                    help="leakage-boundary column the split is keyed on")
    ap.add_argument("--benchmark", default="",
                    help="parquet dir of benchmark docs to decontaminate "
                         "against")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--min-alpha-ratio", type=float, default=0.5)
    ap.add_argument("--max-line-df", type=int, default=100)
    ap.add_argument("--near-dup-threshold", type=float, default=0.7)
    ap.add_argument("--near-dup-hashes", type=int, default=32,
                    help="MinHash signature size (bands = hashes/band-rows)")
    ap.add_argument("--near-dup-band-rows", type=int, default=4)
    ap.add_argument("--splits", default="",
                    help="label=fraction[,label=fraction...]; default "
                         "train=0.98,val=0.01,test=0.01")
    ap.add_argument("--partition-by-split", action="store_true")
    ap.add_argument("--report", default="",
                    help="also compute per-stage attrition and per-split "
                         "row/token totals; write the summary JSON here "
                         "('-' = stdout only)")
    ap.add_argument("--test-limit", type=int, default=None,
                    help="cap input rows before curation (P11 test mode)")
    args = ap.parse_args(argv)

    weights = parse_split_weights(args.splits) if args.splits else None

    from ..session import get_spark
    spark = get_spark("curate")
    summary = run_curate(
        spark, args.input, args.output,
        text_col=args.text_col, id_col=args.id_col,
        source_col=args.source_col,
        benchmark_path=args.benchmark or None,
        min_tokens=args.min_tokens, min_alpha_ratio=args.min_alpha_ratio,
        max_line_df=args.max_line_df,
        near_dup_threshold=args.near_dup_threshold,
        near_dup_hashes=args.near_dup_hashes,
        near_dup_band_rows=args.near_dup_band_rows,
        split_weights=weights,
        partition_by_split=args.partition_by_split,
        report=bool(args.report),
        test_limit=args.test_limit)
    line = json.dumps(summary, sort_keys=True)
    print(line)
    if args.report and args.report != "-":
        with open(args.report, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
