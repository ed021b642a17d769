"""The curate CLI (jobs/curate.py): end-to-end runs over a small corpus
with known duplicates/boilerplate, report telemetry, atomic replacement
of a previous output, and argument validation."""

from __future__ import annotations

import json
import os

import pytest

from eirepolitic_data_pipeline_spark.jobs.curate import (
    main, parse_split_weights, run_curate)
from eirepolitic_data_pipeline_spark.operators.curation import curate_corpus

BANNER = "subscribe to our newsletter today friends"
BODY = ("the quick brown fox jumps over the lazy dog near the river bank "
        "while the sun sets slowly behind the green hills of the valley")


def _corpus_rows():
    rows = []
    # 8 clean docs, unique content
    for i in range(8):
        rows.append((f"d{i:02d}", f"{BODY} unique marker number {i} "
                     f"appears here exactly once", f"site{i % 3}"))
    # exact duplicate pair -> one survivor
    rows.append(("dup_a", f"{BODY} duplicated content", "site0"))
    rows.append(("dup_b", f"{BODY} duplicated content", "site1"))
    # quality-gate victim: too short
    rows.append(("short", "tiny", "site0"))
    # quality-gate victim: non-alpha
    rows.append(("numeric", "1234 5678 9999 0000 1111 2222 3333", "site2"))
    # benchmark-contaminated doc
    rows.append(("contaminated", f"{BODY} famous benchmark question",
                 "site2"))
    return rows


@pytest.fixture()
def corpus_dir(spark, tmp_path):
    path = str(tmp_path / "documents")
    spark.createDataFrame(_corpus_rows(),
                          "doc_id string, text string, source string") \
        .coalesce(1).write.parquet(path)
    return path


@pytest.fixture()
def benchmark_dir(spark, tmp_path):
    path = str(tmp_path / "benchmark")
    spark.createDataFrame([("b1", f"{BODY} famous benchmark question")],
                          "bench_id string, text string") \
        .coalesce(1).write.parquet(path)
    return path


def test_run_curate_matches_library_recipe(spark, corpus_dir, tmp_path):
    out = str(tmp_path / "curated")
    summary = run_curate(spark, corpus_dir, out)
    expected = {r["doc_id"] for r in
                curate_corpus(spark.read.parquet(corpus_dir)).collect()}
    got = spark.read.parquet(out)
    assert {r["doc_id"] for r in got.collect()} == expected
    assert "split" in got.columns
    assert summary["output_rows"] == len(expected)
    # gate victims and one duplicate are gone
    assert "short" not in expected and "numeric" not in expected
    assert {"dup_a", "dup_b"} - expected  # at most one survivor


def test_report_stages_and_splits(spark, corpus_dir, benchmark_dir,
                                  tmp_path):
    out = str(tmp_path / "curated")
    summary = run_curate(spark, corpus_dir, out,
                         benchmark_path=benchmark_dir, report=True,
                         split_weights={"train": 0.5, "holdout": 0.5})
    names = [s["stage"] for s in summary["stages"]]
    assert names == ["quality_gate", "line_dedup", "exact_dedup",
                     "near_dup", "decontaminate"]
    rows = [s["rows"] for s in summary["stages"]]
    # attrition is monotone non-increasing and the gates actually bit
    assert rows == sorted(rows, reverse=True)
    assert rows[0] == 11          # 13 docs - short - numeric
    assert rows[-1] < rows[0]     # dup + contamination removed
    assert summary["output_rows"] == rows[-1]
    assert sum(v["rows"] for v in summary["splits"].values()) == rows[-1]
    for v in summary["splits"].values():
        assert v["tokens"] > 0
    assert set(summary["splits"]) <= {"train", "holdout"}
    # decontamination removed the planted doc
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert "contaminated" not in got


def test_atomic_replace_and_partitioning(spark, corpus_dir, tmp_path):
    out = str(tmp_path / "curated")
    # pre-existing output of a DIFFERENT shape must be replaced atomically
    spark.createDataFrame([("stale",)], "old string").write.parquet(out)
    run_curate(spark, corpus_dir, out, partition_by_split=True)
    got = spark.read.parquet(out)
    assert "old" not in got.columns
    subdirs = [d for d in os.listdir(out) if d.startswith("split=")]
    assert subdirs, "expected hive split= partition dirs"
    assert not os.path.isdir(out + ".__incoming")
    assert not os.path.isdir(out + ".__replaced")


def test_cli_main_writes_report(spark, corpus_dir, tmp_path, capsys):
    out = str(tmp_path / "curated")
    report = str(tmp_path / "report.json")
    rc = main(["--input", corpus_dir, "--output", out,
               "--splits", "train=0.9,val=0.1",
               "--report", report, "--test-limit", "12"])
    assert rc == 0
    stdout_line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    on_disk = json.loads(open(report).read())
    assert on_disk == stdout_line
    assert on_disk["output"] == out
    assert [s["stage"] for s in on_disk["stages"]][:2] == [
        "quality_gate", "line_dedup"]


def test_missing_column_errors(spark, corpus_dir, tmp_path):
    with pytest.raises(ValueError, match="lacks column"):
        run_curate(spark, corpus_dir, str(tmp_path / "x"),
                   source_col="nope")


def test_parse_split_weights():
    assert parse_split_weights("train=0.9,val=0.1") == {
        "train": 0.9, "val": 0.1}
    with pytest.raises(ValueError, match="duplicate"):
        parse_split_weights("a=0.5,a=0.5")
    with pytest.raises(ValueError, match="bad split spec"):
        parse_split_weights("a")
    with pytest.raises(ValueError, match="bad fraction"):
        parse_split_weights("a=x")
    with pytest.raises(ValueError, match="empty"):
        parse_split_weights(" ,")
