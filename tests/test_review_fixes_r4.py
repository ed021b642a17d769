"""Regression tests for the round-4 enrich/io/streaming review findings:
each test reproduces the reviewed failure scenario against the fix."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from eirepolitic_data_pipeline_spark.io.catalog import BatchCatalog, CatalogError


def test_parse_scores_honors_custom_id_key():
    from eirepolitic_data_pipeline_spark.enrich.batch_scoring import (
        parse_scores)
    text = '[{"sentence_id": "a", "score": 50}, {"sentence_id": "b", "score": 999}]'
    out = parse_scores(text, ["a", "b"], id_key="sentence_id")
    assert out == {"a": 50, "b": 100}          # clamped to hi
    # the old hardcoded key would see every id missing
    with pytest.raises(ValueError, match="Missing"):
        parse_scores(text, ["a", "b"])


def test_merge_writer_new_table_after_promote(spark, tmp_path):
    """First write of a NEW table after a batch was promoted must treat the
    production absence as no-history, not crash on PATH_NOT_FOUND."""
    from eirepolitic_data_pipeline_spark.io.writers import MergeWriter
    from eirepolitic_data_pipeline_spark.operators.merge import WritePolicy
    catalog = BatchCatalog(root=str(tmp_path / "wh"))
    writer = MergeWriter(catalog=catalog, spark=spark)
    pol = WritePolicy(mode="upsert", primary_key=("k",))
    df = spark.createDataFrame([(1, "x")], "k long, v string")
    writer.write(df, "members", pol, batch_id="b1")
    catalog.promote("b1", ["members"])
    merged = writer.write(df, "photos", pol, batch_id="b2")  # NEW table
    assert merged.count() == 1
    catalog.promote("b2", ["photos"])


def test_rollback_refuses_unpromoted_batch(spark, tmp_path):
    from eirepolitic_data_pipeline_spark.io.writers import MergeWriter
    from eirepolitic_data_pipeline_spark.operators.merge import WritePolicy
    catalog = BatchCatalog(root=str(tmp_path / "wh"))
    writer = MergeWriter(catalog=catalog, spark=spark)
    pol = WritePolicy(mode="upsert", primary_key=("k",))
    df = spark.createDataFrame([(1, "x")], "k long, v string")
    writer.write(df, "t", pol, batch_id="b1")
    catalog.promote("b1", ["t"])
    writer.write(df, "t", pol, batch_id="b2")   # open candidate, mutable
    with pytest.raises(CatalogError, match="never promoted"):
        catalog.rollback("b2")
    catalog.rollback("b1")                       # promoted target is fine


def test_delete_column_preserves_hive_layout(spark, tmp_path):
    from eirepolitic_data_pipeline_spark.io.maintenance import delete_column
    path = str(tmp_path / "ds")
    df = spark.createDataFrame(
        [(1, "a", "2026-8-1"), (2, "b", "2026-08-02")],
        "k long, junk string, snapshot_date string")
    df.write.partitionBy("snapshot_date").parquet(path)
    assert delete_column(spark, path, "junk") is True
    # partition dirs survive with their ORIGINAL value spelling
    dirs = sorted(d for d in os.listdir(path) if d.startswith("snapshot"))
    assert dirs == ["snapshot_date=2026-08-02", "snapshot_date=2026-8-1"]
    back = spark.read.parquet(path)
    assert "junk" not in back.columns and back.count() == 2
    # deleting the partition column itself is a re-layout — refused
    with pytest.raises(ValueError, match="PARTITION"):
        delete_column(spark, path, "snapshot_date")


def test_streaming_merge_sink_batch_mode_merges_without_writestream(
        spark, tmp_path):
    from eirepolitic_data_pipeline_spark.io.writers import MergeWriter
    from eirepolitic_data_pipeline_spark.operators.merge import WritePolicy
    from eirepolitic_data_pipeline_spark.streaming.jobs import (
        streaming_merge_sink)
    catalog = BatchCatalog(root=str(tmp_path / "wh"))
    writer = MergeWriter(catalog=catalog, spark=spark)
    pol = WritePolicy(mode="upsert", primary_key=("event_id",))
    batch = spark.createDataFrame(
        [("e1", "2026-08-13 10:00:00"), ("e1", "2026-08-13 10:00:00"),
         ("e2", "2026-08-13 11:00:00")],
        "event_id string, ts string").withColumn("ts", F.col("ts").cast("timestamp"))
    q = streaming_merge_sink(batch, writer, "events", pol, batch_id="b1")
    assert q is None                      # batch mode: applied once, no query
    got = catalog.read_table(spark, "events", batch_id="b1")
    assert got.count() == 2               # in-batch duplicate deduped


def test_llm_runner_null_ids_and_duplicate_existing(spark):
    from eirepolitic_data_pipeline_spark.enrich.llm import (
        LLMColumnConfig, LLMColumnRunner)
    def factory():
        return lambda prompt: "POSITIVE"
    cfg = LLMColumnConfig(
        output_col="sentiment", template="Classify: {text}",
        input_cols=["text"], allowed_values=("POSITIVE", "NEGATIVE"),
        id_col="id")
    runner = LLMColumnRunner(config=cfg, client_factory=factory)
    df = spark.createDataFrame(
        [(1, "good"), (None, "row without id"), (2, "fresh")],
        "id long, text string")
    # existing carries DUPLICATE rows for id=1 (two prior runs unioned)
    existing = spark.createDataFrame(
        [(1, "NEGATIVE"), (1, "NEGATIVE")], "id long, sentiment string")
    rows = runner.run(df, existing=existing).collect()
    assert len(rows) == 3                 # no multiplication, no vanishing
    out = {r["id"]: r["sentiment"] for r in rows}
    assert out[1] == "NEGATIVE" and out[2] == "POSITIVE"
    assert out[None] == cfg.fallback      # null id → fallback, row kept


def test_audio_peak_full_scale_negative(spark):
    import numpy as np
    from eirepolitic_data_pipeline_spark.enrich.multimodal import (
        audio_features, encode_raw_audio)
    blob = encode_raw_audio(np.array([-32768, 0, 100], dtype=np.int16))
    df = spark.createDataFrame([(1, "audio", bytearray(blob))],
                               "media_id long, kind string, content binary")
    row = audio_features(df).collect()[0]
    assert row["peak"] == 32768           # int16 abs would wrap to -32768


def test_public_profile_url_http_data_uri():
    from eirepolitic_data_pipeline_spark.enrich.scrape import (
        to_public_profile_url)
    assert to_public_profile_url(
        "http://data.oireachtas.ie/ie/oireachtas/member/id/X.Y/") \
        == "https://www.oireachtas.ie/en/members/member/X.Y/"
    assert to_public_profile_url(
        "https://data.oireachtas.ie/ie/oireachtas/member/id/X.Y") \
        == "https://www.oireachtas.ie/en/members/member/X.Y/"
