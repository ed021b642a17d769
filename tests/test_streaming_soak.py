"""Long-lived streaming soak: streaming_merge_sink under a REAL
processing-time trigger over a growing file source — multiple epochs, one
FORCED writer failure mid-run, then a checkpoint restart — asserting the
final table equals the batch-merge of the same input (exactly-once table
contents through at-least-once delivery and epoch replay).

This is the integration-level twin of tests/test_fault_injection.py: that
file proves each interruption point of the write path in isolation; this
one proves the whole loop (source → watermark dedup → foreachBatch →
accumulate merge → crash → checkpoint replay) converges.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from eirepolitic_data_pipeline_spark.io.catalog import BatchCatalog, CatalogError
from eirepolitic_data_pipeline_spark.io.writers import MergeWriter
from eirepolitic_data_pipeline_spark.operators.merge import WritePolicy
from eirepolitic_data_pipeline_spark.streaming.jobs import streaming_merge_sink

SCHEMA = ("event_id long, user_id long, event_type string, ts timestamp, "
          "value double")
POLICY = WritePolicy(mode="upsert", primary_key=["event_id"])
POISON_ID = 666


def _file(spark, src_dir, name, rows):
    """One parquet file == one micro-batch under maxFilesPerTrigger=1."""
    df = spark.createDataFrame(rows, SCHEMA)
    tmp = os.path.join(src_dir, f"_{name}")
    df.coalesce(1).write.parquet(tmp)
    part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    os.rename(os.path.join(tmp, part), os.path.join(src_dir, f"{name}.parquet"))
    for leftover in os.listdir(tmp):
        os.remove(os.path.join(tmp, leftover))
    os.rmdir(tmp)


def _rows(spark, catalog, batch_id):
    try:
        return {r["event_id"]: r["value"] for r in
                catalog.read_table(spark, "events_live",
                                   batch_id=batch_id).collect()}
    except (CatalogError, Exception):
        return {}


def _wait_for(predicate, timeout=120):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if predicate():
            return True
        time.sleep(0.5)
    return False


class FailOnceWriter:
    """Delegates to MergeWriter but raises the FIRST time the poison row
    arrives — the foreachBatch exception kills the streaming query, so the
    restart must replay that epoch from the checkpoint."""

    def __init__(self, inner):
        self.inner = inner
        self.failed_once = False

    def write(self, df, table, policy, batch_id, **kw):
        if (not self.failed_once
                and df.filter(F.col("event_id") == POISON_ID).count() > 0):
            self.failed_once = True
            raise RuntimeError("injected epoch failure")
        return self.inner.write(df, table, policy, batch_id, **kw)


@pytest.mark.slow
def test_streaming_soak_with_failure_and_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    catalog = BatchCatalog(root=str(tmp_path / "wh"))
    writer = FailOnceWriter(MergeWriter(catalog=catalog, spark=spark))

    def start():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        return streaming_merge_sink(
            stream, writer, "events_live", POLICY, batch_id="soak",
            checkpoint_dir=ckpt, processing_interval="1 seconds")

    def ts(m):
        import datetime
        return datetime.datetime(2026, 1, 1, 0, m)

    # epochs 1+2 arrive while the query runs (growing source)
    _file(spark, src, "e1", [(1, 10, "click", ts(0), 1.0),
                             (2, 10, "view", ts(1), 2.0)])
    q = start()
    try:
        assert _wait_for(lambda: set(_rows(spark, catalog, "soak")) >= {1, 2})
        # NOTE: at-least-once REDELIVERIES carry identical rows — the
        # sink's dropDuplicatesWithinWatermark([id]) deliberately drops a
        # same-id re-arrival within the watermark, so an in-batch dup must
        # be byte-identical (a changed-value same-id row is out of the
        # delivery contract this sink absorbs)
        _file(spark, src, "e2", [(3, 11, "click", ts(3), 3.0),
                                 (3, 11, "click", ts(3), 3.0)])  # in-batch dup
        assert _wait_for(lambda: 3 in _rows(spark, catalog, "soak"))

        # epoch 3 carries the poison row: the injected writer failure must
        # kill the query (foreachBatch errors fail the stream, not the row)
        _file(spark, src, "e3", [(POISON_ID, 12, "buy", ts(4), 6.0),
                                 (4, 12, "click", ts(5), 4.0)])
        assert _wait_for(lambda: not q.isActive), "query survived the crash"
        assert writer.failed_once
        # the failed epoch must NOT have partially landed
        got = _rows(spark, catalog, "soak")
        assert POISON_ID not in got and 4 not in got
    finally:
        if q.isActive:
            q.stop()

    # restart from the SAME checkpoint: the dead epoch replays and is
    # absorbed; a further epoch keeps flowing after recovery
    q2 = start()
    try:
        assert _wait_for(
            lambda: {POISON_ID, 4} <= set(_rows(spark, catalog, "soak")))
        _file(spark, src, "e4", [(5, 13, "view", ts(6), 5.0),
                                 (1, 10, "click", ts(0), 1.0)])  # replayed row
        assert _wait_for(lambda: 5 in _rows(spark, catalog, "soak"))
    finally:
        q2.stop()
        q2.awaitTermination(60)

    # exactly-once table contents: equal to the one-shot batch merge of the
    # SAME input files through the same sink (4 epochs, duplicates included)
    batch_catalog = BatchCatalog(root=str(tmp_path / "wh_batch"))
    batch_writer = MergeWriter(catalog=batch_catalog, spark=spark)
    all_rows = spark.read.schema(SCHEMA).parquet(src)
    streaming_merge_sink(all_rows, batch_writer, "events_live", POLICY,
                         batch_id="ref")
    expected = _rows(spark, batch_catalog, "ref")
    got = _rows(spark, catalog, "soak")
    assert got == expected == {1: 1.0, 2: 2.0, 3: 3.0, POISON_ID: 6.0,
                               4: 4.0, 5: 5.0}
    # no duplicate keys physically present
    df = catalog.read_table(spark, "events_live", batch_id="soak")
    assert df.count() == df.select("event_id").distinct().count() == 6
