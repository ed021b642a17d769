"""True-streaming watermark integration: late data crossing the watermark
through a REAL multi-micro-batch readStream (file source, maxFilesPerTrigger=1,
availableNow), asserting window finalization, late-row drop, and state
eviction — the reference's overlap-window reprocessing semantics
(`process/oireachtas_refresh_inputs.py:109-117`) under Spark's native
watermark machinery instead of batch twins.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from eirepolitic_data_pipeline_spark.streaming import (
    dedup_events_stream,
    tumbling_event_counts,
)

SCHEMA = "event_id long, user_id long, event_type string, ts timestamp, value double"
T0 = "2026-01-01 00:00:00"


def _write_batches(spark, src_dir, batches):
    """Write each row-list as ONE parquet file into src_dir with strictly
    increasing mtimes, so the file streaming source (oldest-first) delivers
    them as separate micro-batches under maxFilesPerTrigger=1."""
    os.makedirs(src_dir, exist_ok=True)
    base = time.time() - 3600
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, SCHEMA).withColumn(
            "ts", F.col("ts").cast("timestamp"))
        sub = os.path.join(src_dir, f"b{i}")
        df.coalesce(1).write.parquet(sub)
        for name in os.listdir(sub):
            if name.endswith(".parquet"):
                os.rename(os.path.join(sub, name),
                          os.path.join(src_dir, f"batch_{i}.parquet"))
        os.utime(os.path.join(src_dir, f"batch_{i}.parquet"),
                 (base + i * 60, base + i * 60))
    # drop the empty helper dirs so the source only lists the data files
    for i in range(len(batches)):
        sub = os.path.join(src_dir, f"b{i}")
        for leftover in os.listdir(sub):
            os.remove(os.path.join(sub, leftover))
        os.rmdir(sub)


def _run(spark, src_dir, transform, name, output_mode, checkpoint):
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    q = (transform(stream).writeStream.format("memory").queryName(name)
         .outputMode(output_mode)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return q, spark.sql(f"SELECT * FROM {name}")


def _ts(minutes_from_t0):
    import datetime
    t0 = datetime.datetime.fromisoformat(T0)
    return t0 + datetime.timedelta(minutes=minutes_from_t0)


def test_tumbling_append_finalizes_windows_and_drops_late_rows(spark, tmp_path):
    """Append-mode tumbling agg: a window is emitted only once the watermark
    passes its end (proving watermark progression across micro-batches), and
    a late row arriving after that is DROPPED — the finalized count does not
    change."""
    on_time = [(1, 1, "click", _ts(10), 1.0), (2, 1, "click", _ts(20), 1.0)]
    advance = [(3, 2, "click", _ts(60 * 10), 1.0)]       # pushes watermark ~9h
    advance2 = [(5, 2, "click", _ts(60 * 10 + 1), 1.0)]  # extra batch: the
    # LATE-RECORD watermark lags one batch behind the EVICTION watermark
    # (Spark 3.4+ two-watermark design), so the hour-1 window must close two
    # batches before the late row for the drop to be observable
    too_late = [(4, 3, "click", _ts(15), 1.0)]           # hour-1 window, long closed
    _write_batches(spark, str(tmp_path / "src1"),
                   [on_time, advance, advance2, too_late])

    q, got = _run(
        spark, str(tmp_path / "src1"),
        lambda s: tumbling_event_counts(s, window="1 hour", watermark="1 hour"),
        "wm_tumbling", "append", str(tmp_path / "cp1"))

    rows = {r["window_start"]: r["n_events"] for r in got.collect()}
    first_window = _ts(0)
    # the first window was finalized and emitted (append mode requires the
    # watermark to have crossed its end) with ONLY the on-time rows
    assert rows.get(first_window) == 2
    # the late event_id=4 row (event time far below the watermark) was
    # dropped by the watermark, visible in the state operator metrics
    dropped = sum(op.get("numRowsDroppedByWatermark", 0)
                  for p in q.recentProgress for op in p["stateOperators"])
    assert dropped >= 1


def test_dedup_within_watermark_suppresses_then_evicts(spark, tmp_path):
    """dropDuplicatesWithinWatermark through a real stream: a re-delivered id
    inside the watermark horizon is suppressed; once the watermark passes,
    the id's dedup state is evicted (bounded state — the r3 fix this test
    pins end-to-end)."""
    b1 = [(1, 1, "click", _ts(0), 1.0), (2, 1, "click", _ts(1), 1.0)]
    b2 = [(1, 1, "click", _ts(2), 1.0),          # dup of id=1 inside horizon
          (5, 2, "click", _ts(30), 1.0)]
    b3 = [(6, 2, "click", _ts(60 * 10), 1.0)]    # advances watermark ~9h
    b4 = [(7, 2, "click", _ts(60 * 10 + 1), 1.0)]  # lets the lagged
    # late-record watermark catch up (see the two-watermark note above)
    b5 = [(1, 1, "click", _ts(3), 1.0)]          # dup far below watermark
    _write_batches(spark, str(tmp_path / "src2"), [b1, b2, b3, b4, b5])

    q, got = _run(
        spark, str(tmp_path / "src2"),
        lambda s: dedup_events_stream(s, id_col="event_id", watermark="1 hour"),
        "wm_dedup", "append", str(tmp_path / "cp2"))

    ids = [r["event_id"] for r in got.collect()]
    # within-horizon duplicate suppressed (id=1 once); the re-delivery far
    # below the watermark is late data, not a new row
    assert sorted(ids) == [1, 2, 5, 6, 7]
    # eviction proof: after the watermark jumped past b1/b2's event times,
    # their dedup state rows were removed — final state is smaller than the
    # number of distinct ids ever seen
    final_state = q.recentProgress[-1]["stateOperators"][0]["numRowsTotal"]
    assert final_state < 5
    evicted = sum(op.get("numRowsRemoved", 0)
                  for p in q.recentProgress for op in p["stateOperators"])
    assert evicted >= 1
    # and the below-watermark re-delivery was dropped as late input
    dropped = sum(op.get("numRowsDroppedByWatermark", 0)
                  for p in q.recentProgress for op in p["stateOperators"])
    assert dropped >= 1
