"""Streaming PCA-moments maintenance (r11): ``streaming_moments_sink``
folds each micro-batch's one-pass ``pca_moments`` into the running
sufficient statistic — q97's incremental-covariance contract driven by
a REAL multi-micro-batch readStream (file source, maxFilesPerTrigger=1,
availableNow).

Pinned: the streamed state equals the monolithic moment pass over the
same universe (exact n, float-reassociation-close sums), a refit from
the streamed state matches the monolithic ``pca_fit`` on the grid, a
REPLAYED epoch is skipped by its marker (double-counting an additive
statistic corrupts silently — worse than the index sink's duplicate
candidates), and the batch shape applies once.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eirepolitic_data_pipeline_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test_streaming_moments", cores=4)
    yield s


def _emb(spark):
    return (spark.read.parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
            .filter(F.col("embedding").isNotNull()
                    & (F.size("embedding") > 0)
                    & ~F.exists("embedding", lambda x: x.isNull()))
            .select("vec_id", F.col("embedding").cast("array<double>")
                    .alias("embedding")))


def _stream_dir(emb, tmp_path, name, splits=((100, 250), (250, 400))):
    src = str(tmp_path / name)
    for lo, hi in splits:
        (emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
         .coalesce(1).write.mode("append").parquet(src))
    return src


def test_streamed_moments_match_monolithic(spark, tmp_path):
    from eirepolitic_data_pipeline_spark.operators.vectors import (
        pca_fit, pca_fit_from_moments, pca_moments)
    from eirepolitic_data_pipeline_spark.streaming.jobs import (
        load_moments, streaming_moments_sink)
    emb = _emb(spark)
    path = str(tmp_path / "moments_state")

    # seed with a batch fold (the backfill shape — returns None)
    assert streaming_moments_sink(
        emb.filter(F.col("vec_id") < 100), path) is None

    src = _stream_dir(emb, tmp_path, "vec_src")
    stream = (spark.readStream.schema("vec_id long, embedding array<double>")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = streaming_moments_sink(stream, path,
                               checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert len(os.listdir(os.path.join(path, "_epochs"))) >= 2

    universe = emb.filter(F.col("vec_id") < 400)
    got = load_moments(path)
    mono = pca_moments(universe)
    assert got["n"] == mono["n"]
    assert np.allclose(got["s"], mono["s"], rtol=1e-12)
    assert np.allclose(got["S"], mono["S"], rtol=1e-12)
    # refit from the streamed state == monolithic fit on the grid
    g = pca_fit_from_moments(got, k=8)
    w = pca_fit(universe, k=8)
    assert np.allclose(g[0], w[0], atol=2e-6)
    assert np.allclose(g[1], w[1], atol=1e-4)
    assert np.allclose(g[2], w[2], atol=1e-5)


def test_replayed_epoch_skips_by_marker(spark, tmp_path):
    """Re-running the stream against a FRESH checkpoint replays the
    files as new epochs whose markers already exist — the additive
    state must not double-count."""
    from eirepolitic_data_pipeline_spark.operators.vectors import (
        pca_moments)
    from eirepolitic_data_pipeline_spark.streaming.jobs import (
        load_moments, streaming_moments_sink)
    emb = _emb(spark)
    path = str(tmp_path / "moments_replay")
    src = _stream_dir(emb, tmp_path, "vec_replay")

    def run(ckpt):
        stream = (spark.readStream
                  .schema("vec_id long, embedding array<double>")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        streaming_moments_sink(
            stream, path,
            checkpoint_dir=str(tmp_path / ckpt)).awaitTermination(120)

    run("ckpt1")
    first = load_moments(path)
    run("ckpt2")  # fresh checkpoint: same epoch ids replay from zero
    again = load_moments(path)
    assert again == first
    mono = pca_moments(emb.filter((F.col("vec_id") >= 100)
                                  & (F.col("vec_id") < 400)))
    assert first["n"] == mono["n"]


def test_malformed_only_batch_marks_and_skips(spark, tmp_path):
    from eirepolitic_data_pipeline_spark.streaming.jobs import (
        streaming_moments_sink)
    path = str(tmp_path / "moments_empty")
    bad = spark.createDataFrame(
        [(1, None), (2, [])], "vec_id long, embedding array<double>")
    assert streaming_moments_sink(bad, path) is None
    assert not os.path.exists(os.path.join(path, "moments.json"))
