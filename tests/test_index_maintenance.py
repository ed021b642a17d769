"""Persisted IVF-PQ index maintenance (r10):

- ``refresh_ivf_pq_index`` appends an encoded delta into existing cell
  partitions and is byte-equivalent to rebuilding over base ∪ delta
  with the same frozen models (encode + cell assignment are row-wise
  functions of the model pair);
- serving from the refreshed index returns exactly what the in-memory
  composition serves over the full corpus;
- ``ivf_pq_index_drift`` reports the recall the index ACTUALLY serves
  on a held-out sample and flags a refit when it sags below the floor
  — the feedback loop the frozen-model append path deliberately lacks.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eirepolitic_data_pipeline_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test_index_maintenance", cores=4)
    yield s


def _emb(spark):
    return (spark.read.parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
            .filter(F.col("embedding").isNotNull()
                    & (F.size("embedding") > 0)
                    & ~F.exists("embedding", lambda x: x.isNull())))


@pytest.fixture(scope="module")
def models(spark):
    from eirepolitic_data_pipeline_spark.operators.vectors import ivf_pq_fit
    emb = _emb(spark)
    cents, books = ivf_pq_fit(emb, k_coarse=4, m=4, k_sub=8, iters=1)
    return emb, cents, books


def test_refresh_appends_equivalently_to_full_rebuild(spark, models,
                                                      tmp_path):
    from eirepolitic_data_pipeline_spark.operators.similarity import (
        refresh_ivf_pq_index, write_ivf_pq_index)
    from eirepolitic_data_pipeline_spark.operators.vectors import pq_encode
    emb, cents, books = models
    base = emb.filter(F.col("vec_id") >= 100)
    delta = emb.filter(F.col("vec_id") < 100)
    assert base.count() > 0 and delta.count() > 0

    refreshed = str(tmp_path / "idx_refreshed")
    write_ivf_pq_index(pq_encode(base, books), books, cents, refreshed)

    def snapshot(path):
        # size AND mtime_ns per parquet file: an in-place rewrite with
        # identical byte length must still fail the append-only
        # assertion (the stress tool's check, mirrored here — r10
        # ADVICE: the old >=2-files assertion was nearly vacuous)
        out = {}
        for d, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(d, f)
                    st = os.stat(p)
                    out[p] = (st.st_size, st.st_mtime_ns)
        return out

    resident = snapshot(refreshed)
    assert resident, "build wrote no parquet files"
    refresh_ivf_pq_index(delta, books, cents, refreshed)
    after = snapshot(refreshed)

    full = str(tmp_path / "idx_full")
    write_ivf_pq_index(pq_encode(emb, books), books, cents, full)

    def rows(path):
        return sorted(
            (r["vec_id"], tuple(r["codes"]), r["cell"])
            for r in spark.read.parquet(path).collect())
    got, want = rows(refreshed), rows(full)
    assert got == want and len(got) == emb.count()
    # append-only maintenance, asserted on the files: every resident
    # base file survives byte- and mtime-identical, and the delta
    # landed exclusively as NEW files
    assert all(after.get(p) == st for p, st in resident.items())
    assert set(after) > set(resident)


def test_serving_after_refresh_matches_inmemory(spark, models, tmp_path):
    from eirepolitic_data_pipeline_spark.operators.similarity import (
        knn_ivf_adc, knn_ivf_pq_index, refresh_ivf_pq_index,
        write_ivf_pq_index)
    from eirepolitic_data_pipeline_spark.operators.vectors import pq_encode
    emb, cents, books = models
    path = str(tmp_path / "idx_serve")
    write_ivf_pq_index(pq_encode(emb.filter(F.col("vec_id") >= 100),
                                 books), books, cents, path)
    refresh_ivf_pq_index(emb.filter(F.col("vec_id") < 100), books, cents,
                         path)
    queries = emb.filter(F.col("vec_id") < 5)
    kw = dict(k=5, m=10, centroids=cents, nprobe=2, vectors=emb)
    served = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in knn_ivf_pq_index(spark.read.parquet(path), books,
                                  queries, **kw).collect())
    inmem = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in knn_ivf_adc(pq_encode(emb, books), books, queries,
                             **kw).collect())
    assert served == inmem and len(served) > 0


def test_drift_report_contract(spark, models, tmp_path):
    from eirepolitic_data_pipeline_spark.operators.similarity import (
        ivf_pq_index_drift, write_ivf_pq_index)
    from eirepolitic_data_pipeline_spark.operators.vectors import pq_encode
    emb, cents, books = models
    path = str(tmp_path / "idx_drift")
    write_ivf_pq_index(pq_encode(emb, books), books, cents, path)
    index = spark.read.parquet(path)
    dim = len(emb.select("embedding").first()[0])
    # 8 servable sample queries + 1 the quantizer cannot key
    queries = (emb.filter(F.col("vec_id") < 8)
               .select("vec_id", "embedding")
               .unionByName(spark.createDataFrame(
                   [(990001, [0.5] * (dim - 1))],
                   "vec_id long, embedding array<double>")))
    row = ivf_pq_index_drift(index, books, cents, emb, queries, k=5,
                             nprobe=2, recall_floor=1.0).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_queries"] == 9
    # the malformed query is unservable — it probes nothing and emits
    # no recall row (the ann_recall universe contract)
    assert r["n_servable"] == 8
    assert 0.0 <= r["min_recall"] <= r["mean_recall"] <= 1.0
    # the flag is literally (mean_recall < floor) when anything served
    assert r["refit_recommended"] == (r["mean_recall"] < 1.0)
    ok = ivf_pq_index_drift(index, books, cents, emb, queries, k=5,
                            nprobe=2, recall_floor=0.0).first()
    assert not ok["refit_recommended"]
    with pytest.raises(ValueError, match="recall_floor"):
        ivf_pq_index_drift(index, books, cents, emb, queries,
                           recall_floor=1.5)


def test_drift_report_flags_no_servable_queries(spark, models, tmp_path):
    from eirepolitic_data_pipeline_spark.operators.similarity import (
        ivf_pq_index_drift, write_ivf_pq_index)
    from eirepolitic_data_pipeline_spark.operators.vectors import pq_encode
    emb, cents, books = models
    path = str(tmp_path / "idx_drift_none")
    write_ivf_pq_index(pq_encode(emb, books), books, cents, path)
    dim = len(emb.select("embedding").first()[0])
    unservable = spark.createDataFrame(
        [(990001, [0.5] * (dim - 1)), (990002, None)],
        "vec_id long, embedding array<double>")
    r = ivf_pq_index_drift(spark.read.parquet(path), books, cents, emb,
                           unservable, k=5, recall_floor=0.0).first()
    assert r["n_servable"] == 0 and r["refit_recommended"]


def test_fused_build_matches_decode_assign_recipe(spark, models, tmp_path):
    """The r10 one-pass build kernel (codeword gather + nearest-centroid
    argmin fused into the write) emits EXACTLY the rows of the r9
    recipe it replaced — centroid_cells_frame over the pq_decode
    reconstructions joined back to the codes — and drops the same
    unservable rows."""
    from eirepolitic_data_pipeline_spark.operators.similarity import (
        centroid_cells_frame, write_ivf_pq_index)
    from eirepolitic_data_pipeline_spark.operators.vectors import (
        pq_decode, pq_encode)
    from pyspark.sql import functions as FF
    emb, cents, books = models
    codes = pq_encode(emb, books).unionByName(spark.createDataFrame(
        [(880001, None), (880002, [0, 1]), (880003, [0, None, 1, 2])],
        "vec_id long, codes array<int>"))
    path = str(tmp_path / "idx_fused_parity")
    write_ivf_pq_index(codes, books, cents, path)
    got = sorted((r["vec_id"], tuple(r["codes"]), int(r["cell"]))
                 for r in spark.read.parquet(path).collect())
    # the reference recipe on the SERVABLE universe only: ANSI getItem
    # THROWS on a wrong-arity code array, so the r9 decode+assign path
    # could never even express the drop the docstring promised — the
    # fused kernel's pre-filter is the contract, the recipe is the
    # cell-parity pin
    servable = codes.filter(
        FF.col("codes").isNotNull() & (FF.size("codes") == 4)
        & ~FF.exists("codes", lambda x: x.isNull()))
    cells = centroid_cells_frame(
        servable.select("vec_id",
                        pq_decode(FF.col("codes"), books).alias("__dqv")),
        cents, id_col="vec_id", vec_col="__dqv", cell_col="cell")
    want = sorted(
        (r["vec_id"], tuple(r["codes"]), int(r["cell"]))
        for r in servable.join(cells.select("vec_id", "cell"), "vec_id")
        .collect())
    assert got == want and len(got) > 0
    assert not any(v in (880001, 880002, 880003) for v, _, _ in got)


def test_build_raises_on_model_mismatch(spark, models, tmp_path):
    from eirepolitic_data_pipeline_spark.operators.similarity import (
        write_ivf_pq_index)
    from eirepolitic_data_pipeline_spark.operators.vectors import pq_encode
    emb, cents, books = models
    codes = pq_encode(emb, books)
    with pytest.raises(ValueError, match="dimension"):
        write_ivf_pq_index(codes, books, [[0.0, 1.0]],
                           str(tmp_path / "idx_bad_cents"))
    with pytest.raises(Exception, match="codebook range"):
        # codes built with an 8-codeword model, decoded with a 2-codeword
        # slice — out-of-range gather must be loud, never a wrapped index
        small = [cb[:2] for cb in books]
        write_ivf_pq_index(codes, small, cents,
                           str(tmp_path / "idx_bad_books"))


def test_files_per_cell_spreads_hot_cells(spark, models, tmp_path):
    """files_per_cell is the hot-cell skew dial, and its contract is a
    BOUND: at most that many files per cell per build (the salt keys a
    cell across up to that many writer partitions; AQE may legally
    coalesce a small build below it). Default: exactly one file per
    cell. The single-cell index — every row in one hot cell — is where
    the salt must demonstrably split; rows are identical either way."""
    from eirepolitic_data_pipeline_spark.operators.similarity import (
        write_ivf_pq_index)
    from eirepolitic_data_pipeline_spark.operators.vectors import pq_encode
    emb, cents, books = models
    codes = pq_encode(emb, books)

    def layout(path):
        files = 0
        for d, _, fs in os.walk(path):
            files += sum(1 for f in fs if f.endswith(".parquet"))
        rows = sorted((r["vec_id"], tuple(r["codes"]), r["cell"])
                      for r in spark.read.parquet(path).collect())
        return rows, files

    one = str(tmp_path / "idx_fpc1")
    two = str(tmp_path / "idx_fpc2")
    write_ivf_pq_index(codes, books, cents, one)
    write_ivf_pq_index(codes, books, cents, two, files_per_cell=2)
    rows1, files1 = layout(one)
    rows2, files2 = layout(two)
    assert rows1 == rows2 and len(rows1) > 0
    n_cells = len({c for _, _, c in rows1})
    assert files1 == n_cells
    assert files2 <= 2 * n_cells
    # one hot cell holding the whole corpus: the salt must split it
    hot1 = str(tmp_path / "idx_hot1")
    hot4 = str(tmp_path / "idx_hot4")
    write_ivf_pq_index(codes, books, [cents[0]], hot1)
    write_ivf_pq_index(codes, books, [cents[0]], hot4, files_per_cell=4)
    rh1, fh1 = layout(hot1)
    rh4, fh4 = layout(hot4)
    assert rh1 == rh4 and {c for _, _, c in rh4} == {0}
    assert fh1 == 1
    assert 1 < fh4 <= 4
    with pytest.raises(ValueError, match="files_per_cell"):
        write_ivf_pq_index(codes, books, cents,
                           str(tmp_path / "idx_fpc0"), files_per_cell=0)


def test_compaction_bounds_files_and_preserves_serving(spark, models,
                                                       tmp_path):
    """After several refresh cycles each cell holds one file per cycle;
    compact_ivf_pq_index rewrites every cell partition back to ~one
    file — same rows, same cell dirs (pruning untouched), and the
    pruned serve returns the identical result set."""
    from eirepolitic_data_pipeline_spark.operators.similarity import (
        compact_ivf_pq_index, knn_ivf_pq_index, refresh_ivf_pq_index,
        write_ivf_pq_index)
    from eirepolitic_data_pipeline_spark.operators.vectors import pq_encode
    emb, cents, books = models
    path = str(tmp_path / "idx_compact")
    write_ivf_pq_index(pq_encode(emb.filter(F.col("vec_id") >= 300),
                                 books), books, cents, path)
    for lo, hi in ((200, 300), (100, 200), (0, 100)):
        refresh_ivf_pq_index(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            books, cents, path)

    def state(p):
        files, dirs = 0, set()
        for d, _, fs in os.walk(p):
            files += sum(1 for f in fs if f.endswith(".parquet"))
            dirs.update(x for x in (os.path.basename(d),)
                        if x.startswith("cell="))
        rows = sorted((r["vec_id"], tuple(r["codes"]), r["cell"])
                      for r in spark.read.parquet(p).collect())
        return rows, files, dirs

    queries = emb.filter(F.col("vec_id") < 5)
    kw = dict(k=5, m=10, centroids=cents, nprobe=2, vectors=emb)
    rows0, files0, dirs0 = state(path)
    served0 = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in knn_ivf_pq_index(spark.read.parquet(path), books,
                                  queries, **kw).collect())
    n_cells = len(dirs0)
    assert files0 > n_cells, "refreshes should have multiplied files"

    tel = compact_ivf_pq_index(spark, path)
    rows1, files1, dirs1 = state(path)
    assert tel["files_before"] >= files0  # _du counts sidecars too
    assert files1 == n_cells == tel["partitions"]
    assert dirs1 == dirs0 and rows1 == rows0
    served1 = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in knn_ivf_pq_index(spark.read.parquet(path), books,
                                  queries, **kw).collect())
    assert served1 == served0 and len(served1) > 0


def test_drift_pins_queries_at_construction(spark, models, tmp_path):
    """The whole report reads ONE collected snapshot of the queries
    frame (r10 review): rows appended to the queries source between
    construction and action must not appear in the truth side — they
    would score as served-misses and spuriously fire the refit flag."""
    from eirepolitic_data_pipeline_spark.operators.similarity import (
        ivf_pq_index_drift, write_ivf_pq_index)
    from eirepolitic_data_pipeline_spark.operators.vectors import pq_encode
    emb, cents, books = models
    idx = str(tmp_path / "idx_qpin")
    write_ivf_pq_index(pq_encode(emb, books), books, cents, idx)
    qsrc = str(tmp_path / "queries_src")
    emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding") \
       .write.parquet(qsrc)
    report = ivf_pq_index_drift(spark.read.parquet(idx), books, cents,
                                emb, spark.read.parquet(qsrc), k=5,
                                nprobe=2, recall_floor=1.0)
    # the race: more queries land in the source AFTER construction
    emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 40)) \
       .select("vec_id", "embedding").write.mode("append").parquet(qsrc)
    r = report.first()
    assert r["n_queries"] == 8 and r["n_servable"] == 8, r


def test_query_batch_contract_enforced(spark, models, tmp_path):
    """The serving contract is structural, not prose (r11): every
    persisted-path driver-side collect of the queries frame —
    probe-union pruning (flat + residual serve) and the drift report's
    truth pin — refuses a frame larger than ``max_query_rows`` with a
    loud ValueError BEFORE materializing it (the overage probe collects
    at most max+1 rows), and is bit-identical under the limit."""
    from eirepolitic_data_pipeline_spark.operators.similarity import (
        ivf_pq_index_drift, knn_ivf_pq_index, knn_ivf_rpq_index,
        write_ivf_pq_index, write_ivf_rpq_index)
    from eirepolitic_data_pipeline_spark.operators.vectors import (
        ivf_pq_fit_residual, pq_encode)
    emb, cents, books = models
    path = str(tmp_path / "idx_contract")
    write_ivf_pq_index(pq_encode(emb, books), books, cents, path)
    index = spark.read.parquet(path)
    queries = emb.filter(F.col("vec_id") < 5)
    kw = dict(k=5, m=10, centroids=cents, nprobe=2, vectors=emb)

    # exactly at the limit: behavior unchanged (limit(n+1) returns all)
    base = sorted((r["query_id"], r["neighbor_id"], r["rank"])
                  for r in knn_ivf_pq_index(index, books, queries,
                                            **kw).collect())
    at_limit = sorted((r["query_id"], r["neighbor_id"], r["rank"])
                      for r in knn_ivf_pq_index(
                          index, books, queries, max_query_rows=5,
                          **kw).collect())
    assert at_limit == base and len(base) > 0

    # one past the limit: loud, at construction, on every collect site
    with pytest.raises(ValueError, match="max_query_rows"):
        knn_ivf_pq_index(index, books, queries, max_query_rows=4, **kw)
    with pytest.raises(ValueError, match="max_query_rows"):
        ivf_pq_index_drift(index, books, cents, emb, queries, k=5,
                           nprobe=2, max_query_rows=4)
    rcents, rbooks = ivf_pq_fit_residual(emb, k_coarse=4, m=4, k_sub=8,
                                         iters=1)
    rpath = str(tmp_path / "idx_contract_r")
    write_ivf_rpq_index(emb, rbooks, rcents, rpath)
    with pytest.raises(ValueError, match="max_query_rows"):
        knn_ivf_rpq_index(spark.read.parquet(rpath), rbooks, queries,
                          k=5, m=10, centroids=rcents, nprobe=2,
                          vectors=emb, max_query_rows=4)
    with pytest.raises(ValueError, match="max_query_rows"):
        knn_ivf_pq_index(index, books, queries, max_query_rows=0, **kw)
