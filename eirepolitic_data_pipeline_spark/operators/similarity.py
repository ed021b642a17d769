"""Embedding similarity search: brute-force cosine top-k, LSH/IVF-bucketed
approximate nearest neighbors, and the compressed serving stack
(int8-dequantized and product-quantized two-stage kNN, up to the
fully-literal FAISS-shape IVFPQ ``knn_ivf_adc``) over an
``array<float>`` column.

The dot/norm folds are pure Catalyst higher-order functions (zip_with /
aggregate) — JVM-side, no Python, no UDF. For very wide vectors or very hot
paths a Pandas-UDF matmul variant is provided (Arrow-batched numpy dot) —
prefer it when k·dim work per row dominates over serialization. Corpus-sized
index builds (cells, codes) run as map-only Arrow kernels, parity-pinned to
their pure-Catalyst literal twins.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _finite2(rows: list[list[float]]) -> bool:
    """True when every value of a 2-level model is finite — the
    precondition for embedding it as repr-exact SQL text literals (the
    text builders' guard; non-finite models fall back to the Column
    path, which encodes them losslessly)."""
    import math
    return all(math.isfinite(float(x)) for r in rows for x in r)


def _sum_sql(arr_sql: str) -> str:
    """Sequential left-to-right double fold of an array SQL fragment —
    ``vectors._fold_sum``'s text twin."""
    return f"aggregate({arr_sql}, 0.0D, (acc, x) -> acc + x)"


def cosine_col(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array<double> columns (sequential fold).

    Zero-norm vectors score 0.0 ("orthogonal to everything"), not NaN:
    Spark orders NaN ABOVE every real number, so a single all-zero
    embedding would otherwise rank as the TOP neighbor of every query in
    the descending top-k windows downstream.

    Accepts Columns or column NAMES: two names parse the whole
    expression in ONE Py4J round trip instead of the ~150 the three
    lambda folds cost (r11 optimization round; identical analyzed tree
    and bit-identical doubles — the text lambdas are the same
    LambdaFunction nodes)."""
    if isinstance(a, str) and isinstance(b, str):
        from .vectors import _qident
        ra, rb = _qident(a), _qident(b)
        dot = _sum_sql(f"zip_with({ra}, {rb}, (x, y) -> x * y)")
        na = _sum_sql(f"transform({ra}, x -> x * x)")
        nb = _sum_sql(f"transform({rb}, x -> x * x)")
        return F.expr(f"CASE WHEN ({na} > 0) AND ({nb} > 0) "
                      f"THEN {dot} / (SQRT({na}) * SQRT({nb})) "
                      f"ELSE 0.0D END")
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    nb = F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    return F.when((na > 0) & (nb > 0),
                  dot / (F.sqrt(na) * F.sqrt(nb))).otherwise(F.lit(0.0))


def _scored_pairs_kernel(paired: DataFrame, a_id: str, b_id: str,
                         a_vec: str, b_vec: str,
                         out_col: str = "cosine") -> DataFrame:
    """Score an already-joined pair frame ``(a_id, b_id, a_vec, b_vec)``
    with an Arrow numpy kernel, FLOAT-IDENTICAL to
    ``cosine_col(a_vec, b_vec)`` (r12 optimization round, guide §4):
    the interpreted per-element HOF folds are the dominant per-row cost
    of every online serving stage 1 — at |queries|·|bucket| pairs the
    Catalyst ``aggregate``/``zip_with`` tree evaluates one expression
    node per element per row, where this kernel runs three
    dimension-ordered float64 accumulations per Arrow batch. The join
    that produced ``paired`` is untouched (broadcast joins stay
    map-side); only the scoring projection moves into the kernel.

    Bit-parity recipe (``_batch_stage1_kernel``'s proven one): dot and
    both norms accumulate dimension-by-dimension in float64 — exactly
    the sequential zip_with fold's float sequence — the final
    ``dot / (sqrt(na) * sqrt(nb))`` is the same two ops, and the guard
    mirrors Catalyst's ``CASE WHEN na > 0 AND nb > 0`` INCLUDING its
    NaN rule (Spark orders NaN above every real, so ``NaN > 0`` is
    TRUE and an NaN-element vector scores NaN, never 0.0).

    Malformed rows take a per-row slow path that reproduces the
    expression's NULL algebra exactly: a NULL vector or NULL element
    nulls its norm fold, failing the CASE guard to 0.0; two well-formed
    vectors of DIFFERENT lengths null the zip_with dot (Catalyst pads
    with NULL) and score NULL under a passing guard. ``mapInArrow``,
    not ``mapInPandas``: the pandas bridge collapses a NULL list
    element to NaN, erasing exactly the NULL-vs-NaN distinction the
    parity above depends on — Arrow validity masks keep it. The fast
    path covers every batch whose vectors are rectangular and
    NULL-free — the only shape real corpora have."""
    import math

    import numpy as np

    a_t = paired.schema[a_id].dataType.simpleString()
    b_t = paired.schema[b_id].dataType.simpleString()

    def _slow_row(q, x):
        def fold_sq(v):
            if v is None:
                return None
            acc = 0.0
            for e in v:
                if e is None:
                    return None
                acc += float(e) * float(e)
            return acc

        na, nb = fold_sq(q), fold_sq(x)
        # CASE WHEN (na > 0) AND (nb > 0) with Spark's NaN-above-all
        # ordering (NaN > 0 is TRUE); a NULL norm fails the guard to 0.0
        ok = ((na is not None and (na > 0 or na != na))
              and (nb is not None and (nb > 0 or nb != nb)))
        if not ok:
            return 0.0
        if len(q) != len(x):
            return None  # zip_with pads with NULL -> NULL dot
        acc = 0.0
        for qe, xe in zip(q, x):
            acc += float(qe) * float(xe)
        return acc / (math.sqrt(na) * math.sqrt(nb))

    def _flat_matrix(col, n):
        """(n, dim) float64 view of a NULL-free uniform-length
        list<double> Arrow array, or None when the shape disqualifies
        the fast path."""
        if col.null_count != 0:
            return None
        flat = col.flatten()
        if flat.null_count != 0 or n == 0:
            return None
        vals = flat.to_numpy(zero_copy_only=False)
        if len(vals) % n != 0:
            return None
        dim = len(vals) // n
        import pyarrow.compute as pc
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        if lens.min() != dim or lens.max() != dim:
            return None
        return vals.reshape(n, dim)

    def kernel(batches):
        import pyarrow as pa
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            idx = {name: i for i, name in enumerate(rb.schema.names)}
            ca, cb = rb.column(idx[a_vec]), rb.column(idx[b_vec])
            ia, ib = rb.column(idx[a_id]), rb.column(idx[b_id])
            Q = _flat_matrix(ca, n)
            X = _flat_matrix(cb, n)
            if Q is None or X is None or Q.shape[1] != X.shape[1]:
                cos = pa.array(
                    [_slow_row(q, x)
                     for q, x in zip(ca.to_pylist(), cb.to_pylist())],
                    type=pa.float64())
                yield pa.RecordBatch.from_arrays(
                    [ia, ib, cos], names=[a_id, b_id, out_col])
                continue
            dim = Q.shape[1]
            # dimension-ordered float64 accumulation: cosine_col's fold
            dot = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for d in range(dim):
                dot += Q[:, d] * X[:, d]
                na += Q[:, d] * Q[:, d]
                nb += X[:, d] * X[:, d]
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = dot / (np.sqrt(na) * np.sqrt(nb))
            good = ((np.greater(na, 0) | np.isnan(na))
                    & (np.greater(nb, 0) | np.isnan(nb)))
            cos = np.where(good, cos, 0.0)
            yield pa.RecordBatch.from_arrays(
                [ia, ib, pa.array(cos, type=pa.float64())],
                names=[a_id, b_id, out_col])

    return (paired.select(a_id, b_id, a_vec, b_vec)
            .mapInArrow(kernel, schema=f"{a_id} {a_t}, {b_id} {b_t}, "
                                       f"{out_col} double"))


def knn_bruteforce(vectors: DataFrame, queries: DataFrame, k: int,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id_col: str = "vec_id") -> DataFrame:
    """Exact top-k neighbors for each query vector.

    queries is expected tiny (it is broadcast); vectors can be arbitrarily
    large — the plan is scan × broadcast → per-row fold → window top-k,
    which scales linearly with |vectors|·|queries|.
    """
    v = vectors.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).cast("array<double>").alias("nv"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    # scoring via the Arrow pair kernel (r12, guide §4): the broadcast
    # join stays map-side; the |queries|·|corpus| interpreted cosine
    # folds — the stage's dominant cost — run as three vectorized
    # accumulations, float-identical to cosine_col (kernel docstring)
    pairs = (v.crossJoin(F.broadcast(q))
             .filter(F.col("neighbor_id") != F.col("query_id")))
    return (
        _scored_pairs_kernel(pairs, "query_id", "neighbor_id",
                             "qv", "nv")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _resolve_m(k: int, m) -> int:
    """Shared k/m validation of the compressed-serving family
    (knn_quantized_rerank / knn_pq_adc / knn_ivf_pq / knn_ivf_adc /
    knn_ivf_pq_index): k >= 1, m defaults to 4k, and the exact re-rank
    can only return candidates stage 1 kept (m >= k). One place (r9
    review: five hand-copies had already drifted — knn_ivf_pq's lost
    the k guard, silently returning empty for k=0)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if m is None:
        m = 4 * k
    if m < k:
        raise ValueError(f"m ({m}) must be >= k ({k}) — the exact re-rank "
                         "can only return candidates stage 1 kept")
    return m


def knn_quantized_rerank(quantized: DataFrame, queries: DataFrame, k: int,
                         m: Optional[int] = None,
                         vectors: Optional[DataFrame] = None,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         query_id_col: str = "vec_id") -> DataFrame:
    """Two-stage serving kNN over a COMPRESSED corpus — the IVF-PQ
    serving pattern (asymmetric distance computation, Jégou et al. 2011),
    composed from this repo's symmetric int8 codec: stage 1 scores every
    corpus row against the broadcast queries on the DEQUANTIZED vectors
    (``quantize_int8``'s ``(vec_id, scale, qvec)`` columns) and keeps the
    top-``m`` candidates per query; stage 2 re-ranks those
    |queries|·``m`` candidates EXACTLY against the full-precision
    ``vectors`` frame and emits the top-``k``. Output
    ``(query_id, neighbor_id, cosine, rank)`` — ``cosine`` exact when
    ``vectors`` is given, dequantized-approximate when ``vectors=None``
    (single-stage compressed search).

    Why this exists at 100 TB: the float64 embedding column is the
    dominant scan cost of every serving pass, and the int8 twin is ~8x
    narrower — so the corpus-wide stage reads the compressed table only,
    while full-precision vectors are touched for just |queries|·m rows
    via a broadcast-candidate join (never a second corpus scan of the
    wide column). Candidate quality is the codec's certified
    reconstruction (q72's mse contract); ``m`` > k buys back the
    neighbors the quantization grid blurs across the top-k boundary —
    the exactness knob, with m = |corpus| degenerating to brute force.

    Determinism: dequantization multiplies by the EMITTED 9-dp-rounded
    scale (the reproducibility pin of the codec), both rank cuts order
    by (cosine DESC, neighbor_id), and all cosines are the repo's
    sequential folds — the DuckDB oracle re-derives both stages
    bit-compatibly. Zero-scale (all-zero) vectors dequantize to zero and
    score 0.0 via ``cosine_col``'s zero-norm guard, never NaN.

    CONTRACT: ``quantized`` must be ``quantize_int8``'s verbatim output
    schema — the ``(vec_id, scale, qvec)`` column NAMES are fixed
    (``id_col``/``vec_col`` rename only the full-precision ``vectors``/
    ``queries`` frames; a quantized frame with renamed columns raises an
    AnalysisException rather than silently mis-joining). And ``vectors``
    must cover every id in ``quantized`` (stage 2's fetch is an inner
    join, so a candidate missing from the full-precision frame silently
    drops out of the top-k instead of erroring). Both in-repo callers
    derive the two frames from the same source, which satisfies this by
    construction."""
    m = _resolve_m(k, m)
    # zip against array_repeat(scale): when `quantized` is the
    # quantize_int8 PLAN (not a materialized table), referencing the
    # scale column inside an interpreted element lambda inlines its
    # whole array_max fold per ELEMENT (dim x dim work per row, r9);
    # array_repeat evaluates it once per row
    dq = F.zip_with(F.col("qvec"),
                    F.array_repeat(F.col("scale"), F.size("qvec")),
                    lambda x, s: x.cast("double") * s)
    v = quantized.select(F.col("vec_id").alias("neighbor_id"),
                         dq.alias("nv"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    cand = _compressed_topm(v, q, m)
    if vectors is None:
        return (cand.filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "cosine", "rank"))
    return _exact_rerank(cand.select("query_id", "neighbor_id"), q,
                         vectors, k, id_col, vec_col)


def knn_pca_rerank(vectors: DataFrame, queries: DataFrame, k: int,
                   mean: list, components: list,
                   m: Optional[int] = None,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id_col: str = "vec_id") -> DataFrame:
    """Two-stage serving kNN through a PCA-REDUCED stage 1 — the
    reduce-then-index pattern (project to the top-k' variance
    directions, generate candidates in the cheap space, re-rank
    exactly in the full space). The third member of the two-stage
    family next to ``knn_quantized_rerank`` (int8 codec stage 1) and
    ``knn_ivf_pq`` (cell-pruned ADC stage 1): here the compression is
    DIMENSIONALITY, so stage 1's per-candidate cosine fold costs k'
    multiplies instead of dim — at dim=512 and k'=32 the corpus-wide
    scan stage does ~16× less arithmetic and reads a ~16× narrower
    projection column, while stage 2 touches full-precision vectors
    for only |queries|·m rows via the broadcast-candidate join
    (``_exact_rerank`` — never a second corpus scan).

    ``(mean, components)`` is ``pca_fit``'s model pair (fit once,
    serve many — the kmeans/codebook lifecycle; pass
    ``whiten=True``'s output when the reduced-space metric should be
    Mahalanobis-like). Corpus projection is the map-only Arrow kernel
    (``pca_project``); the sample-sized query frame projects through
    the literal Catalyst twin (``pca_project_expr``, bit-identical by
    the family's parity pin) — the ``centroid_cells`` vs
    ``centroid_cells_frame`` split. Candidate quality is governed by
    ``m`` (default 4k): reduced-space cosine is a proxy ranking, and
    ``m`` > k buys back neighbors the projection blurs across the
    top-k boundary; ``m`` >= |corpus|−1 keeps every row in stage 1,
    making the output EXACTLY ``knn_bruteforce`` (test-pinned).
    Output ``(query_id, neighbor_id, cosine, rank)`` with exact
    full-space cosines."""
    from .vectors import pca_project, pca_project_expr

    m = _resolve_m(k, m)
    pv = pca_project(vectors, mean, components,
                     vec_col=vec_col, id_col=id_col)
    v = pv.select(F.col(id_col).alias("neighbor_id"),
                  F.col("projection").alias("nv"))
    q_red = queries.select(
        F.col(query_id_col).alias("query_id"),
        pca_project_expr(vec_col, mean, components).alias("qv"))
    cand = _compressed_topm(v, q_red, m)
    q_full = queries.select(F.col(query_id_col).alias("query_id"),
                            F.col(vec_col).cast("array<double>")
                            .alias("qv"))
    return _exact_rerank(cand.select("query_id", "neighbor_id"),
                         q_full, vectors, k, id_col, vec_col)


def _compressed_topm(v: DataFrame, q: DataFrame, m: int) -> DataFrame:
    """Stage 1 shared by the compressed serving operators
    (``knn_quantized_rerank``, ``knn_pq_adc``): score every row of the
    approximately-reconstructed corpus ``v`` = (neighbor_id, nv) against
    the broadcast raw-query frame ``q`` = (query_id, qv) and keep the
    top-``m`` per query. Projects down to (ids, cosine) BEFORE the top-m
    window: the window's exchange moves every scored corpus row, and
    carrying the query vector through it would ship a dim-sized payload
    per scored row — qv re-attaches after the cut from the
    (broadcast-small) query frame."""
    w_m = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    # Arrow pair kernel for the |queries|·|corpus| ADC scoring (r12,
    # guide §4) — the kernel's output IS the pre-window projection the
    # old explicit .select kept narrow, float-identical to cosine_col
    pairs = (v.crossJoin(F.broadcast(q))
             .filter(F.col("neighbor_id") != F.col("query_id")))
    return (_scored_pairs_kernel(pairs, "query_id", "neighbor_id",
                                 "qv", "nv")
            .withColumn("rank", F.row_number().over(w_m).cast("int"))
            .filter(F.col("rank") <= m))


def knn_pq_adc(codes: DataFrame, codebooks: list[list[list[float]]],
               queries: DataFrame, k: int,
               m: Optional[int] = None,
               vectors: Optional[DataFrame] = None,
               id_col: str = "vec_id", vec_col: str = "embedding",
               query_id_col: str = "vec_id") -> DataFrame:
    """Two-stage serving kNN over a PRODUCT-QUANTIZED corpus — the real
    PQ half of IVF-PQ (Jégou et al. 2011), where ``knn_quantized_rerank``
    substitutes the scalar int8 codec: stage 1 scores every corpus row's
    ``pq_decode`` reconstruction (each subspace's codeword, concatenated)
    against the broadcast RAW queries — asymmetric distance computation,
    exact query vs compressed corpus — and keeps the top-``m``
    candidates; stage 2 re-ranks those |queries|·m candidates EXACTLY
    against full precision and emits the top-``k``. Output
    ``(query_id, neighbor_id, cosine, rank)``; ``vectors=None`` skips
    the re-rank (single-stage compressed search, approximate cosines).

    Why PQ at 100 TB: the serving scan reads the ``(vec_id, codes)``
    table — m small ints per row against dim doubles, a 64x+ cut at the
    default shapes (m=4, dim=64) vs int8's 8x — plus the shared
    m·k·(dim/m)-double codebook, embedded in the projection as a
    2-level literal the decode looks up per subspace (m ``element_at``
    calls per row, not a per-(row, centroid) fold — decode is NOT the
    interpreted hot spot; the cosine fold is, same as every sibling).
    Candidate quality is the trained codebooks' reconstruction; ``m``
    (the candidate budget, distinct from the subspace count — named
    ``m`` in both papers' traditions, disambiguated by position) buys
    back neighbors the quantization blurs, with m = |corpus|
    degenerating to brute force over the re-rank.

    Determinism/parity: codes from ``pq_codes``/``pq_encode`` (kernel
    parity-pinned), decode concatenates ``round_dp``-rounded codewords
    (repr-exact literals), cosines are the repo's sequential folds, and
    both rank cuts order by (cosine DESC, neighbor_id) — the DuckDB
    oracle re-derives fit, encode, decode, and both stages.

    CONTRACT: ``codes`` must be ``pq_encode``'s verbatim
    ``(vec_id, codes)`` schema built with these ``codebooks`` (decode
    of mismatched codes throws under ANSI, see ``pq_decode``), and
    ``vectors`` must cover every id in ``codes`` (the re-rank fetch is
    an inner join — ``knn_quantized_rerank``'s contract)."""
    from .vectors import pq_decode

    m = _resolve_m(k, m)
    v = codes.select(F.col("vec_id").alias("neighbor_id"),
                     pq_decode("codes", codebooks).alias("nv"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    cand = _compressed_topm(v, q, m)
    if vectors is None:
        return (cand.filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "cosine", "rank"))
    return _exact_rerank(cand.select("query_id", "neighbor_id"), q,
                         vectors, k, id_col, vec_col)


def _exact_rerank(cand: DataFrame, q: DataFrame, vectors: DataFrame,
                  k: int, id_col: str, vec_col: str) -> DataFrame:
    """Stage 2 of the compressed-serving operators: exact top-``k`` over a
    small (query_id, neighbor_id) candidate frame. The candidate side is
    |queries|·m rows — broadcast (with ``qv`` re-attached from the
    broadcast-small query frame ``q`` = (query_id, qv)) so the
    full-precision fetch is a map-side join against the wide table, never
    a corpus shuffle."""
    xv = vectors.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).cast("array<double>").alias("xv"))
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    cand_q = cand.join(F.broadcast(q), "query_id")
    return (xv.join(F.broadcast(cand_q), "neighbor_id")
            .withColumn("cosine", cosine_col("xv", "qv"))
            .withColumn("rank", F.row_number().over(w_k).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def knn_ivf_pq(quantized: DataFrame, queries: DataFrame, k: int,
               centroids: list[list[float]], nprobe: int = 2,
               m: Optional[int] = None,
               vectors: Optional[DataFrame] = None,
               id_col: str = "vec_id", vec_col: str = "embedding",
               query_id_col: str = "vec_id") -> DataFrame:
    """The full IVF-PQ serving composition (Jégou et al. 2011; the FAISS
    IVFPQ shape), assembled from this repo's certified pieces: a trained
    coarse quantizer partitions the COMPRESSED corpus into centroid cells
    (``centroid_cells`` over a ``kmeans_fit`` model — q82's certified
    quantizer), each query probes its ``nprobe`` nearest cells
    (``centroid_probe_ranks``), candidates are scored on the DEQUANTIZED
    int8 vectors within the probed cells only (q83's certified
    compressed scoring through ``knn_lsh``'s bucket equi-join), the
    top-``m`` survive, and an exact re-rank against full precision emits
    the top-``k``. ``vectors=None`` skips the re-rank (single-stage
    compressed IVF search).

    Where the siblings sit: ``knn_quantized_rerank`` scores the WHOLE
    compressed corpus per query (exhaustive-PQ — bounded IO, linear
    compute); this operator adds the IVF candidate cut on top, so
    per-query compute tracks the probed cells' population, not the
    corpus. Probing every cell (nprobe >= k_centroids) degenerates to
    ``knn_quantized_rerank`` with the same ``m`` (test-pinned). Corpus
    cells are keyed on the dequantized vectors — self-consistent with
    the scoring at the codec's precision; a vector the codec cannot key
    (NULL/ragged) gets a NULL cell and drops from the index, the
    sign_lsh_bucket contract.

    Plan shape: one narrow scan of the (scale, qvec) table with corpus
    cells computed by the ARROW ASSIGNMENT KERNEL (map-only, vectorized —
    the ``centroid_cells`` literal expression is an interpreted
    per-(row, centroid) fold and measured ~100 s for 200k x 16 on the
    stress host; the kernel is parity-pinned to it, so the cells are
    identical), a bucket equi-join against the probed cells (work tracks
    cell population), the same pruned top-m window as q83 (ids + cosine
    only, map-side WindowGroupLimit), and the broadcast-candidate exact
    fetch. Queries — a sample-sized frame — key their home cell and probe
    ranking through the literal expressions. Rows the codec cannot key
    (NULL/wrong-dimension/NULL-element qvec) drop from the index, the
    same rows ``centroid_cells`` gives a NULL cell.

    Same ``quantized`` contract as ``knn_quantized_rerank``: the frame
    must carry ``quantize_int8``'s verbatim ``(vec_id, scale, qvec)``
    column names (``id_col``/``vec_col`` rename only the full-precision
    frames)."""
    m = _resolve_m(k, m)
    # zip against array_repeat(scale): when `quantized` is the
    # quantize_int8 PLAN (not a materialized table), referencing the
    # scale column inside an interpreted element lambda inlines its
    # whole array_max fold per ELEMENT (dim x dim work per row, r9);
    # array_repeat evaluates it once per row
    dq = F.zip_with(F.col("qvec"),
                    F.array_repeat(F.col("scale"), F.size("qvec")),
                    lambda x, s: x.cast("double") * s)
    # corpus cells via the shared frame-level kernel bucketer (r9): rows
    # the codec cannot key (NULL/wrong-dimension/NULL-element qvec, which
    # dequantize to the same malformed shapes) drop from the index there
    dq_frame = centroid_cells_frame(
        quantized.select("vec_id", dq.alias("__dqv")), centroids,
        id_col="vec_id", vec_col="__dqv", cell_col="__cell")
    return _ivf_compressed_serve(dq_frame, queries, k, centroids, nprobe,
                                 m, vectors, id_col, vec_col,
                                 query_id_col)


def _ivf_compressed_serve(dq_frame: DataFrame, queries: DataFrame, k: int,
                          centroids: list[list[float]], nprobe: int,
                          m: int, vectors: Optional[DataFrame],
                          id_col: str, vec_col: str,
                          query_id_col: str) -> DataFrame:
    """The IVF serving core shared by ``knn_ivf_pq`` (int8 corpus) and
    ``knn_ivf_adc`` (PQ-codes corpus): given the kernel-bucketed
    approximate corpus ``dq_frame`` = (vec_id, __dqv, __cell), run the
    probe → cell-equi-join → top-m → exact-re-rank chain. Queries keep
    their RAW vector under the shared column name — asymmetric distance
    computation: exact query against compressed corpus, the ADC scoring
    rule — and key their home cell through the literal expression
    (sample-sized, never the corpus)."""
    q_in = queries.select(F.col(query_id_col),
                          F.col(vec_col).cast("array<double>")
                          .alias("__dqv"),
                          centroid_cells(vec_col, centroids)
                          .alias("__cell"))
    cand = knn_lsh(dq_frame, q_in, m, id_col="vec_id",
                   vec_col="__dqv", query_id_col=query_id_col,
                   multiprobe=False,
                   bucketer=lambda c, n: F.col("__cell"),
                   vector_prober=lambda qv: centroid_probe_ranks(
                       qv, centroids, nprobe=nprobe))
    if vectors is None:
        return cand.filter(F.col("rank") <= k)
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    return _exact_rerank(cand.select("query_id", "neighbor_id"), q,
                         vectors, k, id_col, vec_col)


def knn_ivf_adc(codes: DataFrame, codebooks: list[list[list[float]]],
                queries: DataFrame, k: int,
                centroids: list[list[float]], nprobe: int = 2,
                m: Optional[int] = None,
                vectors: Optional[DataFrame] = None,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "vec_id") -> DataFrame:
    """FAISS-shape IVFPQ, fully literal (r9): the trained coarse
    quantizer (``kmeans_fit`` centroids) partitions a PRODUCT-QUANTIZED
    corpus — ``knn_ivf_pq``'s composition with the real PQ codec
    (``pq_encode`` codes + ``pq_decode`` reconstructions) in place of
    the scalar int8 stand-in. Corpus cells are keyed on the DECODED
    vectors (self-consistent with the scoring at the codec's precision,
    computed by the Arrow assignment kernel — map-only), each query
    probes its ``nprobe`` nearest centroids by raw distance, candidates
    score inside the probed cells on the reconstructions (asymmetric
    distance computation), the top-``m`` survive, and the exact
    full-precision re-rank emits the top-``k``. Probing every cell
    degenerates to ``knn_pq_adc`` with the same ``m`` (test-pinned, the
    ``knn_ivf_pq``/``knn_quantized_rerank`` relationship).

    Storage story at 100 TB: the serving scan reads (vec_id, codes) — m
    small ints per row — plus two bounded broadcast models (coarse
    centroids k·dim, subspace codebooks m·k·dim/m); per-query compute
    tracks probed-cell population. CONTRACT: ``codes`` must be
    ``pq_encode``'s verbatim schema built with these ``codebooks``
    (``pq_decode``'s contract), and ``vectors`` must cover every id in
    ``codes``."""
    from .vectors import pq_decode

    m = _resolve_m(k, m)
    dq_frame = centroid_cells_frame(
        codes.select("vec_id",
                     pq_decode("codes", codebooks).alias("__dqv")),
        centroids, id_col="vec_id", vec_col="__dqv", cell_col="__cell")
    return _ivf_compressed_serve(dq_frame, queries, k, centroids, nprobe,
                                 m, vectors, id_col, vec_col,
                                 query_id_col)


def knn_ivf_adc_residual(codes: DataFrame,
                         codebooks: list[list[list[float]]],
                         queries: DataFrame, k: int,
                         centroids: list[list[float]], nprobe: int = 2,
                         m: Optional[int] = None,
                         vectors: Optional[DataFrame] = None,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         query_id_col: str = "vec_id") -> DataFrame:
    """Serving for the RESIDUAL-encoded IVFPQ (``ivf_pq_fit_residual``
    + ``ivf_pq_encode`` — the actual FAISS recipe): reconstruction is
    ``centroid[cell] + pq_decode(codes)``, so the stored ``cell``
    column is consumed directly as the index key (it IS part of the
    encoding — unlike ``knn_ivf_adc``, whose flat codes are re-binned
    over their reconstructions per serve). The rest is the shared IVF
    serving core: each query probes its ``nprobe`` nearest centroids
    by raw distance, candidates score inside probed cells on the
    reconstructions (asymmetric distance computation), top-``m``
    survive, exact full-precision re-rank emits top-``k``.

    Why this wins at the same storage: residual codebooks cover a far
    tighter distribution than raw-vector ones, so the m small ints per
    row reconstruct closer to the original — better stage-1 candidate
    quality for identical scan bytes. CONTRACT: ``codes`` must be
    ``ivf_pq_encode``'s verbatim ``(vec_id, codes, cell)`` schema
    built with THESE codebooks and centroids; the reconstruction adds
    ``centroid[cell]`` via ``element_at``, which throws under ANSI on
    a cell outside the model (loud on a model/codes mismatch, the
    ``pq_decode`` rule). Works unchanged over a parquet round-trip of
    the codes frame — ``(vec_id, codes, cell)`` is exactly the
    persisted-index layout, and filtering it to the probe union before
    this call is the partition-pruned at-rest serve."""
    from .vectors import _lit_array2, pq_decode

    m = _resolve_m(k, m)
    recon = F.zip_with(
        F.element_at(_lit_array2(centroids), F.col("cell") + 1),
        pq_decode("codes", codebooks),
        lambda c, r: c + r)
    dq_frame = codes.select("vec_id", recon.alias("__dqv"),
                            F.col("cell").cast("string").alias("__cell"))
    return _ivf_compressed_serve(dq_frame, queries, k, centroids, nprobe,
                                 m, vectors, id_col, vec_col,
                                 query_id_col)


def sign_lsh_bucket(vec_col: Column | str, n_bits: int = 8) -> Column:
    """Axis-aligned hyperplane LSH: bucket = sign bits of the first n dims.
    Cheap, deterministic, engine-independent. For better-distributed planes
    use hashed_projection_bucket below.

    A NULL — or shorter-than-``n_bits`` (including EMPTY) — vector gets a
    NULL bucket, so every bucket equi-join drops it (a missing or
    malformed embedding is not a candidate for anything). Without the
    NULL guard, each bit's NULL comparison falls to the otherwise('0')
    branch and NULL vectors silently collect in the all-zeros bucket as
    live candidates (review r6 — the oracles exclude NULL embeddings, so
    the all-zeros bucket would certify only while the fixture's top-k
    happens not to reach a NULL row). The size guard (r7, ADVICE
    follow-through) covers the empty/short leg: under ANSI mode
    ``getItem`` on an out-of-range index THROWS (one zero-length row
    would kill a 100 TB job), and pre-ANSI it NULLed into the same
    all-zeros pooling. CaseWhen branches evaluate lazily per row, so the
    guarded concat never touches an out-of-range index.

    A NULL ELEMENT among the first n_bits coordinates votes '0'
    deterministically (NULL >= 0 falls to the otherwise branch) — the
    same arbitrary-but-mirrored choice the oracles' CASE makes, so both
    engines bucket such a vector identically. Unlike the IVF cell path
    (where a skipped NULL coordinate malformed the key), the bit string
    stays well-formed, so no probe-duplication hazard arises."""
    if isinstance(vec_col, str):
        vec_col = F.col(vec_col)
    bits = [F.when(vec_col.getItem(i) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_bits)]
    return F.when(vec_col.isNotNull() & (F.size(vec_col) >= n_bits),
                  F.concat(*bits))


def hashed_projection_bucket(vec_col: Column | str, dim: int,
                             n_planes: int = 8,
                             seed: str = "lsh") -> Column:
    """Random-hyperplane LSH with content-derived pseudo-random planes:
    plane p weight for dim d = ±1 chosen by a bit of md5(seed:p:d). Signed
    sums fold JVM-side; deterministic across runs and engines."""
    import hashlib

    if isinstance(vec_col, str):
        vec_col = F.col(vec_col)
    bits = []
    for p in range(n_planes):
        terms = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[0]
            sign = 1.0 if h & 1 else -1.0
            terms.append(vec_col.getItem(d) * F.lit(sign))
        proj = terms[0]
        for t in terms[1:]:
            proj = proj + t
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    # NULL or shorter-than-dim vector -> NULL bucket (joins drop it), same
    # contract as sign_lsh_bucket above: a short vector's missing items
    # would THROW under ANSI getItem (and pre-ANSI, NULL projections pool
    # in the all-zeros bucket)
    return F.when(vec_col.isNotNull() & (F.size(vec_col) >= dim),
                  F.concat(*bits))


def knn_lsh(vectors: DataFrame, queries: DataFrame, k: int,
            id_col: str = "vec_id", vec_col: str = "embedding",
            query_id_col: str = "vec_id", n_bits: int = 6,
            multiprobe: bool = False,
            max_bucket: Optional[int] = None,
            bucketer=None, prober=None, vector_prober=None) -> DataFrame:
    """Approximate top-k: candidates must share the query's LSH bucket
    (optionally ±1-bit multiprobe buckets for recall). The bucket equi-join
    partitions candidates by bucket — at 100 TB each task handles one
    bucket's candidate set, never the full corpus.

    ``max_bucket`` is the optional hot-bucket guard (same groupBy-count
    semi-join shape as semantic_dedup's max_cell — never a window): a
    degenerate bucket (all-zero embeddings, too few bits for the corpus)
    otherwise funnels |bucket| x |queries probing it| comparisons into one
    join task. Defaults to None because dropping a bucket drops RECALL for
    queries that live in it — a search operator shouldn't silently return
    worse neighbors; set it (DEFAULT_MAX_CELL is a reasonable value) when
    the corpus can contain degenerate buckets, or raise n_bits.

    ``bucketer`` swaps the bucket function: a callable
    ``(vec, n_bits) -> Column`` producing an ``n_bits``-character
    '0'/'1' string (multiprobe flips those characters), where ``vec``
    is the vector column NAME (str — every bucketer in this module
    accepts names; wrap in ``F.col`` for Column arithmetic. Passing the
    name lets the model-literal builders parse as one-round-trip text,
    the r11 plan-construction fix). Default is ``sign_lsh_bucket``;
    pass e.g.
    ``lambda c, n: hashed_projection_bucket(c, dim=768, n_planes=n)`` for
    better-distributed planes when embedding axes are correlated.

    ``prober`` generalizes multiprobe to non-bit bucket keys: a callable
    ``(qbucket_col) -> Column`` producing an ARRAY of probe keys (which
    must include the home bucket and be pairwise distinct — the
    no-dedup argument below relies on it). Mutually exclusive with
    ``multiprobe`` (which is bit-flip-specific). Use with an IVF-style
    bucketer: ``prober=ivf_probe_cells`` probes the 3^dims adjacent grid
    cells — the nprobe dial of a real IVF index.

    ``vector_prober`` (r8) is the trained-quantizer variant of
    ``prober``: a callable ``(qvec) -> Column`` producing the probe
    ARRAY from the query VECTOR itself (``qvec`` is the query-vector
    column NAME, str — same rationale as ``bucketer``) — required when probe ranking
    needs distances (``centroid_probe_ranks``: the nprobe nearest
    centroids), which the bucket key alone can't express. Same output
    contract as ``prober`` (home bucket first, pairwise distinct), and
    the home-bucket NULL guard still applies: a query the bucketer
    deems unservable probes nothing, whatever the prober says. All
    three probe expansions are mutually exclusive."""
    exclusive = [multiprobe, prober is not None, vector_prober is not None]
    if sum(exclusive) > 1:
        raise ValueError("multiprobe (bit-flip), prober (bucket-key), and "
                         "vector_prober (query-vector) are mutually "
                         "exclusive probe expansions")
    bucket_of = bucketer or sign_lsh_bucket
    v = vectors.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).cast("array<double>").alias("nv"),
                       bucket_of(vec_col, n_bits).alias("bucket"))
    if max_bucket is not None:
        small = (v.groupBy("bucket")
                 .agg(F.count(F.lit(1)).alias("__bn"))
                 .filter(F.col("__bn") <= max_bucket)
                 .select("bucket"))
        v = v.join(small, "bucket", "left_semi")
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"),
                       bucket_of(vec_col, n_bits).alias("qbucket"))
    if multiprobe:
        # probe the home bucket plus each 1-bit flip
        def flip(bucket: Column, i: int) -> Column:
            flipped = F.when(F.substring(bucket, i + 1, 1) == "1", "0").otherwise("1")
            return F.concat(F.substring(bucket, 1, i), flipped,
                            F.substring(bucket, i + 2, n_bits - i - 1))
        probes = F.array(F.col("qbucket"),
                         *[flip(F.col("qbucket"), i) for i in range(n_bits)])
        q = q.withColumn("qbucket", F.explode(probes))
    elif prober is not None:
        # a NULL home bucket (NULL/short vector) must stay out of the
        # probe set: explode of a NULL array emits no rows, so guard the
        # prober output rather than trusting it to propagate NULLs
        q = q.withColumn(
            "qbucket",
            F.explode(F.when(F.col("qbucket").isNotNull(),
                             prober(F.col("qbucket")))))
    elif vector_prober is not None:
        # same NULL-home-bucket guard: the bucketer is the authority on
        # servability, so a vector it refuses to key probes nothing even
        # if the prober could rank centroids for it
        q = q.withColumn(
            "qbucket",
            F.explode(F.when(F.col("qbucket").isNotNull(),
                             vector_prober("qv"))))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    # No dropDuplicates: (query_id, neighbor_id) pairs are unique by
    # construction — each neighbor has ONE bucket, and the probe set (home
    # bucket + n_bits distinct 1-bit flips) is pairwise distinct, so a
    # neighbor can match at most one probe even under multiprobe. A
    # defensive dedup here would cost a full extra shuffle of the
    # candidate set hash-partitioned on both columns.
    #
    # Candidate scoring via the Arrow pair kernel (r12, guide §4): the
    # bucket equi-join is untouched (still partitions candidates by
    # bucket); only the per-pair interpreted cosine folds move into the
    # vectorized kernel, float-identical to cosine_col.
    pairs = q.join(v, (F.col("bucket") == F.col("qbucket"))
                   & (F.col("neighbor_id") != F.col("query_id")))
    return (
        _scored_pairs_kernel(pairs, "query_id", "neighbor_id",
                             "qv", "nv")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def knn_bruteforce_pandas(vectors: DataFrame, queries_pdf, k: int,
                          id_col: str = "vec_id", vec_col: str = "embedding"):
    """Arrow-batched numpy variant: queries as a small pandas DataFrame
    (id, vector) broadcast into a mapInPandas stage doing a matmul per
    batch. Use when |queries|·dim is large enough that the per-row column
    fold dominates. Returns (query_id, neighbor_id, cosine) rows."""
    import numpy as np
    import pandas as pd

    qids = queries_pdf[id_col].to_numpy()
    qm = np.stack(queries_pdf[vec_col].to_numpy()).astype("float64")
    # zero-norm guard, same contract as cosine_col: dividing by a zero norm
    # yields NaN cosines, and NaN sorts ABOVE every real number in the
    # descending top-k window — an all-zero embedding would rank as the TOP
    # neighbor of every query. Dividing by 1 leaves the vector all-zero, so
    # its similarities are exactly 0.0.
    qnorm = np.linalg.norm(qm, axis=1, keepdims=True)
    qn = qm / np.where(qnorm == 0, 1.0, qnorm)

    def score(it):
        for pdf in it:
            vm = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            vnorm = np.linalg.norm(vm, axis=1, keepdims=True)
            vm = vm / np.where(vnorm == 0, 1.0, vnorm)
            sims = vm @ qn.T  # |batch| × |queries|
            out = pd.DataFrame({
                "neighbor_id": np.repeat(pdf[id_col].to_numpy(), len(qids)),
                "query_id": np.tile(qids, len(pdf)),
                "cosine": sims.ravel(),
            })
            yield out

    # derive the id type from the vectors frame (string/int32 ids must not
    # hit a hardcoded 'long' Arrow schema); query ids share the id domain
    id_type = vectors.schema[id_col].dataType.simpleString()
    scored = vectors.select(id_col, vec_col).mapInPandas(
        score,
        schema=f"neighbor_id {id_type}, query_id {id_type}, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (scored.filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k))


def ivf_grid_cells(vec_col: Column | str, grid: int = 4,
                   dims: int = 2) -> Column:
    """Deterministic coarse quantizer: grid cell over the first ``dims``
    dimensions as a compact string key (fixed codebook, no training pass —
    swap for kmeans centroids without touching callers).

    NULL or shorter-than-``dims`` vectors get a NULL cell (equi-joins drop
    them) — same contract as sign_lsh_bucket: under ANSI mode element_at
    past the end THROWS, so the guard is also what keeps one malformed row
    from killing a 100 TB job (r7). A vector with a NULL ELEMENT in its
    first ``dims`` coordinates also gets a NULL cell: plain F.concat is
    NULL-propagating, where concat_ws silently SKIPPED the NULL coordinate
    and minted malformed cells like "2" or "" (review r7b) — which the
    single-probe join mis-bucketed and the nprobe ring expanded into
    DUPLICATE probe keys, breaking knn_lsh's pairwise-distinct contract
    (a neighbor matched several probes, crowding top-k and fanning out
    ann_recall's counting join). The oracles' separate cx/cy columns drop
    NULL coords via NULL join keys — this makes the engine structurally
    identical."""
    if isinstance(vec_col, str):
        vec_col = F.col(vec_col)
    parts = [F.floor(F.element_at(vec_col, i + 1).cast("double") * grid)
             .cast("long").cast("string") for i in range(dims)]
    joined = []
    for i, p in enumerate(parts):
        if i:
            joined.append(F.lit(":"))
        joined.append(p)
    return F.when(vec_col.isNotNull() & (F.size(vec_col) >= dims),
                  F.concat(*joined))


def centroid_cells(vec_col: Column | str,
                   centroids: list[list[float]]) -> Column:
    """Trained-centroid coarse quantizer — the production IVF shape the
    fixed grid (``ivf_grid_cells``) stands in for: cell = id of the
    NEAREST fitted centroid (squared L2, ties to the lowest id) as a
    compact string key. Drop-in ``bucketer`` for ``knn_lsh``/``ann_recall``
    (wrap in a lambda that ignores the n_bits slot); pair with
    ``centroid_probe_ranks`` for the nprobe dial. Fit the model with
    ``operators.vectors.kmeans_fit`` — its deterministic, 6-dp-rounded
    centroids are what make the bucketing reproducible across runs and
    engines.

    The distance fold and the (d2, id) argmin are the exact operation
    sequence of the k-means assignment (``vectors._dist2`` /
    ``_assign``'s struct-min), so a vector's cell here equals its
    ``kmeans_assign`` cluster for the same model — the oracle re-derives
    the assignment CTE and must agree bit-for-bit.

    NULL, wrong-dimension, and NULL-element vectors get a NULL cell
    (equi-joins drop them) — the sign_lsh_bucket contract. Dimension is
    pinned to the model's (a ragged vector's zip_with distance would
    fold to NULL against every centroid and tie-break into cluster 0 as
    a live candidate otherwise).

    Scale: k·dim literal doubles embedded in ONE flattened array (a
    single Py4J round trip), distances via a constant-size
    higher-order-function tree — transform over 0..k-1 slices the i-th
    centroid out of the flat literal and folds the same sequential
    squared-difference sum as before, so plan CONSTRUCTION is O(1) in k
    (r9: the per-centroid struct tree cost one Py4J round trip per
    expression node and dominated q82/q84's per-pass wall at k=8 x 64)
    while the evaluated doubles are bit-identical (the slice reads the
    same repr-exact literals the per-centroid form embedded). This
    Column remains the literal semantic twin the assignment kernel is
    parity-pinned against; for corpus-sized frames use
    ``centroid_cells_frame``."""
    if isinstance(vec_col, str) and _finite2(centroids):
        from .vectors import _qident, _wf_sql
        ref = _qident(vec_col)
        structs = _centroid_d2_structs_sql(ref, centroids)  # validates
        dim = len(centroids[0])
        return F.expr(
            f"CASE WHEN {_wf_sql(ref, dim)} "
            f"THEN CAST(array_min({structs}).cluster AS STRING) END")
    if isinstance(vec_col, str):
        vec_col = F.col(vec_col)
    best = _centroid_argmin(vec_col, centroids)["cluster"]
    dim = len(centroids[0])
    return F.when(vec_col.isNotNull() & (F.size(vec_col) == dim)
                  & ~F.exists(vec_col, lambda x: x.isNull()),
                  best.cast("string"))


def _centroid_d2_structs_sql(vec_sql: str,
                             centroids: list[list[float]]) -> str:
    """``_centroid_d2_structs`` as one SQL fragment (r11 optimization
    round): the same flat-literal transform/zip_with/fold tree, rendered
    as text so the whole k-centroid distance expression parses in ONE
    Py4J round trip. The parsed tree is identical — text lambdas build
    the same LambdaFunction nodes — so every double and tie-break is
    bit-identical to the Column form (oracle- and parity-pinned)."""
    if not centroids or not centroids[0]:
        raise ValueError("centroids must be a non-empty list of "
                         "non-empty vectors (kmeans_fit's output)")
    k = len(centroids)
    dim = len(centroids[0])
    flat = ",".join(f"{float(x)!r}D" for c in centroids for x in c)
    d2s = (f"transform(sequence(0, {k - 1}), i -> "
           f"aggregate(zip_with(CAST({vec_sql} AS ARRAY<DOUBLE>), "
           f"slice(array({flat}), i * {dim} + 1, {dim}), "
           f"(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x))")
    return (f"zip_with({d2s}, sequence(0, {k - 1}), "
            f"(d, i) -> struct(d AS d2, i AS cluster))")


def _centroid_d2_structs(vec_col: Column,
                         centroids: list[list[float]]) -> Column:
    """array<struct<d2, cluster>> of squared L2 distances to every
    centroid, built as a constant-size expression tree over ONE
    flattened centroid literal: same sequential fold per centroid as
    ``vectors._dist2`` (the slice of the flat literal IS the centroid's
    repr-exact doubles), struct order (d2, cluster) so array_min /
    array_sort tie-break to the lowest cluster id."""
    from .vectors import _fold_sum, _lit_array

    if not centroids or not centroids[0]:
        # F.sequence(0, k-1) with k=0 yields [0, -1] — the flat-literal
        # tree would FABRICATE cells ('-1') for an empty model where the
        # per-centroid F.array form failed at construction (r9 review);
        # an empty/misloaded model must be loud, never wrong bucket keys
        raise ValueError("centroids must be a non-empty list of "
                         "non-empty vectors (kmeans_fit's output)")
    k = len(centroids)
    dim = len(centroids[0])
    v = vec_col.cast("array<double>")
    flat = _lit_array([x for c in centroids for x in c])
    idx = F.sequence(F.lit(0), F.lit(k - 1))
    d2s = F.transform(
        idx,
        lambda i: _fold_sum(F.zip_with(
            v, F.slice(flat, i * dim + 1, dim),
            lambda x, y: (x - y) * (x - y))))
    return F.zip_with(d2s, idx,
                      lambda d, i: F.struct(d.alias("d2"),
                                            i.alias("cluster")))


def _centroid_argmin(vec_col: Column,
                     centroids: list[list[float]]) -> Column:
    """struct<d2, cluster> of the nearest centroid (ties to the lowest
    cluster id) — the shared argmin of ``centroid_cells``."""
    return F.array_min(_centroid_d2_structs(vec_col, centroids))


def centroid_cells_frame(df: DataFrame, centroids: list[list[float]],
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         cell_col: str = "__cell") -> DataFrame:
    """FRAME-level ``centroid_cells``: the same nearest-centroid cell keys,
    computed by the Arrow assignment kernel (``vectors._assign`` — one
    map-only ``mapInPandas`` pass with the model closed over as a numpy
    matrix) instead of the k·dim-literal expression tree. Returns exactly
    ``(id_col, vec_col, cell_col)`` with ``vec_col`` cast to
    array<double>; any OTHER input column is dropped (Catalyst cannot
    prune inside a mapInPandas schema, so carrying extra columns would
    Arrow-serialize them through the kernel for nothing).

    Why both forms exist: ``centroid_cells`` is the pure-Catalyst
    semantic twin — one Column, embeddable anywhere, the recipe the
    DuckDB oracles unroll — but it is an interpreted fold per
    (row, centroid) whose cost Catalyst re-evaluates at every use site
    (measured ~100 s for 200k rows x 16 centroids, and the dominant term
    of q82's fixed overhead at 8 x 64). This frame form is the
    production path for CORPUS-sized sides: the kernel is parity-pinned
    row-identical to the literal expression (dimension-ordered float64
    accumulation, first-minimum tie rule — the ``_assign`` contract), so
    swapping it in changes no cell. Use the Column form for sample-sized
    frames (a query side) where plan simplicity beats kernel dispatch.

    Keying contract, matching ``centroid_cells``: rows the quantizer
    cannot key — NULL, wrong-dimension, or NULL-element vectors — are
    DROPPED from the output rather than NULL-celled (the kernel's
    ``np.stack`` cannot hold ragged rows). Equivalent for every caller,
    since a NULL cell's only meaning is "drops from every bucket
    equi-join and servability filter"; a caller that needs the
    unservable rows themselves must anti-join them back."""
    from .vectors import _assign

    from .vectors import well_formed_pred

    if not centroids or not centroids[0]:
        raise ValueError("centroids must be a non-empty list of "
                         "non-empty vectors (kmeans_fit's output)")
    dim = len(centroids[0])
    well = df.filter(well_formed_pred(vec_col, dim))
    cells = _assign(
        well.select(F.col(id_col).alias("vec_id"),
                    F.col(vec_col).cast("array<double>").alias("__v")),
        centroids)
    return cells.select(F.col("vec_id").alias(id_col),
                        F.col("__v").alias(vec_col),
                        F.col("cluster").cast("string").alias(cell_col))


def centroid_probe_ranks(vec_col: Column | str,
                         centroids: list[list[float]],
                         nprobe: int = 2) -> Column:
    """nprobe expansion for the trained-centroid quantizer: the probe set
    is the ``nprobe`` NEAREST centroids by query distance (ties to the
    lowest id) — the real IVF serving rule, where the fixed grid's
    adjacency ring (``ivf_probe_cells``) is only a geometric stand-in.
    Use through ``knn_lsh``/``ann_recall``'s ``vector_prober`` seam: the
    probe ranking needs the query VECTOR, not just its home cell.

    Contract (what the no-dedup candidate join relies on): the array is
    pairwise distinct (distinct centroid ids), and its FIRST element is
    the home cell — the same (d2, id) ordering ``centroid_cells``
    argmins, so sorted[0] == array_min. NULL / wrong-dimension /
    NULL-element vectors get a NULL probe array (explode drops the
    query — an unservable vector probes nothing). ``nprobe`` past k
    degrades to probing all k cells. Built over the shared flat-literal
    distance tree (``_centroid_d2_structs``) — O(1) plan construction
    in k, identical doubles (r9). Accepts a Column or a column NAME;
    the str form parses the whole probe expression in one Py4J round
    trip (r11 optimization round, identical tree)."""
    from .vectors import well_formed_pred

    if isinstance(vec_col, str) and _finite2(centroids):
        from .vectors import _qident, _wf_sql
        ref = _qident(vec_col)
        structs = _centroid_d2_structs_sql(ref, centroids)  # validates
        return F.expr(
            f"CASE WHEN {_wf_sql(ref, len(centroids[0]))} "
            f"THEN transform(slice(array_sort({structs}), 1, {nprobe}), "
            f"s -> CAST(s.cluster AS STRING)) END")
    if isinstance(vec_col, str):
        vec_col = F.col(vec_col)
    ranked = F.slice(
        F.array_sort(_centroid_d2_structs(vec_col, centroids)),
        1, nprobe)
    return F.when(well_formed_pred(vec_col, len(centroids[0])),
                  F.transform(ranked,
                              lambda s: s["cluster"].cast("string")))


def probe_cells_frame(queries: DataFrame, centroids: list[list[float]],
                      nprobe: int = 2, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      cell_col: str = "__cell") -> DataFrame:
    """FRAME-level ``centroid_probe_ranks``: each query row EXPLODED by
    its ``nprobe`` nearest centroids, computed by an Arrow kernel (one
    map-only ``mapInPandas`` pass with the model closed over as a numpy
    matrix) instead of the k·dim-literal expression tree. Returns
    exactly ``(id_col, vec_col, cell_col)`` with ``vec_col`` cast to
    array<double> and ``cell_col`` the probe's centroid id as a STRING
    (``centroid_probe_ranks``' key contract); any other input column is
    dropped (``centroid_cells_frame``'s rationale — Catalyst cannot
    prune inside a mapInPandas schema).

    Why the frame form exists (r11): the Column form is an interpreted
    fold per (row, centroid) — the right shape for a SAMPLE-sized query
    batch, and the recipe the DuckDB oracles unroll — but a BATCH
    serving path (millions of queries, ``knn_ivf_pq_index_batch``)
    would pay it per query row, the exact cost ``centroid_cells_frame``
    exists to avoid on the corpus side (measured ~100 s for 200k rows x
    16 centroids). Parity is pinned: blocked dimension-ordered float64
    accumulation (``_nearest_blocks``' recipe, keeping the (block, k)
    panel to RANK the top-nprobe instead of just argmin), stable
    argsort = (d2 asc, cluster asc) — the struct-sort's ties-to-lowest-
    id rule — and probe order preserved in the output (home cell
    first). Unservable rows (NULL / wrong-dimension / NULL-element)
    are DROPPED, ``centroid_probe_ranks``' explode-of-NULL behavior;
    ``nprobe`` past k degrades to probing all k cells."""
    import numpy as np

    from .vectors import _stack_batch, well_formed_pred

    if not centroids or not centroids[0]:
        raise ValueError("centroids must be a non-empty list of "
                         "non-empty vectors (kmeans_fit's output)")
    if nprobe < 1:
        raise ValueError("nprobe must be >= 1")
    C = np.asarray(centroids, dtype="float64")
    k, dim = C.shape
    npb = min(nprobe, k)
    vecs = (queries.filter(well_formed_pred(vec_col, dim))
            .select(F.col(id_col).alias("vec_id"),
                    F.col(vec_col).cast("array<double>").alias("__v")))
    id_type = vecs.schema["vec_id"].dataType.simpleString()

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _stack_batch(pdf, dim)
            n = V.shape[0]
            block = 1024
            ranked = np.empty((n, npb), dtype="int64")
            for s in range(0, n, block):
                e = min(s + block, n)
                acc = np.zeros((e - s, k))
                for d in range(dim):
                    diff = V[s:e, d:d + 1] - C[None, :, d]
                    acc = acc + diff * diff
                masked = np.where(np.isnan(acc), np.inf, acc)
                # stable argsort == order by (d2 asc, cluster asc):
                # the lowest-id tie rule of centroid_probe_ranks'
                # struct sort, column index == cluster id
                ranked[s:e] = np.argsort(masked, axis=1,
                                         kind="stable")[:, :npb]
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy().repeat(npb),
                "__v": pdf["__v"].to_numpy().repeat(npb),
                "__cell": ranked.reshape(-1).astype(str),
            })

    out = vecs.mapInPandas(
        kernel, schema=f"vec_id {id_type}, __v array<double>, "
                       "__cell string")
    return out.select(F.col("vec_id").alias(id_col),
                      F.col("__v").alias(vec_col),
                      F.col("__cell").alias(cell_col))


def ivf_probe_cells(cell_col: Column, dims: int = 2) -> Column:
    """nprobe expansion for the ``ivf_grid_cells`` quantizer: the probe
    set is the home cell plus every adjacent cell — 3^dims keys, pairwise
    distinct by construction (distinct offset tuples produce distinct
    cell strings), home cell included at offset zero. This is the nprobe
    dial of a real IVF index: q80 measures the one-cell recall floor;
    probing the adjacency ring buys back the near-neighbors that landed
    just across a cell boundary, at 3^dims times the candidate cost.
    Swap for a trained-centroid top-nprobe ranking without touching the
    join (the knn_lsh ``prober`` contract only requires a distinct key
    array).

    ``dims`` MUST match the bucketer's: a cell whose parsed coordinate
    count differs gets a NULL probe array (explode drops the query) —
    without the arity guard, a 3-dim cell parsed as 2 coords would build
    probes that can never equal any neighbor cell, returning empty
    results with no structural trace (review r7b). A cell whose
    coordinates aren't numeric (the bucketer contract allows any custom
    key) degrades to the SAME NULL probe array via try_cast (r8, ADVICE)
    — previously the plain cast THREW under ANSI, so one malformed key
    failed the job instead of surfacing as the row-level recall 0.0 the
    arity leg already degrades to. Per-row key shape is data, not
    configuration."""
    from itertools import product

    parts = F.split(cell_col, ":")
    coords = [parts.getItem(i).try_cast("long") for i in range(dims)]
    numeric = coords[0].isNotNull()
    for c in coords[1:]:
        numeric = numeric & c.isNotNull()
    combos = []
    for offsets in product((-1, 0, 1), repeat=dims):
        combos.append(F.concat_ws(":", *[
            (c + o).cast("string") for c, o in zip(coords, offsets)]))
    # nested whens: the inner numeric check references getItem(i), which
    # is only safe to evaluate once the outer arity check has passed
    # (CaseWhen branches evaluate lazily per row)
    return F.when(F.size(parts) == dims,
                  F.when(numeric, F.array(*combos)))


#: Hot-cell guard for semantic_dedup: cells holding more vectors than this
#: are skipped by the pair join (their rows stay their own canonicals).
#: Mirrors DEFAULT_MAX_DF in operators.dedupe — a degenerate cell (e.g. the
#: zero-vector cell, or a too-coarse quantizer) would otherwise expand
#: quadratically inside one task.
DEFAULT_MAX_CELL = 10_000


def semantic_dedup(vectors: DataFrame, threshold: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   grid: int = 4, dims: int = 2,
                   max_iters: int = 10,
                   max_cell: Optional[int] = DEFAULT_MAX_CELL) -> DataFrame:
    """Embedding-space near-duplicate collapse (SemDeDup-style, Abbas et
    al. 2023): bucket vectors with a coarse quantizer, compare cosine only
    WITHIN a bucket, link pairs >= ``threshold``, and collapse transitive
    clusters to their min-id canonical via connected components. Returns
    (id, canonical_id); keep one row per canonical_id to dedup.

    Scale: the only shuffle is the cell equi-join, partitioned by cell key
    — work tracks within-cell density, never n². Quantizer granularity
    (``grid``/``dims``) bounds cell population the way IVF nlist does;
    component closure reuses the min-label propagation shared with MinHash
    dedup (O(cluster diameter) rounds, tiny for similarity cliques).
    Same trade as SemDeDup's k-means clustering: near-dups straddling a
    cell boundary are missed, accepted for linear cost. ``max_cell`` is
    the hot-cell skew guard: cells above it skip pairwise comparison
    entirely (rows stay their own canonicals — the conservative,
    keep-everything direction), because one degenerate cell would expand
    quadratically in a single task. The cell counts come from a
    groupBy(cell) count (map-side partial aggregation) joined back as a
    semi-join — NOT a window over partitionBy(cell): a window would
    buffer the degenerate cell's rows, embedding arrays included, in one
    task BEFORE filtering it out, i.e. the guard against the pathological
    cell would itself be exposed to that cell's size. The count agg only
    ever shuffles (cell, partial-count) rows, and the semi-join shares
    the pair join's cell partitioning."""
    from .dedupe import min_label_components

    cells = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        ivf_grid_cells(F.col(vec_col), grid, dims).alias("cell"))
    paired = cells
    if max_cell is not None:
        small_cells = (cells.groupBy("cell")
                       .agg(F.count(F.lit(1)).alias("__celln"))
                       .filter(F.col("__celln") <= max_cell)
                       .select("cell"))
        paired = cells.join(small_cells, "cell", "left_semi")
    a = paired.select(F.col("id").alias("doc_a"), F.col("v").alias("va"),
                      F.col("cell").alias("ca"))
    b = paired.select(F.col("id").alias("doc_b"), F.col("v").alias("vb"),
                      F.col("cell").alias("cb"))
    # within-cell pair scoring via the Arrow pair kernel (r12, guide §4;
    # float-identical to cosine_col — kernel docstring): the cell
    # equi-join is untouched, only the per-pair interpreted folds move
    paired_rows = a.join(b, (F.col("ca") == F.col("cb"))
                         & (F.col("doc_a") < F.col("doc_b")))
    pairs = (_scored_pairs_kernel(paired_rows, "doc_a", "doc_b",
                                  "va", "vb", out_col="cos")
             .filter(F.col("cos") >= threshold)
             .select("doc_a", "doc_b"))
    return min_label_components(cells.select("id"), pairs, max_iters) \
        .select(F.col("id").alias(id_col), "canonical_id")


def ann_recall(vectors: DataFrame, queries: DataFrame, k: int,
               id_col: str = "vec_id", vec_col: str = "embedding",
               query_id_col: str = "vec_id", n_bits: int = 6,
               multiprobe: Optional[bool] = None,
               max_bucket: Optional[int] = None,
               bucketer=None, prober=None, vector_prober=None,
               frame_bucketer=None) -> DataFrame:
    """Recall@k telemetry for the bucketed ANN path: how many of each
    query's TRUE top-k neighbors (``knn_bruteforce`` ground truth) the
    LSH index (``knn_lsh`` with the same parameters a caller would serve
    with) actually returned. Output one row per query:
    ``(query_id, n_true, n_hit, recall)`` with recall = n_hit / n_true
    rounded to 6 dp. Mean recall is one ``avg`` over the result — kept
    out of the row contract so the per-query distribution (the thing that
    exposes a degenerate bucket) is never pre-averaged away.

    This is the missing feedback loop for every ANN tuning decision:
    n_bits/multiprobe/bucketer changes trade recall for candidate-set
    size, and without this operator a user only ever sees the cost side.
    Run it on a SAMPLE of queries (ground truth is a brute-force pass —
    |queries| x |vectors| cosine folds); the result quantifies what the
    index bought for the corpus actually being served, not a benchmark's.

    Plan shape: ground truth = one broadcast-queries scan of the corpus
    (knn_bruteforce — linear, no CartesianProduct); approx = the bucket
    equi-join path under test; the comparison is a LEFT join from truth
    to approx on (query_id, neighbor_id) — truth is |queries| x k rows,
    so the join is trivially small — then one groupBy(query_id). A query
    with NO brute-force neighbors (corpus of 1) emits no row rather than
    a 0/0.

    Universe contract (r8, ADVICE): recall is measured over the
    INDEX-SERVABLE universe — corpus rows whose bucket is NULL
    (NULL/short/malformed vectors under the given bucketer) are excluded
    from the brute-force truth as well, since the bucket equi-join
    structurally drops them; leaving them in silently depressed recall
    with rows no index setting could ever reach. A query whose own
    bucket is NULL emits no row at all (it is unservable, not
    zero-recall). Callers that pre-filter to well-formed vectors (the
    q78–q82 workload queries) see no change.

    ``frame_bucketer`` (r9) is the CORPUS-side twin of ``bucketer``: a
    callable ``(df, id_col, vec_col, out_col) -> DataFrame`` returning
    ``(id_col, vec_col, out_col)`` rows — unservable rows either dropped
    or NULL-keyed, both are filtered here. Supply it when the bucket
    function is expensive as a per-row expression: a trained-centroid
    bucketer is a k-struct argmin of interpreted folds, and routing the
    corpus through ``centroid_cells_frame``'s Arrow kernel instead cut
    q82's fixed overhead by the cost of one corpus-wide k·dim-literal
    evaluation. CONTRACT: it must key rows IDENTICALLY to ``bucketer``
    (which still keys the sample-sized query side) — the kernel/literal
    parity pin is what licenses the pair this operator ships with."""
    # multiprobe default: bit-flip probing ON for the sign-LSH family,
    # but OFF automatically when a generic prober is supplied — otherwise
    # the documented prober usage would trip knn_lsh's mutual-exclusion
    # error unless the caller also knew to disable an unrelated default
    # (review r7b). An EXPLICIT multiprobe=True alongside prober still
    # raises, as it should.
    if multiprobe is None:
        multiprobe = prober is None and vector_prober is None
    # A frame_bucketer keys the corpus while `bucketer` keys the query
    # side; supplying only the former silently pairs the corpus keys
    # with sign_lsh_bucket query keys — every join misses and every
    # query reports recall 0 with no structural trace (r9 ADVICE). The
    # identical-keying contract must be explicit, so demand the pair.
    if frame_bucketer is not None and bucketer is None:
        raise ValueError(
            "frame_bucketer requires a matching bucketer: the corpus and "
            "query sides must key buckets IDENTICALLY, and without an "
            "explicit query-side bucketer the query keys silently fall "
            "back to sign_lsh_bucket (recall 0 everywhere)")
    bucket_of = bucketer or sign_lsh_bucket
    # Evaluate the bucketer ONCE over the corpus (r8): the servability
    # filter, the truth branch's filter, and knn_lsh's bucket column would
    # otherwise each evaluate it per corpus row — and a trained-centroid
    # bucketer is a k-struct argmin of interpreted zip_with folds, the
    # single most expensive expression in the ANN family (q82 measured ~3
    # corpus-wide evaluations). A column projection alone doesn't help
    # (predicate pushdown inlines the alias right back), so the bucketed
    # corpus is lazily localCheckpoint-ed: the first action materializes
    # (id, vector, bucket) blocks once — spill-safe MEMORY_AND_DISK — and
    # both the truth and index branches read them. One corpus pass and one
    # bucketer evaluation total, which is also one fewer source scan at
    # 100 TB. The query side stays un-checkpointed: recall telemetry runs
    # on a query SAMPLE (docstring), so its double evaluation is bounded.
    #
    # Retention/fault-tolerance trade (r9, ADVICE): localCheckpoint blocks
    # live until the DataFrame is driver-GC'd (no caller-visible handle to
    # unpersist here — the checkpoint is an internal node of the returned
    # plan), so a caller looping MANY telemetry calls in one session
    # accumulates corpus-sized MEMORY_AND_DISK block sets until the old
    # result frames go out of scope; and checkpointing TRUNCATES lineage,
    # so losing an executor mid-job fails the query instead of recomputing
    # the lost blocks. Both are accepted for this operator because recall
    # telemetry is a bounded, occasionally-run diagnostic (not a
    # steady-state pipeline stage) and the alternative — three bucketer
    # evaluations and three corpus scans per call — is the certain cost.
    # Callers needing caller-driven retention control should persist the
    # bucketed frame themselves and pass it with an identity bucketer
    # (min_label_components' edge-cache pattern).
    if frame_bucketer is not None:
        bucketed = frame_bucketer(vectors, id_col, vec_col, "__ann_bucket")
    else:
        bucketed = vectors.select(F.col(id_col), F.col(vec_col),
                                  bucket_of(F.col(vec_col), n_bits)
                                  .alias("__ann_bucket"))
    vectors = (bucketed
               .filter(F.col("__ann_bucket").isNotNull())
               .localCheckpoint(eager=False))
    queries = (queries
               .withColumn("__ann_bucket",
                           bucket_of(F.col(vec_col), n_bits))
               .filter(F.col("__ann_bucket").isNotNull()))
    truth = knn_bruteforce(vectors.drop("__ann_bucket"),
                           queries.drop("__ann_bucket"), k, id_col,
                           vec_col, query_id_col)
    approx = (knn_lsh(vectors, queries, k, id_col, vec_col, query_id_col,
                      n_bits=n_bits, multiprobe=multiprobe,
                      max_bucket=max_bucket,
                      bucketer=lambda c, n: F.col("__ann_bucket"),
                      prober=prober, vector_prober=vector_prober)
              .select("query_id", "neighbor_id",
                      F.lit(1).alias("__hit")))
    return (
        truth.select("query_id", "neighbor_id")
        .join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_true"),
             F.count("__hit").alias("n_hit"))
        .select("query_id", "n_true", "n_hit",
                F.round(F.col("n_hit") / F.col("n_true"), 6).alias("recall"))
    )


def write_ivf_pq_index(codes: DataFrame,
                       codebooks: list[list[list[float]]],
                       centroids: list[list[float]], path: str,
                       mode: str = "overwrite",
                       files_per_cell: int = 1) -> None:
    """Persist the IVF-PQ serving index AT REST: the ``(vec_id, codes)``
    table with each row's trained coarse cell, written as parquet
    PARTITIONED BY ``cell`` — the layout a 100 TB deployment actually
    serves from, where ``knn_ivf_pq_index`` turns each query batch's
    probe set into a partition filter and the scan READS ONLY THE
    PROBED CELLS' FILES (Spark partition pruning; the in-memory
    operators instead compute cells per pass, the right shape for
    ad-hoc corpora but a re-bucketing cost per query batch at rest).

    Build shape (r10): the cell is a PURE FUNCTION of (codes, models) —
    reconstruction is a codeword gather and the cell its nearest-
    centroid argmin — so ONE fused Arrow kernel emits ``(vec_id, codes,
    cell)`` in a single map-only pass chained onto whatever plan
    ``codes`` is (usually the lazy ``pq_encode`` kernel: scan → encode
    → cell → partitioned write, one corpus read total). The r9 shape —
    a ``centroid_cells_frame`` pass over the ``pq_decode`` expressions
    JOINED back to a persisted copy of the codes — paid a corpus-sized
    persist, a second kernel pass, and a build shuffle for the same
    bytes; at 100 TB those were the build's dominant costs. Parity:
    the gather reproduces ``pq_decode``'s exact codeword doubles and
    ``_nearest_blocks`` is ``centroid_cells``' pinned argmin contract
    (dimension-ordered accumulation, first-minimum ties), so the cells
    are identical (test-pinned against the decode+assign recipe).

    Rows the codec cannot key (NULL / wrong-arity / NULL-element code
    arrays) drop from the index, the ``centroid_cells_frame`` contract;
    a codes/model MISMATCH — codebook count != the code arrays' length,
    or centroids of a different dimension than the reconstructions —
    raises loudly instead of silently writing an empty index. The table
    written is EXACTLY ``(vec_id, codes)`` partitioned by ``cell`` —
    any other input column is dropped (``centroid_cells_frame``'s
    rationale: Catalyst cannot prune inside a mapInPandas schema, so
    carrying payload columns would Arrow-serialize them through the
    kernel for nothing); join payloads back by ``vec_id`` at read time. Storage
    per row is the m small ints plus the partition directory key; the
    two bounded models (codebooks, centroids) are the caller's to ship
    — they are NOT embedded in the files.

    File layout: the write repartitions on the cell key first, so each
    cell directory holds AT MOST ``files_per_cell`` files per build —
    without it every write task opens a file in every cell it sees,
    and a W-task build of a k-cell index lands W·k small files (256 at
    bench scale; at 1000 executors the commit and every later scan's
    file-listing pay it forever). Raise ``files_per_cell`` when single
    cells outgrow a comfortable file/task size: the value is an UPPER
    BOUND / best-effort spread, not a guarantee (r10 ADVICE) — a salt
    keys each hot cell across up to that many writer partitions, but
    hash partitioning into the capped task count can co-locate
    distinct salt groups, and AQE may legally coalesce a small build
    below the bound. The bound direction is the safe one: fewer,
    larger files, never a W·k explosion. The 1M stress writes k=16
    cells of ~62k rows each through the default."""
    import numpy as np

    from .vectors import (_nearest_blocks, _validate_codebooks,
                          well_formed_pred)

    if files_per_cell < 1:
        raise ValueError("files_per_cell must be >= 1")
    m, _, sub = _validate_codebooks(codebooks)
    dim = m * sub
    if not centroids or not centroids[0]:
        raise ValueError("centroids must be a non-empty list of "
                         "non-empty vectors (kmeans_fit's output)")
    if len(centroids[0]) != dim:
        raise ValueError(
            f"centroid dimension {len(centroids[0])} != the codebooks' "
            f"reconstruction dimension {dim} — the coarse quantizer and "
            "the PQ model must be trained on the same space")
    Bs = [np.asarray(cb, dtype="float64") for cb in codebooks]
    C = np.asarray(centroids, dtype="float64")
    servable = codes.filter(well_formed_pred("codes", m))
    id_type = servable.schema["vec_id"].dataType.simpleString()

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.stack(pdf["codes"].to_numpy()).astype("int64")
            # out-of-range codes fail the gather loudly — the
            # pq_decode/element_at model-mismatch contract
            if cm.min() < 0 or cm.max() >= Bs[0].shape[0]:
                raise ValueError(
                    "write_ivf_pq_index: code value outside the "
                    "codebook range — codes were built with different "
                    "codebooks (pq_decode's contract)")
            V = np.concatenate([Bs[j][cm[:, j]] for j in range(m)],
                               axis=1)
            best, _ = _nearest_blocks(V, C)
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                "codes": pdf["codes"],
                                "cell": best.astype("int32")})

    coded = (servable.select("vec_id", "codes")
             .mapInPandas(
                 kernel,
                 schema=f"vec_id {id_type}, codes array<int>, cell int"))
    _write_cell_partitioned(coded, len(centroids), path, mode,
                            files_per_cell)


def _write_cell_partitioned(coded: DataFrame, n_cells: int, path: str,
                            mode: str, files_per_cell: int) -> None:
    """The shared cell-partitioned index write (flat + residual): a
    (vec_id, codes, cell) frame lands as parquet partitioned by cell
    with a BOUNDED file count — at most ``files_per_cell`` files per
    cell per build (an upper bound: salt-group co-location in the
    capped task count or AQE coalescing can land fewer; see
    ``write_ivf_pq_index``'s layout note)."""
    if files_per_cell < 1:
        raise ValueError("files_per_cell must be >= 1")
    if files_per_cell == 1:
        # keys-only repartition: one file per cell per build regardless
        # of how AQE coalesces the write tasks (dynamic partitioning
        # still opens one file per cell per task, and each cell lives
        # in exactly one task)
        out = coded.repartition(F.col("cell"))
    else:
        # salt + EXPLICIT partition count: a user-specified count is
        # AQE-exempt (the semdedup kernel's rule), so a hot cell's
        # files_per_cell salt keys actually land on separate writer
        # tasks instead of being size-coalesced back into one; capped
        # by the session's shuffle width so a large-k index cannot
        # demand k x files_per_cell tasks
        from ..session import shuffle_partitions
        n_parts = min(n_cells * files_per_cell,
                      max(shuffle_partitions(coded.sparkSession),
                          files_per_cell))
        salt = F.pmod(F.xxhash64(F.col("vec_id").cast("string")),
                      F.lit(files_per_cell))
        out = coded.repartition(n_parts, F.col("cell"), salt)
    out.write.mode(mode).partitionBy("cell").parquet(path)


#: Ceiling on the driver-side query-batch collect of the persisted
#: serving paths (``_pin_query_batch``). The serving contract has
#: always been "queries are a sample-sized frame" (every sibling
#: broadcasts them and the probe union is collected at construction);
#: until r11 the contract was prose only, so a mis-sized frame OOM'd
#: the driver silently at scale instead of failing structurally. The
#: default admits any sane query batch / telemetry sample (100k rows
#: of 64-dim doubles ≈ 50 MB pinned) while refusing a corpus passed as
#: queries by mistake; callers with genuinely larger batches raise it
#: explicitly and own the driver-memory consequence.
DEFAULT_MAX_QUERY_ROWS = 100_000


def _guarded_collect(q_proj: DataFrame, max_query_rows: int) -> list:
    """Enforce the serving contract and collect the query batch in TWO
    parallel jobs: a count (nothing crosses to the driver — the
    structural guard) and, only under the limit, one plain collect.
    The previous ``limit(max+1).collect()`` probe bounded memory the
    same way but ran Spark's INCREMENTAL CollectLimit — 1, then 4, then
    16... partitions in sequential jobs until the frame was exhausted,
    i.e. 3-4 sequential scans of a sample-sized frame on every serve
    (r11 optimization round). The count is the enforcement point: a
    corpus passed as queries fails before any row crosses. (A frame
    that GROWS past the limit between the two jobs would collect
    unguarded — the pre-guard exposure — but the serving contract's
    inputs are deterministic sample frames, and the single collect
    below is still the one evaluation every downstream stage shares.)"""
    if max_query_rows < 1:
        raise ValueError("max_query_rows must be >= 1")
    n = q_proj.count()
    if n > max_query_rows:
        raise ValueError(
            f"query batch exceeds max_query_rows={max_query_rows}: the "
            "persisted serving paths collect the queries frame on the "
            "driver (probe-union pruning / drift truth pinning), so it "
            "must be a bounded sample, not a corpus — pass a smaller "
            "batch or raise max_query_rows explicitly")
    rows = q_proj.collect()
    # Backstop for the count→collect window (r11 ADVICE): a frame that
    # GREW past the limit between the two jobs must still fail loudly —
    # the rows are discarded, nothing downstream sees them. (A take/limit
    # probe would bound memory structurally but re-introduces the
    # sequential incremental-CollectLimit jobs this function removed;
    # driver exposure in the window is already capped by
    # spark.driver.maxResultSize.)
    if len(rows) > max_query_rows:
        raise ValueError(
            f"query batch grew past max_query_rows={max_query_rows} "
            "between the count guard and the collect — the queries frame "
            "must be a deterministic bounded sample (serving contract)")
    return rows


def _pin_query_batch(queries: DataFrame, vec_col: str, query_id_col: str,
                     max_query_rows: int, with_rows: bool = False):
    """Collect the query batch ONCE and pin it back as a local relation
    — with the serving contract ENFORCED: at most ``max_query_rows``
    rows may cross to the driver (``_guarded_collect``: a count guard,
    then one collect — no row crosses when the check FAILS on a 100 TB
    frame, and contract-respecting callers see identical rows)."""
    q_proj = queries.select(F.col(query_id_col), F.col(vec_col))
    q_rows = _guarded_collect(q_proj, max_query_rows)
    from ..session import local_frame
    pinned = local_frame(queries.sparkSession, q_rows, q_proj.schema)
    # ``with_rows`` also hands back the collected rows so callers that
    # need a row-level fold (drift's n_queries) reuse this collect
    # instead of running another aggregate job (r11 optimization round)
    return (pinned, q_rows) if with_rows else pinned


def _pruned_probe_scan(index: DataFrame, queries: DataFrame,
                       centroids: list[list[float]], nprobe: int,
                       vec_col: str, query_id_col: str,
                       max_query_rows: int = DEFAULT_MAX_QUERY_ROWS,
                       with_rows: bool = False):
    """The shared probe-union partition pruning of the persisted
    serving paths (flat + residual): returns ``(pinned_queries,
    pruned_index)``.

    Materialize the query batch ONCE (r9 review): the probe union is
    collected at construction time while the serve stages re-evaluate
    the queries frame at action time — a nondeterministic or
    concurrently-appended queries frame could otherwise probe cells
    OUTSIDE the pruned scan and silently lose true neighbors. Queries
    are sample-sized by the serving contract — now enforced by
    ``max_query_rows`` (r11), not just documented — so pinning the
    collected rows back as a local relation closes the two-time-point
    window at negligible cost.

    Probe values are coerced to the index's ACTUAL cell column dtype:
    probe ranks are strings (centroid_probe_ranks' key contract) while
    the parquet partition column is re-inferred on read — int by
    default — and a string-vs-int isin leans on implicit ANSI coercion
    for both correctness and partition-filter pushdown (r9 ADVICE).
    Typed literals keep the filter a native partition predicate under
    any partitionColumnTypeInference / ANSI setting."""
    # ONE collect pins the batch AND evaluates each query's probe ranks
    # (r11 optimization round): the probe expression rides the same
    # limit-probe job that enforces the serving contract, instead of a
    # second scan of the queries frame — still closing the two-time-point
    # window, since rows and probes come from the same evaluation.
    q_proj = queries.select(
        F.col(query_id_col), F.col(vec_col),
        centroid_probe_ranks(vec_col, centroids, nprobe=nprobe)
        .alias("__p"))
    rows = _guarded_collect(q_proj, max_query_rows)
    pin_schema = queries.select(
        F.col(query_id_col), F.col(vec_col)).schema
    from ..session import local_frame
    queries = local_frame(queries.sparkSession,
                          [r[:2] for r in rows], pin_schema)
    probe_cells = sorted({c for r in rows for c in (r["__p"] or [])})
    from pyspark.sql.types import NumericType
    if isinstance(index.schema["cell"].dataType, NumericType):
        probe_cells = [int(c) for c in probe_cells]
    pruned = index.filter(F.col("cell").isin(probe_cells))
    # ``with_rows`` hands back the collected rows too, so a caller that
    # needs a row-level fold (the drift report's n_queries) or the
    # pinned batch itself reuses THIS collect instead of running its own
    # _pin_query_batch first (r12: the drift report previously pinned
    # twice — 2 extra driver jobs per pass, 2 cluster barriers at scale)
    return (queries, pruned, rows) if with_rows else (queries, pruned)


def knn_ivf_pq_index(index: DataFrame,
                     codebooks: list[list[list[float]]],
                     queries: DataFrame, k: int,
                     centroids: list[list[float]], nprobe: int = 2,
                     m: Optional[int] = None,
                     vectors: Optional[DataFrame] = None,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "vec_id",
                     max_query_rows: int = DEFAULT_MAX_QUERY_ROWS
                     ) -> DataFrame:
    """Serve top-k from a PERSISTED ``write_ivf_pq_index`` table with
    partition pruning: the union of every query's ``nprobe`` probe
    cells is collected driver-side (queries are a sample-sized frame —
    the serving contract, enforced by ``max_query_rows``; every
    sibling already broadcasts
    them) and pushed into the scan as ``cell IN (...)``, so parquet
    reads ONLY the probed partitions — at 100 TB the difference between
    scanning nprobe/k_coarse of the index and scanning all of it.
    Within the pruned scan, per-query candidate restriction, ADC
    scoring, top-``m``, and the exact re-rank are ``knn_ivf_adc``'s
    exact stages (same results as the in-memory composition for the
    same models — test-pinned). A query whose vector the quantizer
    cannot key probes nothing and returns no rows."""
    m = _resolve_m(k, m)
    queries, pruned = _pruned_probe_scan(index, queries, centroids,
                                         nprobe, vec_col, query_id_col,
                                         max_query_rows)
    return _serve_pruned(pruned, codebooks, queries, k, centroids,
                         nprobe, m, vectors, id_col, vec_col,
                         query_id_col, residual=False)


def _serve_pruned(pruned: DataFrame, codebooks: list[list[list[float]]],
                  queries: DataFrame, k: int,
                  centroids: list[list[float]], nprobe: int, m: int,
                  vectors: Optional[DataFrame], id_col: str,
                  vec_col: str, query_id_col: str,
                  residual: bool) -> DataFrame:
    """The post-prune serving body shared by ``knn_ivf_pq_index``,
    ``knn_ivf_rpq_index`` and the drift report (which pre-prunes once
    and reuses the same pinned batch for serve, truth and n_queries):
    decode the pruned scan per its layout and run the shared IVF
    serving core. ``m`` must already be resolved."""
    if residual:
        codes = pruned.select("vec_id", "codes",
                              F.col("cell").cast("int").alias("cell"))
        return knn_ivf_adc_residual(codes, codebooks, queries, k,
                                    centroids, nprobe=nprobe, m=m,
                                    vectors=vectors, id_col=id_col,
                                    vec_col=vec_col,
                                    query_id_col=query_id_col)
    from .vectors import pq_decode

    dq_frame = pruned.select(
        "vec_id",
        pq_decode("codes", codebooks).alias("__dqv"),
        F.col("cell").cast("string").alias("__cell"))
    return _ivf_compressed_serve(dq_frame, queries, k, centroids, nprobe,
                                 m, vectors, id_col, vec_col,
                                 query_id_col)


def write_ivf_rpq_index(df: DataFrame,
                        codebooks: list[list[list[float]]],
                        centroids: list[list[float]], path: str,
                        mode: str = "overwrite",
                        files_per_cell: int = 1,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> None:
    """Persist the RESIDUAL-encoding IVFPQ index at rest: one fused
    ``ivf_pq_encode`` kernel pass over the full-precision vectors
    (cell assignment + residual subtraction + subspace encoding —
    scan → encode → partitioned write, one corpus read) into the same
    cell-partitioned parquet layout as ``write_ivf_pq_index``. The
    input asymmetry vs the flat write is the design: a residual code
    is only defined together with its cell, so the build starts from
    VECTORS, not from a codes frame (there is no standalone residual
    codes plan to hand in). Same file-count contract
    (``files_per_cell`` per cell per build), same dropped-unservables
    contract, same bounded models shipped by the caller."""
    from .vectors import ivf_pq_encode

    coded = ivf_pq_encode(df, codebooks, centroids, vec_col=vec_col,
                          id_col=id_col)
    _write_cell_partitioned(coded, len(centroids), path, mode,
                            files_per_cell)


def refresh_ivf_rpq_index(delta: DataFrame,
                          codebooks: list[list[list[float]]],
                          centroids: list[list[float]], path: str,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> None:
    """Append-only maintenance for a ``write_ivf_rpq_index`` table —
    ``refresh_ivf_pq_index``'s residual twin, with the same frozen-
    model contract: encode ONLY the delta with the existing model pair
    and append into cell partitions (byte-equivalent to a full rebuild
    with the same models — encode is row-wise in the frozen models —
    cost tracks |delta|). The same caveat applies doubly here: the
    cell is PART of the residual encoding, so a model refit strictly
    requires a full re-encode — watch ``ivf_pq_index_drift``
    (``residual=True``) and rebuild when it says so."""
    write_ivf_rpq_index(delta, codebooks, centroids, path, mode="append",
                        vec_col=vec_col, id_col=id_col)


def knn_ivf_rpq_index(index: DataFrame,
                      codebooks: list[list[list[float]]],
                      queries: DataFrame, k: int,
                      centroids: list[list[float]], nprobe: int = 2,
                      m: Optional[int] = None,
                      vectors: Optional[DataFrame] = None,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      query_id_col: str = "vec_id",
                      max_query_rows: int = DEFAULT_MAX_QUERY_ROWS
                      ) -> DataFrame:
    """Serve top-k from a PERSISTED residual index
    (``write_ivf_rpq_index``) with partition pruning — the residual
    twin of ``knn_ivf_pq_index``: the probe union prunes the scan to
    the probed cells' files, and within it the stages are
    ``knn_ivf_adc_residual``'s exact chain (reconstruction =
    centroid[cell] + decoded residual, same results as the in-memory
    path for the same models — test-pinned). The stored cell is both
    the partition key AND part of the encoding, so the pruned scan
    reads exactly the rows whose reconstructions live near the
    queries — the at-rest shape residual IVFPQ was designed for."""
    m = _resolve_m(k, m)
    queries, pruned = _pruned_probe_scan(index, queries, centroids,
                                         nprobe, vec_col, query_id_col,
                                         max_query_rows)
    # the decode adds centroid[cell] via element_at — _serve_pruned
    # normalizes the read-back partition dtype (int by default, string
    # with inference off) to the numeric index the reconstruction needs
    return _serve_pruned(pruned, codebooks, queries, k, centroids,
                         nprobe, m, vectors, id_col, vec_col,
                         query_id_col, residual=True)


def _exact_rerank_shuffle(cand: DataFrame, q: DataFrame,
                          vectors: DataFrame, k: int, id_col: str,
                          vec_col: str) -> DataFrame:
    """Stage 2 of the BATCH serving paths: exact top-``k`` over a
    candidate frame that is |queries|·m rows and therefore NOT
    broadcastable when the batch is large. Same tie rule as
    ``_exact_rerank``, but both joins are left to the planner (no
    broadcast hint): a small batch still broadcasts under AQE's size
    rules, a huge one shuffle-joins — queries repartition by query_id,
    then candidates meet the corpus hash-partitioned on neighbor_id.
    The corpus-side shuffle is the honest price of an exact re-rank at
    batch scale, amortized over the whole batch (the broadcast form
    would simply OOM); skip it entirely with ``vectors=None`` for
    single-stage compressed serving.

    The pairwise scoring is an Arrow kernel, not the interpreted
    ``cosine_col`` fold — at 1M queries x m=40 the fold would run 40M
    per-element HOF evaluations — with the same bit-parity recipe as
    stage 1 (dimension-ordered float64 accumulation, dot/(sqrt·sqrt),
    zero-norm pairs 0.0; test-pinned float-identical to the expression
    path). A ragged or NULL full-precision vector is a LOUD contract
    error (``vectors`` must be the well-formed full-precision table —
    ``knn_quantized_rerank``'s standing contract), where the expression
    form silently scored it NULL."""
    import numpy as np

    xv = vectors.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).cast("array<double>").alias("xv"))
    paired = (cand.join(q, "query_id").join(xv, "neighbor_id")
              .select("query_id", "neighbor_id", "qv", "xv"))
    qid_t = paired.schema["query_id"].dataType.simpleString()
    nid_t = paired.schema["neighbor_id"].dataType.simpleString()

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            try:
                Q = np.stack(pdf["qv"].to_numpy()).astype("float64")
                X = np.stack(pdf["xv"].to_numpy()).astype("float64")
            except (ValueError, TypeError):
                raise ValueError(
                    "exact re-rank: ragged or NULL full-precision "
                    "vector — `vectors` must cover every candidate id "
                    "with well-formed fixed-dimension vectors "
                    "(knn_quantized_rerank's contract)")
            if Q.shape != X.shape:
                raise ValueError(
                    "exact re-rank: query/corpus dimension mismatch — "
                    "`vectors` must live in the queries' space")
            n, dim = Q.shape
            dot = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for d in range(dim):
                dot += Q[:, d] * X[:, d]
                na += Q[:, d] * Q[:, d]
                nb += X[:, d] * X[:, d]
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = dot / (np.sqrt(na) * np.sqrt(nb))
            cos = np.where((na > 0) & (nb > 0), cos, 0.0)
            yield pd.DataFrame({"query_id": pdf["query_id"],
                                "neighbor_id": pdf["neighbor_id"],
                                "cosine": cos})

    scored = paired.mapInPandas(
        kernel, schema=f"query_id {qid_t}, neighbor_id {nid_t}, "
                       "cosine double")
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (scored
            .withColumn("rank", F.row_number().over(w_k).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def _batch_stage1_kernel(index: DataFrame, qp: DataFrame, m: int,
                         codebooks: list[list[list[float]]],
                         centroids: Optional[list[list[float]]]
                         ) -> DataFrame:
    """Stage 1 of the batch serving paths as a COGROUPED numpy kernel:
    per probed cell, decode the cell's codes (codebook gather — the
    ``write_ivf_pq_index`` build kernel's pinned ``pq_decode`` parity;
    plus ``centroid[cell] +`` for the residual layout when
    ``centroids`` is passed), score every (query-in-cell x row-in-cell)
    pair, and emit each query's top-``m`` within the cell. Arrow ships
    the m-small-int codes through the cogroup shuffle, NOT the decoded
    doubles — the decode stays inside the task.

    Bit-parity with the expression path (``cosine_col`` + the
    (cosine DESC, neighbor_id) window): the dot and both norms
    accumulate dimension-by-dimension in float64 — the sequential
    zip_with fold's exact float sequence (``_nearest_blocks``' proven
    recipe) — the final ``dot / (sqrt(na) * sqrt(nb))`` is the same two
    ops, zero-norm pairs score 0.0, and the per-row cut is a STABLE
    argsort over rows pre-sorted by neighbor_id, which IS the
    (cosine desc, neighbor_id asc) tie rule. Self-matches mask to -inf
    before the cut and never emit. Test-pinned float-identical to the
    join + ``cosine_col`` + window form.

    Why a kernel here and an expression everywhere else: stage-1 volume
    is |batch| x |probed-cell population| — at 200 queries over a 200k
    index the interpreted per-element fold measured ~218 s where this
    kernel's blocked numpy panels run in seconds; the family's other
    serves score sample-sized frames where plan simplicity wins."""
    import numpy as np

    Bs = [np.asarray(cb, dtype="float64") for cb in codebooks]
    msub = len(Bs)
    C = (np.asarray(centroids, dtype="float64")
         if centroids is not None else None)
    qid_t = qp.schema["query_id"].dataType.simpleString()
    nid_t = index.schema["vec_id"].dataType.simpleString()

    def fn(left, right):
        import pandas as pd
        empty = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                              "neighbor_id": pd.Series(dtype="int64"),
                              "cosine": pd.Series(dtype="float64")})
        if len(left) == 0 or len(right) == 0:
            return empty
        # pre-sort by neighbor_id so the stable argsort's equal-cosine
        # order IS ascending neighbor_id (the family's tie rule)
        right = right.sort_values("vec_id", kind="stable")
        cm = np.stack(right["codes"].to_numpy()).astype("int64")
        if cm.min() < 0 or cm.max() >= Bs[0].shape[0]:
            raise ValueError(
                "batch serve: code value outside the codebook range — "
                "the index was built with different codebooks "
                "(pq_decode's contract)")
        N = np.concatenate([Bs[j][cm[:, j]] for j in range(msub)],
                           axis=1)
        if C is not None:
            N = C[right["cell"].to_numpy().astype("int64")] + N
        Q = np.stack(left["qv"].to_numpy()).astype("float64")
        qid = left["query_id"].to_numpy()
        nid = right["vec_id"].to_numpy()
        nq, dim = Q.shape
        nn = N.shape[0]
        top = min(m, nn)
        # dimension-ordered float64 accumulation: cosine_col's fold
        na = np.zeros(nq)
        nb = np.zeros(nn)
        for d in range(dim):
            na += Q[:, d] * Q[:, d]
            nb += N[:, d] * N[:, d]
        sqa, sqb = np.sqrt(na), np.sqrt(nb)
        out = []
        block = 256
        for s in range(0, nq, block):
            e = min(s + block, nq)
            acc = np.zeros((e - s, nn))
            for d in range(dim):
                acc += Q[s:e, d:d + 1] * N[None, :, d]
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = acc / (sqa[s:e, None] * sqb[None, :])
            cos = np.where((na[s:e, None] > 0) & (nb[None, :] > 0),
                           cos, 0.0)
            cos = np.where(nid[None, :] == qid[s:e, None], -np.inf, cos)
            order = np.argsort(-cos, axis=1, kind="stable")[:, :top]
            take = np.take_along_axis(cos, order, axis=1)
            keep = np.isfinite(take)
            rows = np.repeat(qid[s:e], top).reshape(e - s, top)
            out.append(pd.DataFrame({
                "query_id": rows[keep],
                "neighbor_id": nid[order[keep]],
                "cosine": take[keep],
            }))
        return pd.concat(out, ignore_index=True) if out else empty

    return (qp.groupby("__cell")
            .cogroup(index.groupby("__cell"))
            .applyInPandas(fn, schema=f"query_id {qid_t}, "
                                      f"neighbor_id {nid_t}, "
                                      "cosine double"))


def _ivf_batch_serve(index: DataFrame, queries: DataFrame, k: int,
                     centroids: list[list[float]], nprobe: int, m: int,
                     vectors: Optional[DataFrame],
                     codebooks: list[list[list[float]]], residual: bool,
                     id_col: str, vec_col: str,
                     query_id_col: str) -> DataFrame:
    """The BATCH serving core shared by the two ``*_index_batch``
    operators: probe the queries through the Arrow kernel
    (``probe_cells_frame`` — exploded by probe cell, no driver collect,
    no per-row interpreted fold), cogroup-score each probed cell in the
    stage-1 numpy kernel (``_batch_stage1_kernel`` — top-``m`` per
    query WITHIN each cell), cut to the global per-query top-``m``
    across cells (nq·nprobe·m rows, a bounded window), and shuffle
    exact re-rank. (query_id, neighbor_id) pairs are unique by
    construction — each index row has ONE stored cell and the probe set
    is pairwise distinct — so no dedup shuffle is needed (``knn_lsh``'s
    argument)."""
    qp = (probe_cells_frame(queries, centroids, nprobe,
                            id_col=query_id_col, vec_col=vec_col)
          .select(F.col(query_id_col).alias("query_id"),
                  F.col(vec_col).alias("qv"), "__cell"))
    idx = index.select("vec_id", "codes",
                       F.col("cell").cast("int").alias("cell"),
                       F.col("cell").cast("string").alias("__cell"))
    # semantic no-op (the cogroup only scores cells that have probes),
    # but the broadcast semi-join on the PARTITION column re-enables
    # dynamic partition pruning on the index scan — a batch whose probe
    # union covers few cells reads only those cells' files, with no
    # driver round trip (plan-pinned); the probe-cell set is at most
    # k_coarse strings, always broadcastable
    probe_union = qp.select("__cell").distinct()
    idx = idx.join(F.broadcast(probe_union), "__cell", "left_semi")
    w_m = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    cand = (_batch_stage1_kernel(idx, qp, m, codebooks,
                                 centroids if residual else None)
            .withColumn("rank", F.row_number().over(w_m).cast("int"))
            .filter(F.col("rank") <= m))
    if vectors is None:
        return (cand.filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "cosine", "rank"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    return _exact_rerank_shuffle(cand.select("query_id", "neighbor_id"),
                                 q, vectors, k, id_col, vec_col)


def knn_ivf_pq_index_batch(index: DataFrame,
                           codebooks: list[list[list[float]]],
                           queries: DataFrame, k: int,
                           centroids: list[list[float]],
                           nprobe: int = 2, m: Optional[int] = None,
                           vectors: Optional[DataFrame] = None,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           query_id_col: str = "vec_id") -> DataFrame:
    """BATCH serving from a persisted ``write_ivf_pq_index`` table —
    the other half of the serving story ``max_query_rows`` enforces
    (r11): ``knn_ivf_pq_index`` is the ONLINE shape (a sample-sized
    query batch collected driver-side, its probe union pushed into the
    scan as a partition filter — read nprobe/k_coarse of the index),
    while this is the OFFLINE shape for query frames of ANY size —
    batch inference, corpus self-join analytics, recall sweeps: no
    driver collect anywhere, probes computed distributed by the Arrow
    kernel, candidates generated by a cell equi-join (each task handles
    one cell's candidates), and the exact re-rank shuffle-joined
    instead of broadcast. Reading the whole index instead of pruning
    partitions is the right trade exactly when the batch is large — a
    million queries' probe union covers every cell anyway, and one full
    scan amortized over the batch beats per-query pruned reads.

    "Reading the whole index" is the worst case, not the plan: the
    cell equi-join plans DYNAMIC PARTITION PRUNING on the index scan
    (``cell IN dynamicpruning#...`` — plan-pinned), so a batch whose
    probe union covers few cells still reads only those cells' files
    at runtime, with no driver round trip — the batch path degrades
    gracefully INTO the online path's IO shape as the batch shrinks.
    The stage-1 top-``m`` also runs as a partial ``WindowGroupLimit``
    before its exchange (rank-limit pushdown), so each task forwards
    at most m rows per query, not its whole candidate set.

    Same results as ``knn_ivf_pq_index`` for the same inputs
    (test-pinned): the stored cell is consumed directly, and stage 1
    runs as a cogrouped numpy kernel that is FLOAT-IDENTICAL to the
    family's ``cosine_col``/window stages (``_batch_stage1_kernel`` —
    codes decode inside the task, so the cogroup shuffle moves m small
    ints per row, not dim doubles). CONTRACT: ``index`` is
    ``write_ivf_pq_index``'s ``(vec_id, codes, cell)`` read back;
    ``vectors`` must cover every id in it (inner-join re-rank)."""
    m = _resolve_m(k, m)
    return _ivf_batch_serve(index, queries, k, centroids, nprobe, m,
                            vectors, codebooks, False, id_col, vec_col,
                            query_id_col)


def knn_ivf_rpq_index_batch(index: DataFrame,
                            codebooks: list[list[list[float]]],
                            queries: DataFrame, k: int,
                            centroids: list[list[float]],
                            nprobe: int = 2, m: Optional[int] = None,
                            vectors: Optional[DataFrame] = None,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            query_id_col: str = "vec_id") -> DataFrame:
    """BATCH serving from a persisted RESIDUAL index
    (``write_ivf_rpq_index``) — ``knn_ivf_pq_index_batch``'s residual
    twin: reconstruction = ``centroid[cell] + pq_decode(codes)`` (the
    stored cell is part of the encoding), then the shared batch core —
    kernel-probed queries, cogrouped stage-1 kernel (the centroid add
    happens inside it, elementwise-identical to the ``zip_with``
    decode), ADC top-``m``, shuffle exact re-rank. Same results as
    ``knn_ivf_rpq_index`` for the same inputs (test-pinned). See the
    flat twin for when to choose batch over the online
    partition-pruned path."""
    m = _resolve_m(k, m)
    return _ivf_batch_serve(index, queries, k, centroids, nprobe, m,
                            vectors, codebooks, True, id_col, vec_col,
                            query_id_col)


def refresh_ivf_pq_index(delta: DataFrame,
                         codebooks: list[list[list[float]]],
                         centroids: list[list[float]], path: str,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id") -> None:
    """Incremental maintenance for a ``write_ivf_pq_index`` table:
    encode ONLY the delta's full-precision vectors with the EXISTING
    model pair and APPEND the coded rows into their cell partitions —
    no rebuild, no read of the resident index. Because both the PQ
    encode and the cell assignment are row-wise functions of the FIXED
    (codebooks, centroids) models, appending an encoded delta is
    byte-equivalent to rebuilding the index over base ∪ delta with the
    same models (test-pinned) — ``mode("append")`` adds files inside
    existing ``cell=`` directories and creates new ones as needed,
    never touching resident files (concurrent serving keeps reading a
    consistent index; a serve racing the append simply misses the
    still-landing delta rows, the same read-committed story any
    append-only parquet layout has).

    What this does NOT do — and why ``ivf_pq_index_drift`` exists: the
    MODELS never move. As deltas accumulate, the corpus distribution
    can drift away from the quantizers it was trained on (cells skew,
    reconstruction error grows, recall sags), which an append-only
    index cannot see from the write path. Run the drift report on a
    held-out query sample after refresh cycles; when it recommends a
    refit, rebuild with ``ivf_pq_fit`` + ``write_ivf_pq_index``
    (mode="overwrite") — the same candidate/promote discipline as
    ``jobs/incremental_refresh.py``'s rollup maintenance.

    Scale shape: one map-only pass over the delta (the ``pq_encode``
    Arrow kernel fused with the assignment kernel's cells) and one
    build shuffle into the partitioned write — cost tracks |delta|,
    never |index|. Rows the codec cannot key (NULL / wrong-dimension /
    NULL-element) drop, ``write_ivf_pq_index``'s exact contract."""
    from .vectors import pq_encode

    codes = pq_encode(delta, codebooks, vec_col=vec_col, id_col=id_col)
    write_ivf_pq_index(codes, codebooks, centroids, path, mode="append")


def compact_ivf_pq_index(spark, path: str,
                         target_file_bytes: int = 128 * 2**20) -> dict:
    """Small-file compaction for a ``write_ivf_pq_index`` table: every
    ``refresh_ivf_pq_index`` cycle appends at least one file into each
    touched cell directory, so after N refreshes a probe reads N files
    per probed cell — listing and open() pressure that grows with
    maintenance history, not data. This rewrites each ``cell=``
    partition independently to ~``target_file_bytes`` files
    (``io.maintenance.compact_dataset``'s per-leaf recursion: the
    partition dirs, their value spelling, and therefore the probe
    pruning are untouched; each leaf swap is atomic, so a serve racing
    the compaction reads either the old or the new file set, never a
    mix of a partially-deleted one). Returns the compactor's
    ``{files_before, files_after, bytes, partitions}`` telemetry.

    Layout parity (r11): the residual index (``write_ivf_rpq_index``)
    shares the flat layout exactly — same ``(vec_id, codes)`` columns,
    same ``cell=`` partition dirs — so this one compactor bounds BOTH
    families' refresh-cycle file accumulation (test-pinned over a
    thrice-refreshed residual index, serving rows and probe pruning
    asserted unchanged).

    Lifecycle: ``write_ivf_pq_index`` (build) → ``refresh_ivf_pq_index``
    (append deltas) → this (bound the file count) →
    ``ivf_pq_index_drift`` (watch recall) → refit + rebuild when the
    flag says so — and identically for the ``_rpq_`` family."""
    from ..io.maintenance import compact_dataset

    return compact_dataset(spark, path,
                           target_file_bytes=target_file_bytes)


def ivf_pq_index_drift(index: DataFrame,
                       codebooks: list[list[list[float]]],
                       centroids: list[list[float]],
                       vectors: DataFrame, queries: DataFrame, k: int = 5,
                       nprobe: int = 2, m: Optional[int] = None,
                       recall_floor: float = 0.8,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       query_id_col: str = "vec_id",
                       residual: bool = False,
                       max_query_rows: int = DEFAULT_MAX_QUERY_ROWS
                       ) -> DataFrame:
    """Model-drift telemetry for an append-maintained IVF-PQ index: ONE
    aggregated row comparing what the persisted index actually serves
    (``knn_ivf_pq_index`` with the CURRENT models, partition-pruned)
    against brute-force truth over the full-precision corpus on a
    held-out query sample. Output: ``(n_queries, n_servable, mean_recall,
    min_recall, refit_recommended)`` — ``refit_recommended`` when the
    MEAN recall over servable queries falls below ``recall_floor`` (or
    when NO query was servable at all, the degenerate-model case).

    This is the feedback loop ``refresh_ivf_pq_index`` deliberately
    lacks: append-only maintenance keeps the models frozen, so recall
    decay from distribution drift is invisible to the write path —
    measured recall on a sample the index did NOT train on is the one
    signal that says "refit". ``n_servable`` < ``n_queries`` separately
    exposes queries the quantizer cannot key (unservable vectors emit
    no recall row at all, ``ann_recall``'s universe contract).

    Plan shape: truth = one broadcast-queries corpus scan
    (``knn_bruteforce``); served = the pruned-probe serving path under
    test; the comparison joins two |queries|·k-row frames and folds to
    a single row — run it on a SAMPLE, the ground truth is the linear
    cost (``ann_recall``'s standing rule). The query sample is pinned
    ONCE at construction (the ``knn_ivf_pq_index`` r9 rule, applied to
    the whole report): served, truth, and ``n_queries`` all read the
    SAME collected rows, so a nondeterministic or concurrently-appended
    queries frame cannot put rows in the truth that the served side
    never probed (which would spuriously depress recall and fire the
    refit flag on a healthy index). The held-out-SAMPLE contract is
    enforced (r11): the pin collects at most ``max_query_rows`` rows
    and raises loudly past it — the report's truth side is a
    brute-force scan per query, so a corpus passed as the sample would
    otherwise OOM the driver AND run |corpus| brute-force scans."""
    if not 0.0 <= recall_floor <= 1.0:
        raise ValueError("recall_floor must be within [0, 1]")
    # ONE pin for the whole report (r12): the pruned-probe scan's
    # guarded collect pins the batch, computes the probe union, AND
    # hands back the rows — serve, truth, and n_queries all read the
    # same evaluation. Previously the report pinned first and the serve
    # re-pinned from the local relation: two extra driver jobs per
    # pass, two extra cluster-wide barriers at scale.
    m_res = _resolve_m(k, m)
    queries, pruned, pinned_rows = _pruned_probe_scan(
        index, queries, centroids, nprobe, vec_col, query_id_col,
        max_query_rows, with_rows=True)
    # ``residual=True`` watches a write_ivf_rpq_index table instead —
    # same report, the serving path under test swaps to the residual
    # pruned scan (the one whose frozen models are COSTLIER to refit,
    # since every stored code re-encodes with the new cell)
    served = (_serve_pruned(pruned, codebooks, queries, k, centroids,
                            nprobe, m_res, vectors, id_col, vec_col,
                            query_id_col, residual=residual)
              .select("query_id", "neighbor_id",
                      F.lit(1).alias("__hit")))
    # the truth side keeps only queries the quantizer can KEY
    # (ann_recall's universe contract): an unservable query probes
    # nothing structurally, so leaving it in the brute-force truth
    # would report it as recall 0 instead of excluding it from
    # n_servable — drift and unservability are different signals
    from .vectors import well_formed_pred
    servable = queries.filter(
        well_formed_pred(vec_col, len(centroids[0])))
    truth = knn_bruteforce(vectors, servable, k, id_col=id_col,
                           vec_col=vec_col, query_id_col=query_id_col)
    # n_queries = COUNT(DISTINCT id) over the PINNED batch — the rows
    # are already on the driver (the serving-contract collect), so the
    # count is a Python fold over them instead of an extra aggregate
    # job + crossJoin in the report plan (r11 optimization round; same
    # value by construction: the pinned local relation IS the frame the
    # aggregate counted). Scope note (r11 ADVICE): the set fold matches
    # SQL count_distinct for the int/string id contract of this family;
    # array/map-typed ids would be unhashable and NaN float ids would
    # each count distinct — both out of contract for vec_id keys.
    n_queries = len({r[0] for r in pinned_rows if r[0] is not None})
    per_q = (truth.select("query_id", "neighbor_id")
             .join(served, ["query_id", "neighbor_id"], "left")
             .groupBy("query_id")
             .agg((F.count("__hit") / F.count(F.lit(1))).alias("__recall")))
    return (per_q
            .agg(F.count(F.lit(1)).alias("n_servable"),
                 F.round(F.avg("__recall"), 6).alias("mean_recall"),
                 F.round(F.min("__recall"), 6).alias("min_recall"))
            .select(F.lit(n_queries).cast("long").alias("n_queries"),
                    "n_servable", "mean_recall", "min_recall",
                    F.when(F.col("n_servable") == 0, F.lit(True))
                    .otherwise(F.col("mean_recall") < F.lit(recall_floor))
                    .alias("refit_recommended")))
