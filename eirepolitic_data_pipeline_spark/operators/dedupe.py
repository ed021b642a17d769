"""Dedupe operators: exact, conflict-evidence, and near-duplicate detection
(n-gram Jaccard, MinHash+LSH, SimHash) — SURVEY §2.7 plus the
training-data-pipeline dedup family.

Scale design notes:
- Near-dup candidate generation is always *bucketed* (shingle inverted index
  with a document-frequency cap, MinHash bands, SimHash bands) — candidate
  pairs are produced by key-partitioned equi-joins, never an n² cross join.
- All hashing is content-derived (md5 of strings) so outputs are
  deterministic, reproducible, and engine-independent.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator, Optional, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as tx


# ---------------------------------------------------------------------------
# Key dedupe (O3/O4/O5/O6)
# ---------------------------------------------------------------------------

def dedupe_keep_first(df: DataFrame, keys: Sequence[str],
                      order_by: Sequence[Column]) -> DataFrame:
    """O3 keep-first PK dedupe with an EXPLICIT order (pandas keep='first'
    depends on frame order; Spark requires the order to be stated)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def dedupe_total_order(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """PK dedupe whose winner is DETERMINISTIC without the caller naming an
    order: ties break by a total order over every remaining (orderable)
    column. ``dropDuplicates([pk])`` keeps whichever row the shuffle
    delivers first — fine when duplicates are byte-identical, but same-PK
    rows with different payloads (overlapping fetch pages either side of
    an upstream edit) then flip winners between runs, recording spurious
    row changes on every refresh. Map-typed columns are excluded (not
    orderable); with no orderable non-key columns this degrades to
    dropDuplicates, which is then deterministic anyway."""
    keyset = set(keys)
    tiebreak = [F.col(f.name).desc_nulls_last() for f in df.schema.fields
                if f.name not in keyset
                and "map<" not in f.dataType.simpleString()]
    if not tiebreak:
        return df.dropDuplicates(list(keys))
    return dedupe_keep_first(df, keys, order_by=tiebreak)


def dedupe_keep_last(df: DataFrame, keys: Sequence[str],
                     order_by: Sequence[Column]) -> DataFrame:
    """O4 keep-last: same as keep-first with the order reversed by caller —
    provided for intent-revealing call sites (upsert precedence)."""
    w = Window.partitionBy(*keys).orderBy(*[c.desc() if hasattr(c, "desc") else c
                                            for c in order_by])
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def dedupe_with_conflicts(df: DataFrame, business_key: Sequence[str],
                          compared: Sequence[str]) -> tuple[DataFrame, DataFrame]:
    """O6 conflict-evidence dedupe (reference `history_dedupe.py:16-63`):
    collapse exact duplicate business rows; business keys whose compared
    fields DISAGREE are reported as conflicts instead of silently resolved.

    Returns (deduped, conflicts): ``deduped`` keeps one row per
    (business_key + compared) combination; ``conflicts`` has one row per
    business key with >1 distinct compared-tuple, with the distinct count.
    """
    distinct_rows = df.dropDuplicates([*business_key, *compared])
    conflicts = (
        df.groupBy(*business_key)
        .agg(F.countDistinct(F.struct(*compared)).alias("distinct_variants"))
        .filter(F.col("distinct_variants") > 1)
    )
    return distinct_rows, conflicts


# ---------------------------------------------------------------------------
# Exact near-dup by content fingerprint
# ---------------------------------------------------------------------------

def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Exact dedup REPORT: normalized-content fingerprint → canonical id
    (min id) per group + group size, one output row per INPUT row. One
    shuffle on the fingerprint.

    Hot-group caveat: the window buffers each duplicate group in one task,
    so this per-row report grain is for inspection/audit outputs. A
    curation pipeline that only needs the survivors must use
    ``exact_canonical_ids`` — a page duplicated 100M times is exactly the
    group this window would choke on and exactly the case dedup exists
    for."""
    w = Window.partitionBy("fingerprint")
    return (
        df.select(id_col, tx.doc_fingerprint(text_col).alias("fingerprint"))
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("dup_group_size", F.count(F.lit(1)).over(w))
    )


def exact_canonical_ids(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """The ids that SURVIVE exact dedup (min id per normalized-content
    fingerprint), as a one-column frame for a semi-join.

    This is the skew-proof shape for the curation hot path: min() is
    algebraic, so the single shuffle carries one partial (fingerprint,
    min-so-far) row per map partition — a fingerprint shared by 100M
    byte-identical documents costs the reduce task ONE row per upstream
    partition, where the per-row window form (`exact_duplicate_groups`)
    would buffer all 100M in a single task."""
    return (df.select(id_col, tx.doc_fingerprint(text_col).alias("fingerprint"))
            .groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
            .select(id_col))


# ---------------------------------------------------------------------------
# Vectorized shingle kernels (Arrow-batched)
# ---------------------------------------------------------------------------
#
# Tokenize→shingle→hash is the CPU-bound inner loop of every near-dup
# operator. Expressed as Catalyst higher-order functions it is *interpreted*
# (lambda functions never enter whole-stage codegen): measured 34 CPU-s for
# the Jaccard path and 105 CPU-s for 8-hash MinHash over a 5k-doc fixture —
# ~50x the work of the same loop in compiled code. mapInPandas runs the loop
# at native speed (hashlib/C string ops), streams Arrow batches straight out
# of the scan partition, and adds NO shuffle, so the plan shape at 100 TB is
# unchanged: postings/signatures are produced map-side, then the bucketed
# join machinery below stays JVM-side. Hashes stay content-derived
# (md5 of the shingle text) — deterministic and engine-independent, matching
# the SQL oracle's md5() exactly.

_WS_RE = re.compile(r"\s+", re.ASCII)


def _shingle_set(text, n: int) -> set[str]:
    """Distinct word n-gram shingles; mirrors ``functions.text.word_shingles``
    (lowercase, ASCII \\s+ split with empty tokens dropped — Python
    ``str.split()`` semantics, <n tokens → one whole-text shingle) so the
    Arrow kernels and the Catalyst/oracle paths agree byte-for-byte.

    The empty-token drop is load-bearing: a ``strip(' ')``-then-split kept
    a phantom '' token for \\n/\\t/\\r-edged text (documents routinely end
    with a newline), which fabricated trailing-space shingles and inflated
    ``n_sh`` — every Jaccard/MinHash result silently drifted from the
    certified ``tokens()``/oracle semantics on real corpora."""
    t = ("" if text is None or (isinstance(text, float) and text != text)
         else str(text)).lower()
    toks = [w for w in _WS_RE.split(t) if w]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _md5_int64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big", signed=True)


def shingle_postings(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Inverted-index posting rows ``(doc_id, n_sh, key)``: one row per
    distinct shingle per document, ``key`` = first 8 bytes of md5(shingle)
    as int64 (compact 8-byte shuffle key), ``n_sh`` = the doc's distinct
    shingle count (carried so Jaccard needs no second pass over the doc).

    Map-side only — partitioning of ``df`` is preserved, no shuffle."""
    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nshs, keys = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                ss = _shingle_set(text, n)
                n_sh = len(ss)
                for s in ss:
                    ids.append(doc_id)
                    nshs.append(n_sh)
                    keys.append(_md5_int64(s))
            yield pd.DataFrame({id_col: ids, "n_sh": nshs, "key": keys})

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, n_sh int, key long") \
        .withColumnRenamed(id_col, "doc_id")


# ---------------------------------------------------------------------------
# Shared candidate-pair machinery
# ---------------------------------------------------------------------------

#: Default stop-key document-frequency cap for candidate generation. A key
#: (shingle / band bucket) shared by df documents expands to df²/2 pairs in
#: ONE task — unbounded, a single hot key stalls the stage at corpus scale.
#: 1000 is far above any true near-dup cluster yet bounds a task at ~500k
#: pairs; production corpora should set it near 0.1% of the document count.
DEFAULT_MAX_DF = 1000


def pairs_from_postings(postings: DataFrame, key: str = "key",
                        payload_cols: Sequence[str] = (),
                        max_df: Optional[int] = DEFAULT_MAX_DF) -> DataFrame:
    """Turn an inverted index (key → doc rows) into candidate doc pairs.

    One groupBy(key) + collect_list + nested-transform pair generation —
    measured ~2× faster than the equivalent self-equi-join because the
    posting subtree is evaluated once and only one shuffle runs. Each output
    row is (key, doc_a, doc_b, a.*, b.*) with doc_a < doc_b.

    ``max_df`` is the skew guard: posting lists longer than it are dropped
    whole (stop-key semantics, cf. stop-shingles in web-scale dedup). The
    filter runs on the already-collected array size, so it costs no extra
    shuffle. Pass ``None`` to disable (small, trusted inputs only).
    """
    payload = [F.col("doc_id").alias("doc_id"),
               *[F.col(c).alias(c) for c in payload_cols]]
    # Hash-repartition by key up front: the groupBy reuses this partitioning
    # (no second exchange) and the explicit count keeps AQE from coalescing
    # the small-byte-but-CPU-heavy pair-expansion stage onto one core. The
    # count follows spark.sql.shuffle.partitions — the cluster-sized knob —
    # capped at 4x the session's core count so an untuned session (Spark's
    # built-in 200 default) doesn't fragment the CPU-heavy stage into
    # hundreds of tiny tasks on a small machine. (Note: conf.get's second
    # argument is NOT the fallback for registered confs — the built-in
    # default "200" always wins — so the cap does the sizing.)
    from ..session import shuffle_partitions
    spark = postings.sparkSession
    n_parts = min(shuffle_partitions(spark),
                  4 * spark.sparkContext.defaultParallelism)
    postings = postings.repartition(n_parts, F.col(key))
    grouped = postings.groupBy(key).agg(
        F.array_sort(F.collect_list(F.struct(*payload))).alias("__ds"))
    if max_df is not None:
        grouped = grouped.filter(F.size("__ds") <= max_df)
    # Pair expansion as TWO chained Generate (explode) operators instead
    # of one interpreted flatten×nested-transform array build (r12,
    # guide §4 "prefer built-ins with codegen"): the lambda HOF tree
    # evaluated one interpreted expression node per (element, pair) —
    # never whole-stage-codegen'd — where posexplode + explode(slice)
    # run inside one codegen stage with no intermediate pair array.
    # Emitted rows are identical (i ascending, then slice order; doc_a
    # < doc_b by the array_sort above).
    x = F.col("__x")
    y = F.col("__y")
    e1 = grouped.select(F.col(key), F.col("__ds"),
                        F.posexplode("__ds").alias("__i", "__x"))
    e2 = e1.select(
        F.col(key), x, F.explode(
            F.slice("__ds", F.col("__i") + 2, F.size("__ds")))
        .alias("__y"))
    return e2.select(
        F.col(key),
        x["doc_id"].alias("doc_a"), y["doc_id"].alias("doc_b"),
        *[x[c].alias(f"a_{c}") for c in payload_cols],
        *[y[c].alias(f"b_{c}") for c in payload_cols])


# ---------------------------------------------------------------------------
# N-gram Jaccard via inverted shingle index
# ---------------------------------------------------------------------------

def jaccard_similar_pairs(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", n: int = 3,
                          threshold: float = 0.2,
                          max_shingle_df: Optional[int] = DEFAULT_MAX_DF) -> DataFrame:
    """Near-dup pairs with n-gram Jaccard ≥ threshold.

    Inverted-index plan: explode distinct shingles → drop stop-shingles
    whose document frequency exceeds ``max_shingle_df`` (ON by default —
    the skew guard that keeps the self-join linear in true near-dup density
    at corpus scale) → self-equi-join on shingle → per-pair intersection
    count → Jaccard. Dropping ubiquitous shingles can only *lower* recall on
    pairs that were already sharing mostly-ubiquitous content, which is the
    accepted trade in web-scale dedup pipelines (cf. Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"). The cap is
    enforced on the collected posting-list size inside
    ``pairs_from_postings`` — no extra shuffle.
    """
    ex = shingle_postings(df, text_col, id_col, n)
    pairs = (
        pairs_from_postings(ex, key="key", payload_cols=["n_sh"],
                            max_df=max_shingle_df)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"),
             F.any_value("a_n_sh").alias("n_a"),
             F.any_value("b_n_sh").alias("n_b"))
    )
    jac = F.col("shared").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return pairs.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 3,
                       num_hashes: int = 32) -> DataFrame:
    """Content-derived MinHash signatures: per salt h, min(md5("h:" ||
    shingle)) over the doc's distinct shingle set — identical recipe to the
    SQL oracle's ``list_min(list_transform(shingles, s -> md5(h||':'||s)))``.

    Computed in a vectorized Arrow kernel (see module note above): the
    num_hashes × shingles md5 loop is the single hottest loop in the dedup
    family and interpreted Catalyst lambdas ran it ~50x slower. Map-side
    only; one output row per doc."""
    id_type = df.schema[id_col].dataType.simpleString()
    salts = [f"{h}:".encode() for h in range(num_hashes)]
    cols = [f"mh{h}" for h in range(num_hashes)]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        md5 = hashlib.md5
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                enc = [s.encode() for s in _shingle_set(text, n)]
                rows.append([doc_id] + [
                    min(md5(salt + e).hexdigest() for e in enc)
                    for salt in salts])
            yield pd.DataFrame(rows, columns=[id_col] + cols)

    schema = ", ".join([f"{id_col} {id_type}"] + [f"{c} string" for c in cols])
    return df.select(id_col, text_col).mapInPandas(kernel, schema=schema) \
        .withColumnRenamed(id_col, "doc_id")


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", n: int = 3,
                           num_hashes: int = 32, band_rows: int = 4,
                           collisions: bool = True) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash: docs sharing any band
    signature. bands = num_hashes/band_rows; collision prob for Jaccard j is
    1-(1-j^band_rows)^bands — tune (num_hashes, band_rows) to the target
    threshold. The band join partitions by band_key: no n² anywhere.

    ``collisions=False`` drops the ``band_collisions`` column and returns
    DISTINCT (doc_a, doc_b) pairs in one shuffle: the countDistinct
    aggregate plans as a two-phase distinct (an extra shuffle over the
    candidate set) that callers who only gate on "shared any band"
    (minhash_dedup's verify) never read."""
    _check_band_config(num_hashes, band_rows)
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes)
    pairs = _banded_pairs(sigs, num_hashes, band_rows)
    if not collisions:
        return pairs.select("doc_a", "doc_b").distinct()
    return (
        pairs
        .groupBy("doc_a", "doc_b")
        .agg(F.countDistinct("band_key").alias("band_collisions"))
    )


def _check_band_config(num_hashes: int, band_rows: int) -> None:
    if band_rows < 1 or num_hashes < 1:
        raise ValueError(
            f"num_hashes ({num_hashes}) and band_rows ({band_rows}) must be "
            ">= 1")
    if num_hashes % band_rows != 0:
        # a silent floor-division here would discard the trailing hashes
        # (32 hashes / 5-row bands -> 2 hashes never banded), and
        # band_rows > num_hashes would yield ZERO bands — every document
        # its own canonical, near-dup dedup silently disabled
        raise ValueError(
            f"band_rows ({band_rows}) must divide num_hashes ({num_hashes}) "
            "exactly; bands = num_hashes / band_rows")


def _banded_pairs(sigs: DataFrame, num_hashes: int,
                  band_rows: int) -> DataFrame:
    """Band a (doc_id, mh0..mhN) signature frame into candidate pairs —
    the banding step shared by minhash_lsh_candidates and minhash_dedup
    (whose signatures arrive from the fused kernel)."""
    band_exprs = []
    for band in range(num_hashes // band_rows):
        parts = [F.col(f"mh{band * band_rows + r}") for r in range(band_rows)]
        band_exprs.append(F.concat_ws("|", F.lit(f"{band}:"), *parts))
    bands = (sigs
             .select("doc_id", F.explode(F.array(*band_exprs)).alias("band_str"))
             .select("doc_id", F.xxhash64("band_str").alias("band_key")))
    return pairs_from_postings(bands, key="band_key")


def _minhash_postings_signatures(df: DataFrame, text_col: str, id_col: str,
                                 n: int, num_hashes: int) -> DataFrame:
    """Fused kernel for minhash_dedup: ONE pass over the corpus text
    computes, per document, BOTH the MinHash signature (mh0..mhN, the
    minhash_signatures recipe verbatim) and the shingle posting keys
    (``keys`` = int64 8-byte md5 prefixes, the shingle_postings recipe
    verbatim) plus ``n_sh``. One row per doc; callers derive the
    signature frame by column selection and the posting rows by
    ``explode(keys)``.

    Why fused: minhash_dedup needs both artifacts, and running the two
    standalone kernels costs two full corpus scans with the shingle set
    tokenized and materialized twice per document — at 100 TB, one
    whole extra pass over the corpus for byte-identical intermediate
    state. The standalone kernels remain the public operators (q24/q25
    certify them); this is their composition-shaped twin, kept private
    so the recipes can never drift apart silently — each output column
    is pinned to its public twin by tests."""
    id_type = df.schema[id_col].dataType.simpleString()
    salts = [f"{h}:".encode() for h in range(num_hashes)]
    sig_cols = [f"mh{h}" for h in range(num_hashes)]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        md5 = hashlib.md5
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                ss = _shingle_set(text, n)
                enc = [s.encode() for s in ss]
                sig = [min(md5(salt + e).hexdigest() for e in enc)
                       for salt in salts]
                rows.append([doc_id, len(ss),
                             [_md5_int64(s) for s in ss]] + sig)
            yield pd.DataFrame(
                rows, columns=[id_col, "n_sh", "keys"] + sig_cols)

    schema = ", ".join(
        [f"{id_col} {id_type}", "n_sh int", "keys array<long>"]
        + [f"{c} string" for c in sig_cols])
    return df.select(id_col, text_col).mapInPandas(kernel, schema=schema) \
        .withColumnRenamed(id_col, "doc_id")


def minhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3, num_hashes: int = 32, band_rows: int = 4,
                  threshold: float = 0.7, max_iters: int = 10) -> DataFrame:
    """Full MinHash dedup: LSH candidates → exact Jaccard verify → connected
    components. Returns (id, canonical_id) where canonical is the min id of
    the doc's *component* — duplicate chains A~B~C (A≁C directly) collapse
    to one canonical id via the closure (``min_label_components``: a
    single-task exact union-find for small verified edge lists, the
    iterative min-label loop bounded by ``max_iters`` past
    ``SMALL_GRAPH_MAX_EDGES``).

    Corpus scans: exactly ONE. Signatures and postings both come off the
    fused kernel frame (_minhash_postings_signatures) — running the two
    public kernels separately costs a second full pass over the corpus
    text with every document's shingle set tokenized and hashed twice
    (r7; at 100 TB that second pass IS the bill). The fused frame is
    persisted across all three consumers (banding + both verify sides)
    and unpersisted as soon as the closure has materialized the edge
    list."""
    _check_band_config(num_hashes, band_rows)
    fused = _minhash_postings_signatures(df, text_col, id_col,
                                         n, num_hashes).persist()
    # finally: the closure raises BY DESIGN on non-convergence, and a
    # long-lived session (curate CLI, notebook) retrying with a raised
    # max_iters must not accumulate corpus-sized leaked cache entries
    # (review r7)
    try:
        verified = _minhash_verified_pairs(fused, num_hashes, band_rows,
                                           threshold)
        out = min_label_components(df.select(F.col(id_col).alias("id")),
                                   verified, max_iters) \
            .select(F.col("id").alias(id_col), "canonical_id")
    finally:
        fused.unpersist()
    return out


def _minhash_verified_pairs(fused: DataFrame, num_hashes: int,
                            band_rows: int, threshold: float) -> DataFrame:
    """Candidate generation + exact verify over the fused kernel frame:
    banded LSH pairs, then exact-Jaccard verify over the inverted index
    (posting explode + two hash joins + one count), NOT array_intersect
    over collected shingle arrays — the array form is an interpreted
    higher-order expression re-shingling the corpus per candidate side,
    and it ships both docs' full arrays into one row; this shape keeps the
    verify map-side-combined and bounded by (candidate pairs ×
    shingles/doc). Pure plan, no actions; ``fused`` must be persisted by
    the caller (three consumers: banding + both verify sides)."""
    cand = _banded_pairs(
        fused.select("doc_id", *[f"mh{h}" for h in range(num_hashes)]),
        num_hashes, band_rows).select("doc_a", "doc_b").distinct()
    ck = fused.select("doc_id", "n_sh", F.explode("keys").alias("key"))
    ka = ck.select(F.col("doc_id").alias("doc_a"),
                   F.col("n_sh").alias("n_a"), "key")
    kb = ck.select(F.col("doc_id").alias("doc_b"),
                   F.col("n_sh").alias("n_b"), "key")
    return (
        cand.join(ka, "doc_a").join(kb, ["doc_b", "key"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"),
             F.any_value("n_a").alias("n_a"),
             F.any_value("n_b").alias("n_b"))
        .filter((F.col("inter")
                 / (F.col("n_a") + F.col("n_b") - F.col("inter")))
                >= threshold)
        .select("doc_a", "doc_b")
    )


def minhash_dedup_keep(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 3,
                       num_hashes: int = 32, band_rows: int = 4,
                       threshold: float = 0.7,
                       max_iters: int = 10) -> DataFrame:
    """Survivor-set twin of ``minhash_dedup``: returns the rows of ``df``
    whose id IS its component's canonical (the minimum), dropping every
    other near-duplicate — the exact frame a curation pipeline keeps.

    Same engine, different final shape (r8): a row survives iff it is not
    a component LOSER (an edge node whose component-min label differs from
    its own id), so the survivor set is one ANTI-join of the corpus
    against the loser frame — which is bounded by the edge nodes, orders
    of magnitude smaller than the corpus. ``minhash_dedup`` + filter +
    semi-join computes the same thing with TWO corpus-wide joins (attach
    the full mapping, then re-filter it); at 100 TB that second
    corpus-sized shuffle join is the difference."""
    _check_band_config(num_hashes, band_rows)
    fused = _minhash_postings_signatures(df, text_col, id_col,
                                         n, num_hashes).persist()
    try:
        verified = _minhash_verified_pairs(fused, num_hashes, band_rows,
                                           threshold)
        labels = _edge_node_labels(verified, max_iters)
    finally:
        fused.unpersist()
    if labels is None:
        return df
    losers = (labels.filter(F.col("label") != F.col("id"))
              .select(F.col("id").alias(id_col)))
    return df.join(losers, id_col, "left_anti")


#: Directed-edge-row ceiling for min_label_components' single-task
#: union-find fast path. 2M edge rows is ~32 MB of Arrow at two 8-byte ids
#: per row — one comfortable task on any executor, and a pure-numpy
#: union-find over 2M edges runs in low single-digit seconds. Graphs past
#: the ceiling take the distributed O(diameter) loop.
SMALL_GRAPH_MAX_EDGES = 2_000_000


def min_label_components(ids: DataFrame, pairs: DataFrame,
                         max_iters: int = 10,
                         small_graph_max_edges: int | None = None
                         ) -> DataFrame:
    """Connected components: returns (id, canonical_id) where canonical is
    the component minimum. ``ids`` has one ``id`` column; ``pairs`` has
    (doc_a, doc_b) undirected edges (either orientation).

    CONTRACT: every pair endpoint must be an element of ``ids``. Labels
    are seeded from edge ENDPOINTS (the edge-node optimization below), so
    an endpoint outside ``ids`` would propagate as a component minimum and
    surface as a canonical_id that names a row the caller never provided —
    out-of-universe canonicals, with no error. All in-repo callers derive
    ``pairs`` from the same frame as ``ids``, which satisfies this by
    construction; external callers with independently-sourced edges must
    pre-filter both endpoints to the id universe (note that dropping an
    edge whose bridge node is genuinely absent from ``ids`` is the correct
    semantics — that node is not part of the universe being deduped).

    Two execution shapes, picked by the edge count the empty-graph probe
    already pays for (r8):

    - **small graph** (≤ ``small_graph_max_edges`` directed edge rows,
      default ``SMALL_GRAPH_MAX_EDGES``): one ``applyInPandas`` task runs
      an exact path-compressed union-find over the whole edge list —
      zero propagation rounds, one shuffle, one materializing job. This is
      the common production shape: after exact dedup, verified near-dup
      edges are orders of magnitude sparser than the corpus (at bench
      scale the iterative loop's per-round checkpoint+count jobs were
      ~7s of pure scheduler overhead over 241 edges). Union-find is
      exact, so ``max_iters`` never binds here.
    - **large graph**: iterative min-label propagation — each round one
      join + one groupBy on the edge list, O(diameter) rounds (near-dup
      components have tiny diameters, 2-3 rounds typical). The edge list
      is persisted once; labels are lazily localCheckpoint-ed per round
      (the round's convergence count is the materializing action — one
      job per round). The convergence check is a scalar count, never a
      data collect.

    Propagation runs ONLY over nodes that touch an edge: an id with no
    edge is its own canonical by definition, so carrying the full corpus
    through the per-round joins/checkpoints would cost O(|ids|) per round
    for rows whose label can never change — at corpus scale the edge-node
    set is orders of magnitude smaller than the id set (true near-dups
    are the exception, not the rule). Non-edge ids attach as
    self-canonical in one final left join."""
    labels = _edge_node_labels(pairs, max_iters, small_graph_max_edges)
    if labels is None:
        return ids.select("id", F.col("id").alias("canonical_id"))
    return (ids.join(labels, "id", "left")
            .select("id", F.coalesce("label", F.col("id"))
                    .alias("canonical_id")))


def _edge_node_labels(pairs: DataFrame, max_iters: int = 10,
                      small_graph_max_edges: int | None = None
                      ) -> Optional[DataFrame]:
    """Engine of min_label_components: the MATERIALIZED (id, label) frame
    for edge nodes only — label = component minimum — or ``None`` for an
    empty edge list (every id is then its own canonical and no join is
    needed at all). All internal caches are released before returning; the
    returned frame is localCheckpoint-ed, so callers may consume it any
    number of times without re-deriving the (expensive) pair list.

    Exposed separately (r8) so survivor-set callers (minhash_dedup_keep)
    can anti-join the LOSERS (label != id, a frame bounded by the edge
    nodes) instead of attaching the full corpus-sized canonical mapping
    and re-filtering it — one corpus-wide join instead of two."""
    if small_graph_max_edges is None:
        small_graph_max_edges = SMALL_GRAPH_MAX_EDGES
    # NULL endpoints are outside the contract (an id frame can't contain
    # NULL), but they must not reach the kernel: pd.factorize codes a
    # missing value as -1, which would PYTHON-NEGATIVE-INDEX the parent
    # array and silently corrupt the closure — dropping the edge is the
    # defined, conservative outcome on both paths
    pairs = pairs.filter(F.col("doc_a").isNotNull()
                         & F.col("doc_b").isNotNull())
    edges = pairs.select("doc_a", "doc_b").unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"),
                     F.col("doc_a").alias("doc_b"))).persist()
    # Empty-graph fast path (r7): common in production (a near-dup pass
    # after exact dedup often verifies no pairs). The count doubles as the
    # small/large gate (r8) and as the edge cache's materializing action.
    n_edges = edges.count()
    if n_edges == 0:
        edges.unpersist()
        return None
    if n_edges <= small_graph_max_edges:
        id_type = pairs.schema["doc_a"].dataType.simpleString()

        def uf(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np
            # dense int codes so the parent array is a numpy vector and
            # the component-min lands on the ORIGINAL ids via groupby
            both = pd.concat([pdf["doc_a"], pdf["doc_b"]],
                             ignore_index=True)
            codes, uniq = pd.factorize(both)
            m = len(pdf)
            a, b = codes[:m].tolist(), codes[m:].tolist()
            # plain-list parent array: the find loop is pure Python, and
            # list indexing is several times cheaper per step than numpy
            # scalar indexing — it bounds the single task's wall at the
            # SMALL_GRAPH_MAX_EDGES ceiling
            parent = list(range(len(uniq)))

            def find(i: int) -> int:
                while parent[i] != i:
                    parent[i] = parent[parent[i]]
                    i = parent[i]
                return i

            for i, j in zip(a, b):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
            roots = np.array([find(i) for i in range(len(uniq))])
            u = pd.Series(uniq)
            lab = u.groupby(roots).transform("min")
            return pd.DataFrame({"id": u, "label": lab})

        labels = (edges.groupBy(F.lit(0).alias("__g"))
                  .applyInPandas(uf, schema=f"id {id_type}, "
                                            f"label {id_type}")
                  .localCheckpoint(eager=False))
        # materialize the checkpoint before releasing the edge cache —
        # the returned plan must not re-derive the (expensive upstream)
        # edge list when the caller finally acts on it
        labels.count()
        edges.unpersist()
        return labels
    # Seed labels with the FIRST propagation round fused in: from identity
    # labels, round 1 would compute min(id, min over neighbor ids) — but
    # that is derivable at seed time from the edge list alone (one
    # map-side-combined groupBy), without the join + checkpoint + count
    # cycle a loop round costs. Same fixed point, one fewer round — both
    # at bench scale (each round is ~1s of checkpoint/job overhead) and at
    # cluster scale (one fewer shuffle over the edge list). doc_a alone
    # covers every endpoint because both orientations are present.
    # ALL checkpoints in the closure are LAZY (eager=False, r7): an eager
    # localCheckpoint is its own Spark job, so every round used to pay two
    # scheduler round-trips (materialize, then count). Lazily, the round's
    # convergence count is the action that materializes the round's blocks
    # — one job per round, same truncated lineage (the seed's blocks
    # materialize inside round 1's count).
    labels = (edges.groupBy("doc_a")
              .agg(F.min("doc_b").alias("__nb"))
              .select(F.col("doc_a").alias("id"),
                      F.least("doc_a", "__nb").alias("label"))
              .localCheckpoint(eager=False))
    changed = 0
    for _ in range(max_iters):
        nbr = (edges.join(labels, edges.doc_b == labels.id)
               .groupBy("doc_a").agg(F.min("label").alias("nbr_label")))
        # the convergence flag rides the checkpointed frame: counting it is
        # a filter over the blocks the count itself materializes — no
        # shuffle and no second join-the-old-frame job per round (r6; the
        # extra per-round shuffle join was ~40% of the closure's wall at
        # bench scale)
        new_label = F.least("label", F.coalesce("nbr_label", "label"))
        new_labels = (
            labels.join(nbr, labels.id == nbr.doc_a, "left")
            .select(F.col("id"), new_label.alias("label"),
                    (new_label != F.col("label")).alias("__changed"))
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # exhausting the rounds without a fixed point means some rows hold
        # INTERMEDIATE labels — one component would surface as several
        # "canonicals", silently under-deduping every caller. A chain of
        # diameter > max_iters (serially edited boilerplate) is a real
        # input; failing loudly is the only safe reaction the operator can
        # take on the callers' behalf.
        raise RuntimeError(
            f"min_label_components did not converge in {max_iters} rounds "
            f"({changed} labels still changing) — the pair graph has a "
            "component with diameter > max_iters; raise max_iters")
    return labels


def _shingle_strings(df: DataFrame, text_col: str, id_col: str,
                     n: int) -> DataFrame:
    """Raw-string sibling of shingle_postings: one (doc_id, s) row per
    distinct shingle per document, ``s`` the shingle TEXT itself. Only for
    bounded inputs (decontaminate's verify pass re-shingles candidate hits
    only) — at corpus scale the 8-byte key form is the shuffle-friendly
    one."""
    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ss = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                for s in _shingle_set(text, n):
                    ids.append(doc_id)
                    ss.append(s)
            yield pd.DataFrame({id_col: ids, "s": ss})

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, s string") \
        .withColumnRenamed(id_col, "doc_id")


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 8, verify: bool = False) -> tuple[DataFrame, DataFrame]:
    """Benchmark decontamination (beyond-ref; the n-gram-overlap test-set
    filter every training-data pipeline needs, cf. GPT-3 appendix C /
    Brown et al. 2020): drop corpus documents sharing ANY word n-gram with
    the benchmark set. Returns ``(kept, contaminated)`` where contaminated
    is (id, n_hits = number of distinct corpus-doc shingles also present
    in the benchmark).

    Plan: both sides run the same vectorized shingle kernel; the
    benchmark's distinct 8-byte keys are typically tiny (eval sets are
    thousands of docs) so the hit-join broadcasts — corpus-side work is one
    map pass + one broadcast semi-join, no shuffle of the corpus. Long n
    (default 8) keeps collisions to verbatim overlap, the standard
    decontamination grain.

    The benchmark frame only needs ``text_col`` — its ids never survive
    past the distinct key set, so a synthetic id feeds the kernel rather
    than imposing the corpus's ``id_col`` on eval-set schemas.

    The hit join matches on the first 8 BYTES of md5(shingle) — a
    probabilistic contract: two different shingles can share a prefix
    (~2^-64 per pair), which over-counts ``n_hits`` and, at worst, drops
    an uncontaminated document. ``verify=True`` closes that gap: docs
    flagged by the fast hash path (typically a tiny fraction of the
    corpus) are re-shingled as RAW STRINGS and re-checked against the
    benchmark's raw distinct shingle set — one extra broadcast join over
    the candidate set only, so the exactness costs nothing corpus-shaped.
    A doc whose every hit was a prefix collision then drops out of
    ``contaminated`` and stays in ``kept``. Default stays the fast path
    (the collision rate is negligible for any real corpus; the flag
    exists to make the parity claim airtight when it matters)."""
    ck = shingle_postings(corpus, text_col, id_col, n)
    bench = benchmark.select(
        F.monotonically_increasing_id().alias("__bench_id"),
        F.col(text_col))
    bk = F.broadcast(
        shingle_postings(bench, text_col, "__bench_id", n)
        .select("key").distinct())
    hits = (ck.join(bk, "key")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hits")))
    if verify:
        # exact re-verify of the candidate hits: semi-join the corpus down
        # to flagged docs, then match raw shingle strings against the raw
        # benchmark set. n_hits is recomputed exactly (the hash path's
        # count could include collision hits even for truly-contaminated
        # docs).
        cand = corpus.join(
            hits.select(F.col("doc_id").alias(id_col)), id_col, "left_semi")
        raw_b = F.broadcast(
            _shingle_strings(bench, text_col, "__bench_id", n)
            .select("s").distinct())
        hits = (_shingle_strings(cand, text_col, id_col, n)
                .join(raw_b, "s")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_hits")))
    contaminated = hits.select(F.col("doc_id").alias(id_col), "n_hits")
    kept = corpus.join(contaminated.select(id_col), id_col, "left_anti")
    return kept, contaminated


def dedupe_lines(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", max_df: int = 1,
                 min_chars: int = 10) -> DataFrame:
    """Corpus-level LINE dedup (beyond-ref; C4's "discard every duplicated
    three-sentence span" / RefinedWeb's duplicated-line removal, at line
    grain): drop each line that occurs in more than ``max_df`` documents —
    navigation chrome, cookie banners, boilerplate footers — and reassemble
    the remaining lines in their original order. Lines shorter than
    ``min_chars`` (after trim) are exempt: short strings ("Yes.", list
    bullets) collide legitimately and carry no boilerplate signal.

    Returns the input columns (any non-text columns pass through) with
    ``text_col`` replaced by the cleaned text; documents whose every line
    was boilerplate come back with empty text (the caller's quality filter
    drops them — this operator never removes documents, so row counts are
    stable for downstream joins).

    Plan: posexplode lines (map-side) → per-line-hash distinct-doc counts
    as a two-level AGGREGATE (dedupe (key, doc), then count per key — both
    map-side combined, so the shuffle carries partials) → equi-join the
    counts back → regroup per doc and concat_ws over collect_list sorted
    by the original position. A hot boilerplate line ("Accept cookies" in
    every doc) is safe at every step: the count is a partial-aggregated
    scalar, and the join back is a plain equi-join AQE can skew-split —
    never a pair expansion, never a per-row set. (A window
    count-distinct-doc would materialize that hot line's full doc SET per
    row — exactly the blowup this shape avoids.)"""
    lines = (df.select(id_col, F.posexplode(F.split(F.col(text_col), "\n"))
                       .alias("pos", "line"))
             .withColumn("__norm", F.lower(F.trim(F.col("line"))))
             .withColumn("__key", F.md5(F.col("__norm"))))
    counts = (lines.select("__key", id_col).distinct()
              .groupBy("__key").agg(F.count(F.lit(1)).alias("__df")))
    kept = (lines.join(counts, "__key")
            .filter((F.length("__norm") < min_chars)
                    | (F.col("__df") <= max_df)))
    rebuilt = (kept.groupBy(id_col)
               .agg(F.concat_ws("\n", F.array_sort(F.collect_list(
                   F.struct("pos", "line"))).getField("line"))
                    .alias(text_col)))
    # left join back so fully-boilerplate docs survive with empty text.
    # NON-text columns ride this join unchanged (r7): the operator already
    # pays a join back to the input frame, so callers that need lang/
    # source/etc alongside the cleaned text get them for free instead of
    # paying a second (id -> other-columns) join plus a re-scan of their
    # upstream lineage — at corpus scale that second join was a full extra
    # shuffle of the survivor set (curate_corpus's line_dedup boundary).
    return (df.drop(text_col)
            .join(rebuilt, id_col, "left")
            .withColumn(text_col, F.coalesce(F.col(text_col), F.lit(""))))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

#: Hex chars whose LOW bit is set — the bit-source for simhash bits 32-63.
_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


def _simhash_votes(df: DataFrame, text_col: str, id_col: str,
                   bits: int) -> DataFrame:
    """Per-doc majority-vote counters shared by both simhash encodings:
    one row per doc with ``n`` (distinct-token count) and ``v0..v{bits-1}``.
    Bit i < 32 votes on md5-nibble-i's HIGH bit (hex char >= '8'); bit
    i >= 32 votes on md5-nibble-(i-32)'s LOW bit (odd hex char) — two
    independent bits per nibble, so 64 signature bits from one md5 with
    both recipes expressible in plain SQL for the oracle.

    ``bits`` is capped at 64 — md5 hex has exactly 32 nibbles and this
    recipe draws two bits from each; positions past 64 would read
    substring('') and silently vote 0 for EVERY document: those constant
    bits would make the bands covering them collide corpus-wide
    (all-pairs expansion under max_df, or the whole band dropped above
    it) with no error. Refuse instead."""
    if not 1 <= bits <= 64:
        raise ValueError(
            f"simhash bits must be in [1, 64] (md5 has 32 nibbles x 2 "
            f"usable bits); got {bits}")
    toks = df.select(F.col(id_col).alias("doc_id"),
                     F.explode(F.array_distinct(tx.tokens(text_col))).alias("tok"))
    hashed = toks.select("doc_id", F.md5("tok").alias("h"))
    votes = []
    for i in range(bits):
        if i < 32:
            bit = F.substring("h", i + 1, 1) >= "8"
        else:
            bit = F.substring("h", i - 32 + 1, 1).isin(*_ODD_HEX)
        votes.append(F.sum(F.when(bit, 1).otherwise(0)).alias(f"v{i}"))
    return hashed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"), *votes)


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """SimHash: bit i = majority vote of md5-nibble-i's high bit across the
    doc's distinct tokens. Emitted as a bit-string column ``simhash`` —
    the human-readable / oracle-certified encoding (q25)."""
    agg = _simhash_votes(df, text_col, id_col, bits)
    bit_cols = [F.when(F.col(f"v{i}") * 2 >= F.col("n"), F.lit("1")).otherwise(F.lit("0"))
                for i in range(bits)]
    return agg.select("doc_id", F.concat(*bit_cols).alias("simhash"))


def simhash_longs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """Same signature as :func:`simhash_signatures`, packed into one LONG
    column ``sim64`` (bit-string position i == long bit ``bits-1-i``, so the
    bit-string is the long's binary rendering). The packed encoding is the
    compute/search representation: 8 bytes through every shuffle instead of
    a 32-char string, and Hamming distance collapses to the single JVM
    intrinsic ``bit_count(a ^ b)``."""
    agg = _simhash_votes(df, text_col, id_col, bits)
    packed = None
    for i in range(bits):
        # two's complement: bit 63 of a signed long is -2^63, not +2^63
        # (which overflows); each bit is added exactly once so the sum is
        # the packed value for any bits <= 64
        b = bits - 1 - i
        weight = -(1 << 63) if b == 63 else (1 << b)
        term = F.when(F.col(f"v{i}") * 2 >= F.col("n"),
                      F.lit(weight).cast("long")).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed + term
    return agg.select("doc_id", packed.alias("sim64"))


def simhash_band_keys(sim_col: Column | str, bits: int,
                      band_bits: int) -> Column:
    """The banded search's key recipe as one expression: an array of
    ``bits // band_bits`` integer band keys ``(band_index << band_bits) |
    band_byte`` extracted from the packed LONG signature with UNSIGNED
    shifts (at bits=64 the sign bit is signature bit 0; an arithmetic
    shift would smear it across every band). Shared by simhash_near_pairs
    and the saturation measurement in tools/stress_dedup.py so the stress
    verdict can never drift from the shipped banding."""
    c = F.col(sim_col) if isinstance(sim_col, str) else sim_col
    mask = (1 << band_bits) - 1
    return F.array(*[
        (F.shiftrightunsigned(c, bits - (i + 1) * band_bits)
         .bitwiseAND(F.lit(mask)) + F.lit(i << band_bits))
        for i in range(bits // band_bits)])


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = 32,
                       band_bits: int = 8, max_hamming: int = 3,
                       max_df: Optional[int] = DEFAULT_MAX_DF) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Banded search (Manku et al. 2007, "Detecting Near-Duplicates for Web
    Crawling"): split the signature into bits/band_bits bands; any pair
    within Hamming d < #bands must agree exactly on ≥1 band → equi-join per
    band, then exact Hamming verify. Partitioned by band value — no n².

    SIZING FOR SCALE: each band index has only 2^band_bits possible
    values, so once the corpus approaches ``2^band_bits * max_df``
    documents the band buckets SATURATE — every posting list nears the
    stop-band cap and recall collapses (the cap drops saturated bands
    whole). The defaults (bits=32, band_bits=8: 256 buckets/band) are
    sized for ~10^5 docs per run; at corpus scale use ``bits=64,
    band_bits=16`` (4 bands still pigeonhole Hamming <= 3, 65536
    buckets/band carries ~10^7-10^8 docs; demonstrated side by side in
    tools/stress_dedup.py). Past that, partition the corpus (by shard
    key) and search within shards, or raise max_hamming-appropriate
    band counts on a wider hash.

    ORDER IN A PIPELINE: run EXACT dedup first (curate_corpus does). A
    dup cluster larger than ``max_df`` shares one signature, hence one
    posting list per band, and the stop-band cap rightly drops it — the
    cap bounds work, exact dedup is the operator that collapses such
    clusters.

    Plan notes (r6 rewrite, was 6.6s → integer path): signatures travel as
    one LONG (``simhash_longs``); band keys are exact small integers
    ``(band_index << band_bits) | band_byte`` extracted with shift/mask —
    no per-band strings, and the DEFAULT_MAX_DF stop-band cap therefore
    keys on the TRUE band value (no hash-collision caveat: a cap decision
    can never merge two distinct band groups). The signature rides the
    posting payload as 8 bytes (re-joining it after the pair dedupe would
    re-evaluate the expensive vote aggregate — Catalyst does not share
    common subtrees); the pair-dedupe shuffle therefore carries two ids +
    16 bytes, and the exact verify is ``bit_count(a ^ b)`` — one JVM
    intrinsic per surviving pair."""
    if bits % band_bits != 0:
        raise ValueError(f"band_bits {band_bits} must divide bits {bits}")
    sigs = simhash_longs(df, text_col, id_col, bits)
    bands = sigs.select(
        "doc_id", "sim64",
        F.explode(simhash_band_keys("sim64", bits, band_bits)).alias("band"),
    )
    pairs = (
        pairs_from_postings(bands, key="band", payload_cols=["sim64"],
                            max_df=max_df)
        .select("doc_a", "doc_b", F.col("a_sim64").alias("sig_a"),
                F.col("b_sim64").alias("sig_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (pairs.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


# ---------------------------------------------------------------------------
# Winnowed rolling-hash fingerprints (MOSS scheme)
# ---------------------------------------------------------------------------

_NON_ALNUM_RE = re.compile(r"[^a-z0-9]+", re.ASCII)


def winnow_py(text: str, k: int = 5, window: int = 4, base: int = 257,
              mod: int = 1_000_000_007) -> list[int]:
    """Pure-Python winnowing reference (used by tests; semantics source of
    truth shared with the vectorized kernel and the column-expression
    formulation in functions/text.py — all three agree bit-for-bit)."""
    s = _NON_ALNUM_RE.sub(" ", (text or "").lower()).strip()
    if len(s) < k:
        return []
    hs = []
    for i in range(len(s) - k + 1):
        h = 0
        for ch in s[i:i + k]:
            h = (h * base + ord(ch)) % mod
        hs.append(h)
    if len(hs) < window:
        return []
    mins = {min(hs[p:p + window]) for p in range(len(hs) - window + 1)}
    return sorted(mins)


def winnowed_fingerprint_frame(df: DataFrame, id_col: str = "doc_id",
                               text_col: str = "text", k: int = 5,
                               window: int = 4, base: int = 257,
                               mod: int = 1_000_000_007) -> DataFrame:
    """(id, sorted distinct winnowed fingerprints) per document.

    Same Arrow-kernel rationale as the shingle/minhash kernels above: the
    rolling hash over every character position is the interpreted-HOF worst
    case (nested transform x aggregate measured ~200s for 500 short docs —
    the lambda tree re-evaluates per element), while the numpy form is a
    sliding-window dot product + windowed min: vectorized, map-side only,
    no shuffle added. Fingerprints are content-derived integers — identical
    to the SQL-lambda oracle and winnow_py.
    """
    import numpy as np
    import pandas as pd

    weights = np.array([pow(base, k - 1 - j, mod) for j in range(k)],
                       dtype=np.int64)

    def fps(text) -> list[int]:
        s = _NON_ALNUM_RE.sub(" ", (text or "").lower()).strip()
        if len(s) < k:
            return []
        codes = np.frombuffer(s.encode("ascii"), dtype=np.uint8).astype(np.int64)
        grams = np.lib.stride_tricks.sliding_window_view(codes, k)
        # max dot ≈ 122 * k * base^(k-1) ≈ 5e12 « 2^63 — single mod is exact
        hs = (grams @ weights) % mod
        if hs.size < window:
            return []
        mins = np.lib.stride_tricks.sliding_window_view(hs, window).min(axis=1)
        return np.unique(mins).tolist()

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "fingerprints": [fps(t) for t in pdf[text_col]],
            })

    # same id-type derivation as shingle_postings/minhash_signatures — a
    # hardcoded 'long' would crash Arrow conversion for string/int32 ids
    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, fingerprints array<long>")
