"""Corpus profiling operators (beyond-ref): the corpus-level statistics a
training-data pipeline publishes before choosing its curation recipe.

- ``ngram_heavy_hitters`` — top-k word n-grams per group: the "what is this
  corpus made of" report, and the empirical stop-shingle candidates that
  the dedupe operators' posting-list caps (dedupe.DEFAULT_MAX_DF) end up
  dropping.
- ``source_overlap`` — pairwise distinct-shingle overlap between sources:
  who syndicates whom, which feed is a near-copy of which — the report
  that decides source weights before temperature mixing
  (operators.curation.mix_sources).

Shingle GENERATION runs in the repo's Arrow kernel tier (mapInPandas,
module note in operators.dedupe): the Catalyst higher-order form
(transform × slice × array_join per position) is interpreted per element
and measured ~6x slower than the whole downstream aggregation at 250k
docs. The kernels mirror ``functions.text.word_shingles`` byte-for-byte
(``dedupe._shingle_set``'s tokenization contract), so the Catalyst column
form remains the tested semantic twin and the DuckDB oracles reproduce
results exactly.

Everything after generation is declarative: map-side-combined aggregations
keyed by the n-gram, postings arrays bounded by #sources, and two-phase
salted top-k so one giant group never pins a single reducer. Nothing
collects to the driver; the widest shuffle key is the n-gram itself.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedupe import _md5_int64, _shingle_set, _WS_RE, shingle_postings
from .skew import salted_top_n


def _shingle_counts(text, n: int) -> Counter:
    """Per-document n-gram occurrence counts; same tokenization and
    whole-text-shingle contract as ``dedupe._shingle_set`` /
    ``functions.text.word_shingles`` (lowercase, \\s+ split with empty
    tokens dropped, <n tokens → ONE whole-text shingle)."""
    t = ("" if text is None or (isinstance(text, float) and text != text)
         else str(text)).lower()
    toks = [w for w in _WS_RE.split(t) if w]
    if len(toks) < n:
        return Counter({" ".join(toks): 1})
    return Counter(" ".join(toks[i:i + n])
                   for i in range(len(toks) - n + 1))


def ngram_counts(df: DataFrame, n: int = 2,
                 group_cols: Sequence[str] = ("source",),
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-group n-gram statistics: ``(*group_cols, ngram, occurrences,
    doc_freq)``. ``doc_freq`` counts DISTINCT ``id_col`` values — a feed
    re-ingesting the same document id twice still counts it once (its
    occurrences, like the oracle's position count, do sum). Shingles
    follow the repo-wide contract (functions.text.word_shingles): a
    document with fewer than ``n`` tokens contributes its whole text as
    ONE shingle; blank/NULL documents produce the empty shingle, which is
    dropped here — a blank doc says nothing about corpus content.

    Plan: the Arrow kernel emits PER-DOCUMENT pre-aggregated (group, id,
    ngram, occ) rows — map-side, no shuffle — then ONE (group, ngram)
    aggregation (sum map-side combined; the distinct-id count is the same
    single shuffle, Spark's partial-distinct expansion).
    """
    groups = list(group_cols)
    fields = [df.schema[c] for c in groups + [id_col]]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in fields) + ", ngram string, occ long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in groups + [id_col]}
            out["ngram"], out["occ"] = [], []
            # plain lists, not Series: a scalar .iloc per emitted shingle
            # row costs more than the shingle counting itself
            cols = [pdf[c].tolist() for c in groups + [id_col]]
            for i, text in enumerate(pdf[text_col].tolist()):
                for ng, c in _shingle_counts(text, n).items():
                    if not ng:
                        continue  # blank doc → empty shingle → dropped
                    for g, col in zip(groups + [id_col], cols):
                        out[g].append(col[i])
                    out["ngram"].append(ng)
                    out["occ"].append(c)
            yield pd.DataFrame(out)

    per_doc = df.select(*groups, id_col, text_col).mapInPandas(
        kernel, schema=schema)
    return (per_doc.groupBy(*groups, "ngram")
            .agg(F.sum("occ").alias("occurrences"),
                 F.countDistinct(id_col).alias("doc_freq")))


def ngram_heavy_hitters(df: DataFrame, n: int = 2, k: int = 10,
                        group_cols: Sequence[str] = ("source",),
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Top-k word n-grams per group by occurrence count.

    Output: ``(*group_cols, ngram, occurrences, doc_freq, rank)`` — rank
    1..k per group ordered by (occurrences desc, ngram asc); ``doc_freq``
    is the number of DISTINCT ``id_col`` documents containing the n-gram
    (the column a stop-shingle threshold reads). Statistics come from
    ``ngram_counts`` (Arrow kernel + one aggregation); the ranking is the
    skew-safe two-phase top-k (operators.skew.salted_top_n), so a group
    holding most of the corpus ranks inside bounded buckets before the
    ≤ buckets·k survivors meet one reducer. No driver materialization.
    """
    agg = ngram_counts(df, n=n, group_cols=group_cols, text_col=text_col,
                       id_col=id_col)
    return salted_top_n(
        agg, list(group_cols),
        [F.col("occurrences").desc(), F.col("ngram").asc()], k)


def source_overlap(df: DataFrame, n: int = 3,
                   source_col: str = "source",
                   text_col: str = "text") -> DataFrame:
    """Pairwise distinct n-gram overlap between sources.

    Output: one row per unordered source pair (``src_a < src_b``) that
    shares at least one shingle — ``(src_a, src_b, shared_ngrams, n_a,
    n_b, jaccard, containment)`` where ``n_a``/``n_b`` are each source's
    distinct-shingle counts, ``jaccard = |∩| / |∪|`` and ``containment =
    |∩| / min(n_a, n_b)`` (1.0 ⇒ the smaller source's shingle set is a
    subset of the larger's — a syndication feed). NULL sources are
    excluded: an unattributed document cannot attribute overlap.

    Shingles are keyed by their 8-byte md5 prefix (dedupe.shingle_postings
    — the repo's standard compact shuffle key): a prefix collision would
    merge two distinct shingles and nudge the counts, the same
    astronomically-unlikely caveat documented on the q23/q64 candidate
    paths; the oracle joins raw strings, so any collision would surface
    as a certification mismatch rather than pass silently.

    Plan: the Arrow posting kernel (map-side, no shuffle) emits distinct
    (source, key) rows per document; one distinct shuffle on the 8-byte
    key, then a postings array per shingle — bounded by the number of
    SOURCES, not documents, so unlike document-pair expansion this needs
    no df cap — exploded into source pairs and count-aggregated. The
    per-source totals (a tiny frame) are broadcast-joined into the
    postings structs BEFORE pair expansion, so the pair rows already
    carry n_a/n_b: the corpus is shingled at most twice (totals branch +
    postings branch), never once per join alias.
    """
    src_docs = (df.filter(F.col(source_col).isNotNull())
                .select(F.col(source_col).alias("__src"), text_col))
    posts = shingle_postings(src_docs, text_col, "__src", n)
    blank_key = _md5_int64(next(iter(_shingle_set(None, n))))
    # lazy localCheckpoint: the distinct (source, key) frame feeds BOTH
    # the totals branch and the postings branch — unmaterialized, each
    # branch re-runs the Arrow shingle kernel AND the distinct shuffle
    # over the whole corpus (r8; the blocks cost one extra copy of what
    # the distinct's shuffle files already hold, and the first action
    # materializes them for both branches — one corpus shingle pass
    # instead of two, at any scale). Retention/fault-tolerance trade (r9,
    # ADVICE): the blocks live until the result frame is driver-GC'd, and
    # the truncated lineage means an executor loss fails the job instead
    # of recomputing — accepted because the overlap matrix is a bounded
    # diagnostic run, not a steady-state stage, and the alternative is a
    # guaranteed second corpus shingle pass per call.
    sh = (posts.select(F.col("doc_id").alias("__src"), "key")
          .filter(F.col("key") != F.lit(blank_key))
          .distinct()
          .localCheckpoint(eager=False))
    totals = sh.groupBy("__src").agg(F.count(F.lit(1)).alias("n_ngrams"))
    # carry each source's total INTO the postings structs (one broadcast
    # join on the distinct frame), so the pair rows already hold n_a/n_b —
    # review r6: joining two re-aliased `totals` frames onto the pairs
    # rebuilt the whole kernel+distinct lineage once PER ALIAS (three
    # corpus shingle passes; Spark's exchange-reuse rule did not unify
    # them). This shape shingles the corpus at most twice: once under
    # `totals`, once under the postings branch.
    sht = sh.join(F.broadcast(totals), "__src")
    postings = (sht.groupBy("key")
                .agg(F.array_sort(F.collect_set(
                    F.struct("__src", "n_ngrams"))).alias("srcs"))
                .filter(F.size("srcs") >= 2))
    # pair expansion as two chained codegen'd Generates instead of the
    # interpreted flatten×nested-transform array build (r12, guide §4 —
    # the same rewrite as dedupe.pairs_from_postings): identical rows,
    # no per-row interpreted pair array
    x, y = F.col("__x"), F.col("__y")
    e1 = postings.select(F.col("srcs"),
                         F.posexplode("srcs").alias("__i", "__x"))
    e2 = e1.select(x, F.explode(
        F.slice("srcs", F.col("__i") + 2, F.size("srcs"))).alias("__y"))
    pairs = (e2.select(x["__src"].alias("src_a"),
                       y["__src"].alias("src_b"),
                       x["n_ngrams"].alias("n_a"),
                       y["n_ngrams"].alias("n_b"))
             .groupBy("src_a", "src_b")
             .agg(F.count(F.lit(1)).alias("shared_ngrams"),
                  F.any_value("n_a").alias("n_a"),
                  F.any_value("n_b").alias("n_b")))
    shared = F.col("shared_ngrams").cast("double")
    return pairs.select(
        "src_a", "src_b", "shared_ngrams", "n_a", "n_b",
        F.round(shared / (F.col("n_a") + F.col("n_b")
                          - F.col("shared_ngrams")), 6).alias("jaccard"),
        F.round(shared / F.least("n_a", "n_b"), 6).alias("containment"))
