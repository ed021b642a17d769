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

Both are pure DataFrame plans (no UDFs, nothing collected to the driver):
explode → map-side-combined aggregations keyed by the n-gram, a bounded
postings array per shingle (≤ #sources), and two-phase salted top-k so one
giant group never pins a single reducer. The widest shuffle key is the
n-gram itself; at 100 TB the only wide state is the distinct-ngram count
table, exactly like the bigram tables in operators.relevance.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx
from .skew import salted_top_n


def ngram_heavy_hitters(df: DataFrame, n: int = 2, k: int = 10,
                        group_cols: Sequence[str] = ("source",),
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Top-k word n-grams per group by occurrence count.

    Output: ``(*group_cols, ngram, occurrences, doc_freq, rank)`` — rank
    1..k per group ordered by (occurrences desc, ngram asc); ``doc_freq``
    is the number of distinct documents containing the n-gram (the column
    a stop-shingle threshold reads). Shingles follow the repo-wide
    contract (functions.text.word_shingles): a document with fewer than
    ``n`` tokens contributes its whole text as ONE shingle; blank/NULL
    documents produce the empty shingle, which is dropped here — a blank
    doc says nothing about corpus content.

    Plan: one explode, one (group, ngram) aggregation — count is map-side
    combined and doc_freq is a distinct-aggregate on the same key — then
    skew-safe two-phase top-k (operators.skew.salted_top_n), so a group
    holding most of the corpus ranks inside bounded buckets before the
    ≤ buckets·k survivors meet one reducer. No driver materialization.
    """
    groups = [F.col(c) for c in group_cols]
    sh = (df.select(*groups, F.col(id_col).alias("__doc"),
                    F.explode(tx.word_shingles(text_col, n)).alias("ngram"))
          .filter(F.col("ngram") != ""))
    agg = (sh.groupBy(*group_cols, "ngram")
           .agg(F.count(F.lit(1)).alias("occurrences"),
                F.countDistinct("__doc").alias("doc_freq")))
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

    Plan: distinct (source, shingle) projection, then a postings array
    per shingle — bounded by the number of SOURCES, not documents, so
    unlike document-pair expansion this needs no df cap — exploded into
    source pairs and count-aggregated; per-source totals are a tiny
    frame broadcast back. Two shuffles total (shingle key, pair key),
    both map-side combined. The same report at 100 TB shuffles each
    distinct shingle exactly once.
    """
    sh = (df.select(F.col(source_col).alias("__src"),
                    F.explode(tx.word_shingles(text_col, n)).alias("ngram"))
          .filter(F.col("ngram") != "")
          .filter(F.col("__src").isNotNull())
          .distinct())
    totals = sh.groupBy("__src").agg(F.count(F.lit(1)).alias("n_ngrams"))
    postings = (sh.groupBy("ngram")
                .agg(F.array_sort(F.collect_set("__src")).alias("srcs"))
                .filter(F.size("srcs") >= 2))
    combos = F.flatten(F.transform(
        F.col("srcs"),
        lambda x, i: F.transform(
            F.slice(F.col("srcs"), i + 2,
                    F.greatest(F.size("srcs") - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("src_a"), y.alias("src_b")))))
    pairs = (postings.select(F.explode(combos).alias("p"))
             .select("p.src_a", "p.src_b")
             .groupBy("src_a", "src_b")
             .agg(F.count(F.lit(1)).alias("shared_ngrams")))
    ta = F.broadcast(totals.select(F.col("__src").alias("src_a"),
                                   F.col("n_ngrams").alias("n_a")))
    tb = F.broadcast(totals.select(F.col("__src").alias("src_b"),
                                   F.col("n_ngrams").alias("n_b")))
    shared = F.col("shared_ngrams").cast("double")
    return (pairs.join(ta, "src_a").join(tb, "src_b")
            .select("src_a", "src_b", "shared_ngrams", "n_a", "n_b",
                    F.round(shared / (F.col("n_a") + F.col("n_b")
                                      - F.col("shared_ngrams")), 6)
                    .alias("jaccard"),
                    F.round(shared / F.least("n_a", "n_b"), 6)
                    .alias("containment")))
