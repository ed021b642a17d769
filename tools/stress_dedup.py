"""Dedup-family skew stress: proves the candidate-generation plans stay
bounded on a corpus ~50x sf0.1 with a pathological hot boilerplate cluster.

What it checks (the 100 TB failure modes):

1. **Hot-key cap works at scale** — a 12k-document boilerplate cluster
   would expand to ~72M candidate pairs from its shared shingles in single
   tasks; the default stop-key cap (``DEFAULT_MAX_DF``) must drop those
   posting lists so the candidate count tracks TRUE near-dup density.
2. **No single-partition blowup** — the pair-expansion output must spread
   across partitions (max/median partition rows bounded), i.e. skew does
   not funnel the stage through one task.
3. **Uncapped contrast** — on a small hot-only corpus, the same plan with
   the cap disabled demonstrates the quadratic blowup the cap prevents
   (pair count and wall time recorded side by side).

Writes a one-page result table to STRESS.md (``--out``) and exits non-zero
if any bound is violated. Standalone; not part of the per-round bench.

Usage::

    python tools/stress_dedup.py [--scale 50] [--hot 12000] [--out STRESS.md]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from eirepolitic_data_pipeline_spark.operators.dedupe import (  # noqa: E402
    DEFAULT_MAX_DF,
    dedupe_lines,
    minhash_signatures,
    pairs_from_postings,
    shingle_postings,
    simhash_band_keys,
    simhash_longs,
    simhash_near_pairs,
    winnowed_fingerprint_frame,
)
from eirepolitic_data_pipeline_spark.session import get_spark  # noqa: E402

BOILERPLATE = ("subscribe to our newsletter for the latest updates terms of "
               "service apply all rights reserved click here to read more "
               "about cookie policy and privacy settings contact support for "
               "help with your account preferences")


def build_corpus(spark, sf_dir: str, scale: int, n_hot: int, path: str):
    """~scale x sf0.1 documents + a hot boilerplate cluster, written to
    parquet so every run scans realistic input splits.

    - bulk replicas get a replica-unique token spliced between words, so
      their shingles are globally unique (df=1) — corpus bulk, no pairs;
    - 4 replicas per base doc keep the original text + suffix noise —
      TRUE near-dup clusters (df≈4), the density the plans must track;
    - n_hot docs share BOILERPLATE + a unique tail — the hot cluster whose
      shared-shingle df (= n_hot) must be stop-keyed, never pair-expanded.
    """
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .select("doc_id", "text")
    n_base = docs.count()
    reps = docs.crossJoin(
        spark.range(scale).select(F.col("id").alias("rep")))
    uniq_tok = F.concat(F.lit(" u"), (F.col("doc_id") * 1000 + F.col("rep")))
    bulk = reps.filter(F.col("rep") >= 4).select(
        (F.col("doc_id") * 1000 + F.col("rep")).alias("doc_id"),
        F.regexp_replace("text", r"\s+", F.concat(uniq_tok, F.lit(" ")))
        .alias("text"))
    near = reps.filter(F.col("rep") < 4).select(
        (F.col("doc_id") * 1000 + F.col("rep")).alias("doc_id"),
        F.concat("text", F.lit(" tail"), F.col("rep")).alias("text"))
    hot = spark.range(n_hot).select(
        (F.lit(10 ** 9) + F.col("id")).alias("doc_id"),
        F.concat(F.lit(BOILERPLATE), F.lit(" item "),
                 F.col("id"), F.lit(" ref "), F.col("id") * 7).alias("text"))
    corpus = bulk.unionByName(near).unionByName(hot) \
        .repartition(spark.sparkContext.defaultParallelism)
    corpus.write.mode("overwrite").parquet(path)
    out = spark.read.parquet(path)
    return out, n_base, out.count()


def partition_profile(df):
    """Rows per partition of ``df``'s output — the skew evidence."""
    rows = (df.withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid").count().collect())
    counts = sorted((r["count"] for r in rows), reverse=True)
    med = statistics.median(counts) if counts else 0
    mx = counts[0] if counts else 0
    # an empty (or all-empty-partition) output has no skew by definition
    ratio = round(mx / med, 2) if med else (1.0 if mx == 0 else float("inf"))
    return {"partitions": len(counts), "max_rows": mx,
            "median_rows": med, "skew_ratio": ratio}


def run_method(name, pairs_df, results, skew_limit):
    t0 = time.perf_counter()
    n_pairs = pairs_df.count()
    wall = round(time.perf_counter() - t0, 1)
    prof = partition_profile(pairs_df)
    ok = prof["skew_ratio"] <= skew_limit
    results.append({"method": name, "wall_s": wall, "pairs": n_pairs,
                    **prof, "ok": ok})
    print(f"{name}: {wall}s, {n_pairs} pairs, "
          f"max/median partition rows {prof['max_rows']}/{prof['median_rows']} "
          f"(ratio {prof['skew_ratio']}) {'OK' if ok else 'SKEW VIOLATION'}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--scale", type=int, default=50)
    ap.add_argument("--hot", type=int, default=12000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRESS.md"))
    ap.add_argument("--skew-limit", type=float, default=10.0,
                    help="max allowed max/median partition-row ratio")
    ap.add_argument("--skip-uncapped", action="store_true")
    args = ap.parse_args()

    spark = get_spark("stress_dedup")
    cores = spark.sparkContext.defaultParallelism
    tmp = tempfile.mkdtemp(prefix="stress_dedup_")
    corpus, n_base, n_docs = build_corpus(
        spark, args.sf_dir, args.scale, args.hot, os.path.join(tmp, "corpus"))
    print(f"corpus: {n_docs} docs ({n_base} base x {args.scale}, "
          f"{args.hot} hot-cluster), {cores} cores")

    results, all_ok = [], True

    # 1. Jaccard candidates (inverted shingle index, default cap)
    sh = shingle_postings(corpus, "text", "doc_id", 3)
    jac = pairs_from_postings(sh, key="key", payload_cols=["n_sh"]) \
        .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("shared"))
    all_ok &= run_method("jaccard-candidates", jac, results, args.skew_limit)

    # 2. MinHash LSH candidates (8 hashes x 2-row bands, as workload q24)
    sigs = minhash_signatures(corpus, "text", "doc_id", n=3, num_hashes=8)
    band_exprs = [F.concat_ws("|", F.lit(f"{b}:"),
                              F.col(f"mh{b * 2}"), F.col(f"mh{b * 2 + 1}"))
                  for b in range(4)]
    bands = (sigs.select("doc_id",
                         F.explode(F.array(*band_exprs)).alias("band_str"))
             .select("doc_id", F.xxhash64("band_str").alias("band_key")))
    mh = pairs_from_postings(bands, key="band_key") \
        .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("collisions"))
    all_ok &= run_method("minhash-lsh", mh, results, args.skew_limit)

    # 3. Winnowed-fingerprint pairs (MOSS path, cap=100 as workload q50)
    fps = winnowed_fingerprint_frame(corpus) \
        .select("doc_id", F.explode("fingerprints").alias("key"))
    wn = pairs_from_postings(fps, key="key", max_df=100) \
        .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("shared_fp"))
    all_ok &= run_method("winnow-pairs", wn, results, args.skew_limit)

    # 4. Corpus-level line dedup with a maximally hot line: EVERY document
    # gets the same banner line prepended (line df = n_docs). The two-level
    # count + equi-join plan must stay bounded — a window collect_set here
    # would materialize an n_docs-sized set per row.
    banner = "please accept all cookies to continue reading this page today"
    lined = corpus.select(
        "doc_id", F.concat(F.lit(banner + "\n"), "text").alias("text"))
    cleaned = dedupe_lines(lined)
    # the timed frame must REFERENCE the rebuilt text: a bare count() lets
    # Catalyst eliminate the (unique-keyed) rebuild join and measure only
    # the id scan
    materialized = cleaned.filter(F.length("text") >= 0)
    all_ok &= run_method(f"line-dedup (banner df={n_docs})", materialized,
                         results, args.skew_limit)
    leftover = cleaned.filter(F.col("text").contains(banner)).count()
    conserved = cleaned.count() == n_docs
    line_ok = leftover == 0 and conserved
    all_ok &= line_ok
    print(f"line-dedup: banner rows left {leftover}, rows conserved "
          f"{conserved} {'OK' if line_ok else 'FAIL'}")

    # 5. SimHash band saturation (the q66 family's scale bound): a band
    # index has only 2^band_bits possible values, so once the corpus
    # approaches 2^band_bits * max_df DISTINCT docs the posting lists all
    # near the cap — saturated bands are dropped whole and recall
    # collapses. Measured on a DISTINCT-doc corpus of the same size (30
    # unique md5 tokens per doc): the replica corpus above would conflate
    # this band-capacity bound with its intentional 50-copy mega dup
    # clusters, which share ONE signature and are exact-dedup's job to
    # collapse BEFORE any near-dup banding runs (curate_corpus's stage
    # order; see simhash_near_pairs docstring). Expectation: the default
    # (bits=32, band_bits=8: 256 buckets/band, mean df ~n/256 ≈ 1024 >
    # cap) saturates; the corpus-scale config (bits=64, band_bits=16:
    # 65536 buckets/band, mean df ~4) does not. Share of postings in
    # over-cap lists — a cheap groupBy, no pair expansion.
    base_distinct = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{j}")))
            for j in range(30)]).alias("text"))
    # plant 1000 signature-identical twins so the end-to-end search below
    # has a known answer (random 64-bit sims land within Hamming 3 of each
    # other with probability ~2e-15 — zero cross pairs expected)
    n_twins = 1000
    twins = base_distinct.filter(F.col("doc_id") < n_twins).select(
        (F.col("doc_id") + n_docs).alias("doc_id"), "text")
    distinct_docs = base_distinct.unionByName(twins)
    distinct_docs.write.mode("overwrite").parquet(
        os.path.join(tmp, "distinct"))
    distinct_docs = spark.read.parquet(os.path.join(tmp, "distinct"))

    def band_drop_share(bits, band_bits):
        sig = simhash_longs(distinct_docs, "text", "doc_id", bits=bits)
        bands = sig.select(
            F.explode(simhash_band_keys("sim64", bits, band_bits))
            .alias("band"))
        sizes = bands.groupBy("band").count()
        row = sizes.select(
            F.sum(F.when(F.col("count") > DEFAULT_MAX_DF,
                         F.col("count")).otherwise(0)).alias("dropped"),
            F.sum("count").alias("total")).collect()[0]
        return row["dropped"] / row["total"]

    t0 = time.perf_counter()
    share32 = band_drop_share(32, 8)
    share64 = band_drop_share(64, 16)
    sat_wall = round(time.perf_counter() - t0, 1)
    sat_ok = share32 > 0.5 and share64 < 0.05
    all_ok &= sat_ok
    sat_n = n_docs + n_twins
    print(f"simhash saturation ({sat_n} docs = {n_docs} distinct + "
          f"{n_twins} twins): 32/8 drops "
          f"{share32:.1%} of postings, 64/16 drops {share64:.1%} "
          f"({sat_wall}s) {'OK' if sat_ok else 'FAIL'}")

    # ...and the 64/16 configuration's full banded search stays bounded
    # end-to-end on the distinct corpus, finding exactly the planted twins.
    sim64 = simhash_near_pairs(distinct_docs, "text", "doc_id", bits=64,
                               band_bits=16, max_hamming=3)
    all_ok &= run_method("simhash-banded-64/16", sim64, results,
                         args.skew_limit)
    sim64_pairs = results[-1]["pairs"]
    twin_ok = sim64_pairs == n_twins
    all_ok &= twin_ok
    print(f"simhash 64/16 recall: {sim64_pairs} pairs vs {n_twins} planted "
          f"twins {'OK' if twin_ok else 'FAIL'}")

    # Hot-cluster containment: the boilerplate shingles have df = n_hot >>
    # cap, so hot x hot pairs must come only from the unique tails (none) —
    # a capped run can never emit the ~n_hot^2/2 boilerplate pairs.
    hot_pairs = jac.filter((F.col("doc_a") >= 10 ** 9)
                           & (F.col("doc_b") >= 10 ** 9)).count()
    hot_blowup = args.hot * (args.hot - 1) // 2
    cap_ok = hot_pairs < hot_blowup // 1000
    all_ok &= cap_ok
    print(f"hot-cluster pairs under cap: {hot_pairs} "
          f"(uncapped would be ~{hot_blowup}) {'OK' if cap_ok else 'FAIL'}")

    # 4. Uncapped contrast on a small hot-only corpus: the blowup the cap
    # prevents, kept small enough to finish.
    contrast = None
    if not args.skip_uncapped:
        small_hot = spark.range(1500).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("terms of service apply all rights reserved "
                           "click here for more item "),
                     F.col("id")).alias("text"))
        small_hot.write.mode("overwrite").parquet(os.path.join(tmp, "hot"))
        small_hot = spark.read.parquet(os.path.join(tmp, "hot"))
        sh_small = shingle_postings(small_hot, "text", "doc_id", 3)
        t0 = time.perf_counter()
        n_capped = pairs_from_postings(sh_small, key="key").count()
        t_capped = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        n_uncapped = pairs_from_postings(sh_small, key="key",
                                         max_df=None).count()
        t_uncapped = round(time.perf_counter() - t0, 1)
        contrast = (n_capped, t_capped, n_uncapped, t_uncapped)
        print(f"uncapped contrast (1500 hot docs): capped {n_capped} pairs "
              f"in {t_capped}s vs uncapped {n_uncapped} pairs in {t_uncapped}s")

    # rewrite only this script's section; stress_marts.py appends its own
    # section to the same file and a rerun here must not wipe it
    tail = ""
    if os.path.exists(args.out):
        prior = open(args.out).read()
        idx = prior.find("\n## ")
        if idx >= 0:
            tail = prior[idx:]
    with open(args.out, "w") as f:
        f.write(
            "# Dedup skew stress (tools/stress_dedup.py)\n\n"
            f"Corpus: **{n_docs} documents** ({n_base} base docs x "
            f"{args.scale} replicas + {args.hot}-doc hot boilerplate "
            f"cluster), local[{cores}], "
            f"shuffle partitions {spark.conf.get('spark.sql.shuffle.partitions')}. "
            f"Skew bound: max/median partition rows <= {args.skew_limit}.\n\n"
            "| method | wall (s) | output rows (pairs) | partitions | "
            "max part rows | median part rows | skew ratio | bound |\n"
            "|---|---|---|---|---|---|---|---|\n")
        for r in results:
            f.write(f"| {r['method']} | {r['wall_s']} | {r['pairs']} | "
                    f"{r['partitions']} | {r['max_rows']} | "
                    f"{r['median_rows']} | {r['skew_ratio']} | "
                    f"{'ok' if r['ok'] else 'VIOLATED'} |\n")
        f.write(
            f"\nLine-dedup hot-line bound: a banner line present in ALL "
            f"{n_docs} documents (the worst possible line skew) is removed "
            f"with rows conserved ({'PASS' if line_ok else 'FAIL'}) — the "
            "distinct-doc count is a two-level map-side-combined aggregate "
            "joined back per line, never a per-row set.\n")
        f.write(
            f"\nHot-cluster containment: {hot_pairs} hot-x-hot candidate "
            f"pairs under the default cap (DEFAULT_MAX_DF="
            f"{DEFAULT_MAX_DF}); the uncapped expansion of the "
            f"{args.hot}-doc boilerplate cluster would be ~{hot_blowup} "
            "pairs concentrated in a handful of hot-key tasks.\n")
        if contrast:
            f.write(
                f"\nUncapped contrast (1500-doc hot-only corpus): capped = "
                f"{contrast[0]} pairs in {contrast[1]}s; uncapped = "
                f"{contrast[2]} pairs in {contrast[3]}s — the quadratic "
                "blowup the stop-key cap removes, at 1/8 the stressed "
                "cluster size (cost scales with the square).\n")
        f.write(
            f"\nSimHash band saturation at {sat_n} docs ({n_docs} distinct "
            f"+ {n_twins} planted twins): the "
            f"default 32-bit/8-bit-band config (256 buckets/band) drops "
            f"{share32:.1%} of band postings at the cap — saturated, as "
            f"the sizing rule (2^band_bits x max_df ~ "
            f"{256 * DEFAULT_MAX_DF} docs) predicts — while the "
            f"corpus-scale 64-bit/16-bit config (65536 buckets/band) "
            f"drops {share64:.1%} and its full banded search runs "
            f"end-to-end above, returning exactly the {n_twins} planted "
            f"signature-identical twin pairs "
            f"({'PASS' if sat_ok and twin_ok else 'FAIL'}). "
            "Measured on distinct docs by design: the replica corpus's "
            "50-copy dup clusters share one signature and belong to "
            "exact dedup, which curate_corpus runs BEFORE near-dup "
            "banding. Operators pick band width per corpus size "
            "(operators/dedupe.py:simhash_near_pairs docstring).\n")
        f.write(f"\nResult: **{'PASS' if all_ok else 'FAIL'}**. "
                "Rerun: `python tools/stress_dedup.py`.\n")
        f.write(tail)
    print(f"wrote {args.out}: {'PASS' if all_ok else 'FAIL'}")
    spark.stop()
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
