"""Profiling + vector-maintenance scale stress: proves the round-6 operator
family (n-gram heavy hitters, source overlap, int8 quantization, k-means)
keeps its documented scale shape on inputs ~50x sf0.1.

What it checks (the 100 TB failure modes):

1. **Heavy hitters under source skew** — one source holding ~95% of a
   262k-doc corpus must not funnel its ranking through one task: the
   salted two-phase top-k bounds the per-task working set, and the hot
   source's top-k must equal a directly-computed unsalted reference.
2. **Source overlap postings stay source-bounded** — posting arrays per
   shingle are capped by #sources by construction; a planted subset
   source must surface with containment 1.0.
3. **Quantization is a map-only pass** — throughput over 1M synthetic
   64-dim vectors, with the max reconstruction error verified ≤ scale/2
   corpus-wide by an aggregate (no collect).
4. **k-means fit cost is iteration-bounded** — fit+assign over 500k
   vectors, assignments exhaustive (every vector labeled), model
   deterministic across two runs (identical cluster histograms).

Rewrites only its own section of STRESS.md (``--out``); exits non-zero on
any violated bound. Standalone; not part of the per-round bench.

Usage::

    python tools/stress_profiling.py [--scale 50] [--out STRESS.md]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from eirepolitic_data_pipeline_spark.operators.profiling import (  # noqa: E402
    ngram_counts,
    ngram_heavy_hitters,
    source_overlap,
)
from eirepolitic_data_pipeline_spark.operators.vectors import (  # noqa: E402
    kmeans_assign,
    quantize_int8,
)
from eirepolitic_data_pipeline_spark.session import get_spark  # noqa: E402

SECTION = "## Profiling & vector maintenance stress (tools/stress_profiling.py)"


def build_docs(spark, sf_dir: str, scale: int, path: str):
    """~scale x sf0.1 documents with adversarial source layout: ~95% of
    replicas collapse onto ONE mega source (ranking skew), one planted
    source is an exact shingle-subset of another (containment 1.0), and
    the remaining sources stay distinct for matrix breadth."""
    base = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text", "source"))
    reps = spark.range(scale).select(F.col("id").alias("rep"))
    docs = (base.crossJoin(reps)
            .select((F.col("doc_id") * scale + F.col("rep")).alias("doc_id"),
                    # splice the replica id into the text so replicas are
                    # not exact duplicates (heavy hitters count real rows)
                    F.concat_ws(" ", "text", F.col("rep")).alias("text"),
                    # 19 of 20 replicas land in the mega source
                    F.when(F.col("rep") % 20 != 0, F.lit("mega"))
                    .otherwise(F.col("source")).alias("source")))
    # planted subset source: a handful of docs whose text is copied
    # verbatim from the mega source's base rows -> its distinct-shingle
    # set is a strict subset of mega's
    subset = (base.limit(40)
              .select((F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
                      F.concat_ws(" ", "text", F.lit("1")).alias("text"),
                      F.lit("subsetfeed").alias("source")))
    docs.unionByName(subset).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def build_vectors(spark, n: int, dim: int, path: str):
    """n synthetic 64-dim vectors: deterministic pseudo-random doubles from
    sin(id*dim+i) — cheap, reproducible, no RNG dependency."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    (spark.range(n)
     .select(F.col("id").alias("vec_id"),
             F.transform(idx, lambda i: F.sin(F.col("id") * dim + i))
             .alias("embedding"))
     .write.mode("overwrite").parquet(path))
    return spark.read.parquet(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=50)
    ap.add_argument("--vectors", type=int, default=1_000_000)
    ap.add_argument("--kmeans-vectors", type=int, default=500_000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRESS.md"))
    args = ap.parse_args()

    spark = get_spark("stress_profiling")
    cores = spark.sparkContext.defaultParallelism
    failures: list[str] = []
    lines: list[str] = []

    with tempfile.TemporaryDirectory() as tmp:
        docs = build_docs(spark, args.sf_dir, args.scale,
                          os.path.join(tmp, "docs"))
        n_docs = docs.count()
        n_mega = docs.filter(F.col("source") == "mega").count()

        # 1. heavy hitters under source skew -------------------------------
        t0 = time.perf_counter()
        hh = ngram_heavy_hitters(docs, n=2, k=10).collect()
        t_hh = round(time.perf_counter() - t0, 1)
        n_sources = docs.select("source").distinct().count()
        by_src: dict[str, list] = {}
        for r in hh:
            by_src.setdefault(r["source"], []).append(
                (r["rank"], r["ngram"], r["occurrences"]))
        ok_counts = all(len(v) == 10 for v in by_src.values()) \
            and len(by_src) == n_sources
        if not ok_counts:
            failures.append("heavy hitters: missing groups or short top-10")
        # reference: the SAME counts ranked by the one-phase window
        # operator (ranking.top_n_per_group) — the property under stress is
        # that the two-phase salted ranking is row-identical to the plain
        # window on a group holding ~95% of the corpus (the plain window
        # funnels that group through one task; acceptable for a test
        # oracle, the exact pathology the salted operator avoids)
        from eirepolitic_data_pipeline_spark.operators.ranking import (
            top_n_per_group)
        counts = ngram_counts(docs, n=2).filter(F.col("source") == "mega")
        ref = top_n_per_group(
            counts, ["source"],
            [F.col("occurrences").desc(), F.col("ngram").asc()],
            10).collect()
        ref_rows = [(r["rank"], r["ngram"], r["occurrences"]) for r in ref]
        # .get: if the salted ranking ever drops the hot group entirely,
        # report the failure instead of dying on a KeyError before the
        # table is written
        mega_ok = sorted(by_src.get("mega", [])) == sorted(ref_rows)
        if not mega_ok:
            failures.append("heavy hitters: salted top-10 of the hot "
                            "source diverges from the unsalted reference")
        lines.append(f"| heavy hitters (mega source {n_mega} docs) | {t_hh} "
                     f"| {len(hh)} rows ({n_sources} sources x 10) "
                     f"| salted top-k == unsalted reference: "
                     f"{'PASS' if mega_ok else 'FAIL'} |")

        # 2. source overlap --------------------------------------------------
        t0 = time.perf_counter()
        ov = source_overlap(docs, n=3).collect()
        t_ov = round(time.perf_counter() - t0, 1)
        sub = [r for r in ov
               if {r["src_a"], r["src_b"]} >= {"mega", "subsetfeed"}]
        sub_ok = len(sub) == 1 and sub[0]["containment"] == 1.0
        if not sub_ok:
            failures.append(f"source overlap: planted subset feed not "
                            f"detected at containment 1.0 (got {sub})")
        lines.append(f"| source overlap ({n_sources} sources) | {t_ov} "
                     f"| {len(ov)} pairs | planted subset containment 1.0: "
                     f"{'PASS' if sub_ok else 'FAIL'} |")

        # 3. quantization throughput + corpus-wide error bound ---------------
        vecs = build_vectors(spark, args.vectors, 64,
                             os.path.join(tmp, "vecs"))
        q = quantize_int8(vecs)
        t0 = time.perf_counter()
        # max |x - q*rawscale| vs rawscale/2, verified corpus-wide in ONE
        # aggregate. The RAW scale is recomputed here because the operator
        # emits it rounded to 9 dp (presentation) while qvec was computed
        # from the raw value — bounding against the rounded scale is off
        # by up to 127 * 0.5e-9 (exactly the drift a first run of this
        # stress caught).
        rawscale = (F.array_max(F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.abs(x))) / F.lit(127.0))
        viol = (q.join(vecs, "vec_id")
                .select(F.max(F.aggregate(
                    F.zip_with(F.col("embedding").cast("array<double>"),
                               F.col("qvec"),
                               lambda x, qq: F.abs(x - qq * rawscale)
                               - rawscale / 2 - F.lit(1e-12)),
                    F.lit(-1.0), lambda a, x: F.greatest(a, x))).alias("worst"))
                .collect()[0]["worst"])
        t_q = round(time.perf_counter() - t0, 1)
        q_ok = viol <= 0
        if not q_ok:
            failures.append(f"quantization: reconstruction error exceeds "
                            f"scale/2 by {viol}")
        lines.append(f"| int8 quantize ({args.vectors} x 64 dims) | {t_q} "
                     f"| {args.vectors} rows | max err <= scale/2 "
                     f"corpus-wide: {'PASS' if q_ok else 'FAIL'} |")

        # 4. k-means fit + assign at 500k ------------------------------------
        kvecs = build_vectors(spark, args.kmeans_vectors, 64,
                              os.path.join(tmp, "kvecs"))
        t0 = time.perf_counter()
        hist1 = dict((r["cluster"], r["n"]) for r in
                     kmeans_assign(kvecs, k=16, iters=2)
                     .groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
                     .collect())
        t_km = round(time.perf_counter() - t0, 1)
        hist2 = dict((r["cluster"], r["n"]) for r in
                     kmeans_assign(kvecs, k=16, iters=2)
                     .groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
                     .collect())
        km_ok = (sum(hist1.values()) == args.kmeans_vectors
                 and hist1 == hist2)
        if not km_ok:
            failures.append(f"kmeans: non-exhaustive or non-deterministic "
                            f"({sum(hist1.values())} labeled; rerun equal: "
                            f"{hist1 == hist2})")
        lines.append(f"| k-means fit+assign ({args.kmeans_vectors} x 64, "
                     f"k=16, 2 iters) | {t_km} | {sum(hist1.values())} "
                     f"labeled | deterministic rerun histogram: "
                     f"{'PASS' if km_ok else 'FAIL'} |")

        # 5. IVF-scale k: k=256 x 64 dims exercises the Arrow kernel
        # assignment path at codebook scale (a literal plan at this k
        # would outgrow plan construction / Janino limits)
        n_big = args.kmeans_vectors // 5
        bigk = build_vectors(spark, n_big, 64, os.path.join(tmp, "bigk"))
        t0 = time.perf_counter()
        labeled = (kmeans_assign(bigk, k=256, iters=1)
                   .groupBy().agg(F.count(F.lit(1)).alias("n"),
                                  F.countDistinct("cluster").alias("k"))
                   .collect()[0])
        t_big = round(time.perf_counter() - t0, 1)
        big_ok = labeled["n"] == n_big and labeled["k"] > 128
        if not big_ok:
            failures.append(f"kmeans k=256: {labeled['n']}/{n_big} labeled "
                            f"across {labeled['k']} clusters")
        lines.append(f"| k-means IVF-scale ({n_big} x 64, k=256, kernel "
                     f"path) | {t_big} | {labeled['n']} labeled, "
                     f"{labeled['k']} clusters used | exhaustive via "
                     f"Arrow kernel assignment (no corpus shuffle): "
                     f"{'PASS' if big_ok else 'FAIL'} |")

    section = (
        f"{SECTION}\n\n"
        f"Corpus: **{n_docs} documents** (sf0.1 x {args.scale} replicas, "
        f"~95% collapsed onto one mega source + a planted subset feed), "
        f"**{args.vectors}** synthetic 64-dim vectors, local[{cores}].\n\n"
        "| check | wall (s) | output | bound |\n|---|---|---|---|\n"
        + "\n".join(lines) + "\n\n"
        "Why these bounds are the 100 TB story: the heavy-hitter ranking "
        "never exposes a task to the hot source's full group (two-phase "
        "salted top-k, survivors <= buckets*k); overlap postings are "
        "arrays bounded by #sources, so the matrix cost is linear in "
        "distinct shingles regardless of corpus size; quantization is a "
        "zero-shuffle projection (plan-asserted in "
        "tests/test_plan_properties.py) whose error bound is checked by "
        "aggregate, not sampling; the k-means fit moves only (cluster, "
        "dim) partial means over the wire (assignment is map-only at any "
        "k — the IVF-scale model rides the Arrow kernel, which shuffles "
        "nothing and never expands n*k rows) and its model is pinned to a "
        "6-dp grid, so reruns — and engines — agree exactly.\n\n"
        f"Result: **{'PASS' if not failures else 'FAIL: ' + '; '.join(failures)}**. "
        "Rerun: `python tools/stress_profiling.py`.\n"
    )

    prior = open(args.out).read() if os.path.exists(args.out) else ""
    if SECTION in prior:
        start = prior.index(SECTION)
        nxt = prior.find("\n## ", start + len(SECTION))
        new = prior[:start] + section + (prior[nxt + 1:] if nxt >= 0 else "")
    else:
        new = prior.rstrip("\n") + "\n\n" + section
    with open(args.out, "w") as f:
        f.write(new)
    print(section)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
