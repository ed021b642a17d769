"""SemDeDup skewed-cluster stress: proves the composed operator
(operators/vectors.py:semdedup = kmeans -> within-cluster cosine collapse
-> components) keeps its documented scale shape when the cluster histogram
is adversarially skewed — the 100 TB failure mode where one centroid
captures a constant fraction of the corpus and an uncapped pair join would
expand quadratically inside a handful of tasks.

What it checks:

1. **Cap containment** — a planted dominant direction (~94% of the
   corpus) lands in k-means clusters above ``max_cluster``; ALL of their
   rows must come back self-canonical (the conservative keep-everything
   direction), with zero pair expansion for those clusters.
2. **Collapse still works where it should** — every under-cap cluster is
   a tight noise ball (pairwise cosine ~0.9996 >> threshold), so each
   must collapse transitively to ONE canonical: its min id.
3. **Pair-expansion bound** — the capped run's candidate-pair count
   (recomputed from the deterministic assignment histogram) is exactly
   sum over under-cap clusters of C(n_c, 2); the skipped hot clusters'
   would-be expansion is reported as the avoided cost.
4. **Uncapped contrast** — on a small hot-only corpus, max_cluster=None
   materializes the quadratic pair set (reported wall + count), the
   blowup the cap removes at 1/60 the stressed cluster size.

Rewrites only its own section of STRESS.md (``--out``); exits non-zero on
any violated bound. Standalone; not part of the per-round bench.

Usage::

    python tools/stress_semdedup.py [--hot 180000] [--out STRESS.md]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from eirepolitic_data_pipeline_spark.operators.vectors import (  # noqa: E402
    kmeans_assign,
    semdedup,
)
from eirepolitic_data_pipeline_spark.session import get_spark  # noqa: E402

SECTION = "## SemDeDup skewed-cluster stress (tools/stress_semdedup.py)"

DIM = 16
N_DIRS = 8          # orthogonal basis directions -> clean k=8 clusters
NOISE = 0.01        # within-direction noise; mate cosine ~0.9996


def build_vectors(spark, hot: int, small: int, path: str):
    """hot vectors on direction 0, `small` on each of directions 1..7.
    ids 0..7 are one exact basis vector per direction, so the k=8 seed
    init (lowest ids) starts one centroid per direction and the
    assignment histogram is deterministic. Deterministic numpy seed."""
    rng = np.random.default_rng(7)
    rows_id, rows_v = [], []
    next_id = N_DIRS
    for d in range(N_DIRS):
        base = np.zeros(DIM)
        base[d] = 1.0
        rows_id.append(d)
        rows_v.append(base.copy())
        n = hot if d == 0 else small
        noise = rng.normal(0.0, NOISE, size=(n, DIM))
        vecs = base[None, :] + noise
        for v in vecs:
            rows_id.append(next_id)
            rows_v.append(v)
            next_id += 1
    pdf = pd.DataFrame({
        "vec_id": np.asarray(rows_id, dtype="int64"),
        "embedding": [list(map(float, v)) for v in rows_v],
    })
    pdf.to_parquet(path)
    return spark.read.parquet(path).repartition(
        spark.sparkContext.defaultParallelism)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot", type=int, default=180_000)
    ap.add_argument("--small", type=int, default=1_500)
    ap.add_argument("--cap", type=int, default=10_000)
    ap.add_argument("--contrast", type=int, default=3_000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRESS.md"))
    args = ap.parse_args()

    spark = get_spark("stress_semdedup")
    cores = spark.sparkContext.defaultParallelism
    failures: list[str] = []
    lines: list[str] = []

    with tempfile.TemporaryDirectory() as tmp:
        vecs = build_vectors(spark, args.hot, args.small,
                             os.path.join(tmp, "vecs.parquet"))
        n_total = vecs.count()

        # deterministic histogram from the SAME fit semdedup performs
        hist = {r["cluster"]: r["n"] for r in
                kmeans_assign(vecs, k=N_DIRS, iters=2)
                .groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
                .collect()}
        hot_clusters = {c for c, n in hist.items() if n > args.cap}
        small_clusters = {c for c, n in hist.items() if n <= args.cap}
        capped_pairs = sum(n * (n - 1) // 2
                           for c, n in hist.items() if c in small_clusters)
        avoided_pairs = sum(n * (n - 1) // 2
                            for c, n in hist.items() if c in hot_clusters)
        if not hot_clusters:
            failures.append("no cluster exceeded the cap — stress invalid")

        t0 = time.perf_counter()
        out = semdedup(vecs, k=N_DIRS, iters=2, threshold=0.95,
                       max_cluster=args.cap).persist()
        n_out = out.count()
        t_capped = round(time.perf_counter() - t0, 1)
        if n_out != n_total:
            failures.append(f"row count {n_out} != {n_total}")

        # 1. cap containment: every hot-cluster row self-canonical
        hot_bad = out.filter(F.col("cluster").isin(list(hot_clusters))
                             & (F.col("vec_id") != F.col("canonical_id"))
                             ).count()
        hot_n = out.filter(F.col("cluster").isin(list(hot_clusters))).count()
        if hot_bad:
            failures.append(f"{hot_bad} hot-cluster rows were collapsed "
                            "despite the cap")
        lines.append(f"| cap containment (hot clusters "
                     f"{sorted(hist[c] for c in hot_clusters)} rows) | "
                     f"{t_capped} | {hot_n} rows, {hot_bad} collapsed | "
                     f"{'PASS' if not hot_bad else 'FAIL'} |")

        # 2. under-cap clusters collapse transitively to one canonical
        per = (out.filter(F.col("cluster").isin(list(small_clusters)))
               .groupBy("cluster")
               .agg(F.countDistinct("canonical_id").alias("ncanon"),
                    F.min("vec_id").alias("minid"),
                    F.min("canonical_id").alias("mincanon"),
                    F.count(F.lit(1)).alias("n"))
               .collect())
        bad_small = [r for r in per
                     if r["ncanon"] != 1 or r["mincanon"] != r["minid"]]
        if bad_small:
            failures.append(f"{len(bad_small)} under-cap clusters did not "
                            "collapse to their min-id canonical")
        lines.append(f"| under-cap collapse ({len(per)} clusters x "
                     f"~{args.small} rows, mate cosine ~0.9996) | — | "
                     f"{sum(r['n'] for r in per)} rows -> "
                     f"{sum(r['ncanon'] for r in per)} canonicals | "
                     f"{'PASS' if not bad_small else 'FAIL'} |")

        # 3. pair-expansion bound (exact, from the deterministic histogram)
        lines.append(f"| pair expansion bound | — | capped run compares "
                     f"{capped_pairs} pairs; cap skips {avoided_pairs} | "
                     "PASS (derived from the assignment histogram the fit "
                     "pins) |")

        # 4. uncapped contrast on a hot-dominated slice. The slice still
        # carries the 7 orthogonal basis rows build_vectors always emits
        # (they stay self-canonical — cosine ~0 to the hot direction), so
        # the exact counts come from the slice itself, not a formula that
        # forgets them (review r7: the first cut reported contrast+1 rows
        # and C(contrast+1, 2) pairs, understating both).
        hot_slice = build_vectors(spark, args.contrast, 0,
                                  os.path.join(tmp, "hot.parquet"))
        n_slice = hot_slice.count()
        exp_pairs = n_slice * (n_slice - 1) // 2  # k=1: ONE cluster
        t0 = time.perf_counter()
        out2 = semdedup(hot_slice, k=1, iters=1, threshold=0.95,
                        max_cluster=None)
        n_collapsed = out2.filter(
            F.col("vec_id") != F.col("canonical_id")).count()
        t_uncapped = round(time.perf_counter() - t0, 1)
        ok4 = n_collapsed == args.contrast  # all but the min id collapse
        if not ok4:
            failures.append(f"uncapped contrast collapsed {n_collapsed} "
                            f"of {args.contrast}")
        lines.append(f"| uncapped contrast ({n_slice} rows in one k=1 "
                     f"cluster, {exp_pairs} pairs materialized) | "
                     f"{t_uncapped} | {n_collapsed} collapsed into 1 "
                     f"canonical | {'PASS' if ok4 else 'FAIL'} |")
        out.unpersist()

    section = (
        f"{SECTION}\n\n"
        f"Corpus: **{n_total} vectors** ({DIM}-dim; {args.hot} on one "
        f"dominant direction ~{round(100 * args.hot / n_total)}% of the "
        f"corpus, {N_DIRS - 1} x {args.small} on orthogonal directions), "
        f"k={N_DIRS}, threshold 0.95, max_cluster={args.cap}, "
        f"local[{cores}].\n\n"
        "| check | wall (s) | output | bound |\n|---|---|---|---|\n"
        + "\n".join(lines) + "\n\n"
        "Why this is the 100 TB story: semdedup's pair join partitions by "
        "cluster id, so its cost is sum over clusters of n_c^2 — "
        "quadratic in the HOT cluster absent a guard. The max_cluster "
        "semi-join (groupBy-count, never a window) excludes over-cap "
        "clusters before any pair row exists, so the dominant direction "
        "above costs zero pair comparisons and degrades conservatively "
        "to self-canonicals, while every under-cap cluster still "
        "collapses transitively to its min-id canonical. The avoided "
        "expansion is exact (derived from the deterministic fit's "
        "histogram), not sampled; the uncapped contrast materializes the "
        "quadratic pair set at 1/60 the stressed cluster size to show "
        "what was avoided. Production sizing: pick k so corpus/k lands "
        "well under max_cluster (SemDeDup uses k in the thousands).\n\n"
        f"Result: **{'PASS' if not failures else 'FAIL: ' + '; '.join(failures)}**. "
        "Rerun: `python tools/stress_semdedup.py`.\n"
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
