"""Pinned confirm-rerun for round-over-round bench drift flags: run a
named subset of the workload with the bench's exact methodology (sf0.001
warm-up, interleaved passes, noop sink, per-query median) at sf0.1, and
compare each median against a prior round's recorded value.

Usage::

    python tools/bench_drift_rerun.py q74=2.215 q62=2.024 [--runs 5]

Each positional arg is ``<qNN>=<prior seconds>``; the report prints the
fresh median, the ratio, and whether it sits within the +/-25% band the
verdicts use to separate host drift from code regressions. Exit status
is 0 either way — drift adjudication is a judgment call made on the
numbers, not a gate."""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eirepolitic_data_pipeline_spark import workload  # noqa: E402
from eirepolitic_data_pipeline_spark.session import get_spark  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("targets", nargs="+",
                    help="qNN=<prior median seconds> pairs")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    prior = {}
    for t in args.targets:
        q, _, v = t.partition("=")
        prior[q] = float(v)
    qs = {n: f for n, f in workload.queries().items()
          if n.split("_")[0] in prior}
    missing = set(prior) - {n.split("_")[0] for n in qs}
    if missing:
        raise SystemExit(f"unknown queries: {sorted(missing)}")

    spark = get_spark("bench_drift_rerun")
    for fn in qs.values():  # warm-up: Janino/JIT, untimed
        fn(spark, args.warm_dir).write.format("noop") \
            .mode("overwrite").save()
    samples: dict[str, list[float]] = {n: [] for n in qs}
    for _ in range(args.runs):
        for name, fn in qs.items():
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop") \
                .mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
    out = {}
    for name, vals in samples.items():
        q = name.split("_")[0]
        med = round(statistics.median(vals), 3)
        ratio = round(med / prior[q], 2)
        out[q] = {"median": med, "prior": prior[q], "ratio": ratio,
                  "within_25pct": 0.75 <= ratio <= 1.25,
                  "samples": [round(v, 3) for v in vals]}
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
