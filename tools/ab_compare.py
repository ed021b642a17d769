"""Same-SESSION A/B timing of two repo trees (r12 verdict ask #1).

The round-11 driver bench showed 36 queries "regressed" at 32 cores whose
plans are byte-identical to round 10 — and its own 8-core run reproduced
the round-10 numbers. The only decidable test is one Spark session timing
BOTH trees interleaved: same JVM, same page cache, same host window.

Usage:
    python tools/ab_compare.py <treeA> <treeB> <sf_dir> [--runs N] [q ...]

Each tree is imported under the same package name by purging
``eirepolitic_data_pipeline_spark*`` from ``sys.modules`` and re-pointing
``sys.path[0]`` — the SparkSession (created once, from treeA's factory)
survives the swap, so every timing sample shares one JVM. Samples are
interleaved A,B,A,B... per query per pass (bench.py's methodology), and
the report prints per-query medians plus the A/B ratio.

Timing matches bench.py exactly: noop sink, warm-up at sf0.001 first,
fresh builder call per pass through each tree's own workload.queries().
"""

from __future__ import annotations

import os
import statistics
import sys
import time


def _load_workload(tree: str):
    """(Re-)import the workload package from ``tree``, purging any
    previously imported copy so module-level state (plan memo, registry)
    belongs to exactly one tree at a time."""
    for mod in [m for m in sys.modules
                if m.split(".")[0] == "eirepolitic_data_pipeline_spark"]:
        del sys.modules[mod]
    sys.path[0] = tree
    import eirepolitic_data_pipeline_spark.workload as workload
    return workload


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    tree_a, tree_b, sf_dir = args[0], args[1], args[2]
    prefixes = args[3:]

    sys.path.insert(0, tree_a)
    from eirepolitic_data_pipeline_spark.session import get_spark
    spark = get_spark("ab_compare")

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir

    def queries_of(tree: str) -> dict:
        wl = _load_workload(tree)
        qs = wl.queries()
        if prefixes:
            qs = {n: f for n, f in qs.items()
                  if any(n.startswith(p) for p in prefixes)}
        return qs

    # Warm both trees' plans and JIT at the small SF (untimed).
    names = None
    for tree in (tree_a, tree_b):
        qs = queries_of(tree)
        if names is None:
            names = list(qs)
        for n, fn in qs.items():
            try:
                fn(spark, warm_dir).write.format("noop").mode(
                    "overwrite").save()
            except Exception as e:  # pragma: no cover
                print(f"warmup[{tree}] {n}: {e}", file=sys.stderr)

    samples: dict[str, dict[str, list[float]]] = {
        n: {"A": [], "B": []} for n in names}
    for r in range(runs):
        # Alternate which tree goes first each pass so neither always
        # pays/benefits from the other's cache effects.
        order = [("A", tree_a), ("B", tree_b)]
        if r % 2:
            order.reverse()
        for label, tree in order:
            qs = queries_of(tree)
            for n in names:
                if n not in qs:
                    continue
                t0 = time.perf_counter()
                try:
                    qs[n](spark, sf_dir).write.format("noop").mode(
                        "overwrite").save()
                    samples[n][label].append(time.perf_counter() - t0)
                except Exception as e:  # pragma: no cover
                    print(f"run[{label}] {n}: {e}", file=sys.stderr)

    print(f"\n{'query':<34} {'A(med)':>8} {'B(med)':>8} {'B/A':>6}")
    for n in names:
        sa, sb = samples[n]["A"], samples[n]["B"]
        if not sa or not sb:
            print(f"{n:<34} {'-':>8} {'-':>8}")
            continue
        ma, mb = statistics.median(sa), statistics.median(sb)
        print(f"{n:<34} {ma:>8.3f} {mb:>8.3f} {mb / ma:>6.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
