"""Dump ``explain("formatted")`` for every workload query to a directory.

Usage:
    python tools/dump_plans.py <out_dir> [sf_dir] [query-prefix ...]

Used by the optimization rounds to commit plans/rNN/<query>_{before,after}.txt
evidence; run from the pre-change tree for the *_before files and from the
optimized tree for *_after.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eirepolitic_data_pipeline_spark import workload  # noqa: E402
from eirepolitic_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    prefixes = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans")
    qs = workload.queries()
    for name, fn in qs.items():
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        try:
            df = fn(spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # pragma: no cover - evidence best-effort
            text = f"EXPLAIN FAILED: {e}\n"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(text)
        print(name, "ok" if not text.startswith("EXPLAIN FAILED") else "FAIL")
    spark.stop()


if __name__ == "__main__":
    main()
