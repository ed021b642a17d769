"""Mechanical plan audit: verify the scale claims the code makes.

For each workload query, inspect the physical plan and report:
- shuffle Exchange count (hashpartitioning / rangepartitioning)
- BroadcastExchange count (dimension joins that stay off the shuffle)
- whether parquet scans carry PushedFilters (predicate pushdown reached
  the source) and how many columns each ReadSchema retains (pruning)
- row-at-a-time Python UDFs (BatchEvalPython — should be ZERO everywhere;
  ArrowEvalPython / mapInPandas stages are the sanctioned escape hatch)

Usage:
    python tools/plan_audit.py [sf_dir] [query ...]

Exit code 1 if any query plans a BatchEvalPython node.

Caveat: counts come from the STATIC executed plan. Queries whose builders
.cache() shared frames (the gold marts) print the full lineage once per
reference, so their scan/shuffle counts overstate runtime work — the cache
collapses repeats at execution. Compare like-for-like across rounds.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eirepolitic_data_pipeline_spark import workload  # noqa: E402
from eirepolitic_data_pipeline_spark.session import get_spark  # noqa: E402


def audit(plan: str) -> dict:
    lines = plan.splitlines()
    shuffles = sum(1 for ln in lines
                   if "Exchange hashpartitioning" in ln
                   or "Exchange rangepartitioning" in ln
                   or "Exchange RoundRobinPartitioning" in ln)
    bcasts = sum(1 for ln in lines if "BroadcastExchange" in ln)
    scans = len(re.findall(r"FileScan parquet|Scan parquet", plan))
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    py_rowwise = sum(1 for ln in lines if "BatchEvalPython" in ln)
    arrow = sum(1 for ln in lines
                if "ArrowEvalPython" in ln or "MapInPandas" in ln
                or "FlatMapGroupsInPandas" in ln)
    # stop at end-of-line: Spark truncates long plan strings, so a greedy
    # [^>]* would run past an unclosed struct< into following plan lines
    # and report phantom 200-column scans
    read_widths = [len(s.split(",")) for s in
                   re.findall(r"ReadSchema: struct<([^>\n]*)", plan)]
    return {
        "shuffles": shuffles, "broadcasts": bcasts, "scans": scans,
        "scans_with_pushdown": pushed, "rowwise_python": py_rowwise,
        "arrow_stages": arrow,
        "max_scan_width": max(read_widths) if read_widths else 0,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("plan_audit",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    bad = 0
    for name, q in workload.QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = q.fn(spark, sf_dir)
            a = audit(df._jdf.queryExecution().executedPlan().toString())
        except Exception as e:  # pragma: no cover
            print(f"{name}: ERROR {e}")
            bad += 1
            continue
        flag = ""
        if a["rowwise_python"]:
            flag = "  !! row-wise Python UDF"
            bad += 1
        print(f"{name}: shuffles={a['shuffles']} broadcasts={a['broadcasts']} "
              f"scans={a['scans']} pushdown={a['scans_with_pushdown']} "
              f"arrow={a['arrow_stages']} max_cols={a['max_scan_width']}{flag}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
