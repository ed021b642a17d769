"""Per-query job/stage profiler for the optimization rounds.

Runs selected workload queries (fresh builder call per run, exactly like
bench.py: noop sink, warm-up pass at the small SF first) with the Spark
event log enabled, then parses the event log into a per-query breakdown:

    q88_index_drift_report  total 4.10s  jobs=23
      job 141  0.52s  stages=2  tasks=33  shuffleWrite=1.2MB  "collect at ..."
      ...

Usage:
    python tools/profile_queries.py /root/testdata/sf0.1 q87 q88 q90
    python tools/profile_queries.py /root/testdata/sf0.1 --all-over 1.0

Job-count and per-job wall time is the right lens at fixture scale: the
corpus is tiny, so a multi-second query is paying per-job fixed costs
(scheduling, task launch, Py4J) times the number of sequential Spark jobs
its chain launches — which is also the number of cluster-wide barriers the
same chain would pay at 100 TB.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eirepolitic_data_pipeline_spark import workload  # noqa: E402
from eirepolitic_data_pipeline_spark.session import get_spark  # noqa: E402


def _fmt_bytes(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024:
            return f"{n:.1f}{unit}"
        n /= 1024
    return f"{n:.1f}TB"


def profile(sf_dir: str, names: list[str], runs: int = 1) -> None:
    log_dir = tempfile.mkdtemp(prefix="spark_graft_eventlog_")
    spark = get_spark("profile", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{log_dir}",
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    qs = workload.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for n in names:
        try:
            qs[n](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # pragma: no cover
            print(f"warmup {n}: {e}", file=sys.stderr)

    sc = spark.sparkContext
    walls: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for n in names:
            sc.setJobGroup(n, n)
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls[n].append(time.perf_counter() - t0)
            sc.setJobGroup("", "")
    app_id = sc.applicationId
    spark.stop()

    # -- parse the event log ------------------------------------------------
    path = os.path.join(log_dir, app_id)
    if not os.path.exists(path):
        cands = sorted(p for p in os.listdir(log_dir)
                       if not p.startswith("."))
        if not cands:
            raise SystemExit(f"no event log found in {log_dir} "
                             f"(app_id={app_id})")
        path = os.path.join(log_dir, cands[-1])
    if os.path.isdir(path):
        # Spark 4 rolling event log: a dir holding events_* part files
        parts = sorted(p for p in os.listdir(path)
                       if p.startswith("events"))
        lines = (line for p in parts
                 for line in open(os.path.join(path, p)))
    else:
        lines = (line for line in open(path))
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    if True:
        for line in lines:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "group": props.get("spark.jobGroup.id", ""),
                    "desc": (props.get("spark.job.description", "") or "")[:90],
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "callsite": "",
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:80],
                    "tasks": si["Number of Tasks"],
                }
    for n in names:
        grp_jobs = sorted(
            (j for j in jobs.values() if j["group"] == n and "end" in j),
            key=lambda j: j["start"])
        wall = min(walls[n])
        per_run = len(grp_jobs) // max(runs, 1)
        print(f"\n=== {n}: wall(min of {runs})={wall:.2f}s "
              f"jobs={len(grp_jobs)} ({per_run}/run)")
        for j in grp_jobs:
            dur = (j["end"] - j["start"]) / 1000.0
            parts = []
            for sid in j["stages"]:
                st = stages.get(sid)
                if st:
                    parts.append(f"{st['tasks']}t:{st['name']}")
            print(f"  {dur:6.3f}s  {' | '.join(parts)[:150]}")
    shutil.rmtree(log_dir, ignore_errors=True)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    sel = args[1:]
    runs = 1
    if "--runs" in sel:
        i = sel.index("--runs")
        runs = int(sel[i + 1])
        del sel[i:i + 2]
    all_names = list(workload.queries())
    names = ([n for n in all_names if any(n.startswith(s) for s in sel)]
             if sel else all_names)
    profile(sf_dir, names, runs=runs)


if __name__ == "__main__":
    main()
