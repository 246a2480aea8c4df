#!/usr/bin/env python
"""Per-query job/stage profiler for the bench registry (round 13).

Runs named bench queries with the Spark event log enabled, then parses
the log into a per-query decomposition:

- jobs launched by the query (count, wall, description),
- per-stage wall / task time / shuffle read+write bytes / spill,
- the DRIVER GAP: query wall not covered by any running job — Catalyst
  planning, driver-side collects, control-plane loops.

This is the guide-§1 empirical loop without a UI: the numbers name the
stage (or the gap) to optimize, and re-running after a change shows
whether it moved.

Usage: python tools/optprofile.py [--runs N] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-optprofile"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=1, help="timed runs per query")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from data_ingestion_backend_spark.plans.session import get_spark
    from data_ingestion_backend_spark.operators.queries import STANDALONE_QUERIES
    from data_ingestion_backend_spark.registry import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="optprofile",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext

    def run(name):
        fn = QUERIES.get(name) or STANDALONE_QUERIES[name]
        df = fn(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()

    windows: dict[str, list[tuple[float, float]]] = {}
    for name in args.queries:
        if not args.no_warm:
            sc.setJobDescription(f"warm::{name}")
            run(name)
        sc.setJobDescription(f"timed::{name}")
        for i in range(args.runs):
            t0 = time.time()
            run(name)
            windows.setdefault(name, []).append((t0, time.time()))
        sc.setJobDescription(None)
    spark.stop()

    # --- parse event log -----------------------------------------------
    roots = [os.path.join(EVDIR, f) for f in os.listdir(EVDIR) if not f.startswith(".")]
    evfiles: list[str] = []
    for r in roots:
        if os.path.isdir(r):  # Spark 4 rolling eventlog dir
            evfiles += [
                os.path.join(r, f)
                for f in sorted(os.listdir(r))
                if f.startswith("events_")
            ]
        else:
            evfiles.append(r)
    jobs = {}        # jobId -> dict
    stage_info = {}  # stageId -> dict
    import itertools

    def _open(path):
        if path.endswith(".zstd"):
            import io as _io

            import zstandard

            return _io.TextIOWrapper(
                zstandard.ZstdDecompressor().stream_reader(open(path, "rb"))
            )
        return open(path)

    lines = itertools.chain.from_iterable(_open(f) for f in evfiles)
    if True:
        for line in lines:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "desc": (ev.get("Properties") or {}).get("spark.job.description", ""),
                    "t0": ev["Submission Time"] / 1e3,
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"] / 1e3
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                st = stage_info.setdefault(sid, {})
                st["name"] = si.get("Stage Name", "")
                st["wall"] = (com - sub) / 1e3 if sub and com else 0.0
                st["tasks"] = si.get("Number of Tasks", 0)
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stage_info.setdefault(sid, {"name": "?", "wall": 0.0, "tasks": 0})
                m = ev.get("Task Metrics") or {}
                st["task_ms"] = st.get("task_ms", 0) + m.get("Executor Run Time", 0)
                srm = m.get("Shuffle Read Metrics") or {}
                st["sh_read"] = st.get("sh_read", 0) + srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                swm = m.get("Shuffle Write Metrics") or {}
                st["sh_write"] = st.get("sh_write", 0) + swm.get("Shuffle Bytes Written", 0)
                st["spill"] = st.get("spill", 0) + m.get("Disk Bytes Spilled", 0)
                st["input"] = st.get("input", 0) + (m.get("Input Metrics") or {}).get("Bytes Read", 0)

    for name in args.queries:
        print(f"\n================ {name} ================")
        for (w0, w1) in windows[name]:
            wall = w1 - w0
            qjobs = [
                (jid, j) for jid, j in sorted(jobs.items())
                if j.get("desc") == f"timed::{name}" and j.get("t0", 0) >= w0 - 0.05 and j.get("t1", w1) <= w1 + 0.05
            ]
            job_time = sum(j["t1"] - j["t0"] for _, j in qjobs if "t1" in j)
            # union of job intervals → covered time; gap = wall - covered
            ivs = sorted((j["t0"], j["t1"]) for _, j in qjobs if "t1" in j)
            covered, cur0, cur1 = 0.0, None, None
            for a, b in ivs:
                if cur1 is None or a > cur1:
                    if cur1 is not None:
                        covered += cur1 - cur0
                    cur0, cur1 = a, b
                else:
                    cur1 = max(cur1, b)
            if cur1 is not None:
                covered += cur1 - cur0
            print(f"run wall={wall:7.3f}s  jobs={len(qjobs):3d}  job-covered={covered:7.3f}s  driver-gap={wall-covered:7.3f}s  (sum job wall={job_time:.3f}s)")
            # top stages by wall in this run
            seen = set()
            srows = []
            for _, j in qjobs:
                for sid in j["stages"]:
                    if sid in seen or sid not in stage_info:
                        continue
                    seen.add(sid)
                    st = stage_info[sid]
                    if st.get("wall", 0) > 0 or st.get("task_ms", 0) > 0:
                        srows.append((sid, st))
            srows.sort(key=lambda kv: -kv[1].get("wall", 0))
            for sid, st in srows[:14]:
                nm = st["name"].split("\n")[0][:72]
                print(
                    f"  stage {sid:4d} wall={st.get('wall',0):7.3f}s tasks={st.get('tasks',0):3d}"
                    f" taskms={st.get('task_ms',0):7d} in={st.get('input',0)//1024:8d}K"
                    f" shR={st.get('sh_read',0)//1024:7d}K shW={st.get('sh_write',0)//1024:7d}K"
                    f" spill={st.get('spill',0)//1024:6d}K  {nm}"
                )


if __name__ == "__main__":
    main()
