#!/usr/bin/env python
"""Per-job timing probe for one bench query (guide §1: measure first).

Runs ONE query from bench.py's runner table in a fresh JVM with Spark
event logging on, times each of n runs, then parses the event log into
per-job wall times (job id, duration, description/first stage name) so
the expensive *action* inside a multi-action operator is identifiable
without the UI.

    python scripts/r12_probe.py <query_name> [n_runs]

Prints one JSON line: {"query":..., "runs":[...], "jobs":[[jid, sec,
desc], ...]} for the LAST run (steady state).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> int:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    evdir = tempfile.mkdtemp(prefix="spark-events-")

    from dataprofiler_spark.session import get_spark
    spark = get_spark(app_name=f"probe-{name}", extra_conf={
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    import bench
    runners = bench.build_runners(spark, sf_dir)
    group, fn = runners[name]
    if hasattr(fn, "setup"):
        fn.setup()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    runs = []
    marks = []
    for i in range(n_runs):
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
        marks.append(time.time() * 1000)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log: job submit/end pairs (Spark 4 writes a
    # rolling dir eventlog_v2_<appid>/events_*)
    jobs = []
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        path = os.path.join(evdir, app_id + ".inprogress")
    if not os.path.exists(path):
        import glob
        cands = sorted(glob.glob(
            os.path.join(evdir, f"eventlog_v2_{app_id}", "events_*")))
        if cands:
            bufs = []
            for c in cands:
                with open(c, "rb") as fh:
                    raw = fh.read()
                if c.endswith(".zstd"):
                    import zstandard
                    raw = zstandard.ZstdDecompressor().decompress(
                        raw, max_output_size=1 << 31)
                bufs.append(raw.decode("utf-8", errors="replace"))
            path = os.path.join(evdir, "merged.jsonl")
            with open(path, "w") as fh:
                fh.write("".join(bufs))
    starts: dict[int, tuple[float, str]] = {}
    stages = []
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = ev.get("Properties", {}).get(
                    "spark.job.description", "")
                # first stage's name = the action's callsite
                st = ev.get("Stage Infos", [])
                site = st[-1]["Stage Name"] if st else ""
                starts[jid] = (ev["Submission Time"], desc or site)
            elif t == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in starts:
                    t0, desc = starts[jid]
                    jobs.append((jid, ev["Completion Time"], t0, desc))
            elif t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                if "Completion Time" in si and "Submission Time" in si:
                    stages.append((
                        si["Stage ID"],
                        si["Completion Time"],
                        round((si["Completion Time"]
                               - si["Submission Time"]) / 1000.0, 3),
                        si.get("Number of Tasks", 0),
                        si["Stage Name"]))
    # keep only jobs of the LAST run (completed after marks[-2])
    lo = marks[-2] if len(marks) > 1 else 0
    out = [[jid, round((t1 - t0) / 1000.0, 3), desc]
           for jid, t1, t0, desc in jobs if t1 > lo]
    st_out = [[sid, dur, nt, nm] for sid, t1, dur, nt, nm in stages
              if t1 > lo and dur >= 0.05]
    print(json.dumps({"query": name, "runs": runs, "jobs": out,
                      "stages": st_out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
