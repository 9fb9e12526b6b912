"""Dump per-task metrics for the slow stages of one registry query run.

Runs the query N times in a warm session with the event log on, then for
every stage > 0.5s prints task launch/duration/CPU/deserialization/GC,
so blocked-vs-computing is visible (stand-in for the UI stage page).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_mapreduce_spark.registry import all_queries  # noqa: E402
from python_mapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "q_dedup_embedding"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    log_dir = f"/tmp/spark-events-{os.getpid()}"
    os.makedirs(log_dir, exist_ok=True)
    spark = get_spark(
        "exp_task_metrics",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
        },
    )
    q = all_queries()[name]
    q.fn(spark, "/root/testdata/sf0.001").count()
    for i in range(n):
        spark.sparkContext.setJobDescription(f"{name}#run{i}")
        t0 = time.time()
        q.fn(spark, SF).count()
        print(f"run{i}: {time.time()-t0:.3f}s", flush=True)
    spark.stop()

    # parse
    paths = []
    for root, _d, files in os.walk(log_dir):
        paths.extend(os.path.join(root, f) for f in files if not f.startswith("."))
    stage_tasks: dict[int, list[dict]] = {}
    stage_info: dict[int, dict] = {}
    for p in sorted(paths):
        if p.endswith(".zstd"):
            text = subprocess.run(["zstd", "-dc", p], capture_output=True, text=True).stdout
        else:
            text = open(p, errors="replace").read()
        for line in text.splitlines():
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if not isinstance(ev, dict):
                continue
            k = ev.get("Event")
            if k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                dur = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000
                stage_info[si["Stage ID"]] = {
                    "dur": dur,
                    "ntasks": si.get("Number of Tasks"),
                    "name": si.get("Stage Name", "")[:60],
                }
            elif k == "SparkListenerTaskEnd":
                ti = ev.get("Task Info", {})
                tm = ev.get("Task Metrics") or {}
                sid = ev.get("Stage ID")
                stage_tasks.setdefault(sid, []).append(
                    {
                        "launch": ti.get("Launch Time", 0),
                        "dur": (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000,
                        "cpu": tm.get("Executor CPU Time", 0) / 1e9,
                        "run": tm.get("Executor Run Time", 0) / 1000,
                        "deser": tm.get("Executor Deserialize Time", 0) / 1000,
                        "gc": tm.get("JVM GC Time", 0) / 1000,
                        "sched": 0,
                        "fetch": (tm.get("Shuffle Read Metrics") or {}).get(
                            "Fetch Wait Time", 0
                        )
                        / 1000,
                    }
                )
    for sid in sorted(stage_info):
        info = stage_info[sid]
        if info["dur"] < 0.5:
            continue
        tasks = sorted(stage_tasks.get(sid, []), key=lambda t: -t["dur"])
        print(f"\nstage {sid}: {info['dur']:.2f}s, {info['ntasks']} tasks  {info['name']}")
        base = min((t["launch"] for t in stage_tasks.get(sid, [])), default=0)
        for t in tasks[:8]:
            print(
                f"  dur {t['dur']:6.2f} run {t['run']:6.2f} cpu {t['cpu']:6.2f} "
                f"deser {t['deser']:5.2f} gc {t['gc']:5.2f} fetch {t['fetch']:5.2f} "
                f"launch+{(t['launch']-base)/1000:5.2f}"
            )


if __name__ == "__main__":
    main()
