"""Per-query perf probe for the optimization rounds.

Times registry queries exactly the way bench.py does (tiny-SF warmup,
best-of-N ``.count()``), and optionally:

  * ``--noop``    also times the noop-sink action (guide §1.4) so the
                  computation is measured with every column materialized;
  * ``--stages``  enables the Spark event log for the session and, after
                  each query, prints a per-stage breakdown (duration,
                  task count, name) attributed via job descriptions —
                  the stand-in for the UI's stage page (UI is off here);
  * ``--plan DIR``  writes ``DIR/<query>.txt`` with explain("formatted").

Usage:
  python tools/perf_probe.py q_hits q_kcore [--sf /root/testdata/sf0.1]
         [--n 3] [--noop] [--stages] [--plan plans/r10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_mapreduce_spark.registry import all_queries  # noqa: E402
from python_mapreduce_spark.session import get_spark  # noqa: E402

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def _run(df, noop: bool) -> None:
    if noop:
        df.write.format("noop").mode("overwrite").save()
    else:
        df.count()


def _parse_event_log(log_dir: str) -> list[dict]:
    """Read every event file in log_dir, return completed-stage records."""
    stages: list[dict] = []
    job_desc: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    paths: list[str] = []
    for root, _dirs, files in os.walk(log_dir):
        # Spark 4 rolling event logs live in eventlog_v2_<app>/ dirs.
        paths.extend(os.path.join(root, f) for f in files if not f.startswith("."))
    for path in sorted(paths):
        if path.endswith(".zstd"):
            import subprocess  # noqa: PLC0415

            text = subprocess.run(
                ["zstd", "-dc", path], capture_output=True, text=True, check=False
            ).stdout
            lines = text.splitlines()
        else:
            with open(path, errors="replace") as f:
                lines = f.read().splitlines()
        if True:
            for line in lines:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                if not isinstance(ev, dict):
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )
                    job_desc[ev["Job ID"]] = desc
                    for si in ev.get("Stage Infos", []):
                        stage_job[si["Stage ID"]] = ev["Job ID"]
                elif kind == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    if sub is None or comp is None:
                        continue
                    jid = stage_job.get(si["Stage ID"], -1)
                    stages.append(
                        {
                            "stage": si["Stage ID"],
                            "job": jid,
                            "desc": job_desc.get(jid, ""),
                            "sec": (comp - sub) / 1000.0,
                            "tasks": si.get("Number of Tasks"),
                            "name": si.get("Stage Name", "")[:90],
                        }
                    )
    return stages


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--plan", default=None, help="dir for explain('formatted') dumps")
    args = ap.parse_args()

    extra = {}
    log_dir = None
    if args.stages:
        log_dir = f"/tmp/spark-events-{os.getpid()}"
        os.makedirs(log_dir, exist_ok=True)
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            # plain-text logs so the parser below can read them directly
            "spark.eventLog.compress": "false",
        }
    spark = get_spark("perf_probe", extra_conf=extra)
    registry = all_queries()

    for name in args.queries:
        q = registry[name]
        _run(q.fn(spark, WARMUP_SF_DIR), args.noop)  # warm: codegen/JIT

        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = q.fn(spark, args.sf)
            with open(os.path.join(args.plan, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

        best = float("inf")
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"{name}#run{i}")
            t0 = time.time()
            _run(q.fn(spark, args.sf), args.noop)
            dt = time.time() - t0
            best = min(best, dt)
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: best {best:.3f}s over {args.n} "
              f"({'noop' if args.noop else 'count'})", flush=True)

    if args.stages:
        spark.stop()  # flush the event log
        stages = _parse_event_log(log_dir)
        # report the LAST timed run of each query (best-effort: all runs
        # shown, caller reads the fastest block)
        for name in args.queries:
            rel = [s for s in stages if s["desc"].startswith(f"{name}#")]
            if not rel:
                continue
            print(f"\n=== {name}: stages by run ===")
            by_run: dict[str, list[dict]] = {}
            for s in rel:
                by_run.setdefault(s["desc"], []).append(s)
            for run, ss in sorted(by_run.items()):
                tot = sum(s["sec"] for s in ss)
                print(f"-- {run}: {len(ss)} stages, {tot:.2f}s stage-time")
                for s in sorted(ss, key=lambda x: -x["sec"])[:12]:
                    print(f"   {s['sec']:7.3f}s  job {s['job']:>3} "
                          f"tasks {s['tasks']:>4}  {s['name']}")


if __name__ == "__main__":
    main()
