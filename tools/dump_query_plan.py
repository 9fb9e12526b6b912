"""Dump explain("formatted") for named registry queries to files.

Usage: python tools/dump_query_plan.py OUTDIR SUFFIX q_a q_b ... [--sf DIR]

Writes OUTDIR/<query>_<SUFFIX>.txt. Building a DataFrame executes any
eager localCheckpoint in its construction path, so this reflects the
real plan the bench action sees (the shallow tail after the last cut).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_mapreduce_spark.registry import all_queries  # noqa: E402
from python_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--sf")]
    sf = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    outdir, suffix, names = args[0], args[1], args[2:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_query_plan")
    registry = all_queries()
    for name in names:
        df = registry[name].fn(spark, sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)", flush=True)


if __name__ == "__main__":
    main()
