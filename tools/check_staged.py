"""Oracle gate for STAGED registry entries (every ``registry/
r*_staged.py`` module, registered or not), over ANY data directory.

The standing pytest gate (tests/test_r8_staged_oracles.py) pins the
staged entries at sf0.001 on every test run; this tool runs the same
driver-exact comparison at the bigger SFs and on the degenerate
replicas that ``tools/robustness_sweep.py`` builds for the registered
set — so a staged entry carries the full evidence trail BEFORE the
round that registers it.

Usage:
    python tools/check_staged.py [sf_dir] [query ...]
    python tools/check_staged.py --replica empty|nulltext|consttext|skew [query ...]

``--replica`` builds the named adversarial replica of sf0.001 into a
temp dir (same builders as robustness_sweep) and gates over it.
"""

from __future__ import annotations

import sys
import tempfile
import time

import duckdb
from pyspark.sql.types import ArrayType, MapType, StructType

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from check_oracle import canon  # noqa: E402
from robustness_sweep import (  # noqa: E402
    EMPTY_SKIP,
    build_consttext,
    build_empty,
    build_nulltext,
    build_skew,
)

from python_mapreduce_spark.registry.r8_staged import QUERIES as R8_QUERIES  # noqa: E402
from python_mapreduce_spark.registry.r9_staged import QUERIES as R9_QUERIES  # noqa: E402
from python_mapreduce_spark.registry.r10_staged import QUERIES as R10_QUERIES  # noqa: E402
from python_mapreduce_spark.session import get_spark  # noqa: E402
from python_mapreduce_spark.sources.readers import TABLES  # noqa: E402

QUERIES = {**R8_QUERIES, **R9_QUERIES, **R10_QUERIES}

BUILDERS = {
    "empty": build_empty,
    "nulltext": build_nulltext,
    "consttext": build_consttext,
    "skew": build_skew,
}


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    replica = None
    if args and args[0] == "--replica":
        replica = args[1]
        args = args[2:]
        tmp = tempfile.mkdtemp(prefix=f"staged_{replica}_")
        BUILDERS[replica](tmp)
        sf_dir = tmp
    elif args and "/" in args[0]:
        sf_dir = args[0]
        args = args[1:]
    only = set(args)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("check-staged")
    n_fail = 0
    for name, q in QUERIES.items():
        if only and name not in only:
            continue
        if replica == "empty" and name in EMPTY_SKIP:
            print(f"skip  {name}: engine-semantics divergence on EMPTY (documented)")
            continue
        t0 = time.time()
        try:
            df = q.fn(spark, sf_dir)
            complex_cols = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if complex_cols and q.sql is not None:
                print(f"FAIL  {name}: driver-unhashable complex output columns {complex_cols}")
                n_fail += 1
                continue
            sdf = df.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if q.sql is None:
            print(f"ok?   {name}: rows-only ({len(sdf)} rows, {t_spark:.1f}s) — no oracle")
            continue
        try:
            odf = con.sql(q.sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        scols, skinds, shash = canon(sdf)
        ocols, okinds, ohash = canon(odf)
        status = []
        if len(sdf) != len(odf):
            status.append(f"rowcount {len(sdf)} vs {len(odf)}")
        if scols != ocols:
            status.append(f"columns {scols} vs {ocols}")
        elif shash != ohash:
            status.append("value-hash mismatch")
        if skinds != okinds and not status:
            status.append(f"DTYPE-ONLY {list(zip(scols, skinds, okinds))}")
        if status and not status[0].startswith("DTYPE"):
            n_fail += 1
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            note = f" [{status[0]}]" if status else ""
            print(f"OK    {name}: {len(sdf)} rows, {t_spark:.1f}s{note}")
    print("ALL OK" if n_fail == 0 else f"{n_fail} FAILURES")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
