"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, (name-sorted) schema, and an order-insensitive value
hash. Queries with no oracle get a rows-only check.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql.types import ArrayType, MapType, StructType

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from python_mapreduce_spark.session import get_spark  # noqa: E402
from python_mapreduce_spark.sources.readers import TABLES  # noqa: E402


def _cell(v) -> str:
    """Canonical string for one value (engine-neutral)."""
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if f == 0:
            return "0.0"
        # Integral floats render as ints: a nullable BIGINT column is
        # NaN-promoted to float64 by pandas on whichever side carries a
        # NULL, turning 26 into 26.0 on one engine only. Dtype drift is
        # still reported separately (DTYPE-ONLY).
        if f.is_integer() and abs(f) < 2**53:
            return str(int(f))
        return repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


def canon(df: pd.DataFrame) -> tuple[list[str], list[str], str]:
    """(sorted col names, dtype kinds, order-insensitive value hash)."""
    cols = sorted(df.columns)
    rows = sorted(
        "|".join(_cell(v) for v in rec) for rec in df[cols].itertuples(index=False, name=None)
    )
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    kinds = [str(df[c].dtype) for c in cols]
    return cols, kinds, h


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = set(a for a in args if "/" not in a)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("check-oracle")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            # House rule (VERDICT r5): no top-level array/map/struct
            # columns in registry outputs — the driver's canonicalizer
            # (pandas sort_values over all columns) dies on ndarray
            # cells even when the values are right (q_inverted_index,
            # CORRECTNESS_r05). Enforce the driver contract here so a
            # nested-output query can never reach the driver green
            # locally and red remotely.
            complex_cols = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if complex_cols and name in oracles:
                print(f"FAIL  {name}: driver-unhashable complex output columns {complex_cols}")
                n_fail += 1
                continue
            sdf = df.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(sdf)} rows, {t_spark:.1f}s) — no oracle")
            continue
        try:
            odf = con.sql(oracles[name]).df()
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
            if scols == ocols and len(sdf) and len(odf):
                merged = _diff(sdf[scols], odf[scols])
                if merged is not None:
                    print(merged)
        else:
            note = f" [{status[0]}]" if status else ""
            print(f"OK    {name}: {len(sdf)} rows, {t_spark:.1f}s{note}")
    print("ALL OK" if n_fail == 0 else f"{n_fail} FAILURES")
    return 1 if n_fail else 0


def _diff(a: pd.DataFrame, b: pd.DataFrame, n: int = 4) -> str | None:
    try:
        ka = sorted("|".join(_cell(v) for v in r) for r in a.itertuples(index=False, name=None))
        kb = sorted("|".join(_cell(v) for v in r) for r in b.itertuples(index=False, name=None))
        only_a = [r for r in ka if r not in set(kb)][:n]
        only_b = [r for r in kb if r not in set(ka)][:n]
        return f"      spark-only: {only_a}\n      duckdb-only: {only_b}"
    except Exception:  # noqa: BLE001
        return None


if __name__ == "__main__":
    sys.exit(main())
