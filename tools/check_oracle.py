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
from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

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


def _gating_dtype_drift(scols: list[str], skinds: list[str], okinds: list[str],
                        sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Dtype drifts that must FAIL, not just annotate (VERDICT r8 item 2).

    The driver's value hash is representation-sensitive: an object column
    carrying decimal.Decimal on one engine vs a numeric dtype on the other
    hashed differently remotely while the local canonicalizer masked it
    (q_table_checksum, r8's one red row). Gate exactly that class: object
    vs non-object drift where the object cells are Decimal. The benign
    int64<->float64 NaN-promotion and int-width drift stay tolerated.
    """
    from decimal import Decimal  # noqa: PLC0415

    bad = []
    for c, sk, ok in zip(scols, skinds, okinds):
        if sk == ok or "object" not in (sk, ok):
            continue  # int64<->float64 NaN promotion etc. stays a note
        obj_frame = sdf if sk == "object" else odf
        nn = obj_frame[c].dropna()
        if len(nn) and isinstance(nn.iloc[0], Decimal):
            bad.append(f"{c}: {sk} vs {ok} (Decimal objects — driver-hash-unstable)")
    return bad


def main() -> int:
    args = sys.argv[1:]
    flags = [a for a in args if a.startswith("-")]
    if flags:
        # VERDICT r8 item 3: an unrecognized flag used to become a
        # query-name filter matching nothing -> "ALL OK" over zero
        # comparisons. Hard-error instead.
        print(f"ERROR: unrecognized flags {flags} (usage: check_oracle.py [sf_dir] [query ...])")
        return 2
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = set(a for a in args if "/" not in a)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("check-oracle")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query name(s) {sorted(unknown)} — not in the registry")
        return 2

    n_fail = 0
    n_compared = 0
    n_rows_only = 0
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
            # House rule (VERDICT r8): no raw DecimalType above precision
            # 18 in any registry output — Spark hands the driver
            # decimal.Decimal objects where DuckDB hands float64/int64,
            # and the driver's value hash is representation-sensitive
            # (q_table_checksum went red remotely on values that matched).
            # Precision <= 18 stays allowed: both engines deliver those
            # via the same float64/object path the canonicalizer handles.
            wide_dec = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, DecimalType) and f.dataType.precision > 18
            ]
            if wide_dec:
                print(
                    f"FAIL  {name}: wide-decimal output columns {wide_dec} "
                    "(precision > 18 — cast to STRING; driver-hash-unstable)"
                )
                n_fail += 1
                continue
            sdf = df.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            n_compared += 1
            n_rows_only += 1
            print(f"ok?   {name}: rows-only ({len(sdf)} rows, {t_spark:.1f}s) — no oracle")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        n_compared += 1
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
            gating = _gating_dtype_drift(scols, skinds, okinds, sdf, odf)
            if gating:
                status.append(f"dtype drift (gating): {gating}")
            else:
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
    if only and n_fail == 0 and n_compared < len(only):
        # A filter that silently matched fewer queries than asked would
        # green-light a typo'd gate; unknown names already hard-error
        # above, so this guards duplicate/overlapping filter slips.
        # Skipped when failures exist: an errored filtered query never
        # reaches n_compared, and the failure summary must stay the
        # last line (exit is already nonzero).
        print(f"ERROR: filter asked for {len(only)} queries, compared {n_compared}")
        return 2
    if n_fail == 0:
        print(f"ALL OK ({n_compared} compared, {n_rows_only} rows-only)")
    else:
        print(f"{n_fail} FAILURES ({n_compared} compared, {n_rows_only} rows-only)")
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
