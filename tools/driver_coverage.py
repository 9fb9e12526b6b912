"""Driver-coverage ledger: which registry queries have hard driver rows.

Joins every ``CORRECTNESS_r*.json`` in the repo root against
``registry.all_queries()`` (name-keyed, latest round wins) and prints one
line per query:

    <latest-round|NEVER>  <green|RED>  <hash|rows-only|->  <name>

plus a summary. Exit code 1 if any query's latest driver row is red,
else 0 — NEVER rows are a rotation concern, not a failure.

Usage:  python tools/driver_coverage.py [--never-only] [--plan N]

``--plan N`` additionally prints a suggested DRIVER_PRIORITY head:
RED queries first (a red driver row defeats the whole gate's purpose —
it must be rechecked next round, not wait out the staleness queue;
VERDICT r9 item 1), then the NEVER queries (in current registry
order), padded to N with the stalest checked queries — making each
round's rotation mechanical. ``--plan-full`` prints the complete
reordered DRIVER_PRIORITY (red + never + staleness-ascending).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_driver_rows() -> dict[str, tuple[int, dict]]:
    """name -> (latest round with a row, that row)."""
    rows: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            prev = rows.get(name)
            if prev is None or rnd >= prev[0]:
                rows[name] = (rnd, row)
    return rows


def row_status(row: dict) -> tuple[bool, str]:
    """(green?, kind) where kind is 'hash' or 'rows-only'."""
    if row.get("err") == "no_oracle":
        # Declared rows-only (sql=None): driver records only the Spark row
        # count; green = the query ran and produced rows.
        n = row.get("spark_rows")
        return isinstance(n, int) and n >= 0, "rows-only"
    if row.get("err"):
        return False, "-"
    if row.get("hash_match") is True:
        return bool(row.get("rows_match") and row.get("schema_match")), "hash"
    return False, "hash" if "hash_match" in row else "-"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--never-only", action="store_true")
    ap.add_argument("--plan", type=int, default=0, metavar="N")
    ap.add_argument("--plan-full", action="store_true")
    args = ap.parse_args()
    if args.plan_full:
        args.plan = args.plan or 10**9

    from python_mapreduce_spark.registry import all_queries

    names = list(all_queries().keys())
    rows = load_driver_rows()

    never: list[str] = []
    red: list[str] = []
    by_round: dict[int, int] = {}
    for name in names:
        hit = rows.get(name)
        if hit is None:
            never.append(name)
            if not args.plan:
                print(f"NEVER  -      -          {name}")
            continue
        rnd, row = hit
        green, kind = row_status(row)
        by_round[rnd] = by_round.get(rnd, 0) + 1
        if not green:
            red.append(name)
        if not args.never_only and not args.plan:
            print(f"r{rnd:02d}    {'green' if green else 'RED  '}  {kind:<9}  {name}")

    orphans = sorted(set(rows) - set(names))

    print(
        f"\n# registry={len(names)} checked={len(names) - len(never)} "
        f"never={len(never)} red={len(red)} "
        f"by_round={dict(sorted(by_round.items()))}"
        + (f" orphan_driver_rows={orphans}" if orphans else ""),
        file=sys.stderr,
    )

    if args.plan:
        # Red rows jump the queue (VERDICT r9): a fixed-but-red query at
        # staleness position ~270 would otherwise wait ~6 rounds for the
        # driver to re-observe the fix.
        stale = sorted(
            (n for n in names if n in rows and n not in red),
            key=lambda n: (rows[n][0], names.index(n)),
        )
        head = (red + never + stale)[: args.plan]
        print(f"# suggested DRIVER_PRIORITY head ({args.plan} slots):")
        for n in head:
            print(f'    "{n}",')
        rest = never[args.plan :]
        if rest:
            print(f"# NEVER overflow past the window ({len(rest)}):")
            for n in rest:
                print(f'    "{n}",')

    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
