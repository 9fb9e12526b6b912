"""Shared multi-point near-linearity gate for the scaling harnesses.

Round 4 measured one decade (sf0.01 -> sf0.1); round 5 adds a second
(sf0.1 -> the tools/make_scale_corpus.py synthetic decade), so the
harness core is generalized: measure every dir, then gate EVERY adjacent
pair — each metric's growth ratio must stay within 2x that pair's
size ratio. Superlinear (quadratic) growth compounds decade over
decade, so two adjacent-pair gates bound it far tighter than one.
"""

from __future__ import annotations

from collections.abc import Callable


def run_gates(
    dirs: list[str],
    measure: Callable[[str], dict],
    size_key: str,
    metric_keys: tuple[str, ...],
    info_keys: tuple[str, ...] = (),
) -> int:
    """Measure each dir, print per-pair gate tables, return exit code.

    ``info_keys`` appear in the table (marked "info") but are exempt
    from the 2R gate — for output-mass metrics that measure the DATA's
    duplication statistics rather than the plan's work.
    """
    results = [measure(d) for d in dirs]

    print("| metric | " + " | ".join(dirs) + " |")
    print("|---|" + "---|" * len(dirs))
    for key in (size_key, *metric_keys):
        print(f"| {key} | " + " | ".join(str(r[key]) for r in results) + " |")
    for key in info_keys:
        print(f"| {key} (info) | " + " | ".join(str(r[key]) for r in results) + " |")

    failures: list[str] = []
    for (da, a), (db, b) in zip(zip(dirs, results), zip(dirs[1:], results[1:])):
        r = b[size_key] / a[size_key]
        print(f"\npair {da} -> {db}: size ratio R = {r:.2f}x, linear gate = 2R = {2 * r:.2f}x")
        for key in metric_keys:
            ratio = (b[key] / a[key]) if a[key] else float("inf")
            ok = ratio <= 2 * r
            print(f"  {key}: {ratio:.2f}x {'ok' if ok else 'FAIL'}")
            if not ok:
                failures.append(f"{da}->{db}:{key}")

    if failures:
        print(f"\nSUPERLINEAR GROWTH in: {failures}")
        return 1
    print(f"\nNEAR-LINEAR across {len(dirs)} points: all adjacent-pair ratios within 2x of size ratio")
    return 0
