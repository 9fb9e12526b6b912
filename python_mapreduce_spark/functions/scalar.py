"""Engine scalar helpers.

``dround`` exists because engines disagree on ROUND over doubles: Spark
rounds the shortest decimal repr (BigDecimal.valueOf) HALF_UP while
DuckDB/C round the binary value, so `round(37081.644999...97, 2)` differs
by a cent between them. ``floor(x * 10^s + 0.5) / 10^s`` is pure IEEE
double arithmetic — identical bit-for-bit in any engine — which makes
query outputs hash-comparable across Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column | str, scale: int = 2) -> Column:
    """Deterministic cross-engine rounding of a double column.

    Half-up toward +inf at ``scale`` decimals via IEEE-exact ops only.
    """
    m = 10**scale
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(float(m)) + F.lit(0.5)) / F.lit(float(m))


def sql_dround(expr: str, scale: int = 2) -> str:
    """The ANSI-SQL twin of :func:`dround` (same IEEE ops in DuckDB)."""
    m = float(10**scale)
    return f"floor(({expr}) * {m} + 0.5) / {m}"


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent rounded SUM for money-like doubles.

    Products of 2-decimal inputs are exact 4-6-decimal decimals, so their
    float sums land EXACTLY on the half-cent boundary ~1% of the time —
    and then Spark's partition-order-dependent summation vs the oracle's
    sequential sum flips the rounded cent nondeterministically. Summing
    in DECIMAL(18,6) is exact and associative: same result at any
    parallelism, in any engine. Cast back to double, then dround.
    """
    return dround(F.sum(col.cast("decimal(18,6)")).cast("double"), scale)


def sql_dsum(expr: str, scale: int = 2) -> str:
    """The ANSI-SQL twin of :func:`dsum`."""
    return sql_dround(f"CAST(sum(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)", scale)


def tokenize(col: Column | str, pattern: str = "[a-z]+") -> Column:
    """Lowercase + extract word tokens (shared by text/dedup operators).

    ``regexp_extract_all`` exists with identical RE2-class semantics in
    Spark and DuckDB, so token streams match across engines.

    NULL text tokenizes as the EMPTY document (zero tokens), not NULL:
    a NULL array silently drops rows through explode/posexplode and (on
    legacy-conf builds) poisons size() aggregates with -1. Oracles
    encode the same rule via ``coalesce(text, '')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.regexp_extract_all(F.lower(c), F.lit(pattern), F.lit(0)),
        F.array().cast("array<string>"),
    )


def normal_sf_approx(z: Column) -> Column:
    """Upper-tail normal survival approximation for z >= 0:
    P(Z > z) ~= exp(-0.717*z - 0.416*z^2) (Lin 1989, accurate to ~1%
    relative in the screening range) — the erf-free p-value both
    engines can evaluate with the same elementary ops. A SCREENING
    p-value: quantize it (dround 8) before any cross-engine comparison
    or step-up test, since exp() is the one transcendental in the
    expression (same determinism class as the entropy queries' log)."""
    return F.exp(F.lit(-0.717) * z - F.lit(0.416) * z * z)


def sql_normal_sf_approx(expr: str) -> str:
    """The ANSI-SQL twin of :func:`normal_sf_approx`."""
    return f"exp(-0.717 * ({expr}) - 0.416 * ({expr}) * ({expr}))"
