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


def tokenize(col: Column | str, pattern: str = "[a-z]+") -> Column:
    """Lowercase + extract word tokens (shared by text/dedup operators).

    ``regexp_extract_all`` exists with identical RE2-class semantics in
    Spark and DuckDB, so token streams match across engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(pattern), F.lit(0))
