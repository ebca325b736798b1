"""Engine-portable money rounding.

The reference rounds money to 2dp (F9, silver_funcs.py:30-31). Spark's
round() is BigDecimal HALF_UP over the exact decimal expansion of the
double, while DuckDB's round() goes through libm — at half-cent boundaries
(x.xx5) they disagree on the same input double. Since the correctness gate
hash-compares values cell-for-cell, every rounded output instead uses the
explicit formula

    floor(x * 10^d + 0.5) / 10^d

written identically in the Spark plan and the oracle SQL: both engines then
execute the same IEEE-754 operations on the same input and produce
bit-identical results. (Half-up toward +inf for negatives — acceptable and
consistent, documented divergence from BigDecimal HALF_UP away-from-zero.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hround(c: Column | str, digits: int = 2) -> Column:
    """floor(c * 10^digits + 0.5) / 10^digits, as a double."""
    if isinstance(c, str):
        c = F.col(c)
    p = 10 ** digits
    return (F.floor(c * F.lit(float(p)) + F.lit(0.5)) / F.lit(float(p))).cast("double")


def hround_sql(expr: str, digits: int = 2) -> str:
    """The identical formula as DuckDB SQL text."""
    p = 10 ** digits
    return f"(floor(({expr}) * {p}.0 + 0.5) / {p}.0)"
