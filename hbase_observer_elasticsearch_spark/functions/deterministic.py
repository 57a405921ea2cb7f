"""Order-independent (engine-portable) aggregates over doubles.

Double addition is non-associative; a parallel SUM over doubles is
nondeterministic across partitionings and disagrees between engines in the
last ulp.  Casting each operand to an exact DECIMAL before summing makes
the aggregate exact and therefore order-independent, at ~no cost (decimal
sums stay in whole-stage codegen on the JVM).  The final cast back to
DOUBLE is exact for all magnitudes in the fixtures.

This is also the right call at 100 TB: a deterministic aggregate means a
re-run of a failed stage (or an AQE re-plan) cannot change the answer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 digits / scale 6 handles |x| < 1e12 with 6 fractional digits — all
# fixture measures (prices ~1e5, quantities ~1e2, discounts ~1e0) fit.
_DEC = "decimal(18,6)"


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(_DEC)


def dsum(col: Column | str) -> Column:
    """Deterministic SUM over a double column → DOUBLE."""
    return F.sum(dec(col)).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic AVG: exact decimal sum / count, divided as doubles."""
    return F.sum(dec(col)).cast("double") / F.count(F.col(col) if isinstance(col, str) else col)


def dsum_expr(col: Column) -> Column:
    """Deterministic SUM over an arbitrary double-valued expression."""
    return F.sum(col.cast(_DEC)).cast("double")


# SQL-side twins (DuckDB dialect ≡ ANSI here), for oracle strings.
def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr}))"
