"""Numeric helpers for oracle-exact aggregation.

Why decimals: the driver's correctness gate value-hashes Spark output
against DuckDB output EXACTLY. A double SUM over 60k rows is
order-dependent, and Spark's partial-aggregation order varies run to
run across 32 threads — rounding the final double cannot fully fix
that (boundary flips). Casting inputs to DECIMAL makes the sum an
exact integer computation in BOTH engines: order-independent,
engine-independent, hash-stable. The final cast back to double is a
single correctly-rounded conversion, identical everywhere.

At 100 TB the same reasoning holds harder (more partitions = more
reorder freedom), and decimal aggregation stays inside Tungsten
codegen (no Python).

The DuckDB oracle must mirror the same casts:
    Spark  : F.sum(dec("x")).cast("double")
    DuckDB : CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DECIMAL(18,2): ample for per-row money/qty values while keeping
# multiplication exact in both engines AND forcing DuckDB into int128
# storage (int64-backed DECIMAL(<=18) overflows on the scaled product):
# (18,2)*(8,6) -> Spark (27,8) / DuckDB (26,8); *(8,6) again ->
# Spark (36,14) / DuckDB (34,14) — all < precision 38, so no scale
# truncation anywhere: bit-exact, order-independent sums.
MONEY = "decimal(19,2)"


def dec(col: str | Column, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def money_sum(expr: Column, alias: str) -> Column:
    """Exact decimal sum presented as double (hash-stable both engines).

    The sum is first reduced to DECIMAL(38,2): DuckDB's decimal->double
    cast is only correctly rounded when the unscaled value fits 2^53
    (fuzz-verified, 20k samples), so we drop scale before the cast.
    Oracle mirror: CAST(CAST(SUM(...) AS DECIMAL(38,2)) AS DOUBLE).
    """
    return F.sum(expr).cast("decimal(38,2)").cast("double").alias(alias)


def avg_exact(expr: Column, alias: str) -> Column:
    """Order-independent average: exact decimal sum -> scale-6 decimal
    -> double -> one division by count (both engines correctly round
    each step identically).
    Oracle mirror:
        CAST(CAST(SUM(...) AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*)
    """
    return (
        F.sum(expr).cast("decimal(38,6)").cast("double") / F.count(F.lit(1))
    ).alias(alias)
