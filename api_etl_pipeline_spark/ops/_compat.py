"""Cross-engine numeric determinism helpers.

Money columns in the testdata are true 2-decimal values stored as doubles;
their pairwise products have ≤4 (or ≤6 with tax) true decimals. Casting
the per-row double to DECIMAL with enough scale recovers the exact decimal
value on both Spark and DuckDB (the binary error ~1e-12 is far below the
0.5-ulp decimal boundary), after which SUM is exact integer arithmetic —
independent of partitioning, shuffle, and summation order. Casting the
exact decimal result back to double is also deterministic.

This is why the engine's aggregates hash-match a single-threaded DuckDB
run even at 32-way (or 1000-way) parallelism: no floating-point
order-dependence survives in any reported aggregate. NEVER round a double
whose true decimal count exceeds the rounding scale — Spark (BigDecimal
HALF_UP on the shortest repr) and DuckDB (scaled binary rounding) disagree
on exact .xx5 boundaries.

Oracle-side equivalents (DuckDB SQL):
    sum:  CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
    avg:  CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x)

Cost note (measured at sf0.1): decimal sums run ~2.7x a raw double sum;
summing unscaled longs (round(x*10^s)) would be only ~1.3x — but long
sums OVERFLOW at warehouse scale (10^10 rows x 10^9 unscaled units
exceeds int64), while Spark widens decimal sums to decimal(28,s) and
DuckDB to decimal(38,s). Exactness at any scale is worth the 2x on the
aggregate stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(expr: Column, scale: int = 4) -> Column:
    """Order-independent exact sum of a ≤`scale`-decimal money expression."""
    return F.sum(expr.cast(f"decimal(18,{scale})")).cast("double")


def davg(expr: Column, scale: int = 4) -> Column:
    """Deterministic mean: exact decimal sum, then one double division."""
    return dsum(expr, scale) / F.count(expr)
