"""Cross-engine determinism helpers (Spark ↔ DuckDB oracle).

The driver compares query results by row-count + schema + order-insensitive
value hash. Floating-point aggregates are the hazard: Spark's partial
aggregation sums doubles in a different order than DuckDB, so raw
``SUM(double)`` can differ in the last ulps — enough to flip a hash.

Policy:
  * **Sums of doubles** → cast inputs to ``DECIMAL(20,6)`` first. Decimal
    addition is exact and associative, so the result is bit-identical on
    both engines regardless of partial-agg order. Final cast to
    ``DECIMAL(38,6)`` so the result types also match (Spark widens sums to
    p+10, DuckDB to 38).
  * **Averages / scalar float expressions** → ``ROUND(x, s)`` then cast to
    ``DECIMAL(18,s)``. Rounding error from summation order is orders of
    magnitude below the rounding grid, and the decimal cast removes any
    double-representation bit noise.
  * **Counts** → BIGINT on both engines natively; DuckDB ``SUM(int)``
    returns HUGEINT, so oracle SQL must ``CAST(... AS BIGINT)``.
  * **Timestamps** → compare as ``unix_micros`` bigints (Spark) /
    ``epoch_us`` (DuckDB), or format as strings; never raw timestamps
    (session-TZ vs naive semantics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SUM_DECIMAL_IN = "decimal(20,6)"
SUM_DECIMAL_OUT = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    """Exact, order-independent sum of a double column (see module doc).

    Oracle SQL shape: ``CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DECIMAL(38,6))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(SUM_DECIMAL_IN)).cast(SUM_DECIMAL_OUT)


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(20,6))) AS DECIMAL(38,6))"


def davg(col: Column | str, scale: int = 4) -> Column:
    """Average rounded to ``scale`` and cast to decimal for bit-stability.

    Oracle SQL shape: ``CAST(ROUND(AVG(x), s) AS DECIMAL(18,s))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.avg(c), scale).cast(f"decimal(18,{scale})")


def sql_davg(expr: str, scale: int = 4) -> str:
    return f"CAST(ROUND(AVG({expr}), {scale}) AS DECIMAL(18,{scale}))"


def dround(col: Column | str, scale: int = 4) -> Column:
    """Round a scalar double expression and cast to decimal.

    Oracle SQL shape: ``CAST(ROUND(x, s) AS DECIMAL(18,s))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale).cast(f"decimal(18,{scale})")


def sql_dround(expr: str, scale: int = 4) -> str:
    return f"CAST(ROUND({expr}, {scale}) AS DECIMAL(18,{scale}))"


def ts_micros(col: Column | str) -> Column:
    """Timestamp → epoch microseconds (bigint). Oracle: ``epoch_us(ts)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c)


def to_date_col(col: Column | str) -> Column:
    """Date-valued timestamp → DATE (testdata stores dates as timestamps)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c)
