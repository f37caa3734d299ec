"""Scalar/aggregate helpers shared by the query surface.

Two concerns:

1. Reference scalar parity (SURVEY §2.8): surrogate keys via
   ``md5(concat_ws('|', ...))`` (reference dbt/models/analytics/
   dim_location.sql:10), ISO day-of-week (dim_date.sql:9 uses
   ``extract(isodow ...)`` — Spark's ``dayofweek`` anchors Sunday=1, so
   we re-anchor to ISO Monday=1).

2. Oracle-stable floating-point aggregation. Summing doubles is
   order-dependent; Spark and DuckDB reduce partitions in different
   orders, so ``SUM(double)`` differs in final ulps across engines —
   and across cluster layouts, which matters for reproducibility at
   1000 executors just as much as for the driver's value-hash gate.

   Strategy: cast the BASE columns to decimal (the testdata's doubles
   are exact 2-decimal values, so double->decimal at scale>=2 rounds
   identically in any IEEE-754 engine), do arithmetic and the SUM in
   exact decimal (order-independent), and cast the final result back
   to double. Products are formed from decimal inputs — never cast a
   double *product* to decimal (Spark rounds via the shortest-repr
   string, DuckDB via the scaled binary value; they disagree near
   decimal midpoints).

   Precision budget: keep multiplication results <= DECIMAL(38,...) in
   BOTH engines (Spark: p1+p2+1; DuckDB: w1+w2). dec2 (15,2) * dec4
   (9,4) twice -> (33,10): safe everywhere, and scale 10 retains
   exactness for price*(1-disc)*(1+tax) (2+2+2 decimal digits).

   Integer bucketing trap (found via e25): DuckDB parses a ``100``
   divisor next to a DOUBLE as DECIMAL, its ``//`` on that operand
   pair is PLAIN division, and its double->BIGINT CAST ROUNDS — so
   ``CAST(value // 100 AS BIGINT)`` buckets 50..99 into 1, not 0.
   Always write oracle bucketing as ``CAST(FLOOR(x / y) AS BIGINT)``
   (mirrors Spark's ``F.floor``; both floor, then the cast is exact).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Plain-column accumulator: 23 integer digits of headroom — enough for
# a 100 TB table of 1e12-valued rows.
_DEC_SUM = "decimal(27,4)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec2(col: Column | str) -> Column:
    """Price-like double -> exact DECIMAL(15,2)."""
    return _c(col).cast("decimal(15,2)")


def dec4(col: Column | str) -> Column:
    """Fraction-like double (discount/tax/rate) -> exact DECIMAL(9,4)."""
    return _c(col).cast("decimal(9,4)")


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent sum of a plain double column -> double."""
    out = F.sum(_c(col).cast(_DEC_SUM)).cast("double")
    return out.alias(alias) if alias else out


def dsum_expr(expr: Column, alias: str | None = None) -> Column:
    """Order-independent sum of an already-decimal expression -> double.

    The sum is rescaled to scale 4 BEFORE the double cast: a decimal
    whose scaled integer fits in 2^53 converts to double with one
    correctly-rounded operation in both Spark and DuckDB; casting a
    high-scale decimal directly can differ by 1 ulp across engines
    (DuckDB divides int128 by 10^scale — two roundings). The rescale
    must be ROUND (half-away-from-zero in both engines), not a decimal
    cast — DuckDB truncates on decimal scale-down casts.
    """
    out = F.round(F.sum(expr), 4).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean of a double column -> double."""
    c = _c(col)
    out = F.sum(c.cast(_DEC_SUM)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


# --- DuckDB oracle mirrors (textual SQL for the driver's cross-check) ---


def oracle_dec2(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(15,2))"


def oracle_dec4(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(9,4))"


def oracle_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,4))) AS DOUBLE)"


def oracle_dsum_expr(expr: str) -> str:
    return f"CAST(ROUND(SUM({expr}), 4) AS DOUBLE)"


def oracle_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,4))) AS DOUBLE) / COUNT({expr})"


def surrogate_key(*cols: Column | str) -> Column:
    """``md5(concat_ws('|', ...))`` surrogate key.

    Mirrors reference dbt/models/analytics/dim_location.sql:10 /
    fact_weather_hourly.sql:18. Callers must pre-format float columns
    deterministically (e.g. ``format_number``/string source columns) —
    SURVEY §7 risk 1 — so the key text is engine-independent.
    """
    parts = [_c(c).cast("string") for c in cols]
    return F.md5(F.concat_ws("|", *parts))


def iso_dow(col: Column | str) -> Column:
    """ISO day-of-week, Monday=1..Sunday=7 (Postgres ``isodow``).

    Spark's ``dayofweek`` is Sunday=1; re-anchor per SURVEY §2.8 X4.
    """
    return (F.dayofweek(_c(col)) + F.lit(5)) % 7 + 1
