"""Cross-engine-exact arithmetic helpers.

The driver's correctness gate value-hashes Spark results against DuckDB
(BASELINE.md).  Raw ``double`` aggregation is order-dependent (parallel
sums differ in final ULPs between engines), so every money/measure
aggregate goes through fixed-point decimal:

    cast operand → DECIMAL (exact: the fixtures are cents-valued,
    FIXTURES.md) → aggregate exactly → cast the final scalar to DOUBLE.

Both engines convert the identical decimal to the identical double, so
results are bit-exact regardless of partitioning / evaluation order —
this also makes results *stable across cluster sizes*, which matters for
reproducible pipelines at 100 TB, not just for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: enough integer digits for 100 TB-scale sums of cents-valued measures
MONEY = "decimal(18,2)"
RATE = "decimal(18,2)"  # discount / tax, 2-decimal rates

#: narrow variants for multi-factor arithmetic chains such as
#: ``price * (1 - disc) * (1 + tax)``: decimal multiplication grows
#: precision as p1+p2+1, and exactness (identical in Spark and DuckDB)
#: holds only while every intermediate stays within precision 38.
#: (12,2)·(5,2)·(5,2) → (24,6) fits; starting from (18,2) the second
#: product would exceed 38 and both engines would round — differently.
#: Single source of truth: operators must import these, never redefine.
MONEY_ARITH = "decimal(12,2)"
RATE_ARITH = "decimal(4,2)"


def dec(col: Column | str, typ: str = MONEY) -> Column:
    return F.col(col).cast(typ) if isinstance(col, str) else col.cast(typ)


def sum_exact(col: Column | str, typ: str = MONEY) -> Column:
    """Order-independent exact sum, surfaced as double."""
    return F.sum(dec(col, typ)).cast("double")


def avg_exact(col: Column | str, typ: str = MONEY) -> Column:
    """Average as one IEEE double division of an exact decimal sum by the
    count — a single deterministic float op, identical in both engines."""
    c = dec(col, typ)
    return F.sum(c).cast("double") / F.count(c)


def sql_sum_exact(expr: str, typ: str = MONEY) -> str:
    return f"CAST(SUM(CAST({expr} AS {typ.upper()})) AS DOUBLE)"


def sql_avg_exact(expr: str, typ: str = MONEY) -> str:
    t = typ.upper()
    return (
        f"(CAST(SUM(CAST({expr} AS {t})) AS DOUBLE)"
        f" / COUNT(CAST({expr} AS {t})))"
    )
