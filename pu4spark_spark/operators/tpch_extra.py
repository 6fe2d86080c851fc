"""Remaining TPC-H query shapes (SURVEY.md §2B relational surface),
adapted to the fixture schema (no ``partsupp``, ``l_commitdate`` or
``p_container`` — the part↔supplier link is derived as
``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem``, and supply cost
is proxied by ``p_retailprice``).  Together with relational.py's
Q1/Q3/Q4/Q5/Q10/Q12/Q14/Q18 this completes the 22-query catalogue of
*shapes*: correlated scalar subqueries (Q2/Q15/Q17), fixed-predicate
aggregation (Q6), multi-directional nation joins (Q7), market-share
conditional aggregation (Q8), profit arithmetic (Q9), HAVING-vs-global-
scalar (Q11), left-join count distribution (Q13), grouped distinct
counts with NOT-IN exclusion (Q16), disjunctive pushdown (Q19),
fraction-of-group semi-join (Q20), EXISTS/NOT-EXISTS self-joins (Q21)
and anti-join + scalar subquery (Q22).

Execution discipline (same as relational.py): dimensions are
``broadcast()``; correlated subqueries become windows or 1-row
broadcast scalars (BroadcastNestedLoopJoin of a single row — the
cheapest possible plan for a global aggregate, see SURVEY.md); every
money aggregate runs through the exact-decimal helpers so results
hash-match DuckDB regardless of partitioning.  The reference has none
of this surface (it is a 404-line PU-learning wrapper,
PositiveUnlabeledLearner.scala:22-25) — these queries exist to make
the engine complete, not to mirror reference code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pu4spark_spark.functions.exact import (
    MONEY_ARITH as MONEY,
    RATE_ARITH as RATE,
    avg_exact,
    dec,
    sql_avg_exact,
    sql_sum_exact,
    sum_exact,
)
from pu4spark_spark.sources import load_table

_M = MONEY.upper()
_R = RATE.upper()

#: one exact-decimal revenue aggregate, shared by most queries below
def _revenue() -> F.Column:
    return F.sum(
        dec("l_extendedprice", MONEY) * (F.lit(1) - dec("l_discount", RATE))
    ).cast("double")


_SQL_REV = (
    f"CAST(SUM(CAST(l_extendedprice AS {_M})"
    f" * (1 - CAST(l_discount AS {_R}))) AS DOUBLE)"
)


def _link(li: DataFrame) -> DataFrame:
    """The part↔supplier association derived from shipped lineitems
    (the fixture has no partsupp table).  Distinct is map-side-combined
    on (l_partkey, l_suppkey) — output cardinality is the association
    count, far below the lineitem count."""
    return li.select("l_partkey", "l_suppkey").distinct()


_SQL_LINK = "(SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)"


# -- Q2: min-cost supplier per part (correlated scalar subquery) ---------

def q_q2_min_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) with
    the MINIMUM account balance among suppliers that ship it.  The
    correlated scalar subquery becomes a partitioned window min — one
    shuffle on p_partkey, no per-part re-scan, ties kept exactly as
    the subquery keeps them."""
    li = load_table(spark, "lineitem", sf_dir)
    part = F.broadcast(
        load_table(spark, "part", sf_dir).filter(
            (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
        )
    )
    supp = F.broadcast(load_table(spark, "supplier", sf_dir))
    nation = F.broadcast(load_table(spark, "nation", sf_dir))
    cand = (
        _link(li)
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        )
    )


SQL_Q2 = f"""
SELECT s_name, n_name, p_partkey, p_name,
       CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM part
JOIN {_SQL_LINK} link ON p_partkey = link.l_partkey
JOIN supplier ON s_suppkey = link.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_size <= 10 AND p_type = 'LARGE'
  AND s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM supplier s2 JOIN {_SQL_LINK} l2 ON s2.s_suppkey = l2.l_suppkey
    WHERE l2.l_partkey = p_partkey)
"""


# -- Q6: forecast revenue change (fixed-predicate aggregation) -----------

def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + filter + one aggregate — the canonical
    predicate-pushdown probe (every filter reaches the parquet scan;
    no shuffle at all, the partial aggregates collapse to one row).
    Discounts are compared in DECIMAL(4,2) space on both engines so
    the 0.05/0.07 boundary is exact."""
    li = load_table(spark, "lineitem", sf_dir)
    d = dec("l_discount", RATE)
    lo, hi = F.lit("0.05").cast(RATE), F.lit("0.07").cast(RATE)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (d >= lo)
            & (d <= hi)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice", MONEY) * d).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


SQL_Q6 = f"""
SELECT CAST(SUM(CAST(l_extendedprice AS {_M}) * CAST(l_discount AS {_R})) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(l_discount AS {_R}) BETWEEN CAST('0.05' AS {_R}) AND CAST('0.07' AS {_R})
  AND l_quantity < 24
"""


# -- Q7: volume shipping between two nations -----------------------------

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"


def q_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flowing between two nations in either
    direction, by supplier nation × customer nation × year.  Both
    nation dims broadcast; the only wide exchanges are the
    lineitem↔orders join and the final 3-key aggregation."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = F.broadcast(load_table(spark, "supplier", sf_dir))
    nation = load_table(spark, "nation", sf_dir)
    n1 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (F.col("supp_nation") == Q7_NATION_A) & (
        F.col("cust_nation") == Q7_NATION_B
    ) | (F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(_revenue().alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


SQL_Q7 = f"""
SELECT supp_nation, cust_nation, l_year, {_SQL_REV} AS revenue,
       COUNT(*) AS n_lines
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    AND ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
      OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


# -- Q8: national market share -------------------------------------------

Q8_NATION = "NATION_3"


def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue sold
    into ASIA, per year — conditional aggregation over a star join.
    The share is a single double division of two exact-decimal sums,
    so it is bit-identical across engines and partitionings."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, "customer", sf_dir)
    part = F.broadcast(
        load_table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    )
    supp = F.broadcast(load_table(spark, "supplier", sf_dir))
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    n_cust = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            F.col("n_nationkey").alias("c_nkey")
        )
    )
    n_supp = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    vol = dec("l_extendedprice", MONEY) * (F.lit(1) - dec("l_discount", RATE))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n_cust, F.col("c_nationkey") == F.col("c_nkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n_supp, F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == Q8_NATION, vol)).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
    )


SQL_Q8 = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CASE WHEN n1.n_name = '{Q8_NATION}'
            THEN CAST(l_extendedprice AS {_M}) * (1 - CAST(l_discount AS {_R})) END) AS DOUBLE)
       / {_SQL_REV} AS mkt_share,
       {_SQL_REV} AS total_volume
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_year
"""


# -- Q9: product-type profit by nation and year --------------------------

def q_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (supply cost proxied as 60% of p_retailprice —
    the fixture has no partsupp): profit per supplier nation per year
    for parts whose name contains 'red'.  All arithmetic stays in
    decimal until the final cast, so the profit sums are exact."""
    li = load_table(spark, "lineitem", sf_dir)
    part = F.broadcast(
        load_table(spark, "part", sf_dir).filter(F.col("p_name").contains("red"))
    )
    supp = F.broadcast(load_table(spark, "supplier", sf_dir))
    nation = F.broadcast(load_table(spark, "nation", sf_dir))
    orders = load_table(spark, "orders", sf_dir)
    amount = dec("l_extendedprice", MONEY) * (
        F.lit(1) - dec("l_discount", RATE)
    ) - F.lit("0.6").cast("decimal(2,1)") * dec("p_retailprice", MONEY) * dec(
        "l_quantity", MONEY
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


SQL_Q9 = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS {_M}) * (1 - CAST(l_discount AS {_R}))
            - CAST('0.6' AS DECIMAL(2,1)) * CAST(p_retailprice AS {_M})
              * CAST(l_quantity AS {_M})) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


# -- Q11: important parts (HAVING vs global scalar) ----------------------

Q11_NATION = "NATION_1"
#: the fixture's uniform part mix gives each of the 2000 parts an
#: average value share of 1/2000 = 0.0005; keep parts at ≥ ~1.6× that
Q11_FRACTION = "0.0008"


def q_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value (qty × retail price)
    held by one nation's suppliers, keeping parts whose value exceeds
    a FRACTION of the nation's total — the HAVING-against-global-
    scalar pattern.  The global total is a 1-row aggregate crossJoined
    in (BroadcastNestedLoopJoin of a single row), never a second scan
    of the per-part aggregate."""
    li = load_table(spark, "lineitem", sf_dir)
    supp = F.broadcast(load_table(spark, "supplier", sf_dir))
    nation = F.broadcast(
        load_table(spark, "nation", sf_dir).filter(F.col("n_name") == Q11_NATION)
    )
    part = F.broadcast(load_table(spark, "part", sf_dir))
    value = dec("l_quantity", MONEY) * dec("p_retailprice", MONEY)
    held = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("value_dec"))
    )
    total = held.agg(
        (
            F.sum("value_dec") * F.lit(Q11_FRACTION).cast("decimal(6,4)")
        ).alias("threshold")
    )
    return (
        held.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
    )


SQL_Q11 = f"""
WITH held AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS {_M}) * CAST(p_retailprice AS {_M})) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN part     ON l_partkey = p_partkey
  WHERE n_name = '{Q11_NATION}'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM held
WHERE value_dec > (SELECT SUM(value_dec) * CAST('{Q11_FRACTION}' AS DECIMAL(6,4)) FROM held)
"""


# -- Q13: customer order-count distribution ------------------------------

def q_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT join customers to their (non-urgent)
    orders, count per customer, then the distribution of those counts
    — two aggregations, the second over a key whose cardinality is the
    max order count (tiny), so the second exchange is negligible."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


SQL_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


# -- Q15: top supplier (scalar-max subquery) -----------------------------

def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, returning the
    supplier(s) achieving the maximum — the correlated view + scalar
    max.  The max is a 1-row broadcast crossJoin, and equality on a
    double produced by identical exact-decimal casts is safe."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = F.broadcast(load_table(spark, "supplier", sf_dir))
    rev = li.groupBy("l_suppkey").agg(_revenue().alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


SQL_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey, {_SQL_REV} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# -- Q16: supplier counts by part attributes with NOT-IN exclusion -------

Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 49)


def q_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size)
    excluding one brand and suppliers in deficit (NOT IN → broadcast
    anti-join; the excluded set is supplier-sized, i.e. dimension-
    small).  countDistinct is planned as two-level hash aggregation —
    no row explosion."""
    li = load_table(spark, "lineitem", sf_dir)
    part = F.broadcast(
        load_table(spark, "part", sf_dir).filter(
            (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(*Q16_SIZES)
        )
    )
    bad_supp = F.broadcast(
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        _link(li)
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_Q16 = f"""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM {_SQL_LINK} link
JOIN part ON p_partkey = link.l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# -- Q17: small-quantity-order revenue (correlated avg) ------------------

def q_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small orders — lineitems below
    20%+ of their part's average quantity (here 50%, sized to the
    fixture), for one brand of small parts.  The correlated AVG is a
    per-part aggregate joined back (two passes over the part-filtered
    lineitems, both part-pruned by the broadcast filter), never a
    per-row subquery."""
    part = F.broadcast(
        load_table(spark, "part", sf_dir).filter(
            (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10)
        )
    )
    li = load_table(spark, "lineitem", sf_dir).join(
        part, F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        avg_exact("l_quantity", MONEY).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (sum_exact("l_extendedprice", MONEY) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


SQL_Q17 = f"""
SELECT {sql_sum_exact('l_extendedprice', MONEY)} / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3' AND p_size < 10
  AND l_quantity < 0.5 * (
    SELECT {sql_avg_exact('l2.l_quantity', MONEY)}
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


# -- Q19: disjunctive predicate pushdown ---------------------------------

def q_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    both join sides.  Catalyst pushes the common `l_partkey` equi-key
    out of the disjunction (the join stays an equi-join with the OR as
    a residual filter) — the shape that degrades to a cartesian
    product in engines without disjunction normalization."""
    li = load_table(spark, "lineitem", sf_dir)
    part = F.broadcast(load_table(spark, "part", sf_dir))
    q = F.col("l_quantity")
    cases = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & q.between(1, 11)
        | (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & q.between(10, 20)
        | (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 15)
        & q.between(20, 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cases)
        .agg(_revenue().alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


SQL_Q19 = f"""
SELECT {_SQL_REV} AS revenue, COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# -- Q20: dominant shippers (fraction-of-group semi-join) ----------------

def q_q20_dominant_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted): suppliers who shipped MORE THAN HALF
    of a PROMO part's total 1996 quantity — the fraction-of-group
    filter that feeds a supplier semi-join.  Per-(part, supplier) and
    per-part totals share one shuffle ancestry; the >½ comparison is
    decimal-exact."""
    part = F.broadcast(
        load_table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    )
    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.year("l_shipdate") == 1996)
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
    )
    supp = F.broadcast(load_table(spark, "supplier", sf_dir))
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity", MONEY)).alias("q")
    )
    w = Window.partitionBy("l_partkey")
    heavy = pq.withColumn("tq", F.sum("q").over(w)).filter(
        F.col("q") * 2 > F.col("tq")
    )
    return (
        heavy.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_parts_dominated"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_parts_dominated")
    )


SQL_Q20 = f"""
WITH pq AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS {_M})) AS q
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'PROMO'
    AND EXTRACT(year FROM l_shipdate) = 1996
  GROUP BY l_partkey, l_suppkey
),
tot AS (SELECT l_partkey, SUM(q) AS tq FROM pq GROUP BY l_partkey)
SELECT s_suppkey, s_name, COUNT(*) AS n_parts_dominated
FROM pq
JOIN tot USING (l_partkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE q * 2 > tq
GROUP BY s_suppkey, s_name
"""


# -- Q21: sole-blame suppliers (EXISTS / NOT EXISTS self-joins) ----------

def q_q21_sole_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to returnflag — the fixture has no
    commit/receipt dates): per supplier, the number of multi-supplier
    orders where THEY had a returned line ('R') and no other supplier
    did.  EXISTS → semi-join, NOT EXISTS → anti-join on a non-equi
    pair condition; all three derived frames prune to (orderkey,
    suppkey) pairs before any shuffle."""
    li = load_table(spark, "lineitem", sf_dir)
    supp = F.broadcast(load_table(spark, "supplier", sf_dir))
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    r_pairs = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    multi = (
        pairs.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
        .filter(F.col("n_supp") > 1)
        .select("l_orderkey")
    )
    other_r = r_pairs.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    )
    blamed = (
        r_pairs.join(multi, "l_orderkey", "left_semi")
        .join(
            other_r,
            (F.col("l_orderkey") == F.col("o_key"))
            & (F.col("l_suppkey") != F.col("o_supp")),
            "left_anti",
        )
    )
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )


SQL_Q21 = """
WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
r_pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM r_pairs rp
JOIN supplier ON s_suppkey = rp.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM pairs p
    WHERE p.l_orderkey = rp.l_orderkey AND p.l_suppkey <> rp.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM r_pairs r2
    WHERE r2.l_orderkey = rp.l_orderkey AND r2.l_suppkey <> rp.l_suppkey)
GROUP BY s_suppkey, s_name
"""


# -- Q22: dormant high-balance customers (anti-join + scalar) ------------

Q22_DORMANT_SINCE = "2000-01-01"


def q_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and NO RECENT orders, grouped by nation — scalar AVG subquery
    (1-row broadcast) + anti-join against the recent-order keys.  (The
    fixture gives every customer at least one lifetime order, so the
    original "never ordered" predicate is vacuous; dormancy-since-date
    keeps the anti-join + scalar shape with a non-empty answer.)  The
    anti-join shuffles on custkey; at 100 TB AQE converts it to
    broadcast when the recent-keys side is small."""
    cust = load_table(spark, "customer", sf_dir)
    orders = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderdate") >= F.lit(Q22_DORMANT_SINCE).cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        avg_exact("c_acctbal", MONEY).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            sum_exact("c_acctbal", MONEY).alias("totacctbal"),
        )
    )


SQL_Q22 = f"""
SELECT c_nationkey, COUNT(*) AS numcust,
       {sql_sum_exact('c_acctbal', MONEY)} AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT {sql_avg_exact('c_acctbal', MONEY)}
    FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{Q22_DORMANT_SINCE} 00:00:00')
GROUP BY c_nationkey
"""


QUERIES = {
    "q2_min_supplier": q_q2_min_supplier,
    "q6_forecast_revenue": q_q6_forecast_revenue,
    "q7_nation_volume": q_q7_nation_volume,
    "q8_market_share": q_q8_market_share,
    "q9_profit": q_q9_profit,
    "q11_important_parts": q_q11_important_parts,
    "q13_custdist": q_q13_custdist,
    "q15_top_supplier": q_q15_top_supplier,
    "q16_supplier_counts": q_q16_supplier_counts,
    "q17_small_quantity": q_q17_small_quantity,
    "q19_disjunctive": q_q19_disjunctive,
    "q20_dominant_shippers": q_q20_dominant_shippers,
    "q21_sole_returns": q_q21_sole_returns,
    "q22_dormant_customers": q_q22_dormant_customers,
}
ORACLE_SQL = {
    "q2_min_supplier": SQL_Q2,
    "q6_forecast_revenue": SQL_Q6,
    "q7_nation_volume": SQL_Q7,
    "q8_market_share": SQL_Q8,
    "q9_profit": SQL_Q9,
    "q11_important_parts": SQL_Q11,
    "q13_custdist": SQL_Q13,
    "q15_top_supplier": SQL_Q15,
    "q16_supplier_counts": SQL_Q16,
    "q17_small_quantity": SQL_Q17,
    "q19_disjunctive": SQL_Q19,
    "q20_dominant_shippers": SQL_Q20,
    "q21_sole_returns": SQL_Q21,
    "q22_dormant_customers": SQL_Q22,
}
