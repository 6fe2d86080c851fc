"""Relational operator surface (SURVEY.md §2B): scans, filters, joins,
aggregations, windows, set ops, scalar functions, rollup, pivot-style
conditional aggregation — all absent from the reference (it consumes a
prebuilt DataFrame; README.md:74) and required of a complete engine.

Every query is DataFrame-first so Catalyst gets predicate pushdown,
column pruning and join planning; small dimensions (region/nation/
supplier — SURVEY.md §2B joins row) are explicitly ``broadcast()`` so the
fact-side scan never shuffles for them even at 100 TB.  All money/measure
aggregates use the exact-decimal discipline from
:mod:`pu4spark_spark.functions.exact` so results are partition-order
independent (and hash-match DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pu4spark_spark.plans import cached
from pu4spark_spark.functions.exact import (
    MONEY_ARITH as MONEY,  # narrow: exact through multi-factor products
    RATE_ARITH as RATE,
    avg_exact,
    dec,
    sql_avg_exact,
    sql_sum_exact,
    sum_exact,
)
from pu4spark_spark.sources import load_table

#: SQL spellings of the shared arithmetic decimal types (oracle side)
_M = MONEY.upper()
_R = RATE.upper()

#: Fixed-memory equi-width histogram sketch parameters, shared by
#: ``lineitem_histogram_quantiles`` and the winsorized-mean boundary
#: pass — 64 counters per group regardless of corpus size.
HIST_BINS = 64
HIST_PROBES = [0.5, 0.95, 0.99]
_BINS_F = float(HIST_BINS)
_BINS_M1 = HIST_BINS - 1


# -- q1: full-scan aggregation (TPC-H Q1 shape) --------------------------

def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    price, disc, tax = dec("l_extendedprice", MONEY), dec("l_discount", RATE), dec("l_tax", RATE)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_exact("l_quantity", MONEY).alias("sum_qty"),
            sum_exact("l_extendedprice", MONEY).alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            avg_exact("l_quantity", MONEY).alias("avg_qty"),
            avg_exact("l_extendedprice", MONEY).alias("avg_price"),
            avg_exact("l_discount", RATE).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       {sql_sum_exact('l_quantity', MONEY)} AS sum_qty,
       {sql_sum_exact('l_extendedprice', MONEY)} AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS {_M}) * (1 - CAST(l_discount AS {_R}))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS {_M}) * (1 - CAST(l_discount AS {_R})) * (1 + CAST(l_tax AS {_R}))) AS DOUBLE) AS sum_charge,
       {sql_avg_exact('l_quantity', MONEY)} AS avg_qty,
       {sql_avg_exact('l_extendedprice', MONEY)} AS avg_price,
       {sql_avg_exact('l_discount', RATE)} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# -- q3: selective 3-way join + top-k (TPC-H Q3 shape) -------------------

def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") > cutoff)
    revenue = F.sum(
        dec("l_extendedprice", MONEY) * (F.lit(1) - dec("l_discount", RATE))
    ).cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_Q3 = f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS {_M}) * (1 - CAST(l_discount AS {_R}))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# -- q5: star join with broadcast dims ----------------------------------

def q_q5_region_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    supp = F.broadcast(load_table(spark, "supplier", sf_dir))
    nation = F.broadcast(load_table(spark, "nation", sf_dir))
    region = F.broadcast(
        load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    )
    revenue = F.sum(
        dec("l_extendedprice", MONEY) * (F.lit(1) - dec("l_discount", RATE))
    ).cast("double")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.alias("revenue"), F.count(F.lit(1)).alias("n_lineitems"))
    )


SQL_Q5 = f"""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS {_M}) * (1 - CAST(l_discount AS {_R}))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# -- window: top-k per group --------------------------------------------

def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation, TWO-PHASE: a single
    ``PARTITION BY n_name`` window would create exactly n_nations
    partitions (one task sorting an entire nation's customers at
    100 TB), so phase 1 cuts each input partition to ≤3 rows per nation
    map-side and the global window ranks only the 3·P survivors —
    identical output under the same (balance DESC, custkey ASC) total
    order."""
    from pu4spark_spark.plans import two_phase_rank

    cust = load_table(spark, "customer", sf_dir)
    nation = F.broadcast(load_table(spark, "nation", sf_dir))
    joined = cust.join(nation, cust.c_nationkey == nation.n_nationkey)
    return two_phase_rank(
        joined,
        ["n_name"],
        [F.desc("c_acctbal"), F.asc("c_custkey")],
        3,
        rank_col="rn",
    ).select("n_name", "c_custkey", "c_acctbal", "rn")


SQL_TOP_CUSTOMERS = """
SELECT n_name, c_custkey, c_acctbal, rn
FROM (
  SELECT n_name, c_custkey, c_acctbal,
         CAST(ROW_NUMBER() OVER (PARTITION BY n_name
                            ORDER BY c_acctbal DESC, c_custkey ASC)
              AS INTEGER) AS rn
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
WHERE rn <= 3
"""


# -- q10: returned-items report (TPC-H Q10 shape) ------------------------

def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer in
    one quarter.  Both selective filters (return flag on the fact,
    date window on orders) evaluate at the scans; nation broadcasts;
    the orders↔lineitem join shuffles only the filtered quarter; final
    top-20 is a small orderBy+limit on the aggregated (customer-sized)
    result."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-04-01").cast("timestamp")
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    cust = load_table(spark, "customer", sf_dir)
    nation = F.broadcast(load_table(spark, "nation", sf_dir))
    revenue = F.sum(
        dec("l_extendedprice", MONEY) * (F.lit(1) - dec("l_discount", RATE))
    ).cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_Q10 = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice AS {_M}) * (1 - CAST(l_discount AS {_R}))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# -- q14: promo revenue share (TPC-H Q14 shape) --------------------------

def q_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from PROMO parts —
    conditional aggregation over a fact↔dim join.  part broadcasts (a
    true dimension, fixed-size); the month filter prunes the fact scan;
    the whole query is one agg job with no shuffle beyond the final
    single-row reduce.  The share is one double division of two
    exact-decimal sums (engine-exact)."""
    lo = F.lit("1996-09-01").cast("timestamp")
    hi = F.lit("1996-10-01").cast("timestamp")
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    part = F.broadcast(load_table(spark, "part", sf_dir))
    rev = dec("l_extendedprice", MONEY) * (F.lit(1) - dec("l_discount", RATE))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(MONEY))
    )
    total = F.sum(rev)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            promo.cast("double").alias("promo_revenue"),
            total.cast("double").alias("total_revenue"),
            (promo.cast("double") / total.cast("double")).alias(
                "promo_share"
            ),
        )
    )


SQL_Q14 = f"""
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS {_M}) * (1 - CAST(l_discount AS {_R}))
                     ELSE 0 END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice AS {_M}) * (1 - CAST(l_discount AS {_R}))) AS DOUBLE) AS total_revenue,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS {_M}) * (1 - CAST(l_discount AS {_R}))
                     ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS {_M}) * (1 - CAST(l_discount AS {_R}))) AS DOUBLE) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


def q_events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gap-and-island): a session break is a
    ≥30-minute silence per user — ``lag`` marks session starts, a
    running sum numbers the islands, and one aggregate emits each
    session's span.  The batch twin of ``streaming_sessions`` (same
    oracle): both windows and the final groupBy hash-partition on
    user_id (high cardinality), and the groupBy reuses the windows'
    partitioning — ONE exchange total."""
    events = load_table(spark, "events", sf_dir)
    wo = Window.partitionBy("user_id").orderBy("ts")
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = 30 * 60 * 1_000_000
    marked = events.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(wo).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wo))
                >= gap_us
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    islands = marked.withColumn("sid", F.sum("is_new").over(wrun))
    return (
        islands.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + F.expr("interval 30 minutes")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("sid")
    )


#: identical contract to the streaming session-window query
SQL_EVENTS_SESSIONIZED = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
islands AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM islands
GROUP BY user_id, sid
"""


def q_events_session_window_fn(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Native ``session_window`` sessionization — Spark's built-in
    session operator (the same one Structured Streaming's stateful
    session aggregation uses) run in batch, value-checked against the
    SAME gap-and-island oracle as :func:`q_events_sessionized`.  The
    two queries prove both expressions of the semantics: the windowed
    island construction above, and the engine-native operator here
    (one ``groupBy(user_id, session_window(ts, gap))`` — Catalyst
    plans a single hash-partition on user_id and merges overlapping
    sessions inside the aggregate, no window functions at all).
    ``session_window.end`` is defined as last_ts + gap, matching the
    island oracle's ``MAX(ts) + INTERVAL 30 MINUTE`` exactly."""
    events = load_table(spark, "events", sf_dir)
    return (
        events.groupBy(
            "user_id", F.session_window("ts", "30 minutes")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


# -- window: running aggregate ------------------------------------------

def q_customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice", MONEY)).over(w).cast("double").alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


SQL_RUNNING_SPEND = f"""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS {_M})) OVER w AS DOUBLE) AS running_spend,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS order_seq
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# -- time-bucketed aggregation ------------------------------------------

def q_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            sum_exact("o_totalprice", MONEY).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


SQL_MONTHLY_REVENUE = f"""
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
       {sql_sum_exact('o_totalprice', MONEY)} AS revenue,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation — the batch analogue of the streaming
    pipeline in :mod:`pu4spark_spark.streaming.events` (same grouping)."""
    events = load_table(spark, "events", sf_dir)
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_exact("value", MONEY).alias("sum_value"),
        )
    )


SQL_EVENTS_HOURLY = f"""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
       COUNT(*) AS n_events,
       {sql_sum_exact('value', MONEY)} AS sum_value
FROM events
GROUP BY 1, 2
"""


# -- incremental aggregate maintenance (materialized-view merge) ---------

#: events whose id hits this modulus play the "newly arrived" slice
ROLLUP_ARRIVAL_MOD = 10


def ensure_hourly_rollup_artifact(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent build of the corpus's hourly PARTIAL-aggregate table
    (count + exact decimal sum per (hour, event_type)) — the
    materialized rollup a 100 TB pipeline maintains instead of
    re-scanning history.  Keyed by ``sf_dir``; reused when present.
    In production this table is partitioned by day so maintenance
    touches only the arriving partitions."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pu4spark_spark.functions.exact import MONEY, dec

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    tbl = f"events_hourly_rollup_{tag}"
    if spark.catalog.tableExists(tbl):
        return tbl
    warehouse = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(f"{warehouse}/{tbl}", ignore_errors=True)
    events = load_table(spark, "events", sf_dir)
    corpus = events.filter(F.col("event_id") % ROLLUP_ARRIVAL_MOD != 0)
    partial = corpus.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", MONEY)).alias("sum_value_dec"),
    )
    partial.write.saveAsTable(tbl)
    return tbl


def q_events_rollup_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: merge the PRECOMPUTED hourly
    partial-aggregate artifact with the newly-arrived slice's partials
    and return the refreshed rollup — must equal the full recompute
    (the ``events_hourly`` oracle) exactly.

    This is the materialized-view pattern every long-lived 100 TB rollup
    uses: work per refresh is O(arriving batch) + O(rollup), never a
    history re-scan.  Exactness under merging is why the artifact
    stores the DECIMAL sum partial (associative, order-independent)
    and casts to double only at the final read-out — partial counts
    and sums merge with plain ``SUM``, the mergeability Spark's own
    partial aggregation relies on.
    """
    from pu4spark_spark.functions.exact import MONEY, dec

    tbl = ensure_hourly_rollup_artifact(spark, sf_dir)
    events = load_table(spark, "events", sf_dir)
    arriving = events.filter(F.col("event_id") % ROLLUP_ARRIVAL_MOD == 0)
    delta = arriving.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", MONEY)).alias("sum_value_dec"),
    )
    return (
        spark.table(tbl)
        .unionByName(delta)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value_dec").cast("double").alias("sum_value"),
        )
    )


#: full recompute over ALL events — merged partials must reproduce it
SQL_EVENTS_ROLLUP_MAINTENANCE = SQL_EVENTS_HOURLY


# -- path analysis (ordered event-type trigrams) --------------------------

def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral PATH analysis: every consecutive 3-event sequence a
    user performs, with occurrence and distinct-user counts — the
    "what do people do around a purchase?" exploration that funnels
    (which test ONE fixed sequence) can't answer.

    ONE shuffle on ``user_id`` computes both ``lead`` steps; the path
    rollup's key space is bounded at |event_types|³, so its exchange
    carries partial counts, not events.  The distinct-user count
    piggybacks on the same rollup (partial distinct on (path, user)).
    All-integer — hash-checked."""
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    stepped = events.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return stepped.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).alias("n_paths"),
        F.countDistinct("user_id").alias("n_users"),
    )


SQL_EVENTS_TOP_PATHS = """
WITH stepped AS (
  SELECT user_id,
         event_type AS e1,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3,
       COUNT(*) AS n_paths,
       COUNT(DISTINCT user_id) AS n_users
FROM stepped
WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
"""


#: deterministic purge cohort — the users exercising their deletion
#: right in the fixture
PURGE_USER_MOD = 17


def q_events_purge_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance under DELETE — the GDPR
    right-to-be-forgotten applied to a materialized view: purged
    users' contributions enter the merge as NEGATIVE partials
    (retraction records, the classic incremental-view-maintenance
    move), so the refresh costs O(rollup) + O(purged users' events) —
    never a history re-scan — and hours owned entirely by purged
    users vanish (merged count reaches zero and is filtered, not left
    as a ghost row).

    Additions and retractions go through the SAME merge because the
    artifact stores associative partials (count, exact decimal sum):
    negation is just multiplying both by −1.  The oracle recomputes
    from scratch WITHOUT the cohort, so the driver hash-checks
    incremental-under-delete ≡ full recompute.  At 100 TB the purged
    slice is found by key layout (user-bucketed files / bloom), not a
    scan; the fixture's filter stands in for that locate step."""
    from pu4spark_spark.functions.exact import MONEY, dec

    tbl = ensure_hourly_rollup_artifact(spark, sf_dir)
    events = load_table(spark, "events", sf_dir)
    arriving = events.filter(F.col("event_id") % ROLLUP_ARRIVAL_MOD == 0)
    purged = events.filter(F.col("user_id") % PURGE_USER_MOD == 0)

    def partials(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        ).agg(
            (F.lit(sign) * F.count(F.lit(1))).alias("n_events"),
            F.sum(dec("value", MONEY) * sign).alias("sum_value_dec"),
        )

    return (
        spark.table(tbl)
        .unionByName(partials(arriving, 1))
        .unionByName(partials(purged, -1))
        .groupBy("hour", "event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value_dec").cast("double").alias("sum_value"),
        )
        .filter(F.col("n_events") > 0)
    )


SQL_EVENTS_PURGE_MAINTENANCE = f"""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
       COUNT(*) AS n_events,
       {sql_sum_exact('value', MONEY)} AS sum_value
FROM events
WHERE user_id % {PURGE_USER_MOD} <> 0
GROUP BY 1, 2
"""


# -- custom UDAF surface: applyInPandas, value-checked -------------------

def q_events_user_gaps_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregation the built-in operators can't express cleanly
    — per-user inter-event gap statistics (max + median of sorted
    deltas) — via Arrow-batched ``groupBy(...).applyInPandas``: the
    UDAF shape of the engine's Python surface (beside ``mapInPandas``
    decode and ``applyInPandasWithState``), and the only one computing
    an order-statistic.

    Scale shape (hot-key-bounded, r5): the grouping key is user_id,
    whose cardinality grows with the data (never a 5-value column —
    that would cap parallelism at 5 tasks), BUT a hot key (bot
    account) must never materialize its full event history in one
    Arrow batch.  So everything unbounded runs native and spill-safe
    BEFORE the pandas boundary: gaps via a ``lag`` window and the
    median candidates via ``row_number`` over the gap order — Spark's
    sort-based window operators use the external (disk-spilling)
    sorter, so a billion-event user costs disk, not executor heap.
    Only the ≤2 middle-ranked gaps per user reach ``applyInPandas``,
    which merges them into the interpolated median — per-group Arrow
    state is ≤2 rows regardless of user size
    (``tests/test_relational_shapes.py`` drives a synthetic hot user
    through it).  Exactness: gaps are integer microseconds; the
    median of ints is the midpoint of at most two ints, exactly
    representable as a double — so even the pandas path value-checks
    against DuckDB's interpolated median.  Users with a single event
    have no gap and are absent in both engines."""
    events = load_table(spark, "events", sf_dir)
    staged = events.select("user_id", F.unix_micros("ts").alias("us"))
    return user_gap_stats(staged)


def user_gap_stats(staged: DataFrame) -> DataFrame:
    """Core of ``events_user_gaps_pandas`` over a (user_id, us) frame —
    factored out so tests can drive synthetic hot users through it."""
    w_ts = Window.partitionBy("user_id").orderBy("us")
    gaps = (
        staged.withColumn("gap", F.col("us") - F.lag("us").over(w_ts))
        .filter(F.col("gap").isNotNull())
        .select("user_id", "gap")
    )
    # native, spillable per-user scalars (count/max merge exactly)
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.max("gap").alias("max_gap_micros"),
    )
    # median candidates: rank each user's gaps by value (external-sort
    # window), keep ranks ⌊(n+1)/2⌋ and ⌊n/2⌋+1 — 1 row for odd n,
    # 2 for even, never more
    w_rank = Window.partitionBy("user_id").orderBy("gap")
    w_all = Window.partitionBy("user_id")
    ranked = gaps.select(
        "user_id",
        "gap",
        F.row_number().over(w_rank).alias("r"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    mid = ranked.filter(
        (F.col("r") == F.floor((F.col("n") + 1) / 2))
        | (F.col("r") == F.floor(F.col("n") / 2) + 1)
    ).select("user_id", "gap")

    # The pandas groups are HASH BUCKETS of users, not single users
    # (guide §4: applyInPandas pays a fixed per-group cost — pandas
    # frame construction + one Python call — so thousands of ≤2-row
    # user groups serialize on that overhead, measured ~3.5 s of the
    # query's 4.7 s at sf0.1; one bucket holds many users and the
    # per-user merge runs VECTORIZED inside).  Per-group Arrow state
    # stays bounded: ≤2 rows per user × users/bucket, with the bucket
    # count scaling with cluster parallelism, never with one user's
    # history.  Median semantics are unchanged: min/max of a user's ≤2
    # candidate gaps converted to float64 BEFORE the midpoint, exactly
    # the scalar path's float(min)+float(max) over 2.
    n_buckets = staged.sparkSession.sparkContext.defaultParallelism * 4

    # no type hints on purpose: applyInPandas tries to infer the eval
    # type from annotations and warns on partial ones
    def merge_median(pdf):
        import pandas as pd

        g = pdf.groupby("user_id")["gap"]
        med = (
            g.min().astype("float64") + g.max().astype("float64")
        ) / 2.0
        return pd.DataFrame(
            {
                "user_id": med.index.to_numpy(dtype="int64"),
                "median_gap_micros": med.to_numpy(dtype="float64"),
            }
        )

    medians = (
        mid.withColumn(
            "__bucket", F.pmod(F.hash("user_id"), F.lit(n_buckets))
        )
        .groupBy("__bucket")
        .applyInPandas(
            merge_median, "user_id long, median_gap_micros double"
        )
    )
    return stats.join(medians, "user_id").select(
        "user_id",
        (F.col("n_gaps") + 1).cast("bigint").alias("n_events"),
        F.col("max_gap_micros").cast("bigint").alias("max_gap_micros"),
        "median_gap_micros",
    )


SQL_EVENTS_USER_GAPS = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts) AS gap
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
       CAST(MAX(gap) AS BIGINT) AS max_gap_micros,
       CAST(median(gap) AS DOUBLE) AS median_gap_micros
FROM g
WHERE gap IS NOT NULL
GROUP BY user_id
"""


# -- semi-structured: JSON extraction -----------------------------------

def q_events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n"),
        )
    )


SQL_EVENTS_JSON = """
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       COUNT(k) AS n
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
"""


# -- set operations ------------------------------------------------------

def q_parts_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large parts (size > 40) that were sold, minus those ever sold at a
    discount ≥ 8% — exercises INTERSECT and EXCEPT."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    sold = li.select(F.col("l_partkey").alias("p_partkey")).distinct()
    large = part.filter(F.col("p_size") > 40).select("p_partkey")
    discounted = (
        li.filter(F.col("l_discount") >= 0.08)
        .select(F.col("l_partkey").alias("p_partkey"))
        .distinct()
    )
    return sold.intersect(large).exceptAll(discounted)


SQL_PARTS_SETOPS = """
SELECT l_partkey AS p_partkey FROM lineitem
INTERSECT
SELECT p_partkey FROM part WHERE p_size > 40
EXCEPT ALL
SELECT DISTINCT l_partkey AS p_partkey FROM lineitem WHERE l_discount >= 0.08
"""


# -- percentiles -----------------------------------------------------------

def q_lineitem_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per return flag.  Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the
    p·(n−1)-index linear interpolation, so results are bit-identical.
    Exact percentile buffers each group's values — at 100 TB switch to
    ``approx_percentile`` (t-digest sketch, mergeable fixed state) when
    ±ε error is acceptable."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


SQL_PRICE_PERCENTILES = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS median_price,
       quantile_cont(l_extendedprice, 0.95) AS p95_price,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem
GROUP BY l_returnflag
"""


def q_lineitem_price_percentiles_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB path of the query above: ``approx_percentile`` keeps
    a mergeable fixed-size sketch per group (no per-group value
    buffering), trading ±ε accuracy for bounded state — the same
    exact-vs-sketch pairing as the HLL distinct-count queries.
    Sketch internals differ per engine, so this is a rows-only check;
    the exact twin above is the value-checked anchor."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, 0.5, 1000)"
        ).alias("median_price_approx"),
        F.expr(
            "approx_percentile(l_extendedprice, 0.95, 1000)"
        ).alias("p95_price_approx"),
        F.count(F.lit(1)).alias("n_items"),
    )


# -- distinct-count aggregation -------------------------------------------

def q_events_user_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type distinct users.  COUNT(DISTINCT) expands to a
    two-stage partial-dedup aggregate in Spark — still a single logical
    pass; use :func:`q_events_user_cardinality_approx` when a ±2% HLL
    answer is acceptable at 100 TB (no dedup state, fixed memory)."""
    events = load_table(spark, "events", sf_dir)
    return events.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_USER_CARDINALITY = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
"""


def q_events_user_cardinality_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch counterpart — fixed-size state per group
    instead of a dedup hash table, mergeable across partitions (the
    100 TB default for cardinality dashboards).  Sketch estimates are
    engine-specific: rows-only check."""
    events = load_table(spark, "events", sf_dir)
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"),
    )


def q_events_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE HLL sketch maintenance (Apache DataSketches via Spark's
    ``hll_sketch_agg`` / ``hll_union_agg``): distinct-user sketches are
    built per (event_type, day) — the granularity an incremental rollup
    job materializes — then the per-type total uniques come from
    UNIONING the stored day sketches, never re-reading raw events.
    This is the 100 TB cardinality pattern: each day's ingest appends a
    fixed-size (kb) sketch row; any rollup window (week, month, all
    time) is a sketch merge over rollup-sized input.  The exact
    distinct count rides the same query so the estimate is evaluated,
    not trusted: the fixture pins relative error < 2 % (lgConfigK=14,
    pytest-gated).  Estimates are engine-specific → rows-only check."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk", False)).alias(
            "est_users"
        ),
    )
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type", "n_days", "est_users", "exact_users"
    )


# -- semi / anti joins ----------------------------------------------------

def q_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left SEMI join: customers having ≥1 urgent order — existence
    probe only, never multiplies rows (the fact side is reduced to a
    distinct key set during the join, no fan-out to re-aggregate)."""
    cust = load_table(spark, "customer", sf_dir)
    urgent = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


SQL_SEMI_URGENT = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left ANTI join: lapsed customers — no order since 2001
    (NOT EXISTS with a pushed-down date filter on the fact side)."""
    cutoff = F.lit("2001-01-01").cast("timestamp")
    cust = load_table(spark, "customer", sf_dir)
    recent = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") >= cutoff
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


SQL_ANTI_NO_ORDERS = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
"""


# -- cube ------------------------------------------------------------------

def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in one pass —
    Spark expands the sets map-side, still a single shuffle."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        sum_exact("o_totalprice", MONEY).alias("total"),
    )


SQL_CUBE = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_sum_exact('o_totalprice', MONEY)} AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# -- pivot-style conditional aggregation --------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q_segment_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    aggs = [
        F.sum((F.col("o_orderpriority") == p).cast("long")).alias(
            f"n_p{i + 1}"
        )
        for i, p in enumerate(_PRIORITIES)
    ]
    return joined.groupBy("c_mktsegment").agg(*aggs)


SQL_SEGMENT_PRIORITY = """
SELECT c_mktsegment,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_p1,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_p2,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS n_p3,
       CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS n_p4,
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_p5
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# -- rollup --------------------------------------------------------------

def q_rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        sum_exact("o_totalprice", MONEY).alias("total"),
    )


SQL_ROLLUP = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_sum_exact('o_totalprice', MONEY)} AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_events_range_frame_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VALUE-RANGE window frames — ``RANGE BETWEEN <interval>
    PRECEDING AND CURRENT ROW`` — the trailing-window aggregate ROWS
    frames cannot express (how many events and how much value this
    user produced in the HOUR before each event, however many rows
    that is).  The frame bound is the exact integer microsecond
    timestamp, so frame membership is engine-portable; the value sum
    is exact integer cents.  One user_id exchange feeds every frame;
    per-user ordering is (ts, event_id) — but the RANGE frame itself
    keys on ts alone, so same-timestamp peers share a frame in both
    engines (the peer-row rule that makes RANGE differ from ROWS)."""
    events = load_table(spark, "events", sf_dir)
    us = F.unix_micros(F.col("ts"))
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    staged = events.select(
        "user_id", "event_id", us.alias("ts_us"), cents.alias("cents")
    )
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-hour_us, 0)
    )
    return staged.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_hour"),
        F.sum("cents").over(w).alias("cents_trailing_hour"),
    )


SQL_EVENTS_RANGE_FRAME_STATS = """
WITH staged AS (
  SELECT user_id, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
)
SELECT user_id, event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_hour,
       CAST(SUM(cents) OVER w AS BIGINT) AS cents_trailing_hour
FROM staged
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


# -- aggregate-function breadth -------------------------------------------

def q_orders_aggregate_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-function breadth in ONE pass: conditional counting
    (``count_if``), boolean quantifiers (``bool_and``/``bool_or``),
    exact bitwise folds (``bit_and``/``bit_or``/``bit_xor`` —
    associative integer ops, partition-order free), and keyed argmin/
    argmax (``min_by``/``max_by`` over the unique order key, so the
    selection is deterministic).  Everything is integer- or
    boolean-exact — no float aggregate anywhere — so the whole suite
    hash-checks; one map-side-combined groupBy over the status keys."""
    orders = load_table(spark, "orders", sf_dir)
    key = F.col("o_orderkey")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    return orders.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias(
            "n_urgent"
        ),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderpriority") == "5-LOW").alias("any_low"),
        F.bit_and(key).alias("key_bit_and"),
        F.bit_or(key).alias("key_bit_or"),
        F.bit_xor(key).alias("key_bit_xor"),
        F.min_by(cents, key).alias("first_order_cents"),
        F.max_by(cents, key).alias("last_order_cents"),
        F.count_distinct(F.col("o_orderpriority")).alias("n_priorities"),
    )


SQL_ORDERS_AGGREGATE_SUITE = """
SELECT o_orderstatus,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
           AS n_urgent,
       BOOL_AND(o_totalprice > 0) AS all_positive,
       BOOL_OR(o_orderpriority = '5-LOW') AS any_low,
       CAST(BIT_AND(o_orderkey) AS BIGINT) AS key_bit_and,
       CAST(BIT_OR(o_orderkey) AS BIGINT) AS key_bit_or,
       CAST(BIT_XOR(o_orderkey) AS BIGINT) AS key_bit_xor,
       CAST(ARG_MIN(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT), o_orderkey) AS BIGINT)
           AS first_order_cents,
       CAST(ARG_MAX(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT), o_orderkey) AS BIGINT)
           AS last_order_cents,
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
FROM orders
GROUP BY o_orderstatus
"""


def q_orders_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics suite — the behaviors that silently differ
    between engines if either side is sloppy, pinned by one
    hash-checked query: NULL group keys collapse into one group,
    ``COUNT(col)`` excludes NULLs while ``COUNT(*)`` doesn't,
    ``coalesce`` fills, and the null-safe equality join
    (``eqNullSafe`` / ``IS NOT DISTINCT FROM``) MATCHES null keys —
    the semantics a CDC reconciliation needs, where a plain equi-join
    would drop every null-keyed row pair.  NULLs are injected
    deterministically with ``nullif`` so the fixture needs no null
    columns of its own."""
    orders = load_table(spark, "orders", sf_dir)
    base = orders.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("k"),
        "o_orderpriority",
    )
    left = base.groupBy("k").agg(F.count(F.lit(1)).alias("n_left"))
    right = (
        base.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    joined = left.join(right, left["k"].eqNullSafe(right["k"]), "left").select(
        left["k"].alias("k"), "n_left", "n_urgent"
    )
    return joined.select(
        F.coalesce(F.col("k"), F.lit("<null>")).alias("status_key"),
        F.col("k").isNull().alias("was_null"),
        "n_left",
        F.coalesce(F.col("n_urgent"), F.lit(0)).cast("bigint").alias(
            "n_urgent"
        ),
    )


SQL_ORDERS_NULL_SEMANTICS = """
WITH base AS (
  SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS k, o_orderpriority
  FROM orders
),
l AS (SELECT k, COUNT(*) AS n_left FROM base GROUP BY k),
r AS (
  SELECT k, COUNT(*) AS n_urgent
  FROM base WHERE o_orderpriority = '1-URGENT' GROUP BY k
)
SELECT coalesce(l.k, '<null>') AS status_key,
       l.k IS NULL AS was_null,
       l.n_left,
       CAST(coalesce(r.n_urgent, 0) AS BIGINT) AS n_urgent
FROM l LEFT JOIN r ON l.k IS NOT DISTINCT FROM r.k
"""


def q_orders_datetime_functions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Datetime-function breadth beyond the year/quarter/month suite:
    truncation, month arithmetic, day-of-week (Spark counts 1=Sunday,
    DuckDB 0=Sunday — the oracle normalizes, pinning the off-by-one
    every calendar port hits), month boundaries, and exact epoch
    microseconds.  Scan-stage projections, zero shuffle."""
    orders = load_table(spark, "orders", sf_dir)
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.add_months(d, 3).cast("date").alias("plus_quarter"),
        F.dayofweek(d).alias("dow"),
        F.dayofyear(d).alias("doy"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).alias(
            "days_to_close"
        ),
        F.unix_micros(d.cast("timestamp")).alias("epoch_us"),
    )


SQL_ORDERS_DATETIME_FUNCTIONS = """
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       last_day(o_orderdate) AS month_end,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_quarter,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
            AS INTEGER) AS days_to_close,
       CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS epoch_us
FROM orders
"""


# -- scalar functions (dates / strings) ----------------------------------

def q_order_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.upper(F.col("o_orderstatus")).alias("status_u"),
        F.substring(F.col("o_orderpriority"), 1, 1).cast("int").alias("prio_num"),
        F.concat_ws("|", F.col("o_orderstatus"), F.col("o_orderpriority")).alias(
            "status_prio"
        ),
        F.length(F.col("o_orderpriority")).alias("prio_len"),
    )


SQL_SCALAR_FUNCTIONS = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       upper(o_orderstatus) AS status_u,
       CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
       concat_ws('|', o_orderstatus, o_orderpriority) AS status_prio,
       CAST(length(o_orderpriority) AS INTEGER) AS prio_len
FROM orders
"""


def q_part_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function breadth over part names — the padding/translate/
    slicing family the date/string suite above doesn't touch, each with
    an identical-semantics DuckDB twin (the RE2 ⊆ Java-regex subset
    discipline applies to ``translate``'s literal character maps too).
    Pure scan-stage projections: zero shuffle."""
    parts = load_table(spark, "part", sf_dir)
    name = F.col("p_name")
    return parts.select(
        "p_partkey",
        F.lpad(F.col("p_brand"), 12, ".").alias("brand_lpad"),
        F.rpad(F.col("p_type"), 24, "_").alias("type_rpad"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.translate(name, "aeiou", "AEIOU").alias("name_tr"),
        F.substring(name, 1, 8).alias("name_left"),
        F.instr(name, " ").alias("first_space"),
        F.ascii(name).alias("name_ascii"),
        F.repeat(F.col("p_brand"), 2).alias("brand_x2"),
        F.split_part(name, F.lit(" "), F.lit(1)).alias("first_word"),
    )


SQL_PART_STRING_FUNCTIONS = """
SELECT p_partkey,
       lpad(p_brand, 12, '.') AS brand_lpad,
       rpad(p_type, 24, '_') AS type_rpad,
       reverse(p_brand) AS brand_rev,
       translate(p_name, 'aeiou', 'AEIOU') AS name_tr,
       substr(p_name, 1, 8) AS name_left,
       CAST(instr(p_name, ' ') AS INTEGER) AS first_space,
       CAST(ascii(p_name) AS INTEGER) AS name_ascii,
       repeat(p_brand, 2) AS brand_x2,
       split_part(p_name, ' ', 1) AS first_word
FROM part
"""


# -- SQL front-end ---------------------------------------------------------

#: dialect-common ANSI SQL — the SAME text is the Spark implementation
#: (spark.sql over registered views) AND the DuckDB oracle, proving the
#: engine's SQL entry point end-to-end, not only the DataFrame API
SQL_PARTS_BY_BRAND = """
SELECT p_brand,
       COUNT(*) AS n_parts,
       CAST(MAX(p_size) AS INTEGER) AS max_size,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM part
WHERE p_size >= 10
GROUP BY p_brand
"""


def q_sql_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL front-end: register the table as a temp view and run the
    exact oracle text through spark.sql — Catalyst parses/plans it like
    any DataFrame query (same pushdown, same exact-decimal discipline)."""
    load_table(spark, "part", sf_dir).createOrReplaceTempView("part")
    return spark.sql(SQL_PARTS_BY_BRAND)


#: SQL pipe syntax (Spark 4's ``|>`` operator chain, SPARK-49555): the
#: linear FROM → WHERE → AGGREGATE → WHERE(HAVING) form.  Each pipe
#: stage is planned by Catalyst exactly like its nested-SQL equivalent
#: — same single hash aggregate, same pushdown — so the oracle below is
#: the ANSI spelling of the identical plan.
SQL_PIPE_ORDERS_SPARK = """
FROM orders
|> WHERE o_orderdate >= TIMESTAMP_NTZ '1995-01-01 00:00:00'
|> AGGREGATE COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
   GROUP BY o_orderstatus, o_orderpriority
|> WHERE n_orders > 5
"""

SQL_PIPE_ORDERS_ORACLE = """
SELECT o_orderstatus,
       o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
GROUP BY o_orderstatus, o_orderpriority
HAVING COUNT(*) > 5
"""


def q_sql_pipe_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL *pipe syntax* front-end: the same filtered-aggregate-HAVING
    analytics as a ``|>`` chain — the query shape a user migrating
    from a dataframe mindset writes in pure SQL.  Value-checked
    against the ANSI spelling (the DuckDB oracle), proving the pipe
    parser feeds the identical Catalyst plan."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(SQL_PIPE_ORDERS_SPARK)


def q_salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment order revenue through a SALTED customer join —
    the skew-safe join form as a first-class, value-checked query.

    ``salted_join`` (plans/__init__.py) splits each key's shuffle rows
    ``salt`` ways and explodes the smaller side to match, so a hot
    custkey can no longer pin one task; the join output is row-identical
    to the plain join, which is exactly what the oracle (an unsalted
    join) asserts."""
    from pu4spark_spark.plans import salted_join

    orders = load_table(spark, "orders", sf_dir)
    cust = (
        load_table(spark, "customer", sf_dir)
        .withColumnRenamed("c_custkey", "o_custkey")
        .select("o_custkey", "c_mktsegment")
    )
    joined = salted_join(orders, cust, "o_custkey", salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(_M))
        .cast("double")
        .alias("total_price"),
    )


SQL_SALTED_SEGMENT_REVENUE = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {_M})) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_skew_join_aqe_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGINE-NATIVE skew handling — the lever you reach for at 100 TB
    BEFORE manual salting (:func:`q_salted_segment_revenue` is the
    hand-rolled twin): a deliberately skewed fact key (two thirds of
    orders remapped onto customer 1 — the hot-account shape) joined
    sort-merge to customer with ``spark.sql.adaptive.skewJoin``
    splitting the hot partition at runtime.  AQE detects the oversized
    shuffle partition AFTER the map stage (no stats, no user hints
    beyond MERGE) and replans it as N sub-partitions each joining a
    duplicated build slice — semantics identical, stragglers gone.

    The join is materialized INSIDE the lowered-threshold conf window
    (persist + count) so the skew split actually happens on every run,
    driver included — the session confs are restored before returning.
    ``tests/test_plans.py::test_aqe_skew_join_split_witnessed`` gates
    ``skew=true`` on the executed SMJ; the oracle re-derives the same
    remapped join row-for-row, so a split that lost or duplicated rows
    would hash-mismatch."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": (
            "2048"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1024",
        # coalescing would merge the tiny fixture partitions before the
        # skew detector sees them — production sizes don't need this off
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old: dict = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    # AQE splits a skewed reduce partition at MAPPER-OUTPUT granularity;
    # the fixture's one-file scan is a single mapper, so spread the map
    # stage first (a 100 TB fact side has thousands of mappers for free)
    orders = (
        load_table(spark, "orders", sf_dir)
        .select(
            F.when(F.col("o_custkey") % 3 != 0, F.lit(1))
            .otherwise(F.col("o_custkey"))
            .alias("skew_key"),
            "o_totalprice",
        )
        .repartition(8)
    )
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_mktsegment"
    )
    agg = (
        orders.hint("MERGE")
        .join(cust, orders["skew_key"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_M))
            .cast("double")
            .alias("total_price"),
        )
    )
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        agg = cached(agg)  # registered: released at next query's entry
        agg.count()  # materialize under the skew-split confs
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return agg


SQL_SKEW_JOIN_AQE_REVENUE = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {_M})) AS DOUBLE) AS total_price
FROM orders JOIN customer
  ON (CASE WHEN o_custkey % 3 <> 0 THEN 1 ELSE o_custkey END) = c_custkey
GROUP BY c_mktsegment
"""


#: dialect-common GROUPING SETS text — run verbatim through both engines
SQL_GROUPING_SETS = """
SELECT o_orderstatus,
       o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form beneath rollup/cube):
    per-status totals, per-priority totals, and the grand total in one
    pass — Spark expands to a single Expand + hash aggregate, one
    shuffle."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(SQL_GROUPING_SETS)


def q_orders_upsert_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert compaction (SCD-1 keep-latest) on plain parquet — the
    MERGE pattern without a table format: base snapshot unioned with an
    update batch (every 7th order re-priced +100.00, a flat exact-decimal
    adjustment so no multiply-rounding can diverge between engines),
    then one keep-max-version window per key.  The post-merge per-status totals
    prove value-level correctness, not just row counts.

    Scale shape: one union (no shuffle) + one hash-partitioned window
    on the key + a groupBy that AQE plans off the window's partitioning
    — the compaction cost is a single shuffle of base+updates."""
    orders = load_table(spark, "orders", sf_dir)
    base = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        F.lit(0).alias("version"),
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            (
                F.col("o_totalprice").cast("decimal(12,2)")
                + F.lit("100.00").cast("decimal(12,2)")
            )
            .cast("decimal(12,2)")
            .alias("price"),
            F.lit(1).alias("version"),
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    latest = (
        base.unionByName(updates)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    return latest.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("version") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_updated"),
        F.sum("price").cast("double").alias("total_price"),
    )


SQL_ORDERS_UPSERT_COMPACT = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price, 0 AS version
  FROM orders
),
updates AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) + CAST('100.00' AS DECIMAL(12,2)) AS DECIMAL(12,2)) AS price,
         1 AS version
  FROM orders WHERE o_orderkey % 7 = 0
),
latest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                 ORDER BY version DESC) AS rn
    FROM (SELECT * FROM base UNION ALL SELECT * FROM updates)
  ) WHERE rn = 1
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN version = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
       CAST(SUM(price) AS DOUBLE) AS total_price
FROM latest
GROUP BY o_orderstatus
"""


ZORDER_BITS = 16


def zorder_key(a_expr: str, b_expr: str, bits: int = ZORDER_BITS):
    """Morton (Z-order) key: interleave the low ``bits`` of two
    non-negative int SQL expressions (given as strings, e.g. staged
    column names) — writing data sorted by this key clusters BOTH
    dimensions, so parquet min/max row-group pruning works for
    predicates on either column (the multi-dimensional data-skipping
    layout).  Pure integer shifts, exact in int64.

    The 2·bits-term interleave is assembled as ONE SQL string (same
    construction discipline as dedup.simhash_fingerprints): the
    previous Column-op-by-Column-op composition cost ~300 py4j
    round-trips of pure DataFrame *construction* time, measured as a
    dominant cost of the layout query.  Callers stage the operands as
    plain columns first so codegen evaluates each once."""
    terms = []
    for i in range(bits):
        terms.append(
            f"shiftleft(cast(shiftright({a_expr}, {i}) & 1 as bigint), {2 * i})"
        )
        terms.append(
            f"shiftleft(cast(shiftright({b_expr}, {i}) & 1 as bigint), {2 * i + 1})"
        )
    return F.expr("cast(" + " + ".join(terms) + " as bigint)")


def _sql_zorder(a: str, b: str, bits: int = ZORDER_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def q_orders_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit for orders clustered on (custkey, order
    date): per coarse z-range, row count and the min/max of BOTH
    dimensions — tight per-bucket ranges on each column are exactly
    what makes row-group skipping effective for either predicate.
    One map-side-combined groupBy on the derived key."""
    orders = load_table(spark, "orders", sf_dir)
    staged = orders.select(
        "o_custkey",
        "o_orderdate",
        F.pmod(F.col("o_custkey"), F.lit(1 << ZORDER_BITS))
        .cast("long")
        .alias("__ck"),
        F.pmod(
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")),
            F.lit(1 << ZORDER_BITS),
        )
        .cast("long")
        .alias("__dd"),
    )
    z = zorder_key("__ck", "__dd")
    return (
        staged.select(
            F.shiftright(z, 18).alias("z_bucket"),
            F.col("o_custkey"),
            F.col("o_orderdate"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.min("o_orderdate").alias("min_date"),
            F.max("o_orderdate").alias("max_date"),
        )
    )


# pmod-equivalent ((x % m) + m) % m in the oracle: Spark's pmod and
# DuckDB's % disagree on negative inputs (a custkey < 0 or an order
# date before 1992-01-01), so the oracle must not silently assume the
# non-negative domain
_ZM = 1 << ZORDER_BITS
_SQL_PMOD_CK = f"(((o_custkey % {_ZM}) + {_ZM}) % {_ZM})"
_SQL_PMOD_DD = (
    f"(((datediff('day', DATE '1992-01-01', o_orderdate) % {_ZM})"
    f" + {_ZM}) % {_ZM})"
)

SQL_ORDERS_ZORDER_LAYOUT = f"""
WITH keyed AS (
  SELECT o_custkey, o_orderdate,
         {_sql_zorder(_SQL_PMOD_CK, _SQL_PMOD_DD)}
           >> 18 AS z_bucket
  FROM orders
)
SELECT z_bucket,
       COUNT(*) AS n_orders,
       MIN(o_custkey) AS min_custkey,
       MAX(o_custkey) AS max_custkey,
       MIN(o_orderdate) AS min_date,
       MAX(o_orderdate) AS max_date
FROM keyed
GROUP BY z_bucket
"""


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data profile of the orders table — row count, null
    counts, min/max ranges, and exact distinct cardinalities in ONE
    aggregation job (the first query every ingest pipeline runs on a
    new 100 TB drop; one scan, map-side partials, one shuffle of a
    single partial-agg row per task — distinct columns add Expand
    passes, not extra scans)."""
    orders = load_table(spark, "orders", sf_dir)

    def nulls(c: str):
        return F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint")

    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        nulls("o_custkey").alias("null_custkey"),
        nulls("o_orderdate").alias("null_orderdate"),
        F.min(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("min_price"),
        F.max(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("max_price"),
        F.min(F.col("o_orderdate")).alias("min_date"),
        F.max(F.col("o_orderdate")).alias("max_date"),
        F.countDistinct("o_orderstatus").alias("n_status"),
        F.countDistinct("o_orderpriority").alias("n_priority"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


SQL_PROFILE_ORDERS = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
       CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderdate,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
       MIN(o_orderdate) AS min_date,
       MAX(o_orderdate) AS max_date,
       COUNT(DISTINCT o_orderstatus) AS n_status,
       COUNT(DISTINCT o_orderpriority) AS n_priority,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
"""


# -- q4: order priority checking (TPC-H Q4 shape) ------------------------

def q_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted to the fixture's lineitem columns):
    orders in a quarter having AT LEAST ONE returned line — the EXISTS
    correlated subquery, planned as a left-semi join so each order is
    emitted once no matter how many lines qualify.  The quarter filter
    prunes the orders scan; the semi join's build side is the filtered
    lineitem keys."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-04-01").cast("timestamp")
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    returned = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


# -- q12: shipmode service levels (TPC-H Q12 shape) ----------------------

def q_q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted to the fixture's lineitem columns): per
    line status, how many of a year's shipped lines belong to urgent vs
    non-urgent orders — a fact→fact join whose aggregate is pure
    conditional counting (two CASE sums, one agg on the bounded status
    key), with the date-window predicate pushed into the lineitem
    scan."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    orders = load_table(spark, "orders", sf_dir)
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


SQL_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
"""


# -- sliding time windows ------------------------------------------------

def q_events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (1-hour windows every 15 minutes):
    Spark's ``window(ts, size, slide)`` assigns each event to
    size/slide = 4 overlapping windows — the rolling-rate view every
    monitoring pipeline keeps.  The expansion happens in the scan stage
    (Expand operator, no shuffle), then ONE map-side-combined agg on
    (window, event_type); the oracle replicates the assignment by
    exploding each event onto its 4 aligned window starts."""
    events = load_table(spark, "events", sf_dir)
    return (
        events.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_exact("value", MONEY).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SQL_EVENTS_SLIDING = f"""
WITH slid AS (
  SELECT event_type, value,
         time_bucket(INTERVAL 15 MINUTE, ts)
           - (k * INTERVAL 15 MINUTE) AS w_start
  FROM events, unnest(range(0, 4)) AS t(k)
)
SELECT CAST(w_start AS TIMESTAMP) AS w_start, event_type,
       COUNT(*) AS n_events,
       {sql_sum_exact('value', MONEY)} AS sum_value
FROM slid
GROUP BY 1, 2
"""


# -- LOCF gap-fill -------------------------------------------------------

def q_events_locf_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: every event carries the most
    recent purchase value of its user (NULL before the first purchase)
    — the gap-fill every sparse time series needs before feature
    extraction.  One hash exchange + one sort; the carry is a
    ``last(ignoreNulls)`` running frame, never a self-join."""
    events = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pv = F.when(
        F.col("event_type") == "purchase",
        F.col("value").cast("decimal(18,2)"),
    )
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        F.last(pv, ignorenulls=True).over(w).cast("double").alias(
            "last_purchase_value"
        ),
    )


SQL_EVENTS_LOCF = """
SELECT event_id, user_id, event_type,
       CAST(LAST_VALUE(CASE WHEN event_type = 'purchase'
                            THEN CAST(value AS DECIMAL(18,2)) END
                       IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS last_purchase_value
FROM events
"""


# -- RFM segmentation ----------------------------------------------------

def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation: each
    dimension quartiled with the same broadcast-boundary discipline as
    ``customer_spend_quartiles`` (no ntile's single-task sort), then
    rolled up per (r, f, m) cell.

    Exactness: recency is integer days, frequency an integer count,
    monetary an exact decimal sum cast once; all nine boundaries come
    from one percentile aggregation and compare deterministically."""
    orders = load_table(spark, "orders", sf_dir)
    anchor = F.lit("1997-01-01").cast("timestamp")
    rfm = orders.groupBy("o_custkey").agg(
        F.min(F.datediff(anchor, F.col("o_orderdate"))).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        # decimal sum kept exact for the downstream cell rollup (double
        # summation is order-dependent); the double twin feeds the
        # percentile boundaries
        F.sum(dec("o_totalprice", MONEY)).alias("monetary_dec"),
    ).withColumn("monetary", F.col("monetary_dec").cast("double"))
    bounds = rfm.agg(
        *[
            F.expr(f"percentile({c}, {q})").alias(f"{c}_q{i}")
            for c in ("recency_days", "frequency", "monetary")
            for i, q in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )

    def bucket(c: str) -> F.Column:
        return (
            F.when(F.col(c) <= F.col(f"{c}_q1"), 1)
            .when(F.col(c) <= F.col(f"{c}_q2"), 2)
            .when(F.col(c) <= F.col(f"{c}_q3"), 3)
            .otherwise(4)
        )

    cells = rfm.crossJoin(F.broadcast(bounds)).select(
        bucket("recency_days").alias("r"),
        bucket("frequency").alias("f"),
        bucket("monetary").alias("m"),
        "monetary_dec",
    )
    return cells.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("monetary_dec")).cast("double").alias("cell_monetary"),
    )


SQL_CUSTOMER_RFM = f"""
WITH rfm AS (
  SELECT o_custkey,
         MIN(date_diff('day', CAST(o_orderdate AS DATE),
                       DATE '1997-01-01')) AS recency_days,
         COUNT(*) AS frequency,
         SUM(CAST(o_totalprice AS {MONEY})) AS monetary_dec,
         CAST(SUM(CAST(o_totalprice AS {MONEY})) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
),
bounds AS (
  SELECT quantile_cont(recency_days, 0.25) AS recency_days_q1,
         quantile_cont(recency_days, 0.50) AS recency_days_q2,
         quantile_cont(recency_days, 0.75) AS recency_days_q3,
         quantile_cont(frequency, 0.25) AS frequency_q1,
         quantile_cont(frequency, 0.50) AS frequency_q2,
         quantile_cont(frequency, 0.75) AS frequency_q3,
         quantile_cont(monetary, 0.25) AS monetary_q1,
         quantile_cont(monetary, 0.50) AS monetary_q2,
         quantile_cont(monetary, 0.75) AS monetary_q3
  FROM rfm
)
SELECT CASE WHEN recency_days <= recency_days_q1 THEN 1
            WHEN recency_days <= recency_days_q2 THEN 2
            WHEN recency_days <= recency_days_q3 THEN 3 ELSE 4 END AS r,
       CASE WHEN frequency <= frequency_q1 THEN 1
            WHEN frequency <= frequency_q2 THEN 2
            WHEN frequency <= frequency_q3 THEN 3 ELSE 4 END AS f,
       CASE WHEN monetary <= monetary_q1 THEN 1
            WHEN monetary <= monetary_q2 THEN 2
            WHEN monetary <= monetary_q3 THEN 3 ELSE 4 END AS m,
       COUNT(*) AS n_customers,
       CAST(SUM(monetary_dec) AS DOUBLE) AS cell_monetary
FROM rfm, bounds
GROUP BY 1, 2, 3
"""


# -- grouped closed-form OLS (trend per key) -----------------------------

def q_events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend of ``value`` over time —
    the "is this metric drifting" query, fit in CLOSED FORM from five
    sufficient statistics (n, Σt, Σy, Σty, Σt²) in ONE map-side-
    combined aggregation.  No ML-library fit loop, no second pass: the
    regression over 100 TB costs exactly one aggregation shuffle of
    five numbers per key.

    Exactness discipline: t is integer hours since epoch, y is the
    2-decimal value as DECIMAL — every sufficient statistic is an
    exact integer/decimal sum, with operand widths chosen so no
    product exceeds DECIMAL(38) (Spark and DuckDB both round once the
    38-digit cap is hit, and not identically).  slope's numerator and
    denominator are exact decimals; the slope itself is then ONE
    double division, and the intercept re-uses that double in an
    identical expression tree on both engines."""
    ev = load_table(spark, "events", sf_dir)
    staged = ev.select(
        "event_type",
        # hour index via date_trunc FIRST: truncating the timestamp
        # before the epoch conversion keeps both engines in integer
        # space (DuckDB's epoch() returns fractional seconds and its
        # double→BIGINT cast ROUNDS where Spark's unix_timestamp
        # floors — a one-second skew on sub-second events)
        F.expr(
            "cast(unix_timestamp(date_trunc('hour', ts)) as bigint) div 3600"
        ).alias("t"),
        dec("value", MONEY).alias("y"),
    )
    agg = staged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(F.expr(f"cast(t as decimal(14,0)) * cast(y as {MONEY})")).alias(
            "sty"
        ),
        F.sum(F.expr("t * t")).alias("st2"),
    )
    return agg.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.expr(
            "cast(cast(n as decimal(8,0)) * cast(sty as decimal(24,2))"
            " - cast(st as decimal(14,0)) * cast(sy as decimal(20,2))"
            " as double)"
            " / cast(cast(n as decimal(8,0)) * cast(st2 as decimal(18,0))"
            " - cast(st as decimal(14,0)) * cast(st as decimal(14,0))"
            " as double)"
        ).alias("slope_per_hour"),
    ).select(
        "event_type",
        "n_events",
        "slope_per_hour",
    )


SQL_EVENTS_VALUE_TREND = f"""
WITH staged AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS t,
         CAST(value AS {MONEY.upper()}) AS y
  FROM events
),
agg AS (
  SELECT event_type, COUNT(*) AS n, SUM(t) AS st, SUM(y) AS sy,
         SUM(CAST(t AS DECIMAL(14,0)) * CAST(y AS {MONEY.upper()})) AS sty,
         SUM(t * t) AS st2
  FROM staged GROUP BY event_type
)
SELECT event_type, n AS n_events,
       CAST(CAST(n AS DECIMAL(8,0)) * CAST(sty AS DECIMAL(24,2))
            - CAST(st AS DECIMAL(14,0)) * CAST(sy AS DECIMAL(20,2)) AS DOUBLE)
       / CAST(CAST(n AS DECIMAL(8,0)) * CAST(st2 AS DECIMAL(18,0))
            - CAST(st AS DECIMAL(14,0)) * CAST(st AS DECIMAL(14,0)) AS DOUBLE)
         AS slope_per_hour
FROM agg
"""


# -- unpivot (wide → long) -----------------------------------------------

def q_orders_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-status metrics melted back to long (status, metric,
    value) rows via ``DataFrame.unpivot`` — the metrics-table shape
    monitoring stores ingest.  The wide aggregate is one
    map-side-combined agg on the bounded status key; the unpivot is an
    Expand in the same stage (no shuffle added)."""
    orders = load_table(spark, "orders", sf_dir)
    wide = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum(dec("o_totalprice", MONEY)).cast("double").alias("total_price"),
        F.min(dec("o_totalprice", MONEY)).cast("double").alias("min_price"),
        F.max(dec("o_totalprice", MONEY)).cast("double").alias("max_price"),
    )
    return wide.unpivot(
        ids=["o_orderstatus"],
        values=["n_orders", "total_price", "min_price", "max_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


SQL_ORDERS_UNPIVOT = f"""
WITH wide AS (
  SELECT o_orderstatus,
         CAST(COUNT(*) AS DOUBLE) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS {MONEY})) AS DOUBLE) AS total_price,
         CAST(MIN(CAST(o_totalprice AS {MONEY})) AS DOUBLE) AS min_price,
         CAST(MAX(CAST(o_totalprice AS {MONEY})) AS DOUBLE) AS max_price
  FROM orders GROUP BY o_orderstatus
)
UNPIVOT wide
ON n_orders, total_price, min_price, max_price
INTO NAME metric VALUE value
"""


# -- pivot (long → wide) --------------------------------------------------

#: the order-status domain, pinned so the pivot never needs the extra
#: distinct-collect job Spark runs when values are left implicit — at
#: 100 TB that job is a full scan spent discovering three letters
PIVOT_STATUSES = ["O", "F", "P"]


def q_orders_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long → wide pivot: per-priority order counts and revenue, one
    column pair per order status — the cross-tab shape every BI layer
    asks of an analytics engine (inverse of ``orders_unpivot_metrics``).

    Scale discipline: the pivot values are DECLARED (`PIVOT_STATUSES`)
    — ``pivot(col)`` without values runs a separate distinct-collect
    job over the corpus before the real aggregation, and an unbounded
    value domain would mint unbounded columns.  With values pinned the
    whole query is ONE map-side-combined hash aggregate on the bounded
    priority key (Spark plans pivot-with-values as a single agg over
    `pivotfirst`/conditional partials — no join, no second scan);
    revenue sums stay exact decimal until the final double cast."""
    orders = load_table(spark, "orders", sf_dir)
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", PIVOT_STATUSES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("o_totalprice", MONEY)).alias("rev"),
        )
    )
    cols = [F.col("o_orderpriority")]
    for s in PIVOT_STATUSES:
        cols.append(F.coalesce(f"{s}_n", F.lit(0)).alias(f"n_{s.lower()}"))
        cols.append(
            F.coalesce(F.col(f"{s}_rev").cast("double"), F.lit(0.0)).alias(
                f"rev_{s.lower()}"
            )
        )
    return wide.select(*cols)


SQL_ORDERS_PIVOT = f"""
SELECT o_orderpriority,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_o,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O'
                         THEN CAST(o_totalprice AS {MONEY}) END), 0)
            AS DOUBLE) AS rev_o,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_f,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F'
                         THEN CAST(o_totalprice AS {MONEY}) END), 0)
            AS DOUBLE) AS rev_f,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS n_p,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P'
                         THEN CAST(o_totalprice AS {MONEY}) END), 0)
            AS DOUBLE) AS rev_p
FROM orders
GROUP BY o_orderpriority
"""


# -- dense time-grid fill (zero rows for silent hours) --------------------

def q_events_dense_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hourly rollup DENSIFIED: every (hour, event_type) cell in
    the corpus's [min, max] hour range appears, silent hours as
    explicit zero rows — dashboards, anomaly baselines and downsampled
    exports all need the gap rows a plain ``groupBy`` never emits.

    Scale shape: the raw corpus is touched exactly once (the same
    rollup as ``events_hourly``); the hour grid is GENERATED
    (``sequence`` + explode) from the rollup's own 1-row min/max
    aggregate and crossed with the rollup-derived type dimension.
    The fill join broadcasts the ROLLUP side (``F.broadcast(hourly)``
    — hours × types cells, the only side whose size is knowable and
    bounded), so the grid never shuffles and the fill is free."""
    from pu4spark_spark.plans import cached

    events = load_table(spark, "events", sf_dir)
    # cached(): bounds, types, and the fill join all read this rollup
    hourly = cached(
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        ).agg(F.count(F.lit(1)).alias("n_events"))
    )
    bounds = hourly.agg(
        F.min("hour").alias("__mn"), F.max("hour").alias("__mx")
    )
    grid_hours = bounds.select(
        F.explode(
            F.sequence("__mn", "__mx", F.expr("interval 1 hour"))
        ).alias("hour")
    )
    types = hourly.select("event_type").distinct()
    grid = grid_hours.crossJoin(types)
    return (
        grid
        .join(F.broadcast(hourly), ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


SQL_EVENTS_DENSE_HOURLY = """
WITH hourly AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(hour) AS mn, MAX(hour) AS mx FROM hourly),
grid AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
  FROM bounds
),
types AS (SELECT DISTINCT event_type FROM hourly)
SELECT g.hour, t.event_type,
       CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events
FROM grid g
CROSS JOIN types t
LEFT JOIN hourly h ON h.hour = g.hour AND h.event_type = t.event_type
"""


# -- fuzzy record linkage (blocked edit-distance join) --------------------

LINK_MAX_LEV = 3


def q_part_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage over the part catalogue: candidate
    duplicate listings whose names are within ``LINK_MAX_LEV`` edits,
    found by BLOCKING — the entity-resolution pattern (Fellegi–Sunter
    style pipelines, Splink, dedupe.io) that makes pairwise string
    comparison feasible at scale.

    The all-pairs levenshtein is O(n²) and dead at 100 TB; blocking on
    a selective key — here (product noun, size) — turns it into
    Σ block², with block size bounded by the key's selectivity (≤ ~70
    rows at sf0.1; the blocking-key-choice lesson is the point of the
    operator).  The join itself is a plain equi-join on the block key,
    so Catalyst shuffles both sides once and the quadratic work is
    partition-local; ``a.key < b.key`` halves the pairs and drops
    self-matches.  Edit distance is an exact integer, so the per-block
    histogram hash-checks."""
    parts = load_table(spark, "part", sf_dir).select(
        "p_partkey",
        "p_name",
        "p_size",
        F.split("p_name", " ").getItem(1).alias("blk"),
    )
    a = parts.alias("a")
    b = parts.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.p_size") == F.col("b.p_size"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    ).filter(
        (F.col("a.p_name") != F.col("b.p_name"))
        & (
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            <= LINK_MAX_LEV
        )
    )
    return pairs.groupBy(
        F.col("a.blk").alias("blk"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
        .cast("bigint")  # oracle's levenshtein is BIGINT
        .alias("lev"),
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


SQL_PART_FUZZY_MATCHES = f"""
WITH p AS (
  SELECT p_partkey, p_name, p_size,
         string_split(p_name, ' ')[2] AS blk
  FROM part
)
SELECT a.blk AS blk,
       levenshtein(a.p_name, b.p_name) AS lev,
       COUNT(*) AS n_pairs
FROM p a JOIN p b
  ON a.blk = b.blk AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE a.p_name <> b.p_name
  AND levenshtein(a.p_name, b.p_name) <= {LINK_MAX_LEV}
GROUP BY 1, 2
"""


# -- time-weighted average (TWAP) -----------------------------------------

def q_events_time_weighted_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user TIME-weighted average event value — the TWAP/metering
    aggregate (billing meters, price feeds, sensor state): each
    observation holds until the next one, so its weight is the seconds
    it was in force, not 1.  The arithmetic mean over-weights bursts;
    the time-weighted mean is what "average state over the window"
    actually means.

    One shuffle on ``user_id`` serves both the ``lead`` window and the
    rollup (the window's partitioning satisfies the groupBy's
    requirement — Catalyst plans them in one exchange).  Weights are
    exact integer seconds, values exact decimal; only the final
    weighted-mean division is IEEE, replicated verbatim in the oracle
    so the result hash-checks.  The last observation per user has no
    successor and is excluded (open interval) — the choice the oracle
    encodes too."""
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    stepped = events.select(
        "user_id",
        "ts",
        "event_id",
        dec("value", MONEY).alias("__v"),
    ).withColumn("__next_ts", F.lead("ts").over(w))
    # microsecond difference: exact integers on both engines (a
    # per-timestamp second truncation would disagree with the oracle's
    # fractional epoch on sub-second data)
    weighted = stepped.filter(F.col("__next_ts").isNotNull()).withColumn(
        "__us",
        (F.unix_micros("__next_ts") - F.unix_micros("ts")).cast("bigint"),
    )
    return (
        weighted.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("__us").alias("total_micros"),
            F.sum(F.col("__v") * F.col("__us")).alias("__num"),
        )
        .select(
            "user_id",
            "n_intervals",
            "total_micros",
            # exact integer cents-micros -> ONE bigint->double cast per
            # operand, then pure IEEE arithmetic: a direct wide-decimal
            # ->double cast rounds differently across engines past 2^53
            (
                (F.col("__num") * 100).cast("bigint").cast("double")
                / (F.col("total_micros").cast("double") * F.lit(100.0))
            ).alias("twap"),
        )
    )


SQL_EVENTS_TIME_WEIGHTED = f"""
WITH stepped AS (
  SELECT user_id, event_id,
         CAST(value AS {MONEY}) AS v,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id)) - epoch_us(ts)
           AS us
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_intervals,
       CAST(SUM(us) AS BIGINT) AS total_micros,
       CAST(CAST(SUM(v * us) * 100 AS BIGINT) AS DOUBLE)
         / (CAST(SUM(us) AS DOUBLE) * 100.0) AS twap
FROM stepped
WHERE us IS NOT NULL
GROUP BY user_id
"""


# -- rate-anomaly detection ----------------------------------------------

ANOMALY_Z = 2.0


def q_events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose event rate deviates ≥ 2σ from that event type's
    hourly mean — the monitoring query every event pipeline runs over
    its own hourly rollup.

    Composition discipline: the hourly counts are the SAME aggregation
    as ``events_hourly``; per-type moments are exact integer sums over
    the (bounded-key) rollup, and the z chain is the verbatim IEEE
    sqrt/divide replica of the oracle (the ``text_zscore_by_lang``
    exactness discipline), so even the flag boundary is deterministic.
    Two map-side-combined aggs + a broadcast-back join on event_type —
    nothing touches the raw corpus twice.
    """
    events = load_table(spark, "events", sf_dir)
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__nh"),
        F.sum("n").alias("__s"),
        F.sum(F.col("n") * F.col("n")).alias("__sq"),
    )
    nh = F.col("__nh").cast("double")
    s = F.col("__s").cast("double")
    sq = F.col("__sq").cast("double")
    mean = s / nh
    var = (nh * sq - s * s) / (nh * (nh - F.lit(1.0)))
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return (
        hourly.join(stats, "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= ANOMALY_Z)
        .select("event_type", "hour", "n", "z")
    )


SQL_EVENTS_HOURLY_ANOMALIES = f"""
WITH hourly AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, COUNT(*) AS nh, SUM(n) AS s, SUM(n * n) AS sq
  FROM hourly GROUP BY event_type
)
SELECT event_type, hour, n, z
FROM (
  SELECT event_type, hour, n,
         (CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / CAST(nh AS DOUBLE))
           / sqrt((CAST(nh AS DOUBLE) * CAST(sq AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                  / (CAST(nh AS DOUBLE) * (CAST(nh AS DOUBLE) - 1.0))) AS z
  FROM hourly JOIN stats USING (event_type)
)
WHERE abs(z) >= {ANOMALY_Z}
"""


# -- SCD2 validity intervals ---------------------------------------------

def q_orders_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 over the CDC change set: each
    key's versions become validity intervals via ``lead()`` per key —
    the current row is the one with no successor.  (The SCD1 keep-latest
    twin is ``orders_upsert_compact``; together they are the two MERGE
    disciplines.)  One hash-partitioned window on the key, then a
    map-side-combined rollup to the bounded (version, is_current)
    report."""
    orders = load_table(spark, "orders", sf_dir)
    base = orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        F.lit(0).alias("version"),
    )
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        (
            F.col("o_totalprice").cast("decimal(12,2)")
            + F.lit("100.00").cast("decimal(12,2)")
        )
        .cast("decimal(12,2)")
        .alias("price"),
        F.lit(1).alias("version"),
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.asc("version"))
    hist = base.unionByName(updates).withColumn(
        "valid_to", F.lead("version").over(w)
    )
    return (
        hist.withColumn("is_current", F.col("valid_to").isNull())
        .groupBy("version", "is_current")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").cast("double").alias("sum_price"),
        )
    )


SQL_ORDERS_SCD2 = """
WITH base AS (
  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
         0 AS version
  FROM orders
),
updates AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) + CAST('100.00' AS DECIMAL(12,2)) AS DECIMAL(12,2)) AS price,
         1 AS version
  FROM orders WHERE o_orderkey % 7 = 0
),
hist AS (
  SELECT *, LEAD(version) OVER (PARTITION BY o_orderkey
                                ORDER BY version ASC) AS valid_to
  FROM (SELECT * FROM base UNION ALL SELECT * FROM updates)
)
SELECT version, valid_to IS NULL AS is_current,
       COUNT(*) AS n_rows,
       CAST(SUM(price) AS DOUBLE) AS sum_price
FROM hist
GROUP BY 1, 2
"""


# -- VARIANT semi-structured path ----------------------------------------

def q_events_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path over the JSON props column: ``parse_json``
    once into the binary variant encoding, then typed ``variant_get``
    extraction — the modern semi-structured pipeline (vs the string
    re-parse per access of ``get_json_object``).  Per-row scan-stage
    work plus one map-side-combined agg on a (event_type, decile) key.
    """
    events = load_table(spark, "events", sf_dir)
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return (
        events.select("event_type", k.alias("__k"))
        .groupBy("event_type", (F.col("__k") % 10).alias("k_decile"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__k").alias("sum_k"),
        )
    )


SQL_EVENTS_VARIANT = """
SELECT event_type,
       CAST(k % 10 AS BIGINT) AS k_decile,
       COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY 1, 2
"""


# -- scalable quartile assignment ----------------------------------------

def q_customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global spend quartiles WITHOUT a global sort: exact interpolated
    boundary values from one percentile aggregation (single reduce to
    a 3-value row), broadcast back over the per-customer spend table,
    bucket assignment as scan-stage comparisons.  ``ntile(4)`` over an
    unpartitioned window would funnel every row through ONE task; this
    shape is two map-side-combined aggs + a 1-row broadcast, and stays
    that at any scale.  Boundary doubles are identical in both engines
    (same p·(n−1) interpolation over exact-decimal-derived inputs), so
    bucket assignment is deterministic.  (Exact ``percentile`` buffers
    the per-customer values on the final reduce — at 100 TB swap the
    boundary agg for ``approx_percentile``'s mergeable sketch, as
    ``lineitem_price_percentiles_approx`` demonstrates; the broadcast
    shape is unchanged.)"""
    orders = load_table(spark, "orders", sf_dir)
    spend = orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice", MONEY)).cast("double").alias("spend")
    )
    bounds = spend.agg(
        F.expr("percentile(spend, 0.25)").alias("q1"),
        F.expr("percentile(spend, 0.50)").alias("q2"),
        F.expr("percentile(spend, 0.75)").alias("q3"),
    )
    bucketed = spend.crossJoin(F.broadcast(bounds)).withColumn(
        "quartile",
        F.when(F.col("spend") <= F.col("q1"), 1)
        .when(F.col("spend") <= F.col("q2"), 2)
        .when(F.col("spend") <= F.col("q3"), 3)
        .otherwise(4),
    )
    return bucketed.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("spend").alias("min_spend"),
        F.max("spend").alias("max_spend"),
    )


SQL_SPEND_QUARTILES = f"""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS {MONEY})) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
),
bounds AS (
  SELECT quantile_cont(spend, 0.25) AS q1,
         quantile_cont(spend, 0.50) AS q2,
         quantile_cont(spend, 0.75) AS q3
  FROM spend
)
SELECT CASE WHEN spend <= q1 THEN 1
            WHEN spend <= q2 THEN 2
            WHEN spend <= q3 THEN 3
            ELSE 4 END AS quartile,
       COUNT(*) AS n_customers,
       MIN(spend) AS min_spend,
       MAX(spend) AS max_spend
FROM spend, bounds
GROUP BY 1
"""


# -- q18: large-volume orders (TPC-H Q18 shape) --------------------------

Q18_QTY_THRESHOLD = 250


def q_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, with customer context — the aggregation-driven semi-join
    (HAVING feeds the probe side).  The qualifying-order set is
    selectivity-bounded (top ~1%), so its join back onto orders is an
    AQE broadcast; quantities sum as exact decimals."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", MONEY)).alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY_THRESHOLD)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


SQL_Q18 = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS {_M})) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS {_M})) > {Q18_QTY_THRESHOLD}) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# -- ordered funnel conversion -------------------------------------------

def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: a user converts a stage only
    if the required prior stage happened STRICTLY EARLIER in their
    event order — the product-analytics query sessionization feeds.

    Execution shape: both "earliest qualifying prior stage" columns are
    running-min window frames over the SAME (user_id, ts, event_id)
    sort, so Catalyst plans ONE hash exchange + ONE sort feeding two
    Window operators; the final distinct-user rollup is a single
    map-side-combined aggregation.  Nothing here is per-stage-joins —
    the k-stage funnel stays one shuffle regardless of k or corpus
    size, and user_id is a cardinality-scaling key.
    """
    events = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    before = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = events.withColumn(
        "__fv",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(before),
    )
    staged = staged.withColumn(
        "__fc",
        F.min(
            F.when(
                (F.col("event_type") == "click") & F.col("__fv").isNotNull(),
                F.col("ts"),
            )
        ).over(before),
    )
    return staged.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("n_view_users"),
        F.countDistinct(
            F.when(
                (F.col("event_type") == "click") & F.col("__fv").isNotNull(),
                F.col("user_id"),
            )
        ).alias("n_click_users"),
        F.countDistinct(
            F.when(
                (F.col("event_type") == "purchase") & F.col("__fc").isNotNull(),
                F.col("user_id"),
            )
        ).alias("n_purchase_users"),
    )


SQL_EVENTS_FUNNEL = """
WITH f AS (
  SELECT user_id, ts, event_id, event_type
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
w1 AS (
  SELECT *,
         MIN(CASE WHEN event_type = 'view' THEN ts END) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS fv
  FROM f
),
w2 AS (
  SELECT *,
         MIN(CASE WHEN event_type = 'click' AND fv IS NOT NULL THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS fc
  FROM w1
)
SELECT COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END)
         AS n_view_users,
       COUNT(DISTINCT CASE WHEN event_type = 'click' AND fv IS NOT NULL
                           THEN user_id END) AS n_click_users,
       COUNT(DISTINCT CASE WHEN event_type = 'purchase' AND fc IS NOT NULL
                           THEN user_id END) AS n_purchase_users
FROM w2
"""


# -- cohort retention ----------------------------------------------------

def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention: users grouped by their first-ever active
    day, counted on each later day they return.

    The cohort day comes from an UNORDERED window min over user_id —
    one hash exchange, no sort, and no self-join back onto the fact
    (the groupBy-then-join formulation would shuffle the corpus twice).
    The (cohort, offset) rollup's distinct-count partials combine
    map-side.  Two data-size shuffles total, both on scaling keys.
    """
    events = load_table(spark, "events", sf_dir)
    day = F.date_trunc("day", F.col("ts"))
    cohort = F.min(day).over(Window.partitionBy("user_id"))
    return (
        events.select(
            "user_id",
            day.alias("__day"),
            cohort.alias("cohort_day"),
        )
        .groupBy(
            "cohort_day",
            F.datediff(F.col("__day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


SQL_EVENTS_RETENTION = """
WITH d AS (
  SELECT user_id,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         MIN(CAST(date_trunc('day', ts) AS TIMESTAMP))
           OVER (PARTITION BY user_id) AS cohort_day
  FROM events
)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM d
GROUP BY 1, 2
"""


# -- winsorized robust statistics ----------------------------------------

def q_lineitem_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (P5/P95-clamped) mean price per return flag — the
    robust-statistics shape that survives fat-tailed value columns.

    The P5/P95 boundaries come from a per-group 64-bin equi-width
    histogram sketch (the ``lineitem_histogram_quantiles`` chain, here
    partitioned by group), NOT Spark's exact ``percentile()``: the
    exact aggregate buffers a value→count map per group whose state is
    unbounded on a fat-tailed value column at 100 TB, while the
    histogram is a fixed 64-counter row per group, mergeable by
    addition, map-side combined (plan-gated in
    ``tests/test_plans.py`` — no ``percentile(`` in this plan).  Three
    scans total: per-group (min, max, n) scalars; the binned counts
    (≤ groups×64 rows) interpolated into boundary ESTIMATES; then one
    map-side-combined aggregation of the clamped values.  The
    interpolation is a replicated IEEE chain, so DuckDB hash-checks
    the sketch-derived boundaries themselves.  Exactness discipline
    (SURVEY.md §5b lesson 8): summing clamped DOUBLES would be
    order-dependent, so the mean is decomposed into an exact decimal
    sum of the in-range prices plus count×boundary for each clamped
    tail — integers and two multiplications, one final IEEE division,
    bit-identical across engines."""
    li = load_table(spark, "lineitem", sf_dir)
    pr = F.col("l_extendedprice")
    gb = li.groupBy("l_returnflag").agg(
        F.min(pr).alias("mn"),
        F.max(pr).alias("mx"),
        F.count(F.lit(1)).alias("n_grp"),
    )
    binned = (
        li.select("l_returnflag", pr.alias("x"))
        .join(F.broadcast(gb), "l_returnflag")
        .select(
            "l_returnflag",
            # degenerate all-equal group: pin bin 0 (the quantile-
            # normalize guard — unguarded (mx-mn) division NULLs the
            # bins and the group vanishes from the output)
            F.when(
                F.col("mx") == F.col("mn"), F.lit(0).cast("bigint")
            ).otherwise(
                F.least(
                    F.floor(
                        ((F.col("x") - F.col("mn")) * F.lit(float(HIST_BINS)))
                        / (F.col("mx") - F.col("mn"))
                    ),
                    F.lit(HIST_BINS - 1).cast("bigint"),
                )
            ).alias("bin"),
        )
        .groupBy("l_returnflag", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wc = Window.partitionBy("l_returnflag").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = binned.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(wc), F.lit(0))
    )
    probes = gb.select(
        "l_returnflag",
        "mn",
        "mx",
        "n_grp",
        F.explode(F.array(F.lit(0.05), F.lit(0.95))).alias("p"),
    ).withColumn("target", F.col("p") * F.col("n_grp").cast("double"))
    width = (F.col("mx") - F.col("mn")) / F.lit(float(HIST_BINS))
    frac = (
        F.col("target") - F.col("cum_before").cast("double")
    ) / F.col("cnt").cast("double")
    est = probes.join(
        F.broadcast(cum),
        (probes["l_returnflag"] == cum["l_returnflag"])
        & (F.col("cum_before").cast("double") < F.col("target"))
        & (
            F.col("target")
            <= (F.col("cum_before") + F.col("cnt")).cast("double")
        ),
    ).select(
        probes["l_returnflag"],
        "p",
        (
            F.col("mn") + (F.col("bin").cast("double") + frac) * width
        ).alias("q_est"),
    )
    bounds = est.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("p") == 0.05, F.col("q_est"))).alias("p05"),
        F.max(F.when(F.col("p") == 0.95, F.col("q_est"))).alias("p95"),
    )
    joined = li.select("l_returnflag", "l_extendedprice").join(
        F.broadcast(bounds), "l_returnflag"
    )
    agg = joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(
                F.when(
                    (pr >= F.col("p05")) & (pr <= F.col("p95")),
                    pr.cast(MONEY),
                )
            ),
            F.lit(0).cast(MONEY),
        ).alias("sum_mid"),
        F.sum(F.when(pr < F.col("p05"), 1).otherwise(0)).alias("n_low"),
        F.sum(F.when(pr > F.col("p95"), 1).otherwise(0)).alias("n_high"),
        F.max("p05").alias("p05"),
        F.max("p95").alias("p95"),
    )
    wins_mean = (
        F.col("sum_mid").cast("double")
        + F.col("n_low") * F.col("p05")
        + F.col("n_high") * F.col("p95")
    ) / F.col("n")
    return agg.select(
        "l_returnflag", "n", "n_low", "n_high", "p05", "p95",
        wins_mean.alias("winsorized_mean"),
    )


SQL_LINEITEM_WINSORIZED = f"""
WITH bounds AS (
  SELECT l_returnflag,
         p05, p95
  FROM (
    SELECT l_returnflag,
           MAX(CASE WHEN p = 0.05 THEN q_est END) AS p05,
           MAX(CASE WHEN p = 0.95 THEN q_est END) AS p95
    FROM (
      SELECT pr.l_returnflag, pr.p,
             mn + (CAST(bin AS DOUBLE)
                   + (target - CAST(cum_before AS DOUBLE))
                     / CAST(cnt AS DOUBLE))
                  * ((mx - mn) / {_BINS_F}) AS q_est
      FROM (
        SELECT g.l_returnflag, g.mn, g.mx, g.n_grp, t.p,
               t.p * CAST(g.n_grp AS DOUBLE) AS target
        FROM (
          SELECT l_returnflag, MIN(l_extendedprice) AS mn,
                 MAX(l_extendedprice) AS mx, COUNT(*) AS n_grp
          FROM lineitem GROUP BY l_returnflag
        ) g, UNNEST([0.05, 0.95]) AS t(p)
      ) pr
      JOIN (
        SELECT l_returnflag, bin, cnt,
               COALESCE(SUM(cnt) OVER (PARTITION BY l_returnflag
                 ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_before
        FROM (
          SELECT l.l_returnflag,
                 CASE WHEN g.mx = g.mn THEN 0
                      ELSE least(floor(((l.l_extendedprice - g.mn) * {_BINS_F})
                                       / (g.mx - g.mn)), {_BINS_M1})
                 END AS bin,
                 COUNT(*) AS cnt
          FROM lineitem l JOIN (
            SELECT l_returnflag, MIN(l_extendedprice) AS mn,
                   MAX(l_extendedprice) AS mx
            FROM lineitem GROUP BY l_returnflag
          ) g ON l.l_returnflag = g.l_returnflag
          GROUP BY 1, 2
        )
      ) cm ON pr.l_returnflag = cm.l_returnflag
          AND CAST(cum_before AS DOUBLE) < target
          AND target <= CAST(cum_before + cnt AS DOUBLE)
    )
    GROUP BY l_returnflag
  )
),
agg AS (
  SELECT l.l_returnflag,
         COUNT(*) AS n,
         COALESCE(SUM(CASE WHEN l_extendedprice >= p05
                            AND l_extendedprice <= p95
                           THEN CAST(l_extendedprice AS DECIMAL(18,2)) END),
                  CAST(0 AS DECIMAL(18,2))) AS sum_mid,
         CAST(SUM(CASE WHEN l_extendedprice < p05 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_low,
         CAST(SUM(CASE WHEN l_extendedprice > p95 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_high,
         MAX(p05) AS p05,
         MAX(p95) AS p95
  FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
  GROUP BY l.l_returnflag
)
SELECT l_returnflag, n, n_low, n_high, p05, p95,
       (CAST(sum_mid AS DOUBLE) + n_low * p05 + n_high * p95) / n
         AS winsorized_mean
FROM agg
"""


# -- time-hierarchy rollup (hypertable-style multi-granularity) ----------

def q_events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup — day ⊃ hour subtotals plus the
    grand total from ONE scan, the continuous-aggregate/hypertable
    pattern: ``ROLLUP(day, hour)`` expands grouping sets inside the
    aggregation stage (Catalyst's Expand), so the fact table is read
    once and the exchange carries only pre-aggregated (day, hour)
    partials — never one pass per granularity.  At 100 TB each extra
    granularity is free at scan time; only the (small) rollup output
    grows.  Restricted to click events so the filter is pushed to the
    parquet scan."""
    events = load_table(spark, "events", sf_dir)
    return (
        events.filter(F.col("event_type") == "click")
        .select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "value",
        )
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_exact("value", MONEY).alias("sum_value"),
        )
    )


SQL_EVENTS_TIME_ROLLUP = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
       COUNT(*) AS n_events,
       {sql_sum_exact('value', MONEY)} AS sum_value
FROM events
WHERE event_type = 'click'
GROUP BY ROLLUP (1, 2)
"""


# -- referential-integrity audit ----------------------------------------

#: every FK edge of the star schema: (edge name, child table, child key,
#: parent table, parent key)
_FK_EDGES = [
    ("lineitem.orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
]


def q_audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per foreign-key edge of the star schema: child-row count
    and orphan count (child keys with no parent) — the data-quality
    gate every warehouse load runs before trusting a join.

    Shape: per edge, a left-ANTI join of the child's key against the
    parent counts the orphans; parents are dimension-sized, so every
    anti-join broadcasts (no fact-table shuffle anywhere — for the
    fact→fact edge the child side aggregates to DISTINCT keys first,
    bounding the probe at key cardinality).  The seven per-edge 1-row
    aggregates union into a single Catalyst plan, so the whole audit
    is one job."""
    from functools import reduce

    out = []
    for name, child_t, ckey, parent_t, pkey in _FK_EDGES:
        child = load_table(spark, child_t, sf_dir)
        parent = load_table(spark, parent_t, sf_dir).select(
            F.col(pkey).alias("__pk")
        )
        n_child = child.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_child")
        )
        orphans = (
            child.select(F.col(ckey).alias("__ck"))
            .distinct()
            .join(parent, F.col("__ck") == F.col("__pk"), "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphan_keys"))
        )
        out.append(
            n_child.crossJoin(orphans).select(
                F.lit(name).alias("fk_edge"), "n_child", "n_orphan_keys"
            )
        )
    return reduce(lambda a, b: a.unionByName(b), out)


SQL_AUDIT_REFERENTIAL_INTEGRITY = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS fk_edge,
       (SELECT COUNT(*) FROM {child_t}) AS n_child,
       (SELECT COUNT(*) FROM (SELECT DISTINCT {ckey} FROM {child_t}) c
         WHERE NOT EXISTS (SELECT 1 FROM {parent_t} p
                           WHERE p.{pkey} = c.{ckey})) AS n_orphan_keys"""
    for name, child_t, ckey, parent_t, pkey in _FK_EDGES
)


# -- market-basket co-purchase pairs -------------------------------------

COPURCHASE_TOP_K = 25


def q_part_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-purchased part pairs — the item-item co-occurrence matrix
    behind "bought together" recommendations, built basket-wise: the
    distinct parts of each order pair up WITHIN the basket (a<b), one
    map-side-combined groupBy counts pairs across baskets, and the
    global top-K resolves via the two-phase rank (no global sort).

    Scale control is the basket bound: pair fan-out is
    O(Σ basket_size²), quadratic in the LARGEST basket, not the
    catalog — fine while baskets are small (retail orders: ≤ tens).
    A degenerate mega-basket (one "order" holding 10⁶ items) must be
    capped or sampled before pairing; the fixture's 7-line orders keep
    fan-out ≤ 21 pairs/order.  The within-basket pairing is a per-order
    ARRAY expansion (collect_set + nested transform, no self-join):
    one shuffle of the (order, part) list builds the baskets and the
    pairs fall out row-locally — never a catalog×catalog product."""
    # no .distinct() pre-pass here: _copurchase_topk's collect_set
    # dedups (order, part) itself, so the raw projection costs ONE
    # exchange instead of distinct-then-groupBy's two
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey"
    )
    return _copurchase_topk(li)


def _basket_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )


def _copurchase_topk(li: DataFrame) -> DataFrame:
    # within-basket pairing as a per-row ARRAY expansion (r15, guide
    # §2.4 — remove shuffles outright): one groupBy on the basket key
    # collects each basket's distinct parts sorted ascending, and the
    # (a < b) pairs fall out of a nested transform over that array —
    # the previous self-equi-join on o_orderkey cost two more
    # exchanges of the basket list to co-partition its sides.  Pair
    # fan-out stays O(basket²) per row, the documented scale bound.
    baskets = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    ps = F.col("ps")
    pair_structs = F.flatten(
        F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + F.lit(2), F.size(ps) - i - F.lit(1)),
                lambda y: F.struct(
                    x.alias("part_a"), y.alias("part_b")
                ),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    from pu4spark_spark.plans import two_phase_rank

    return two_phase_rank(
        pairs,
        [],
        [F.desc("n_baskets"), F.asc("part_a"), F.asc("part_b")],
        COPURCHASE_TOP_K,
        rank_col="rank",
    ).select(
        "part_a",
        "part_b",
        F.col("n_baskets").cast("bigint").alias("n_baskets"),
        "rank",
    )


SQL_PART_COPURCHASE_PAIRS = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*) AS n_baskets
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, CAST(n_baskets AS BIGINT) AS n_baskets,
       CAST(rank AS INTEGER) AS rank
FROM (SELECT part_a, part_b, n_baskets,
             ROW_NUMBER() OVER (ORDER BY n_baskets DESC,
                                part_a ASC, part_b ASC) AS rank
      FROM pairs)
WHERE rank <= {COPURCHASE_TOP_K}
"""


# -- association-rule metrics over the co-purchase pairs ------------------

def q_part_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support / confidence / lift for the top co-purchased part pairs
    — the association-rule metrics that turn raw co-occurrence counts
    into deployable "bought together" rules: confidence(a→b) is the
    recommendation's hit rate, lift > 1 separates genuine affinity
    from two independently-popular items colliding by volume.

    Scale shape: pair counts ride the same basket self-join as
    ``part_copurchase_pairs`` and the top-K resolves via the two-phase
    rank FIRST, so the per-item basket counts join onto a K-row
    broadcast side — the item-frequency table is scanned, never
    shuffled against the full pair matrix.  All inputs are exact int64
    basket counts; support/confidence/lift are fixed IEEE divisions
    replicated in the oracle."""
    from pu4spark_spark.plans import cached

    # the distinct basket list feeds FOUR consumers (basket total, both
    # sides of the pair self-join, and the item counts) — persist it so
    # the distinct runs once
    li = cached(_basket_items(spark, sf_dir))
    # basket total as the family's 1-row broadcast-scalar (no eager
    # driver-side count() job; the whole query stays one lazy plan)
    total = li.agg(F.countDistinct("l_orderkey").alias("__nb"))
    topk = _copurchase_topk(li)
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    # the K-row top-K side broadcasts; the item-frequency table is only
    # ever scanned, never shuffled against the pair matrix
    joined = (
        F.broadcast(topk)
        .join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(total))
    )
    n = F.col("__nb").cast("double")
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return joined.select(
        "part_a",
        "part_b",
        "n_baskets",
        "n_a",
        "n_b",
        "rank",
        (dbl("n_baskets") / n).alias("support"),
        (dbl("n_baskets") / dbl("n_a")).alias("conf_a_to_b"),
        (dbl("n_baskets") / dbl("n_b")).alias("conf_b_to_a"),
        (n * dbl("n_baskets") / (dbl("n_a") * dbl("n_b"))).alias("lift"),
    )


SQL_PART_ASSOCIATION_RULES = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
total AS (SELECT COUNT(DISTINCT l_orderkey) AS nb FROM li),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*) AS n_baskets
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
topk AS (
  SELECT part_a, part_b, CAST(n_baskets AS BIGINT) AS n_baskets,
         CAST(rank AS INTEGER) AS rank
  FROM (SELECT part_a, part_b, n_baskets,
               ROW_NUMBER() OVER (ORDER BY n_baskets DESC,
                                  part_a ASC, part_b ASC) AS rank
        FROM pairs)
  WHERE rank <= {COPURCHASE_TOP_K}
),
item AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item FROM li GROUP BY 1
)
SELECT t.part_a, t.part_b, t.n_baskets,
       ia.n_item AS n_a, ib.n_item AS n_b, t.rank,
       CAST(t.n_baskets AS DOUBLE) / CAST(nb AS DOUBLE) AS support,
       CAST(t.n_baskets AS DOUBLE) / CAST(ia.n_item AS DOUBLE)
         AS conf_a_to_b,
       CAST(t.n_baskets AS DOUBLE) / CAST(ib.n_item AS DOUBLE)
         AS conf_b_to_a,
       CAST(nb AS DOUBLE) * CAST(t.n_baskets AS DOUBLE)
         / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE)) AS lift
FROM topk t
JOIN item ia ON ia.l_partkey = t.part_a
JOIN item ib ON ib.l_partkey = t.part_b
CROSS JOIN total
"""


# -- join-key skew audit --------------------------------------------------

def q_audit_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew report for the fact table's join keys — the number you
    check BEFORE deciding to salt a join or trust AQE's skew split:
    per key column, the distinct-key count, the heaviest key's row
    share, and the ratio of the max key to the mean (1.0 = uniform).
    One map-side-combined groupBy per key column; the max/mean reduce
    to 1-row scalars (no sort, no collect of the frequency table);
    integer counts + one division each, oracle-portable."""
    li = load_table(spark, "lineitem", sf_dir)
    out = []
    for keycol in ("l_orderkey", "l_partkey", "l_suppkey"):
        freq = li.groupBy(keycol).agg(F.count(F.lit(1)).alias("n"))
        out.append(
            freq.agg(
                F.lit(keycol).alias("key_col"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.sum("n").cast("bigint").alias("n_rows"),
                F.max("n").cast("bigint").alias("max_key_rows"),
                (
                    F.max("n").cast("double")
                    * F.count(F.lit(1)).cast("double")
                    / F.sum("n").cast("double")
                ).alias("skew_ratio"),
            )
        )
    from functools import reduce

    return reduce(lambda x, y: x.unionByName(y), out)


SQL_AUDIT_JOIN_KEY_SKEW = "\nUNION ALL\n".join(
    f"""SELECT '{k}' AS key_col,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(MAX(n) AS BIGINT) AS max_key_rows,
       CAST(MAX(n) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)
         / CAST(SUM(n) AS DOUBLE) AS skew_ratio
FROM (SELECT {k}, COUNT(*) AS n FROM lineitem GROUP BY {k})"""
    for k in ("l_orderkey", "l_partkey", "l_suppkey")
)


def q_events_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-policy audit: how many events ARRIVE later than a
    30-minute / 1-hour / 2-hour watermark would tolerate, i.e. how
    much data each policy would silently drop — the number to check
    BEFORE picking the streaming pipeline's watermark, computed in
    batch over the same feed.

    Arrival order is a deterministic shuffle of the feed
    (``md5(event_id)`` — the fixture's event_ids are ts-ordered, so
    id-order arrival would make every policy trivially lossless; a
    production run substitutes the real ingest sequence number, same
    plan).  An event is late under watermark W iff its ts precedes
    the running max event-time of everything that arrived before it
    by more than W.  The running prefix max uses the range-bucket
    two-phase shape (per-arrival-bucket max → bucket-table cumulative
    offsets → in-bucket window), never a global ORDER BY window;
    ``greatest`` of the two parts handles bucket boundaries, with
    first-ever arrivals never late.  One corpus pass; the output is
    the 1-row policy report."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "ts",
        F.md5(F.col("event_id").cast("string")).alias("__ak"),
    ).withColumn("__b", F.substring("__ak", 1, 2))
    boff = (
        ev.groupBy("__b")
        .agg(F.max("ts").alias("__bm"))
        .withColumn(
            "__prev_max",
            F.max("__bm").over(
                Window.orderBy("__b").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .drop("__bm")
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy("__ak")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = (
        ev.withColumn("__in_max", F.max("ts").over(w_in))
        .join(boff, "__b")
        .withColumn("__rmb", F.greatest("__prev_max", "__in_max"))
    )

    def late(minutes: int):
        return F.sum(
            F.when(
                F.col("ts")
                < F.col("__rmb") - F.expr(f"INTERVAL {minutes} MINUTE"),
                1,
            ).otherwise(0)
        ).cast("bigint")

    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        late(30).alias("late_30m"),
        late(60).alias("late_1h"),
        late(120).alias("late_2h"),
        (late(120).cast("double") / F.count(F.lit(1))).alias("frac_late_2h"),
    )


SQL_EVENTS_WATERMARK_LATENESS = """
WITH r AS (
  SELECT event_id, ts,
         MAX(ts) OVER (ORDER BY md5(CAST(event_id AS VARCHAR))
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS rmb
  FROM events
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN ts < rmb - INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
            AS BIGINT) AS late_30m,
       CAST(SUM(CASE WHEN ts < rmb - INTERVAL 60 MINUTE THEN 1 ELSE 0 END)
            AS BIGINT) AS late_1h,
       CAST(SUM(CASE WHEN ts < rmb - INTERVAL 120 MINUTE THEN 1 ELSE 0 END)
            AS BIGINT) AS late_2h,
       CAST(SUM(CASE WHEN ts < rmb - INTERVAL 120 MINUTE THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS frac_late_2h
FROM r
"""


def q_events_dow_hour_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity matrix (the operations
    heatmap behind capacity planning and anomaly baselines): ONE
    map-side-combined groupBy over the bounded 7×24 key space — the
    corpus reduces to ≤168 rows on the exchange.  Weekday encoding is
    0=Monday (Spark ``weekday`` ≡ DuckDB ``isodow − 1``), the only
    dow convention both engines express without a modular dance."""
    events = load_table(spark, "events", sf_dir)
    return events.groupBy(
        F.weekday("ts").alias("dow"),
        F.hour("ts").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        sum_exact("value", MONEY).alias("sum_value"),
    )


SQL_EVENTS_DOW_HOUR_MATRIX = f"""
SELECT CAST(isodow(ts) - 1 AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER) AS hod,
       COUNT(*) AS n_events,
       {sql_sum_exact('value', MONEY)} AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_audit_join_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planning-time join-cardinality audit: the EXACT output size of
    the lineitem×lineitem self-join on ``l_partkey`` computed WITHOUT
    running the join — ``|A⋈B| = Σ_k n_a(k)·n_b(k)`` over per-key
    counts.  The number you check before launching a 100 TB join that
    might explode: per-side counts are one map-side-combined groupBy
    each (key-cardinality-sized output), the product-sum is a join of
    the two tiny count tables — total cost two scans + one
    counts-sized join, versus materializing a potentially quadratic
    result.  Also reports the hottest key's contribution (the AQE
    skew-split / salting decision input) and the amplification factor
    vs the fact row count.  All-integer arithmetic; one IEEE division."""
    li = load_table(spark, "lineitem", sf_dir)
    a = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("na")
    )
    b = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    prod = a.join(b, "k").select(
        "k", (F.col("na") * F.col("nb")).alias("p"), "na"
    )
    return prod.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("na").cast("bigint").alias("fact_rows"),
        F.sum("p").cast("bigint").alias("join_rows"),
        F.max("p").cast("bigint").alias("hottest_key_rows"),
        (F.sum("p").cast("double") / F.sum("na").cast("double")).alias(
            "amplification"
        ),
    )


SQL_AUDIT_JOIN_EXPLOSION = """
WITH c AS (
  SELECT l_partkey AS k, COUNT(*) AS n FROM lineitem GROUP BY l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(a.n) AS BIGINT) AS fact_rows,
       CAST(SUM(a.n * b.n) AS BIGINT) AS join_rows,
       CAST(MAX(a.n * b.n) AS BIGINT) AS hottest_key_rows,
       CAST(SUM(a.n * b.n) AS DOUBLE) / CAST(SUM(a.n) AS DOUBLE)
         AS amplification
FROM c a JOIN c b USING (k)
"""


# -- rank-family window breadth ------------------------------------------

def q_customer_spend_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The remaining rank-family window functions in one partitioned
    pass — ``percent_rank``, ``cume_dist``, ``ntile(4)``, ``nth_value``
    — computed per nation over each customer's exact-decimal total
    spend (completing the window surface beyond row_number/rank/lead/
    lag/frames used elsewhere).  Partitioning by nation keeps every
    window task bounded (no global ORDER BY window — the single-task
    trap the quartiles query avoids with broadcast boundaries);
    orderBy includes the key for deterministic ties.  percent_rank and
    cume_dist are count ratios (one IEEE division each), so DuckDB
    reproduces them exactly."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    spend = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "spend"
            )
        )
        .join(
            F.broadcast(
                cust.select("c_custkey", "c_nationkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.asc("spend"), F.asc("c_custkey")
    )
    return spend.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("spend").cast("double").alias("spend"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
        F.nth_value("spend", 1).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("double")
        .alias("nation_min_spend"),
    )


SQL_CUSTOMER_SPEND_DISTRIBUTION = """
WITH spend AS (
  SELECT o.o_custkey AS custkey, c.c_nationkey AS nationkey,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY o.o_custkey, c.c_nationkey
)
SELECT custkey, nationkey, CAST(spend AS DOUBLE) AS spend,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       CAST(nth_value(spend, 1) OVER (PARTITION BY nationkey
              ORDER BY spend ASC, custkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS nation_min_spend
FROM spend
WINDOW w AS (PARTITION BY nationkey ORDER BY spend ASC, custkey ASC)
"""


# -- explicit join-strategy control (fact × fact) ------------------------

def q_lineitem_orders_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join with an explicit SHUFFLE_HASH hint — the
    strategy lever for large×large joins where neither side broadcasts:
    sort-merge (Spark's default) pays a full sort of BOTH shuffled
    sides; a shuffled hash join builds a hash table from the smaller
    side per partition and streams the larger — no sort at all.  Right
    when the build side's per-partition slice fits executor memory
    (orders ≈ ¼ of lineitem here; at 100 TB you size
    ``spark.sql.shuffle.partitions`` so build slices stay bounded —
    with AQE free to demote back if a slice spills).  The hint is the
    documented DataFrame API (``DataFrame.hint('shuffle_hash')``), and
    the plan gate asserts ShuffledHashJoin actually planned."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority"
    )
    joined = li.join(
        orders.hint("shuffle_hash"),
        li["l_orderkey"] == orders["o_orderkey"],
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (
                    F.lit("1.00").cast("decimal(18,2)")
                    - F.col("l_discount").cast("decimal(18,2)")
                )
            ).cast("decimal(28,4)")
        )
        .cast("double")
        .alias("revenue"),
    )


SQL_LINEITEM_ORDERS_SHJ = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST('1.00' AS DECIMAL(18,2))
                   - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4)))
            AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


# -- bucketed fact-fact join (co-located layout, zero join exchange) -----

#: bucket count for the co-located fact layout (fixture-scale; at
#: 100 TB this is sized so a bucket ≈ one task's comfortable input)
FACT_BUCKETS = 16


def ensure_bucketed_fact_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """Idempotent build of lineitem/orders as managed tables bucketed
    (and in-bucket sorted) on the order key — the write-once layout
    investment that makes every later orderkey join shuffle-free.
    Keyed by ``sf_dir``; reused when present."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pu4spark_spark.sources import write_bucketed_table

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    li_tbl = f"lineitem_bkt_{tag}"
    o_tbl = f"orders_bkt_{tag}"
    if spark.catalog.tableExists(li_tbl) and spark.catalog.tableExists(o_tbl):
        return li_tbl, o_tbl
    warehouse = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path
    for t in (li_tbl, o_tbl):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    write_bucketed_table(
        load_table(spark, "lineitem", sf_dir).select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        li_tbl,
        ["l_orderkey"],
        FACT_BUCKETS,
        sort_cols=["l_orderkey"],
    )
    write_bucketed_table(
        load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderpriority"
        ),
        o_tbl,
        ["o_orderkey"],
        FACT_BUCKETS,
        sort_cols=["o_orderkey"],
    )
    return li_tbl, o_tbl


def q_lineitem_orders_bucketed_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The same fact-to-fact revenue join as
    :func:`q_lineitem_orders_shj`, but against the CO-LOCATED bucketed
    layout: both sides bucketed (and sorted) on the order key with the
    same bucket count, so the sort-merge join consumes the bucket
    layout directly — ZERO exchange below the join (plan-gated; a
    task-local per-bucket sort remains because Spark ignores sortBy
    order at read time by default, SPARK-28595 — pipelined and
    spill-safe, never a shuffle).  The ``merge`` hint pins SMJ so toy-scale AQE doesn't
    broadcast the orders side and idle the layout; at 100 TB SMJ is
    what the planner picks anyway.  The only exchange in the query is
    the output-sized priority rollup."""
    li_tbl, o_tbl = ensure_bucketed_fact_tables(spark, sf_dir)
    li = spark.table(li_tbl)
    orders = spark.table(o_tbl)
    joined = li.hint("merge").join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (
                    F.lit("1.00").cast("decimal(18,2)")
                    - F.col("l_discount").cast("decimal(18,2)")
                )
            ).cast("decimal(28,4)")
        )
        .cast("double")
        .alias("revenue"),
    )


SQL_LINEITEM_ORDERS_BUCKETED = SQL_LINEITEM_ORDERS_SHJ


# -- bitmap audience intersection ----------------------------------------

def q_events_audience_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap via BITMAP words — the roaring-bitmap execution
    shape for "users who did X and also Y" at 100 TB: each audience
    compresses to one int64 word per 64-user-id block (``bit_or`` of
    ``1 << (id mod 64)``, a map-side-combined aggregation whose output
    is id-space/64 rows, independent of event volume), and the
    intersection is a word-wise AND on a block-keyed equi-join —
    multiplicity, timestamps, and event payloads never reach the join.
    Contrast a COUNT(DISTINCT)-after-self-join plan, which shuffles
    event-sized inputs twice and pays a distinct on top.

    Output: one row per 64-id block where both audiences have members —
    both words, the intersection count in that block, plus running
    proof arithmetic (bit 63 maps to the sign bit, same two's-
    complement convention as SimHash, so Spark and DuckDB agree
    bit-for-bit).  ``SUM(n_both)`` over the result is the audience
    overlap; keeping per-block rows makes the bitmap itself the
    checked artifact, not just the scalar."""
    events = load_table(spark, "events", sf_dir)

    def words(event_type: str, word_alias: str) -> DataFrame:
        # 1 << 63 must land on the sign bit of a BIGINT: shiftleft on a
        # bigint literal does exactly that in two's complement.
        # pmod + derived block, not raw %/div: a negative user_id would
        # give Spark a negative remainder (sign of the dividend) and a
        # TRUNCATED block where DuckDB FLOORS — pmod keeps the bit in
        # [0,64) and (id - pmod) is a multiple of 64, so the division
        # is exact and engine-identical for any sign (the same guard as
        # the zorder oracle).
        return (
            events.filter(F.col("event_type") == event_type)
            .select(
                F.expr("CAST(pmod(user_id, 64) AS INT)").alias("__bit"),
                F.expr("(user_id - pmod(user_id, 64)) div 64").alias(
                    "block"
                ),
            )
            .distinct()
            .groupBy("block")
            .agg(
                F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), __bit))").alias(
                    word_alias
                )
            )
        )

    clicks = words("click", "word_click")
    purchases = words("purchase", "word_purchase")
    return (
        clicks.join(purchases, "block")
        .withColumn(
            "n_both",
            F.bit_count(
                F.col("word_click").bitwiseAND(F.col("word_purchase"))
            ).cast("int"),
        )
        .filter(F.col("n_both") > 0)
    )


SQL_EVENTS_AUDIENCE_BITMAP = """
WITH c AS (
  SELECT (user_id - ((user_id % 64) + 64) % 64) // 64 AS block,
         bit_or(CASE WHEN ((user_id % 64) + 64) % 64 = 63
                     THEN (-9223372036854775807 - 1)
                     ELSE (CAST(1 AS BIGINT)
                           << CAST(((user_id % 64) + 64) % 64 AS INTEGER))
                END)
           AS word_click
  FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
  GROUP BY 1
),
p AS (
  SELECT (user_id - ((user_id % 64) + 64) % 64) // 64 AS block,
         bit_or(CASE WHEN ((user_id % 64) + 64) % 64 = 63
                     THEN (-9223372036854775807 - 1)
                     ELSE (CAST(1 AS BIGINT)
                           << CAST(((user_id % 64) + 64) % 64 AS INTEGER))
                END)
           AS word_purchase
  FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
  GROUP BY 1
)
SELECT c.block, c.word_click, p.word_purchase,
       CAST(bit_count(c.word_click & p.word_purchase) AS INTEGER) AS n_both
FROM c JOIN p USING (block)
WHERE bit_count(c.word_click & p.word_purchase) > 0
"""


# -- event-type transition matrix ----------------------------------------

def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts and probabilities between
    consecutive event types per user — the behavioral fingerprint
    (what follows a signup?) and the input to next-event prediction.
    One window (lead over the per-user timeline) + one map-side-
    combined groupBy on the tiny (from, to) key space; the probability
    divides by the per-from total computed in the same pass via a
    window over the aggregated (type×type)-sized table — integer
    counts + one IEEE division, oracle-portable."""
    events = load_table(spark, "events", sf_dir)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(wo).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        (
            F.col("n").cast("double")
            / F.sum("n").over(wt).cast("double")
        ).alias("p"),
    )


SQL_EVENTS_TRANSITION_MATRIX = """
WITH steps AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM steps WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE)
       / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
FROM counts
"""


# -- corpus drift audit: early-vs-late event-type distribution -----------

def q_events_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal drift audit: the event-type distribution of the stream's
    EARLY half vs its LATE half, per-type share deltas, and the total-
    variation distance — the "did the data change under me?" check a
    pipeline runs before assuming a sample (or a trained filter) from
    last month still represents this month.

    The halves split at the midpoint of the observed time RANGE —
    ``min_us + (max_us - min_us) div 2`` in exact integer microseconds (a true
    median needs a global order statistic; the range midpoint is one
    1-row agg and deterministic in both engines; epoch sums stay well
    under 2^63).  Scale shape: one 1-row bounds agg broadcast back,
    then ONE map-side-combined groupBy over the ≤|types| key space;
    the share/TVD windows run over that ≤|types|-row table (single
    tiny task by design).  Counts exact int64; shares and the TVD are
    replicated IEEE chains, so the oracle hash-checks the distances."""
    ev = load_table(spark, "events", sf_dir)
    us = F.unix_micros(F.col("ts"))
    # midpoint as mn + (mx-mn) div 2: the dividend is non-negative, so
    # Spark's truncating `div` equals DuckDB's flooring `//` (on a raw
    # (mn+mx) div 2 they diverge by 1 µs for negative odd sums —
    # pre-1970 timestamps — flipping boundary events between halves);
    # a double `/2` then cast would TRUNCATE in Spark but ROUND in
    # DuckDB on odd sums, and the difference form also can't overflow
    bounds = ev.agg(
        F.min(us).alias("__mn"), F.max(us).alias("__mx")
    ).select(F.expr("__mn + (__mx - __mn) div 2").alias("__cut"))
    counts = (
        ev.select("event_type", us.alias("__us"))
        .crossJoin(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            F.sum((F.col("__us") <= F.col("__cut")).cast("long")).alias(
                "n_early"
            ),
            F.sum((F.col("__us") > F.col("__cut")).cast("long")).alias(
                "n_late"
            ),
        )
    )
    w = Window.partitionBy()
    share_e = F.col("n_early").cast("double") / F.sum("n_early").over(w)
    share_l = F.col("n_late").cast("double") / F.sum("n_late").over(w)
    # two projection layers: window expressions can't nest inside the
    # TVD's own window aggregate
    shares = counts.select(
        "event_type",
        "n_early",
        "n_late",
        share_e.alias("share_early"),
        share_l.alias("share_late"),
        F.abs(share_e - share_l).alias("drift_abs"),
    )
    return shares.withColumn(
        "tvd", F.lit(0.5) * F.sum("drift_abs").over(w)
    )


SQL_EVENTS_TYPE_DRIFT = """
WITH cut AS (
  SELECT MIN(epoch_us(ts))
         + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 2 AS c
  FROM events
),
counts AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN epoch_us(ts) <= c THEN 1 ELSE 0 END)
              AS BIGINT) AS n_early,
         CAST(SUM(CASE WHEN epoch_us(ts) > c THEN 1 ELSE 0 END)
              AS BIGINT) AS n_late
  FROM events, cut GROUP BY event_type
),
shares AS (
  SELECT event_type, n_early, n_late,
         CAST(n_early AS DOUBLE) / CAST(SUM(n_early) OVER () AS DOUBLE)
           AS share_early,
         CAST(n_late AS DOUBLE) / CAST(SUM(n_late) OVER () AS DOUBLE)
           AS share_late,
         abs(CAST(n_early AS DOUBLE) / CAST(SUM(n_early) OVER () AS DOUBLE)
             - CAST(n_late AS DOUBLE) / CAST(SUM(n_late) OVER () AS DOUBLE))
           AS drift_abs
  FROM counts
)
SELECT event_type, n_early, n_late, share_early, share_late, drift_abs,
       0.5 * SUM(drift_abs) OVER () AS tvd
FROM shares
"""


# -- Merkle-style table reconciliation ----------------------------------

DIFF_BUCKETS = 32


def q_audit_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase table reconciliation — the anti-entropy check for
    verifying a replicated / migrated / CDC-maintained copy without
    shipping either table: hash every row to an int64, bucket rows by
    key, and compare per-bucket (count, checksum) pairs; only buckets
    whose digests disagree need row-level work.  Phase-1 state is
    DIFF_BUCKETS rows per side regardless of table size (the Merkle
    idea, one level deep), and the checksum is an order-independent
    SUM of row hashes so it needs no sort.

    Here the "replica" is the orders table after the CDC change-set
    (every 7th re-priced, every 11th deleted — the same deltas as
    ``streaming_upsert_deletes``), so exactly the buckets containing a
    changed or deleted key must flag, and ``n_diff_keys`` counts the
    rows a phase-2 repair would ship.  All arithmetic is exact int64:
    48-bit row hashes (12 md5 hex chars) summed per bucket stay under
    2^63 while buckets hold < 2^15 rows (true at every fixture sf); a
    production run sizes DIFF_BUCKETS so buckets stay bounded, or
    switches the checksum to ``bit_xor`` (order-independent and
    overflow-free, at the cost of missing even-multiplicity identical
    rows).  DuckDB reproduces the digests bit-for-bit."""
    base = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    replica = (
        base.filter(F.col("o_orderkey") % 11 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 7 == 0,
                (F.col("price") + F.lit("100.00").cast("decimal(12,2)"))
                .cast("decimal(12,2)"),
            )
            .otherwise(F.col("price"))
            .alias("price"),
        )
    )

    def digest(df: DataFrame) -> DataFrame:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("o_orderkey").cast("string"),
                        F.col("price").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        return (
            df.withColumn("bucket", F.col("o_orderkey") % DIFF_BUCKETS)
            .withColumn("__h", h)
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("__h").alias("checksum"),
            )
        )

    a = digest(base).select(
        "bucket", F.col("n").alias("n_base"), F.col("checksum").alias("ck_a")
    )
    b = digest(replica).select(
        "bucket",
        F.col("n").alias("n_replica"),
        F.col("checksum").alias("ck_b"),
    )
    cmp = a.join(b, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("n_base", F.lit(0)).alias("n_base"),
        F.coalesce("n_replica", F.lit(0)).alias("n_replica"),
        (
            F.coalesce("ck_a", F.lit(0)) == F.coalesce("ck_b", F.lit(0))
        ).alias("in_sync"),
    )
    # phase 2, scoped to out-of-sync buckets only: count differing keys
    diff_keys = (
        base.withColumn("bucket", F.col("o_orderkey") % DIFF_BUCKETS)
        .alias("l")
        .join(
            replica.withColumn(
                "bucket", F.col("o_orderkey") % DIFF_BUCKETS
            ).alias("r"),
            "o_orderkey",
            "full_outer",
        )
        .filter(
            F.col("l.price").isNull()
            | F.col("r.price").isNull()
            | (F.col("l.price") != F.col("r.price"))
        )
        .select(
            F.coalesce(F.col("l.bucket"), F.col("r.bucket")).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_diff_keys"))
    )
    return cmp.join(diff_keys, "bucket", "left").select(
        "bucket",
        "n_base",
        "n_replica",
        "in_sync",
        F.coalesce("n_diff_keys", F.lit(0)).cast("bigint").alias(
            "n_diff_keys"
        ),
    )


SQL_AUDIT_TABLE_DIFF = f"""
WITH base AS (
  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price
  FROM orders
),
replica AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0
              THEN CAST(price + CAST('100.00' AS DECIMAL(12,2))
                        AS DECIMAL(12,2))
              ELSE price END AS price
  FROM base WHERE o_orderkey % 11 <> 0
),
da AS (
  SELECT o_orderkey % {DIFF_BUCKETS} AS bucket, COUNT(*) AS n_base,
         SUM(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|'
             || CAST(price AS VARCHAR)), 1, 12)) AS BIGINT)) AS ck_a
  FROM base GROUP BY 1
),
db AS (
  SELECT o_orderkey % {DIFF_BUCKETS} AS bucket, COUNT(*) AS n_replica,
         SUM(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|'
             || CAST(price AS VARCHAR)), 1, 12)) AS BIGINT)) AS ck_b
  FROM replica GROUP BY 1
),
cmp AS (
  SELECT COALESCE(da.bucket, db.bucket) AS bucket,
         COALESCE(n_base, 0) AS n_base,
         COALESCE(n_replica, 0) AS n_replica,
         COALESCE(ck_a, 0) = COALESCE(ck_b, 0) AS in_sync
  FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
),
diffs AS (
  SELECT COALESCE(b.o_orderkey, r.o_orderkey) % {DIFF_BUCKETS} AS bucket,
         COUNT(*) AS n_diff_keys
  FROM base b FULL OUTER JOIN replica r ON b.o_orderkey = r.o_orderkey
  WHERE b.price IS NULL OR r.price IS NULL OR b.price <> r.price
  GROUP BY 1
)
SELECT c.bucket, c.n_base, c.n_replica, c.in_sync,
       CAST(COALESCE(d.n_diff_keys, 0) AS BIGINT) AS n_diff_keys
FROM cmp c LEFT JOIN diffs d ON c.bucket = d.bucket
"""


# -- histogram-quantile sketch (HIST_BINS/HIST_PROBES at module top) -----

def q_lineitem_histogram_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile ESTIMATES from a fixed-memory equi-width histogram —
    the deterministic mergeable-sketch alternative to
    ``approx_percentile`` (whose GK sketch is neither engine-portable
    nor layout-stable, hence rows-only in
    ``lineitem_price_percentiles_approx``).  Here the sketch is a
    64-bin count table: fixed size, mergeable by addition (same
    property the streaming CMS drain exploits), and the estimate —
    linear interpolation inside the containing bin — is a replicated
    IEEE chain, so DuckDB hash-checks the ESTIMATES themselves, sketch
    error included (the audit pair for the exact
    ``lineitem_price_percentiles``).

    Scale: one scan → 1-row (min, max) scalar broadcast back; one
    map-side-combined groupBy over ≤64 bin keys; the cumulative window
    and probe join run over the 64-row table (single tiny task by
    design, like the AUC primitive)."""
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_extendedprice").alias("x")
    )
    bounds = li.agg(
        F.min("x").alias("mn"), F.max("x").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = (
        li.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.floor(
                    ((F.col("x") - F.col("mn")) * F.lit(float(HIST_BINS)))
                    / (F.col("mx") - F.col("mn"))
                ),
                F.lit(HIST_BINS - 1).cast("bigint"),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = binned.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    )
    probes = bounds.select(
        "mn",
        "mx",
        "n",
        F.explode(
            F.array(*[F.lit(p) for p in HIST_PROBES])
        ).alias("p"),
    ).withColumn("target", F.col("p") * F.col("n").cast("double"))
    # the containing bin: 3 probes × ≤64 bins — a fixed-size join
    hit = probes.join(
        F.broadcast(cum),
        (F.col("cum_before").cast("double") < F.col("target"))
        & (
            F.col("target")
            <= (F.col("cum_before") + F.col("cnt")).cast("double")
        ),
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(HIST_BINS))
    frac = (
        F.col("target") - F.col("cum_before").cast("double")
    ) / F.col("cnt").cast("double")
    return hit.select(
        F.col("p"),
        F.col("bin").cast("int").alias("bin"),
        (
            F.col("mn")
            + (F.col("bin").cast("double") + frac) * width
        ).alias("quantile_est"),
    )


SQL_LINEITEM_HISTOGRAM_QUANTILES = f"""
WITH src AS (SELECT l_extendedprice AS x FROM lineitem),
bounds AS (SELECT MIN(x) AS mn, MAX(x) AS mx, COUNT(*) AS n FROM src),
binned AS (
  SELECT least(floor(((x - mn) * {float(HIST_BINS)}) / (mx - mn)),
               {HIST_BINS - 1}) AS bin,
         COUNT(*) AS cnt
  FROM src, bounds GROUP BY 1
),
cum AS (
  SELECT bin, cnt,
         COALESCE(SUM(cnt) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM binned
),
probes AS (
  -- DuckDB types the 0.25 literals DECIMAL(3,2); Spark's lit() is a
  -- double — cast so the output's p column type-matches the driver
  SELECT mn, mx, n, CAST(p AS DOUBLE) AS p,
         CAST(p AS DOUBLE) * CAST(n AS DOUBLE) AS target
  FROM bounds, UNNEST([{", ".join(str(p) for p in HIST_PROBES)}]) AS t(p)
)
SELECT p, CAST(bin AS INTEGER) AS bin,
       mn + (CAST(bin AS DOUBLE)
             + (target - CAST(cum_before AS DOUBLE)) / CAST(cnt AS DOUBLE))
            * ((mx - mn) / {float(HIST_BINS)}) AS quantile_est
FROM probes JOIN cum
  ON CAST(cum_before AS DOUBLE) < target
 AND target <= CAST(cum_before + cnt AS DOUBLE)
"""


# -- ordered-fold aggregates: EWMA ---------------------------------------

#: EWMA smoothing factor (x_t weight); 0.3 is the metering default
EWMA_ALPHA = 0.3


def q_events_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EXPONENTIALLY WEIGHTED MOVING AVERAGE of event values —
    the sequential-state aggregate (s_t = α·x_t + (1-α)·s_{t-1}) that
    has no closed groupBy form: each step depends on the previous one,
    the shape behind per-entity smoothing, rate estimators, and online
    feature stores.

    Execution shape: ONE map-side-combinable collect into a per-user
    (ts, event_id, value) array, ``sort_array`` for the deterministic
    event order, then ``F.aggregate`` folds the smoothing LEFT-TO-RIGHT
    inside codegen — no Python, no per-event shuffle, no window with
    |user| partitions.  The array is bounded by a user's event count
    (the same per-entity bound as ``events_user_gaps_pandas``).

    IEEE discipline: the fold's multiply-add order is pinned by the
    sorted array, and DuckDB's ``list_reduce`` over the identically
    ordered ``list(... ORDER BY ts, event_id)`` replays the exact same
    chain — double outputs hash-match bit-for-bit."""
    events = load_table(spark, "events", sf_dir)
    arr = events.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("seq")
    )
    vals = F.col("seq.value")
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: x * F.lit(EWMA_ALPHA)
        + acc * F.lit(1.0 - EWMA_ALPHA),
    )
    return arr.select(
        "user_id",
        F.size("seq").cast("bigint").alias("n_events"),
        ewma.alias("ewma_value"),
        F.element_at(vals, -1).alias("last_value"),
    )


SQL_EVENTS_EWMA = f"""
WITH seq AS (
  SELECT user_id,
         list(value ORDER BY ts, event_id) AS vals
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(vals) AS BIGINT) AS n_events,
       list_reduce(vals,
                   (acc, x) -> x * {EWMA_ALPHA}
                               + acc * {1.0 - EWMA_ALPHA}) AS ewma_value,
       vals[-1] AS last_value
FROM seq
"""


# -- gap interpolation on the generated grid ------------------------------

#: interpolation bucket width (seconds); 15 min leaves real gaps at
#: every fixture sf (hourly saturates at sf0.1)
INTERP_BUCKET_S = 900


def q_events_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR INTERPOLATION of missing cells in a per-type time-bucket
    count series — the step past ``events_locf_value`` (carry last) and
    ``events_dense_hourly`` (fill zero): a silent 15-minute bucket gets
    the straight-line estimate between its surrounding observations,
    the standard metric-gap repair before anomaly scoring or export.

    Execution shape: one rollup pass over the corpus (count per
    (bucket, type)), a GENERATED grid (sequence from the rollup's own
    bounds — grid size is buckets × types regardless of corpus size),
    a broadcast fill join, then two window passes per type (previous /
    next non-null anchor via ``last/first IGNORE NULLS``) over the
    grid-sized frame only.

    IEEE discipline: anchors are int64 counts, distances are integer
    bucket indices; the interpolation is ONE fixed chain
    (prev + (next-prev) · Δ/span) from exact integers, so doubles
    hash-match DuckDB's identical expression."""
    from pu4spark_spark.plans import cached

    events = load_table(spark, "events", sf_dir)
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp("ts") / INTERP_BUCKET_S).cast("bigint")
        * INTERP_BUCKET_S
    )
    rollup = cached(
        events.groupBy(
            bucket.alias("tb"), F.col("event_type")
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = rollup.groupBy("event_type").agg(
        F.min("tb").alias("__mn"), F.max("tb").alias("__mx")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence(
                "__mn", "__mx", F.expr(f"interval {INTERP_BUCKET_S} second")
            )
        ).alias("tb"),
    )
    # left-outer preserves the LEFT side, so only the RIGHT side can be
    # the broadcast build side — hint rollup (grid-sized, tiny), not grid.
    filled = grid.join(F.broadcast(rollup), ["event_type", "tb"], "left")
    idx = (F.unix_timestamp("tb") / INTERP_BUCKET_S).cast("bigint")
    filled = filled.withColumn("__i", idx)
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("__i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("__i")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    anchored = filled.select(
        "event_type",
        "tb",
        "n",
        "__i",
        F.last("n", ignorenulls=True).over(w_prev).alias("pn"),
        F.last(
            F.when(F.col("n").isNotNull(), F.col("__i")), ignorenulls=True
        ).over(w_prev).alias("pi"),
        F.first("n", ignorenulls=True).over(w_next).alias("nn"),
        F.first(
            F.when(F.col("n").isNotNull(), F.col("__i")), ignorenulls=True
        ).over(w_next).alias("ni"),
    )
    interp = F.col("pn").cast("double") + (
        (F.col("nn") - F.col("pn")).cast("double")
        * (
            (F.col("__i") - F.col("pi")).cast("double")
            / (F.col("ni") - F.col("pi")).cast("double")
        )
    )
    return anchored.select(
        "event_type",
        "tb",
        F.when(F.col("n").isNotNull(), F.col("n").cast("double"))
        .when(F.col("pi").isNotNull() & F.col("ni").isNotNull(), interp)
        .alias("n_filled"),
        F.when(F.col("n").isNotNull(), F.lit("observed"))
        .when(
            F.col("pi").isNotNull() & F.col("ni").isNotNull(),
            F.lit("interpolated"),
        )
        .otherwise(F.lit("edge"))
        .alias("fill_kind"),
    )


SQL_EVENTS_INTERPOLATE = f"""
WITH rollup AS (
  SELECT to_timestamp(
           (CAST(floor(epoch(ts) / {INTERP_BUCKET_S}) AS BIGINT))
           * {INTERP_BUCKET_S})::TIMESTAMP AS tb,
         event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(tb) AS mn, MAX(tb) AS mx FROM rollup GROUP BY 1
),
grid AS (
  SELECT event_type,
         unnest(generate_series(mn, mx,
                                INTERVAL {INTERP_BUCKET_S} SECOND)) AS tb
  FROM bounds
),
filled AS (
  SELECT g.event_type, g.tb, r.n,
         CAST(epoch(g.tb) AS BIGINT) / {INTERP_BUCKET_S} AS i
  FROM grid g LEFT JOIN rollup r
    ON r.event_type = g.event_type AND r.tb = g.tb
),
anchored AS (
  SELECT event_type, tb, n, i,
         last_value(n IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pn,
         last_value(CASE WHEN n IS NOT NULL THEN i END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pi,
         first_value(n IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY i
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nn,
         first_value(CASE WHEN n IS NOT NULL THEN i END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY i
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
  FROM filled
)
SELECT event_type, tb,
       CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
            WHEN pi IS NOT NULL AND ni IS NOT NULL THEN
              CAST(pn AS DOUBLE)
              + (CAST(nn - pn AS DOUBLE)
                 * (CAST(i - pi AS DOUBLE) / CAST(ni - pi AS DOUBLE)))
       END AS n_filled,
       CASE WHEN n IS NOT NULL THEN 'observed'
            WHEN pi IS NOT NULL AND ni IS NOT NULL THEN 'interpolated'
            ELSE 'edge' END AS fill_kind
FROM anchored
"""


# -- robust anomaly detection (median / MAD) -------------------------------

#: MAD multiplier for the anomaly fence (≈3σ under normality the
#: classic 1.4826 scaling absorbs; integer 4 keeps the fence exact)
MAD_K = 4


def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type anomaly detection on the hourly count series:
    flag hours whose count exceeds ``median + 4·MAD`` (median absolute
    deviation) — the robust twin of the z-score
    ``events_hourly_anomalies``: one wild hour inflates a stddev fence
    enough to hide the next anomaly, while median/MAD are immune to
    ~50% contamination.

    Exactness discipline: both the median and the MAD use the LOWER
    MEDIAN (the rank-⌈n/2⌉ order statistic), so every fence quantity
    is an exact INT64 and the flags hash-check with no IEEE
    involvement at all.

    Scale shape: one corpus rollup, then rank windows over the
    GRID-SIZED (hour × type) frame only — each type's partition is
    its bucket count, not its event count; the fences are a
    |type|-row broadcast."""
    from pu4spark_spark.plans import cached

    events = load_table(spark, "events", sf_dir)
    hourly = cached(
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    counts = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cells")
    )

    def lower_median(df, part, val):
        w = Window.partitionBy(part).orderBy(F.asc(val))
        ranked = df.withColumn("__r", F.row_number().over(w)).join(
            F.broadcast(counts), part
        )
        return (
            ranked.filter(F.col("__r") == F.ceil(F.col("cells") / 2))
            .select(part, F.col(val).alias("med"))
        )

    med = lower_median(hourly, "event_type", "n")
    dev = hourly.join(F.broadcast(med), "event_type").withColumn(
        "__ad", F.abs(F.col("n") - F.col("med"))
    )
    mad = lower_median(dev, "event_type", "__ad").withColumnRenamed(
        "med", "mad"
    )
    fences = med.join(mad, "event_type").select(
        "event_type",
        "med",
        "mad",
        (F.col("med") + F.lit(MAD_K) * F.col("mad")).alias("fence"),
    )
    return (
        hourly.join(F.broadcast(fences), "event_type")
        .filter(F.col("n") > F.col("fence"))
        .select(
            "event_type",
            "hour",
            "n",
            F.col("med").alias("median_n"),
            F.col("mad").alias("mad_n"),
        )
    )


SQL_EVENTS_ANOMALY_MAD = f"""
WITH hourly AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
counts AS (SELECT event_type, COUNT(*) AS cells FROM hourly GROUP BY 1),
med AS (
  SELECT h.event_type, n AS med FROM (
    SELECT event_type, n,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n) AS r
    FROM hourly) h
  JOIN counts c ON c.event_type = h.event_type
  WHERE h.r = CAST(ceil(c.cells / 2.0) AS BIGINT)
),
dev AS (
  SELECT h.event_type, h.hour, h.n, m.med, abs(h.n - m.med) AS ad
  FROM hourly h JOIN med m ON m.event_type = h.event_type
),
mad AS (
  SELECT d.event_type, ad AS mad FROM (
    SELECT event_type, ad,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ad) AS r
    FROM dev) d
  JOIN counts c ON c.event_type = d.event_type
  WHERE d.r = CAST(ceil(c.cells / 2.0) AS BIGINT)
)
SELECT d.event_type, d.hour, d.n, d.med AS median_n, m.mad AS mad_n
FROM dev d JOIN mad m ON m.event_type = d.event_type
WHERE d.n > d.med + {MAD_K} * m.mad
"""


#: the declarative constraint suite over orders — (name, ok-row count
#: expression builder) pairs; every constraint has the canonical form
#: metric = ok_rows / n_rows, passed = (ok_rows == n_rows), so adding a
#: constraint is one more aggregate column riding the same single scan
_QUALITY_CONSTRAINTS = [
    ("completeness_custkey", lambda: F.count("o_custkey")),
    ("completeness_totalprice", lambda: F.count("o_totalprice")),
    ("uniqueness_orderkey", lambda: F.count_distinct(F.col("o_orderkey"))),
    (
        "membership_status",
        lambda: F.sum(
            F.col("o_orderstatus").isin("O", "F", "P").cast("bigint")
        ),
    ),
    (
        "range_totalprice_pos",
        lambda: F.sum((F.col("o_totalprice") > 0).cast("bigint")),
    ),
    (
        "pattern_priority",
        lambda: F.sum(
            F.col("o_orderpriority").rlike("^[1-5]-").cast("bigint")
        ),
    ),
    (
        "date_bounds_1995_2000",
        lambda: F.sum(
            F.col("o_orderdate")
            .between(
                F.lit("1995-01-01").cast("timestamp"),
                F.lit("2000-12-31").cast("timestamp"),
            )
            .cast("bigint")
        ),
    ),
]


def q_audit_quality_constraints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Declarative data-quality CONSTRAINT SUITE — the Deequ /
    great-expectations pattern every production load gate runs: N
    constraints (completeness, exact uniqueness, set membership, value
    range, regex pattern, date bounds) verified over orders in ONE
    pass.  A single aggregate row computes every metric, then a
    ``stack`` unpivot emits one row per constraint with its metric and
    pass/fail verdict — at 100 TB the whole suite costs exactly one
    scan + one 1-row shuffle no matter how many constraints ride it;
    adding a constraint is a new aggregate column, not a new job.

    Every constraint normalizes to ``metric = ok_rows / n_rows`` and
    ``passed = (ok_rows == n_rows)`` (uniqueness counts distinct keys
    as its ok-rows), so the output is integer-derived plus one fixed
    IEEE division — fully hash-checkable.  The fixture's
    ``date_bounds_1995_2000`` constraint genuinely FAILS (orders run
    through 2001), witnessing that verdicts are computed, not assumed."""
    o = load_table(spark, "orders", sf_dir)
    m = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[fn().alias(f"c{i}") for i, (_, fn) in enumerate(_QUALITY_CONSTRAINTS)],
    )
    pairs = ", ".join(
        f"'{name}', c{i}" for i, (name, _) in enumerate(_QUALITY_CONSTRAINTS)
    )
    return (
        m.select(
            "n_rows",
            F.expr(
                f"stack({len(_QUALITY_CONSTRAINTS)}, {pairs}) "
                "AS (check_name, ok_rows)"
            ),
        )
        .select(
            "check_name",
            "n_rows",
            "ok_rows",
            (F.col("ok_rows").cast("double") / F.col("n_rows")).alias(
                "metric"
            ),
            (F.col("ok_rows") == F.col("n_rows")).cast("int").alias(
                "passed"
            ),
        )
    )


SQL_AUDIT_QUALITY_CONSTRAINTS = """
WITH m AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(o_custkey) AS c_completeness_custkey,
         COUNT(o_totalprice) AS c_completeness_totalprice,
         COUNT(DISTINCT o_orderkey) AS c_uniqueness_orderkey,
         SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
           AS c_membership_status,
         SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)
           AS c_range_totalprice_pos,
         SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
             THEN 1 ELSE 0 END) AS c_pattern_priority,
         SUM(CASE WHEN o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                   AND TIMESTAMP '2000-12-31' THEN 1 ELSE 0 END)
           AS c_date_bounds_1995_2000
  FROM orders
),
u AS (
  SELECT 'completeness_custkey' AS check_name,
         c_completeness_custkey AS ok_rows, n_rows FROM m
  UNION ALL SELECT 'completeness_totalprice',
         c_completeness_totalprice, n_rows FROM m
  UNION ALL SELECT 'uniqueness_orderkey',
         c_uniqueness_orderkey, n_rows FROM m
  UNION ALL SELECT 'membership_status',
         c_membership_status, n_rows FROM m
  UNION ALL SELECT 'range_totalprice_pos',
         c_range_totalprice_pos, n_rows FROM m
  UNION ALL SELECT 'pattern_priority',
         c_pattern_priority, n_rows FROM m
  UNION ALL SELECT 'date_bounds_1995_2000',
         c_date_bounds_1995_2000, n_rows FROM m
)
SELECT check_name, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(ok_rows AS BIGINT) AS ok_rows,
       CAST(ok_rows AS DOUBLE) / n_rows AS metric,
       CAST(CASE WHEN ok_rows = n_rows THEN 1 ELSE 0 END AS INT)
         AS passed
FROM u
"""


def q_events_aqe_coalesce_hourly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ENGINE-NATIVE small-partition handling, the coalesce twin of
    :func:`q_skew_join_aqe_revenue`: an hourly events rollup planned
    with a deliberately oversized shuffle width (64 initial
    partitions), which AQE's ``coalescePartitions`` merges back to a
    handful of right-sized reduce partitions AFTER observing the map
    output — the runtime fix for the too-many-reducers shape that at
    100 TB otherwise burns a task launch + a tiny output file per
    partition (the small-files problem at the shuffle layer).

    The rollup is materialized INSIDE the conf window (persist +
    count) so the coalesce happens on every run; confs are restored
    before returning.  ``tests/test_plans.py::
    test_aqe_coalesce_witnessed`` gates ``AQEShuffleRead coalesced``
    in the executed plan AND a post-shuffle partition count well below
    the initial 64; the oracle re-derives the rollup row-for-row, so
    a merge that lost or duplicated a partition would hash-mismatch."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "64",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        # persist() pins the cached plan's output partitioning, which by
        # default disables AQE re-partitioning (coalesce AND skew) under
        # a cache — allow it so the materialize-inside-window trick works
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": (
            "true"
        ),
    }
    old: dict = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    ev = load_table(spark, "events", sf_dir)
    agg = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        agg = cached(agg)  # registered: released at next query's entry
        agg.count()  # materialize under the widened-then-coalesced confs
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return agg


SQL_EVENTS_AQE_COALESCE_HOURLY = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def ensure_cbo_stats_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str, str]:
    """Idempotent build of lineitem/orders/part as managed catalog
    tables with ``ANALYZE … FOR ALL COLUMNS`` statistics — CBO reads
    row counts and column NDV/min/max from the catalog, so only
    catalog tables (not path-scans) can feed the cost model.  Keyed by
    ``sf_dir``; rebuilt per session (the in-memory catalog forgets
    definitions, same discipline as the bucketed fact tables)."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    specs = {
        f"lineitem_cbo_{tag}": (
            "lineitem",
            ["l_orderkey", "l_partkey", "l_extendedprice"],
        ),
        f"orders_cbo_{tag}": ("orders", ["o_orderkey", "o_orderpriority"]),
        f"part_cbo_{tag}": ("part", ["p_partkey", "p_brand"]),
    }
    if all(spark.catalog.tableExists(t) for t in specs):
        return tuple(specs)  # type: ignore[return-value]
    warehouse = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path
    for tbl, (src, cols) in specs.items():
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"{warehouse}/{tbl}", ignore_errors=True)
        load_table(spark, src, sf_dir).select(*cols).write.mode(
            "overwrite"
        ).saveAsTable(tbl)
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR ALL COLUMNS")
    return tuple(specs)  # type: ignore[return-value]


#: the selective dimension filter for the CBO witness — ~4% of parts
CBO_BRAND = "Brand#11"


def q_orders_cbo_join_reorder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COST-BASED join reordering witnessed live — the third
    engine-native planner lever beside the AQE skew and coalesce
    witnesses: a three-table join DECLARED in the worst order
    (fact⋈fact first, the selective brand-filtered dimension last),
    planned under ``spark.sql.cbo.enabled`` + ``joinReorder`` with
    ``ANALYZE``d catalog statistics.  The cost model must rotate the
    selective ``part`` join INNERMOST — shrinking the fact stream
    before the expensive fact⋈fact join — which at 100 TB is the
    difference between joining 4% of lineitem against orders and
    joining all of it.

    WITNESS discipline: the optimized logical plan is inspected and
    the query RAISES unless the innermost join is the partkey join
    (without CBO the declared order survives — verified by
    ``tests/test_plans.py::test_cbo_join_reorder_witnessed``, which
    checks both directions); the join is then materialized inside the
    conf window and the confs restored.  The oracle re-derives the
    same join row-for-row, pinning that reordering is
    semantics-neutral."""
    import re as _re

    li_tbl, o_tbl, p_tbl = ensure_cbo_stats_tables(spark, sf_dir)
    confs = {
        "spark.sql.cbo.enabled": "true",
        "spark.sql.cbo.joinReorder.enabled": "true",
    }
    old: dict = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    li = spark.table(li_tbl)
    o = spark.table(o_tbl)
    p = spark.table(p_tbl).filter(F.col("p_brand") == CBO_BRAND)
    agg = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast(_M))
            .cast("double")
            .alias("total_price"),
        )
    )
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        opt = agg._jdf.queryExecution().optimizedPlan().toString()
        conds = _re.findall(r"Join Inner, \((\w+)#\d+", opt)
        # toString lists outermost first; the last join is the deepest
        if not conds or conds[-1] not in ("l_partkey", "p_partkey"):
            raise AssertionError(
                "CBO did not rotate the selective part join innermost: "
                f"{conds} in\n{opt[:2000]}"
            )
        agg = cached(agg)  # registered: released at next query's entry
        agg.count()  # materialize under the CBO-reordered plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return agg


def q_orders_aqe_join_demotion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The THIRD AQE lever witnessed live (skew split and partition
    coalesce are the other two): RUNTIME JOIN-STRATEGY DEMOTION.  The
    static planner is denied broadcast (``autoBroadcastJoinThreshold
    = -1`` — the compile-time state of a 100 TB plan whose dimension
    size estimates are unusable or missing) and plans orders ⋈ customer
    as a sort-merge join; after the map stages run, AQE sees the
    customer side's ACTUAL shuffle bytes under
    ``adaptive.autoBroadcastJoinThreshold`` and replans the SMJ as a
    BroadcastHashJoin — stats-free, runtime-true demotion to the
    cheaper strategy.  Self-gating: the query raises unless the initial
    physical plan contains the SMJ and the executed (final adaptive)
    plan contains the BHJ, so every driver/bench run re-witnesses the
    conversion; the oracle re-derives the join row-for-row, so a
    demotion that lost or duplicated rows hash-mismatches.

    At 100 TB this is the lever that saves a mis-estimated fact ⋈ dim
    from a full-table sort: no hints, no ANALYZE freshness requirement
    — the shuffle write itself is the statistic."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        # deny the STATIC planner broadcast; leave the RUNTIME
        # threshold generous — the gap between the two is the demotion
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "10m",
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": (
            "true"
        ),
    }
    old: dict = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey"
    )
    agg = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_M))
            .cast("double")
            .alias("total_price"),
        )
    )
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # probe the initial plan on a CLONE Dataset: forcing agg's own
        # QueryExecution here would freeze it pre-persist, and its
        # executedPlan would then be an unexecuted adaptive shell
        # instead of the cache-backed plan count() actually runs
        initial = (
            agg.select("*")._jdf.queryExecution().sparkPlan().toString()
        )
        if "SortMergeJoin" not in initial:
            raise AssertionError(
                "demotion witness: initial plan is not an SMJ:\n"
                + initial[:2000]
            )
        agg = cached(agg)  # registered: released at next query's entry
        agg.count()  # materialize: AQE replans with runtime sizes
        final = agg._jdf.queryExecution().executedPlan().toString()
        if "BroadcastHashJoin" not in final:
            raise AssertionError(
                "demotion witness: AQE did not convert the SMJ to a "
                "broadcast join:\n" + final[:2000]
            )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return agg


#: selective brand for the Bloom-filter witness — constant, oracle-fixed
BLOOM_BRAND = "Brand#23"


def q_lineitem_bloom_filter_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The FOURTH runtime-filter lever witnessed live (beside AQE skew
    split, coalesce, and join demotion): ROW-LEVEL RUNTIME BLOOM
    FILTER injection (Spark's ``InjectRuntimeFilter``).  A selective
    dim filter (one part brand) joins a fact side the planner cannot
    broadcast; the optimizer plants a ``bloom_filter_agg`` subquery
    over the dim's join keys and a ``might_contain`` probe ABOVE the
    fact scan — so ~96% of lineitem rows die before the join's
    shuffle, the move that matters at 100 TB when the fact is NOT
    partitioned by the join key (where dynamic partition pruning,
    witnessed in ``fmt_dpp_fact_scan``, can't help).  Self-gating: the
    executed plan must carry both the bloom build and the probe;
    confs restored in ``finally``; the oracle recomputes the join
    exactly, so a false-negative filter (dropping a matching row)
    hash-mismatches.

    The fixture-scale conf lowers only
    ``applicationSideScanSizeThreshold`` (default 10 GB — the fact
    side must LOOK big enough to be worth filtering); production
    leaves defaults and gets this plan automatically on real sizes."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # the fixture fact is MBs; production's 10GB gate needs no help
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        # deny broadcast so the join actually shuffles the fact side
        # (broadcast joins filter build-side at the hash table anyway)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": (
            "true"
        ),
    }
    old: dict = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_brand") == BLOOM_BRAND)
        .select("p_partkey", "p_brand", "p_size")
    )
    agg = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_size")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(_M))
            .cast("double")
            .alias("total_price"),
        )
    )
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        agg = cached(agg)  # registered: released at next query's entry
        agg.count()  # materialize under the runtime-filter confs
        final = agg._jdf.queryExecution().executedPlan().toString()
        if "bloom_filter_agg" not in final or "might_contain" not in final:
            raise AssertionError(
                "bloom-filter witness: no runtime filter in the "
                "executed plan:\n" + final[:2000]
            )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return agg


SQL_LINEITEM_BLOOM_FILTER_JOIN = f"""
SELECT p_size,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS {_M})) AS DOUBLE) AS total_price
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = '{BLOOM_BRAND}'
GROUP BY p_size
"""


SQL_ORDERS_AQE_JOIN_DEMOTION = f"""
SELECT c_nationkey,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {_M})) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


SQL_ORDERS_CBO_JOIN_REORDER = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS {_M})) AS DOUBLE) AS total_price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
WHERE p_brand = '{CBO_BRAND}'
GROUP BY o_orderpriority
"""


QUERIES = {
    "q1_pricing_summary": q_q1_pricing_summary,
    "salted_segment_revenue": q_salted_segment_revenue,
    "skew_join_aqe_revenue": q_skew_join_aqe_revenue,
    "events_aqe_coalesce_hourly": q_events_aqe_coalesce_hourly,
    "audit_quality_constraints": q_audit_quality_constraints,
    "orders_cbo_join_reorder": q_orders_cbo_join_reorder,
    "orders_aqe_join_demotion": q_orders_aqe_join_demotion,
    "lineitem_bloom_filter_join": q_lineitem_bloom_filter_join,
    "grouping_sets_orders": q_grouping_sets_orders,
    "profile_orders": q_profile_orders,
    "audit_referential_integrity": q_audit_referential_integrity,
    "audit_table_diff": q_audit_table_diff,
    "lineitem_histogram_quantiles": q_lineitem_histogram_quantiles,
    "events_audience_bitmap": q_events_audience_bitmap,
    "events_transition_matrix": q_events_transition_matrix,
    "events_type_drift": q_events_type_drift,
    "lineitem_orders_shj": q_lineitem_orders_shj,
    "lineitem_orders_bucketed_join": q_lineitem_orders_bucketed_join,
    "customer_spend_distribution": q_customer_spend_distribution,
    "part_copurchase_pairs": q_part_copurchase_pairs,
    "part_association_rules": q_part_association_rules,
    "audit_join_key_skew": q_audit_join_key_skew,
    "audit_join_explosion": q_audit_join_explosion,
    "events_watermark_lateness": q_events_watermark_lateness,
    "events_dow_hour_matrix": q_events_dow_hour_matrix,
    "orders_upsert_compact": q_orders_upsert_compact,
    "orders_zorder_layout": q_orders_zorder_layout,
    "sql_parts_by_brand": q_sql_parts_by_brand,
    "q3_shipping_priority": q_q3_shipping_priority,
    "q5_region_supplier_revenue": q_q5_region_supplier_revenue,
    "q10_returned_items": q_q10_returned_items,
    "q14_promo_revenue": q_q14_promo_revenue,
    "top_customers_per_nation": q_top_customers_per_nation,
    "customer_running_spend": q_customer_running_spend,
    "monthly_revenue": q_monthly_revenue,
    "events_hourly": q_events_hourly,
    "events_sessionized": q_events_sessionized,
    "events_session_window_fn": q_events_session_window_fn,
    "sql_pipe_orders": q_sql_pipe_orders,
    # events_hll_sketch_merge: DataSketches estimates are
    # engine-specific — rows-only; error bound pytest-gated in
    # tests/test_relational.py
    "events_hll_sketch_merge": q_events_hll_sketch_merge,
    "orders_aggregate_suite": q_orders_aggregate_suite,
    "part_string_functions": q_part_string_functions,
    "orders_null_semantics": q_orders_null_semantics,
    "orders_datetime_functions": q_orders_datetime_functions,
    "events_range_frame_stats": q_events_range_frame_stats,
    "events_json_stats": q_events_json_stats,
    "events_user_gaps_pandas": q_events_user_gaps_pandas,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
    "events_variant_stats": q_events_variant_stats,
    "customer_spend_quartiles": q_customer_spend_quartiles,
    "q18_large_orders": q_q18_large_orders,
    "orders_scd2_intervals": q_orders_scd2_intervals,
    "events_sliding_windows": q_events_sliding_windows,
    "q4_order_priority": q_q4_order_priority,
    "q12_shipmode": q_q12_shipmode,
    "events_hourly_anomalies": q_events_hourly_anomalies,
    "orders_unpivot_metrics": q_orders_unpivot_metrics,
    "orders_pivot_status": q_orders_pivot_status,
    "events_dense_hourly": q_events_dense_hourly,
    "part_fuzzy_matches": q_part_fuzzy_matches,
    "events_time_weighted_value": q_events_time_weighted_value,
    "events_purge_maintenance": q_events_purge_maintenance,
    "events_top_paths": q_events_top_paths,
    "events_locf_value": q_events_locf_value,
    "events_time_rollup": q_events_time_rollup,
    "events_rollup_maintenance": q_events_rollup_maintenance,
    "events_value_trend": q_events_value_trend,
    "customer_rfm_segments": q_customer_rfm_segments,
    "parts_setops": q_parts_setops,
    "segment_priority_matrix": q_segment_priority_matrix,
    "rollup_order_status": q_rollup_order_status,
    "cube_status_priority": q_cube_status_priority,
    "lineitem_price_percentiles": q_lineitem_price_percentiles,
    "lineitem_price_percentiles_approx": q_lineitem_price_percentiles_approx,
    "lineitem_winsorized_mean": q_lineitem_winsorized_mean,
    "events_user_cardinality": q_events_user_cardinality,
    "events_user_cardinality_approx": q_events_user_cardinality_approx,
    "customers_with_urgent_orders": q_customers_with_urgent_orders,
    "customers_without_orders": q_customers_without_orders,
    "order_scalar_functions": q_order_scalar_functions,
    "events_ewma_value": q_events_ewma_value,
    "events_interpolate_gaps": q_events_interpolate_gaps,
    "events_anomaly_mad": q_events_anomaly_mad,
}

ORACLE_SQL = {
    "events_ewma_value": SQL_EVENTS_EWMA,
    "events_interpolate_gaps": SQL_EVENTS_INTERPOLATE,
    "events_anomaly_mad": SQL_EVENTS_ANOMALY_MAD,
    "q1_pricing_summary": SQL_Q1,
    "salted_segment_revenue": SQL_SALTED_SEGMENT_REVENUE,
    "skew_join_aqe_revenue": SQL_SKEW_JOIN_AQE_REVENUE,
    "events_aqe_coalesce_hourly": SQL_EVENTS_AQE_COALESCE_HOURLY,
    "audit_quality_constraints": SQL_AUDIT_QUALITY_CONSTRAINTS,
    "orders_cbo_join_reorder": SQL_ORDERS_CBO_JOIN_REORDER,
    "orders_aqe_join_demotion": SQL_ORDERS_AQE_JOIN_DEMOTION,
    "lineitem_bloom_filter_join": SQL_LINEITEM_BLOOM_FILTER_JOIN,
    "grouping_sets_orders": SQL_GROUPING_SETS,
    "profile_orders": SQL_PROFILE_ORDERS,
    "audit_referential_integrity": SQL_AUDIT_REFERENTIAL_INTEGRITY,
    "audit_table_diff": SQL_AUDIT_TABLE_DIFF,
    "lineitem_histogram_quantiles": SQL_LINEITEM_HISTOGRAM_QUANTILES,
    "events_audience_bitmap": SQL_EVENTS_AUDIENCE_BITMAP,
    "events_transition_matrix": SQL_EVENTS_TRANSITION_MATRIX,
    "events_type_drift": SQL_EVENTS_TYPE_DRIFT,
    "lineitem_orders_shj": SQL_LINEITEM_ORDERS_SHJ,
    "lineitem_orders_bucketed_join": SQL_LINEITEM_ORDERS_BUCKETED,
    "customer_spend_distribution": SQL_CUSTOMER_SPEND_DISTRIBUTION,
    "part_copurchase_pairs": SQL_PART_COPURCHASE_PAIRS,
    "part_association_rules": SQL_PART_ASSOCIATION_RULES,
    "audit_join_key_skew": SQL_AUDIT_JOIN_KEY_SKEW,
    "audit_join_explosion": SQL_AUDIT_JOIN_EXPLOSION,
    "events_watermark_lateness": SQL_EVENTS_WATERMARK_LATENESS,
    "events_dow_hour_matrix": SQL_EVENTS_DOW_HOUR_MATRIX,
    "orders_upsert_compact": SQL_ORDERS_UPSERT_COMPACT,
    "orders_zorder_layout": SQL_ORDERS_ZORDER_LAYOUT,
    "sql_parts_by_brand": SQL_PARTS_BY_BRAND,
    "q3_shipping_priority": SQL_Q3,
    "q5_region_supplier_revenue": SQL_Q5,
    "q10_returned_items": SQL_Q10,
    "q14_promo_revenue": SQL_Q14,
    "top_customers_per_nation": SQL_TOP_CUSTOMERS,
    "customer_running_spend": SQL_RUNNING_SPEND,
    "monthly_revenue": SQL_MONTHLY_REVENUE,
    "events_hourly": SQL_EVENTS_HOURLY,
    "events_sessionized": SQL_EVENTS_SESSIONIZED,
    "events_session_window_fn": SQL_EVENTS_SESSIONIZED,
    "sql_pipe_orders": SQL_PIPE_ORDERS_ORACLE,
    "orders_aggregate_suite": SQL_ORDERS_AGGREGATE_SUITE,
    "part_string_functions": SQL_PART_STRING_FUNCTIONS,
    "orders_null_semantics": SQL_ORDERS_NULL_SEMANTICS,
    "orders_datetime_functions": SQL_ORDERS_DATETIME_FUNCTIONS,
    "events_range_frame_stats": SQL_EVENTS_RANGE_FRAME_STATS,
    "events_json_stats": SQL_EVENTS_JSON,
    "events_user_gaps_pandas": SQL_EVENTS_USER_GAPS,
    "events_funnel": SQL_EVENTS_FUNNEL,
    "events_retention": SQL_EVENTS_RETENTION,
    "events_variant_stats": SQL_EVENTS_VARIANT,
    "customer_spend_quartiles": SQL_SPEND_QUARTILES,
    "q18_large_orders": SQL_Q18,
    "orders_scd2_intervals": SQL_ORDERS_SCD2,
    "events_sliding_windows": SQL_EVENTS_SLIDING,
    "q4_order_priority": SQL_Q4,
    "q12_shipmode": SQL_Q12,
    "events_hourly_anomalies": SQL_EVENTS_HOURLY_ANOMALIES,
    "orders_unpivot_metrics": SQL_ORDERS_UNPIVOT,
    "orders_pivot_status": SQL_ORDERS_PIVOT,
    "events_dense_hourly": SQL_EVENTS_DENSE_HOURLY,
    "part_fuzzy_matches": SQL_PART_FUZZY_MATCHES,
    "events_time_weighted_value": SQL_EVENTS_TIME_WEIGHTED,
    "events_purge_maintenance": SQL_EVENTS_PURGE_MAINTENANCE,
    "events_top_paths": SQL_EVENTS_TOP_PATHS,
    "events_locf_value": SQL_EVENTS_LOCF,
    "events_time_rollup": SQL_EVENTS_TIME_ROLLUP,
    "events_rollup_maintenance": SQL_EVENTS_ROLLUP_MAINTENANCE,
    "events_value_trend": SQL_EVENTS_VALUE_TREND,
    "customer_rfm_segments": SQL_CUSTOMER_RFM,
    "parts_setops": SQL_PARTS_SETOPS,
    "segment_priority_matrix": SQL_SEGMENT_PRIORITY,
    "rollup_order_status": SQL_ROLLUP,
    "cube_status_priority": SQL_CUBE,
    "lineitem_price_percentiles": SQL_PRICE_PERCENTILES,
    "lineitem_winsorized_mean": SQL_LINEITEM_WINSORIZED,
    "events_user_cardinality": SQL_USER_CARDINALITY,
    # events_user_cardinality_approx: HLL sketch, engine-specific — rows-only
    "customers_with_urgent_orders": SQL_SEMI_URGENT,
    "customers_without_orders": SQL_ANTI_NO_ORDERS,
    "order_scalar_functions": SQL_SCALAR_FUNCTIONS,
}
