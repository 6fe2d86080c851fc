"""As-of (point-in-time) join — a core time-series operator the
reference lacks entirely (SURVEY.md §2B gap; the north-star brief names
it explicitly as an operator Spark has no built-in for).

Semantics: for every left row, attach the single right row with the
largest ``right.ts ≤ left.ts`` within the same key — i.e. the state
"as of" the left row's timestamp.  Equal timestamps match.

Spark-first design — the union+window trick, NOT a range join:

    tag left rows side=1 and right rows side=0, union them, then one
    window per key ordered by (ts, side, order_col) computes a running
    ``last(right_value, ignoreNulls)`` — right rows deposit their
    values, left rows pick up the latest deposit.  Filter back to left
    rows.

Cost: ONE shuffle on the key column + a per-partition sort — the same
price as a plain equi-join aggregation.  A naive
``l.join(r, key && r.ts <= l.ts)`` range join produces O(|matches|)
intermediate rows (every earlier right row per left row, quadratic per
key in the worst case) before the max-filter; BroadcastNestedLoopJoin
at 100 TB is a non-starter.  The union+window form is linear in
|left|+|right| and AQE's skew handling applies to the single shuffle.

The right side is first deduplicated to one row per (key, ts) with a
deterministic tiebreak (max order_col) because "the" as-of match is
otherwise undefined under timestamp collisions — DuckDB's native ASOF
JOIN (the oracle) has the same ambiguity, so both engines see a
collision-free right side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pu4spark_spark.sources import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``value_cols`` from the
    latest ``right`` row with ``right.ts_col <= left.ts_col`` per key
    (NULLs when no prior right row exists).

    ``order_col`` must be a unique right-side column; it breaks ties
    deterministically when two right rows share (key, ts).
    """
    # one row per (key, ts) on the right — deterministic as-of target
    wd = Window.partitionBy(*key_cols, ts_col).orderBy(F.desc(order_col))
    right_d = (
        right.withColumn("__rn", F.row_number().over(wd))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    tagged_r = right_d.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.col(order_col).alias("__ord"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    left_cols = [c for c in left.columns]
    tagged_l = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tagged_r.schema["__ord"].dataType).alias("__ord"),
        *[F.lit(None).cast(right_d.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    tagged_r = tagged_r.select(
        *key_cols,
        ts_col,
        "__side",
        "__ord",
        *[f"__r_{c}" for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left_cols],
    )

    # right rows sort BEFORE left rows at equal ts (side 0 < 1) so an
    # exact-timestamp match is visible to the left row, per ASOF <=
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.asc(ts_col), F.asc("__side"), F.asc_nulls_first("__ord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r)
    for c in value_cols:
        carried = carried.withColumn(
            f"__asof_{c}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    out = carried.filter(F.col("__side") == 1)
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )


def q_asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click event: the same user's most recent purchase at or
    before the click (event id and value), NULL when none yet."""
    events = load_table(spark, "events", sf_dir)
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        key_cols=["user_id"],
        ts_col="ts",
        value_cols=["event_id", "value"],
        order_col="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_event_id").alias("purchase_event_id"),
        F.col("asof_value").alias("purchase_value"),
    )


SQL_ASOF_CLICK_PURCHASE = """
WITH purchases AS (
  SELECT user_id, ts, event_id, value
  FROM (SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase')
  WHERE rn = 1
),
clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id,
       c.user_id,
       p.event_id AS purchase_event_id,
       p.value AS purchase_value
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


#: tolerance for the bounded-staleness as-of variant
ASOF_TOLERANCE = "1 hour"


def q_asof_click_purchase_tolerance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """As-of join with a staleness bound: the matched purchase must be
    within ASOF_TOLERANCE of the click or the match is dropped (NULL) —
    the contract market-data joins use (a quote older than the bound is
    no quote).

    Same single-shuffle union+window plan as the unbounded as-of; the
    bound is a scan-stage post-filter on the carried match timestamp,
    so tolerance costs nothing extra at any scale.
    """
    events = load_table(spark, "events", sf_dir)
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
        .withColumn("p_ts", F.col("ts"))
    )
    out = asof_join(
        clicks,
        purchases,
        key_cols=["user_id"],
        ts_col="ts",
        value_cols=["event_id", "value", "p_ts"],
        order_col="event_id",
    )
    fresh = F.col("asof_p_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {ASOF_TOLERANCE}"
    )
    return out.select(
        "event_id",
        "user_id",
        F.when(fresh, F.col("asof_event_id")).alias("purchase_event_id"),
        F.when(fresh, F.col("asof_value")).alias("purchase_value"),
    )


SQL_ASOF_CLICK_PURCHASE_TOLERANCE = """
WITH purchases AS (
  SELECT user_id, ts, event_id, value
  FROM (SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase')
  WHERE rn = 1
),
clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id,
       c.user_id,
       CASE WHEN p.ts >= c.ts - INTERVAL 1 HOUR
            THEN p.event_id END AS purchase_event_id,
       CASE WHEN p.ts >= c.ts - INTERVAL 1 HOUR
            THEN p.value END AS purchase_value
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Forward as-of join: every ``left`` row gains ``value_cols`` from
    the EARLIEST ``right`` row with ``right.ts_col >= left.ts_col`` per
    key (NULLs when no later right row exists) — the mirror of
    :func:`asof_join`, same single-shuffle union+window shape with the
    frame flipped to ``first(ignoreNulls)`` over the FOLLOWING rows.
    Collisions on (key, ts) keep the MIN ``order_col`` row (the
    earliest deterministic match)."""
    wd = Window.partitionBy(*key_cols, ts_col).orderBy(F.asc(order_col))
    right_d = (
        right.withColumn("__rn", F.row_number().over(wd))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    tagged_r = right_d.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        F.col(order_col).alias("__ord"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    left_cols = [c for c in left.columns]
    tagged_l = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.lit(None).cast(tagged_r.schema["__ord"].dataType).alias("__ord"),
        *[
            F.lit(None).cast(right_d.schema[c].dataType).alias(f"__r_{c}")
            for c in value_cols
        ],
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    tagged_r = tagged_r.select(
        *key_cols,
        ts_col,
        "__side",
        "__ord",
        *[f"__r_{c}" for c in value_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left_cols
        ],
    )

    # left rows sort BEFORE right rows at equal ts (side 0 < 1) so an
    # exact-timestamp match is inside the left row's FOLLOWING frame
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.asc(ts_col), F.asc("__side"), F.asc_nulls_last("__ord"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = tagged_l.unionByName(tagged_r)
    for c in value_cols:
        carried = carried.withColumn(
            f"__asof_{c}", F.first(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    out = carried.filter(F.col("__side") == 0)
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )


def q_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click event: the same user's EARLIEST purchase at or
    after the click — forward attribution (which purchase did this
    click lead to)."""
    events = load_table(spark, "events", sf_dir)
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join_forward(
        clicks,
        purchases,
        key_cols=["user_id"],
        ts_col="ts",
        value_cols=["event_id", "value"],
        order_col="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_event_id").alias("next_purchase_id"),
        F.col("asof_value").alias("next_purchase_value"),
    )


SQL_ASOF_NEXT_PURCHASE = """
WITH purchases AS (
  SELECT user_id, ts, event_id, value
  FROM (SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id ASC) AS rn
        FROM events WHERE event_type = 'purchase')
  WHERE rn = 1
),
clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id,
       c.user_id,
       p.event_id AS next_purchase_id,
       p.value AS next_purchase_value
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts <= p.ts
"""


# -- banded range join ----------------------------------------------------

def range_join_lookback(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    lookback_micros: int,
) -> DataFrame:
    """Inner range join: all (left, right) pairs with
    ``left.ts - lookback <= right.ts <= left.ts`` per key — banded, not
    nested-loop.

    Time is chunked into fixed bands of exactly the lookback width.  A
    right row lives in one band; a left row's window spans at most two
    consecutive bands, so the left side explodes to ≤2 band keys and the
    join becomes a plain equi-join on ``(key, band)`` followed by the
    exact BETWEEN filter.  One shuffle, ×2 left amplification, zero
    quadratic blowup — versus Spark's default for pure inequality
    predicates (BroadcastNestedLoopJoin), which is quadratic and
    broadcast-bound at 100 TB.  Band arithmetic is exact integer
    microseconds, so the DuckDB oracle reproduces pairs bit-identically.
    """
    lb = int(lookback_micros)
    # integer `div`, not float `/`: band keys at ~1e15 micros must be
    # exact or boundary rows land in the wrong band
    rband = F.expr(f"unix_micros({right_ts}) div {lb}")
    lband_hi = F.expr(f"unix_micros({left_ts}) div {lb}")
    lband_lo = F.expr(f"(unix_micros({left_ts}) - {lb}) div {lb}")
    lx = left.withColumn(
        "__band", F.explode(F.array_distinct(F.array(lband_lo, lband_hi)))
    )
    rx = right.withColumn("__band", rband)
    cond = [lx[c] == rx[c] for c in key_cols] + [
        lx["__band"] == rx["__band"],
        rx[right_ts] <= lx[left_ts],
        F.unix_micros(rx[right_ts]) >= F.unix_micros(lx[left_ts]) - F.lit(lb),
    ]
    joined = lx.join(rx, cond, "inner")
    return joined


LOOKBACK_MICROS = 6 * 3600 * 1_000_000  # 6 hours


def q_range_click_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (click, purchase) pair of the same user where the purchase
    happened within the 6 hours up to the click — attribution-window
    style range join."""
    events = load_table(spark, "events", sf_dir)
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("pts"),
    )
    purchases = purchases.withColumnRenamed("p_user_id", "user_id")
    joined = range_join_lookback(
        clicks.alias("c"),
        purchases.alias("p"),
        key_cols=["user_id"],
        left_ts="cts",
        right_ts="pts",
        lookback_micros=LOOKBACK_MICROS,
    )
    return joined.select(
        F.col("c.click_id").alias("click_id"),
        F.col("p.purchase_id").alias("purchase_id"),
        F.col("c.user_id").alias("user_id"),
        (F.unix_micros(F.col("cts")) - F.unix_micros(F.col("pts"))).alias(
            "gap_micros"
        ),
    )


SQL_RANGE_CLICK_PURCHASES = f"""
WITH clicks AS (
  SELECT event_id AS click_id, user_id, ts AS cts
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT event_id AS purchase_id, user_id, ts AS pts
  FROM events WHERE event_type = 'purchase'
)
SELECT c.click_id, p.purchase_id, c.user_id,
       epoch_us(c.cts) - epoch_us(p.pts) AS gap_micros
FROM clicks c JOIN purchases p
  ON c.user_id = p.user_id
 AND p.pts <= c.cts
 AND epoch_us(p.pts) >= epoch_us(c.cts) - {LOOKBACK_MICROS}
"""


QUERIES = {
    "asof_click_purchase": q_asof_click_purchase,
    "asof_next_purchase": q_asof_next_purchase,
    "asof_click_purchase_tolerance": q_asof_click_purchase_tolerance,
    "range_click_purchases": q_range_click_purchases,
}

ORACLE_SQL = {
    "asof_click_purchase": SQL_ASOF_CLICK_PURCHASE,
    "asof_next_purchase": SQL_ASOF_NEXT_PURCHASE,
    "asof_click_purchase_tolerance": SQL_ASOF_CLICK_PURCHASE_TOLERANCE,
    "range_click_purchases": SQL_RANGE_CLICK_PURCHASES,
}
