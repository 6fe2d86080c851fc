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


def q_sql_asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-front-end twin of ``asof_click_purchase`` (the
    ``sql_docs_clean`` program extended to the temporal-join family):
    Spark's dialect has no ASOF keyword, so the statement spells out
    the engine's own union+carry-window algorithm — right rows
    deduped per (key, ts), both sides unioned with a side tag (right
    sorts before left at equal ts, so an exact-timestamp match is
    visible per ASOF ``<=``), one ``last(..., true)`` carry window per
    value column, left rows filtered back out.  Same single shuffle as
    the DataFrame version, same DuckDB ``ASOF LEFT JOIN`` oracle — a
    SQL-only user gets the identical as-of semantics and plan shape."""
    load_table(spark, "events", sf_dir).createOrReplaceTempView("events")
    return spark.sql("""
WITH pd AS (
  SELECT user_id, ts, event_id, value
  FROM (SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase')
  WHERE rn = 1
),
tagged AS (
  SELECT user_id, ts, 0 AS side,
         event_id AS r_eid, value AS r_val,
         CAST(NULL AS BIGINT) AS l_eid
  FROM pd
  UNION ALL
  SELECT user_id, ts, 1 AS side,
         CAST(NULL AS BIGINT) AS r_eid, CAST(NULL AS DOUBLE) AS r_val,
         event_id AS l_eid
  FROM events WHERE event_type = 'click'
),
carried AS (
  SELECT *,
         last(r_eid, true) OVER (
           PARTITION BY user_id
           ORDER BY ts ASC, side ASC, r_eid ASC NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS purchase_event_id,
         last(r_val, true) OVER (
           PARTITION BY user_id
           ORDER BY ts ASC, side ASC, r_eid ASC NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS purchase_value
  FROM tagged
)
SELECT l_eid AS event_id, user_id, purchase_event_id, purchase_value
FROM carried WHERE side = 1
""")


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


# -- interval-overlap join (banded, both sides interval-valued) ----------

def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    band_micros: int,
) -> DataFrame:
    """All (left, right) pairs whose half-open intervals overlap:
    ``l_start < r_end AND r_start < l_end`` — the third member of the
    temporal-join family (as-of = point→latest-point, range = point→
    window, THIS = interval→interval: sessions × incidents, validity
    spans × validity spans).

    Banded like :func:`range_join_lookback`, generalized to intervals
    on BOTH sides: each interval explodes to every fixed-width time
    band it touches (``sequence(start div B, end div B)``), the join is
    a plain equi-join on the band key, and the exact overlap predicate
    filters within band.  Two intervals can share several bands, so
    each pair is emitted ONLY in the band where the later interval
    begins (``band == greatest(l_start, r_start) div B``) — a
    deduplication-free guard (that band is always a shared band, since
    the later start lies inside both intervals).  Cost: one shuffle on
    the band key, amplification = interval length / band width; no
    BroadcastNestedLoopJoin, no O(|L|·|R|) blowup.  ``band_micros``
    trades amplification (long intervals touch many bands) against
    per-band pair density — size it near the typical interval length.
    """
    lb = int(band_micros)
    # each side's own start band, computed BEFORE the join (floor
    # division is monotone, so band(max(starts)) = max(start bands) —
    # the guard below needs only these two per-side integers)
    lx = left.withColumn(
        "__sband_l", F.expr(f"unix_micros({l_start}) div {lb}")
    ).withColumn(
        "__band",
        F.explode(
            F.expr(
                f"sequence(unix_micros({l_start}) div {lb},"
                f" unix_micros({l_end}) div {lb})"
            )
        ),
    )
    rx = right.withColumn(
        "__sband_r", F.expr(f"unix_micros({r_start}) div {lb}")
    ).withColumn(
        "__band",
        F.explode(
            F.expr(
                f"sequence(unix_micros({r_start}) div {lb},"
                f" unix_micros({r_end}) div {lb})"
            )
        ),
    )
    cond = [
        lx["__band"] == rx["__band"],
        lx[l_start] < rx[r_end],
        rx[r_start] < lx[l_end],
        # emit each overlapping pair exactly once: only in the band
        # containing the LATER of the two starts (always a shared band
        # — the later start lies inside both intervals)
        lx["__band"] == F.greatest(lx["__sband_l"], rx["__sband_r"]),
    ]
    return (
        lx.join(rx, cond, "inner").drop("__band", "__sband_l", "__sband_r")
    )


#: busy-period definition: hours whose event count is ≥ 6/5 of the
#: corpus-wide mean events-per-active-hour (relative, so the same query
#: is non-degenerate at every scale factor), runs of contiguous busy
#: hours merged into one interval.  The comparison is cross-multiplied
#: to stay all-integer: ``5·n·n_hours ≥ 6·n_events``.
BUSY_NUM, BUSY_DEN = 6, 5
#: band width for the session × busy-interval overlap join
OVERLAP_BAND_MICROS = 4 * 3600 * 1_000_000


def q_sessions_busy_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which user sessions overlapped a site-wide traffic spike — the
    interval×interval join composed from two derived interval tables:
    per-user sessions (gap-and-island, 30-min silence) and busy
    periods (runs of hours with ≥ BUSY_MIN_EVENTS events, merged
    island-style).  Overlap is half-open on both sides; the output
    carries the intersection span so downstream can weight by exposure
    seconds.  The DuckDB oracle joins on the raw inequality predicate
    — a different plan shape that cross-checks the banding algebra
    (band guard, half-open boundaries) pair-for-pair.
    """
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
    sessions = (
        marked.withColumn("sid", F.sum("is_new").over(wrun))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + F.expr("interval 30 minutes")).alias(
                "session_end"
            ),
        )
        .drop("sid")
    )

    all_hours = events.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # 1-row global scalar (total events, active hours) broadcast back —
    # the family's driver-free broadcast-scalar protocol; the busy
    # predicate cross-multiplies so it never leaves integer arithmetic
    totals = all_hours.agg(
        F.sum("n").alias("__tot"), F.count(F.lit(1)).alias("__hrs")
    )
    hourly = (
        all_hours.crossJoin(F.broadcast(totals))
        .filter(
            F.col("n") * F.col("__hrs") * BUSY_DEN
            >= F.col("__tot") * BUSY_NUM
        )
        .select("hour", "n")
    )
    wh = Window.orderBy("hour")
    hwrun = wh.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    busy = (
        hourly.withColumn(
            "is_new",
            F.when(
                F.lag("hour").over(wh).isNull()
                | (
                    F.unix_micros("hour")
                    - F.unix_micros(F.lag("hour").over(wh))
                    > 3600 * 1_000_000
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("bid", F.sum("is_new").over(hwrun))
        .groupBy("bid")
        .agg(
            F.min("hour").alias("busy_start"),
            (F.max("hour") + F.expr("interval 1 hour")).alias("busy_end"),
        )
        .drop("bid")
    )

    joined = interval_overlap_join(
        sessions,
        busy,
        "session_start",
        "session_end",
        "busy_start",
        "busy_end",
        OVERLAP_BAND_MICROS,
    )
    return joined.select(
        "user_id",
        "session_start",
        "busy_start",
        F.greatest("session_start", "busy_start").alias("overlap_start"),
        F.least("session_end", "busy_end").alias("overlap_end"),
        (
            F.unix_micros(F.least("session_end", "busy_end"))
            - F.unix_micros(F.greatest("session_start", "busy_start"))
        ).alias("overlap_micros"),
    )


SQL_SESSIONS_BUSY_OVERLAP = f"""
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
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
),
sessions AS (
  SELECT user_id, MIN(ts) AS session_start,
         MAX(ts) + INTERVAL 30 MINUTE AS session_end
  FROM islands GROUP BY user_id, sid
),
all_hours AS (
  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1
),
totals AS (SELECT SUM(n) AS tot, COUNT(*) AS hrs FROM all_hours),
hourly AS (
  SELECT hour, n FROM all_hours, totals
  WHERE n * hrs * {BUSY_DEN} >= tot * {BUSY_NUM}
),
hmarked AS (
  SELECT hour,
         CASE WHEN LAG(hour) OVER (ORDER BY hour) IS NULL
                OR hour - LAG(hour) OVER (ORDER BY hour) > INTERVAL 1 HOUR
              THEN 1 ELSE 0 END AS is_new
  FROM hourly
),
hislands AS (
  SELECT hour, SUM(is_new) OVER (ORDER BY hour
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bid
  FROM hmarked
),
busy AS (
  SELECT MIN(hour) AS busy_start, MAX(hour) + INTERVAL 1 HOUR AS busy_end
  FROM hislands GROUP BY bid
)
SELECT s.user_id, s.session_start, b.busy_start,
       greatest(s.session_start, b.busy_start) AS overlap_start,
       least(s.session_end, b.busy_end) AS overlap_end,
       epoch_us(least(s.session_end, b.busy_end))
       - epoch_us(greatest(s.session_start, b.busy_start)) AS overlap_micros
FROM sessions s JOIN busy b
  ON s.session_start < b.busy_end AND b.busy_start < s.session_end
"""


QUERIES = {
    "asof_click_purchase": q_asof_click_purchase,
    "sql_asof_click_purchase": q_sql_asof_click_purchase,
    "asof_next_purchase": q_asof_next_purchase,
    "asof_click_purchase_tolerance": q_asof_click_purchase_tolerance,
    "range_click_purchases": q_range_click_purchases,
    "sessions_busy_overlap": q_sessions_busy_overlap,
}

ORACLE_SQL = {
    "asof_click_purchase": SQL_ASOF_CLICK_PURCHASE,
    "sql_asof_click_purchase": SQL_ASOF_CLICK_PURCHASE,
    "asof_next_purchase": SQL_ASOF_NEXT_PURCHASE,
    "asof_click_purchase_tolerance": SQL_ASOF_CLICK_PURCHASE_TOLERANCE,
    "range_click_purchases": SQL_RANGE_CLICK_PURCHASES,
    "sessions_busy_overlap": SQL_SESSIONS_BUSY_OVERLAP,
}
