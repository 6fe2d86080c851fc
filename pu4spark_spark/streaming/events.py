"""Structured Streaming pipeline over the events table (SURVEY.md §2B
streaming row — the reference has no streaming at all).

The events parquet is treated as a file-source stream (exactly how a
100 TB event feed lands: files appearing in a directory), aggregated with
watermarked tumbling windows.  ``run_hourly_counts_available_now``
drains the source with the availableNow trigger into a memory sink and
returns the finished batch DataFrame, so the same pipeline is usable
both as a long-running stream and as a driver-checkable query (its
output matches the batch ``events_hourly`` oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pu4spark_spark.streaming.drain import drain_partitions, drain_to_memory

#: events parquet logical schema after ts normalization (the physical ts
#: type has shipped as both TIMESTAMP(NANOS)-as-long and TIMESTAMP(MICROS);
#: ``read_events_stream`` sniffs the real file schema via a batch footer
#: read, so the stream never guesses)
EVENTS_COLUMNS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def _events_stream_dir(sf_dir: str) -> str:
    """Landing directory with a symlink to the (read-only) events file
    — the shared dangling-link-safe builder (ADVICE r4)."""
    from pu4spark_spark.streaming.landing import symlink_landing_dir

    return symlink_landing_dir(f"{sf_dir}/events.parquet", "pu4spark_events")


# ONE definition of the ts contract, shared with the batch loader —
# re-exported here for the streaming callers and tests
from pu4spark_spark.sources.tables import normalize_event_ts  # noqa: E402,F401


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = _events_stream_dir(sf_dir)
    # Batch footer read (metadata only, no data scan) to learn the real
    # physical ts type — the file has shipped as both TIMESTAMP(NANOS)
    # (surfaces as a ns long under nanosAsLong) and TIMESTAMP(MICROS).
    physical = spark.read.parquet(path).schema
    raw = (
        spark.readStream.schema(physical)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return normalize_event_ts(raw)


def hourly_counts(stream: DataFrame) -> DataFrame:
    """Watermarked tumbling-window aggregation: the streaming analogue of
    the batch ``events_hourly`` query (same grouping, same exact-decimal
    sum)."""
    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w.start").alias("hour"), "event_type", "n_events", "sum_value"
        )
    )


def run_hourly_counts_available_now(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drain the stream with trigger(availableNow) into a memory sink and
    return the final table — a real streaming execution with a batch
    result."""
    agg = hourly_counts(read_events_stream(spark, sf_dir))
    return drain_to_memory(spark, agg, "events_hourly_stream", "complete")


def q_streaming_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_hourly_counts_available_now(spark, sf_dir)


#: identical result contract to the batch query — the streaming pipeline
#: must agree with the same DuckDB oracle
SQL_STREAMING_EVENTS_HOURLY = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""

# -- stream-static broadcast enrichment ----------------------------------

def q_streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–STATIC join: each arriving event is enriched with its
    customer's market segment from the static dimension table, then
    aggregated to hourly revenue per segment — the canonical
    "enrich the firehose with reference data" pattern.

    Scale shape: a stream-static join keeps NO join state (unlike
    stream-stream, nothing waits for late matches — the static side is
    simply available), and with the dimension broadcast the per-batch
    cost is a hash probe in the scan stage.  The static side is
    re-resolvable per micro-batch, which at 100 TB is how slowly-
    changing dimensions refresh without restarting the stream.  The
    watermarked hourly aggregate then carries bounded state exactly as
    the plain hourly query."""
    from pu4spark_spark.sources import load_table

    stream = read_events_stream(spark, sf_dir)
    dim = F.broadcast(
        load_table(spark, "customer", sf_dir).select(
            F.col("c_custkey"), F.col("c_mktsegment")
        )
    )
    enriched = stream.join(dim, stream.user_id == dim.c_custkey)
    agg = (
        enriched.withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("c_mktsegment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "c_mktsegment",
            "n_events",
            "sum_value",
        )
    )
    return drain_to_memory(spark, agg, "events_enrich_stream", "complete")


SQL_STREAMING_STATIC_ENRICH = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, c_mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""


# -- sliding windows (streaming) ----------------------------------------

def sliding_counts(stream: DataFrame) -> DataFrame:
    """Watermarked SLIDING windows (1 hour every 15 minutes): each
    event feeds size/slide = 4 overlapping windows; state is bounded by
    the watermark exactly as for tumbling windows, just 4× the window
    rows — the streaming rolling-rate view."""
    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def q_streaming_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming twin of the batch ``events_sliding_windows`` —
    complete-mode availableNow drain must reproduce the batch sliding
    aggregate exactly (same 4-windows-per-event assignment, same exact
    decimal sums)."""
    agg = sliding_counts(read_events_stream(spark, sf_dir))
    return drain_to_memory(spark, agg, "events_sliding_stream", "complete")


SQL_STREAMING_SLIDING = """
WITH slid AS (
  SELECT event_type, value,
         time_bucket(INTERVAL 15 MINUTE, ts)
           - (k * INTERVAL 15 MINUTE) AS w_start
  FROM events, unnest(range(0, 4)) AS t(k)
)
SELECT CAST(w_start AS TIMESTAMP) AS w_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM slid
GROUP BY 1, 2
"""


# -- session windows -----------------------------------------------------

SESSION_GAP = "30 minutes"


def sessionized_counts(stream: DataFrame) -> DataFrame:
    """Per-user session windows (30-min inactivity gap): Spark merges
    events into a session while each next event starts strictly before
    ``latest_event + gap``; the window spans
    ``[min ts, max ts + gap)``."""
    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.session_window("ts", SESSION_GAP).alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization drained with availableNow — a custom
    stateful-window operator no fixed bucketing can express.

    Output mode is ``complete`` so the one-shot drain emits every
    session for the oracle comparison; a long-running production stream
    would run ``append`` + the 2-hour watermark instead, letting Spark
    evict closed sessions from the state store (state stays
    O(open sessions), not O(history))."""
    agg = sessionized_counts(read_events_stream(spark, sf_dir))
    return drain_to_memory(spark, agg, "events_sessions_stream", "complete")


#: gap-and-island sessionization: a session break is a gap ≥ the 30-min
#: window (Spark merges only while the next event starts STRICTLY before
#: latest+gap, so an exactly-gap-sized silence starts a new session in
#: both formulations); session_end mirrors Spark's max(ts)+gap
SQL_STREAMING_SESSIONS = """
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

# -- stream-stream join ---------------------------------------------------

STREAM_JOIN_LOOKBACK = "6 hours"


def _click_purchase_joined(
    spark: SparkSession, sf_dir: str, how: str
) -> DataFrame:
    """The watermarked click→purchase attribution join, shared by the
    inner (``range_join``) and left-outer twins so the two can never
    drift apart in watermark, lookback, or projected columns — only the
    join TYPE differs (and with it the state-eviction/null-extension
    semantics)."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("pts"),
        )
        .withWatermark("pts", "1 hour")
    )
    return clicks.join(
        purchases,
        F.expr(
            f"c_user_id = p_user_id AND pts <= cts "
            f"AND pts >= cts - interval {STREAM_JOIN_LOOKBACK}"
        ),
        how,
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user_id").alias("user_id"),
        (F.unix_micros(F.col("cts")) - F.unix_micros(F.col("pts"))).alias(
            "gap_micros"
        ),
    )


def q_streaming_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with a watermarked time-range condition:
    clicks joined to the same user's purchases within the 6 hours before
    the click — the streaming twin of the batch ``range_click_purchases``
    query, checked against the SAME oracle.

    Both sides carry watermarks so Spark can bound the join state: a
    buffered purchase is dropped once the click watermark passes its
    ts + lookback (state is O(in-flight window), not O(stream))."""
    joined = _click_purchase_joined(spark, sf_dir, "inner")
    return drain_to_memory(spark, joined, "events_range_stream", "append")


#: identical contract to the batch banded range join
SQL_STREAMING_RANGE_JOIN = """
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
 AND epoch_us(p.pts) >= epoch_us(c.cts) - 21600000000
"""

def q_streaming_left_outer_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join — the attribution shape
    ("every click, with its purchase if one ever arrives"): matched
    rows emit as soon as both sides meet; a click with no match is
    held in state until the watermark proves no future purchase can
    join it (pts would have to be ≥ cts − lookback and ≤ cts, and the
    watermark has passed cts), then emits once with NULL purchase
    columns.  State is watermark-bounded on both sides — the unmatched
    side never accumulates beyond the in-flight window, which is what
    makes left-outer attribution viable on an unbounded 100 TB feed.

    Oracle contract (closed rows only, mirroring the file-sink query's
    discipline): ALL matched pairs, plus unmatched clicks whose
    ``cts < final watermark`` where the final watermark is
    ``least(max cts, max pts) − 1 hour`` — clicks still inside the
    horizon when the source drains are *not* emitted (their window
    never closed), and the DuckDB oracle replicates that predicate
    verbatim (verified empirically: 235 matched + 1782 null-extended
    at sf0.01, both engines)."""
    joined = _click_purchase_joined(spark, sf_dir, "left_outer")
    return drain_to_memory(spark, joined, "events_louter_stream", "append")


SQL_STREAMING_LEFT_OUTER_JOIN = """
WITH clicks AS (
  SELECT event_id AS click_id, user_id, ts AS cts
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT event_id AS purchase_id, user_id, ts AS pts
  FROM events WHERE event_type = 'purchase'
),
wm AS (
  SELECT least((SELECT max(cts) FROM clicks),
               (SELECT max(pts) FROM purchases)) - INTERVAL 1 HOUR AS w
)
SELECT c.click_id, p.purchase_id, c.user_id,
       epoch_us(c.cts) - epoch_us(p.pts) AS gap_micros
FROM clicks c JOIN purchases p
  ON c.user_id = p.user_id
 AND p.pts <= c.cts
 AND epoch_us(p.pts) >= epoch_us(c.cts) - 21600000000
UNION ALL
SELECT c.click_id, NULL AS purchase_id, c.user_id, NULL AS gap_micros
FROM clicks c, wm
WHERE c.cts < wm.w
  AND NOT EXISTS (
    SELECT 1 FROM purchases p
    WHERE p.user_id = c.user_id AND p.pts <= c.cts
      AND epoch_us(p.pts) >= epoch_us(c.cts) - 21600000000)
"""


# -- streaming dedup ------------------------------------------------------

def q_streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup via ``dropDuplicatesWithinWatermark`` — the
    streaming twin of the batch keep-first dedup family
    (``dedup_events_first``): the first arrival per
    (user_id, event_type) passes, later duplicates are dropped while
    the key is inside the watermark horizon.

    State is evicted once the watermark passes a key's last-seen event
    (O(keys in flight), not O(stream)) — the semantics a 100 TB event
    feed needs, where an exact global dedup would retain unbounded
    state.  The output projects ONLY the key columns: *which* duplicate
    survives depends on arrival order, but the surviving key set is
    arrival-order independent, so the query stays value-checkable
    against a ``SELECT DISTINCT`` oracle.  The drained table gets a
    final ``distinct()``: duplicates of a key arriving in a LATER
    micro-batch, after the watermark evicted its state, are re-emitted
    by design (that's the watermark-bounded contract) — the reduction
    makes the key-set comparison hold for any landing-file layout, not
    just a single-batch directory."""
    stream = read_events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return drain_to_memory(
        spark, deduped, "events_dedup_stream", "append"
    ).distinct()


SQL_STREAMING_DEDUP_KEYS = """
SELECT DISTINCT user_id, event_type FROM events
"""

# -- production file sink --------------------------------------------------

def q_streaming_hourly_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION drain of the hourly aggregation: append-mode
    ``writeStream.format("parquet")`` with a checkpoint, then a re-read
    of the committed files — no row ever passes through the driver
    (the memory-sink drains above are the oracle harness, not the
    deployment shape; this is the deployment shape, value-checked).

    Append mode + watermark semantics: a window is written once the
    watermark (max event ts − 2 h) passes its end — exactly-once via
    the checkpoint + file-sink commit log.  Windows still in flight at
    end-of-stream correctly remain in state, so the oracle filters the
    batch aggregate to closed windows.  Restarting the same stream
    resumes from the checkpoint instead of re-emitting (idempotent
    re-run = the 100 TB operational requirement)."""
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    # per-process suffix: a concurrent session's rmtree must not delete
    # this one's live checkpoint/sink mid-drain (ADVICE r4)
    base = os.path.join(
        tempfile.gettempdir(), f"pu4spark_hourly_sink_{tag}_{os.getpid()}"
    )
    # fresh run each invocation: the checkpoint would otherwise treat
    # the (static) fixture as already-processed and emit nothing new
    shutil.rmtree(base, ignore_errors=True)
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    agg = hourly_counts(read_events_stream(spark, sf_dir))
    with drain_partitions(spark):
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return spark.read.parquet(out_dir)


#: the batch aggregate restricted to windows the final watermark closed
SQL_STREAMING_HOURLY_FILE_SINK = """
WITH agg AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
  FROM events
  GROUP BY 1, 2
),
wm AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS w FROM events)
SELECT hour, event_type, n_events, sum_value
FROM agg, wm
WHERE hour + INTERVAL 1 HOUR <= w
"""

def q_streaming_restart_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECKPOINT RECOVERY, value-checked: the exactly-once-across-
    restarts contract every production stream depends on.  Half the
    events land, a checkpointed aggregation drains them and STOPS (a
    deploy, a crash); the other half lands; the SAME query restarts
    from the checkpoint and drains again.  The restarted run recovers
    the phase-1 aggregation state from the state store and its source
    log skips the already-committed files, so the final complete-mode
    table must equal the batch aggregate over ALL events — phase-1
    rows counted exactly once.  If restart re-read the committed files
    into recovered state, every phase-1 count would double and the
    hash check would fail; the oracle is therefore a real witness of
    the resume semantics, not just of the aggregation.

    Money is summed in integer cents (exact, order-independent) so the
    restart boundary can never show up as float drift.  At 100 TB this
    is the nightly-deploy path: state shuffles once on event_type, the
    restarted run's work is sized by the NEW files only."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from pu4spark_spark.sources import load_table
    from pu4spark_spark.streaming.drain import drain_partitions

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.join(
        tempfile.gettempdir(), f"pu4spark_restart_{tag}_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    landing = os.path.join(base, "landing")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(landing)

    events = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    schema = events.schema

    def _land(phase: str, df) -> None:
        """Write one phase's slice and move its part files into the
        landing dir (atomic renames — files appear whole, exactly how
        a feed delivers them)."""
        stage = os.path.join(base, f"stage_{phase}")
        df.coalesce(2).write.mode("overwrite").parquet(stage)
        for f in os.listdir(stage):
            if f.endswith(".parquet"):
                os.replace(
                    os.path.join(stage, f),
                    os.path.join(landing, f"{phase}-{f}"),
                )

    name = f"restart_resume_{uuid.uuid4().hex[:8]}"

    def _drain_once() -> None:
        stream = spark.readStream.schema(schema).parquet(landing)
        agg = stream.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
            ).alias("total_cents"),
        )
        with drain_partitions(spark, 8):
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            q.stop()

    _land("a", events.filter(F.col("event_id") % 2 == 0))
    _drain_once()  # phase 1: half the data, then "deploy"
    _land("b", events.filter(F.col("event_id") % 2 == 1))
    _drain_once()  # restart from checkpoint: new files only
    return spark.table(name)


SQL_STREAMING_RESTART_RESUME = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS total_cents
FROM events
GROUP BY event_type
"""


def q_streaming_observed_metrics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming ``observe()`` — pipeline observability riding the
    stream itself (the streaming twin of the batch
    ``pipeline_observed_metrics``): counters and exact integer sums
    are attached to the source stream as observed metrics, surface in
    every micro-batch's ``StreamingQueryProgress``, and are summed
    across batches — the zero-extra-pass ingest dashboard.  The
    metrics are additive (counts + integer cents), so the cross-batch
    sum is batch-slicing-invariant and hash-matches the batch oracle
    exactly; at 100 TB these numbers feed the metrics system straight
    from the progress events, costing nothing beyond the aggregation
    the stream already runs."""
    from pu4spark_spark.streaming.drain import drain_partitions

    stream = read_events_stream(spark, sf_dir)
    observed = stream.observe(
        "ingest_probe",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
        ).alias("total_cents"),
        F.count(F.when(F.col("value") < 0, 1)).alias("n_negative"),
        F.approx_count_distinct("user_id").alias("n_users_approx"),
    )
    with drain_partitions(spark, 8):
        q = (
            observed.writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progresses = list(q.recentProgress)
        q.stop()
    n_rows = total_cents = n_negative = 0
    for p in progresses:
        m = p.observedMetrics.get("ingest_probe")
        if m is None or m["n_rows"] == 0:
            continue
        n_rows += m["n_rows"]
        total_cents += m["total_cents"]
        n_negative += m["n_negative"]
    return spark.createDataFrame(
        [(n_rows, total_cents, n_negative)],
        "n_rows long, total_cents long, n_negative long",
    )


SQL_STREAMING_OBSERVED_METRICS = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_negative
FROM events
"""


QUERIES = {
    "streaming_restart_resume": q_streaming_restart_resume,
    "streaming_observed_metrics": q_streaming_observed_metrics,
    "streaming_events_hourly": q_streaming_events_hourly,
    "streaming_sliding_windows": q_streaming_sliding_windows,
    "streaming_static_enrich": q_streaming_static_enrich,
    "streaming_sessions": q_streaming_sessions,
    "streaming_range_join": q_streaming_range_join,
    "streaming_left_outer_join": q_streaming_left_outer_join,
    "streaming_dedup_keys": q_streaming_dedup_keys,
    "streaming_hourly_file_sink": q_streaming_hourly_file_sink,
}
ORACLE_SQL = {
    "streaming_restart_resume": SQL_STREAMING_RESTART_RESUME,
    "streaming_observed_metrics": SQL_STREAMING_OBSERVED_METRICS,
    "streaming_events_hourly": SQL_STREAMING_EVENTS_HOURLY,
    "streaming_sliding_windows": SQL_STREAMING_SLIDING,
    "streaming_static_enrich": SQL_STREAMING_STATIC_ENRICH,
    "streaming_sessions": SQL_STREAMING_SESSIONS,
    "streaming_range_join": SQL_STREAMING_RANGE_JOIN,
    "streaming_left_outer_join": SQL_STREAMING_LEFT_OUTER_JOIN,
    "streaming_dedup_keys": SQL_STREAMING_DEDUP_KEYS,
    "streaming_hourly_file_sink": SQL_STREAMING_HOURLY_FILE_SINK,
}
