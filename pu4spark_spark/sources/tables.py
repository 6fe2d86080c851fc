"""Parquet table sources for the driver's test schema (TESTDATA.md).

The reference has no sources at all — callers hand it a pre-built
DataFrame (reference: PositiveUnlabeledLearner.scala:22-25, README.md:74).
Our engine owns the scan path: ``spark.read.parquet`` so Catalyst gets
predicate pushdown / column pruning / partition pruning for free.

At 100 TB these tables would be partitioned directories (e.g. orders by
month); ``load_table`` is the single seam where bucketing/partition
metadata would attach — query code never hand-opens files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: canonical table names in every sf directory
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: small dimension tables — always broadcast-join these at scale
DIM_TABLES = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one test table as a DataFrame (lazy parquet scan).

    ``events.ts`` has shipped as both parquet TIMESTAMP(NANOS) (which
    Spark's vectorized reader rejects unless read as a nanosecond long
    via ``spark.sql.legacy.parquet.nanosAsLong``) and plain
    TIMESTAMP(MICROS).  Branch on the physical type actually in the file
    and normalize to a session-tz ``timestamp`` either way, matching
    DuckDB's view of the same file.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to a session-tz timestamp
    whatever the physical parquet type was (ns-long under
    ``nanosAsLong`` or native TIMESTAMP(MICROS)).  THE one definition
    of the contract — the batch loader above and the streaming source
    (``streaming/events.py:read_events_stream``) both apply it, so a
    third physical ts variant is handled in one place or neither."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Load every test table; handy for registering temp views."""
    return {t: load_table(spark, t, sf_dir) for t in TABLES}
