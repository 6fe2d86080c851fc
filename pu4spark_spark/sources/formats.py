"""Text-format sources/sinks (CSV, JSON-lines) — SURVEY.md §2B
scans/sources row.

Schema is ALWAYS explicit: at 100 TB, schema inference is a full extra
pass over the data before the real job starts (and a silently wrong one
when late files drift).  Readers here refuse to infer — callers pass a
``StructType`` or DDL string, which also makes the scan plan stable
across runs.  Malformed rows are quarantined PERMISSIVE-style into a
``_corrupt_record`` column rather than failing the whole 1000-executor
job, unless ``strict=True`` (FAILFAST).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def load_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
    strict: bool = False,
) -> DataFrame:
    """Schema-explicit CSV scan (no inference pass)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
        .csv(path)
    )


def load_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    strict: bool = False,
) -> DataFrame:
    """Schema-explicit JSON-lines scan (no inference pass)."""
    return (
        spark.read.schema(schema)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
        .json(path)
    )


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    """CSV sink with a timestamp format the readers above round-trip."""
    (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
        .csv(path)
    )


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink, timestamp format symmetric with ``load_json``."""
    (
        df.write.mode(mode)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
        .json(path)
    )


def load_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """ORC scan — the other columnar format Spark ships natively.  ORC
    files embed their schema (no inference pass either way), so
    ``schema`` is optional and, when given, acts as projection +
    type-check; predicate pushdown and column pruning reach the ORC
    reader exactly as with parquet."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zstd-compressed, matching the parquet default)."""
    df.write.mode(mode).option("compression", "zstd").orc(path)
