"""Vector column-expression builders (similarity search + dedup).

Embeddings live as ``array<float>`` in parquet (FIXTURES.md); everything
here stays array-native inside whole-stage codegen — no UDFs, no Python.

Exactness discipline: floats are floor-quantized to integers
(``floor(x·1000)``), making dot products associative integer sums —
partition-order independent (stable across cluster sizes) and bit-equal
to the DuckDB oracle.  The final cosine is a fixed sequence of IEEE
double ops (div, sqrt, mul), deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT = 1000


def quantized(col: Column | str) -> Column:
    """floor(x·1000) as exact int64 — IEEE floor matches across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.floor(x.cast("double") * QUANT).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product via zip_with + left-fold aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_from_quantized(dot_ab: Column, norm2_a: Column, norm2_b: Column) -> Column:
    return dot_ab / (F.sqrt(norm2_a) * F.sqrt(norm2_b))


def sql_quantized(expr: str) -> str:
    return (
        f"list_transform(CAST({expr} AS DOUBLE[]),"
        f" x -> CAST(floor(x * {QUANT}) AS BIGINT))"
    )


def sign_bucket(col: Column | str, dims: list[int]) -> Column:
    """Sign-pattern LSH bucket: bit i set iff embedding[dims[i]] ≥ 0.

    A deterministic stand-in for random-hyperplane LSH (the hyperplanes
    are the chosen coordinate axes): nearby vectors land in the same
    bucket with high probability, so ANN search probes one bucket
    instead of the full table.
    """
    c = F.col(col) if isinstance(col, str) else col
    bucket = F.lit(0)
    for i, d in enumerate(dims):
        bucket = bucket + F.when(
            F.element_at(c, d + 1) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return bucket.cast("int")


def sql_sign_bucket(expr: str, dims: list[int]) -> str:
    parts = " + ".join(
        f"(CASE WHEN {expr}[{d + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i, d in enumerate(dims)
    )
    return f"CAST({parts} AS INTEGER)"
