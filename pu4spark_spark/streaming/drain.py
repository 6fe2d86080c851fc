"""State-partition sizing for one-shot streaming drains.

Stateful streaming operators (stream-stream joins, windowed/session
aggregations, ``dropDuplicatesWithinWatermark``) create one state store
per shuffle partition, and that count is FROZEN into the checkpoint at
the first micro-batch — it never adapts afterwards (AQE is disabled
inside streaming plans for exactly this reason).  Every micro-batch
then pays store init + commit + snapshot for every partition, whether
or not it holds state: a stream-stream join keeps FOUR stores per
partition (left/right × keyToNumValues/keyWithIndexToValue), so a
32-partition drain commits 128 stores per batch.

That makes ``spark.sql.shuffle.partitions`` a throughput knob, not an
inherited default: size it so each partition's state is ~100–200 MB at
the expected in-flight volume.  The registry's one-shot
``availableNow`` drains process a single small batch, where the batch
default (32) is pure fixed overhead — measured on the stream-stream
left-outer join at sf0.1: 8.1 s at 32 partitions vs 2.4 s at 8, byte-
identical output.  A production deployment of the same query at 100 TB/
day would raise the number at checkpoint-creation time instead (state
volume / 150 MB), which is why this is a context manager around the
drain rather than a global session setting.
"""

from __future__ import annotations

import uuid
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

#: partitions for the registry's one-shot drains — enough parallelism
#: for a single sf0.1 micro-batch while keeping store-commit overhead
#: proportional to the state actually held
DRAIN_PARTITIONS = 8

_KEY = "spark.sql.shuffle.partitions"


@contextmanager
def drain_partitions(
    spark: SparkSession, n: int = DRAIN_PARTITIONS
) -> Iterator[None]:
    """Run a streaming drain under ``n`` shuffle (= state) partitions,
    restoring the session's batch setting afterwards.  Values are
    partition-count independent (verified per query by the oracle
    harness); only store-commit overhead changes."""
    prev = spark.conf.get(_KEY)
    spark.conf.set(_KEY, str(n))
    try:
        yield
    finally:
        spark.conf.set(_KEY, prev)


def drain_to_memory(
    spark: SparkSession,
    df: DataFrame,
    name_prefix: str,
    output_mode: str,
    n: int = DRAIN_PARTITIONS,
) -> DataFrame:
    """One-shot ``availableNow`` drain of a streaming frame into a
    uniquely-named memory sink under :func:`drain_partitions`; returns
    the drained table.  Every registry streaming query that compares a
    full drain against a batch oracle goes through here, so the
    state-partition sizing (and its restore) lives in one place."""
    name = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    with drain_partitions(spark, n):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return spark.table(name)
