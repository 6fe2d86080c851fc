"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   : flagship query (smoke, sf0.001)
- ``queries()``      : name → (spark, sf_dir) → DataFrame, one per
  implemented operator from SURVEY.md §2
- ``oracle_sql()``   : name → DuckDB-ANSI SQL equivalent (omitted keys
  get a weaker rows-only check)

Column names are aliased identically on both sides — the driver sorts
columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pu4spark_spark.queries import ORACLE_SQL, QUERIES
from pu4spark_spark.session import tune_for_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Traditional PU learning over the sf0.001 embeddings —
    binarize class 9 as positive-vs-unlabeled, learn P(positive) for
    every vector (reference's core use case, README.md:68-80)."""
    from pu4spark_spark.config import (
        LogisticRegressionConfig,
        TraditionalPULearnerConfig,
    )

    tune_for_session(spark)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pu_input = emb.withColumn(
        "pu_label", F.when(F.col("label") == 9, 1).otherwise(0)
    )
    learner = TraditionalPULearnerConfig(
        relNegThreshold=0.5,
        maxIters=1,
        classifierConfig=LogisticRegressionConfig(),
    ).build()
    scored = learner.weight(pu_input, "pu_label", "embedding", "finalLabel")
    return scored.select("vec_id", "label", "finalLabel").orderBy("vec_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
