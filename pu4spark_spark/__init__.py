"""pu4spark_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ispras/pu4spark, extended with
LLM-data-pipeline operators (dedup + near-dup clustering, similarity
search, multimodal columns, text analysis, corpus curation) designed for
100 TB scale.

Layout
------
- ``api``          : the ``PositiveUnlabeledLearner`` contract
- ``session``      : SparkSession builder with scale-aware defaults
- ``sources``      : parquet table loaders for the driver test schema
- ``features``     : multi-column feature assembly (VectorAssembler flow)
- ``labels``       : sentinel-label relational core (pure Catalyst exprs)
- ``config``       : JSON-round-trippable learner/classifier configs
- ``two_step``     : shared zero-step (train-on-all, score-all)
- ``traditional``  : Traditional PU learner (Liu et al. 2002)
- ``gradual``      : Gradual Reduction PU learner (PU-LEA, Fusilier 2015)
- ``operators``    : dedup / similarity / text / relational / multimodal /
  curation / as-of & range joins / composed cleaning pipelines
- ``functions``    : reusable column-expression builders (vectors, text)
- ``streaming``    : Structured Streaming pipelines over the events table

Reference parity: see SURVEY.md; every module docstring cites the
reference file:line it re-expresses.  No code is copied from the
reference — the algorithms are re-derived Spark-first in Python.
"""

__version__ = "0.1.0"

from pu4spark_spark.api import PositiveUnlabeledLearner
from pu4spark_spark.config import (
    GradualReductionPULearnerConfig,
    LogisticRegressionConfig,
    RandomForestConfig,
    TraditionalPULearnerConfig,
)
from pu4spark_spark.features import assemble_features
from pu4spark_spark.gradual import GradualReductionPULearner
from pu4spark_spark.traditional import TraditionalPULearner

__all__ = [
    "GradualReductionPULearner",
    "GradualReductionPULearnerConfig",
    "LogisticRegressionConfig",
    "PositiveUnlabeledLearner",
    "RandomForestConfig",
    "TraditionalPULearner",
    "TraditionalPULearnerConfig",
    "assemble_features",
    "__version__",
]
