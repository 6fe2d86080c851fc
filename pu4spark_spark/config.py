"""JSON-round-trippable configs for classifiers and PU learners.

Mirrors the reference's case-class + json4s ``ShortTypeHints`` registry
(reference: ProbabilisticClassifierConfig.scala:11-34,
PositiveUnlabeledLearner.scala:31-40, TraditionalPULearner.scala:98-108,
GradualReductionPULearner.scala:109-117) as Python dataclasses with a
``type`` tag.  Defaults match the reference exactly (LR maxIter=100,
regParam=1e-8, elasticNet=0.0; RF numTrees=512; relNegThreshold=0.5;
Traditional maxIters=1) — plus an explicit ``seed`` the reference lacks,
so RandomForest runs are reproducible (SURVEY.md §4 determinism note).

Internal column names reproduce the reference's reserved names
(ProbabilisticClassifierConfig.scala:31-34): trained label column
``label``, features column ``indexedFeatures``.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from typing import Any

# The reference uses "label" (ProbabilisticClassifierConfig.scala:31-34),
# which silently collides when the *user's* label column is also named
# "label" (the common case).  We deliberately namespace the internal
# trained-label column instead (SURVEY.md §1 reserved-names note).
LABEL_NAME = "__puLabel"
INDEXED_FEATURES_NAME = "indexedFeatures"


@dataclass
class LogisticRegressionConfig:
    maxIter: int = 100
    regParam: float = 1e-8
    elasticNetParam: float = 0.0
    #: optional per-row instance-weight column (MLlib ``weightCol``) —
    #: how soft-dedup 1/n weights (curation_soft_dedup_weights) reach
    #: training without dropping rows; the column must survive into the
    #: frame ``weight()`` is called on
    weightCol: str | None = None

    def build(self):
        from pyspark.ml.classification import LogisticRegression

        lr = (
            LogisticRegression(
                maxIter=self.maxIter,
                regParam=self.regParam,
                elasticNetParam=self.elasticNetParam,
            )
            .setLabelCol(LABEL_NAME)
            .setFeaturesCol(INDEXED_FEATURES_NAME)
        )
        if self.weightCol is not None:
            lr = lr.setWeightCol(self.weightCol)
        return lr


@dataclass
class RandomForestConfig:
    numTrees: int = 512
    seed: int = 42  # reference leaves Spark's default seed; we pin it

    def build(self):
        from pyspark.ml.classification import RandomForestClassifier

        return (
            RandomForestClassifier(numTrees=self.numTrees, seed=self.seed)
            .setLabelCol(LABEL_NAME)
            .setFeaturesCol(INDEXED_FEATURES_NAME)
        )


@dataclass
class TraditionalPULearnerConfig:
    relNegThreshold: float = 0.5
    maxIters: int = 1
    classifierConfig: LogisticRegressionConfig | RandomForestConfig = field(
        default_factory=LogisticRegressionConfig
    )

    def build(self):
        from pu4spark_spark.traditional import TraditionalPULearner

        return TraditionalPULearner(
            self.relNegThreshold, self.maxIters, self.classifierConfig.build()
        )


@dataclass
class GradualReductionPULearnerConfig:
    relNegThreshold: float = 0.5
    classifierConfig: LogisticRegressionConfig | RandomForestConfig = field(
        default_factory=LogisticRegressionConfig
    )

    def build(self):
        from pu4spark_spark.gradual import GradualReductionPULearner

        return GradualReductionPULearner(
            self.relNegThreshold, self.classifierConfig.build()
        )


@dataclass
class ElkanNotoPULearnerConfig:
    """Calibrated single-fit PU learner (Elkan & Noto, KDD 2008) — an
    extension beyond the reference's registry; see elkan.py."""

    classifierConfig: LogisticRegressionConfig | RandomForestConfig = field(
        default_factory=LogisticRegressionConfig
    )

    def build(self):
        from pu4spark_spark.elkan import ElkanNotoPULearner

        return ElkanNotoPULearner(self.classifierConfig.build())


@dataclass
class SpyEMPULearnerConfig:
    """S-EM spy-technique PU learner (Liu et al. 2002) — an extension
    beyond the reference's registry; see spy.py."""

    spyFrac: float = 0.15
    spyQuantile: float = 0.05
    classifierConfig: LogisticRegressionConfig | RandomForestConfig = field(
        default_factory=LogisticRegressionConfig
    )

    def build(self):
        from pu4spark_spark.spy import SpyEMPULearner

        return SpyEMPULearner(
            self.classifierConfig.build(),
            spy_frac=self.spyFrac,
            spy_quantile=self.spyQuantile,
        )


@dataclass
class PUBaggingLearnerConfig:
    """Bagged PU learner (Mordelet & Vert 2014) — an extension beyond
    the reference's registry; see bagging.py."""

    nRounds: int = 5
    sampleFrac: float = 0.5
    classifierConfig: LogisticRegressionConfig | RandomForestConfig = field(
        default_factory=LogisticRegressionConfig
    )

    def build(self):
        from pu4spark_spark.bagging import PUBaggingLearner

        return PUBaggingLearner(
            self.classifierConfig.build(),
            n_rounds=self.nRounds,
            sample_frac=self.sampleFrac,
        )


@dataclass
class SARPULearnerConfig:
    """Propensity-weighted SAR-PU learner (Bekker & Davis 2019) — an
    extension beyond the reference's registry; see sar.py."""

    groupCol: str = "source"
    classifierConfig: LogisticRegressionConfig | RandomForestConfig = field(
        default_factory=LogisticRegressionConfig
    )

    def build(self):
        from pu4spark_spark.sar import SARPULearner

        return SARPULearner(
            self.classifierConfig.build(), group_col=self.groupCol
        )


#: polymorphic (de)serialization registry — mirrors the json4s
#: ``subclasses`` lists (PositiveUnlabeledLearner.scala:36-40,
#: ProbabilisticClassifierConfig.scala:34)
_REGISTRY: dict[str, type] = {
    cls.__name__: cls
    for cls in (
        LogisticRegressionConfig,
        RandomForestConfig,
        TraditionalPULearnerConfig,
        GradualReductionPULearnerConfig,
        ElkanNotoPULearnerConfig,
        SpyEMPULearnerConfig,
        PUBaggingLearnerConfig,
        SARPULearnerConfig,
    )
}


def to_json(cfg: Any) -> str:
    """Serialize any registered config (nested ones included) with
    ``type`` tags, mirroring json4s ShortTypeHints output shape."""

    def tag(obj: Any) -> Any:
        if type(obj).__name__ in _REGISTRY:
            d = {"type": type(obj).__name__}
            d.update({k: tag(v) for k, v in asdict(obj).items()})
            # asdict flattens nested dataclasses to dicts; re-tag them
            for k, v in vars(obj).items():
                if type(v).__name__ in _REGISTRY:
                    d[k] = tag(v)
            return d
        return obj

    return json.dumps(tag(cfg), sort_keys=True)


def from_json(s: str) -> Any:
    """Inverse of :func:`to_json`."""

    def untag(obj: Any) -> Any:
        if isinstance(obj, dict) and "type" in obj:
            cls = _REGISTRY[obj["type"]]
            kwargs = {k: untag(v) for k, v in obj.items() if k != "type"}
            return cls(**kwargs)
        return obj

    return untag(json.loads(s))
