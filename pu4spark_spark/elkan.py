"""Elkan–Noto PU learner ("Learning classifiers from only positive and
unlabeled data", Elkan & Noto, KDD 2008) — an EXTENSION beyond the
reference's two learners, sharing the TwoStepPULearner machinery
(two_step.py) and the ``weight(df, label, features)`` API
(PositiveUnlabeledLearner.scala:16-25).

Where the reference's learners MINE reliable negatives and retrain,
Elkan–Noto never retrains: it proves that under the selected-completely-
at-random assumption a classifier g(x) trained on labeled-vs-unlabeled
satisfies g(x) = c · P(y=1|x) with the constant c = P(s=1 | y=1), so

    1. fit g on s (labeled = 1, unlabeled = 0) over ALL rows — exactly
       the shared ``zero_step`` (TwoStepPULearner.scala:41-58 shape);
    2. estimate c as the MEAN of g over the labeled positives (the
       paper's e1 estimator) — one 1-row aggregation → driver scalar
       (same protocol as the loop learners' fused convergence agg,
       labels.py:131-161);
    3. output P(y=1|x) = min(1, g(x)/c) for every row — a scan-stage
       expression, no second fit.

Scale shape: ONE classifier fit + one scoring pass + a 1-row agg — the
cheapest member of the PU family (the loop learners pay one fit per
iteration).  Everything outside the MLlib fit is whole-stage-codegen
column algebra; determinism is the classifier's (LR deterministic, RF
seed-pinned), so rows-only checks are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pu4spark_spark.config import INDEXED_FEATURES_NAME, LABEL_NAME
from pu4spark_spark.two_step import VEC_FEATURES_NAME, TwoStepPULearner


class ElkanNotoPULearner(TwoStepPULearner):
    """Calibrated single-fit PU learner.  ``rel_neg_threshold`` is
    unused — Elkan–Noto has no reliable-negative mining step at all."""

    def __init__(self, classifier):
        super().__init__(rel_neg_threshold=0.0, classifier=classifier)

    def weight(
        self,
        df: DataFrame,
        label_col: str = "label",
        features_col: str = "features",
        final_label: str = "finalLabel",
    ) -> DataFrame:
        is_pos = F.col(label_col) == 1
        staged = df.withColumn("__s", F.when(is_pos, 1).otherwise(0))

        # g(x) = P(s=1|x): the shared step-0 fit-on-everything
        scored = self.zero_step(staged, "__s", features_col, final_label)

        # c = mean g over labeled positives (e1 estimator): one 1-row
        # agg -> driver scalar, the family's convergence-scalar protocol
        c = scored.filter(is_pos).agg(
            F.avg(final_label).alias("c")
        ).collect()[0]["c"]
        if c is None or c <= 0.0:
            raise ValueError(
                "cannot calibrate: no labeled positives (c undefined)"
            )

        out = scored.withColumn(
            final_label,
            F.least(F.lit(1.0), F.col(final_label) / F.lit(float(c))),
        )
        return self.cleanup(
            out,
            "__s",
            INDEXED_FEATURES_NAME,
            VEC_FEATURES_NAME,
            LABEL_NAME,
        )
