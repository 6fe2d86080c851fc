"""SAR-PU learner — propensity-weighted positive-unlabeled learning
under the Selected-At-Random assumption (Bekker & Davis, "Beyond the
Selected-Completely-At-Random Assumption for Learning from Positive
and Unlabeled Data", ECML-PKDD 2019; propensity framework of Elkan &
Noto 2008 generalized per group).  SIXTH member of the PU family, an
EXTENSION beyond the reference's two learners, sharing the
TwoStepPULearner machinery (two_step.py) and the
``weight(df, label, features)`` API
(PositiveUnlabeledLearner.scala:16-25).

Elkan–Noto assumes labeling is selected COMPLETELY at random: one
global propensity c = P(s=1|y=1).  In real corpora labeling effort
varies by stratum — one crawl source is annotated heavily, another
barely — which biases the single-c calibration.  SAR with a known
propensity ATTRIBUTE a(x) (here: a grouping column, e.g. the document
source) replaces the scalar with per-group propensities

    ê_g = mean g(x) over labeled positives in group g      (e1 per g)
    P(y=1|x) = min(1, g(x) / ê_{a(x)})

so a thinly-labeled group is calibrated UP by its own small ê rather
than being crushed by the corpus-wide constant.  Groups with no
labeled positives (ê undefined) fall back to the global Elkan c — the
least-wrong prior.  The substitution is INTERNAL: the calibration
column is dropped from the returned frame (same cleanup contract as
every learner); a caller auditing which groups fell back re-derives
them as "groups with zero labeled positives", one strata-sized agg.

Scale shape: ONE classifier fit (the shared ``zero_step``
fit-on-everything, TwoStepPULearner.scala:41-58 shape) + one scoring
pass + a |groups|-row aggregation that BROADCASTS back — propensity
groups are strata (sources, languages, date buckets), bounded and tiny
relative to the corpus, so the calibration join never shuffles the
fact side.  Everything outside the MLlib fit is whole-stage-codegen
column algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pu4spark_spark.config import INDEXED_FEATURES_NAME, LABEL_NAME
from pu4spark_spark.two_step import VEC_FEATURES_NAME, TwoStepPULearner


class SARPULearner(TwoStepPULearner):
    """Per-group propensity-calibrated single-fit PU learner.
    ``group_col`` names the observed propensity attribute; rows in
    groups without labeled positives calibrate with the global c.
    ``rel_neg_threshold`` is unused — like Elkan–Noto there is no
    reliable-negative mining step."""

    def __init__(self, classifier, group_col: str = "source"):
        super().__init__(rel_neg_threshold=0.0, classifier=classifier)
        self.group_col = group_col

    def weight(
        self,
        df: DataFrame,
        label_col: str = "label",
        features_col: str = "features",
        final_label: str = "finalLabel",
    ) -> DataFrame:
        from pu4spark_spark.plans import cached

        is_pos = F.col(label_col) == 1
        staged = df.withColumn("__s", F.when(is_pos, 1).otherwise(0))

        # g(x) = P(s=1|x): the shared step-0 fit-on-everything.
        # cached(): THREE consumers follow (the global-c collect, the
        # per-group agg, and the returned calibrated frame) — without
        # the persist each would re-run the whole scoring transform
        # over the corpus.
        scored = cached(
            self.zero_step(staged, "__s", features_col, final_label)
        )

        # global c first (the no-positives fallback), then per-group
        # e1 estimates — both over labeled positives only.  One pass
        # each; the group frame is strata-sized and broadcasts.
        c = scored.filter(is_pos).agg(
            F.avg(final_label).alias("c")
        ).collect()[0]["c"]
        if c is None or c <= 0.0:
            raise ValueError(
                "cannot calibrate: no labeled positives (c undefined)"
            )
        props = (
            scored.filter(is_pos)
            .groupBy(self.group_col)
            .agg(F.avg(final_label).alias("__e"))
        )
        out = (
            scored.join(F.broadcast(props), self.group_col, "left")
            .withColumn("__e", F.coalesce(F.col("__e"), F.lit(float(c))))
            .withColumn(
                final_label,
                F.least(
                    F.lit(1.0), F.col(final_label) / F.col("__e")
                ),
            )
        )
        return self.cleanup(
            out,
            "__s",
            "__e",
            INDEXED_FEATURES_NAME,
            VEC_FEATURES_NAME,
            LABEL_NAME,
        )
