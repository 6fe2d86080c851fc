"""Spy-based PU learner (S-EM step-1 spy technique, Liu et al. ICML
2002 §3.1) — an EXTENSION beyond the reference's two learners, built
from the same TwoStepPULearner machinery (two_step.py) so it drops into
the identical ``weight(df, label, features)`` API
(PositiveUnlabeledLearner.scala:16-25).

Protocol:

1. A deterministic hash coin moves ``spy_frac`` of the positives into
   the negative side ("spies"); the classifier trains on
   (P∖S = 1) vs (U ∪ S = 0) and scores every row.
2. The spies' score distribution calibrates the reliable-negative
   threshold: t = the ``spy_quantile`` quantile of spy scores on a
   fixed 1/SPY_BINS grid (spies ARE positives, so all but the lowest
   tail of true positives score above t).  Unlabeled rows scoring
   below t become reliable negatives.
3. Final fit on P(=1) vs RN(=0), undecided rows excluded; every row is
   rescored — ``final_label`` = P(positive).

Scale shape: two classifier fits + two full scans; the spy coin and
both label algebras are scan-stage expressions; the only driver-side
value is the ≤ SPY_BINS-row spy-score histogram the quantile is read
from (bounded-table protocol — exact ``percentile`` would buffer every
spy score in one task's aggregation state).  Determinism: the
coin is ``pmod(hash(features), 1000)`` (murmur3 over the feature array
— no RNG), LR fits are deterministic, so rows-only checks are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pu4spark_spark.config import INDEXED_FEATURES_NAME, LABEL_NAME
from pu4spark_spark.two_step import VEC_FEATURES_NAME, TwoStepPULearner

SPY_COIN_MOD = 1000

#: fixed spy-score quantile grid — the threshold is the lower edge of
#: the bin where the spy cumulative count crosses the quantile, so the
#: calibration agg state is ≤ SPY_BINS+1 rows regardless of corpus size
SPY_BINS = 1000


class SpyEMPULearner(TwoStepPULearner):
    """S-EM spy technique: spy-calibrated reliable negatives, one final
    retrain.  ``rel_neg_threshold`` is unused (the spies replace the
    fixed threshold — that is the point of the method)."""

    def __init__(
        self,
        classifier,
        spy_frac: float = 0.15,
        spy_quantile: float = 0.05,
    ):
        super().__init__(rel_neg_threshold=0.0, classifier=classifier)
        if not 0.0 < spy_frac < 1.0:
            raise ValueError("spy_frac must be in (0, 1)")
        if not 0.0 <= spy_quantile <= 1.0:
            raise ValueError("spy_quantile must be in [0, 1]")
        self.spy_frac = float(spy_frac)
        self.spy_quantile = float(spy_quantile)

    def spy_coin(self, features_col: str) -> F.Column:
        """Deterministic in-(0,1) coin per row from the feature hash."""
        return (
            F.pmod(F.hash(F.col(features_col)), F.lit(SPY_COIN_MOD))
            / F.lit(float(SPY_COIN_MOD))
        )

    def weight(
        self,
        df: DataFrame,
        label_col: str = "label",
        features_col: str = "features",
        final_label: str = "finalLabel",
    ) -> DataFrame:
        is_pos = F.col(label_col) == 1
        is_spy = is_pos & (self.spy_coin(features_col) < self.spy_frac)
        staged = df.withColumn("__spy", is_spy)

        # step 1: train (P∖S)=1 vs (U∪S)=0 on ALL rows — zero_step's
        # train-on-everything shape with the spy-shifted label
        step1 = staged.withColumn(
            "__l1", F.when(is_pos & ~F.col("__spy"), 1).otherwise(0)
        )
        scored = self.zero_step(step1, "__l1", features_col, final_label)

        # spy-calibrated threshold on a fixed 1/SPY_BINS score grid —
        # the sketch-boundary discipline of the winsorized mean
        # (relational.py): Spark's exact `percentile` buffers EVERY spy
        # score in one aggregation task (spy count scales with the
        # positive set at 100 TB), while this histogram is ≤ SPY_BINS
        # rows no matter the corpus.  t = lower edge of the bin where
        # the spy cumulative count reaches the quantile (bounded-table
        # protocol, same tier as the BPE merge-table collects).
        hist = (
            scored.filter(F.col("__spy"))
            .groupBy(
                F.least(
                    F.lit(SPY_BINS - 1),
                    F.floor(F.col(final_label) * SPY_BINS).cast("int"),
                ).alias("__b")
            )
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        if not hist:
            raise ValueError("no spies drawn — positive set too small")
        counts = sorted((r["__b"], r["__n"]) for r in hist)
        n_spies = sum(c for _, c in counts)
        target = self.spy_quantile * n_spies
        cum = 0
        t = counts[-1][0] / SPY_BINS
        for b, c in counts:
            cum += c
            if cum >= target:
                t = b / SPY_BINS
                break

        # step 2: P=1, reliable negatives (unlabeled under t)=0, rest
        # undecided; retrain on decided rows only, rescore everything
        cur = scored.withColumn(
            "__cur",
            F.when(is_pos, 1)
            .when(~is_pos & (F.col(final_label) < F.lit(t)), 0)
            .otherwise(-1),
        )
        model = self.fit_on_current(cur, "__cur")
        out = self.score_all(model, cur, final_label)
        return self.cleanup(
            out,
            "__spy",
            "__l1",
            "__cur",
            INDEXED_FEATURES_NAME,
            VEC_FEATURES_NAME,
            LABEL_NAME,
        )
