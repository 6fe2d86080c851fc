"""Sentinel-label relational core for PU learning — pure Catalyst
expressions, no UDFs.

Re-expresses (Spark-first, not copied) the reference's label machinery:

- ``relabel_keep``        ≡ TwoStepPULearner.scala:95-103
  (``replaceZerosByUndefLabel``): keep ``value_to_keep``, replace every
  other value with ``value_to_replace``, drop the original column.
- ``index_label``         ≡ TwoStepPULearner.scala:73-81
  (``indexLabelColumn``): cast to double + attach ML nominal metadata so
  downstream estimators see class order ("0","1") by *value*, not by
  frequency (the reference's comment at :64-65 explains why
  StringIndexer is wrong here).
- ``binarize_traditional`` ≡ TraditionalPULearner.scala:79-91
  (``RelNegConfidenceThresholdAdder``): the reference uses a scalar
  Scala UDF; we use a ``when/otherwise`` chain Catalyst can see through
  (codegen + pushdown; zero (de)serialization).
- ``binarize_gradual``     ≡ GradualReductionPULearner.scala:89-101
  (``GradRelNegConfidenceThresholdAdder``), parameterized by
  ``label_to_consider``.
- ``iteration_stats``      fuses the reference's 2-5 separate full-table
  ``count()`` jobs per iteration (TraditionalPULearner.scala:47-50;
  GradualReductionPULearner.scala:44,48,49,78,79) into ONE ``agg`` pass —
  at 100 TB each redundant count is a full scan, so this is the single
  biggest scale win over the reference's loop protocol.

Sentinel algebra (reference constants, TraditionalPULearner.scala:93-96,
GradualReductionPULearner.scala:103-107): ``POS_LABEL=1`` positive,
``REL_NEG_LABEL=0`` reliable negative, ``UNDEF_LABEL=-1`` unlabeled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

POS_LABEL = 1
REL_NEG_LABEL = 0
UNDEF_LABEL = -1


def relabel_keep(
    df: DataFrame,
    orig_col: str,
    new_col: str,
    value_to_replace: float,
    value_to_keep: float = 1.0,
) -> DataFrame:
    """Keep ``value_to_keep`` as-is; replace everything else with
    ``value_to_replace``; drop the original column.

    ≡ reference ``replaceZerosByUndefLabel`` (TwoStepPULearner.scala:95-103).
    Pure projection — no shuffle, survives whole-stage codegen.
    """
    relabeled = F.when(
        F.col(orig_col) == F.lit(value_to_keep), F.lit(value_to_keep)
    ).otherwise(F.lit(value_to_replace))
    return df.withColumn(new_col, relabeled).drop(orig_col)


def index_label(
    df: DataFrame, input_col: str, output_col: str, values: list[str]
) -> DataFrame:
    """Cast label to double and attach ML nominal-attribute metadata
    naming the class values in order.

    ≡ reference ``indexLabelColumn`` (TwoStepPULearner.scala:73-81): the
    metadata pins class 0 = values[0], class 1 = values[1] regardless of
    frequency, so ``probability[1]`` is always P(positive).
    """
    meta = {"ml_attr": {"type": "nominal", "vals": [str(v) for v in values]}}
    return df.withColumn(
        output_col,
        F.col(input_col).cast("double").alias(output_col, metadata=meta),
    )


def binarize_traditional(prob_col: Column, prev_label_col: Column, threshold: float) -> Column:
    """Traditional PU re-labeling expression.

    For rows still unlabeled (``prev == UNDEF_LABEL``): probability below
    ``threshold`` ⇒ reliable negative (0), else stay unlabeled (-1).
    Labeled rows pass through — positives can never lose their label.

    ≡ reference ``RelNegConfidenceThresholdAdder.binarizeUDF``
    (TraditionalPULearner.scala:79-91), minus the UDF: this is a native
    ``when/otherwise`` Catalyst expression.
    """
    return (
        F.when(
            prev_label_col == F.lit(UNDEF_LABEL),
            F.when(prob_col < F.lit(threshold), F.lit(REL_NEG_LABEL)).otherwise(
                F.lit(UNDEF_LABEL)
            ),
        )
        .otherwise(prev_label_col)
        .cast("int")
    )


def binarize_gradual(
    prob_col: Column,
    prev_label_col: Column,
    threshold: float,
    label_to_consider: int,
) -> Column:
    """Gradual-Reduction re-labeling expression.

    Rows whose ``prev == label_to_consider`` are re-thresholded
    (``p < threshold`` ⇒ reliable negative, else back to unlabeled);
    all other rows pass through.  With ``label_to_consider=UNDEF_LABEL``
    this mines new reliable negatives; with ``REL_NEG_LABEL`` it demotes
    no-longer-confident negatives back to unlabeled — the "gradual
    reduction" step.

    ≡ reference ``GradRelNegConfidenceThresholdAdder.binarizeUDF``
    (GradualReductionPULearner.scala:89-101), UDF-free.
    """
    return (
        F.when(
            prev_label_col == F.lit(label_to_consider),
            F.when(prob_col < F.lit(threshold), F.lit(REL_NEG_LABEL)).otherwise(
                F.lit(UNDEF_LABEL)
            ),
        )
        .otherwise(prev_label_col)
        .cast("int")
    )


def iteration_stats_df(
    df: DataFrame, prev_col: str = "prevLabel", cur_col: str = "curLabel"
) -> DataFrame:
    """One-row DataFrame with all per-iteration convergence scalars —
    a single full-scan agg (lazy; see :func:`iteration_stats`)."""
    prev, cur = F.col(prev_col), F.col(cur_col)
    return df.agg(
        F.sum(
            ((prev == UNDEF_LABEL) & (cur == REL_NEG_LABEL)).cast("long")
        ).alias("new_rel_neg"),
        F.sum((cur == POS_LABEL).cast("long")).alias("total_pos"),
        F.sum((cur == REL_NEG_LABEL).cast("long")).alias("total_rel_neg"),
        F.sum((cur == UNDEF_LABEL).cast("long")).alias("total_undef"),
        F.count(F.lit(1)).alias("total_rows"),
    )


def iteration_stats(
    df: DataFrame, prev_col: str = "prevLabel", cur_col: str = "curLabel"
) -> dict[str, int]:
    """All per-iteration convergence scalars in ONE job.

    Replaces the reference's separate count jobs
    (new reliable negatives: TraditionalPULearner.scala:47-50 /
    GradualReductionPULearner.scala:41-44; total positives :48;
    total reliable negatives :49 — plus the redundant re-counts at
    :75-79).  One full-scan ``agg`` with conditional sums instead of up
    to five.
    """
    row = iteration_stats_df(df, prev_col, cur_col).collect()[0]
    return {k: int(row[k] or 0) for k in row.asDict()}
