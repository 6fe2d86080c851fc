"""Distributed evaluation primitives.

``ranksum_auc`` is the shared core of every AUC-style eval in the repo:
exact ties-corrected Mann-Whitney AUC of a score column against a binary
label WITHOUT a global per-row sort — scores are quantized to a fixed
bin grid (the result is the exact AUC of the quantized classifier, a
deterministic contract), one map-side-combined groupBy reduces the
corpus to ≤ bins+1 rows, the cumulative-negative window runs over that
fixed-size table, and 2U = Σ p·(2·cum_neg + n) stays in int64 with one
IEEE division at the end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default score-quantization grain — the window below never sees more
#: than AUC_BINS+1 pre-aggregated rows, independent of corpus size
AUC_BINS = 1000


def ranksum_auc(
    df: DataFrame,
    score: Column | str,
    label: Column | str,
    bins: int = AUC_BINS,
) -> DataFrame:
    """1-row DataFrame ``(n_pos, n_neg, auc)``.  ``score`` must lie in
    [0, 1] (the bin grid is ``floor(score·bins)``); ``label`` must be
    0/1 int."""
    s = F.col(score) if isinstance(score, str) else score
    y = F.col(label) if isinstance(label, str) else label
    scored = df.select(
        F.floor(s * bins).cast("int").alias("bin"), y.alias("y")
    )
    binned = scored.groupBy("bin").agg(
        F.sum("y").alias("p"),
        F.sum(F.lit(1) - F.col("y")).alias("n"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    ranked = binned.withColumn(
        "cum_neg", F.coalesce(F.sum("n").over(w), F.lit(0))
    )
    u2 = F.sum(F.col("p") * (2 * F.col("cum_neg") + F.col("n")))
    return ranked.agg(
        F.sum("p").alias("n_pos"),
        F.sum("n").alias("n_neg"),
        (
            u2.cast("double") / (2 * F.sum("p") * F.sum("n")).cast("double")
        ).alias("auc"),
    )
