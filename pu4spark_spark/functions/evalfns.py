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


#: reliability-diagram grain — coarse on purpose (the standard 10-bin
#: calibration report)
CAL_BINS = 10


def calibration_table(
    df: DataFrame,
    score: Column | str,
    label: Column | str,
    bins: int = CAL_BINS,
) -> DataFrame:
    """Reliability-diagram table ``(bin, n, n_pos, conf_mid, frac_pos)``
    — the companion eval to :func:`ranksum_auc`: AUC measures ranking,
    this measures whether the score VALUE means what it claims
    (score ≈ P(positive)).  A top score at ``frac_pos`` far from
    ``conf_mid`` is the signal to recalibrate (Platt/isotonic — or the
    Elkan-Noto constant ``c``, which is exactly a one-bin version of
    this table).

    Scale/portability discipline: one map-side-combined groupBy over a
    ≤ ``bins``-key space (corpus reduces to ≤ bins rows before the
    exchange), all counts int64, and the only IEEE operations are one
    division per bin and the exact mid-point constant — no double
    summation anywhere, so the DuckDB oracle hash-matches bit-for-bit.
    Scores exactly 1.0 clamp into the top bin.
    """
    s = F.col(score) if isinstance(score, str) else score
    y = F.col(label) if isinstance(label, str) else label
    binned = df.select(
        F.least(F.floor(s * bins), F.lit(bins - 1)).cast("int").alias("bin"),
        y.alias("y"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos")
    )
    return agg.select(
        "bin",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        ((F.col("bin") + F.lit(0.5)) / F.lit(float(bins))).alias("conf_mid"),
        (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
            "frac_pos"
        ),
    )
