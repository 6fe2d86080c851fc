"""Multi-column feature assembly — the reference's documented onboarding
flow (README.md:82-89: ``VectorAssembler`` over N scalar columns, then
``weight``).  The assembler is a pure per-row projection: no shuffle, and
the resulting ML Vector crosses into the estimator without ever leaving
the JVM.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def assemble_features(
    df: DataFrame, input_cols: Sequence[str], output_col: str = "features"
) -> DataFrame:
    """``VectorAssembler`` over scalar columns → one ML Vector column.

    The output column is VectorUDT, which
    :func:`pu4spark_spark.two_step.ensure_vector` passes through
    untouched, so ``assemble_features(df, cols)`` →
    ``learner.weight(out, label, "features")`` is the complete
    reference onboarding path for tabular data.
    """
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(
        inputCols=list(input_cols), outputCol=output_col
    )
    return assembler.transform(df)
