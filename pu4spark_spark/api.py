"""Public learner API.

Mirrors the reference trait ``PositiveUnlabeledLearner``
(PositiveUnlabeledLearner.scala:22-25): a single method, DataFrame in →
DataFrame out with the final-label column (P(positive) as double)
appended.  The reference's swapped default parameter values
(``labelColumnName = "featuresCol"`` — dead-but-wrong, see SURVEY.md §1)
are deliberately not replicated; our defaults are the sane column names.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame


class PositiveUnlabeledLearner(ABC):
    """One-method contract both PU algorithms implement
    (≡ PositiveUnlabeledLearner.scala:22-25)."""

    @abstractmethod
    def weight(
        self,
        df: DataFrame,
        label_col: str = "label",
        features_col: str = "features",
        final_label: str = "finalLabel",
        keep_internal: bool = False,
    ) -> DataFrame:
        """Append ``final_label`` = P(positive) for every row."""
        raise NotImplementedError
