"""PU bagging learner (Mordelet & Vert, "A bagging SVM to learn from
positive and unlabeled examples", Pattern Recognition Letters 2014) — an
EXTENSION beyond the reference's two learners, dropping into the same
``weight(df, label, features)`` API (PositiveUnlabeledLearner.scala:16-25)
via the shared TwoStepPULearner machinery (two_step.py).

Protocol (T rounds, deterministic):

1. Round t draws a bootstrap-style subsample U_t of the unlabeled via a
   per-round hash coin (``pmod(hash(id, features, t), 1000)`` — no RNG,
   keyed on the stable row id when one exists, see ``bag_coin``) and
   trains the classifier on P(=1) vs U_t(=0).
2. Every round scores ALL rows; each row accumulates (a) the sum over
   all rounds and (b) the OUT-OF-BAG sum/count — rounds where the row
   was NOT drawn as a pseudo-negative, the scores bagging actually
   aggregates (in-bag rounds bias an unlabeled row's own score down).
3. ``final_label`` = OOB mean when the row has ≥1 OOB round, else the
   all-rounds mean (a row drawn every round — probability
   ``sample_frac^T`` — still gets a defined score).

Scale shape: T classifier fits + T scans; the bag coin and the
accumulator algebra are scan-stage expressions (no shuffle beyond what
the classifier itself does); loop state follows the family's
persist/unpersist + periodic ``localCheckpoint`` hygiene
(``roll_state``).  Determinism: hash coins + deterministic LR fits ⇒
stable rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pu4spark_spark.config import INDEXED_FEATURES_NAME, LABEL_NAME
from pu4spark_spark.two_step import (
    VEC_FEATURES_NAME,
    TwoStepPULearner,
    ensure_vector,
)

BAG_COIN_MOD = 1000


class PUBaggingLearner(TwoStepPULearner):
    """Bagged PU scores from T deterministic unlabeled subsamples.
    ``rel_neg_threshold`` is unused — bagging never mines reliable
    negatives; aggregation over random pseudo-negative draws replaces
    the mining step entirely."""

    def __init__(
        self,
        classifier,
        n_rounds: int = 5,
        sample_frac: float = 0.5,
        id_col: str | None = None,
    ):
        """``id_col`` names the stable row identifier the bag coin is
        keyed on.  When ``None`` (default) it is auto-detected from
        ``ID_CANDIDATES`` at ``weight()`` time — a documented
        convenience fallback; pass it explicitly whenever the frame
        carries an unrelated column named ``id``/``doc_id``/… (ADVICE
        r5: silent auto-detection changes bag assignments).  The key
        actually used is recorded on ``self.resolved_id_col_``."""
        super().__init__(rel_neg_threshold=0.0, classifier=classifier)
        if n_rounds < 1:
            raise ValueError("n_rounds must be >= 1")
        if not 0.0 < sample_frac <= 1.0:
            raise ValueError("sample_frac must be in (0, 1]")
        self.n_rounds = int(n_rounds)
        self.sample_frac = float(sample_frac)
        self.id_col = id_col
        #: the bag-coin key chosen by the last ``weight()`` call
        self.resolved_id_col_: str | None = None

    #: stable row-identifier columns auto-detected for the bag coin
    ID_CANDIDATES = ("vec_id", "doc_id", "id", "row_id")

    def bag_coin(
        self, features_col: str, t: int, id_col: str | None = None
    ) -> F.Column:
        """Deterministic per-round in-(0,1) coin.  Keyed on a STABLE
        row identifier (when the frame has one) alongside the feature
        hash and round number: hashing features alone makes rows with
        identical vectors perfectly correlated — all in-bag or all
        out-of-bag together every round — which skews the OOB
        aggregation exactly on the duplicated-row corpora this engine
        targets (ADVICE r4).  ``monotonically_increasing_id`` is NOT a
        substitute: it depends on partition layout, which would break
        the family's determinism contract."""
        keys = [F.col(features_col), F.lit(t)]
        if id_col is not None:
            keys.insert(0, F.col(id_col))
        return (
            F.pmod(F.hash(*keys), F.lit(BAG_COIN_MOD))
            / F.lit(float(BAG_COIN_MOD))
        )

    def weight(
        self,
        df: DataFrame,
        label_col: str = "label",
        features_col: str = "features",
        final_label: str = "finalLabel",
    ) -> DataFrame:
        from pyspark.ml import Pipeline
        from pyspark.ml.feature import VectorIndexer

        is_pos = F.col(label_col) == 1
        df, vec_col = ensure_vector(df, features_col)
        # feature prep ONCE (zero_step's VectorIndexer, without its
        # fit): every round reuses indexedFeatures, same as the loop
        # learners' single-indexing discipline
        feature_indexer = VectorIndexer(
            inputCol=vec_col,
            outputCol=INDEXED_FEATURES_NAME,
            maxCategories=4,
        )
        state = (
            Pipeline(stages=[feature_indexer]).fit(df).transform(df)
            .withColumn("__all_s", F.lit(0.0))
            .withColumn("__oob_s", F.lit(0.0))
            .withColumn("__oob_n", F.lit(0))
        )
        if self.id_col is not None:
            if self.id_col not in df.columns:
                raise ValueError(
                    f"id_col {self.id_col!r} not in input columns "
                    f"{df.columns}"
                )
            id_col = self.id_col
        else:
            id_col = next(
                (c for c in self.ID_CANDIDATES if c in df.columns), None
            )
        self.resolved_id_col_ = id_col
        prev: DataFrame | None = None
        for t in range(self.n_rounds):
            in_bag = ~is_pos & (
                self.bag_coin(features_col, t, id_col)
                < F.lit(self.sample_frac)
            )
            cur = (
                F.when(is_pos, 1).when(in_bag, 0).otherwise(-1)
            )
            model = self.fit_on_current(state.withColumn("__cur", cur), "__cur")
            scored = self.score_all(
                model, state.withColumn("__in_bag", in_bag), "__score"
            )
            state = (
                scored.withColumn(
                    "__all_s", F.col("__all_s") + F.col("__score")
                )
                .withColumn(
                    "__oob_s",
                    F.when(
                        F.col("__in_bag"), F.col("__oob_s")
                    ).otherwise(F.col("__oob_s") + F.col("__score")),
                )
                .withColumn(
                    "__oob_n",
                    F.when(F.col("__in_bag"), F.col("__oob_n")).otherwise(
                        F.col("__oob_n") + F.lit(1)
                    ),
                )
                .drop("__cur", "__in_bag", "__score")
            )
            state = self.roll_state(state, prev, t)
            prev = state
        out = state.withColumn(
            final_label,
            F.when(
                F.col("__oob_n") > 0,
                F.col("__oob_s") / F.col("__oob_n"),
            ).otherwise(F.col("__all_s") / F.lit(float(self.n_rounds))),
        )
        # final state stays persisted for the caller (family convention:
        # traditional.py leaves the last iteration's cache in place)
        return self.cleanup(
            out,
            "__all_s",
            "__oob_s",
            "__oob_n",
            INDEXED_FEATURES_NAME,
            VEC_FEATURES_NAME,
            LABEL_NAME,
        )
