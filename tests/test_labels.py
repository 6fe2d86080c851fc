from __future__ import annotations

from pyspark.sql import functions as F

from pu4spark_spark.labels import (
    POS_LABEL,
    REL_NEG_LABEL,
    UNDEF_LABEL,
    binarize_gradual,
    binarize_traditional,
    index_label,
    iteration_stats,
    relabel_keep,
)


def test_relabel_keep(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 0.0), (3, 5.0)], ["id", "lab"])
    out = relabel_keep(df, "lab", "prevLabel", UNDEF_LABEL)
    assert "lab" not in out.columns
    got = {r["id"]: r["prevLabel"] for r in out.collect()}
    assert got == {1: 1.0, 2: -1.0, 3: -1.0}


def test_index_label_metadata(spark):
    df = spark.createDataFrame([(1, 1), (2, 0)], ["id", "lab"])
    out = index_label(df, "lab", "label", ["0", "1"])
    field = out.schema["label"]
    assert field.dataType.typeName() == "double"
    assert field.metadata["ml_attr"]["vals"] == ["0", "1"]


def test_binarize_traditional(spark):
    # (prob, prev) -> expected cur
    rows = [
        (0.2, UNDEF_LABEL, REL_NEG_LABEL),  # low prob unlabeled -> relneg
        (0.8, UNDEF_LABEL, UNDEF_LABEL),  # high prob unlabeled -> stays
        (0.1, POS_LABEL, POS_LABEL),  # positives always pass through
        (0.9, REL_NEG_LABEL, REL_NEG_LABEL),  # decided rows pass through
    ]
    df = spark.createDataFrame(
        [(i, p, pl) for i, (p, pl, _) in enumerate(rows)], ["id", "p", "prev"]
    )
    out = df.withColumn("cur", binarize_traditional(F.col("p"), F.col("prev"), 0.5))
    got = {r["id"]: r["cur"] for r in out.collect()}
    assert got == {i: exp for i, (_, _, exp) in enumerate(rows)}


def test_binarize_gradual_demotes_relnegs(spark):
    rows = [
        (0.2, REL_NEG_LABEL, REL_NEG_LABEL),  # still confident negative
        (0.8, REL_NEG_LABEL, UNDEF_LABEL),  # demoted back to unlabeled
        (0.8, POS_LABEL, POS_LABEL),  # untouched
        (0.2, UNDEF_LABEL, UNDEF_LABEL),  # untouched (not the considered label)
    ]
    df = spark.createDataFrame(
        [(i, p, pl) for i, (p, pl, _) in enumerate(rows)], ["id", "p", "prev"]
    )
    out = df.withColumn(
        "cur", binarize_gradual(F.col("p"), F.col("prev"), 0.5, REL_NEG_LABEL)
    )
    got = {r["id"]: r["cur"] for r in out.collect()}
    assert got == {i: exp for i, (_, _, exp) in enumerate(rows)}


def test_iteration_stats_single_pass(spark):
    df = spark.createDataFrame(
        [(-1, 0), (-1, 0), (-1, -1), (1, 1), (0, 0)], ["prevLabel", "curLabel"]
    )
    stats = iteration_stats(df)
    assert stats == {
        "new_rel_neg": 2,
        "total_pos": 1,
        "total_rel_neg": 3,
        "total_undef": 1,
        "total_rows": 5,
    }
