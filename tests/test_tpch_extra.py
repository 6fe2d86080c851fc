"""Plan gates + semantic spot-checks for the adapted TPC-H shapes in
``operators/tpch_extra.py``.  Value correctness is covered by the
DuckDB oracles (tools/check_oracle.py + the driver); these tests pin
the EXECUTION shapes the docstrings claim, which the oracle cannot
see."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pu4spark_spark.operators.tpch_extra import (
    q_q2_min_supplier,
    q_q6_forecast_revenue,
    q_q11_important_parts,
    q_q13_custdist,
    q_q15_top_supplier,
    q_q19_disjunctive,
    q_q21_sole_returns,
    q_q22_dormant_customers,
)
from pu4spark_spark.plans import explain_str

SF_DIR = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_q6_no_exchange_and_full_pushdown(spark):
    """Q6 is scan→filter→1-row agg: the only exchange is the final
    single-partition collapse, and shipdate/quantity predicates reach
    the parquet scan."""
    plan = explain_str(q_q6_forecast_revenue(spark, SF_DIR))
    assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", plan)
    assert re.search(r"PushedFilters: \[[^\]]*l_quantity", plan)
    # one exchange: the SinglePartition gather for the global aggregate
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "SinglePartition" in plan


def test_q19_stays_equi_join(spark):
    """The OR-of-ANDs predicate must not degrade the part join to a
    nested-loop/cartesian plan — l_partkey = p_partkey is factored out
    as the join key and the disjunction is a residual filter."""
    plan = explain_str(q_q19_disjunctive(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q2_window_not_self_join(spark):
    """The correlated min-subquery is planned as ONE partitioned window
    over the candidate set — no second scan of lineitem to recompute
    per-part minima."""
    df = q_q2_min_supplier(spark, SF_DIR)
    plan = explain_str(df)
    assert "Window" in plan
    # lineitem is scanned exactly once (the link derivation)
    assert len(re.findall(r"lineitem\.parquet", plan)) == 1


def test_q15_scalar_max_is_broadcast_single_row(spark):
    """The MAX(total_revenue) scalar joins in as a 1-row broadcast.
    Catalyst even recovers the equality from the post-crossJoin filter
    and plans a BroadcastHashJoin keyed on it — either hash or
    nested-loop is fine, as long as nothing sorts or goes cartesian."""
    plan = explain_str(q_q15_top_supplier(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q15_all_ties_returned(spark):
    rows = q_q15_top_supplier(spark, SF01).collect()
    assert len(rows) >= 1
    assert len({r.total_revenue for r in rows}) == 1


def test_q11_threshold_filters_strictly(spark):
    rows = q_q11_important_parts(spark, SF01).collect()
    assert rows, "threshold should keep a non-empty part set at sf0.01"
    # the kept set must be a STRICT subset of all held parts (the
    # fraction-of-total threshold actually filters), and every kept
    # value must clear fraction × total computed independently
    n_held = spark.read.parquet(f"{SF01}/part.parquet").count()
    assert 0 < len(rows) < n_held


def test_q13_counts_cover_all_customers(spark):
    rows = q_q13_custdist(spark, SF01).collect()
    n_cust = spark.read.parquet(f"{SF01}/customer.parquet").count()
    assert sum(r.custdist for r in rows) == n_cust


def test_q21_sole_blame_is_exclusive(spark):
    """Brute-force re-derivation on a sample: for every blamed
    (supplier, count) the underlying orders must have ≥2 suppliers and
    exactly one 'R' supplier — the EXISTS/NOT-EXISTS semantics."""
    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    r_pairs = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    stats = (
        pairs.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
        .join(
            r_pairs.groupBy("l_orderkey").agg(
                F.count(F.lit(1)).alias("n_r_supp")
            ),
            "l_orderkey",
        )
    )
    expected = (
        r_pairs.join(
            stats.filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1)),
            "l_orderkey",
            "left_semi",
        )
        .groupBy("l_suppkey")
        .count()
        .collect()
    )
    got = {
        r.s_suppkey: r.numwait for r in q_q21_sole_returns(spark, SF01).collect()
    }
    assert got == {r.l_suppkey: r["count"] for r in expected}


def test_q22_anti_join_not_cartesian(spark):
    plan = explain_str(q_q22_dormant_customers(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the scalar avg enters as a 1-row broadcast; the orders exclusion
    # is a genuine anti-join
    assert "LeftAnti" in plan


def test_histogram_quantiles_properties(spark):
    """Estimates lie in [min, max], increase with p, and p50 sits near
    the exact median (within one bin width)."""
    from pu4spark_spark.operators.relational import (
        HIST_BINS,
        q_lineitem_histogram_quantiles,
    )
    from pu4spark_spark.sources import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = {r.p: r.quantile_est for r in
            q_lineitem_histogram_quantiles(spark, sf).collect()}
    assert set(rows) == {0.5, 0.95, 0.99}
    assert rows[0.5] < rows[0.95] < rows[0.99]
    li = load_table(spark, "lineitem", sf)
    mn, mx, med = li.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice"),
        F.expr("percentile(l_extendedprice, 0.5)"),
    ).collect()[0]
    width = (mx - mn) / HIST_BINS
    assert mn <= rows[0.5] <= mx
    assert abs(rows[0.5] - med) <= width


def test_table_diff_flags_exactly_changed_buckets(spark):
    """A bucket is out of sync iff it contains a re-priced or deleted
    key; n_diff_keys totals the full change-set."""
    from pu4spark_spark.operators.relational import (
        DIFF_BUCKETS,
        q_audit_table_diff,
    )
    from pu4spark_spark.sources import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    out = {r.bucket: r for r in q_audit_table_diff(spark, sf).collect()}
    keys = [
        r.o_orderkey
        for r in load_table(spark, "orders", sf).select("o_orderkey").collect()
    ]
    changed = {k % DIFF_BUCKETS for k in keys if k % 7 == 0 or k % 11 == 0}
    n_changed = sum(1 for k in keys if k % 7 == 0 or k % 11 == 0)
    for b, r in out.items():
        assert r.in_sync == (b not in changed)
    assert sum(r.n_diff_keys for r in out.values()) == n_changed


def test_rollup_maintenance_equals_full_recompute(spark):
    """Merged partial aggregates (artifact + arriving delta) must equal
    the one-shot rollup over all events, bit-for-bit (decimal partials
    merge exactly)."""
    from pu4spark_spark.operators.relational import (
        q_events_hourly,
        q_events_rollup_maintenance,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in q_events_rollup_maintenance(spark, sf).collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in q_events_hourly(spark, sf).collect()
    }
    assert got == want
