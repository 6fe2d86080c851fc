from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from pu4spark_spark.operators.relational import (
    q_events_funnel,
    q_events_retention,
)
from pu4spark_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _funnel_on(spark, rows):
    """Run the funnel's windowed logic on a constructed events frame by
    monkey-free substitution: build the same plan q_events_funnel builds,
    via a temp view named like the loader's output."""
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    # reuse the production logic through its building blocks: apply the
    # same transformation by calling the query against a synthetic dir is
    # not possible, so replicate ordering semantics via the public query
    # on real data is covered elsewhere; here verify the window algebra
    # directly.
    from pyspark.sql import Window

    before = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = df.withColumn(
        "fv",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(before),
    )
    staged = staged.withColumn(
        "fc",
        F.min(
            F.when(
                (F.col("event_type") == "click") & F.col("fv").isNotNull(),
                F.col("ts"),
            )
        ).over(before),
    )
    return staged.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("v"),
        F.countDistinct(
            F.when(
                (F.col("event_type") == "click") & F.col("fv").isNotNull(),
                F.col("user_id"),
            )
        ).alias("c"),
        F.countDistinct(
            F.when(
                (F.col("event_type") == "purchase") & F.col("fc").isNotNull(),
                F.col("user_id"),
            )
        ).alias("p"),
    ).collect()[0]


def _ts(s):
    return datetime.fromisoformat(s)


def test_funnel_requires_strict_order(spark):
    rows = [
        # user 1: view -> click -> purchase, fully ordered: counts in all
        (1, _ts("2024-01-01T00:00:00"), 1, "view"),
        (2, _ts("2024-01-01T00:01:00"), 1, "click"),
        (3, _ts("2024-01-01T00:02:00"), 1, "purchase"),
        # user 2: click BEFORE view: view counts, click/purchase don't
        (4, _ts("2024-01-01T00:00:00"), 2, "click"),
        (5, _ts("2024-01-01T00:01:00"), 2, "view"),
        (6, _ts("2024-01-01T00:02:00"), 2, "purchase"),
        # user 3: view -> purchase without click: purchase doesn't count
        (7, _ts("2024-01-01T00:00:00"), 3, "view"),
        (8, _ts("2024-01-01T00:01:00"), 3, "purchase"),
    ]
    r = _funnel_on(spark, rows)
    assert (r["v"], r["c"], r["p"]) == (3, 1, 1)


def test_funnel_monotone_on_fixture(spark):
    r = q_events_funnel(spark, SF).collect()[0]
    assert r["n_view_users"] >= r["n_click_users"] >= r["n_purchase_users"]
    assert r["n_view_users"] > 0


def test_retention_day_zero_counts_every_user(spark):
    out = q_events_retention(spark, SF)
    day0 = (
        out.filter(F.col("day_offset") == 0)
        .agg(F.sum("n_users").alias("s"))
        .collect()[0]["s"]
    )
    n_users = (
        load_table(spark, "events", SF)
        .select("user_id")
        .distinct()
        .count()
    )
    # every user appears in their own cohort's day 0 exactly once
    assert day0 == n_users
    assert out.filter(F.col("day_offset") < 0).count() == 0


def test_spend_quartiles_partition_all_customers(spark):
    """The four buckets partition the customer set and respect boundary
    ordering (max of quartile k <= min of quartile k+1)."""
    from pu4spark_spark.operators.relational import q_customer_spend_quartiles

    rows = sorted(
        q_customer_spend_quartiles(spark, SF).collect(),
        key=lambda r: r["quartile"],
    )
    assert [r["quartile"] for r in rows] == [1, 2, 3, 4]
    n_cust = (
        load_table(spark, "orders", SF).select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for a, b in zip(rows, rows[1:]):
        assert a["max_spend"] <= b["min_spend"]


def test_funnel_matches_bruteforce_reference(spark):
    """Randomized third-engine check: a plain-Python per-user scan must
    agree with the windowed funnel on arbitrary event orderings."""
    import random

    rng = random.Random(42)
    rows = []
    eid = 0
    for user in range(40):
        n = rng.randint(1, 12)
        for _ in range(n):
            eid += 1
            rows.append(
                (
                    eid,
                    _ts("2024-01-01T00:00:00")
                    + __import__("datetime").timedelta(
                        minutes=rng.randint(0, 500)
                    ),
                    user,
                    rng.choice(["view", "click", "purchase", "error"]),
                )
            )

    # brute force: per user, scan in (ts, event_id) order
    from collections import defaultdict

    by_user = defaultdict(list)
    for e, t, u, typ in rows:
        if typ in ("view", "click", "purchase"):
            by_user[u].append((t, e, typ))
    v, c, p = set(), set(), set()
    for u, evs in by_user.items():
        evs.sort()
        seen_view = seen_click_after_view = False
        for _t, _e, typ in evs:
            if typ == "view":
                v.add(u)
            elif typ == "click" and seen_view:
                c.add(u)
            elif typ == "purchase" and seen_click_after_view:
                p.add(u)
            # state updates AFTER the check: priors must be STRICTLY earlier
            if typ == "view":
                seen_view = True
            if typ == "click" and seen_view and u in c:
                seen_click_after_view = True

    r = _funnel_on(spark, rows)
    assert (r["v"], r["c"], r["p"]) == (len(v), len(c), len(p))
