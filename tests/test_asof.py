"""As-of join semantics on hand-built rows: equal-ts match, strictly
later rows excluded, NULL when no prior right row, timestamp-collision
tiebreak."""

from __future__ import annotations

from datetime import datetime

from pu4spark_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),  # before any right row
            (2, 10, _ts("2024-01-01 12:00:00")),  # equal-ts match
            (3, 10, _ts("2024-01-01 13:30:00")),  # between rights
            (4, 20, _ts("2024-01-01 09:00:00")),  # other key, no right
        ],
        ["lid", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 12:00:00"), 1.0),
            (101, 10, _ts("2024-01-01 13:00:00"), 2.0),
            (102, 10, _ts("2024-01-01 14:00:00"), 3.0),
        ],
        ["rid", "k", "ts", "v"],
    )
    out = asof_join(
        left, right, key_cols=["k"], ts_col="ts", value_cols=["rid", "v"],
        order_col="rid",
    )
    got = {r["lid"]: (r["asof_rid"], r["asof_v"]) for r in out.collect()}
    assert got[1] == (None, None)      # nothing at or before 10:00
    assert got[2] == (100, 1.0)        # equal ts matches (<= semantics)
    assert got[3] == (101, 2.0)        # latest at-or-before 13:30
    assert got[4] == (None, None)      # key with no right rows
    assert len(got) == 4               # every left row survives


def test_asof_join_collision_tiebreak(spark):
    """Two right rows at the identical (key, ts): the max-order_col row
    wins deterministically."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 12:30:00"))], ["lid", "k", "ts"]
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 12:00:00"), 1.0),
            (105, 10, _ts("2024-01-01 12:00:00"), 9.0),
        ],
        ["rid", "k", "ts", "v"],
    )
    out = asof_join(
        left, right, key_cols=["k"], ts_col="ts", value_cols=["rid", "v"],
        order_col="rid",
    )
    row = out.collect()[0]
    assert (row["asof_rid"], row["asof_v"]) == (105, 9.0)


def test_asof_join_matches_bruteforce_random(spark):
    """Randomized cross-check: the union+window as-of join must agree
    with a brute-force per-row reference on clustered random data
    (duplicate timestamps and sparse keys included)."""
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=5, deadline=None)
    @given(seed=st.integers(min_value=0, max_value=10_000))
    def check(seed):
        rng = random.Random(seed)
        keys = [0, 1, 2]
        left = [
            (i, rng.choice(keys), _ts(f"2024-01-01 {rng.randrange(24):02d}:{rng.randrange(60):02d}:00"))
            for i in range(20)
        ]
        right = [
            (100 + i, rng.choice(keys + [9]),  # key 9 never on the left
             _ts(f"2024-01-01 {rng.randrange(24):02d}:{rng.randrange(60):02d}:00"),
             float(i))
            for i in range(15)
        ]
        ldf = spark.createDataFrame(left, ["lid", "k", "ts"])
        rdf = spark.createDataFrame(right, ["rid", "k", "ts", "v"])
        out = asof_join(
            ldf, rdf, key_cols=["k"], ts_col="ts", value_cols=["rid", "v"],
            order_col="rid",
        )
        got = {r["lid"]: r["asof_rid"] for r in out.collect()}

        for lid, k, lts in left:
            cands = [(ts, rid) for rid, rk, ts, _ in right if rk == k and ts <= lts]
            expect = max(cands)[1] if cands else None
            assert got[lid] == expect, (seed, lid)

    check()


def test_range_join_matches_bruteforce_random(spark):
    """Randomized cross-check of the banded range join, with timestamps
    clustered near band boundaries (multiples of the lookback) where an
    off-by-one in the integer band arithmetic would lose or duplicate
    pairs."""
    import random
    from datetime import timedelta

    from pu4spark_spark.operators.asof import range_join_lookback

    LOOKBACK_US = 3600 * 1_000_000  # 1 hour bands
    base = _ts("2024-01-01 00:00:00")

    for seed in range(5):
        rng = random.Random(seed)

        def near_boundary_ts():
            band = rng.randrange(0, 5)
            jitter = rng.choice([0, 1, -1, rng.randrange(LOOKBACK_US)])
            us = band * LOOKBACK_US + jitter
            return base + timedelta(microseconds=max(us, 0))

        left = [
            (i, rng.randrange(3), near_boundary_ts()) for i in range(25)
        ]
        right = [
            (100 + i, rng.randrange(3), near_boundary_ts()) for i in range(25)
        ]
        ldf = spark.createDataFrame(left, ["lid", "k", "lts"])
        rdf = spark.createDataFrame(right, ["rid", "k", "rts"])
        out = range_join_lookback(
            ldf.alias("l"), rdf.alias("r"), ["k"], "lts", "rts", LOOKBACK_US
        )
        got = sorted((r["lid"], r["rid"]) for r in out.collect())

        expect = sorted(
            (lid, rid)
            for lid, lk, lts in left
            for rid, rk, rts in right
            if lk == rk
            and rts <= lts
            and (lts - rts) <= timedelta(microseconds=LOOKBACK_US)
        )
        assert got == expect, seed


def test_asof_forward_semantics(spark):
    from datetime import datetime

    from pu4spark_spark.operators.asof import asof_join_forward

    t = lambda s: datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, 10, t("2024-01-01 10:00:00")),  # before all rights → first
            (2, 10, t("2024-01-01 12:00:00")),  # equal-ts match
            (3, 10, t("2024-01-01 14:30:00")),  # after all rights → NULL
            (4, 20, t("2024-01-01 09:00:00")),  # other key, no right
        ],
        ["lid", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            (100, 10, t("2024-01-01 12:00:00"), 1.0),
            (101, 10, t("2024-01-01 13:00:00"), 2.0),
            (102, 10, t("2024-01-01 14:00:00"), 3.0),
        ],
        ["rid", "k", "ts", "v"],
    )
    out = asof_join_forward(
        left, right, key_cols=["k"], ts_col="ts", value_cols=["rid", "v"],
        order_col="rid",
    )
    got = {r["lid"]: (r["asof_rid"], r["asof_v"]) for r in out.collect()}
    assert got[1] == (100, 1.0)   # earliest right at/after 10:00
    assert got[2] == (100, 1.0)   # equal ts matches (>= semantics)
    assert got[3] == (None, None) # nothing after 14:30
    assert got[4] == (None, None) # key has no rights


# -- interval-overlap join ------------------------------------------------

def test_interval_overlap_matches_bruteforce(spark):
    """Banded interval×interval join = nested-loop reference on random
    intervals, including spans far longer than the band width (multi-
    band explode), exact-touching endpoints (half-open: NOT a match),
    and containment."""
    import datetime
    import random

    rng = random.Random(7)
    base = datetime.datetime(2024, 1, 1)

    def mk(n, max_len_h):
        rows = []
        for i in range(n):
            s = base + datetime.timedelta(minutes=rng.randrange(0, 14 * 24 * 60))
            e = s + datetime.timedelta(minutes=rng.randrange(1, max_len_h * 60))
            rows.append((i, s, e))
        return rows

    lrows = mk(60, 6)
    rrows = mk(25, 48)  # long right intervals: many bands each
    # force an exact-touch case: left ends exactly where a right starts
    lrows.append((100, base, base + datetime.timedelta(hours=2)))
    rrows.append((100, base + datetime.timedelta(hours=2),
                  base + datetime.timedelta(hours=3)))

    from pu4spark_spark.operators.asof import interval_overlap_join

    ldf = spark.createDataFrame(lrows, "l_id long, ls timestamp, le timestamp")
    rdf = spark.createDataFrame(rrows, "r_id long, rs timestamp, re timestamp")
    rows = interval_overlap_join(
        ldf, rdf, "ls", "le", "rs", "re", 4 * 3600 * 1_000_000
    ).collect()
    got = {(r.l_id, r.r_id) for r in rows}
    # the band guard must emit each pair exactly once (no distinct in
    # the operator) — a duplicate would hide inside the set compare
    assert len(rows) == len(got)
    want = {
        (li, ri)
        for li, ls, le in lrows
        for ri, rs, re in rrows
        if ls < re and rs < le
    }
    assert got == want
    assert (100, 100) not in got  # half-open touch is not an overlap


def test_asof_forward_matches_bruteforce_random(spark):
    """Randomized cross-check of the FORWARD as-of join (the backward
    twin above has one; this pins the mirrored frame/tiebreak): for
    every left row, the reference answer is the (min ts, then min rid)
    right row at-or-after it within the key."""
    import random

    for seed in range(5):
        rng = random.Random(1000 + seed)
        keys = [0, 1, 2]
        left = [
            (i, rng.choice(keys),
             _ts(f"2024-01-01 {rng.randrange(24):02d}:{rng.randrange(60):02d}:00"))
            for i in range(20)
        ]
        right = [
            (100 + i, rng.choice(keys + [9]),
             _ts(f"2024-01-01 {rng.randrange(24):02d}:{rng.randrange(60):02d}:00"),
             float(i))
            for i in range(15)
        ]
        from pu4spark_spark.operators.asof import asof_join_forward

        ldf = spark.createDataFrame(left, ["lid", "k", "ts"])
        rdf = spark.createDataFrame(right, ["rid", "k", "ts", "v"])
        out = asof_join_forward(
            ldf, rdf, key_cols=["k"], ts_col="ts", value_cols=["rid", "v"],
            order_col="rid",
        )
        got = {r["lid"]: r["asof_rid"] for r in out.collect()}
        for lid, k, lts in left:
            cands = [(ts, rid) for rid, rk, ts, _ in right if rk == k and ts >= lts]
            expect = min(cands)[1] if cands else None
            assert got[lid] == expect, (seed, lid)
