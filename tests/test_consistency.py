"""Cross-operator consistency: independent operators that make
overlapping claims must agree with EACH OTHER, not just with their own
oracles — the strongest internal evidence the suite can produce."""

from __future__ import annotations

from pyspark.sql import functions as F

from pu4spark_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_locf_at_purchase_rows_equals_own_value(spark):
    """At every purchase event, the carried-forward value IS that
    purchase's value (the frame includes the current row)."""
    from pu4spark_spark.operators.relational import q_events_locf_value

    out = q_events_locf_value(spark, SF)
    ev = load_table(spark, "events", SF).select(
        "event_id", F.col("value").cast("decimal(18,2)").cast("double").alias("v")
    )
    joined = (
        out.filter(F.col("event_type") == "purchase")
        .join(ev, "event_id")
        .collect()
    )
    assert joined
    for r in joined:
        assert r["last_purchase_value"] == r["v"]


def test_sliding_with_slide_equal_size_is_tumbling(spark):
    """window(size, slide=size) must equal the tumbling hourly query —
    the sliding operator degenerates correctly."""
    from pu4spark_spark.operators.relational import q_events_hourly

    events = load_table(spark, "events", SF)
    slid = (
        events.groupBy(
            F.window("ts", "1 hour", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("hour"), "event_type", "n_events")
    )
    hourly = q_events_hourly(spark, SF).select(
        "hour", "event_type", "n_events"
    )
    a = sorted(tuple(r) for r in slid.collect())
    b = sorted(tuple(r) for r in hourly.collect())
    assert a == b


def test_minhash_estimate_pairs_match_lsh_verified_pairs(spark):
    """Every LSH-verified near-dup pair appears among the estimator's
    candidate pairs, and estimates stay in [0, 1]."""
    from pu4spark_spark.operators.dedup import (
        q_dedup_minhash_estimate,
        q_dedup_minhash_lsh,
    )

    est = {
        (r["a_id"], r["b_id"]): r
        for r in q_dedup_minhash_estimate(spark, SF).collect()
    }
    assert est
    for r in est.values():
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["jaccard"] <= 1.0
    verified = q_dedup_minhash_lsh(spark, SF).collect()
    for v in verified:
        key = (v["a_id"], v["b_id"])
        assert key in est
        # the estimator's exact-jaccard column must agree with the
        # verifier's for the same pair
        assert est[key]["jaccard"] == v["jaccard"]


def test_streaming_pyds_agrees_with_batch_pyds(spark):
    """The custom source's incremental stream and batch reader must
    report identical per-lang totals (shared columns)."""
    from pu4spark_spark.sources.pydatasource import (
        q_fmt_pyds_jsonl_roundtrip,
        q_streaming_pyds_docs,
    )

    cols = ["lang", "n_docs", "sum_chars", "min_doc", "max_doc"]
    batch = sorted(
        tuple(r) for r in q_fmt_pyds_jsonl_roundtrip(spark, SF).select(*cols).collect()
    )
    stream = sorted(
        tuple(r) for r in q_streaming_pyds_docs(spark, SF).select(*cols).collect()
    )
    assert batch == stream


def test_scd2_current_rows_equal_scd1_compaction_totals(spark):
    """SCD2's current-interval rows must total exactly what the SCD1
    keep-latest compaction reports (same change set, two disciplines)."""
    from pu4spark_spark.operators.relational import (
        q_orders_scd2_intervals,
        q_orders_upsert_compact,
    )

    scd2 = q_orders_scd2_intervals(spark, SF).filter(F.col("is_current"))
    n_current = scd2.agg(F.sum("n_rows")).collect()[0][0]
    total_current = round(
        sum(r["sum_price"] for r in scd2.collect()), 2
    )
    scd1 = q_orders_upsert_compact(spark, SF).collect()
    assert n_current == sum(r["n_orders"] for r in scd1)
    assert total_current == round(sum(r["total_price"] for r in scd1), 2)


def test_chunk_release_drops_exactly_the_duplicate_spans(spark):
    """The chunks the release pipeline drops are exactly the non-keeper
    members of dedup_chunk_spans' duplicate groups."""
    from pu4spark_spark.operators.curation import (
        q_curation_chunk_windows,
        q_dedup_chunk_spans,
        q_pipeline_chunk_release,
    )

    total_chunks = q_curation_chunk_windows(spark, SF).count()
    kept_chunks = (
        q_pipeline_chunk_release(spark, SF)
        .agg(F.sum("n_chunks"))
        .collect()[0][0]
    )
    dup_extra = sum(
        r["n_spans"] - 1 for r in q_dedup_chunk_spans(spark, SF).collect()
    )
    assert total_chunks - kept_chunks == dup_extra
    assert dup_extra > 0  # the fixture actually exercises the drop


def test_events_value_trend_vs_numpy(spark):
    """Closed-form grouped OLS must match numpy.polyfit on the same
    (hour, value) points to float precision."""
    import numpy as np
    from pyspark.sql import functions as F

    from pu4spark_spark.operators.relational import q_events_value_trend

    sf = "/root/testdata/sf0.001"
    got = {r.event_type: r for r in q_events_value_trend(spark, sf).collect()}
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select(
            "event_type",
            F.expr(
                "cast(unix_timestamp(date_trunc('hour', cast(ts as timestamp)))"
                " as bigint) div 3600"
            ).alias("t"),
            F.col("value").cast("double").alias("y"),
        )
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append((r.t, r.y))
    assert set(got) == set(by_type)
    for et, pts in by_type.items():
        t = np.array([p[0] for p in pts], dtype=np.float64)
        y = np.array([p[1] for p in pts], dtype=np.float64)
        slope = np.polyfit(t, y, 1)[0]
        assert got[et].n_events == len(pts)
        assert abs(got[et].slope_per_hour - slope) <= 1e-9 * max(1.0, abs(slope)) + 1e-12


def test_bitmap_overlap_equals_exact_intersection(spark):
    """SUM(n_both) over the bitmap blocks must equal the exact
    |clickers ∩ purchasers| computed by a distinct-set intersection."""
    from pyspark.sql import functions as F

    from pu4spark_spark.operators.relational import q_events_audience_bitmap
    from pu4spark_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    got = (
        q_events_audience_bitmap(spark, sf)
        .agg(F.sum("n_both"))
        .collect()[0][0]
    )
    ev = load_table(spark, "events", sf)
    clickers = ev.filter(F.col("event_type") == "click").select(
        "user_id"
    ).distinct()
    purchasers = ev.filter(F.col("event_type") == "purchase").select(
        "user_id"
    ).distinct()
    want = clickers.intersect(purchasers).count()
    assert got == want


def test_transition_matrix_probabilities_sum_to_one(spark):
    """Per from_type, transition probabilities sum to 1 and counts sum
    to n_events_of_type - n_users_ending_on_type (lead drops the last
    step of each user)."""
    from pyspark.sql import functions as F

    from pu4spark_spark.operators.relational import (
        q_events_transition_matrix,
    )

    sf = "/root/testdata/sf0.001"
    tm = q_events_transition_matrix(spark, sf)
    sums = tm.groupBy("from_type").agg(F.sum("p").alias("sp")).collect()
    for r in sums:
        assert abs(r.sp - 1.0) < 1e-9


def test_rerank_recall_dominates_stage1(spark):
    """Retrieve->rerank consistency: the reranked top-k must recall at
    least every exact neighbor the raw binary top-k recalls (stage-1's
    top-k is a prefix of the candidate set, and within candidates the
    rerank restores the exact cosine order), and its recall equals the
    candidate coverage of the exact top-k."""
    from pyspark.sql import functions as F

    from pu4spark_spark.operators.similarity import (
        TOP_K,
        q_ann_cosine_topk,
        q_ann_rerank_topk,
    )

    sf = "/root/testdata/sf0.001"
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in q_ann_cosine_topk(spark, sf).collect()
    }
    rer = q_ann_rerank_topk(spark, sf).collect()
    assert all(1 <= r["rank"] <= TOP_K for r in rer)
    reranked = {(r["query_id"], r["neighbor_id"]) for r in rer}
    # stage-1 ranking of the same pairs (retrieve_rank <= TOP_K = the
    # raw binary top-k) can only match a subset of what rerank matches
    stage1 = {
        (r["query_id"], r["neighbor_id"])
        for r in rer
        if r["retrieve_rank"] <= TOP_K
    }
    assert len(exact & stage1) <= len(exact & reranked)
    # every exact neighbor that made the candidate list is recovered
    cand_hits = {
        (r["query_id"], r["neighbor_id"])
        for r in rer
        if (r["query_id"], r["neighbor_id"]) in exact
    }
    assert cand_hits == exact & reranked


def test_cluster_quality_report_consistency(spark):
    """The dedup quality report must agree with the canonical-doc
    operator it composes: one keeper per cluster, the keeper's quality
    inside [min, max], token conservation kept + dropped == total, and
    member counts matching the canonical table's cluster sizes."""
    from collections import Counter

    from pu4spark_spark.operators.dedup import (
        q_dedup_canonical_docs,
        q_dedup_cluster_quality,
    )

    sf = "/root/testdata/sf0.001"
    canon = q_dedup_canonical_docs(spark, sf).collect()
    sizes = Counter(r["cluster_id"] for r in canon)
    keepers = {r["cluster_id"]: r["canonical_id"] for r in canon if r["is_keeper"]}
    rows = q_dedup_cluster_quality(spark, sf).collect()
    assert {r["cluster_id"] for r in rows} == set(sizes)
    for r in rows:
        assert r["n_members"] == sizes[r["cluster_id"]]
        assert r["n_dropped"] == r["n_members"] - 1
        assert r["canonical_id"] == keepers[r["cluster_id"]]
        assert r["min_quality"] <= r["canonical_quality"] <= r["max_quality"]
        # keep-best: the canonical doc has the cluster's max quality
        assert r["canonical_quality"] == r["max_quality"]
        assert r["tokens_kept"] + r["tokens_dropped"] == r["tokens_total"]


def test_drop_reasons_conserve_and_match_clean_output(spark):
    """Record-level provenance must reconcile with the pipeline it
    explains: reasons partition the corpus (doc counts sum to the
    table), and the 'kept' bucket equals pipeline_docs_clean's output
    exactly (count AND per-lang)."""
    from collections import Counter

    from pu4spark_spark.operators.pipeline import (
        q_pipeline_docs_clean,
        q_pipeline_drop_reasons,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_pipeline_drop_reasons(spark, sf).collect()
    total = sum(r["n_docs"] for r in rows)
    n_corpus = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert total == n_corpus
    kept_by_lang = Counter()
    for r in rows:
        assert r["reason"] in {
            "too_short", "low_quality", "exact_dup", "near_dup", "kept"
        }
        if r["reason"] == "kept":
            kept_by_lang[r["lang"]] += r["n_docs"]
    clean = q_pipeline_docs_clean(spark, sf).collect()
    spark.catalog.clearCache()
    assert kept_by_lang == Counter(r["lang"] for r in clean)


def test_token_offsets_form_a_valid_index(spark):
    """The distributed prefix sum must equal the sequential one: offsets
    start at 0, step by exactly the previous doc's token count in doc_id
    order, and end at corpus_total - last_n_tokens."""
    from pu4spark_spark.operators.curation import q_curation_token_offsets

    rows = sorted(
        q_curation_token_offsets(spark, SF).collect(),
        key=lambda r: r["doc_id"],
    )
    spark.catalog.clearCache()
    assert rows and rows[0]["token_offset"] == 0
    running = 0
    for r in rows:
        assert r["token_offset"] == running
        running += r["n_tokens"]
    total = (
        load_table(spark, "documents", SF)
        .filter(F.col("text").isNotNull())
        .select(F.sum(F.size(F.split("text", " "))))
        .collect()[0][0]
    )
    assert running == total


def test_dense_hourly_is_the_sparse_rollup_plus_zeros(spark):
    """Densified grid = full hours × types rectangle; its nonzero cells
    are EXACTLY the sparse events_hourly rollup."""
    from pu4spark_spark.operators.relational import (
        q_events_dense_hourly,
        q_events_hourly,
    )

    dense = q_events_dense_hourly(spark, SF).collect()
    spark.catalog.clearCache()
    sparse = {
        (r["hour"], r["event_type"]): r["n_events"]
        for r in q_events_hourly(spark, SF).collect()
    }
    hours = {r["hour"] for r in dense}
    types = {r["event_type"] for r in dense}
    assert len(dense) == len(hours) * len(types)  # full rectangle
    nonzero = {
        (r["hour"], r["event_type"]): r["n_events"]
        for r in dense
        if r["n_events"] > 0
    }
    assert nonzero == sparse
    assert len(dense) > len(sparse)  # the fixture has silent cells


def test_pivot_row_sums_match_priority_totals(spark):
    """Summing the pivot's status columns recovers the plain
    per-priority aggregate — no order is lost or double-counted."""
    from pu4spark_spark.operators.relational import q_orders_pivot_status

    piv = {
        r["o_orderpriority"]: r
        for r in q_orders_pivot_status(spark, SF).collect()
    }
    direct = load_table(spark, "orders", SF).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev"),
    )
    for r in direct.collect():
        p = piv[r["o_orderpriority"]]
        assert p["n_o"] + p["n_f"] + p["n_p"] == r["n"]
        assert abs(p["rev_o"] + p["rev_f"] + p["rev_p"] - r["rev"]) < 1e-6


def test_span_removal_accounting(spark):
    """Dropped tiles across all docs must equal (full tiles) - (distinct
    tile hashes) — keep-first-per-hash semantics — and every report row
    must satisfy kept = total - CHUNK_SIZE * dropped."""
    from pu4spark_spark.operators.curation import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        q_curation_chunk_windows,
        q_dedup_span_removal,
    )

    rows = q_dedup_span_removal(spark, SF).collect()
    spark.catalog.clearCache()
    assert rows  # the fixture exercises the removal
    for r in rows:
        assert r["n_dropped"] >= 1
        assert r["kept_tokens"] == r["n_tokens"] - CHUNK_SIZE * r["n_dropped"]
    full_tiles = q_curation_chunk_windows(spark, SF).filter(
        ((F.col("chunk_id") * CHUNK_STRIDE) % CHUNK_SIZE == 0)
        & (F.col("n_tokens") == CHUNK_SIZE)
    )
    n_full = full_tiles.count()
    n_distinct = full_tiles.select("chunk_md5").distinct().count()
    assert sum(r["n_dropped"] for r in rows) == n_full - n_distinct


def test_eval_holdout_exactly_k_per_lang_and_stable(spark):
    """Each language contributes exactly EVAL_K docs, and dropping half
    the corpus keeps every surviving member's selection decision
    consistent with the hash order (stability under growth)."""
    from collections import Counter

    from pu4spark_spark.operators.curation import (
        EVAL_K,
        q_curation_eval_holdout,
    )

    rows = q_curation_eval_holdout(spark, SF).collect()
    by_lang = Counter(r["lang"] for r in rows)
    n_langs = (
        load_table(spark, "documents", SF).select("lang").distinct().count()
    )
    assert len(by_lang) == n_langs
    assert all(v == EVAL_K for v in by_lang.values())
    # stability: the holdout of the even-doc_id half agrees with the
    # full-corpus hash order restricted to even docs
    import hashlib

    docs = load_table(spark, "documents", SF).select("doc_id", "lang").collect()
    key = lambda d: hashlib.md5(str(d).encode()).hexdigest()  # noqa: E731
    expect = {}
    for lang in by_lang:
        evens = sorted(
            (d["doc_id"] for d in docs if d["lang"] == lang and d["doc_id"] % 2 == 0),
            key=lambda d: (key(d), d),
        )
        expect[lang] = set(evens[:EVAL_K])
    half = load_table(spark, "documents", SF).filter(F.col("doc_id") % 2 == 0)
    from pu4spark_spark.plans import two_phase_rank

    picked = two_phase_rank(
        half.select("doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("__h")),
        ["lang"], [F.asc("__h"), F.asc("doc_id")], EVAL_K,
    ).collect()
    got = {}
    for r in picked:
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    assert got == expect


def test_fuzzy_matches_agree_with_python_reference(spark):
    """The blocked join's per-(block, distance) histogram equals a
    CPython O(block^2) re-derivation on the same fixture."""
    from collections import Counter

    from pu4spark_spark.operators.relational import (
        LINK_MAX_LEV,
        q_part_fuzzy_matches,
    )

    got = {
        (r["blk"], r["lev"]): r["n_pairs"]
        for r in q_part_fuzzy_matches(spark, SF).collect()
    }

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    parts = load_table(spark, "part", SF).select(
        "p_partkey", "p_name", "p_size"
    ).collect()
    blocks = {}
    for p in parts:
        blocks.setdefault((p["p_name"].split(" ")[1], p["p_size"]), []).append(p)
    expect = Counter()
    for (blk, _size), members in blocks.items():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                x, y = sorted((a, b), key=lambda r: r["p_partkey"])
                if x["p_name"] != y["p_name"]:
                    d = lev(x["p_name"], y["p_name"])
                    if d <= LINK_MAX_LEV:
                        expect[(blk, d)] += 1
    assert got == dict(expect)


def test_prefix_filter_join_is_exact_and_contains_lsh_hits(spark):
    """The prefix-filtered join must equal brute-force all-pairs Jaccard
    at tau (completeness — the whole point vs LSH), and every banded-LSH
    pair above tau must be among its results (LSH ⊆ exact)."""
    from itertools import combinations

    from pu4spark_spark.operators.dedup import (
        PREFIX_JACCARD_TAU,
        _doc_shingle_sets,
        q_dedup_ngram_jaccard,
        q_dedup_prefix_filter_join,
    )

    got = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in q_dedup_prefix_filter_join(spark, SF).collect()
    }
    spark.catalog.clearCache()
    sets = {
        r["doc_id"]: set(r["sh"])
        for r in _doc_shingle_sets(spark, SF).collect()
        if r["sh"]
    }
    expect = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        j = inter / (len(sets[a]) + len(sets[b]) - inter)
        if j >= PREFIX_JACCARD_TAU:
            expect[(a, b)] = j
    assert set(got) == set(expect)
    for k, v in got.items():
        assert abs(v - expect[k]) < 1e-12
    lsh = q_dedup_ngram_jaccard(spark, SF).collect()
    spark.catalog.clearCache()
    lsh_above = {
        (r["a_id"], r["b_id"])
        for r in lsh
        if r["jaccard"] >= PREFIX_JACCARD_TAU
    }
    assert lsh_above <= set(got)


def test_twap_bounds_and_python_reference(spark):
    """Each user's TWAP must lie within [min, max] of their values, and
    match a sequential Python re-derivation exactly."""
    from pu4spark_spark.operators.relational import (
        q_events_time_weighted_value,
    )

    got = {r["user_id"]: r for r in q_events_time_weighted_value(spark, SF).collect()}
    assert got
    events = sorted(
        load_table(spark, "events", SF)
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in events:
        per_user[r["user_id"]].append(r)
    for uid, rows in per_user.items():
        if len(rows) < 2:
            assert uid not in got
            continue
        num = tot = 0
        vals = []
        for a, b in zip(rows, rows[1:]):
            d = b["ts"] - a["ts"]
            us = (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds
            cents = round(a["value"] * 100)
            num += cents * us
            tot += us
            vals.append(a["value"])
        g = got[uid]
        assert g["n_intervals"] == len(rows) - 1
        assert g["total_micros"] == tot
        assert g["twap"] == float(num) / (float(tot) * 100.0)
        assert min(vals) - 0.005 <= g["twap"] <= max(vals) + 0.005


def test_purge_maintenance_equals_filtered_recompute(spark):
    """The retraction-record merge must equal recomputing the hourly
    rollup from scratch without the purged cohort — including DROPPING
    (not zeroing) any cell the cohort owned entirely."""
    from pu4spark_spark.operators.relational import (
        PURGE_USER_MOD,
        q_events_purge_maintenance,
    )

    got = {
        (r["hour"], r["event_type"]): (r["n_events"], round(r["sum_value"], 2))
        for r in q_events_purge_maintenance(spark, SF).collect()
    }
    events = load_table(spark, "events", SF).filter(
        F.col("user_id") % PURGE_USER_MOD != 0
    )
    expect = {
        (r["hour"], r["event_type"]): (r["n"], round(r["s"], 2))
        for r in events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("s"),
        )
        .collect()
    }
    assert got == expect
    assert all(n > 0 for n, _ in got.values())


def test_top_paths_totals_and_funnel_containment(spark):
    """Total trigram occurrences must equal Σ_user max(0, n_events - 2),
    and each user contributes to at most that many paths."""
    from pu4spark_spark.operators.relational import q_events_top_paths

    rows = q_events_top_paths(spark, SF).collect()
    total = sum(r["n_paths"] for r in rows)
    per_user = (
        load_table(spark, "events", SF)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert total == sum(max(0, r["n"] - 2) for r in per_user)
    assert all(r["n_users"] <= r["n_paths"] for r in rows)


def test_ewma_matches_cpython_fold(spark):
    """The in-engine ordered fold must equal the CPython left fold over
    the identically-sorted per-user value sequence, bit for bit."""
    from pu4spark_spark.operators.relational import (
        EWMA_ALPHA,
        q_events_ewma_value,
    )

    got = {
        r["user_id"]: (r["n_events"], r["ewma_value"], r["last_value"])
        for r in q_events_ewma_value(spark, SF).collect()
    }
    rows = (
        load_table(spark, "events", SF)
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    seqs: dict = {}
    for r in rows:
        seqs.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    assert set(got) == set(seqs)
    for uid, seq in seqs.items():
        seq.sort()
        acc = seq[0][2]
        for _, _, x in seq[1:]:
            acc = x * EWMA_ALPHA + acc * (1.0 - EWMA_ALPHA)
        n, ewma, last = got[uid]
        assert n == len(seq)
        assert ewma == acc  # exact: same IEEE chain
        assert last == seq[-1][2]


def test_interpolate_gaps_observed_and_bounds(spark):
    """Observed cells carry their exact count; interpolated cells lie
    strictly between (inclusive) their surrounding anchors; edge cells
    are null-filled.  The observed cells must equal the raw rollup."""
    from pu4spark_spark.operators.relational import (
        INTERP_BUCKET_S,
        q_events_interpolate_gaps,
    )

    out = q_events_interpolate_gaps(spark, SF).collect()
    ev = load_table(spark, "events", SF)
    rollup = {
        (r["event_type"], r["tb"]): r["n"]
        for r in ev.groupBy(
            F.timestamp_seconds(
                F.floor(F.unix_timestamp("ts") / INTERP_BUCKET_S).cast(
                    "bigint"
                )
                * INTERP_BUCKET_S
            ).alias("tb"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kinds = {"observed": 0, "interpolated": 0, "edge": 0}
    by_type: dict = {}
    for r in out:
        kinds[r["fill_kind"]] += 1
        by_type.setdefault(r["event_type"], []).append(r)
        if r["fill_kind"] == "observed":
            assert r["n_filled"] == float(
                rollup[(r["event_type"], r["tb"])]
            )
        elif r["fill_kind"] == "edge":
            assert r["n_filled"] is None
    assert kinds["observed"] == len(rollup)
    assert kinds["interpolated"] > 0  # the fixture has real gaps
    for et, rows in by_type.items():
        rows.sort(key=lambda r: r["tb"])
        anchors = [r for r in rows if r["fill_kind"] == "observed"]
        lo = min(r["n_filled"] for r in anchors)
        hi = max(r["n_filled"] for r in anchors)
        for r in rows:
            if r["fill_kind"] == "interpolated":
                assert lo <= r["n_filled"] <= hi


def test_anomaly_mad_matches_cpython_reference(spark):
    """Median/MAD fences recomputed in CPython over the same hourly
    rollup flag exactly the same (type, hour) cells."""
    import math

    from pu4spark_spark.operators.relational import (
        MAD_K,
        q_events_anomaly_mad,
    )

    got = {
        (r["event_type"], r["hour"]): (r["n"], r["median_n"], r["mad_n"])
        for r in q_events_anomaly_mad(spark, SF).collect()
    }
    hourly = (
        load_table(spark, "events", SF)
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_type: dict = {}
    for r in hourly:
        by_type.setdefault(r["event_type"], []).append((r["hour"], r["n"]))

    def lower_median(vals):
        vs = sorted(vals)
        return vs[math.ceil(len(vs) / 2) - 1]

    expect = {}
    for et, cells in by_type.items():
        med = lower_median([n for _, n in cells])
        mad = lower_median([abs(n - med) for _, n in cells])
        for hour, n in cells:
            if n > med + MAD_K * mad:
                expect[(et, hour)] = (n, med, mad)
    assert got == expect


def test_sql_udf_quality_agrees_with_dataframe_scorer(spark):
    """The catalog-function quality definition must reproduce the
    DataFrame ``quality_score_expr`` report exactly: same per-language
    doc counts, keep counts, and min/max scores."""
    from pu4spark_spark.operators.text import (
        SQL_UDF_MIN_QUALITY,
        q_sql_scalar_udf_quality,
        q_text_quality,
    )

    got = {
        r["lang"]: (
            r["n_docs"], r["n_keep"], r["min_quality"], r["max_quality"]
        )
        for r in q_sql_scalar_udf_quality(spark, SF).collect()
    }
    per_doc = q_text_quality(spark, SF).collect()
    by_lang: dict = {}
    for r in per_doc:
        by_lang.setdefault(r["lang"], []).append(r["quality_score"])
    expect = {
        lang: (
            len(qs),
            sum(1 for q in qs if q >= SQL_UDF_MIN_QUALITY),
            min(qs),
            max(qs),
        )
        for lang, qs in by_lang.items()
    }
    assert got == expect
