from __future__ import annotations

from pyspark.sql import functions as F

from pu4spark_spark.operators.curation import (
    BENCH_MOD,
    CONTAM_THRESHOLD,
    MIX_PER_MILLE,
    REDACTED,
    SHARD_TOKEN_BUDGET,
    q_curation_decontaminate,
    q_curation_domain_mix,
    q_curation_pii_redact,
    q_curation_repetition,
    q_curation_shard_pack,
)
from pu4spark_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_redaction_removes_all_denylist_terms(spark):
    # a doc with secret terms redacted must not count them afterwards:
    # rebuild the scrubbed text length bound — every 'hash'/'key' hit
    # is replaced by the longer [REDACTED] marker
    docs = load_table(spark, "documents", SF)
    raw = docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r"\b(hash|key)\b"), 0)
        ).alias("n_raw"),
        F.length("text").alias("len_raw"),
    )
    out = q_curation_pii_redact(spark, SF)
    joined = {r["doc_id"]: r for r in out.join(raw, "doc_id").collect()}
    assert joined
    hits = 0
    for r in joined.values():
        assert r["n_secret"] == r["n_raw"]
        # both denylist terms are shorter than the [REDACTED] marker, so
        # the scrubbed text is strictly longer exactly when hits exist
        if r["n_raw"]:
            hits += 1
            assert r["redacted_len"] > r["len_raw"]
        else:
            assert r["redacted_len"] == r["len_raw"]
    assert hits > 0  # fixture actually exercises the replace path


def test_decontaminate_benchmark_docs_excluded(spark):
    out = q_curation_decontaminate(spark, SF).collect()
    ids = {r["doc_id"] for r in out}
    assert ids, "no training docs"
    assert all(i % BENCH_MOD != 0 for i in ids)
    flagged = [r for r in out if r["flagged"]]
    for r in out:
        assert (r["n_contam"] >= CONTAM_THRESHOLD) == r["flagged"]
    # tiny shared vocabulary ⇒ overlap must exist somewhere
    assert flagged


def test_domain_mix_rates_ordered(spark):
    rows = {r["lang"]: r for r in q_curation_domain_mix(spark, SF).collect()}
    assert set(rows) == set(MIX_PER_MILLE)
    for lang, r in rows.items():
        assert 0 <= r["n_sampled"] <= r["n_total"]
        # deterministic: re-running draws the identical sample
    again = {r["lang"]: r for r in q_curation_domain_mix(spark, SF).collect()}
    assert {k: v["n_sampled"] for k, v in rows.items()} == {
        k: v["n_sampled"] for k, v in again.items()
    }
    # achieved rates should roughly order like the configured rates:
    # en (900‰) must keep a larger fraction than zh (100‰)
    assert rows["en"]["achieved_rate"] > rows["zh"]["achieved_rate"]


def test_shard_pack_respects_budget(spark):
    docs = load_table(spark, "documents", SF)
    max_doc_tokens = docs.select(
        F.max(F.size(F.split(F.col("text"), " "))).alias("m")
    ).collect()[0]["m"]
    shards = q_curation_shard_pack(spark, SF).collect()
    assert shards
    for s in shards:
        assert s["n_docs"] >= 1
        # a shard overshoots the budget by at most one document
        assert s["shard_tokens"] < SHARD_TOKEN_BUDGET + max_doc_tokens
    # shard ids are dense from 0 within each language
    by_lang: dict[str, list[int]] = {}
    for s in shards:
        by_lang.setdefault(s["lang"], []).append(s["shard_id"])
    for lang, ids in by_lang.items():
        assert sorted(ids) == list(range(len(ids)))


def test_repetition_ratio_bounds(spark):
    rows = q_curation_repetition(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["top_gram_count"] <= r["n_grams"]
        assert 0.0 < r["top_ratio"] <= 1.0


def test_streaming_dedup_matches_batch_distinct(spark):
    from pu4spark_spark.sources import load_table
    from pu4spark_spark.streaming.events import q_streaming_dedup_keys

    streamed = {
        (r["user_id"], r["event_type"])
        for r in q_streaming_dedup_keys(spark, SF).collect()
    }
    batch = {
        (r["user_id"], r["event_type"])
        for r in load_table(spark, "events", SF)
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert streamed == batch
    # one row per key — no duplicate re-emission in the one-shot drain
    n_rows = q_streaming_dedup_keys(spark, SF).count()
    assert n_rows == len(batch)


def test_heavy_hitters_ranked_and_complete(spark):
    from pu4spark_spark.operators.text import HEAVY_HITTER_K, q_text_heavy_hitters

    rows = q_text_heavy_hitters(spark, SF).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= HEAVY_HITTER_K
        # counts are non-increasing with rank; ties broken by token asc
        for a, b in zip(rs, rs[1:]):
            assert (a["n"], b["token"]) >= (b["n"], a["token"]) or a["n"] > b["n"]
            assert a["n"] >= b["n"]


def test_batch_sessionization_matches_streaming(spark):
    from pu4spark_spark.operators.relational import q_events_sessionized
    from pu4spark_spark.streaming.events import q_streaming_sessions

    key = lambda r: (  # noqa: E731
        r["user_id"], r["session_start"], r["session_end"], r["n_events"]
    )
    batch = sorted(map(key, q_events_sessionized(spark, SF).collect()))
    stream = sorted(map(key, q_streaming_sessions(spark, SF).collect()))
    assert batch == stream


def test_heavy_hitters_vs_python_counter(spark):
    """Independent reference: recompute per-language top-K with
    collections.Counter on the collected fixture and compare exactly
    (count DESC, token ASC order)."""
    from collections import Counter, defaultdict

    from pu4spark_spark.operators.text import HEAVY_HITTER_K, q_text_heavy_hitters

    docs = load_table(spark, "documents", SF).select("lang", "text").collect()
    counts: dict[str, Counter] = defaultdict(Counter)
    for r in docs:
        counts[r["lang"]].update(r["text"].split(" "))
    expected = {}
    for lang, c in counts.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (tok, n) in enumerate(ranked[:HEAVY_HITTER_K], start=1):
            expected[(lang, rank)] = (tok, n)
    got = {
        (r["lang"], r["rank"]): (r["token"], r["n"])
        for r in q_text_heavy_hitters(spark, SF).collect()
    }
    assert got == expected


def test_shard_pack_vs_python_simulation(spark):
    """Independent reference: simulate the per-language running-sum
    packing in plain Python and compare shard stats exactly."""
    from collections import defaultdict

    from pu4spark_spark.operators.curation import (
        SHARD_TOKEN_BUDGET,
        q_curation_shard_pack,
    )

    docs = sorted(
        load_table(spark, "documents", SF)
        .select("lang", "doc_id", "text")
        .collect(),
        key=lambda r: (r["lang"], r["doc_id"]),
    )
    stats = defaultdict(lambda: [0, 0, None, None])  # n_docs, toks, first, last
    running = defaultdict(int)
    for r in docs:
        nt = len(r["text"].split(" "))
        shard = running[r["lang"]] // SHARD_TOKEN_BUDGET
        running[r["lang"]] += nt
        s = stats[(r["lang"], shard)]
        s[0] += 1
        s[1] += nt
        s[2] = r["doc_id"] if s[2] is None else s[2]
        s[3] = r["doc_id"]
    got = {
        (r["lang"], r["shard_id"]): (
            r["n_docs"], r["shard_tokens"], r["first_doc"], r["last_doc"]
        )
        for r in q_curation_shard_pack(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in stats.items()}


def test_zorder_key_vs_python(spark):
    """Bit-interleave reference: the Morton key must equal a plain
    Python implementation for representative values."""
    from pyspark.sql import functions as F

    from pu4spark_spark.operators.relational import ZORDER_BITS, zorder_key

    def py_z(a: int, b: int) -> int:
        z = 0
        for i in range(ZORDER_BITS):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    vals = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 8)]
    df = spark.createDataFrame(vals, ["a", "b"]).select(
        "a", "b", zorder_key("cast(a as bigint)", "cast(b as bigint)").alias("z")
    )
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    assert got == {(a, b): py_z(a, b) for a, b in vals}


def test_winnow_fingerprint_vs_python(spark):
    """Winnowing reference: recompute the fingerprint-set summary in
    plain Python (md5 token codes → rolling poly hash → window mins →
    distinct) and compare all four scalars for every fixture doc."""
    import hashlib

    from pu4spark_spark.operators.text import (
        POLY_B,
        POLY_P,
        WINNOW_W,
        q_text_winnow_fingerprint,
    )

    def py_winnow(text: str):
        toks = text.split(" ")
        codes = [
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in toks
        ]
        if len(codes) >= 3:
            sh = [
                ((codes[i] * POLY_B + codes[i + 1]) * POLY_B + codes[i + 2])
                % POLY_P
                for i in range(len(codes) - 2)
            ]
        else:
            sh = []
        if len(sh) >= WINNOW_W:
            mins = [
                min(sh[i : i + WINNOW_W])
                for i in range(len(sh) - WINNOW_W + 1)
            ]
        else:
            mins = sh
        fps = list(dict.fromkeys(mins))  # array_distinct keeps first-seen
        return (
            len(fps),
            min(fps) if fps else None,
            max(fps) if fps else None,
            sum(fps),
        )

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, "documents", SF).collect()
    }
    got = {
        r["doc_id"]: (r["n_fp"], r["fp_min"], r["fp_max"], r["fp_sum"])
        for r in q_text_winnow_fingerprint(spark, SF).collect()
    }
    assert got == {d: py_winnow(t) for d, t in docs.items()}


def test_hash_split_is_scan_stage_only_and_covers_all_docs(spark):
    from pu4spark_spark.operators.curation import q_curation_hash_split

    out = q_curation_hash_split(spark, SF)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure per-row math, no shuffle
    rows = out.collect()
    n_docs = load_table(spark, "documents", SF).count()
    assert len(rows) == n_docs
    by_split = {}
    for r in rows:
        assert (r["bucket"] < 8) == (r["split"] == "train")
        by_split[r["split"]] = by_split.get(r["split"], 0) + 1
    # all three splits are populated and train dominates (8/1/1 buckets)
    assert set(by_split) == {"train", "val", "test"}
    assert by_split["train"] > by_split["val"]
    assert by_split["train"] > by_split["test"]


def test_stratified_sample_exactly_k_per_lang(spark):
    from pu4spark_spark.operators.curation import (
        STRATUM_K,
        q_curation_stratified_sample,
    )

    out = q_curation_stratified_sample(spark, SF).collect()
    per_lang = {}
    for r in out:
        per_lang.setdefault(r["lang"], set()).add(r["sample_rank"])
    docs = load_table(spark, "documents", SF)
    stratum_sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, ranks in per_lang.items():
        want = min(STRATUM_K, stratum_sizes[lang])
        assert ranks == set(range(1, want + 1))
    assert set(per_lang) == set(stratum_sizes)


def test_chunk_windows_cover_every_token_once_per_pass(spark):
    from pu4spark_spark.operators.curation import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        q_curation_chunk_windows,
    )

    out = q_curation_chunk_windows(spark, SF)
    docs = (
        load_table(spark, "documents", SF)
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    )
    n_by_doc = {r["doc_id"]: r["n"] for r in docs}
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_id"], r["n_tokens"]))
    for doc_id, n in n_by_doc.items():
        chunks = sorted(got[doc_id])
        # one chunk per stride-start below n
        want_starts = list(range(0, n, CHUNK_STRIDE))
        assert [c for c, _ in chunks] == list(range(len(want_starts)))
        for (cid, ntok), start in zip(chunks, want_starts):
            assert ntok == min(CHUNK_SIZE, n - start)


def test_temperature_mix_smallest_source_keeps_all(spark):
    """p_keep is normalized so the SMALLEST source has probability 1 —
    its docs all survive; every p_keep is in (0, 1]; kept <= total."""
    from pu4spark_spark.operators.curation import q_curation_temperature_mix

    rows = {r["source"]: r for r in q_curation_temperature_mix(spark, SF).collect()}
    assert rows
    min_n = min(r["n_src"] for r in rows.values())
    for r in rows.values():
        assert 0.0 < r["p_keep"] <= 1.0
        assert r["n_kept"] <= r["n_src"]
        if r["n_src"] == min_n:
            assert r["p_keep"] == 1.0 and r["n_kept"] == r["n_src"]
    # rarer sources keep a HIGHER fraction (monotone up-weighting)
    by_n = sorted(rows.values(), key=lambda r: r["n_src"])
    for a, b in zip(by_n, by_n[1:]):
        assert a["p_keep"] >= b["p_keep"]


def test_oov_rate_bounds_and_split_disjointness(spark):
    from pu4spark_spark.operators.curation import (
        q_curation_hash_split,
        q_curation_oov_rate,
    )

    split = {r["doc_id"]: r["split"] for r in q_curation_hash_split(spark, SF).collect()}
    out = q_curation_oov_rate(spark, SF).collect()
    assert out
    for r in out:
        # only non-train docs are scored, rate is a valid ratio
        assert split[r["doc_id"]] in ("val", "test")
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert abs(r["oov_rate"] - r["n_oov"] / r["n_tokens"]) == 0.0


def test_bloom_decontaminate_supersets_exact(spark):
    """A Bloom filter admits false positives but NEVER false negatives:
    every doc the exact shingle-set probe flags must be flagged (with
    at least the same hit count) by the bloom variant, and the bloom's
    extra maybe-hits at this geometry stay a small fraction."""
    from pu4spark_spark.operators.curation import (
        q_curation_bloom_decontaminate,
        q_curation_decontaminate,
    )

    exact = {
        r["doc_id"]: r["n_contam"]
        for r in q_curation_decontaminate(spark, SF).collect()
    }
    bloom = {
        r["doc_id"]: r["n_contam"]
        for r in q_curation_bloom_decontaminate(spark, SF).collect()
    }
    assert set(exact) == set(bloom)  # same training universe
    extra = 0
    for doc_id, n_exact in exact.items():
        assert bloom[doc_id] >= n_exact, f"false negative at doc {doc_id}"
        extra += bloom[doc_id] - n_exact
    # FP budget: (1 - e^{-kn/m})^k ≈ 1% per probed shingle at this
    # geometry — allow generous slack, but catch a broken bloom that
    # flags everything
    total_exact = sum(exact.values())
    assert extra <= max(20, total_exact)


def test_importance_sample_systematic_properties(spark):
    from pu4spark_spark.operators.curation import (
        SAMPLE_K,
        q_curation_importance_sample,
    )

    rows = q_curation_importance_sample(
        spark, "/root/testdata/sf0.001"
    ).collect()
    # telescoping slot sum: exactly K slots exist; each picked doc owns
    # ≥1 of them, so picks ∈ [1, K] and every pick has weight > 0
    assert 1 <= len(rows) <= SAMPLE_K
    assert all(r["n_tokens"] > 0 for r in rows)
    slots = [r["sample_slot"] for r in sorted(rows, key=lambda r: r["doc_id"])]
    # doc order walks the token axis, so owned first-slots are strictly
    # increasing and within range
    assert slots == sorted(slots) and len(set(slots)) == len(slots)
    assert 0 <= slots[0] and slots[-1] < SAMPLE_K
    # deterministic: a second run is identical
    again = q_curation_importance_sample(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_fuzzy_decontaminate_contract(spark):
    from pu4spark_spark.operators.curation import (
        BENCH_MOD,
        FUZZY_CONTAM_JACCARD,
        q_curation_fuzzy_decontaminate,
    )

    rows = q_curation_fuzzy_decontaminate(spark, SF).collect()
    # only TRAIN docs are ever flagged, every flag meets the verified
    # threshold, and the match count is positive
    for r in rows:
        assert r["doc_id"] % BENCH_MOD != 0
        assert r["max_jaccard"] >= FUZZY_CONTAM_JACCARD
        assert r["n_bench_matches"] >= 1


def test_quality_threshold_sweep_monotone(spark):
    from pu4spark_spark.operators.text import (
        q_eval_quality_threshold_sweep,
        q_text_quality,
    )

    rows = sorted(
        q_eval_quality_threshold_sweep(spark, SF).collect(),
        key=lambda r: r["thr_bin"],
    )
    # raising the threshold can only shrink the kept set
    docs = [r["n_docs_kept"] for r in rows]
    toks = [r["n_tokens_kept"] for r in rows]
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    # the loosest threshold keeps the whole corpus
    n_total = q_text_quality(spark, SF).count()
    assert docs[0] == n_total
    assert all(0.0 <= r["en_frac"] <= 1.0 for r in rows)


def test_importance_sample_matches_cpython_reference(spark):
    """The bucketed prefix-sum decomposition must equal a naive CPython
    systematic sampler on synthetic corpora (three-engine discipline),
    including sparse/gappy doc_id spaces and zero-weight docs."""
    import pu4spark_spark.operators.curation as cu

    cases = [
        # (doc_id, text) — weights are token counts
        [(i, " ".join(["w"] * (1 + (i * 7) % 13))) for i in range(0, 300, 3)],
        [(1, "a"), (2, ""), (500, " ".join(["b"] * 400)), (501, "c d e")],
        [(i * 97, " ".join(["t"] * ((i % 5) + 1))) for i in range(120)],
    ]
    orig = cu.load_table
    try:
        for rows in cases:
            df = spark.createDataFrame(rows, ["doc_id", "text"])
            cu.load_table = lambda s, t, d, _df=df: _df
            got = {
                (r["doc_id"], r["n_tokens"], r["sample_slot"])
                for r in cu.q_curation_importance_sample(spark, "x").collect()
            }
            # CPython reference: naive global cumulative walk
            k = cu.SAMPLE_K
            sized = sorted(
                (doc_id, len(text.split(" ")) if text else 1)
                for doc_id, text in rows
            )
            # NB split(" ") on "" yields [""] → weight 1, same as Spark's
            # split/size semantics on empty string
            w_total = sum(w for _, w in sized)
            want, cum = set(), 0
            for doc_id, w in sized:
                before = cum * k // w_total
                cum += w
                after = cum * k // w_total
                if after > before:
                    want.add((doc_id, w, (cum - w) * k // w_total))
            assert got == want, (got - want, want - got)
    finally:
        cu.load_table = orig


def test_vocab_growth_monotone_and_consistent(spark):
    """Cumulative curves are nondecreasing; the final point equals the
    whole-corpus totals (one-pass min-step trick == naive distinct)."""
    import duckdb

    from pu4spark_spark.operators.text import q_text_vocab_growth

    rows = sorted(
        q_text_vocab_growth(spark, SF).collect(), key=lambda r: r["step"]
    )
    toks = [r["cum_tokens"] for r in rows]
    voc = [r["cum_vocab"] for r in rows]
    assert toks == sorted(toks) and voc == sorted(voc)
    con = duckdb.connect()
    n_tok, n_voc = con.execute(
        f"""SELECT COUNT(*), COUNT(DISTINCT tok) FROM (
             SELECT unnest(string_split(text,' ')) AS tok
             FROM '{SF}/documents.parquet')"""
    ).fetchone()
    assert toks[-1] == n_tok and voc[-1] == n_voc
    # Heaps-law shape: vocabulary grows sublinearly vs tokens
    assert voc[-1] < toks[-1]


def test_incremental_release_consistency(spark):
    """The composed daily-ingest pipeline: shard totals only cover
    quality-passing batch docs, and no released doc's content hash
    exists in the corpus."""
    import duckdb

    from pu4spark_spark.operators.dedup import INCR_BATCH_MOD
    from pu4spark_spark.operators.pipeline import (
        q_pipeline_incremental_release,
    )

    rows = q_pipeline_incremental_release(spark, SF).collect()
    assert rows  # non-degenerate on the fixture
    for r in rows:
        assert r["n_docs"] >= 1 and r["shard_tokens"] >= r["n_docs"]
        assert r["first_doc"] % INCR_BATCH_MOD == 0
        assert r["last_doc"] % INCR_BATCH_MOD == 0
    # released docs ⊆ the arriving batch id space
    con = duckdb.connect()
    n_batch = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet' "
        f"WHERE doc_id % {INCR_BATCH_MOD} = 0"
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in rows) <= n_batch


def test_lang_divergence_is_metric_like(spark):
    """TVD ∈ [0,1]; identical distributions give 0 (checked via a
    CPython reference on the fixture)."""
    import duckdb

    from pu4spark_spark.operators.text import q_text_lang_divergence

    rows = q_text_lang_divergence(spark, SF).collect()
    assert len(rows) >= 1
    assert all(0.0 <= r["tvd"] <= 1.0 for r in rows)
    # CPython reference: naive distribution TVD per pair
    con = duckdb.connect()
    counts = con.execute(
        f"""SELECT lang, tok, COUNT(*) FROM (
             SELECT lang, unnest(string_split(text,' ')) AS tok
             FROM '{SF}/documents.parquet') GROUP BY lang, tok"""
    ).fetchall()
    from collections import defaultdict

    dist = defaultdict(dict)
    for lang, tok, n in counts:
        dist[lang][tok] = n
    for r in rows:
        pa, pb = dist[r["la"]], dist[r["lb"]]
        ta, tb = sum(pa.values()), sum(pb.values())
        toks = set(pa) | set(pb)
        want = sum(
            abs(pa.get(k, 0) / ta - pb.get(k, 0) / tb) for k in toks
        ) / 2
        assert abs(r["tvd"] - want) < 1e-9


def test_epoch_shuffle_is_complete_and_reproducible(spark):
    from pu4spark_spark.operators.curation import (
        EPOCH_SHARDS,
        q_curation_epoch_shuffle,
    )

    rows = q_curation_epoch_shuffle(spark, SF).collect()
    assert len(rows) == 500 and len({r["doc_id"] for r in rows}) == 500
    by_shard = {}
    for r in rows:
        assert 0 <= r["shard"] < EPOCH_SHARDS
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # positions are a dense 0..n-1 sequence within every shard
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))
    # deterministic across runs
    again = q_curation_epoch_shuffle(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_mix_planner_properties(spark):
    """keep_rate=1 for the most over-demanded language, all rates in
    (0,1], and applying the rates yields EXACT target proportions."""
    from pu4spark_spark.operators.curation import q_curation_mix_planner

    rows = q_curation_mix_planner(spark, SF).collect()
    rates = {r["lang"]: r for r in rows}
    assert abs(max(r["keep_rate"] for r in rows) - 1.0) < 1e-12
    assert all(0.0 < r["keep_rate"] <= 1.0 for r in rows if r["target_share"] > 0)
    # sampled tokens ∝ target shares: n_tokens·keep_rate / target_share
    # must be a constant across in-target languages
    ratios = [
        r["n_tokens"] * r["keep_rate"] / r["target_share"]
        for r in rows
        if r["target_share"] > 0
    ]
    assert max(ratios) / min(ratios) < 1.0 + 1e-9


def test_observed_metrics_match_recomputation(spark):
    """The Observation counters collected during the pipeline's single
    job must equal independently recomputed aggregates."""
    from pyspark.sql import functions as F

    from pu4spark_spark.operators.pipeline import (
        MIN_QUALITY,
        MIN_TOKENS,
        _quality_score,
        q_pipeline_observed_metrics,
    )
    from pu4spark_spark.functions.textfns import tokens
    from pu4spark_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    row = q_pipeline_observed_metrics(spark, sf).collect()[0]
    docs = load_table(spark, "documents", sf)
    tok = tokens("text")
    scored = docs.select(
        "doc_id",
        "text",
        F.size(tok).alias("n"),
        _quality_score(tok).alias("q"),
    )
    assert row["n_docs_in"] == docs.count()
    kept = scored.filter((F.col("n") >= MIN_TOKENS) & (F.col("q") >= MIN_QUALITY))
    assert row["n_kept"] == kept.count()
    assert row["n_unique"] == kept.select(F.md5("text")).distinct().count()
    assert row["n_low_quality"] == scored.filter(F.col("q") < MIN_QUALITY).count()
    assert row["n_short"] == scored.filter(F.col("n") < MIN_TOKENS).count()
    assert row["n_unique"] <= row["n_kept"] <= row["n_docs_in"]
    assert row["tokens_out"] > 0


def test_observation_does_not_poison_mllib_fits(spark):
    """Regression: the first ``Observation`` in a session instantiates
    the non-serializable ``SparkSession.observationManager`` (null until
    then); MLlib training summaries hold a session reference, so a
    summary-carrying LogisticRegressionModel's transform closure then
    fails task serialization.  The observed-metrics query must confine
    its observations to an isolated session, leaving the shared session
    fit-safe afterwards."""
    from pu4spark_spark.config import (
        LogisticRegressionConfig,
        TraditionalPULearnerConfig,
    )
    from pu4spark_spark.operators.pipeline import q_pipeline_observed_metrics
    from tests.test_pu import separable_cloud

    q_pipeline_observed_metrics(spark, "/root/testdata/sf0.001").collect()
    learner = TraditionalPULearnerConfig(
        maxIters=2, classifierConfig=LogisticRegressionConfig()
    ).build()
    cloud = separable_cloud(spark, n=120)
    out = learner.weight(cloud, "label", "features", "finalLabel")
    assert out.count() == 120


def test_streaming_upsert_frames_survive_reinvocation(spark):
    """ADVICE r6: the CDC drains return lazy frames re-reading their
    state dir at action time — a second invocation in the same process
    must not invalidate the first invocation's returned frame (state
    dirs are versioned per invocation with bounded GC)."""
    from pu4spark_spark.streaming.upsert import q_streaming_upsert_compact

    sf = "/root/testdata/sf0.001"
    first = q_streaming_upsert_compact(spark, sf)
    second = q_streaming_upsert_compact(spark, sf)
    # collect the FIRST frame only after the second invocation ran
    a = sorted(map(tuple, first.collect()))
    b = sorted(map(tuple, second.collect()))
    assert a == b and len(a) > 0


def test_sequence_pack_invariants(spark):
    """Packing conservation: per language, tokens_filled sums to the
    corpus token count; every sequence except the last is exactly full
    (concat-and-split wastes no pad before the tail); n_starts sums to
    the doc count; and docs-per-sequence >= starts."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from pu4spark_spark.operators.curation import (
        SEQ_LEN,
        q_curation_sequence_pack,
    )
    from pu4spark_spark.functions.textfns import tokens

    sf = "/root/testdata/sf0.001"
    rows = q_curation_sequence_pack(spark, sf).collect()
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("lang", F.size(tokens("text")).alias("n"))
        .filter(F.col("n") > 0)
        .groupBy("lang")
        .agg(F.sum("n").alias("tot"), F.count(F.lit(1)).alias("n_docs"))
        .collect()
    )
    want = {r["lang"]: (r["tot"], r["n_docs"]) for r in docs}
    by_lang = defaultdict(list)
    for r in rows:
        assert r["n_docs"] >= r["n_starts"] >= 0
        assert 1 <= r["tokens_filled"] <= SEQ_LEN
        by_lang[r["lang"]].append(r)
    assert set(by_lang) == set(want)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["seq_id"])
        assert [r["seq_id"] for r in rs] == list(range(len(rs)))
        assert sum(r["tokens_filled"] for r in rs) == want[lang][0]
        assert sum(r["n_starts"] for r in rs) == want[lang][1]
        for r in rs[:-1]:
            assert r["tokens_filled"] == SEQ_LEN


def test_pseudonymization_preserves_user_structure(spark):
    """Tokenization contract: the keyed pseudonym is a BIJECTION on the
    observed user ids (no collisions on the fixture), the tokenized
    per-user profile equals the raw per-user profile, and the token
    never leaks the raw id (no token equals its source id's string)."""
    from pyspark.sql import functions as F

    from pu4spark_spark.operators.curation import (
        pseudonym,
        q_curation_pseudonymize_events,
    )

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    mapping = {
        r["user_id"]: r["tok"]
        for r in events.select(
            "user_id", pseudonym("user_id").alias("tok")
        ).distinct().collect()
    }
    assert len(set(mapping.values())) == len(mapping)  # injective
    assert all(str(u) != t for u, t in mapping.items())
    raw = {
        mapping[r["user_id"]]: (r["n"], r["t"], r["p"])
        for r in events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("t"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p"),
        ).collect()
    }
    tok = {
        r["user_token"]: (r["n_events"], r["n_types"], r["n_purchases"])
        for r in q_curation_pseudonymize_events(spark, sf).collect()
    }
    assert tok == raw


def test_user_coherent_sample_keeps_whole_users(spark):
    """Entity coherence: every sampled user's event count equals their
    FULL event count (no user is partially sampled), and the kept-user
    fraction is near the configured rate."""
    from pyspark.sql import functions as F

    from pu4spark_spark.operators.curation import (
        COHERENT_KEEP_PM,
    )

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    keep = (
        F.pmod(
            F.conv(F.substring(F.md5(F.concat_ws(":", F.lit("ucs2"),
                F.col("user_id").cast("string"))), 1, 8), 16, 10)
            .cast("bigint"),
            F.lit(1000),
        )
        < COHERENT_KEEP_PM
    )
    full = {r["user_id"]: r["n"] for r in events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = {r["user_id"]: r["n"] for r in events.filter(keep)
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert kept and all(full[u] == n for u, n in kept.items())
    frac = len(kept) / len(full)
    assert 0.10 <= frac <= 0.35, frac


def test_streaming_quality_router_lossless_and_disjoint(spark):
    """Multi-sink routing contract: kept + quarantined doc_ids
    partition the corpus exactly (no loss, no duplication, no overlap
    across sinks), and quarantine rows carry a valid reason."""
    from pu4spark_spark.streaming.ingest import q_streaming_quality_router

    sf = "/root/testdata/sf0.001"
    rows = q_streaming_quality_router(spark, sf).collect()
    total = sum(r["n_docs"] for r in rows)
    n_corpus = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert total == n_corpus
    for r in rows:
        if r["route"] == "kept":
            assert r["reason"] == "kept"
        else:
            assert r["reason"] in ("too_short", "low_quality")
    # replay idempotence: each micro-batch lands in its own
    # batch_id=N subdirectory written in OVERWRITE mode, so a
    # foreachBatch retry clobbers its own partial output instead of
    # appending duplicates — pin the directory contract
    import hashlib
    import os
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(),
        f"pu4spark_qrouter_{hashlib.md5(os.path.abspath(sf).encode()).hexdigest()[:8]}_{os.getpid()}",
    )
    kept_dir = os.path.join(base, "kept")
    batch_dirs = [
        d for d in os.listdir(kept_dir) if d.startswith("batch_id=")
    ]
    assert batch_dirs, "kept sink must be per-batch partitioned"


def test_pseudonym_null_propagates(spark):
    """A NULL identifier must pseudonymize to NULL (ADVICE r7):
    concat_ws would silently skip the null and emit md5(key ':'),
    colliding with the empty-string id and diverging from the
    oracle's null-propagating '||'."""
    from pyspark.sql import functions as F

    from pu4spark_spark.operators.curation import pseudonym

    df = spark.createDataFrame(
        [(None,), ("",), ("u1",)], "user_id string"
    ).select("user_id", pseudonym("user_id").alias("tok"))
    rows = {r["user_id"]: r["tok"] for r in df.collect()}
    assert rows[None] is None
    assert rows[""] is not None and rows["u1"] is not None
    assert rows[""] != rows["u1"]


def test_k_anonymity_guarantee_and_mass_preservation(spark):
    """EVERY published row — including the '*'/'*' residual — must
    cover >= k customers; mass is preserved up to at most one dropped
    residual of size < k (a residual whose union of suppressed cells
    is still a small crowd must not be published)."""
    from pu4spark_spark.operators.curation import (
        K_ANON_K,
        q_curation_k_anonymity,
    )
    from pu4spark_spark.sources import load_table

    sf = "/root/testdata/sf0.01"
    rows = q_curation_k_anonymity(spark, sf).collect()
    total = load_table(spark, "customer", sf).count()
    published = sum(r["n_customers"] for r in rows)
    # either everything is published, or exactly the < k residual
    # was dropped — never more.
    assert published == total or 0 < total - published < K_ANON_K
    for r in rows:
        # the k guarantee now holds unconditionally, residual included
        assert r["n_customers"] >= K_ANON_K
        # suppression is all-or-nothing on the QI pair
        assert (r["segment"] == "*") == (r["nation"] == "*")


def test_k_anonymity_residual_suppressed_when_small(spark):
    """Directed fixture: one giant QI cell plus a single singleton
    cell.  The singleton's residual covers 1 < k person, so the
    release must contain ONLY the giant cell — publishing the
    residual would disclose the singleton's exact balance."""
    from pu4spark_spark.operators.curation import K_ANON_K

    cust = spark.createDataFrame(
        [("BIG", 1, 100.0 + i) for i in range(K_ANON_K + 5)]
        + [("TINY", 2, 9999.99)],
        "c_mktsegment string, c_nationkey int, c_acctbal double",
    )
    cells = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("bal"),
    )
    ok = F.col("n") >= K_ANON_K
    out = (
        cells.select(
            F.when(ok, F.col("c_mktsegment")).otherwise("*").alias("segment"),
            F.when(ok, F.col("c_nationkey").cast("string"))
            .otherwise("*")
            .alias("nation"),
            "n",
            "bal",
        )
        .groupBy("segment", "nation")
        .agg(
            F.sum("n").alias("n_customers"),
            F.sum("bal").cast("double").alias("sum_acctbal"),
        )
        .where(F.col("n_customers") >= K_ANON_K)
        .collect()
    )
    assert len(out) == 1
    assert out[0]["segment"] == "BIG"
    assert out[0]["n_customers"] == K_ANON_K + 5
