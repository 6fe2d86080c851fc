"""Central registry of driver-checkable queries.

Each operator module exposes ``QUERIES`` (name → (spark, sf_dir) →
DataFrame) and ``ORACLE_SQL`` (name → DuckDB SQL); this module merges
them.  Names present in ``QUERIES`` but not ``ORACLE_SQL`` get the
driver's weaker rows-only check (non-SQL-expressible ML/streaming ops).
"""

from __future__ import annotations

from pu4spark_spark.operators import pu_queries

_MODULES = [pu_queries]

from pu4spark_spark.operators import (  # noqa: E402
    asof,
    curation,
    dedup,
    multimodal,
    pipeline,
    relational,
    similarity,
    text,
    tpch_extra,
)
from pu4spark_spark.sources import formats as fmt_sources  # noqa: E402
from pu4spark_spark.sources import pydatasource as pyds_sources  # noqa: E402
from pu4spark_spark.streaming import events as streaming_events  # noqa: E402
from pu4spark_spark.streaming import ingest as streaming_ingest  # noqa: E402
from pu4spark_spark.streaming import sketch as streaming_sketch  # noqa: E402
from pu4spark_spark.streaming import stateful as streaming_stateful  # noqa: E402
from pu4spark_spark.streaming import upsert as streaming_upsert  # noqa: E402

_MODULES += [
    relational,
    tpch_extra,
    asof,
    curation,
    dedup,
    similarity,
    text,
    multimodal,
    pipeline,
    fmt_sources,
    pyds_sources,
    streaming_events,
    streaming_ingest,
    streaming_sketch,
    streaming_stateful,
    streaming_upsert,
]

QUERIES = {}
ORACLE_SQL = {}
for _m in _MODULES:
    for _k in _m.QUERIES:
        if _k in QUERIES:
            raise ValueError(f"duplicate query name {_k!r}")
    QUERIES.update(_m.QUERIES)
    ORACLE_SQL.update(getattr(_m, "ORACLE_SQL", {}))

missing = set(ORACLE_SQL) - set(QUERIES)
if missing:
    raise ValueError(f"oracle_sql without queries: {missing}")

#: Driver-evidence ordering.  The round-2 and round-3 driver correctness
#: artifacts each stopped at exactly the first 50 registry entries, so
#: registry order decides which queries get driver-recorded evidence —
#: the per-round window is a ROTATION slot, and the committed
#: ``CORRECTNESS_r0N.json`` artifacts accumulate across rounds.
#: History: r5 and r6 windows rotated never-witnessed oracle-backed
#: queries until r01∪…∪r06 witnessed 208 of 230; the r7 window below
#: finishes the program (every oracle-backed query driver-witnessed at
#: least once) and starts giving the rows-only entries driver
#: rows-evidence too.  Queries outside every window are covered by the
#: committed full-registry self-check (``tools/check_oracle.py`` →
#: ``CORRECTNESS_FULL_r0N``).
DRIVER_FIRST = [
    # Round-9 rotation.  Window = (A) ALL 13 new r9 queries; (B) queries
    # whose correctness CONTRACT changed this round (k-anonymity
    # residual suppression; fmt_file_metadata_audit gained an oracle —
    # its FIRST driver hash); (C) re-verification of every query whose
    # code path changed (pydatasource writer/commit overhaul, UDTF
    # escape, interpolate broadcast side, corpus_lang_similarity final
    # join, rerank refactor); (D) cheapest already-witnessed fillers.
    # -- A: new in r9 ----------------------------------------------------
    "fmt_pyds_commit_conflict",        # OCC: stale claim loses loudly
    "fmt_pyds_commit_retry",           # OCC: loser refreshes + lands v3
    "streaming_pyds_snapshot",         # version-offset stream-from-table
    "streaming_pyds_compaction_skip",  # rewrite commits skipped by stream
    "skew_join_aqe_revenue",           # AQE skew split witnessed live
    "events_aqe_coalesce_hourly",      # AQE partition coalesce witnessed
    "audit_quality_constraints",       # one-pass Deequ-style suite
    "streaming_user_totals_rocksdb",   # RocksDB state-store witness
    "orders_cbo_join_reorder",         # CBO join rotation witnessed
    "pu_sar_trace",                    # 6th learner's protocol, hashed
    "pu_sar_lr",                       # SAR-PU ML twin (rows evidence)
    "ann_ranking_eval",                # nDCG@k + MRR + AP@k, hash-checked
    "dedup_clusters_star",             # large/small-star CC ≡ min-label
    # -- B: contract changed this round -----------------------------------
    "curation_k_anonymity",            # residual-cell suppression
    "fmt_file_metadata_audit",         # FIRST oracle-backed witness
    # -- C: re-verification of r9-touched code paths ----------------------
    "fmt_pyds_jsonl_roundtrip",        # reader over token-named shards
    "fmt_pyds_jsonl_write_roundtrip",  # writer commit protocol
    "fmt_pyds_snapshot_read",          # versioned claims unchanged
    "fmt_pyds_snapshot_diff",          # versioned claims unchanged
    "fmt_pyds_compaction",             # rewrite commit over new claims
    "fmt_pyds_stats_pruning",          # _STATS beside exclusive claims
    "streaming_pyds_docs",             # listing-offset stream twin
    "fmt_text_parse_udtf",             # separator-escape round-trip
    "events_interpolate_gaps",         # broadcast side corrected
    "corpus_lang_similarity",          # final join now broadcast
    "ann_rerank_topk",                 # _retrieve_candidates refactor
    "ann_cosine_topk",                 # feeds the eval's ground truth
    "dedup_clusters",                  # star twin's reference member
    "salted_segment_revenue",          # manual twin of the AQE witness
    "dedup_pagerank_int",              # sole PageRank member post-retire
    "dedup_minhash_lsh",               # pair graph under both CC twins
    # -- D: cheapest witnessed fillers (sf0.1 bench sec ascending) --------
    "dedup_exact_docs",                # 0.157
    "embedding_quantize_int8",         # 0.178
    "curation_shard_pack",             # 0.200
    "embedding_label_centroids",       # 0.229
    "customers_without_orders",        # 0.253
    "text_corpus_stats",               # 0.253
    "range_click_purchases",           # 0.44
    "text_heavy_hitters",              # 0.41
    "monthly_revenue",                 # 0.52
    "text_commonness",                 # 0.57
    "dedup_embedding_cosine",          # 0.67
    "q14_promo_revenue",               # 0.71
    "top_customers_per_nation",        # 0.77
    "customers_with_urgent_orders",    # 0.77
    "asof_next_purchase",              # 0.80
    "events_hourly",                   # 0.81
    "grouping_sets_orders",            # 0.93
    "ann_lsh_bucketed",                # 0.94
    "orders_zorder_layout",            # 1.04
]


_first = [n for n in DRIVER_FIRST if n in QUERIES]
_missing_first = set(DRIVER_FIRST) - set(QUERIES)
if _missing_first:
    raise ValueError(f"DRIVER_FIRST names not registered: {_missing_first}")
# rows-only entries ARE allowed in the curated prefix as of r7 — the
# driver records a weaker rows>0 check for them, which is still the
# only driver-side evidence the ML/sketch paths can ever get.  The
# gate below only guards against ACCIDENTAL oracle omissions: adding a
# rows-only name to the window must be an explicit decision here.
_ROWS_ONLY_WINDOWED = {
    "pu_spy_em_lr", "pu_elkan_noto_lr", "pu_bagging_lr", "pu_sar_lr",
    "pu_class_prior", "pu_f1_proxy", "pu_auc_zero_step",
    "dedup_minhash_ml_slice", "ann_ivf",
    "ann_ivf_recall", "embedding_pca_project", "text_bpe_learn_merges",
    "text_bpe_encode", "mm_cdc_chunks", "mm_cdc_dup_chunks",
    "pu_doc_quality_soft_lr",
    "dedup_kcore", "events_hll_sketch_merge",
}
_no_oracle_first = [
    n
    for n in _first
    if n not in ORACLE_SQL and n not in _ROWS_ONLY_WINDOWED
]
if _no_oracle_first:
    raise ValueError(f"DRIVER_FIRST lacks oracle: {_no_oracle_first}")
# After the curated prefix: every remaining ORACLE-checked query (registry
# order), then the rows-only ML/sketch entries — so WHEREVER a
# time-budgeted driver run truncates, the artifact records the maximum
# number of hash-checkable results.
_rest_oracle = [
    n for n in QUERIES if n not in set(_first) and n in ORACLE_SQL
]
_rest_rows_only = [
    n for n in QUERIES if n not in set(_first) and n not in ORACLE_SQL
]
def _with_release(fn):
    """Wrap a registry callable so the PREVIOUS query's cached() frames
    are unpersisted when this one starts — per-query cache hygiene for
    any harness (driver, bench, self-check) that walks the registry.
    By entry time the previous result has been consumed, so releasing
    is always safe (a released frame re-derives on demand)."""
    import functools

    @functools.wraps(fn)
    def run(spark, sf_dir):
        from pu4spark_spark.plans import release_cached

        release_cached()
        return fn(spark, sf_dir)

    return run


QUERIES = {
    n: _with_release(QUERIES[n])
    for n in (*_first, *_rest_oracle, *_rest_rows_only)
}
