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
    # Round-10 rotation.  Window = (A) the 2 new r10 queries (row-level
    # DELETE/MERGE on the mini-lake; AQE runtime join-strategy
    # demotion); (B) re-verification of every query whose code path
    # changed this round (pydatasource reader/stream tombstone +
    # latest-resolution overhaul; the persist→cached janitor rewiring
    # of the three planner witnesses; prefix-filter core extraction;
    # events_dense_hourly broadcast-hint side); (C) cheapest
    # already-witnessed fillers.
    # -- A: new in r10 -----------------------------------------------------
    "fmt_pyds_delete_merge",           # tombstone DELETE + atomic MERGE
    "streaming_pyds_delete_feed",      # stream × DELETE/MERGE contract
    "orders_aqe_join_demotion",        # AQE SMJ→broadcast at runtime
    "lineitem_bloom_filter_join",      # runtime Bloom row filter
    "fmt_pyds_compaction_cluster",     # OPTIMIZE-with-clustering rewrite
    "streaming_pyds_lake_sink",        # stream WRITER into the lake
    "fmt_pyds_time_travel_ts",         # TIMESTAMP AS OF resolution
    # -- B: re-verification of r10-touched code paths ----------------------
    "fmt_pyds_jsonl_roundtrip",        # reader resolves highest snapshot
    "fmt_pyds_jsonl_write_roundtrip",  # writer live-flip latest guard
    "fmt_pyds_snapshot_read",          # pinned reads under new resolve
    "fmt_pyds_snapshot_diff",          # two pinned reads + full-outer
    "fmt_pyds_compaction",             # rewrite commit now claim-based
    "fmt_pyds_stats_pruning",          # pruning atop tombstone-aware read
    "fmt_pyds_commit_conflict",        # sentinel-matched conflict detect
    "fmt_pyds_commit_retry",           # retry loop over tightened match
    "streaming_pyds_docs",             # listing-offset stream twin
    "streaming_pyds_snapshot",         # version stream, ledger-aware walk
    "streaming_pyds_compaction_skip",  # rewrite skip + tombstone union
    "skew_join_aqe_revenue",           # persist → cached janitor
    "events_aqe_coalesce_hourly",      # persist → cached janitor
    "orders_cbo_join_reorder",         # persist → cached janitor
    "ann_ranking_eval",                # cached frame now released
    "events_dense_hourly",             # broadcast hint on build side
    "dedup_prefix_filter_join",        # core extracted for prop tests
    "dedup_minhash_lsh",               # band core under new prop tests
    "dedup_minhash_capped",            # capped recall accounting tested
    "dedup_clusters_incremental",      # artifact pre-built by bench now
    "dedup_band_artifact_probe",       # artifact pre-built by bench now
    "ann_ivf_partitioned_probe",       # artifact pre-built by bench now
    "pu_sar_trace",                    # fallback-visibility doc change
    # -- C: cheapest witnessed fillers (sf0.1 bench sec ascending) ---------
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
    "salted_segment_revenue",          # manual twin of the AQE witness
    "audit_quality_constraints",       # one-pass Deequ-style suite
    "streaming_user_totals_rocksdb",   # RocksDB state-store witness
    "curation_k_anonymity",            # residual-cell suppression
    "fmt_file_metadata_audit",         # O(files) binaryFile audit
    "dedup_clusters_star",             # large/small-star CC ≡ min-label
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
