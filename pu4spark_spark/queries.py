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
    # Round-8 rotation: the witness program completed in r7 (every
    # oracle-backed query has driver-hash evidence; only 3 rows-only
    # entries — two of them labeled parity demos — were never
    # windowed).  Window = (A) ALL 20 new r8 queries (three waves);
    # (B) the 3 never-witnessed rows-only entries, closing the program
    # completely; (C) re-verification of every query whose code path
    # changed this round (ADVICE hardening + the prefix-join plan
    # fix); (D) cheapest already-witnessed fillers by sf0.1 bench sec.
    # -- A: new in r8 ----------------------------------------------------
    "sql_recursive_dup_hops",          # WITH RECURSIVE BFS (Spark 4.1)
    "sql_scalar_udf_quality",          # CREATE FUNCTION ... RETURN
    "events_ewma_value",               # ordered-fold sequential state
    "events_interpolate_gaps",         # linear gap fill on the grid
    "events_anomaly_mad",              # robust median/MAD fences
    "curation_weighted_sample",        # DLT priority sampling
    "ann_knn_graph_mutual",            # mutual kNN graph (LSH-bucketed)
    "dedup_kcore",                     # rows-only: iterative peeling
    "fmt_xml_roundtrip",               # Spark 4 native XML source/sink
    "events_session_window_fn",        # native session_window vs islands
    "sql_pipe_orders",                 # SQL |> pipe-syntax front-end
    "curation_k_anonymity",            # QI suppression release
    "events_hll_sketch_merge",         # rows-only: DataSketches merge
    "streaming_restart_resume",        # checkpoint recovery, hash-checked
    "text_topk_sketch_merge",          # approx_top_k accumulate/combine
    "fmt_text_parse_udtf",             # polymorphic analyze() UDTF
    "streaming_observed_metrics",      # observe() riding the stream
    "embedding_kmeans_exact",          # engine-exact Lloyd clustering
    "orders_aggregate_suite",          # count_if/bool/bit/arg-minmax
    "part_string_functions",           # pad/translate/slice breadth
    "orders_null_semantics",           # null grouping + eqNullSafe join
    "orders_datetime_functions",       # trunc/add_months/dow breadth
    "events_range_frame_stats",        # RANGE-interval window frames
    "ann_ivf_exact_topk",              # IVF with every stage hash-checked
    "curation_semantic_decontaminate", # embedding-space decon member
    "dedup_pagerank_int",              # fixed-point PageRank, hash-checked
    # -- B: last never-witnessed rows-only entries ------------------------
    "fmt_file_metadata_audit",         # 1.964
    "dedup_minhash_ml_slice",          # MLlib parity demo
    "ann_ivf",                         # MLlib parity demo
    # -- C: re-verification of r8-touched code paths ----------------------
    "dedup_prefix_filter_join",        # filter-below-repartition fix
    "curation_pseudonymize_events",    # NULL-propagating pseudonym
    "streaming_quality_router",        # per-batch idempotent sinks
    "fmt_pyds_compaction",             # staged two-step shard moves
    "fmt_pyds_snapshot_read",          # atomic metadata commits
    "fmt_pyds_snapshot_diff",          # atomic metadata commits
    "fmt_pyds_stats_pruning",          # atomic _STATS commit
    "fmt_pyds_jsonl_roundtrip",        # reader over new writer layout
    "fmt_pyds_jsonl_write_roundtrip",  # writer commit protocol
    "dedup_minhash_lsh",               # shared shingle helper touched
    "dedup_clusters",                  # downstream of the pair graph
    "dedup_incremental",               # downstream of the pair graph
    "dedup_ngram_jaccard",             # downstream of the pair graph
    "dedup_bow_cosine",                # downstream of the pair graph
    "dedup_cluster_quality",           # downstream of canonical docs
    # -- D: cheapest witnessed fillers (sf0.1 bench sec ascending) --------
    "dedup_exact_docs",                # 0.157
    "embedding_quantize_int8",         # 0.178
    "curation_shard_pack",             # 0.200
    "embedding_label_centroids",       # 0.229
    "customers_without_orders",        # 0.253
    "text_corpus_stats",               # 0.253
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
    "pu_spy_em_lr", "pu_elkan_noto_lr", "pu_bagging_lr",
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
QUERIES = {
    n: QUERIES[n] for n in (*_first, *_rest_oracle, *_rest_rows_only)
}
