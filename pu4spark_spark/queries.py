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
    # Round-7 rotation (VERDICT r6 #2): r01∪…∪r06 witness 208 of 230.
    # Window = (A) the LAST 6 never-witnessed oracle-backed queries —
    # after this round every oracle-backed query has driver-hash
    # evidence; (B) ALL 10 new r7 oracle-backed queries; (C) ALL 16
    # never-witnessed rows-only entries, so even the ML/sketch paths
    # get driver rows-evidence at least once; (D) re-verification
    # slots: the three queries this round's perf work rewrote (their
    # oracles must be re-witnessed on the NEW plans), then the
    # cheapest already-witnessed queries by sf0.1 bench time.
    # -- A: the witness-program tail ------------------------------------
    "events_type_drift",               # 0.275
    "pipeline_observed_metrics",       # 0.582
    "dedup_bow_cosine",                # 1.262
    "ann_binary_hamming_recall",       # 1.863
    "part_association_rules",          # 1.979
    "dedup_cluster_size_histogram",    # 2.019
    # -- B: new in r7 ---------------------------------------------------
    "pu_bagging_trace",                # OOB protocol, hash-checked
    "ann_ivf_tuning",                  # nprobe tuning table
    "fmt_pyds_snapshot_read",          # manifest time travel
    "fmt_pyds_snapshot_diff",          # CDC between snapshots
    "fmt_pyds_compaction",             # rewrite commit + vacuum contract
    "ann_rerank_topk",                 # retrieve→rerank
    "dedup_cluster_quality",           # what-did-dedup-keep report
    "dedup_clusters_incremental",      # cluster maintenance == full CC
    "pipeline_drop_reasons",           # record-level provenance
    "curation_sequence_pack",          # sample-packing audit
    "pu_doc_quality_soft_lr",          # weightCol soft-dedup training
    "ann_pq_adc_recall",               # PQ+ADC compression eval
    "sql_asof_click_purchase",         # SQL-dialect as-of twin
    "mm_payload_byte_stats",           # payload integrity audit
    "ann_ivf_partitioned_probe",       # cell-partitioned IVF layout
    "pu_spy_trace",                    # spy quantile calibration
    "pu_elkan_trace",                  # e1 calibration
    "curation_pseudonymize_events",    # keyed tokenization
    "curation_user_coherent_sample",   # entity-coherent downsample
    "streaming_quality_router",        # multi-sink foreachBatch fan-out
    "orders_pivot_status",             # long→wide pivot, values pinned
    "dedup_span_removal",              # exact-substring removal pass
    "curation_token_offsets",          # distributed prefix-sum index
    "events_dense_hourly",             # generated-grid zero fill
    "part_fuzzy_matches",              # blocked levenshtein linkage
    "curation_eval_holdout",           # fixed k-per-stratum hash sample
    # -- E: late-r7 additions past the 50-slot window; r8 rotation picks
    # them up (rotation.py ranks never-witnessed first)
    "dedup_prefix_filter_join",        # exact AllPairs/PPJoin
    "events_time_weighted_value",      # TWAP metering aggregate
    "events_purge_maintenance",        # retraction-record view refresh
    "events_top_paths",                # ordered trigram path analysis
    "fmt_pyds_stats_pruning",          # zonemap shard skipping
    # -- C: rows-only, never driver-witnessed ---------------------------
    "pu_spy_em_lr",                    # 1.385
    "pu_elkan_noto_lr",                # 0.688
    "pu_bagging_lr",                   # 2.266
    "pu_class_prior",                  # 0.689
    "pu_f1_proxy",                     # 0.742
    "pu_auc_zero_step",                # 0.701
    "dedup_pagerank",                  # 4.939
    "ann_ivf_recall",                  # 2.027
    # (dedup_minhash_ml_slice / ann_ivf: explicitly-labeled MLlib parity
    # demos — ceded their slots to the r7 late-wave oracle queries)
    "embedding_pca_project",           # 1.722
    "text_bpe_learn_merges",           # 1.765
    "text_bpe_encode",                 # 2.134
    "mm_cdc_chunks",                   # 0.502
    "mm_cdc_dup_chunks",               # 0.637
    "fmt_file_metadata_audit",         # 1.964
    # -- D: re-verification (rewritten this round first) ---------------
    "sql_docs_clean",                  # CACHE TABLE staging (r7)
    "corpus_lang_similarity",          # 36→9-shuffle restack (r7)
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
    "dedup_pagerank", "dedup_minhash_ml_slice", "ann_ivf",
    "ann_ivf_recall", "embedding_pca_project", "text_bpe_learn_merges",
    "text_bpe_encode", "mm_cdc_chunks", "mm_cdc_dup_chunks",
    "fmt_file_metadata_audit", "pu_doc_quality_soft_lr",
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
