"""Regenerate PLANS.md: trimmed formatted physical plans for the
flagship queries with the scale-relevant facts called out.

Usage: python tools/plan_audit.py   (writes /root/repo/PLANS.md)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pu4spark_spark.plans import explain_str  # noqa: E402
from pu4spark_spark.queries import QUERIES  # noqa: E402
from pu4spark_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"  # plan shape is sf-independent

#: query → what the plan must show (the audit claim)
AUDITED = {
    "text_intradoc_dup_ngrams": (
        "The Gopher duplicated-n-gram rule as a pure scan-stage "
        "projection: shingle arrays staged as named projections "
        "(each HOF evaluates once per row), distinct counts and "
        "fractions are per-row array math — ZERO exchanges; the rule "
        "rides any corpus pass for free."
    ),
    "events_type_drift": (
        "Early/late split at the integer-microsecond range midpoint: "
        "one 1-row scalar broadcast (BNLJ-cross scalar pattern), one "
        "map-side-combined groupBy over the <=|types| key space, "
        "share/TVD windows over that tiny table only."
    ),
    "dedup_bow_cosine": (
        "Sparse term-frequency cosine through the postings: the "
        "band-key candidate self-join plus tf joins on doc/token "
        "keys; the inner join IS the sparsity (absent tokens never "
        "materialize); int64 dots and norms, fixed IEEE cosine."
    ),
    "lineitem_winsorized_mean": (
        "P5/P95 boundaries from the per-group 64-bin histogram sketch "
        "(fixed 64-counter aggregation state, map-side combined) — no "
        "exact percentile aggregate anywhere in the plan; the clamp "
        "pass is one map-side-combined aggregation over the broadcast "
        "3-row boundary table."
    ),
    "curation_token_budget_threshold": (
        "Budgeted selection WITHOUT a global quality sort: token-"
        "weighted 64-bin histogram (fixed sketch state, map-side "
        "combined), DESC cumulation + interpolation over the 64-row "
        "table, then one broadcast of the 1-row threshold back over "
        "the scan for the exact selection pass."
    ),
    "text_quality_quantile_normalize": (
        "Per-language quantile assignment is scan-stage only: the "
        "langs×64-row cumulative sketch joins back BROADCAST — no "
        "data-sized shuffle in the normalize step."
    ),
    "events_user_gaps_pandas": (
        "Hot-key-bounded UDAF: gaps and median-candidate ranks via "
        "native Window (external-sort, spillable); only the <=2 "
        "middle-ranked rows per user reach FlatMapGroupsInPandas — "
        "per-group Arrow state is constant regardless of user size."
    ),
    "q1_pricing_summary": (
        "Filter pushed into the parquet scan (PushedFilters on "
        "l_shipdate); ReadSchema pruned to the 7 touched columns; one "
        "exchange with map-side partial aggregation."
    ),
    "q5_region_supplier_revenue": (
        "All three dimension joins are BroadcastHashJoin — the lineitem "
        "scan never shuffles for a dimension."
    ),
    "dedup_exact_docs": (
        "Exactly one exchange (hash partition on the content hash) with "
        "partial_min/partial_count before it — the minimal dedup plan."
    ),
    "dedup_simhash": (
        "64-bit fingerprints in whole-stage codegen: explode + ONE "
        "map-side-combined HashAggregate (64 bit-sums) — the exchange "
        "carries one pre-reduced counter row per doc, and no "
        "interpreted higher-order function appears anywhere."
    ),
    "dedup_band_artifact_probe": (
        "Probe of the bucketed band artifact: SortMergeJoin whose "
        "corpus side reads Bucketed: true with ZERO exchange — only "
        "batch-sized shuffles (spread, signature groupBy, band join, "
        "distinct)."
    ),
    "dedup_minhash_lsh": (
        "Cached shingle base feeds band explode and both verify joins; "
        "the only data-size shuffles are the band-key self-join and the "
        "candidate joins — no all-pairs operator anywhere."
    ),
    "ann_cosine_topk": (
        "Query set broadcast (BroadcastNestedLoopJoin over a tiny "
        "broadcast side = linear scan); two window nodes: local top-k "
        "per (query, input partition), then global top-k over k*P "
        "survivors — no single-task full sort."
    ),
    "range_click_purchases": (
        "The lookback inequality join runs as a hash/merge equi-join on "
        "(user_id, band) — no BroadcastNestedLoopJoin, no "
        "CartesianProduct."
    ),
    "asof_click_purchase": (
        "Union of tagged sides into ONE window per user (running "
        "last(ignoreNulls)) — a single shuffle on the key, no range "
        "join blowup."
    ),
    "pipeline_docs_clean": (
        "Quality filter evaluated at the scan side of the dedup window; "
        "text pruned out after shingling; only the algorithm-required "
        "shuffles (content-hash window, band-key join) remain."
    ),
    "curation_pii_redact": (
        "Pure regex scan stage: one whole-stage-codegen Project over the "
        "parquet scan — zero exchanges."
    ),
    "curation_decontaminate": (
        "Both contamination joins are BroadcastHashJoin (the benchmark "
        "shingle set is fixed-size, never corpus-proportional); the only "
        "data-size shuffles are the two map-side-combined groupBys."
    ),
    "curation_domain_mix": (
        "Stateless hash-coin sampling evaluated in the scan-side "
        "Project; one map-side-combined exchange for the per-language "
        "report."
    ),
    "curation_shard_pack": (
        "ONE exchange total: the shard groupBy(lang, shard_id) reuses "
        "the running-sum window's hash partitioning on lang — "
        "back-to-back HashAggregates with no second exchange, and no "
        "global sort anywhere."
    ),
    "events_sessionized": (
        "Gap-and-island sessionization: both windows and the final "
        "groupBy hash-partition on user_id and the groupBy reuses the "
        "windows' partitioning — ONE exchange total."
    ),
    "orders_upsert_compact": (
        "CDC compaction: union is shuffle-free, the keep-max-version "
        "window is the single key shuffle, and the status rollup "
        "aggregates its output — no join anywhere."
    ),
    "dedup_incremental": (
        "Batch-sized work only: the exact stage is a hash left-anti "
        "probe of the batch against corpus content hashes; the near-dup "
        "stage equi-joins batch bands to corpus bands — no operator "
        "rescans or reshuffles the corpus more than once, no all-pairs "
        "node."
    ),
    "pipeline_corpus_release": (
        "Whole curation chain in one plan: benchmark probe joins are "
        "broadcast, the dedup window hash-partitions on content md5, "
        "and the shard groupBy reuses the lang window's partitioning — "
        "four data-size exchanges, no all-pairs operator."
    ),
    "curation_repetition": (
        "Two exchanges on high-cardinality keys ((doc_id, gram), then "
        "doc_id), each preceded by partial aggregation — no skew pivot."
    ),
    "curation_hash_split": (
        "Deterministic train/val/test assignment is pure scan-stage "
        "math: ZERO exchanges anywhere in the plan."
    ),
    "curation_chunk_windows": (
        "Chunking explodes where the tokens live (Generate in-place): "
        "zero exchanges; chunk md5s are computed in the scan stage."
    ),
    "dedup_chunk_spans": (
        "Span dedup on top of exchange-free chunking: two exchanges "
        "((chunk_md5, doc_id) distinct, then chunk_md5 rollup), both "
        "pre-reduced map-side — fingerprint rows only, never tokens."
    ),
    "events_funnel": (
        "Both qualifying-prior-stage columns are running-min frames "
        "over the SAME (user_id, ts) sort: ONE exchange + ONE sort "
        "feed two Window operators; no per-stage self-joins."
    ),
    "events_retention": (
        "Cohort day via UNORDERED window min over user_id (one "
        "exchange, no sort, no join back onto the fact), then a "
        "map-side-combined (cohort, offset) distinct-count rollup."
    ),
    "customer_spend_quartiles": (
        "Global quartiles without a global sort: percentile boundaries "
        "reduce to ONE broadcast row; bucket assignment is scan-stage "
        "comparison — no ntile window, no single-task sort."
    ),
    "text_inverted_index": (
        "Salted two-phase capped collect: first exchange on (token, "
        "partition-salt), second on token — per-group state bounded by "
        "cap x partitions even for stopword-frequency tokens."
    ),
    "text_zscore_by_lang": (
        "Exact decimal moments in one map-side-combined agg over the "
        "bounded lang key; the moment row joins back as a broadcast; "
        "z is scan-stage IEEE math replicated verbatim in the oracle."
    ),
    "q4_order_priority": (
        "EXISTS planned as a left-semi join; the quarter filter is "
        "pushed into the orders scan."
    ),
    "events_sliding_windows": (
        "Overlapping-window assignment is the Expand operator in the "
        "scan stage (4 rows per event); ONE map-side-combined exchange."
    ),
    "events_locf_value": (
        "Carry-forward is a last(ignoreNulls) running frame: one "
        "exchange + one sort, never a self-join."
    ),
    "customer_rfm_segments": (
        "Three quartile boundaries reduce to ONE broadcast row; bucket "
        "assignment is scan-stage comparison — no ntile, no "
        "single-task sort; the cell rollup sums exact decimals."
    ),
    "text_search_tfdf": (
        "df is a 1-row broadcast; scoring is a fixed-order double "
        "chain in the scan stage; ranking is the two-phase top-k."
    ),
    "q6_forecast_revenue": (
        "Scan → filter → 1-row aggregate: shipdate/quantity predicates "
        "pushed into the parquet scan, ONE exchange total (the "
        "SinglePartition gather) — the canonical pushdown probe."
    ),
    "q2_min_supplier": (
        "The correlated min-acctbal subquery is ONE partitioned window "
        "over the candidate set; lineitem is scanned exactly once (the "
        "distinct part-supplier link)."
    ),
    "q15_top_supplier": (
        "The scalar MAX joins back as a 1-row broadcast; Catalyst even "
        "recovers the equality as a BroadcastHashJoin key — no sort, "
        "no self-join on the aggregate."
    ),
    "q19_disjunctive": (
        "The OR-of-ANDs predicate leaves the part join an equi-join "
        "(l_partkey factored out, disjunction as residual filter) — "
        "no CartesianProduct, no BroadcastNestedLoopJoin."
    ),
    "q22_dormant_customers": (
        "Scalar avg enters as a 1-row broadcast; the recent-order "
        "exclusion is a genuine anti-join; the nation rollup sums "
        "exact decimals."
    ),
    "curation_bloom_decontaminate": (
        "The bloom build is ONE bit_or aggregation whose output is "
        "fixed-size (8192 words) regardless of benchmark cardinality; "
        "the probe joins the word table as a BroadcastHashJoin — no "
        "corpus-proportional broadcast anywhere."
    ),
    "embedding_gram_matrix": (
        "Both posexplodes pipeline inside the scan stage (Generate "
        "in-place, never materialized); ONE map-side-combined "
        "groupBy(i,j) whose exchange carries O(d^2) rows per map "
        "partition — corpus-size-independent aggregation state."
    ),
    "events_value_trend": (
        "Grouped OLS from five sufficient statistics in ONE map-side-"
        "combined aggregation on the bounded event_type key; slope is "
        "scan-stage arithmetic over the agg output — no fit loop, no "
        "second pass."
    ),
    "events_time_rollup": (
        "ROLLUP(day, hour) expands grouping sets inside the agg stage "
        "(Expand operator): ONE pushed-filter scan and ONE map-side-"
        "combined exchange serve every granularity."
    ),
    "eval_quality_auc": (
        "Rank-sum AUC with NO global row sort: map-side-combined bin "
        "groupBy reduces the corpus to <=1001 rows; only that "
        "fixed-size table passes the SinglePartition window; scan "
        "pruned to (text, lang)."
    ),
    "dedup_containment": (
        "Same LSH band-key self-join as the Jaccard verify (one "
        "band-key shuffle, O(candidates) verify); both containment "
        "directions come from ONE array_intersect per candidate pair."
    ),
    "sessions_busy_overlap": (
        "Interval×interval join stays a hash equi-join on the band key "
        "(no BroadcastNestedLoopJoin over the inequality); the later-"
        "start band guard dedups without a distinct; the only BNLJ is "
        "the 1-row busy-threshold scalar append."
    ),
    "text_cms_frequency": (
        "Sketch build: token counts map-side-combined, then a groupBy "
        "whose exchange AND output are O(d*w)=2048 rows; probe joins "
        "the fixed-size sketch via BroadcastHashJoin; top-K probes via "
        "two-phase rank, no global sort."
    ),
    "dedup_triangles": (
        "Degree-ordered orientation: wedge join fans out only over "
        "out-degrees (arboricity-bounded); equi-joins on node ids plus "
        "a left-semi close — no all-pairs product anywhere."
    ),
    "mm_ahash_near_dup": (
        "aHash fingerprints: explode chars in codegen, ONE map-side-"
        "combined groupBy carrying a 64-counter row per doc; pigeonhole "
        "band equi-join + bit_count verify — no quadratic compare."
    ),
    "audit_table_diff": (
        "Phase 1 reduces both tables to DIFF_BUCKETS (count, checksum) "
        "rows via map-side-combined aggregation (order-independent sum "
        "of row hashes — no sort); only out-of-sync buckets imply "
        "phase-2 row work."
    ),
    "audit_referential_integrity": (
        "Every parent is dimension-sized: each orphan anti-join is a "
        "BroadcastHashJoin over the child's DISTINCT keys; seven 1-row "
        "aggregates union into one plan."
    ),
    "lineitem_histogram_quantiles": (
        "One scan -> 1-row (min,max,n) broadcast; bin assignment in "
        "the scan stage; groupBy over <=64 bin keys; cumulative window "
        "and probe join touch only the 64-row sketch."
    ),
    "eval_quality_calibration": (
        "Corpus reduces to <=10 (bin, n, n_pos) rows before the "
        "exchange; per-bin division is the only IEEE op — no double "
        "summation, bit-portable."
    ),
    "fmt_schema_evolution_scan": (
        "mergeSchema is a footer-level union: pre-evolution shards "
        "NULL-extend the new column at planning time; per-shard "
        "pushdown/pruning unaffected."
    ),
    "fmt_dpp_fact_scan": (
        "Runtime partition pruning: the dim filter's build side feeds "
        "dynamicpruning# into the fact scan's PartitionFilters — only "
        "matching l_suppkey directories are listed or read."
    ),
    "dedup_minhash_capped": (
        "Hot-bucket skew control: the bucket-size window partitions on "
        "the SAME (band_pos, band_hash) key the candidate self-join "
        "hashes on, so count, filter, and join share one band-key "
        "exchange; per-bucket pair work is bounded by cap² regardless "
        "of corpus size."
    ),
    "curation_importance_sample": (
        "Global prefix sum without a global sort: per-bucket running "
        "sums partition on the range bucket; the cumulative-offset "
        "window runs over the bucket table only (corpus/span rows); "
        "the pick predicate is scan-stage integer math."
    ),
    "lineitem_orders_bucketed_join": (
        "Both fact scans report Bucketed: true and SelectedBucketsCount "
        "16/16; NO exchange below the SortMergeJoin — the bucket layout "
        "is the join distribution.  Only the output-sized priority "
        "rollup exchanges."
    ),
    "events_rollup_maintenance": (
        "Materialized-view merge: the history side is the precomputed "
        "partial-aggregate table scan (no re-aggregation of raw "
        "history); the arriving slice aggregates map-side; one "
        "union + merge agg on the (hour, event_type) key."
    ),
    "eval_quality_threshold_sweep": (
        "Corpus reduces to ≤10 decile rows in one map-side-combined "
        "aggregation; the single-partition cumulative window runs over "
        "that fixed-size table only — by design, never over data."
    ),
    "text_langid_confusion": (
        "One map-side-combined groupBy over the bounded lang×lang key "
        "space; the recall-share window sees ≤ L² rows."
    ),
    "embedding_norm_outliers": (
        "Exact decimal moments in one bounded-key aggregation; the "
        "per-label stats join back as an AQE broadcast; z and the "
        "outlier flag are scan-stage math."
    ),
    "curation_fuzzy_decontaminate": (
        "Benchmark side (fixed-size by construction) broadcast for both "
        "the band-candidate join and the verify join; train side pays "
        "one band shuffle + candidate-only verification — O(candidates)."
    ),
    "dedup_semantic_keep": (
        "Pair graph stays LSH-candidate-bounded; the domination reduce "
        "is one map-side-combined groupBy(b_id); the verdict left join "
        "builds on the dropped set with no forced broadcast."
    ),
    "events_watermark_lateness": (
        "Global running prefix max WITHOUT a global sort: per-arrival-"
        "bucket max, cumulative offsets over the bucket table only, "
        "in-bucket window partitioned by bucket; greatest() stitches "
        "the boundary."
    ),
    "text_lang_divergence": (
        "No full-outer join over the union vocabulary: closed-form "
        "folding of one-language tokens means only the shared-token "
        "inner join runs; DECIMAL sum keeps the reduce exact; totals "
        "broadcast on the bounded lang key."
    ),
    "text_vocab_growth": (
        "One corpus pass for all 8 prefixes: per-token first-seen step "
        "via a single map-side-combined groupBy(token); the cumulative "
        "window runs over ≤8 rows — never a distinct per prefix."
    ),
    "curation_epoch_shuffle": (
        "Shard key is scan-stage hash math; the intra-shard position "
        "window partitions BY shard, so each task orders one shard and "
        "no global ORDER BY exists."
    ),
    "events_dow_hour_matrix": (
        "One map-side-combined groupBy over the bounded 7×24 key space "
        "— the exchange carries ≤168 pre-reduced rows."
    ),
    "dedup_graph_degree_histogram": (
        "Two map-side-combined aggregations over pair-sized data "
        "beyond the existing pair pipeline; the histogram key space is "
        "bounded by the max degree."
    ),
    "curation_dup_rate_by_source": (
        "Content-hash group sizes then per-source rollup — two "
        "map-side-combined aggregations; the size join back is 1:1 on "
        "the hash key, no amplification."
    ),
    "text_stopword_discovery": (
        "Per-doc DISTINCT tokens explode once; ONE groupBy(token) "
        "computes document frequency; the corpus doc count joins as a "
        "1-row broadcast."
    ),
    "sql_docs_clean": (
        "The pure-SQL pipeline twin with CACHE TABLE staging (r7): "
        "every optimized-plan LEAF is an InMemoryRelation — the "
        "interpreted shingle/signature HOF stages evaluate once and "
        "all four base consumers plus both LSH sides read the cache "
        "(a WITH anywhere would break substitution for re-instanced "
        "references; stages are nested derived tables)."
    ),
    "ann_rerank_topk": (
        "Retrieve->rerank: the exhaustive 8-byte code scan feeds a "
        "two-phase candidate cut; the candidate list BROADCASTS back "
        "against the full-precision table, so the exact-cosine rerank "
        "touches candidate-sized data only — the expensive scorer "
        "never sees the corpus."
    ),
    "corpus_lang_similarity": (
        "All-pairs language overlap at 9 executed shuffles (was 36 "
        "plan nodes): two corpus passes (sketch dedup + per-shingle "
        "lang-sets), bounded two-phase K-smallest per language, then "
        "array math over the L-row sketch frame and one tiny combo "
        "rollup; the two multi-consumer aggregated frames are "
        "persisted (L- and L²-row payloads)."
    ),
    "pipeline_drop_reasons": (
        "Record-level provenance rides the existing chain: the staged "
        "shingle/band frames are reused, the stage verdicts come back "
        "as two LEFT joins on doc_id, and the rollup is ONE "
        "map-side-combined groupBy over the <=5×|langs| key space."
    ),
    "curation_token_offsets": (
        "Distributed prefix sum: repartitionByRange orders partitions "
        "by key range, the local window scans only its own partition, "
        "and the global step is a window over the BOUNDED per-partition "
        "totals broadcast back — never the single-task unpartitioned "
        "SUM() OVER (ORDER BY …)."
    ),
    "dedup_prefix_filter_join": (
        "Exact AllPairs/PPJoin: one map-side-combined df rollup, a "
        "doc-keyed (partition-local) prefix rank, the prefix-token "
        "equi-join with length + positional filters inside the join "
        "stage, then the Jaccard verify on surviving candidates only. "
        "No all-pairs anywhere; completeness is the prefix-filter "
        "theorem, not a recall tradeoff."
    ),
    "orders_pivot_status": (
        "Pivot with PINNED values: a single partial/final pivotfirst "
        "hash-aggregate pair over one scan — no distinct-collect "
        "discovery job, no join; the value domain is declared so the "
        "column set is static at plan time."
    ),
    "events_time_weighted_value": (
        "TWAP: ONE user_id exchange feeds both the lead window and the "
        "final rollup (the window's partitioning satisfies the "
        "groupBy's requirement); weights are exact integer "
        "microseconds, the sums decimal — only the last division is "
        "IEEE."
    ),
    "events_session_window_fn": (
        "Native session_window: ONE user_id exchange into a "
        "session-merging aggregate — no window functions, no island "
        "arithmetic; the operator Structured Streaming uses for "
        "stateful sessions, here in batch, hash-matching the "
        "gap-and-island oracle."
    ),
    "events_hll_sketch_merge": (
        "Mergeable-sketch rollup: day-grain hll_sketch_agg (fixed "
        "kb-sized state per group, map-side combined), a second "
        "aggregate UNIONS the stored sketches — rollup input is "
        "sketch-count-sized, never raw-event-sized; the exact "
        "count_distinct side rides its own two-phase aggregate for "
        "the error gate."
    ),
    "curation_k_anonymity": (
        "k-anonymity suppression: first groupBy reduces the corpus to "
        "QI cells (map-side combined, |segments|x|nations| keys); the "
        "relabel + residual re-aggregate runs over the CELL table "
        "only — the raw table is scanned exactly once."
    ),
    "ann_knn_graph_mutual": (
        "Mutual kNN: sign-bucket LSH bounds the candidate join (no "
        "all-pairs), per-query two-phase top-k, then the mutual edge "
        "set is a self-join of the directed kNN edges on the reversed "
        "key — edge-sized, not candidate-sized."
    ),
    "sql_recursive_dup_hops": (
        "WITH RECURSIVE BFS: the LSH pair graph is computed ONCE into "
        "a cached table (InMemoryTableScan feeds every recursion "
        "step); each UnionLoopRef iteration joins frontier x edges "
        "and stops at MAX RECURSION LEVEL — no per-step recomputation "
        "of the candidate pipeline."
    ),
    "embedding_kmeans_exact": (
        "Exact k-means, final sweep: the full corpus is scanned ONCE "
        "with the 4 final centroids inlined as literal integer-array "
        "expressions (argmin evaluates in the scan stage, no join for "
        "the assignment), one map-side-combined groupBy over 4 "
        "cluster keys, and the centroid-info table joins as a "
        "broadcast — Lloyd-round work never appears here because it "
        "ran coreset-sized under the bounded driver-scalar protocol."
    ),
    "orders_aggregate_suite": (
        "Aggregate breadth as ONE partial/final hash-aggregate pair "
        "over one scan — count_if/bool/bit/min_by/max_by all fold "
        "map-side; the only exchange carries 3 status keys."
    ),
    "orders_null_semantics": (
        "Null-safe reconciliation: both group-bys reduce to the tiny "
        "status-key space before the eqNullSafe join, which plans as "
        "a broadcast join on the null-safe key — never a nested loop."
    ),
    "ann_ivf_exact_topk": (
        "Value-checked IVF: cell assignment evaluates in the scan "
        "stage (centroids inlined as literals), queries+probe cells "
        "broadcast into one hash join on the cell key — each query "
        "scores ~nprobe/k of the corpus, then the standard two-phase "
        "top-k; no all-pairs, no nested loop."
    ),
    "events_range_frame_stats": (
        "RANGE-interval frames: ONE user_id exchange feeds both "
        "windowed aggregates (count + sum share the frame); the frame "
        "bound is exact integer microseconds evaluated inside the "
        "Window operator — no self-join re-expression."
    ),
    "curation_semantic_decontaminate": (
        "Semantic decon: the benchmark side is a BroadcastExchange "
        "into a single corpus scan; the per-vector verdict is one "
        "map-side-combined groupBy over vec_id — corpus read once, "
        "benchmark never shuffled."
    ),
    # r9
    "fmt_file_metadata_audit": (
        "O(FILES) audit: the scan is binaryFile (path/length only — "
        "no `content` in ReadSchema, so zero data bytes read); row "
        "counts come from parquet footers via a bounded pandas UDF "
        "over the FILE list; one tiny groupBy on the partition key. "
        "A 100 TB table costs #files stats + footers, never a row "
        "scan."
    ),
    "ann_ranking_eval": (
        "Ranking eval: both system rankings and the exact-truth "
        "frame are queries×k rows; truth joins in as a "
        "BroadcastExchange and the metric pivot is one "
        "map-side-combined groupBy over (stage, query) — the eval "
        "itself never shuffles corpus-sized data."
    ),
    "dedup_clusters_star": (
        "Large/small-star CC: each round is symmetric edge fan-out + "
        "two map-side-combined groupBys on node id — no all-pairs "
        "work, and the ROUND COUNT is O(log n) instead of "
        "O(diameter), which is the whole point at web-graph scale."
    ),
}

_TREE_RE = re.compile(r"^(.*?)\n\n\(1\)", re.DOTALL)


def tree_of(plan: str) -> str:
    """The operator tree part of a formatted plan (details stripped)."""
    m = _TREE_RE.search(plan)
    return (m.group(1) if m else plan).rstrip()


def main() -> None:
    spark = get_spark(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical-plan audit of the flagship queries",
        "",
        "Generated by `python tools/plan_audit.py` from the live",
        "`.explain(\"formatted\")` output at sf0.001 (plan shape is",
        "sf-independent). Each section states the scale property the plan",
        "must exhibit, then shows the operator tree as evidence. The",
        "same properties are enforced in CI by `tests/test_plans.py`.",
        "",
    ]
    for name, claim in AUDITED.items():
        plan = explain_str(QUERIES[name](spark, SF_DIR))
        out += [
            f"## {name}",
            "",
            claim,
            "",
            "```",
            tree_of(plan),
            "```",
            "",
        ]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
