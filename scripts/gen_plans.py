#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for representative catalog
queries, with the properties each plan is expected to exhibit.

Run from the repo root: python scripts/gen_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbms_query_optimizer_spark.operators import catalog
from dbms_query_optimizer_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"

# query -> the plan properties a reviewer should find in the output
COMMENTARY = {
    "flagship_join_agg": (
        "customer ⋈ orders ⋈ lineitem + filter + grouped agg. Expect: "
        "`o_totalprice` filter pushed into the orders scan (PushedFilters), "
        "ReadSchema pruned to the referenced columns, both joins broadcast "
        "(dimension sides fit), partial+final hash aggregation."
    ),
    "cbo_ordered_join": (
        "The Selinger-planned 4-way join emitted as an explicit left-deep "
        "chain. Expect: join order fixed by our DP (not Catalyst CBO), "
        "filter pushed to orders, broadcasts on the small sides."
    ),
    "dedup_minhash_lsh": (
        "Shingle → minhash → banded candidates → exact-Jaccard verify. "
        "Expect: documents scanned with ReadSchema pruned to "
        "(doc_id, text), one shuffle for the (doc_id, shingle) distinct, "
        "hash aggregates for signatures/buckets — and NO self-join of the "
        "signature plan (candidates come from collect+explode per bucket)."
    ),
    "asof_join": (
        "As-of join via union-sort-window. Expect: a single Exchange on "
        "user_id feeding one Sort + Window — no join operator at all, no "
        "per-probe candidate blowup."
    ),
    "range_join_bucketed": (
        "Time-window range join as an equi-join. Expect: SortMergeJoin/"
        "ShuffledHashJoin on (user_id, bucket) — NOT BroadcastNestedLoopJoin, "
        "which is what a naive non-equi range condition degrades to."
    ),
    "knn_brute_force": (
        "Exact top-k: query side broadcast, corpus side streamed. Expect: "
        "BroadcastNestedLoopJoin (5 query rows × corpus — the intended "
        "shape), then one shuffle for the per-query rank window."
    ),
    "events_tumbling": (
        "Event-time tumbling aggregation. Expect: single hash aggregate "
        "over (window, event_type) with partial aggregation before the "
        "exchange; window computed as a projection, not a join."
    ),
    "explode_tokens": (
        "Lateral explode + corpus-wide token count. Expect: ReadSchema "
        "pruned to (text), Generate(explode) inside the scan stage, and "
        "partial HashAggregate BEFORE the exchange — the shuffle carries "
        "(token, count) partials, never the raw exploded token stream."
    ),
    "percentile_exact": (
        "Exact quartiles per group. Expect: ObjectHashAggregate (sort-based "
        "percentile buffers) with partial aggregation before the exchange; "
        "ReadSchema pruned to (l_returnflag, l_extendedprice). At 100 TB "
        "the approx_aggs sketch path replaces this; the exact form is the "
        "validation gate."
    ),
    "tpch_q6": (
        "TPC-H Q6: pure scan-filter-agg. Expect: all three predicates in "
        "PushedFilters on the lineitem scan, ReadSchema pruned to the four "
        "referenced columns, one partial+final agg — zero joins, one "
        "single-row exchange."
    ),
    "tpch_q5": (
        "TPC-H Q5: 6-way join. Expect: nation/region/supplier broadcast "
        "(constant-size dims), the orders date filter pushed to its scan, "
        "shuffle joins only on the two fact keys (custkey, orderkey), "
        "c_nationkey = s_nationkey applied as a join residual."
    ),
    "tpch_q18": (
        "TPC-H Q18: HAVING-subquery semi-join. Expect: lineitem aggregated "
        "to over-threshold order keys, then LeftSemi join against orders "
        "(AQE may convert it to broadcast), then the detail join and final "
        "aggregate — lineitem scanned twice, never collected."
    ),
    "source_partitioned_scan": (
        "Hive-partitioned write then pruned read. Expect: the scan node "
        "shows PartitionFilters: [event_type IN (click,purchase)] — the "
        "three other event_type directories are never opened."
    ),
    "global_row_number": (
        "Distributed global numbering. Expect: _pid computed as literal "
        "quantile-cut comparisons (deterministic function of the key, no "
        "partitioner sampling), ONE hashpartitioning(_pid) exchange "
        "feeding the Window directly (no second full-data shuffle, no "
        "SinglePartition), and a BroadcastHashJoin against the 16-row "
        "offset table."
    ),
    "incremental_agg_merge": (
        "Snapshot+delta partial-aggregate merge. Expect: two branches of "
        "partial HashAggregate (one per shipdate side) with their filters "
        "pushed to the scans, a Union, then one final HashAggregate on "
        "l_returnflag — the snapshot partials are reused structurally, "
        "never rescanned at finer grain."
    ),
    "dpp_join_pruned": (
        "Dynamic partition pruning. Expect: the partitioned fact scan's "
        "PartitionFilters carries dynamicpruningexpression(event_type IN "
        "subquery) fed by SubqueryAdaptiveBroadcast — the dim's broadcast "
        "is reused to decide at runtime which directories to open; no "
        "static predicate on the fact."
    ),
    "band_join_lookup": (
        "BETWEEN containment join vs 4-row band dim. Expect: "
        "BroadcastNestedLoopJoin BuildRight with the two range predicates "
        "as the join condition — for a constant-size band table this is "
        "the right plan at any fact scale (per-row band resolution fused "
        "into the scan stage, no shuffle before the rollup)."
    ),
    "multimodal_frame_sample": (
        "Strided frame sampling over opaque binary payloads. Expect: "
        "sequence+explode generate the frame offsets JVM-side, per-frame "
        "slicing/hashing as projections in the scan stage — no Python, no "
        "shuffle before the final sort."
    ),
    "tpch_q19": (
        "TPC-H Q19: disjunctive predicate join. Expect: BroadcastHashJoin "
        "on p_partkey with the three-block OR as a post-join Filter/"
        "residual — NOT BroadcastNestedLoopJoin; the per-side prefilters "
        "(brand IN, l_quantity <= 30) pushed into the scans."
    ),
    "join_salted_skew": (
        "Salted skew join. Expect: xxhash64-derived salt projected on the "
        "fact side, Generate(explode) replicating the dim side 8×, the "
        "join keyed on (l_orderkey, __salt) — each hot key spread over 8 "
        "shuffle partitions."
    ),
    "latest_per_key": (
        "Keep-latest-per-key compaction. Expect: Exchange on user_id "
        "feeding Sort + Window(row_number) + Filter(rn=1) — no self-join "
        "of the fact table, and a map-side WindowGroupLimit (Spark 3.5 "
        "rank-limit pushdown) pruning each partition to one row per key "
        "BEFORE the shuffle; the only other exchange is the final "
        "presentation sort."
    ),
    "quality_gopher_rules": (
        "Gopher quality gate. Expect: a single Project over the documents "
        "scan computing every rule column — no shuffle, no Python; "
        "ReadSchema pruned to (doc_id, text); WholeStageCodegen spanning "
        "the whole plan."
    ),
    "tpch_q8": (
        "TPC-H Q8: the widest join in the suite (lineitem ⋈ part ⋈ orders "
        "⋈ customer ⋈ supplier ⋈ nation×2 ⋈ region). Expect: part/nation/"
        "region broadcast, the customer-region restriction applied as a "
        "left-semi broadcast join, shuffle exchanges only on the fact "
        "keys, and the conditional market-share aggregate as one "
        "partial+final pair."
    ),
    "dedup_span_duplication": (
        "Cross-document span duplication. Expect: Generate(explode) of the "
        "8-token spans inside the scan stage, partial HashAggregate before "
        "BOTH shuffles (per-doc distinct and span frequency), and the "
        "span⋈frequency join on already-aggregated rows — the raw span "
        "stream never crosses an exchange unaggregated."
    ),
    "decontaminate_ngram": (
        "Benchmark decontamination. Expect: the eval span set feeds a "
        "BroadcastHashJoin LeftSemi (the corpus span explosion is probed "
        "map-side, never shuffled against the eval set), one hash-distinct "
        "exchange for per-doc spans, and a left outer join back to the "
        "training doc list to surface zero-hit docs."
    ),
    "bm25_score": (
        "Okapi BM25 vs a fixed term set. Expect: the `token IN (...)` "
        "filter BELOW the (doc_id, token) tf aggregate, the df table and "
        "the 1-row N/avgdl stats as BroadcastHashJoin / "
        "BroadcastNestedLoopJoin (1-row cross), and exactly one "
        "corpus-wide exchange for document lengths."
    ),
    "argmax_per_group": (
        "ARG_MAX as a struct-max aggregate. Expect: partial+final "
        "SortAggregate on max(struct(c_acctbal, c_custkey)) (struct max "
        "is not hash-aggregable; the sorts are partition-local) and NO "
        "Window — the exchange carries one partial row per (partition, "
        "nation), while the rank-1-window formulation the oracle uses "
        "would shuffle and sort every customer row."
    ),
    "skyline_pareto": (
        "2-D Pareto frontier. Expect: partial+final HashAggregate "
        "(per-price max size) BEFORE the single-partition running-max "
        "Window — the window frame is |distinct prices| rows, and no "
        "quadratic self-join appears anywhere."
    ),
    "embedding_quantize_int8": (
        "Int8 quantization. Expect: map-only — array transform/array_max "
        "projections inside the scan stage, no Exchange except the final "
        "sort; embeddings ReadSchema pruned to (vec_id, embedding)."
    ),
    "doc_length_histogram": (
        "Reference IntHistogram as two aggregation passes. Expect: a 1-row "
        "min/max aggregate broadcast (BroadcastNestedLoopJoin over one row) "
        "into the bucket projection, then partial+final HashAggregate on "
        "bucket — the raw table is never shuffled, only 20 bucket partials."
    ),
    "curriculum_bins": (
        "Equal-frequency binning without a global window. Expect: "
        "HashAggregate on n_chars (distinct-key table), a small-window "
        "cumulative sum over THAT (single partition of |keys| rows, not "
        "|docs|), a broadcast join back, and a Window partitioned BY "
        "n_chars — never `row_number() OVER (ORDER BY …)` on the corpus."
    ),
    "sliding_distinct_users": (
        "Trailing 7-day distinct users. Expect: partial+final HashAggregate "
        "for the (day, user) dedupe FIRST, then BroadcastNestedLoopJoin "
        "against the tiny distinct-day calendar, then exact "
        "count_distinct — the range join runs on deduped pairs, never raw "
        "events, and no windowed DISTINCT appears."
    ),
    "late_supplier_blame": (
        "TPC-H Q21 shape with zero self-joins. Expect: ONE shuffle of "
        "lineitem (groupBy l_orderkey with partial aggregation), the "
        "orders filter pushed to its scan, supplier broadcast — the "
        "EXISTS/NOT-EXISTS pair from the SQL formulation appears as plain "
        "aggregate columns (n_supp, n_late_supp), not joins."
    ),
    "zipf_token_rank": (
        "Corpus vocabulary top-k. Expect: Generate(explode) in the scan "
        "stage, partial HashAggregate before the token-count exchange, "
        "TakeOrderedAndProject for the limit, and the rank Window placed "
        "AFTER the 50-row limit (single-partition by construction, "
        "trivially)."
    ),
    "tpch_q2": (
        "Q2 over derived partsupp. Expect: ONE aggregation of lineitem "
        "building the supply pairs (partial+final), part/supplier/nation/"
        "region all broadcast, and the correlated MIN-per-part subquery "
        "realized as a Window partitioned by ps_partkey — no second scan "
        "of lineitem, no self-join."
    ),
    "recursive_cte_ancestors": (
        "Native WITH RECURSIVE. Expect: a UnionLoop / recursive-relation "
        "operator (the engine's fixpoint) rather than N unrolled joins; "
        "one part scan feeding the anchor; partial+final HashAggregate "
        "over the recursion output."
    ),
    "approx_counts_sampled": (
        "AQP hash sampling. Expect: the md5-nibble sample predicate as a "
        "Filter directly above the scan (map-side, fused into the scan "
        "stage) so the aggregate touches 1/16th of rows; partial+final "
        "HashAggregate; no Sample operator and no RNG."
    ),
    "dedup_embedding_cosine": (
        "Exact all-pairs cosine as a distributed block-grid GEMM. Expect: "
        "ONE embeddings scan, a generator/explode replicating each row to "
        "its B grid tiles, a single hash shuffle on (bi, bj), and "
        "FlatMapGroupsInPandas doing the per-tile numpy GEMM — no "
        "driver-side collect, no corpus broadcast, no unblocked "
        "CartesianProduct."
    ),
    "knn_ivf": (
        "IVF probe path over the PERSISTED index (build_ivf_index trains "
        "once; the corpus parquet is partitioned by cell). Expect: "
        "probe-cell assignment fully distributed — queries "
        "BroadcastNestedLoopJoin'd against the tiny centroid frame, "
        "squared distance as a JVM-side higher-order fold, row_number "
        "window bounded at k rows per query — then a broadcast equi-join "
        "on cell against the cell-partitioned corpus (inverted lists = "
        "physical partitions). No query-vector collect, no training in "
        "the query."
    ),
    "asof_join_salted": (
        "Skew-hardened backward as-of join: two-phase distributed prefix "
        "scan. Expect: the probe/build union windowed per (user_id, bkt) "
        "— a hot user's timeline splits across B contiguous time buckets "
        "instead of one sort task — a per-bucket last-build aggregate, a "
        "tiny per-user carry Window (<= B rows per user), and an "
        "equi-join of carry-in back on (user_id, bkt). Output identical "
        "to asof_join (same oracle)."
    ),
    "dedup_embedding_cosine_lsh": (
        "Sub-quadratic near-dup: sign-LSH buckets bound candidate pairs "
        "to sum(|bucket|^2) << n^2, exact cosine re-check inside buckets. "
        "Expect: bucket ids computed JVM-side from the leading dims, "
        "candidates via bucket equi-join (no CartesianProduct, no "
        "sort-merge theta join), pair hydration via two JVM equi-joins, "
        "then ONE MapInPandas node — the Arrow-batched numpy verify "
        "(the same vectorized route as the exact GEMM twin; 2.9x faster "
        "than the interpreted per-pair fold it replaced). Expect an "
        "explicit round-robin Exchange before the Python plane pinning "
        "the verify to full parallelism — the pair frame is byte-tiny "
        "but CPU-heavy, and AQE's byte-based coalescing would otherwise "
        "run it on ~3 tasks. This is the plan to copy at 100 TB; "
        "dedup_embedding_cosine is its exact verification twin."
    ),
    "txn_merge_upsert": (
        "Committed copy-on-write MERGE through the manifest log. The "
        "merge itself runs at call time (semi-join to find affected "
        "files, rewrite minus matched plus source, atomic manifest "
        "publish); the explained plan is the post-merge snapshot read. "
        "Expect: a plain parquet scan of exactly the manifest's file "
        "list — recovery is resolution, nothing to replay."
    ),
    "txn_zonemap_scan": (
        "Zone-map file skipping: commit-time parquet-footer min/max in "
        "the manifest prune the file list BEFORE the scan is planned. "
        "Expect: the FileScan's InMemoryFileIndex lists only the 2 "
        "surviving quartile files (pruning happened at plan build, so "
        "the skipped files appear nowhere), plus the residual "
        "o_orderkey >= cut row filter pushed into the scan."
    ),
    "txn_point_lookup": (
        "Bloom point lookup (the heap-point-read analog): the table's "
        "per-file blooms, built at commit and carried in the manifest, "
        "prune a hash-clustered 8-file layout — where every file spans "
        "the key range and min/max excludes NOTHING — down to the one "
        "file whose bloom admits the key. Expect: InMemoryFileIndex "
        "listing a single file and the EqualTo probe pushed into the "
        "parquet scan."
    ),
    "txn_constraint_gate": (
        "CHECK-constraint ingest gate. Enforcement rides the staging "
        "write via Observation metrics (no extra pass), so the explained "
        "plan is just the post-commit aggregate over the clean slice. "
        "Expect: plain scan of the committed files + partial/final hash "
        "aggregate; the rejected transaction left no trace in the file "
        "list."
    ),
    "txn_compact_scan": (
        "Post-OPTIMIZE read: 8 round-robin small files compacted into 2 "
        "range-clustered files (repartitionByRange + sortWithinPartitions "
        "at compact time), then a top-decile predicate prunes to 1. "
        "Expect: FileScan over a single file with the residual filter "
        "pushed; the compaction itself is a COW commit, not part of the "
        "explained plan."
    ),
    "approx_aggs": (
        "Sketch family, hash-checkable. Expect: one pass computing exact "
        "distinct counts + HLL + approx-percentile together (ObjectHashAggregate), "
        "then a second scan rank-checking the sketch median via a "
        "BroadcastNestedLoopJoin against the 1-row stats — booleans "
        "assert each sketch met its bound so DuckDB can value-verify "
        "without comparing engine-defined sketch outputs."
    ),
    "tpch_q15": (
        "Q15 top supplier. Expect: the per-supplier revenue aggregate "
        "consumed by a 1-row MAX aggregate + BroadcastNestedLoopJoin "
        "(crossJoin of the 1-row max) + Filter — and NO Window with an "
        "empty partition spec anywhere (the single-partition scale-killer "
        "this formulation exists to avoid)."
    ),
    "incremental_join_view": (
        "Delta-join view maintenance. Expect: FOUR orders⋈lineitem joins — "
        "each with the date-split predicates pushed into both parquet scans "
        "(PushedFilters on o_orderdate / l_shipdate) — feeding partial "
        "hash aggregates that union and re-aggregate on month. The full "
        "re-join the oracle runs appears nowhere; every join input is a "
        "filtered (snapshot- or delta-sized) scan."
    ),
    "interval_overlap_join": (
        "Sweep-line interval-overlap COUNT (n = #{s_b <= e_a} - "
        "#{e_b < s_a} - 1) — no pair materialization (the true pair set "
        "is ~34 M at sf0.1). Expect: marker/probe unions hash-partitioned "
        "on (day, band), running-sum Windows whose partitions are single "
        "hour bands, a per-day prefix Window over <= 24 band rows, and "
        "equi-joins only — no CartesianProduct, no day-wide window "
        "partition, output one row per interval."
    ),
    "sample_reservoir_per_group": (
        "Two-stage per-group reservoir. Expect: stage-1 Window partitioned "
        "by (source, _salt) — 16 shards per group, so no task sorts a whole "
        "source — a rank filter bounding each shard to k rows, then the "
        "stage-2 per-source Window over at most 16·k rows per group."
    ),
    "scd2_point_in_time": (
        "Point-in-time SCD2 lookup. Expect: ONE events scan feeding both "
        "sides, the dimension built by a per-user Window (lead), then an "
        "equi-join on the user key (hash or SMJ — NOT a nested loop: the "
        "interval predicate rides the equi-join as a post-join Filter), "
        "left-outer so unpriced facts survive."
    ),
    "cogroup_reconcile": (
        "Cogrouped applyInPandas. Expect: both inputs Exchange on the SAME "
        "key (o_custkey) feeding one FlatMapCoGroupsInPandas — paired "
        "per-key pandas frames, no join node, no second shuffle; integer "
        "cents computed JVM-side before the Arrow boundary."
    ),
    "quality_classifier_score": (
        "Frozen logistic gate. Expect: a single documents scan with the "
        "whole feature vector + sigmoid fused into one WholeStageCodegen "
        "Project — no Python evaluator, no shuffle before the sort; "
        "ReadSchema pruned to (doc_id, lang, text)."
    ),
    "pii_redact": (
        "PII masking. Expect: ONE documents scan with the salting concat, "
        "both regexp_count calls, the nested regexp_replace and the md5 "
        "all fused into a single WholeStageCodegen Project — no Python "
        "evaluator, no join, no shuffle before the presentation sort. "
        "Map-only at scan bandwidth; at 100 TB this is exactly as "
        "parallel as the input file split count."
    ),
    "event_pattern_match": (
        "MATCH_RECOGNIZE-class sequence pattern. Expect: one events scan, "
        "ONE ObjectHashAggregate building each user's (ts, event_id)-"
        "sorted type string (map-side partial), then the regexp evaluated "
        "in a plain Project — no join, no Window, no Python plane. The "
        "NFA-over-sequence semantics live entirely in the regex engine."
    ),
    "ewma_smooth": (
        "Half-life EWMA over each user's purchase sequence. Expect: ONE "
        "data Exchange on user_id serving both windows (row_number, then "
        "the trailing collect_list), the decay fold as JVM higher-order "
        "functions (transform/aggregate) in a codegen Project — no "
        "self-join (the naive SQL is an O(span) fan-out join; that plan "
        "is deliberately the DuckDB oracle, not ours), no Python plane."
    ),
    "quantile_sketch_mergeable": (
        "Mergeable histogram-quantile sketch. Expect: bin counts "
        "aggregated with map-side partials (partial_count), the shard → "
        "merge split as two HashAggregates, the 1-row stats frame "
        "broadcast to the binning scan, and every planned join broadcast "
        "— after the first aggregate everything is (types × bins)-sized "
        "regardless of input volume. The per-type rank window is the "
        "droppable exact-verification column, not the sketch path."
    ),
    "boilerplate_strip": (
        "Corpus line-level dedup with text rebuild. Expect: the segment "
        "explode feeding a map-side partial-aggregated distinct-doc count "
        "(shuffle = distinct segments), the frequency join back, and the "
        "ordered reassembly via array_sort(collect_list(struct)) — no "
        "Python plane anywhere, no cartesian."
    ),
    "entity_resolution": (
        "Block → match → cluster → canonicalize in one DAG. Expect: the "
        "distinct-name frame broadcast into the blocked Levenshtein "
        "self-join (never a cartesian), then the bounded label-propagation "
        "loop's localCheckpointed frames — the iterative tail reads as "
        "scans of checkpointed RDDs, keeping plan depth constant."
    ),
    "running_balance_clamped": (
        "Lindley recurrence as TWO stacked windows (running sum, running "
        "min of it) sharing ONE user_id Exchange — the reflection identity "
        "turns a 'sequential' per-key loop into pure codegen. Expect: a "
        "single data shuffle, two Window operators back to back, no join, "
        "no Python."
    ),
    "text_mixed_language": (
        "Per-half language ID with EXPLICIT exchange barriers. Expect: "
        "projection 1 materializes the two normalized+padded halves, a "
        "round-robin Exchange, projection 2 the 30 marker-count score "
        "columns, a second Exchange, then the argmax when-chains over "
        "plain column references. Without the barriers projection "
        "collapse re-inlines the regexp_replace into every count (~90 "
        "copies/row — measured 5.6 s vs 1.8 s at sf0.1): the barrier IS "
        "the optimization."
    ),
    "dedup_set_similarity_prefix": (
        "PPJoin prefix-filtered exact set-similarity join. Expect: the "
        "shingle plan feeding ONE cached frame; candidates from the "
        "bucket-pair posexplode (no self-join of the signature plan — no "
        "second shingle scan); verification as array_intersect inside a "
        "projection over two hash joins keyed on doc_id; no "
        "BroadcastNestedLoopJoin, no Python plane. The v1 self-join form "
        "lost 5-50× to the unpruned baseline (SCALING.md anti-lesson)."
    ),
    "fifo_allocation": (
        "FIFO lot matching as interval intersection. Expect: two Window "
        "operators partitioned by l_partkey (prefix sums per side), one "
        "SortMergeJoin/BroadcastHashJoin on l_partkey with the overlap "
        "range predicate as a post-join condition — never a nested loop "
        "over unbounded pairs — and map-side-combined final aggregates."
    ),
    "seasonal_decompose": (
        "Additive decomposition. Expect: one hash aggregate collapsing "
        "events to (type, day) cells BEFORE any window; a single Window "
        "with windowspecdefinition(event_type, ...) (centered 7-day "
        "frame); the 7×types seasonal frame returning via "
        "BroadcastHashJoin; emitted doubles are single divisions of "
        "exact integer columns (no rounding operators in the plan)."
    ),
    "survival_km": (
        "Kaplan-Meier per segment. Expect: orders collapse to per-"
        "customer rows via grouped aggregates (no collect_list of order "
        "history); every windowspecdefinition carries c_mktsegment; the "
        "only SinglePartition exchange is the 1-row max-date scalar "
        "aggregate broadcast back as a cross join."
    ),
    "bpe_pair_merge": (
        "BPE pair counting. Expect: explode → hash aggregate to the "
        "(word, freq) vocabulary, the character-pair explode running "
        "over that aggregate's output (HashAggregate BELOW the second "
        "explode in the tree), a second hash aggregate with partial_ "
        "combiners, and TakeOrderedAndProject as the top-k — no Window, "
        "no global Sort."
    ),
    "feature_hash_vectorize": (
        "Hashing-trick featurizer. Expect: the Horner hash as a nested "
        "aggregate/transform lambda chain inside a projection (JVM "
        "higher-order functions — no ArrowEvalPython/MapInPandas "
        "anywhere), two hash aggregates keyed (doc_id, bucket) then "
        "doc_id, and one Window partitioned by doc_id for the top-bucket "
        "rank."
    ),
    "model_auc_roc": (
        "Exact ROC-AUC by tie-corrected rank-sum. Expect: documents "
        "collapse to one row per distinct micro-unit score "
        "(HashAggregate with partial_), the negatives prefix sum as a "
        "Window partitioned by _pid (the distributed prefix scan — no "
        "SinglePartition exchange except the final 1-row aggregate), "
        "and NO join operator anywhere."
    ),
    "events_ohlc_bars": (
        "OHLC bars. Expect: open/close as partial_min/partial_max over "
        "(ts, event_id, cents) STRUCTS — SortAggregate (structs aren't "
        "hash-aggregable) with map-side partials, one exchange on "
        "(event_type, day), no Window, no Join; every output column an "
        "exact integer."
    ),
    "percentile_cont_domain": (
        "PERCENTILE_CONT without a per-group sort buffer. Expect: the "
        "corpus collapsing to the per-type value domain (HashAggregate), "
        "the cumulative scan as a Window partitioned by event_type over "
        "domain rows, probe targets returning via BroadcastHashJoin — "
        "never a BroadcastNestedLoopJoin — and the order-statistic "
        "selection as conditional aggregates."
    ),
    "dsir_importance_weights": (
        "DSIR importance weights. Expect: token explode (Generate), the "
        "two 64-row hashed LMs built by hash aggregates and returned via "
        "BroadcastHashJoin, per-(doc,bucket) counts with partial_ "
        "combiners, and the Horner hash as JVM lambda folds — no "
        "Python eval plane anywhere."
    ),
    "geo_nearest_facility": (
        "Grid-blocked spatial k=1 join. Expect: the 9-row neighborhood "
        "offsets as a tiny BroadcastNestedLoopJoin onto the SMALL "
        "facility side only, candidates from a BroadcastHashJoin on the "
        "(cy, cx) cell id — never a theta join of points × facilities — "
        "and the per-point argmin as a partial+final SortAggregate "
        "(struct-min), not a rank window."
    ),
    "bh_fdr_report": (
        "Benjamini–Hochberg step-up. Expect: per-user moments from one "
        "partial_-combined hash aggregate over the corpus; the global "
        "p-value rank as _pid-partitioned Windows with a literal offset "
        "map (distributed_row_number — no SinglePartition window over "
        "the test frame); k* as a 1-row aggregate broadcast back."
    ),
    "event_trigram_mining": (
        "Sequential trigram mining. Expect: two lead() expressions fused "
        "into ONE Window per user, a partial_-combined count over the "
        "trigram key, and TakeOrderedAndProject for the top-k — no join, "
        "no global sort."
    ),
    "geo_position_asof": (
        "Trajectory as-of join (last fix per purchase). Expect: fixes "
        "deduped by one (user, ts) hash aggregate, then the union-sort-"
        "window as-of — a single Exchange on user_id feeding Sort + "
        "Window, NO join operator anywhere and no Python plane."
    ),
    "graph_wcc": (
        "Generic WCC by delta-frontier min-label propagation. The lazy "
        "tail of the last converged round: Expect scans of checkpointed "
        "node-domain RDDs (label state — the documented iteration-state "
        "exception), a left join of labels against the final min-message "
        "aggregate, and the component_size Window — corpus never "
        "re-enters the plan after the star-edge build."
    ),
    "graph_bfs_hops": (
        "Frontier BFS from the min edge-bearing user. The lazy tail "
        "after the loop: Expect a scan of the checkpointed visited state "
        "(node-domain (node, hops) rows — each edge was traversed at "
        "most twice over the whole run) feeding the n_at_hop Window "
        "partitioned by hops, then the user_id sort — no join and no "
        "corpus scan in the returned plan; the edge frame was persisted "
        "for the loop and unpersisted before return."
    ),
    "sample_kcenter_coreset": (
        "Incremental Gonzalez k-center. The lazy tail after K-1 folds: "
        "Expect a scan of the checkpointed (vec_id, best) struct state — "
        "per round the plan was one broadcast of the single newest "
        "center vector crossed into a map-side struct-min, ZERO "
        "groupBy/shuffle — joined only against the broadcast 1-row "
        "coreset-radius aggregate (BroadcastNestedLoopJoin over one "
        "row), then the vec_id sort."
    ),
    "graph_kcore": (
        "Delta-decrement k-core peeling. The lazy tail after "
        "convergence: Expect a scan of the checkpointed (node, deg) "
        "state — per round the plan joined only the dropped frontier "
        "against the persisted edge frame, each edge firing at most "
        "once per direction — feeding the decode projection and the "
        "core_size Window; the lineitem scan (quantity filter pushed, "
        "ReadSchema pruned to partkey/suppkey/quantity) appears only "
        "in the one-time edge build, never per round."
    ),
    "cumulative_distinct_users": (
        "First-seen collapse for cumulative distinct. Expect: ONE "
        "corpus-sized shuffle (the per-user min(day) hash aggregate, "
        "partial_-combined), a day-domain count, and the cumulative "
        "sum as a single-partition Window over the tiny day calendar "
        "(the documented day-domain exception) — no expanding-frame "
        "COUNT(DISTINCT), no corpus re-scan."
    ),
    "stats_histogram_dump": (
        "IntHistogram dump. The distributed work happened in the "
        "TableStats build (two jobs: min/max/count aggregate + one "
        "posexplode bucket count, both partial_-combined); the returned "
        "frame is the driver-side 200-row createDataFrame of the "
        "resulting counters (the reference's O(1)-space contract), so "
        "Expect: a bare Scan ExistingRDD + Sort and NOTHING else — any "
        "parquet scan in this tail would mean the dump re-read data."
    ),
    "t_closeness_audit": (
        "Privacy-trio EMD audit. Expect: ONE corpus-scale shuffle (the "
        "customer⋈orders join — orders side streamed, then the "
        "(class, priority) partial_-combined hash aggregate); everything "
        "after runs on the ≤125·5-row grid — two BroadcastExchanges "
        "(global priority dist + 1-row totals), a class-partitioned "
        "window cumsum, and a final tiny aggregate. No row-scale window."
    ),
    "events_downsample_m4": (
        "M4 downsampling. Expect: one partial_-combined hash aggregate "
        "collapsing events to (type, hour) struct-extremes — min/max "
        "structs, NOT rank windows over raw partitions — then explode + "
        "HashAggregate(distinct) on the 4·buckets-row frame. Output "
        "bounded by 4 rows/bucket regardless of input size."
    ),
    "shapley_attribution": (
        "Shapley channel credit. Expect: ONE corpus shuffle (per-user "
        "has-channel bitmask aggregate, partial_-combined), then the "
        "≤2ⁿ-row coalition regroup and two BroadcastHashJoins of the "
        "32-row driver-enumerated subset grid against the broadcast "
        "coalition frame. The ×2ⁿ work never touches the corpus."
    ),
    "embedding_kmeans_lloyd": (
        "Integer-exact Lloyd loop. Expect: per assignment pass a "
        "BroadcastNestedLoopJoin of the k-row centroid frame against "
        "the (persisted) quantized-vector corpus feeding a struct-MIN "
        "groupBy (map-side argmin — the ×k expansion is never "
        "shuffled), per update one partial_-combined (cluster, dim) "
        "sum; the InMemoryTableScan of the quantized vectors appears "
        "once per pass instead of a parquet re-read."
    ),
    "mann_whitney_u": (
        "Rank-sum test without ranking. Expect: ONE corpus-scale "
        "shuffle (the per-distinct-cents groupBy, partial_-combined, "
        "ReadSchema pruned to (event_type, value)), the distributed "
        "prefix scan's bucket-offset machinery on the value-domain "
        "frame (no SinglePartition window), and a 1-row final "
        "aggregate. No corpus-sized window or join anywhere."
    ),
    "max_drawdown": (
        "Path risk statistic. Expect: one partial_-combined (type, "
        "day) aggregate as the only corpus shuffle; the running-max/"
        "drawdown windows and the final struct-MAX argext run "
        "over the bounded day calendar (≤31 rows per type), so the "
        "Window operators sit above a tiny Exchange."
    ),
    "join_null_aware_anti": (
        "Three-valued-logic corner. Expect: four parallel aggregate "
        "branches UNION ALL'd; the unguarded NOT IN branch compiles to "
        "a BroadcastHashJoin LeftAnti with NULL-aware semantics (build "
        "side = the already-aggregated nation-domain set, broadcastable "
        "at any scale), the guarded/NOT EXISTS branches to ordinary "
        "LeftAnti, the left-join variant to LeftOuter + IsNull filter."
    ),
    "stats_histogram_2d_dump": (
        "Joint-grid dump. The distributed work is the two-job "
        "Int2DHistogram build (min/max aggregate + a cell groupBy whose "
        "shuffle is ≤ buckets² rows after map-side combine); the "
        "returned frame is the 256-row driver createDataFrame of the "
        "counters, so Expect: a bare Scan ExistingRDD + Sort and "
        "NOTHING else — any parquet scan here would mean the dump "
        "re-read data."
    ),
    "pad_waste_report": (
        "Batch-sizing audit. Expect: one scan of documents with "
        "ReadSchema pruned to (text), the token count and CASE ladder "
        "fused into the scan projection inside WholeStageCodegen, one "
        "partial_-combined hash aggregate over ≤ ladder-size groups — "
        "a map-only pass plus a constant-size shuffle."
    ),
    "text_readability": (
        "Per-document scorer. Expect: ReadSchema pruned to "
        "(doc_id, text), all three regexp counts and the score/band "
        "CASE fused into one Project inside WholeStageCodegen — no "
        "join, no aggregate, no Python; the only exchange is the "
        "presentation sort."
    ),
    "index_refresh": (
        "CDF-fed ANN-index maintenance. The manifest commits, delta "
        "assignment, and dynamic-overwrite cell rewrite all run at "
        "construction (EAGER_CONSTRUCTION); this is the returned "
        "audit tail. Expect: one parquet scan of the refreshed "
        "cell-partitioned inverted file, the qnorm² fold fused into "
        "the scan projection, one partial+final HashAggregate per "
        "cell — no join, no Python plane, nothing but the "
        "presentation sort after."
    ),
    "rrf_hybrid_search": (
        "Hybrid lexical+vector fusion. Expect: each leg's global rank "
        "as a Window partitioned by the range-bucket _pid "
        "(distributed_row_number — never a single-partition window), "
        "BroadcastNestedLoopJoin ONLY on the 1-row broadcasts (query "
        "vector, corpus stats), the depth-cut legs fused by a "
        "full-outer SortMergeJoin over ≤2·DEPTH rows, and "
        "TakeOrderedAndProject for the final top-k."
    ),
    "conformal_intervals": (
        "Split-conformal calibration. Expect: the order-statistic "
        "Window partitioned by o_orderpriority over the 10% "
        "calibration slice only; every join a BroadcastHashJoin "
        "(5-row fit and q-hat frames); partial+final HashAggregates "
        "for fit and coverage; no Python, no nested loop."
    ),
    "streaming_index_upsert": (
        "Streamed ANN-index fold (manifest tail -> idempotent "
        "foreachBatch cell assignment) runs at construction; this is "
        "the audit tail. Expect: one parquet scan over the "
        "batch=*/cell=* partition layout, qnorm² fused into the scan "
        "projection, partial+final HashAggregate per cell — no join, "
        "no Python plane."
    ),
    "mmr_diversify_topk": (
        "MMR greedy rerank runs at construction (TOPK-bounded "
        "candidate pool, K 1-row argmax rounds); the returned frame "
        "is the K-row shortlist as driver metadata. Expect: "
        "LocalTableScan only — no parquet scan, no join, no shuffle."
    ),
    "retrieval_ndcg_report": (
        "Retrieval-quality metrics per leg. The corpus rank legs run "
        "at construction and are localCheckpoint'd (their windows are "
        "pinned by rrf_hybrid_search); expect here: metric joins as "
        "broadcasts against the ≤10-row ground-truth frame, the RRF "
        "list re-ranked by a better-row count over the broadcast "
        "TOPK frame (no window), three 1-row aggregates unioned — "
        "and NO parquet scan (nothing re-reads the corpus)."
    ),
    "pii_luhn_audit": (
        "Checksum-validated PAN audit. Expect: one documents scan "
        "with the deterministic salting concat, the non-digit split, "
        "and both Luhn lambda folds fused into a single Project "
        "inside WholeStageCodegen — no join, no aggregate, no "
        "Python; the only exchange is the presentation sort."
    ),
    "dedup_winnowing": (
        "MOSS winnowing near-dup pairs. Expect: one MapInPandas (the "
        "Arrow fingerprint stage — Horner rolling hash + sliding "
        "window min per doc), a partial-agg'd HashAggregate for the "
        "stop-cap fingerprint frequencies, and the pair stage as an "
        "EQUI join on fp (shuffled hash/sort-merge) — a nested loop "
        "would mean the blocking broke and the join went doc × doc."
    ),
    "embedding_random_projection": (
        "Johnson–Lindenstrauss 64→16 Rademacher projection. Expect: "
        "ONE embeddings scan, the quantize transform and all 16 "
        "literal ±BIGINT component sums fused into one Project (the "
        "sign matrix is compiled into the plan — no broadcast, no "
        "join, no Python), then only the presentation sort's range "
        "exchange."
    ),
}


def main() -> None:
    spark = get_spark(app_name="gen_plans", master="local[8]", shuffle_partitions=8)
    qs = catalog.queries()
    out = [
        "# PLANS — physical plans of representative queries",
        "",
        "Generated by `python scripts/gen_plans.py` at sf0.1 on local[8]; "
        "regenerate after plan-affecting changes. Each section states the "
        "properties the plan must exhibit; the formatted explain follows.",
        "",
    ]
    for name, note in COMMENTARY.items():
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().rstrip()
        # keep the operator tree + the first detail blocks, drop the tail
        lines = plan.splitlines()
        cut = len(lines)
        seen_details = 0
        for i, ln in enumerate(lines):
            if ln.startswith("("):
                seen_details += 1
                if seen_details > 14:
                    cut = i
                    break
        trimmed = "\n".join(lines[:cut])
        if cut < len(lines):
            trimmed += f"\n... ({len(lines) - cut} detail lines trimmed)"
        out += [f"## {name}", "", note, "", "```", trimmed, "```", ""]

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
