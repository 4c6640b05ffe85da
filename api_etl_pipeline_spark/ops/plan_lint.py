"""Physical-plan linter: automated scale QA over the whole registry.

`tests/test_plan_shapes.py` pins a handful of hand-picked plan
properties; this module generalizes the idea into an engine tool: walk
EVERY registered query's physical plan and classify anti-pattern nodes.

Severity model (what actually hurts at 100 TB):

- HARD (never acceptable in a registered query):
  * CartesianProduct — an unconstrained n×m blowup of two non-broadcast
    sides. (BroadcastNestedLoopJoin is judged separately: it is how
    Spark executes an INTENTIONAL cross/non-equi join whose build side
    is tiny — centroid tables, single-row scalar aggregates.)
  * BatchEvalPython / EvalPython — a row-at-a-time (non-Arrow) Python
    UDF in the plan; the engine's rule is Arrow-batched Pandas UDFs
    only (ArrowEvalPython / MapInPandas nodes are fine).
  * LocalTableScan of collected results in a BATCH query — means some
    stage ran on the driver. (Streaming memory-sink materialization is
    the one legitimate source; those queries are allowlisted.)

- WARN (legitimate with a reason, tracked in ALLOWED so new instances
  surface in review):
  * SortMergeJoin — correct for fact-fact joins and full-outer joins;
    a regression if it appears where a dimension should broadcast.
  * SortAggregate — forced whenever an aggregate buffer is not
    hash-mutable (string first()/min(), collect_*); a regression on
    hot integer aggregation paths.
  * BroadcastNestedLoopJoin — fine only when the build side is a tiny
    frame by construction.
  * WindowGlobal (round-12 verdict task 5) — a Window whose spec has NO
    partitionBy: Spark plans it as a SINGLE-partition WindowExec, so
    the whole input flows through one task. Legitimate over
    dimension-grain or pre-aggregated relations (w07/w08's supplier/
    customer tables, vocab-bounded term windows); a 100 TB scale-killer
    over a fact-derived relation — which is exactly what the reason
    column must rule out for every allowlisted instance.

The linter is part of the public CLI (`cli.py lint`) and enforced in
tests/test_plan_lint.py: hard findings fail outright; warn findings must
match the allowlist EXACTLY (an entry that stops occurring fails too, so
the list never goes stale).
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

# InMemoryRelation/InMemoryTableScan (r14 verdict "what's wrong" #4 /
# advice): the bench's pure-construction handle-reuse guard trusts
# checkpoint.py to be the only materialization device — a future
# .persist()/.cache() in any registered query would silently qualify it
# for reuse and let timed runs 2..n read run-1 cached blocks. No
# registered query may cache; this makes that machine-checked.
HARD_NODES = ("CartesianProduct", "InMemoryTableScan", "InMemoryRelation")
WARN_NODES = ("SortMergeJoin", "SortAggregate", "BroadcastNestedLoopJoin")

# warn-level findings with their standing justification; a finding not in
# this table — or a table row that no longer fires — is a lint failure.
ALLOWED: dict[tuple[str, str], str] = {
    ("q08_full_outer", "SortMergeJoin"): "full outer join cannot broadcast either side",
    ("q35_nation_volume", "SortMergeJoin"): "lineitem⋈orders fact-fact join",
    ("ing19_merge_upsert", "SortMergeJoin"): (
        "MERGE emulation is a FULL OUTER join on the key — cannot broadcast "
        "either side by definition (every target row must surface)"
    ),
    ("q36_market_share", "SortMergeJoin"): "lineitem⋈orders fact-fact join",
    ("llm01_clean_corpus", "SortMergeJoin"): "near-dup candidate self-join is fact-fact",
    ("llm02_corpus_funnel", "SortMergeJoin"): (
        "flags⋈demoted without a broadcast hint (round-5 advice): the "
        "demoted id set scales with the corpus duplication rate, so a "
        "forced broadcast would exceed the 8 GB limit at 100 TB — the "
        "static plan is SMJ and AQE flips it to broadcast at runtime "
        "when the set is actually small"
    ),
    ("q09_cross_join", "BroadcastNestedLoopJoin"): "intentional cross join, 5×25-row dims",
    ("q34_dormant_rich_customers", "BroadcastNestedLoopJoin"): "single-row scalar avg broadcast",
    ("dq07_window_psi_drift", "BroadcastNestedLoopJoin"): (
        "single-row baseline-total broadcast into the contribution "
        "projection (the tx08 single-row-scalar shape)"
    ),
    ("samp07_dsir_importance", "BroadcastNestedLoopJoin"): (
        "single-row (target_total, raw_total) broadcast into the "
        "1000-row ratio projection (the tx16 corpus-stats shape)"
    ),
    ("tx23_corpus_laws", "BroadcastNestedLoopJoin"): (
        "two single-row OLS-fit aggregates broadcast onto the 10-row "
        "decile curve (the tx08 single-row-scalar shape, twice)"
    ),
    ("tx08_tfidf_top_term", "BroadcastNestedLoopJoin"): "single-row corpus-count broadcast",
    ("tx16_bm25_topk", "BroadcastNestedLoopJoin"): "single-row (N, avgdl) corpus-stats broadcast",
    ("samp04_temperature_mix", "BroadcastNestedLoopJoin"): "single-row (budget, w_sum) broadcast",
    ("llm03_dataset_card", "BroadcastNestedLoopJoin"): "single-row corpus-total broadcast",
    ("sim01_cosine_topk", "BroadcastNestedLoopJoin"): "5-row query-vector broadcast, non-equi self-exclusion",
    # r15: the exact-truth leg is the shared sim01_truth build; its
    # checkpoint plan is captured by whichever consumer constructs
    # first in a cold all_queries() pass — ret02, which the r15 driver
    # prefix rotation places before sim11
    ("ret02_ann_rank_quality+ckpt", "BroadcastNestedLoopJoin"): (
        "inherited exact leg IS sim01 — same 5-row query-vector "
        "broadcast, non-equi self-exclusion (lives in the shared "
        "sim01_truth checkpoint subplan, built by the first consumer)"
    ),
    ("cur03_snapshot_diff", "SortMergeJoin"): (
        "snapshot diff is a FULL OUTER join of two same-size corpus "
        "versions — full outer cannot broadcast either side by "
        "definition (the ret01 reasoning); both sides are pre-projected "
        "to 40-byte (id, hash, chars) rows so the zipper shuffle moves "
        "hashes, never text"
    ),
    ("tx21_bpe_train_merges", "BroadcastNestedLoopJoin"): (
        "each BPE round broadcasts its SINGLE-ROW top-pair into the "
        "vocab rewrite projection (the tx08 single-row-scalar shape, "
        "once per unrolled round)"
    ),
    ("tx22_bpe_tokenize_apply", "BroadcastNestedLoopJoin"): (
        "inherited training core IS tx21 — same single-row top-pair "
        "broadcast per unrolled merge round; the apply side's own joins "
        "are equi (word) and hash/broadcast"
    ),
    ("tx24_tokenizer_fertility", "BroadcastNestedLoopJoin"): (
        "inherited training core IS tx21 — same single-row top-pair "
        "broadcast per unrolled merge round; the audit side's own joins "
        "are equi (word) and hash/broadcast"
    ),
    ("cur04_token_drift", "BroadcastNestedLoopJoin"): (
        "two single-row per-version token-total broadcasts folded into "
        "the rate expressions (the tx19 shape)"
    ),
    ("cur04_token_drift", "SortMergeJoin"): (
        "version-1 x version-2 token counts is a FULL OUTER join (born/"
        "dead tokens must surface) — cannot broadcast either side by "
        "definition; both sides are vocab-bounded (token, cnt) pairs, "
        "never text"
    ),
    ("dq06_psi_drift+ckpt", "SortMergeJoin"): (
        "the v1 x v2 histogram align is a FULL OUTER join (born/dead "
        "buckets must surface) — cannot broadcast either side by "
        "definition; both sides are 26-row (feature, bucket, cnt) "
        "relations at ANY corpus size"
    ),
    ("ret01_hybrid_rrf", "BroadcastNestedLoopJoin"): (
        "3-row seed-vector broadcast against the embedding corpus — the "
        "sim01 semantic-leg shape"
    ),
    ("ret01_hybrid_rrf", "SortMergeJoin"): (
        "RRF fusion is a FULL OUTER join of the two ≤k·#queries rank "
        "legs — full outer cannot broadcast either side by definition; "
        "both inputs are top-k-truncated (kilobytes) so the SMJ sorts "
        "~30 rows"
    ),
    ("sim07_pq_codes", "BroadcastNestedLoopJoin"): "8-row PQ codebook broadcast cross join",
    ("q48_range_join_banded", "SortMergeJoin"): (
        "purchases×clicks on (user, hour-bucket) is fact-fact by design — "
        "the banding exists precisely so this SMJ's key groups stay small"
    ),
    ("q46_important_stock_nations", "BroadcastNestedLoopJoin"): (
        "single-row global-total broadcast into the non-equi HAVING comparison"
    ),
    ("tx19_pmi_collocations", "BroadcastNestedLoopJoin"): (
        "two single-row corpus-total broadcasts (N1 tokens, N2 bigrams) "
        "folded into the PMI expression — the tx08 shape"
    ),
    ("hh01_heavy_hitter_tokens", "BroadcastNestedLoopJoin"): (
        "single-row exact-total broadcast into the heavy-hitter threshold "
        "filter"
    ),
    ("ev15_ohlc_bars", "SortAggregate"): (
        "open/close are min_by/max_by over the fixed-width string tie key — "
        "string buffers are not hash-mutable so Spark picks SortAggregate; "
        "still one shuffle with map-side partial min_by/max_by, and the "
        "per-group sort state is O(1)"
    ),
    ("gr03_triangle_stats", "BroadcastNestedLoopJoin"): (
        "three single-row stat aggregates (degree sum, edge count, "
        "triangle count) folded into the one-row result"
    ),
    ("gr03_triangle_stats", "SortMergeJoin"): (
        "the wedge enumeration is the oriented edge list self-joined on "
        "src — fact-fact by nature; degree orientation bounds every src "
        "group at O(sqrt(m)), which is the algorithm's whole point"
    ),
    ("ing01_dedup_insert", "SortAggregate"): (
        "dropDuplicates keeps wide string first() buffers (not hash-mutable); "
        "single spillable sort shuffle on the dedup key"
    ),
    ("tx08_tfidf_top_term", "SortAggregate"): (
        "per-doc argmax is min_by over a struct (buffer not hash-mutable); "
        "the sort rides the existing doc_id partitioning — replaced the "
        "round-3 Window+row_number exchange, net one fewer shuffle"
    ),
    ("ing18_bloom_dedup_insert", "SortAggregate"): (
        "same dropDuplicates batch-dedup as ing01 upstream of the bloom probe"
    ),
    ("ing22_reconcile_by_hash", "SortAggregate"): (
        "merge_upsert's dropDuplicates keeps wide string first() buffers "
        "(not hash-mutable) — the ing01 class, on the changed-rows subset"
    ),
    ("ing22_reconcile_by_hash", "SortMergeJoin"): (
        "static plan for the keep-leg anti-join on source_url before AQE "
        "sees the changed-subset size; at runtime AQE flips it to BHJ "
        "(changed rows are the small side by the idempotency design), and "
        "archive-scale anti-joins legitimately SMJ — the ing19 MERGE class"
    ),
    ("dd10_keep_best_dedup", "SortAggregate"): (
        "max_by struct argmax buffer is not hash-mutable; runs on the tiny "
        "post-clustering vertex set"
    ),
    ("decon03_embedding_contamination", "BroadcastNestedLoopJoin"): (
        "benchmark-embedding-set broadcast against the corpus — eval "
        "sets are thousands of rows vs the 100 TB corpus side; the "
        "corpus makes one narrow pass scoring |bench| cosines per row"
    ),
    ("tx20_stopword_discovery", "BroadcastNestedLoopJoin"): (
        "single-row corpus-total broadcast folded into the DF-ratio "
        "filter — the tx08 shape"
    ),
    # --- pre-checkpoint plans (<name>+ckpt): what the checkpoint
    # observer sees INSIDE iterative loops before lineage truncation ---
    # (round 14: the former dd09/dd10/samp06 "+ckpt" SortMergeJoin
    # entries are gone — the three consume the SHARED dd04_components
    # build, and at lint scale (sf0.01, ~70 edges) the size dispatch
    # takes the driver union-find path, so NO distributed CC round runs
    # and the per-round neighbor-min/pointer-jump SMJ never appears in
    # a captured plan. The distributed loop's shape stays pinned by the
    # cap-0 pytest (test_connected_components_deep_chain /
    # _paths_identical); its SMJ is the fact-fact vertex-id join the
    # CC model requires, documented in SCALE.md's CC construction row.)
    ("samp06_cluster_safe_split", "SortMergeJoin"): (
        "corpus LEFT JOIN component map on doc_id — the static plan "
        "keeps the scalable fact-fact shape because the map is bounded "
        "by the DUP RATE, not the corpus (unknowable at plan time); at "
        "runtime AQE broadcasts it whenever it is actually small, and "
        "forcing a broadcast hint would be wrong at a 100 TB dup-heavy "
        "corpus"
    ),
    ("gr01_pagerank+ckpt", "SortMergeJoin"): (
        "per-round ranks⋈edges contribution join is fact-fact on src — "
        "the canonical PageRank shuffle; 2 exchanges per round as "
        "documented in SCALE.md"
    ),
    ("gr01_pagerank+ckpt", "BroadcastNestedLoopJoin"): (
        "single-row dangling-mass scalar aggregate broadcast into each "
        "round's rank update"
    ),
    ("gr02_bfs_hops+ckpt", "SortMergeJoin"): (
        "frontier expansion joins frontier⋈edges then anti-joins the "
        "known set — both fact-fact on vertex id; each edge is "
        "traversed once across all rounds"
    ),
    ("gr03_triangle_stats+ckpt", "SortMergeJoin"): (
        "the oriented-edge subtree captured pre-checkpoint contains the "
        "same degree-bounded wedge self-join allowlisted on the final "
        "plan"
    ),
    ("ret01_hybrid_rrf+ckpt", "BroadcastNestedLoopJoin"): (
        "the semantic leg's 3-row seed-vector broadcast, captured "
        "pre-checkpoint — same shape allowlisted on the final plan"
    ),
    # --- round 9 ---
    ("llm04_curation_funnel", "BroadcastNestedLoopJoin"): (
        "the funnel's two 1-row aggregates (flag counts x DSIR "
        "selection totals) cross-joined into the single output row — "
        "the samp07 1-row-totals shape"
    ),
    ("dd16_lsh_recall_audit", "SortMergeJoin"): (
        "audit-internal joins over the FIXED 120-row derived stratum "
        "(pair lattice onto shingle sets / signatures); bounded "
        "O(stratum^2) work at any corpus size — AQE broadcasts when "
        "small, and the stratum never grows with the corpus"
    ),
    ("dd17_lsh_geometry_sweep", "SortMergeJoin"): (
        "same fixed-stratum audit joins as dd16 (shared derived corpus)"
    ),
    ("dd17_lsh_geometry_sweep", "BroadcastNestedLoopJoin"): (
        "the 3-row geometry literal cross-joined onto the bounded pair "
        "lattice — a constant-size broadcast"
    ),
    ("dd25_simhash_recall_audit", "BroadcastNestedLoopJoin"): (
        "the 5-row Hamming-threshold literal cross-joined onto the "
        "bounded dd16 pair lattice — the dd17 geometry-lattice shape"
    ),
    ("samp08_temporal_split", "BroadcastNestedLoopJoin"): (
        "the 1-row cutoff-day anchor cross-broadcast onto the composite "
        "(day, user) relation — the samp07 1-row-totals shape"
    ),
    ("mix03_anneal_schedule", "BroadcastNestedLoopJoin"): (
        "the 1-row token-budget total cross-broadcast onto the "
        "3x|sources| schedule rows — the samp07 1-row-totals shape"
    ),
    ("maint03_zone_map_skip", "BroadcastNestedLoopJoin"): (
        "the 1-row min/max-day anchor exploded into the 3-row predicate "
        "literal, cross-broadcast onto the |files|-row stats relation — "
        "the samp07 1-row-totals shape"
    ),
    ("sim14_sq8_topk", "BroadcastNestedLoopJoin"): (
        "5-row query-vector broadcast, non-equi self-exclusion — the "
        "sim01 candidate-generation shape"
    ),
    ("sim13_mmr_rerank+ckpt", "BroadcastNestedLoopJoin"): (
        "5-row query-vector broadcast, non-equi self-exclusion — the "
        "sim01 candidate-generation shape (lives in the checkpointed "
        "candidate subplan; the final plan is BHJ + Arrow greedy only)"
    ),
    ("cls01_quality_classifier", "BroadcastNestedLoopJoin"): (
        "single-row class-stats broadcast into the scoring projection "
        "(the tx08 single-row-scalar shape) — training is the one "
        "bounded aggregate on the pushed-down doc_id < 500 slice"
    ),
    ("cls02_classifier_auc_audit+ckpt", "BroadcastNestedLoopJoin"): (
        "same cls01 single-row broadcasts, now inside the checkpointed "
        "collapsed-score-grain subtree (r14: one corpus traversal feeds "
        "both the AUC and confusion branches instead of re-running the "
        "whole cls01 subtree per branch)"
    ),
    # --- round 13: unpartitioned-Window findings (verdict task 5).
    # Every reason must name the GRAIN flowing through the single
    # WindowExec partition and why it is bounded (or why the total
    # order is the operator's semantics, with the documented scale
    # rewrite). A fact-grain global window with no such argument is a
    # finding to FIX, not to allowlist. ---
    ("dq03_benford_deviation", "WindowGlobal"): (
        "share-of-total over the 9-row leading-digit aggregate — the "
        "window input is digit-grain by construction"
    ),
    ("w05_ntile", "WindowGlobal"): (
        "ntile quartiles over the customer dimension — global ordering "
        "IS the quantile semantics; dimension-grain input"
    ),
    ("w07_range_frame", "WindowGlobal"): (
        "value-range frame over the supplier dimension (acctbal ±500) — "
        "dimension-grain input, the range frame needs the total order"
    ),
    ("w08_distribution_functions", "WindowGlobal"): (
        "cume_dist/percent_rank over the customer dimension — the "
        "distribution functions are global by definition; "
        "dimension-grain input"
    ),
    ("w10_share_of_total", "WindowGlobal"): (
        "share-of-total over the nation-grain aggregate (25 rows)"
    ),
    ("maint02_retention_plan", "WindowGlobal"): (
        "global max over the day-grain partition-stats relation "
        "(bounded by the partition count, metadata scale)"
    ),
    ("ev12_peak_concurrency", "WindowGlobal"): (
        "the sweep-line prefix sum over ordered session boundaries — "
        "exact peak concurrency REQUIRES a total order on boundary "
        "events (2 rows/session); the 100 TB rewrite is the two-phase "
        "prefix-sum (per-partition sums, broadcast offsets), same "
        "semantics, noted in SCALE.md"
    ),
    ("ev16_rfm_segments", "WindowGlobal"): (
        "three ntile quintiles over the per-user RFM aggregate (one "
        "row per user, post-shuffle reduced) — global quantiles are "
        "the RFM definition; at 100 TB swap ntile for approx "
        "percentile cutpoints + a broadcast bucket join"
    ),
    ("hh02_countmin_audit", "WindowGlobal"): (
        "rank over the bigram-grain exact-count aggregate to pin the "
        "audit's top-k ground truth — vocab-bounded (Heaps), and the "
        "audit needs the exact global order to score the sketch"
    ),
    ("st16_countmin_live", "WindowGlobal"): (
        "same audit shape as hh02 on user-grain exact counts — the "
        "probe set is the exact top-K, which needs the global rank"
    ),
    ("samp03_fixed_size_sample", "WindowGlobal"): (
        "row_number over an ALREADY-LIMITED 200-row relation (the "
        "hash-ordered top-k) — the window input is k-bounded, the "
        "corpus-side selection is TakeOrderedAndProject"
    ),
    ("samp05_weighted_reservoir", "WindowGlobal"): (
        "A-Res reservoir rank: the global order on the weighted sample "
        "keys IS the algorithm; the window input is pre-reduced and "
        "the kept set is k-bounded — at 100 TB the standard rewrite "
        "is per-partition top-k then a k·P-row global trim"
    ),
    ("samp08_temporal_split", "WindowGlobal"): (
        "cumulative share over the day-grain activity curve (bounded "
        "by the calendar, not the corpus)"
    ),
    ("mix01_token_budget_mix", "WindowGlobal"): (
        "share-of-total over the source-grain token aggregate (a "
        "handful of rows)"
    ),
    ("mix02_epoch_upsampling+ckpt", "WindowGlobal"): (
        "same source-grain share-of-total as mix01, captured inside "
        "the checkpointed schedule subplan"
    ),
    ("tx14_bpe_merge_candidates", "WindowGlobal"): (
        "rank over the pair-frequency aggregate — vocab-grain "
        "(Heaps-bounded), and BPE's merge choice is the global argmax"
    ),
    ("tx23_corpus_laws", "WindowGlobal"): (
        "Zipf rank over the term-frequency aggregate (vocab-grain) and "
        "the 10-row decile curve fold — the law fits are global by "
        "definition; the doc-order ntile feeding Heaps deciles is the "
        "one corpus-grain order, bounded here and replaced by "
        "pre-bucketed doc counts at scale"
    ),
    ("tx23_corpus_laws+ckpt", "WindowGlobal"): (
        "the same vocab-grain rank/decile windows captured in the "
        "checkpointed curve subplan"
    ),
    ("pack02_concat_cut", "WindowGlobal"): (
        "the global greedy concat-and-cut contrast form: an exact "
        "corpus-order running token sum IS its contract (pack01/pack03 "
        "are the per-shard production forms — same trio contract as "
        "dd15/dd20 vs dd22)"
    ),
}

# batch queries may not contain LocalTableScan of collected rows; the
# live-streaming queries materialize through the memory sink by design,
# and inline VALUES literal relations (constant decode tables that never
# touched the driver as *data*) also plan as LocalTableScan
LOCAL_SCAN_OK = {
    "st06_streaming_tumbling_live",
    "st07_streaming_join_live",
    "st09_streaming_enrich_live",
    "st11_streaming_sliding_live",
    "st12_streaming_session_live",
    "st13_streaming_dedup_live",
    "st15_journey_patterns_live",  # round 9: memory-sink snapshots
    "st16_countmin_live",  # round 9: memory-sink sketch cells
    "st17_span_dedup_live",  # round 10: memory-sink dropped-span set
    "qsql08_values_decode_shared_sql",  # 3-row inline VALUES decode table
    # round 14: connected_components' size dispatch — below
    # CC_DRIVER_MAX_EDGES the component map is a driver union-find
    # materialized via createDataFrame (bounded by the edge cap, never
    # the corpus); at lint/test scale the three consumers take that
    # path, so their final plans carry the local component-map scan.
    # The distributed path's plans stay lint-covered via the forced
    # cap-0 pytest (test_connected_components_deep_chain).
    "dd09_dup_clusters",
    "dd10_keep_best_dedup",
    "samp06_cluster_safe_split",
}


# Queries whose construction calls lazy/eager_checkpoint — the observer
# MUST capture at least one plan for each (round-7 advice: a thread-pooled
# or refactored caller could silently stop capturing, turning the +ckpt
# lint coverage vacuous while staying green). Bidirectional: a query that
# captures without being listed here is also flagged, so this constant
# cannot silently drift from reality. Regenerate from PLANS.md "+N ckpt"
# markers (tools/gen_plans.py) plus any additions since.
#
# Round 14: queries that consume SHARED once-per-process builds
# (dedup.dd04_components, the _memo session builds: lsh_bands, the
# dd16 audit fixtures, the graph iteration states) capture those
# checkpoints only in whichever consumer constructs FIRST in a
# process; the vacuous-capture guard treats each build as satisfied
# once any member captured (or the cache already holds it), so the
# sharing cannot be silently un-shared. A query may consume several
# builds; one that captures although ALL its builds are satisfied —
# and has no private checkpoints of its own — means a cache miss,
# flagged hard.
SHARED_CHECKPOINT_GROUPS: dict[str, tuple[str, ...]] = {
    "dd09_dup_clusters": ("dd04_components",),
    "dd10_keep_best_dedup": ("dd04_components",),
    "samp06_cluster_safe_split": ("dd04_components",),
    "dd04_minhash_lsh_pairs": ("lsh_bands",),
    "dd13_containment_dedup": ("lsh_bands",),
    "dd14_incremental_dedup": ("lsh_bands",),
    "llm01_clean_corpus": ("lsh_bands",),
    "llm02_corpus_funnel": ("lsh_bands",),
    "dd16_lsh_recall_audit": ("dd16_derived", "dd16_sig"),
    "dd17_lsh_geometry_sweep": ("dd16_derived", "dd16_sig"),
    "dd25_simhash_recall_audit": ("dd16_derived", "dd25_simhash"),
    "gr01_pagerank": ("gr01_ranks",),
    "gr02_bfs_hops": ("gr02_bfs",),
    "gr03_triangle_stats": ("lsh_bands", "gr03_oriented"),
    # round 14: the trained BPE tokenizer state (checkpointed vocab +
    # merge rules) is one shared build with three registered consumers
    "tx21_bpe_train_merges": ("bpe_train",),
    "tx22_bpe_tokenize_apply": ("bpe_train",),
    "tx24_tokenizer_fertility": ("bpe_train",),
    # round 15: the exact brute-force ANN ground truth (sim01's ranking)
    # is one shared eager build with two evaluation consumers
    "sim11_ann_recall_at_k": ("sim01_truth",),
    "ret02_ann_rank_quality": ("sim01_truth",),
}

# members above that ALSO checkpoint per-construction (non-shared)
# state — they capture on every construction even with all their
# shared builds cached, so the cache-miss direction does not apply
PRIVATE_CHECKPOINT_MEMBERS = {
    "llm01_clean_corpus",   # live_bands (survivor-filtered band table)
    "llm02_corpus_funnel",  # flags relation + live_bands
    "dd14_incremental_dedup",  # dbands (delta band table, per-construction)
}

CHECKPOINTING_QUERIES = {
    "cur04_token_drift",
    "dd04_minhash_lsh_pairs",
    "dd09_dup_clusters",
    "dd10_keep_best_dedup",
    "dd13_containment_dedup",
    "dd14_incremental_dedup",
    "dd15_semdedup_prune",
    "dd16_lsh_recall_audit",  # round 9: derived-corpus + signature checkpoints
    "dd17_lsh_geometry_sweep",  # round 9: same checkpoints, 8-hash variant
    "dd25_simhash_recall_audit",  # round 14: derived-corpus + simhash ckpts
    "cls02_classifier_auc_audit",  # round 14: collapsed score grain feeds AUC + confusion branches
    "sim13_mmr_rerank",  # round 9: candidate set feeds both lattice sides
    "hh02_countmin_audit",  # round 9: bigram counts feed sketch + probe + lattice
    "maint03_zone_map_skip",  # round 9: composite grain feeds both layouts + anchor
    "mix03_anneal_schedule",  # round 9: source sizes feed schedule + fold + budget
    "dq08_fd_profile",  # round 9: projected pair columns feed N hypothesis aggs
    "ret02_ann_rank_quality",  # r15: exact truth is the shared sim01_truth build
    "sim11_ann_recall_at_k",  # r15: same shared sim01_truth build
    "st16_countmin_live",  # round 9: batch-audit user counts feed probe + lattice
    "samp08_temporal_split",  # round 9: (day, user) composite feeds cutoff + labels + flags
    "dd18_prefix_filter_join",  # round 9: shingle sets feed rank + prefix + both verify sides
    "dd19_span_dedup",  # round 10: narrow span/sentence arrays feed keep-first + stats fold
    "dd20_semdedup_production_k",  # round 11: dd15's assignment checkpoint, shared helper
    "dd22_semdedup_two_level",  # round 11: same checkpoint in the shared verdict tail
    "dd23_semdedup_trained",  # round 12: same checkpoint, trained-codebook cells
    "dd24_incremental_semdedup",  # round 12: one-pass assignment feeds both semi-join sides
    "dd21_substring_dedup",  # round 11: narrow token/window arrays feed keep-first + stats fold
    "dq09_fd_profile_sampled",  # round 10: projected cols + hashes feed N bottom-K legs + profiles
    "st17_span_dedup_live",  # round 10: batch narrow relation feeds the stats fold twice
    "decon02_source_overlap",
    "dq06_psi_drift",
    "dq07_window_psi_drift",  # round 8: psi_surface grid checkpoint
    "ev04_rolling_wau",
    "ev14_stickiness",
    "gr01_pagerank",
    "gr02_bfs_hops",
    "gr03_triangle_stats",
    "hh01_heavy_hitter_tokens",
    "llm01_clean_corpus",
    "llm02_corpus_funnel",
    "llm04_curation_funnel",  # round 9: per-row chain + narrow-flags checkpoints
    "mix02_epoch_upsampling",  # round 8: rates-spine checkpoint
    "ret01_hybrid_rrf",
    "samp06_cluster_safe_split",
    "samp07_dsir_importance",  # round 8: token-bucket + spine checkpoints
    "tx17_lm_familiarity",
    "tx18_ppl_buckets",
    "tx19_pmi_collocations",
    "tx21_bpe_train_merges",
    "tx22_bpe_tokenize_apply",
    "tx23_corpus_laws",  # round 8: token-explode + curve checkpoints
    "tx24_tokenizer_fertility",  # round 9: same _bpe_train vocab checkpoint as tx22
    "x25_mad_outliers",
}


@dataclass(frozen=True)
class Finding:
    query: str
    node: str
    severity: str  # "hard" | "warn"
    allowed: bool
    reason: str | None


def plan_text(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _first_toplevel_arg(s: str) -> str:
    """First top-level argument of an argument list `s` that starts
    just after an opening '(' — scan paren-balanced until the first
    depth-0 ',' or the closing ')'. Needed because an argument may
    itself contain parenthesized expressions (cast(x#1 as double))
    whose inner ')' a naive [^,)]* capture would stop at."""
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                return s[:i]
            depth -= 1
        elif ch == "," and depth == 0:
            return s[:i]
    return s


def _has_global_window(plan: str) -> bool:
    """True when any windowspecdefinition in the plan has no partition
    columns. Formatted-plan grammar: the spec's arguments are
    [partition cols...], [order cols with ASC/DESC...],
    specifiedwindowframe(...) — so the spec is UNPARTITIONED exactly
    when its FIRST argument is already an order column (carries an
    ASC/DESC marker) or the frame itself (no ordering either). The
    first argument is extracted paren-balanced so composite order
    expressions — windowspecdefinition(cast(x#1 as double) ASC ... —
    don't truncate at an inner ')' and slip past the detector."""
    for m in re.finditer(r"windowspecdefinition\(\s*", plan):
        first = _first_toplevel_arg(plan[m.end():]).strip()
        if (
            first.startswith("specifiedwindowframe")
            or " ASC" in first
            or " DESC" in first
        ):
            return True
    return False


def lint_plan(name: str, plan: str) -> list[Finding]:
    findings: list[Finding] = []
    for node in HARD_NODES:
        if node in plan:
            findings.append(Finding(name, node, "hard", False, None))
    if _has_global_window(plan):
        reason = ALLOWED.get((name, "WindowGlobal"))
        findings.append(
            Finding(name, "WindowGlobal", "warn", reason is not None, reason)
        )
    # row-at-a-time Python UDFs: BatchEvalPython; Arrow variants are fine
    if re.search(r"\bBatchEvalPython\b", plan):
        findings.append(Finding(name, "BatchEvalPython", "hard", False, None))
    if "LocalTableScan" in plan and name not in LOCAL_SCAN_OK:
        findings.append(Finding(name, "LocalTableScan", "hard", False, None))
    for node in WARN_NODES:
        if node in plan:
            reason = ALLOWED.get((name, node))
            findings.append(
                Finding(name, node, "warn", reason is not None, reason)
            )
    return findings


def lint_registry(spark: SparkSession, sf_dir: str) -> list[Finding]:
    """Lint every registered query's physical plan — INCLUDING the plans
    that checkpointing would otherwise hide (round-5 advice): iterative
    operators (gr01/gr02, dd09…) truncate lineage per round, so their
    final plan is just an RDD scan. A checkpoint observer captures each
    pre-truncation DataFrame and lints it under `<name>+ckpt`, deduped
    by node kind (every round has the same shape), so the per-round
    join/shuffle anti-pattern coverage applies to iterative queries too
    instead of being a prose-documented blind spot."""
    from api_etl_pipeline_spark.checkpoint import checkpoint_observer
    from api_etl_pipeline_spark.registry import all_queries

    out: list[Finding] = []
    # Reset the session construction caches so every shared build is
    # COLD here: each group's first consumer then always captures its
    # checkpoint plans, making the lint findings (and the allowlist's
    # stale-entry check) independent of which tests happened to construct
    # a consumer earlier in this process. Seeding `groups_satisfied` from
    # live cache state instead made +ckpt coverage order-dependent — a
    # test run that warmed gr01_ranks first silently skipped gr01's
    # per-round plan lint and flagged its allowlist entries stale.
    from api_etl_pipeline_spark import _memo
    from api_etl_pipeline_spark.llm_ops import dedup as _dedup

    _memo._MEMO.clear()
    _dedup._COMPONENTS_CACHE.clear()
    groups_satisfied: set[str] = set()
    for name, spec in all_queries().items():
        captured: list[str] = []
        with checkpoint_observer(lambda df: captured.append(plan_text(df))):
            final_plan = plan_text(spec.fn(spark, sf_dir))
        out.extend(lint_plan(name, final_plan))
        groups = SHARED_CHECKPOINT_GROUPS.get(name, ())
        # non-vacuous capture guard (round-7 advice): both directions hard.
        # Shared-build members (round 14) capture only when they are the
        # process's FIRST consumer of some build; every build being
        # satisfied stands in for their own capture, and a LATER
        # all-shared member capturing means the shared cache missed —
        # flagged, so sharing can't silently break.
        if name in CHECKPOINTING_QUERIES and not captured:
            if not (groups and all(g in groups_satisfied for g in groups)):
                out.append(Finding(name, "vacuous-checkpoint-capture", "hard", False,
                                   "listed in CHECKPOINTING_QUERIES but the observer "
                                   "captured nothing — checkpoint call lost or moved "
                                   "off-thread"))
        if captured and groups:
            if (
                all(g in groups_satisfied for g in groups)
                and name not in PRIVATE_CHECKPOINT_MEMBERS
            ):
                out.append(Finding(name, "shared-build-cache-miss", "hard", False,
                                   f"captured checkpoints although shared builds "
                                   f"{groups} already ran this process — a "
                                   f"cache keyed wrong or bypassed"))
            groups_satisfied.update(groups)
        if captured and name not in CHECKPOINTING_QUERIES:
            out.append(Finding(name, "unlisted-checkpoint-capture", "hard", False,
                               "captures pre-checkpoint plans but is missing from "
                               "CHECKPOINTING_QUERIES — update the constant"))
        seen: set[tuple[str, str]] = set()
        for plan in captured:
            for f in lint_plan(f"{name}+ckpt", plan):
                if (f.query, f.node) not in seen:
                    seen.add((f.query, f.node))
                    out.append(f)
    return out


def summarize_plan(plan: str) -> dict:
    """Compact fingerprint of a physical plan for reporting: exchange
    count, join strategies, aggregate kinds, scan pushdown evidence."""
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange$", plan, flags=re.M))
    n_bcast = len(re.findall(r"^\(\d+\) BroadcastExchange$", plan, flags=re.M))
    joins = sorted(
        {
            m
            for m in re.findall(
                r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)\b",
                plan,
            )
        }
    )
    aggs = sorted(
        {m for m in re.findall(r"\b(HashAggregate|SortAggregate|ObjectHashAggregate)\b", plan)}
    )
    pushed = bool(re.search(r"PushedFilters: \[(?!\])", plan))
    python_stages = sorted(
        {
            m
            for m in re.findall(
                r"\b(MapInPandas|ArrowEvalPython\w*|BatchEvalPython\w*|FlatMapGroupsInPandas\w*)\b",
                plan,
            )
        }
    )
    return {
        "exchanges": n_exchanges,
        "broadcasts": n_bcast,
        "joins": joins,
        "aggregates": aggs,
        "pushed_filters": pushed,
        "python_stages": python_stages,
    }
