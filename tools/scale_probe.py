"""10× scale probe: replicate the big sf0.1 tables tenfold (distinct key
spaces per replica so join/group cardinalities scale too), relayout like
bench.py does, and time a representative query set at 1× vs 10×.

Run: python tools/scale_probe.py            (~a few minutes)

The ratio table this prints is the repo's local evidence that plan
shapes hold under data growth: a query whose time scales ~linearly (or
better, while its plan stays identical) is shuffle/scan-bound the way
the 100 TB design assumes; anything super-linear means a plan shape
broke (lost broadcast, sort fallback, skew) and needs a look at
.explain before trusting it at cluster scale.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from api_etl_pipeline_spark.registry import all_queries  # noqa: E402
from api_etl_pipeline_spark.session import get_spark  # noqa: E402
from api_etl_pipeline_spark.tables import TABLES, load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_scale10"
REPLICAS = 10
# key columns shifted per replica so cardinalities scale with volume
KEY_SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
BIG = set(KEY_SHIFT)
QUERIES = [
    "q01_pricing_summary",
    "q02_revenue_by_segment",
    "q18_multiway_join",
    "w04_running_sum",
    "q32_waiting_orders",
    "ev02_gaps_islands",
    "decon01_ngram_overlap",
    "shuf01_deterministic_shards",
    "sim05_ivf_probe_topk",
    "dd04_minhash_lsh_pairs",
    "tx08_tfidf_top_term",  # round-4 3-exchange rewrite: verify it scales
    "dd12_segment_dedup_clean",  # segment window: volume ∝ duplication rate
    "tx16_bm25_topk",  # map-only tf: shuffle must stay query-vocab-bounded
    "q38_funnel_steps",  # single-pass funnel fold (round-4 rewrite)
    "llm02_corpus_funnel",  # flag-based funnel audit (round-4 rewrite)
    "tx17_lm_familiarity",  # round-5: LM probe join must stay shuffle-bound
    "mm06_perceptual_hash_groups",  # round-5: narrow project + 1 hash shuffle
    "decon02_source_overlap",  # round-5 broadcast-totals rewrite
    "ret01_hybrid_rrf",  # round-5: hybrid fusion, checkpointed lex leg
    "tx18_ppl_buckets",  # round-5: tx17 + per-lang ntile window
    "samp05_weighted_reservoir",  # round-5: TakeOrdered global top-N
    "st10_interval_left_join",  # round-5: outer interval join batch twin
    "mm01_multimodal_features",  # round-5 promotion: Arrow featurizer
    "decon03_embedding_contamination",  # round-6: broadcast bench-set cosine decon
    "cur02_lang_quality_prune",  # round-6: per-lang percent_rank window
    "tx20_stopword_discovery",  # round-6: DF mining, explode-distinct shuffle
    "ev16_rfm_segments",  # round-6: rollup + chained global NTILE windows
    "dq03_benford_deviation",  # round-6: one-scan digit histogram + 9-row window
    "sim11_ann_recall_at_k",  # round-6: recall eval — both ANN legs must hold shape
    "dd13_containment_dedup",  # round-6: gram joins on LSH candidates must stay bounded
    "dq04_join_skew_profile",  # round-6: key-agg legs are the profiled shuffles themselves
    "mix02_epoch_upsampling",  # round-6: explode emission, no corpus shuffle
    "ev17_conversion_lag",  # round-6: purchase probe join must broadcast/AQE
    "inc01_rollup_merge",  # round-6: partial-agg merge — two scans, no raw shuffle growth
    "inc02_pruned_refresh",  # round-6: pruned recompute — hour-set broadcast must hold
    "tx21_bpe_train_merges",  # round-6: rounds must stay vocab-bounded after 1 corpus scan
    "stats02_rolling_anomaly",  # round-6: window rides the collapsed (type,day) relation
    "ab01_experiment_readout",  # round-6: per-user agg + 1-row conditional readout
    "ev18_linear_attribution",  # round-6: interval join on user_id must stay banded
    "cur03_snapshot_diff",  # round-6: diff shuffle moves hashes, never text
    "tx22_bpe_tokenize_apply",  # round-7: apply side must stay vocab-bounded + 2 corpus scans
    "dd14_incremental_dedup",  # round-7: delta-vs-standing probe join, bounded by delta buckets
    "dd15_semdedup_prune",  # round-7: cell self-join must stay cell-bounded
    "dq05_referential_integrity",  # round-7: per-edge joins, dims must broadcast
    "cur04_token_drift",  # round-7: token join must stay vocab-bounded
    "dq06_psi_drift",  # round-7: everything past the two 26-row aggs is constant
    "cur05_url_dedup",  # round-7: agg cascade, only URL keys shuffle (never text)
    "dq07_window_psi_drift",  # round-8: constant past the two histogram aggs
    "cur06_pii_scrub",  # round-8: per-row regex + 1 agg, text never shuffles
    "samp07_dsir_importance",  # round-8: one (doc,bucket) shuffle, ratio broadcast
    "sim12_pq_topk",  # round-8: ADC scan must stay narrow; top-k window per query
    "maint01_compaction_plan",  # round-8: one exchange serves both planner windows
    "tx23_corpus_laws",  # round-8: single corpus explode, vocab-bounded tails
    "cur07_html_main_text",  # round-9: per-row regex extraction + 1 agg, text never shuffles
    "llm04_curation_funnel",  # round-9: composed funnel — narrow flag shuffles + DSIR's (doc,bucket) shuffle
    "cur08_gopher_rules",  # round-9: per-row lambda battery + 1 agg, text never shuffles
    "dd16_lsh_recall_audit",  # round-9: fixed-stratum audit — must stay corpus-size-independent
    "dd17_lsh_geometry_sweep",  # round-9: fixed-stratum sweep — same independence claim
    "ev19_journey_patterns",  # round-9: one user_id exchange, journey fold + per-row regex
    "maint02_retention_plan",  # round-9: (type,day) agg + 1-row/policy broadcasts — metadata-bound
    "sim13_mmr_rerank",  # round-9: only candidate generation sees the corpus; greedy is (|Q|,m,k)-fixed
    "hh02_countmin_audit",  # round-9: one bigram-count shuffle; sketch/probe are vocab- then constant-bounded
    "maint03_zone_map_skip",  # round-9: one composite agg; everything after is manifest-bounded
    "tx24_tokenizer_fertility",  # round-9: tx22's vocab-bounded core + one strat-word pass
    "mix03_anneal_schedule",  # round-9: one per-source agg; schedule math on kilobytes
    "dq08_fd_profile",  # round-9: N narrow two-level aggs over one checkpointed projection
    "ret02_ann_rank_quality",  # round-9: two candidate-generation legs; eval is (|Q|,k)-fixed
    "pack03_packing_efficiency",  # round-9: pack01's shard shuffle + two manifest aggs
    "samp08_temporal_split",  # round-9: one (day, user) composite agg; rest is days+users-bounded
    "w12_time_range_window",  # round-9: one user_id exchange, linear two-pointer range frame
    "sim14_sq8_topk",  # round-9: zero-shuffle encode/score; WindowGroupLimit bounds the exchange
    "dd18_prefix_filter_join",  # round-9: prefix join must stay candidate-bounded under rarest-first order
    "dq09_fd_profile_sampled",  # round-10: bottom-K sample must pin the profile aggs at any volume
    "dd19_span_dedup",  # round-10: span-hash shuffle is the one corpus-scale exchange; text never shuffles
    "cur09_pseudonymize_ids",  # round-10: distinct-id fold + 1-row audit; only ids/pseudonyms shuffle
    "ing22_reconcile_by_hash",  # round-11: hash-compare + merge joins move (key, hash) only
    "dd20_semdedup_production_k",  # round-11: k grows with n — within-cell pairs must stay bounded
    "dd21_substring_dedup",  # round-11: dd19's triple shuffle at stride 1 — linear in tokens
    "dd22_semdedup_two_level",  # round-11: coarse-then-fine assignment must beat dd20's n*k term
    # round-12: dd22 crosses onto the broadcast+Arrow path at 10x
    # (320 KiB codebook > DD22_LITERAL_MAX_BYTES) — the ratio now
    # measures the production dispatch, not just the literal form
    "dd23_semdedup_trained",  # round-12: trained codebook — per-iteration scans + k2*d-bounded update shuffles
    "dd24_incremental_semdedup",  # round-12: verdict join must stay delta-cell-bounded, not corpus-bounded
    "sim15_ivfpq_topk",  # round-12: code scan + probe pruning must multiply, window stays query-bounded
    "cls01_quality_classifier",  # round-13: fixed train-slice agg + map-only scoring — must track the scan
    "dd25_simhash_recall_audit",  # round-14: fixed-stratum simhash audit — dd16's independence claim
    "cls02_classifier_auc_audit",  # round-14: AUC audit — distinct-score window grain must track quantization, not corpus
]


def build_10x(spark) -> None:
    marker = Path(OUT) / "_READY"
    if marker.exists():
        return
    import shutil

    shutil.rmtree(OUT, ignore_errors=True)
    Path(OUT).mkdir(parents=True)
    for name in TABLES:
        df = load_table(spark, SF_DIR, name)
        if name in BIG:
            shift = 10_000_000
            reps = []
            for i in range(REPLICAS):
                r = df
                for col in KEY_SHIFT[name]:
                    r = r.withColumn(col, F.col(col) + F.lit(i * shift))
                reps.append(r)
            out = reps[0]
            for r in reps[1:]:
                out = out.unionByName(r)
            out.repartition(32).write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
        else:
            df.write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
    marker.write_text("ok")


# fact-fact queries whose 10x growth was shuffle-dominated (~9-11x in
# the round-3 probe): re-run against a bucketed layout where both fact
# tables are bucketed+sorted on the join key, so the lineitem-orders
# edge plans with no exchange (tests/test_bucketing.py pins the shape).
BUCKET_PREFIX = "b10x_"
BUCKET_KEYS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}
BUCKETS = 32
BUCKETED_QUERIES = ["q02_revenue_by_segment", "q18_multiway_join", "w04_running_sum"]


def build_bucketed(spark) -> None:
    """Register the 10x tables in the metastore, fact tables bucketed on
    the join key. w04 is included as the honest control: its window
    partitions on l_suppkey, orthogonal to the bucket key, so bucketing
    must NOT help it — one physical sort order serves one key family."""
    if spark.catalog.tableExists(f"{BUCKET_PREFIX}lineitem"):
        return
    # the default catalog is in-memory and per-process while the
    # warehouse files persist: if a previous probe already wrote the
    # bucketed layout, re-REGISTER it as external bucketed tables (DDL,
    # instant) instead of rewriting ~600 MB right before timing.
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    marker = Path(warehouse) / f"{BUCKET_PREFIX}_READY"
    if marker.exists():
        for name in TABLES:
            loc = f"{warehouse}/{BUCKET_PREFIX}{name}"
            ddl = spark.read.parquet(loc).schema.toDDL()
            key = BUCKET_KEYS.get(name)
            clustered = (
                f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {BUCKETS} BUCKETS "
                if key
                else ""
            )
            spark.sql(
                f"CREATE TABLE {BUCKET_PREFIX}{name} ({ddl}) USING parquet "
                f"{clustered}LOCATION '{loc}'"
            )
        return
    for name in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {BUCKET_PREFIX}{name}")
        shutil.rmtree(f"{warehouse}/{BUCKET_PREFIX}{name}", ignore_errors=True)
        df = spark.read.parquet(f"{OUT}/{name}.parquet")
        writer = df.write.mode("overwrite").format("parquet")
        key = BUCKET_KEYS.get(name)
        if key is not None:
            writer = writer.bucketBy(BUCKETS, key).sortBy(key)
        writer.saveAsTable(f"{BUCKET_PREFIX}{name}")
    marker.write_text("ok")


def time_set(spark, sf_dir: str, queries=None) -> dict[str, float]:
    specs = all_queries()
    out: dict[str, float] = {}
    for name in queries or QUERIES:
        fn = specs[name].fn
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        best = None
        for _ in range(2):
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> None:
    spark = get_spark("scale-probe")
    import bench

    base_dir, _ = bench.prepare_layout(spark, SF_DIR, 32)
    build_10x(spark)
    build_bucketed(spark)
    base = time_set(spark, base_dir)
    big = time_set(spark, OUT)
    bucketed = time_set(spark, f"catalog:{BUCKET_PREFIX}", BUCKETED_QUERIES)
    # round 14 (r13 verdict task 4): the shared CC construction wall at
    # 10x — cache cleared per decade, one full dd04_components build +
    # materialization; prints edge count and which dispatch path ran
    # (CC_DRIVER_MAX_EDGES decides; a flip between decades is designed).
    from api_etl_pipeline_spark.llm_ops import dedup as _dedup

    cc = {}
    for tag, d in (("1x", base_dir), ("10x", OUT)):
        _dedup._COMPONENTS_CACHE.clear()
        _dedup.SHARED_BUILD_WALLS.clear()
        t0 = time.perf_counter()
        _dedup.dd04_components(spark, d).write.mode("overwrite").format(
            "noop"
        ).save()
        cc[tag] = round(time.perf_counter() - t0, 3)
        n_edges = _dedup.dd04_minhash_lsh_pairs(spark, d).count()
        path = (
            "driver-uf" if n_edges <= _dedup.CC_DRIVER_MAX_EDGES
            else "distributed"
        )
        print(
            f"cc_construction {tag}: {cc[tag]}s ({n_edges} edges, {path})",
            flush=True,
        )

    print(f"{'query':36s} {'1x':>8s} {'10x':>8s} {'ratio':>6s} {'10x-bkt':>8s} {'b-ratio':>7s}")
    for name in QUERIES:
        r = big[name] / base[name] if base[name] else float("inf")
        line = f"{name:36s} {base[name]:8.3f} {big[name]:8.3f} {r:6.1f}"
        if name in bucketed:
            br = bucketed[name] / base[name] if base[name] else float("inf")
            line += f" {bucketed[name]:8.3f} {br:7.1f}"
        print(line)
    ccr = cc["10x"] / cc["1x"] if cc["1x"] else float("inf")
    print(f"{'cc_construction(dd04_components)':36s} {cc['1x']:8.3f} {cc['10x']:8.3f} {ccr:6.1f}")


if __name__ == "__main__":
    main()
