"""Invariant tests for deterministic sampling and sequence packing.

The differential oracle (test_queries_oracle) already pins exact values;
these tests pin the LAWS the operators must obey so a future refactor
that happens to change both engines in the same wrong way still fails.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from api_etl_pipeline_spark.llm_ops.packing import (
    N_SHARDS,
    TOKEN_BUDGET,
    pack01_sequence_packing,
)
from api_etl_pipeline_spark.llm_ops.sampling import (
    samp01_hash_split,
    samp02_stratified_sample,
)
from api_etl_pipeline_spark.tables import load_table
from tests.conftest import SF_DIR


def test_pack_conservation_and_budget(spark):
    d = load_table(spark, SF_DIR, "documents")
    n_docs = d.count()
    packed = pack01_sequence_packing(spark, SF_DIR).cache()
    try:
        # every document packed exactly once
        assert packed.count() == n_docs
        assert packed.select("doc_id").distinct().count() == n_docs
        # no bin exceeds the budget unless it holds a single oversized doc
        bins = packed.groupBy("shard_id", "bin_id").agg(
            F.sum("n_tokens").alias("fill"), F.count("*").alias("n")
        )
        over = bins.filter(
            (F.col("fill") > TOKEN_BUDGET) & (F.col("n") > 1)
        ).count()
        assert over == 0
        # the defining next-fit property: the first doc of bin k+1 would
        # have overflowed bin k (otherwise greedy would not have opened a
        # new bin)
        firsts = (
            packed.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("shard_id", "bin_id").orderBy("doc_id")
                ),
            )
            .filter((F.col("rn") == 1) & (F.col("bin_id") > 0))
            .select("shard_id", (F.col("bin_id") - 1).alias("bin_id"),
                    F.col("n_tokens").alias("next_n"))
        )
        prev_fill = bins.select("shard_id", "bin_id", "fill")
        lazy_opens = (
            firsts.join(prev_fill, ["shard_id", "bin_id"])
            .filter(F.col("fill") + F.col("next_n") <= TOKEN_BUDGET)
            .count()
        )
        assert lazy_opens == 0
        # shard ids live in [0, N_SHARDS)
        assert packed.filter(
            (F.col("shard_id") < 0) | (F.col("shard_id") >= N_SHARDS)
        ).count() == 0
        # bin_fill is the running fill: the max fill per bin equals the sum
        eq = (
            packed.groupBy("shard_id", "bin_id")
            .agg(F.max("bin_fill").alias("mx"), F.sum("n_tokens").alias("s"))
            .filter(F.col("mx") != F.col("s"))
            .count()
        )
        assert eq == 0
    finally:
        packed.unpersist()


def test_pack_deterministic(spark):
    a = {tuple(r) for r in pack01_sequence_packing(spark, SF_DIR).collect()}
    b = {tuple(r) for r in pack01_sequence_packing(spark, SF_DIR).collect()}
    assert a == b


def test_hash_split_partition_and_stability(spark):
    d = load_table(spark, SF_DIR, "documents")
    n_docs = d.count()
    splits = {r["split"]: r for r in samp01_hash_split(spark, SF_DIR).collect()}
    assert set(splits) == {"train", "val", "test"}
    assert sum(r["n_docs"] for r in splits.values()) == n_docs
    # roughly 80/10/10 (hash uniformity; generous tolerance at 500 docs)
    assert 0.65 <= splits["train"]["n_docs"] / n_docs <= 0.92


def test_stratified_sample_rates(spark):
    d = load_table(spark, SF_DIR, "documents")
    per_lang = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    samp = samp02_stratified_sample(spark, SF_DIR)
    got = {r["lang"]: r["n"] for r in samp.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per_lang.items():
        assert got.get(lang, 0) == n // 10
    # membership is deterministic: rerun yields the identical id set
    ids1 = {r["doc_id"] for r in samp.select("doc_id").collect()}
    ids2 = {
        r["doc_id"]
        for r in samp02_stratified_sample(spark, SF_DIR).select("doc_id").collect()
    }
    assert ids1 == ids2


def test_pretrain_export_end_to_end(spark, tmp_path):
    from api_etl_pipeline_spark.llm_ops.corpus_pipeline import (
        near_dedup_keep_min,
        exact_dedup_keep_min,
        quality_gate,
        run_pretrain_export,
    )
    from api_etl_pipeline_spark.tables import load_table

    out = str(tmp_path / "export")
    m = run_pretrain_export(spark, SF_DIR, out, token_budget=64, n_shards=8)

    d = load_table(spark, SF_DIR, "documents")
    n_clean = near_dedup_keep_min(
        spark, SF_DIR, exact_dedup_keep_min(quality_gate(d))
    ).count()

    # every clean doc lands in exactly one split, once
    assert sum(s["n_docs"] for s in m["splits"].values()) == n_clean
    docs = spark.read.parquet(f"{out}/docs")
    manifest = spark.read.parquet(f"{out}/manifest")
    assert docs.count() == n_clean
    assert manifest.count() == n_clean
    assert manifest.select("doc_id").distinct().count() == n_clean
    # token conservation between docs and manifest
    a = docs.agg(F.sum("n_tokens")).collect()[0][0]
    b = manifest.agg(F.sum("n_tokens")).collect()[0][0]
    assert a == b
    # no window over budget unless it is a single oversized doc
    over = (
        manifest.groupBy("split", "shard_id", "bin_id")
        .agg(F.sum("n_tokens").alias("fill"), F.count("*").alias("n"))
        .filter((F.col("fill") > 64) & (F.col("n") > 1))
        .count()
    )
    assert over == 0
    # split partitioning exists on disk
    import os

    assert os.path.isdir(f"{out}/docs/split=train")
    assert os.path.isdir(f"{out}/manifest/split=train")


def test_samp04_temperature_mix_invariants(spark):
    """The temperature mix must be a probability distribution that
    conserves the token budget and flattens toward small sources:
    sum(temp_prob) == 1, sum(epochs * source_chars) == budget, and any
    source smaller than the mean gets epochs > 1 (upsampled) while the
    largest source gets epochs < 1 iff its natural share exceeds its
    temperature share."""
    from api_etl_pipeline_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    rows = (
        all_queries()["samp04_temperature_mix"].fn(spark, SF_SMOKE).collect()
    )
    assert len(rows) > 1
    budget = sum(r.source_chars for r in rows)
    assert abs(sum(r.temp_prob for r in rows) - 1.0) < 1e-12
    assert abs(sum(r.epochs * r.source_chars for r in rows) - budget) < 1e-6 * budget
    for r in rows:
        # alpha=0.5 orders epochs opposite to size: smaller -> more epochs
        assert (r.epochs > 1.0) == (r.temp_prob > r.natural_share)
