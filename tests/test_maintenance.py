"""Small-file compaction + end-to-end corpus workload.

Compaction correctness = content-identity under rewrite (the multiset of
rows is unchanged) + the file count actually dropping to the plan's
target. The workload test pins the funnel counts against the already
oracle-verified llm02 query, so the runner can't drift from the verified
pipeline semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from api_etl_pipeline_spark.ops.maintenance import compact, list_data_files, plan_compaction
from api_etl_pipeline_spark.tables import load_table
from tests.conftest import SF_DIR


def test_compact_merges_small_files(spark, tmp_path):
    src = str(tmp_path / "shattered")
    out = str(tmp_path / "compacted")
    docs = load_table(spark, SF_DIR, "documents")
    docs.repartition(16).write.parquet(src)
    assert len(list_data_files(spark, src)) == 16

    plan = plan_compaction(spark, src, target_file_bytes=1 << 30)
    assert plan["n_files"] == 16 and plan["planned_files"] == 1 and plan["worth_compacting"]

    stats = compact(spark, src, out, target_file_bytes=1 << 30)
    assert stats["files_after"] == 1

    before, after = spark.read.parquet(src), spark.read.parquet(out)
    assert before.count() == after.count()
    assert before.exceptAll(after).count() == 0
    assert after.exceptAll(before).count() == 0


def test_compact_shuffle_rebalances(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    load_table(spark, SF_DIR, "documents").repartition(8).write.parquet(src)
    stats = compact(spark, src, out, target_file_bytes=1 << 30, shuffle=True)
    assert stats["files_after"] == 1
    assert spark.read.parquet(out).count() == spark.read.parquet(src).count()


def test_corpus_workload_matches_funnel_oracle(spark, tmp_path):
    from api_etl_pipeline_spark.llm_ops.corpus_pipeline import (
        llm02_corpus_funnel,
        run_corpus_workload,
    )

    out = str(tmp_path / "clean")
    metrics = run_corpus_workload(spark, SF_DIR, out)
    funnel = llm02_corpus_funnel(spark, SF_DIR).collect()[0]
    for k in ("n_input", "n_quality", "n_exact_unique", "n_clean"):
        assert metrics[k] == funnel[k]

    written = spark.read.parquet(out)
    assert written.count() == metrics["n_clean"]
    # lang is the partition column; the survivors keep their enrichments
    assert {"doc_id", "fingerprint", "n_tokens", "lang"} <= set(written.columns)
    # partition pruning works: one lang's slice reads without full scan
    langs = [r["lang"] for r in written.select("lang").distinct().collect()]
    assert len(langs) >= 1
    one = written.filter(F.col("lang") == langs[0]).count()
    assert 0 < one <= metrics["n_clean"]


def test_compact_cluster_by_preserves_content_and_sorts_files(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "clustered")
    load_table(spark, SF_DIR, "orders").repartition(8).write.parquet(src)
    stats = compact(
        spark, src, out, target_file_bytes=1 << 30, shuffle=True,
        cluster_by=["o_orderdate"],
    )
    assert stats["files_after"] >= 1
    before, after = spark.read.parquet(src), spark.read.parquet(out)
    assert before.exceptAll(after).count() == 0
    assert after.exceptAll(before).count() == 0
    # rows inside each output file are ordered by the cluster column, so
    # the file's min/max stats are tight (per-partition monotonicity)
    from pyspark.sql import Window

    part_ordered = after.select(
        "o_orderdate",
        F.spark_partition_id().alias("pid"),
        F.lag("o_orderdate").over(
            Window.partitionBy(F.spark_partition_id()).orderBy(F.monotonically_increasing_id())
        ).alias("prev"),
    )
    violations = part_ordered.filter(F.col("prev") > F.col("o_orderdate")).count()
    assert violations == 0


def test_zorder_compact_preserves_content_and_tiles_space(spark, tmp_path):
    from api_etl_pipeline_spark.ops.maintenance import zorder_compact

    src = str(tmp_path / "src")
    out = str(tmp_path / "zout")
    # stage orders as a multi-file table so the rewrite has real input
    orders = load_table(spark, SF_DIR, "orders")
    orders.repartition(4).write.parquet(src)

    stats = zorder_compact(
        spark, src, out, cols=["o_custkey", "o_orderdate"],
        # small target so several output files exist at sf0.01
        target_file_bytes=64 << 10,
    )
    assert stats["files_after"] >= 4

    # content identity under rewrite
    a = spark.read.parquet(src)
    b = spark.read.parquet(out)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # every file is a tile: per-file spans on BOTH columns are well below
    # the full domain (single-key sort would leave one at ~full span)
    import glob

    spans = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        st = (
            spark.read.parquet(f)
            .agg(
                (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
                (F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))).alias("dd"),
            )
            .collect()[0]
        )
        spans.append((st["ck"], st["dd"]))
    full = (
        spark.read.parquet(src)
        .agg(
            (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
            (F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))).alias("dd"),
        )
        .collect()[0]
    )
    avg_ck = sum(s[0] for s in spans) / len(spans)
    avg_dd = sum(s[1] for s in spans) / len(spans)
    assert avg_ck < full["ck"] * 0.8
    assert avg_dd < full["dd"] * 0.8


def test_bench_layout_preserves_tables(spark):
    """bench.prepare_layout rewrites every table (range-clustered,
    multi-file); a bug there would silently corrupt every benchmark
    number. Pin: same row count and same value multiset per table at
    sf0.001, and the file fan-out matches the sizing formula."""
    from pathlib import Path

    import bench
    from api_etl_pipeline_spark.tables import TABLES, load_table

    sf_dir = "/root/testdata/sf0.001"
    bdir, _ = bench.prepare_layout(spark, sf_dir, 8)
    for name in TABLES:
        a = load_table(spark, sf_dir, name)
        b = load_table(spark, bdir, name)
        assert a.count() == b.count(), name
        # order-insensitive multiset equality (full-width is fine at sf0.001)
        assert a.exceptAll(b).count() == 0, name
        assert b.exceptAll(a).count() == 0, name
    n_docs = load_table(spark, sf_dir, "documents").count()
    expected = max(1, min(8, n_docs // bench._ROWS_PER_FILE_BY_TABLE["documents"]))
    n_files = len(
        [p for p in Path(f"{bdir}/documents.parquet").glob("part-*") if p.is_file()]
    )
    assert n_files == expected, f"documents split {n_files} != {expected}"
