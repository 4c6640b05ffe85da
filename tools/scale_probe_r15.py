"""Round-15 focused 10x probe: the queries this round touched, plus the
10x rows the r14 verdict asked for (dd09/dd10's window form, the shared
lsh_bands / sim01_truth build walls).

Run: python tools/scale_probe_r15.py   (~a few minutes; reuses the
standard 10x replica set from tools/scale_probe.py, building it on
first use)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from scale_probe import OUT, SF_DIR, build_10x, time_set  # noqa: E402

from api_etl_pipeline_spark.session import get_spark  # noqa: E402

QUERIES = [
    "x26_weighted_median",  # r15 two-phase exact weighted median
    "dd18_prefix_filter_join",  # r15 checkpointed prefix index + dispatch
    "decon01_ngram_overlap",  # r15 gram-hash dispatch (string arm at 10x unless >64MB)
    "dq05_referential_integrity",  # r15 single lineitem projection
    "ret02_ann_rank_quality",  # r15 shared truth consumer
    "sim11_ann_recall_at_k",  # r15 shared truth consumer
    "dd09_dup_clusters",  # r14 window-form cluster sizes (verdict item 8)
    "dd10_keep_best_dedup",  # r14 window-form keeper argmax (verdict item 8)
    "samp06_cluster_safe_split",  # r14 aggregate rewrite, r15 re-pin
]


def shared_build_walls(spark, tag: str, d: str) -> dict[str, float]:
    """Cold one-time build walls per decade: clear the session memos,
    then force each shared build this round touches and read the
    recorded walls."""
    from api_etl_pipeline_spark import _memo
    from api_etl_pipeline_spark.llm_ops import dedup, similarity

    _memo._MEMO.clear()
    _memo.SHARED_BUILD_WALLS.clear()
    dedup._COMPONENTS_CACHE.clear()
    dedup.SHARED_BUILD_WALLS.clear()
    t0 = time.perf_counter()
    dedup.dd04_bands(spark, d)  # eager: materializes inside the builder
    lsh = time.perf_counter() - t0
    t0 = time.perf_counter()
    similarity._sim01_truth(spark, d)
    truth = time.perf_counter() - t0
    walls = dict(_memo.SHARED_BUILD_WALLS)
    walls.update(dedup.SHARED_BUILD_WALLS)
    print(f"[{tag}] lsh_bands cold build: {lsh:.3f}s  sim01_truth: {truth:.3f}s")
    print(f"[{tag}] recorded walls: { {k: round(v, 3) for k, v in walls.items()} }")
    return {"lsh_bands": round(lsh, 3), "sim01_truth": round(truth, 3)}


def main() -> None:
    spark = get_spark("scale-probe-r15")
    import bench

    base_dir, _ = bench.prepare_layout(spark, SF_DIR, 32)
    build_10x(spark)
    # JVM/codegen + page-cache warmup BEFORE the cold-build walls: the
    # first probe run measured the 1x builds in a cold JVM and read
    # 12.9 s for a build that times 3-4 s warm — bench.py's warmup
    # discipline applies to build walls too.
    from api_etl_pipeline_spark.registry import all_queries
    from api_etl_pipeline_spark.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, base_dir, t).write.mode("overwrite").format("noop").save()
    all_queries()["q01_pricing_summary"].fn(spark, base_dir).write.mode(
        "overwrite"
    ).format("noop").save()
    w1 = shared_build_walls(spark, "1x", base_dir)
    base = time_set(spark, base_dir, QUERIES)
    w10 = shared_build_walls(spark, "10x", OUT)
    big = time_set(spark, OUT, QUERIES)
    print(f"{'query':34s} {'1x':>8s} {'10x':>8s} {'ratio':>7s}")
    for n in QUERIES:
        r = big[n] / base[n] if base[n] else float("nan")
        print(f"{n:34s} {base[n]:8.3f} {big[n]:8.3f} {r:7.2f}")
    for k in w1:
        r = w10[k] / w1[k] if w1[k] else float("nan")
        print(f"build:{k:28s} {w1[k]:8.3f} {w10[k]:8.3f} {r:7.2f}")


if __name__ == "__main__":
    main()
