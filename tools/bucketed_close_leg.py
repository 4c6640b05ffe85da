"""Round-close bucketed-catalog leg (round-6 verdict task 6).

The bucketed-SMJ-zero-exchange capability has existed since round 4
(`catalog:` scheme in tables.load_table, pinned by
tests/test_bucketing.py), but every round-close leg ran on path-loaded
parquet. This leg drives REGISTERED QUERIES through the bucketed
metastore layout end-to-end:

1. registers all sf0.01 tables in the session catalog under a
   `bclose_` prefix — lineitem/orders bucketed+sorted on the order
   key, documents bucketed on doc_id, the rest plain;
2. runs q18_multiway_join and dd04_minhash_lsh_pairs against
   `catalog:bclose_` AND against the plain path layout, with
   autoBroadcastJoinThreshold=-1 on both sides so the static join
   shapes are comparable;
3. asserts the bucketed plan has STRICTLY FEWER exchanges
   (checkpoint-aware: pre-truncation subplans are counted, same as
   PLANS.md) and that both layouts return identical rows.

Exit 0 iff both queries drop exchanges and match. Run standalone:
    python tools/bucketed_close_leg.py
or via tools/round_close.py (always-on leg).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"
PREFIX = "bclose_"
BUCKETS = 8
BUCKET_KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    # doc_id bucketing pre-distributes the shingle->signature aggregation:
    # explode preserves the scan's hash distribution, so dd04's
    # groupBy(doc_id) plans with no exchange
    "documents": "doc_id",
}
QUERIES = ["q18_multiway_join", "dd04_minhash_lsh_pairs"]


def build_catalog(spark) -> None:
    import shutil

    from api_etl_pipeline_spark.tables import TABLES, load_table

    # the session catalog is in-memory and per-process, but managed-table
    # FILES persist in the warehouse dir: a previous run's leftovers make
    # saveAsTable fail with LOCATION_ALREADY_EXISTS even after the
    # (no-op) DROP — clear both, catalog entry AND location
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}{name}")
        shutil.rmtree(f"{warehouse}/{PREFIX}{name}", ignore_errors=True)
        df = load_table(spark, SF_DIR, name)
        writer = df.write.mode("overwrite").format("parquet")
        key = BUCKET_KEYS.get(name)
        if key is not None:
            writer = writer.bucketBy(BUCKETS, key).sortBy(key)
        writer.saveAsTable(f"{PREFIX}{name}")


def exchanges_of(spark, fn, sf_dir: str) -> tuple[int, list]:
    """Checkpoint-aware exchange count + collected rows for one run."""
    from api_etl_pipeline_spark.checkpoint import checkpoint_observer
    from api_etl_pipeline_spark.ops.plan_lint import plan_text, summarize_plan

    captured: list[str] = []
    with checkpoint_observer(lambda df: captured.append(plan_text(df))):
        df = fn(spark, sf_dir)
        plan = plan_text(df)
        rows = df.collect()
    n = summarize_plan(plan)["exchanges"] + sum(
        summarize_plan(p)["exchanges"] for p in captured
    )
    return n, rows


def main() -> int:
    from api_etl_pipeline_spark.registry import all_queries
    from api_etl_pipeline_spark.session import get_spark

    spark = get_spark("bucketed-close-leg")
    build_catalog(spark)
    specs = all_queries()
    # pin the static join shape on BOTH layouts (the tiny sf0.01 dims
    # would otherwise broadcast everywhere and mask the bucketing win)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ok = True
    try:
        for name in QUERIES:
            fn = specs[name].fn
            n_path, rows_path = exchanges_of(spark, fn, SF_DIR)
            n_cat, rows_cat = exchanges_of(spark, fn, f"catalog:{PREFIX}")
            same = sorted(map(tuple, rows_path)) == sorted(map(tuple, rows_cat))
            dropped = n_cat < n_path
            status = "PASS" if (same and dropped) else "FAIL"
            print(
                f"[{status}] {name}: exchanges path={n_path} bucketed={n_cat} "
                f"(drop {'yes' if dropped else 'NO'}), rows "
                f"{'identical' if same else 'DIFFER'} ({len(rows_path)})"
            )
            ok = ok and same and dropped
    finally:
        import shutil

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        from api_etl_pipeline_spark.tables import TABLES

        for name in TABLES:
            spark.sql(f"DROP TABLE IF EXISTS {PREFIX}{name}")
            shutil.rmtree(f"{warehouse}/{PREFIX}{name}", ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
