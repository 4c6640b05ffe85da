"""Per-query timing harness for the optimization loop (round 14).

Times construction (fn() call) and execution (noop sink) separately for
the named queries, min-of-N, on the SAME compacted layout bench.py uses.

    python tools/time_query.py [-n RUNS] [--raw] [--explain DIR] name [name ...]

Prints one line per query: name, construction min, exec min (seconds).
With --explain DIR, also writes DIR/<name>.txt with .explain("formatted")
output (the plans/r14 before/after capture).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from api_etl_pipeline_spark.registry import all_queries  # noqa: E402
from api_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--raw", action="store_true", help="bench the raw layout")
    ap.add_argument("--explain", default=None, help="dir for explain captures")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("time-query")
    if args.raw:
        bench_dir = sf_dir
    else:
        from bench import prepare_layout

        bench_dir, prep = prepare_layout(spark, sf_dir, cpus)
        if prep:
            print(f"# layout prepared in {prep}s", file=sys.stderr)

    specs = all_queries()
    unknown = [n for n in args.names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    # page-cache warm + JVM warmup (mirrors bench.py)
    from api_etl_pipeline_spark.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, bench_dir, t).write.mode("overwrite").format("noop").save()
    specs["q01_pricing_summary"].fn(spark, bench_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    for name in args.names:
        spark.sparkContext.setJobDescription(name)
        cbest = best = None
        for _ in range(args.n):
            c0 = time.perf_counter()
            df = specs[name].fn(spark, bench_dir)
            c1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t1 = time.perf_counter()
            cbest = min(cbest, c1 - c0) if cbest is not None else c1 - c0
            best = min(best, t1 - c1) if best is not None else t1 - c1
        print(f"{name}  construction={cbest:.3f}  exec={best:.3f}", flush=True)
        if args.explain:
            out = Path(args.explain)
            out.mkdir(parents=True, exist_ok=True)
            from api_etl_pipeline_spark.ops.plan_lint import plan_text

            df = specs[name].fn(spark, bench_dir)
            (out / f"{name}.txt").write_text(plan_text(df))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
