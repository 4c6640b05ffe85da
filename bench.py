"""Benchmark runner — the driver's per-round feedback loop.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the `noop` sink (full execution, no
collect-to-driver cost). A warmup query amortizes JVM/codegen startup so
the numbers reflect plan execution, not session spin-up.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from api_etl_pipeline_spark.registry import all_queries  # noqa: E402
from api_etl_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_segment",
    "q06_agg_filter",
    "q07_outer_join_histogram",
    "q18_multiway_join",
    "w01_topk_per_group",
    "w04_running_sum",
    "x01_hash_functions",
    "x08_split_explode",
]

# later-milestone queries join the headline set once registered
OPTIONAL = [
    "dd01_exact_dup_groups",
    "dd04_minhash_lsh_pairs",
    "dd06_simhash",
    "sim01_cosine_topk",
    "sim04_ivf_assign",
    "tx02_quality_score",
    "tx05_bigram_freq",
    "st01_tumbling_window",
    "st03_sessionization",
    "q21_asof_join",
    "q22_range_join",
    "ing01_dedup_insert",
    "llm01_clean_corpus",
    "llm02_corpus_funnel",
    "q32_waiting_orders",
    "sim05_ivf_probe_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    specs = all_queries()
    names = [n for n in HEADLINE + OPTIONAL if n in specs]

    # warmup: run the flagship once to pay session/codegen startup
    specs[HEADLINE[0]].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
