"""Degenerate-input robustness: representative queries from every family
must run (not crash) on completely EMPTY tables and return no rows —
the 100 TB analog is an empty partition or an all-filtered scan, which
must never take down a job."""

from __future__ import annotations

import pytest

from api_etl_pipeline_spark.registry import all_queries
from api_etl_pipeline_spark.tables import TABLES, load_table
from tests.conftest import SF_SMOKE

_REPRESENTATIVE = [
    "q01_pricing_summary",      # grouped agg
    "q18_multiway_join",        # star join
    "q39_shipping_priority",    # topk
    "w04_running_sum",          # window
    "ev02_gaps_islands",        # lag + running sum + group
    "tx01_token_stats",         # text projection
    "dd03_minhash_signatures",  # explode + hash agg
    "sim01_cosine_topk",        # vector fold + window
    "x15_list_aggregation",     # collect_list
    "q48_range_join_banded",    # banded interval join
    "dd11_repeated_substrings",  # winnowed fingerprints (round 4)
    "tx15_rare_term_ratio",      # corpus-df join (round 4)
    "dd12_segment_dedup_clean",  # segment window + rollup (round 4)
    "tx16_bm25_topk",            # stats broadcast + rank (round 4)
    "ev13_time_weighted_value",  # lead window + folded rollup (round 4)
    "st08_enriched_segment_windows",  # dim join + windowed agg (round 4)
    "sim10_random_projection",   # literal-matrix scan-project (round 4)
    "dq07_window_psi_drift",     # fixed-spine PSI vs empty baseline (round 8)
    "cur06_pii_scrub",           # regex scrub audit (round 8)
    "samp07_dsir_importance",    # hashed-feature log-weights (round 8)
    "sim12_pq_topk",             # PQ: degenerate codebook guard (round 8)
    "maint01_compaction_plan",   # compaction planner over empty manifest (round 8)
    "st14_streaming_sync_live",  # composed sync: empty base + empty stream (round 8)
    # (ing21 deliberately absent: its input is the fixture transport,
    # not a table — it returns 4 provider rows regardless of SF data)
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        load_table(spark, SF_SMOKE, t).limit(0).write.mode("overwrite").parquet(
            str(out / f"{t}.parquet")
        )
    return str(out)


@pytest.mark.parametrize("name", _REPRESENTATIVE)
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    df = all_queries()[name].fn(spark, empty_sf_dir)
    assert df.count() == 0
