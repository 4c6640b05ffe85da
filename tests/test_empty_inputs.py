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
