"""sim06 (vectorized matmul ANN) must return exactly sim01's neighbors.

sim01 is the oracle-checked sequential-fold baseline; sim06 is the
Arrow/numpy throughput path whose cosines may differ in the last ulp but
whose ranking (and therefore neighbor sets) must not."""

from __future__ import annotations

import math

from api_etl_pipeline_spark.registry import all_queries
from tests.conftest import SF_DIR

_Q = all_queries()


def test_sim06_matches_sim01_neighbors(spark):
    base = {
        (r["query_id"], r["rn"]): (r["neighbor_id"], r["cosine"])
        for r in _Q["sim01_cosine_topk"].fn(spark, SF_DIR).collect()
    }
    fast = {
        (r["query_id"], r["rn"]): (r["neighbor_id"], r["cosine"])
        for r in _Q["sim06_matmul_topk"].fn(spark, SF_DIR).collect()
    }
    assert base.keys() == fast.keys()
    for key, (nid, cos) in base.items():
        fnid, fcos = fast[key]
        assert fnid == nid, f"{key}: neighbor {fnid} != baseline {nid}"
        assert math.isclose(fcos, cos, abs_tol=1e-9), f"{key}: cosine drift"
