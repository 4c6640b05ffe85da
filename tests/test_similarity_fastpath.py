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


def test_sim09_kmeans_matches_numpy_reference(spark):
    """sim09 is rows-only (iterative float means); pin its semantics
    against an independent numpy implementation of the same algorithm:
    seeds = first 8 vectors, 3 Lloyd iterations, L2², argmin ties to the
    lowest cluster id."""
    import numpy as np

    from api_etl_pipeline_spark.tables import load_table

    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    rows = sorted(e.collect(), key=lambda r: r["vec_id"])
    X = np.asarray([[float(x) for x in r["embedding"]] for r in rows])
    cents = X[:8].copy()
    for _ in range(3):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin returns FIRST min → lowest cid
        for c in range(8):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    want_counts = {c: int((assign == c).sum()) for c in range(8) if (assign == c).any()}
    want_inertia = float(d2.min(axis=1).sum())

    got = {
        r["cluster_id"]: (r["n_members"], r["inertia"])
        for r in _Q["sim09_kmeans_train"].fn(spark, SF_DIR).collect()
    }
    assert {c: n for c, (n, _) in got.items()} == want_counts
    assert math.isclose(sum(i for _, i in got.values()), want_inertia, rel_tol=1e-9)
