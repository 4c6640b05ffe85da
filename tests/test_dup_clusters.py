"""dd09 connected components must equal a driver-side union-find over the
same candidate pairs (cluster membership AND sizes)."""

from __future__ import annotations

from api_etl_pipeline_spark.registry import all_queries
from tests.conftest import SF_SMOKE

_Q = all_queries()


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {x: find(x) for x in parent}


def test_dd09_matches_union_find(spark):
    pairs = [
        (r.doc_a, r.doc_b)
        for r in _Q["dd04_minhash_lsh_pairs"].fn(spark, SF_SMOKE).collect()
    ]
    assert pairs, "no candidate pairs at smoke sf — test would be vacuous"
    want = _union_find(pairs)

    got = {
        r.doc_id: (r.cluster_keeper, r.cluster_size)
        for r in _Q["dd09_dup_clusters"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    from collections import Counter

    sizes = Counter(want.values())
    for doc, root in want.items():
        keeper, size = got[doc]
        assert keeper == root, f"doc {doc}: keeper {keeper} != {root}"
        assert size == sizes[root], f"doc {doc}: size {size} != {sizes[root]}"
