"""Round-14 operator pins: dd25 (simhash-Hamming recall audit)
replayed in a pure-Python third engine plus its confusion-matrix
identities, and the shared dd04_components build's cache semantics."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from api_etl_pipeline_spark.registry import all_queries

SF_01 = "/root/testdata/sf0.01"


def _py_dd25(sf_dir: str):
    """Third-engine replay of dd25 from the raw parquet: the dd16
    derived corpus (orig + every-5th-token mutant), dd06's 16-bit
    simhash (md5 hex digit >= '8' votes), exact shingle-Jaccard truth
    (inter*5 >= union), Hamming via int popcount — no Spark, no
    DuckDB."""
    from api_etl_pipeline_spark.llm_ops.dedup import (
        _SIMHASH_BITS,
        DD16_DROP_EVERY,
        DD16_STRATUM,
        DD25_MAX_HAMMING,
    )

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        f"WHERE doc_id < {DD16_STRATUM} ORDER BY doc_id"
    ).fetchall()
    derived = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        derived[doc_id * 2] = toks
        derived[doc_id * 2 + 1] = [
            t for i, t in enumerate(toks, start=1) if i % DD16_DROP_EVERY != 0
        ]

    def shingles(toks):
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else None

    def simhash(toks):
        sums = [0] * _SIMHASH_BITS
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            for j in range(_SIMHASH_BITS):
                sums[j] += 1 if h[j] >= "8" else -1
        return sum(1 << j for j in range(_SIMHASH_BITS) if sums[j] > 0)

    sh = {d: s for d, t in derived.items() if (s := shingles(t)) is not None}
    hsh = {d: simhash(t) for d, t in derived.items()}
    ids = sorted(sh)
    out = {}
    for t in range(DD25_MAX_HAMMING):
        np_ = td = nc = tp = fn = fp = 0
        checksum = 0
        for i, da in enumerate(ids):
            for db in ids[i + 1 :]:
                np_ += 1
                inter = len(sh[da] & sh[db])
                un = len(sh[da]) + len(sh[db]) - inter
                is_dup = inter * 5 >= un
                is_cand = bin(hsh[da] ^ hsh[db]).count("1") <= t
                td += is_dup
                nc += is_cand
                tp += is_dup and is_cand
                fn += is_dup and not is_cand
                fp += is_cand and not is_dup
                if is_dup and not is_cand:
                    checksum += da * 10000 + db
        out[t] = (np_, td, nc, tp, fn, fp, checksum)
    return out


def test_dd25_matches_python_replay(spark):
    got = {
        r.hamming_threshold: (
            r.n_pairs,
            r.n_true_dups,
            r.n_candidates,
            r.n_true_positives,
            r.n_false_negatives,
            r.n_false_positives,
            r.missed_pair_checksum,
            r.recall,
            r.precision,
        )
        for r in all_queries()["dd25_simhash_recall_audit"]
        .fn(spark, SF_01)
        .collect()
    }
    want = _py_dd25(SF_01)
    assert set(got) == set(want)
    for t, (np_, td, nc, tp, fn, fp, checksum) in want.items():
        row = got[t]
        assert row[:7] == (np_, td, nc, tp, fn, fp, checksum), t
        assert row[7] == pytest.approx(tp / td, abs=1e-6)
        assert row[8] == pytest.approx((tp / nc) if nc else 0.0, abs=1e-6)


def test_dd25_identities_and_monotonicity(spark):
    """Confusion-matrix identities per threshold (tp+fn = truth,
    tp+fp = candidates) and monotonicity in the threshold (growing the
    Hamming ball can only add candidates, so recall is nondecreasing
    and the missed set shrinks) — the invariants a refactor of the
    sweep must keep."""
    rows = sorted(
        all_queries()["dd25_simhash_recall_audit"].fn(spark, SF_01).collect(),
        key=lambda r: r.hamming_threshold,
    )
    assert [r.hamming_threshold for r in rows] == [0, 1, 2, 3, 4]
    for r in rows:
        assert r.n_true_positives + r.n_false_negatives == r.n_true_dups
        assert r.n_true_positives + r.n_false_positives == r.n_candidates
        assert r.n_pairs == rows[0].n_pairs  # same lattice every row
    for a, b in zip(rows, rows[1:]):
        assert b.n_candidates >= a.n_candidates
        assert b.recall >= a.recall
        assert b.n_false_negatives <= a.n_false_negatives
    # the audit must not be vacuous: some true dups and some misses at
    # the dd07 production threshold (otherwise the instrument reads 1.0
    # for free and measures nothing)
    at3 = rows[3]
    assert at3.n_true_dups > 0
    assert 0.0 < at3.recall <= 1.0


def test_dd04_components_cache_reuse(spark):
    """The shared components map (r13 verdict task 2a) must return the
    SAME DataFrame object for repeated (session, sf, geometry) calls —
    consumers share one build — and record its build wall exactly once
    per key."""
    from api_etl_pipeline_spark.llm_ops import dedup

    dedup._COMPONENTS_CACHE.clear()
    dedup.SHARED_BUILD_WALLS.clear()
    a = dedup.dd04_components(spark, SF_01)
    b = dedup.dd04_components(spark, SF_01)
    assert a is b
    assert list(dedup.SHARED_BUILD_WALLS) == ["dd04_components[sf0.01]"]
    wall = dedup.SHARED_BUILD_WALLS["dd04_components[sf0.01]"]
    c = dedup.dd04_components(spark, SF_01)
    assert c is a
    assert dedup.SHARED_BUILD_WALLS["dd04_components[sf0.01]"] == wall
