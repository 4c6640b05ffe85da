"""Round-10 operator tests: ev19's bounded-history guard, dq09's sampled
FD profile, dd19's span-level exact dedup (the C4 three-sentence rule)."""

from __future__ import annotations

import hashlib
import re

import pytest

from api_etl_pipeline_spark.registry import all_queries
from tests.conftest import SF_DIR
from tests.oracle import compare


def _write_events(tmp_path, rows):
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmp_path / "evdata"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    return d


def test_ev19_cap_and_overflow(spark, tmp_path):
    """The round-10 bounded-history guard: a user with more than EV19_CAP
    events gets a journey of EXACTLY the first EV19_CAP events (by
    (ts, event_id) order — pinned via the md5 checksum of the expected
    prefix) plus an exact overflow count; an under-cap user is untouched
    (n_overflow == 0). Both engines agree on the capped semantics — the
    oracle runs on the same over-cap fixture."""
    import duckdb
    import pandas as pd

    from api_etl_pipeline_spark.ops.events_analytics import EV19_CAP

    n_over = 37
    base = pd.Timestamp("2024-01-01")
    types = ["view", "click", "purchase", "error", "signup"]
    rows = [
        (i + 1, base + pd.Timedelta(seconds=i), 1, types[i % 5], 1.0)
        for i in range(EV19_CAP + n_over)
    ]
    rows += [
        (10_000 + i, base + pd.Timedelta(seconds=i), 2, "click", 1.0)
        for i in range(10)
    ]
    d = _write_events(tmp_path, rows)
    spec = all_queries()["ev19_journey_patterns"]
    df = spec.fn(spark, str(d))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    compare(df, con, spec.oracle)
    got = {r.user_id: r for r in df.collect()}
    assert got[1].journey_len == EV19_CAP
    assert got[1].n_overflow == n_over
    assert got[2].journey_len == 10 and got[2].n_overflow == 0
    # the capped journey must be the FIRST cap events in order, not an
    # arbitrary subset — pin via the checksum of the expected prefix
    expected_journey = ("vcpes" * (EV19_CAP // 5 + 1))[:EV19_CAP]
    assert got[1].journey_checksum == int(
        hashlib.md5(expected_journey.encode()).hexdigest()[:8], 16
    )
    assert got[2].max_click_run == 10


def test_dq09_sample_consistent_with_exact(spark):
    """dq09's sampled verdicts must be CONSISTENT with dq08's exact
    mining: a violation found in the sample is a real violation
    (witnesses are exhibited, never inferred), so sample max_fanout ≤
    exact max_fanout, sample n_violating > 0 implies exact n_violating
    > 0, and exact is_fd implies sampled is_fd. The sample is also
    corpus-size-bounded (≤ DQ09_GROUPS groups) and deterministic
    (two runs, identical rows)."""
    from api_etl_pipeline_spark.ops.quality import DQ09_GROUPS

    qs = all_queries()
    exact = {
        (r.lhs_col, r.rhs_col): r
        for r in qs["dq08_fd_profile"].fn(spark, SF_DIR).collect()
    }
    run1 = sorted(
        qs["dq09_fd_profile_sampled"].fn(spark, SF_DIR).collect(),
        key=lambda r: (r.lhs_col, r.rhs_col),
    )
    run2 = sorted(
        qs["dq09_fd_profile_sampled"].fn(spark, SF_DIR).collect(),
        key=lambda r: (r.lhs_col, r.rhs_col),
    )
    assert run1 == run2 and run1
    for s in run1:
        assert 0 < s.n_sample_groups <= DQ09_GROUPS
        e = exact[(s.lhs_col, s.rhs_col)]
        assert s.n_sample_groups <= e.n_groups
        assert s.max_fanout <= e.max_fanout
        if s.n_violating > 0:
            assert e.n_violating > 0
        if e.is_fd:
            assert s.is_fd_sample


def test_dq09_plan_is_bounded(spark):
    """The bottom-K set must come back as a BROADCAST to the group
    filter (never a shuffle join), and the plan must contain no
    cartesian product — the shape claims in the docstring."""
    from api_etl_pipeline_spark.ops.plan_lint import plan_text

    df = all_queries()["dq09_fd_profile_sampled"].fn(spark, SF_DIR)
    txt = plan_text(df)
    assert "BroadcastHashJoin" in txt
    assert "CartesianProduct" not in txt
    assert "SortMergeJoin" not in txt


def _dd19_python_replay(docs: list[tuple[int, str]]) -> dict[int, tuple]:
    """Plain-Python replay of dd19's full pipeline (injection, block
    sentences, span hashing, global keep-first, C4 removal footprint) —
    the third engine, independent of both Spark and DuckDB."""
    from api_etl_pipeline_spark.llm_ops.dedup import (
        _DD19_A_OFF,
        _DD19_B_OFF,
        DD19_INJECT_A,
        DD19_INJECT_B,
        DD19_SENT_WORDS as W,
    )

    def h48(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    corpus: list[tuple[int, list[str]]] = []
    for doc_id, text in docs:
        # match the engines' ' +' split AND space-only trim() — .strip(' '),
        # not .strip(), which would also eat tab/newline the engines keep
        words = re.split(r" +", text.strip(" "))
        corpus.append((doc_id, words))
        if doc_id < DD19_INJECT_A:
            corpus.append(
                (doc_id + _DD19_A_OFF, words[: max(1, (len(words) * 3) // 5)])
            )
        elif doc_id < DD19_INJECT_B:
            corpus.append(
                (
                    doc_id + _DD19_B_OFF,
                    words + [f"zq{doc_id}x{j}" for j in range(25)],
                )
            )
    seen: set[int] = set()
    out: dict[int, tuple] = {}
    per_doc = []
    for doc_id, words in sorted(corpus):
        n_sent = (len(words) + W - 1) // W
        sents = [" ".join(words[i * W : (i + 1) * W]) for i in range(n_sent)]
        spans = [
            " ".join(words[i * W : i * W + 3 * W]) for i in range(max(0, n_sent - 2))
        ]
        dropped = []
        for i, sp in enumerate(spans):
            h = h48(sp)
            if h in seen:
                dropped.append(i)
            else:
                seen.add(h)
        per_doc.append((doc_id, sents, spans, dropped))
    for doc_id, sents, spans, dropped in per_doc:
        kept = [
            i
            for i in range(len(sents))
            if not any(i - 2 <= d <= i for d in dropped)
        ]
        out[doc_id] = (
            len(sents),
            len(spans),
            len(dropped),
            len(kept),
            sum(len(sents[i]) for i in kept),
            sum(h48(sents[i]) for i in kept),
        )
    return out


def test_dd19_matches_python_replay(spark):
    """Spark's dd19 must equal the plain-Python replay doc-for-doc at
    sf0.001 — keep-first order, removal footprint, kept-text checksum,
    everything."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    expected = _dd19_python_replay(docs)
    rows = all_queries()["dd19_span_dedup"].fn(spark, sf).collect()
    assert len(rows) == len(expected)
    for r in rows:
        assert expected[r.doc_id] == (
            r.n_sentences,
            r.n_spans,
            r.n_dropped_spans,
            r.n_kept_sentences,
            r.kept_len,
            r.kept_checksum,
        ), r.doc_id


def test_dd19_c4_footprint_invariants(spark):
    """Structural invariants at sf0.01: both injected replica families
    actually produce drops (the differential check is non-trivial), a
    span always covers exactly three sentences so k dropped spans
    remove between 3 and 3k sentences, and a doc with zero dropped
    spans keeps everything. (Originals can ALSO legitimately drop
    spans: the testdata generator injects repeated word runs — the
    same ones dd11 mines — and keep-first applies corpus-wide; the
    Python replay test pins those cases exactly.)"""
    rows = all_queries()["dd19_span_dedup"].fn(spark, SF_DIR).collect()
    from api_etl_pipeline_spark.llm_ops.dedup import _DD19_A_OFF, _DD19_B_OFF

    assert any(
        r.n_dropped_spans > 0 for r in rows if _DD19_A_OFF <= r.doc_id < _DD19_B_OFF
    )
    assert any(r.n_dropped_spans > 0 for r in rows if r.doc_id >= _DD19_B_OFF)
    for r in rows:
        if r.n_dropped_spans == 0:
            assert r.n_kept_sentences == r.n_sentences
        else:
            removed = r.n_sentences - r.n_kept_sentences
            assert 3 <= removed <= 3 * r.n_dropped_spans


def test_st17_live_equals_dd19_batch(spark):
    """The streaming span dedup must equal its batch twin row for row
    (the st13/st15 live==batch pin): per-hash GroupState keep-first
    under the single-micro-batch staging invariant must reproduce
    dd19's global (doc_id, span_idx) window order exactly — counts,
    removal footprint, kept-text checksums, everything."""
    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    live = {r.doc_id: r for r in qs["st17_span_dedup_live"].fn(spark, sf).collect()}
    batch = {r.doc_id: r for r in qs["dd19_span_dedup"].fn(spark, sf).collect()}
    assert set(live) == set(batch) and live
    assert any(b.n_dropped_spans > 0 for b in batch.values())
    for doc_id, b in batch.items():
        l = live[doc_id]
        for col in ("n_sentences", "n_spans", "n_dropped_spans",
                    "n_kept_sentences", "kept_len", "kept_checksum"):
            assert getattr(l, col) == getattr(b, col), (doc_id, col)


def test_dd19_boundary_semantics(spark, tmp_path):
    """Constructed-corpus boundary pins for dd19, all three engines
    (Spark, DuckDB oracle, Python replay) on the same tmp parquet:
    a WITHIN-doc repeated span (keep-first applies inside one doc too),
    an exactly-30-word doc (exactly one span), a sub-span doc (2
    sentences, zero spans, everything kept), and an 11-word doc whose
    second sentence is a 1-word partial block."""
    import duckdb
    import pandas as pd

    # doc 200: words repeat with period 10 -> every sentence identical,
    # so span i (words 10i+1..10i+30) is identical for all i: spans
    # 1..k are within-doc duplicates of span 0.
    block = "alpha beta gamma delta eps zeta eta theta iota kappa"
    docs = [
        (200, " ".join([block] * 6)),          # 60 words, 6 ident. sentences
        (201, " ".join(f"w{i}" for i in range(30))),   # exactly 1 span
        (202, " ".join(f"u{i}" for i in range(20))),   # 2 sentences, 0 spans
        (203, " ".join(f"v{i}" for i in range(11))),   # 1-word partial tail
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "t"
    pdf["n_chars"] = pdf["text"].str.len()
    d = tmp_path / "dd19b"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")
    spec = all_queries()["dd19_span_dedup"]
    df = spec.fn(spark, str(d))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    compare(df, con, spec.oracle)
    got = {r.doc_id: r for r in df.collect()}
    replay = _dd19_python_replay(docs)
    for doc_id in (200, 201, 202, 203):
        r = got[doc_id]
        assert replay[doc_id] == (
            r.n_sentences, r.n_spans, r.n_dropped_spans,
            r.n_kept_sentences, r.kept_len, r.kept_checksum,
        ), doc_id
    # the explicit boundary claims, independent of the replay:
    assert got[200].n_spans == 4 and got[200].n_dropped_spans == 3
    # only sentence 0 survives: it is covered solely by span 0 (the kept
    # first occurrence); every later sentence touches a dropped span
    assert got[200].n_kept_sentences == 1
    assert got[201].n_spans == 1 and got[201].n_dropped_spans == 0
    assert got[202].n_spans == 0 and got[202].n_kept_sentences == 2
    assert got[203].n_sentences == 2 and got[203].n_spans == 0


def test_cur09_pseudonym_mapping_and_invariants(spark):
    """The pseudonym function must be exactly salted-md5-48 (pinned by
    hand-computing id 1's pseudonym into the mapping checksum's
    domain), the map must be injective on this corpus (the audit's own
    verdict), and the overlap can't exceed either side."""
    from api_etl_pipeline_spark.llm_ops.curation import CUR09_SALT

    row = all_queries()["cur09_pseudonymize_ids"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row.injective
    assert row.n_union_pseudos == row.n_union_ids
    assert row.n_overlap <= min(row.n_event_users, row.n_customers)
    # recompute the mapping checksum in plain Python over the same key
    # domain: ids < 100 present in either table
    import duckdb

    ids = [
        r[0]
        for r in duckdb.connect().execute(
            "SELECT DISTINCT id FROM ("
            "SELECT user_id AS id FROM '/root/testdata/sf0.001/events.parquet' "
            "UNION ALL SELECT c_custkey FROM "
            "'/root/testdata/sf0.001/customer.parquet') WHERE id < 100"
        ).fetchall()
    ]
    expect = sum(
        int(hashlib.md5(f"{CUR09_SALT}:{i}".encode()).hexdigest()[:12], 16)
        for i in ids
    )
    assert row.mapping_checksum == expect


def test_ev19_under_cap_matches_uncapped_semantics(spark, duck):
    """On the shipped testdata no user approaches EV19_CAP, so the capped
    operator must emit n_overflow == 0 everywhere and otherwise behave as
    the uncapped round-9 form did (oracle mirror covers the values; this
    pins the guard's no-op side)."""
    spec = all_queries()["ev19_journey_patterns"]
    rows = spec.fn(spark, SF_DIR).collect()
    assert rows and all(r.n_overflow == 0 for r in rows)


def test_dd19_oracle_property_random_corpora(tmp_path):
    """Property check of the ORACLE itself (the driver's ground truth)
    against the independent Python replay, no Spark in the loop:
    random small-vocab corpora — the hostile regime where 30-word span
    collisions are common — must agree doc-for-doc. Deterministic seeds
    so the test is reproducible; small vocab sizes force within-doc and
    cross-doc duplicate spans, partial tail blocks, and sub-span docs."""
    import random

    import duckdb
    import pandas as pd

    from api_etl_pipeline_spark.registry import all_queries

    oracle = all_queries()["dd19_span_dedup"].oracle
    for seed in range(6):
        rng = random.Random(seed)
        vocab = [f"t{k}" for k in range(rng.choice([2, 3, 8]))]
        docs = []
        # straddle the injection boundaries: some corpora sit in the A
        # range (< 50), some across A/B (45..), some past B (95..)
        base_id = rng.choice([0, 45, 95])
        for doc_id in range(base_id, base_id + rng.randint(3, 12)):
            n = rng.randint(1, 75)
            docs.append((doc_id, " ".join(rng.choice(vocab) for _ in range(n))))
        pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
        pdf["lang"] = "en"
        pdf["source"] = "t"
        pdf["n_chars"] = pdf["text"].str.len()
        d = tmp_path / f"p{seed}"
        d.mkdir()
        pdf.to_parquet(d / "documents.parquet")
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
        )
        got = {
            r[0]: tuple(r[1:])
            for r in con.execute(oracle).fetchall()
        }
        expected = _dd19_python_replay(docs)
        assert got == expected, f"seed {seed}"
