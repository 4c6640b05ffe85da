"""Edge-case pins for the late round-6 operators, beyond the registry's
DuckDB differential mirror (tests/test_queries_oracle.py):

- the replace()-as-greedy-BPE-merge foundation tx21 rests on (both
  engines must share leftmost-non-overlapping semantics, including the
  self-overlapping-pair case);
- inc01's merge algebra is associative (3-way split == 2-way == direct),
  not just correct at the single cutoff the oracle pins;
- samp06's split integrity (partition of the corpus; dup clusters never
  straddle) and the naive-split audit actually demonstrating leakage.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from api_etl_pipeline_spark.registry import all_queries
from tests.conftest import SF_DIR


def _sym(*symbols: str) -> str:
    """Sentinel-encode a symbol sequence the way tx21/tx22 do."""
    from api_etl_pipeline_spark.llm_ops.text import BPE_L, BPE_R

    return "".join(BPE_L + s + BPE_R for s in symbols)


def test_replace_greedy_merge_semantics_match(spark):
    """tx21's merge step is literal-string replace on the
    SENTINEL-WRAPPED symbol string. Pin that BOTH engines implement
    leftmost non-overlapping replacement — including the
    self-overlapping pair ('a','a') on 'a a a', where greedy BPE must
    yield ['aa','a'] — and that sentinels anchor matches to symbol
    boundaries (the round-6 ADVICE bug: a rule (h,e) must NOT fire
    inside a previously merged 'th' symbol)."""
    cases = [
        # self-overlap: greedy leftmost
        (_sym("a", "a", "a"), _sym("a", "a"), _sym("aa"), _sym("aa", "a")),
        # repeated pair merges everywhere
        (
            _sym("x", "a", "b", "a", "b", "y"),
            _sym("a", "b"),
            _sym("ab"),
            _sym("x", "ab", "ab", "y"),
        ),
        # whole-word merge
        (_sym("a", "b"), _sym("a", "b"), _sym("ab"), _sym("ab")),
        # no match
        (_sym("b", "a"), _sym("a", "b"), _sym("ab"), _sym("b", "a")),
        # BOUNDARY ANCHORING (the fixed bug): (h,e) on ['th','e'] must
        # not rewrite — 'h' inside 'th' is not a whole symbol
        (_sym("th", "e"), _sym("h", "e"), _sym("he"), _sym("th", "e")),
        # ...but (th,e) on ['th','e'] does merge
        (_sym("th", "e"), _sym("th", "e"), _sym("the"), _sym("the")),
    ]
    rows = spark.createDataFrame(
        [(s, p, m) for s, p, m, _ in cases], "s string, p string, m string"
    ).select(F.replace("s", "p", "m").alias("out")).collect()
    got_spark = [r.out for r in rows]
    con = duckdb.connect()
    got_duck = [
        con.execute("SELECT replace(?, ?, ?)", [s, p, m]).fetchone()[0]
        for s, p, m, _ in cases
    ]
    want = [w for _, _, _, w in cases]
    assert got_spark == want
    assert got_duck == want


def test_inc01_merge_is_associative(spark):
    """inc01's oracle pins merge(base, delta) == recompute at ONE cutoff.
    The algebra claim is stronger: ANY partition of the events merges to
    the same rollup. Re-merge from a 4-way user_id-hash split (totally
    unrelated to the time cutoff) and require equality with inc01."""
    from api_etl_pipeline_spark.ops.events_analytics import inc01_rollup_merge
    from api_etl_pipeline_spark.tables import load_table

    expected = {tuple(r) for r in inc01_rollup_merge(spark, SF_DIR).collect()}

    e = load_table(spark, SF_DIR, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    keyed = e.select(
        "event_type", "value", "user_id", us.alias("ts_us"),
        (F.crc32(F.col("user_id").cast("string").cast("binary")) % 4).alias("part"),
    )
    partials = (
        keyed.groupBy(F.expr("ts_us DIV 3600000000").alias("hour_id"),
                      "event_type", "part")
        .agg(
            F.count("*").alias("p_n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("p_sum"),
            F.min("value").alias("p_min"),
            F.max("value").alias("p_max"),
            F.min("ts_us").alias("p_first"),
            F.max("ts_us").alias("p_last"),
            F.collect_set("user_id").alias("p_users"),
        )
    )
    merged = (
        partials.groupBy("hour_id", "event_type")
        .agg(
            F.sum("p_n").cast("bigint").alias("n_events"),
            # DOUBLE-cast matches inc01's round-8 output convention (raw
            # DECIMAL finals are banned — the r07 driver hash fix)
            F.round(F.sum("p_sum"), 2).cast("double").alias("sum_value"),
            F.min("p_min").alias("min_value"),
            F.max("p_max").alias("max_value"),
            F.min("p_first").cast("bigint").alias("first_ts_us"),
            F.max("p_last").cast("bigint").alias("last_ts_us"),
            F.size(F.array_distinct(F.flatten(F.collect_list("p_users"))))
            .cast("bigint")
            .alias("n_users"),
        )
    )
    got = {tuple(r) for r in merged.collect()}
    assert got == expected


def test_samp06_partitions_corpus_and_audit_fires(spark, duck):
    """samp06 must (a) partition the corpus exactly (train+test == all
    docs, no doc in both), (b) place every dup-cluster member on ONE
    side by construction, and (c) report a NONZERO naive-leak count at
    this SF — otherwise the audit column demonstrates nothing."""
    res = {r.split: r for r in
           all_queries()["samp06_cluster_safe_split"].fn(spark, SF_DIR).collect()}
    n_total = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert set(res) == {"train", "test"}
    assert res["train"].n_docs + res["test"].n_docs == n_total
    assert res["train"].naive_leaked_docs + res["test"].naive_leaked_docs > 0
    # leakage-safety is structural: the assignment hashes the shared
    # cluster key, so a cluster CANNOT straddle; re-derive and check.
    from api_etl_pipeline_spark.llm_ops.dedup import (
        connected_components,
        dd04_minhash_lsh_pairs,
    )
    from api_etl_pipeline_spark.llm_ops.sampling import hash_bucket

    comp = connected_components(
        dd04_minhash_lsh_pairs(spark, SF_DIR), src="doc_a", dst="doc_b"
    )
    sides = comp.select(
        "component", (hash_bucket(F.col("component"), 100) < 90).alias("in_train")
    )
    straddle = (
        sides.groupBy("component")
        .agg(F.count_distinct("in_train").alias("n_sides"))
        .filter(F.col("n_sides") > 1)
        .count()
    )
    assert straddle == 0


def test_hash_bucket_matches_duckdb_on_arbitrary_ids(spark):
    """hash_bucket is the engine's shared entropy source (splits, arms,
    mixing) — its Spark and DuckDB forms must agree on ARBITRARY ids,
    not just the corpus's. 200 adversarial ids, 3 modulus sizes."""
    ids = list(range(-50, 50)) + [10**18, 2**62, 7, 999999937] + [
        i * 104729 + 13 for i in range(96)
    ]
    from api_etl_pipeline_spark.llm_ops.sampling import hash_bucket

    sdf = spark.createDataFrame([(i,) for i in ids], "id long")
    for n in (2, 100, 1000):
        got = {
            r.id: r.b
            for r in sdf.select("id", hash_bucket(F.col("id"), n).alias("b")).collect()
        }
        con = duckdb.connect()
        want = {
            i: con.execute(
                "SELECT ('0x' || substr(md5(?::VARCHAR), 1, 8))::BIGINT % ?",
                [str(i), n],
            ).fetchone()[0]
            for i in ids
        }
        assert got == want


def test_bpe_merge_preserves_word_reconstruction(duck):
    """tx21's merge rewrite must never lose or duplicate characters: for
    every corpus word and ANY adjacent symbol pair, stripping the
    sentinels from the merged sequence reproduces the word."""
    from api_etl_pipeline_spark.llm_ops.text import BPE_L, BPE_R

    words = [r[0] for r in duck.execute(
        "SELECT DISTINCT unnest(string_split(text,' ')) FROM documents LIMIT 200"
    ).fetchall()]
    assert words
    strip = {ord(BPE_L): None, ord(BPE_R): None}
    for w in words:
        seq = _sym(*w)
        for i in range(len(w) - 1):
            pat = _sym(w[i], w[i + 1])
            merged = seq.replace(pat, _sym(w[i] + w[i + 1]))
            assert merged.translate(strip) == w, (w, pat)


def test_ev18_credit_conservation(spark, duck):
    """Linear attribution must CONSERVE value: total credited (all touch
    types + unattributed) equals total purchase value, short only the
    documented DIV truncation (< 1 micro-cent per attributed row)."""
    res = all_queries()["ev18_linear_attribution"].fn(spark, SF_DIR).collect()
    credited_micro = round(sum(r.credited_value for r in res) * 100_000_000)
    n_attr_rows = sum(r.n_rows for r in res if r.touch_type != "unattributed")
    total_micro = duck.execute(
        "SELECT (SUM(CAST(value AS DECIMAL(18,2))) * 100000000)::BIGINT "
        "FROM events WHERE event_type = 'purchase'"
    ).fetchone()[0]
    shortfall = total_micro - credited_micro
    assert 0 <= shortfall < max(n_attr_rows, 1), (shortfall, n_attr_rows)


def test_cur03_classes_match_construction(spark, duck):
    """cur03's deterministic v1/v2 derivation implies exact class
    counts: added = docs with id%10==0 (absent from v1), removed = 0
    (v2 keeps every doc), changed = id%7==0 among v1 docs."""
    res = {r.status: r.n_docs for r in
           all_queries()["cur03_snapshot_diff"].fn(spark, SF_DIR).collect()}
    n = lambda q: duck.execute(q).fetchone()[0]  # noqa: E731
    total = n("SELECT COUNT(*) FROM documents")
    added = n("SELECT COUNT(*) FROM documents WHERE doc_id % 10 = 0")
    changed = n(
        "SELECT COUNT(*) FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 7 = 0"
    )
    assert res.get("removed", 0) == 0
    assert res.get("added", 0) == added
    assert res.get("changed", 0) == changed
    assert res.get("unchanged", 0) == total - added - changed
