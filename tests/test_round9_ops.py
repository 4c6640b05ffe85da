"""Round-9 invariant pins that the differential oracle cannot see.

cur07's oracle hash pins cross-engine agreement, but both engines could
agree on a WRONG extraction (e.g. boilerplate kept, entities left
encoded) since the injection and the extractor share constants. These
tests pin the extraction SEMANTICS against hand-computed expectations
on a synthetic document.
"""

from __future__ import annotations

import duckdb

from api_etl_pipeline_spark.llm_ops.curation import (
    CUR07_MAX_LINKS,
    CUR07_MIN_TXT,
    CUR07_SCRIPT_RE,
    CUR07_STYLE_RE,
    CUR07_TAG_RE,
)


def _extract(html: str) -> tuple[str, int, int]:
    """Reference extraction in plain Python (re module — a THIRD regex
    engine, so a Java/RE2-specific quirk can't hide): returns
    (main_text, n_lines, n_boiler)."""
    import re

    lines = html.split("\n")
    kept = []
    n_boiler = 0
    for ln in lines:
        s = re.sub(CUR07_SCRIPT_RE, " ", ln)
        s = re.sub(CUR07_STYLE_RE, " ", s)
        s = re.sub(CUR07_TAG_RE, " ", s)
        txt = re.sub(" +", " ", s).strip()
        n_links = len(re.findall("<a ", ln))
        if len(txt) < CUR07_MIN_TXT or n_links >= CUR07_MAX_LINKS or len(txt) * 4 < len(ln):
            n_boiler += 1
        else:
            kept.append(txt)
    joined = " ".join(kept)
    for pat, rep in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                     ("&#39;", "'"), ("&nbsp;", " ")]:
        joined = joined.replace(pat, rep)
    main = re.sub(" +", " ", joined).replace("&amp;", "&").strip()
    # NB: python replace order mirrors the engines' regexp_replace chain
    return main, len(lines), n_boiler


_HTML = (
    "<html><head><title>Doc 6</title>\n"
    "<style>.nav{color:#000}</style>\n"
    "<script>var t=6;track(t);</script>\n"
    '</head><body><div class="nav"><a href="/">Home</a> | '
    '<a href="/s/src0">Section</a> | <a href="/d/6">More</a></div>\n'
    "<p>Q&amp;A the quick brown fox jumps over the lazy dog &lt;end 6&gt;</p>\n"
    "<p>&quot;review&quot; &#39;s&nbsp;note 6</p>\n"
    '<div class="footer"><a href="/terms">Terms</a>'
    '<a href="/privacy">Privacy</a> (c) 2026</div></body></html>'
)


def test_cur07_reference_extraction_semantics():
    main, n_lines, n_boiler = _extract(_HTML)
    # nav (3 links), footer (2 links), title/style/script (short/empty)
    # drop; the two content paragraphs survive, entities decoded, the
    # decoded <end 6> is CONTENT (decode runs after the tag strip)
    assert n_lines == 7 and n_boiler == 5
    assert main == (
        'Q&A the quick brown fox jumps over the lazy dog <end 6> '
        '"review" \'s note 6'
    )


def test_cur07_duckdb_matches_reference_extraction():
    # the oracle's lambda pipeline on the same synthetic doc must equal
    # the plain-Python reference bit for bit
    main, _, _ = _extract(_HTML)
    con = duckdb.connect()
    got = con.execute(
        f"""
        WITH per AS (
            SELECT list_transform(string_split(?, chr(10)), ln -> struct_pack(
                txt := trim(regexp_replace(regexp_replace(regexp_replace(
                           regexp_replace(ln, '{CUR07_SCRIPT_RE}', ' ', 'g'),
                           '{CUR07_STYLE_RE}', ' ', 'g'),
                           '{CUR07_TAG_RE}', ' ', 'g'),
                           ' +', ' ', 'g')),
                raw_len := length(ln),
                n_links := len(regexp_extract_all(ln, '<a '))
            )) AS stats
        ),
        j AS (
            SELECT array_to_string(list_transform(list_filter(stats, s -> NOT (
                       length(s.txt) < {CUR07_MIN_TXT}
                       OR s.n_links >= {CUR07_MAX_LINKS}
                       OR length(s.txt) * 4 < s.raw_len)), s -> s.txt), ' ')
                   AS kept_txt
            FROM per
        )
        SELECT regexp_replace(trim(regexp_replace(
                   regexp_replace(regexp_replace(regexp_replace(
                   regexp_replace(regexp_replace(kept_txt,
                       '&lt;', '<', 'g'), '&gt;', '>', 'g'),
                       '&quot;', '"', 'g'), '&#39;', chr(39), 'g'),
                       '&nbsp;', ' ', 'g'), ' +', ' ', 'g')),
                   '&amp;', '&', 'g')
        FROM j
        """,
        [_HTML],
    ).fetchone()[0]
    assert got == main


def test_llm04_funnel_invariants(spark):
    """llm04's stage semantics the oracle hash cannot distinguish from a
    coincidentally-agreeing wrong pipeline: the funnel must be monotone,
    every injection device must fire at its designed rate, and the scrub
    residual must prove convergence."""
    from api_etl_pipeline_spark.registry import all_queries

    row = (
        all_queries()["llm04_curation_funnel"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()[0]
    )
    # monotone funnel
    assert (
        row.n_input
        >= row.n_url_unique
        >= row.n_extracted
        >= row.n_unique_text
        > 0
    )
    # extraction is a transform stage in this fixture: the cur07 wrapper's
    # content line always survives the boilerplate rules, so a drop here
    # means the extractor started emptying real documents
    assert row.n_extracted == row.n_url_unique
    # the sentinel-duplicate device (%10==9 → per-block clone) must fire:
    # URL keepers are one id per (div-100 group, source), 2 of 20 per
    # group end in 9, all sharing one sentinel per 1000-block
    assert row.n_unique_text < row.n_extracted
    # scrub convergence: re-scanning the redacted text finds nothing
    assert row.n_residual == 0
    # the %2 target slice is half the URL keepers (one keeper per
    # (group, source), sources 0..19 → 10 even per group); each dedup
    # removal can shift the balance by at most one
    removed = row.n_extracted - row.n_unique_text
    assert abs(2 * row.n_target - row.n_url_unique) <= 2 * removed + 2
    # selection is a subset of the non-target pool
    assert 0 <= row.n_dsir_selected <= row.n_unique_text - row.n_target
    assert (row.n_dsir_selected == 0) == (row.selected_tokens == 0)


def test_llm04_flag_windows_are_narrow(spark):
    """The u/e flag windows must ride the narrow projection — if the
    redacted TEXT column ever enters a window exchange, the funnel
    shuffles the corpus twice for flags it could compute from keys.
    The windows live in the pre-checkpoint plans (lineage truncation),
    so assert against the checkpoint observer's captures."""
    from api_etl_pipeline_spark.checkpoint import checkpoint_observer
    from api_etl_pipeline_spark.ops.plan_lint import plan_text
    from api_etl_pipeline_spark.registry import all_queries

    captured: list[str] = []
    with checkpoint_observer(lambda df: captured.append(plan_text(df))):
        plan_text(
            all_queries()["llm04_curation_funnel"].fn(
                spark, "/root/testdata/sf0.001"
            )
        )
    import re

    window_plans = [p for p in captured if "Window" in p]
    assert window_plans, "flag windows not captured — checkpoint moved?"
    n_exchanges_checked = 0
    for p in window_plans:
        lines = p.splitlines()
        for i, ln in enumerate(lines):
            if not re.match(r"\(\d+\) Exchange", ln.strip()):
                continue
            # formatted-explain detail block: the node's Input line lists
            # every attribute crossing this exchange
            inp = next(
                (l for l in lines[i + 1 : i + 4] if l.strip().startswith("Input")),
                "",
            )
            assert inp, "Exchange node without an Input detail line"
            assert "redacted" not in inp, (
                "corpus text entered a flag-window exchange:\n" + inp
            )
            n_exchanges_checked += 1
    # both flag windows (curl, h) shuffle — if fewer exchanges appear the
    # plan moved and this pin went vacuous
    assert n_exchanges_checked >= 2


def test_cur08_rule_semantics_reference():
    """Pin the Gopher-rule battery against a plain-Python reference (a
    third engine) on hand-built docs covering every rule and its
    boundary — both SQL engines could agree on a wrongly-rearranged
    integer inequality otherwise."""
    import re

    from api_etl_pipeline_spark.llm_ops.curation import (
        CUR08_MAX_WORDS,
        CUR08_MIN_WORDS,
        CUR08_STOPWORDS,
    )

    def rules(text):
        toks = text.split(" ")
        n = len(toks)
        sum_len = sum(len(w) for w in toks)
        sym = text.count("#") + len(re.findall(r"\.\.\.", text))
        alpha = sum(1 for w in toks if re.search("[A-Za-z]", w))
        stop = sum(1 for w in toks if w in CUR08_STOPWORDS)
        return {
            "v_wordcount": n < CUR08_MIN_WORDS or n > CUR08_MAX_WORDS,
            "v_wordlen": sum_len < 3 * n or sum_len > 10 * n,
            "v_symbol": sym * 10 > n,
            "v_alpha": alpha * 5 < n * 4,
            "v_stopword": stop < 2,
        }

    base = ("the data " * 25).strip()  # 50 words, mean 3.5, 25 stopwords
    assert not any(rules(base).values())
    # one word below the floor
    assert rules(" ".join(base.split()[:-1]))["v_wordcount"]
    # mean length exactly 3 passes; push one word to tip the sum over 10n
    assert not rules("the " * 49 + "and")["v_wordlen"]  # mean exactly 3
    long_tail = base + " " + "z" * 351  # n=51, sum=175+351 > 510? no: boundary below
    assert rules(base + " " + "z" * 340)["v_wordlen"]  # 175+340=515 > 10*51
    assert not rules(base + " " + "z" * 330)["v_wordlen"]  # 505 <= 510
    del long_tail
    # symbol rule boundary: 5 hashes in 50 words = exactly 0.1 → passes
    assert not rules(base.replace("data", "da#a", 5))["v_symbol"]
    assert rules(base.replace("data", "da#a", 6))["v_symbol"]
    # '...' runs count like hashes
    assert rules(base + " " + "... " * 5 + "... ...")["v_symbol"]
    # alpha boundary: 10 non-alpha of 50 = exactly 80% → passes; 11 fails
    assert not rules(("the data " * 20 + "12 " * 10).strip())["v_alpha"]
    assert rules(("the data " * 20 + "12 " * 11).strip())["v_wordcount"] is False
    assert rules(("the data " * 20 + "12 " * 11).strip())["v_alpha"]
    # stopword rule: exactly 2 passes, 1 fails
    two = ("data " * 48 + "the of").strip()
    one = ("data " * 49 + "the").strip()
    assert not rules(two)["v_stopword"] and rules(one)["v_stopword"]


def test_cur08_duckdb_matches_reference_rules():
    """The oracle's lambda/regexp pipeline must agree with the Python
    reference on the same boundary docs."""
    import duckdb

    from api_etl_pipeline_spark.llm_ops.curation import (
        CUR08_MAX_WORDS,
        CUR08_MIN_WORDS,
        CUR08_STOPWORDS,
    )

    docs = [
        ("the data " * 25).strip(),
        " ".join(("the data " * 25).strip().split()[:-1]),
        ("the data " * 25).strip() + " " + "z" * 340,
        ("the data " * 25).strip().replace("data", "da#a", 6),
        ("the data " * 20 + "12 " * 11).strip(),
        ("data " * 49 + "the").strip(),
    ]
    con = duckdb.connect()
    got = con.execute(
        f"""
        SELECT
            (len(string_split(t, ' ')) < {CUR08_MIN_WORDS}
             OR len(string_split(t, ' ')) > {CUR08_MAX_WORDS}),
            (list_reduce(list_transform(string_split(t, ' '),
                                        w -> length(w)::BIGINT), (a, x) -> a + x)
                 < 3 * len(string_split(t, ' '))
             OR list_reduce(list_transform(string_split(t, ' '),
                                           w -> length(w)::BIGINT), (a, x) -> a + x)
                 > 10 * len(string_split(t, ' '))),
            ((len(regexp_extract_all(t, '#'))
              + len(regexp_extract_all(t, '\\.\\.\\.'))) * 10
                 > len(string_split(t, ' '))),
            (len(list_filter(string_split(t, ' '),
                             w -> regexp_matches(w, '[A-Za-z]'))) * 5
                 < len(string_split(t, ' ')) * 4),
            (len(list_filter(string_split(t, ' '),
                             w -> w IN {CUR08_STOPWORDS})) < 2)
        FROM (SELECT unnest(?) AS t)
        """,
        [docs],
    ).fetchall()
    import re

    def rules(text):
        toks = text.split(" ")
        n = len(toks)
        sum_len = sum(len(w) for w in toks)
        sym = text.count("#") + len(re.findall(r"\.\.\.", text))
        alpha = sum(1 for w in toks if re.search("[A-Za-z]", w))
        stop = sum(1 for w in toks if w in CUR08_STOPWORDS)
        return (
            n < CUR08_MIN_WORDS or n > CUR08_MAX_WORDS,
            sum_len < 3 * n or sum_len > 10 * n,
            sym * 10 > n,
            alpha * 5 < n * 4,
            stop < 2,
        )

    assert [tuple(r) for r in got] == [rules(t) for t in docs]


def test_dd16_audit_invariants(spark):
    """dd16's population and injection invariants: the derived corpus is
    exactly 2x the stratum, every orig+mutant pair must be a true dup
    (the device's whole point — if the mutant drifts below tau the
    ground truth goes vacuous), and the confusion-matrix identities must
    hold exactly."""
    from api_etl_pipeline_spark.llm_ops.dedup import DD16_STRATUM
    from api_etl_pipeline_spark.registry import all_queries

    row = (
        all_queries()["dd16_lsh_recall_audit"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()[0]
    )
    n = 2 * DD16_STRATUM
    assert row.n_docs == n
    assert row.n_pairs == n * (n - 1) // 2
    # all 60 injected orig->mutant pairs must clear the tau threshold
    assert row.n_true_dups >= DD16_STRATUM
    assert row.n_true_positives + row.n_false_negatives == row.n_true_dups
    assert row.n_true_positives + row.n_false_positives == row.n_candidates
    assert 0.0 <= row.recall <= 1.0 and 0.0 <= row.precision <= 1.0
    # estimator error is a proper fraction of its denominator
    assert 0 <= row.est_err_num <= row.est_err_den
    assert (row.n_false_negatives == 0) == (row.missed_pair_checksum == 0)


def test_dd17_production_row_equals_dd16(spark):
    """dd17's b32r2 row must reproduce dd16's audit EXACTLY — same
    derived corpus, same ground truth, byte-identical buckets — so the
    sweep is verifiably anchored to the production geometry, and the
    ladder must show the textbook trade: contiguous-slice banding makes
    each same-r geometry's band set a PREFIX of the wider one's, so the
    candidate supersets b2r2 ⊆ b4r2 ⊆ b16r2 ⊆ b32r2 (and b2r4 ⊆ b8r4)
    are set-inclusion facts, asserted on counts."""
    from api_etl_pipeline_spark.registry import all_queries

    qs = all_queries()
    d16 = qs["dd16_lsh_recall_audit"].fn(spark, "/root/testdata/sf0.001").collect()[0]
    rows = {
        r.geometry: r
        for r in qs["dd17_lsh_geometry_sweep"].fn(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(rows) == {"b2r2", "b4r2", "b2r4", "b8r4", "b16r2", "b32r2"}
    prod = rows["b32r2"]
    for col in ("n_true_dups", "n_candidates", "n_true_positives",
                "n_false_negatives", "n_false_positives", "recall",
                "precision", "missed_pair_checksum"):
        assert getattr(prod, col) == getattr(d16, col), col
    # banding theory, measured: wider same-r geometries add bands without
    # removing any, so recall/candidates can only rise along the chain
    for lo, hi in (("b2r2", "b4r2"), ("b4r2", "b16r2"), ("b16r2", "b32r2"),
                   ("b2r4", "b8r4")):
        assert rows[hi].n_true_positives >= rows[lo].n_true_positives, (lo, hi)
        assert rows[hi].n_candidates >= rows[lo].n_candidates, (lo, hi)
    # longer bands require r-hash agreement per band — at equal hash
    # budget, candidates can only shrink vs the shorter-band geometry
    assert rows["b2r4"].n_candidates <= rows["b2r2"].n_candidates
    assert rows["b8r4"].n_candidates <= rows["b16r2"].n_candidates


def test_ev19_pattern_semantics_three_engines():
    """ev19's claim that leftmost non-overlapping matching agrees across
    Java regex (Spark), RE2 (DuckDB) and Python re for its pattern
    class — pinned on adversarial journeys: overlap candidates, greedy
    backtracking, runs at string boundaries."""
    import re

    journeys = [
        "vcvp",      # backtrack: only the trailing vp converts
        "vcpvp",     # two conversions, non-overlapping
        "vvcccp",    # inner v cannot re-match inside the consumed span
        "eeee",      # one greedy rage episode, not three
        "eeveee",    # two episodes split by v
        "ccc",       # run at both boundaries
        "vcp" * 5,   # repetition
        "pvc",       # no conversion (wrong order)
        "",          # empty journey
    ]
    pats = {"conv": "vc*p", "rage": "ee+", "run": "c+"}
    py = [
        {k: len(re.findall(p, j)) for k, p in pats.items()} for j in journeys
    ]
    import duckdb

    duck = duckdb.connect().execute(
        f"""
        SELECT len(regexp_extract_all(j, '{pats["conv"]}')),
               len(regexp_extract_all(j, '{pats["rage"]}')),
               len(regexp_extract_all(j, '{pats["run"]}'))
        FROM (SELECT unnest(?) AS j)
        """,
        [journeys],
    ).fetchall()
    assert [tuple(r) for r in duck] == [
        (d["conv"], d["rage"], d["run"]) for d in py
    ]


def test_ev19_java_regex_matches_python(spark):
    """The Spark (Java regex) side of the same pin."""
    import re

    journeys = ["vcvp", "vcpvp", "vvcccp", "eeee", "eeveee", "ccc",
                "vcp" * 5, "pvc", ""]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(j,) for j in journeys], "j string").select(
        "j",
        F.regexp_count("j", F.lit("vc*p")).alias("conv"),
        F.regexp_count("j", F.lit("ee+")).alias("rage"),
        F.regexp_count("j", F.lit("c+")).alias("run"),
    )
    got = {r.j: (r.conv, r.rage, r.run) for r in df.collect()}
    for j in journeys:
        exp = tuple(len(re.findall(p, j)) for p in ("vc*p", "ee+", "c+"))
        assert got[j] == exp, j


def test_st15_live_equals_ev19_batch(spark):
    """The streaming MATCH_RECOGNIZE must equal its batch twin row for
    row — the live==batch pin (st08/st09 pattern): three engines agree
    on pattern semantics only if the journey CONSTRUCTION (ordering,
    char mapping, checksum) is identical too."""
    from api_etl_pipeline_spark.registry import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    live = {
        r.user_id: r for r in qs["st15_journey_patterns_live"].fn(spark, sf).collect()
    }
    batch = {
        r.user_id: r for r in qs["ev19_journey_patterns"].fn(spark, sf).collect()
    }
    assert set(live) == set(batch) and live
    for uid, b in batch.items():
        l = live[uid]
        for col in ("journey_len", "n_conversions", "n_rage_episodes",
                    "max_click_run", "journey_checksum", "n_overflow"):
            assert getattr(l, col) == getattr(b, col), (uid, col)


def test_maint02_policy_invariants(spark):
    """maint02's verdicts must follow the policy exactly on the 30-day
    fixture: purchase (45 d) never expires, error (5 d) expires every
    day older than 5 relative to the newest day, and expiry is
    monotone in age within every type."""
    from api_etl_pipeline_spark.ops.maintenance import MAINT02_POLICY
    from api_etl_pipeline_spark.registry import all_queries

    rows = (
        all_queries()["maint02_retention_plan"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    pol = dict(MAINT02_POLICY)
    assert {r.event_type for r in rows} == set(pol)
    for r in rows:
        assert r.retention_days == pol[r.event_type]
        assert r.expired == (r.age_days > r.retention_days)
    assert not any(r.expired for r in rows if r.event_type == "purchase")
    err = [r for r in rows if r.event_type == "error"]
    assert any(r.expired for r in err) and any(not r.expired for r in err)


def test_sim13_mmr_invariants(spark):
    """MMR semantics the oracle hash can't articulate: the first pick is
    the pure-relevance argmax (== sim01's top-1), every pick comes from
    the top-m relevance pool, picks are distinct, and each step's score
    equals lam*rel - mu*max_sim recomputed from scratch in plain Python
    over the exact fold cosines (a third, engine-independent evaluation
    of the greedy recurrence)."""
    from api_etl_pipeline_spark.llm_ops.similarity import (
        _SIM13_K,
        _SIM13_LAM,
        _SIM13_M,
        _SIM13_MU,
        sim13_mmr_rerank,
    )
    from api_etl_pipeline_spark.registry import all_queries

    sf = "/root/testdata/sf0.01"
    rows = sim13_mmr_rerank(spark, sf).collect()
    by_q: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.query_id, r.rnk)):
        by_q.setdefault(r.query_id, []).append(r)

    top1 = {
        r.query_id: r.neighbor_id
        for r in all_queries()["sim01_cosine_topk"].fn(spark, sf).collect()
        if r.rn == 1
    }

    # exact cosines recomputed with the same sequential fold in Python
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    vecs = {
        int(v): [float(x) for x in e]
        for v, e in con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    }

    def fold_cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot = dot + x * y
        na = 0.0
        for x in a:
            na = na + x * x
        nb = 0.0
        for y in b:
            nb = nb + y * y
        import math

        return dot / (math.sqrt(na) * math.sqrt(nb))

    lam, mu = float(_SIM13_LAM), float(_SIM13_MU)
    for qid, picks in by_q.items():
        assert len(picks) == _SIM13_K
        assert [p.rnk for p in picks] == list(range(1, _SIM13_K + 1))
        ids = [p.vec_id for p in picks]
        assert len(set(ids)) == _SIM13_K
        assert picks[0].vec_id == top1[qid]
        # candidate pool: top-m by (rel desc, id asc), query excluded
        rels = {
            c: fold_cos(vecs[qid], vecs[c]) for c in vecs if c != qid
        }
        pool = sorted(rels, key=lambda c: (-rels[c], c))[:_SIM13_M]
        assert set(ids) <= set(pool)
        # replay the greedy recurrence independently
        chosen = []
        for p in picks:
            best = None
            for c in sorted(pool):
                if c in chosen:
                    continue
                mx = max((fold_cos(vecs[c], vecs[s]) for s in chosen), default=0.0)
                score = lam * rels[c] - mu * mx
                if best is None or score > best[0]:
                    best = (score, c)
            assert best[1] == p.vec_id and best[0] == p.mmr_score
            assert rels[p.vec_id] == p.relevance
            chosen.append(best[1])


def test_hh02_countmin_invariants(spark):
    """CM properties the oracle hash can't articulate: (1) estimates
    never underestimate; (2) the audit is non-vacuous (collisions exist
    at d=4 x w=64 over the bigram domain); (3) a plain-Python replay of
    the sketch agrees cell-for-cell; (4) MERGEABILITY — the sketch built
    from two disjoint halves of the corpus and summed cell-wise equals
    the single-pass sketch (the property that lets 1000 executors build
    partials and merge)."""
    import hashlib
    from collections import Counter

    import duckdb

    from api_etl_pipeline_spark.ops.advanced import (
        HH02_D,
        HH02_W,
        hh02_countmin_audit,
    )

    sf = "/root/testdata/sf0.01"
    rows = hh02_countmin_audit(spark, sf).collect()
    assert len(rows) == 20
    assert all(r.overestimate >= 0 for r in rows)
    assert any(r.overestimate > 0 for r in rows), "audit is vacuous"
    assert all(r.cm_estimate == r.exact_cnt + r.overestimate for r in rows)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    docs = [t for (t,) in con.execute(
        "SELECT text FROM documents ORDER BY doc_id").fetchall()]

    def doc_bigrams(text):
        toks = text.split(" ")
        return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(item, r):
        h = hashlib.md5(item.encode()).hexdigest()
        return int(h[8 * r: 8 * r + 8], 16) % HH02_W

    def build_sketch(texts):
        cells = Counter()
        for t in texts:
            for bg in doc_bigrams(t):
                for r in range(HH02_D):
                    cells[(r, bucket(bg, r))] += 1
        return cells

    full = build_sketch(docs)
    half = build_sketch(docs[::2]) + build_sketch(docs[1::2])
    assert full == half  # mergeable: partials sum to the single pass

    exact = Counter(bg for t in docs for bg in doc_bigrams(t))
    for r_ in rows:
        est = min(full[(r, bucket(r_.bigram, r))] for r in range(HH02_D))
        assert est == r_.cm_estimate
        assert exact[r_.bigram] == r_.exact_cnt


def test_maint03_skip_semantics(spark):
    """Zone-map semantics the hash can't articulate: day_part files are
    single-day by construction (min==max); a file counts as scanned iff
    its [min,max] day range overlaps the predicate; rows_scanned +
    rows-of-skipped-files == rows_total; and day_part never scans MORE
    rows than arrival for the same predicate (finer zones can only
    prune better at equal grain)."""
    from api_etl_pipeline_spark.ops.maintenance import maint03_zone_map_skip

    rows = maint03_zone_map_skip(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 6  # 2 layouts x 3 predicates
    by = {(r.layout, r.predicate): r for r in rows}
    for r in rows:
        assert 0 <= r.n_skipped <= r.n_files
        assert r.rows_scanned <= r.rows_total
        assert r.lo_day <= r.hi_day
        # skip_rate ships ROUND(6) — compare at that granularity
        assert abs(r.skip_rate - r.n_skipped / r.n_files) < 5e-7
    for pred in ("recent_3d", "mid_week", "point_day"):
        a, d = by[("arrival", pred)], by[("day_part", pred)]
        assert a.rows_total == d.rows_total  # same corpus, either layout
        assert d.rows_scanned <= a.rows_scanned
    # point-day on day_part must reduce to exactly the one matching day
    pd_ = by[("day_part", "point_day")]
    assert pd_.n_files - pd_.n_skipped == 1


def test_tx24_fertility_invariants(spark):
    """Cross-operator identity + bounds the hash can't articulate:
    tx24's stratum token totals must sum to exactly tx22's per-doc
    totals (same trained tokenizer, same corpus — two independent
    aggregation paths), fertility is >= 1 (a word is at least one
    symbol) and <= the corpus max word length, and single_tok_share is
    a valid share consistent with fertility == 1 iff share == 1."""
    from api_etl_pipeline_spark.llm_ops.text import (
        tx22_bpe_tokenize_apply,
        tx24_tokenizer_fertility,
    )

    sf = "/root/testdata/sf0.01"
    strat = tx24_tokenizer_fertility(spark, sf).collect()
    docs = tx22_bpe_tokenize_apply(spark, sf).collect()
    assert sum(r.n_tokens_bpe for r in strat) == sum(r.n_tokens_bpe for r in docs)
    assert sum(r.n_words for r in strat) == sum(r.n_tokens_ws for r in docs)
    for r in strat:
        assert r.fertility >= 1.0
        assert 0.0 <= r.single_tok_share <= 1.0
        assert r.n_tokens_bpe >= r.n_words
        assert (r.single_tok_share == 1.0) == (r.fertility == 1.0)


def test_st16_bounded_state_and_batch_parity(spark):
    """The live sketch's state bound and its parity with a plain-Python
    CM replay: the drained audit at sf0.001 must (a) never
    underestimate, (b) agree exactly with a batch-side replay of the
    sketch from the same staged events, and (c) the sketch can never
    hold more than d*w cells regardless of user cardinality."""
    import hashlib
    from collections import Counter

    import duckdb

    from api_etl_pipeline_spark.streaming.batch_windows import (
        ST16_D,
        ST16_W,
        st16_countmin_live,
    )

    sf = "/root/testdata/sf0.001"
    rows = st16_countmin_live(spark, sf).collect()
    assert rows and all(r.overestimate >= 0 for r in rows)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    counts = Counter(
        dict(con.execute("SELECT user_id, COUNT(*) FROM events GROUP BY user_id").fetchall())
    )

    def bucket(uid, r):
        h = hashlib.md5(str(uid).encode()).hexdigest()
        return int(h[8 * r: 8 * r + 8], 16) % ST16_W

    cells = Counter()
    for uid, c in counts.items():
        for r in range(ST16_D):
            cells[(r, bucket(uid, r))] += c
    assert len(cells) <= ST16_D * ST16_W  # bounded state, by construction
    for row in rows:
        est = min(cells[(r, bucket(row.user_id, r))] for r in range(ST16_D))
        assert est == row.cm_estimate and counts[row.user_id] == row.exact_cnt


def test_mix03_anneal_invariants(spark):
    """Curriculum semantics the hash can't articulate: per-epoch weights
    are a distribution; sharpening is MONOTONE — across epochs the
    highest-quality source's share never falls and the lowest-quality
    source's share never rises (renormalized power sharpening provably
    orders this way); exp_tokens floors never exceed the budget; and
    repeat_factor is weight*budget/chars recomputed independently."""
    import duckdb

    from api_etl_pipeline_spark.llm_ops.curation import mix03_anneal_schedule

    sf = "/root/testdata/sf0.01"
    rows = mix03_anneal_schedule(spark, sf).collect()
    assert len(rows) == 60  # 3 epochs x 20 sources
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    budget = con.execute("SELECT SUM(n_chars) FROM documents").fetchone()[0]
    chars = dict(
        con.execute("SELECT source, SUM(n_chars) FROM documents GROUP BY source").fetchall()
    )
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    for e, rs in by_epoch.items():
        assert abs(sum(r.weight for r in rs) - 1.0) < 1e-9
        assert sum(r.exp_tokens for r in rs) <= budget
        for r in rs:
            assert abs(r.repeat_factor - r.weight * budget / chars[r.source]) < 1e-9
    q_of = {r.source: r.quality for r in by_epoch[1]}
    best = max(q_of, key=lambda s: (q_of[s], s))
    worst = min(q_of, key=lambda s: (q_of[s], s))
    w = {(r.epoch, r.source): r.weight for r in rows}
    assert w[(1, best)] <= w[(2, best)] <= w[(3, best)]
    assert w[(1, worst)] >= w[(2, worst)] >= w[(3, worst)]
    # the anneal must actually BITE: epoch 3 concentrates measurably
    assert w[(3, best)] > 1.5 * w[(1, best)] or w[(3, worst)] < 0.75 * w[(1, worst)]


def test_dq08_fd_semantics(spark):
    """FD-profile semantics cross-checked against independently computed
    ground truth: the key pair must hold with max_fanout 1; every pair
    reports the same n_rows (same table); verdicts recompute from a
    plain-DuckDB replay of each hypothesis; violation_share is
    n_violating/n_groups at ROUND(6) granularity."""
    import duckdb

    from api_etl_pipeline_spark.ops.quality import DQ08_PAIRS, dq08_fd_profile

    sf = "/root/testdata/sf0.01"
    rows = {(r.lhs_col, r.rhs_col): r for r in dq08_fd_profile(spark, sf).collect()}
    assert set(rows) == set(DQ08_PAIRS)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    n_rows_vals = {r.n_rows for r in rows.values()}
    assert len(n_rows_vals) == 1
    key = rows[("o_orderkey", "o_custkey")]
    assert key.is_fd and key.max_fanout == 1 and key.n_violating == 0
    assert any(not r.is_fd for r in rows.values())
    for (lhs, rhs), r in rows.items():
        ng, nv, mf = con.execute(
            f"""SELECT COUNT(*), SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END), MAX(n)
                FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS n
                      FROM orders GROUP BY {lhs})"""
        ).fetchone()
        assert (r.n_groups, r.n_violating, r.max_fanout) == (ng, nv, mf)
        assert r.is_fd == (nv == 0)
        assert abs(r.violation_share - nv / ng) < 5e-7


def test_ret02_rank_metric_semantics(spark):
    """Metric semantics cross-checked against an independent Python
    replay: recompute hit flags from sim01/sim02's own outputs and
    verify MRR and nDCG cell-for-cell with the literal discount table;
    pin the metric bounds and the recall<->rank-quality consistency
    (n_hits > 0 iff mrr > 0 iff ndcg > 0)."""
    from api_etl_pipeline_spark.llm_ops.similarity import (
        RET02_DISCOUNTS,
        RET02_IDCG,
        RET02_K,
        RET02_RECIP,
        ret02_ann_rank_quality,
        sim01_cosine_topk,
        sim02_lsh_bucket_ann,
    )

    sf = "/root/testdata/sf0.01"
    rows = {r.query_id: r for r in ret02_ann_rank_quality(spark, sf).collect()}
    assert len(rows) == 5
    exact = {}
    for r in sim01_cosine_topk(spark, sf).collect():
        if r.rn <= RET02_K:
            exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    ann = {}
    for r in sim02_lsh_bucket_ann(spark, sf).collect():
        ann.setdefault(r.query_id, {})[r.rn] = r.neighbor_id
    d = [float(x) for x in RET02_DISCOUNTS]
    rec = [float(x) for x in RET02_RECIP]
    for qid, r in rows.items():
        flags = [
            1 if ann.get(qid, {}).get(i) in exact.get(qid, set()) else 0
            for i in (1, 2, 3)
        ]
        assert r.n_hits == sum(flags)
        dcg = flags[0] * d[0] + flags[1] * d[1] + flags[2] * d[2]
        assert r.dcg == dcg and r.ndcg == dcg / float(RET02_IDCG)
        mrr = next((rec[i] for i in range(3) if flags[i]), 0.0)
        assert r.mrr == mrr
        assert 0.0 <= r.ndcg <= 1.0 and 0.0 <= r.mrr <= 1.0
        assert (r.n_hits > 0) == (r.mrr > 0) == (r.ndcg > 0)


def test_pack03_efficiency_invariants(spark):
    """Audit semantics replayed independently from pack01's own manifest:
    per-shard bin counts, totals, padding and the LP bound recomputed in
    plain Python must equal the audit cell-for-cell; next-fit's 1/2
    guarantee (n_bins <= 2*lb) and conservation (padding + total ==
    n_bins*budget over non-oversized bins) must hold everywhere."""
    from api_etl_pipeline_spark.llm_ops.packing import (
        TOKEN_BUDGET,
        pack01_sequence_packing,
        pack03_packing_efficiency,
    )

    sf = "/root/testdata/sf0.01"
    manifest = pack01_sequence_packing(spark, sf).collect()
    audit = {r.shard_id: r for r in pack03_packing_efficiency(spark, sf).collect()}
    assert len(audit) == 32
    bins: dict[tuple, int] = {}
    docs: dict[int, int] = {}
    for r in manifest:
        key = (r.shard_id, r.bin_id)
        bins[key] = max(bins.get(key, 0), r.bin_fill)
        docs[r.shard_id] = docs.get(r.shard_id, 0) + 1
    for sid, a in audit.items():
        sbins = {k: v for k, v in bins.items() if k[0] == sid}
        total = sum(sbins.values())
        lb = -(-total // TOKEN_BUDGET)
        pad = sum(TOKEN_BUDGET - v for v in sbins.values() if v <= TOKEN_BUDGET)
        over = sum(1 for v in sbins.values() if v > TOKEN_BUDGET)
        assert (a.n_docs, a.n_bins, a.total_tokens) == (docs[sid], len(sbins), total)
        assert (a.lb_bins, a.padding_tokens, a.n_oversized_bins) == (lb, pad, over)
        assert a.n_bins <= 2 * a.lb_bins  # next-fit's guarantee
        assert 0.5 <= a.efficiency <= 1.0
        # conservation over non-oversized bins
        reg = [v for v in sbins.values() if v <= TOKEN_BUDGET]
        assert pad + sum(reg) == len(reg) * TOKEN_BUDGET


def test_samp08_split_invariants(spark):
    """Split semantics cross-checked independently: the three splits
    partition the table exactly (row conservation), train reaches the
    4/5 target at the EARLIEST qualifying day (removing its last day
    must drop it below target), the embargo day-range is exactly
    SAMP08_EMBARGO_DAYS wide and disjoint from both sides, and
    n_users_seen_in_train for the train row equals its own user count."""
    import duckdb

    from api_etl_pipeline_spark.llm_ops.sampling import (
        SAMP08_EMBARGO_DAYS,
        SAMP08_TRAIN_DEN,
        SAMP08_TRAIN_NUM,
        samp08_temporal_split,
    )

    sf = "/root/testdata/sf0.01"
    rows = {r.split: r for r in samp08_temporal_split(spark, sf).collect()}
    assert set(rows) == {"train", "embargo", "test"}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    total = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    tr, em, te = rows["train"], rows["embargo"], rows["test"]
    assert tr.n_rows + em.n_rows + te.n_rows == total
    # cutoff minimality: train hits the target, train-minus-last-day doesn't
    assert tr.n_rows * SAMP08_TRAIN_DEN >= total * SAMP08_TRAIN_NUM
    last_day = con.execute(
        f"""SELECT COUNT(*) FROM events
            WHERE date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
                  = {tr.max_day}"""
    ).fetchone()[0]
    assert (tr.n_rows - last_day) * SAMP08_TRAIN_DEN < total * SAMP08_TRAIN_NUM
    # temporal ordering and embargo width
    assert tr.max_day < em.min_day <= em.max_day < te.min_day
    assert em.min_day == tr.max_day + 1
    assert em.max_day == tr.max_day + SAMP08_EMBARGO_DAYS
    assert te.min_day == tr.max_day + SAMP08_EMBARGO_DAYS + 1
    # leakage accounting: train trivially fully seen-in-train; test's
    # disclosure is bounded by its own user count
    assert tr.n_users_seen_in_train == tr.n_users
    assert 0 <= te.n_users_seen_in_train <= te.n_users


def test_w12_time_range_semantics(spark):
    """Range-frame semantics replayed in plain Python for every event of
    the busiest user: the trailing-3-day frame must include exactly the
    rows with ts in (t - 3d, t] INCLUDING equal-ts peers (RANGE
    semantics), and every event's frame contains at least itself."""
    from collections import Counter
    from decimal import Decimal

    import duckdb

    from api_etl_pipeline_spark.ops.windows import (
        W12_TRAIL_US,
        w12_time_range_window,
    )

    sf = "/root/testdata/sf0.001"
    rows = w12_time_range_window(spark, sf).collect()
    assert all(r.n_3d >= 1 for r in rows)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    busiest = con.execute(
        "SELECT user_id FROM events GROUP BY user_id ORDER BY COUNT(*) DESC, user_id LIMIT 1"
    ).fetchone()[0]
    evs = con.execute(
        f"""SELECT event_id, epoch_us(ts), COALESCE(value, 0)
            FROM events WHERE user_id = {busiest}"""
    ).fetchall()
    got = {r.event_id: r for r in rows if r.user_id == busiest}
    assert len(got) == len(evs)
    for eid, t, _v in evs:
        in_frame = [(e2, v2) for (e2, t2, v2) in evs if t - W12_TRAIL_US <= t2 <= t]
        r = got[eid]
        assert r.n_3d == len(in_frame)
        expect = sum(
            Decimal(str(v)).quantize(Decimal("0.01")) for _, v in in_frame
        )
        assert abs(r.val_3d - float(expect)) < 1e-9


def test_sim14_sq8_invariants(spark):
    """SQ8 semantics replayed in plain Python: codes recompute exactly
    (floor grid, clamp, constant-dim rule), midpoint reconstruction
    error stays within the analytic range/512 bound per dimension, and
    each reported approx_l2sq equals the replay's fold to the 1e-6
    rounding the query ships."""
    import duckdb
    import math

    from api_etl_pipeline_spark.llm_ops.similarity import (
        SQ8_CELLS,
        SQ8_MAX_CODE,
        sim14_sq8_topk,
    )

    sf = "/root/testdata/sf0.01"
    rows = sim14_sq8_topk(spark, sf).collect()
    assert len(rows) == 25
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    vecs = {
        int(v): [float(x) for x in e]
        for v, e in con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    }
    dims = len(next(iter(vecs.values())))
    mn = [min(v[i] for v in vecs.values()) for i in range(dims)]
    mx = [max(v[i] for v in vecs.values()) for i in range(dims)]

    def dequant(v):
        out = []
        for i in range(dims):
            rng = mx[i] - mn[i]
            c = 0 if rng == 0 else min(
                SQ8_MAX_CODE, math.floor((v[i] - mn[i]) / rng * SQ8_CELLS)
            )
            d = mn[i] + (c + 0.5) * rng / 256.0
            assert abs(d - v[i]) <= rng / 512 * (1 + 1e-12) + 1e-15
            out.append(d)
        return out

    for r in rows:
        q, x = vecs[r.query_id], vecs[r.neighbor_id]
        dq = dequant(x)
        approx = 0.0
        exact = 0.0
        for i in range(dims):
            approx = approx + (q[i] - dq[i]) * (q[i] - dq[i])
            exact = exact + (q[i] - x[i]) * (q[i] - x[i])
        assert abs(r.approx_l2sq - approx) < 1e-6
        assert abs(r.exact_l2sq - exact) < 1e-6


def test_dd18_prefix_filter_completeness(spark):
    """The prefix-filter THEOREM in action: dd18's output must equal the
    brute-force all-pairs exact-Jaccard join at the threshold — no false
    negatives (the guarantee LSH cannot give; even the production b32r2
    banding measures <1.0 recall by dd16) and no false positives (the
    verify step is exact integer arithmetic)."""
    import itertools

    import duckdb

    from api_etl_pipeline_spark.llm_ops.dedup import (
        DD18_T_DEN,
        DD18_T_NUM,
        dd18_prefix_filter_join,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r.doc_a, r.doc_b): r for r in dd18_prefix_filter_join(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    sets = {}
    for did, text in docs:
        toks = text.split(" ")
        s = {" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)}
        if s:
            sets[did] = s
    expect = {}
    for (a, sa), (b, sb) in itertools.combinations(sorted(sets.items()), 2):
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if DD18_T_DEN * inter >= DD18_T_NUM * union:
            expect[(a, b)] = (len(sa), len(sb), inter, union)
    assert set(got) == set(expect)  # complete AND sound
    for k, (na, nb, inter, union) in expect.items():
        r = got[k]
        assert (r.n_a, r.n_b, r.inter_n, r.union_n) == (na, nb, inter, union)
        assert abs(r.jaccard - inter / union) < 5e-7
