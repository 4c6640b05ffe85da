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
