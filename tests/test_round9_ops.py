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
