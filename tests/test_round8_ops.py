"""Round-8 invariant pins that no differential oracle can see.

The BPE sentinel encoding (llm_ops/text.py: BPE_L/BPE_R) wraps every
symbol as \\x01||sym||\\x02; if corpus text ever CONTAINED those control
characters, symbol boundaries would be forged and both engines would
produce the same wrong vocab/tokenization — invisible to the mirror
(round-7 advice: the precondition was prose-only). This pins it
machine-checked across every shipped testdata scale.
"""

from __future__ import annotations

import os

import duckdb
import pytest

_SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_bpe_sentinels_absent_from_corpus(sf_dir):
    con = duckdb.connect()
    n = con.execute(
        f"""
        SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE contains(text, chr(1)) OR contains(text, chr(2))
        """
    ).fetchone()[0]
    assert n == 0, (
        f"{n} documents in {sf_dir} contain BPE sentinel bytes \\x01/\\x02 — "
        "the tx21/tx22 sequence encoding would forge symbol boundaries "
        "IDENTICALLY on both engines; re-encode with unused sentinels"
    )
