"""Driver-style canonicalization compare for NAMED queries (round 14).

Same comparison class as tools/canon_sweep.py (toPandas vs DuckDB .df(),
columns sorted, values stringified+sorted, sha256) but takes query names
on the command line — the optimization loop's per-change verifier.

    python tools/canon_subset.py name [name ...]

Exit code = number of failing queries.
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from api_etl_pipeline_spark.registry import all_queries  # noqa: E402
from api_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def canon_hash(df) -> str:
    h = hashlib.sha256()
    for c in sorted(df.columns):
        vals = sorted(str(v) for v in df[c].tolist())
        h.update(("\x00".join(vals)).encode())
    return h.hexdigest()


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return 2
    spark = get_spark("canon-subset")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = all_queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    bad = 0
    for name in names:
        spec = qs[name]
        s = canon_hash(spec.fn(spark, SF_DIR).toPandas())
        d = canon_hash(con.execute(spec.oracle).df())
        ok = s == d
        bad += not ok
        print(f"{name}: {'ok' if ok else 'FAIL'}", flush=True)
    print(f"CANON SUBSET: {len(names) - bad}/{len(names)} green")
    return bad


if __name__ == "__main__":
    sys.exit(main())
