"""O(1)-py4j literal array builders (round 14, optimization round 1).

``F.lit(list)`` builds ``array(lit(x), lit(x), ...)`` with one py4j round
trip PER ELEMENT (~0.6 ms each on this box): a 63x64 codebook literal
costs ~3.3 s of pure driver time, and several operators built such trees
on EVERY query construction (bench: 5 constructions per query). These
helpers emit the SAME expression through one ``F.expr`` call — a single
py4j round trip parsing an ``array(...)`` SQL string, measured ~240x
faster at codebook size.

Bit-exactness: ``repr(float)`` is the shortest string that round-trips
under correctly-rounded decimal->binary conversion, and Spark's SQL
parser routes double literals through Java's correctly-rounded
``Double.parseDouble`` — so ``expr(repr(x) + "D")`` reconstructs exactly
x's IEEE-754 bits for every finite double, including -0.0 and
subnormals. Verified bit-for-bit against ``F.lit`` in
tests/test_round14_opt.py. Non-finite values (inf/nan) have no SQL
literal spelling and are rejected loudly — no caller ships them
(codebooks/query vectors come from finite parquet data).

After constant folding the optimized plan is byte-identical to the
``F.lit`` form (both are CreateArray-of-Literal trees folded to one
array Literal), so plan fingerprints and driver hashes are untouched.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: float) -> str:
    x = float(x)
    if not math.isfinite(x):
        raise ValueError(f"non-finite double has no SQL literal: {x!r}")
    return repr(x) + "D"


def _l(x: int) -> str:
    return f"{int(x)}L"


def sql_doubles(vals) -> str:
    """SQL text of an array<double> literal — for callers composing a
    LARGER one-parse expression string (the lit_doubles device, one
    level up: embedding the array text avoids a py4j round trip per
    array when a query builds many literal-table expressions).

    Empty input is rejected (r14 advice): bare SQL ``array()`` parses
    as a NON-double array type, a silent type break for any caller
    composing an empty slice into a larger expression — lit_doubles'
    [] fallback is the supported empty-array path."""
    vals = list(vals)
    if not vals:
        raise ValueError(
            "sql_doubles([]) would emit untyped SQL array(); use "
            "lit_doubles([]) (F.lit fallback) for empty arrays"
        )
    return "array(" + ",".join(_d(x) for x in vals) + ")"


def lit_doubles(vals) -> Column:
    """array<double> literal in one expr call; F.lit fallback for []"""
    vals = list(vals)
    if not vals:
        return F.lit([])
    return F.expr(sql_doubles(vals))


def lit_double_matrix(rows) -> Column:
    """array<array<double>> literal in one expr call."""
    rows = [list(r) for r in rows]
    if not rows:
        return F.lit([])
    return F.expr(
        "array("
        + ",".join("array(" + ",".join(_d(x) for x in r) + ")" for r in rows)
        + ")"
    )


def lit_longs(vals) -> Column:
    """array<bigint> literal in one expr call."""
    vals = list(vals)
    if not vals:
        return F.lit([])
    return F.expr("array(" + ",".join(_l(x) for x in vals) + ")")


def lit_long_matrix(rows) -> Column:
    """array<array<bigint>> literal in one expr call."""
    rows = [list(r) for r in rows]
    if not rows:
        return F.lit([])
    return F.expr(
        "array("
        + ",".join("array(" + ",".join(_l(x) for x in r) + ")" for r in rows)
        + ")"
    )
