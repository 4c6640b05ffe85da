"""Round-14 optimization-round pins.

The r14 optimization round changed operator INTERNALS only — results
must be bit-identical. These tests pin the two internal devices the
round introduced:

1. ``_fastlit`` — one-expr literal arrays must reconstruct the exact
   IEEE-754 bits ``F.lit`` produces, across the adversarial double
   population (negative zero, subnormals, exponent-notation reprs,
   full-precision mantissas).
2. Hoisted-norm cosine — ``dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))``
   with the two sqrt factors computed in per-ROW projections must be
   bit-equal to the inline ``_cosine`` per-PAIR form (same ops, same
   order — this is what makes the dd08/dd15/sim01/sim02/decon03/ret01
   rewrite a pure cost change).
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

ADVERSARIAL_DOUBLES = [
    0.0,
    -0.0,
    1.0,
    -1.0,
    0.1,
    1.0 / 3.0,
    -2.0 / 7.0,
    1e-308,          # near the normal/subnormal boundary
    5e-324,          # smallest positive subnormal
    -5e-324,
    1.7976931348623157e308,   # DBL_MAX
    1e-05,           # repr uses exponent notation
    -3.141592653589793e-17,
    6.02214076e23,
    0.30000000000000004,      # classic non-terminating binary fraction
]


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_fastlit_doubles_bit_identical_to_lit(spark):
    from api_etl_pipeline_spark._fastlit import lit_doubles

    df = spark.range(1).select(
        F.lit(ADVERSARIAL_DOUBLES).alias("a"),
        lit_doubles(ADVERSARIAL_DOUBLES).alias("b"),
    )
    row = df.first()
    assert [_bits(x) for x in row["a"]] == [_bits(x) for x in row["b"]]


def test_fastlit_matrix_and_longs_match_lit(spark):
    from api_etl_pipeline_spark._fastlit import (
        lit_double_matrix,
        lit_long_matrix,
        lit_longs,
    )

    mat = [ADVERSARIAL_DOUBLES[:5], ADVERSARIAL_DOUBLES[5:10]]
    longs = [0, -1, 1, 2**62, -(2**62), 9007199254740993]
    lmat = [[1, 2], [3, -9223372036854775807]]
    row = spark.range(1).select(
        F.lit(mat).alias("m"),
        lit_double_matrix(mat).alias("m2"),
        F.lit(longs).alias("l"),
        lit_longs(longs).alias("l2"),
        F.lit(lmat).alias("g"),
        lit_long_matrix(lmat).alias("g2"),
    ).first()
    assert [[_bits(x) for x in r] for r in row["m"]] == [
        [_bits(x) for x in r] for r in row["m2"]
    ]
    assert row["l"] == row["l2"]
    assert [list(r) for r in row["g"]] == [list(r) for r in row["g2"]]


def test_fastlit_rejects_non_finite(spark):
    import math

    import pytest

    from api_etl_pipeline_spark._fastlit import lit_doubles

    with pytest.raises(ValueError):
        lit_doubles([1.0, math.inf])
    with pytest.raises(ValueError):
        lit_doubles([math.nan])


def test_dd14_standing_bands_from_shared_checkpoint(spark):
    """The r14 dd14 rewrite: the standing side's band table is the
    shared full-corpus dd04_bands checkpoint filtered to standing
    doc_ids, NOT a fresh shingle->signature pass over the standing
    docs. Valid because standing text is unchanged between v1 and v2
    (revisions only touch doc_id%7==0, excluded from standing) and
    banding is a per-doc function of the text. Pin the row-set equality
    of the two formulations at sf0.001."""
    from pyspark.sql import functions as F

    from api_etl_pipeline_spark.llm_ops.dedup import (
        _lsh_bands,
        _signatures_of,
        dd04_bands,
    )
    from api_etl_pipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    did = F.col("doc_id")
    standing = (
        load_table(spark, sf, "documents")
        .filter((did % 10 != 0) & (did % 7 != 0))
        .select("doc_id", "text")
    )
    scratch = {tuple(r) for r in _lsh_bands(_signatures_of(standing)).collect()}
    shared = {
        tuple(r)
        for r in dd04_bands(spark, sf)
        .filter((did % 10 != 0) & (did % 7 != 0))
        .collect()
    }
    assert scratch == shared and scratch


def test_hoisted_norm_cosine_bit_identical(spark):
    """The r14 pair-join rewrite: per-row sqrt factors x per-pair dot
    must reproduce the inline _cosine doubles bit-for-bit."""
    from api_etl_pipeline_spark.llm_ops.similarity import _cosine, _dot

    rows = [
        (1, [0.1, -0.2, 0.3, 1e-5]),
        (2, [1.0 / 3.0, 0.7, -0.1, 2.5]),
        (3, [-0.9, 0.04, 0.333333333333333, -1e3]),
        (4, [5e-324, 1.0, -0.0, 42.0]),
    ]
    v = spark.createDataFrame(rows, "id bigint, e array<double>")
    a = v.select(F.col("id").alias("ia"), F.col("e").alias("ea")).withColumn(
        "na", F.sqrt(_dot(F.col("ea"), F.col("ea")))
    )
    b = v.select(F.col("id").alias("ib"), F.col("e").alias("eb")).withColumn(
        "nb", F.sqrt(_dot(F.col("eb"), F.col("eb")))
    )
    j = a.join(b, F.col("ia") < F.col("ib"))
    out = j.select(
        _cosine(F.col("ea"), F.col("eb")).alias("inline"),
        (_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))).alias(
            "hoisted"
        ),
    ).collect()
    assert out, "join produced no pairs"
    for r in out:
        assert _bits(r["inline"]) == _bits(r["hoisted"])
