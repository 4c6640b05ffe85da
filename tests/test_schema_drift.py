"""Schema-drift reporter (dossier "log schema diffs" parity)."""

from __future__ import annotations

from pyspark.sql import types as T

from api_etl_pipeline_spark.ingest.drift import schema_drift


def _s(*fields):
    return T.StructType([T.StructField(n, t) for n, t in fields])


def test_identical_schemas_report_nothing(spark):
    s = _s(("a", T.LongType()), ("b", T.StringType()))
    assert schema_drift(spark, s, s).count() == 0


def test_added_removed_and_type_change(spark):
    expected = _s(("a", T.LongType()), ("b", T.StringType()), ("c", T.DoubleType()))
    observed = _s(("a", T.StringType()), ("c", T.DoubleType()), ("d", T.BooleanType()))
    rows = {
        (r["path"], r["kind"], r["expected_type"], r["observed_type"])
        for r in schema_drift(spark, expected, observed).collect()
    }
    assert rows == {
        ("a", "type_changed", "bigint", "string"),
        ("b", "removed", "string", None),
        ("d", "added", None, "boolean"),
    }


def test_nested_struct_array_and_map_paths(spark):
    expected = _s(
        (
            "payload",
            _s(
                ("items", T.ArrayType(_s(("id", T.LongType())))),
                ("headers", T.MapType(T.StringType(), T.StringType())),
            ),
        )
    )
    observed = _s(
        (
            "payload",
            _s(
                (
                    "items",
                    T.ArrayType(_s(("id", T.LongType()), ("score", T.DoubleType()))),
                ),
                ("headers", T.MapType(T.StringType(), T.LongType())),
            ),
        )
    )
    rows = {(r["path"], r["kind"]) for r in schema_drift(spark, expected, observed).collect()}
    assert rows == {
        ("payload.items[].score", "added"),
        ("payload.headers{}", "type_changed"),
    }


def test_real_provider_contract_detects_envelope_variant(spark):
    """The NRC dual-envelope variance (SURVEY F3) expressed as drift: the
    documents[]-rooted variant reports the results[] contract as removed
    and documents[] as added — exactly what the capture layer would log."""
    contract = _s(("count", T.LongType()), ("results", T.ArrayType(_s(("score", T.DoubleType())))))
    variant = _s(("count", T.LongType()), ("documents", T.ArrayType(_s(("score", T.DoubleType())))))
    kinds = {
        (r["path"], r["kind"])
        for r in schema_drift(spark, contract, variant).collect()
    }
    assert ("results", "removed") in kinds and ("documents", "added") in kinds


def test_map_key_type_change_is_drift(spark):
    """A map KEY type change must not report clean (round-4 advice fix):
    map<string,string> -> map<bigint,string> drifts at path 'h{key}'."""
    expected = _s(("h", T.MapType(T.StringType(), T.StringType())))
    observed = _s(("h", T.MapType(T.LongType(), T.StringType())))
    rows = {
        (r["path"], r["kind"], r["expected_type"], r["observed_type"])
        for r in schema_drift(spark, expected, observed).collect()
    }
    assert rows == {("h{key}", "type_changed", "string", "bigint")}

    # key AND value change -> both paths reported
    observed2 = _s(("h", T.MapType(T.LongType(), T.BooleanType())))
    rows2 = {(r["path"], r["kind"]) for r in schema_drift(spark, expected, observed2).collect()}
    assert rows2 == {("h{key}", "type_changed"), ("h{}", "type_changed")}
