"""Schema-drift detection — the dossier's "tolerate unknown fields; log
schema diffs" mandate (reference docs/Golden_Record_API_Dossiers.md:22,
302) as a first-class engine utility.

The PERMISSIVE parse path (ingest/parse.py) already *tolerates* drift;
this module *reports* it: given the schema observed on an inbound batch
and the expected contract schema, emit one row per divergence so the
run-capture layer can persist the diff alongside parse errors. Works on
nested structs/arrays/maps recursively, in pure driver-side metadata —
no data pass at all, so it costs nothing at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DRIFT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("kind", T.StringType()),  # added | removed | type_changed
        T.StructField("expected_type", T.StringType()),
        T.StructField("observed_type", T.StringType()),
    ]
)


def _walk(expected: T.DataType, observed: T.DataType, path: str, out: list) -> None:
    if isinstance(expected, T.StructType) and isinstance(observed, T.StructType):
        efields = {f.name: f.dataType for f in expected.fields}
        ofields = {f.name: f.dataType for f in observed.fields}
        for name, etype in efields.items():
            child = f"{path}.{name}" if path else name
            if name not in ofields:
                out.append((child, "removed", etype.simpleString(), None))
            else:
                _walk(etype, ofields[name], child, out)
        for name, otype in ofields.items():
            if name not in efields:
                child = f"{path}.{name}" if path else name
                out.append((child, "added", None, otype.simpleString()))
        return
    if isinstance(expected, T.ArrayType) and isinstance(observed, T.ArrayType):
        _walk(expected.elementType, observed.elementType, f"{path}[]", out)
        return
    if isinstance(expected, T.MapType) and isinstance(observed, T.MapType):
        # key type changes are drift too (map<string,_> -> map<bigint,_>
        # must not report clean); keys are leaf-typed so compare direct
        if expected.keyType.simpleString() != observed.keyType.simpleString():
            out.append(
                (
                    f"{path}{{key}}",
                    "type_changed",
                    expected.keyType.simpleString(),
                    observed.keyType.simpleString(),
                )
            )
        _walk(expected.valueType, observed.valueType, f"{path}{{}}", out)
        return
    if expected.simpleString() != observed.simpleString():
        out.append(
            (path, "type_changed", expected.simpleString(), observed.simpleString())
        )


def schema_drift(
    spark: SparkSession, expected: T.StructType, observed: T.StructType
) -> DataFrame:
    """One row per divergence between the contract schema and what a batch
    actually carried: fields the provider added (the tolerated-unknowns to
    log), fields it dropped, and in-place type changes — nested paths
    spelled dotted (`a.b`), array elements as `a[]`, map values as `a{}`.
    Empty DataFrame ⇔ schemas agree."""
    out: list = []
    _walk(expected, observed, "", out)
    return spark.createDataFrame(out, DRIFT_SCHEMA)
