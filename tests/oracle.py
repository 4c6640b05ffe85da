"""Differential-oracle comparison mirroring the driver's t2 gate.

Spark result vs DuckDB result: row count, column names (sorted), and an
order-insensitive multiset compare of row values. Values are normalized
(timestamps → isoformat strings, floats kept exact — queries are expected
to round on BOTH sides, so any float mismatch is a query bug, not noise).
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and represent exactly
        return repr(v + 0.0)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


# normalize engine type names to a common vocabulary so schema drift is
# caught locally before the driver's stricter compare sees it
_SPARK_TYPES = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int64",
    "float": "float", "double": "float64", "string": "string",
    "boolean": "bool", "date": "date", "timestamp": "timestamp",
    "timestamp_ntz": "timestamp", "binary": "binary",
}
_DUCK_TYPES = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int64",
    "HUGEINT": "int128", "FLOAT": "float", "DOUBLE": "float64",
    "VARCHAR": "string", "BOOLEAN": "bool", "DATE": "date",
    "TIMESTAMP": "timestamp", "TIMESTAMP_NS": "timestamp", "BLOB": "binary",
}


def _norm_type(name: str, table: dict) -> str:
    name = name.strip()
    if name.endswith("[]"):  # duckdb list type
        return f"array<{_norm_type(name[:-2], table)}>"
    if name.lower().startswith("array<") and name.endswith(">"):
        return f"array<{_norm_type(name[6:-1], table)}>"
    base = name.split("(")[0].strip()
    return table.get(base, base.lower())


def compare(spark_df, duck_con, oracle_sql: str) -> None:
    # The driver's canonicalizer pandas-sorts every output column; Python
    # lists/dicts are unhashable there and ABORT the entire t2 loop (this
    # killed round 1 at x12). Oracle-checked queries must serialize
    # complex columns (array_join / to_json) before returning.
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"oracle-checked query returns complex-typed columns {complex_cols}; "
        "serialize them (array_join/to_json) — the driver cannot hash lists"
    )
    # zoned timestamps collect through the PYTHON PROCESS timezone (not the
    # pinned UTC session conf), silently shifting values on any non-UTC
    # host — the ev12 date_trunc bug. Convention: oracle-checked results
    # carry TIMESTAMP_NTZ or DATE only (cast zoned exprs like date_trunc
    # back with .cast("timestamp_ntz"), the x05 pattern).
    from pyspark.sql.types import TimestampType

    zoned = [
        f.name for f in spark_df.schema.fields if isinstance(f.dataType, TimestampType)
    ]
    assert not zoned, (
        f"oracle-checked query returns ZONED timestamp columns {zoned}; "
        "cast to timestamp_ntz so collection is process-timezone-independent"
    )
    # DECIMAL finals pandas-collect as object Decimal('100.10') on the Spark
    # side but float64 100.1 on the DuckDB side; the driver's string
    # canonicalization then diverges on trailing zeros (the r07
    # ev16/inc01/stats02 hash fails). Compute in DECIMAL, but CAST the
    # OUTPUT to DOUBLE on BOTH engine sides (the ev15 convention). This
    # fetchall-based mirror compares Decimal==Decimal and would pass, so the
    # class is enforced here mechanically instead.
    from pyspark.sql.types import DecimalType

    decimals = [
        f.name for f in spark_df.schema.fields if isinstance(f.dataType, DecimalType)
    ]
    assert not decimals, (
        f"oracle-checked query returns raw DECIMAL columns {decimals}; "
        "CAST(... AS DOUBLE) after the final ROUND on both engine sides — "
        "the driver canonicalizes Spark Decimal vs DuckDB float64 differently"
    )
    # DATE finals are the same class of asymmetry: Spark pandas-collects
    # datetime.date objects ('2024-01-01') while DuckDB DATE materializes as
    # datetime64[us] ('2024-01-01 00:00:00') — string canonicalization
    # diverges. Convention: cast DATE finals to timestamp_ntz on the Spark
    # side and TIMESTAMP in the oracle (timestamp_ntz finals are proven
    # driver-green: st11/st12/st13 in r07).
    from pyspark.sql.types import DateType

    dates = [
        f.name for f in spark_df.schema.fields if isinstance(f.dataType, DateType)
    ]
    assert not dates, (
        f"oracle-checked query returns DATE columns {dates}; "
        "cast to timestamp_ntz (Spark) / TIMESTAMP (oracle) — pandas collects "
        "Spark DATE as datetime.date but DuckDB DATE as datetime64"
    )
    duck_types = {
        name: _norm_type(typ, _DUCK_TYPES)
        for name, typ in duck_con.execute(
            f"SELECT column_name, column_type FROM (DESCRIBE {oracle_sql})"
        ).fetchall()
    }
    duck_rel = duck_con.execute(oracle_sql)
    duck_cols = [d[0] for d in duck_rel.description]
    duck_rows = duck_rel.fetchall()

    spark_cols = spark_df.columns
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    spark_types = {f: _norm_type(t, _SPARK_TYPES) for f, t in spark_df.dtypes}
    type_mismatch = {
        c: (spark_types[c], duck_types[c])
        for c in spark_cols
        if spark_types[c] != duck_types[c]
    }
    assert not type_mismatch, f"type mismatch (spark, duck): {type_mismatch}"
    # align duck column order to spark's, then sort columns by name like the driver
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    duck_idx = {c: i for i, c in enumerate(duck_cols)}
    duck_order = [duck_idx[spark_cols[i]] for i in order]

    spark_rows = spark_df.collect()
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s_ms = Counter(tuple(_norm(row[i]) for i in order) for row in spark_rows)
    d_ms = Counter(tuple(_norm(row[i]) for i in duck_order) for row in duck_rows)
    if s_ms != d_ms:
        only_s = list((s_ms - d_ms).items())[:5]
        only_d = list((d_ms - s_ms).items())[:5]
        raise AssertionError(
            f"value mismatch: {sum((s_ms - d_ms).values())} rows only in spark "
            f"(e.g. {only_s}); {sum((d_ms - s_ms).values())} only in duck (e.g. {only_d})"
        )
