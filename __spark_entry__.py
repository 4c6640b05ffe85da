"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query on sf0.001 (smoke check, rows > 0).
queries()      — every implemented operator from SURVEY.md §2 as
                 (spark, sf_dir) -> DataFrame, from the engine registry.
oracle_sql()   — matching DuckDB SQL per query (omitted for ops that are
                 not SQL-expressible → driver does a rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from api_etl_pipeline_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spec = all_queries()["q02_revenue_by_segment"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query key (same parquet views)."""
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
