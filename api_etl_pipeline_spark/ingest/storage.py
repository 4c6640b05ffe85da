"""Sink-table DDL bootstrap (SURVEY.md §2.1 S8) + reconciliation merge (T5).

The reference bootstraps its SQLite schema idempotently
(`CREATE TABLE IF NOT EXISTS`, storage/db.py:6-39); Spark-first this is
idempotent `CREATE TABLE IF NOT EXISTS ... USING PARQUET` against the
session catalog — same property: calling it N times yields one schema,
no data loss.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

RESPONSES_DDL = """
CREATE TABLE IF NOT EXISTS {name} (
    provider STRING NOT NULL,
    method STRING NOT NULL,
    url STRING NOT NULL,
    params_json STRING,
    status_code INT NOT NULL,
    headers_json STRING,
    body BINARY,
    created_at TIMESTAMP
) USING PARQUET
"""

ARTIFACTS_DDL = """
CREATE TABLE IF NOT EXISTS {name} (
    provider STRING NOT NULL,
    source_url STRING NOT NULL,
    sha256 STRING NOT NULL,
    bytes BIGINT NOT NULL,
    blob_path STRING,
    response_id BIGINT,
    created_at TIMESTAMP
) USING PARQUET
"""


def bootstrap_tables(
    spark: SparkSession,
    responses: str = "responses_sink",
    artifacts: str = "artifacts_sink",
) -> None:
    """S8: idempotent schema bootstrap (db.py:7,19). The UNIQUE
    (source_url, sha256) constraint has no parquet-table equivalent —
    it is enforced at write time by dedup.dedup_insert (J2), exactly
    like the reference enforces it via INSERT OR IGNORE."""
    spark.sql(RESPONSES_DDL.format(name=responses))
    spark.sql(ARTIFACTS_DDL.format(name=artifacts))
