"""Run-capture provenance as DataFrames (SURVEY.md S9/S10/S11, A1-A3, W1).

The reference writes a per-run directory tree of JSON documents
(run_capture.py). Spark-first, provenance is three tables:

- attempts   — the append-only event log (one row per HTTP attempt),
               numbered with a window (A2/W1 replaces the mutable counter);
- responses  — successful captures (derived from attempts);
- runs       — one summary row per run (A3 count rollup, S10 run.json).

Size-gated projections (F13 gzip / F14 pretty) are flag columns here —
the *decision* logic is engine-side and oracle-checkable; the physical
gzip copy is an output-codec option at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from api_etl_pipeline_spark.ingest.redact import redact_headers_json

PRETTY_MAX_BYTES = 2_000_000  # settings.py:13-16
GZIP_MIN_BYTES = 5_000_000  # settings.py:17-20


def number_attempts(attempts: DataFrame) -> DataFrame:
    """W1/A2: monotonic per-run attempt numbering (the reference's
    `_attempt_counter`, run_capture.py:87,113-114) — a row_number window
    ordered by the deterministic (item_index, url) event order."""
    w = Window.partitionBy("run_id").orderBy("item_index", "url", "method")
    return attempts.withColumn("attempt_seq", F.row_number().over(w))


def capture_projection(attempts: DataFrame) -> DataFrame:
    """S9: per-attempt capture record — redacted headers (F15), sha256 +
    byte count of the body (A5), and the two size/type gates (F13/F14)."""
    return attempts.select(
        "*",
        redact_headers_json(F.col("headers_json")).alias("headers_redacted"),
        F.sha2(F.col("body"), 256).alias("body_sha256"),
        F.length("body").cast("long").alias("byte_count"),
        (F.length("body") >= GZIP_MIN_BYTES).alias("gzip_copy"),
        (
            (F.length("body") <= PRETTY_MAX_BYTES)
            & F.lower(F.get_json_object("headers_json", "$['content-type']")).contains("json")
        ).alias("pretty_view"),
    )


def run_summary(
    responses: DataFrame, artifacts: DataFrame, parse_errors: DataFrame, run_id: str, status: str
) -> DataFrame:
    """S10/A3: the run.json counts rollup as a single-row DataFrame."""
    r = responses.agg(F.count("*").alias("responses"))
    a = artifacts.agg(F.count("*").alias("artifacts"))
    e = parse_errors.agg(F.count("*").alias("parse_errors"))
    return (
        r.crossJoin(a)
        .crossJoin(e)
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(status).alias("status"),
            F.current_timestamp().alias("finished_at"),
            "responses",
            "artifacts",
            "parse_errors",
        )
    )
