"""Offline ingest pipeline — the reference's end-to-end dataflow, declaratively.

Reference lifecycle (SURVEY.md §3.1, pipeline.py:14-64): per work item,
fetch metadata → persist response → maybe parse_error → download artifact
→ persist response → hash → blob put → dedup insert → summary counts.

Spark-first, the item loop disappears: the plan is a DataFrame, every
stage is a transformation over the whole batch, and the sinks are
parquet writes. Stage boundaries (shuffles) exist only at the dedup
anti-join and the summary counts; everything else is narrow and
pipelined, so the same plan runs unchanged whether the plan table has 1
row (the reference's case) or 100M.

Counts semantics match the reference exactly (the e2e oracle,
tests/test_offline_e2e.py:55-56): responses = metadata fetches +
artifact fetches; artifacts = deduped inserts; parse_errors = quarantine
rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_etl_pipeline_spark.ingest import parse as P
from api_etl_pipeline_spark.ingest.capture import run_summary
from api_etl_pipeline_spark.ingest.dedup import dedup_insert, with_sha256, write_blobs
from api_etl_pipeline_spark.ingest.sources import fetch_offline, fixture_scan, plan_source

PROVIDERS = ("sec_edgar", "nrc_adams_aps")


@dataclass
class IngestResult:
    responses: int
    artifacts: int
    parse_errors: int
    responses_df: DataFrame
    artifacts_df: DataFrame
    errors_df: DataFrame


def _default_plan(provider: str) -> list[dict]:
    if provider == "sec_edgar":
        return [
            {
                "cik10": "0001112233",
                "fixture_name": "submissions.json",
                "url": "https://data.sec.gov/submissions/CIK0001112233.json",
            }
        ]
    return [
        {
            "q": "reactor",
            "fixture_name": "search.json",
            "url": "https://adams-api.nrc.gov/search",
        }
    ]


def _artifact_fixture(provider: str) -> str:
    return "artifact.htm" if provider == "sec_edgar" else "document.pdf"


def run_offline_ingest(
    spark: SparkSession,
    provider: str,
    fixture_root: str,
    warehouse: str | None = None,
    limit: int = 1,
    run_id: str = "run-0001",
) -> IngestResult:
    if provider not in PROVIDERS:
        raise KeyError(f"unknown provider {provider!r}; known: {PROVIDERS}")

    plan = plan_source(spark, _default_plan(provider), limit)
    fixtures = fixture_scan(spark, fixture_root, provider)

    # stage 1: metadata fetch (S1) — one captured response per plan item
    meta = fetch_offline(plan, fixtures, provider)

    # stage 2: parse + extract (F1-F4) per provider
    extracted = P.sec_first_filing(meta) if provider == "sec_edgar" else P.nrc_extract_pdf_url(meta)

    # stage 3: validate-split (F5/F6/F10) — artifact rows vs quarantine
    ok, errors = P.split_quarantine(
        extracted, stage="parse_metadata", condition=F.col("artifact_url").isNotNull()
    )

    # stage 4: artifact fetch (fixture-backed) + hash (X1/A5)
    art_plan = ok.select(
        "item_index",
        "item_key",
        F.lit(_artifact_fixture(provider)).alias("fixture_name"),
        F.col("artifact_url").alias("url"),
    )
    art_fetch = fetch_offline(art_plan, fixtures, provider)
    hashed = with_sha256(art_fetch.filter(F.col("body").isNotNull()))

    # stage 5: dedup insert (S6/J2) against the existing sink, if any
    existing = None
    if warehouse is not None:
        try:
            existing = spark.read.parquet(f"{warehouse}/artifacts")
        except Exception:
            existing = None
    new_artifacts = dedup_insert(
        hashed.select(
            F.lit(provider).alias("provider"),
            F.col("url").alias("source_url"),
            "sha256",
            "bytes",
            F.format_string("blobs/%s/%s", F.substring("sha256", 1, 2), F.col("sha256")).alias(
                "blob_path"
            ),
            F.col("item_index").cast("long").alias("response_id"),
            F.current_timestamp().alias("created_at"),
        ),
        existing,
    )

    # responses = metadata fetches ∪ artifact fetches (both captured)
    resp_cols = ["provider", "method", "url", "params_json", "status_code", "headers_json", "body"]
    responses = meta.select(*resp_cols).unionByName(art_fetch.select(*resp_cols))

    n_err = errors.count()  # quarantine is tiny by contract
    if warehouse is not None:
        # A1-A3 single-pass counters, Spark-native: observed metrics ride
        # the WRITE jobs instead of separate count() re-executions — at
        # 100 TB the difference is re-scanning the run twice vs not at all
        from pyspark.sql import Observation

        obs_resp, obs_art = Observation(), Observation()
        responses_obs = responses.observe(obs_resp, F.count(F.lit(1)).alias("n"))
        artifacts_obs = new_artifacts.observe(obs_art, F.count(F.lit(1)).alias("n"))
        responses_obs.write.mode("append").parquet(f"{warehouse}/responses")
        artifacts_obs.write.mode("append").parquet(f"{warehouse}/artifacts")
        n_resp = int(obs_resp.get["n"])
        n_art = int(obs_art.get["n"])
        write_blobs(hashed, f"{warehouse}/blobs")
        run_summary(responses, new_artifacts, errors, run_id, "succeeded").write.mode(
            "append"
        ).json(f"{warehouse}/runs")
    else:
        n_resp = responses.count()
        n_art = new_artifacts.count()

    return IngestResult(n_resp, n_art, n_err, responses, new_artifacts, errors)
