"""S8 bootstrap idempotency, T5 reconciliation merge, J3 backfill, X14
settings parsing, and salted aggregation equivalence."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from api_etl_pipeline_spark.ingest.dedup import merge_upsert, reconcile_by_hash
from api_etl_pipeline_spark.ingest.settings import env_bool, env_float, env_int, load_settings
from api_etl_pipeline_spark.ingest.storage import bootstrap_tables
from api_etl_pipeline_spark.ops.skew import salted_agg
from api_etl_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_bootstrap_idempotent(spark):
    r, a = f"resp_{uuid.uuid4().hex[:8]}", f"art_{uuid.uuid4().hex[:8]}"
    bootstrap_tables(spark, r, a)
    bootstrap_tables(spark, r, a)  # second call must be a no-op
    assert spark.table(r).columns[:3] == ["provider", "method", "url"]
    assert "sha256" in spark.table(a).columns
    spark.sql(f"DROP TABLE {r}")
    spark.sql(f"DROP TABLE {a}")


def test_merge_upsert_replaces_matched(spark):
    existing = spark.createDataFrame(
        [("u1", "h1", "old1"), ("u2", "h2", "old2")], "source_url string, sha256 string, v string"
    )
    updates = spark.createDataFrame(
        [("u2", "h2b", "new2"), ("u3", "h3", "new3")], "source_url string, sha256 string, v string"
    )
    out = {r.source_url: (r.sha256, r.v) for r in
           merge_upsert(existing, updates, keys=("source_url",)).collect()}
    assert out == {"u1": ("h1", "old1"), "u2": ("h2b", "new2"), "u3": ("h3", "new3")}


def test_reconcile_by_hash_only_changed(spark):
    existing = spark.createDataFrame(
        [("u1", "h1", 1), ("u2", "h2", 1)], "source_url string, sha256 string, version int"
    )
    fresh = spark.createDataFrame(
        [("u1", "h1", 2),   # same hash: must NOT be upserted (version stays 1)
         ("u2", "h2x", 2),  # changed hash: replaced
         ("u3", "h3", 2)],  # new key: inserted
        "source_url string, sha256 string, version int",
    )
    out = {r.source_url: (r.sha256, r.version)
           for r in reconcile_by_hash(existing, fresh).collect()}
    assert out == {"u1": ("h1", 1), "u2": ("h2x", 2), "u3": ("h3", 2)}


def test_quarantine_backfills_response_id(spark, tmp_path):
    import shutil
    from pathlib import Path

    from api_etl_pipeline_spark.ingest.pipeline import run_offline_ingest

    root = tmp_path / "fixtures"
    shutil.copytree(Path(__file__).parent / "fixtures", root)
    (root / "sec_edgar" / "submissions.json").write_text("{}")
    res = run_offline_ingest(spark, "sec_edgar", str(root))
    err = res.errors_df.collect()[0]
    assert err.response_id is not None  # J3: id of the metadata response


def test_settings_env_parsing(monkeypatch):
    monkeypatch.setenv("APP_MAX_ARTIFACT_BYTES", "1024")
    monkeypatch.setenv("APP_PDF_READ_TIMEOUT_SECONDS", "12.5")
    monkeypatch.setenv("APP_LIVE", "TRUE")
    monkeypatch.setenv("APP_CAPTURE_GZIP_MIN_BYTES", "not-a-number")  # tolerant
    s = load_settings()
    assert s.max_artifact_bytes == 1024
    assert s.pdf_read_timeout_seconds == 12.5
    assert s.live is True
    assert s.capture_gzip_min_bytes == 5_000_000  # default on bad value
    assert env_bool("NOPE_MISSING", default=False) is False
    assert env_int("NOPE_MISSING", 7) == 7
    assert env_float("NOPE_MISSING", 1.5) == 1.5


def test_settings_dotenv_layer(monkeypatch, tmp_path):
    """Round-14 parity close-out (reference settings.py:8 —
    `SettingsConfigDict(env_file=".env")`): a `<cwd>/.env` file feeds
    the settings knobs with pydantic-settings precedence — process env
    beats the file, the file beats the field default — plus the
    python-dotenv grammar subset the reference exercises (comments,
    blanks, `export ` prefix, quote stripping)."""
    from api_etl_pipeline_spark.ingest.settings import dotenv_values

    (tmp_path / ".env").write_text(
        "# storage knobs (reference .env.example shape)\n"
        "\n"
        "APP_MAX_ARTIFACT_BYTES=2048\n"
        "export APP_PDF_READ_TIMEOUT_SECONDS=33.5\n"
        'APP_LIVE="yes"\n'
        "SEC_MAX_RPS='4'\n"
        "MALFORMED LINE WITHOUT EQUALS\n"
        "=no-key\n"
    )
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("APP_MAX_ARTIFACT_BYTES", raising=False)
    monkeypatch.delenv("APP_PDF_READ_TIMEOUT_SECONDS", raising=False)
    monkeypatch.delenv("APP_LIVE", raising=False)
    # process env must take precedence over the file (pydantic-settings
    # source order: env vars before dotenv)
    monkeypatch.setenv("SEC_MAX_RPS", "9")
    s = load_settings()
    assert s.max_artifact_bytes == 2048  # from .env
    assert s.pdf_read_timeout_seconds == 33.5  # export-prefixed line
    assert s.live is True  # quoted truthy value
    assert s.sec_max_rps == 9.0  # process env wins
    assert s.capture_gzip_min_bytes == 5_000_000  # default, not in either
    parsed = dotenv_values(tmp_path / ".env")
    assert "MALFORMED LINE WITHOUT EQUALS" not in parsed
    assert "" not in parsed
    # missing file == empty mapping (env_file is optional in pydantic)
    assert dotenv_values(tmp_path / "absent.env") == {}


def test_salted_agg_equals_direct(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    direct = {
        r.l_returnflag: (r.n, r.qty)
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n, r.qty)
        for r in salted_agg(
            li,
            key="l_returnflag",
            spread_col="l_orderkey",
            aggs={
                "n": (F.count("*"), F.sum),
                "qty": (F.sum("l_quantity"), F.sum),  # integer-valued: exact
            },
            buckets=8,
        ).collect()
    }
    assert salted == direct


def test_bloom_dedup_equals_plain(spark):
    from api_etl_pipeline_spark.ingest.dedup import dedup_insert, dedup_insert_bloom
    from api_etl_pipeline_spark.tables import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, SF_SMOKE, "documents").select(
        F.format_string("u-%d", F.col("doc_id")).alias("source_url"),
        F.sha2(F.col("text").cast("binary"), 256).alias("sha256"),
        "doc_id",
    )
    existing = d.filter(F.col("doc_id") % 3 == 0)
    plain = {r.doc_id for r in dedup_insert(d, existing).collect()}
    bloom = {r.doc_id for r in dedup_insert_bloom(d, existing, expected_items=10_000).collect()}
    assert bloom == plain and len(plain) > 0


def test_bloom_dedup_oversized_bitmap_falls_back(spark):
    """Round-5 verdict task 3: a bitmap sizing past the driver-memory cap
    must degrade to the plain anti-join (same result, no collect), not
    attempt a multi-GB driver collect. The plan proves the fallback: the
    bloom path carries an ArrowEvalPython probe stage, the plain path
    doesn't."""
    from api_etl_pipeline_spark.ingest.dedup import dedup_insert, dedup_insert_bloom
    from api_etl_pipeline_spark.ops.plan_lint import plan_text
    from api_etl_pipeline_spark.tables import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, SF_SMOKE, "documents").select(
        F.format_string("u-%d", F.col("doc_id")).alias("source_url"),
        F.sha2(F.col("text").cast("binary"), 256).alias("sha256"),
        "doc_id",
    )
    existing = d.filter(F.col("doc_id") % 3 == 0)
    # 10^9 expected items * 10 bits = 1.25 GB bitmap > 256 MB cap
    out = dedup_insert_bloom(d, existing, expected_items=1_000_000_000)
    assert "ArrowEvalPython" not in plan_text(out)
    plain = {r.doc_id for r in dedup_insert(d, existing).collect()}
    assert {r.doc_id for r in out.collect()} == plain and len(plain) > 0


def test_salted_join_equals_plain_join(spark):
    from api_etl_pipeline_spark.ops.skew import salted_join

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    dim = spark.createDataFrame(
        [("R", "returned"), ("A", "accepted"), ("N", "none")],
        ["l_returnflag", "label"],
    )
    plain = {
        (r.l_orderkey, r.l_linenumber, r.label)
        for r in li.join(dim, "l_returnflag").collect()
    }
    salted = {
        (r.l_orderkey, r.l_linenumber, r.label)
        for r in salted_join(
            li, dim, key="l_returnflag", spread_col="l_orderkey", buckets=8
        ).collect()
    }
    assert salted == plain and len(plain) > 0
