"""Testdata loaders.

The driver generates deterministic TPC-H-ish parquet at
/root/testdata/sf{0.001,0.01,0.1} (see /root/repo/TESTDATA.md). Loading is
a plain columnar parquet scan — Catalyst pushes filters and prunes columns
into the scan, so callers should select/filter on the returned DataFrames
directly rather than pre-materializing.

At 100 TB these would be partitioned tables (e.g. orders by month,
lineitem by shipdate) registered in a catalog; the loader shape stays the
same — `spark.read.parquet` on a directory prefix with partition pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def ensure_engine_confs(spark: SparkSession) -> None:
    """Engine-required runtime SQL confs, applied defensively to WHATEVER
    session the caller provides (the driver harness passes its own
    vanilla SparkSession to entry()/queries() — without these, events
    reads throw PARQUET_TYPE_ILLEGAL, the NRC dual-casing schema fails to
    resolve, and non-UTC sessions shift collected timestamps vs the
    DuckDB oracle). All three are runtime-settable and idempotent."""
    for key, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.caseSensitive", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            if spark.conf.get(key, None) != val:
                spark.conf.set(key, val)
        except Exception:
            pass  # conf not settable in this deployment — queries may still work


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_engine_confs(spark)
    if sf_dir.startswith("catalog:"):
        # catalog-registered tables (e.g. the bucketed layouts the scale
        # probe materializes): "catalog:<prefix>" resolves <prefix><name>
        # through the metastore, which is how bucket metadata reaches the
        # planner — a plain parquet path read cannot carry it. Every
        # query fn works unchanged against either scheme. Not cached:
        # catalog state (REFRESH/DROP between probe legs) must stay live.
        return spark.table(f"{sf_dir.removeprefix('catalog:')}{name}")
    # r14 optimization (guide §1.2 "per-task work", driver edition): the
    # path read re-lists the directory and re-reads parquet footers for
    # schema inference on EVERY call — pure driver-side metadata work
    # that bench.py's construction timers showed on every one of 146
    # query constructions × 5 runs. The analyzed scan relation is
    # immutable and identical for every caller, so memoize it per
    # (session, sf_dir, name) — same directory-keyed device as
    # _EVENTS_TS_PROBE_CACHE below (testdata/layout dirs are written
    # once, then read; a mid-session in-place rewrite was already
    # unsupported). Data is NOT cached: every action still scans parquet.
    from api_etl_pipeline_spark._memo import session_memo

    def _build() -> DataFrame:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            # parquet TIMESTAMP(NANOS) read via nanosAsLong: truncate ns → µs
            # (matches DuckDB's truncation) and rebuild as TIMESTAMP_NTZ — the
            # same naive type the other tables read as. NTZ collects without
            # any timezone conversion, so results are identical no matter what
            # timezone the caller's session or Python process runs in.
            from pyspark.sql import functions as F

            df = df.withColumn(
                "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
            )
        return df

    return session_memo(
        spark,
        ("load_table", sf_dir, name),
        _build,
        wall_label=f"load_table[{os.path.basename(sf_dir.rstrip('/'))}]",
    )


# directory -> whether ts surfaced as bigint; the probe reads parquet
# footers, so repeated stream constructions over the same directory
# (st06/st07 build two streams each) shouldn't re-list and re-read them.
# Keyed by path only: a directory's files are append-only within a test
# run and a testdata generation never flips precision in place.
_EVENTS_TS_PROBE_CACHE: dict[str, bool] = {}


def _events_ts_is_long(spark: SparkSession, directory: str) -> bool:
    if directory not in _EVENTS_TS_PROBE_CACHE:
        try:
            dtypes = dict(spark.read.parquet(directory).dtypes)
        except Exception:
            # empty staging directory: no footers to infer from. Fall
            # back to the CURRENT testdata generation (TIMESTAMP_MICROS,
            # i.e. not bigint) so callers can build the stream before the
            # first file lands — the pre-probe behavior. Don't cache:
            # once files arrive the probe should see them.
            return False
        _EVENTS_TS_PROBE_CACHE[directory] = dtypes.get("ts") == "bigint"
    return _EVENTS_TS_PROBE_CACHE[directory]


def load_events_stream(spark: SparkSession, directory: str) -> DataFrame:
    """Streaming twin of load_table('events'). The file stream source
    needs an explicit schema, and the events timestamp has shipped as
    both TIMESTAMP(NANOS) (rounds 1-2 testdata: surfaces as INT64 under
    nanosAsLong, needs a µs rebuild) and TIMESTAMP(MICROS) (current
    testdata: reads natively) — so probe the directory with a batch read
    and build the matching stream schema instead of wiring in either
    generation's layout. The probe is cached per directory and an EMPTY
    directory falls back to the current-generation schema (stream can be
    constructed before any file arrives)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ensure_engine_confs(spark)
    ts_is_long = _events_ts_is_long(spark, directory)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType() if ts_is_long else T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    # streaming watermarks want TimestampType (not NTZ) — the batch
    # loader's NTZ choice is for timezone-proof collection; streams keep
    # the zoned type the watermark machinery expects (values agree under
    # the UTC session conf ensure_engine_confs pins)
    raw = spark.readStream.schema(schema).format("parquet").load(directory)
    if ts_is_long:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (the SQL surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Engine SQL surface: the same catalog of tables the DataFrame
    operators see, queryable as ANSI SQL (Catalyst produces identical
    plans for either API — SURVEY guide). Views are (re)registered per
    call, so the sf_dir always matches."""
    register_views(spark, sf_dir)
    return spark.sql(sql)
