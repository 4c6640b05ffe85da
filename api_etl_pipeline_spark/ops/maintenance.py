"""Table maintenance: small-file compaction.

At 100 TB the dominant table-health failure is small files: streaming
micro-batches, per-run ingest appends (ingest/storage.py writes one
append per run), and over-parallel shuffles each land hundreds of
sub-target files, and scan throughput collapses under per-file open
overhead + footer reads. The fix is a periodic compaction job: list the
table's data files, size the output partition count from the REAL byte
total (never a row-count guess), and rewrite.

Design notes for the rewrite:
- `coalesce` (default) merges files with NO shuffle — each output task
  concatenates whole input partitions. Right for the pure
  too-many-small-files case.
- `repartition(shuffle=True)` pays one full shuffle but rebalances —
  right when the input is also skewed (a few huge files among shards),
  since coalesce would preserve the skew.
- The rewrite is out-of-place (write to a new directory, then swap the
  table location). Plain-parquet directories have no atomic swap — a
  catalog/transaction-log format (Delta/Iceberg) is the production
  answer; this job is the executor-side mechanics those formats schedule.

Reference parity: the blob store's 2-char fan-out (blob_store.py:10)
bounds files-per-directory but not file size; this is the missing
maintenance half.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from api_etl_pipeline_spark.registry import query
from api_etl_pipeline_spark.tables import load_table


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file under `path`, recursively, via the
    Hadoop FileSystem API — the same listing the scan planner uses, so it
    works on any supported filesystem (local, HDFS, object stores), not
    just local disk. Hidden/metadata files (`_SUCCESS`, `.crc`) excluded."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    files: list[tuple[str, int]] = []
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        files.append((status.getPath().toString(), int(status.getLen())))
    return files


def plan_compaction(
    spark: SparkSession, path: str, target_file_bytes: int = 128 << 20
) -> dict:
    """Sizing arithmetic only (no I/O beyond the listing): how many output
    files a compaction of `path` should produce for `target_file_bytes`."""
    files = list_data_files(spark, path)
    total = sum(sz for _, sz in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    small = sum(1 for _, sz in files if sz < target_file_bytes // 2)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "small_files": small,
        "target_file_bytes": target_file_bytes,
        "planned_files": n_out,
        "worth_compacting": len(files) > n_out,
    }


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
    shuffle: bool = False,
    cluster_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet table at `path` into ~target-sized files at
    `out_path`. Returns the before/after stats. `shuffle=True` rebalances
    skewed inputs at the cost of one exchange; the default coalesce is
    exchange-free.

    `cluster_by` sorts rows WITHIN each output file by the given columns
    (`sortWithinPartitions` — no extra exchange beyond the optional
    rebalance). Clustering tightens each file's parquet min/max column
    statistics, so point/range filters on those columns skip whole files
    at planning time — the poor man's Z-order, and the right moment to
    apply it is compaction, when the data is being rewritten anyway.
    With shuffle=True the repartition uses the cluster columns as range
    keys, so file-level pruning gets global (not just per-file) locality."""
    plan = plan_compaction(spark, path, target_file_bytes)
    df = spark.read.parquet(path)
    n = plan["planned_files"]
    if shuffle:
        out = (
            df.repartitionByRange(n, *[df[c] for c in cluster_by])
            if cluster_by
            else df.repartition(n)
        )
    else:
        out = df.coalesce(n)
    if cluster_by:
        out = out.sortWithinPartitions(*cluster_by)
    out.write.parquet(out_path)
    after = list_data_files(spark, out_path)
    return {
        **plan,
        "out_path": out_path,
        "files_after": len(after),
        "bytes_after": sum(sz for _, sz in after),
    }


def zorder_compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    cols: list[str],
    target_file_bytes: int = 128 << 20,
) -> dict:
    """Rewrite the table Z-ordered on exactly two columns: each column is
    min/max-scaled to an 8-bit bucket (one tiny agg job), the buckets are
    Morton-interleaved (`ops/scalar.zorder_key`), and the rewrite
    range-partitions + sorts on that key. Every output file then covers a
    small tile of the 2-D space, so parquet min/max stats prune scans on
    EITHER column — the multi-dimensional layout a single-key sort cannot
    give (see tests/test_zorder.py for the span proof).

    Numeric, date, and timestamp columns are supported (dates/timestamps
    scale through their epoch value). The two agg scalars are collected to
    the driver — a deliberate, O(1)-size exception to the no-collect rule."""
    from pyspark.sql import functions as F

    from api_etl_pipeline_spark.ops.scalar import zorder_key

    if len(cols) != 2:
        raise ValueError("zorder_compact takes exactly two columns")
    plan = plan_compaction(spark, path, target_file_bytes)
    df = spark.read.parquet(path)

    def numeric(c: str):
        t = dict(df.dtypes)[c]
        col = F.col(c)
        if t == "date":
            return F.datediff(col, F.lit("1970-01-01")).cast("double")
        if t.startswith("timestamp"):
            return F.unix_micros(col.cast("timestamp")).cast("double")
        return col.cast("double")

    stats = df.agg(
        *[f(numeric(c)).alias(f"{n}_{i}") for i, c in enumerate(cols)
          for n, f in (("mn", F.min), ("mx", F.max))]
    ).collect()[0]

    def bucket(i: int, c: str):
        mn, mx = stats[f"mn_{i}"], stats[f"mx_{i}"]
        span = (mx - mn) or 1.0
        return F.least(
            F.lit(255),
            F.floor((numeric(c) - F.lit(mn)) / F.lit(span) * 256).cast("bigint"),
        )

    n = plan["planned_files"]
    z = zorder_key(bucket(0, cols[0]), bucket(1, cols[1]))
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.parquet(out_path)
    after = list_data_files(spark, out_path)
    return {
        **plan,
        "out_path": out_path,
        "zorder_cols": list(cols),
        "files_after": len(after),
        "bytes_after": sum(sz for _, sz in after),
    }


@query(
    "stats01_table_profile",
    oracle="""
    SELECT 'l_quantity' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(l_quantity) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS ndv,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_discount',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(l_discount) AS BIGINT),
           CAST(COUNT(DISTINCT l_discount) AS BIGINT),
           CAST(MIN(l_discount) AS DOUBLE),
           CAST(MAX(l_discount) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_suppkey',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(l_suppkey) AS BIGINT),
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT),
           CAST(MIN(l_suppkey) AS DOUBLE),
           CAST(MAX(l_suppkey) AS DOUBLE)
    FROM lineitem
    """,
)
def stats01_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics profiler — the ANALYZE TABLE analog every
    maintenance cycle runs to keep the optimizer's row-count/NDV/min-max
    estimates honest (join reordering and broadcast decisions at 100 TB
    live on these numbers).

    Shape: per-column (count, non-null, NDV, min, max) in long format
    from ONE scan: each row explodes into (col, value) pairs and a
    single groupBy(col) computes every stat — for a k-column profile
    that is 1 scan instead of k (the difference between an overnight
    ANALYZE and a coffee-break one at 100 TB). The per-group single
    count_distinct plans as a plain two-phase distinct aggregate — no
    Expand (contrast q32's multi-distinct). NDV here is EXACT so the
    DuckDB differential check is exact too; the at-scale variant swaps
    in approx_count_distinct (HLL, mergeable — see q27/q51), which is
    what a real stats job stores."""
    from api_etl_pipeline_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    stacked = li.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("col"), F.col(c).cast("double").alias("v")
                )
                for c in ("l_quantity", "l_discount", "l_suppkey")
            ])
        ).alias("cv")
    ).select(F.col("cv")["col"].alias("col"), F.col("cv")["v"].alias("v"))
    return stacked.groupBy("col").agg(
        F.count("*").alias("n_rows"),
        F.count("v").alias("n_nonnull"),
        F.count_distinct("v").alias("ndv"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )


@query(
    "stats02_rolling_anomaly",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,2))) AS day_sum
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    windowed AS (
        SELECT event_type, day, day_sum,
               SUM(day_sum) OVER w AS w_sum,
               SUM(day_sum * day_sum) OVER w AS w_sumsq,
               COUNT(*) OVER w AS w_n
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, CAST(day AS TIMESTAMP) AS day,
           CAST(ROUND(day_sum, 2) AS DOUBLE) AS day_sum,
           w_n::BIGINT AS w_n,
           ROUND(CASE WHEN w_n >= 3
                      AND w_sumsq::DOUBLE / w_n
                          - (w_sum::DOUBLE / w_n) * (w_sum::DOUBLE / w_n) > 0
                 THEN (day_sum::DOUBLE - w_sum::DOUBLE / w_n)
                      / sqrt(w_sumsq::DOUBLE / w_n
                             - (w_sum::DOUBLE / w_n) * (w_sum::DOUBLE / w_n))
                 END, 6) AS z_score,
           COALESCE(ABS(CASE WHEN w_n >= 3
                      AND w_sumsq::DOUBLE / w_n
                          - (w_sum::DOUBLE / w_n) * (w_sum::DOUBLE / w_n) > 0
                 THEN (day_sum::DOUBLE - w_sum::DOUBLE / w_n)
                      / sqrt(w_sumsq::DOUBLE / w_n
                             - (w_sum::DOUBLE / w_n) * (w_sum::DOUBLE / w_n))
                 END) > 2.0, FALSE) AS is_anomaly
    FROM windowed
    """,
)
def stats02_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-health anomaly detection — the monitoring query a data
    platform runs on every metric stream: per event type, each day's
    value total scored against the TRAILING week (rows 6-preceding to
    1-preceding, current day excluded so the anomaly cannot contaminate
    its own baseline) as a z-score; |z| > 2 flags the day. Null z when
    the baseline has <3 days or zero variance (both engines agree via
    the same guarded CASE).

    Cross-engine float discipline: daily sums and the rolling
    sum/sum-of-squares are EXACT DECIMAL (summation-order-free — the
    whole reason the naive stddev_samp-over-window form is NOT used:
    its double accumulation order differs between engines); only the
    final mean/variance/z division happens in double, identically on
    both sides, rounded to 6.

    Plan shape: one hash aggregate to per-(type, day) rows (~types ×
    days — tiny), then one window over that collapsed relation. The
    events table shuffles once on the agg key; the window never sees
    raw events. Linear at any scale; the rolling frame is O(7) state."""
    from api_etl_pipeline_spark.tables import load_table

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("day_sum"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, -1)
    )
    windowed = daily.select(
        "event_type",
        "day",
        "day_sum",
        F.sum("day_sum").over(w).alias("w_sum"),
        F.sum(F.col("day_sum") * F.col("day_sum")).over(w).alias("w_sumsq"),
        F.count("*").over(w).alias("w_n"),
    )
    n = F.col("w_n").cast("double")
    mean = F.col("w_sum").cast("double") / n
    var = F.col("w_sumsq").cast("double") / n - mean * mean
    z = F.when(
        (F.col("w_n") >= 3) & (var > 0),
        (F.col("day_sum").cast("double") - mean) / F.sqrt(var),
    )
    return windowed.select(
        "event_type",
        F.col("day").cast("timestamp_ntz").alias("day"),
        F.round("day_sum", 2).cast("double").alias("day_sum"),
        F.col("w_n").cast("bigint").alias("w_n"),
        F.round(z, 6).alias("z_score"),
        F.coalesce(F.abs(z) > 2.0, F.lit(False)).alias("is_anomaly"),
    )


MAINT01_TARGET = 262144  # planner target bytes per output group (fixture scale)


@query(
    "maint01_compaction_plan",
    oracle=f"""
    WITH inv AS (
        SELECT source AS part, doc_id AS file_id,
               (n_chars * 64 + 1024)::BIGINT AS size_bytes
        FROM documents
    ),
    classified AS (
        SELECT part, file_id, size_bytes,
               CASE WHEN size_bytes >= {MAINT01_TARGET} // 2
                    THEN 'keep' ELSE 'compact' END AS action
        FROM inv
    ),
    grouped AS (
        SELECT part, file_id, size_bytes, action,
               CASE WHEN action = 'compact' THEN
                   (SUM(size_bytes) OVER (
                        PARTITION BY part, action ORDER BY file_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) - size_bytes) // {MAINT01_TARGET}
               END::BIGINT AS group_id
        FROM classified
    )
    SELECT part, file_id, size_bytes, action, group_id,
           COUNT(*) OVER w::BIGINT AS group_files,
           SUM(size_bytes) OVER w::BIGINT AS group_bytes
    FROM grouped
    WINDOW w AS (PARTITION BY part, action, group_id)
    """,
)
def maint01_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed small-file compaction PLANNER — the missing half of
    this module's `compact` executor: at 100 TB the file manifest itself
    is big data (a petabyte table holds millions of files across
    thousands of partitions), so the file→output-group assignment must
    be a DataFrame job over the inventory, not the driver-side listing
    `plan_compaction` uses at single-table scale. The inventory here is
    synthesized deterministically from documents (file per doc,
    size = n_chars*64+1024, partition = source — the dq05 fixture
    device); production swaps in the catalog manifest scan.

    Semantics: files already ≥ half the target are KEPT in place
    (rewriting them wastes I/O); the small remainder is packed per
    partition in file-id order by the next-fit rule group = running
    cumsum-before DIV target (pack02's device — deterministic, order-
    preserving so clustering survives, and a group overshoots the
    target by at most one file). Every column is an exact integer, so
    the plan — not just its summary — is driver-hash-pinned, including
    each group's file count and byte total.

    Plan shape: one scan, one window per (partition, action) for the
    running sum, one window for the group rollup — both over the same
    partitioning, so ONE exchange serves all. Nothing leaves the
    executor tier; the output IS the work order a rewrite job
    (`compact`) executes per group."""
    inv = load_table(spark, sf_dir, "documents").select(
        F.col("source").alias("part"),
        F.col("doc_id").alias("file_id"),
        (F.col("n_chars").cast("bigint") * 64 + 1024).alias("size_bytes"),
    )
    classified = inv.select(
        "part",
        "file_id",
        "size_bytes",
        F.when(F.col("size_bytes") >= MAINT01_TARGET // 2, "keep")
        .otherwise("compact")
        .alias("action"),
    )
    run = Window.partitionBy("part", "action").orderBy(F.col("file_id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # group_id must be EXACT integer arithmetic end-to-end: the oracle uses
    # `//`, and floor-of-double mis-assigns boundary files once per-(part,
    # action) cumulative bytes pass 2^53 — real at petabyte-manifest scale.
    # `div` is Spark's integer division on bigints (exact match for the
    # non-negative cumsums here).
    grouped = classified.withColumn(
        "cum_before", F.sum("size_bytes").over(run) - F.col("size_bytes")
    ).select(
        "part",
        "file_id",
        "size_bytes",
        "action",
        F.when(
            F.col("action") == "compact",
            F.expr(f"cum_before div {MAINT01_TARGET}"),
        )
        .cast("bigint")
        .alias("group_id"),
    )
    w = Window.partitionBy("part", "action", "group_id")
    return grouped.select(
        "part",
        "file_id",
        "size_bytes",
        "action",
        "group_id",
        F.count("*").over(w).cast("bigint").alias("group_files"),
        F.sum("size_bytes").over(w).cast("bigint").alias("group_bytes"),
    )


# maint02 — retention/TTL delete planner. The governance half of table
# maintenance: given per-type retention policies, plan which event-time
# partitions to drop — entirely from (type, day) METADATA, the way a
# partition-pruned lakehouse retention job works (expired days drop
# whole partitions; no row-level scan of the doomed data). The
# reference's provenance tables (attempts/responses) name exactly this
# need (SCALE.md storage table: "expire with retention jobs"); this is
# that job's planning stage as a verifiable query. The reference point
# is MAX(ts) over the table — deterministic from data, never wall
# clock — and ages are exact integer day-diffs, so the whole plan is
# driver-hash-pinned.
MAINT02_POLICY = (
    ("error", 5), ("click", 10), ("view", 15), ("signup", 25),
    ("purchase", 45),
)


@query(
    "maint02_retention_plan",
    oracle=f"""
    WITH pol AS (
        SELECT * FROM (VALUES {", ".join(f"('{t}', {d})" for t, d in MAINT02_POLICY)})
            v(event_type, retention_days)
    ),
    d AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               COUNT(*)::BIGINT AS n_rows
        FROM events GROUP BY 1, 2
    ),
    dm AS (
        -- max(day(ts)) == day(max(ts)) (truncation is monotone), so the
        -- reference point rides a global window over the tiny aggregate
        -- instead of a SECOND corpus scan
        SELECT *, MAX(day) OVER () AS tmax_day FROM d
    )
    SELECT dm.event_type,
           dm.day::TIMESTAMP AS day,
           dm.n_rows,
           p.retention_days::BIGINT AS retention_days,
           date_diff('day', dm.day, dm.tmax_day)::BIGINT AS age_days,
           (date_diff('day', dm.day, dm.tmax_day) > p.retention_days)
               AS expired
    FROM dm JOIN pol p USING (event_type)
    """,
)
def maint02_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention/TTL delete plan at (event_type, day) partition grain:
    every partition's row count, its age relative to the table's
    newest day, the policy it falls under, and the expired verdict —
    the work order a partition-drop job executes (and the audit row a
    compliance review reads). Ages are exact integer day differences
    against MAX(ts)'s day, so cross-engine comparison is integer-only;
    `day` ships as timestamp_ntz per the no-DATE-finals convention.

    Plan shape: ONE corpus scan feeding ONE map-side-combined (type,
    day) count aggregate — |types| x |days| rows out; the MAX(ts)
    reference point is a global window over that tiny aggregate
    (max(day(ts)) == day(max(ts)) since truncation is monotone — the
    scan audit caught the original two-scan formulation), and the
    |policy|-row literal broadcasts. At 100 TB the count agg is
    replaced by the catalog's partition manifest (this query's output
    grain IS the partition grain), making the planner metadata-bound
    like maint01; expired partitions then drop via metadata delete,
    never a row scan."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    pol = spark.createDataFrame(
        list(MAINT02_POLICY), "event_type string, retention_days int"
    ).select("event_type", F.col("retention_days").cast("bigint").alias("retention_days"))
    d = (
        ev.select("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n_rows"))
        .withColumn("tmax_day", F.max("day").over(Window.partitionBy()))
    )
    age = F.datediff(F.col("tmax_day"), F.col("day")).cast("bigint")
    return (
        d.join(F.broadcast(pol), "event_type")
        .select(
            "event_type",
            F.col("day").cast("timestamp_ntz").alias("day"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            "retention_days",
            age.alias("age_days"),
            (age > F.col("retention_days")).alias("expired"),
        )
    )


# maint03 — zone-map / partition-pruning effectiveness estimator. The
# third leg of the maintenance trio: maint01 plans WHERE bytes live
# (compaction), maint02 plans WHAT to delete (retention), maint03
# quantifies WHAT A QUERY GETS TO SKIP — the number that justifies both
# (bench.py's range layout and maint01's order-preserving packing exist
# exactly to maximize it).
MAINT03_ROWS_PER_FILE = 1000  # arrival-layout file grain (event_id div)


@query(
    "maint03_zone_map_skip",
    oracle=f"""
    WITH base AS (
        SELECT event_id // {MAINT03_ROWS_PER_FILE} AS afile,
               date_diff('day', DATE '1970-01-01',
                         date_trunc('day', ts))::BIGINT AS day_idx
        FROM events
    ),
    comp AS (
        SELECT afile, day_idx, COUNT(*)::BIGINT AS n
        FROM base GROUP BY afile, day_idx
    ),
    g AS (SELECT MIN(day_idx) AS gmin, MAX(day_idx) AS gmax FROM comp),
    files AS (
        SELECT 'arrival' AS layout, afile AS file_id,
               MIN(day_idx) AS min_day, MAX(day_idx) AS max_day,
               SUM(n)::BIGINT AS n_rows
        FROM comp GROUP BY afile
        UNION ALL
        SELECT 'day_part' AS layout, day_idx AS file_id,
               day_idx, day_idx, SUM(n)::BIGINT
        FROM comp GROUP BY day_idx
    ),
    preds AS (
        SELECT 'recent_3d' AS predicate, gmax - 2 AS lo_day, gmax AS hi_day FROM g
        UNION ALL SELECT 'mid_week', gmin + 10, gmin + 16 FROM g
        UNION ALL SELECT 'point_day', gmin + 5, gmin + 5 FROM g
    )
    SELECT f.layout, p.predicate,
           MIN(p.lo_day)::BIGINT AS lo_day, MIN(p.hi_day)::BIGINT AS hi_day,
           COUNT(*)::BIGINT AS n_files,
           SUM(CASE WHEN f.max_day < p.lo_day OR f.min_day > p.hi_day
                    THEN 1 ELSE 0 END)::BIGINT AS n_skipped,
           SUM(f.n_rows)::BIGINT AS rows_total,
           SUM(CASE WHEN f.max_day < p.lo_day OR f.min_day > p.hi_day
                    THEN 0 ELSE f.n_rows END)::BIGINT AS rows_scanned,
           ROUND(SUM(CASE WHEN f.max_day < p.lo_day OR f.min_day > p.hi_day
                          THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 6) AS skip_rate
    FROM files f CROSS JOIN preds p
    GROUP BY f.layout, p.predicate
    """,
)
def maint03_zone_map_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max) file-skipping estimator: per-file day min/max
    stats under TWO layouts of the same events table — `arrival` (files
    cut every MAINT03_ROWS_PER_FILE rows in insertion order, the layout
    ingestion produces) vs `day_part` (event-day partitioning, the
    layout bench.py's range clustering / maint01's order-preserving
    compaction converge to) — evaluated against three deterministic
    time-range predicates (newest 3 days, a mid-corpus week, a single
    point day). Reports files skipped and rows actually scanned per
    (layout, predicate): the measured I/O argument for time-clustering
    a 100 TB event table. Zone grain is the DAY (a file is skippable
    iff [min_day, max_day] misses [lo, hi]) — the conservative pruning
    every lakehouse manifest supports; predicates anchor to the data's
    own min/max day, never wall clock, so the whole report is
    driver-hash-pinned exact integers (+ one ROUND(6) rate).

    Plan shape: ONE corpus scan into ONE map-side-combined (arrival-
    file, day) aggregate — the composite grain both layouts derive
    from — then checkpointed (~|files|x|days| rows): per-layout file
    stats are tiny re-aggs of it, the 1-row global min/max anchors the
    3-row predicate table (broadcast BNLJ, the samp07 1-row-totals
    shape), and the skip evaluation is a constant-size cross of
    |files| x 3. At 100 TB the composite aggregate IS the catalog
    manifest (per-file column stats come free from parquet footers) —
    the estimator is metadata-bound like maint01/02, and the row-level
    simulation exists so the oracle can restate both layouts from raw
    rows."""
    from api_etl_pipeline_spark.checkpoint import lazy_checkpoint

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    comp = (
        ev.select(
            F.expr(f"event_id div {MAINT03_ROWS_PER_FILE}").alias("afile"),
            F.datediff(
                F.date_trunc("day", F.col("ts")), F.lit("1970-01-01").cast("date")
            )
            .cast("bigint")
            .alias("day_idx"),
        )
        .groupBy("afile", "day_idx")
        .agg(F.count("*").alias("n"))
    )
    comp = lazy_checkpoint(comp)  # feeds files (x2 layouts) + the anchor agg
    arrival = comp.groupBy("afile").agg(
        F.min("day_idx").alias("min_day"),
        F.max("day_idx").alias("max_day"),
        F.sum("n").alias("n_rows"),
    ).select(
        F.lit("arrival").alias("layout"),
        F.col("afile").alias("file_id"),
        "min_day",
        "max_day",
        "n_rows",
    )
    day_part = comp.groupBy("day_idx").agg(F.sum("n").alias("n_rows")).select(
        F.lit("day_part").alias("layout"),
        F.col("day_idx").alias("file_id"),
        F.col("day_idx").alias("min_day"),
        F.col("day_idx").alias("max_day"),
        "n_rows",
    )
    files = arrival.unionByName(day_part)
    g = comp.agg(F.min("day_idx").alias("gmin"), F.max("day_idx").alias("gmax"))
    preds = g.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("recent_3d").alias("predicate"),
                    (F.col("gmax") - 2).alias("lo_day"),
                    F.col("gmax").alias("hi_day"),
                ),
                F.struct(
                    F.lit("mid_week").alias("predicate"),
                    (F.col("gmin") + 10).alias("lo_day"),
                    (F.col("gmin") + 16).alias("hi_day"),
                ),
                F.struct(
                    F.lit("point_day").alias("predicate"),
                    (F.col("gmin") + 5).alias("lo_day"),
                    (F.col("gmin") + 5).alias("hi_day"),
                ),
            )
        ).alias("p")
    ).select("p.predicate", "p.lo_day", "p.hi_day")
    skipped = (F.col("max_day") < F.col("lo_day")) | (
        F.col("min_day") > F.col("hi_day")
    )
    return (
        files.crossJoin(F.broadcast(preds))
        .groupBy("layout", "predicate")
        .agg(
            F.min("lo_day").cast("bigint").alias("lo_day"),
            F.min("hi_day").cast("bigint").alias("hi_day"),
            F.count("*").cast("bigint").alias("n_files"),
            F.sum(F.when(skipped, 1).otherwise(0)).cast("bigint").alias("n_skipped"),
            F.sum("n_rows").cast("bigint").alias("rows_total"),
            F.sum(F.when(skipped, 0).otherwise(F.col("n_rows")))
            .cast("bigint")
            .alias("rows_scanned"),
            F.round(
                F.sum(F.when(skipped, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("skip_rate"),
        )
    )
