"""Window functions (SURVEY.md §2.5, W-rows).

The reference only has window *semantics* (attempt numbering W1/W4,
latest-run selection W2, first-of-ordered-array W3); the engine exposes the
full ranking / analytic / frame-spec suite as Spark built-ins.

Determinism convention: every ORDER BY inside a window carries a unique
trailing key so row_number/lag/frames are reproducible across engines.
At scale, window partitioning keys (custkey, suppkey) are the shuffle
keys; a window over an already-partitioned column reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from api_etl_pipeline_spark.registry import query
from api_etl_pipeline_spark.tables import load_table


@query(
    "w01_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, rn
    FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               )::BIGINT AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def w01_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — row_number over a desc window (W2 analog:
    'latest/top per key'). One shuffle on the partition key."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
        )
    )


@query(
    "w02_rank_dense_rank",
    oracle="""
    SELECT s_suppkey, s_nationkey::BIGINT AS nationkey,
           ROUND(s_acctbal, 2) AS acctbal,
           RANK()       OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC)::BIGINT AS rnk,
           DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC)::BIGINT AS drnk
    FROM supplier
    """,
)
def w02_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank — tie-tolerant ranking (value-determined, so no
    tie-break key needed)."""
    s = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc())
    return s.select(
        "s_suppkey",
        F.col("s_nationkey").cast("bigint").alias("nationkey"),
        F.round("s_acctbal", 2).alias("acctbal"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@query(
    "w03_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS orderdate,
           DATE_DIFF('day',
               LAG(CAST(o_orderdate AS DATE)) OVER w,
               CAST(o_orderdate AS DATE))::BIGINT AS days_since_prev,
           LEAD(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def w03_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead — inter-order gaps per customer (the incremental-sync
    'previous watermark' lookup, T1/A6 analog, as an analytic function)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_custkey",
        "o_orderkey",
        # re-widened: DATE finals collect asymmetrically under pandas
        d.cast("timestamp_ntz").alias("orderdate"),
        F.datediff(d, F.lag(d).over(w)).cast("bigint").alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "w04_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC,
                        l_extendedprice ASC, l_discount ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_revenue
    FROM lineitem
    """,
)
def w04_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per supplier — explicit ROWS frame (A2/W1 analog:
    monotonic accumulation in event order)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        # the testdata has duplicate (orderkey, linenumber) rows at some
        # SFs — extend the ordering to a TOTAL order over the contributing
        # columns so prefix sums are engine-independent (fully identical
        # rows are interchangeable: same output multiset either way)
        .orderBy(
            F.col("l_shipdate").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
            F.col("l_extendedprice").asc(),
            F.col("l_discount").asc(),
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
        )
        .over(w)
        .cast("double")
        .alias("running_revenue"),
    )


@query(
    "w05_ntile",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC)::BIGINT AS quartile
    FROM customer
    """,
)
def w05_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles over a global window (unique tie-break key)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return c.select("c_custkey", F.ntile(4).over(w).cast("bigint").alias("quartile"))


@query(
    "w06_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
           LAST_VALUE(o_orderkey)  OVER w AS last_orderkey
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def w06_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an unbounded frame (W3 analog: first of an
    ordered collection)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.last("o_orderkey").over(w).alias("last_orderkey"),
    )


@query(
    "w07_range_frame",
    oracle="""
    SELECT s_suppkey, ROUND(s_acctbal, 2) AS acctbal,
           COUNT(*) OVER (
               ORDER BY s_acctbal
               RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING
           )::BIGINT AS n_within_500
    FROM supplier
    """,
)
def w07_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering — peers within ±500 acctbal."""
    s = load_table(spark, sf_dir, "supplier")
    w = W.orderBy(F.col("s_acctbal")).rangeBetween(-500, 500)
    return s.select(
        "s_suppkey",
        F.round("s_acctbal", 2).alias("acctbal"),
        F.count("*").over(w).cast("bigint").alias("n_within_500"),
    )


@query(
    "w08_distribution_functions",
    oracle="""
    SELECT c_custkey,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6)    AS cume,
           ntile(10) OVER w::BIGINT        AS decile
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def w08_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile — distribution ranking. Both are
    (rank-1)/(n-1)- and rank/n-style ratios of exact integers: the single
    division is deterministic, and rounding at 6dp only guards the
    cross-engine division-expression shape."""
    c = load_table(spark, sf_dir, "customer")
    w = W.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return c.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).cast("bigint").alias("decile"),
    )


@query(
    "w09_locf_gap_fill",
    oracle="""
    SELECT event_id, user_id, ts,
           CASE WHEN event_type = 'purchase' THEN value END AS purchase_value,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS locf_value
    FROM events
    """,
)
def w09_locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap fill: every event row carries
    the most recent purchase value for its user (IGNORE NULLS running
    last_value) — the canonical time-series fill pattern. NULL until a
    user's first purchase on both engines; ordering is total on
    (ts, event_id). Dialect note: DuckDB spells it
    `last_value(x IGNORE NULLS)`, Spark's SQL puts IGNORE NULLS after
    the call — the DataFrame API (`F.last(x, ignorenulls=True)`)
    sidesteps the divergence."""
    ev = load_table(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        pv.alias("purchase_value"),
        F.last(pv, ignorenulls=True).over(w).alias("locf_value"),
    )


@query(
    "w10_share_of_total",
    oracle="""
    WITH seg AS (
        SELECT c_mktsegment,
               SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS seg_bal_dec,
               COUNT(*)::BIGINT AS n_cust
        FROM customer WHERE c_acctbal > 0
        GROUP BY c_mktsegment
    )
    SELECT c_mktsegment,
           CAST(seg_bal_dec AS DOUBLE) AS seg_bal, n_cust,
           CAST(seg_bal_dec AS DOUBLE)
             / CAST(SUM(seg_bal_dec) OVER () AS DOUBLE) AS share_of_total
    FROM seg
    """,
)
def w10_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total: each group's fraction of the grand total via an
    unpartitioned window sum over the ALREADY-AGGREGATED rows (5 rows —
    the global window is dashboard-grain by construction, never applied
    to the raw fact table). Both numerator and denominator are exact
    decimal sums — including the WINDOW sum for the denominator, which
    as a double would re-introduce summation-order dependence — so the
    single division is IEEE-identical cross-engine."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    seg = c.groupBy("c_mktsegment").agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("seg_bal_dec"),
        F.count("*").alias("n_cust"),
    )
    w = W.partitionBy()
    return seg.select(
        "c_mktsegment",
        F.col("seg_bal_dec").cast("double").alias("seg_bal"),
        "n_cust",
        (
            F.col("seg_bal_dec").cast("double")
            / F.sum("seg_bal_dec").over(w).cast("double")
        ).alias("share_of_total"),
    )


@query(
    "w11_rolling_percentile_bands",
    oracle="""
    SELECT user_id, event_id,
           quantile_cont(value, 0.5) OVER w AS roll_p50,
           quantile_cont(value, 0.75) OVER w AS roll_p75,
           (value > 2 * quantile_cont(value, 0.5) OVER w) AS spike
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
    )
    """,
)
def w11_rolling_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling robust bands: per-user exact interpolated P50/P75 over the
    trailing 10 events, plus a spike flag against 2× the rolling median —
    the observability primitive for per-entity anomaly detection (robust
    to the heavy tails that break rolling mean ± stddev).

    Percentile fractions are binary-exact (0.5, 0.75 — the q26
    convention) so the interpolation arithmetic is bit-identical across
    engines even inside a moving frame. One exchange on user_id; the
    frame is rows-bounded so state per key is O(10)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, W.currentRow)
    )
    p50 = F.percentile("value", 0.5).over(w)
    return ev.select(
        "user_id",
        "event_id",
        p50.alias("roll_p50"),
        F.percentile("value", 0.75).over(w).alias("roll_p75"),
        (F.col("value") > 2 * p50).alias("spike"),
    )


W12_TRAIL_US = 3 * 86_400 * 1_000_000  # trailing 3 days, in microseconds


@query(
    "w12_time_range_window",
    oracle=f"""
    SELECT event_id, user_id,
           ts::TIMESTAMP AS ts,
           COUNT(*) OVER w::BIGINT AS n_3d,
           CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,2))) OVER w
                AS DOUBLE) AS val_3d
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN {W12_TRAIL_US} PRECEDING AND CURRENT ROW
    )
    """,
)
def w12_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-range window frame: per user, the trailing-3-DAY event count
    and value sum at every event — the event-TIME sibling of w07's
    value-range frame and w04/w11's row frames, and the most common
    real-world range frame (trailing-window features for models,
    rate-limit lookbacks, velocity rules). A ROWS frame cannot express
    it: the lookback must follow the clock, not the row count, so
    sparse users aggregate fewer rows and bursts aggregate more.

    Cross-engine discipline: the range key is INTEGER epoch
    microseconds on BOTH sides (unix_micros ≡ epoch_us — the inc01
    convention), so frame boundaries are exact integer comparisons and
    no interval/timezone semantics are in play; peer rows (equal ts)
    are IN-frame together on both engines by RANGE semantics, making
    the result order-insensitive within ties by construction. The value
    sum rides the exact-DECIMAL convention and casts to DOUBLE at the
    output (the q22/ev15 convention).

    Plan shape: ONE user_id exchange serves the single window — the
    frame is evaluated per partition with a sliding two-pointer over
    the time-sorted rows (Spark's RangeFrame), linear per user. At
    100 TB this is the same one-shuffle cost as any per-entity window;
    skewed users are the st03 salting story, unchanged."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        # NTZ -> TIMESTAMP is a no-op shift in the pinned UTC session,
        # so unix_micros == DuckDB epoch_us on the naive value (ev10)
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-W12_TRAIL_US, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.count("*").over(w).cast("bigint").alias("n_3d"),
        F.sum(F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("val_3d"),
    )
