"""Deterministic sampling / splitting operators for corpus curation.

A 100 TB training-data pipeline cannot use `rand()`-based sampling for
anything that must be reproducible (train/val/test membership, eval
holdouts, rerun-stable subsamples): a retry on another executor would
re-draw. Everything here keys on a content/id hash instead — membership
is a pure function of the row, so any re-execution, re-partitioning, or
engine swap produces the identical sample. The md5-hex prefix is used as
the shared entropy source because both engines agree on it byte-for-byte
(see x01_hash_functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from api_etl_pipeline_spark.registry import query
from api_etl_pipeline_spark.tables import load_table


def hash_bucket(col, n_buckets: int = 100):
    """Deterministic [0, n_buckets) bucket from an id column: first 8 hex
    chars of md5 → int → mod. Cross-engine twin of DuckDB
    ``('0x' || substr(md5(x::VARCHAR), 1, 8))::BIGINT % n``."""
    hex8 = F.substring(F.md5(col.cast("string").cast("binary")), 1, 8)
    return F.conv(hex8, 16, 10).cast("bigint") % n_buckets


@query(
    "samp01_hash_split",
    oracle="""
    WITH assigned AS (
        SELECT doc_id, n_chars,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*)::BIGINT     AS n_docs,
           SUM(n_chars)::BIGINT AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM assigned
    GROUP BY 1
    """,
)
def samp01_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by id-hash bucket, with
    per-split size accounting. Membership is a pure function of doc_id —
    stable under retries, repartitioning, and incremental re-ingest (a new
    document never moves an old one between splits, unlike rand() or
    row_number-based splitting). One narrow map + one small hash agg."""
    d = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"), 100)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        )
    )


@query(
    "samp02_stratified_sample",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(doc_id::VARCHAR), doc_id
               ) AS sample_rank,
               COUNT(*) OVER (PARTITION BY lang) AS n_lang
        FROM documents
    )
    SELECT doc_id, lang, n_chars, sample_rank::BIGINT AS sample_rank
    FROM ranked
    WHERE sample_rank * 10 <= n_lang
    """,
)
def samp02_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 10% sample: within each language stratum, rank documents
    by id-hash (a reproducible shuffle order) and keep the first
    floor(n/10). Equal sampling pressure per stratum regardless of how
    skewed the language mix is — the standard recipe for building eval
    slices from an imbalanced corpus. The md5 rank order is uniform in
    doc_id, so the sample is unbiased w.r.t. any id-correlated drift.

    One window over the lang partitioning (strata are few → salting is
    not needed; the heavy lifting is the sort within each stratum)."""
    d = load_table(spark, sf_dir, "documents")
    order_key = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w = Window.partitionBy("lang").orderBy(order_key, "doc_id")
    wc = Window.partitionBy("lang")
    return (
        d.select(
            "doc_id",
            "lang",
            "n_chars",
            F.row_number().over(w).cast("bigint").alias("sample_rank"),
            F.count("*").over(wc).alias("n_lang"),
        )
        .filter(F.col("sample_rank") * 10 <= F.col("n_lang"))
        .drop("n_lang")
    )


@query(
    "samp03_fixed_size_sample",
    oracle="""
    SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT doc_id, source, n_chars,
               row_number() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
        FROM documents
    )
    WHERE rk <= 200
    """,
)
def samp03_fixed_size_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N deterministic global sample: order the corpus by id-hash
    and take the first 200. Unlike rate-based sampling (samp01) the size
    is exact, and unlike reservoir sampling the membership is a pure
    function of the ids present — reruns and engine swaps agree.

    Scale shape: orderBy(hash).limit(N) plans as TakeOrderedAndProject —
    each task keeps a local top-N heap and only N rows per task reach
    the driver-side merge, so there is NO global sort and NO single-task
    window over the corpus. The rank is re-derived afterwards on the
    N-row result (trivial)."""
    d = load_table(spark, sf_dir, "documents")
    hk = F.md5(F.col("doc_id").cast("string").cast("binary"))
    top = (
        d.select("doc_id", "source", "n_chars", hk.alias("hk"))
        .orderBy("hk", "doc_id")
        .limit(200)
    )
    w = Window.orderBy("hk", "doc_id")
    return top.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w).cast("bigint").alias("rk"),
    )


TEMP_ALPHA = 0.5  # sampling temperature exponent: p_s ∝ n_s^alpha


@query(
    "samp04_temperature_mix",
    oracle="""
    WITH sizes AS (
        SELECT source, COUNT(*)::BIGINT AS n_docs,
               SUM(n_chars)::BIGINT AS source_chars
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT SUM(source_chars)::BIGINT AS budget,
               list_reduce(
                   list_prepend(0.0, list(sqrt(source_chars) ORDER BY source)),
                   (a, b) -> a + b
               ) AS w_sum
        FROM sizes
    )
    SELECT s.source, s.n_docs, s.source_chars,
           CAST(s.source_chars AS DOUBLE) / t.budget AS natural_share,
           sqrt(s.source_chars) / t.w_sum AS temp_prob,
           (sqrt(s.source_chars) / t.w_sum) * t.budget / s.source_chars
             AS epochs
    FROM sizes s, tot t
    """,
)
def samp04_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the mT5/UniMax multilingual
    recipe): sampling probability p_s ∝ n_s^0.5 flattens the source
    distribution — small sources are UPsampled (epochs > 1: the source
    is seen more than once per corpus-sized token budget) and dominant
    sources downsampled, without the hard equal-share cap of mix01
    (which zeroes the long tail's deficit instead of redistributing by
    a power law). `epochs` = p_s·B/n_s is the number the data loader
    actually consumes: repeat-factor per source for budget B = Σn_s.

    Float determinism needs NO rounding: sqrt is correctly rounded by
    IEEE-754 (bit-identical across engines on identical integer input,
    unlike ln), the weight-sum is an explicit source-ascending fold on
    both sides (tx13 pattern), and the remaining ops are identically
    parenthesized divisions/multiplications of identical doubles.

    Plan shape: per-source sizes are one vocab-bounded exchange
    (map-side partial agg → #sources rows); the (budget, w_sum) pair is
    a single-row agg over those few rows, cross-joined back as a
    broadcast. Nothing here ever reshuffles the corpus — at 100 TB the
    mixing table is kilobytes computed from table statistics."""
    d = load_table(spark, sf_dir, "documents")
    sizes = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("source_chars"),
    )
    tot = sizes.agg(
        F.sum("source_chars").cast("bigint").alias("budget"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("source", F.sqrt("source_chars").alias("w")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["w"],
        ).alias("w_sum"),
    )
    w = F.sqrt("source_chars")
    return sizes.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "source_chars",
        (F.col("source_chars").cast("double") / F.col("budget")).alias(
            "natural_share"
        ),
        (w / F.col("w_sum")).alias("temp_prob"),
        ((w / F.col("w_sum")) * F.col("budget") / F.col("source_chars")).alias(
            "epochs"
        ),
    )


SAMP05_N = 50  # reservoir size


@query(
    "samp05_weighted_reservoir",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 0.5)
                  / 4294967296.0) / n_chars AS raw_key
        FROM documents
    )
    SELECT doc_id, source, n_chars,
           ROUND(raw_key, 9) + 0.0 AS sample_key,
           CAST(row_number() OVER (
               ORDER BY ROUND(raw_key, 9) DESC, doc_id
           ) AS BIGINT) AS rk
    FROM keyed
    QUALIFY rk <= {SAMP05_N}
    """,
)
def samp05_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, Efraimidis–Spirakis A-ES:
    each row draws key = ln(u)/w (u uniform, w = n_chars); the global
    top-N by key is an exact weighted sample — the distributed-safe way
    to take 'N docs, longer docs proportionally more likely' that a
    naive rand()<p filter cannot give (no fixed N, not rerun-stable).

    Deterministic u: the md5-hex prefix of doc_id (this module's shared
    entropy source) mapped into (0,1) as (h+0.5)/2^32 — reproducible on
    any engine/retry/partitioning, never exactly 0 so ln() is finite.
    Cross-engine float discipline: ln and one division per row with the
    identical literal sequence on both engines; the key ROUNDS to 9 dp
    before ranking (ln's last ulp is libm- vs JVM-dependent; ranking on
    the rounded value with the doc_id tie-break makes the order
    total and engine-independent — the tx16 rank-on-rounded pattern).

    Plan shape: one narrow projection + TakeOrderedAndProject (global
    top-N via per-partition partial top-N, no full sort, no shuffle of
    non-winners) — at 100 TB this is a scan plus N·partitions rows of
    combine traffic. A-ES is also the streaming/mergeable form: unions
    of per-shard top-N reservoirs re-top-N to the exact global sample."""
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("bigint")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    key = (F.round(F.log(u) / F.col("n_chars"), 9) + F.lit(0.0)).alias("sample_key")
    keyed = d.select("doc_id", "source", "n_chars", key)
    # orderBy+limit plans as TakeOrderedAndProject (per-partition partial
    # top-N, no global sort); a global row_number window here would
    # funnel every row through ONE partition — the q16 lesson. The rank
    # column is re-derived by a window over the 50 surviving rows only.
    top = keyed.orderBy(F.col("sample_key").desc(), F.col("doc_id")).limit(SAMP05_N)
    w = Window.orderBy(F.col("sample_key").desc(), F.col("doc_id"))
    return top.withColumn("rk", F.row_number().over(w).cast("bigint"))


def _cluster_split_oracle() -> str:
    from api_etl_pipeline_spark.llm_ops.dedup import _DUCK_CLOSURE, _DUCK_LSH_PAIRS

    return f"""
    WITH RECURSIVE pairs AS ({_DUCK_LSH_PAIRS}),
    {_DUCK_CLOSURE},
    assigned AS (
        SELECT d.doc_id, d.n_chars,
               COALESCE(c.component, d.doc_id) AS gk,
               (c.component IS NOT NULL) AS is_dup,
               ('0x' || substr(md5(COALESCE(c.component, d.doc_id)::VARCHAR), 1, 8))::BIGINT
                   % 100 AS gb,
               ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS nb
        FROM documents d LEFT JOIN comp c ON c.vertex = d.doc_id
    ),
    sides AS (
        SELECT doc_id, n_chars, gk, is_dup,
               CASE WHEN gb < 90 THEN 'train' ELSE 'test' END AS split,
               MIN(CASE WHEN nb < 90 THEN 0 ELSE 1 END) OVER (PARTITION BY gk) AS mn,
               MAX(CASE WHEN nb < 90 THEN 0 ELSE 1 END) OVER (PARTITION BY gk) AS mx
        FROM assigned
    )
    SELECT split,
           COUNT(*)::BIGINT AS n_docs,
           SUM(n_chars)::BIGINT AS total_chars,
           COUNT(DISTINCT gk)::BIGINT AS n_groups,
           SUM(CASE WHEN is_dup THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
           SUM(CASE WHEN is_dup AND mn <> mx THEN 1 ELSE 0 END)::BIGINT
               AS naive_leaked_docs
    FROM sides
    GROUP BY split
    """


@query("samp06_cluster_safe_split", oracle=_cluster_split_oracle())
def samp06_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/test split: the split unit is the NEAR-DUP
    CLUSTER (dd09's connected components over LSH candidate pairs), not
    the document — every member of a cluster hashes on the shared
    component label, so a doc and its near-duplicate can never land on
    opposite sides of the split (the classic eval-contamination bug a
    doc-level hash split ships silently). Singletons split on their own
    id; the 90/10 assignment stays the samp01 md5 arithmetic.

    The audit row carries its own justification: naive_leaked_docs
    counts the duplicate-cluster members that a NAIVE doc-id split
    would have scattered across sides (cluster-side min≠max under
    per-doc hashing) — nonzero there, zero leakage by construction
    here. Differentially pinned end-to-end: the oracle re-derives the
    clusters via recursive closure while Spark pointer-jumps, so split
    and audit agree only if the component labels agree doc-for-doc.

    Plan shape: dd04 candidates → log-depth components (driver-iterated
    pointer jumping, eager-checkpointed; since round 14 the map is the
    SHARED per-(session, sf, geometry) build — dedup.dd04_components —
    so dd09/dd10/samp06 pay the pair+component construction once per
    process, not three times) → ONE left join of the corpus against
    the ≤|dup docs| component map (AQE broadcasts it) → a
    cluster-keyed window over the dup subset + one hash agg to the
    2-row audit. At 100 TB the component map is the only state that
    moves — bounded by the duplication rate, not the corpus."""
    from api_etl_pipeline_spark.llm_ops.dedup import dd04_components

    d = load_table(spark, sf_dir, "documents")
    comp = dd04_components(spark, sf_dir).select(
        F.col("vertex").alias("doc_id"), "component"
    )
    gk = F.coalesce(F.col("component"), F.col("doc_id"))
    assigned = d.join(comp, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        gk.alias("gk"),
        F.col("component").isNotNull().alias("is_dup"),
        (hash_bucket(gk, 100) < 90).alias("in_train"),
        F.when(hash_bucket(F.col("doc_id"), 100) < 90, 0).otherwise(1).alias("naive_side"),
    )
    # mn/mx only decide the leak flag for DUP rows (singletons are
    # mn==mx by construction), and naive_side is a pure function of
    # doc_id — so compute them straight off the component map (bounded
    # by the duplication rate, already materialized shared state) and
    # broadcast-join back instead of a full-corpus window on gk: the
    # window shuffled EVERY row full-width through one exchange —
    # overwhelmingly singleton groups doing no work — where this form
    # moves only (split, gk) pairs for the distinct count (guide
    # §2.3/§2.4: narrow the exchange, replace the shuffle with a
    # broadcast). Identical values: min/max over the same dup groups'
    # naive_side, non-dup rows contribute 0 to the leak sum either way
    # (oracle unchanged, canon-verified).
    comp_side = F.when(hash_bucket(F.col("doc_id"), 100) < 90, 0).otherwise(1)
    dup_leak = (
        comp.select(F.col("component").alias("gk"), comp_side.alias("ns"))
        .groupBy("gk")
        .agg(F.min("ns").alias("mn"), F.max("ns").alias("mx"))
    )
    sides = assigned.select(
        "n_chars",
        "gk",
        "is_dup",
        F.when(F.col("in_train"), "train").otherwise("test").alias("split"),
    ).join(F.broadcast(dup_leak), "gk", "left")
    return sides.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct("gk").alias("n_groups"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).cast("bigint").alias("n_dup_docs"),
        F.sum(F.when(F.col("is_dup") & (F.col("mn") != F.col("mx")), 1).otherwise(0))
        .cast("bigint")
        .alias("naive_leaked_docs"),
    )


SAMP07_BUCKETS = 1000  # hashed-feature space (DSIR's "hashed n-grams")


@query(
    "samp07_dsir_importance",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, doc_id % 20 = 0 AS is_t,
               unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    b AS (
        SELECT doc_id, is_t,
               ('0x' || substr(md5(tok), 1, 8))::BIGINT % {SAMP07_BUCKETS}
                   AS bucket
        FROM toks
    ),
    spine AS (SELECT unnest(generate_series(0, {SAMP07_BUCKETS - 1}))::BIGINT
                  AS bucket),
    ct AS (SELECT bucket, COUNT(*)::BIGINT AS c FROM b WHERE is_t GROUP BY bucket),
    cr AS (SELECT bucket, COUNT(*)::BIGINT AS c FROM b WHERE NOT is_t GROUP BY bucket),
    sm AS (
        SELECT s.bucket,
               (COALESCE(ct.c, 0) + 1)::BIGINT AS st,
               (COALESCE(cr.c, 0) + 1)::BIGINT AS sr
        FROM spine s LEFT JOIN ct USING (bucket) LEFT JOIN cr USING (bucket)
    ),
    tot AS (SELECT SUM(st)::BIGINT AS tt, SUM(sr)::BIGINT AS tr FROM sm),
    lr AS (
        SELECT bucket, ln((st / tt::DOUBLE) / (sr / tr::DOUBLE)) AS r
        FROM sm, tot
    ),
    dc AS (
        SELECT doc_id, bucket, COUNT(*)::BIGINT AS cnt
        FROM b WHERE NOT is_t GROUP BY 1, 2
    ),
    w AS (
        SELECT doc_id, SUM(cnt)::BIGINT AS n_toks,
               list_reduce(list(cnt * r ORDER BY bucket), (a, x) -> a + x) AS lw
        FROM dc JOIN lr USING (bucket) GROUP BY doc_id
    )
    SELECT doc_id, n_toks, ROUND(lw, 6) AS log_weight,
           ROUND(lw, 6) > 0 AS selected
    FROM w
    """,
)
def samp07_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (public method: Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every raw document by the log importance ratio of a hashed-unigram
    bag-of-words model fitted on a target slice (doc_id%20==0 stands in
    for the high-quality target, the decon01 device) vs the raw pool —
    log w(doc) = Σ_buckets cnt_doc[b] · ln(p_target[b]/p_raw[b]), with
    Laplace-smoothed bucket probabilities over the FIXED 1000-bucket
    spine (the dq07 lesson). Positive log-weight = doc looks more like
    the target than the pool → selected.

    Float discipline: bucket counts are exact BIGINTs; the 1000 log
    ratios are computed once from identical integers (last-ulp ln skew
    absorbed by round(6), the tx13 caveat); the per-doc sum is an
    ORDERED fold over bucket-sorted contributions, so no summation-order
    dependence. Hashing is the md5 hash_bucket convention — at 100 TB
    the documented swap is xxhash64 (no cross-engine oracle to satisfy
    in production, and a JVM-native hash is ~10x cheaper than md5).

    Plan shape: one explode pass over the corpus feeding two tiny
    bucket-count aggs (1000-row outputs) and the per-(doc, bucket)
    count — the ONE corpus-scale shuffle; the ratio table broadcasts
    back. The target side is a fixed slice, so at 100 TB its bucket
    histogram is a stored 1000-row table and raw docs stream through
    score-and-filter in a single pass — exactly DSIR's design point."""
    d = load_table(spark, sf_dir, "documents")
    return dsir_log_weights(
        d.select("doc_id", (F.col("doc_id") % 20 == 0).alias("is_t"), "text")
    )


def dsir_log_weights(docs: DataFrame) -> DataFrame:
    """The samp07 scoring core over an arbitrary document set — shared
    with llm04's composed funnel so the two can never drift. `docs` must
    carry (doc_id, is_t, text); returns (doc_id, n_toks, log_weight,
    selected) for every NOT-is_t doc, with samp07's exact float
    discipline (bucket-sorted ordered fold, round(6) both for the
    published weight and the selection cut)."""
    toks = docs.select(
        "doc_id", "is_t", F.explode(F.split("text", " ")).alias("tok")
    ).select(
        "doc_id", "is_t", hash_bucket(F.col("tok"), SAMP07_BUCKETS).alias("bucket")
    )
    from api_etl_pipeline_spark.checkpoint import lazy_checkpoint

    toks = lazy_checkpoint(toks)  # feeds both histograms AND per-doc counts
    spine = (
        docs.sparkSession.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"), F.lit(SAMP07_BUCKETS - 1).cast("bigint")
                )
            ).alias("bucket")
        )
    )
    ct = toks.filter("is_t").groupBy("bucket").agg(F.count("*").alias("c"))
    cr = toks.filter("NOT is_t").groupBy("bucket").agg(F.count("*").alias("c"))
    sm = (
        spine.join(F.broadcast(ct.withColumnRenamed("c", "ctc")), "bucket", "left")
        .join(F.broadcast(cr.withColumnRenamed("c", "crc")), "bucket", "left")
        .select(
            "bucket",
            (F.coalesce("ctc", F.lit(0)) + 1).cast("bigint").alias("st"),
            (F.coalesce("crc", F.lit(0)) + 1).cast("bigint").alias("sr"),
        )
    )
    sm = lazy_checkpoint(sm)  # feeds totals AND the ratio projection
    tot = sm.agg(
        F.sum("st").cast("bigint").alias("tt"), F.sum("sr").cast("bigint").alias("tr")
    )
    lr = sm.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.log((F.col("st") / F.col("tt")) / (F.col("sr") / F.col("tr"))).alias("r"),
    )
    dc = (
        toks.filter("NOT is_t")
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        dc.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_toks"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("bucket").alias("b"), (F.col("cnt") * F.col("r")).alias("c"))
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("lw"),
        )
        .select(
            "doc_id",
            "n_toks",
            F.round("lw", 6).alias("log_weight"),
            # selected derives from the ROUNDED weight on both sides: a true
            # lw within accumulated ulp of 0 must not flip cross-engine.
            (F.round("lw", 6) > 0).alias("selected"),
        )
    )


# samp08 — temporal train/embargo/test split. samp06 prevents NEAR-DUP
# leakage (cluster-safe assignment); samp08 prevents TEMPORAL leakage:
# evaluation data must postdate training data, with an embargo gap so
# horizon-h features/labels computed near the boundary cannot straddle
# it (the standard purged/embargoed time-split from the forecasting and
# financial-ML literature).
SAMP08_TRAIN_NUM, SAMP08_TRAIN_DEN = 4, 5  # train target: >= 4/5 of rows
SAMP08_EMBARGO_DAYS = 1


@query(
    "samp08_temporal_split",
    oracle=f"""
    WITH comp AS (
        SELECT date_diff('day', DATE '1970-01-01',
                         date_trunc('day', ts))::BIGINT AS day_idx,
               user_id, COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    daily AS (SELECT day_idx, SUM(n)::BIGINT AS n FROM comp GROUP BY day_idx),
    cum AS (
        SELECT day_idx, n,
               SUM(n) OVER (ORDER BY day_idx ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )::BIGINT AS c,
               SUM(n) OVER ()::BIGINT AS total
        FROM daily
    ),
    cutoff AS (
        SELECT MIN(day_idx) AS cut
        FROM cum WHERE c * {SAMP08_TRAIN_DEN} >= total * {SAMP08_TRAIN_NUM}
    ),
    labeled AS (
        SELECT comp.*,
               CASE WHEN day_idx <= cut THEN 'train'
                    WHEN day_idx <= cut + {SAMP08_EMBARGO_DAYS} THEN 'embargo'
                    ELSE 'test' END AS split
        FROM comp, cutoff
    ),
    user_flags AS (
        SELECT user_id,
               MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train
        FROM labeled GROUP BY user_id
    )
    SELECT l.split,
           SUM(l.n)::BIGINT AS n_rows,
           COUNT(DISTINCT l.user_id)::BIGINT AS n_users,
           MIN(l.day_idx)::BIGINT AS min_day,
           MAX(l.day_idx)::BIGINT AS max_day,
           COUNT(DISTINCT CASE WHEN u.in_train = 1 THEN l.user_id
                 END)::BIGINT AS n_users_seen_in_train
    FROM labeled l JOIN user_flags u ON u.user_id = l.user_id
    GROUP BY l.split
    """,
)
def samp08_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/embargo/test split with leakage accounting: the
    cutoff is the earliest day at which cumulative rows reach >=
    {SAMP08_TRAIN_NUM}/{SAMP08_TRAIN_DEN} of the table (an exact integer
    comparison c*den >= total*num — never a float quantile), the next
    {SAMP08_EMBARGO_DAYS} day(s) are EMBARGOED (excluded from both
    sides, so boundary-straddling windows can't leak labels), and
    everything later is test. samp06 guards near-dup leakage between
    splits; samp08 guards time. Per split: rows, users, day bounds, and
    `n_users_seen_in_train` — the ENTITY-leakage disclosure (a temporal
    split intentionally re-uses users across time; a modeler deciding
    between time-based and user-based holdout reads exactly this
    number).

    Plan shape: ONE corpus scan into ONE map-side-combined (day, user)
    composite aggregate — the maint03 device — then checkpointed:
    daily counts, the cumulative cutoff (a window over |days| rows),
    the split labeling, and the user train-flags are all re-aggs of
    that composite. Everything after the composite is
    |days| + |users|-bounded; at 100 TB the cutoff computes from the
    partition manifest and the split is enforced by partition pruning,
    never a row scan."""
    from api_etl_pipeline_spark.checkpoint import lazy_checkpoint

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    comp = (
        ev.select(
            F.datediff(
                F.date_trunc("day", F.col("ts")), F.lit("1970-01-01").cast("date")
            )
            .cast("bigint")
            .alias("day_idx"),
            "user_id",
        )
        .groupBy("day_idx", "user_id")
        .agg(F.count("*").alias("n"))
    )
    comp = lazy_checkpoint(comp)  # feeds daily/cutoff, labeling, user flags
    daily = comp.groupBy("day_idx").agg(F.sum("n").alias("n"))
    wc = Window.orderBy(F.col("day_idx").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "day_idx",
        F.sum("n").over(wc).alias("c"),
        F.sum("n").over(Window.partitionBy()).alias("total"),
    )
    cutoff = cum.filter(
        F.col("c") * SAMP08_TRAIN_DEN >= F.col("total") * SAMP08_TRAIN_NUM
    ).agg(F.min("day_idx").alias("cut"))
    labeled = comp.crossJoin(F.broadcast(cutoff)).withColumn(
        "split",
        F.when(F.col("day_idx") <= F.col("cut"), "train")
        .when(F.col("day_idx") <= F.col("cut") + SAMP08_EMBARGO_DAYS, "embargo")
        .otherwise("test"),
    )
    user_flags = labeled.groupBy("user_id").agg(
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias("in_train")
    )
    return (
        labeled.join(F.broadcast(user_flags), "user_id")
        .groupBy("split")
        .agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.min("day_idx").cast("bigint").alias("min_day"),
            F.max("day_idx").cast("bigint").alias("max_day"),
            F.countDistinct(
                F.when(F.col("in_train") == 1, F.col("user_id"))
            )
            .cast("bigint")
            .alias("n_users_seen_in_train"),
        )
    )
