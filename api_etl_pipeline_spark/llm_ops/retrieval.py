"""Hybrid retrieval: lexical BM25 + embedding similarity fused with
reciprocal-rank fusion (RRF) — the standard two-tower first stage of a
RAG / hard-negative-mining data pipeline, composed entirely from
operators this engine already verifies (tx16's BM25 ranker, sim01's
bit-exact cosine fold).

Semantic leg without a text-embedding model: the classic
"more-like-this" expansion — each query's BM25 rank-1 document seeds
the vector search (its embedding becomes the query vector). That keeps
the whole pipeline data-derived and therefore DuckDB-oracle-checkable
end-to-end, which is rare for hybrid retrieval.

Scale shape: the lexical leg is tx16's pruned inverted-index probe
(only matched (doc, term) rows ever shuffle); the seed join is
#queries rows against the embeddings table (broadcast); the semantic
leg is one narrow corpus pass scoring 3 query vectors (sim01's
broadcast shape) with a per-query top-k window; the fusion joins two
≤ k·#queries relations — kilobytes. Nothing here grows faster than
the corpus itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from api_etl_pipeline_spark.checkpoint import lazy_checkpoint
from api_etl_pipeline_spark.llm_ops.similarity import _dot, _duck_cosine, _dvec
from api_etl_pipeline_spark.llm_ops.text import _BM25_RANKED_SQL, BM25_TOPK, bm25_ranked
from api_etl_pipeline_spark.registry import query
from api_etl_pipeline_spark.tables import load_table

RRF_K = 60  # the standard RRF damping constant (Cormack et al.)


@query(
    "ret01_hybrid_rrf",
    oracle=f"""
    WITH bm25 AS ({_BM25_RANKED_SQL}),
    lex AS (
        SELECT query_id, doc_id, rk AS lex_rk FROM bm25
    ),
    seed AS (
        SELECT b.query_id, e.embedding::DOUBLE[] AS qe
        FROM bm25 b JOIN embeddings e ON e.vec_id = b.doc_id
        WHERE b.rk = 1
    ),
    sem_scored AS (
        SELECT s.query_id, c.vec_id AS doc_id,
               {_duck_cosine('s.qe', 'c.ce')} AS cos
        FROM seed s
        JOIN (SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings) c ON TRUE
    ),
    sem AS (
        SELECT query_id, doc_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, doc_id
               ) AS BIGINT) AS sem_rk
        FROM sem_scored
        QUALIFY sem_rk <= {BM25_TOPK}
    ),
    fused AS (
        SELECT query_id, doc_id, lex_rk, sem_rk,
               COALESCE(1.0 / ({RRF_K} + lex_rk), 0.0)
                 + COALESCE(1.0 / ({RRF_K} + sem_rk), 0.0) AS rrf
        FROM lex FULL JOIN sem USING (query_id, doc_id)
    )
    SELECT query_id, doc_id, lex_rk, sem_rk, rrf,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY rrf DESC, doc_id
           ) AS BIGINT) AS rrf_rk
    FROM fused
    QUALIFY rrf_rk <= {BM25_TOPK}
    """,
)
def ret01_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid top-k: RRF over the BM25 top-10 (lexical leg) and the
    cosine top-10 around each query's BM25 rank-1 document's embedding
    (semantic leg, "more-like-this" expansion). rrf = Σ 1/(60+rank)
    over the legs where the doc appears — rank-based fusion needs no
    score calibration between BM25 logs and cosines, which is exactly
    why production stacks use it.

    Float discipline: ranks are exact integers (lexical ranks order on
    tx16's ROUNDED scores; cosine ranks order on the bit-exact
    sequential fold), each RRF term is a single division, and the two
    terms add in a fixed written order — every double on both engines
    goes through the identical IEEE op sequence, so no rounding is
    needed anywhere in the fusion.

    Docs without embeddings (sf0.1 ships vectors for doc_id < 2000
    only) simply never enter the semantic leg on either engine; if a
    query's rank-1 doc has no vector, that query's semantic leg is
    empty and RRF degrades to lexical-only — same on both engines."""
    # lex feeds BOTH the seed derivation and the fusion join; without
    # lineage truncation the entire BM25 subtree (corpus scan + 3
    # exchanges) would re-execute per branch (the decon02 lesson). The
    # relation is ≤ k·#queries rows — kilobytes.
    lex = lazy_checkpoint(
        bm25_ranked(spark, sf_dir).select(
            "query_id", "doc_id", F.col("rk").alias("lex_rk")
        )
    )
    e = load_table(spark, sf_dir, "embeddings")
    seed = (
        lex.filter(F.col("lex_rk") == 1)
        .join(e, lex.doc_id == e.vec_id)
        .select("query_id", _dvec("embedding").alias("qe"))
        # norm hoisted to one fold per row on each side (r14): _cosine's
        # exact dot/(sqrt_q*sqrt_c) operation order is preserved below
        .withColumn("qn", F.sqrt(_dot(F.col("qe"), F.col("qe"))))
    )
    corpus = e.select(
        F.col("vec_id").alias("doc_id"), _dvec("embedding").alias("ce")
    ).withColumn("cn", F.sqrt(_dot(F.col("ce"), F.col("ce"))))
    sem_w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("doc_id"))
    sem = (
        F.broadcast(seed)
        .join(corpus)
        .select(
            "query_id",
            "doc_id",
            (_dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
        .withColumn("sem_rk", F.row_number().over(sem_w).cast("bigint"))
        .filter(F.col("sem_rk") <= BM25_TOPK)
        .select("query_id", "doc_id", "sem_rk")
    )
    fused = lex.join(sem, ["query_id", "doc_id"], "full").select(
        "query_id",
        "doc_id",
        "lex_rk",
        "sem_rk",
        (
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rk")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("sem_rk")), F.lit(0.0))
        ).alias("rrf"),
    )
    rrf_w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rrf_rk", F.row_number().over(rrf_w).cast("bigint"))
        .filter(F.col("rrf_rk") <= BM25_TOPK)
    )
