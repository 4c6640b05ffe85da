"""api_etl_pipeline_spark — a PySpark-native analytics/ETL engine.

A ground-up re-expression of the capabilities of the reference ETL spine
(benjmcd/api-etl-pipeline: fetch → parse → hash → dedup → persist, see
/root/reference) as an idiomatic Spark DataFrame / Spark SQL engine, plus
the relational-analytics and LLM-data-pipeline operator layers the
reference implies but does not implement.

Layout:
    session.py    — SparkSession factory tuned for local[N] and for scale
    tables.py     — testdata loaders (star schema + documents/embeddings/events)
    registry.py   — named-query registry: every operator is a (spark_fn, oracle_sql) pair
    ops/          — relational core (filters, joins, aggs, windows, sorts, set ops)
    ingest/       — capability parity with the reference dataflow
    llm_ops/      — dedup, similarity search, text analysis, multimodal plumbing
    streaming/    — watermark / windowed / stateful streaming over events
"""

__version__ = "0.1.0"
