"""Relational operator library (SURVEY.md §2.2–2.8).

Each module registers named queries over the synthetic star schema via
api_etl_pipeline_spark.registry. The queries are the engine's verifiable
surface: idiomatic DataFrame/Spark SQL expressions of the operator
inventory, each paired with a DuckDB oracle.
"""
