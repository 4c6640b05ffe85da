"""Ingest parity layer — the reference dataflow re-expressed Spark-first.

Covers SURVEY.md §2.1 (sources/sinks), the parse/extract/quarantine
projections (§2.2), and the dedup-insert merge (§2.3 J2). The reference's
per-item imperative loop (pipeline.py:22-56) becomes a declarative chain:
plan DataFrame → parse (from_json PERMISSIVE) → validate-split (filter +
anti-branch quarantine) → hash (sha2) → dedup (left_anti) → sinks.
"""
