"""Streaming semantics (SURVEY.md §2.9): batch-equivalent window queries
(oracle-checkable) in batch_windows.py; true Structured Streaming
transforms in stream_ops.py (verified by pytest with a memory sink)."""
