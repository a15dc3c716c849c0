"""Structured Streaming surface (X7): event-time windows with watermarks.

Batch-mode twins of every windowed aggregation live beside the streaming
forms so the DuckDB oracle can check the semantics (SURVEY.md §7d)."""
