"""Streaming surface: batch-equivalent window queries (oracle-checkable)
and true Structured Streaming pipelines (watermarks, foreachBatch)."""
