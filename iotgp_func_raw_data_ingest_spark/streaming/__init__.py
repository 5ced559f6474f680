"""Structured Streaming surface: streaming ingest + event-time analytics."""
