"""Structured Streaming ingest (incremental corpus growth)."""
