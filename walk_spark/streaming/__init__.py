"""Structured Streaming wrappers: continuous crawl via foreachBatch and
event-time windowed monitoring of crawl metrics."""
