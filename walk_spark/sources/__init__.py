"""Deterministic synthetic input sources (pages corpora, seeds, multimodal
blobs) — stand-ins for Common-Crawl-style Iceberg tables per FIXTURES.md."""
