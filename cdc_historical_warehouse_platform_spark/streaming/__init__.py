"""Structured Streaming layer: continuous CDC ingestion + windowed
event aggregations (SURVEY.md §2.9)."""
