"""Structured Streaming variants of the incremental plane (SURVEY §2.8)."""
