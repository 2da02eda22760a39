"""Deduplication operators (filled in M5)."""
