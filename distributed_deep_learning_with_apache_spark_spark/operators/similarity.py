"""Similarity-search operators (filled in M5)."""
