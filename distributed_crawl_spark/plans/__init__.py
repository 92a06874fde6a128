"""Logical plan builders (one crawl round)."""
