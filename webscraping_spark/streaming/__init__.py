"""Structured Streaming crawl variant (reference async.py semantics)."""
