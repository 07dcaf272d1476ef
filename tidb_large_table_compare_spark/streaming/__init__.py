"""Structured Streaming operators (BASELINE.json extension; reference is batch-only)."""
