"""Structured Streaming surfaces (extension — the reference is batch-only,
SURVEY §2.10)."""
