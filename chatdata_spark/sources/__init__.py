"""Batch ingestion sources (S2/S3/S8)."""
