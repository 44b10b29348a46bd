"""Parquet-backed state stores (sessions / chat memory / private KB)."""
