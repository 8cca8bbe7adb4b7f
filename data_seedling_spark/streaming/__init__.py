"""Incremental (batch-CDC) and Structured Streaming operators."""
