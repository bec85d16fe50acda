"""Structured Streaming variants of the batch pipeline."""
