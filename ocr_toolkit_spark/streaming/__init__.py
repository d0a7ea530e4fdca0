"""Structured Streaming surface for the extraction engine."""
