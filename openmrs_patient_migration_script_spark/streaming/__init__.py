"""Structured Streaming surface (SURVEY.md §2.10): readStream pipelines
whose transformations are shared with the batch-parity declared queries."""
