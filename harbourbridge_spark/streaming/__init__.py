"""Structured Streaming variants of the event-table operators."""
