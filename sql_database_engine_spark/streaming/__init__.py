"""Structured Streaming operators (see streaming/events_stream.py)."""
