"""Structured Streaming operators (see streaming/events_stream.py)."""

from . import events_stream  # noqa: F401
