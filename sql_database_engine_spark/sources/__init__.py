"""Source/sink connectors (see sources/readers.py)."""
