"""Logical-plan layer for the REPL-parity surface (see plans/statement.py)."""
