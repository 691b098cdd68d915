"""User-facing status/error strings, byte-identical to the reference.

Sources (studied, not copied): /root/reference/db.cpp:538-601 (REPL
dispatch strings), db.cpp:392-426 (validation), spec/main_spec.rb
(golden expectations).
"""

PROMPT = "db > "                     # db.cpp:552
EXECUTED = "Executed."               # db.cpp:591
TABLE_FULL = "Error: Table full"     # db.cpp:594 (no trailing period)
SYNTAX_ERROR = "Syntax error. Could not parse statement"   # db.cpp:576
STRING_TOO_LONG = "String is too long."                    # db.cpp:582
NEGATIVE_ID = "ID must be positive."                       # db.cpp:585

def unrecognized_keyword(inp: str) -> str:                 # db.cpp:579
    return f"Unrecognized keyword at start of '{inp}'"

def unrecognized_command(cmd: str) -> str:                 # db.cpp:564
    return f"Unrecognized command '{cmd}'"


class PrepareError(Exception):
    """Statement failed validation; .message is the exact REPL line."""

    def __init__(self, message: str):
        super().__init__(message)
        self.message = message


class TableFullError(Exception):
    """Insert rejected by the declared capacity rule (db.cpp:471-475)."""
