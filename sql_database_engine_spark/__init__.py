"""sql_database_engine_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference `banesp/sql-database-engine` (a minimal SQLite-clone
learning project: one fixed-schema table, REPL insert/select, file
persistence, validation, storage introspection — see SURVEY.md), built
idiomatically on Spark SQL + Catalyst rather than ported:

- schemas are explicit ``StructType``s (``schemas.py``),
- storage is Parquet behind a tiny catalog (``catalog.py``),
- the reference's REPL surface (insert/select/.exit/.constants/.btree,
  exact error strings, insertion-order scans) lives in ``repl.py`` +
  ``storage.py``,
- the full relational operator surface (filter/project/join/agg/
  window/set-op/scalar fns) is declarative DataFrame plans under
  ``operators/`` optimized by Catalyst,
- the `events` table runs through Structured Streaming
  (``streaming/``),
- LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) are first-class citizens under
  ``operators/``.

Every operator is designed for a multi-executor cluster at ~100 TB:
broadcast the dimension tables, shuffle only on declared keys, keep
expressions JVM-side (no row-at-a-time Python in hot paths), and let
AQE re-plan skew at runtime. Local-mode tests only verify correctness.
"""

__version__ = "0.1.0"

# PEP 562 lazy re-exports: the package namespace keeps its historical
# surface (`from sql_database_engine_spark import Catalog`, ...) but
# importing the package no longer pulls pyspark eagerly, so Spark-free
# submodules (``tables.py``) are importable by DuckDB-only tools
# without JVM-adjacent import cost (ADVICE r7).
_LAZY = {
    "get_spark": "session", "tune": "session",
    "Catalog": "catalog", "load_table": "catalog",
    "register_views": "catalog",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module("." + _LAZY[name], __name__),
                       name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
