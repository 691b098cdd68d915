"""Spark-free table-name registry and DuckDB view bootstrap.

The engine's table universe (the driver's testdata layout,
TESTDATA.md) expressed without importing pyspark, so oracle-side-only
tools (``tools/oracle_budget.py``, or any DuckDB harness) can start —
and print ``--help`` — without paying JVM-adjacent import cost
(ADVICE r7). ``catalog.py`` re-exports both names and asserts at
import time that :data:`TABLE_NAMES` matches the authoritative
``schemas.TESTDATA_SCHEMAS`` ordering, so the two modules cannot
drift.
"""

from __future__ import annotations

import re

#: Driver testdata tables, in ``schemas.TESTDATA_SCHEMAS`` order
#: (asserted by catalog.py at import).
TABLE_NAMES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

_IDENT = re.compile(r"[A-Za-z_]\w*\Z")


def register_duck_views(con, sf_dir: str,
                        names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register the driver's testdata tables as DuckDB views — the
    oracle-side twin of ``catalog.register_views``, shared by every
    differential harness (cert sweeps, regime sweeps, driver_sim,
    registry tests) so adding an eleventh source table is ONE edit,
    not a dozen synchronized copies of the view-bootstrap loop.

    The directory is SQL-escaped (doubled quotes: this helper is fed
    arbitrary ``--sf`` CLI values and a path containing ``'`` would
    otherwise break the statement) and the table identifier is
    validated against ``[A-Za-z_]\\w*`` then double-quoted — the
    helper is the shared public entry point, so a caller-supplied
    name must not be interpolated verbatim (ADVICE r7)."""
    for name in names:
        if not _IDENT.match(name):
            raise ValueError(f"invalid table identifier: {name!r}")
        path = f"{sf_dir}/{name}.parquet".replace("'", "''")
        con.sql(f'CREATE VIEW "{name}" AS SELECT * FROM \'{path}\'')
