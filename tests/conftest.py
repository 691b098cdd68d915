from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from sql_database_engine_spark.session import get_spark
    s = get_spark("engine-tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same views the driver pre-registers."""
    import duckdb

    from sql_database_engine_spark.catalog import register_duck_views
    con = duckdb.connect()
    register_duck_views(con, SF_ORACLE)
    yield con
    con.close()
