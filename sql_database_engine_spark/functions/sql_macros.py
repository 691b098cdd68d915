"""SQL-callable engine functions (Spark SQL scalar UDFs).

``CREATE TEMPORARY FUNCTION name(args) RETURNS type RETURN expr``
(Spark 3.4+) registers a *SQL macro*: the body inlines into the
calling query's plan as ordinary Catalyst expressions — codegen'd,
optimizable, zero Python — so SQL users get the engine's vector/text
primitives at native speed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: name → (signature, return type, body). Bodies mirror the column
#: builders in functions/ and operators/ (same fold shapes).
SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    "vec_dot": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
        " (acc, x) -> acc + x)",
    ),
    "vec_norm": (
        "a ARRAY<DOUBLE>", "DOUBLE",
        "sqrt(vec_dot(a, a))",
    ),
    "cosine_sim": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", "DOUBLE",
        "vec_dot(a, b) / (vec_norm(a) * vec_norm(b))",
    ),
    "money_cents": (
        "x DOUBLE", "BIGINT",
        "CAST(ROUND(x * 100) AS BIGINT)",
    ),
    "token_count": (
        "t STRING", "INT",
        "size(split(t, ' '))",
    ),
    "content_fingerprint": (
        "t STRING", "STRING",
        "md5(lower(trim(t)))",
    ),
}


def install_sql_functions(spark: SparkSession) -> None:
    """Register every engine SQL function on the session (idempotent:
    CREATE OR REPLACE)."""
    for name, (sig, ret, body) in SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) "
                  f"RETURNS {ret} RETURN {body}")
