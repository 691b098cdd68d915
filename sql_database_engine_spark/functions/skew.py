"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (on by default in this engine) handles most
skew at runtime; explicit salting remains the tool when one key is so
hot that even a split partition overwhelms a task — the classic
power-law entity (the null key, the megacustomer, the bot user).

``salted_join`` replicates the *small* side SALT_N ways and scatters
the big side's hot keys across salt buckets, so the hot key's rows
spread over SALT_N tasks instead of one. Join semantics are preserved
exactly for inner equi-joins (each big-side row matches exactly its
own salt replica).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_n: int = 8) -> DataFrame:
    """Inner equi-join on `key` with the big side salted `salt_n` ways.

    The small side is exploded ×salt_n (cheap: it's small by
    contract); the big side picks a deterministic pseudo-random salt
    per row via a hash of its whole row position-independent content.
    """
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)])))
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt_n)).cast("int"))
    joined = salted_big.join(
        salted_small,
        [key, "__salt"],
        "inner",
    )
    return joined.drop("__salt")
