"""Count-min sketch: sub-linear-memory frequency estimation, built
with plain distributive aggregation.

The sketch is a d×w counter matrix: row i counts tokens into cell
``h_i(token) mod w``; an item's estimate is the min over its d cells.
Because each cell is a SUM, the build is one ``groupBy(row, cell)``
— partial-aggregated map-side, mergeable across partitions, executors,
days (sketch union = matrix addition). That mergeability is the whole
point at 100 TB: the exact vocabulary count
(``text.heavy_hitter_tokens``) shuffles one row per distinct token,
while the sketch shuffles at most d×w rows *total* regardless of
vocabulary size, at the price of a bounded overestimate
(E[err] ≤ e·N/w per hash row, driven below any threshold by width).

Guarantees are asserted statistically in
``tests/test_neardup_quality.py`` style: estimates never undercount,
and overshoot stays within the Markov bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import Catalog
from . import query

#: depth (independent hash rows) × width (cells per row).
CMS_DEPTH = 4
CMS_WIDTH = 1 << 14


def _cells(tok_col, depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """(row, cell) pairs for a token — xxhash64 with per-row salt."""
    return F.array(*[
        F.struct(F.lit(i).alias("row"),
                 F.pmod(F.xxhash64(F.concat(tok_col, F.lit(f"#{i}"))),
                        F.lit(width)).alias("cell"))
        for i in range(depth)
    ])


def build_cms(toks: DataFrame, tok_col: str = "tok") -> DataFrame:
    """The sketch matrix as a DataFrame: (row, cell, n)."""
    return (
        toks.select(F.explode(_cells(F.col(tok_col))).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query("cms_token_count_estimates")  # rows-only: sketch cells are engine-private
def cms_token_count_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate the top-25 tokens' frequencies from a count-min sketch
    and report estimate vs exact. The estimate join probes d cells per
    queried token against the (at most d×w row) sketch — the sketch
    side broadcasts at any corpus size, which is the payoff shape."""
    d = Catalog(spark, sf_dir).documents
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    cms = build_cms(toks)

    exact = (toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_exact"))
             .orderBy(F.col("n_exact").desc(), "tok").limit(25))
    probes = (exact.select("tok", "n_exact",
                           F.explode(_cells(F.col("tok"))).alias("rc"))
              .select("tok", "n_exact",
                      F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell")))
    return (
        probes.join(F.broadcast(cms), ["row", "cell"])
        .groupBy("tok", "n_exact")
        .agg(F.min("n").alias("n_est"))
        .orderBy(F.col("n_exact").desc(), "tok")
    )


@query(
    "cms_error_contract",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), e AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM toks GROUP BY tok
        ORDER BY n_exact DESC, tok LIMIT 25
    )
    SELECT tok, n_exact,
           CAST(1 AS BIGINT) AS no_undercount,
           CAST(1 AS BIGINT) AS within_bound
    FROM e
    """,
)
def cms_error_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min sketch's guarantees as an oracle-checked
    CONTRACT — companion to the rows-only
    ``cms_token_count_estimates`` (whose xxhash cells DuckDB cannot
    reproduce): for the top-25 tokens, emit the exact count plus
    flags asserting (a) the sketch never undercounts — a structural
    CMS property, deterministically true — and (b) the overcount
    stays within 8x the Markov bound e·N/w (measured slack is ~∞:
    zero overcount at every test SF; the 8x margin makes the flag
    deterministic-in-practice at any corpus this vocabulary shape
    scales to). Same bounded-contract pattern as
    ``agg_approx_distinct`` and ``sketch_percentile_drift`` — the
    driver hash-verifies the sketch's error envelope instead of
    skipping it.
    """
    import math
    d = Catalog(spark, sf_dir).documents
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    cms = build_cms(toks)
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_exact"))
             .orderBy(F.col("n_exact").desc(), "tok").limit(25))
    probes = (exact.select("tok", "n_exact",
                           F.explode(_cells(F.col("tok"))).alias("rc"))
              .select("tok", "n_exact",
                      F.col("rc.row").alias("row"),
                      F.col("rc.cell").alias("cell")))
    est = (probes.join(F.broadcast(cms), ["row", "cell"])
           .groupBy("tok", "n_exact")
           .agg(F.min("n").alias("n_est")))
    bound = F.ceil(F.lit(8.0 * math.e) * F.col("n_total") / F.lit(CMS_WIDTH))
    return (est.crossJoin(F.broadcast(total))
            .select("tok", "n_exact",
                    (F.col("n_est") >= F.col("n_exact")).cast("long")
                    .alias("no_undercount"),
                    (F.col("n_est") - F.col("n_exact") <= bound).cast("long")
                    .alias("within_bound")))
