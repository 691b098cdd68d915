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
