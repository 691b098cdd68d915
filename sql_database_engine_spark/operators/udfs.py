"""The Python-UDF surface, used the way the engine prescribes:
Arrow-vectorized pandas UDFs only, never row-at-a-time, and only where
demonstrating the escape hatch — each query here has a pure-JVM twin
elsewhere in the inventory that is the production path.

Both queries are deterministic (integer outputs / exact string ops),
so even the UDF path is DuckDB-oracle-checked.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import Catalog
from . import query


@query(
    "pandas_udf_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens_udf,
           md5(lower(trim(text))) AS fp_udf
    FROM documents
    """,
)
def pandas_udf_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-batched): tokenize + fingerprint in
    vectorized pandas. Exists to pin the UDF contract — the same
    results as the codegen twin (`token_counts`/`doc_fingerprint`),
    ~batch-speed Python instead of per-row serde."""
    import hashlib

    # Null texts flow through as pandas NA and must come out as SQL
    # NULLs — nullable Int32 (a bare astype('int32') crashes on NaN)
    # and na_action='ignore' (a bare map calls the lambda on NaN);
    # both match the oracle's null-in/null-out (null_sweep audit).
    @F.pandas_udf("int")
    def n_tokens(texts: pd.Series) -> pd.Series:
        return texts.str.split(" ").str.len().astype("Int32")

    @F.pandas_udf("string")
    def fingerprint(texts: pd.Series) -> pd.Series:
        return texts.str.strip().str.lower().map(
            lambda t: hashlib.md5(t.encode("utf-8")).hexdigest(),
            na_action="ignore")

    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        n_tokens(F.col("text")).alias("n_tokens_udf"),
        fingerprint(F.col("text")).alias("fp_udf"),
    )


@query(
    "applyinpandas_rank_chars",
    oracle="""
    SELECT doc_id, lang, n_chars,
           CAST(RANK() OVER (PARTITION BY lang
                             ORDER BY n_chars NULLS LAST) AS BIGINT)
               AS chars_rank
    FROM documents
    """,
)
def applyinpandas_rank_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-language rank of document length
    computed inside pandas (method='min' == SQL RANK tie semantics).
    One shuffle on the group key; each group is a plain pandas frame —
    the UDTF-shaped escape hatch for per-group logic Spark lacks.

    Null semantics (null_sweep audit): unknown lengths rank LAST and
    tie with each other — pandas ``na_option='bottom'`` with
    ``method='min'`` is exactly SQL ``RANK ... NULLS LAST`` (a bare
    .rank() leaves NaN ranks that crash the int64 cast), and the
    oracle pins the same order explicitly."""
    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["chars_rank"] = (pdf["n_chars"]
                             .rank(method="min", na_option="bottom")
                             .astype("int64"))
        return pdf

    d = Catalog(spark, sf_dir).documents.select("doc_id", "lang", "n_chars")
    return d.groupBy("lang").applyInPandas(
        rank_group, schema="doc_id long, lang string, n_chars long, chars_rank long")


@query(
    "udtf_doc_chunks",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), idx AS (
        SELECT doc_id, ts,
               unnest(generate_series(
                   0, CAST(ceil(len(ts) / 32.0) AS BIGINT) - 1)) AS i
        FROM toks
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           array_to_string(ts[i * 32 + 1 : i * 32 + 32], ' ') AS chunk_text
    FROM idx
    """,
)
def udtf_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined *table* function, Spark 4.x): one
    input row → many output rows, invoked via LATERAL in SQL. Same
    semantics as ``text.doc_chunk_windows`` — which is the production
    path (sequence explode + array slices, all codegen); this exists
    to prove the UDTF escape hatch and is oracle-checked against the
    same SQL, so the two surfaces are pinned identical. Python runs
    per row here — at 100 TB use the built-in twin unless the
    expansion logic genuinely needs Python."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx INT, chunk_text STRING")
    class ChunkDoc:
        def eval(self, text: str):
            # A missing document yields no chunks — matching the
            # oracle, where unnest(generate_series over a NULL
            # length) emits zero rows (null_sweep audit: a bare
            # .split crashed the worker on None).
            if text is None:
                return
            toks = text.split(" ")
            for i in range(0, len(toks), 32):
                yield i // 32, " ".join(toks[i:i + 32])

    spark.udtf.register("chunk_doc", ChunkDoc)
    from ..catalog import register_views
    register_views(spark, sf_dir, ("documents",))
    return spark.sql("""
        SELECT doc_id, c.chunk_idx, c.chunk_text
        FROM documents, LATERAL chunk_doc(text) c
    """)


@query(
    "pandas_udf_grouped_agg_median",
    oracle="""
    SELECT lang,
           CAST(median(n_chars) AS DOUBLE) AS median_chars,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def pandas_udf_grouped_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (Series → scalar), completing the
    UDF surface next to the scalar and grouped-map forms: exact
    per-language median document length computed in pandas. Both
    engines interpolate even-count medians as the midpoint of two
    exact integers — exactly representable doubles, so the oracle
    match is bit-exact.

    The scale caveat IS the lesson pinned here: a grouped-agg pandas
    UDF cannot partial-aggregate — every raw row shuffles to its
    group's executor (contrast percentile_approx's mergeable
    sketches, the production path at 100 TB). Use it when the
    aggregate genuinely needs arbitrary Python over the whole group,
    at bounded group sizes."""
    @F.pandas_udf("double")
    def median_chars(v: pd.Series) -> float:
        return float(v.median())

    # Spark disallows mixing group-agg pandas UDFs with JVM
    # aggregates in one agg() — the count rides a second pandas UDF.
    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(len(v))

    d = Catalog(spark, sf_dir).documents
    return d.groupBy("lang").agg(
        median_chars(F.col("n_chars")).alias("median_chars"),
        n_rows(F.col("n_chars")).alias("n_docs"))


#: One oracle serves both the window closed form and the applyInPandas
#: kernel: the recursive CTE replays the clamp recurrence literally.
_CLAMPED_BALANCE_ORACLE = """
    WITH RECURSIVE ev AS (
        SELECT user_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(value * 100) AS BIGINT)
                    ELSE -CAST(ROUND(value * 100) AS BIGINT) END AS delta
        FROM events WHERE event_type IN ('purchase', 'error')
          AND value IS NOT NULL AND user_id IS NOT NULL
    ), walk(user_id, rn, bal, clamps, maxb) AS (
        SELECT user_id, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
               CAST(0 AS BIGINT)
        FROM (SELECT DISTINCT user_id FROM ev)
        UNION ALL
        SELECT w.user_id, e.rn,
               GREATEST(w.bal + e.delta, 0),
               w.clamps + CASE WHEN w.bal + e.delta < 0 THEN 1 ELSE 0 END,
               GREATEST(w.maxb, GREATEST(w.bal + e.delta, 0))
        FROM walk w JOIN ev e
          ON e.user_id = w.user_id AND e.rn = w.rn + 1
    ), finals AS (
        SELECT user_id, bal, clamps, maxb,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY rn DESC) AS pick
        FROM walk
    )
    SELECT user_id,
           CAST(bal AS DOUBLE) / 100e0 AS final_balance,
           clamps AS n_clamps,
           CAST(maxb AS DOUBLE) / 100e0 AS max_balance
    FROM finals WHERE pick = 1
    """


def _clamped_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user cent deltas in event order: purchases credit, errors
    debit. Shared input of the closed-form and kernel variants.

    Events with a missing value carry no ledger effect and are
    excluded on all three execution tiers (closed form, pandas
    kernel, recursive-CTE oracle): a NULL delta would silently act
    as 0 in the window prefix sum (SUM skips nulls), NULL-poison the
    oracle's recurrence, and crash the kernel's int() — three
    different wrong answers for the same rows (null_sweep audit)."""
    from ..functions.exact import cents as cents_
    ev = Catalog(spark, sf_dir).events
    return (ev.filter(F.col("event_type").isin("purchase", "error")
                      & F.col("value").isNotNull()
                      & F.col("user_id").isNotNull())
            .select("user_id", "ts", "event_id",
                    F.when(F.col("event_type") == "purchase",
                           cents_(F.col("value")))
                    .otherwise(-cents_(F.col("value"))).alias("delta")))


@query("clamped_running_balance", oracle=_CLAMPED_BALANCE_ORACLE)
def clamped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-clamped running balance per user (purchases credit,
    errors debit, balance never below zero), computed in pure window
    algebra — no Python in the loop.

    The recurrence ``bal_t = max(bal_{t-1} + delta_t, 0)`` LOOKS
    sequential, but it is the Lindley recursion and has a closed
    form over prefix sums ``S_t``:

        bal_t = S_t - m_t,   m_t = min(0, min_{k<=t} S_k)

    (new strict minima of S below 0 are exactly the clamp events, so
    ``n_clamps`` is a lag compare on the running minimum, and
    ``max_balance`` is a plain MAX over the per-row closed form).
    Everything reduces to ONE window spec — hash-partition by user,
    sort by (ts, event_id) — whose output partitioning the final
    groupBy reuses: one exchange, one sort, zero UDFs. The
    applyInPandas twin (``clamped_running_balance_kernel``) keeps the
    sequential-loop formulation as the stateful-kernel tier demo and
    as the price of Python on the same data; at scale the closed form
    also removes the hot-user straggler (a single user's history no
    longer runs as one Python loop).

    Determinism: integer cents throughout; the oracle replays the
    literal recurrence as a recursive CTE — two different execution
    strategies, one fixpoint.
    """
    from pyspark.sql import Window as W

    deltas = _clamped_deltas(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = F.sum("delta").over(w.rowsBetween(W.unboundedPreceding, 0))
    prev_min = F.min("s").over(w.rowsBetween(W.unboundedPreceding, -1))
    stepped = (deltas
               .withColumn("s", s)
               # m_{t-1} with S_0 = 0: the empty-prefix min is 0.
               .withColumn("m_prev", F.least(F.lit(0),
                                             F.coalesce(prev_min, F.lit(0))))
               .withColumn("m", F.least(F.col("m_prev"), F.col("s"))))
    out = (stepped.groupBy("user_id")
           .agg((F.sum("delta") - F.least(F.lit(0), F.min("s")))
                .alias("bal"),
                F.sum((F.col("s") < F.col("m_prev")).cast("long"))
                .alias("n_clamps"),
                F.max(F.col("s") - F.col("m")).alias("maxb")))
    return out.select(
        "user_id",
        (F.col("bal").cast("double") / 100.0).alias("final_balance"),
        "n_clamps",
        (F.col("maxb").cast("double") / 100.0).alias("max_balance"))


@query("clamped_running_balance_kernel", oracle=_CLAMPED_BALANCE_ORACLE)
def clamped_running_balance_kernel(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """The same clamped balance as an ``applyInPandas`` stateful
    kernel — the UDF-tier demonstration (batch analogue of a
    transformWithState operator), kept to pin the escape-hatch
    contract and to measure its price against the window closed form
    in ``clamped_running_balance``, which is the production path.

    Scale shape: groups shard by user across executors (one shuffle),
    each group's recurrence is a tight numpy-backed loop over its own
    rows only — but a hot user's whole history serializes through one
    Python loop, which is exactly why the closed form wins.
    """
    deltas = _clamped_deltas(spark, sf_dir)

    schema = ("user_id bigint, final_balance double, n_clamps bigint, "
              "max_balance bigint")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        bal = 0
        clamps = 0
        maxb = 0
        for d in pdf["delta"].to_numpy():
            nxt = bal + int(d)
            if nxt < 0:
                clamps += 1
                nxt = 0
            bal = nxt
            if bal > maxb:
                maxb = bal
        return pd.DataFrame({"user_id": [int(pdf["user_id"].iloc[0])],
                             "final_balance": [bal],
                             "n_clamps": [clamps],
                             "max_balance": [maxb]})

    out = deltas.groupBy("user_id").applyInPandas(kernel, schema)
    return out.select(
        "user_id",
        (F.col("final_balance") / 100.0).alias("final_balance"),
        "n_clamps",
        (F.col("max_balance").cast("double") / 100.0).alias("max_balance"))


def arrow_token_stats_batches(batches):
    """mapInArrow kernel: ZERO-COPY columnar token statistics.

    Unlike the pandas tiers (which convert Arrow -> pandas and back),
    this operates on the Arrow RecordBatch directly with vectorized
    ``pyarrow.compute`` kernels — the cheapest possible Python hop:
    split on the single-space pattern (exactly the engines' split
    semantics, NOT whitespace-collapsing), list lengths, utf8 lengths.
    No per-row Python, no pandas materialization."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        out = pa.RecordBatch.from_arrays(
            [batch.column("doc_id"),
             batch.column("source"),
             pc.cast(pc.list_value_length(toks), pa.int64()),
             pc.cast(pc.utf8_length(batch.column("text")), pa.int64())],
            names=["doc_id", "source", "n_tokens", "n_chars_arrow"])
        yield out


@query(
    "arrow_batch_token_stats",
    oracle="""
    WITH per_doc AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars_arrow
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(CAST(SUM(n_tokens) AS BIGINT) AS BIGINT)
               AS total_tokens,
           CAST(CAST(SUM(n_chars_arrow) AS BIGINT) AS BIGINT)
               AS total_chars
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def arrow_batch_token_stats(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the fourth and leanest rung of the Python
    UDF ladder (row UDF → pandas UDF → applyInPandas → mapInArrow):
    the kernel receives the Arrow RecordBatch Spark already holds and
    runs vectorized ``pyarrow.compute`` kernels on it, skipping the
    Arrow→pandas→Arrow conversion the pandas tiers pay. Token counts
    use the single-space split pattern (exact match to both engines'
    split semantics, not whitespace collapsing), so the per-doc
    numbers — and the per-source rollup the JVM side aggregates —
    hash-verify against the oracle.

    Use this tier when the computation is expressible in Arrow
    compute but not in Spark SQL functions; here it is deliberately
    also SQL-expressible so the MECHANISM is oracle-checked.
    """
    d = Catalog(spark, sf_dir).documents.select("doc_id", "source", "text")
    stats = d.mapInArrow(
        arrow_token_stats_batches,
        schema=("doc_id bigint, source string, n_tokens bigint, "
                "n_chars_arrow bigint"))
    return (stats.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.sum("n_chars_arrow").alias("total_chars"))
            .orderBy("source"))
