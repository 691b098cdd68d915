"""Scalar-function surface: string / date / math / conditional / JSON /
array expressions.

All row-level, all built-in ``pyspark.sql.functions`` — these stay
inside whole-stage codegen (no Python in the loop), so at 100 TB they
run at scan speed. Oracle notes where Spark and DuckDB semantics need
aligning (1-based substring in both; regexp empty-string on no-match;
transcendentals avoided — libm last-ulp differences across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import Catalog
from . import query


@query(
    "scalar_string_fns",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substring(p_type, 1, 5) AS type_prefix,
           concat_ws('|', p_brand, p_type) AS brand_type,
           CASE WHEN p_type IS NULL THEN NULL
                ELSE split_part(p_type, ' ', 1) END AS type_first_word,
           replace(p_name, ' ', '_') AS name_snake,
           trim(p_name) AS name_trim,
           CASE WHEN p_name LIKE '%gold%' THEN 1 ELSE 0 END AS has_gold,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
    FROM part
    """,
)
def scalar_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over part. Null alignment: DuckDB's
    ``split_part`` returns '' on NULL input where Spark's
    split+getItem returns NULL (the SQL null-in/null-out norm), so
    the oracle guards it with an explicit CASE; concat_ws skips null
    arguments identically in both engines."""
    p = Catalog(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first_word"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.when(F.col("p_name").contains("gold"), 1).otherwise(0).alias("has_gold"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
    )


@query(
    "scalar_date_fns",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month_start,
           CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS due_ts,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INT) AS days_since_1995
    FROM orders
    """,
)
def scalar_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery over orders (midnight-aligned ms
    timestamps; both engines evaluated in UTC)."""
    o = Catalog(spark, sf_dir).orders
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.quarter(d).alias("order_quarter"),
        F.date_trunc("month", d).cast("date").alias("order_month_start"),
        (d.cast("date") + F.expr("INTERVAL 90 DAYS")).cast("timestamp").alias("due_ts"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since_1995"),
    )


@query(
    "scalar_math_fns",
    oracle="""
    SELECT c_custkey, c_acctbal,
           abs(c_acctbal) AS bal_abs,
           CAST(ROUND(c_acctbal * 10) AS BIGINT) / 10.0 AS bal_round1,
           floor(c_acctbal) AS bal_floor,
           ceil(c_acctbal) AS bal_ceil,
           sqrt(abs(c_acctbal)) AS bal_sqrt,
           c_acctbal * c_acctbal AS bal_sq,
           CAST(c_custkey % 7 AS BIGINT) AS key_mod7,
           CASE WHEN c_acctbal < 0 THEN -1 WHEN c_acctbal = 0 THEN 0 ELSE 1 END
               AS bal_sign
    FROM customer
    """,
)
def scalar_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery over customer. sqrt is IEEE-exact (bit-reproducible
    across engines); x*x replaces pow(x,2) because libm pow differs in
    last ulps between runtimes. floor/ceil of double return double in
    both engines."""
    c = Catalog(spark, sf_dir).customer
    b = F.col("c_acctbal")
    return c.select(
        "c_custkey", "c_acctbal",
        F.abs(b).alias("bal_abs"),
        # round-to-1-decimal via integer scaling: decimal-scale ROUND on
        # raw doubles diverges between engines at halfway points; after
        # an explicit *10 both engines round the same binary double.
        (F.round(b * 10).cast("long") / 10.0).alias("bal_round1"),
        F.floor(b).cast("double").alias("bal_floor"),
        F.ceil(b).cast("double").alias("bal_ceil"),
        F.sqrt(F.abs(b)).alias("bal_sqrt"),
        (b * b).alias("bal_sq"),
        (F.col("c_custkey") % 7).alias("key_mod7"),
        F.when(b < 0, -1).when(b == 0, 0).otherwise(1).alias("bal_sign"),
    )


@query(
    "scalar_case_bucketing",
    oracle="""
    SELECT
        CASE WHEN o_totalprice < 100000 THEN 'small'
             WHEN o_totalprice < 300000 THEN 'medium'
             ELSE 'large' END AS price_band,
        o_orderstatus,
        CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def scalar_case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing feeding an aggregate."""
    o = Catalog(spark, sf_dir).orders
    band = (F.when(F.col("o_totalprice") < 100000, "small")
            .when(F.col("o_totalprice") < 300000, "medium")
            .otherwise("large"))
    return (o.groupBy(band.alias("price_band"), F.col("o_orderstatus"))
            .agg(F.count(F.lit(1)).alias("n")))


@query(
    "json_extract_props",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string column.

    get_json_object evaluates JVM-side; at scale prefer parsing once
    with from_json into a struct column over repeated path extraction
    (see json_parse_struct)."""
    ev = Catalog(spark, sf_dir).events
    return ev.select(
        "event_id", "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


@query(
    "json_parse_struct",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY 1
    """,
)
def json_parse_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct, then aggregate by the extracted
    field — parse once, use many times."""
    ev = Catalog(spark, sf_dir).events
    parsed = ev.withColumn(
        "p", F.from_json("props", "struct<k: bigint>"))
    return (parsed.groupBy(F.col("p.k").alias("prop_k"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents")))


@query(
    "array_fns_embeddings",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(embedding[64] AS DOUBLE) AS last_elem,
           CAST(list_sum(list_transform(embedding[1:8],
                x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
                AS BIGINT) AS head_sum_micros
    FROM embeddings
    """,
)
def array_fns_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order function battery over the embedding column:
    size, element_at, slice + transform + aggregate — all JVM-side
    (no UDF). Float elements are cast to double (bit-exact widening)
    before any arithmetic so values hash-match the oracle."""
    e = Catalog(spark, sf_dir).embeddings
    emb = F.col("embedding")
    head = F.slice(emb, 1, 8)
    return e.select(
        "vec_id", "label",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_elem"),
        F.element_at(emb, 64).cast("double").alias("last_elem"),
        F.aggregate(
            F.transform(head, lambda x: F.round(x.cast("double") * 1000000).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("head_sum_micros"),
    )


@query(
    "scalar_null_comparison_fns",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_other,
           greatest(c_acctbal, 0.0) AS bal_floor0,
           least(c_acctbal, 1000.0) AS bal_cap1000,
           CASE WHEN c_acctbal BETWEEN 0 AND 5000 THEN 1 ELSE 0 END AS bal_mid,
           CASE WHEN c_mktsegment IN ('BUILDING', 'MACHINERY') THEN 1 ELSE 0 END
               AS seg_flag,
           CASE WHEN c_name LIKE '%0' THEN 1 ELSE 0 END AS name_ends_0,
           CAST(c_nationkey IS NOT NULL AS INT) AS nation_known
    FROM customer
    """,
)
def scalar_null_comparison_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling and comparison battery: coalesce/nullif/greatest/
    least/between/in/like/is-not-null — all codegen'd predicates."""
    c = Catalog(spark, sf_dir).customer
    b = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
                   F.lit("OTHER")).alias("segment_other"),
        F.greatest(b, F.lit(0.0)).alias("bal_floor0"),
        F.least(b, F.lit(1000.0)).alias("bal_cap1000"),
        F.when(b.between(0, 5000), 1).otherwise(0).alias("bal_mid"),
        F.when(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"), 1)
        .otherwise(0).alias("seg_flag"),
        F.when(F.col("c_name").like("%0"), 1).otherwise(0).alias("name_ends_0"),
        F.col("c_nationkey").isNotNull().cast("int").alias("nation_known"),
    )


@query(
    "pii_mask_redaction",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(length(c_name)
                    - length(regexp_replace(c_name, '[0-9]', '', 'g')))
                AS BIGINT) AS digits_masked,
           CAST(COUNT(DISTINCT regexp_replace(c_name, '[0-9]', 'X', 'g'))
                AS BIGINT) AS n_masked_forms
    FROM customer GROUP BY c_mktsegment
    """,
)
def pii_mask_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing as pure codegen'd regexp expressions: mask every
    digit in the identifying column and account for what was removed —
    the pre-training redaction pass (emails/phones/SSNs are the same
    shape with richer character classes; '[0-9]' is used here because
    it means the same thing in Spark's Java regex and DuckDB's RE2,
    so the oracle is exact). Runs at scan speed — no UDF, no Python
    in the loop, and the aggregate shuffles 3 numbers per segment."""
    c = Catalog(spark, sf_dir).customer
    masked = F.regexp_replace(F.col("c_name"), "[0-9]", "X")
    digits = (F.length("c_name")
              - F.length(F.regexp_replace(F.col("c_name"), "[0-9]", "")))
    return (
        c.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             F.sum(digits).cast("long").alias("digits_masked"),
             F.countDistinct(masked).alias("n_masked_forms"))
    )


@query(
    "variant_json_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: ``parse_json``
    turns the props JSON string into the binary VARIANT encoding once
    at the scan, ``variant_get`` then extracts typed paths WITHOUT
    re-parsing per access — the open-format answer to string-typed
    JSON columns (at 100 TB, parse-once beats parse-per-expression by
    the number of accesses, and VARIANT's shredded binary layout
    skips to the requested path instead of scanning the text).

    The aggregate downstream is ordinary exact-integer work; the
    oracle reads the same numbers through DuckDB's JSON extraction,
    pinning that the VARIANT decode is value-faithful end to end.
    """
    ev = Catalog(spark, sf_dir).events
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k")))


@query(
    "ansi_safe_arithmetic",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (l_quantity = 25 OR l_quantity IS NULL
                                 OR l_extendedprice IS NULL) AS BIGINT)
               AS n_null_division,
           CAST(SUM(CASE WHEN l_quantity <> 25 THEN
                 CAST(ROUND(l_extendedprice / (l_quantity - 25) * 100)
                      AS BIGINT) END) AS BIGINT) AS sum_ratio_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def ansi_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-mode safety surface: Spark 4 runs with strict SQL
    semantics (division by zero THROWS instead of returning NULL, as
    3.x did), and ``try_divide``/``try_*`` are the sanctioned
    per-expression escape hatch — the query keeps running and yields
    NULL exactly where the strict engine would have raised. Here a
    deliberately zero-crossing divisor (quantity - 25) exercises it:
    NULL counts and the surviving ratios are aggregated under the
    exact-money policy. The oracle computes the identical result with
    an explicit CASE guard — pinning that try_divide nulls precisely
    the rows the guard excludes, nothing more. The null count folds
    in missing inputs too: try_divide(NULL, x) and try_divide(x,
    NULL) are NULL, so the oracle's filter names all three sources
    (zero divisor, null dividend, null divisor) explicitly.
    """
    li = Catalog(spark, sf_dir).lineitem
    ratio = F.try_divide(F.col("l_extendedprice"),
                         F.col("l_quantity") - F.lit(25))
    return (li.select("l_returnflag", ratio.alias("ratio"))
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("ratio").isNull().cast("long"))
                 .alias("n_null_division"),
                 F.sum(F.round(F.col("ratio") * 100).cast("long"))
                 .alias("sum_ratio_cents")))


@query(
    "pii_dictionary_scrub",
    oracle="""
    WITH dict AS (
        SELECT lower(n_name) AS term FROM nation
    ), toks AS (
        SELECT d.doc_id, d.source, t.i AS pos,
               string_split(d.text, ' ')[t.i] AS tok
        FROM documents d,
             LATERAL unnest(generate_series(
                 1, len(string_split(d.text, ' ')))) AS t(i)
    ), masked AS (
        SELECT k.doc_id, k.source, k.pos,
               CASE WHEN x.term IS NOT NULL THEN '[NAME]'
                    ELSE k.tok END AS out_tok
        FROM toks k LEFT JOIN dict x ON lower(k.tok) = x.term
    ), rebuilt AS (
        SELECT doc_id, source,
               string_agg(out_tok, ' ' ORDER BY pos) AS scrubbed
        FROM masked
        GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(scrubbed)) AS BIGINT)
               AS n_distinct_scrubbed
    FROM rebuilt
    GROUP BY source
    ORDER BY source
    """,
)
def pii_dictionary_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DICTIONARY-based PII scrubbing — the denylist companion to
    ``pii_mask_redaction``'s regex pass (real pipelines run both: a
    regex catches structured PII, a broadcast dictionary catches
    known names/entities a regex can't describe). Every token
    matching the broadcast term dictionary (nation names stand in
    for a name denylist) is replaced with ``[NAME]``; the check
    digests the REBUILT documents per source, so a missed token, a
    case-sensitivity slip, or a reassembly-order bug hash-fails.

    Scale shape: the dictionary broadcasts onto an ordinality-keyed
    token explode (positions preserved for exact reassembly); the
    rebuild groups per doc and concatenates in position order — the
    ``dup_span_trim_corpus`` reconstruction discipline. One corpus
    explode, one broadcast hash join, one per-doc reassembly.
    """
    from pyspark.sql import Window as W

    cat = Catalog(spark, sf_dir)
    dic = cat.nation.select(F.lower(F.col("n_name")).alias("term"))
    toks = (cat.documents
            .select("doc_id", "source",
                    F.posexplode(F.split(F.col("text"), " "))
                    .alias("pos", "tok")))
    joined = (toks.join(F.broadcast(dic),
                        F.lower(F.col("tok")) == F.col("term"), "left")
              .select("doc_id", "source", "pos",
                      F.when(F.col("term").isNotNull(), "[NAME]")
                      .otherwise(F.col("tok")).alias("out_tok")))
    rebuilt = (joined.groupBy("doc_id", "source")
               .agg(F.array_join(
                   F.array_sort(F.collect_list(
                       F.struct("pos", "out_tok"))).out_tok, " ")
                   .alias("scrubbed")))
    return (rebuilt.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct(F.md5("scrubbed"))
                 .alias("n_distinct_scrubbed"))
            .orderBy("source"))


@query(
    "null_semantics_suite",
    oracle="""
    WITH nb AS (
        SELECT c_custkey, c_nationkey,
               CASE WHEN c_acctbal < 0 THEN NULL
                    ELSE CAST(ROUND(c_acctbal * 100) AS BIGINT)
               END AS bal_cents
        FROM customer
    )
    SELECT c_custkey, c_nationkey, bal_cents,
           CAST((bal_cents IS NULL) AS BIGINT) AS is_null,
           CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                   ORDER BY bal_cents ASC NULLS LAST,
                                            c_custkey) AS BIGINT)
               AS bal_rank_nulls_last,
           CAST((bal_cents IS NOT DISTINCT FROM
                 LAG(bal_cents) OVER (PARTITION BY c_nationkey
                                      ORDER BY c_custkey))
                AS BIGINT) AS same_as_prev_nullsafe,
           CAST(COALESCE(bal_cents, -1) AS BIGINT) AS bal_or_sentinel
    FROM nb
    """,
)
def null_semantics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics corner cases in one audited plan — the corners
    where engines silently disagree: (1) explicit NULLS LAST window
    ordering (Spark's ASC default is NULLS FIRST, DuckDB's is NULLS
    LAST — the divergence that bit the KS/Mann-Whitney walks; here
    both sides DECLARE the order), (2) null-safe equality against
    the previous row (Spark ``eqNullSafe`` / SQL IS NOT DISTINCT
    FROM — NULL = NULL is true, unlike ``=`` which yields NULL and
    drops rows in filters), (3) COALESCE sentinel fallback. NULLs
    are derived deterministically (negative balances), since the
    fixture ships none. Every production pipeline hits all three;
    pinning them as a driver-checked query makes the engine's NULL
    contract explicit rather than folklore.
    """
    c = Catalog(spark, sf_dir).customer
    bal = F.when(F.col("c_acctbal") < 0, F.lit(None)) \
        .otherwise(F.round(F.col("c_acctbal") * 100).cast("long"))
    nb = c.select("c_custkey", "c_nationkey", bal.alias("bal_cents"))
    w_rank = W.partitionBy("c_nationkey").orderBy(
        F.col("bal_cents").asc_nulls_last(), "c_custkey")
    w_lag = W.partitionBy("c_nationkey").orderBy("c_custkey")
    return nb.select(
        "c_custkey", "c_nationkey", "bal_cents",
        F.col("bal_cents").isNull().cast("long").alias("is_null"),
        F.row_number().over(w_rank).cast("long")
        .alias("bal_rank_nulls_last"),
        F.col("bal_cents").eqNullSafe(F.lag("bal_cents").over(w_lag))
        .cast("long").alias("same_as_prev_nullsafe"),
        F.coalesce(F.col("bal_cents"), F.lit(-1)).cast("long")
        .alias("bal_or_sentinel"))
