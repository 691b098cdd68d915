"""Training-pipeline operators: dataset splitting, stratified
sampling, and sequence packing over the documents corpus.

These are the steps between "clean corpus" (see
``analytics.clean_corpus_pipeline`` and the dedup family in ``text``/
``similarity``) and "tokens on the training cluster". The common
design rule at 100 TB: **every assignment is a pure function of the
row** (a salted hash of a stable key), never of an RNG stream or of
partition layout — so splits are reproducible across reruns, engines,
and cluster sizes, membership can be recomputed row-side to audit
leakage, and no shuffle is needed to assign (only to summarize).

That determinism is also what makes these oracle-checkable: DuckDB
computes the same md5-derived buckets bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import Catalog
from . import query

#: md5-derived bucket in [0, 1000): stable per doc_id, uniform enough
#: for splitting (md5 avalanche), engine-independent.
_BUCKETS = 1000


def _bucket():
    hex4 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    return (F.conv(hex4, 16, 10).cast("int") % _BUCKETS).alias("bucket")


_BUCKET_SQL = (
    "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER"
    f" % {_BUCKETS})"
)


@query(
    "train_val_test_split_hash",
    oracle=f"""
    SELECT doc_id, lang, {_BUCKET_SQL} AS bucket,
           CASE WHEN {_BUCKET_SQL} < 800 THEN 'train'
                WHEN {_BUCKET_SQL} < 900 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def train_val_test_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split by hashed doc_id. No RNG, no
    shuffle: the split is a projection, evaluated where the row lives;
    re-running on a different cluster (or engine) yields the identical
    assignment, and a doc's split never changes as the corpus grows —
    the properties a training pipeline needs for leakage audits."""
    d = Catalog(spark, sf_dir).documents
    b = d.select("doc_id", "lang", _bucket())
    return b.withColumn(
        "split",
        F.when(F.col("bucket") < 800, "train")
         .when(F.col("bucket") < 900, "val")
         .otherwise("test"))


#: Per-language keep-rates for the stratified sample: downsample the
#: dominant language, keep the tail. Rates are in buckets-of-1000.
STRATA_RATES = {"en": 250, "de": 800, "es": 800, "fr": 800, "zh": 800}


@query(
    "stratified_sample_exact",
    oracle=f"""
    WITH b AS (SELECT doc_id, lang, {_BUCKET_SQL} AS bucket FROM documents)
    SELECT doc_id, lang, bucket
    FROM b
    WHERE bucket < CASE lang
        WHEN 'en' THEN 250 WHEN 'de' THEN 800 WHEN 'es' THEN 800
        WHEN 'fr' THEN 800 WHEN 'zh' THEN 800 ELSE 0 END
    """,
)
def stratified_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling by language via hash thresholds, not
    ``sampleBy``: the RNG version draws a different sample per run and
    per partitioning, this one is a deterministic per-row predicate —
    reproducible, auditable, and pushed down to the scan (no shuffle,
    no sampling pass). Rebalancing language mix is the canonical
    pretraining-corpus operation."""
    d = Catalog(spark, sf_dir).documents
    rate = F.lit(0)
    for lang, r in STRATA_RATES.items():
        rate = F.when(F.col("lang") == lang, r).otherwise(rate)
    return (
        d.select("doc_id", "lang", _bucket())
        .filter(F.col("bucket") < rate)
    )


#: Token budget per packed training sequence (whitespace tokens; the
#: bpe-ish regex variant is ``text.token_count_bpe_regex``).
PACK_BUDGET = 2048

#: Quality-gate threshold of the SQL curation front door — the ONE
#: definition shared by the Spark :min_chars binding, the inlined
#: oracle literal, and the plan-shape test's pushed-filter assertion
#: (ADVICE r10: the test must not duplicate the literal).
CURATION_MIN_CHARS = 100


@query(
    "pack_sequences_greedy",
    oracle=f"""
    WITH t AS (
        SELECT lang, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        FROM documents
    ), c AS (
        SELECT lang, n_toks,
               COALESCE(SUM(n_toks) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS cum_before
        FROM t
    )
    SELECT lang, CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens
    FROM c GROUP BY lang, bin ORDER BY lang, bin
    """,
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: walk each language's docs in
    doc_id order and cut a new bin every {PACK_BUDGET} tokens (the
    exclusive running sum decides the bin, so a doc straddling the
    boundary starts its bin — the tokenizer pads/truncates downstream).

    The running sum is a window per language — the packing unit IS the
    parallelism unit, which is how a real pipeline shards this (pack
    within output shard, shards in parallel); there is no global
    sequential state. Window sums run in frame order, so the integral
    token counts make every bin boundary deterministic."""
    d = Catalog(spark, sf_dir).documents
    toks = d.select(
        "lang", "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_toks"))
    w = (W.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(W.unboundedPreceding, -1))
    return (
        toks.withColumn("cum_before",
                        F.coalesce(F.sum("n_toks").over(w), F.lit(0)))
        .withColumn("bin", F.expr(f"cum_before div {PACK_BUDGET}"))
        .groupBy("lang", "bin")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_toks").alias("total_tokens"))
        .orderBy("lang", "bin")
    )


#: Shingle width for the cross-split contamination audit.
_CONTAM_N = 5


def _word_ngrams(d: DataFrame, n: int) -> DataFrame:
    """Distinct word n-gram shingles per document, codegen-shaped
    (posexplode + window leads — see ``text._word_bigrams`` for why
    HOFs are avoided). concat_ws silently skips NULLs, so the tail
    positions are dropped by filtering on the *last* lead, not by
    letting short grams form."""
    toks = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"))
    w = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", i).over(w).alias(f"t{i}") for i in range(1, n)]
    return (
        toks.select("doc_id", F.col("tok").alias("t0"), *leads)
        .filter(F.col(f"t{n-1}").isNotNull())
        .select("doc_id",
                F.concat_ws(" ", *[f"t{i}" for i in range(n)]).alias("gram"))
        .distinct()
    )


@query(
    "split_contamination_check",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, text, {_BUCKET_SQL} AS bucket FROM documents
    ), toks AS (
        SELECT doc_id, bucket, string_split(text, ' ') AS ts FROM b
    ), grams AS (
        SELECT doc_id, bucket,
               unnest(list_distinct([array_to_string(ts[i:i+{_CONTAM_N - 1}], ' ')
                                     for i in range(1, len(ts) - {_CONTAM_N - 1} + 1)]))
                   AS gram
        FROM toks
    ), train AS (
        SELECT DISTINCT gram FROM grams WHERE bucket < 800
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN t.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           CAST(SUM(CASE WHEN t.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS contamination
    FROM grams g LEFT JOIN train t USING (gram)
    WHERE g.bucket >= 900
    GROUP BY g.doc_id
    """,
)
def split_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test leakage audit over the hash split: per test
    document, the share of its distinct {5}-gram shingles that also
    occur anywhere in the train split. The join key is the shingle
    itself after per-side dedup, so the shuffle carries each distinct
    gram once — gram frequency skew (stopword runs) never reaches the
    join. At 100 TB the train side is the big one; this is a plain
    shuffle join on a high-cardinality key, exactly the shape AQE
    handles, and the audit runs before any training job does."""
    d = Catalog(spark, sf_dir).documents
    b = d.select("doc_id", "text", _bucket())
    # The bucket is a pure function of doc_id — recompute it as a
    # projection on the gram stream instead of joining it back (the
    # recompute-don't-rejoin dividend of hash-deterministic splits).
    hex4 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    grams = _word_ngrams(b.select("doc_id", "text"), _CONTAM_N).withColumn(
        "bucket", F.conv(hex4, 16, 10).cast("int") % _BUCKETS)
    train = grams.filter(F.col("bucket") < 800).select("gram").distinct()
    test = grams.filter(F.col("bucket") >= 900)
    hit = F.sum(F.when(F.col("t_gram").isNotNull(), 1).otherwise(0))
    return (
        test.join(train.select(F.col("gram").alias("t_gram")),
                  test["gram"] == F.col("t_gram"), "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"),
             hit.cast("long").alias("n_contaminated"),
             (hit.cast("double") / F.count(F.lit(1)).cast("double"))
                 .alias("contamination"))
    )


@query(
    "train_shard_manifest",
    oracle=f"""
    SELECT ({_BUCKET_SQL} % 64) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM documents GROUP BY 1
    """,
)
def train_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard assignment + manifest for a training-data export: every
    document maps to one of 64 shards as a pure function of its id
    (the md5 bucket — engine-independent, reproducible, no shuffle to
    assign), and the manifest aggregates per-shard document/token/char
    totals — the metadata a downstream loader needs to plan epochs.
    At 100 TB the shard column is also the write partitionBy key, so
    the export is one pass and each shard is one file group."""
    d = Catalog(spark, sf_dir).documents
    toks = F.size(F.split(F.col("text"), " "))
    hex4 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    bucket = F.conv(hex4, 16, 10).cast("int") % _BUCKETS
    return (
        d.select((bucket % 64).alias("shard"),
                 F.col("doc_id"), F.col("n_chars"), toks.alias("n_tokens"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").cast("long").alias("total_tokens"),
             F.sum("n_chars").alias("total_chars"),
             F.min("doc_id").alias("min_doc_id"),
             F.max("doc_id").alias("max_doc_id"))
    )


@query(
    "token_budget_pack",
    oracle="""
    WITH counted AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ), running AS (
        SELECT doc_id, lang, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM counted
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(MAX(cum_tokens) AS BIGINT) AS tokens_kept,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc_id
    FROM running WHERE cum_tokens <= 20000
    GROUP BY lang
    """,
)
def token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: per language, keep documents in id
    order until the cumulative token count reaches the budget — the
    'fill N tokens per language' step of corpus construction. A
    running-sum window + filter; one shuffle on lang, no iteration.
    The budget boundary is exact (the doc that crosses it is cut),
    deterministic via the doc_id ordering."""
    d = Catalog(spark, sf_dir).documents
    counted = d.select(
        "doc_id", "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"))
    w = (W.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    running = counted.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return (
        running.filter(F.col("cum_tokens") <= 20000)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs_kept"),
             F.max("cum_tokens").alias("tokens_kept"),
             F.max("doc_id").alias("last_doc_id"))
    )


@query(
    "sample_k_per_group",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rn
        FROM documents
    )
    SELECT lang, doc_id FROM ranked WHERE rn <= 50
    """,
)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample: keep the 50 documents with
    the smallest md5(doc_id) per language — a reproducible stand-in
    for per-group reservoir sampling (uniform because the hash is
    uniform on ids, identical on every engine/run because it is a pure
    row function, unlike RNG reservoirs). One shuffle on lang; the
    per-partition sort is bounded by a rank filter, and at 100 TB a
    pre-aggregation trick (keep the k smallest hashes map-side) makes
    the shuffle carry only candidate rows."""
    d = Catalog(spark, sf_dir).documents
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (d.select("lang", "doc_id")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 50)
            .drop("rn"))


#: Temperature-mix target: keep half the corpus overall, re-weighted
#: toward small sources by sqrt (alpha = 0.5) — the multilingual
#: rebalancing rule from the mT5/XLM-R lineage.
MIX_KEEP_TOTAL = 0.5


@query(
    "temperature_mix_sample",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(ROUND(sqrt(COUNT(*)) * 1000000) AS BIGINT) AS sqrt_micros
        FROM documents GROUP BY source
    ), tot AS (
        SELECT source, n_docs,
               CAST(SUM(n_docs) OVER () AS BIGINT) AS n_total,
               CAST(SUM(sqrt_micros) OVER () AS BIGINT) AS sum_sqrt,
               sqrt_micros
        FROM counts
    ), thr AS (
        SELECT source, n_docs,
               LEAST(1000, CAST(FLOOR(
                   (({MIX_KEEP_TOTAL} * CAST(n_total AS DOUBLE))
                    * CAST(sqrt_micros AS DOUBLE)
                    / CAST(sum_sqrt AS DOUBLE))
                   / CAST(n_docs AS DOUBLE) * 1000) AS INT)) AS thr_buckets
        FROM tot
    )
    SELECT t.source, t.n_docs, t.thr_buckets,
           CAST(COUNT_IF({_BUCKET_SQL} < t.thr_buckets) AS BIGINT) AS n_sampled
    FROM documents d JOIN thr t ON d.source = t.source
    GROUP BY t.source, t.n_docs, t.thr_buckets
    """,
)
def temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing: per-source keep-rates
    proportional to n_s^0.5 (downsampling dominant sources, keeping
    the tail), realized as md5-bucket thresholds so membership is a
    pure function of the row — reproducible across engines and runs.

    Scale shape: the per-source count table is tiny (broadcast), the
    threshold math happens once per source, and the per-row decision
    is `bucket < thr` evaluated at the scan — no shuffle to sample,
    one shuffle to summarize. Determinism: sqrt(n) is rounded to
    integer micro-units before the cross-source sum (addition order
    becomes irrelevant), and the remaining double arithmetic follows
    the identical operation order as the oracle, so FLOOR lands
    identically.
    """
    d = Catalog(spark, sf_dir).documents
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sqrt(F.count(F.lit(1))) * 1_000_000)
        .cast("long").alias("sqrt_micros"),
    )
    w = W.partitionBy()
    thr = counts.select(
        "source", "n_docs",
        F.least(F.lit(1000), F.floor(
            ((F.lit(MIX_KEEP_TOTAL) * F.sum("n_docs").over(w).cast("double"))
             * F.col("sqrt_micros").cast("double")
             / F.sum("sqrt_micros").over(w).cast("double"))
            / F.col("n_docs").cast("double") * 1000).cast("int")
        ).alias("thr_buckets"),
    )
    return (
        d.select("source", _bucket())
        .join(F.broadcast(thr), "source")
        .groupBy("source", "n_docs", "thr_buckets")
        .agg(F.sum((F.col("bucket") < F.col("thr_buckets")).cast("long"))
             .alias("n_sampled"))
    )


#: Per-source document cap for ``cap_docs_per_source``.
SOURCE_CAP = 100


@query(
    "cap_docs_per_source",
    oracle=f"""
    SELECT doc_id, source, rk FROM (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS rk
        FROM documents
    ) WHERE rk <= {SOURCE_CAP}
    """,
)
def cap_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at SOURCE_CAP documents, selected by deterministic
    hash rank (md5 of doc_id) rather than arrival order — the
    per-domain cap that stops any one crawl host from dominating the
    mix, reproducible because the "random" order is a pure function
    of the key.

    One shuffle (the per-source window). At 100 TB a hot source's
    partition would be large; the production refinement is a
    hash-threshold pre-filter (keep bucket < ~2*K/n_s, the pattern of
    ``stratified_sample_exact``) so the exact rank only sees a small
    superset — same result, bounded partition.
    """
    d = Catalog(spark, sf_dir).documents
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        d.select("doc_id", "source",
                 F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= SOURCE_CAP)
    )


#: k-anonymity threshold: groups smaller than this leak identity.
K_ANON = 5


@query(
    "k_anonymity_violations",
    oracle=f"""
    SELECT lang, source,
           CAST(n_chars // 200 AS BIGINT) AS size_band,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY lang, source, n_chars // 200
    HAVING COUNT(*) < {K_ANON}
    """,
)
def k_anonymity_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit: quasi-identifier groups (lang, source,
    length-band) with fewer than k=K_ANON members — the rows a
    release-gating pipeline must suppress or generalize before the
    corpus ships. Complements ``pii_mask_redaction`` (row-level
    masking) with the group-level re-identification check.

    A single hash aggregation with a HAVING filter; the quasi-ID
    tuple is low-cardinality so partial (map-side) aggregation
    collapses almost everything before the shuffle.
    """
    d = Catalog(spark, sf_dir).documents
    return (
        d.groupBy("lang", "source",
                  F.floor(F.col("n_chars") / 200).alias("size_band"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") < K_ANON)
    )


@query(
    "mixture_interleave_manifest",
    oracle="""
    WITH weighted AS (
        SELECT doc_id, COALESCE(source, '(unknown)') AS source,
               CASE WHEN CAST(substring(source, 4) AS INTEGER) % 2 = 0
                    THEN 2 ELSE 1 END AS w
        FROM documents
    ), ranked AS (
        SELECT doc_id, source, w,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rk
        FROM weighted
    ), vt AS (
        SELECT doc_id, source,
               rk * (2 / w) AS vtime,
               ROW_NUMBER() OVER (ORDER BY rk * (2 / w), source, doc_id)
                   AS position
        FROM ranked
    )
    SELECT CAST(position AS BIGINT) AS position, doc_id, source,
           CAST(vtime AS BIGINT) AS vtime
    FROM vt WHERE position <= 200
    """,
)
def mixture_interleave_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-mixing manifest: interleave documents from
    every source according to integer mixture weights (even-numbered
    sources weight 2, odd weight 1) using STRIDE SCHEDULING — each
    source's k-th document is scheduled at virtual time k*(L/w) with
    L the weight LCM, and the global training order reads by virtual
    time. Twice-weighted sources appear twice as often, steadily, not
    in bursts — the sampling-without-replacement mixture order a
    training run actually consumes, as a reproducible manifest.

    Within a source, document order is the md5 shuffle (the module's
    engine-independent hash idiom), so the manifest is stable across
    engines and partitionings; virtual times are exact integers (the
    weights divide the LCM), so the interleave comparison never
    touches a float. The first 200 positions are emitted; the global
    ordering window is the manifest's one inherent sequence point —
    at production scale you shard the manifest by vtime range first
    (same plan per shard, embarrassingly parallel).

    Null semantics (null_sweep audit): documents with no source form
    their own explicit '(unknown)' stream (weight 1) on both engines
    — left as a bare NULL, the stream's rows sort to opposite ends
    of the interleave's tiebreak ordering in the two engines.
    """
    d = Catalog(spark, sf_dir).documents
    w = F.when(F.substring("source", 4, 10).cast("int") % 2 == 0,
               F.lit(2)).otherwise(F.lit(1))
    from pyspark.sql import Window as W
    rk = F.row_number().over(
        W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")),
                                        "doc_id"))
    ranked = (d.select("doc_id",
                       F.coalesce("source", F.lit("(unknown)"))
                       .alias("source"), w.alias("w"))
              .withColumn("rk", rk))
    vtime = (F.col("rk") * (F.lit(2) / F.col("w"))).cast("long")
    pos = F.row_number().over(
        W.orderBy((F.col("rk") * (F.lit(2) / F.col("w"))), "source", "doc_id"))
    return (ranked.select("doc_id", "source", vtime.alias("vtime"),
                          pos.cast("long").alias("position"))
            .filter(F.col("position") <= 200)
            .select("position", "doc_id", "source", "vtime"))


@query(
    "fim_transform_sample",
    oracle="""
    WITH picked AS (
        SELECT doc_id, text, len(text) AS n
        FROM documents
        WHERE (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
               ::INTEGER % 1000) < 100 AND len(text) >= 20
    ), cuts AS (
        SELECT doc_id, text, n,
               1 + (('0x' || substring(md5('a' || CAST(doc_id AS VARCHAR)), 1, 4))
                    ::INTEGER % (n // 2)) AS c1,
               (n // 2)
               + (('0x' || substring(md5('b' || CAST(doc_id AS VARCHAR)), 1, 4))
                  ::INTEGER % (n - n // 2)) AS c2
        FROM picked
    )
    SELECT doc_id,
           CAST(c1 AS BIGINT) AS prefix_len,
           CAST(c2 - c1 AS BIGINT) AS middle_len,
           CAST(n - c2 AS BIGINT) AS suffix_len,
           substring(text, 1, c1) || '<SUF>' || substring(text, c2 + 1)
               || '<MID>' || substring(text, c1 + 1, c2 - c1) AS psm_text
    FROM cuts
    """,
)
def fim_transform_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle training transform (Bavarian et al. 2022):
    a deterministic 10% document sample is split at two hash-derived
    character cuts into (prefix, middle, suffix) and re-serialized in
    PSM order — prefix, <SUF> suffix, <MID> middle — the format an
    infilling-capable model trains on.

    Everything is a pure row-level string expression (codegen'd,
    scan-speed): the sample gate and both cut points derive from md5
    of the doc id (salted 'a'/'b' for independence), so the transform
    is reproducible across engines, partitionings, and reruns — no
    RNG state anywhere. The first cut lands in the first half, the
    second in the second half, so middle is never empty and the
    three lengths always sum to the document length (the oracle
    checks the arithmetic as data).
    """
    d = Catalog(spark, sf_dir).documents

    def hx(salt: str):
        return F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))),
            1, 4), 16, 10).cast("int")

    gate = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                  16, 10).cast("int") % 1000 < 100
    n = F.length("text")
    picked = d.filter(gate & (n >= 20)).select("doc_id", "text",
                                               n.alias("n"))
    c1 = (F.lit(1) + hx("a") % F.expr("n div 2"))
    c2 = (F.expr("n div 2") + hx("b") % (F.col("n") - F.expr("n div 2")))
    cuts = picked.select("doc_id", "text", "n", c1.alias("c1"), c2.alias("c2"))
    psm = F.concat(F.substring(F.col("text"), 1, F.col("c1").cast("int")),
                   F.lit("<SUF>"),
                   F.expr("substring(text, c2 + 1)"),
                   F.lit("<MID>"),
                   F.expr("substring(text, c1 + 1, c2 - c1)"))
    return cuts.select(
        "doc_id",
        F.col("c1").cast("long").alias("prefix_len"),
        (F.col("c2") - F.col("c1")).cast("long").alias("middle_len"),
        (F.col("n") - F.col("c2")).cast("long").alias("suffix_len"),
        psm.alias("psm_text"))


@query(
    "systematic_sample_every_k",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    )
    SELECT doc_id, lang, n_chars
    FROM ranked WHERE (rn - 1) % 10 = 0
    """,
)
def systematic_sample_every_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYSTEMATIC sampling — every 10th element of a deterministic
    permutation — completing the sampling family next to Bernoulli
    (``table_sample``), stratified, k-per-group, and temperature
    mixing: exact 1/10 rate by construction (Bernoulli only hits the
    rate in expectation), with the md5 shuffle breaking any
    correlation between sample membership and storage order. The
    rank is the one global sequence point; at scale, shard by a hash
    prefix and sample every 10th within each shard — same exactness
    per shard, embarrassingly parallel.
    """
    from pyspark.sql import Window as W
    d = Catalog(spark, sf_dir).documents
    rn = F.row_number().over(
        W.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
    return (d.select("doc_id", "lang", "n_chars")
            .withColumn("rn", rn)
            .filter((F.col("rn") - 1) % 10 == 0)
            .drop("rn"))


@query(
    "training_manifest_end_to_end",
    oracle="""
    WITH RECURSIVE grams AS (
        SELECT doc_id, source, unnest(list_distinct(g)) AS gram,
               len(list_distinct(g)) AS n_grams
        FROM (
            SELECT doc_id, source,
                   list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 1),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i + 1]) AS g
            FROM documents
        )
    ), pairs AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM grams a JOIN grams b
          ON a.source = b.source AND a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING CAST(COUNT(*) AS DOUBLE)
                   / (any_value(a.n_grams) + any_value(b.n_grams) - COUNT(*))
                   >= 0.5
    ), edges AS (
        SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
    ), nodes AS (
        SELECT DISTINCT src AS v FROM edges
    ), reach (v, r) AS (
        SELECT v, v FROM nodes
        UNION
        SELECT reach.v, edges.dst FROM reach JOIN edges ON reach.r = edges.src
    ), clusters AS (
        SELECT v AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY v
    ), canon AS (
        SELECT cluster_id,
               MAX(CASE WHEN rk = 1 THEN doc_id END) AS canonical_doc_id
        FROM (
            SELECT c.cluster_id, d.doc_id,
                   ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                      ORDER BY d.n_chars DESC, d.doc_id)
                       AS rk
            FROM clusters c JOIN documents d USING (doc_id)
        ) GROUP BY cluster_id
    ), survivors AS (
        SELECT d.doc_id, d.lang, d.source,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
        FROM documents d
        LEFT JOIN clusters c USING (doc_id)
        WHERE c.doc_id IS NULL
           OR EXISTS (SELECT 1 FROM canon
                      WHERE canonical_doc_id = d.doc_id)
    )
    SELECT doc_id, lang, source, n_tokens,
           CASE WHEN (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                      ::INTEGER % 1000) < 800 THEN 'train'
                WHEN (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                      ::INTEGER % 1000) < 900 THEN 'val'
                ELSE 'test' END AS split,
           CAST((('0x' || substring(md5('shard' || CAST(doc_id AS VARCHAR)),
                                    1, 4))::INTEGER % 16) AS INT) AS shard
    FROM survivors
    """,
)
def training_manifest_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone composition: near-duplicate CANONICAL dedup →
    deterministic 80/10/10 split → 16-way shard assignment, as ONE
    lazy plan — the manifest a training run reads. Survivors are
    every unclustered document plus each cluster's keep-longest
    canonical (the ``neardup_canonical_docs`` policy); split and
    shard are independent salted md5 functions of doc_id, so the
    whole manifest is a pure function of the corpus — re-running it,
    or running it on the oracle engine, reproduces every row.

    Catalyst sees the full composition (pair generation, connected
    components, argmax, anti-membership, hash assignment) and
    optimizes it as one tree — the practical payoff of every stage
    being a DataFrame: no intermediate materialization, shared scans
    where possible. The recursive-CTE oracle replays the entire
    chain end-to-end.
    """
    from pyspark.sql import Window as W
    from .text import ngram_jaccard_neardup
    from .similarity import connected_components
    d = Catalog(spark, sf_dir).documents
    pairs = ngram_jaccard_neardup(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = pairs.union(pairs.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst")))
    labels, _ = connected_components(edges)
    members = labels.select(F.col("v").alias("doc_id"), "cluster_id")
    canon = (members.join(d.select("doc_id", "n_chars"), "doc_id")
             .withColumn("rk", F.row_number().over(
                 W.partitionBy("cluster_id")
                 .orderBy(F.col("n_chars").desc(), "doc_id")))
             .filter(F.col("rk") == 1)
             .select(F.col("doc_id").alias("keep_id")))
    clustered = members.select("doc_id")
    survivors = (d.join(clustered, "doc_id", "left_anti")
                 .unionByName(d.join(canon, d.doc_id == F.col("keep_id"),
                                     "semi")))
    hex4 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    bucket = F.conv(hex4, 16, 10).cast("int") % 1000
    split = (F.when(bucket < 800, "train")
             .when(bucket < 900, "val").otherwise("test"))
    shex4 = F.substring(
        F.md5(F.concat(F.lit("shard"), F.col("doc_id").cast("string"))),
        1, 4)
    shard = (F.conv(shex4, 16, 10).cast("int") % 16)
    return survivors.select(
        "doc_id", "lang", "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        split.alias("split"), shard.alias("shard"))


@query(
    "sql_curation_manifest_front_door",
    oracle=f"""
    WITH gated AS (
        SELECT doc_id, text, lang, source
        FROM documents
        WHERE text IS NOT NULL AND n_chars >= {CURATION_MIN_CHARS}
    ), keyed AS (
        SELECT doc_id, lang, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
               ROW_NUMBER() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS dup_rk
        FROM gated
    ), mixed AS (
        SELECT doc_id, lang, source, n_toks,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('mix' || CAST(doc_id AS VARCHAR)), doc_id)
                   AS mix_rk
        FROM keyed WHERE dup_rk = 1
    ), tagged AS (
        SELECT doc_id, lang, source, n_toks,
               CASE WHEN {_BUCKET_SQL} < 800 THEN 'train'
                    WHEN {_BUCKET_SQL} < 900 THEN 'val'
                    ELSE 'test' END AS split
        FROM mixed WHERE mix_rk <= 20
    )
    SELECT doc_id, lang, source, n_toks, split,
           CAST(COALESCE(SUM(n_toks) OVER (
                    PARTITION BY lang, split ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) // {PACK_BUDGET} AS BIGINT) AS bin
    FROM tagged
    """,
)
def sql_curation_manifest_front_door(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """The CURATION COMPOSITION through the SQL FRONT DOOR (VERDICT
    r9 item 4): quality gate → exact dedup (keep-first by content
    hash) → per-source mix cap → deterministic 80/10/10 split →
    greedy sequence packing, as ONE ``spark.sql`` statement over a
    registered view with Spark 4 NAMED PARAMETERS — a SQL-only
    session (a BI tool, a notebook cell, a service endpoint) runs the
    same manifest pipeline the DataFrame entry points expose, with
    every policy knob (:min_chars, :source_cap, :train_permille,
    :val_cutoff, :pack_budget) arriving as a typed argument, never
    string-concatenated. The oracle inlines the literals, so a
    binding slip (wrong order, wrong coercion, wrong stage) is a hash
    mismatch.

    Determinism contract — identical to the DataFrame compositions:
    every stage is a pure function of row content (md5 of text for
    dedup identity, salted md5 of doc_id for mix rank and split
    bucket), so the manifest is reproducible across engines, reruns,
    and cluster sizes. Scale shape: one documents scan, then three
    key-partitioned window shuffles (content-hash, source,
    (lang, split)) — no self-joins, no collect; the mix cap is a
    rank-filter inside the source partition, and packing's running
    sum lives inside the output-shard partition exactly like
    ``pack_sequences_greedy``.
    """
    from ..catalog import register_views
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        WITH gated AS (
            SELECT doc_id, text, lang, source
            FROM documents
            WHERE text IS NOT NULL AND n_chars >= :min_chars
        ), keyed AS (
            SELECT doc_id, lang, source,
                   CAST(size(split(text, ' ')) AS BIGINT) AS n_toks,
                   ROW_NUMBER() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) AS dup_rk
            FROM gated
        ), mixed AS (
            SELECT doc_id, lang, source, n_toks,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(concat('mix',
                                           CAST(doc_id AS STRING))),
                                doc_id) AS mix_rk
            FROM keyed WHERE dup_rk = 1
        ), tagged AS (
            SELECT doc_id, lang, source, n_toks,
                   CASE WHEN CAST(conv(substring(
                            md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)
                            AS INT) % 1000 < :train_permille
                             THEN 'train'
                        WHEN CAST(conv(substring(
                            md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)
                            AS INT) % 1000 < :val_cutoff
                             THEN 'val'
                        ELSE 'test' END AS split
            FROM mixed WHERE mix_rk <= :source_cap
        )
        SELECT doc_id, lang, source, n_toks, split,
               CAST(COALESCE(SUM(n_toks) OVER (
                        PARTITION BY lang, split ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING),
                    0) div :pack_budget AS BIGINT) AS bin
        FROM tagged
        """,
        args={"min_chars": CURATION_MIN_CHARS, "source_cap": 20,
              "train_permille": 800, "val_cutoff": 900,
              "pack_budget": PACK_BUDGET})


@query(
    "temporal_holdout_split",
    oracle="""
    WITH bounds AS (
        SELECT MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS mn,
               MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS mx
        FROM events
    ), tagged AS (
        SELECT user_id,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         >= mn + (mx - mn) * 4 // 5
                    THEN 1 ELSE 0 END AS is_eval
        FROM events, bounds
    )
    SELECT user_id,
           CAST(SUM(1 - is_eval) AS BIGINT) AS n_train_events,
           CAST(SUM(is_eval) AS BIGINT) AS n_eval_events,
           CASE WHEN SUM(is_eval) = 0 THEN 'train_only'
                WHEN SUM(1 - is_eval) = 0 THEN 'eval_only'
                ELSE 'both' END AS presence
    FROM tagged GROUP BY user_id
    """,
)
def temporal_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal holdout split with entity-leakage audit: the eval set
    is the FINAL 20% of the event-time range (cutoff = min + 4/5 of
    the span, pure integer micros so both engines agree exactly), and
    every user is labeled train_only / eval_only / both. The 'both'
    rows are the leakage candidates a time-based evaluation must
    either drop or justify — random hash splits
    (``train_val_test_split_hash``) can't catch this failure mode
    because it is temporal by construction.

    Scale shape: one scan; the time bounds are a 1-row aggregate
    broadcast back into the tag expression; the per-user census is one
    groupBy on the entity key. Nothing about the plan changes when
    events is 100 TB — the cutoff stays a broadcast scalar.
    """
    ev = Catalog(spark, sf_dir).events
    us = F.unix_micros(F.col("ts"))
    bounds = ev.agg(F.min(us).alias("mn"), F.max(us).alias("mx"))
    cutoff = F.col("mn") + F.expr("(mx - mn) * 4 div 5")
    tagged = (ev.crossJoin(F.broadcast(bounds))
              .select("user_id",
                      (us >= cutoff).cast("int").alias("is_eval")))
    return (tagged.groupBy("user_id")
            .agg(F.sum(1 - F.col("is_eval")).alias("n_train_events"),
                 F.sum("is_eval").alias("n_eval_events"))
            .select("user_id", "n_train_events", "n_eval_events",
                    F.when(F.col("n_eval_events") == 0, "train_only")
                    .when(F.col("n_train_events") == 0, "eval_only")
                    .otherwise("both").alias("presence")))


@query(
    "l_diversity_audit",
    oracle="""
    SELECT c_nationkey,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct,
           CAST(COUNT(DISTINCT c_mktsegment) >= 3 AS BIGINT) AS diverse_ok
    FROM customer
    GROUP BY c_nationkey, floor(c_acctbal / 1000)
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the companion ``k_anonymity_violations``
    needs: k-anonymity only bounds GROUP SIZE, but a large
    quasi-identifier group whose sensitive attribute is (near-)
    uniform still leaks it (homogeneity attack). For each quasi-ID
    group (nation, account-balance band) report the number of
    DISTINCT sensitive values (market segment) and whether it clears
    l >= 3 — groups failing the flag need suppression or
    generalization before release even if they pass k.

    One hash aggregation; COUNT(DISTINCT segment) over a 5-value
    domain partial-aggregates to at most 5 entries per group map-side,
    so the shuffle is group-cardinality-bounded at any corpus size.
    The band uses floor division so negative balances band correctly.
    """
    c = Catalog(spark, sf_dir).customer
    band = F.floor(F.col("c_acctbal") / 1000).cast("long")
    return (
        c.groupBy("c_nationkey", band.alias("bal_band"))
        .agg(F.count(F.lit(1)).alias("n_members"),
             F.countDistinct("c_mktsegment").alias("l_distinct"))
        .withColumn("diverse_ok",
                    (F.col("l_distinct") >= 3).cast("long"))
    )


@query(
    "curriculum_order_manifest",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS distinct_ratio
        FROM documents
    ), tiered AS (
        SELECT doc_id, distinct_ratio,
               NTILE(10) OVER (ORDER BY distinct_ratio DESC, doc_id)
                   AS tier
        FROM scored
    )
    SELECT CAST(ROW_NUMBER() OVER (
               ORDER BY tier, md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS position,
           doc_id, CAST(tier AS BIGINT) AS tier
    FROM tiered
    ORDER BY position LIMIT 300
    """,
)
def curriculum_order_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordered training manifest: documents tiered into
    quality deciles (distinct-token ratio — the repetition proxy from
    ``text_quality_score`` — highest first) and md5-shuffled WITHIN
    each tier, so training consumes cleanest-first without the
    pathological sortedness a raw quality order would have inside a
    tier. The standard anti-curriculum variant is the same manifest
    read backwards; both are pure functions of the corpus (NTILE over
    a deterministic total order + hash shuffle — no RNG state), so
    every re-run, resume, and engine agrees on position k.

    One exchange for the tier window, one for the global position
    rank; at 100 TB the global ROW_NUMBER becomes the shard-major
    manifest (``train_shard_manifest`` pattern: position within
    (tier, shard), shards ordered) — the tiering math is unchanged.
    """
    from pyspark.sql import Window as W

    d = Catalog(spark, sf_dir).documents
    toks = F.split(F.col("text"), " ")
    ratio = (F.size(F.array_distinct(toks)).cast("double")
             / F.size(toks))
    tier = F.ntile(10).over(
        W.orderBy(F.col("distinct_ratio").desc(), "doc_id"))
    pos = F.row_number().over(
        W.orderBy("tier", F.md5(F.col("doc_id").cast("string")), "doc_id"))
    return (d.select("doc_id", ratio.alias("distinct_ratio"))
            .withColumn("tier", tier.cast("long"))
            .withColumn("position", pos.cast("long"))
            .select("position", "doc_id", "tier")
            .orderBy("position").limit(300))


@query(
    "kfold_crossval_assignment",
    oracle=f"""
    WITH folds AS (
        SELECT ({_BUCKET_SQL} % 5) AS fold,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(CAST(SUM(n_chars) AS BIGINT) AS BIGINT) AS sum_chars
        FROM documents GROUP BY 1
    ), tot AS (
        SELECT CAST(CAST(SUM(n_docs) AS BIGINT) AS BIGINT) AS n_all,
               CAST(CAST(SUM(sum_chars) AS BIGINT) AS BIGINT) AS chars_all
        FROM folds
    )
    SELECT CAST(fold AS BIGINT) AS fold, n_docs, sum_chars,
           CAST(ROUND(CAST(chars_all - sum_chars AS DOUBLE) * 1000000.0
                      / (n_all - n_docs)) AS BIGINT)
               AS loo_mean_chars_micros
    FROM folds CROSS JOIN tot
    """,
)
def kfold_crossval_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation assignment by hashed doc_id, with the
    leave-one-out complement statistic each fold's training pass would
    see (mean chars over the OTHER four folds, integer micros). Fold
    membership is the module's md5 bucket mod 5 — no RNG, stable as
    the corpus grows, identical on every engine — so fold k's
    train/eval sets are reproducible from the corpus alone.

    One hash aggregation to 5 rows plus a broadcast 1-row total
    (the lazy cross-join idiom, no eager count); the leave-one-out
    mean is computed by complement subtraction rather than a 5x
    re-scan — at 100 TB the corpus is read once for all five folds."""
    d = Catalog(spark, sf_dir).documents
    folds = (d.select((_bucket().cast("long") % 5).alias("fold"), "n_chars")
             .groupBy("fold")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_chars").alias("sum_chars")))
    tot = folds.agg(F.sum("n_docs").alias("n_all"),
                    F.sum("sum_chars").alias("chars_all"))
    # try_divide: with every document in one fold (a 1-doc corpus)
    # the leave-one-out complement is empty — its mean is NULL on
    # both engines, not an ANSI throw (empty_sweep singleton tier).
    loo = F.round(F.try_divide(
        (F.col("chars_all") - F.col("sum_chars")).cast("double")
        * 1000000.0,
        F.col("n_all") - F.col("n_docs"))).cast("long")
    return (folds.crossJoin(F.broadcast(tot))
            .select("fold", "n_docs", "sum_chars",
                    loo.alias("loo_mean_chars_micros")))


#: Priority-sampling sample size (Duffield–Lund–Thorup): keep the k
#: highest-priority items, threshold at the (k+1)-th.
_PRIO_K = 32

#: u is a 6-hex-digit md5 draw mapped to [1, 1e6] — the uniform in the
#: priority q = w/u. 1-based so the division never sees zero.
_PRIO_U_SQL = ("((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))"
               "::BIGINT % 1000000) + 1)")


@query(
    "priority_sample_estimate",
    oracle=f"""
    WITH drawn AS (
        SELECT doc_id, n_chars,
               {_PRIO_U_SQL} AS u,
               (CAST(n_chars AS BIGINT) * 1000000000000)
                   // {_PRIO_U_SQL} AS priority
        FROM documents
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id)
                   AS rn
        FROM drawn
    ), tau AS (
        SELECT priority AS tau FROM ranked WHERE rn = {_PRIO_K + 1}
    ), est AS (
        SELECT r.doc_id, r.n_chars, r.u, r.priority,
               GREATEST(CAST(r.n_chars AS BIGINT) * 1000000,
                        t.tau // 1000000) AS est_weight_micros
        FROM ranked r CROSS JOIN tau t WHERE r.rn <= {_PRIO_K}
    ), tot AS (
        SELECT CAST(CAST(SUM(n_chars) AS BIGINT) AS BIGINT) * 1000000
                   AS true_total_micros
        FROM documents
    )
    SELECT e.doc_id, e.n_chars, CAST(e.u AS BIGINT) AS u,
           e.priority, e.est_weight_micros,
           s.est_total_micros, t.true_total_micros
    FROM est e
    CROSS JOIN (SELECT CAST(CAST(SUM(est_weight_micros) AS BIGINT)
                            AS BIGINT) AS est_total_micros FROM est) s
    CROSS JOIN tot t
    """,
)
def priority_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM '07): a k-item
    weighted sample supporting unbiased subset-sum estimation. Each
    doc draws u ~ U[1, 1e6] from md5(doc_id) and gets priority
    q = w * 1e12 // u (w = n_chars); the k highest-priority items are
    kept and every kept item's weight estimate is max(w, tau) where
    tau is the (k+1)-th priority — the estimator whose subset sums
    are unbiased with near-optimal variance. All arithmetic is
    integer (the uniform is a rational hash draw; the division is
    integer division), so sample AND estimates are bit-reproducible
    on any engine — rerunning a 100 TB corpus audit yields the same
    sample. Ties at tau are broken by doc_id (deterministic; the
    textbook scheme assumes continuous u where ties are null events).

    est_total_micros vs true_total_micros shows the estimator in
    action: the k=32 sample reconstructs the corpus total weight.
    Plan shape: one TakeOrdered top-(k+1) (no global sort), then
    broadcast joins of the 1-row tau/total aggregates."""
    d = Catalog(spark, sf_dir).documents
    u = ((F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6),
                 16, 10).cast("bigint") % 1000000) + 1)
    drawn = d.select(
        "doc_id", "n_chars", u.alias("u"),
        F.expr("n_chars * CAST(1000000000000 AS BIGINT)")
         .cast("bigint").alias("num"))
    drawn = drawn.withColumn("priority", F.expr("num div u")).drop("num")
    top = (drawn.orderBy(F.col("priority").desc(), "doc_id")
           .limit(_PRIO_K + 1).localCheckpoint(eager=False))
    tau = (top.orderBy(F.col("priority").asc(), F.col("doc_id").desc())
           .limit(1).select(F.col("priority").alias("tau"),
                            F.col("doc_id").alias("tau_doc")))
    est = (top.crossJoin(F.broadcast(tau))
           .where((F.col("priority") > F.col("tau"))
                  | ((F.col("priority") == F.col("tau"))
                     & (F.col("doc_id") < F.col("tau_doc"))))
           .select("doc_id", "n_chars", F.col("u").cast("long").alias("u"),
                   "priority",
                   F.greatest(F.col("n_chars").cast("bigint") * 1000000,
                              F.expr("tau div 1000000"))
                   .alias("est_weight_micros")))
    est_tot = est.agg(F.sum("est_weight_micros").alias("est_total_micros"))
    true_tot = d.agg((F.sum("n_chars") * 1000000)
                     .cast("bigint").alias("true_total_micros"))
    return (est.crossJoin(F.broadcast(est_tot))
            .crossJoin(F.broadcast(true_tot)))


@query(
    "importance_resample_weights",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), tgt AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_t
        FROM tok WHERE lang = 'en' GROUP BY tok
    ), tgt_tot AS (
        SELECT CAST(CAST(SUM(n_t) AS BIGINT) AS BIGINT) AS t FROM tgt
    ), corpus AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_c FROM tok GROUP BY tok
    ), corpus_tot AS (
        SELECT CAST(CAST(SUM(n_c) AS BIGINT) AS BIGINT) AS t FROM corpus
    ), rates AS (
        SELECT c.tok,
               COALESCE(CAST(ROUND(CAST(g.n_t AS DOUBLE) * 1000000.0
                                   / gt.t) AS BIGINT), 0) AS p_tgt_micros,
               CAST(ROUND(CAST(c.n_c AS DOUBLE) * 1000000.0 / ct.t)
                    AS BIGINT) AS p_corpus_micros
        FROM corpus c
        LEFT JOIN tgt g USING (tok)
        CROSS JOIN tgt_tot gt CROSS JOIN corpus_tot ct
    ), scored AS (
        SELECT k.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(CAST(SUM(r.p_tgt_micros - r.p_corpus_micros)
                         AS BIGINT) AS BIGINT) AS score_micros
        FROM tok k JOIN rates r USING (tok)
        GROUP BY k.doc_id
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_micros DESC, doc_id)
                AS BIGINT) AS rank,
           doc_id, n_tokens, score_micros
    FROM scored
    ORDER BY rank LIMIT 25
    """,
)
def importance_resample_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style hashed-feature importance scoring (Xie et al. '23):
    rank raw documents by how target-like their token distribution is,
    here with target = the English slice. The textbook score is a sum
    of log-probability ratios; ln is transcendental, so the engine
    ships the same decision signal in a rational lane — per-token
    (p_target - p_corpus) in integer micros, summed per document.
    Positive score = overweights target-typical tokens; the ranking
    it induces is the resampling order. Output: the 25 most
    target-like documents (rank, token count, score).

    Scale shape: one explode -> two vocabulary aggregates (distinct
    tokens only — map-side combine absorbs occurrences), then the
    vocabulary rate table joins back to the token stream. The rate
    table is vocabulary-sized (tiny vs the corpus), so at 100 TB it
    is a broadcast join against the exploded scan followed by one
    per-doc aggregation — no corpus-sized shuffle beyond the doc
    regroup, and the top-25 is a TakeOrdered, not a global sort."""
    d = Catalog(spark, sf_dir).documents
    tok = d.select("doc_id", "lang",
                   F.explode(F.split(F.col("text"), " ")).alias("tok"))
    tgt = (tok.where(F.col("lang") == "en")
           .groupBy("tok").agg(F.count(F.lit(1)).alias("n_t")))
    tgt_tot = tgt.agg(F.sum("n_t").alias("t_tgt"))
    corpus = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n_c"))
    corpus_tot = corpus.agg(F.sum("n_c").alias("t_corpus"))
    rates = (corpus.join(tgt, "tok", "left")
             .crossJoin(F.broadcast(tgt_tot))
             .crossJoin(F.broadcast(corpus_tot))
             .select(
                 "tok",
                 F.coalesce(
                     F.round(F.col("n_t").cast("double") * 1000000.0
                             / F.col("t_tgt")).cast("bigint"),
                     F.lit(0).cast("bigint")).alias("p_tgt_micros"),
                 F.round(F.col("n_c").cast("double") * 1000000.0
                         / F.col("t_corpus")).cast("bigint")
                 .alias("p_corpus_micros")))
    scored = (tok.join(F.broadcast(rates), "tok")
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_tokens"),
                   F.sum(F.col("p_tgt_micros") - F.col("p_corpus_micros"))
                   .alias("score_micros")))
    # TakeOrdered top-25 FIRST, then rank within the 25-row result —
    # a global row_number window before the limit would single-
    # partition the whole corpus.
    top = (scored.orderBy(F.col("score_micros").desc(), "doc_id")
           .limit(25))
    from pyspark.sql import Window as W
    rank = F.row_number().over(
        W.orderBy(F.col("score_micros").desc(), "doc_id")).cast("long")
    return top.select(rank.alias("rank"), "doc_id", "n_tokens",
                      "score_micros")


#: Width of the n_chars length bands for distribution matching.
_LEN_BAND = 50

#: md5-derived uniform in [0, 1e6) for resampling gates.
_U6_SQL = ("(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))"
           "::BIGINT % 1000000)")


@query(
    "length_dist_match_resample",
    oracle=f"""
    WITH banded AS (
        SELECT doc_id, lang, n_chars // {_LEN_BAND} AS band,
               {_U6_SQL} AS u
        FROM documents
    ), corpus AS (
        SELECT band, CAST(COUNT(*) AS BIGINT) AS n_corpus
        FROM banded GROUP BY band
    ), corpus_tot AS (
        SELECT CAST(CAST(SUM(n_corpus) AS BIGINT) AS BIGINT) AS t
        FROM corpus
    ), tgt AS (
        SELECT band, CAST(COUNT(*) AS BIGINT) AS n_target
        FROM banded WHERE lang = 'en' GROUP BY band
    ), tgt_tot AS (
        SELECT CAST(CAST(SUM(n_target) AS BIGINT) AS BIGINT) AS t
        FROM tgt
    ), rates AS (
        SELECT c.band, c.n_corpus,
               c.n_corpus * 1000000 // ct.t AS corpus_share_micros,
               COALESCE(g.n_target, 0) AS n_target,
               COALESCE(g.n_target, 0) * 1000000 // gt.t
                   AS target_share_micros,
               LEAST(CAST(1000000 AS BIGINT),
                     (COALESCE(g.n_target, 0) * 1000000 // gt.t)
                     * 1000000 // (c.n_corpus * 1000000 // ct.t))
                   AS keep_rate_micros
        FROM corpus c
        LEFT JOIN tgt g USING (band)
        CROSS JOIN corpus_tot ct CROSS JOIN tgt_tot gt
    )
    SELECT r.band, r.n_corpus, r.corpus_share_micros, r.n_target,
           r.target_share_micros, r.keep_rate_micros,
           CAST(CAST(SUM(CASE WHEN b.u < r.keep_rate_micros THEN 1
                              ELSE 0 END) AS BIGINT) AS BIGINT)
               AS n_kept
    FROM rates r JOIN banded b USING (band)
    GROUP BY 1, 2, 3, 4, 5, 6
    """,
)
def length_dist_match_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-matched rejection resampling: reshape the corpus
    length distribution toward the target slice's (here lang='en') by
    per-band keep rates min(1, target_share/corpus_share), realized
    as a deterministic md5 gate per document — the standard move for
    aligning a raw crawl's length/quality profile with a reference
    corpus without scoring models. All shares and rates are exact
    integer micros; the gate u < rate is an integer comparison, so
    membership is bit-reproducible and stable under corpus growth
    within a band.

    One banded projection feeds both share aggregates and the gate
    count; the rate table is band-cardinality-sized (broadcast at any
    scale) and joins back onto the banded scan — no corpus shuffle
    beyond the band-keyed aggregates."""
    d = Catalog(spark, sf_dir).documents
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6),
                16, 10).cast("bigint") % 1000000)
    banded = d.select(
        "doc_id", "lang",
        F.expr(f"n_chars div {_LEN_BAND}").alias("band"), u.alias("u"))
    corpus = banded.groupBy("band").agg(F.count(F.lit(1)).alias("n_corpus"))
    corpus_tot = corpus.agg(F.sum("n_corpus").alias("ct"))
    tgt = (banded.where(F.col("lang") == "en")
           .groupBy("band").agg(F.count(F.lit(1)).alias("n_target")))
    tgt_tot = tgt.agg(F.sum("n_target").alias("gt"))
    rates = (corpus.join(tgt, "band", "left")
             .crossJoin(F.broadcast(corpus_tot))
             .crossJoin(F.broadcast(tgt_tot))
             .select(
                 "band", "n_corpus",
                 F.expr("n_corpus * CAST(1000000 AS BIGINT) div ct")
                 .alias("corpus_share_micros"),
                 F.coalesce(F.col("n_target"), F.lit(0)).cast("bigint")
                 .alias("n_target"),
                 F.expr("COALESCE(n_target, 0)"
                        " * CAST(1000000 AS BIGINT) div gt")
                 .alias("target_share_micros"))
             .withColumn(
                 "keep_rate_micros",
                 F.least(F.lit(1000000).cast("bigint"),
                         F.expr("target_share_micros"
                                " * CAST(1000000 AS BIGINT)"
                                " div corpus_share_micros"))))
    return (banded.join(F.broadcast(rates), "band")
            .groupBy("band", "n_corpus", "corpus_share_micros",
                     "n_target", "target_share_micros",
                     "keep_rate_micros")
            .agg(F.sum(F.when(F.col("u") < F.col("keep_rate_micros"), 1)
                       .otherwise(0)).alias("n_kept")))


#: Total sample size apportioned across sources.
_ALLOC_N = 200


@query(
    "sample_allocation_largest_remainder",
    oracle=f"""
    WITH src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(CAST(SUM(n_docs) AS BIGINT) AS BIGINT) AS t FROM src
    ), quota AS (
        SELECT s.source, s.n_docs,
               s.n_docs * {_ALLOC_N} // t.t AS base_alloc,
               s.n_docs * {_ALLOC_N} % t.t AS remainder_scaled
        FROM src s CROSS JOIN tot t
    ), seats AS (
        SELECT {_ALLOC_N} - CAST(CAST(SUM(base_alloc) AS BIGINT)
                                 AS BIGINT) AS left_over
        FROM quota
    ), ranked AS (
        SELECT q.*, ROW_NUMBER() OVER (
                   ORDER BY q.remainder_scaled DESC, q.source) AS rn
        FROM quota q
    )
    SELECT r.source, r.n_docs, r.base_alloc, r.remainder_scaled,
           CAST(CASE WHEN r.rn <= s.left_over THEN 1 ELSE 0 END
                AS BIGINT) AS extra,
           r.base_alloc + CASE WHEN r.rn <= s.left_over THEN 1 ELSE 0
                          END AS alloc
    FROM ranked r CROSS JOIN seats s
    """,
)
def sample_allocation_largest_remainder(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a fixed sample
    budget across sources: each source gets floor(n·N/total), and the
    leftover seats go to the largest integer remainders (ties by
    source name). The method every proportional-sampling plan needs
    once quotas must be INTEGERS that sum exactly to N — naive
    per-source rounding over- or under-shoots the budget. All
    arithmetic is integer (the remainder comparison uses the exact
    scaled remainder n·N mod total, never a float fraction), so the
    allocation is bit-stable across engines and reruns.

    One source-keyed aggregate (20 rows), a broadcast 1-row total,
    and a window over the source-cardinality relation — corpus
    touched once; the allocation table then drives per-source
    hash-rank sampling (`sample_k_per_group` pattern) unchanged at
    any scale."""
    from pyspark.sql import Window as W

    d = Catalog(spark, sf_dir).documents
    src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = src.agg(F.sum("n_docs").alias("t"))
    quota = (src.crossJoin(F.broadcast(tot))
             .select("source", "n_docs",
                     F.expr(f"n_docs * {_ALLOC_N} div t")
                     .alias("base_alloc"),
                     F.expr(f"n_docs * {_ALLOC_N} % t")
                     .alias("remainder_scaled")))
    seats = quota.agg(
        (F.lit(_ALLOC_N) - F.sum("base_alloc")).cast("bigint")
        .alias("left_over"))
    ranked = quota.withColumn(
        "rn", F.row_number().over(
            W.orderBy(F.col("remainder_scaled").desc(), "source")))
    return (ranked.crossJoin(F.broadcast(seats))
            .select("source", "n_docs", "base_alloc", "remainder_scaled",
                    F.when(F.col("rn") <= F.col("left_over"), 1)
                    .otherwise(0).cast("bigint").alias("extra"),
                    (F.col("base_alloc")
                     + F.when(F.col("rn") <= F.col("left_over"), 1)
                     .otherwise(0)).alias("alloc")))


@query(
    "feature_hash_buckets",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), hashed AS (
        SELECT tok,
               (('0x' || substring(md5(tok), 1, 4))::INTEGER % 64)
                   AS bucket
        FROM tok
    ), per_bucket AS (
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
        FROM hashed GROUP BY bucket
    )
    SELECT bucket, n_occurrences, n_distinct_tokens,
           CAST(n_distinct_tokens - 1 AS BIGINT) AS n_collisions
    FROM per_bucket
    ORDER BY bucket
    """,
)
def feature_hash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (feature hashing): project an unbounded token
    vocabulary onto a FIXED 64-dimensional feature space via an
    engine-independent md5 bucket — how a scale pipeline featurizes
    text without materializing (or shipping) a vocabulary dictionary.
    Per bucket: occurrence mass, distinct tokens mapped there, and the
    collision count (distinct − 1) — the audit that tells you whether
    64 dims is too tight for this vocabulary (it is, deliberately:
    the demo surfaces the collision/width trade the method lives on).

    The bucket is a pure per-row expression (md5 → 4 hex chars →
    int % 64) — the same avalanche idiom as the split/shard
    operators, zero shuffle to assign; the only exchange carries
    (bucket, token) partial aggregates, vocabulary-bounded.
    """
    d = Catalog(spark, sf_dir).documents
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    hex4 = F.substring(F.md5(F.col("tok")), 1, 4)
    hashed = toks.select(
        "tok", (F.conv(hex4, 16, 10).cast("int") % 64).alias("bucket"))
    per_bucket = hashed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("tok").alias("n_distinct_tokens"))
    return (per_bucket
            .withColumn("n_collisions",
                        (F.col("n_distinct_tokens") - 1).cast("long"))
            .orderBy("bucket"))


@query(
    "target_encode_loo",
    oracle="""
    WITH base AS (
        SELECT o.o_orderkey, c.c_mktsegment AS segment,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS own_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), seg AS (
        SELECT segment,
               CAST(CAST(SUM(own_cents) AS BIGINT) AS BIGINT)
                   AS seg_cents,
               CAST(COUNT(*) AS BIGINT) AS n_seg
        FROM base GROUP BY segment
    )
    SELECT b.o_orderkey, b.segment, b.own_cents,
           s.n_seg,
           CAST((s.seg_cents - b.own_cents) // (s.n_seg - 1)
                AS BIGINT) AS loo_mean_cents
    FROM base b JOIN seg s USING (segment)
    WHERE b.o_orderkey % 97 = 0
    ORDER BY b.o_orderkey
    """,
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the categorical-feature
    encoding that replaces a category with the mean target of the
    OTHER rows in the category (excluding self prevents the leakage
    that makes naive target encoding overfit): for each order, the
    LOO mean of order value within the customer's market segment.

    The LOO subtraction trick (the ``kfold_crossval_assignment``
    complement-stats pattern): one per-segment aggregate broadcast
    back onto the row scan, loo = (seg_sum − own) div (n − 1) — no
    per-row subquery, no self-join, exact integer cents throughout.
    Output is the deterministic o_orderkey % 97 = 0 slice so the
    checked result stays bounded while the encoding is computed over
    ALL rows (the aggregate sees everything; the filter applies
    after).
    """
    cat = Catalog(spark, sf_dir)
    base = (cat.orders
            .join(F.broadcast(cat.customer
                              .select("c_custkey", "c_mktsegment")),
                  F.col("o_custkey") == F.col("c_custkey"))
            .select("o_orderkey",
                    F.col("c_mktsegment").alias("segment"),
                    F.round(F.col("o_totalprice") * 100).cast("long")
                    .alias("own_cents")))
    seg = base.groupBy("segment").agg(
        F.sum("own_cents").alias("seg_cents"),
        F.count(F.lit(1)).alias("n_seg"))
    return (base.join(F.broadcast(seg), "segment")
            .filter(F.col("o_orderkey") % 97 == 0)
            .select("o_orderkey", "segment", "own_cents", "n_seg",
                    F.expr("(seg_cents - own_cents) div (n_seg - 1)")
                    .alias("loo_mean_cents"))
            .orderBy("o_orderkey"))


@query(
    "generalize_to_k_anonymity",
    oracle=f"""
    WITH l0 AS (
        SELECT CAST(0 AS BIGINT) AS level,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(COUNT_IF(n < {K_ANON}) AS BIGINT)
                   AS n_violating_groups,
               CAST(COALESCE(SUM(n) FILTER (n < {K_ANON}), 0)
                    AS BIGINT) AS n_rows_at_risk
        FROM (SELECT COUNT(*) AS n FROM documents
              GROUP BY lang, source, n_chars // 200)
    ), l1 AS (
        SELECT CAST(1 AS BIGINT), CAST(COUNT(*) AS BIGINT),
               CAST(COUNT_IF(n < {K_ANON}) AS BIGINT),
               CAST(COALESCE(SUM(n) FILTER (n < {K_ANON}), 0)
                    AS BIGINT)
        FROM (SELECT COUNT(*) AS n FROM documents
              GROUP BY lang, source, n_chars // 1000)
    ), l2 AS (
        SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
               CAST(COUNT_IF(n < {K_ANON}) AS BIGINT),
               CAST(COALESCE(SUM(n) FILTER (n < {K_ANON}), 0)
                    AS BIGINT)
        FROM (SELECT COUNT(*) AS n FROM documents
              GROUP BY lang, source)
    ), l3 AS (
        SELECT CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT),
               CAST(COUNT_IF(n < {K_ANON}) AS BIGINT),
               CAST(COALESCE(SUM(n) FILTER (n < {K_ANON}), 0)
                    AS BIGINT)
        FROM (SELECT COUNT(*) AS n FROM documents GROUP BY lang)
    )
    SELECT * FROM l0 UNION ALL SELECT * FROM l1
    UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3
    ORDER BY level
    """,
)
def generalize_to_k_anonymity(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The generalization ladder that REPAIRS what
    ``k_anonymity_violations`` finds: re-audit k-anonymity at
    successively coarser quasi-identifier resolutions — level 0 the
    original (lang, source, 200-char band), level 1 widens the band
    to 1000, level 2 drops the band, level 3 keeps language only —
    reporting groups, violating groups, and rows at re-identification
    risk per level. The release pipeline picks the FIRST level whose
    risk hits zero: the minimal information loss satisfying k (the
    Datafly/Incognito decision step, as a query).

    Each level is one hash aggregate over a coarser key — four scans
    today; the production fusion (aggregate once at level 0, re-roll
    coarser levels from the level-0 group relation — possible because
    every coarser QI is a function of the finest) composes without
    changing the contract, and levels 1–3 would then shuffle group
    metadata only.
    """
    d = Catalog(spark, sf_dir).documents

    def level(lv: int, keys) -> DataFrame:
        g = d.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
        return g.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("n") < K_ANON).cast("long"))
            .alias("n_violating_groups"),
            F.coalesce(F.sum(F.when(F.col("n") < K_ANON, F.col("n"))),
                       F.lit(0)).cast("long").alias("n_rows_at_risk")
        ).select(F.lit(lv).cast("long").alias("level"), "n_groups",
                 "n_violating_groups", "n_rows_at_risk")

    return (level(0, ["lang", "source",
                      F.expr("n_chars div 200").alias("band")])
            .unionByName(level(1, ["lang", "source",
                                   F.expr("n_chars div 1000")
                                   .alias("band")]))
            .unionByName(level(2, ["lang", "source"]))
            .unionByName(level(3, ["lang"]))
            .orderBy("level"))


@query(
    "span_corruption_transform",
    oracle="""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
        WHERE doc_id % 37 = 0 AND len(string_split(text, ' ')) >= 12
    ), cuts AS (
        SELECT doc_id, toks, n,
               2 + (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                    ::INTEGER % (n // 2 - 5)) AS p1,
               n // 2 + 1
               + (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 5, 4))
                  ::INTEGER % (n - n // 2 - 3)) AS p2
        FROM base
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(p1 AS BIGINT) AS span1_start,
           CAST(p2 AS BIGINT) AS span2_start,
           array_to_string(list_slice(toks, 1, p1 - 1), ' ')
             || ' <X> '
             || array_to_string(list_slice(toks, p1 + 3, p2 - 1), ' ')
             || ' <Y> '
             || array_to_string(list_slice(toks, p2 + 3, n), ' ')
               AS corrupted_input,
           '<X> ' || array_to_string(list_slice(toks, p1, p1 + 2), ' ')
             || ' <Y> '
             || array_to_string(list_slice(toks, p2, p2 + 2), ' ')
             || ' <Z>' AS target
    FROM cuts
    ORDER BY doc_id
    """,
)
def span_corruption_transform(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """T5-style SPAN CORRUPTION — the denoising objective's data
    transform, beside ``fim_transform_sample``'s PSM split: two
    3-token spans are cut at md5-derived positions (span 1 strictly
    inside the first half, span 2 in the second, so spans never
    overlap and never touch the document edges — every emitted slice
    is non-empty, which also sidesteps DuckDB's NULL-on-empty
    list_slice),
    the input keeps sentinels <X>/<Y> where the spans were, and the
    target is the sentinel-delimited span sequence. Deterministic by
    construction — no RNG state, the cut positions are a pure
    function of doc_id, so re-runs, backfills, and both engines
    produce byte-identical training pairs (the oracle hash-checks
    the STRINGS, not just counts).

    Pure codegen array ops (split → slice → join); one scan, no
    shuffle before the deterministic %37 sampling filter, which
    applies at the scan. Docs under 12 tokens are excluded by the
    same predicate in both engines.
    """
    d = Catalog(spark, sf_dir).documents
    toks = F.split(F.col("text"), " ")
    base = (d.filter((F.col("doc_id") % 37 == 0)
                     & (F.size(F.split(F.col("text"), " ")) >= 12))
            .select("doc_id", toks.alias("toks"),
                    F.size(toks).alias("n")))
    h1 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                            1, 4), 16, 10).cast("int")
    h2 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                            5, 4), 16, 10).cast("int")
    cuts = (base
            .withColumn("p1", F.lit(2) + h1 % (F.expr("n div 2") - 5))
            .withColumn("p2", F.expr("n div 2") + F.lit(1)
                        + h2 % (F.col("n") - F.expr("n div 2") - 3)))

    def join_slice(start, length):
        return F.array_join(F.slice(F.col("toks"), start, length), " ")

    corrupted = F.concat(
        join_slice(F.lit(1), F.col("p1") - 1), F.lit(" <X> "),
        join_slice(F.col("p1") + 3, F.col("p2") - F.col("p1") - 3),
        F.lit(" <Y> "),
        join_slice(F.col("p2") + 3, F.col("n") - F.col("p2") - 2))
    target = F.concat(
        F.lit("<X> "), join_slice(F.col("p1"), F.lit(3)),
        F.lit(" <Y> "), join_slice(F.col("p2"), F.lit(3)),
        F.lit(" <Z>"))
    return (cuts.select(
        "doc_id", F.col("n").cast("long").alias("n_tokens"),
        F.col("p1").cast("long").alias("span1_start"),
        F.col("p2").cast("long").alias("span2_start"),
        corrupted.alias("corrupted_input"),
        target.alias("target"))
        .orderBy("doc_id"))


@query(
    "kfold_auc_eval",
    oracle=f"""
    WITH s AS (
        SELECT ({_BUCKET_SQL} % 5) AS fold, n_chars AS score,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_pos
        FROM documents WHERE n_chars IS NOT NULL
    ), pv AS (
        SELECT fold, score, CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(is_pos) AS BIGINT) AS k1
        FROM s GROUP BY fold, score
    ), r AS (
        SELECT fold, score, k, k1,
               SUM(k) OVER (PARTITION BY fold ORDER BY score) AS cum,
               COALESCE(SUM(k) OVER (PARTITION BY fold ORDER BY score
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS cum_before
        FROM pv
    ), agg AS (
        SELECT fold,
               CAST(SUM(k1 * (CAST(cum_before AS BIGINT)
                              + CAST(cum AS BIGINT) + 1)) AS BIGINT)
                   AS r1_x2,
               CAST(SUM(k1) AS BIGINT) AS n_pos,
               CAST(SUM(k - k1) AS BIGINT) AS n_neg
        FROM r GROUP BY fold
    )
    SELECT CAST(fold AS BIGINT) AS fold, n_pos, n_neg,
           CAST(CAST(r1_x2 - n_pos * (n_pos + 1) AS HUGEINT) * 1000000
                // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
               AS auc_micros
    FROM agg
    ORDER BY fold
    """,
)
def kfold_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fold metric evaluation — the composition that makes the
    eval layer USABLE: the hashed 5-fold assignment
    (``kfold_crossval_assignment``) crossed with the exact midrank
    AUC (``score_auc_exact``), yielding one AUC per fold so the
    metric's fold-to-fold spread (the thing cross-validation exists
    to measure) is itself a query. Same doc_id-pure fold function,
    same doubled-midrank zero-float lane — the rank walk just gains
    PARTITION BY fold, turning the single-partition walk into five
    keyed ones (strictly better parallelism than the global AUC).
    """
    from pyspark.sql import Window as W

    d = Catalog(spark, sf_dir).documents
    hex4 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    fold = ((F.conv(hex4, 16, 10).cast("int") % _BUCKETS) % 5) \
        .alias("fold")
    # Label nulls are negatives via coalesce 0 — see score_auc_exact
    # (an all-null-label score group otherwise sums to NULL k1 and
    # silently drops out of the fold's denominator).
    s = (d.filter(F.col("n_chars").isNotNull())
         .select(fold, F.col("n_chars").alias("score"),
                 F.coalesce((F.col("lang") == "en").cast("long"),
                            F.lit(0)).alias("is_pos")))
    pv = s.groupBy("fold", "score").agg(
        F.count(F.lit(1)).alias("k"), F.sum("is_pos").alias("k1"))
    w = W.partitionBy("fold").orderBy("score")
    r = (pv.withColumn("cum", F.sum("k").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)))
         .withColumn("cum_before", F.coalesce(
             F.sum("k").over(w.rowsBetween(W.unboundedPreceding, -1)),
             F.lit(0))))
    agg = r.groupBy("fold").agg(
        F.sum(F.col("k1") * (F.col("cum_before") + F.col("cum") + 1))
        .alias("r1_x2"),
        F.sum("k1").alias("n_pos"),
        F.sum(F.col("k") - F.col("k1")).alias("n_neg"))
    return (agg.select(
        F.col("fold").cast("long").alias("fold"), "n_pos", "n_neg",
        # 128-bit lane: U*2 ~ 2*n_pos*n_neg, so the 10^6 scaling
        # passes int64 once a (fold's) corpus holds ~4M documents.
        # One-class guard: a fold without both classes has no AUC —
        # NULL like DuckDB's // 0, not an ANSI throw.
        F.expr("CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE"
               " CAST(CAST(r1_x2 - n_pos * (n_pos + 1)"
               " AS DECIMAL(38,0)) * 1000000"
               " div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg)"
               " AS BIGINT) END").alias("auc_micros"))
        .orderBy("fold"))


@query(
    "negative_sampling_triples",
    oracle="""
    WITH brands AS (
        SELECT DISTINCT p_brand FROM part WHERE p_brand IS NOT NULL
    ), pos AS (
        SELECT DISTINCT c.c_custkey, p.p_brand
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE c.c_custkey % 13 = 0
    ), cand AS (
        SELECT u.c_custkey, b.p_brand,
               md5(CAST(u.c_custkey AS VARCHAR) || '|' || b.p_brand)
                   AS h
        FROM (SELECT DISTINCT c_custkey FROM pos) u
        CROSS JOIN brands b
    ), negs AS (
        SELECT c.c_custkey, c.p_brand, c.h
        FROM cand c LEFT JOIN pos p
          ON p.c_custkey = c.c_custkey AND p.p_brand = c.p_brand
        WHERE p.c_custkey IS NULL
    ), ranked AS (
        SELECT c_custkey, p_brand,
               ROW_NUMBER() OVER (PARTITION BY c_custkey
                                  ORDER BY h, p_brand) AS rn
        FROM negs
    )
    SELECT c_custkey AS user_key,
           CAST(rn AS BIGINT) AS neg_rank,
           p_brand AS negative_brand
    FROM ranked WHERE rn <= 3
    ORDER BY user_key, neg_rank
    """,
)
def negative_sampling_triples(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Deterministic NEGATIVE SAMPLING — the contrastive-training
    data builder every recommender/retrieval trainer needs: for each
    user, k = 3 brands the user has NOT interacted with, chosen by
    md5 order so the "random" negatives are a pure function of
    (user, brand) — re-runs, backfills, and both engines emit the
    same triples (the no-RNG-state policy that owns this module).

    Scale shape: the candidate space is user × BRAND-DIMENSION (25,
    broadcast) — never user × item-instances; positives knock out by
    LEFT anti-join; the per-user top-3 rides a keyed rank window.
    The %13 user slice bounds checked output while exercising the
    full pipeline. With an unbounded item dim, the standard remedy
    is hash-bucketed candidate proposal (propose c·k per user from
    md5 buckets, re-ranked after the anti-join) — composing without
    changing the contract.
    """
    from pyspark.sql import Window as W

    cat = Catalog(spark, sf_dir)
    # A NULL brand is not a sampleable item: it cannot key a
    # contrastive triple, and its NULL md5 tiebreak ranks first in
    # Spark but last in DuckDB (null_sweep audit class).
    brands = (cat.part.filter(F.col("p_brand").isNotNull())
              .select("p_brand").distinct())
    pos = (cat.orders
           .join(cat.customer.select("c_custkey"),
                 F.col("o_custkey") == F.col("c_custkey"))
           .filter(F.col("c_custkey") % 13 == 0)
           .join(cat.lineitem.select("l_orderkey", "l_partkey"),
                 F.col("o_orderkey") == F.col("l_orderkey"))
           .join(F.broadcast(cat.part.select("p_partkey", "p_brand")),
                 F.col("l_partkey") == F.col("p_partkey"))
           .select("c_custkey", "p_brand").distinct()
           .localCheckpoint(eager=False))
    users = pos.select("c_custkey").distinct()
    cand = (users.crossJoin(F.broadcast(brands))
            .withColumn("h", F.md5(F.concat(
                F.col("c_custkey").cast("string"), F.lit("|"),
                F.col("p_brand")))))
    negs = cand.join(pos, ["c_custkey", "p_brand"], "left_anti")
    ranked = negs.withColumn(
        "rn", F.row_number().over(
            W.partitionBy("c_custkey").orderBy("h", "p_brand")))
    return (ranked.filter(F.col("rn") <= 3)
            .select(F.col("c_custkey").alias("user_key"),
                    F.col("rn").cast("long").alias("neg_rank"),
                    F.col("p_brand").alias("negative_brand"))
            .orderBy("user_key", "neg_rank"))


@query(
    "epoch_repetition_plan",
    oracle="""
    WITH per_source AS (
        SELECT source,
               CAST(CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                    AS BIGINT) AS source_tokens
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(CAST(SUM(source_tokens) AS BIGINT) AS BIGINT)
                   AS corpus_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_sources
        FROM per_source
    ), planned AS (
        SELECT p.source, p.source_tokens, t.corpus_tokens,
               (10 * t.corpus_tokens // t.n_sources) AS share_tokens,
               ((10 * t.corpus_tokens // t.n_sources)
                + p.source_tokens - 1) // p.source_tokens AS n_epochs
        FROM per_source p CROSS JOIN tot t
    )
    SELECT source, source_tokens, share_tokens,
           CAST(n_epochs AS BIGINT) AS n_epochs,
           CAST(n_epochs * source_tokens - share_tokens AS BIGINT)
               AS overshoot_tokens,
           CAST(CASE WHEN n_epochs > 4 THEN 1 ELSE 0 END AS BIGINT)
               AS exceeds_4_epochs
    FROM planned
    ORDER BY source
    """,
)
def epoch_repetition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPOCH/REPETITION planning — the data-mixing arithmetic behind
    "train for B tokens with equal source shares": each source must
    supply share = B/n_sources tokens, so it repeats for
    ceil(share / source_tokens) epochs; the plan reports the epoch
    count, the overshoot the sampler will trim, and a >4-epochs flag
    (the empirical repetition ceiling beyond which quality degrades —
    the signal to re-weight rather than repeat). Demo budget B = 10×
    the corpus (derived from the data so the plan is SF-stable);
    production passes its real budget. Every lane integer: ceil is
    the (a + b − 1) div b idiom.

    One token-count aggregate per source, a 1-row total broadcast,
    pure scan-level arithmetic — the plan costs one corpus pass.
    """
    d = Catalog(spark, sf_dir).documents
    per_source = (d.groupBy("source")
                  .agg(F.sum(F.size(F.split(F.col("text"), " ")))
                       .cast("long").alias("source_tokens"))
                  # both the total and the plan read this 20-row
                  # relation: checkpoint lazily so the corpus scan
                  # runs once.
                  .localCheckpoint(eager=False))
    tot = per_source.agg(
        F.sum("source_tokens").alias("corpus_tokens"),
        F.count(F.lit(1)).alias("n_sources"))
    planned = (per_source.crossJoin(F.broadcast(tot))
               .withColumn("share_tokens",
                           F.expr("10 * corpus_tokens div n_sources"))
               .withColumn("n_epochs",
                           F.expr("(share_tokens + source_tokens - 1)"
                                  " div source_tokens")))
    return (planned.select(
        "source", "source_tokens", "share_tokens",
        F.col("n_epochs").cast("long").alias("n_epochs"),
        (F.col("n_epochs") * F.col("source_tokens")
         - F.col("share_tokens")).cast("long").alias("overshoot_tokens"),
        (F.col("n_epochs") > 4).cast("long").alias("exceeds_4_epochs"))
        .orderBy("source"))


@query(
    "t_closeness_audit",
    oracle="""
    WITH base AS (
        SELECT * FROM customer WHERE c_mktsegment IS NOT NULL
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM base
    ), seg AS (
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_seg
        FROM base GROUP BY c_mktsegment
    ), cells AS (
        SELECT c_nationkey,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
               c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_gs
        FROM base
        GROUP BY c_nationkey, floor(c_acctbal / 1000), c_mktsegment
    ), wg AS (
        SELECT *, SUM(n_gs) OVER (PARTITION BY c_nationkey, bal_band)
                      AS n_g
        FROM cells
    ), grp AS (
        SELECT c_nationkey, bal_band,
               SUM(n_gs) AS n_members,
               SUM(abs(CAST(n_gs AS HUGEINT) * tot.n_total
                       - CAST(seg.n_seg AS HUGEINT) * n_g))
                   AS present_num,
               SUM(seg.n_seg) AS present_seg_total,
               any_value(tot.n_total) AS n_total
        FROM wg JOIN seg USING (c_mktsegment) CROSS JOIN tot
        GROUP BY c_nationkey, bal_band
    )
    SELECT c_nationkey, bal_band,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(CAST(present_num
                + CAST(n_total - present_seg_total AS HUGEINT) * n_members
                AS HUGEINT) AS VARCHAR) AS tvd_num,
           CAST(10 * (present_num
                      + CAST(n_total - present_seg_total AS HUGEINT)
                        * n_members)
                <= 7 * CAST(n_members AS HUGEINT) * n_total
                AS BIGINT) AS t_ok
    FROM grp
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the release-privacy
    ladder after ``k_anonymity_violations`` (group size) and
    ``l_diversity_audit`` (distinct sensitive values): a group can
    pass both and still leak via its sensitive-value DISTRIBUTION
    (skewness attack — 90% AUTOMOBILE in one nation-band tells an
    attacker plenty). For each quasi-ID group, the Earth Mover's
    Distance of its market-segment distribution from the global one —
    for categorical attributes with unit ground distance, EMD = total
    variation distance = (1/2)·Σ_s |p_g(s) − p(s)|.

    Every lane is exact: TVD ≤ t=0.35 is tested as the integer
    cross-multiplication 10·Σ_s |n_gs·N − N_s·n_g| ≤ 7·n_g·N (no
    division anywhere), with 128-bit lanes because the products are
    count·count (the PERF.md overflow rule). Absent segments
    contribute N_s·n_g without being materialized: their sum is
    (N − Σ_present N_s)·n_g, so the plan is one (group, segment)
    aggregate + a broadcast 5-row segment dictionary + a broadcast
    1-row total — group-cardinality-bounded shuffles at any scale.

    Null semantics (null_sweep audit): the audit is defined over
    records with an OBSERVED sensitive value, on both engines — a
    null-segment member previously inflated the Spark group sizes
    differently from the oracle (n_g computed before vs after the
    segment join). Null-sensitive rows are their own disclosure
    class, not part of a distribution distance.
    """
    c = Catalog(spark, sf_dir).customer.filter(
        F.col("c_mktsegment").isNotNull())
    band = F.floor(F.col("c_acctbal") / 1000).cast("long")
    seg = (c.groupBy("c_mktsegment")
           .agg(F.count(F.lit(1)).alias("n_seg"))
           .localCheckpoint(eager=False))
    # The corpus total is the segment dictionary's sum — no second
    # customer scan (audit: 3 scans before this derivation).
    tot = seg.agg(F.sum("n_seg").alias("n_total"))
    cells = (c.groupBy("c_nationkey", band.alias("bal_band"),
                       "c_mktsegment")
             .agg(F.count(F.lit(1)).alias("n_gs")))
    dec = "decimal(38,0)"
    n_g = F.sum("n_gs").over(
        W.partitionBy("c_nationkey", "bal_band"))
    grp = (cells.join(F.broadcast(seg), "c_mktsegment")
           .crossJoin(F.broadcast(tot))
           .withColumn("n_g", n_g)
           .groupBy("c_nationkey", "bal_band")
           .agg(F.sum("n_gs").alias("n_members"),
                F.sum(F.abs(F.col("n_gs").cast(dec) * F.col("n_total")
                            - F.col("n_seg").cast(dec) * F.col("n_g")))
                .alias("present_num"),
                F.sum("n_seg").alias("present_seg_total"),
                F.first("n_total").alias("n_total")))
    tvd_num = (F.col("present_num")
               + (F.col("n_total") - F.col("present_seg_total"))
               .cast(dec) * F.col("n_members"))
    return (grp.select(
        "c_nationkey", "bal_band",
        F.col("n_members").cast("long").alias("n_members"),
        # The 128-bit numerator crosses the driver boundary as a
        # STRING: DuckDB HUGEINT and Spark DECIMAL(38,0) canonicalize
        # to different pandas dtypes (float64 vs Decimal objects —
        # lossy past 2^53 on the float side), while their decimal
        # string forms are identical and exact at any corpus size.
        tvd_num.cast(dec).cast("string").alias("tvd_num"),
        (F.lit(10).cast(dec) * tvd_num
         <= F.lit(7).cast(dec) * F.col("n_members") * F.col("n_total"))
        .cast("long").alias("t_ok")))


#: Per-epoch token budget unit for ``mix_epoch_schedule``: epoch e
#: gets a budget of e * this many tokens (a simple warm-up ramp; the
#: apportionment math is budget-shape-agnostic).
EPOCH_TOKEN_UNIT = 1_000_000
N_EPOCHS = 4


@query(
    "mix_epoch_schedule",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS n_toks
        FROM documents GROUP BY source
    ), tot AS (
        SELECT source, n_toks,
               CAST(SUM(n_toks) OVER () AS BIGINT) AS n_total
        FROM counts
    ), g AS (
        SELECT source, n_toks, n_total, epoch,
               CAST({EPOCH_TOKEN_UNIT} * epoch AS BIGINT) AS budget
        FROM tot CROSS JOIN
             (SELECT UNNEST([1, 2, 3, 4]) AS epoch) e
    ), q AS (
        SELECT source, epoch, budget,
               budget * n_toks // NULLIF(n_total, 0) AS base,
               (budget * n_toks) % NULLIF(n_total, 0) AS rem
        FROM g
    ), r AS (
        SELECT *,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY epoch
                   ORDER BY rem DESC NULLS LAST, source NULLS LAST)
                    AS BIGINT) AS rk,
               budget - CAST(SUM(base) OVER (PARTITION BY epoch)
                             AS BIGINT) AS leftover
        FROM q
    )
    SELECT source, CAST(epoch AS BIGINT) AS epoch,
           CAST(budget AS BIGINT) AS epoch_budget,
           CAST(base AS BIGINT) AS base_tokens,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_tokens
    FROM r
    """,
)
def mix_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, epoch) token allocation by LARGEST-REMAINDER
    (Hamilton) apportionment: each epoch's integer budget splits
    across sources proportionally to their token mass, floors are
    assigned exactly (BIGINT quotient/remainder — no float anywhere),
    and the leftover tokens go one each to the largest remainders
    (ties broken by source name). Guarantees sum(alloc) == budget per
    epoch and |alloc - exact quota| < 1 — the schedule a token-
    budgeted multi-epoch training mix actually needs, where naive
    rounding over- or under-spends the budget.

    One groupBy on source; everything after runs on the sources x
    epochs grid (metadata-sized at any corpus scale). NULLIF guards
    the all-null-token degenerate corpus (NULL allocations on both
    engines rather than a division error).
    """
    d = Catalog(spark, sf_dir).documents
    counts = d.groupBy("source").agg(
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long")
        .alias("n_toks"))
    wall = W.partitionBy()
    tot = counts.withColumn("n_total",
                            F.sum("n_toks").over(wall).cast("long"))
    epochs = (spark.range(1, N_EPOCHS + 1)
              .select(F.col("id").alias("epoch")))
    g = (tot.crossJoin(F.broadcast(epochs))
         .withColumn("budget",
                     (F.lit(EPOCH_TOKEN_UNIT) * F.col("epoch"))
                     .cast("long")))
    q = g.select(
        "source", "epoch", "budget",
        F.expr("budget * n_toks div NULLIF(n_total, 0)").alias("base"),
        F.expr("(budget * n_toks) % NULLIF(n_total, 0)").alias("rem"))
    wr = W.partitionBy("epoch").orderBy(F.col("rem").desc_nulls_last(),
                                        F.col("source").asc_nulls_last())
    we = W.partitionBy("epoch")
    r = (q.withColumn("rk", F.row_number().over(wr).cast("long"))
         .withColumn("leftover",
                     F.col("budget") - F.sum("base").over(we).cast("long")))
    return r.select(
        "source", F.col("epoch").cast("long").alias("epoch"),
        F.col("budget").alias("epoch_budget"),
        F.col("base").alias("base_tokens"),
        (F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1)
         .otherwise(0)).cast("long").alias("alloc_tokens"))
