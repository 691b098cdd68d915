"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats images/audio/video as ``binary`` columns with a
metadata struct, processed by Arrow-batched pandas functions via
``mapInPandas``. The container has no image/audio codecs, so the
decode kernel is a clearly-marked STUB (deterministic fake features);
everything Spark-side — schema, batch iteration, partitioning, UDF
signatures — is real and tested (tests/test_multimodal.py).

The testdata ships no binary table, so ``multimodal_features``
manufactures blobs from ``documents.text`` (utf-8 bytes) — which also
makes the *plumbing* oracle-checkable: byte length and sha256 of the
blob are string-derivable in DuckDB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import Catalog
from . import query

#: Output schema of the feature-extraction stage.
FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "content_hash string, feat_mean double, feat_dim int"
)


def decode_and_featurize(blob: bytes, media_type: str) -> dict:
    """STUB decode kernel.

    A real deployment plugs Pillow/torchaudio/pyav in here; this
    container has none of them, so we compute a deterministic fake
    feature (mean byte value) and keep the exact I/O contract a real
    decoder would have. Raises on unknown media types like a real
    decoder would.
    """
    if media_type not in {"image", "audio", "video", "text"}:
        raise NotImplementedError(f"no decoder for media_type={media_type!r}")
    if not blob:
        return {"feat_mean": 0.0, "feat_dim": 0}
    # Deterministic fake "embedding" statistic over raw bytes.
    return {"feat_mean": float(sum(blob)) / len(blob), "feat_dim": 8}


def featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batch in → feature rows out.

    Batch-at-a-time (never row-at-a-time serde); each batch stays
    executor-local, so the stage scales with partition count and the
    decode library's throughput, not with driver anything.
    """
    import hashlib

    for pdf in batches:
        feats = [decode_and_featurize(b, m)
                 for b, m in zip(pdf["payload"], pdf["media_type"])]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].values,
            "media_type": pdf["media_type"].values,
            "n_bytes": [len(b) for b in pdf["payload"]],
            "content_hash": [hashlib.sha256(b).hexdigest() for b in pdf["payload"]],
            "feat_mean": [f["feat_mean"] for f in feats],
            "feat_dim": [f["feat_dim"] for f in feats],
        })


def binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-materialized as an opaque binary column with
    typed metadata — the canonical multimodal table shape."""
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("text").alias("media_type"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").alias("declared_size"),
        ).alias("meta"),
    )


@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_hash,
           'text' AS media_type
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction (length + content hash) —
    pure JVM expressions over the blob, no decode needed. This is the
    oracle-checkable half of the multimodal path."""
    b = binary_table(spark, sf_dir)
    return b.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("content_hash"),
        F.col("media_type"),
    )


@query("multimodal_features")  # rows-only: the decode stub is engine-private
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline: binary table → mapInPandas decode/
    featurize (Arrow batches) → typed feature rows. The decode itself
    is stubbed (module docstring); the distributed plumbing is real.
    """
    b = binary_table(spark, sf_dir).select("doc_id", "payload", "media_type")
    return b.mapInPandas(featurize_batches, schema=FEATURE_SCHEMA)


def typed_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A mixed-modality table: documents' bytes re-labeled round-robin
    as image/audio/video/text with per-type metadata, standing in for
    a real multimodal corpus (no codecs ship in this container). The
    schema — binary payload + discriminator + typed meta struct — is
    the real contract a production pipeline would use."""
    d = Catalog(spark, sf_dir).documents
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video"), F.lit("text")),
        (F.col("doc_id") % 4 + 1).cast("int"))
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        mt.alias("media_type"),
        F.struct(
            F.col("n_chars").alias("declared_size"),
            (F.col("doc_id") % 30 + 1).cast("int").alias("duration_s"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def sample_frames(batches):
    """mapInPandas kernel: video frame sampling STUB.

    Real implementation would pyav-decode and keep 1 frame/sec; the
    stub slices the payload into `duration_s` pseudo-frames and keeps
    every 5th — the batch shapes, explode-like fan-out, and schema are
    exactly what the real kernel produces.
    """
    import hashlib
    for pdf in batches:
        rows = {"doc_id": [], "frame_idx": [], "frame_hash": []}
        for doc_id, payload, duration in zip(
                pdf["doc_id"], pdf["payload"], pdf["duration_s"]):
            n_frames = max(int(duration), 1)
            step = max(len(payload) // n_frames, 1)
            for idx in range(0, n_frames, 5):  # sample every 5th frame
                chunk = payload[idx * step:(idx + 1) * step]
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(idx)
                rows["frame_hash"].append(
                    hashlib.sha256(bytes(chunk)).hexdigest()[:16])
        yield pd.DataFrame(rows)


@query("multimodal_frame_sample")  # rows-only: decode stub is engine-private
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video pipeline: filter to video rows (pushed-down discriminator
    predicate), repartition by doc_id so one worker owns one asset's
    frames, then Arrow-batched frame sampling. Output is one row per
    kept frame — the fan-out shape that feeds frame-level dedup or
    embedding stages downstream."""
    media = typed_media_table(spark, sf_dir)
    videos = (media.filter(F.col("media_type") == "video")
              .select("doc_id", "payload", F.col("meta.duration_s").alias("duration_s")))
    return videos.repartition("doc_id").mapInPandas(
        sample_frames, schema="doc_id bigint, frame_idx int, frame_hash string")


@query(
    "multimodal_asset_dedup",
    oracle="""
    WITH h AS (
        SELECT sha256(text) AS hash,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    ), per AS (
        SELECT hash, COUNT(*) AS n, any_value(n_bytes) AS nb
        FROM h GROUP BY hash
    )
    SELECT 'text' AS media_type,
           CAST(SUM(n) AS BIGINT) AS n_assets,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(n - 1) AS BIGINT) AS n_dup_losers,
           CAST(SUM(n * nb) AS BIGINT) AS bytes_total,
           CAST(SUM((n - 1) * nb) AS BIGINT) AS bytes_dedupable
    FROM per
    """,
)
def multimodal_asset_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-asset dedup census: per media type, how many payloads
    are byte-identical (sha256 over the raw blob) and how many bytes
    content-addressed storage would reclaim. THE first pass over any
    crawled image/video corpus — duplicate assets dominate crawl
    volume — and the binary twin of text's ``dedup_exact_stats``.

    Everything is JVM-side: sha2 works directly on the binary column
    (no decode, no Python — hashing never needs the codec), and the
    shuffle carries 32-byte digests + a length, never payloads. Two
    partial-aggregated exchanges: (media_type, hash) then media_type
    — at 100 TB the first is the only real shuffle and its rows are
    ~50 bytes regardless of asset size. Oracle derives the same
    digest from the text the payload was encoded from.
    """
    b = binary_table(spark, sf_dir)
    h = b.select("media_type",
                 F.sha2(F.col("payload"), 256).alias("hash"),
                 F.length(F.col("payload")).cast("long").alias("n_bytes"))
    per = h.groupBy("media_type", "hash").agg(
        F.count(F.lit(1)).alias("n"), F.first("n_bytes").alias("nb"))
    return per.groupBy("media_type").agg(
        F.sum("n").alias("n_assets"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("n") - 1).alias("n_dup_losers"),
        F.sum(F.col("n") * F.col("nb")).alias("bytes_total"),
        F.sum((F.col("n") - 1) * F.col("nb")).alias("bytes_dedupable"),
    )
