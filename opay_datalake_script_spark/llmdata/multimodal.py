"""Multimodal column plumbing (SURVEY.md §2-K extension).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The fixtures carry no binary media, so the blobs here are
deterministically synthesized from document text (encode -> binary), and
the *decode* step is a clearly-marked stub (the image/audio libraries are
not in this container) — but every piece of Spark-side plumbing is real
and tested: binary columns, metadata structs, Arrow batch shapes through
mapInPandas, and partition-parallel feature extraction.

At 100 TB: blobs stay in columnar storage next to their metadata; the
decode/feature UDFs stream per-partition Arrow batches so executor memory
holds one batch of blobs, never a partition's worth of decoded frames.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load

FEATURE_DIM = 8


def decode_image(blob: bytes) -> "object":
    """Decode an image blob to pixels. STUB: pillow/opencv are not
    available in this container; the real implementation is
    ``PIL.Image.open(io.BytesIO(blob))``."""
    raise NotImplementedError("image decode requires pillow/opencv (not in container)")


def _fake_features(blob: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector:
    FEATURE_DIM floats derived from the blob's sha256 (stable across
    runs/partitions, so tests can assert exact values)."""
    h = hashlib.sha256(blob).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch of (doc_id, blob, meta...) in,
    one batch of (doc_id, n_bytes, features) out."""
    for pdf in batches:
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["blob"].map(len).astype("int64"),
                "features": pdf["blob"].map(_fake_features),
            }
        )
        yield out


@register("k_multimodal_pipeline")
def k_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal plumbing (rows-only: features come from the
    stubbed decoder): synthesize blob + metadata struct -> partition-
    parallel feature extraction -> join features back to metadata.
    The feature vector crosses the UDF boundary as array<double> but the
    checked output joins it to one string (rounded to 6 dp) — array cells
    crash the driver's canonicalizer even on rows-only checks."""
    d = load(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.struct(
            F.lit("synthetic/text").alias("mime"),
            F.col("n_chars").cast("long").alias("content_length"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )
    feats = media.mapInPandas(
        extract_features,
        schema=f"doc_id long, n_bytes long, features array<double>",
    )
    return (
        media.select("doc_id", "meta")
        .join(feats, "doc_id")
        .select(
            "doc_id",
            F.col("meta.mime").alias("mime"),
            F.col("meta.content_length").alias("content_length"),
            "n_bytes",
            F.concat_ws(
                ",", F.transform("features", lambda x: F.round(x, 6).cast("string"))
            ).alias("features"),
        )
    )


@register(
    "k_multimodal_join",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT doc_id, lang, label,
           round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv), 6) AS sim
    FROM documents
    JOIN embeddings ON doc_id = vec_id
    CROSS JOIN q
    WHERE label IN (1, 2, 3)
      AND list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv)
          BETWEEN 0.2 AND 0.98
    """,
)
def k_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs joined to their embedding rows (doc_id = vec_id), filtered by
    label and a cosine band against a query vector — the curation query
    shape that mixes relational filters with vector scoring."""
    d = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    qd = F.transform(F.col("qv"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(e, qd, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda v: F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))  # noqa: E731
    cos = dot / (norm(e) * norm(qd))
    return (
        d.join(emb, d.doc_id == emb.vec_id)
        .crossJoin(F.broadcast(q))
        .where(F.col("label").isin(1, 2, 3) & cos.between(0.2, 0.98))
        .select("doc_id", "lang", "label", F.round(cos, 6).alias("sim"))
    )


FRAME_BYTES = 64
FRAME_STRIDE = 3


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch of (doc_id, blob) in, one batch
    of sampled-frame rows out. A "video" here is the blob split into
    consecutive FRAME_BYTES-byte frames (full frames only); every
    FRAME_STRIDE-th frame is kept — the frame-sampling shape for real
    video where the decoder would yield keyframes instead of byte slices."""
    for pdf in batches:
        doc_ids, idxs, hashes, totals = [], [], [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            b = bytes(blob)
            n = len(b) // FRAME_BYTES
            for i in range(0, n, FRAME_STRIDE):
                doc_ids.append(doc_id)
                idxs.append(i)
                hashes.append(
                    hashlib.md5(b[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]).hexdigest()
                )
                totals.append(n)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_md5": pd.Series(hashes, dtype="object"),
                "n_frames": pd.Series(totals, dtype="int32"),
            }
        )


@register(
    "k_frame_sample",
    oracle="""
    WITH d AS (
        SELECT doc_id, text,
               CAST(length(text) // 64 AS INT) AS n_frames
        FROM documents)
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           md5(substring(text, CAST(i AS INT) * 64 + 1, 64)) AS frame_md5,
           n_frames
    FROM d, unnest(range(0, n_frames)) AS t(i)
    WHERE i % 3 = 0
    """,
)
def k_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a binary media column: synthesize the blob
    (UTF-8 encode of ASCII text, so byte offsets == char offsets and the
    oracle can recompute every frame hash with substring+md5), then
    sample every 3rd 64-byte frame inside an Arrow-batched mapInPandas.

    At 100 TB: map-only — no shuffle anywhere; each executor holds one
    Arrow batch of blobs, and the emitted rows are (id, idx, hash) only,
    never the frames themselves. With a real codec the worker body
    swaps the byte slicing for decoder keyframe iteration; the schema,
    batching, and partition parallelism are exactly this."""
    d = load(spark, sf_dir, "documents")
    media = d.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    return media.mapInPandas(
        sample_frames,
        schema="doc_id long, frame_idx int, frame_md5 string, n_frames int",
    )
