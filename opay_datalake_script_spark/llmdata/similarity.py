"""Embedding similarity search (SURVEY.md §2-K): exact cosine top-k,
k-NN for a query vector, embedding near-dup pairs, and an LSH/IVF-style
bucketed ANN variant as the scale path.

Design for 100 TB: the exact all-pairs path is block-wise — each executor
receives one Arrow batch of rows and a broadcast matrix, computes a numpy
matmul (BLAS), and emits only its local top-k; the driver-side reduce sees
k rows per partition, never the n^2 pair set. The ANN path cuts candidate
generation to same-bucket joins.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..schemas import EMBEDDING_DIM
from ..sources.io import load

_TOPK_SCHEMA = "vec_a long, vec_b long, sim double"


def _normalized_matrix(rows: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(ids, L2-normalized float64 matrix) from an embeddings pandas frame."""
    ids = rows["vec_id"].to_numpy()
    mat = np.vstack(rows["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return ids, mat / norms


@register(
    "k_similarity_topk",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ORDER BY sim DESC, a.vec_id, b.vec_id
    LIMIT 10
    """,
)
def k_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most-similar embedding pairs by cosine.

    Block-wise exact search: broadcast the (normalized, float64) matrix,
    mapInPandas computes each partition's block x full-matrix product with
    one BLAS call and keeps its local top-k; a global top-k reduce
    finishes. Work is O(n^2 d) flops but only O(parts * k) rows ever
    shuffle — at 2k vectors this is one matmul; at 100 TB swap the
    broadcast for the IVF bucket path (k_ann_ivf).
    """
    k = 10
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    all_rows = emb.toPandas()
    ids_all, mat_all = _normalized_matrix(all_rows)
    b_ids = spark.sparkContext.broadcast(ids_all)
    b_mat = spark.sparkContext.broadcast(mat_all)

    def block_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, mat = _normalized_matrix(pdf)
            sims = mat @ b_mat.value.T  # (block, n) BLAS product
            # mask the lower triangle (unordered-pair dedupe), then take the
            # block-local top-k straight off the score matrix — never
            # materializing the O(block*n) candidate pairs as a DataFrame
            sims[ids[:, None] >= b_ids.value[None, :]] = -np.inf
            flat = sims.ravel()
            kk = min(k, flat.size)
            idx = np.argpartition(flat, -kk)[-kk:]
            ai, bi = np.unravel_index(idx, sims.shape)
            yield pd.DataFrame(
                {"vec_a": ids[ai], "vec_b": b_ids.value[bi], "sim": flat[idx]}
            )

    # Parallelism comes from the input's natural partitioning (file splits
    # at scale); forcing a repartition here would add a shuffle stage that
    # costs more than it buys at any size — blocks just need to be batches.
    local = emb.mapInPandas(block_topk, schema=_TOPK_SCHEMA)
    return (
        local.withColumn("sim", F.round("sim", 6))
        .orderBy(F.col("sim").desc(), "vec_a", "vec_b")
        .limit(k)
    )


@register(
    "k_knn_query",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv), 6) AS sim
    FROM embeddings CROSS JOIN q
    WHERE vec_id <> 0
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
)
def k_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN of a single query vector (vec_id 0): broadcast the query,
    score with a JVM-side expression (zip_with dot product over float64),
    TakeOrderedAndProject keeps 10 rows per partition."""
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
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != 0)
        .select("vec_id", "label", F.round(cos, 6).alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
    )


@register(
    "k_embed_near_dup",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.9
    """,
)
def k_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim >= 0.9) — the semantic
    dedup primitive. Same block-wise matmul as k_similarity_topk but
    threshold-filtered inside the block, so only actual near-dups leave
    the executor."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    all_rows = emb.toPandas()
    ids_all, mat_all = _normalized_matrix(all_rows)
    b_ids = spark.sparkContext.broadcast(ids_all)
    b_mat = spark.sparkContext.broadcast(mat_all)
    threshold = 0.9

    def block_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, mat = _normalized_matrix(pdf)
            sims = mat @ b_mat.value.T
            ai, bj = np.nonzero(sims >= threshold)
            va, vb, sv = ids[ai], b_ids.value[bj], sims[ai, bj]
            keep = va < vb
            yield pd.DataFrame({"vec_a": va[keep], "vec_b": vb[keep], "sim": sv[keep]})

    local = emb.repartition(16, "vec_id").mapInPandas(block_pairs, schema=_TOPK_SCHEMA)
    return local.withColumn("sim", F.round("sim", 6))


@register("k_ann_ivf")
def k_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate NN (rows-only: cluster assignment is
    approximate by design).

    Coarse quantizer: seeded KMeans over the embeddings; every vector is
    assigned to its nearest centroid (inverted list). The query probes
    the 2 nearest lists and scores only those candidates — the candidate
    set shrinks by ~n_clusters/n_probe, which is the whole point at
    100 TB (per-bucket equi-join instead of cross product).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load(spark, sf_dir, "embeddings")
    vecs = emb.withColumn(
        "fv", array_to_vector(F.transform("embedding", lambda x: x.cast("double")))
    )
    km = KMeans(k=16, seed=42, featuresCol="fv", predictionCol="bucket")
    model = km.fit(vecs)
    assigned = model.transform(vecs)

    # Query = vec_id 0; probe its 2 nearest centroids.
    centers = model.clusterCenters()
    qrow = assigned.where(F.col("vec_id") == 0).select("fv").first()
    if qrow is None:
        return assigned.select("vec_id", "bucket").limit(0)
    q = np.array(qrow["fv"].toArray())
    dists = [float(np.linalg.norm(q - c)) for c in centers]
    probe = [int(i) for i in np.argsort(dists)[:2]]

    qn = q / (np.linalg.norm(q) or 1.0)
    cand = assigned.where(F.col("bucket").isin(probe) & (F.col("vec_id") != 0))
    arr = vector_to_array(F.col("fv"))
    dot = F.aggregate(
        F.zip_with(arr, F.lit(qn.tolist()), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        cand.select("vec_id", "label", "bucket", F.round(dot / norm, 6).alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
    )


@register(
    "k_centroid_per_label",
    oracle="""
    SELECT label, i AS dim, round(avg(embedding[i]), 6) AS centroid
    FROM embeddings, range(1, 65) t(i)
    GROUP BY label, i
    """,
)
def k_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the k-means update
    step that trains the IVF coarse quantizer (`k_ann_ivf`). posexplode
    fans each vector into (label, dim, value) rows, then one hash
    aggregate averages per cell; dims are emitted 1-based to match the
    oracle's list indexing.

    At 100 TB: the explode is map-side (no shuffle of the raw vectors);
    the single shuffle carries only partial (sum, count) pairs per
    (label, dim) — 64 x n_labels cells regardless of row count.
    """
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(F.round(F.avg("v"), 6).alias("centroid"))
    )
