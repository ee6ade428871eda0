"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: a broadcast join of the
(small) query set against all vectors, the dot product evaluated JVM-side
with zip_with/aggregate in double precision, ranked per query with a
window. The scale path is LSH bucketing (random hyperplanes — the same
family as SimHash) which restricts each query to one bucket's candidates.

For embedding-based near-duplicate detection, ``cosine_pairs`` returns all
pairs above a cosine threshold within LSH buckets.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import ANN_SEED


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def with_unit_vectors(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize once so cosine reduces to a dot product."""
    n = _norm(F.col(vec_col))
    return emb.withColumn(
        "unit",
        F.when(
            n > 0, F.transform(vec_col, lambda x: x.cast("double") / n)
        ).otherwise(F.transform(vec_col, lambda x: F.lit(0.0))),
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query vector by cosine similarity.

    queries: (query_id, embedding). The query side is broadcast (small by
    contract); ties broken by neighbor id for determinism. Self-matches
    (same id) excluded. Returns (query_id, rank, neighbor_id, cosine).
    """
    q = queries.select(
        F.col("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v")
    ).crossJoin(F.broadcast(q))
    scored = scored.withColumn(
        "cosine",
        _dot(F.col("q_vec"), F.col("v"))
        / (_norm(F.col("q_vec")) * _norm(F.col("v"))),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


HYPERPLANE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("bucket", T.LongType(), False),
    ]
)


def hyperplane_buckets(
    emb: DataFrame, dim: int, nbits: int = 16, vec_col: str = "embedding"
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector (seeded, deterministic).
    Vectorized kernel: one (batch x dim) @ (dim x nbits) matmul per batch."""
    rng = np.random.RandomState(ANN_SEED)
    planes = rng.standard_normal((dim, nbits))
    weights = (1 << np.arange(nbits, dtype=np.uint64)).astype(np.uint64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            bits = (m @ planes) >= 0
            buckets = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "bucket": buckets.astype(np.int64),
                }
            )

    return emb.select("vec_id", vec_col).mapInPandas(kernel, HYPERPLANE_SCHEMA)


def cosine_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    nbits: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only candidates sharing the query's hyperplane
    bucket are scored. Recall/cost tradeoff via nbits (fewer bits = bigger
    buckets = higher recall)."""
    b_all = hyperplane_buckets(emb, dim, nbits, vec_col)
    b_q = hyperplane_buckets(
        queries.select(F.col("query_id").alias("vec_id"), vec_col), dim, nbits, vec_col
    ).select(F.col("vec_id").alias("query_id"), "bucket")
    cands = (
        b_q.join(b_all, "bucket")
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    q = queries.select("query_id", F.col(vec_col).alias("q_vec"))
    v = emb.select(F.col("vec_id").alias("neighbor_id"), F.col(vec_col).alias("v"))
    scored = (
        cands.join(F.broadcast(q), "query_id")
        .join(v, "neighbor_id")
        .withColumn(
            "cosine",
            _dot(F.col("q_vec"), F.col("v"))
            / (_norm(F.col("q_vec")) * _norm(F.col("v"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def cosine_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.9,
    nbits: int = 8,
    vec_col: str = "embedding",
    max_bucket_size: int = 10000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within LSH buckets:
    (a, b, cosine >= threshold). Bucket-size cap mirrors the MinHash skew
    guard."""
    u = with_unit_vectors(emb, vec_col)
    b = hyperplane_buckets(emb, dim, nbits, vec_col)
    sized = b.withColumn(
        "bsize", F.count(F.lit(1)).over(Window.partitionBy("bucket"))
    ).filter(F.col("bsize") <= max_bucket_size)
    left = sized.select("bucket", F.col("vec_id").alias("a"))
    right = sized.select("bucket", F.col("vec_id").alias("b"))
    pairs = left.join(right, "bucket").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    ua = u.select(F.col("vec_id").alias("a"), F.col("unit").alias("ua"))
    ub = u.select(F.col("vec_id").alias("b"), F.col("unit").alias("ub"))
    return (
        pairs.join(ua, "a")
        .join(ub, "b")
        .withColumn("cosine", _dot("ua", "ub"))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", F.round("cosine", 6).alias("cosine"))
    )
