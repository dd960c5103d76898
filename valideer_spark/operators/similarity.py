"""Similarity search over an embedding column (``array<float>``).

* :func:`cosine_topk` — exact brute-force top-k against a query vector;
  the dot product is a JVM ``zip_with``/``aggregate`` fold (double
  precision, deterministic left-to-right order). The baseline and the
  recall oracle for the ANN path.
* :func:`lsh_bucket` / :func:`ann_lsh_topk` — random-hyperplane LSH:
  sign-bit bucket of H deterministic hyperplanes; query probes its own
  bucket plus all 1-bit-flip neighbors (multiprobe), then scores exactly
  within candidates. At 10^12 vectors the bucket column becomes the
  table's partition key so a query touches H+1 partitions, not the table.
* :func:`cosine_self_join_topk` — k-NN join restricted to LSH buckets.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Deterministic double-precision dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query`` (ties broken by id).

    orderBy+limit compiles to TakeOrderedAndProject: per-partition top-k
    then a k-row merge on the driver — no full sort, no full shuffle.
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(
        F.col(id_col).alias("id"),
        cosine(F.col(vec_col), q).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("id")).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(0.0, 1.0, (n_planes, dim))


def lsh_bucket(
    vec: Column, planes: np.ndarray
) -> Column:
    """Sign-bit bucket id (long) of a vector against fixed hyperplanes."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec, p) >= 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(bit)
    return bucket


def ann_lsh_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is the
    query's bucket or differs by one bit (multiprobe)."""
    query = [float(x) for x in query]
    planes = _hyperplanes(len(query), n_planes, seed)
    signs = planes @ np.asarray(query)
    qbucket = 0
    for j, s in enumerate(signs):
        if s >= 0:
            qbucket |= 1 << j
    probe_buckets = [qbucket] + [qbucket ^ (1 << j) for j in range(n_planes)]

    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = F.array(*[F.lit(x) for x in query])
    candidates = bucketed.filter(F.col("bucket").isin(probe_buckets))
    return (
        candidates.select("id", cosine(F.col("vec"), q).alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
    )


def cosine_self_join_topk(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Per-vector approximate k nearest neighbors: pairs restricted to a
    shared LSH bucket, ranked by exact cosine within the bucket join."""
    from pyspark.sql.window import Window

    planes_df = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
    )
    dim = len(planes_df.select("vec").first()["vec"])
    planes = _hyperplanes(dim, n_planes, seed)
    b = planes_df.withColumn("bucket", lsh_bucket(F.col("vec"), planes))
    lhs, rhs = b.alias("l"), b.alias("r")
    pairs = lhs.join(
        rhs,
        (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") != F.col("r.id")),
    ).select(
        F.col("l.id").alias("id"),
        F.col("r.id").alias("neighbor"),
        cosine(F.col("l.vec"), F.col("r.vec")).alias("score"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("neighbor"))
    return pairs.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
