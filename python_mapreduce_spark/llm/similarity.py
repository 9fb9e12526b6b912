"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — exact; broadcast the query set against the
    corpus so the corpus never shuffles. Baseline and recall oracle.
  * random-hyperplane LSH buckets — the scale path: one cheap signature
    per vector, candidates only within matching buckets. Signatures come
    from a seeded numpy matrix inside an Arrow pandas UDF (vectorized
    matmul beats 1024 per-element JVM hash expressions).

Cosine itself is a JVM higher-order-function expression: zip_with product
+ sequential aggregate in double — deterministic, engine-portable
accumulation order (matches DuckDB's list_dot_product fold for the
oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from python_mapreduce_spark.functions.scalar import dround


def _fold_sum(arr: Column) -> Column:
    """Sequential left fold in double — fixed accumulation order."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm2(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 5,
    query_id: str = "query_id",
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast queries x corpus, then a
    per-query window keeps k.

    The corpus side never moves (queries broadcast to it); the only
    shuffle is the final per-query top-k, pre-limited per partition by
    WindowGroupLimit. At 100 TB of corpus this is one scan.
    """
    q = queries.select(F.col(id_col).alias(query_id), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col(query_id) != F.col("neighbor_id"))
        .select(
            query_id,
            "neighbor_id",
            dround(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, F.col("rn").cast("long").alias("rn"), "neighbor_id", "cos")
    )


def hyperplane_lsh_buckets(
    emb: DataFrame, id_col: str, vec_col: str, *, planes: int = 12, dim: int = 64, seed: int = 42
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector.

    Bucket = sign bits of (V @ P) for a seed-fixed Gaussian plane matrix
    P, computed batch-at-a-time with numpy through an Arrow pandas UDF.
    Deterministic across runs and parallelism. Vectors sharing a bucket
    are cosine-close with high probability; ANN search compares only
    within buckets (plus optional multi-probe neighbors).
    """
    plane_matrix = np.random.RandomState(seed).randn(dim, planes)

    @F.pandas_udf("long")
    def bucket_of(vecs: pd.Series) -> pd.Series:
        V = np.vstack(vecs.values).astype(np.float64)
        bits = (V @ plane_matrix) > 0
        vals = (bits * (1 << np.arange(planes, dtype=np.int64))).sum(axis=1)
        return pd.Series(vals)

    return emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), bucket_of(vec_col).alias("bucket")
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 5,
    planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    query_id: str = "query_id",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the query's
    LSH bucket. Recall is tunable via ``planes`` (fewer planes = bigger
    buckets = higher recall, more compute); multi-probe extension is the
    production knob."""
    cb = hyperplane_lsh_buckets(corpus, id_col, vec_col, planes=planes, dim=dim, seed=seed)
    qb = hyperplane_lsh_buckets(queries, id_col, vec_col, planes=planes, dim=dim, seed=seed)
    qb = qb.select(
        F.col("id").alias(query_id), F.col("vec").alias("q_vec"), F.col("bucket")
    )
    scored = (
        cb.join(F.broadcast(qb), on="bucket")
        .filter(F.col(query_id) != F.col("id"))
        .select(
            query_id,
            F.col("id").alias("neighbor_id"),
            dround(cosine(F.col("q_vec"), F.col("vec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, F.col("rn").cast("long").alias("rn"), "neighbor_id", "cos")
    )
