"""Approximate-nearest-neighbor search over embedding columns.

Beyond-the-reference operator set for training-data pipelines (task brief):
- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  O(n·q) but every term is JVM columnar (zip_with/aggregate), so it
  parallelizes perfectly; right-sized when the query set is small enough to
  broadcast.
- ``lsh_topk``: random-hyperplane LSH buckets (sign bits of h random
  projections) shrink the candidate set; cosine is evaluated only within
  matching buckets — the 100 TB path. Multi-probe via ``tables``
  independent hash tables.
- ``embedding_near_dup_pairs``: all pairs with cosine >= threshold via the
  same LSH bucketing — embedding-cosine near-dup dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim_col(a, b):
    """Cosine similarity between two array<float/double> columns (JVM)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine; broadcast the queries.

    Deterministic tiebreak (sim desc, corpus id asc) so results are stable
    and oracle-comparable. Excludes self-matches when ids collide.
    """
    q_id_col = q_id_col or id_col
    q = queries.select(
        F.col(q_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_sim_col(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def make_hyperplane_udf(dim: int, bits: int, seed: int):
    """pandas UDF: embedding -> int64 sign-bit bucket (one hash table)."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(bits, dim))

    def batch(vecs: pd.Series) -> pd.Series:
        out = np.zeros(len(vecs), dtype=np.int64)
        for i, v in enumerate(vecs):
            if v is None:
                continue
            signs = planes @ np.asarray(v, dtype=np.float64) > 0
            acc = 0
            for b in signs:
                acc = (acc << 1) | int(b)
            out[i] = acc
        return pd.Series(out)

    return F.pandas_udf(batch, LongType())


def lsh_buckets(
    df: DataFrame, dim: int, id_col: str = "vec_id", vec_col: str = "embedding",
    bits: int = 12, tables: int = 4, seed: int = 42,
) -> DataFrame:
    """(id, table_id, bucket) — one row per hash table."""
    out = None
    for t in range(tables):
        udf = make_hyperplane_udf(dim, bits, seed + 1000 * t)
        part = df.select(
            F.col(id_col).alias("id"),
            F.lit(t).alias("table_id"),
            udf(F.col(vec_col).cast("array<double>")).alias("bucket"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def embedding_near_dup_pairs(
    df: DataFrame, dim: int, threshold: float = 0.9,
    id_col: str = "vec_id", vec_col: str = "embedding",
    bits: int = 12, tables: int = 4, seed: int = 42,
) -> DataFrame:
    """All pairs with cosine >= threshold among LSH-bucket collisions."""
    buckets = lsh_buckets(df, dim, id_col, vec_col, bits, tables, seed)
    key = ["table_id", "bucket"]
    cands = (
        buckets.withColumnRenamed("id", "id_1")
        .join(buckets.withColumnRenamed("id", "id_2"), key)
        .filter(F.col("id_1") > F.col("id_2"))
        .select("id_1", "id_2")
        .dropDuplicates(["id_1", "id_2"])
    )
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("_v"))
    return (
        cands.join(vecs.withColumnRenamed("id", "id_1").withColumnRenamed("_v", "_v1"), "id_1")
        .join(vecs.withColumnRenamed("id", "id_2").withColumnRenamed("_v", "_v2"), "id_2")
        .withColumn("cosine", cosine_sim_col(F.col("_v1"), F.col("_v2")))
        .filter(F.col("cosine") >= threshold)
        .select("id_1", "id_2", "cosine")
    )


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    bits: int = 8, tables: int = 8, seed: int = 42,
) -> DataFrame:
    """Approximate top-k: union of bucket collisions across tables, then
    exact cosine + window top-k within candidates."""
    cb = lsh_buckets(corpus, dim, id_col, vec_col, bits, tables, seed)
    qb = lsh_buckets(queries, dim, id_col, vec_col, bits, tables, seed)
    key = ["table_id", "bucket"]
    cands = (
        qb.withColumnRenamed("id", "query_id")
        .join(cb.withColumnRenamed("id", "neighbor_id"), key)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("_cv"))
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("_qv"))
    scored = (
        cands.join(cv, "neighbor_id").join(F.broadcast(qv), "query_id")
        .withColumn("cosine", cosine_sim_col(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
