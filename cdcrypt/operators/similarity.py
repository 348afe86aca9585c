"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — the small-side (queries) is broadcast,
the dot product is a pure-Column ``F.aggregate``/``zip_with`` reduction
(JVM codegen, no Python), and top-k is a window over query_id (rank-limit
pushdown makes it map-side partial).

Scale path: sign-LSH (random hyperplanes) bucketed ANN — each vector hashes
to a small bit bucket; candidates meet only within a bucket, cutting the
cross product by ~2^bits. Hyperplanes are seeded numpy, shipped as literal
arrays (driver-side constants, no side files).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_sim(a, b):
    return _dot(a, b) / F.greatest(_norm(a) * _norm(b), F.lit(1e-12))


def cosine_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k neighbors per query (brute force; queries broadcast).

    Output: (query_id, neighbor_id, rank, sim). ``sim`` rounded so the
    DuckDB oracle's float summation-order differences wash out; ties broken
    by neighbor id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    b = base.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("bv")
    )
    sims = (
        F.broadcast(q)
        .crossJoin(b)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_sim(
                    F.transform("qv", lambda x: x.cast("double")),
                    F.transform("bv", lambda x: x.cast("double")),
                ),
                round_digits,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def lsh_planes(dim: int, n_bits: int = 12, seed: int = 42) -> list[list[float]]:
    """Seeded random hyperplanes (deterministic; safe to inline as literals)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).round(6).tolist()


def signature_bits(vec_col, planes: list[list[float]]):
    """Sign-LSH bucket id: bit i = (vec . plane_i) >= 0."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(F.transform(vec_col, lambda x: x.cast("double")), plane) >= 0,
                     F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseXOR(F.shiftleft(bit, i))
    return sig


def ann_lsh_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    At 100 TB: base is hashed once (can be persisted bucketed-by signature),
    the join is an equi-join on the signature — shuffle proportional to
    candidates, not |base| x |queries|.
    """
    dim = len(base.select(vec_col).first()[0])
    planes = lsh_planes(dim, n_bits, seed)
    bsig = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("bv"),
        signature_bits(F.col(vec_col), planes).alias("bucket"),
    )
    qsig = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        signature_bits(F.col(vec_col), planes).alias("bucket"),
    )
    sims = (
        qsig.join(bsig, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(
                cosine_sim(
                    F.transform("qv", lambda x: x.cast("double")),
                    F.transform("bv", lambda x: x.cast("double")),
                ), 4,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
