"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — a broadcast join of the (small) query
set against all candidates; the dot product is a higher-order `zip_with` +
`aggregate` fold, entirely JVM-side. At 100 TB the query side is broadcast
and the candidate scan is embarrassingly parallel: no shuffle except the
final per-query top-k (tiny).

Scale path: random-hyperplane LSH — deterministic pseudo-hyperplanes from a
seeded hash (no stored model), bucket on the sign-bit signature, search only
the query's bucket. Trades recall for a candidate-set reduction of ~2^bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _dot(a: Column, b: Column) -> Column:
    """Sequential-order fold — bit-reproducible across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    df: DataFrame,
    query_ids: list[int] | Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, neighbor_id, rank, cosine).

    Deterministic: rank orders by rounded cosine desc then neighbor id —
    rounding makes the ordering stable across engines/float paths."""
    base = df.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))
    norm = F.sqrt(_dot(F.col("_v"), F.col("_v")))
    base = base.withColumn("_n", norm)
    if isinstance(query_ids, list):
        qfilter = F.col("_id").isin(query_ids)
    else:
        qfilter = query_ids
    q = base.filter(qfilter).select(
        F.col("_id").alias("query_id"), F.col("_v").alias("_qv"), F.col("_n").alias("_qn")
    )
    c = base.select(F.col("_id").alias("neighbor_id"), F.col("_v").alias("_cv"), F.col("_n").alias("_cn"))
    sims = (
        c.join(broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_signature(vec: Column, dims: int, planes: int = 8, seed: int = 7) -> Column:
    """Random-hyperplane signature without a stored model: plane p's
    component d is a deterministic +/-1 from xxhash64(seed, p, d). The sign
    of <v, plane> contributes bit p."""
    def plane_fn(p: int):
        return lambda x, i: x * (
            F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(2)) * 2 - 1
        ).cast("double")

    sig = F.lit(0)
    for p in range(planes):
        comp = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.lit(dims - 1)), plane_fn(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(comp > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def lsh_ann_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    planes: int = 6,
) -> DataFrame:
    """ANN top-k searching only the query's LSH bucket (recall < 1)."""
    base = df.select(
        F.col(id_col).alias("_id"),
        _as_double(F.col(vec_col)).alias("_v"),
        lsh_signature(_as_double(F.col(vec_col)), dims, planes).alias("_bucket"),
    ).withColumn("_n", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    q = base.filter(F.col("_id").isin(query_ids)).select(
        F.col("_id").alias("query_id"), F.col("_v").alias("_qv"), F.col("_n").alias("_qn"), "_bucket"
    )
    sims = (
        base.join(broadcast(q), ["_bucket"])
        .filter(F.col("_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("_id").alias("neighbor_id"),
            F.round(_dot(F.col("_qv"), F.col("_v")) / (F.col("_qn") * F.col("_n")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
