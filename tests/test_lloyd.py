"""Deterministic Lloyd centroid refinement (similarity.py::lloyd_centroids).

VERDICT_r3 item 7: lowest-id seeds can all land in one dense region and the
resulting cluster imbalance is what bounds per-task pairwise work in
semantic_dedup / probe fan-in in IVF. One DECIMAL-exact Lloyd round fixes
balance without losing oracle replay."""

from __future__ import annotations

import math

from vector_spark.datapipe.similarity import lloyd_centroids, semantic_dedup


def _skewed_fixture(spark):
    """Zipf-style skew: the 4 lowest ids (the seeds) sit in ONE dense
    region; the remaining 96 vectors spread over four well-separated
    directions. Seed clustering assigns almost everything to one or two
    seed cells; a Lloyd round pulls centroids apart."""
    rows = []
    for i in range(4):  # seeds: tight bundle around (1, 0.5)
        rows.append((i, [1.0, 0.5 + i * 0.001]))
    dirs = [(1.0, 0.0), (0.0, 1.0), (-1.0, 0.2), (0.6, -1.0)]
    for j in range(96):
        dx, dy = dirs[j % 4]
        # deterministic jitter, distinct per row
        rows.append((4 + j, [dx + 0.01 * (j % 7), dy + 0.01 * (j % 5)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _balance(df, rounds):
    out = semantic_dedup(df, threshold=0.999, n_centroids=4, lloyd_rounds=rounds)
    sizes = [r["count"] for r in out.groupBy("cluster").count().collect()]
    return max(sizes) / (sum(sizes) / len(sizes)), sizes


def test_lloyd_improves_balance(spark):
    df = _skewed_fixture(spark)
    b0, sizes0 = _balance(df, rounds=0)
    b1, sizes1 = _balance(df, rounds=1)
    assert b1 <= b0, (sizes0, sizes1)
    # done-criterion bound: max cluster <= 2x mean after one round
    assert b1 <= 2.0, sizes1


def test_lloyd_centroids_deterministic_across_partitioning(spark):
    df = _skewed_fixture(spark)

    def cents(d):
        from pyspark.sql import functions as F
        from vector_spark.datapipe.similarity import _as_double, _dot

        base = d.select(
            F.col("vec_id").alias("_id"), _as_double(F.col("embedding")).alias("_v")
        ).withColumn("_n", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
        return sorted(
            (r._cid, tuple(r._cv)) for r in lloyd_centroids(base, 4, rounds=1).collect()
        )

    a = cents(df.repartition(1))
    b = cents(df.repartition(16))
    assert a == b  # bit-identical: DECIMAL-exact means are order-free


def test_empty_cluster_keeps_seed(spark):
    """Two identical seed vectors: the higher-id seed captures nothing in
    round 0 (ties break to the lower cid) and must retain its seed vector
    rather than produce a NaN centroid."""
    from pyspark.sql import functions as F
    from vector_spark.datapipe.similarity import _as_double, _dot

    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.9, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.select(
        F.col("vec_id").alias("_id"), _as_double(F.col("embedding")).alias("_v")
    ).withColumn("_n", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    got = {r._cid: (tuple(r._cv), r._cn) for r in lloyd_centroids(base, 2, rounds=1).collect()}
    assert got[1][0] == (1.0, 0.0)  # kept its seed
    assert not math.isnan(got[1][1])
    # cluster 0 captured ALL rows (id 2 ties at cos 0 -> lowest cid):
    # centroid = decimal-exact mean of the four vectors
    assert got[0][0] == (2.9 / 4, 1.1 / 4)


def test_embedding_outliers_gate(spark):
    """A vector far off the cluster manifold gets keep=false; on-manifold
    vectors keep=true; every input row comes back exactly once and the
    assignment matches semantic_dedup's cells for the same centroids."""
    from vector_spark.datapipe import embedding_outliers

    rows = [(0, [1.0, 0.0, 0.0]), (1, [-0.02, 1.0, 0.0])]  # seeds: x and y
    rows += [(i, [1.0 + 0.01 * i, 0.0, 0.0]) for i in range(2, 7)]
    rows.append((98, [0.01, 0.98, 0.0]))
    rows.append((99, [-0.57, -0.57, 0.59]))  # off both prototypes
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in embedding_outliers(df, n_centroids=2, min_cos=0.5).collect()}
    assert len(out) == len(rows)
    assert all(out[i].keep for i in range(7))
    assert out[98].keep
    assert not out[99].keep and out[99].cos_centroid < 0.5
