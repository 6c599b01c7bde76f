"""Sink layer — partitioned table writes with the 10^12-row layout.

Reference sink machinery (SURVEY §2.5): events are keyed by a Partitioner
(template like ".../service/{{svc}}/year/%Y/month/%m/...") and batched per
key. Spark's identical capability is `write.partitionBy`; at Common-Crawl
scale the north-rule layout is the Iceberg spec `(days(warc_ts),
bucket(url))` — time pruning for window queries + uniform url buckets for
resume/compaction.

In-sandbox there is no Iceberg runtime jar, so `write_partitioned` emits
the same layout as hive-style parquet partitions (`day=.../bucket=...`);
`iceberg_available()` gates the real `writeTo(...).partitionedBy(
days(warc_ts), bucket(N, url))` path, which is the only line that changes
on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Schema")
        return True
    except Exception:
        return False


def write_partitioned(
    df: DataFrame,
    path_or_table: str,
    ts_col: str = "warc_ts",
    bucket_col: str = "url",
    n_buckets: int = 64,
    extra_partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write with the (days(ts), bucket(key)) layout.

    Iceberg (when the runtime is present): a real partition spec — hidden
    partitioning, no helper columns in the data.
    Parquet fallback: explicit `day`/`bucket` hive partition columns with
    dynamic partition overwrite (same pruning, same idempotent-redo
    property the checkpoint layer relies on).
    """
    spark = df.sparkSession
    if iceberg_available(spark):
        writer = df.writeTo(path_or_table).partitionedBy(
            F.days(F.col(ts_col)), F.bucket(n_buckets, F.col(bucket_col)),
            *[F.col(c) for c in (extra_partition_cols or [])],
        )
        (writer.createOrReplace() if mode == "overwrite" else writer.append())
        return
    out = df.withColumn("day", F.to_date(F.col(ts_col))).withColumn(
        "bucket", F.pmod(F.xxhash64(bucket_col), F.lit(n_buckets)).cast("int")
    )
    (
        out.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day", "bucket", *(extra_partition_cols or []))
        .parquet(path_or_table)
    )


def read_partitioned(spark: SparkSession, path_or_table: str) -> DataFrame:
    if iceberg_available(spark):
        return spark.read.table(path_or_table)
    return spark.read.parquet(path_or_table)
