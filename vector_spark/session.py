"""SparkSession factory tuned for the pipeline.

Defaults are sized for the sandbox (local[N], single JVM) but every knob is
the one we would set on a 1000-executor cluster too: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), Arrow on (all our
Python UDFs are pandas/Arrow-vectorized — no per-row Python anywhere),
shuffle partitions sized to cores locally and to 2-3x total cores on a real
cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vector_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: match cores; on a real cluster this should be
        # 2-3x total executor cores (or left to AQE coalescing from a
        # high initial number).
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if n in ("*", "") else int(n)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local-mode scan parallelism: testdata/bench parquet is a few hundred
        # MB, which the 128m default packs into ~3 splits, idling the other
        # cores. 16m keeps all of local[32] busy. On a real cluster at 100 TB
        # leave this at the 128m default (set SPARK_GRAFT_MAX_PARTITION_BYTES).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"),
        )
        # real-web HTML bytes contain invalid UTF-8; decode() must replace,
        # not raise (runtime-settable; parse_pages also sets it defensively)
        .config("spark.sql.legacy.codingErrorAction", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def ensure_parallelism(df, min_parts: int | None = None):
    """Repartition an under-partitioned DataFrame so compute-heavy stages
    use the whole cluster. A single small parquet file (one row group)
    yields ONE scan split no matter what maxPartitionBytes says — any
    per-row-expensive stage downstream (minhash, regex, hashing) then runs
    single-threaded. One cheap round-robin shuffle fixes it. No-op when the
    input is already parallel (the 100 TB case: thousands of splits).

    Split estimation uses inputFiles() + local file sizes — file-index
    metadata only, no Catalyst->RDD plan conversion (df.rdd forced a full
    physical planning pass per call). Remote files (s3/hdfs) count as one
    split each, which at production scale means thousands of files ->
    no-op without any filesystem stat calls; non-file sources fall back
    to the RDD partition count."""
    if df.isStreaming:
        # micro-batch planning re-splits the source per trigger; the
        # batch-side split estimate (inputFiles/rdd) is illegal on a
        # streaming frame, so stateless ops composing onto streams pass
        # through unchanged
        return df
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    floor = max(2, target // 2)
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        if len(files) >= floor:
            return df
        mpb_raw = df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128m")
        units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "b": 1}
        mpb = int(mpb_raw[:-1]) * units[mpb_raw[-1].lower()] if mpb_raw[-1].lower() in units else int(mpb_raw)
        est = 0
        for f in files:
            local = f[5:] if f.startswith("file:") else f
            try:
                size = os.path.getsize(local)
            except OSError:
                size = 0
            est += max(1, -(-size // mpb))
        splits = est
    else:
        splits = df.rdd.getNumPartitions()
    if splits >= floor:
        return df
    return df.repartition(target)
