"""Sink compaction: the small-files maintenance pass (runtime/compact.py).
Covers plan selection, row-exact rewrite, idempotence, crash leftovers, and
the no-op path."""

import pyspark.sql.functions as F
import pytest

from vector_spark.runtime import compact_sink, compaction_plan


def _fragmented_sink(spark, path, rows=400, files_per_part=8):
    """Write a 2-level partitioned sink where every partition holds
    `files_per_part` tiny files (simulating N resumed/streamed passes)."""
    df = spark.range(rows).select(
        F.col("id"),
        F.md5(F.col("id").cast("string")).alias("payload"),
        (F.col("id") % 2).alias("day"),
        (F.col("id") % 4).alias("bucket"),
    )
    (
        df.repartition(files_per_part, "id")
        .write.mode("overwrite")
        .partitionBy("day", "bucket")
        .parquet(path)
    )
    return df


def _n_files(spark, path):
    return {p.rel_path: p.n_files for p in compaction_plan(spark, path)}


def test_plan_lists_leaf_partitions(spark, tmp_path):
    sink = str(tmp_path / "sink")
    _fragmented_sink(spark, sink)
    plans = compaction_plan(spark, sink)
    assert {p.rel_path for p in plans} == {
        f"day={d}/bucket={b}" for d in (0, 1) for b in (0, 1, 2, 3) if (b - d) % 2 == 0
    }
    for p in plans:
        assert p.n_files == 8
        assert p.target_files == 1  # tiny bytes << 128 MiB
        assert p.fragmented


def test_compact_rewrites_rows_exactly(spark, tmp_path):
    sink = str(tmp_path / "sink")
    _fragmented_sink(spark, sink)
    before = spark.read.parquet(sink).orderBy("id").collect()

    report = compact_sink(spark, sink)
    assert report["partitions_compacted"] == 4
    assert report["files_before"] == 32
    assert report["files_after"] == 4  # binpack target 1 per partition

    after_df = spark.read.parquet(sink)
    assert after_df.orderBy("id").collect() == before
    assert all(n == 1 for n in _n_files(spark, sink).values())


def test_compact_is_idempotent_noop_when_not_fragmented(spark, tmp_path):
    sink = str(tmp_path / "sink")
    _fragmented_sink(spark, sink)
    compact_sink(spark, sink)
    report2 = compact_sink(spark, sink)
    assert report2["partitions_compacted"] == 0
    assert report2["bytes_rewritten"] == 0
    assert all(n == 1 for n in _n_files(spark, sink).values())


def test_compact_clears_crashed_staging(spark, tmp_path):
    sink = str(tmp_path / "sink")
    _fragmented_sink(spark, sink)
    # simulate a crash mid-pass: stale staged data that must NOT leak into
    # the sink or double-count the verify step
    stale = str(tmp_path / "sink" / "_compacting" / "day=0" / "bucket=0")
    spark.range(999).write.parquet(stale)
    report = compact_sink(spark, sink)
    assert report["partitions_compacted"] == 4
    assert spark.read.parquet(sink).count() == 400


def test_compact_missing_dir_is_noop(spark, tmp_path):
    report = compact_sink(spark, str(tmp_path / "never_written"))
    assert report == {
        "partitions_compacted": 0,
        "files_before": 0,
        "files_after": 0,
        "bytes_rewritten": 0,
    }


def test_compact_respects_byte_target(spark, tmp_path):
    """With a tiny target_file_bytes the binpack target is >1 file per
    partition and the salt must bound files at that target."""
    sink = str(tmp_path / "sink")
    _fragmented_sink(spark, sink, rows=2000, files_per_part=16)
    plans = compaction_plan(spark, sink, target_file_bytes=8 * 1024)
    targets = {p.rel_path: p.target_files for p in plans}
    assert all(1 <= t < 16 for t in targets.values())
    before = spark.read.parquet(sink).orderBy("id").collect()
    compact_sink(spark, sink, target_file_bytes=8 * 1024)
    after = _n_files(spark, sink)
    for rel, n in after.items():
        assert n <= targets[rel]
    assert spark.read.parquet(sink).orderBy("id").collect() == before


def test_compact_mixed_fragmentation_only_touches_fragmented(spark, tmp_path):
    """Partitions already at target are never rewritten (their file set is
    untouched), fragmented ones are."""
    sink = str(tmp_path / "sink")
    df = spark.range(200).select(
        F.col("id"), (F.col("id") % 2).alias("day")
    )
    df.filter("day = 0").coalesce(1).write.partitionBy("day").parquet(
        sink, mode="append"
    )
    df.filter("day = 1").repartition(6, "id").write.partitionBy("day").parquet(
        sink, mode="append"
    )
    names_before = {
        p.rel_path: p.n_files for p in compaction_plan(spark, sink)
    }
    assert names_before["day=0"] == 1 and names_before["day=1"] == 6
    report = compact_sink(spark, sink)
    assert report["partitions_compacted"] == 1
    assert report["files_before"] == 6
    got = _n_files(spark, sink)
    assert got["day=0"] == 1 and got["day=1"] == 1
    assert spark.read.parquet(sink).count() == 200


def test_compact_underscore_bucket_layout(spark, tmp_path):
    """The checkpoint sink's `_bucket=N` dirs ARE partition dirs (Spark's
    own listing rule: '_'-prefixed names are hidden unless they contain
    '='); compaction must see them."""
    sink = str(tmp_path / "sink")
    df = spark.range(300).select(F.col("id"), (F.col("id") % 4).alias("_bucket"))
    df.repartition(5, "id").write.partitionBy("_bucket").parquet(sink)
    plans = compaction_plan(spark, sink)
    assert {p.rel_path for p in plans} == {f"_bucket={b}" for b in range(4)}
    report = compact_sink(spark, sink)
    assert report["partitions_compacted"] == 4
    assert spark.read.parquet(sink).count() == 300
    assert all(n == 1 for n in _n_files(spark, sink).values())


def test_compact_recovers_mid_swap_crash(spark, tmp_path):
    """Crash BETWEEN delete(live) and rename(staged): the staged copy is
    the only (verified) one left. The next pass must rename it into place
    — not delete it with the staging debris."""
    sink = str(tmp_path / "sink")
    _fragmented_sink(spark, sink)
    before = spark.read.parquet(sink).orderBy("id").collect()

    # simulate the post-verify crash state for one partition: move its
    # live dir's content into staging and remove the live dir
    import shutil

    rel = "day=0/bucket=0"
    staged = tmp_path / "sink" / "_compacting" / rel
    staged.parent.mkdir(parents=True)
    shutil.move(str(tmp_path / "sink" / rel), str(staged))

    report = compact_sink(spark, sink)
    after = spark.read.parquet(sink).orderBy("id").collect()
    assert after == before  # nothing lost, nothing duplicated
    assert report["partitions_compacted"] >= 3  # the other fragmented dirs
    assert all(n == 1 for n in _n_files(spark, sink).values())


def test_compact_escaped_and_null_partition_values(spark, tmp_path):
    """Partition values Spark escapes in dir names ('a b' -> day=a%20b) and
    nulls (day=__HIVE_DEFAULT_PARTITION__) must round-trip through the
    plan -> rewrite-join -> verify -> swap cycle. The rewrite join used to
    compare the raw dir string against the live value, so these rows were
    dropped and every pass failed verify after rewriting everything."""
    sink = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(i, "a b" if i % 3 == 0 else (None if i % 3 == 1 else "plain"))
         for i in range(60)],
        "id int, day string",
    )
    for _ in range(4):  # 4 resumed passes' worth of small files
        df.repartition(2, "id").write.mode("append").partitionBy("day").parquet(sink)
    before = sorted((r.id, r.day) for r in spark.read.parquet(sink).collect())

    report = compact_sink(spark, sink)
    assert report["partitions_compacted"] == 3
    after = sorted((r.id, r.day) for r in spark.read.parquet(sink).collect())
    assert after == before
    assert all(n == 1 for n in _n_files(spark, sink).values())
