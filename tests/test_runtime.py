"""Runtime layer: metrics counters (observe), lineage stamping, and the
per-bucket checkpoint/resume protocol (north-rule resumability)."""

import pytest
from pyspark.sql import functions as F

from vector_spark.runtime import CheckpointedRun, PipelineMetrics, with_lineage
from vector_spark.runtime.checkpoint import BUCKET_COL
from vector_spark.sources import generate_pages


def test_metrics_counters(spark, tmp_path):
    df = spark.createDataFrame([(1, "ab"), (2, "cdef")], "id long, body string")
    m = PipelineMetrics()
    df = m.instrument(df, "source", bytes_col=F.length("body"))
    df.write.format("noop").mode("overwrite").save()
    got = m.collect()["source"]
    assert got["component_received_events_total"] == 2
    assert got["component_received_event_bytes_total"] == 6


def test_metrics_duplicate_component_rejected(spark):
    df = spark.range(1)
    m = PipelineMetrics()
    m.instrument(df, "x")
    with pytest.raises(ValueError):
        m.instrument(df, "x")


def test_lineage_columns(spark):
    out = with_lineage(spark.range(5), "pages_source")
    r = out.collect()[0]
    assert r["_source_id"] == "pages_source"
    assert r["_partition_id"] >= 0
    assert r["_ingest_ts"] is not None


def _transform(df):
    return df.withColumn("status_is_err", F.col("lang") == "de")


def test_checkpoint_full_run_then_noop(spark, tmp_path):
    pages = generate_pages(spark, 500, partitions=4)
    ck = CheckpointedRun(spark, str(tmp_path / "ckpt"), "run1", n_buckets=8)
    sink = str(tmp_path / "sink")
    n1 = ck.run(pages, _transform, sink)
    assert n1 == 8
    # second pass: everything committed -> no pending work
    assert ck.pending(pages).count() == 0
    assert spark.read.parquet(sink).count() == 500
    m = ck.metrics()
    assert m["component_sent_events_total"] == 500
    assert m["buckets_committed"] == 8


def test_checkpoint_resume_completes_partial_run(spark, tmp_path):
    """Simulate a crash after only some buckets were processed: restrict the
    first pass to half the buckets, then resume over the full input. Final
    sink must equal the one-shot result, with no duplicates."""
    pages = generate_pages(spark, 500, partitions=4)
    ck = CheckpointedRun(spark, str(tmp_path / "ckpt"), "run1", n_buckets=8)
    sink = str(tmp_path / "sink")

    # pass 1 "crashes" having seen only buckets 0-3
    partial = ck.pending(pages).filter(F.col(BUCKET_COL) < 4)
    ck.write_and_commit(_transform(partial), sink)
    committed_first = ck.committed()
    assert committed_first == {0, 1, 2, 3}
    n_first = spark.read.parquet(sink).count()
    assert 0 < n_first < 500

    # resume: pending is exactly the uncommitted buckets
    pend = ck.pending(pages)
    assert set(r[BUCKET_COL] for r in pend.select(BUCKET_COL).distinct().collect()) == {4, 5, 6, 7}
    ck.run(pages, _transform, sink)

    out = spark.read.parquet(sink)
    assert out.count() == 500
    assert out.select("url").distinct().count() == 500  # no duplicates
    assert ck.committed() == set(range(8))


def test_checkpoint_redo_is_idempotent(spark, tmp_path):
    """A bucket written but NOT committed (crash between write and commit)
    is redone; dynamic partition overwrite replaces its files — no dupes."""
    pages = generate_pages(spark, 300, partitions=4)
    ck = CheckpointedRun(spark, str(tmp_path / "ckpt"), "run1", n_buckets=4)
    sink = str(tmp_path / "sink")

    # write bucket 0's output without committing (simulated crash)
    b0 = _transform(ck.bucket(pages).filter(F.col(BUCKET_COL) == 0))
    (b0.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
       .partitionBy(BUCKET_COL).parquet(sink))
    assert ck.committed() == set()

    # full resume run reprocesses bucket 0 (overwriting) + the rest
    ck.run(pages, _transform, sink)
    out = spark.read.parquet(sink)
    assert out.count() == 300
    assert out.select("url").distinct().count() == 300


def test_checkpoint_commit_never_rescans_committed_buckets(spark, tmp_path):
    """The commit job must read ONLY this pass's bucket partitions. Proof:
    corrupt every data file of the first pass's committed buckets — a full
    sink rescan (the old O(all-data-ever-written) behavior) would crash on
    the corrupt parquet; the resume pass must succeed untouched."""
    pages = generate_pages(spark, 400, partitions=4)
    ck = CheckpointedRun(spark, str(tmp_path / "ckpt"), "run1", n_buckets=8)
    sink = str(tmp_path / "sink")

    partial = ck.pending(pages).filter(F.col(BUCKET_COL) < 4)
    ck.write_and_commit(_transform(partial), sink)
    assert ck.committed() == {0, 1, 2, 3}

    import pathlib

    for f in pathlib.Path(sink).glob(f"{BUCKET_COL}=[0-3]/*.parquet"):
        f.write_bytes(b"not parquet at all")

    n = ck.run(pages, _transform, sink)  # must not touch buckets 0-3
    assert n == 4
    assert ck.committed() == set(range(8))


def test_checkpoint_zero_row_bucket_commits(spark, tmp_path):
    """A pending bucket whose transform emits zero rows commits explicitly
    with events_sent=0 (instead of being re-processed forever), and stale
    files for such a bucket from a crashed earlier pass are cleared."""
    pages = generate_pages(spark, 300, partitions=4)
    ck = CheckpointedRun(spark, str(tmp_path / "ckpt"), "run1", n_buckets=4)
    sink = str(tmp_path / "sink")

    # crashed earlier pass left stale rows in (uncommitted) bucket 2
    stale = _transform(ck.bucket(pages).filter(F.col(BUCKET_COL) == 2))
    stale.write.mode("append").partitionBy(BUCKET_COL).parquet(sink)
    assert spark.read.parquet(sink).count() > 0

    def drop_bucket2(df):  # this pass's transform emits nothing for bucket 2
        return _transform(df).filter(F.col(BUCKET_COL) != 2)

    n = ck.run(pages, drop_bucket2, sink)
    assert n == 4  # all four buckets committed, incl. the empty one
    assert ck.committed() == {0, 1, 2, 3}
    out = spark.read.parquet(sink)
    assert out.filter(F.col(BUCKET_COL) == 2).count() == 0  # stale cleared
    assert ck.pending(pages).count() == 0  # nothing re-processed on resume
    per_bucket = {
        r["bucket"]: r["events_sent"]
        for r in spark.read.parquet(f"{tmp_path}/ckpt/run=run1").collect()
    }
    assert per_bucket[2] == 0


def test_checkpoint_runs_isolated_by_run_id(spark, tmp_path):
    pages = generate_pages(spark, 100, partitions=2)
    ck1 = CheckpointedRun(spark, str(tmp_path / "ckpt"), "run1", n_buckets=4)
    ck2 = CheckpointedRun(spark, str(tmp_path / "ckpt"), "run2", n_buckets=4)
    ck1.run(pages, _transform, str(tmp_path / "s1"))
    assert ck1.committed() == {0, 1, 2, 3}
    assert ck2.committed() == set()
