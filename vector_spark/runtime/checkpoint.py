"""Resumable per-partition checkpointing — the Spark-native analogue of
Vector's source checkpointer + end-to-end acknowledgements.

Reference: the file source persists (fingerprint, position) per file and
resumes from it (/root/reference/lib/file-source/src/checkpointer.rs:33-150);
delivery is acknowledged back from sink to source before a checkpoint
advances (lib/vector-core/src/event/mod.rs:5-8, EventFinalizers).

Spark-first protocol (SURVEY.md §7.3):
  * The unit of work is a deterministic url-hash BUCKET
    (pmod(xxhash64(url), n_buckets)) — stable across restarts and
    cluster sizes, unlike physical partition ids.
  * Output lands in sink_dir/_bucket=<b>/ — each pass clears its pending
    buckets' dirs (uncommitted ⇒ anything there is garbage from a crashed
    pass) and rewrites them, so a crash between write and commit is safe
    (idempotent redo), including buckets whose transform emits zero rows.
  * After the write action succeeds, one commit row per bucket — with
    event/byte counters (the "ack") — is appended to the checkpoint table
    checkpoint_dir/run=<run_id>/. A bucket present there is never
    re-processed.
  * resume() = filter the input to uncommitted buckets and repeat. The
    counters double as the lineage/metrics record per unit of work.

At 10^12 rows the checkpoint table is n_buckets rows — trivially small —
while the protected work is arbitrarily large; bucket count trades restart
granularity against per-bucket file sizes (days(warc_ts) x bucket(url) in
the Iceberg spec).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

BUCKET_COL = "_bucket"

_CKPT_SCHEMA = (
    "bucket int, events_sent long, bytes_sent long, committed_at_us long"
)


@dataclass
class CheckpointedRun:
    spark: SparkSession
    checkpoint_dir: str
    run_id: str
    n_buckets: int = 64
    key_col: str = "url"

    @property
    def _ckpt_path(self) -> str:
        return f"{self.checkpoint_dir}/run={self.run_id}"

    def bucket(self, df: DataFrame) -> DataFrame:
        """Stamp the deterministic work-unit bucket."""
        return df.withColumn(
            BUCKET_COL,
            F.pmod(F.xxhash64(self.key_col), F.lit(self.n_buckets)).cast("int"),
        )

    def committed(self) -> set[int]:
        # Probe existence via the Hadoop FS instead of letting read.parquet
        # raise AnalysisException on the first pass: the raise also fires
        # Spark's ExecutionListenerBus (the Observation metrics listener),
        # spraying ERROR stack traces on a perfectly normal fresh run.
        fs, Path = self._hadoop_fs(self._ckpt_path)
        if not fs.exists(Path(self._ckpt_path)):
            return set()
        try:
            rows = self.spark.read.schema(_CKPT_SCHEMA).parquet(self._ckpt_path).select("bucket").collect()
        except AnalysisException:  # deleted between probe and read
            return set()
        return {r.bucket for r in rows}

    def pending(self, df: DataFrame) -> DataFrame:
        """Input restricted to uncommitted buckets (bucket column stamped).
        The committed set is <= n_buckets ints — a literal IN filter that
        Catalyst pushes into the scan."""
        done = self.committed()
        out = self.bucket(df)
        if not done:
            return out
        return out.filter(~F.col(BUCKET_COL).isin(*done))

    def _hadoop_fs(self, path: str):
        jvm = self.spark.sparkContext._jvm
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        return hpath.getFileSystem(conf), jvm.org.apache.hadoop.fs.Path

    def write_and_commit(
        self,
        out: DataFrame,
        sink_dir: str,
        bytes_col: str | None = None,
        buckets: set[int] | None = None,
    ) -> int:
        """Write `out` (must carry _bucket) into per-bucket partition dirs,
        then commit per-bucket counter rows — including explicit
        events_sent=0 rows for pending buckets whose transform emitted
        nothing (so they are never re-processed on resume). Returns the
        number of buckets committed.

        `buckets` is the set of bucket ids this pass is responsible for
        (run() passes the pending set — no extra job); if omitted it is
        derived from `out` with one tiny distinct job.

        Crash-safety: the pending buckets' partition dirs are DELETED up
        front (they are uncommitted, so any files there are garbage from a
        crashed earlier pass — dynamic overwrite alone would leave stale
        files for buckets that now emit zero rows), then written fresh. The
        commit counters are read back from ONLY this pass's bucket dirs
        (source of truth = what the sink holds, the ack semantics) — a
        resume pass never rescans previously committed output, so commit
        cost is O(this pass's data), not O(all data ever written)."""
        if buckets is None:
            buckets = {
                r[0] for r in out.select(BUCKET_COL).distinct().collect()
            }
        todo = sorted(set(buckets) - self.committed())
        if not todo:
            return 0
        fs, HPath = self._hadoop_fs(sink_dir)
        for b in todo:
            p = HPath(f"{sink_dir}/{BUCKET_COL}={b}")
            if fs.exists(p):
                fs.delete(p, True)
        # co-locate each bucket in one task before the partitioned write:
        # without this every task writes a file into every bucket dir
        # (tasks x buckets small files — at 10^12 rows a compaction
        # nightmare); with it, one file per bucket per pass
        (
            out.filter(F.col(BUCKET_COL).isin(*todo))
            .repartition(len(todo), F.col(BUCKET_COL))
            .write.mode("append")
            .partitionBy(BUCKET_COL)
            .parquet(sink_dir)
        )
        written_dirs = [
            b for b in todo if fs.exists(HPath(f"{sink_dir}/{BUCKET_COL}={b}"))
        ]
        byte_expr = (
            F.sum(F.col(bytes_col)).cast("long") if bytes_col
            else F.lit(None).cast("long")
        )
        now_us = int(time.time() * 1_000_000)
        rows = []
        if written_dirs:
            written = self.spark.read.option("basePath", sink_dir).parquet(
                *[f"{sink_dir}/{BUCKET_COL}={b}" for b in written_dirs]
            )
            rows = (
                written.groupBy(F.col(BUCKET_COL).cast("int").alias("bucket"))
                .agg(
                    F.count(F.lit(1)).alias("events_sent"),
                    byte_expr.alias("bytes_sent"),
                )
                .collect()  # <= n_buckets rows — the checkpoint table is tiny by design
            )
        seen = {r["bucket"] for r in rows}
        stats = [
            (r["bucket"], r["events_sent"], r["bytes_sent"], now_us) for r in rows
        ] + [
            (b, 0, 0 if bytes_col else None, now_us)
            for b in todo
            if b not in seen  # zero-row buckets commit explicitly
        ]
        (
            self.spark.createDataFrame(stats, _CKPT_SCHEMA)
            .coalesce(1)
            .write.mode("append")
            .parquet(self._ckpt_path)
        )
        return len(stats)

    def run(
        self,
        df: DataFrame,
        transform,
        sink_dir: str,
        bytes_col: str | None = None,
    ) -> int:
        """One resumable pass: transform(pending input) -> sink -> commit.
        `transform` must preserve the _bucket column. Returns buckets
        committed this pass (0 = nothing left; the run is complete)."""
        pend = self.pending(df)
        out = transform(pend)
        if BUCKET_COL not in out.columns:
            raise ValueError(f"transform must preserve {BUCKET_COL}")
        pending_buckets = set(range(self.n_buckets)) - self.committed()
        return self.write_and_commit(
            out, sink_dir, bytes_col=bytes_col, buckets=pending_buckets
        )

    def metrics(self) -> dict[str, int]:
        """Aggregated counters across committed buckets — the
        component_sent_{events,event_bytes}_total analogue per run."""
        try:
            df = self.spark.read.schema(_CKPT_SCHEMA).parquet(self._ckpt_path)
        except AnalysisException:
            return {"component_sent_events_total": 0, "component_sent_event_bytes_total": 0, "buckets_committed": 0}
        r = df.agg(
            F.sum("events_sent").alias("e"),
            F.sum("bytes_sent").alias("b"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return {
            "component_sent_events_total": r["e"] or 0,
            "component_sent_event_bytes_total": r["b"] or 0,
            "buckets_committed": r["n"],
        }
