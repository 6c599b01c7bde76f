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
  * Output is written with dynamic partition overwrite into
    sink_dir/_bucket=<b>/ — re-processing a bucket atomically replaces its
    files, so a crash between write and commit is safe (idempotent redo).
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
        try:
            rows = self.spark.read.schema(_CKPT_SCHEMA).parquet(self._ckpt_path).select("bucket").collect()
        except AnalysisException:
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

    def write_and_commit(
        self,
        out: DataFrame,
        sink_dir: str,
        bytes_col: str | None = None,
    ) -> int:
        """Write `out` (must carry _bucket) partitioned by bucket with
        dynamic overwrite, then commit per-bucket counter rows. Returns the
        number of buckets committed. Crash-safe: a bucket either commits
        (present in the checkpoint table) or will be redone idempotently."""
        # co-locate each bucket in one task before the partitioned write:
        # without this every task writes a file into every bucket dir
        # (tasks x buckets small files — at 10^12 rows a compaction
        # nightmare); with it, one file per bucket per pass
        (
            out.repartition(self.n_buckets, F.col(BUCKET_COL))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL)
            .parquet(sink_dir)
        )
        # counters come from the just-written files (source of truth = what
        # the sink actually holds, the ack semantics), one tiny agg job
        written = self.spark.read.parquet(sink_dir)
        byte_expr = (
            F.sum(F.col(bytes_col)).cast("long") if bytes_col
            else F.lit(None).cast("long")
        )
        now_us = int(time.time() * 1_000_000)
        stats = (
            written.groupBy(F.col(BUCKET_COL).cast("int").alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("events_sent"),
                byte_expr.alias("bytes_sent"),
            )
            .withColumn("committed_at_us", F.lit(now_us))
        )
        already = self.committed()
        if already:
            stats = stats.filter(~F.col("bucket").isin(*already))
        new = stats.count()
        stats.coalesce(1).write.mode("append").parquet(self._ckpt_path)
        return new

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
        return self.write_and_commit(out, sink_dir, bytes_col=bytes_col)

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
