"""Sink compaction — the small-files maintenance pass for partitioned
parquet sinks (the Iceberg ``rewriteDataFiles``/binpack analogue).

Reference analogue: Vector keeps sink batches large *inside one process*
with ``batch.max_bytes`` / ``max_events`` buffering
(/root/reference/src/sinks/util/batch.rs:18-28) — a single writer, so
files never fragment. A distributed, resumable writer cannot: every task
writes its own file per partition dir and every checkpointed pass appends
another (runtime/checkpoint.py deliberately repartitions to one file per
bucket *per pass*, but N resumed passes still mean N files, and streaming
sinks add one per micro-batch). At 10^12 rows that is metadata pressure
and scan latency — the classic small-files problem. Compaction is the
table-maintenance answer: rewrite fragmented partitions into
``ceil(bytes / target_file_bytes)`` files each, changing ZERO rows.

Protocol (crash-safe, idempotent — same ack ethos as CheckpointedRun):

1. **plan** — walk the sink's leaf ``k=v`` partition dirs via the Hadoop
   FS (a driver metadata op, O(#files), same cost class as any table
   listing) and select the fragmented ones: more files than the binpack
   target ``max(1, ceil(total_bytes / target))``.
2. **rewrite** — ONE Spark job reads all selected partitions
   (``basePath`` preserves the partition columns) and stages them under
   ``<sink>/_compacting/`` with the same ``partitionBy`` layout; a
   deterministic salt ``pmod(xxhash64(*data_cols), target_files)``
   bounds files-per-partition at the binpack target (no window, no
   global sort — the shuffle carries each partition's data once).
3. **verify** — per-partition row counts of staged vs live must match
   before anything is deleted (the "ack" before the destructive step).
4. **swap** — per partition dir: delete live, FS-rename staged into
   place. A crash anywhere converges on rerun: staging doubles as a
   REDO log — at pass start, any staged partition whose live dir is
   missing (possible only post-verify, mid-swap) is renamed into place,
   then the remaining (pre-verify) staging debris is cleared; a
   partition is otherwise either still fragmented (re-planned) or
   already swapped (no longer selected).

At 100 TB the plan step selects only fragmented partitions, so the
rewrite job's input is the fragmentation debt, not the table; partitions
already at target are never read. Scheduling it after ``CheckpointedRun``
passes (``run_pipeline.py --compact``) keeps read amplification one-shot.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGING = "_compacting"


@dataclass(frozen=True)
class PartitionPlan:
    rel_path: str  # e.g. "day=2026-01-01/bucket=5" or "_bucket=3"
    n_files: int
    total_bytes: int
    target_files: int

    @property
    def fragmented(self) -> bool:
        return self.n_files > self.target_files


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(conf), jvm.org.apache.hadoop.fs.Path


def _is_partition_dir(name: str) -> bool:
    # mirror Spark's listing rule: '_'-prefixed names are hidden UNLESS
    # they contain '=' (so the checkpoint sink's `_bucket=N` layout is a
    # real partition dir, while `_compacting`/`_SUCCESS` stay hidden)
    return "=" in name and not name.startswith(".")


def _is_data_file(name: str) -> bool:
    return not name.startswith(("_", "."))


def _walk_leaves(fs, HPath, root: str, rel: str = "") -> list[tuple[str, int, int]]:
    """(rel_partition_path, n_data_files, total_bytes) per leaf dir.
    Only descends through k=v dirs so sink-root metadata (_SUCCESS,
    checkpoint tables, the staging dir itself) is never touched."""
    out: list[tuple[str, int, int]] = []
    here = f"{root}/{rel}" if rel else root
    n, total = 0, 0
    for st in fs.listStatus(HPath(here)):
        name = st.getPath().getName()
        if st.isDirectory():
            if _is_partition_dir(name):
                out.extend(
                    _walk_leaves(fs, HPath, root, f"{rel}/{name}" if rel else name)
                )
        elif rel and _is_data_file(name):
            n += 1
            total += st.getLen()
    if n:
        out.append((rel, n, total))
    return out


def compaction_plan(
    spark: SparkSession, sink_dir: str, target_file_bytes: int = 128 << 20
) -> list[PartitionPlan]:
    """List every leaf partition with its binpack target; callers filter
    on ``.fragmented``. Pure metadata — no Spark job."""
    fs, HPath = _hadoop_fs(spark, sink_dir)
    if not fs.exists(HPath(sink_dir)):
        return []
    return [
        PartitionPlan(
            rel, n, total, max(1, math.ceil(total / target_file_bytes))
        )
        for rel, n, total in sorted(_walk_leaves(fs, HPath, sink_dir))
    ]


def _partition_cols(rel_path: str) -> list[str]:
    return [seg.split("=", 1)[0] for seg in rel_path.split("/")]


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _dir_value(raw: str) -> str | None:
    """Invert Hive/Spark's escapePathName on a partition dir value: '%' is
    itself always escaped (%25), so percent-decoding is a true inverse;
    the null sentinel dir maps back to SQL NULL. Without this, any
    partition value Spark escapes in dir names ('a b' -> a%20b) — or any
    null — fails the rewrite join's string equality and the pass can
    never verify."""
    return None if raw == _HIVE_NULL else unquote(raw)


def _counts_by_partition(df: DataFrame, cols: list[str]) -> dict[tuple, int]:
    rows = df.groupBy(*cols).count().collect()
    return {tuple(str(r[c]) for c in cols): r["count"] for r in rows}


def compact_sink(
    spark: SparkSession,
    sink_dir: str,
    target_file_bytes: int = 128 << 20,
) -> dict:
    """One compaction pass over ``sink_dir``. Returns a report dict
    (Vector-counter-style): partitions compacted, files before/after,
    bytes rewritten. No-op (and cheap) when nothing is fragmented."""
    fs, HPath = _hadoop_fs(spark, sink_dir)
    staging = f"{sink_dir}/{STAGING}"
    if fs.exists(HPath(staging)):
        # leftover from a crashed pass. Staging is a REDO log: live dirs
        # are only ever deleted AFTER the staged copy passed the count
        # verify, so a staged partition whose live dir is missing is the
        # sole (verified) copy — complete its swap before clearing the
        # rest (which are pre-verify rewrite debris; their live dirs are
        # intact).
        for rel, _, _ in _walk_leaves(fs, HPath, staging):
            live_p = HPath(f"{sink_dir}/{rel}")
            if not fs.exists(live_p):
                parent = live_p.getParent()
                if not fs.exists(parent):
                    fs.mkdirs(parent)
                if not fs.rename(HPath(f"{staging}/{rel}"), live_p):
                    raise RuntimeError(
                        f"crash recovery rename failed: {staging}/{rel}"
                    )
        fs.delete(HPath(staging), True)

    plans = [p for p in compaction_plan(spark, sink_dir, target_file_bytes) if p.fragmented]
    report = {
        "partitions_compacted": 0,
        "files_before": sum(p.n_files for p in plans),
        "files_after": 0,
        "bytes_rewritten": sum(p.total_bytes for p in plans),
    }
    if not plans:
        return report

    pcols = _partition_cols(plans[0].rel_path)
    for p in plans:
        if _partition_cols(p.rel_path) != pcols:
            raise ValueError(
                f"inconsistent partition layout under {sink_dir}: "
                f"{p.rel_path} vs {'/'.join(pcols)}"
            )

    live = spark.read.option("basePath", sink_dir).parquet(
        *[f"{sink_dir}/{p.rel_path}" for p in plans]
    )
    data_cols = [c for c in live.columns if c not in pcols]
    # binpack salt: bounds files-per-partition at target_files without a
    # window or sort. target is per-partition — broadcast the tiny plan.
    tgt = spark.createDataFrame(
        [tuple(_dir_value(seg.split("=", 1)[1]) for seg in p.rel_path.split("/"))
         + (p.target_files,)
         for p in plans],
        # explicit schema: an all-null partition column would defeat inference
        ", ".join([f"`_t_{c}` string" for c in pcols] + ["_target int"]),
    )
    cond = [live[c].cast("string").eqNullSafe(tgt[f"_t_{c}"]) for c in pcols]
    salted = (
        live.join(F.broadcast(tgt), cond, "inner")
        .withColumn(
            "_cfile",
            F.pmod(F.xxhash64(*[F.col(c) for c in data_cols]), F.col("_target"))
            if data_cols
            else F.lit(0),
        )
        .drop(*[f"_t_{c}" for c in pcols], "_target")
    )
    total_target = sum(p.target_files for p in plans)
    (
        salted.repartition(total_target, *pcols, F.col("_cfile"))
        .drop("_cfile")
        .write.mode("overwrite")
        .partitionBy(*pcols)
        .parquet(staging)
    )

    # verify (the ack): staged row counts must equal live, per partition,
    # before any live file is deleted.
    staged = spark.read.option("basePath", staging).parquet(staging)
    got = _counts_by_partition(staged, pcols)
    want = _counts_by_partition(live, pcols)
    if got != want:
        fs.delete(HPath(staging), True)
        raise RuntimeError(
            f"compaction verify failed for {sink_dir}: staged counts != live "
            f"(staged {sum(got.values())} rows vs live {sum(want.values())})"
        )

    for p in plans:
        live_p = HPath(f"{sink_dir}/{p.rel_path}")
        staged_p = HPath(f"{staging}/{p.rel_path}")
        if not fs.exists(staged_p):
            # a planned partition with no staged dir would have failed
            # verify above (count mismatch) — defensive skip
            continue
        fs.delete(live_p, True)
        parent = live_p.getParent()
        if not fs.exists(parent):
            fs.mkdirs(parent)
        if not fs.rename(staged_p, live_p):
            raise RuntimeError(f"rename failed: {staged_p} -> {live_p}")
        report["partitions_compacted"] += 1
    fs.delete(HPath(staging), True)

    report["files_after"] = sum(
        p.n_files for p in compaction_plan(spark, sink_dir, target_file_bytes)
        if p.rel_path in {q.rel_path for q in plans}
    )
    return report
