"""reduce — stateful multi-event collapse (transaction assembly).

Reference: /root/reference/src/transforms/reduce/transform.rs:155-310 —
group events by `group_by` fields; merge fields per strategy; flush when the
inter-event gap exceeds expire_after_ms (default 30s — session semantics),
max_events is reached, or a starts_when/ends_when condition fires.
Merge strategies (reduce/merge_strategy.rs:17-62): Discard(first),
Retain(last), Sum, Max, Min, Array, Concat(space), ConcatNewline, ConcatRaw,
ShortestArray, LongestArray, FlatUnique, defaults (reduce/config.rs:77-84):
strings->first, timestamps->first plus <f>_end=last, numbers->sum.

Spark-first: sessionization = classic gaps-and-islands — lag + a running sum
of "gap exceeded" flags over (group, order) — one shuffle; then one groupBy
on (group, session). All merge strategies map to built-in aggregates, so the
whole operator is two exchanges with full map-side partial aggregation and
zero Python. (Streaming variant: session_window / applyInPandasWithState —
streaming/ module.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# strategy name -> fn(value_col, order_col) -> agg Column
MERGE_STRATEGIES = {
    "discard": lambda v, o: F.min_by(v, o),
    "retain": lambda v, o: F.max_by(v, o),
    "sum": lambda v, o: F.sum(v),
    "max": lambda v, o: F.max(v),
    "min": lambda v, o: F.min(v),
    "array": lambda v, o: F.array_sort(F.collect_list(F.struct(o.alias("o"), v.alias("v")))).getField("v"),
    "concat": lambda v, o: F.array_join(
        F.array_sort(F.collect_list(F.struct(o.alias("o"), v.alias("v")))).getField("v"), " "
    ),
    "concat_newline": lambda v, o: F.array_join(
        F.array_sort(F.collect_list(F.struct(o.alias("o"), v.alias("v")))).getField("v"), "\n"
    ),
    "concat_raw": lambda v, o: F.array_join(
        F.array_sort(F.collect_list(F.struct(o.alias("o"), v.alias("v")))).getField("v"), ""
    ),
    "shortest_array": lambda v, o: F.min_by(v, F.size(v)),
    "longest_array": lambda v, o: F.max_by(v, F.size(v)),
    "flat_unique": lambda v, o: F.array_distinct(F.flatten(F.collect_list(v))),
    "count": lambda v, o: F.count(v),
}


def _order_cols(order_by, ts_col: str) -> list:
    if order_by is None:
        return [ts_col]
    return order_by if isinstance(order_by, list) else [order_by]


def sessionize(
    df: DataFrame,
    group_by: list[str],
    ts_col: str = "ts",
    gap_secs: float = 30.0,
    order_col: str | list[str] | None = None,
) -> DataFrame:
    """Add a `session_id` column: new session when the gap from the previous
    event in the group exceeds gap_secs (expire_after_ms semantics).
    Gap arithmetic is in integer microseconds (unix_micros) — exact, no
    seconds truncation."""
    order = _order_cols(order_col, ts_col)
    w = Window.partitionBy(*group_by).orderBy(*order)
    gap = F.unix_micros(F.col(ts_col).cast('timestamp')) - F.unix_micros(F.lag(F.col(ts_col).cast('timestamp')).over(w))
    new_sess = F.when(gap.isNull() | (gap > int(gap_secs * 1_000_000)), F.lit(1)).otherwise(F.lit(0))
    return df.withColumn("session_id", F.sum(new_sess).over(w))


def reduce_sessions(
    df: DataFrame,
    group_by: list[str],
    merges: dict[str, tuple[str, str]],
    ts_col: str = "ts",
    gap_secs: float = 30.0,
    order_col: str | list[str] | None = None,
    starts_when: Column | None = None,
    ends_when: Column | None = None,
    max_events: int | None = None,
    end_every_secs: float | None = None,
    hot_split: dict | None = None,
) -> DataFrame:
    """Collapse each session to one row.

    merges: {out_col: (strategy, in_col)}. Always emits the default
    timestamp pair (ts = first, ts_end = last, reduce/config.rs:77-84) and
    an `events_merged` count.

    starts_when / ends_when: boolean Columns that force a session boundary
    before / after the matching event (reduce/transform.rs:241-262) —
    combined with the gap rule via the same running-sum trick.

    max_events: flush once a session has accumulated this many events — a
    longer run splits into ceil(n/max_events) output rows
    (reduce/config.rs:30-60 max_events). end_every_secs: cyclic flush —
    a session also splits at every multiple of this interval from the
    session's first event (config.rs end_every_period_ms). Both are
    expressed as running-window columns over the SAME (group, order)
    window as the gap rule, so the whole operator is still one shuffle +
    one groupBy regardless of which flush conditions are active.

    SCALE BOUND — per-group serialization: the session window partitions
    by the group key, so ONE group's entire history runs in ONE task (the
    reference has the same constraint — its per-key ReduceState is a
    single-threaded map entry, reduce/transform.rs:155-310). A
    pathological hot key holding a large share of the input serializes
    into a straggler task at 100x scale.

    hot_split (opt-in guard): {"threshold": rows, "slice_secs": S}.
    A cheap count-per-group pass (map-side partial agg, tiny broadcast)
    flags groups above `threshold` rows; their rows get a time-slice salt
    floor(event_us / S) added to the window partition key, so the hot
    group's timeline parallelizes across ceil(span/S) tasks. Semantics:
    EXACT for every session that does not span a slice edge; a session
    crossing an edge is force-flushed there (one extra output chunk per
    crossing — the same bounded-state behavior max_events already
    imposes). Pick S >> gap_secs so crossings are rare; sessions longer
    than S must be bounded anyway at this scale.
    """
    order = _order_cols(order_col, ts_col)
    part_cols = list(group_by)
    if hot_split is not None:
        threshold = hot_split.get("threshold", 1_000_000)
        slice_secs = hot_split.get("slice_secs", 3600)
        hot = (
            df.groupBy(*group_by)
            .count()
            .filter(F.col("count") > threshold)
            .select(*group_by, F.lit(True).alias("_hot"))
        )
        tus0 = F.unix_micros(F.col(ts_col).cast("timestamp"))
        df = (
            df.join(F.broadcast(hot), group_by, "left")
            .withColumn(
                "_split",
                F.when(
                    F.col("_hot"), F.floor(tus0 / int(slice_secs * 1_000_000))
                ).otherwise(F.lit(0)),
            )
            .drop("_hot")
        )
        part_cols.append("_split")
    w = Window.partitionBy(*part_cols).orderBy(*order)
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = tus - F.lag(tus).over(w)
    boundary = gap.isNull() | (gap > int(gap_secs * 1_000_000))
    if starts_when is not None:
        boundary = boundary | starts_when
    if ends_when is not None:
        boundary = boundary | F.coalesce(F.lag(ends_when).over(w), F.lit(False))
    sess = F.sum(F.when(boundary, 1).otherwise(0)).over(w)
    df = df.withColumn("_b", F.when(boundary, 1).otherwise(0)).withColumn("_session", sess)
    sess_keys = ["_session"] + (["_split"] if hot_split is not None else [])

    if end_every_secs is not None:
        # session start ts = running last ts where a boundary fired; the
        # cyclic chunk is the elapsed-period index from that start
        start_us = F.last(F.when(F.col("_b") == 1, tus), ignorenulls=True).over(w)
        period = int(end_every_secs * 1_000_000)
        df = df.withColumn("_chunk_t", F.floor((tus - start_us) / period))
        sess_keys.append("_chunk_t")

    if max_events is not None:
        # position within the (session [, period-chunk]) run, then split
        # every max_events — all from running aggregates over the same w
        # (each step materialized: Spark rejects nested window functions)
        df = df.withColumn("_rn", F.row_number().over(w))
        new_sub = F.col("_b") == 1
        if end_every_secs is not None:
            new_sub = new_sub | (
                F.col("_chunk_t") != F.coalesce(F.lag("_chunk_t").over(w), F.lit(-1))
            )
        df = df.withColumn("_new_sub", new_sub)
        df = df.withColumn(
            "_sub_start",
            F.last(F.when(F.col("_new_sub"), F.col("_rn")), ignorenulls=True).over(w),
        )
        df = df.withColumn(
            "_chunk_n", F.floor((F.col("_rn") - F.col("_sub_start")) / max_events)
        )
        sess_keys.append("_chunk_n")

    o = F.struct(*[F.col(c) for c in order])
    aggs = [
        F.min(ts_col).alias(ts_col),
        F.max(ts_col).alias(f"{ts_col}_end"),
        F.count(F.lit(1)).alias("events_merged"),
    ]
    for out_col, (strategy, in_col) in merges.items():
        aggs.append(MERGE_STRATEGIES[strategy](F.col(in_col), o).alias(out_col))
    return df.groupBy(*group_by, *sess_keys).agg(*aggs).drop("_b", *sess_keys)
