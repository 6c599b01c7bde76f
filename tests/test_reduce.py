"""reduce semantics — session gap flush, merge strategies, starts_when /
ends_when boundaries. Mirrors /root/reference/src/transforms/reduce
(transform.rs:155-310, merge_strategy.rs:17-62 inline tests)."""

from pyspark.sql import functions as F

from vector_spark.operators import reduce_sessions
from vector_spark.operators.reduce import sessionize, MERGE_STRATEGIES

from conftest import rows, ts


def _txn(spark):
    # group "a": two sessions split by a >30s gap; group "b": one session
    return spark.createDataFrame(
        [
            (1, "a", ts(0, 0), 1.0, "first msg"),
            (2, "a", ts(0, 10), 2.0, "second"),
            (3, "a", ts(0, 55), 4.0, "third"),     # 45s gap -> new session
            (4, "b", ts(0, 5), 10.0, "only"),
        ],
        "event_id long, txn string, ts timestamp, dur double, message string",
    )


def test_session_gap_split(spark):
    out = reduce_sessions(
        _txn(spark), ["txn"], {"n": ("count", "event_id")},
        ts_col="ts", gap_secs=30, order_col=["ts", "event_id"],
    )
    got = rows(out, "txn", "events_merged")
    assert got == [("a", 1), ("a", 2), ("b", 1)]


def test_default_timestamp_pair_and_sum(spark):
    out = reduce_sessions(
        _txn(spark), ["txn"],
        {"dur_sum": ("sum", "dur"), "first_msg": ("discard", "message"),
         "last_msg": ("retain", "message")},
        ts_col="ts", gap_secs=3600, order_col=["ts", "event_id"],
    )
    a = out.filter("txn = 'a'").collect()[0]
    assert a["ts"] == ts(0, 0) and a["ts_end"] == ts(0, 55)  # first + _end=last
    assert a["dur_sum"] == 7.0
    assert a["first_msg"] == "first msg" and a["last_msg"] == "third"


def test_merge_strategies_exact(spark):
    df = spark.createDataFrame(
        [(1, "g", "x", 2.0, ["a", "b"]), (2, "g", "y", 5.0, ["b", "c", "d"]),
         (3, "g", "z", 1.0, ["e"])],
        "event_id long, g string, s string, v double, arr array<string>",
    )
    out = reduce_sessions(
        df, ["g"],
        {
            "first": ("discard", "s"), "last": ("retain", "s"),
            "vsum": ("sum", "v"), "vmax": ("max", "v"), "vmin": ("min", "v"),
            "all": ("array", "s"),
            "joined": ("concat", "s"), "lines": ("concat_newline", "s"),
            "raw": ("concat_raw", "s"),
            "shortest": ("shortest_array", "arr"), "longest": ("longest_array", "arr"),
            "uniq": ("flat_unique", "arr"),
        },
        ts_col="event_id", gap_secs=1e12, order_col="event_id",
    )
    r = out.collect()[0]
    assert (r["first"], r["last"]) == ("x", "z")
    assert (r["vsum"], r["vmax"], r["vmin"]) == (8.0, 5.0, 1.0)
    assert r["all"] == ["x", "y", "z"]
    assert r["joined"] == "x y z"
    assert r["lines"] == "x\ny\nz"
    assert r["raw"] == "xyz"
    assert r["shortest"] == ["e"] and r["longest"] == ["b", "c", "d"]
    assert sorted(r["uniq"]) == ["a", "b", "c", "d", "e"]


def test_ends_when_boundary(spark):
    df = spark.createDataFrame(
        [(1, "t", ts(0, 0), "work"), (2, "t", ts(0, 1), "END"),
         (3, "t", ts(0, 2), "work"), (4, "t", ts(0, 3), "work")],
        "event_id long, txn string, ts timestamp, message string",
    )
    out = reduce_sessions(
        df, ["txn"], {"n": ("count", "event_id")},
        ts_col="ts", gap_secs=3600, order_col=["ts", "event_id"],
        ends_when=F.col("message") == "END",
    )
    # END closes the session *after* the matching event: [1,2] then [3,4]
    assert rows(out, "events_merged") == [(2,), (2,)]


def test_starts_when_boundary(spark):
    df = spark.createDataFrame(
        [(1, "t", ts(0, 0), "work"), (2, "t", ts(0, 1), "BEGIN"),
         (3, "t", ts(0, 2), "work")],
        "event_id long, txn string, ts timestamp, message string",
    )
    out = reduce_sessions(
        df, ["txn"], {"n": ("count", "event_id")},
        ts_col="ts", gap_secs=3600, order_col=["ts", "event_id"],
        starts_when=F.col("message") == "BEGIN",
    )
    # BEGIN opens a new session *at* the matching event: [1] then [2,3]
    assert rows(out, "events_merged") == [(1,), (2,)]


def test_sessionize_partition_invariant(spark):
    df = _txn(spark)
    a = rows(sessionize(df, ["txn"], gap_secs=30, order_col=["ts", "event_id"]),
             "event_id", "session_id")
    b = rows(sessionize(df.repartition(4), ["txn"], gap_secs=30,
                        order_col=["ts", "event_id"]), "event_id", "session_id")
    assert a == b


def test_max_events_splits_long_session(spark):
    """A 7-event run with max_events=3 flushes as 3+3+1
    (reduce/config.rs:30-60 max_events)."""
    df = spark.createDataFrame(
        [(i, "a", ts(0, i), float(i)) for i in range(7)],
        "event_id long, txn string, ts timestamp, v double",
    )
    out = reduce_sessions(
        df, ["txn"], {"v_sum": ("sum", "v")},
        ts_col="ts", gap_secs=3600, order_col=["ts", "event_id"],
        max_events=3,
    )
    got = sorted(rows(out, "events_merged", "v_sum"))
    assert got == [(1, 6.0), (3, 3.0), (3, 12.0)]


def test_max_events_resets_on_gap_boundary(spark):
    """The event count restarts at every session boundary: 2 events, gap,
    4 events with max_events=3 -> sessions of 2, 3, 1."""
    times = [0, 10, 100, 110, 120, 130]
    df = spark.createDataFrame(
        [(i, "a", ts(t // 60, t % 60), 1.0) for i, t in enumerate(times)],
        "event_id long, txn string, ts timestamp, v double",
    )
    out = reduce_sessions(
        df, ["txn"], {"n": ("count", "event_id")},
        ts_col="ts", gap_secs=30, order_col=["ts", "event_id"],
        max_events=3,
    )
    assert sorted(r.events_merged for r in out.collect()) == [1, 2, 3]


def test_end_every_period_cyclic_flush(spark):
    """end_every_secs=60: a 150s-long session (events every 20s) flushes at
    60s and 120s from the session start -> chunks of 3, 3, 2 events."""
    df = spark.createDataFrame(
        [(i, "a", ts((i * 20) // 60, (i * 20) % 60), 1.0) for i in range(8)],
        "event_id long, txn string, ts timestamp, v double",
    )
    out = reduce_sessions(
        df, ["txn"], {"n": ("count", "event_id")},
        ts_col="ts", gap_secs=3600, order_col=["ts", "event_id"],
        end_every_secs=60,
    )
    got = rows(out, "events_merged")
    assert sorted(r[0] for r in got) == [2, 3, 3]


def test_max_events_and_period_compose(spark):
    """Both conditions: period chunks of 3/3/2, then max_events=2 splits
    each -> 2+1, 2+1, 2."""
    df = spark.createDataFrame(
        [(i, "a", ts((i * 20) // 60, (i * 20) % 60), 1.0) for i in range(8)],
        "event_id long, txn string, ts timestamp, v double",
    )
    out = reduce_sessions(
        df, ["txn"], {"n": ("count", "event_id")},
        ts_col="ts", gap_secs=3600, order_col=["ts", "event_id"],
        end_every_secs=60, max_events=2,
    )
    assert sorted(r.events_merged for r in out.collect()) == [1, 1, 2, 2, 2]


def test_hot_split_exact_when_sessions_fit_slices(spark):
    """hot_split: one group holds ~50% of all rows; with a slice chosen so
    no session spans a slice edge, the split result equals the unsplit
    result row-for-row, and the session window's physical partitioning
    includes the _split salt (no single-task straggler on the hot key)."""
    rows_in = []
    # hot group: 6 sessions of 10 events, one session per hour, events 5s
    # apart (session span 45s << slice 3600s; gaps between sessions 
    # >gap_secs) -> 60 rows
    for h in range(6):
        for i in range(10):
            rows_in.append((h * 100 + i, "hot", ts(0, i * 5, hour=h), 1.0))
    # 6 cold groups, 10 rows each -> hot group holds 50%
    for g in range(6):
        for i in range(10):
            rows_in.append((1000 + g * 10 + i, f"cold{g}", ts(10, i * 5), 1.0))
    df = spark.createDataFrame(
        rows_in, "event_id long, g string, ts timestamp, v double"
    )
    merges = {"n": ("count", "event_id"), "vsum": ("sum", "v")}
    base = reduce_sessions(
        df, ["g"], merges, gap_secs=60, order_col=["ts", "event_id"]
    )
    split = reduce_sessions(
        df, ["g"], merges, gap_secs=60, order_col=["ts", "event_id"],
        hot_split={"threshold": 30, "slice_secs": 3600},
    )
    cols = ["g", "ts", "ts_end", "events_merged", "n", "vsum"]
    assert rows(split, *cols) == rows(base, *cols)
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "_split" in plan  # the salt reaches the physical partitioning


def test_hot_split_force_flush_at_slice_edge(spark):
    """A session that DOES span a slice edge is force-flushed there: one
    extra chunk, totals preserved — the documented bounded-state
    deviation."""
    # 8 events 30s apart straddling the 3600s slice boundary at minute 60
    rows_in = [
        (i, "hot", ts((58 + i) % 60, 0, hour=(58 + i) // 60), 1.0)
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows_in, "event_id long, g string, ts timestamp, v double"
    )
    merges = {"n": ("count", "event_id")}
    split = reduce_sessions(
        df, ["g"], merges, gap_secs=120, order_col=["ts", "event_id"],
        hot_split={"threshold": 1, "slice_secs": 3600},
    )
    got = sorted(r.n for r in split.collect())
    assert got == [2, 6]          # split at minute 60: events 58,59 | 60..65
    assert sum(got) == 8          # nothing lost
