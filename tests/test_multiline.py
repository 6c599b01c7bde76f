"""multiline_agg — parity with the reference's line_agg state machine.

The four mode tests replicate the reference's own vectors byte-for-byte
(lib/vector-common/src/multiline/line_agg.rs:414-570 —
mode_continue_through_1 / mode_continue_past_1 / mode_halt_before_1 /
mode_halt_with_1), including the end-of-stream flush of the incomplete
trailing aggregate and the vacant-buffer quirk that the opening line is
never condition-checked. A pure-Python walker (a direct transcription of
line_agg.rs:301-366, independent of both Spark paths) backs the
randomized parity test across all four modes.
"""

from __future__ import annotations

import random

import pytest

from vector_spark.operators import multiline_agg

# ---------------------------------------------------------------- reference


def _reference_walk(lines, start, cond, mode):
    """Direct transcription of Logic::handle_line + end-drain
    (line_agg.rs:301-366, 203-215). Returns [(merged, first_idx, last_idx)]."""
    import re

    s_re, c_re = re.compile(start), re.compile(cond)
    out, buf = [], None  # buf = (lines, first_idx, last_idx)

    def flush(extra=None):
        nonlocal buf
        ls, fi, li = buf
        if extra is not None:
            ls = ls + [extra[0]]
            li = extra[1]
        out.append(("\n".join(ls), fi, li))
        buf = None

    def fresh(line, idx):
        nonlocal buf
        if s_re.search(line):
            buf = ([line], idx, idx)
        else:
            out.append((line, idx, idx))

    for idx, line in enumerate(lines):
        if buf is None:
            fresh(line, idx)
            continue
        c = bool(c_re.search(line))
        decision = {
            ("continue_through", True): "continue",
            ("continue_through", False): "end_exclude",
            ("continue_past", True): "continue",
            ("continue_past", False): "end_include",
            ("halt_before", True): "end_exclude",
            ("halt_before", False): "continue",
            ("halt_with", True): "end_include",
            ("halt_with", False): "continue",
        }[(mode, c)]
        if decision == "continue":
            buf = (buf[0] + [line], buf[1], idx)
        elif decision == "end_include":
            flush(extra=(line, idx))
        else:  # end_exclude: emit, then the line is re-processed as fresh
            flush()
            fresh(line, idx)
    if buf is not None:
        flush()
    return out


def _run(spark, lines, start, cond, mode):
    df = spark.createDataFrame(
        [("a", i, ln) for i, ln in enumerate(lines)], "host string, event_id int, line string"
    ).repartition(4)
    got = multiline_agg(
        df, start, cond, mode=mode, key_cols="host", order_col="event_id"
    ).collect()
    return sorted((r.line, r.first_event_id, r.last_event_id) for r in got)


# ------------------------------------------------- the reference's vectors

CT_LINES = [
    "some usual line",
    "some other usual line",
    "first part",
    " second part",
    " last part",
    "another normal message",
    "finishing message",
    " last part of the incomplete finishing message",
]


def test_mode_continue_through_reference_vector(spark):
    expected = sorted(
        [
            ("some usual line", 0, 0),
            ("some other usual line", 1, 1),
            ("first part\n second part\n last part", 2, 4),
            ("another normal message", 5, 5),
            ("finishing message\n last part of the incomplete finishing message", 6, 7),
        ]
    )
    assert _run(spark, CT_LINES, r"^[^\s]", r"^[\s]+", "continue_through") == expected


def test_mode_continue_past_reference_vector(spark):
    lines = [
        "some usual line",
        "some other usual line",
        "first part \\",
        "second part \\",
        "last part",
        "another normal message",
        "finishing message \\",
        "last part of the incomplete finishing message \\",
    ]
    expected = sorted(
        [
            ("some usual line", 0, 0),
            ("some other usual line", 1, 1),
            ("first part \\\nsecond part \\\nlast part", 2, 4),
            ("another normal message", 5, 5),
            ("finishing message \\\nlast part of the incomplete finishing message \\", 6, 7),
        ]
    )
    assert _run(spark, lines, r"\\$", r"\\$", "continue_past") == expected


def test_mode_halt_before_reference_vector(spark):
    lines = [
        "INFO some usual line",
        "INFO some other usual line",
        "INFO first part",
        "second part",
        "last part",
        "ERROR another normal message",
        "ERROR finishing message",
        "last part of the incomplete finishing message",
    ]
    expected = sorted(
        [
            ("INFO some usual line", 0, 0),
            ("INFO some other usual line", 1, 1),
            ("INFO first part\nsecond part\nlast part", 2, 4),
            ("ERROR another normal message", 5, 5),
            ("ERROR finishing message\nlast part of the incomplete finishing message", 6, 7),
        ]
    )
    # start_pattern = "" matches every line, like the reference's Regex::new("")
    assert _run(spark, lines, "", r"^(INFO|ERROR) ", "halt_before") == expected


def test_mode_halt_with_reference_vector(spark):
    lines = [
        "some usual line;",
        "some other usual line;",
        "first part",
        "second part",
        "last part;",
        "another normal message;",
        "finishing message",
        "last part of the incomplete finishing message",
    ]
    expected = sorted(
        [
            ("some usual line;", 0, 0),
            ("some other usual line;", 1, 1),
            ("first part\nsecond part\nlast part;", 2, 4),
            ("another normal message;", 5, 5),
            ("finishing message\nlast part of the incomplete finishing message", 6, 7),
        ]
    )
    assert _run(spark, lines, r"[^;]$", r";$", "halt_with") == expected


# ------------------------------------------------------------- edge cases


def test_opener_is_never_condition_checked(spark):
    # halt_with: a line that both opens (start matches) and terminates
    # (condition matches) still only OPENS — condition applies from the
    # second buffered line on (line_agg.rs:349-365 vacant branch).
    lines = ["stmt a;", "stmt b", "stmt c;"]
    got = _run(spark, lines, "^stmt", ";$", "halt_with")
    assert got == sorted([("stmt a;\nstmt b\nstmt c;", 0, 2)])


def test_condition_default_is_start_pattern(spark):
    df = spark.createDataFrame(
        [("a", 0, "M one"), ("a", 1, "x"), ("a", 2, "M two")],
        "host string, event_id int, line string",
    )
    got = multiline_agg(df, "^M", mode="halt_before").collect()
    assert sorted((r.line, r.n_lines) for r in got) == [("M one\nx", 2), ("M two", 1)]


def test_multiple_keys_are_independent(spark):
    rows = [("a", 0, "S 1"), ("b", 0, "S 1"), ("a", 1, " c"), ("b", 1, "S 2")]
    df = spark.createDataFrame(rows, "host string, event_id int, line string")
    got = multiline_agg(df, r"^\S", r"^\s", mode="continue_through").collect()
    assert sorted((r.host, r.line) for r in got) == [("a", "S 1\n c"), ("b", "S 1"), ("b", "S 2")]


@pytest.mark.parametrize("mode", ["continue_through", "continue_past", "halt_before", "halt_with"])
def test_randomized_parity_vs_reference_walker(spark, mode):
    rng = random.Random(42)
    alphabet = ["S cont", "S end", " cont", " end;", "plain", "S mix; end"]
    lines = [rng.choice(alphabet) for _ in range(200)]
    start, cond = r"^S ", r"(cont|;)"
    expected = sorted(_reference_walk(lines, start, cond, mode))
    assert _run(spark, lines, start, cond, mode) == expected


# ----------------------------------------------------------- streaming twin

# each fixture's FINAL line per key closes the buffer in its mode, so the
# availableNow run equals the batch twin exactly (an open tail is held in
# streaming state by design — see test_stream_multiline_open_buffer_*)
STREAM_FIXTURES = {
    "continue_through": (r"^S ", r"^\s", ["S one", " c1", " c2", "plain", "S two", "done"]),
    "continue_past": (r"\\$", r"\\$", ["a \\", "b \\", "c", "plain", "d \\", "e"]),
    "halt_before": (r"^[A-Z]", r"^-", ["X a", "b", "- cut", "Y c", "- cut2"]),
    "halt_with": (r"^stmt", r";$", ["stmt a", "b", "c;", "plain;", "stmt d", "f;"]),
}


def _write_lines(spark, path, rows_, mode="overwrite"):
    spark.createDataFrame(
        rows_, "host string, event_id long, line string"
    ).coalesce(1).write.mode(mode).parquet(path)


def _collect_sink(spark, sink):
    try:
        return sorted(
            (r.host, r.line, r.first_event_id, r.last_event_id, r.n_lines)
            for r in spark.read.parquet(sink).collect()
        )
    except Exception:  # sink dir not created yet = zero emitted rows
        return []


@pytest.mark.parametrize("mode", list(STREAM_FIXTURES))
def test_stream_multiline_equals_batch(spark, tmp_path, mode):
    from vector_spark.streaming import stream_multiline

    start, cond, lines = STREAM_FIXTURES[mode]
    src = str(tmp_path / f"src_{mode}")
    # key b replays the same closed sequence at shifted offsets — reversing
    # it would leave an OPEN tail, which streaming holds in state by design
    rows_ = [("a", i, ln) for i, ln in enumerate(lines)] + [
        ("b", i + 100, ln) for i, ln in enumerate(lines)
    ]
    _write_lines(spark, src, rows_)
    schema = spark.read.parquet(src).schema
    sdf = stream_multiline(
        spark.readStream.schema(schema).parquet(src), start, cond, mode=mode
    )
    sink = str(tmp_path / f"sink_{mode}")
    q = (
        sdf.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / f"ck_{mode}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = multiline_agg(
        spark.read.parquet(src), start, cond, mode=mode, key_cols="host"
    )
    expected = sorted(
        (r.host, r.line, r.first_event_id, r.last_event_id, r.n_lines)
        for r in batch.collect()
    )
    assert _collect_sink(spark, sink) == expected


def test_stream_multiline_open_buffer_survives_restart(spark, tmp_path):
    """An open buffer is NOT flushed at micro-batch end; it lives in the
    checkpoint and closes when continuation lines arrive in a later run —
    the reference's stashed per-source buffer (line_agg.rs:120-215)."""
    from vector_spark.streaming import stream_multiline

    src, sink, ck = (str(tmp_path / d) for d in ("src", "sink", "ck"))
    _write_lines(spark, src, [("k", 0, "S open"), ("k", 1, " a")])
    schema = spark.read.parquet(src).schema

    def run_once():
        sdf = stream_multiline(
            spark.readStream.schema(schema).parquet(src),
            r"^S ", r"^\s", mode="continue_through", key_cols="host",
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert _collect_sink(spark, sink) == []  # buffer still open in state
    _write_lines(spark, src, [("k", 2, " b"), ("k", 3, "done")], mode="append")
    run_once()
    assert _collect_sink(spark, sink) == [
        ("k", "S open\n a\n b", 0, 2, 3),
        ("k", "done", 3, 3, 1),
    ]


def test_stream_multiline_timeout_flush(spark, tmp_path):
    """timeout_secs = the reference's timeout_ms (line_agg.rs:64-79): a
    buffer idle past the timeout flushes on its own at the next trigger,
    without needing a closing line."""
    import time

    from vector_spark.streaming import stream_multiline

    src, sink, ck = (str(tmp_path / d) for d in ("src", "sink", "ck"))
    _write_lines(spark, src, [("k", 0, "S open"), ("k", 1, " a")])
    schema = spark.read.parquet(src).schema

    def run_once():
        sdf = stream_multiline(
            spark.readStream.schema(schema).parquet(src),
            r"^S ", r"^\s", mode="continue_through", key_cols="host",
            timeout_secs=0.05,
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # the flush may fire already in a trailing micro-batch of the first run
    # (availableNow keeps triggering until idle, and 50 ms expires fast) or
    # in the second run below — either way it needs NO closing line
    time.sleep(0.5)  # let the processing-time timeout expire
    _write_lines(spark, src, [("z", 0, "standalone")], mode="append")
    run_once()
    assert _collect_sink(spark, sink) == [
        ("k", "S open\n a", 0, 1, 2),
        ("z", "standalone", 0, 0, 1),
    ]


def test_stream_multiline_timestamp_order_col(spark, tmp_path):
    """order_col need not be an integer: a timestamp order column (the
    shape testdata actually has — TESTDATA parquet carries TIMESTAMP
    columns) flows through the state schema, the per-line fold, and the
    typed output, and the availableNow run equals the batch twin."""
    import datetime as dt

    from vector_spark.streaming import stream_multiline

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    lines = ["S one", " c1", " c2", "plain", "S two", "done"]
    rows_ = [("a", base + dt.timedelta(seconds=i), ln) for i, ln in enumerate(lines)]
    src = str(tmp_path / "src_ts")
    spark.createDataFrame(
        rows_, "host string, ts timestamp, line string"
    ).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    sdf = stream_multiline(
        spark.readStream.schema(schema).parquet(src),
        r"^S ", r"^\s", mode="continue_through", key_cols="host",
        order_col="ts",
    )
    sink = str(tmp_path / "sink_ts")
    q = (
        sdf.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck_ts"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = multiline_agg(
        spark.read.parquet(src), r"^S ", r"^\s",
        mode="continue_through", key_cols="host", order_col="ts",
    )
    got = spark.read.parquet(sink)
    assert dict(got.dtypes)["n_lines"] == "bigint"
    assert dict(got.dtypes)["first_ts"] == "timestamp"
    key = lambda r: (r.host, r.line, r.first_ts, r.last_ts, r.n_lines)
    assert sorted(map(key, got.collect())) == sorted(map(key, batch.collect()))
