"""Platform/agent log-format decoders: CRI / Docker json-file lines (+
partial merge), Heroku Logplex, Firehose envelope, journald JSON,
apache mod_status / nginx stub_status, and the lumberjack protocol
walker. Reference semantics cited per function in
vector_spark/functions/platform_logs.py and lumberjack.py."""

from __future__ import annotations

import json
import zlib

import pytest
from pyspark.sql import functions as F

from vector_spark.functions import (
    parse_cri,
    parse_docker_log,
    merge_partial_lines,
    parse_heroku_logplex,
    parse_firehose_envelope,
    parse_apache_status,
    parse_nginx_stub_status,
    parse_journald,
    parse_lumberjack,
    encode_lumberjack_frames,
)
from vector_spark.functions.platform_logs import DOCKER_MESSAGE_SPLIT_THRESHOLD


def _one(spark, line, fn):
    return spark.createDataFrame([(line,)], "v string").select(
        fn(F.col("v")).alias("r")
    ).collect()[0]["r"]


# --- CRI ------------------------------------------------------------------

def test_cri_full_line(spark):
    r = _one(spark, "2016-10-06T00:17:09.669794202Z stdout F log content 1", parse_cri)
    assert r["message"] == "log content 1"
    assert r["stream"] == "stdout"
    assert r["partial"] is False
    # 00:17:09.669794 UTC (nanos truncated to micros)
    assert r["ts_us"] == 1475713029669794


def test_cri_partial_and_unmatched(spark):
    r = _one(spark, "2016-10-06T00:17:09.669794202Z stderr P partial ", parse_cri)
    assert r["partial"] is True and r["stream"] == "stderr"
    assert r["message"] == "partial "
    # stream outside stdout/stderr -> dropped (null struct), cri.rs:157
    bad = _one(spark, "2016-10-06T00:17:09Z stdmix F nope", parse_cri)
    assert bad["message"] is None and bad["ts_us"] is None
    # missing delimiter after tag -> unmatched, cri.rs:161
    bad2 = _one(spark, "2016-10-06T00:17:09Z stdout F", parse_cri)
    assert bad2["message"] is None


def test_cri_empty_message_and_bad_ts(spark):
    r = _one(spark, "2016-10-06T00:17:09Z stdout F ", parse_cri)
    assert r["message"] == "" and r["partial"] is False
    r2 = _one(spark, "not-a-ts stdout F hello", parse_cri)
    assert r2["message"] == "hello" and r2["ts_us"] is None


# --- Docker json-file -----------------------------------------------------

def test_docker_line(spark):
    line = json.dumps({"log": "hello\n", "stream": "stdout",
                       "time": "2016-10-05T00:00:30.082640485Z"})
    r = _one(spark, line, parse_docker_log)
    assert r["message"] == "hello"  # trailing \n trimmed
    assert r["stream"] == "stdout"
    assert r["partial"] is False
    assert r["ts_us"] == 1475625630082640


def test_docker_partial_heuristic(spark):
    # exactly 16 KiB, no trailing newline -> partial (docker.rs:133-156)
    big = "x" * DOCKER_MESSAGE_SPLIT_THRESHOLD
    r = _one(spark, json.dumps({"log": big, "stream": "stderr",
                                "time": "2016-10-05T00:00:30Z"}), parse_docker_log)
    assert r["partial"] is True and len(r["message"]) == DOCKER_MESSAGE_SPLIT_THRESHOLD
    # exactly 16 KiB WITH trailing newline -> the exception: non-partial
    r2 = _one(spark, json.dumps({"log": big[:-1] + "\n", "stream": "stderr",
                                 "time": "2016-10-05T00:00:30Z"}), parse_docker_log)
    assert r2["partial"] is False
    # invalid json -> null struct
    r3 = _one(spark, "{nope", parse_docker_log)
    assert r3["message"] is None


def test_docker_double_trailing_newline_trims_one(spark):
    r = _one(spark, json.dumps({"log": "a\n\n", "stream": "stdout",
                                "time": "2016-10-05T00:00:30Z"}), parse_docker_log)
    assert r["message"] == "a\n"


# --- partial merge --------------------------------------------------------

def test_merge_partial_lines(spark):
    rows = [
        # file a: P P F -> one event, message concatenated, ts of FIRST line
        ("a", 1, "he", True, 100),
        ("a", 2, "llo ", True, 200),
        ("a", 3, "world", False, 300),
        # file a: lone full line
        ("a", 4, "solo", False, 400),
        # file a: trailing unterminated partial -> emits, still partial
        ("a", 5, "tail", True, 500),
        # file b: interleaved independent run
        ("b", 1, "b1", False, 600),
    ]
    df = spark.createDataFrame(
        rows, "f string, pos int, message string, partial boolean, ts long"
    )
    out = merge_partial_lines(df, ("f",), "pos")
    got = {(r["f"], r["pos"]): (r["message"], r["partial"], r["ts"])
           for r in out.collect()}
    assert got[("a", 1)] == ("hello world", False, 100)
    assert got[("a", 4)] == ("solo", False, 400)
    assert got[("a", 5)] == ("tail", True, 500)
    assert got[("b", 1)] == ("b1", False, 600)
    assert len(got) == 4


# --- Heroku Logplex -------------------------------------------------------

def test_heroku_logplex(spark):
    body = (
        "83 <40>1 2012-11-30T06:45:29+00:00 host app web.3 - State changed "
        "from starting to up\n"
        "119 <40>1 2012-11-30T06:45:26+00:00 host app web.3 - Starting "
        "process with command `bundle exec rackup config.ru -p 24405`\n"
        "short line\n"
    )
    out = _one(spark, body, parse_heroku_logplex)
    assert len(out) == 2  # the short line fails the parts.len()==8 guard
    first = out[0]
    assert first["host"] == "host"
    assert first["app_name"] == "app"
    assert first["proc_id"] == "web.3"
    assert first["message"] == "State changed from starting to up"
    assert first["ts_us"] == 1354257929000000
    assert out[1]["message"].startswith("Starting process with command")


# --- Firehose envelope ----------------------------------------------------

def test_firehose_envelope(spark):
    import base64
    env = json.dumps({
        "requestId": "req-1",
        "timestamp": 1600000000000,
        "records": [
            {"data": base64.b64encode(b"line one").decode()},
            {"data": base64.b64encode(b"line two").decode()},
        ],
    })
    r = _one(spark, env, parse_firehose_envelope)
    assert r["request_id"] == "req-1"
    assert r["ts_ms"] == 1600000000000
    assert list(r["records"]) == ["line one", "line two"]


# --- apache mod_status ----------------------------------------------------

APACHE_AUTO = """localhost
ServerVersion: Apache/2.4.46 (Unix)
ServerUptimeSeconds: 12
Total Accesses: 30
Total kBytes: 2
Total Duration: 11
CPUUser: .2
CPULoad: 0.846154
BusyWorkers: 1
IdleWorkers: 74
ConnsTotal: 3
ConnsAsyncWriting: 1
Scoreboard: __K_.W
"""


def test_apache_status(spark):
    out = _one(spark, APACHE_AUTO, parse_apache_status)
    m = {(r["name"], r["type"], r["state"]): (r["kind"], r["value"]) for r in out}
    assert m[("uptime_seconds_total", None, None)] == ("counter", 12.0)
    assert m[("access_total", None, None)] == ("counter", 30.0)
    assert m[("sent_bytes_total", None, None)] == ("counter", 2048.0)
    assert m[("duration_seconds_total", None, None)] == ("counter", 11.0)
    assert m[("cpu_seconds_total", "user", None)] == ("gauge", 0.2)
    assert ("cpu_seconds_total", "system", None) not in m  # key absent -> no metric
    assert m[("cpu_load", None, None)] == ("gauge", 0.846154)
    assert m[("workers", None, "busy")] == ("gauge", 1.0)
    assert m[("workers", None, "idle")] == ("gauge", 74.0)
    assert m[("connections", None, "total")] == ("gauge", 3.0)
    assert m[("connections", None, "writing")] == ("gauge", 1.0)
    # scoreboard zero-fills every known state (parser.rs unwrap_or_default)
    assert m[("scoreboard", None, "waiting")] == ("gauge", 3.0)
    assert m[("scoreboard", None, "keepalive")] == ("gauge", 1.0)
    assert m[("scoreboard", None, "open")] == ("gauge", 1.0)
    assert m[("scoreboard", None, "sending")] == ("gauge", 1.0)
    assert m[("scoreboard", None, "dnslookup")] == ("gauge", 0.0)
    assert len([k for k in m if k[0] == "scoreboard"]) == 11


# --- nginx stub_status ----------------------------------------------------

def test_nginx_stub_status(spark):
    page = ("Active connections: 291 \n"
            "server accepts handled requests\n"
            " 16630948 16630946 31070465 \n"
            "Reading: 6 Writing: 179 Waiting: 106 \n")
    r = _one(spark, page, parse_nginx_stub_status)
    assert (r["active"], r["accepts"], r["handled"], r["requests"]) == (
        291, 16630948, 16630946, 31070465)
    assert (r["reading"], r["writing"], r["waiting"]) == (6, 179, 106)
    bad = _one(spark, "not a status page", parse_nginx_stub_status)
    assert bad["active"] is None


# --- journald -------------------------------------------------------------

def test_journald_record(spark):
    rec = json.dumps({
        "MESSAGE": "System Initialization Complete",
        "PRIORITY": "6",
        "_SYSTEMD_UNIT": "sysinit",
        "_HOSTNAME": "hostA",
        "_SOURCE_REALTIME_TIMESTAMP": "1578529839140001",
        "__REALTIME_TIMESTAMP": "1578529839140989",
    })
    r = _one(spark, rec, parse_journald)
    assert r["message"] == "System Initialization Complete"
    assert r["priority"] == "INFO"
    assert r["unit"] == "sysinit.service"  # fixup_unit appends .service
    assert r["host"] == "hostA"
    assert r["ts_us"] == 1578529839140001  # _SOURCE_ takes precedence


def test_journald_byte_array_and_fallback_ts(spark):
    # journalctl renders non-UTF-8-safe values as int arrays; bytes here
    # spell "héllo" in UTF-8 (decode_array_as_bytes, journald.rs:872-894)
    msg_bytes = list("héllo".encode("utf-8"))
    rec = json.dumps({
        "MESSAGE": msg_bytes,
        "PRIORITY": "2",
        "_SYSTEMD_UNIT": "cron.timer",
        "__REALTIME_TIMESTAMP": "1578529839140989",
    })
    r = _one(spark, rec, parse_journald)
    assert r["message"] == "héllo"
    assert r["priority"] == "CRIT"
    assert r["unit"] == "cron.timer"  # has an extension already
    assert r["ts_us"] == 1578529839140989


def test_journald_priority_out_of_range(spark):
    # journald.rs:895-910: numeric outside 0-7 -> UNKNOWN; non-numeric
    # strings pass through unchanged.
    for raw, want in [("8", "UNKNOWN"), ("-1", "UNKNOWN"),
                      ("42", "UNKNOWN"), ("oops", "oops")]:
        rec = json.dumps({
            "MESSAGE": "m", "PRIORITY": raw,
            "__REALTIME_TIMESTAMP": "1578529839140989",
        })
        r = _one(spark, rec, parse_journald)
        assert r["priority"] == want, raw


# --- lumberjack -----------------------------------------------------------

def _decode(spark, blob: bytes):
    df = spark.createDataFrame([(bytearray(blob),)], "b binary")
    return df.select(parse_lumberjack(F.col("b")).alias("r")).collect()[0]["r"]


def test_lumberjack_json_and_data_frames(spark):
    blob = encode_lumberjack_frames([
        (2, 0, "W", 10),
        (2, 1, "J", {"message": "hello", "n": 1}),
        (1, 2, "D", {"line": "raw", "host": "h1"}),
    ])
    out = _decode(spark, blob)
    assert len(out) == 2  # window frame consumed silently
    j = out[0]
    assert (j["protocol"], j["seq"], j["frame"]) == (2, 1, "J")
    assert json.loads(j["json"]) == {"message": "hello", "n": 1}
    d = out[1]
    assert (d["protocol"], d["seq"], d["frame"]) == (1, 2, "D")
    assert dict(d["fields"]) == {"line": "raw", "host": "h1"}


def test_lumberjack_compressed_frame(spark):
    blob = encode_lumberjack_frames(
        [(2, 5, "J", {"a": 1}), (2, 6, "J", {"a": 2})], compress=True
    )
    assert blob[:2] == b"2C"
    out = _decode(spark, blob)
    assert [r["seq"] for r in out] == [5, 6]
    assert json.loads(out[1]["json"]) == {"a": 2}


def test_lumberjack_truncated_and_invalid(spark):
    good = encode_lumberjack_frames([(2, 1, "J", {"k": "v"})])
    # truncated second frame: first still decodes
    trunc = good + b"2J\x00\x00\x00\x02"
    out = _decode(spark, trunc)
    assert len(out) == 1
    # zero pair count is invalid (logstash.rs:562-565)
    bad = b"1D" + b"\x00\x00\x00\x01" + b"\x00\x00\x00\x00"
    assert _decode(spark, bad) == []
    # unknown protocol version: hard stop
    assert _decode(spark, b"3W\x00\x00\x00\x01" + good) == []
    # corrupt zlib payload
    assert _decode(spark, b"2C\x00\x00\x00\x04junk") == []


# --- streaming partial merge ----------------------------------------------

def _write_parts(spark, path, rows_, mode="overwrite"):
    spark.createDataFrame(
        rows_, "f string, pos long, message string, partial boolean, ts long"
    ).coalesce(1).write.mode(mode).parquet(path)


def test_stream_merge_partial_equals_batch(spark, tmp_path):
    from vector_spark.functions import merge_partial_lines
    from vector_spark.streaming import stream_merge_partial_lines

    rows_ = [
        ("a", 1, "he", True, 100), ("a", 2, "llo", True, 200),
        ("a", 3, "!", False, 300), ("a", 4, "solo", False, 400),
        ("b", 1, "x", True, 500), ("b", 2, "y", False, 600),
    ]  # every run closed -> streaming availableNow == batch
    src = str(tmp_path / "pm_src")
    _write_parts(spark, src, rows_)
    schema = spark.read.parquet(src).schema
    sdf = stream_merge_partial_lines(
        spark.readStream.schema(schema).parquet(src), ("f",), "pos"
    )
    sink = str(tmp_path / "pm_sink")
    q = (
        sdf.writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", str(tmp_path / "pm_ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    batch = merge_partial_lines(spark.read.parquet(src), ("f",), "pos")
    key = lambda r: (r["f"], r["pos"])  # noqa: E731
    got = sorted(map(tuple, spark.read.parquet(sink).collect()))
    exp = sorted(map(tuple, batch.select(*spark.read.parquet(sink).columns).collect()))
    assert got == exp
    assert len(got) == 3


def test_merge_partial_null_flag_twins_agree(spark, tmp_path):
    """A NULL partial flag (parse_cri unmatched rows) normalizes to
    not-partial in BOTH twins: it closes the open run, and a lone
    NULL-flag line emits as a complete event."""
    from vector_spark.functions import merge_partial_lines
    from vector_spark.streaming import stream_merge_partial_lines

    rows_ = [
        ("a", 1, "he", True, 100), ("a", 2, "llo", None, 200),
        ("a", 3, "solo", None, 300),
        ("b", 1, "x", True, 400), ("b", 2, "y", False, 500),
    ]
    src = str(tmp_path / "pmn_src")
    _write_parts(spark, src, rows_)
    batch = merge_partial_lines(spark.read.parquet(src), ("f",), "pos")
    got_b = {(r["f"], r["pos"]): (r["message"], r["partial"])
             for r in batch.collect()}
    assert got_b == {
        ("a", 1): ("hello", False), ("a", 3): ("solo", False),
        ("b", 1): ("xy", False),
    }
    schema = spark.read.parquet(src).schema
    sdf = stream_merge_partial_lines(
        spark.readStream.schema(schema).parquet(src), ("f",), "pos"
    )
    sink = str(tmp_path / "pmn_sink")
    q = (
        sdf.writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", str(tmp_path / "pmn_ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got_s = {(r["f"], r["pos"]): (r["message"], r["partial"])
             for r in spark.read.parquet(sink).collect()}
    assert got_s == got_b


def test_stream_merge_partial_state_survives_microbatches(spark, tmp_path):
    """A run split across micro-batches merges when its closer arrives in
    a LATER batch — the open buffer lives in the checkpoint, exactly the
    reference's in-memory partial map surviving between reads."""
    from vector_spark.streaming import stream_merge_partial_lines

    src = str(tmp_path / "pm2_src")
    ck = str(tmp_path / "pm2_ck")
    sink = str(tmp_path / "pm2_sink")
    _write_parts(spark, src, [("a", 1, "part1-", True, 100)])
    schema = spark.read.parquet(src).schema

    def run():
        sdf = stream_merge_partial_lines(
            spark.readStream.schema(schema).parquet(src), ("f",), "pos"
        )
        q = (
            sdf.writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(sink).count() == 0  # buffer open, nothing out
    _write_parts(spark, src, [("a", 2, "done", False, 200)], mode="append")
    run()
    out = spark.read.parquet(sink).collect()
    assert len(out) == 1
    r = out[0]
    assert r["message"] == "part1-done"
    assert r["partial"] is False
    assert r["ts"] == 100  # carried from the FIRST line of the run


def test_topology_parse_cri_and_journald(spark, tmp_path):
    """The new platform decoders ride the topology's `parse` transform
    (the decoding.codec surface) like any named parser."""
    from vector_spark.topology import compile_topology

    spec = {
        "sources": {
            "logs": {
                "type": "inline",
                "rows": [
                    (1, "2016-10-06T00:17:09.669794202Z stdout F hello"),
                    (2, "2016-10-06T00:17:10Z stderr P chunk"),
                ],
                "schema": "event_id long, message string",
            }
        },
        "transforms": {
            "decoded": {
                "type": "parse",
                "inputs": ["logs"],
                "parser": "cri",
                "column": "message",
            },
            "full_only": {
                "type": "filter",
                "inputs": ["decoded"],
                "condition": "NOT partial",
            },
        },
        "sinks": {
            "out": {"type": "memory", "inputs": ["full_only"]},
        },
    }
    res = compile_topology(spec).build(spark).run()
    rows_ = res["out"]
    assert len(rows_) == 1
    assert rows_[0]["message"] == "hello" and rows_[0]["stream"] == "stdout"
