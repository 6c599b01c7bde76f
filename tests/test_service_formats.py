"""SaaS intake / sink wire formats: Datadog Agent logs, S3 event
notifications, GCP Pub/Sub envelopes, Elasticsearch bulk bodies,
Splunk HEC encode. Reference citations in
vector_spark/functions/service_formats.py."""

from __future__ import annotations

import base64
import json

from pyspark.sql import functions as F

from vector_spark.functions import (
    parse_datadog_logs,
    parse_s3_event_notification,
    parse_pubsub_envelope,
    encode_elasticsearch_bulk,
    parse_elasticsearch_bulk,
    encode_splunk_hec,
    parse_splunk_hec,
)


def _one(spark, v, colfn):
    return spark.createDataFrame([(v,)], "v string").select(
        colfn(F.col("v")).alias("r")
    ).collect()[0]["r"]


def test_datadog_logs_payload(spark):
    payload = json.dumps([
        {"message": "hello", "status": "info", "timestamp": 1600000000123,
         "hostname": "h1", "service": "svc", "ddsource": "nginx",
         "ddtags": "env:prod,team,region:eu"},
        {"message": "m2", "status": "error", "timestamp": 1600000001000,
         "hostname": "h2", "service": "svc2", "ddsource": "agent",
         "ddtags": ""},
    ])
    out = _one(spark, payload, parse_datadog_logs)
    assert len(out) == 2
    a = out[0]
    assert (a["message"], a["status"], a["ts_ms"]) == ("hello", "info", 1600000000123)
    # parse_ddtags: bare tags and pairs both survive the split
    assert list(a["tags"]) == ["env:prod", "team", "region:eu"]
    assert list(out[1]["tags"]) == []
    assert _one(spark, "{not json", parse_datadog_logs) is None


def test_s3_event_notification(spark):
    body = json.dumps({"Records": [
        {"eventVersion": "2.1", "eventSource": "aws:s3",
         "awsRegion": "us-east-1", "eventName": "ObjectCreated:Put",
         "s3": {"bucket": {"name": "b1"},
                "object": {"key": "dir/my+file%281%29.log"}}},
        {"eventVersion": "2.1", "eventSource": "aws:s3",
         "awsRegion": "us-east-1", "eventName": "ObjectRemoved:Delete",
         "s3": {"bucket": {"name": "b1"}, "object": {"key": "gone"}}},
    ]})
    out = _one(spark, body, parse_s3_event_notification)
    a = out[0]
    assert (a["event_kind"], a["event_name"]) == ("ObjectCreated", "Put")
    # '+' as space then percent-decode (urlencoded_string, sqs.rs)
    assert a["key"] == "dir/my file(1).log"
    assert a["bucket"] == "b1"
    # the reference gates on kind != ObjectCreated — exposed for filtering
    assert out[1]["event_kind"] == "ObjectRemoved"


def test_pubsub_envelope(spark):
    env = json.dumps({
        "message": {
            "data": base64.b64encode(b'{"k": 1}').decode(),
            "attributes": {"a": "1", "b": "2"},
            "messageId": "m-17",
            "publishTime": "2021-01-02T03:04:05.123456789Z",
        },
        "subscription": "projects/p/subscriptions/s",
    })
    r = _one(spark, env, parse_pubsub_envelope)
    assert r["data"] == '{"k": 1}'
    assert dict(r["attributes"]) == {"a": "1", "b": "2"}
    assert r["message_id"] == "m-17"
    assert r["publish_ts_us"] == 1609556645123456  # nanos truncated
    assert r["subscription"].endswith("/s")


def test_elasticsearch_bulk_roundtrip(spark):
    df = spark.createDataFrame(
        [("idx-a", "d1", '{"m":"x"}'), ("idx-b", None, '{"m":"y"}')],
        "i string, id string, doc string",
    )
    body = df.select(
        encode_elasticsearch_bulk(F.col("doc"), F.col("i"), F.col("id"))
        .alias("pair")
    ).agg(F.concat_ws("", F.collect_list("pair")).alias("body"))
    line = body.collect()[0]["body"]
    assert '{"index":{"_index":"idx-a","_id":"d1"}}\n{"m":"x"}\n' in line
    assert '{"index":{"_index":"idx-b"}}\n{"m":"y"}\n' in line
    back = body.select(
        F.explode(parse_elasticsearch_bulk(F.col("body"))).alias("r")
    ).select("r.*").collect()
    got = {(r["index"], r["doc_id"]): (r["action"], r["doc"]) for r in back}
    assert got[("idx-a", "d1")] == ("index", '{"m":"x"}')
    assert got[("idx-b", None)] == ("index", '{"m":"y"}')


def test_splunk_hec_encode_roundtrip(spark):
    df = spark.createDataFrame(
        [(1600000000.5, "h1", '{"msg":"hi"}'), (1600000001.25, None, '"text"')],
        "t double, h string, ev string",
    )
    enc = df.select(
        encode_splunk_hec(
            F.col("ev"), F.col("t"), host=F.col("h"),
            sourcetype=F.lit("_json"),
        ).alias("line")
    )
    lines = [r["line"] for r in enc.collect()]
    o0 = json.loads(lines[0])
    assert o0["event"] == {"msg": "hi"}
    assert o0["host"] == "h1" and o0["sourcetype"] == "_json"
    assert abs(float(o0["time"]) - 1600000000.5) < 1e-9
    o1 = json.loads(lines[1])
    assert "host" not in o1  # null field omitted, like serde's skip-None
    assert o1["event"] == "text"
    # roundtrip through our own HEC decoder
    back = enc.select(
        F.unix_micros(parse_splunk_hec(F.col("line"))["ts"]).alias("us"),
        parse_splunk_hec(F.col("line"))["host"].alias("host"),
    ).collect()
    assert back[0]["us"] == 1600000000500000
    assert back[0]["host"] == "h1"


def test_splunk_hec_encode_all_meta_null(spark):
    # null time + no optional fields: meta renders '{}' — the splice must
    # still produce valid JSON ('{"event":...}'), not '{,"event":...}'.
    df = spark.createDataFrame([(None, '{"msg":"hi"}')], "t double, ev string")
    line = df.select(
        encode_splunk_hec(F.col("ev"), F.col("t")).alias("line")
    ).collect()[0]["line"]
    assert json.loads(line) == {"event": {"msg": "hi"}}


# --- prometheus remote-write ----------------------------------------------

def test_prom_remote_write_roundtrip_driver():
    """encode_write_request -> decode_write_request is lossless and the
    __name__ label lifts out as the metric name (remote_write.rs source
    semantics)."""
    from vector_spark.functions import (
        decode_write_request, encode_write_request,
    )
    series = [
        ("http_requests_total", {"job": "api", "code": "200"},
         [(1.0, 1600000000000), (2.5, 1600000001000)]),
        ("up", {}, [(1.0, 1600000002000)]),
    ]
    body = encode_write_request(series)
    got = decode_write_request(body)
    assert got == [
        ("http_requests_total", {"job": "api", "code": "200"}, 1.0, 1600000000000),
        ("http_requests_total", {"job": "api", "code": "200"}, 2.5, 1600000001000),
        ("up", {}, 1.0, 1600000002000),
    ]


def test_prom_remote_write_spark_path(spark):
    from vector_spark.functions import (
        encode_write_request, parse_prometheus_remote_write,
    )
    body = encode_write_request(
        [("m1", {"a": "x"}, [(3.25, 42)]), ("m2", {}, [(1.0, 43)])]
    )
    df = spark.createDataFrame([(bytearray(body),), (bytearray(b"junk"),)],
                               "b binary")
    out = df.select(
        F.posexplode_outer(parse_prometheus_remote_write(F.col("b")))
        .alias("i", "r")
    ).collect()
    rows = [(r["r"]["name"], dict(r["r"]["labels"] or {}), r["r"]["value"],
             r["r"]["ts_ms"]) for r in out if r["r"] is not None]
    assert ("m1", {"a": "x"}, 3.25, 42) in rows
    assert ("m2", {}, 1.0, 43) in rows
    assert len(rows) == 2  # the junk body decodes to no events


# --- docker multiplexed stream --------------------------------------------

def test_docker_stream_demux(spark):
    import struct
    from vector_spark.functions import frame_docker_stream

    def fr(st, payload):
        return bytes([st, 0, 0, 0]) + struct.pack(">I", len(payload)) + payload

    blob = fr(1, b"out line\n") + fr(2, b"err line\n") + fr(0, b"in")
    trunc = blob + fr(1, b"xxxx")[:6]  # truncated tail frame
    df = spark.createDataFrame([(bytearray(trunc),)], "b binary")
    out = df.select(
        F.explode(frame_docker_stream(F.col("b"))).alias("r")
    ).select("r.*").collect()
    assert [(r["stream"], r["payload"]) for r in out] == [
        ("stdout", "out line\n"), ("stderr", "err line\n"), ("stdin", "in"),
    ]
    # corrupt header byte stops the walk
    bad = bytes([7, 0, 0, 0, 0, 0, 0, 1]) + b"x"
    df2 = spark.createDataFrame([(bytearray(bad),)], "b binary")
    assert df2.select(
        frame_docker_stream(F.col("b")).alias("r")
    ).collect()[0]["r"] == []


# --- vector native protobuf -----------------------------------------------

def test_native_proto_log_roundtrip_driver():
    """Native-codec LogArray frames roundtrip through our event.proto
    registry; nested maps/arrays render as compact JSON, timestamps as
    epoch-us strings (the parse_native_json map<string,string> surface)."""
    from vector_spark.functions import decode_event_array, encode_native_logs

    frame = encode_native_logs([
        {"message": "hello", "seq": 7, "ok": True,
         "ctx": {"a": 1, "b": "x"}, "arr": ["p", 2]},
        {"message": "second", "n": 0},
    ])
    out = decode_event_array(frame)
    assert [o[0] for o in out] == ["log", "log"]
    f0 = out[0][1]
    assert f0["message"] == "hello" and f0["seq"] == "7" and f0["ok"] == "true"
    assert json.loads(f0["ctx"]) == {"a": "1", "b": "x"}
    assert json.loads(f0["arr"]) == ["p", "2"]
    assert out[1][1]["n"] == "0"  # proto3 zero still present (oneof)


def test_native_proto_log_value_form():
    """Modern Log.value frames (proto.rs:107-118): a Map value decodes
    identically to the deprecated fields form; a scalar value becomes
    the event root under '.'."""
    from vector_spark.functions import decode_event_array, encode_native_logs
    from vector_spark.functions.native_proto import _event_registry
    from vector_spark.functions import protobuf_py as pb

    evs = [{"message": "hello", "seq": 7, "ctx": {"a": 1}}]
    legacy = decode_event_array(encode_native_logs(evs))
    modern = decode_event_array(encode_native_logs(evs, use_value=True))
    assert legacy == modern

    # scalar (non-map) Log.value -> rendered under "."
    frame = pb.encode(
        {"logs": {"logs": [{"value": {"raw_bytes": b"just a line"}}]}},
        _event_registry(), "event.EventArray")
    out = decode_event_array(frame)
    assert out == [("log", {".": "just a line"},
                    None, None, None, None, None, None, None)]

    # value present AND legacy fields present -> value wins (proto.rs:107)
    frame = pb.encode(
        {"logs": {"logs": [{
            "fields": [{"key": "old", "value": {"raw_bytes": b"x"}}],
            "value": {"map": {"fields": [
                {"key": "new", "value": {"integer": 3}}]}},
        }]}},
        _event_registry(), "event.EventArray")
    assert decode_event_array(frame)[0][1] == {"new": "3"}


def test_native_proto_metrics_and_spark_path(spark):
    from vector_spark.functions import (
        encode_native_metrics, parse_native_proto,
    )

    frame = encode_native_metrics([
        {"name": "req_total", "namespace": "app", "kind": 0,
         "counter": 3.5, "tags": {"host": "h1"}, "ts_us": 1600000000123456},
        {"name": "temp", "kind": 1, "gauge": -2.25},
    ])
    df = spark.createDataFrame([(bytearray(frame),)], "b binary")
    out = df.select(
        F.explode(parse_native_proto(F.col("b"))).alias("r")
    ).select("r.*").collect()
    m0 = out[0]
    assert (m0["kind"], m0["metric_name"], m0["metric_namespace"]) == (
        "metric", "req_total", "app")
    assert m0["metric_kind"] == "incremental"
    assert m0["counter_value"] == 3.5 and m0["tag_host"] == "h1"
    assert m0["ts_us"] == 1600000000123456
    m1 = out[1]
    assert m1["metric_kind"] == "absolute" and m1["gauge_value"] == -2.25
    assert m1["tag_host"] is None


def test_datadog_ddtags_empty_members_and_trim(spark):
    """parse_ddtags exactness (logs.rs:219-238): empty members dropped,
    survivors trimmed."""
    payload = json.dumps([{
        "message": "m", "status": "info", "timestamp": 1,
        "hostname": "h", "service": "s", "ddsource": "d",
        "ddtags": " env:prod ,, team ,",
    }])
    out = _one(spark, payload, parse_datadog_logs)
    assert list(out[0]["tags"]) == ["env:prod", "team"]


# --- datadog agent sketch payload -----------------------------------------

def test_ddsketch_payload_roundtrip(spark):
    """SketchPayload decode incl. zigzag-negative bucket keys and the
    agent's gamma constants exposed for downstream sketch math."""
    from vector_spark.functions import (
        DDSKETCH_GAMMA, encode_sketch_payload, parse_sketch_payload,
    )

    assert DDSKETCH_GAMMA == 1.015625  # 1 + 2/128, binary-exact
    body = encode_sketch_payload([{
        "metric": "req.latency", "host": "web-1",
        "tags": ["env:prod", "svc:api"],
        "dogsketches": [
            {"ts": 1600000000, "cnt": 4, "min": 0.004, "max": 9.5,
             "avg": 2.5, "sum": 10.0, "k": [-1338, 0, 1338, 1400],
             "n": [1, 1, 1, 1]},
        ],
    }])
    df = spark.createDataFrame([(bytearray(body),), (bytearray(b"zz"),)],
                               "b binary")
    rows = df.select(
        F.explode(parse_sketch_payload(F.col("b"))).alias("r")
    ).select("r.*").collect()
    assert len(rows) == 1  # malformed body decodes to no events
    r = rows[0]
    assert r["metric"] == "req.latency" and r["host"] == "web-1"
    assert list(r["tags"]) == ["env:prod", "svc:api"]
    assert list(r["k"]) == [-1338, 0, 1338, 1400]  # zigzag survived
    assert list(r["n"]) == [1, 1, 1, 1]
    assert (r["cnt"], r["sum"]) == (4, 10.0)


# --- eventstoredb stats ---------------------------------------------------

def test_eventstoredb_stats_full(spark):
    """types.rs:19-147: 6 proc/sys metrics tagged id, 3 per-drive gauges
    tagged path (the one-key drive map); missing required fields -> no
    metrics at all (serde's all-or-nothing deserialize)."""
    from vector_spark.functions import parse_eventstoredb_stats

    doc = json.dumps({
        "proc": {
            "id": 4100, "mem": 842424320, "cpu": 12.5, "threadsCount": 33,
            "thrownExceptionsRate": 0.0,
            "diskIo": {"readBytes": 53248, "writtenBytes": 1073741824,
                       "readOps": 13, "writeOps": 91110},
        },
        "sys": {
            "freeMem": 2147483648, "loadavg": {"1m": 0.5, "5m": 0.7, "15m": 0.9},
            "drive": {"/var/lib/esdb": {
                "availableBytes": 48934416384, "totalBytes": 126353313792,
                "usage": "61%", "usedBytes": 77418897408}},
        },
    })
    df = spark.createDataFrame([(doc,)], "body string")
    out = df.select(F.explode(parse_eventstoredb_stats(F.col("body"))).alias("m")) \
        .select("m.*").collect()
    got = {(r["name"], r["path"]): (r["id"], r["mtype"], r["value"]) for r in out}
    assert len(got) == 9
    assert got[("process_memory_used_bytes", None)] == ("4100", "gauge", 842424320.0)
    assert got[("disk_read_bytes_total", None)] == ("4100", "counter", 53248.0)
    assert got[("disk_written_bytes_total", None)][2] == 1073741824.0
    assert got[("disk_read_ops_total", None)][2] == 13.0
    assert got[("disk_write_ops_total", None)][2] == 91110.0
    assert got[("memory_free_bytes", None)] == ("4100", "gauge", 2147483648.0)
    assert got[("disk_total_bytes", "/var/lib/esdb")][2] == 126353313792.0
    assert got[("disk_free_bytes", "/var/lib/esdb")][2] == 48934416384.0
    assert got[("disk_used_bytes", "/var/lib/esdb")][2] == 77418897408.0


def test_eventstoredb_stats_no_drive_and_invalid(spark):
    from vector_spark.functions import parse_eventstoredb_stats

    ok = json.dumps({
        "proc": {"id": 1, "mem": 5,
                 "diskIo": {"readBytes": 1, "writtenBytes": 2,
                            "readOps": 3, "writeOps": 4}},
        "sys": {"freeMem": 9},
    })
    missing = json.dumps({"proc": {"id": 1, "mem": 5}, "sys": {"freeMem": 9}})
    df = spark.createDataFrame(
        [(ok,), (missing,), ("not json",), (None,)], "body string")
    ns = [r["n"] for r in df.select(
        F.size(parse_eventstoredb_stats(F.col("body"))).alias("n")).collect()]
    assert ns == [6, 0, 0, 0]
