"""SaaS/service intake and sink wire formats: Datadog Agent log
payloads, AWS S3 event notifications (the aws_s3/aws_sqs source
envelope), GCP Pub/Sub message envelopes, Elasticsearch bulk-API
bodies, and Splunk HEC event encoding.

Reference relations (formats only — the HTTP/gRPC transports are out of
scope per SURVEY §2.4-2.5):

- Datadog logs:   src/sources/datadog_agent/mod.rs:561-573 (LogMsg),
                  logs.rs:84-170, parse_ddtags logs.rs:213-240
- S3 notification: src/sources/aws_s3/sqs.rs:609 (ObjectCreated gate),
                  920-1100 (S3EventRecord, url-encoded object keys,
                  '+'-as-space handling)
- GCP Pub/Sub:    src/sources/gcp_pubsub.rs (PubsubMessage: base64
                  data, attributes, messageId, publishTime)
- ES bulk:        src/sinks/elasticsearch/encoder.rs:146-210 (action
                  line + document NDJSON; modern suppressed-type form)
- Splunk HEC:     src/sinks/splunk_hec/logs/encoder.rs:18-60 (HecData:
                  event/fields/time + optional host/index/source/
                  sourcetype)

Everything here is pure Column expressions — zero Python, scan-speed,
no shuffle. Encoders emit one line/pair per event; batching bodies is
the sink's partitioned-batching concat (see loki_push_batches for the
per-label-set pattern)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DATADOG_LOGS_SCHEMA = (
    "array<struct<message:string, status:string, ts_ms:bigint,"
    " hostname:string, service:string, ddsource:string, ddtags:string,"
    " tags:array<string>>>"
)


def parse_datadog_logs(col: Column) -> Column:
    """Decode a Datadog Agent logs intake payload — a JSON ARRAY of
    LogMsg objects (mod.rs:561-573): message/status/hostname/service/
    ddsource/ddtags strings + epoch-millisecond timestamp. `tags` is
    the parse_ddtags=true rendering (logs.rs:213-240): the raw ddtags
    string split on ',' into bare tags and key:value members; empty ->
    empty array. Invalid payloads -> null (the reference 400s the whole
    request)."""
    j = F.from_json(
        col,
        "array<struct<message:string, status:string, timestamp:bigint,"
        " hostname:string, service:string, ddsource:string, ddtags:string>>",
    )
    def one(r):
        # parse_ddtags exactly (logs.rs:219-238): split ',', drop empty
        # members, TRIM each survivor; empty/missing input -> []
        tags = F.when(
            r["ddtags"].isNull() | (r["ddtags"] == ""),
            F.array().cast("array<string>"),
        ).otherwise(
            # lambda, not bare F.trim: trim(col, trim=None)'s optional
            # second parameter makes it misbind as a HOF callback
            F.transform(
                F.filter(F.split(r["ddtags"], ","), lambda t: t != ""),
                lambda t: F.trim(t),
            )
        )
        return F.struct(
            r["message"].alias("message"),
            r["status"].alias("status"),
            r["timestamp"].alias("ts_ms"),
            r["hostname"].alias("hostname"),
            r["service"].alias("service"),
            r["ddsource"].alias("ddsource"),
            r["ddtags"].alias("ddtags"),
            tags.alias("tags"),
        )
    return F.transform(j, one)


S3_EVENT_SCHEMA = (
    "array<struct<event_version:string, event_source:string,"
    " aws_region:string, event_kind:string, event_name:string,"
    " bucket:string, key:string>>"
)


def parse_s3_event_notification(col: Column) -> Column:
    """Decode an S3 event notification JSON body (sqs.rs:920-1100;
    public notification-content-structure doc): Records[] with
    eventVersion/eventSource/awsRegion/eventName and s3.bucket.name +
    s3.object.key. eventName splits at the first ':' into
    (event_kind, event_name) like the reference's S3EventName
    deserializer; the object key is form-url-decoded ('+' as space,
    then percent-decoding — the reference's urlencoded_string with its
    '+' special case). The reference processes only
    event_kind == 'ObjectCreated' (sqs.rs:609) — filter downstream."""
    j = F.from_json(
        col,
        "struct<Records:array<struct<eventVersion:string,"
        " eventSource:string, awsRegion:string, eventName:string,"
        " s3:struct<bucket:struct<name:string>,"
        " object:struct<key:string>>>>>",
    )
    def one(r):
        return F.struct(
            r["eventVersion"].alias("event_version"),
            r["eventSource"].alias("event_source"),
            r["awsRegion"].alias("aws_region"),
            F.regexp_extract(r["eventName"], "^([^:]*)", 1).alias("event_kind"),
            F.regexp_extract(r["eventName"], "^[^:]*:(.*)$", 1).alias("event_name"),
            r["s3"]["bucket"]["name"].alias("bucket"),
            F.try_url_decode(r["s3"]["object"]["key"]).alias("key"),
        )
    return F.transform(j["Records"], one)


PUBSUB_SCHEMA = (
    "struct<data:string, attributes:map<string,string>,"
    " message_id:string, publish_ts_us:bigint, subscription:string>"
)


def parse_pubsub_envelope(col: Column) -> Column:
    """Decode a GCP Pub/Sub received-message envelope (the JSON
    rendering of gcp_pubsub.rs's PubsubMessage: base64 `data`,
    `attributes`, `messageId`, RFC-3339 `publishTime`, plus the
    delivering `subscription`). `data` is base64-decoded to UTF-8; run
    the configured codec over it downstream, as the source does."""
    j = F.from_json(
        col,
        "struct<message:struct<data:string,"
        " attributes:map<string,string>, messageId:string,"
        " publishTime:string>, subscription:string>",
    )
    pub = F.regexp_replace(j["message"]["publishTime"], r"(\.\d{6})\d+", r"$1")
    return F.struct(
        F.unbase64(j["message"]["data"]).cast("string").alias("data"),
        j["message"]["attributes"].alias("attributes"),
        j["message"]["messageId"].alias("message_id"),
        F.unix_micros(F.try_to_timestamp(pub)).alias("publish_ts_us"),
        j["subscription"].alias("subscription"),
    )


def encode_elasticsearch_bulk(
    doc_json: Column,
    index: Column,
    doc_id: Column | None = None,
    action: str = "index",
) -> Column:
    """Encode one event as its Elasticsearch bulk-API pair — the action
    line then the document, newline-terminated (encoder.rs:146-210,
    modern suppressed-type form: `{"index":{"_index":"i","_id":"x"}}`
    or without `_id` when none). Concatenate per batch for the request
    body; `action` is index/create per the sink's bulk.action config."""
    head = F.concat(
        F.lit('{"' + action + '":{"_index":"'), index, F.lit('"'),
        F.when(
            doc_id.isNotNull(), F.concat(F.lit(',"_id":"'), doc_id, F.lit('"'))
        ).otherwise(F.lit(""))
        if doc_id is not None else F.lit(""),
        F.lit("}}"),
    )
    return F.concat(head, F.lit("\n"), doc_json, F.lit("\n"))


ES_BULK_SCHEMA = (
    "array<struct<action:string, index:string, doc_id:string, doc:string>>"
)


def parse_elasticsearch_bulk(col: Column) -> Column:
    """Decode an Elasticsearch bulk body back into (action, _index,
    _id, doc) rows — the encoder's inverse for roundtrip testing and
    bulk-request auditing. Assumes the to-spec layout: alternating
    action/document lines (action lines with no source document —
    delete — are not produced by the sink and are skipped)."""
    lines = F.filter(F.split(col, "\n"), lambda l: l != "")
    # sequence() rejects start>stop with a positive step — guard empties
    idx = F.when(
        F.size(lines) >= 2,
        F.sequence(F.lit(0), F.size(lines) - 2, F.lit(2)),
    ).otherwise(F.array().cast("array<int>"))
    def pair(i):
        a = F.element_at(lines, i + 1)
        d = F.element_at(lines, i + 2)
        aj = F.from_json(
            a,
            "map<string,struct<`_index`:string, `_id`:string>>",
        )
        key = F.element_at(F.map_keys(aj), 1)
        ent = F.element_at(F.map_values(aj), 1)
        return F.struct(
            key.alias("action"),
            ent["_index"].alias("index"),
            ent["_id"].alias("doc_id"),
            d.alias("doc"),
        )
    return F.transform(idx, pair)


def encode_splunk_hec(
    event_json: Column,
    time_sec: Column,
    host: Column | None = None,
    source: Column | None = None,
    sourcetype: Column | None = None,
    index: Column | None = None,
) -> Column:
    """Encode one event as a Splunk HEC event-endpoint JSON object
    (splunk_hec/logs/encoder.rs:18-60 HecData: `event` + fractional
    epoch-second `time` + optional host/source/sourcetype/index, absent
    fields omitted like the None-skipping serializer). `event_json`
    carries the already-encoded event payload (object or string);
    `time_sec` is seconds with fraction — render with enough decimals
    upstream (the reference serializes f64)."""
    fields = [time_sec.cast("decimal(18,6)").alias("time")]
    for name, c in (("host", host), ("source", source),
                    ("sourcetype", sourcetype), ("index", index)):
        if c is not None:
            fields.append(c.alias(name))
    meta = F.to_json(F.struct(*fields))  # null fields omitted, like serde
    # splice the pre-encoded event payload into the rendered object:
    # {"time":...,"host":...} -> {"time":...,"host":...,"event":<json>}
    # When every optional field is null, to_json renders "{}" and a
    # comma splice would emit invalid '{,"event":...}' — the separator
    # is chosen per row and substituted for the closing brace in ONE
    # regexp pass (a second pass doubled the NFA cost, bench-measured).
    sep = F.when(meta == "{}", F.lit('"event":')).otherwise(F.lit(',"event":'))
    return F.concat(
        F.regexp_replace(meta, r"\}\z", sep), event_json, F.lit("}"),
    )


EVENTSTORE_METRIC_SCHEMA = (
    "array<struct<id:string, name:string, mtype:string, value:double,"
    " path:string>>"
)

_EVENTSTORE_STATS_SCHEMA = (
    "struct<proc:struct<id:bigint, mem:double,"
    " diskIo:struct<readBytes:double, writtenBytes:double,"
    " readOps:double, writeOps:double>>,"
    " sys:struct<freeMem:double,"
    " drive:map<string,struct<availableBytes:double, totalBytes:double,"
    " usedBytes:double>>>>"
)


def parse_eventstoredb_stats(col: Column) -> Column:
    """EventStoreDB /stats document -> metric rows (eventstoredb_metrics/
    types.rs:19-147): the 6 always-present proc/sys metrics
    (process_memory_used_bytes gauge, disk read/written bytes + ops
    counters, memory_free_bytes gauge) tagged id=proc.id, plus 3
    disk_total/free/used_bytes gauges per mounted drive (the one-key
    `drive` map whose KEY is the path tag). Like serde's all-or-required
    deserialize, a document missing any required proc/sys field yields
    NO metrics. Pure from_json + expression fold, zero Python."""
    s = F.from_json(col, _EVENTSTORE_STATS_SCHEMA)
    proc, sys_ = s["proc"], s["sys"]
    io = proc["diskIo"]
    empty = F.array().cast(EVENTSTORE_METRIC_SCHEMA)
    cid = proc["id"].cast("string")
    null_s = F.lit(None).cast("string")

    def mk(name, mtype, value, path=null_s):
        return F.struct(
            cid.alias("id"), F.lit(name).alias("name"),
            F.lit(mtype).alias("mtype"), value.alias("value"),
            path.alias("path"),
        )

    base = F.array(
        mk("process_memory_used_bytes", "gauge", proc["mem"]),
        mk("disk_read_bytes_total", "counter", io["readBytes"]),
        mk("disk_written_bytes_total", "counter", io["writtenBytes"]),
        mk("disk_read_ops_total", "counter", io["readOps"]),
        mk("disk_write_ops_total", "counter", io["writeOps"]),
        mk("memory_free_bytes", "gauge", sys_["freeMem"]),
    )
    drives = F.flatten(F.transform(
        F.map_entries(F.coalesce(
            sys_["drive"],
            F.create_map().cast(
                "map<string,struct<availableBytes:double, totalBytes:double,"
                " usedBytes:double>>"),
        )),
        lambda kv: F.array(
            mk("disk_total_bytes", "gauge", kv["value"]["totalBytes"],
               path=kv["key"]),
            mk("disk_free_bytes", "gauge", kv["value"]["availableBytes"],
               path=kv["key"]),
            mk("disk_used_bytes", "gauge", kv["value"]["usedBytes"],
               path=kv["key"]),
        ),
    ))
    required_ok = (
        proc.isNotNull() & sys_.isNotNull() & io.isNotNull()
        & proc["id"].isNotNull() & proc["mem"].isNotNull()
        & io["readBytes"].isNotNull() & io["writtenBytes"].isNotNull()
        & io["readOps"].isNotNull() & io["writeOps"].isNotNull()
        & sys_["freeMem"].isNotNull()
    )
    return F.when(required_ok, F.concat(base, drives)).otherwise(empty)
