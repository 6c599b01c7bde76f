"""VRL function surface + codec (framing/serde) contract queries + oracles."""

from .common import *  # noqa: F401,F403
from .common import _t, _dsum, DSUM_SQL, ROUTES
from .common import _BP_NAV, _BP_LEAD, _BP_TAIL  # noqa: F401
from vector_spark.session import ensure_parallelism
from .oracle_helpers import (  # noqa: F401
    _boilerplate_sql,
    _hexval_sql,
    _simhash_sql,
    _minhash_sql,
    _aggregate_sketch_sql,
    _langid_sql,
    _repetition_sql,
    _ann_lsh_sql,
    _near_dup_sql,
    _html_text_sql,
)

def q_codec_warc(spark, sf_dir):
    """WARC (ISO 28500) framing + record parse: each events row becomes a
    two-record WARC stream (response carrying props as the payload,
    metadata carrying event_type), framed by Content-Length byte counts
    and parsed back field-exact. The oracle reconstructs the expected
    records directly from the source columns (the codec_framing_octet
    pattern)."""
    from vector_spark.functions import frame_warc, parse_warc_record
    from vector_spark.session import ensure_parallelism

    # Arrow-batched byte walk + header regexes: spread the single split
    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    date_str = F.date_format(
        F.date_trunc("second", F.col("ts").cast("timestamp")),
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
    )
    buf = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://crawl.example/"),
        F.col("event_id").cast("string"),
        F.lit("\r\nWARC-Date: "),
        date_str,
        F.lit("\r\nWARC-Record-ID: <urn:uuid:id-"),
        F.col("event_id").cast("string"),
        F.lit(">\r\nContent-Type: application/json\r\nContent-Length: "),
        F.octet_length("props").cast("string"),
        F.lit("\r\n\r\n"),
        F.col("props"),
        F.lit("\r\n\r\nWARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: "),
        F.octet_length("event_type").cast("string"),
        F.lit("\r\n\r\n"),
        F.col("event_type"),
        F.lit("\r\n\r\n"),
    )
    recs = e.select(
        "event_id", F.posexplode(frame_warc(buf)).alias("idx", "rec")
    )
    return recs.select(
        "event_id",
        "idx",
        parse_warc_record(F.col("rec")).alias("w"),
    ).select(
        "event_id",
        "idx",
        F.col("w.warc_type").alias("warc_type"),
        F.col("w.target_uri").alias("target_uri"),
        F.unix_micros(F.col("w.warc_date")).alias("warc_date_us"),
        F.col("w.record_id").alias("record_id"),
        F.col("w.content_type").alias("content_type"),
        F.col("w.content_length").alias("content_length"),
        F.col("w.payload").alias("payload"),
    )


def q_codec_otlp(spark, sf_dir):
    """OTLP LogsData JSON decode: each events row becomes a LogsData
    envelope (resource attrs incl. an int64-as-string host.id, one scope,
    TWO logRecords — a typed-attribute main record and a sparse heartbeat
    whose missing attrs must surface as nulls), flattened by
    parse_otlp_logs' nested higher-order transforms. The oracle rebuilds
    the expected records from the source columns (the codec_warc
    pattern), so the triple-nesting collapse, AnyValue first-present-wins
    attr map, and proto3 string-int64 casts are what get verified."""
    from vector_spark.functions import parse_otlp_logs
    from vector_spark.session import ensure_parallelism

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    eid = F.col("event_id").cast("string")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    sev_n = (
        F.when(F.col("event_type") == "error", F.lit(17))
        .when(F.col("event_type") == "signup", F.lit(9))
        .otherwise(F.lit(5))
    )
    sev_t = (
        F.when(F.col("event_type") == "error", F.lit("ERROR"))
        .when(F.col("event_type") == "signup", F.lit("INFO"))
        .otherwise(F.lit("DEBUG"))
    )
    doc = F.concat(
        F.lit('{"resourceLogs":[{"resource":{"attributes":['
              '{"key":"service.name","value":{"stringValue":"svc-'),
        (F.col("user_id") % 5).cast("string"),
        F.lit('"}},{"key":"host.id","value":{"intValue":"'),
        F.col("user_id").cast("string"),
        F.lit('"}}]},"scopeLogs":[{"scope":{"name":"vector","version":"1.'),
        (F.col("event_id") % 3).cast("string"),
        F.lit('"},"logRecords":[{"timeUnixNano":"'),
        (us * 1000).cast("string"),
        F.lit('","severityNumber":'),
        sev_n.cast("string"),
        F.lit(',"severityText":"'),
        sev_t,
        F.lit('","body":{"stringValue":"'),
        F.col("event_type"), F.lit(" #"), eid,
        F.lit('"},"attributes":[{"key":"k","value":{"intValue":"'),
        (F.col("event_id") % 100).cast("string"),
        F.lit('"}},{"key":"value","value":{"doubleValue":'),
        F.col("value").cast("string"),
        F.lit('}},{"key":"ok","value":{"boolValue":'),
        F.when(F.col("event_id") % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit('}}]},{"timeUnixNano":"'),
        ((us + 1000) * 1000).cast("string"),
        F.lit('","severityNumber":5,"severityText":"DEBUG",'
              '"body":{"stringValue":"heartbeat"},'
              '"attributes":[{"key":"k","value":{"intValue":"'),
        (F.col("event_id") % 100).cast("string"),
        F.lit('"}}]}]}]}]}'),
    )
    recs = e.select(
        "event_id", F.posexplode(parse_otlp_logs(doc)).alias("rec_idx", "r")
    )
    return recs.select(
        "event_id",
        "rec_idx",
        F.expr("r.time_unix_nano DIV 1000").alias("ts_us"),
        F.col("r.severity_number").alias("severity_number"),
        F.col("r.severity_text").alias("severity_text"),
        F.col("r.body").alias("body"),
        F.element_at("r.resource_attributes", F.lit("service.name")).alias("service"),
        F.element_at("r.resource_attributes", F.lit("host.id")).try_cast("long").alias("host_id"),
        F.col("r.scope_version").alias("scope_version"),
        F.element_at("r.attributes", F.lit("k")).try_cast("long").alias("k"),
        F.element_at("r.attributes", F.lit("value")).try_cast("double").alias("val"),
        F.element_at("r.attributes", F.lit("ok")).try_cast("boolean").alias("ok"),
    )


def q_codec_splunk_hec(spark, sf_dir):
    """Splunk HEC event JSON decode: each events row becomes a collector
    payload — string `time` with a binary-exact .5 fraction on odd ids
    (both engines land on the same epoch-us), a string event for
    event_id%3!=0 and an OBJECT event otherwise (must surface in
    event_obj with the string side null — NOT as the object's raw JSON),
    HEC indexed fields. Oracle = ground-truth rows from the source
    columns."""
    from vector_spark.functions import parse_splunk_hec
    from vector_spark.session import ensure_parallelism

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    eid = F.col("event_id").cast("string")
    secs = F.unix_timestamp(F.date_trunc("second", F.col("ts").cast("timestamp")))
    time_s = F.concat(
        secs.cast("string"),
        F.when(F.col("event_id") % 2 == 1, F.lit(".5")).otherwise(F.lit("")),
    )
    str_event = F.concat(F.lit('"'), F.col("event_type"), F.lit(" #"), eid, F.lit('"'))
    obj_event = F.concat(
        F.lit('{"msg":"'), F.col("event_type"),
        F.lit('","code":"'), (F.col("event_id") % 7).cast("string"), F.lit('"}'),
    )
    doc = F.concat(
        F.lit('{"time": "'), time_s,
        F.lit('", "host": "h'), (F.col("user_id") % 7).cast("string"),
        F.lit('", "source": "app'), (F.col("user_id") % 3).cast("string"),
        F.lit('", "sourcetype": "_json", "index": "'),
        F.when(F.col("event_id") % 4 == 0, F.lit("ops")).otherwise(F.lit("main")),
        F.lit('", "fields": {"k": "'), (F.col("event_id") % 100).cast("string"),
        F.lit('", "region": "r'), (F.col("user_id") % 4).cast("string"),
        F.lit('"}, "event": '),
        F.when(F.col("event_id") % 3 == 0, obj_event).otherwise(str_event),
        F.lit("}"),
    )
    r = e.select("event_id", parse_splunk_hec(doc).alias("r"))
    return r.select(
        "event_id",
        F.unix_micros(F.col("r.ts")).alias("ts_us"),
        F.col("r.host").alias("host"),
        F.col("r.source").alias("source"),
        F.col("r.sourcetype").alias("sourcetype"),
        F.col("r.index_name").alias("index_name"),
        F.col("r.event").alias("event"),
        F.element_at("r.event_obj", F.lit("msg")).alias("msg"),
        F.element_at("r.event_obj", F.lit("code")).try_cast("long").alias("code"),
        F.element_at("r.fields", F.lit("k")).try_cast("long").alias("k"),
        F.element_at("r.fields", F.lit("region")).alias("region"),
    )


def q_codec_otlp_metrics(spark, sf_dir):
    """OTLP MetricsData decode: per events row, one gauge point
    (asDouble, a typed point attribute) + a cumulative monotonic sum with
    TWO points (asInt-as-string) — three flattened rows per event whose
    kind/temporality split mirrors the reference's Absolute/Incremental
    MetricKind. Oracle = ground-truth rows from the source columns."""
    from vector_spark.functions import parse_otlp_metrics
    from vector_spark.session import ensure_parallelism

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    doc = F.concat(
        F.lit('{"resourceMetrics":[{"resource":{"attributes":['
              '{"key":"service.name","value":{"stringValue":"svc-'),
        (F.col("user_id") % 5).cast("string"),
        F.lit('"}}]},"scopeMetrics":[{"scope":{"name":"vector"},"metrics":['
              '{"name":"evt.value","unit":"ms","gauge":{"dataPoints":['
              '{"timeUnixNano":"'),
        (us * 1000).cast("string"),
        F.lit('","asDouble":'),
        F.col("value").cast("string"),
        F.lit(',"attributes":[{"key":"core","value":{"intValue":"'),
        (F.col("user_id") % 4).cast("string"),
        F.lit('"}}]}]}},{"name":"evt.count","sum":{"aggregationTemporality":2,'
              '"isMonotonic":true,"dataPoints":[{"timeUnixNano":"'),
        (us * 1000).cast("string"),
        F.lit('","asInt":"'),
        (F.col("event_id") % 100).cast("string"),
        F.lit('"},{"timeUnixNano":"'),
        ((us + 1000) * 1000).cast("string"),
        F.lit('","asInt":"'),
        (F.col("event_id") % 100 + 1).cast("string"),
        F.lit('"}]}}]}]}]}'),
    )
    recs = e.select(
        "event_id", F.posexplode(parse_otlp_metrics(doc)).alias("dp_idx", "r")
    )
    return recs.select(
        "event_id",
        "dp_idx",
        F.col("r.metric_name").alias("metric_name"),
        F.col("r.unit").alias("unit"),
        F.col("r.kind").alias("kind"),
        F.col("r.temporality").alias("temporality"),
        F.col("r.monotonic").alias("monotonic"),
        F.expr("r.time_unix_nano DIV 1000").alias("ts_us"),
        F.col("r.value").alias("value"),
        F.element_at("r.attributes", F.lit("core")).try_cast("long").alias("core"),
        F.element_at("r.resource_attributes", F.lit("service.name")).alias("service"),
    )


def q_codec_otlp_traces(spark, sf_dir):
    """OTLP TracesData decode: per events row a root SERVER span (status
    code 2 + message on error events, absent status otherwise -> nulls)
    and a child span transmitted with an UPPERCASE hex spanId (must
    lowercase) parented on the root — md5-derived ids both engines
    compute identically. Completes the Log/Metric/Trace triad."""
    from vector_spark.functions import parse_otlp_traces
    from vector_spark.session import ensure_parallelism

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    eid = F.col("event_id").cast("string")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    trace_id = F.md5(F.concat(F.lit("tr|"), eid))
    root_id = F.substring(F.md5(F.concat(F.lit("sp|"), eid)), 1, 16)
    child_id = F.substring(F.md5(F.concat(F.lit("sp2|"), eid)), 1, 16)
    dur = (F.col("event_id") % 1000 + 1) * 1000
    status = F.when(
        F.col("event_type") == "error",
        F.lit(',"status":{"code":2,"message":"boom"}'),
    ).otherwise(F.lit(""))
    doc = F.concat(
        F.lit('{"resourceSpans":[{"resource":{"attributes":['
              '{"key":"service.name","value":{"stringValue":"svc-'),
        (F.col("user_id") % 5).cast("string"),
        F.lit('"}}]},"scopeSpans":[{"scope":{"name":"vector"},"spans":['
              '{"traceId":"'), trace_id,
        F.lit('","spanId":"'), root_id,
        F.lit('","name":"'), F.col("event_type"),
        F.lit('-root","kind":2,"startTimeUnixNano":"'), (us * 1000).cast("string"),
        F.lit('","endTimeUnixNano":"'), (us * 1000 + dur).cast("string"),
        F.lit('"'), status,
        F.lit('},{"traceId":"'), trace_id,
        F.lit('","spanId":"'), F.upper(child_id),
        F.lit('","parentSpanId":"'), root_id,
        F.lit('","name":"db.query","kind":3,"startTimeUnixNano":"'),
        (us * 1000 + 500).cast("string"),
        F.lit('","endTimeUnixNano":"'), (us * 1000 + dur - 100).cast("string"),
        F.lit('","attributes":[{"key":"db","value":{"stringValue":"pg"}}]}]}]}]}'),
    )
    recs = e.select(
        "event_id", F.posexplode(parse_otlp_traces(doc)).alias("span_idx", "r")
    )
    return recs.select(
        "event_id",
        "span_idx",
        F.col("r.trace_id").alias("trace_id"),
        F.col("r.span_id").alias("span_id"),
        F.col("r.parent_span_id").alias("parent_span_id"),
        F.col("r.name").alias("name"),
        F.col("r.kind").alias("kind"),
        F.expr("r.start_unix_nano DIV 1000").alias("start_us"),
        F.col("r.duration_nano").alias("duration_nano"),
        F.col("r.status_code").alias("status_code"),
        F.col("r.status_message").alias("status_message"),
        F.element_at("r.attributes", F.lit("db")).alias("db"),
        F.element_at("r.resource_attributes", F.lit("service.name")).alias("service"),
    )


def q_codec_statsd(spark, sf_dir):
    """statsd/DogStatsD line decode over four planted shapes per
    event_id%4: sampled tagged counter / relative gauge (delta=true) /
    double-valued timer / malformed line (null-name struct). Oracle =
    ground-truth rows from the same arithmetic."""
    from vector_spark.functions import parse_statsd
    from vector_spark.session import ensure_parallelism

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    name = F.concat(F.lit("evt."), F.col("event_type"))
    m = F.col("event_id") % 4
    line = (
        F.when(m == 0, F.concat(
            name, F.lit(":"), (F.col("event_id") % 50).cast("string"),
            F.lit("|c|@0.5|#env:prod,u:u"), (F.col("user_id") % 5).cast("string"),
        ))
        .when(m == 1, F.concat(
            name, F.lit(":+"), (F.col("event_id") % 9 + 1).cast("string"), F.lit("|g"),
        ))
        .when(m == 2, F.concat(
            name, F.lit(":"), F.col("value").cast("string"), F.lit("|ms"),
        ))
        .otherwise(F.concat(name, F.lit(":oops")))
    )
    r = e.select("event_id", parse_statsd(line).alias("r"))
    return r.select(
        "event_id",
        F.col("r.name").alias("name"),
        F.col("r.value").alias("value"),
        F.col("r.metric_type").alias("metric_type"),
        F.col("r.sample_rate").alias("sample_rate"),
        F.col("r.delta").alias("delta"),
        F.element_at("r.tags", F.lit("env")).alias("env"),
        F.element_at("r.tags", F.lit("u")).alias("u_tag"),
    )


def q_codec_prometheus(spark, sf_dir):
    """Prometheus text-exposition decode: per events row a scrape body
    with a labeled+timestamped gauge sample and a FULL histogram family
    (_bucket x2 incl. le="+Inf", _sum with a binary-exact .5, _count) —
    5 flattened samples whose family/TYPE/HELP attach is the tested
    surface. Oracle = ground-truth rows from the source columns."""
    from vector_spark.functions import parse_prometheus_text
    from vector_spark.session import ensure_parallelism

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    body = F.concat(
        F.lit("# HELP evt_value Latest value.\n# TYPE evt_value gauge\n"
              'evt_value{type="'),
        F.col("event_type"),
        F.lit('",u="'), (F.col("user_id") % 5).cast("string"),
        F.lit('"} '), F.col("value").cast("string"),
        F.lit(" "), ms.cast("string"),
        F.lit("\n# TYPE evt_lat histogram\n"
              'evt_lat_bucket{le="0.5"} '),
        (F.col("event_id") % 10).cast("string"),
        F.lit('\nevt_lat_bucket{le="+Inf"} '),
        (F.col("event_id") % 10 + 3).cast("string"),
        F.lit("\nevt_lat_sum "), (F.col("event_id") % 100).cast("string"),
        F.lit(".5\nevt_lat_count "), (F.col("event_id") % 10 + 3).cast("string"),
    )
    out = parse_prometheus_text(
        e.select(F.col("event_id").alias("scrape_id"), body.alias("body")),
        "body",
        ("scrape_id",),
    )
    return out.select(
        F.col("scrape_id").alias("event_id"),
        "line_pos",
        "name",
        "family",
        F.element_at("labels", F.lit("le")).alias("le"),
        F.element_at("labels", F.lit("u")).alias("u_label"),
        "value",
        "ts_ms",
        "metric_type",
        "help",
    )


def q_codec_loki(spark, sf_dir):
    """Loki push roundtrip: events batched into per-label-set push bodies
    (the sink's partitioned-batching shape, entries time-ordered inside
    each stream) then parsed back and flattened — the trip must be
    lossless for the row hashes to meet the per-event ground truth (the
    codec_warc convention: build+decode on the Spark side, oracle by
    construction)."""
    from vector_spark.functions import loki_push_batches, parse_loki_push
    from vector_spark.session import ensure_parallelism

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    rows = e.select(
        F.concat(F.lit("a"), (F.col("user_id") % 3).cast("string")).alias("app"),
        F.col("event_type").alias("level"),
        (F.unix_micros(F.col("ts").cast("timestamp")) * 1000).alias("ts_ns"),
        F.concat(F.col("event_id").cast("string"), F.lit(":"), F.col("props")).alias("line"),
    )
    batches = loki_push_batches(rows, ("app", "level"))
    back = batches.select(
        F.posexplode(parse_loki_push(F.col("body"))).alias("_i", "r")
    )
    return back.select(
        F.element_at("r.labels", F.lit("app")).alias("app"),
        F.element_at("r.labels", F.lit("level")).alias("level"),
        F.col("r.ts_ns").alias("ts_ns"),
        F.col("r.line").alias("line"),
    )


def q_codec_fluent(spark, sf_dir):
    """Fluent Forward decode across all three event modes, one per
    event_id%3: Message [tag,time,record] / Forward with an EventTime
    fixext8 first entry + plain-seconds second / PackedForward (bin8 of
    the two-entry msgpack stream). The wire bytes are built with PURE HEX
    EXPRESSIONS (the codec_netflow_v9 convention — no Python on the
    build side), so the Arrow msgpack walker is the only decoder in the
    loop and the oracle recomputes the expected entries straight from
    the events table."""
    from vector_spark.functions import parse_fluent_forward
    from vector_spark.session import ensure_parallelism

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    eid = F.col("event_id")

    def hx(col, nbytes):
        return F.lpad(F.lower(F.hex(col)), nbytes * 2, "0")

    def fixstr(col):
        return F.concat(hx(F.length(col) + 160, 1), F.lower(F.hex(col)))

    tag = F.concat(F.lit("app."), F.col("event_type"))
    secs = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000).cast("long")
    nsec = (eid % 1_000_000).cast("long")
    v100 = F.round(F.col("value") * 100).cast("long")
    sech = F.concat(F.lit("ce"), hx(secs, 4))
    sech2 = F.concat(F.lit("ce"), hx(secs + 1, 4))
    evtime = F.concat(F.lit("d700"), hx(secs, 4), hx(nsec, 4))
    rechex = F.concat(
        F.lit("83"),
        F.lit("a26964"), F.lit("cf"), hx(eid, 8),
        F.lit("a474797065"), fixstr(F.col("event_type")),
        F.lit("a476313030"), F.lit("ce"), hx(v100, 4),
    )
    mode0 = F.concat(F.lit("93"), fixstr(tag), sech, rechex)
    mode1 = F.concat(
        F.lit("92"), fixstr(tag), F.lit("92"),
        F.lit("92"), evtime, rechex,
        F.lit("92"), sech2, rechex,
    )
    stream = F.concat(F.lit("92"), sech, rechex, F.lit("92"), sech2, rechex)
    mode2 = F.concat(
        F.lit("92"), fixstr(tag),
        F.lit("c4"), hx((F.length(stream) / 2).cast("int"), 1), stream,
    )
    buf = F.unhex(
        F.when(eid % 3 == 0, mode0).when(eid % 3 == 1, mode1).otherwise(mode2)
    )
    out = e.select(
        "event_id", F.posexplode(parse_fluent_forward(buf)).alias("entry_idx", "r")
    )
    return out.select(
        "event_id",
        "entry_idx",
        F.col("r.tag").alias("tag"),
        F.col("r.ts_sec").alias("ts_sec"),
        F.col("r.ts_nsec").alias("ts_nsec"),
        F.element_at("r.record", F.lit("id")).try_cast("long").alias("id"),
        F.element_at("r.record", F.lit("type")).alias("type"),
        F.element_at("r.record", F.lit("v100")).try_cast("long").alias("v100"),
    )


def q_vrl_parse_syslog(spark, sf_dir):
    """Round-trip: build RFC3164 lines from event columns, parse them back.
    The oracle computes the expected fields directly from the columns, so a
    parse bug cannot cancel out."""
    from vector_spark.functions import parse_syslog

    e = _t(spark, sf_dir, "events")
    line = F.format_string(
        "<%d>Oct 11 22:14:15 host%d app%d[%d]: event %s",
        (F.col("event_id") % 192).cast("int"),
        F.col("user_id"),
        (F.col("user_id") % 7).cast("int"),
        F.col("event_id"),
        F.col("event_type"),
    )
    parsed = parse_syslog(line)
    return e.select(
        "event_id",
        parsed["facility"].alias("facility"),
        parsed["severity"].alias("severity"),
        parsed["hostname"].alias("hostname"),
        parsed["appname"].alias("appname"),
        parsed["procid"].cast("long").alias("procid"),
        parsed["message"].alias("message"),
    )


def q_vrl_parse_grok(spark, sf_dir):
    """Grok parse of synthesized access-log lines — inline refs with a
    `:float` type suffix (%{NUMBER:millis:float}) AND the vendored-core
    aliased %{COMBINEDAPACHELOG} (recursive expansion through
    COMMONAPACHELOG -> HTTPDUSER -> EMAILADDRESS); oracle constructs
    expected fields directly."""
    from vector_spark.functions import parse_grok

    e = _t(spark, sf_dir, "events")
    line = F.format_string(
        "10.0.%d.%d GET_%s /api/u%d %d.5 trailing",
        (F.col("user_id") % 256).cast("int"),
        (F.col("event_id") % 256).cast("int"),
        F.col("event_type"),
        F.col("user_id"),
        F.col("event_id"),
    )
    p = parse_grok(
        line, "%{IP:client} %{WORD:method} %{URIPATH:path} %{NUMBER:millis:float}"
    )
    apache = F.format_string(
        '10.1.%d.%d - user%d [10/Oct/2000:13:55:36 -0700] "GET /r%d HTTP/1.1" %d %d "http://e/ref" "ua/1.0"',
        (F.col("user_id") % 200).cast("int"),
        (F.col("event_id") % 256).cast("int"),
        F.col("user_id"),
        F.col("event_id"),
        (F.lit(200) + (F.col("event_id") % 3) * 100).cast("int"),
        (F.col("event_id") % 1000).cast("int"),
    )
    a = parse_grok(apache, "%{COMBINEDAPACHELOG}")
    return e.select(
        "event_id",
        p["client"].alias("client"),
        p["method"].alias("method"),
        p["path"].alias("path"),
        p["millis"].alias("millis"),  # already double via the :float suffix
        a["clientip"].alias("clientip"),
        a["auth"].alias("auth"),
        a["verb"].alias("verb"),
        a["request"].alias("request"),
        a["response"].cast("long").alias("response"),
        a["bytes"].cast("long").alias("bytes"),
        a["referrer"].alias("referrer"),
        a["agent"].alias("agent"),
    )


def q_vrl_case_strings(spark, sf_dir):
    from vector_spark.functions import kebabcase, pascalcase, snakecase, truncate

    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        snakecase(F.col("c_name")).alias("snake"),
        kebabcase(F.col("c_name")).alias("kebab"),
        pascalcase(F.col("c_mktsegment")).alias("pascal_seg"),
        truncate(F.col("c_name"), 12, "...").alias("short_name"),
    )


def q_vrl_ip_functions(spark, sf_dir):
    from vector_spark.functions import ip_aton, ip_cidr_contains, ip_ntoa, ip_subnet

    e = _t(spark, sf_dir, "events")
    ip = F.format_string(
        "10.%d.%d.%d",
        (F.col("user_id") % 128).cast("int"),
        (F.col("event_id") % 256).cast("int"),
        ((F.col("event_id") * 7) % 256).cast("int"),
    )
    return e.select(
        "event_id",
        ip.alias("ip"),
        ip_aton(ip).alias("ip_num"),
        ip_ntoa(ip_aton(ip)).alias("ip_roundtrip"),
        ip_cidr_contains("10.0.0.0/10", ip).alias("in_lower_half"),
        ip_subnet(ip, 16).alias("subnet16"),
    )


def q_vrl_ipv6_functions(spark, sf_dir):
    """IPv6 family: expand-to-canonical of a compressed hex address,
    IPv4 -> mapped-IPv6, mapped-IPv6 -> IPv4 (dotted-tail form)."""
    from vector_spark.functions import ip_to_ipv6, ipv6_expand, ipv6_to_ipv4

    e = _t(spark, sf_dir, "events")
    ip4 = F.format_string(
        "10.%d.%d.%d",
        (F.col("user_id") % 128).cast("int"),
        (F.col("event_id") % 256).cast("int"),
        ((F.col("event_id") * 7) % 256).cast("int"),
    )
    v6 = F.format_string(
        "2001:db8::%x:%x",
        (F.col("user_id") % 65536).cast("int"),
        (F.col("event_id") % 65536).cast("int"),
    )
    mapped = F.concat(F.lit("::ffff:"), ip4)
    return e.select(
        "event_id",
        v6.alias("v6"),
        ipv6_expand(v6).alias("v6_full"),
        ip_to_ipv6(ip4).alias("mapped"),
        ipv6_to_ipv4(mapped).alias("unmapped"),
    )


def q_vrl_encode(spark, sf_dir):
    from vector_spark.functions import encode_base16, encode_base64, redact

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        encode_base64(F.substring("text", 1, 24)).alias("head_b64"),
        encode_base16(F.substring("text", 1, 8)).alias("head_hex"),
        redact(F.col("text"), [r"[0-9]+"], "#").alias("redacted"),
    )


def q_demo_logs_roundtrip(spark, sf_dir):
    """demo_logs generator round-trips over all 7 reference formats
    (demo_logs.rs:47-170; rows-only: generated input, not an sf table):
    bsd_syslog re-parsed by parse_syslog, shuffle(sequence=True) lines
    matched against '<seq> <line>' with the line from the configured
    list, sample_file lines matched against prefix+strftime+suffix from
    the two-column CSV, apache_common/apache_error/syslog/json matched
    against their grammars. A format regression drops its rows."""
    import csv
    import os
    import tempfile

    from vector_spark.functions import parse_syslog
    from vector_spark.sources import demo_logs

    logs = demo_logs(spark, 2000, fmt="bsd_syslog", partitions=8)
    p = parse_syslog(F.col("line"))
    syslog_ok = logs.select("id", F.lit("bsd_syslog").alias("fmt")).filter(
        (p["hostname"] != "") & p["severity"].between(0, 7)
    )
    shuf = demo_logs(spark, 2000, fmt="shuffle", partitions=8,
                     lines=["alpha beta", "gamma"], sequence=True)
    shuffle_ok = shuf.select("id", F.lit("shuffle").alias("fmt")).filter(
        F.col("line").rlike(r"^\d+ (alpha beta|gamma)$")
    )
    tmp = tempfile.mkdtemp(prefix="vs_demo_sample_")
    path = os.path.join(tmp, "sample.csv")
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["req start=", " status=ok"])
        w.writerow(["ts:", "|done"])
    samp = demo_logs(spark, 2000, fmt="sample_file", partitions=8,
                     sample_path=path, time_format="%Y-%m-%d %H:%M:%S")
    sample_ok = samp.select("id", F.lit("sample_file").alias("fmt")).filter(
        F.col("line").rlike(
            r"^(req start=|ts:)\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"
            r"( status=ok|\|done)$")
    )
    extra = []
    for fmt, pat in [
        ("apache_common", r'^\S+ - user\d+ \[[^]]+\] "\S+ \S+ HTTP/1\.1" \d+ \d+$'),
        ("apache_error", r"^\[[^]]+\] \[error\] \[client \S+\] .+$"),
        ("syslog", r"^<\d+>1 \S+ \S+ \S+ \d+ ID\d+ - .+$"),
        ("json", r'^\{"timestamp":'),
    ]:
        d = demo_logs(spark, 2000, fmt=fmt, partitions=8)
        extra.append(d.select("id", F.lit(fmt).alias("fmt"))
                     .filter(F.col("line").rlike(pat)))
    out = syslog_ok.unionByName(shuffle_ok).unionByName(sample_ok)
    for x in extra:
        out = out.unionByName(x)
    return out


def q_parse_aws_vpc_flow(spark, sf_dir):
    """parse_aws_vpc_flow_log round-trip: build a deterministic v2 flow-log
    line per event (error events get '-' srcport/action to exercise the
    null path), parse it, emit the typed fields. The oracle reconstructs
    the expected fields directly from the source columns."""
    from vector_spark.functions import parse_aws_vpc_flow_log

    e = _t(spark, sf_dir, "events")
    srcaddr = F.format_string(
        "10.%d.%d.1", (F.col("user_id") % 128).cast("int"), (F.col("event_id") % 250).cast("int")
    )
    is_err = F.col("event_type") == "error"
    srcport = F.when(is_err, F.lit("-")).otherwise((F.col("event_id") % 60000).cast("string"))
    action = F.when(is_err, F.lit("-")).otherwise(F.lit("ACCEPT"))
    start_s = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000).cast("long")
    line = F.format_string(
        "2 %d eni-%d %s 10.0.0.1 %s 443 6 %d %d %d %d %s OK",
        F.col("user_id"), F.col("event_id"), srcaddr, srcport,
        (F.col("event_id") % 100).cast("long"),
        F.round(F.col("value") * 100).cast("long"),
        start_s, start_s + F.lit(60), action,
    )
    p = parse_aws_vpc_flow_log(line)
    return e.select(
        "event_id",
        p["version"].alias("version"),
        p["account_id"].alias("account_id"),
        p["interface_id"].alias("interface_id"),
        p["srcaddr"].alias("srcaddr"),
        p["srcport"].alias("srcport"),
        p["protocol"].alias("protocol"),
        p["packets"].alias("packets"),
        p["bytes"].alias("bytes"),
        p["start"].alias("start_ts"),
        p["end"].alias("end_ts"),
        p["action"].alias("action"),
        p["log_status"].alias("log_status"),
    )


def q_parse_aws_alb(spark, sf_dir):
    """parse_aws_alb_log round-trip: deterministic ALB access line per
    event; '-' target/ssl fields exercise nulls; processing time is an
    exact-3-decimal literal so the double parses identically everywhere."""
    from vector_spark.functions import parse_aws_alb_log
    from vector_spark.session import ensure_parallelism

    # 20-group regex + heavy format_string encode on a one-split scan
    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    tpt = F.format_string("0.%03d", (F.col("event_id") % 1000).cast("int"))
    status = F.when(F.col("event_type") == "error", F.lit("500")).otherwise(F.lit("200"))
    line = F.format_string(
        'http 2024-01-01T00:00:00.000000Z app/lb/%d 192.168.1.%d:%d - 0.001 %s 0.000 '
        '%s %s %d %d "GET http://example.com/u/%d HTTP/1.1" "agent-%d" - - '
        'arn:aws:elb:tg/%d "Root=1-%d"',
        F.col("user_id"), (F.col("user_id") % 250).cast("int"),
        (F.col("event_id") % 60000).cast("int") + F.lit(1024), tpt, status, status,
        F.col("event_id") % 4096, F.col("event_id") % 8192,
        F.col("user_id"), F.col("user_id"), F.col("user_id"), F.col("event_id"),
    )
    p = parse_aws_alb_log(line)
    return e.select(
        "event_id",
        p["type"].alias("type"),
        p["elb"].alias("elb"),
        p["client_host"].alias("client_host"),
        p["target_host"].alias("target_host"),
        p["target_processing_time"].alias("target_processing_time"),
        p["elb_status_code"].alias("elb_status_code"),
        p["received_bytes"].alias("received_bytes"),
        p["sent_bytes"].alias("sent_bytes"),
        p["request_method"].alias("request_method"),
        p["request_url"].alias("request_url"),
        p["user_agent"].alias("user_agent"),
        p["ssl_cipher"].alias("ssl_cipher"),
        p["trace_id"].alias("trace_id"),
    )


def q_parse_xml(spark, sf_dir):
    """parse_xml via Spark's built-in xpath_* expressions: build a
    deterministic XML doc per event, extract typed fields; the oracle
    reconstructs the fields from the source columns."""
    from vector_spark.functions import parse_xml_fields

    e = _t(spark, sf_dir, "events")
    doc = F.format_string(
        "<event><id>%d</id><user>%d</user><type>%s</type><v>%.2f</v></event>",
        F.col("event_id"), F.col("user_id"), F.col("event_type"), F.col("value"),
    )
    p = parse_xml_fields(
        doc,
        {
            "xid": ("long", "/event/id/text()"),
            "xuser": ("long", "/event/user/text()"),
            "xtype": ("string", "/event/type/text()"),
            "xv": ("double", "/event/v/text()"),
        },
    )
    return e.select(
        "event_id",
        p["xid"].alias("xid"),
        p["xuser"].alias("xuser"),
        p["xtype"].alias("xtype"),
        p["xv"].alias("xv"),
    )


def q_codec_framing_chardelim(spark, sf_dir):
    """CharacterDelimited framing: one buffer holds 3 '|'-separated frames;
    posexplode emits (event_id, idx, frame) — the 1->N framing shape."""
    from vector_spark.functions import frame_character_delimited

    e = _t(spark, sf_dir, "events")
    buf = F.concat_ws(
        "|", F.col("event_type"), F.col("user_id").cast("string"),
        F.col("event_id").cast("string"),
    )
    return e.select(
        "event_id", F.posexplode(frame_character_delimited(buf, "|")).alias("idx", "frame")
    )


def q_codec_framing_octet(spark, sf_dir):
    """OctetCounting framing (RFC 6587): '<LEN> <MSG>' repeated; the
    Arrow-batched frame parser must recover exactly the two messages."""
    from vector_spark.functions import frame_octet_counting

    e = _t(spark, sf_dir, "events")
    buf = F.format_string(
        "%d %s%d %s",
        F.length("event_type"), F.col("event_type"),
        F.length("props"), F.col("props"),
    )
    return e.select(
        "event_id", F.posexplode(frame_octet_counting(buf)).alias("idx", "frame")
    )


def q_codec_netflow_v9(spark, sf_dir):
    """NetFlow v9 template-based decode (netflow.rs:8-13): each event is
    encoded as a v9 packet (20-byte header + one 21-byte data record in
    flowset 256, padded to 4 bytes) with pure hex exprs; the template
    arrives in a SEPARATE packet, so decoding exercises the two-pass
    template-broadcast machinery. The oracle recomputes the expected flow
    tuples straight from the events table — field-exact round-trip."""
    from vector_spark.functions import parse_netflow

    e = _t(spark, sf_dir, "events")

    def hexn(col, nbytes):
        return F.lpad(F.lower(F.hex(col)), nbytes * 2, "0")

    secs = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
    ).cast("long")
    eid = F.col("event_id")
    src_hex = F.concat(
        hexn(F.lit(10), 1),
        hexn(F.expr("CAST((event_id div 65536) % 256 AS INT)"), 1),
        hexn(F.expr("CAST((event_id div 256) % 256 AS INT)"), 1),
        hexn(F.expr("CAST(event_id % 256 AS INT)"), 1),
    )
    dst_hex = F.concat(
        hexn(F.lit(192), 1), hexn(F.lit(168), 1), hexn(F.lit(1), 1),
        hexn(F.expr("CAST(event_id % 200 + 1 AS INT)"), 1),
    )
    srcport = (eid % 50000 + 1024).cast("long")
    dstport = F.when(eid % 2 == 0, F.lit(443)).otherwise(F.lit(80)).cast("long")
    pkts = (eid % 1000 + 1).cast("long")
    octets = ((eid % 1000 + 1) * 64).cast("long")
    proto = F.when(eid % 3 == 0, F.lit(17)).otherwise(F.lit(6)).cast("long")

    header = F.concat(
        hexn(F.lit(9), 2), hexn(F.lit(1), 2), hexn(F.lit(0), 4),
        hexn(secs, 4), hexn(F.lit(0), 4), hexn(F.lit(1), 4),
    )
    record = F.concat(
        src_hex, dst_hex, hexn(srcport, 2), hexn(dstport, 2),
        hexn(pkts, 4), hexn(octets, 4), hexn(proto, 1),
    )
    flowset = F.concat(
        hexn(F.lit(256), 2), hexn(F.lit(28), 2), record, F.lit("000000")
    )
    data_pkts = e.select(F.unhex(F.concat(header, flowset)).alias("packet"))

    # the template packet: v9 header + flowset 0 defining template 256
    def _u(v, n):
        return int(v).to_bytes(n, "big")

    t_fields = [(8, 4), (12, 4), (7, 2), (11, 2), (2, 4), (1, 4), (4, 1)]
    t_body = _u(256, 2) + _u(len(t_fields), 2) + b"".join(
        _u(f, 2) + _u(l, 2) for f, l in t_fields
    )
    tpl_packet = (
        _u(9, 2) + _u(1, 2) + _u(0, 4) + _u(0, 4) + _u(0, 4) + _u(1, 4)
        + _u(0, 2) + _u(4 + len(t_body), 2) + t_body
    )
    tpl_df = spark.createDataFrame([(bytearray(tpl_packet),)], "packet binary")

    out = parse_netflow(tpl_df.unionByName(data_pkts))
    f = F.col("fields")
    return out.filter(f.isNotNull()).select(
        F.col("export_time"),
        f.getItem("ipv4_src_addr").alias("srcaddr"),
        f.getItem("ipv4_dst_addr").alias("dstaddr"),
        f.getItem("l4_src_port").cast("long").alias("srcport"),
        f.getItem("l4_dst_port").cast("long").alias("dstport"),
        f.getItem("in_pkts").cast("long").alias("packets"),
        f.getItem("in_bytes").cast("long").alias("octets"),
        f.getItem("protocol").cast("long").alias("proto"),
    )


def _dnstap_fixture_frames() -> list[str]:
    """Four deterministic dnstap frames (public dnstap.proto wire format),
    hand-encoded at plan time — the parse side must recover exactly what
    was encoded, so the oracle enumerates these constants by event_id%4."""
    import base64

    def u(v, n):
        return int(v).to_bytes(n, "big")

    def pb(fno, wt, payload):
        tag = bytes([(fno << 3) | wt])
        if wt == 2:
            return tag + bytes([len(payload)]) + payload
        if wt == 5:
            return tag + payload
        return tag + payload  # wt 0: payload is pre-encoded varint bytes

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    def dns(qid, qr, labels, qtype):
        name = b"".join(bytes([len(l)]) + l.encode() for l in labels) + b"\x00"
        flags = 0x8000 if qr else 0
        return (u(qid, 2) + u(flags, 2) + u(1, 2) + u(0, 2) + u(0, 2) + u(0, 2)
                + name + u(qtype, 2) + u(1, 2))

    variants = [
        # (mtype, family, proto, src, sport, resp, rport, t_sec, t_nsec, labels, qtype, qr)
        (5, 1, 1, bytes([10, 0, 0, 1]), 1053, None, None,
         1700000000, 11, ["a0", "example", "com"], 1, 0),
        (6, 1, 1, None, None, bytes([10, 0, 0, 2]), 53,
         1700000001, 22, ["a1", "example", "org"], 28, 1),
        (3, 2, 2, b"\x00" * 15 + b"\x01", 2053, None, None,
         1700000002, 33, ["a2", "example", "net"], 16, 0),
        (7, 1, 1, bytes([192, 168, 5, 5]), 5353, None, None,
         1700000003, 44, ["a3", "example", "io"], 15, 0),
    ]
    frames = []
    for i, (mt, fam, proto, src, sport, resp, rport, tsec, tnsec, labels,
            qtype, qr) in enumerate(variants):
        m = pb(1, 0, varint(mt)) + pb(2, 0, varint(fam)) + pb(3, 0, varint(proto))
        if src is not None:
            m += pb(4, 2, src) + pb(6, 0, varint(sport))
        if resp is not None:
            m += pb(5, 2, resp) + pb(7, 0, varint(rport))
        if mt % 2 == 0:  # response: response_time (11 varint? no: 12/13)
            m += pb(12, 0, varint(tsec)) + pb(13, 5, int(tnsec).to_bytes(4, "little"))
            m += pb(14, 2, dns(100 + i, qr, labels, qtype))
        else:
            m += pb(8, 0, varint(tsec)) + pb(9, 5, int(tnsec).to_bytes(4, "little"))
            m += pb(10, 2, dns(100 + i, qr, labels, qtype))
        frame = (pb(1, 2, b"vs-test") + pb(2, 2, b"v1")
                 + pb(15, 0, varint(1)) + pb(14, 2, m))
        frames.append(base64.b64encode(frame).decode())
    return frames


def q_parse_dnstap(spark, sf_dir):
    """VRL parse_dnstap (parse_dnstap.cue): pure-Python protobuf
    wire-format walker over the public dnstap schema, Arrow-batched.
    Each event gets one of four hand-encoded frames (event_id%4); the
    oracle enumerates the encoded constants — field-exact decode check."""
    from vector_spark.functions import parse_dnstap
    from vector_spark.session import ensure_parallelism

    # the Python wire walk is ~17 us/frame — a single-split scan runs it
    # on ONE core (measured 2.5 s vs 0.4 s at sf0.1)
    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    frames = _dnstap_fixture_frames()
    frame = F.element_at(
        F.array(*[F.lit(x) for x in frames]), (F.col("event_id") % 4 + 1).cast("int")
    )
    d = parse_dnstap(frame)
    return e.select(
        "event_id",
        d.getField("messageType").alias("message_type"),
        d.getField("messageTypeId").alias("message_type_id"),
        d.getField("socketFamily").alias("socket_family"),
        d.getField("socketProtocol").alias("socket_protocol"),
        d.getField("sourceAddress").alias("source_address"),
        d.getField("sourcePort").alias("source_port"),
        d.getField("responseAddress").alias("response_address"),
        d.getField("responsePort").alias("response_port"),
        d.getField("time").alias("time_ns"),
        d.getField("header_id").alias("header_id"),
        d.getField("header_qr").alias("header_qr"),
        d.getField("question_name").alias("question_name"),
        d.getField("question_type").alias("question_type"),
        d.getField("serverId").alias("server_id"),
    )


def q_vrl_misc(spark, sf_dir):
    """Grouped VRL straggler sweep (to_syslog_level/severity/facility,
    parse_int with prefixes, format_int, deterministic random_*, friendly
    id round-trip): every output is a pure function of event_id/ts so the
    oracle re-derives each one. The friendly-id pair is exercised as
    encode-then-decode around uuid_v7_deterministic — the round-trip must
    return the original uuid, whose SQL twin already exists."""
    from vector_spark.functions import (
        format_int_vrl, friendly_id_from_uuid, parse_float_vrl, parse_int_vrl,
        random_bool_seeded, random_int_seeded, to_syslog_facility,
        to_syslog_level, to_syslog_severity, uuid_from_friendly_id,
        uuid_v7_deterministic,
    )
    from vector_spark.session import ensure_parallelism

    # ~20 md5/format exprs per row; spread the single parquet split
    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    eid = F.col("event_id")
    level = to_syslog_level(eid % 8)
    hex_str = F.concat(F.lit("0x"), F.lower(F.hex(eid)))
    u7 = uuid_v7_deterministic(F.col("ts"), eid)
    return e.select(
        "event_id",
        level.alias("syslog_level"),
        to_syslog_severity(level).alias("syslog_severity"),
        to_syslog_facility(eid % 24).alias("syslog_facility"),
        parse_int_vrl(hex_str).alias("parsed_hex"),
        parse_float_vrl(F.concat(eid.cast("string"), F.lit(".5e1"))).alias("parsed_float"),
        parse_float_vrl(F.lit("not a number")).alias("parsed_float_bad"),
        format_int_vrl(eid, 16).alias("formatted_hex"),
        random_int_seeded(eid, 0, 100).alias("rand_int"),
        random_bool_seeded(eid).alias("rand_bool"),
        uuid_from_friendly_id(friendly_id_from_uuid(u7)).alias("uuid_roundtrip"),
    )


def q_codec_cdx(spark, sf_dir):
    """Common Crawl CDXJ index lines, synthesized deterministically from
    documents then parsed with parse_cdx; the oracle produces the expected
    fields directly from the same construction (ground truth, not a
    parallel parser)."""
    from vector_spark.functions import parse_cdx

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    js = F.concat(
        F.lit('{"url": "https://example.org/p/'), did,
        F.lit('", "mime": "text/html", "status": "200", "digest": "'),
        F.md5(F.col("text").cast("binary")),
        F.lit('", "length": "'), F.col("n_chars").cast("string"),
        F.lit('", "offset": "'), (F.col("doc_id") * 100).cast("string"),
        F.lit('", "filename": "crawl-00.warc.gz"}'),
    )
    line = F.concat(
        F.lit("org,example)/p/"), did, F.lit(" "),
        F.lit("20240101"), F.lpad((F.col("doc_id") % 1000000).cast("string"), 6, "0"),
        F.lit(" "), js,
    )
    p = parse_cdx(line)
    return d.select(
        "doc_id",
        p.getField("urlkey").alias("urlkey"),
        p.getField("ts").alias("ts"),
        p.getField("url").alias("url"),
        p.getField("mime").alias("mime"),
        p.getField("status").alias("status"),
        p.getField("digest").alias("digest"),
        p.getField("length").alias("length"),
        p.getField("offset").alias("offset"),
        p.getField("filename").alias("filename"),
    )


def q_vrl_types(spark, sf_dir):
    """Grouped VRL type-predicate/coercion sweep (is_json/is_array/
    is_integer/is_float/is_nullish/to_bool/to_int/format_number/
    contains_all/match_any): each row cycles through a JSON-encoded value
    shape derived from event_id, so the oracle replays every branch."""
    from vector_spark.functions import (
        contains_all, format_number_vrl, is_array_str, is_boolean_str,
        is_empty, is_float_str, is_integer_str, is_json, is_null_str,
        is_nullish, is_object_str, is_string_str, is_timestamp_str,
        match_any, match_array, to_bool_vrl, to_float_vrl, to_int_vrl,
        to_string_vrl,
    )

    e = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    v = (
        F.when(eid % 6 == 0, F.lit("123"))
        .when(eid % 6 == 1, F.lit("1.5e2"))
        .when(eid % 6 == 2, F.lit('"hi"'))
        .when(eid % 6 == 3, F.lit("[1,2]"))
        .when(eid % 6 == 4, F.lit('{"a":1}'))
        .otherwise(F.lit("null"))
    )
    nv = (
        F.when(eid % 3 == 0, F.lit(""))
        .when(eid % 3 == 1, F.lit(" - "))
        .otherwise(F.lit("x"))
    )
    bw = (
        F.when(eid % 5 == 0, F.lit("yes"))
        .when(eid % 5 == 1, F.lit("NO"))
        .when(eid % 5 == 2, F.lit("1"))
        .when(eid % 5 == 3, F.lit("false"))
        .otherwise(F.lit("maybe"))
    )
    tstr = F.when(eid % 2 == 0, F.lit("2024-01-01 00:00:00")).otherwise(F.lit("not a time"))
    msg = F.concat(F.lit("evt-"), (eid % 10).cast("string"), F.lit("-end"))
    return e.select(
        "event_id",
        is_json(v).alias("v_is_json"),
        is_integer_str(v).alias("v_is_int"),
        is_float_str(v).alias("v_is_float"),
        is_string_str(v).alias("v_is_string"),
        is_array_str(v).alias("v_is_array"),
        is_object_str(v).alias("v_is_object"),
        is_null_str(v).alias("v_is_null"),
        is_boolean_str(v).alias("v_is_bool"),
        is_timestamp_str(tstr).alias("v_is_ts"),
        is_nullish(nv).alias("v_is_nullish"),
        to_bool_vrl(bw).alias("v_to_bool"),
        to_int_vrl(v).alias("v_to_int"),
        format_number_vrl((eid % 1000).cast("double") * 1111.0 + 0.25, 2).alias("v_fmt"),
        contains_all(msg, ["evt-", "-end"]).alias("v_contains_all"),
        match_any(msg, [r"evt-[0-4]-", r"never"]).alias("v_match_any"),
        is_empty(nv).alias("v_is_empty"),
        to_float_vrl(v).alias("v_to_float"),
        to_string_vrl(eid % 7).alias("v_to_string"),
        match_array(F.split(msg, "-"), r"^[0-4]$").alias("v_match_array"),
    )


def q_vrl_uuid_v7(spark, sf_dir):
    """Deterministic uuid_v7: RFC 9562 layout with md5-derived random bits
    — replayable, time-ordered, oracle-expressible (same hex math in SQL)."""
    from vector_spark.functions import uuid_v7_deterministic

    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        uuid_v7_deterministic(F.col("ts"), F.col("event_id")).alias("uuid7"),
    )


def q_vrl_hmac(spark, sf_dir):
    """VRL hmac: keyed MAC per event message (rows-only driver check —
    DuckDB has no HMAC; RFC 4231 vectors are asserted in
    tests/test_vrl_functions.py)."""
    from vector_spark.functions import hmac_hex

    e = _t(spark, sf_dir, "events")
    msg = F.concat_ws(":", F.col("event_type"), F.col("event_id").cast("string"))
    return e.select(
        "event_id",
        hmac_hex(msg, "topsecret", "sha256").alias("mac_sha256"),
        hmac_hex(msg, "topsecret", "sha1").alias("mac_sha1"),
    )


def q_codec_influxdb(spark, sf_dir):
    """Influxdb line-protocol round-trip: encode each event as a line
    (sorted tags, i-suffixed int field, epoch-ns ts), parse it back, emit
    the parsed pieces; oracle reconstructs them from the source columns."""
    from vector_spark.functions import parse_influxdb_line

    e = _t(spark, sf_dir, "events")
    ns = F.unix_micros(F.col("ts").cast("timestamp")) * 1000
    line = F.format_string(
        "events,type=%s,user=%d value=%.2f,n=%di %d",
        F.col("event_type"), F.col("user_id"), F.col("value"),
        (F.col("event_id") % 100).cast("int"), ns,
    )
    p = parse_influxdb_line(line)
    return e.select(
        "event_id",
        p["measurement"].alias("measurement"),
        p["tags"].getItem("type").alias("tag_type"),
        p["tags"].getItem("user").cast("long").alias("tag_user"),
        p["fields"].getItem("value").cast("double").alias("f_value"),
        p["fields"].getItem("n").cast("long").alias("f_n"),
        p["timestamp_ns"].alias("ts_ns"),
    )


def q_codec_native_json(spark, sf_dir):
    """Vector-native JSON event round-trip: serialize each event as
    {"log": {...}} (encode_native_json_log), deserialize with
    parse_native_json, emit kind + extracted fields; metric events are
    synthesized for purchase rows to exercise the metric branch."""
    from vector_spark.functions import encode_native_json_log, parse_native_json

    e = _t(spark, sf_dir, "events")
    is_metric = F.col("event_type") == "purchase"
    log_doc = encode_native_json_log(
        {"etype": F.col("event_type"), "uid": F.col("user_id").cast("string")}
    )
    metric_doc = F.format_string(
        '{"metric": {"name": "revenue", "kind": "incremental", "counter": {"value": %.2f}}}',
        F.col("value"),
    )
    doc = F.when(is_metric, metric_doc).otherwise(log_doc)
    p = parse_native_json(doc)
    return e.select(
        "event_id",
        p["kind"].alias("kind"),
        p["log"].getItem("etype").alias("log_etype"),
        p["log"].getItem("uid").cast("long").alias("log_uid"),
        p["metric_name"].alias("metric_name"),
        p["metric_kind"].alias("metric_kind"),
        p["counter_value"].alias("counter_value"),
    )


def q_codec_csv(spark, sf_dir):
    """Csv deserializer round-trip: encode columns as a csv line, decode
    with from_csv; oracle reconstructs the expected struct fields directly."""
    from vector_spark.functions import parse_csv_line

    e = _t(spark, sf_dir, "events")
    line = F.concat_ws(
        ",", F.col("event_id").cast("string"), F.col("event_type"),
        F.format_string("%.2f", F.col("value")),
    )
    parsed = parse_csv_line(line, "id BIGINT, etype STRING, v DOUBLE")
    return e.select(
        "event_id",
        parsed.getField("id").alias("id"),
        parsed.getField("etype").alias("etype"),
        parsed.getField("v").alias("v"),
    )


def q_codec_json(spark, sf_dir):
    """Json deserializer with declared schema (lib/codecs decoding::Json)."""
    from vector_spark.functions import parse_json_doc

    e = _t(spark, sf_dir, "events")
    doc = F.to_json(F.struct(F.col("user_id").alias("u"), F.col("event_type").alias("t")))
    parsed = parse_json_doc(doc, "u BIGINT, t STRING")
    return e.select(
        "event_id",
        parsed.getField("u").alias("u"),
        parsed.getField("t").alias("t"),
    )


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------

# parse_etld fixture hosts: exercises multi-label rules (ac.uk), wildcard
# (*.ck, *.kawasaki.jp via y.x), exceptions (!www.ck, !city.kawasaki.jp),
# private-section rules (github.io), unknown suffixes, trailing dots, case,
# and a 5-label amazonaws.com private rule
_ETLD_HOSTS = [
    "sub.sussex.ac.uk",
    "vector.acmecorp",
    "foo.ck",
    "www.ck",
    "x.www.ck",
    "example.com",
    "com",
    "a.b.github.io",
    "city.kawasaki.jp",
    "x.city.kawasaki.jp",
    "y.x.kawasaki.jp",
    "a.s3.dualstack.ap-southeast-2.amazonaws.com",
    "Example.COM.",
    "deep.sub.domain.example.org",
    "b.co.uk",
]


def q_parse_etld(spark, sf_dir):
    """VRL parse_etld over the FULL vendored public suffix list
    (website/cue/reference/remap/functions/parse_etld.cue): eTLD / eTLD+1 /
    known_suffix via the shuffle-free broadcast join ladder
    (functions/psl.py). The oracle re-derives the PSL algorithm
    independently in SQL (read_text + candidate-suffix join + longest-match
    aggregation) from the same vendored .dat file."""
    from vector_spark.functions.psl import parse_etld_psl, psl_dim
    from vector_spark.session import ensure_parallelism

    e = ensure_parallelism(_t(spark, sf_dir, "events")).select("event_id")
    hosts = F.array(*[F.lit(h) for h in _ETLD_HOSTS])
    df = e.withColumn(
        "host",
        F.element_at(hosts, (F.col("event_id") % len(_ETLD_HOSTS)).cast("int") + 1),
    )
    out = parse_etld_psl(df, "host", psl_dim(spark), plus_parts=1)
    return out.select("event_id", "host", "etld", "etld_plus", "known_suffix")


def _parse_etld_sql() -> str:
    from vector_spark.functions.psl import PSL_PATH

    host_values = ",".join(f"({i}, '{h}')" for i, h in enumerate(_ETLD_HOSTS))
    return f"""
WITH psl_lines AS (
  SELECT trim(x) AS line
  FROM (SELECT unnest(string_split(content, chr(10))) AS x
        FROM read_text('{PSL_PATH}'))
),
rules AS (
  SELECT CASE WHEN line LIKE '!%' THEN lower(substr(line, 2)) ELSE lower(line) END AS rule,
         (line LIKE '!%') AS is_exc
  FROM psl_lines WHERE line <> '' AND line NOT LIKE '//%'
),
r2 AS (
  SELECT rule, is_exc, len(string_split(rule, '.')) AS k, rule LIKE '*.%' AS is_wild
  FROM rules
),
fx(hidx, host) AS (VALUES {host_values}),
h AS (
  SELECT e.event_id, fx.host,
         string_split(lower(regexp_replace(fx.host, '\\.$', '')), '.') AS labels
  FROM events e JOIN fx ON fx.hidx = e.event_id % {len(_ETLD_HOSTS)}
),
cand AS (
  SELECT h.event_id, ks.k,
         array_to_string(labels[len(labels)-ks.k+1:len(labels)], '.') AS sfx,
         CASE WHEN ks.k >= 2
              THEN '*.' || array_to_string(labels[len(labels)-ks.k+2:len(labels)], '.')
         END AS wsfx
  FROM h, (SELECT unnest(range(1, 6)) AS k) ks
  WHERE len(labels) >= ks.k
),
m AS (
  SELECT c.event_id,
         max(CASE WHEN r.is_exc AND NOT r.is_wild THEN c.k - 1 END) AS exc_len,
         max(CASE WHEN NOT r.is_exc THEN c.k END) AS norm_len
  FROM cand c
  JOIN r2 r ON (NOT r.is_wild AND r.rule = c.sfx) OR (r.is_wild AND r.rule = c.wsfx)
  GROUP BY c.event_id
)
SELECT h.event_id, h.host,
       array_to_string(labels[len(labels) - coalesce(m.exc_len, m.norm_len, 1) + 1:len(labels)], '.') AS etld,
       array_to_string(labels[len(labels) - least(coalesce(m.exc_len, m.norm_len, 1) + 1, len(labels)) + 1:len(labels)], '.') AS etld_plus,
       coalesce(m.exc_len, m.norm_len) IS NOT NULL AS known_suffix
FROM h LEFT JOIN m ON m.event_id = h.event_id
"""


def q_codec_compress(spark, sf_dir):
    """Compression codec family (encode_/decode_ zlib, gzip, snappy, zstd)
    round-tripped over a compressible payload built from event columns.
    snappy/zstd now ALWAYS execute: C wheel when installed, the pure-Python
    spec-direct codecs otherwise (functions/snappy_py.py raw snappy;
    functions/zstd_py.py RFC 8878) — non-identity of the coding is pinned
    by the cross-JVM tests (snappy-java / zstd-jni byte validation in
    tests/test_compression_codecs.py); the oracle pins the round-trip
    identity md5-exact per event. Scale: narrow Arrow-batched map, no
    shuffle. Reference: lib/codecs decoder stack + sink compression
    (src/sinks/util/buffer/compression.rs)."""
    from vector_spark.functions import (
        decode_gzip, decode_gzip_members, decode_snappy, decode_snappy_framed,
        decode_zlib, decode_zstd,
        encode_gzip, encode_snappy, encode_snappy_framed, encode_zlib,
        encode_zstd,
    )
    from vector_spark.session import ensure_parallelism

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    payload = F.concat(F.repeat(F.col("props"), 20), F.col("event_type")) \
        .cast("binary")
    # multi-member gzip (the Common Crawl WARC container layout): two
    # members whose payloads concatenate back to the original
    p1 = F.substring(payload, 1, 10)
    p2 = F.substring(payload, 11, 1 << 24)
    members = decode_gzip_members(F.concat(encode_gzip(p1), encode_gzip(p2)))
    rejoined = F.aggregate(members, F.lit(b""),
                           lambda acc, x: F.concat(acc, x))
    return e.select(
        "event_id",
        F.md5(decode_zlib(encode_zlib(payload))).alias("zlib_md5"),
        F.md5(decode_gzip(encode_gzip(payload))).alias("gzip_md5"),
        F.md5(decode_snappy(encode_snappy(payload))).alias("snappy_md5"),
        F.md5(decode_snappy_framed(encode_snappy_framed(payload)))
            .alias("snappy_framed_md5"),
        F.md5(decode_zstd(encode_zstd(payload))).alias("zstd_md5"),
        F.md5(rejoined).alias("gzip_members_md5"),
    )


_AVRO_EVENT_SCHEMA = (
    '{"type":"record","name":"Event","fields":['
    '{"name":"event_id","type":"long"},'
    '{"name":"event_type","type":"string"},'
    '{"name":"user_id","type":"long"},'
    '{"name":"note","type":["null","string"]}]}'
)


def q_codec_avro(spark, sf_dir):
    """Avro binary serializer -> deserializer round-trip (the lib/codecs
    avro format, decoding/format/avro.rs). Runs Spark-native from_avro/
    to_avro when the spark-avro jar is present, the pure-Python binary
    codec otherwise (functions/avro_py.py — BYTE-identical to avro-1.12.1's
    GenericDatumWriter, pinned in tests). Nullable-union branch exercised
    via a modulo-null note column. The oracle recomputes the fields
    directly, so an encode/decode bug cannot cancel out shape errors.
    Scale: narrow Arrow map, no shuffle."""
    from vector_spark.functions import parse_avro, serialize_avro
    from vector_spark.session import ensure_parallelism

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    rec = F.struct(
        "event_id",
        "event_type",
        "user_id",
        F.when(F.col("event_id") % 3 == 0, F.col("event_type")).alias("note"),
    )
    enc = e.select(serialize_avro(rec, _AVRO_EVENT_SCHEMA).alias("b"))
    dec = enc.select(parse_avro(F.col("b"), _AVRO_EVENT_SCHEMA).alias("r"))
    return dec.select(
        F.col("r.event_id").alias("event_id"),
        F.col("r.event_type").alias("event_type"),
        F.col("r.user_id").alias("user_id"),
        F.col("r.note").alias("note"),
    )


def _codec_protobuf_desc_path() -> str:
    """Write the deterministic telemetry descriptor set (protoc-free,
    functions/protobuf_py.py::build_descriptor_set) to a temp file; the
    same FileDescriptorSet format protoc emits, accepted by protobuf-java
    (pinned in tests/test_avro_protobuf_py.py)."""
    import os
    import tempfile

    from vector_spark.functions import protobuf_py as pb

    fd = pb.field_dict
    desc = pb.build_descriptor_set([{
        "name": "contract.proto", "package": "contract", "syntax": "proto3",
        "message_type": [{"name": "Event", "field": [
            fd("event_id", 1, pb._T_INT64),
            fd("event_type", 2, pb._T_STRING),
            fd("delta", 3, pb._T_SINT64),
            fd("counts", 4, pb._T_INT32, repeated=True)]}]}])
    path = os.path.join(tempfile.gettempdir(),
                        f"vs_contract_{os.getpid()}.desc")
    with open(path, "wb") as fh:
        fh.write(desc)
    return path


def q_codec_protobuf(spark, sf_dir):
    """Protobuf wire-format encode -> parse_protobuf round-trip against a
    real FileDescriptorSet file (the reference's descriptor-file API,
    lib/codecs/src/decoding/format/protobuf.rs). Native from_protobuf with
    the spark-protobuf jar, pure-Python walker otherwise (cross-validated
    vs protobuf-java DynamicMessage incl. packed repeated). sint64 delta
    goes negative (zigzag), counts is a repeated field. Oracle recomputes
    fields directly. Scale: narrow Arrow map, no shuffle."""
    from pyspark.sql.functions import pandas_udf

    from vector_spark.functions import parse_protobuf
    from vector_spark.functions import protobuf_py as pb

    desc_path = _codec_protobuf_desc_path()
    with open(desc_path, "rb") as fh:
        registry = pb.compile_descriptor_set(fh.read())

    def enc(rows):
        import pandas as pd

        return pd.Series([
            pb.encode({"event_id": r["event_id"],
                       "event_type": r["event_type"],
                       "delta": r["delta"],
                       "counts": list(r["counts"])},
                      registry, "contract.Event")
            for r in rows.to_dict("records")])

    enc_udf = pandas_udf(enc, "binary")
    from vector_spark.session import ensure_parallelism

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    src = e.select(F.struct(
        "event_id",
        "event_type",
        (F.col("user_id") - 50).alias("delta"),
        F.array((F.col("event_id") % 256).cast("int"),
                F.col("user_id").cast("int")).alias("counts"),
    ).alias("s"))
    encoded = src.select(enc_udf(F.col("s")).alias("b"))
    dec = encoded.select(
        parse_protobuf(F.col("b"), "Event", desc_path).alias("r"))
    return dec.select(
        F.col("r.event_id").alias("event_id"),
        F.col("r.event_type").alias("event_type"),
        F.col("r.delta").alias("delta"),
        F.col("r.counts").alias("counts"),
    )


def q_codec_cri(spark, sf_dir):
    """kubernetes CRI log-line decode over four planted shapes per
    event_id%4: full stdout line / partial stderr line (trailing space
    preserved — only a trailing newline trims) / invalid stream (null
    struct, the reference drops it) / unparseable timestamp (event kept,
    ts_us null). Oracle = ground-truth rows from the source columns."""
    from vector_spark.functions import parse_cri

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    ts_str = F.date_format(
        F.col("ts").cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
    )
    eid = F.col("event_id").cast("string")
    m = F.col("event_id") % 4
    line = (
        F.when(m == 0, F.concat(ts_str, F.lit(" stdout F evt:"), F.col("props")))
        .when(m == 1, F.concat(ts_str, F.lit(" stderr P chunk-"), eid, F.lit(" ")))
        .when(m == 2, F.concat(ts_str, F.lit(" stdmix F x")))
        .otherwise(F.concat(F.lit("oops stdout F late-"), eid))
    )
    r = e.select("event_id", parse_cri(line).alias("r"))
    return r.select(
        "event_id",
        F.col("r.message").alias("message"),
        F.col("r.stream").alias("stream"),
        F.col("r.partial").alias("partial"),
        F.col("r.ts_us").alias("ts_us"),
    )


def q_codec_docker(spark, sf_dir):
    """Docker json-file line decode incl. the exact-16-KiB partial
    heuristic (docker.rs:133-156): newline-trimmed full line / exactly
    16384 bytes unterminated (partial) / 16384 bytes WITH the newline
    (the exception: non-partial) / invalid JSON (null struct). Messages
    reported as md5+length so 16 KiB strings don't ride the compare."""
    from vector_spark.functions import parse_docker_log

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    ts_str = F.date_format(
        F.col("ts").cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
    )
    m = F.col("event_id") % 4
    msg = (
        F.when(m == 0, F.concat(F.col("props"), F.lit("\n")))
        .when(m == 1, F.rpad(F.lit("p"), 16384, "x"))
        .otherwise(F.concat(F.rpad(F.lit("p"), 16383, "x"), F.lit("\n")))
    )
    stream = F.when(F.col("user_id") % 2 == 0, F.lit("stdout")).otherwise(
        F.lit("stderr")
    )
    line = F.when(m == 3, F.lit("{nope")).otherwise(
        F.to_json(F.struct(msg.alias("log"), stream.alias("stream"),
                           ts_str.alias("time")))
    )
    r = e.select("event_id", parse_docker_log(line).alias("r"))
    return r.select(
        "event_id",
        F.md5(F.col("r.message")).alias("message_md5"),
        F.octet_length(F.col("r.message")).alias("message_len"),
        F.col("r.stream").alias("stream"),
        F.col("r.partial").alias("partial"),
        F.col("r.ts_us").alias("ts_us"),
    )


def q_partial_merge(spark, sf_dir):
    """Batch partial-event merger (partial_events_merger.rs): per-file
    runs of partial lines concatenate in order onto the closing full
    line; metadata (ts_us) from the FIRST line of the run; an
    unterminated trailing run emits still-partial. Oracle = independent
    reverse-running-count window + ordered string_agg in DuckDB."""
    from vector_spark.functions import merge_partial_lines

    e = _t(spark, sf_dir, "events")
    df = e.select(
        (F.col("user_id") % 50).alias("f"),
        F.col("event_id").alias("pos"),
        F.concat(F.lit("m"), F.col("event_id").cast("string"), F.lit(";")).alias("message"),
        (F.col("event_id") % 3 != 0).alias("partial"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    out = merge_partial_lines(df, ("f",), "pos")
    return out.select("f", "pos", "message", "partial", "ts_us")


def q_codec_heroku(spark, sf_dir):
    """Heroku Logplex drain-body decode: octet-count-prefixed syslog
    line plus a malformed line per body — the reference's
    parts.len()==8 guard must drop the latter; message keeps internal
    spaces (splitn remainder). Oracle = ground truth from source cols."""
    from vector_spark.functions import parse_heroku_logplex

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    ts_str = F.date_format(
        F.col("ts").cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
    )
    uid = F.col("user_id").cast("string")
    rest = F.concat(
        F.lit("<40>1 "), ts_str,
        F.lit(" host"), uid,
        F.lit(" app"), (F.col("user_id") % 7).cast("string"),
        F.lit(" web."), (F.col("event_id") % 5).cast("string"),
        F.lit(" - evt "), F.col("event_type"), F.lit(" "), F.col("props"),
    )
    body = F.concat(
        F.octet_length(rest).cast("string"), F.lit(" "), rest,
        F.lit("\nshort line\n"),
    )
    r = e.select(
        "event_id", F.explode(parse_heroku_logplex(body)).alias("r")
    )
    return r.select(
        "event_id",
        F.col("r.ts_us").alias("ts_us"),
        F.col("r.host").alias("host"),
        F.col("r.app_name").alias("app_name"),
        F.col("r.proc_id").alias("proc_id"),
        F.col("r.message").alias("message"),
    )


def q_codec_firehose(spark, sf_dir):
    """AWS Kinesis Firehose http_endpoint envelope decode: requestId /
    epoch-ms timestamp carried through, each base64 record decoded in
    arrival order. Oracle = two ground-truth rows per event."""
    from vector_spark.functions import parse_firehose_envelope

    e = _t(spark, sf_dir, "events")
    eid = F.col("event_id").cast("string")
    env = F.to_json(F.struct(
        F.concat(F.lit("req-"), eid).alias("requestId"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("timestamp"),
        F.array(
            F.struct(F.base64(F.col("props").cast("binary")).alias("data")),
            F.struct(F.base64(F.concat(F.lit("rec-"), eid).cast("binary")).alias("data")),
        ).alias("records"),
    ))
    r = e.select("event_id", parse_firehose_envelope(env).alias("r"))
    return r.select(
        "event_id",
        F.col("r.request_id").alias("request_id"),
        F.col("r.ts_ms").alias("ts_ms"),
        F.posexplode(F.col("r.records")).alias("rec_idx", "rec"),
    )


def q_codec_apache_status(spark, sf_dir):
    """apache mod_status ?auto decode at the reference's metric grain
    (names/kinds/tags of parser.rs:150-408): counters + gauges emitted
    only for present keys (CPUUser planted on event_id%4==0 only),
    kBytes scaled *1024, and the scoreboard zero-filling all 11 known
    states. Oracle = arithmetic union of the same rows."""
    from vector_spark.functions import parse_apache_status

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    s = lambda c: c.cast("string")  # noqa: E731
    body = F.concat(
        F.lit("localhost\nServerUptimeSeconds: "), s(F.col("event_id") % 1000),
        F.lit("\nTotal Accesses: "), s(F.col("user_id")),
        F.lit("\nTotal kBytes: "), s(F.col("event_id") % 50),
        F.when(F.col("event_id") % 4 == 0,
               F.concat(F.lit("\nCPUUser: "), s(F.col("user_id") % 7), F.lit(".5"))
               ).otherwise(F.lit("")),
        F.lit("\nBusyWorkers: "), s(F.col("user_id") % 10),
        F.lit("\nIdleWorkers: 74\nConnsTotal: "), s(F.col("event_id") % 9),
        F.lit("\nScoreboard: "),
        F.repeat(F.lit("_"), (F.col("user_id") % 5).cast("int")),
        F.repeat(F.lit("K"), (F.col("event_id") % 3).cast("int")),
        F.lit("."),
        F.repeat(F.lit("W"), (F.col("user_id") % 2).cast("int")),
        F.lit("\n"),
    )
    r = e.select("event_id", F.explode(parse_apache_status(body)).alias("r"))
    return r.select(
        "event_id",
        F.col("r.name").alias("name"),
        F.col("r.kind").alias("kind"),
        F.col("r.value").alias("value"),
        F.col("r.type").alias("type"),
        F.col("r.state").alias("state"),
    )


def q_codec_nginx_status(spark, sf_dir):
    """nginx stub_status decode: the three-line counter page per event,
    plus a malformed page on event_id%4==3 (all-null columns). Oracle =
    the same arithmetic."""
    from vector_spark.functions import parse_nginx_stub_status

    e = _t(spark, sf_dir, "events")
    s = lambda c: c.cast("string")  # noqa: E731
    accepts = F.col("event_id") % 10000 + 5
    page = F.when(F.col("event_id") % 4 == 3, F.lit("oops")).otherwise(F.concat(
        F.lit("Active connections: "), s(F.col("user_id")), F.lit(" \n"),
        F.lit("server accepts handled requests\n "),
        s(accepts), F.lit(" "), s(accepts - 1), F.lit(" "),
        s(F.col("event_id") % 100000), F.lit(" \nReading: "),
        s(F.col("user_id") % 7), F.lit(" Writing: "), s(F.col("user_id") % 11),
        F.lit(" Waiting: "), s(F.col("user_id") % 13), F.lit(" \n"),
    ))
    r = e.select("event_id", parse_nginx_stub_status(page).alias("r"))
    return r.select(
        "event_id",
        F.col("r.active").alias("active"),
        F.col("r.accepts").alias("accepts"),
        F.col("r.handled").alias("handled"),
        F.col("r.requests").alias("requests"),
        F.col("r.reading").alias("reading"),
        F.col("r.writing").alias("writing"),
        F.col("r.waiting").alias("waiting"),
    )


def q_codec_journald(spark, sf_dir):
    """journalctl --output=json record decode: plain MESSAGE / int-ARRAY
    MESSAGE (journalctl's non-UTF-8-safe rendering, decoded back to
    text) / unit-fixup shapes / missing _SOURCE_REALTIME (falls back to
    __REALTIME_TIMESTAMP); PRIORITY remapped to syslog keywords with
    out-of-range numerics mapped to UNKNOWN (journald.rs:895-910).
    Oracle = the same arithmetic."""
    from vector_spark.functions import parse_journald

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    m = F.col("event_id") % 4
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    arr_msg = F.transform(
        F.filter(F.split(F.concat(F.lit("jd:"), F.col("event_type")), ""),
                 lambda c: c != ""),
        F.ascii,
    )
    prio = (F.col("event_id") % 9).cast("string")
    unit = F.when(m == 2, F.concat(F.lit("sysd"), (F.col("user_id") % 4).cast("string"))
                  ).otherwise(
        F.concat(F.lit("u"), (F.col("user_id") % 4).cast("string"), F.lit(".timer")))
    host = F.concat(F.lit("h"), F.col("user_id").cast("string"))
    base = dict(
        PRIORITY=prio, _SYSTEMD_UNIT=unit, _HOSTNAME=host,
        __REALTIME_TIMESTAMP=(us + 7).cast("string"),
    )
    with_src = F.to_json(F.struct(
        F.when(m == 1, F.lit(None).cast("string")).otherwise(F.col("props")).alias("MESSAGE_S"),
        F.when(m == 1, arr_msg).alias("MESSAGE_A"),
        *[v.alias(k) for k, v in base.items()],
        us.cast("string").alias("_SOURCE_REALTIME_TIMESTAMP"),
    ))
    no_src = F.to_json(F.struct(
        F.col("props").alias("MESSAGE_S"),
        *[v.alias(k) for k, v in base.items()],
    ))
    # MESSAGE must be a single key that is sometimes a string and
    # sometimes an int array — patch the rendered JSON's key names
    # (to_json can't emit a union type): MESSAGE_S/MESSAGE_A -> MESSAGE.
    rec = F.regexp_replace(
        F.when(m == 3, no_src).otherwise(with_src),
        '"MESSAGE_[SA]":', '"MESSAGE":',
    )
    r = e.select("event_id", parse_journald(rec).alias("r"))
    return r.select(
        "event_id",
        F.col("r.message").alias("message"),
        F.col("r.host").alias("host"),
        F.col("r.priority").alias("priority"),
        F.col("r.unit").alias("unit"),
        F.col("r.ts_us").alias("ts_us"),
    )


def q_codec_ecs_metrics(spark, sf_dir):
    """aws_ecs_metrics task-metadata stats decode (parser.rs:1-560): one
    synthetic docker ContainerStats document per event covering every
    section — blkio per-entry counters (device major:minor + lowercased
    op, ms->s scale on io_time), cpu gauges/counters with the
    online_cpus-bounded percpu fan-out and ns->s throttled_time, precpu
    prefix twin, memory gauges + fault counters with presence gating,
    and per-interface network counters. Oracle = arithmetic UNION of the
    same rows."""
    from vector_spark.functions import parse_ecs_metrics

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    s = lambda c: c.cast("string")  # noqa: E731
    ts_str = F.date_format(F.col("ts").cast("timestamp"),
                           "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    online = F.col("event_id") % 3
    doc = F.concat(
        F.lit('{"c'), s(F.col("user_id") % 5), F.lit('": {"read": "'),
        ts_str, F.lit('"'),
        F.when(F.col("event_id") % 3 != 1,
               F.concat(F.lit(', "name": "task'), s(F.col("user_id") % 3),
                        F.lit('"'))).otherwise(F.lit("")),
        F.lit(', "blkio_stats": {"io_service_bytes_recursive": ['
              '{"major": 202, "minor": '), s(F.col("user_id") % 4),
        F.lit(', "op": "Read", "value": '), s(F.col("event_id") % 1000),
        F.lit('}, {"major": 202, "minor": '), s(F.col("user_id") % 4),
        F.lit(', "op": "Write", "value": '), s(F.col("user_id") * 3),
        F.lit('}], "io_time_recursive": [{"major": 8, "minor": 0, '
              '"op": "", "value": '), s(F.col("event_id") % 500),
        F.lit('}]}, "cpu_stats": {"online_cpus": '), s(online),
        F.lit(', "system_cpu_usage": '), s(F.col("user_id") * 1000),
        F.lit(', "cpu_usage": {"total_usage": '), s(F.col("event_id")),
        F.lit(', "percpu_usage": ['), s(F.col("user_id") % 97),
        F.lit(", "), s(F.col("event_id") % 89), F.lit("]"),
        F.when(F.col("event_id") % 2 == 0,
               F.concat(F.lit(', "usage_in_usermode": '),
                        s(F.col("user_id") % 7))).otherwise(F.lit("")),
        F.lit("}"),
        F.when(F.col("event_id") % 4 == 0,
               F.concat(F.lit(', "throttling_data": {"periods": '),
                        s(F.col("user_id") % 5),
                        F.lit(', "throttled_time": '),
                        s((F.col("event_id") % 9) * 1000000000),
                        F.lit("}"))).otherwise(F.lit("")),
        F.lit('}, "precpu_stats": {"cpu_usage": {"total_usage": '),
        s(F.col("event_id") % 13),
        F.lit('}}, "memory_stats": {"usage": '), s(F.col("user_id") * 4096),
        F.when(F.col("event_id") % 2 == 1,
               F.lit(', "limit": 536870912')).otherwise(F.lit("")),
        F.lit(', "stats": {"cache": '), s(F.col("event_id") % 10000),
        F.when(F.col("event_id") % 3 == 0,
               F.concat(F.lit(', "rss": '), s(F.col("user_id")))
               ).otherwise(F.lit("")),
        F.lit(', "pgfault": '), s(F.col("event_id") % 77),
        F.lit('}}, "networks": {"eth0": {"rx_bytes": '), s(F.col("user_id")),
        F.lit(', "tx_bytes": '), s(F.col("event_id")), F.lit("}"),
        F.when(F.col("event_id") % 5 == 0,
               F.concat(F.lit(', "eth1": {"rx_packets": '),
                        s(F.col("event_id") % 50),
                        F.lit("}"))).otherwise(F.lit("")),
        F.lit("}}}"),
    )
    r = e.select("event_id",
                 F.explode(parse_ecs_metrics(doc)).alias("r"))
    return r.select(
        "event_id",
        F.col("r.container_id").alias("container_id"),
        F.col("r.container_name").alias("container_name"),
        F.col("r.name").alias("name"),
        F.col("r.mtype").alias("mtype"),
        F.col("r.value").alias("value"),
        F.col("r.device").alias("device"),
        F.col("r.op").alias("op"),
        F.col("r.cpu").alias("cpu"),
        F.col("r.ts_us").alias("ts_us"),
    )


def q_codec_mongodb_status(spark, sf_dir):
    """MongoDB serverStatus decode (mongodb_metrics/mod.rs:274-970): one
    synthetic document per event from the shared emission table
    (mongo_fixture.py) — distinct constants per leaf, i64-truncating
    millis->seconds divides with nonzero dropped remainders, presence
    gating for heap/mapped/record/collectionScans/wiredTiger/extra lock
    + latency map entries, the reference's as-written opcounters swap,
    and event-varying uptime/localTime. Oracle = the same table rendered
    as a VALUES join with identical gating WHEREs."""
    from vector_spark.functions import parse_mongodb_server_status

    from .mongo_fixture import build_doc

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    doc = build_doc(F.col("ts").cast("timestamp"), F.col("event_id"))
    r = e.select("event_id",
                 F.explode(parse_mongodb_server_status(doc)).alias("r"))
    return r.select(
        "event_id",
        F.col("r.name").alias("name"),
        F.col("r.mtype").alias("mtype"),
        F.col("r.value").alias("value"),
        F.col("r.type").alias("type"),
        F.col("r.state").alias("state"),
        F.col("r.mode").alias("mode"),
        F.col("r.micros").alias("micros"),
        F.col("r.engine").alias("engine"),
    )


def q_codec_eventstore_stats(spark, sf_dir):
    """EventStoreDB /stats decode (eventstoredb_metrics/types.rs:19-147):
    the 6 required proc/sys metrics per document plus 3 per-drive gauges
    when the one-key drive map is present (event_id%3!=2; its KEY is the
    path tag); event_id%7==3 drops a required diskIo field, which must
    yield ZERO rows for that document (serde all-or-nothing). Oracle =
    arithmetic UNION of the same rows."""
    from vector_spark.functions import parse_eventstoredb_stats

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    s = lambda c: c.cast("string")  # noqa: E731
    doc = F.concat(
        F.lit('{"proc": {"id": '), s(F.col("user_id") % 9000),
        F.lit(', "mem": '), s(F.col("user_id") * 1024),
        F.lit(', "cpu": 1.5, "threadsCount": 8, "thrownExceptionsRate": 0,'
              ' "diskIo": {"readBytes": '), s(F.col("event_id") % 100000),
        F.lit(', "writtenBytes": '), s(F.col("event_id") * 2),
        F.lit(', "readOps": '), s(F.col("user_id") % 500),
        F.when(F.col("event_id") % 7 != 3,
               F.concat(F.lit(', "writeOps": '), s(F.col("event_id") % 77))
               ).otherwise(F.lit("")),
        F.lit('}}, "sys": {"freeMem": '), s(F.col("user_id") * 4096),
        F.lit(', "loadavg": {"1m": 0.1, "5m": 0.2, "15m": 0.3}'),
        F.when(F.col("event_id") % 3 != 2,
               F.concat(F.lit(', "drive": {"/data'), s(F.col("user_id") % 4),
                        F.lit('": {"availableBytes": '), s(F.col("event_id") % 9999),
                        F.lit(', "totalBytes": '), s(F.col("user_id") * 8),
                        F.lit(', "usage": "61%", "usedBytes": '),
                        s(F.col("event_id") % 333),
                        F.lit("}}"))).otherwise(F.lit("")),
        F.lit("}}"),
    )
    r = e.select("event_id",
                 F.explode(parse_eventstoredb_stats(doc)).alias("r"))
    return r.select(
        "event_id",
        F.col("r.id").alias("id"),
        F.col("r.name").alias("name"),
        F.col("r.mtype").alias("mtype"),
        F.col("r.value").alias("value"),
        F.col("r.path").alias("path"),
    )


def q_codec_lumberjack(spark, sf_dir):
    """Lumberjack (Beats) protocol decode across all three event-bearing
    frame kinds, one per event_id%3: v2 'J' json frame / v1 'D'
    key-value frame / a window frame followed by a 'C' compressed frame
    (zlib, built with encode_zlib) wrapping the same json frame. The
    wire bytes are built with pure hex expressions (the codec_netflow_v9
    convention) so the Arrow walker is the only decoder in the loop;
    oracle recomputes expected rows from the events table."""
    from vector_spark.functions import parse_lumberjack
    from vector_spark.functions.compress import encode_zlib
    from vector_spark.session import ensure_parallelism

    e = ensure_parallelism(_t(spark, sf_dir, "events"))

    def hx8(c):
        return F.lpad(F.lower(F.hex(c)), 8, "0")

    def hxs(c):
        return F.lower(F.hex(c))

    seq = (F.col("event_id") % 1000).cast("int")
    payload = F.to_json(F.struct(F.col("props").alias("m")))
    jframe = F.concat(F.lit("324a"), hx8(seq), hx8(F.octet_length(payload)),
                      hxs(payload))
    key_line, key_t = hxs(F.lit("line")), hxs(F.lit("t"))
    dframe = F.concat(
        F.lit("3144"), hx8(seq), hx8(F.lit(2)),
        hx8(F.lit(4)), key_line, hx8(F.octet_length("props")), hxs(F.col("props")),
        hx8(F.lit(1)), key_t, hx8(F.octet_length("event_type")), hxs(F.col("event_type")),
    )
    z = encode_zlib(F.unhex(jframe))
    cframe = F.concat(F.lit("3257"), hx8(F.lit(5)),
                      F.lit("3243"), hx8(F.octet_length(z)), hxs(z))
    m = F.col("event_id") % 3
    blob = F.unhex(
        F.when(m == 0, jframe).when(m == 1, dframe).otherwise(cframe)
    )
    r = e.select(
        "event_id", F.posexplode(parse_lumberjack(blob)).alias("idx", "r")
    )
    return r.select(
        "event_id",
        "idx",
        F.col("r.protocol").alias("protocol"),
        F.col("r.seq").alias("seq"),
        F.col("r.frame").alias("frame"),
        F.element_at(F.col("r.fields"), F.lit("line")).alias("line"),
        F.element_at(F.col("r.fields"), F.lit("t")).alias("t"),
        F.get_json_object(F.col("r.json"), "$.m").alias("jm"),
    )


def q_codec_datadog_logs(spark, sf_dir):
    """Datadog Agent logs-intake payload decode (LogMsg array): two
    events per request body; ddtags exercises pair/bare/empty shapes
    through the parse_ddtags split. Oracle = two ground-truth rows per
    event."""
    from vector_spark.functions import parse_datadog_logs

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    m = F.col("event_id") % 3
    ddtags = (
        F.when(m == 0, F.concat(F.lit("env:prod,u"), F.col("user_id").cast("string")))
        .when(m == 1, F.lit(""))
        .otherwise(F.lit("solo"))
    )
    payload = F.to_json(F.array(
        F.struct(
            F.col("props").alias("message"),
            F.col("event_type").alias("status"),
            ms.alias("timestamp"),
            F.concat(F.lit("h"), F.col("user_id").cast("string")).alias("hostname"),
            F.concat(F.lit("svc"), (F.col("user_id") % 3).cast("string")).alias("service"),
            F.lit("nginx").alias("ddsource"),
            ddtags.alias("ddtags"),
        ),
        F.struct(
            F.concat(F.lit("m2:"), F.col("event_id").cast("string")).alias("message"),
            F.lit("info").alias("status"),
            (ms + 1).alias("timestamp"),
            F.lit("h2").alias("hostname"),
            F.lit("svc").alias("service"),
            F.lit("agent").alias("ddsource"),
            F.lit("a:b").alias("ddtags"),
        ),
    ))
    r = e.select(
        "event_id", F.posexplode(parse_datadog_logs(payload)).alias("idx", "r")
    )
    return r.select(
        "event_id", "idx",
        F.col("r.message").alias("message"),
        F.col("r.status").alias("status"),
        F.col("r.ts_ms").alias("ts_ms"),
        F.col("r.hostname").alias("hostname"),
        F.col("r.service").alias("service"),
        F.col("r.ddsource").alias("ddsource"),
        F.try_element_at(F.col("r.tags"), F.lit(1)).alias("tag1"),
        F.size(F.col("r.tags")).alias("ntags"),
    )


def q_codec_s3_notification(spark, sf_dir):
    """S3 event-notification decode: per body one ObjectCreated:Put
    record with a url-encoded key ('+' as space plus percent escapes —
    the reference's urlencoded_string) and one ObjectRemoved:Delete
    (the kind the reference's gate skips; surfaced for filtering).
    Oracle = ground truth incl. the decoded key."""
    from vector_spark.functions import parse_s3_event_notification

    e = ensure_parallelism(_t(spark, sf_dir, "events"))
    eid = F.col("event_id").cast("string")
    key_enc = F.concat(F.lit("dir/f+"), eid, F.lit("%28x%29.log"))
    body = F.to_json(F.struct(F.array(
        F.struct(
            F.lit("2.1").alias("eventVersion"),
            F.lit("aws:s3").alias("eventSource"),
            F.lit("us-east-1").alias("awsRegion"),
            F.lit("ObjectCreated:Put").alias("eventName"),
            F.struct(
                F.struct(F.concat(F.lit("b"), (F.col("user_id") % 4).cast("string")).alias("name")).alias("bucket"),
                F.struct(key_enc.alias("key")).alias("object"),
            ).alias("s3"),
        ),
        F.struct(
            F.lit("2.1").alias("eventVersion"),
            F.lit("aws:s3").alias("eventSource"),
            F.lit("eu-west-1").alias("awsRegion"),
            F.lit("ObjectRemoved:Delete").alias("eventName"),
            F.struct(
                F.struct(F.lit("bx").alias("name")).alias("bucket"),
                F.struct(F.concat(F.lit("gone-"), eid).alias("key")).alias("object"),
            ).alias("s3"),
        ),
    ).alias("Records")))
    r = e.select(
        "event_id",
        F.posexplode(parse_s3_event_notification(body)).alias("idx", "r"),
    )
    return r.select(
        "event_id", "idx",
        F.col("r.event_kind").alias("event_kind"),
        F.col("r.event_name").alias("event_name"),
        F.col("r.aws_region").alias("aws_region"),
        F.col("r.bucket").alias("bucket"),
        F.col("r.key").alias("key"),
    )


def q_codec_pubsub(spark, sf_dir):
    """GCP Pub/Sub envelope decode: base64 data, attributes map,
    messageId, RFC-3339 publishTime to epoch-us, subscription. Oracle =
    ground truth from the source columns."""
    from vector_spark.functions import parse_pubsub_envelope

    e = _t(spark, sf_dir, "events")
    ts_str = F.date_format(
        F.col("ts").cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
    )
    env = F.to_json(F.struct(
        F.struct(
            F.base64(F.col("props").cast("binary")).alias("data"),
            F.create_map(F.lit("t"), F.col("event_type")).alias("attributes"),
            F.concat(F.lit("m"), F.col("event_id").cast("string")).alias("messageId"),
            ts_str.alias("publishTime"),
        ).alias("message"),
        F.lit("projects/p/subscriptions/s0").alias("subscription"),
    ))
    r = e.select("event_id", parse_pubsub_envelope(env).alias("r"))
    return r.select(
        "event_id",
        F.col("r.data").alias("data"),
        F.element_at(F.col("r.attributes"), F.lit("t")).alias("t_attr"),
        F.col("r.message_id").alias("message_id"),
        F.col("r.publish_ts_us").alias("publish_ts_us"),
        F.col("r.subscription").alias("subscription"),
    )


def q_codec_es_bulk(spark, sf_dir):
    """Elasticsearch bulk body roundtrip: every event encoded as its
    action-line/document pair (the `_id` omitted on event_id%3==1, the
    suppressed-type modern form) then parsed back — lossless by
    construction, oracle recomputes the expected rows."""
    from vector_spark.functions import (
        encode_elasticsearch_bulk, parse_elasticsearch_bulk,
    )

    e = _t(spark, sf_dir, "events")
    eid = F.col("event_id").cast("string")
    doc = F.to_json(F.struct(
        F.col("event_type").alias("et"), F.col("event_id").alias("eid")))
    doc_id = F.when(F.col("event_id") % 3 != 1, F.concat(F.lit("id-"), eid))
    body = encode_elasticsearch_bulk(
        doc, F.concat(F.lit("logs-"), (F.col("user_id") % 5).cast("string")),
        doc_id,
    )
    r = e.select(
        "event_id", F.explode(parse_elasticsearch_bulk(body)).alias("r")
    )
    return r.select(
        "event_id",
        F.col("r.action").alias("action"),
        F.col("r.index").alias("index_name"),
        F.col("r.doc_id").alias("doc_id"),
        F.get_json_object(F.col("r.doc"), "$.et").alias("et"),
        F.get_json_object(F.col("r.doc"), "$.eid").cast("bigint").alias("eid_doc"),
    )


def q_codec_hec_encode(spark, sf_dir):
    """Splunk HEC event-endpoint ENCODE (the sink side, inverse of
    codec_splunk_hec) roundtripped through our HEC decoder: fractional
    epoch-second time (micro-exact through decimal(18,6)), optional
    host omitted when null (serde skip-None), object event payload.
    Oracle = ground truth from the source columns."""
    from vector_spark.functions import encode_splunk_hec, parse_splunk_hec

    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    t = (us.cast("decimal(25,6)") / 1000000).cast("decimal(18,6)")
    host = F.when(F.col("event_id") % 3 != 1,
                  F.concat(F.lit("h"), F.col("user_id").cast("string")))
    line = encode_splunk_hec(
        F.col("props"), t, host=host, sourcetype=F.lit("_json"),
        index=F.concat(F.lit("ix"), (F.col("user_id") % 2).cast("string")),
    )
    r = e.select("event_id", parse_splunk_hec(line).alias("r"))
    return r.select(
        "event_id",
        F.unix_micros(F.col("r.ts")).alias("time_us"),
        F.col("r.host").alias("host"),
        F.col("r.sourcetype").alias("sourcetype"),
        F.col("r.index_name").alias("index_name"),
        F.element_at(F.col("r.event_obj"), F.lit("k")).alias("k"),
    )


def q_codec_prom_remote(spark, sf_dir):
    """Prometheus remote-write roundtrip (snappy + prompb WriteRequest,
    functions/prom_remote.py): per event one request body carrying two
    series — a labeled counter sample and a bare-label gauge — encoded
    with our own encoder (the codec_protobuf enc-UDF convention) and
    decoded by the snappy+proto walker. Oracle = ground-truth rows."""
    from pyspark.sql.functions import pandas_udf

    from vector_spark.functions import (
        encode_write_request, parse_prometheus_remote_write,
    )

    e = ensure_parallelism(_t(spark, sf_dir, "events"))

    def enc(data):
        from vector_spark.functions import encode_write_request as ewr

        def one(r):
            return ewr([
                ("evt_total", {"t": r["event_type"], "u": str(r["user_id"] % 5)},
                 [(float(r["event_id"] % 100) + 0.25, int(r["ms"]))]),
                ("up", {}, [(1.0, int(r["ms"]) + 1)]),
            ])
        return data.apply(one, axis=1)

    src = e.select(F.struct(
        "event_id", "event_type", "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
    ).alias("s"), "event_id")
    body = src.select("event_id", pandas_udf(enc, "binary")(F.col("s")).alias("b"))
    r = body.select(
        "event_id",
        F.posexplode(parse_prometheus_remote_write(F.col("b"))).alias("idx", "r"),
    )
    return r.select(
        "event_id", "idx",
        F.col("r.name").alias("name"),
        F.element_at(F.col("r.labels"), F.lit("t")).alias("t_label"),
        F.element_at(F.col("r.labels"), F.lit("u")).alias("u_label"),
        F.col("r.value").alias("value"),
        F.col("r.ts_ms").alias("ts_ms"),
    )


def q_codec_docker_stream(spark, sf_dir):
    """Docker Engine multiplexed-stream demux: per event a stdout frame
    (props payload), a stderr frame, and a truncated tail the walker
    must ignore — wire bytes built with pure hex expressions, so the
    Arrow walker is the only decoder in the loop. Oracle = two
    ground-truth rows per event."""
    from vector_spark.functions import frame_docker_stream

    e = ensure_parallelism(_t(spark, sf_dir, "events"))

    def hx8(c):
        return F.lpad(F.lower(F.hex(c)), 8, "0")

    def hxs(c):
        return F.lower(F.hex(c))

    err = F.concat(F.lit("E:"), F.col("event_type"))
    blob = F.unhex(F.concat(
        F.lit("01000000"), hx8(F.octet_length("props")), hxs(F.col("props")),
        F.lit("02000000"), hx8(F.octet_length(err)), hxs(err),
        F.lit("01000000"), F.lit("0000"),  # truncated header tail
    ))
    r = e.select(
        "event_id", F.posexplode(frame_docker_stream(blob)).alias("idx", "r")
    )
    return r.select(
        "event_id", "idx",
        F.col("r.stream").alias("stream"),
        F.col("r.payload").alias("payload"),
    )


def q_codec_native_proto(spark, sf_dir):
    """Vector native-codec protobuf roundtrip (proto EventArray,
    functions/native_proto.py): per event one frame carrying a LOG (a
    string, an int, a bool, a nested map — rendering exercised) and one
    frame carrying a counter METRIC with tags + timestamp. Decoded by
    the event.proto registry walker; oracle recomputes ground truth."""
    from pyspark.sql.functions import pandas_udf

    e = ensure_parallelism(_t(spark, sf_dir, "events"))

    def enc(data):
        from vector_spark.functions import (
            encode_native_logs, encode_native_metrics,
        )

        def one(r):
            if r["event_id"] % 2 == 0:
                return encode_native_logs([{
                    "message": r["props"],
                    "seq": int(r["event_id"]),
                    "ok": bool(r["user_id"] % 2 == 0),
                    "ctx": {"t": r["event_type"]},
                }])
            return encode_native_metrics([{
                "name": "evt_" + r["event_type"], "namespace": "app",
                "kind": int(r["event_id"] % 2),
                "counter": float(r["user_id"]) + 0.5,
                "tags": {"host": "h" + str(r["user_id"] % 7)},
                "ts_us": int(r["us"]),
            }])
        return data.apply(one, axis=1)

    src = e.select(F.struct(
        "event_id", "props", "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).alias("s"), "event_id")
    body = src.select("event_id", pandas_udf(enc, "binary")(F.col("s")).alias("b"))
    r = body.select(
        "event_id", F.explode(parse_native_proto_col(F.col("b"))).alias("r")
    )
    return r.select(
        "event_id",
        F.col("r.kind").alias("kind"),
        F.element_at(F.col("r.log"), F.lit("message")).alias("message"),
        F.element_at(F.col("r.log"), F.lit("seq")).alias("seq"),
        F.element_at(F.col("r.log"), F.lit("ok")).alias("ok"),
        F.element_at(F.col("r.log"), F.lit("ctx")).alias("ctx"),
        F.col("r.metric_name").alias("metric_name"),
        F.col("r.metric_kind").alias("metric_kind"),
        F.col("r.counter_value").alias("counter_value"),
        F.col("r.tag_host").alias("tag_host"),
        F.col("r.ts_us").alias("ts_us"),
    )


def parse_native_proto_col(c):
    from vector_spark.functions import parse_native_proto

    return parse_native_proto(c)


def q_codec_ddsketch(spark, sf_dir):
    """Datadog Agent SketchPayload decode (functions/datadog_wire.py —
    proto/vector/dd_metric.proto:59-94, the /api/beta/sketches intake):
    per event one sketch carrying two dogsketches with zigzag bucket
    keys (negative keys exercised) and uint32 counts; the whole k/n
    arrays are pinned via md5 of their comma-joins. Build = encode UDF
    (the codec_protobuf convention), oracle = ground truth."""
    from pyspark.sql.functions import pandas_udf

    from vector_spark.functions import parse_sketch_payload

    e = ensure_parallelism(_t(spark, sf_dir, "events"))

    def enc(data):
        from vector_spark.functions import encode_sketch_payload as esp

        def one(r):
            base = int(r["event_id"]) % 50
            return esp([{
                "metric": "lat_" + r["event_type"],
                "host": "h" + str(r["user_id"] % 7),
                "tags": ["env:prod", "u:" + str(r["user_id"] % 5)],
                "dogsketches": [
                    {"ts": int(r["us"]) // 1000000, "cnt": base + 3,
                     "min": base + 0.5, "max": base + 8.5,
                     "avg": 3.0, "sum": (base + 3) * 3.0,
                     "k": [-base - 1, 0, base + 1400],
                     "n": [1, 1, base + 1]},
                    {"ts": int(r["us"]) // 1000000 + 10, "cnt": 1,
                     "min": 2.0, "max": 2.0, "avg": 2.0, "sum": 2.0,
                     "k": [int(r["user_id"]) % 9 + 1], "n": [1]},
                ],
            }])
        return data.apply(one, axis=1)

    src = e.select(F.struct(
        "event_id", "event_type", "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).alias("s"), "event_id")
    body = src.select("event_id", pandas_udf(enc, "binary")(F.col("s")).alias("b"))
    r = body.select(
        "event_id",
        F.posexplode(parse_sketch_payload(F.col("b"))).alias("idx", "r"),
    )
    arr_md5 = lambda c: F.md5(F.array_join(  # noqa: E731
        F.transform(c, lambda x: x.cast("string")), ","))
    return r.select(
        "event_id", "idx",
        F.col("r.metric").alias("metric"),
        F.col("r.host").alias("host"),
        F.try_element_at(F.col("r.tags"), F.lit(2)).alias("u_tag"),
        F.col("r.ts").alias("ts_s"),
        F.col("r.cnt").alias("cnt"),
        F.col("r.min").alias("minv"),
        F.col("r.max").alias("maxv"),
        F.col("r.sum").alias("sumv"),
        arr_md5(F.col("r.k")).alias("k_md5"),
        arr_md5(F.col("r.n")).alias("n_md5"),
    )


def q_sketch_merge(spark, sf_dir):
    """Agent-sketch server-side MERGE (AgentDDSketch::merge,
    ddsketch.rs:710-717): the codec_ddsketch payload fleet exploded to
    bucket grain (datadog_wire.sketch_buckets — the exact level-1 state
    of aggregate_sketch, same gamma/bias key mapping) then
    groupBy(metric, k).sum — bucket counts add loss-free across hosts.
    Oracle = independent arithmetic re-derivation of every bucket
    contribution."""
    from pyspark.sql.functions import pandas_udf

    from vector_spark.functions import sketch_buckets

    e = ensure_parallelism(_t(spark, sf_dir, "events"))

    def enc(data):
        from vector_spark.functions import encode_sketch_payload as esp

        def one(r):
            base = int(r["event_id"]) % 50
            return esp([{
                "metric": "lat_" + r["event_type"],
                "host": "h" + str(r["user_id"] % 7),
                "tags": [],
                "dogsketches": [
                    {"ts": 0, "cnt": base + 3, "min": 0.5, "max": 9.5,
                     "avg": 3.0, "sum": 3.0,
                     "k": [-base - 1, 0, base + 1400],
                     "n": [1, 1, base + 1]},
                    {"ts": 0, "cnt": 1, "min": 2.0, "max": 2.0,
                     "avg": 2.0, "sum": 2.0,
                     "k": [int(r["user_id"]) % 9 + 1], "n": [1]},
                ],
            }])
        return data.apply(one, axis=1)

    src = e.select(
        F.struct("event_id", "event_type", "user_id").alias("s"))
    body = src.select(pandas_udf(enc, "binary")(F.col("s")).alias("body"))
    buckets = sketch_buckets(body)
    return buckets.groupBy("metric", "k").agg(
        F.sum("bucket_n").alias("total_n"),
        F.count(F.lit(1)).alias("n_contribs"),
    )


def oracles() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["sketch_merge"] = """
WITH b AS (SELECT event_id % 50 AS base, user_id, event_type FROM events),
contrib AS (
  SELECT 'lat_' || event_type AS metric, -base - 1 AS k,
         CAST(1 AS BIGINT) AS n FROM b
  UNION ALL
  SELECT 'lat_' || event_type, 0, 1 FROM b
  UNION ALL
  SELECT 'lat_' || event_type, base + 1400, base + 1 FROM b
  UNION ALL
  SELECT 'lat_' || event_type, CAST(user_id % 9 + 1 AS BIGINT), 1 FROM b
)
SELECT metric, CAST(k AS INTEGER) AS k, SUM(n) AS total_n,
       COUNT(*) AS n_contribs
FROM contrib GROUP BY metric, k
"""

    sql["codec_ddsketch"] = """
WITH b AS (SELECT event_id, event_type, user_id, epoch_us(ts) AS us,
                  event_id % 50 AS base FROM events)
SELECT event_id, 0 AS idx,
       'lat_' || event_type AS metric,
       'h' || CAST(user_id % 7 AS VARCHAR) AS host,
       'u:' || CAST(user_id % 5 AS VARCHAR) AS u_tag,
       us // 1000000 AS ts_s,
       base + 3 AS cnt,
       CAST(base AS DOUBLE) + 0.5 AS minv,
       CAST(base AS DOUBLE) + 8.5 AS maxv,
       CAST(base + 3 AS DOUBLE) * 3.0 AS sumv,
       md5(CAST(-base - 1 AS VARCHAR) || ',0,' || CAST(base + 1400 AS VARCHAR)) AS k_md5,
       md5('1,1,' || CAST(base + 1 AS VARCHAR)) AS n_md5
FROM b
UNION ALL
SELECT event_id, 1, 'lat_' || event_type,
       'h' || CAST(user_id % 7 AS VARCHAR),
       'u:' || CAST(user_id % 5 AS VARCHAR),
       us // 1000000 + 10, 1, 2.0, 2.0, 2.0,
       md5(CAST(user_id % 9 + 1 AS VARCHAR)), md5('1')
FROM b
"""

    sql["codec_native_proto"] = """
SELECT event_id,
       CASE WHEN event_id % 2 = 0 THEN 'log' ELSE 'metric' END AS kind,
       CASE WHEN event_id % 2 = 0 THEN props END AS message,
       CASE WHEN event_id % 2 = 0 THEN CAST(event_id AS VARCHAR) END AS seq,
       CASE WHEN event_id % 2 = 0 THEN
         CASE WHEN user_id % 2 = 0 THEN 'true' ELSE 'false' END END AS ok,
       CASE WHEN event_id % 2 = 0
            THEN '{"t":"' || event_type || '"}' END AS ctx,
       CASE WHEN event_id % 2 = 1 THEN 'evt_' || event_type END AS metric_name,
       CASE WHEN event_id % 2 = 1 THEN 'absolute' END AS metric_kind,
       CASE WHEN event_id % 2 = 1
            THEN CAST(user_id AS DOUBLE) + 0.5 END AS counter_value,
       CASE WHEN event_id % 2 = 1
            THEN 'h' || CAST(user_id % 7 AS VARCHAR) END AS tag_host,
       CASE WHEN event_id % 2 = 1 THEN epoch_us(ts) END AS ts_us
FROM events
"""

    sql["codec_prom_remote"] = """
SELECT event_id, 0 AS idx, 'evt_total' AS name,
       event_type AS t_label, CAST(user_id % 5 AS VARCHAR) AS u_label,
       CAST(event_id % 100 AS DOUBLE) + 0.25 AS value,
       epoch_ms(ts) AS ts_ms
FROM events
UNION ALL
SELECT event_id, 1, 'up', NULL, NULL, 1.0, epoch_ms(ts) + 1
FROM events
"""

    sql["codec_docker_stream"] = """
SELECT event_id, 0 AS idx, 'stdout' AS stream, props AS payload FROM events
UNION ALL
SELECT event_id, 1, 'stderr', 'E:' || event_type FROM events
"""

    sql["codec_datadog_logs"] = """
SELECT event_id, 0 AS idx, props AS message, event_type AS status,
       epoch_ms(ts) AS ts_ms,
       'h' || CAST(user_id AS VARCHAR) AS hostname,
       'svc' || CAST(user_id % 3 AS VARCHAR) AS service,
       'nginx' AS ddsource,
       CASE event_id % 3 WHEN 0 THEN 'env:prod'
                         WHEN 2 THEN 'solo' END AS tag1,
       CASE event_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 0 ELSE 1 END AS ntags
FROM events
UNION ALL
SELECT event_id, 1, 'm2:' || CAST(event_id AS VARCHAR), 'info',
       epoch_ms(ts) + 1, 'h2', 'svc', 'agent', 'a:b', 1
FROM events
"""

    sql["codec_s3_notification"] = """
SELECT event_id, 0 AS idx, 'ObjectCreated' AS event_kind,
       'Put' AS event_name, 'us-east-1' AS aws_region,
       'b' || CAST(user_id % 4 AS VARCHAR) AS bucket,
       'dir/f ' || CAST(event_id AS VARCHAR) || '(x).log' AS key
FROM events
UNION ALL
SELECT event_id, 1, 'ObjectRemoved', 'Delete', 'eu-west-1', 'bx',
       'gone-' || CAST(event_id AS VARCHAR)
FROM events
"""

    sql["codec_pubsub"] = """
SELECT event_id, props AS data, event_type AS t_attr,
       'm' || CAST(event_id AS VARCHAR) AS message_id,
       epoch_us(ts) AS publish_ts_us,
       'projects/p/subscriptions/s0' AS subscription
FROM events
"""

    sql["codec_es_bulk"] = """
SELECT event_id, 'index' AS action,
       'logs-' || CAST(user_id % 5 AS VARCHAR) AS index_name,
       CASE WHEN event_id % 3 <> 1
            THEN 'id-' || CAST(event_id AS VARCHAR) END AS doc_id,
       event_type AS et, event_id AS eid_doc
FROM events
"""

    sql["codec_hec_encode"] = """
SELECT event_id, epoch_us(ts) AS time_us,
       CASE WHEN event_id % 3 <> 1
            THEN 'h' || CAST(user_id AS VARCHAR) END AS host,
       '_json' AS sourcetype,
       'ix' || CAST(user_id % 2 AS VARCHAR) AS index_name,
       json_extract_string(props, '$.k') AS k
FROM events
"""

    sql["codec_cri"] = """
SELECT event_id,
       CASE event_id % 4
         WHEN 0 THEN 'evt:' || props
         WHEN 1 THEN 'chunk-' || CAST(event_id AS VARCHAR) || ' '
         WHEN 3 THEN 'late-' || CAST(event_id AS VARCHAR)
       END AS message,
       CASE event_id % 4 WHEN 0 THEN 'stdout' WHEN 1 THEN 'stderr'
         WHEN 3 THEN 'stdout' END AS stream,
       CASE event_id % 4 WHEN 0 THEN FALSE WHEN 1 THEN TRUE
         WHEN 3 THEN FALSE END AS partial,
       CASE WHEN event_id % 4 IN (0, 1) THEN epoch_us(ts) END AS ts_us
FROM events
"""

    sql["codec_docker"] = """
SELECT event_id,
       CASE event_id % 4
         WHEN 0 THEN md5(props)
         WHEN 1 THEN md5('p' || repeat('x', 16383))
         WHEN 2 THEN md5('p' || repeat('x', 16382))
       END AS message_md5,
       CASE event_id % 4
         WHEN 0 THEN strlen(props)
         WHEN 1 THEN 16384
         WHEN 2 THEN 16383
       END AS message_len,
       CASE WHEN event_id % 4 = 3 THEN NULL
            WHEN user_id % 2 = 0 THEN 'stdout' ELSE 'stderr' END AS stream,
       CASE event_id % 4 WHEN 0 THEN FALSE WHEN 1 THEN TRUE
         WHEN 2 THEN FALSE END AS partial,
       CASE WHEN event_id % 4 <> 3 THEN epoch_us(ts) END AS ts_us
FROM events
"""

    sql["partial_merge"] = """
WITH src AS (
  SELECT user_id % 50 AS f, event_id AS pos,
         'm' || CAST(event_id AS VARCHAR) || ';' AS message,
         event_id % 3 <> 0 AS partial,
         epoch_us(ts) AS ts_us
  FROM events
), runs AS (
  SELECT *, SUM(CASE WHEN NOT partial THEN 1 ELSE 0 END)
         OVER (PARTITION BY f ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS run
  FROM src
)
SELECT f, MIN(pos) AS pos,
       STRING_AGG(message, '' ORDER BY pos) AS message,
       BOOL_AND(partial) AS partial,
       ARG_MIN(ts_us, pos) AS ts_us
FROM runs GROUP BY f, run
"""

    sql["codec_heroku"] = """
SELECT event_id,
       epoch_us(ts) AS ts_us,
       'host' || CAST(user_id AS VARCHAR) AS host,
       'app' || CAST(user_id % 7 AS VARCHAR) AS app_name,
       'web.' || CAST(event_id % 5 AS VARCHAR) AS proc_id,
       'evt ' || event_type || ' ' || props AS message
FROM events
"""

    sql["codec_firehose"] = """
SELECT event_id, 'req-' || CAST(event_id AS VARCHAR) AS request_id,
       epoch_ms(ts) AS ts_ms, 0 AS rec_idx, props AS rec
FROM events
UNION ALL
SELECT event_id, 'req-' || CAST(event_id AS VARCHAR),
       epoch_ms(ts), 1, 'rec-' || CAST(event_id AS VARCHAR)
FROM events
"""

    sql["codec_apache_status"] = """
SELECT event_id, 'uptime_seconds_total' AS name, 'counter' AS kind,
       CAST(event_id % 1000 AS DOUBLE) AS value,
       CAST(NULL AS VARCHAR) AS type, CAST(NULL AS VARCHAR) AS state
FROM events
UNION ALL
SELECT event_id, 'access_total', 'counter', CAST(user_id AS DOUBLE),
       NULL, NULL FROM events
UNION ALL
SELECT event_id, 'sent_bytes_total', 'counter',
       CAST((event_id % 50) * 1024 AS DOUBLE), NULL, NULL FROM events
UNION ALL
SELECT event_id, 'cpu_seconds_total', 'gauge',
       CAST(user_id % 7 AS DOUBLE) + 0.5, 'user', NULL
FROM events WHERE event_id % 4 = 0
UNION ALL
SELECT event_id, 'workers', 'gauge', CAST(user_id % 10 AS DOUBLE),
       NULL, 'busy' FROM events
UNION ALL
SELECT event_id, 'workers', 'gauge', 74.0, NULL, 'idle' FROM events
UNION ALL
SELECT event_id, 'connections', 'gauge', CAST(event_id % 9 AS DOUBLE),
       NULL, 'total' FROM events
UNION ALL
SELECT e.event_id, 'scoreboard', 'gauge',
       CAST(CASE s.state WHEN 'waiting' THEN e.user_id % 5
                         WHEN 'keepalive' THEN e.event_id % 3
                         WHEN 'open' THEN 1
                         WHEN 'sending' THEN e.user_id % 2
                         ELSE 0 END AS DOUBLE),
       NULL, s.state
FROM events e CROSS JOIN (
  VALUES ('waiting'), ('starting'), ('reading'), ('sending'), ('keepalive'),
         ('dnslookup'), ('closing'), ('logging'), ('finishing'),
         ('idle_cleanup'), ('open')
) s(state)
"""

    sql["codec_nginx_status"] = """
SELECT event_id,
       CASE WHEN event_id % 4 <> 3 THEN user_id END AS active,
       CASE WHEN event_id % 4 <> 3 THEN event_id % 10000 + 5 END AS accepts,
       CASE WHEN event_id % 4 <> 3 THEN event_id % 10000 + 4 END AS handled,
       CASE WHEN event_id % 4 <> 3 THEN event_id % 100000 END AS requests,
       CASE WHEN event_id % 4 <> 3 THEN user_id % 7 END AS reading,
       CASE WHEN event_id % 4 <> 3 THEN user_id % 11 END AS writing,
       CASE WHEN event_id % 4 <> 3 THEN user_id % 13 END AS waiting
FROM events
"""

    sql["codec_journald"] = """
SELECT event_id,
       CASE WHEN event_id % 4 = 1 THEN 'jd:' || event_type
            ELSE props END AS message,
       'h' || CAST(user_id AS VARCHAR) AS host,
       CASE WHEN event_id % 9 <= 7 THEN
         list_extract(['EMERG','ALERT','CRIT','ERR','WARNING','NOTICE',
                       'INFO','DEBUG'], CAST(event_id % 9 AS INTEGER) + 1)
       ELSE 'UNKNOWN' END AS priority,
       CASE WHEN event_id % 4 = 2
            THEN 'sysd' || CAST(user_id % 4 AS VARCHAR) || '.service'
            ELSE 'u' || CAST(user_id % 4 AS VARCHAR) || '.timer'
       END AS unit,
       CASE WHEN event_id % 4 = 3 THEN epoch_us(ts) + 7
            ELSE epoch_us(ts) END AS ts_us
FROM events
"""

    from .mongo_fixture import oracle_sql as _mongo_oracle
    sql["codec_mongodb_status"] = _mongo_oracle()

    sql["codec_eventstore_stats"] = """
WITH b AS (
  SELECT event_id, CAST(user_id % 9000 AS VARCHAR) AS id,
         event_id AS eid, user_id AS uid
  FROM events WHERE event_id % 7 <> 3
)
SELECT event_id, id, 'process_memory_used_bytes' AS name, 'gauge' AS mtype,
       CAST(uid * 1024 AS DOUBLE) AS value, CAST(NULL AS VARCHAR) AS path
FROM b
UNION ALL
SELECT event_id, id, 'disk_read_bytes_total', 'counter',
       CAST(eid % 100000 AS DOUBLE), NULL FROM b
UNION ALL
SELECT event_id, id, 'disk_written_bytes_total', 'counter',
       CAST(eid * 2 AS DOUBLE), NULL FROM b
UNION ALL
SELECT event_id, id, 'disk_read_ops_total', 'counter',
       CAST(uid % 500 AS DOUBLE), NULL FROM b
UNION ALL
SELECT event_id, id, 'disk_write_ops_total', 'counter',
       CAST(eid % 77 AS DOUBLE), NULL FROM b
UNION ALL
SELECT event_id, id, 'memory_free_bytes', 'gauge',
       CAST(uid * 4096 AS DOUBLE), NULL FROM b
UNION ALL
SELECT event_id, id, 'disk_total_bytes', 'gauge',
       CAST(uid * 8 AS DOUBLE), '/data' || CAST(uid % 4 AS VARCHAR)
FROM b WHERE eid % 3 <> 2
UNION ALL
SELECT event_id, id, 'disk_free_bytes', 'gauge',
       CAST(eid % 9999 AS DOUBLE), '/data' || CAST(uid % 4 AS VARCHAR)
FROM b WHERE eid % 3 <> 2
UNION ALL
SELECT event_id, id, 'disk_used_bytes', 'gauge',
       CAST(eid % 333 AS DOUBLE), '/data' || CAST(uid % 4 AS VARCHAR)
FROM b WHERE eid % 3 <> 2
"""

    sql["codec_ecs_metrics"] = """
WITH b AS (
  SELECT event_id,
         'c' || CAST(user_id % 5 AS VARCHAR) AS container_id,
         CASE WHEN event_id % 3 <> 1
              THEN 'task' || CAST(user_id % 3 AS VARCHAR) END AS container_name,
         epoch_us(ts) AS ts_us,
         event_id AS eid, user_id AS uid
  FROM events
)
SELECT event_id, container_id, container_name,
       'blkio_recursive_io_service_bytes_total' AS name, 'counter' AS mtype,
       CAST(eid % 1000 AS DOUBLE) AS value,
       '202:' || CAST(uid % 4 AS VARCHAR) AS device, 'read' AS op,
       CAST(NULL AS VARCHAR) AS cpu, ts_us
FROM b
UNION ALL
SELECT event_id, container_id, container_name,
       'blkio_recursive_io_service_bytes_total', 'counter',
       CAST(uid * 3 AS DOUBLE), '202:' || CAST(uid % 4 AS VARCHAR), 'write',
       NULL, ts_us FROM b
UNION ALL
SELECT event_id, container_id, container_name,
       'blkio_recursive_io_time_seconds_total', 'counter',
       CAST(eid % 500 AS DOUBLE) / 1000.0, '8:0', '', NULL, ts_us FROM b
UNION ALL
SELECT event_id, container_id, container_name, 'cpu_online_cpus', 'gauge',
       CAST(eid % 3 AS DOUBLE), NULL, NULL, NULL, ts_us FROM b
UNION ALL
SELECT event_id, container_id, container_name,
       'cpu_usage_system_jiffies_total', 'counter',
       CAST(uid * 1000 AS DOUBLE), NULL, NULL, NULL, ts_us FROM b
UNION ALL
SELECT event_id, container_id, container_name,
       'cpu_usage_usermode_jiffies_total', 'counter',
       CAST(uid % 7 AS DOUBLE), NULL, NULL, NULL, ts_us
FROM b WHERE eid % 2 = 0
UNION ALL
SELECT event_id, container_id, container_name,
       'cpu_usage_total_jiffies_total', 'counter',
       CAST(eid AS DOUBLE), NULL, NULL, NULL, ts_us FROM b
UNION ALL
SELECT event_id, container_id, container_name,
       'cpu_throttling_periods_total', 'counter',
       CAST(uid % 5 AS DOUBLE), NULL, NULL, NULL, ts_us
FROM b WHERE eid % 4 = 0
UNION ALL
SELECT event_id, container_id, container_name,
       'cpu_throttled_time_seconds_total', 'counter',
       CAST(eid % 9 AS DOUBLE), NULL, NULL, NULL, ts_us
FROM b WHERE eid % 4 = 0
UNION ALL
SELECT event_id, container_id, container_name,
       'cpu_usage_percpu_jiffies_total', 'counter',
       CAST(uid % 97 AS DOUBLE), NULL, NULL, '0', ts_us
FROM b WHERE eid % 3 >= 1
UNION ALL
SELECT event_id, container_id, container_name,
       'cpu_usage_percpu_jiffies_total', 'counter',
       CAST(eid % 89 AS DOUBLE), NULL, NULL, '1', ts_us
FROM b WHERE eid % 3 >= 2
UNION ALL
SELECT event_id, container_id, container_name,
       'precpu_usage_total_jiffies_total', 'counter',
       CAST(eid % 13 AS DOUBLE), NULL, NULL, NULL, ts_us FROM b
UNION ALL
SELECT event_id, container_id, container_name, 'memory_used_bytes', 'gauge',
       CAST(uid * 4096 AS DOUBLE), NULL, NULL, NULL, ts_us FROM b
UNION ALL
SELECT event_id, container_id, container_name, 'memory_limit_bytes', 'gauge',
       536870912.0, NULL, NULL, NULL, ts_us FROM b WHERE eid % 2 = 1
UNION ALL
SELECT event_id, container_id, container_name, 'memory_cache_bytes', 'gauge',
       CAST(eid % 10000 AS DOUBLE), NULL, NULL, NULL, ts_us FROM b
UNION ALL
SELECT event_id, container_id, container_name, 'memory_rss_bytes', 'gauge',
       CAST(uid AS DOUBLE), NULL, NULL, NULL, ts_us FROM b WHERE eid % 3 = 0
UNION ALL
SELECT event_id, container_id, container_name,
       'memory_page_faults_total', 'counter',
       CAST(eid % 77 AS DOUBLE), NULL, NULL, NULL, ts_us FROM b
UNION ALL
SELECT event_id, container_id, container_name,
       'network_receive_bytes_total', 'counter',
       CAST(uid AS DOUBLE), 'eth0', NULL, NULL, ts_us FROM b
UNION ALL
SELECT event_id, container_id, container_name,
       'network_transmit_bytes_total', 'counter',
       CAST(eid AS DOUBLE), 'eth0', NULL, NULL, ts_us FROM b
UNION ALL
SELECT event_id, container_id, container_name,
       'network_receive_packets_total', 'counter',
       CAST(eid % 50 AS DOUBLE), 'eth1', NULL, NULL, ts_us
FROM b WHERE eid % 5 = 0
"""

    sql["codec_lumberjack"] = """
SELECT event_id, 0 AS idx,
       CASE WHEN event_id % 3 = 1 THEN 1 ELSE 2 END AS protocol,
       event_id % 1000 AS seq,
       CASE WHEN event_id % 3 = 1 THEN 'D' ELSE 'J' END AS frame,
       CASE WHEN event_id % 3 = 1 THEN props END AS line,
       CASE WHEN event_id % 3 = 1 THEN event_type END AS t,
       CASE WHEN event_id % 3 <> 1 THEN props END AS jm
FROM events
"""

    sql["codec_compress"] = """
WITH p AS (
  SELECT event_id, repeat(props, 20) || event_type AS payload FROM events
)
SELECT event_id,
       md5(payload) AS zlib_md5,
       md5(payload) AS gzip_md5,
       md5(payload) AS snappy_md5,
       md5(payload) AS snappy_framed_md5,
       md5(payload) AS zstd_md5,
       md5(payload) AS gzip_members_md5
FROM p
"""

    sql["codec_avro"] = """
SELECT event_id, event_type, user_id,
       CASE WHEN event_id % 3 = 0 THEN event_type END AS note
FROM events
"""

    sql["codec_protobuf"] = """
SELECT event_id, event_type,
       user_id - 50 AS delta,
       [CAST(event_id % 256 AS INTEGER), CAST(user_id AS INTEGER)] AS counts
FROM events
"""

    sql["parse_etld"] = _parse_etld_sql()

    sql["vrl_parse_syslog"] = """
SELECT event_id,
       CAST((event_id % 192) // 8 AS INTEGER) AS facility,
       CAST((event_id % 192) % 8 AS INTEGER) AS severity,
       'host' || CAST(user_id AS VARCHAR) AS hostname,
       'app' || CAST(user_id % 7 AS VARCHAR) AS appname,
       event_id AS procid,
       'event ' || event_type AS message
FROM events
"""

    sql["vrl_parse_grok"] = """
SELECT event_id,
       printf('10.0.%d.%d', user_id % 256, event_id % 256) AS client,
       'GET_' || event_type AS method,
       '/api/u' || CAST(user_id AS VARCHAR) AS path,
       CAST(event_id AS DOUBLE) + 0.5 AS millis,
       printf('10.1.%d.%d', user_id % 200, event_id % 256) AS clientip,
       'user' || CAST(user_id AS VARCHAR) AS auth,
       'GET' AS verb,
       '/r' || CAST(event_id AS VARCHAR) AS request,
       CAST(200 + (event_id % 3) * 100 AS BIGINT) AS response,
       CAST(event_id % 1000 AS BIGINT) AS bytes,
       '"http://e/ref"' AS referrer,
       '"ua/1.0"' AS agent
FROM events
"""

    # c_name is 'Customer#000000042'; c_mktsegment a single upper word
    sql["vrl_case_strings"] = """
SELECT c_custkey,
       lower(replace(c_name, '#', '_')) AS snake,
       lower(replace(c_name, '#', '-')) AS kebab,
       upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2)) AS pascal_seg,
       CASE WHEN length(c_name) > 12 THEN substr(c_name, 1, 12) || '...'
            ELSE c_name END AS short_name
FROM customer
"""

    sql["vrl_ip_functions"] = """
WITH t AS (
  SELECT event_id,
         user_id % 128 AS o2, event_id % 256 AS o3, (event_id * 7) % 256 AS o4
  FROM events
)
SELECT event_id,
       printf('10.%d.%d.%d', o2, o3, o4) AS ip,
       10 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS ip_num,
       printf('10.%d.%d.%d', o2, o3, o4) AS ip_roundtrip,
       o2 < 64 AS in_lower_half,
       printf('10.%d.0.0', o2) AS subnet16
FROM t
"""

    sql["vrl_ipv6_functions"] = """
WITH t AS (
  SELECT event_id,
         user_id % 128 AS o2, event_id % 256 AS o3, (event_id * 7) % 256 AS o4,
         user_id % 65536 AS h1, event_id % 65536 AS h2
  FROM events
)
SELECT event_id,
       printf('2001:db8::%x:%x', h1, h2) AS v6,
       printf('2001:0db8:0000:0000:0000:0000:%04x:%04x', h1, h2) AS v6_full,
       printf('::ffff:10.%d.%d.%d', o2, o3, o4) AS mapped,
       printf('10.%d.%d.%d', o2, o3, o4) AS unmapped
FROM t
"""

    sql["vrl_encode"] = """
SELECT doc_id,
       base64(encode(substr(text, 1, 24))) AS head_b64,
       lower(hex(encode(substr(text, 1, 8)))) AS head_hex,
       regexp_replace(text, '[0-9]+', '#', 'g') AS redacted
FROM documents
"""

    sql["parse_aws_vpc_flow"] = """
SELECT event_id,
       2 AS version,
       CAST(user_id AS VARCHAR) AS account_id,
       printf('eni-%d', event_id) AS interface_id,
       printf('10.%d.%d.1', user_id % 128, event_id % 250) AS srcaddr,
       CASE WHEN event_type = 'error' THEN NULL ELSE event_id % 60000 END AS srcport,
       6 AS protocol,
       event_id % 100 AS packets,
       CAST(round(value * 100, 0) AS BIGINT) AS bytes,
       epoch_us(ts) // 1000000 AS start_ts,
       epoch_us(ts) // 1000000 + 60 AS end_ts,
       CASE WHEN event_type = 'error' THEN NULL ELSE 'ACCEPT' END AS action,
       'OK' AS log_status
FROM events
"""

    sql["parse_aws_alb"] = """
SELECT event_id,
       'http' AS type,
       printf('app/lb/%d', user_id) AS elb,
       printf('192.168.1.%d:%d', user_id % 250, event_id % 60000 + 1024) AS client_host,
       NULL AS target_host,
       CAST(printf('0.%03d', event_id % 1000) AS DOUBLE) AS target_processing_time,
       CASE WHEN event_type = 'error' THEN '500' ELSE '200' END AS elb_status_code,
       event_id % 4096 AS received_bytes,
       event_id % 8192 AS sent_bytes,
       'GET' AS request_method,
       printf('http://example.com/u/%d', user_id) AS request_url,
       printf('agent-%d', user_id) AS user_agent,
       NULL AS ssl_cipher,
       printf('Root=1-%d', event_id) AS trace_id
FROM events
"""

    sql["parse_xml"] = """
SELECT event_id, event_id AS xid, user_id AS xuser, event_type AS xtype,
       CAST(printf('%.2f', value) AS DOUBLE) AS xv
FROM events
"""

    sql["codec_framing_chardelim"] = """
SELECT event_id, 0 AS idx, event_type AS frame FROM events
UNION ALL
SELECT event_id, 1, CAST(user_id AS VARCHAR) FROM events
UNION ALL
SELECT event_id, 2, CAST(event_id AS VARCHAR) FROM events
"""

    sql["codec_framing_octet"] = """
SELECT event_id, 0 AS idx, event_type AS frame FROM events
UNION ALL
SELECT event_id, 1, props FROM events
"""

    sql["codec_netflow_v9"] = """
SELECT epoch_us(ts) // 1000000 AS export_time,
       printf('10.%d.%d.%d',
              (event_id // 65536) % 256,
              (event_id // 256) % 256,
              event_id % 256) AS srcaddr,
       printf('192.168.1.%d', event_id % 200 + 1) AS dstaddr,
       event_id % 50000 + 1024 AS srcport,
       CASE WHEN event_id % 2 = 0 THEN 443 ELSE 80 END AS dstport,
       event_id % 1000 + 1 AS packets,
       (event_id % 1000 + 1) * 64 AS octets,
       CASE WHEN event_id % 3 = 0 THEN 17 ELSE 6 END AS proto
FROM events
"""

    sql["parse_dnstap"] = """
SELECT event_id,
  CASE event_id % 4 WHEN 0 THEN 'ClientQuery' WHEN 1 THEN 'ClientResponse'
       WHEN 2 THEN 'ResolverQuery' ELSE 'ForwarderQuery' END AS message_type,
  CAST(CASE event_id % 4 WHEN 0 THEN 5 WHEN 1 THEN 6 WHEN 2 THEN 3 ELSE 7 END AS INT)
       AS message_type_id,
  CASE event_id % 4 WHEN 2 THEN 'INET6' ELSE 'INET' END AS socket_family,
  CASE event_id % 4 WHEN 2 THEN 'TCP' ELSE 'UDP' END AS socket_protocol,
  CASE event_id % 4 WHEN 0 THEN '10.0.0.1' WHEN 2 THEN '::1'
       WHEN 3 THEN '192.168.5.5' ELSE NULL END AS source_address,
  CAST(CASE event_id % 4 WHEN 0 THEN 1053 WHEN 2 THEN 2053 WHEN 3 THEN 5353
       ELSE NULL END AS INT) AS source_port,
  CASE event_id % 4 WHEN 1 THEN '10.0.0.2' ELSE NULL END AS response_address,
  CAST(CASE event_id % 4 WHEN 1 THEN 53 ELSE NULL END AS INT) AS response_port,
  CASE event_id % 4 WHEN 0 THEN 1700000000000000011 WHEN 1 THEN 1700000001000000022
       WHEN 2 THEN 1700000002000000033 ELSE 1700000003000000044 END AS time_ns,
  CAST(100 + event_id % 4 AS INT) AS header_id,
  CAST(CASE event_id % 4 WHEN 1 THEN 1 ELSE 0 END AS INT) AS header_qr,
  CASE event_id % 4 WHEN 0 THEN 'a0.example.com.' WHEN 1 THEN 'a1.example.org.'
       WHEN 2 THEN 'a2.example.net.' ELSE 'a3.example.io.' END AS question_name,
  CASE event_id % 4 WHEN 0 THEN 'A' WHEN 1 THEN 'AAAA' WHEN 2 THEN 'TXT'
       ELSE 'MX' END AS question_type,
  'vs-test' AS server_id
FROM events
"""

    sql["codec_influxdb"] = """
SELECT event_id,
       'events' AS measurement,
       event_type AS tag_type,
       user_id AS tag_user,
       CAST(printf('%.2f', value) AS DOUBLE) AS f_value,
       event_id % 100 AS f_n,
       epoch_us(ts) * 1000 AS ts_ns
FROM events
"""

    sql["codec_native_json"] = """
SELECT event_id,
       CASE WHEN event_type = 'purchase' THEN 'metric' ELSE 'log' END AS kind,
       CASE WHEN event_type = 'purchase' THEN NULL ELSE event_type END AS log_etype,
       CASE WHEN event_type = 'purchase' THEN NULL ELSE user_id END AS log_uid,
       CASE WHEN event_type = 'purchase' THEN 'revenue' END AS metric_name,
       CASE WHEN event_type = 'purchase' THEN 'incremental' END AS metric_kind,
       CASE WHEN event_type = 'purchase' THEN CAST(printf('%.2f', value) AS DOUBLE) END AS counter_value
FROM events
"""

    _facilities = (
        "'kern','user','mail','daemon','auth','syslog','lpr','news','uucp',"
        "'cron','authpriv','ftp','ntp','security','console','solaris-cron',"
        "'local0','local1','local2','local3','local4','local5','local6','local7'"
    )

    def _randbits_sql(tag: str) -> str:
        md = f"md5('{tag}|' || CAST(event_id AS VARCHAR))"
        terms = [
            f"CAST({_hexval_sql(f'substr({md}, {i + 1}, 1)')} AS BIGINT) * {16 ** (7 - i)}"
            for i in range(8)
        ]
        return "(" + " + ".join(terms) + ")"

    sql["vrl_misc"] = f"""
WITH t AS (
  SELECT event_id,
         lpad(lower(to_hex(epoch_us(ts) // 1000)), 12, '0') AS ms_hex,
         md5(CAST(event_id AS VARCHAR)) AS h
  FROM events
)
SELECT event_id,
  ['emerg','alert','crit','err','warning','notice','info','debug'][CAST(event_id % 8 AS INT) + 1] AS syslog_level,
  CAST(event_id % 8 AS INT) AS syslog_severity,
  [{_facilities}][CAST(event_id % 24 AS INT) + 1] AS syslog_facility,
  event_id AS parsed_hex,
  TRY_CAST(CAST(event_id AS VARCHAR) || '.5e1' AS DOUBLE) AS parsed_float,
  TRY_CAST('not a number' AS DOUBLE) AS parsed_float_bad,
  lower(to_hex(event_id)) AS formatted_hex,
  CAST({_randbits_sql('ri')} % 100 AS BIGINT) AS rand_int,
  ({_randbits_sql('rb')} % 2 = 0) AS rand_bool,
  substr(ms_hex, 1, 8) || '-' || substr(ms_hex, 9, 4) || '-7' ||
  substr(h, 1, 3) || '-' ||
  substr('89ab', ((strpos('0123456789abcdef', substr(h, 4, 1)) - 1) % 4) + 1, 1) ||
  substr(h, 5, 3) || '-' || substr(h, 8, 12) AS uuid_roundtrip
FROM t
"""

    # VRL type predicates/coercions: identical value-shape derivation,
    # json_valid for is_json, same regexes, same to_bool word table,
    # grouped format composed from integer grouping + exact .25 fraction
    sql["vrl_types"] = r"""
WITH t AS (
  SELECT event_id,
    CASE CAST(event_id % 6 AS INT)
      WHEN 0 THEN '123' WHEN 1 THEN '1.5e2' WHEN 2 THEN '"hi"'
      WHEN 3 THEN '[1,2]' WHEN 4 THEN '{"a":1}' ELSE 'null' END AS v,
    CASE CAST(event_id % 3 AS INT) WHEN 0 THEN '' WHEN 1 THEN ' - ' ELSE 'x' END AS nv,
    CASE CAST(event_id % 5 AS INT)
      WHEN 0 THEN 'yes' WHEN 1 THEN 'NO' WHEN 2 THEN '1'
      WHEN 3 THEN 'false' ELSE 'maybe' END AS bw,
    CASE WHEN event_id % 2 = 0 THEN '2024-01-01 00:00:00' ELSE 'not a time' END AS tstr,
    'evt-' || CAST(event_id % 10 AS VARCHAR) || '-end' AS msg,
    CAST(event_id % 1000 AS DOUBLE) * 1111.0 + 0.25 AS fx
  FROM events
)
SELECT event_id,
  json_valid(v) AS v_is_json,
  regexp_matches(v, '^\s*-?\d+\s*$') AS v_is_int,
  regexp_matches(v, '^\s*-?\d+(\.\d+([eE][+-]?\d+)?|[eE][+-]?\d+)\s*$') AS v_is_float,
  (json_valid(v) AND substr(trim(v), 1, 1) = '"') AS v_is_string,
  (json_valid(v) AND substr(trim(v), 1, 1) = '[') AS v_is_array,
  (json_valid(v) AND substr(trim(v), 1, 1) = '{') AS v_is_object,
  (trim(v) = 'null') AS v_is_null,
  (trim(v) IN ('true', 'false')) AS v_is_bool,
  (TRY_CAST(tstr AS TIMESTAMP) IS NOT NULL) AS v_is_ts,
  (nv IS NULL OR trim(nv) = '' OR trim(nv) = '-') AS v_is_nullish,
  CASE WHEN lower(trim(bw)) IN ('true','t','yes','y','1') THEN TRUE
       WHEN lower(trim(bw)) IN ('false','f','no','n','0') THEN FALSE
       ELSE NULL END AS v_to_bool,
  CASE WHEN regexp_matches(v, '^\s*-?\d+\s*$') THEN TRY_CAST(v AS BIGINT) END AS v_to_int,
  format('{:,}', CAST(floor(fx) AS BIGINT)) || '.' ||
    lpad(CAST(CAST(round((fx - floor(fx)) * 100, 0) AS BIGINT) AS VARCHAR), 2, '0') AS v_fmt,
  (contains(msg, 'evt-') AND contains(msg, '-end')) AS v_contains_all,
  (regexp_matches(msg, 'evt-[0-4]-') OR regexp_matches(msg, 'never')) AS v_match_any,
  (length(nv) = 0) AS v_is_empty,
  TRY_CAST(v AS DOUBLE) AS v_to_float,
  CAST(event_id % 7 AS VARCHAR) AS v_to_string,
  (len(list_filter(string_split(msg, '-'), x -> regexp_matches(x, '^[0-4]$'))) > 0) AS v_match_array
FROM t
"""

    sql["vrl_uuid_v7"] = """
WITH t AS (
  SELECT event_id,
         lpad(lower(to_hex(epoch_us(ts) // 1000)), 12, '0') AS ms_hex,
         md5(CAST(event_id AS VARCHAR)) AS h
  FROM events
)
SELECT event_id,
       substr(ms_hex, 1, 8) || '-' || substr(ms_hex, 9, 4) || '-7' ||
       substr(h, 1, 3) || '-' ||
       substr('89ab', ((strpos('0123456789abcdef', substr(h, 4, 1)) - 1) % 4) + 1, 1) ||
       substr(h, 5, 3) || '-' || substr(h, 8, 12) AS uuid7
FROM t
"""

    sql["codec_csv"] = """
SELECT event_id, event_id AS id, event_type AS etype,
       CAST(printf('%.2f', value) AS DOUBLE) AS v
FROM events
"""

    sql["codec_json"] = """
SELECT event_id, user_id AS u, event_type AS t FROM events
"""

    sql["codec_cdx"] = """
SELECT doc_id,
       'org,example)/p/' || CAST(doc_id AS VARCHAR) AS urlkey,
       '20240101' || lpad(CAST(doc_id % 1000000 AS VARCHAR), 6, '0') AS ts,
       'https://example.org/p/' || CAST(doc_id AS VARCHAR) AS url,
       'text/html' AS mime,
       '200' AS status,
       md5(text) AS digest,
       CAST(n_chars AS BIGINT) AS length,
       CAST(doc_id * 100 AS BIGINT) AS offset,
       'crawl-00.warc.gz' AS filename
FROM documents
"""

    # multi-match enrichment: same literal dup-keyed dim, LEFT JOIN fan-out
    # codec_splunk_hec: ground-truth rows from the source columns; the .5
    # fraction is binary-exact so both engines land on the same epoch-us
    sql["codec_splunk_hec"] = """
SELECT event_id,
       epoch_us(date_trunc('second', ts)) + (event_id % 2) * 500000 AS ts_us,
       'h' || CAST(user_id % 7 AS VARCHAR) AS host,
       'app' || CAST(user_id % 3 AS VARCHAR) AS source,
       '_json' AS sourcetype,
       CASE WHEN event_id % 4 = 0 THEN 'ops' ELSE 'main' END AS index_name,
       CASE WHEN event_id % 3 = 0 THEN NULL
            ELSE event_type || ' #' || CAST(event_id AS VARCHAR) END AS event,
       CASE WHEN event_id % 3 = 0 THEN event_type END AS msg,
       CASE WHEN event_id % 3 = 0 THEN CAST(event_id % 7 AS BIGINT) END AS code,
       CAST(event_id % 100 AS BIGINT) AS k,
       'r' || CAST(user_id % 4 AS VARCHAR) AS region
FROM events
"""

    # codec_fluent: expected entries straight from events arithmetic
    sql["codec_fluent"] = """
WITH s AS (
  SELECT event_id, event_type, value,
         CAST(epoch_us(ts) // 1000000 AS BIGINT) AS secs
  FROM events
)
SELECT event_id, 0 AS entry_idx, 'app.' || event_type AS tag,
       secs AS ts_sec,
       CASE WHEN event_id % 3 = 1 THEN CAST(event_id % 1000000 AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS ts_nsec,
       event_id AS id, event_type AS type,
       CAST(round(value * 100) AS BIGINT) AS v100
FROM s
UNION ALL
SELECT event_id, 1, 'app.' || event_type, secs + 1, CAST(0 AS BIGINT),
       event_id, event_type, CAST(round(value * 100) AS BIGINT)
FROM s WHERE event_id % 3 <> 0
"""

    # codec_loki: per-event ground truth; the batch/parse trip must be lossless
    sql["codec_loki"] = """
SELECT 'a' || CAST(user_id % 3 AS VARCHAR) AS app,
       event_type AS level,
       epoch_us(ts) * 1000 AS ts_ns,
       CAST(event_id AS VARCHAR) || ':' || props AS line
FROM events
"""

    # codec_prometheus: 5 ground-truth samples per scrape body
    sql["codec_prometheus"] = """
SELECT event_id, 2 AS line_pos, 'evt_value' AS name, 'evt_value' AS family,
       CAST(NULL AS VARCHAR) AS le,
       CAST(user_id % 5 AS VARCHAR) AS u_label,
       value, epoch_ms(ts) AS ts_ms,
       'gauge' AS metric_type, 'Latest value.' AS help
FROM events
UNION ALL
SELECT event_id, 4, 'evt_lat_bucket', 'evt_lat', '0.5', NULL,
       CAST(event_id % 10 AS DOUBLE), NULL, 'histogram', NULL
FROM events
UNION ALL
SELECT event_id, 5, 'evt_lat_bucket', 'evt_lat', '+Inf', NULL,
       CAST(event_id % 10 + 3 AS DOUBLE), NULL, 'histogram', NULL
FROM events
UNION ALL
SELECT event_id, 6, 'evt_lat_sum', 'evt_lat', NULL, NULL,
       CAST(event_id % 100 AS DOUBLE) + 0.5, NULL, 'histogram', NULL
FROM events
UNION ALL
SELECT event_id, 7, 'evt_lat_count', 'evt_lat', NULL, NULL,
       CAST(event_id % 10 + 3 AS DOUBLE), NULL, 'histogram', NULL
FROM events
"""

    # codec_statsd: ground-truth per event_id%4 shape
    sql["codec_statsd"] = """
SELECT event_id,
  CASE WHEN event_id % 4 = 3 THEN NULL ELSE 'evt.' || event_type END AS name,
  CASE event_id % 4
    WHEN 0 THEN CAST(event_id % 50 AS DOUBLE)
    WHEN 1 THEN CAST(event_id % 9 + 1 AS DOUBLE)
    WHEN 2 THEN value END AS value,
  CASE event_id % 4 WHEN 0 THEN 'c' WHEN 1 THEN 'g' WHEN 2 THEN 'ms' END AS metric_type,
  CASE WHEN event_id % 4 = 0 THEN 0.5 END AS sample_rate,
  CASE event_id % 4 WHEN 0 THEN FALSE WHEN 1 THEN TRUE WHEN 2 THEN FALSE END AS delta,
  CASE WHEN event_id % 4 = 0 THEN 'prod' END AS env,
  CASE WHEN event_id % 4 = 0 THEN 'u' || CAST(user_id % 5 AS VARCHAR) END AS u_tag
FROM events
"""

    # codec_otlp_traces: two ground-truth span rows per event; the child's
    # UPPERCASE wire spanId must come back lowercased
    sql["codec_otlp_traces"] = """
WITH s AS (
  SELECT event_id, ts, user_id, event_type,
         md5('tr|' || CAST(event_id AS VARCHAR)) AS trace_id,
         substr(md5('sp|' || CAST(event_id AS VARCHAR)), 1, 16) AS root_id,
         substr(md5('sp2|' || CAST(event_id AS VARCHAR)), 1, 16) AS child_id,
         (event_id % 1000 + 1) * 1000 AS dur,
         'svc-' || CAST(user_id % 5 AS VARCHAR) AS service
  FROM events
)
SELECT event_id, 0 AS span_idx, trace_id, root_id AS span_id,
       CAST(NULL AS VARCHAR) AS parent_span_id,
       event_type || '-root' AS name, 2 AS kind,
       epoch_us(ts) AS start_us, CAST(dur AS BIGINT) AS duration_nano,
       CASE WHEN event_type = 'error' THEN 2 END AS status_code,
       CASE WHEN event_type = 'error' THEN 'boom' END AS status_message,
       CAST(NULL AS VARCHAR) AS db, service
FROM s
UNION ALL
SELECT event_id, 1, trace_id, child_id, root_id,
       'db.query', 3,
       epoch_us(ts), CAST(dur - 600 AS BIGINT),
       NULL, NULL, 'pg', service
FROM s
"""

    # codec_otlp_metrics: three ground-truth data-point rows per event
    sql["codec_otlp_metrics"] = """
SELECT event_id, 0 AS dp_idx, 'evt.value' AS metric_name, 'ms' AS unit,
       'gauge' AS kind, CAST(NULL AS INTEGER) AS temporality,
       CAST(NULL AS BOOLEAN) AS monotonic,
       epoch_us(ts) AS ts_us, value,
       CAST(user_id % 4 AS BIGINT) AS core,
       'svc-' || CAST(user_id % 5 AS VARCHAR) AS service
FROM events
UNION ALL
SELECT event_id, 1, 'evt.count', NULL, 'sum', 2, TRUE,
       epoch_us(ts), CAST(event_id % 100 AS DOUBLE),
       NULL, 'svc-' || CAST(user_id % 5 AS VARCHAR)
FROM events
UNION ALL
SELECT event_id, 2, 'evt.count', NULL, 'sum', 2, TRUE,
       epoch_us(ts) + 1000, CAST(event_id % 100 + 1 AS DOUBLE),
       NULL, 'svc-' || CAST(user_id % 5 AS VARCHAR)
FROM events
"""

    # codec_otlp: expected flattened log records rebuilt from the source
    # columns (the codec_warc pattern — envelope build + decode on the
    # Spark side only, ground truth by construction here)
    sql["codec_otlp"] = """
WITH s AS (
  SELECT event_id, ts, user_id, event_type, value,
    CASE event_type WHEN 'error' THEN 17 WHEN 'signup' THEN 9 ELSE 5 END AS sn,
    CASE event_type WHEN 'error' THEN 'ERROR' WHEN 'signup' THEN 'INFO' ELSE 'DEBUG' END AS st
  FROM events
)
SELECT event_id, 0 AS rec_idx, epoch_us(ts) AS ts_us,
       CAST(sn AS INTEGER) AS severity_number, st AS severity_text,
       event_type || ' #' || CAST(event_id AS VARCHAR) AS body,
       'svc-' || CAST(user_id % 5 AS VARCHAR) AS service,
       CAST(user_id AS BIGINT) AS host_id,
       '1.' || CAST(event_id % 3 AS VARCHAR) AS scope_version,
       CAST(event_id % 100 AS BIGINT) AS k,
       value AS val,
       event_id % 2 = 0 AS ok
FROM s
UNION ALL
SELECT event_id, 1, epoch_us(ts) + 1000, 5, 'DEBUG', 'heartbeat',
       'svc-' || CAST(user_id % 5 AS VARCHAR), CAST(user_id AS BIGINT),
       '1.' || CAST(event_id % 3 AS VARCHAR),
       CAST(event_id % 100 AS BIGINT), NULL, NULL
FROM s
"""

    sql["codec_warc"] = """
SELECT event_id, 0 AS idx, 'response' AS warc_type,
       'https://crawl.example/' || CAST(event_id AS VARCHAR) AS target_uri,
       epoch_us(date_trunc('second', ts)) AS warc_date_us,
       'urn:uuid:id-' || CAST(event_id AS VARCHAR) AS record_id,
       'application/json' AS content_type,
       CAST(strlen(props) AS BIGINT) AS content_length,
       props AS payload
FROM events
UNION ALL
SELECT event_id, 1, 'metadata', NULL, NULL, NULL, NULL,
       CAST(strlen(event_type) AS BIGINT), event_type
FROM events
"""


    return sql


QUERIES = {
    "codec_avro": q_codec_avro,
    "codec_cdx": q_codec_cdx,
    "codec_compress": q_codec_compress,
    "codec_protobuf": q_codec_protobuf,
    "codec_csv": q_codec_csv,
    "codec_framing_chardelim": q_codec_framing_chardelim,
    "codec_framing_octet": q_codec_framing_octet,
    "codec_influxdb": q_codec_influxdb,
    "codec_json": q_codec_json,
    "codec_native_json": q_codec_native_json,
    "codec_netflow_v9": q_codec_netflow_v9,
    "codec_warc": q_codec_warc,
    "codec_otlp": q_codec_otlp,
    "codec_splunk_hec": q_codec_splunk_hec,
    "codec_otlp_metrics": q_codec_otlp_metrics,
    "codec_otlp_traces": q_codec_otlp_traces,
    "codec_statsd": q_codec_statsd,
    "codec_prometheus": q_codec_prometheus,
    "codec_loki": q_codec_loki,
    "codec_fluent": q_codec_fluent,
    "codec_cri": q_codec_cri,
    "codec_docker": q_codec_docker,
    "partial_merge": q_partial_merge,
    "codec_heroku": q_codec_heroku,
    "codec_firehose": q_codec_firehose,
    "codec_apache_status": q_codec_apache_status,
    "codec_nginx_status": q_codec_nginx_status,
    "codec_journald": q_codec_journald,
    "codec_ecs_metrics": q_codec_ecs_metrics,
    "codec_eventstore_stats": q_codec_eventstore_stats,
    "codec_mongodb_status": q_codec_mongodb_status,
    "codec_lumberjack": q_codec_lumberjack,
    "codec_datadog_logs": q_codec_datadog_logs,
    "codec_s3_notification": q_codec_s3_notification,
    "codec_pubsub": q_codec_pubsub,
    "codec_es_bulk": q_codec_es_bulk,
    "codec_hec_encode": q_codec_hec_encode,
    "codec_prom_remote": q_codec_prom_remote,
    "codec_docker_stream": q_codec_docker_stream,
    "codec_native_proto": q_codec_native_proto,
    "codec_ddsketch": q_codec_ddsketch,
    "sketch_merge": q_sketch_merge,
    "demo_logs_roundtrip": q_demo_logs_roundtrip,
    "parse_aws_alb": q_parse_aws_alb,
    "parse_aws_vpc_flow": q_parse_aws_vpc_flow,
    "parse_dnstap": q_parse_dnstap,
    "parse_xml": q_parse_xml,
    "vrl_case_strings": q_vrl_case_strings,
    "vrl_encode": q_vrl_encode,
    "vrl_hmac": q_vrl_hmac,
    "vrl_ip_functions": q_vrl_ip_functions,
    "vrl_ipv6_functions": q_vrl_ipv6_functions,
    "vrl_misc": q_vrl_misc,
    "parse_etld": q_parse_etld,
    "vrl_parse_grok": q_vrl_parse_grok,
    "vrl_parse_syslog": q_vrl_parse_syslog,
    "vrl_types": q_vrl_types,
    "vrl_uuid_v7": q_vrl_uuid_v7,
}
