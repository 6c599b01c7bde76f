"""Platform/agent log-collection wire formats: kubernetes CRI and Docker
json-file log lines (+ the partial-event merger), Heroku Logplex HTTP
drain bodies, AWS Kinesis Firehose request envelopes, journald
(journalctl --output=json) records, and the apache mod_status / nginx
stub_status scrape formats.

These are the FORMATS of the reference's remaining host/platform sources
(the RPC transports themselves are out of scope per SURVEY §2.4 — the
parquet table layer is the input):

- CRI lines:      src/sources/kubernetes_logs/parser/cri.rs:146-183
- Docker json:    src/sources/kubernetes_logs/parser/docker.rs:54-171
- partial merge:  src/sources/kubernetes_logs/partial_events_merger.rs:83-160
- Heroku Logplex: src/sources/heroku_logs.rs:279-404 (splitn(8, ' '))
- journald:       src/sources/journald.rs:679,840-920 (json output,
                  int-array byte values, PRIORITY remap, unit fixup)
- apache status:  src/sources/apache_metrics/parser.rs (mod_status ?auto;
                  SCOREBOARD table lines 7-23, metric names 150-380)
- nginx status:   src/sources/nginx_metrics/parser.rs (stub_status)
- Firehose:       src/sources/aws_kinesis_firehose/handlers.rs (JSON
                  envelope, base64 record data)

All decoders here are pure Column expressions (JVM-side, whole-stage
codegen) — zero Python. At 100 TB each is a narrow map over the scan;
the only shuffle anywhere in this module is the per-file window inside
`merge_partial_lines`, whose keys are FILES (bounded cardinality, the
same per-file sequencing the reference's in-memory merger implies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, Window


# RFC 3339 with up to nanosecond fractions (CRI stamps nanos; Spark
# timestamps are micros) -> truncate the fraction to 6 digits before the
# cast so `try_to_timestamp` accepts it. Explicit offsets ('Z', +hh:mm)
# make the result absolute regardless of session timezone.
def _rfc3339_us(ts: Column) -> Column:
    trimmed = F.regexp_replace(ts, r"(\.\d{6})\d+", r"$1")
    return F.unix_micros(F.try_to_timestamp(trimmed))


CRI_SCHEMA = (
    "struct<message:string, stream:string, partial:boolean, ts_us:bigint>"
)


def parse_cri(col: Column) -> Column:
    """Decode one kubernetes CRI log line (parser/cri.rs:146-183):

        <rfc3339-ts> <stdout|stderr> <F|P> <message>

    Splits at the first three single spaces exactly like the reference's
    position(is_delimiter) walk; a stream outside stdout/stderr or a tag
    outside F/P is unmatched -> null struct (the reference drops the
    event). `partial` = tag 'P' (cri.rs:74-86, the `_partial` flag the
    merger consumes). One trailing newline is trimmed from the message
    (cri.rs:168-174 / vectordotdev#8606). An unparseable timestamp
    yields ts_us null but keeps the event, mirroring the reference's
    conversion-error branch (event kept, timestamp skipped)."""
    # \z + [\s\S]: Java's `$` matches BEFORE a final line terminator
    # (\n, \r, U+0085 NEL, U+2028, U+2029) and `.` excludes them, so a
    # message ending in NEL would silently lose it vs the reference's
    # byte walk (hypothesis-found); \z anchors at true end-of-input.
    pat = r"^(\S+) (stdout|stderr) ([FP]) ([\s\S]*)\z"
    ok = col.rlike(pat)
    ts_s = F.regexp_extract(col, pat, 1)
    stream = F.regexp_extract(col, pat, 2)
    tag = F.regexp_extract(col, pat, 3)
    msg = F.regexp_replace(F.regexp_extract(col, pat, 4), r"\n\z", "")
    null_s = F.lit(None).cast("string")
    return F.struct(
        F.when(ok, msg).otherwise(null_s).alias("message"),
        F.when(ok, stream).otherwise(null_s).alias("stream"),
        F.when(ok, tag == "P").alias("partial"),
        F.when(ok, _rfc3339_us(ts_s)).alias("ts_us"),
    )


# docker.rs:98 — messages are split by the json-file driver at exactly
# 16 KiB; a message of exactly that length without a trailing newline is
# considered partial.
DOCKER_MESSAGE_SPLIT_THRESHOLD = 16 * 1024


def parse_docker_log(col: Column) -> Column:
    """Decode one Docker json-file log line (parser/docker.rs:54-171):
    `{"log": "...", "stream": "...", "time": "rfc3339"}`.

    Partial heuristic is the reference's exactly (docker.rs:133-156):
    a message of exactly DOCKER_MESSAGE_SPLIT_THRESHOLD bytes is partial
    by default; a trailing newline is trimmed and forces non-partial.
    Invalid JSON or a missing time field -> null struct (the reference
    drops the event on either error)."""
    j = F.from_json(col, "struct<log:string, stream:string, time:string>")
    raw = j["log"]
    ends_nl = raw.endswith("\n")
    # \z (not $): Java's $ also matches BEFORE a final line terminator, which
    # would trim two newlines from a "...\n\n" message.
    msg = F.when(ends_nl, F.regexp_replace(raw, r"\n\z", "")).otherwise(raw)
    partial = (F.octet_length(raw) == F.lit(DOCKER_MESSAGE_SPLIT_THRESHOLD)) & ~ends_nl
    ts_us = _rfc3339_us(j["time"])
    ok = j.isNotNull() & raw.isNotNull() & j["time"].isNotNull() & ts_us.isNotNull()
    null_s = F.lit(None).cast("string")
    return F.struct(
        F.when(ok, msg).otherwise(null_s).alias("message"),
        F.when(ok, j["stream"]).otherwise(null_s).alias("stream"),
        F.when(ok, partial).alias("partial"),
        F.when(ok, ts_us).alias("ts_us"),
    )


def merge_partial_lines(
    df: DataFrame,
    key_cols: tuple[str, ...],
    order_col: str,
    message_col: str = "message",
    partial_col: str = "partial",
) -> DataFrame:
    """Batch twin of the reference's partial-event merger
    (partial_events_merger.rs:83-160): within each key (= one log FILE),
    consecutive partial lines are concatenated, in order and with no
    separator, onto the next non-partial line; every other column of the
    merged event comes from the FIRST line of its run (the reference
    merges later messages into the buffered first event). A trailing run
    that never sees its final line still emits, merged, with
    `partial` = true — the batch analogue of the merger's expiration
    flush.

    Plan: one window (reverse running count of full lines) + one groupBy
    over (keys, run id) with min_by/array_sort aggregation. The window
    partitions by FILE — bounded cardinality, and per-file sequencing is
    inherent to the format (the reference holds the same per-file state
    in memory). At 100 TB the shuffle carries one row per line but only
    within hot files; files are independent -> scales with file count."""
    # NULL partial flags (e.g. parse_cri unmatched rows) normalize to
    # not-partial: an absent marker is a complete line in the reference's
    # merger, and the streaming twin applies the same coalesce.
    part_n = F.coalesce(F.col(partial_col), F.lit(False))
    grp = F.sum(
        F.when(~part_n, F.lit(1)).otherwise(F.lit(0))
    ).over(
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    other = [
        c for c in df.columns
        if c not in (*key_cols, order_col, message_col, partial_col)
    ]
    tagged = df.withColumn("_run", grp)
    agg = [
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col).alias("o"),
                                            F.col(message_col).alias("m")))
                ),
                lambda s: s["m"],
            ),
            "",
        ).alias(message_col),
        F.min(order_col).alias(order_col),
        # a run is still-partial only when NO full line terminated it
        # (false < true, so min() is false whenever the closer is present)
        F.min(part_n).alias(partial_col),
        *[F.min_by(c, F.col(order_col)).alias(c) for c in other],
    ]
    out = tagged.groupBy(*key_cols, "_run").agg(*agg).drop("_run")
    return out.select(df.columns)


HEROKU_LINE_SCHEMA = (
    "struct<ts_us:bigint, host:string, app_name:string, proc_id:string,"
    " message:string>"
)


def parse_heroku_logplex(body: Column) -> Column:
    """Decode a Heroku Logplex HTTP drain body (heroku_logs.rs:279-404)
    into array<struct<ts_us, host, app_name, proc_id, message>>.

    The body is newline-separated octet-counted syslog lines; the
    reference splits each line `splitn(8, ' ')` and keeps parts
    [2]=timestamp [3]=host [4]=app_name [5]=proc_id [7]=message (parts
    [0]/[1]/[6] are the octet count, <pri>version, and the '-' msgid).
    A line with fewer than 8 parts is dropped, exactly as the
    reference's `parts.len() == 8` guard. Unparseable timestamps keep
    the event with ts_us null (heroku_logs.rs:364 inserts only on Ok)."""
    lines = F.filter(F.split(body, r"\r?\n"), lambda l: l != "")
    parts = lambda l: F.split(l, " ", 8)  # noqa: E731
    def line_struct(l):
        p = parts(l)
        ok = F.size(p) == 8
        null_s = F.lit(None).cast("string")
        return F.struct(
            F.when(ok, _rfc3339_us(p[2])).alias("ts_us"),
            F.when(ok, p[3]).otherwise(null_s).alias("host"),
            F.when(ok, p[4]).otherwise(null_s).alias("app_name"),
            F.when(ok, p[5]).otherwise(null_s).alias("proc_id"),
            F.when(ok, p[7]).otherwise(null_s).alias("message"),
        )
    mapped = F.transform(lines, line_struct)
    return F.filter(mapped, lambda s: s["host"].isNotNull() | s["ts_us"].isNotNull())


FIREHOSE_SCHEMA = (
    "struct<request_id:string, ts_ms:bigint, records:array<string>>"
)


def parse_firehose_envelope(col: Column) -> Column:
    """Decode an AWS Kinesis Firehose HTTP-endpoint request envelope
    (src/sources/aws_kinesis_firehose/handlers.rs; public Firehose
    http_endpoint delivery contract): `{"requestId": ..., "timestamp":
    epoch-ms, "records": [{"data": base64}, ...]}` -> struct with the
    records base64-decoded to UTF-8 strings in arrival order. The
    reference decodes each record's bytes then runs the configured
    codec over them; compose with parse_* / frame_* for that stage."""
    j = F.from_json(
        col,
        "struct<requestId:string, timestamp:bigint,"
        " records:array<struct<data:string>>>",
    )
    return F.struct(
        j["requestId"].alias("request_id"),
        j["timestamp"].alias("ts_ms"),
        F.transform(
            j["records"], lambda r: F.unbase64(r["data"]).cast("string")
        ).alias("records"),
    )


# apache_metrics/parser.rs:7-23 — scoreboard char -> state tag. Every
# state emits (0 when absent from the scoreboard string).
APACHE_SCOREBOARD = [
    ("_", "waiting"), ("S", "starting"), ("R", "reading"), ("W", "sending"),
    ("K", "keepalive"), ("D", "dnslookup"), ("C", "closing"), ("L", "logging"),
    ("G", "finishing"), ("I", "idle_cleanup"), (".", "open"),
]

APACHE_METRIC_SCHEMA = (
    "array<struct<name:string, kind:string, value:double,"
    " type:string, state:string>>"
)


def parse_apache_status(col: Column) -> Column:
    """Decode an apache mod_status `?auto` page into the reference's
    metric rows (apache_metrics/parser.rs:150-408): counters
    uptime_seconds_total / access_total / sent_bytes_total (kBytes*1024)
    / duration_seconds_total; gauges cpu_seconds_total{type=user|system|
    children_user|children_system}, cpu_load, workers{state=idle|busy},
    connections{state=total|writing|closing|keepalive}, and one
    scoreboard{state=...} gauge per known state (zero-filled, the
    reference's `unwrap_or_default`). Metrics emit only when their
    source key is present, like the reference's per-key match. Pure
    expressions: one kv-map build + a literal fold over the scoreboard
    table."""
    kv = F.map_from_entries(
        F.transform(
            F.filter(
                F.split(col, r"\r?\n"), lambda l: l.rlike("^[^:]+: ")
            ),
            lambda l: F.struct(
                F.regexp_extract(l, "^([^:]+): ", 1).alias("key"),
                F.regexp_extract(l, "^[^:]+: (.*)\z", 1).alias("value"),
            ),
        )
    )
    null_s = F.lit(None).cast("string")

    def m(key, name, kind, scale=None, type_tag=None, state_tag=None):
        v = F.element_at(kv, F.lit(key)).cast("double")
        if scale is not None:
            v = v * scale
        return F.when(
            F.element_at(kv, F.lit(key)).isNotNull(),
            F.array(F.struct(
                F.lit(name).alias("name"), F.lit(kind).alias("kind"),
                v.alias("value"),
                (F.lit(type_tag) if type_tag else null_s).alias("type"),
                (F.lit(state_tag) if state_tag else null_s).alias("state"),
            )),
        ).otherwise(F.array().cast(APACHE_METRIC_SCHEMA))

    sb = F.element_at(kv, F.lit("Scoreboard"))
    score = F.when(
        sb.isNotNull(),
        F.array(*[
            F.struct(
                F.lit("scoreboard").alias("name"), F.lit("gauge").alias("kind"),
                (F.length(sb) - F.length(F.replace(sb, F.lit(ch), F.lit("")))
                 ).cast("double").alias("value"),
                null_s.alias("type"), F.lit(state).alias("state"),
            )
            for ch, state in APACHE_SCOREBOARD
        ]),
    ).otherwise(F.array().cast(APACHE_METRIC_SCHEMA))

    parts = [
        m("ServerUptimeSeconds", "uptime_seconds_total", "counter"),
        m("Total Accesses", "access_total", "counter"),
        m("Total kBytes", "sent_bytes_total", "counter", scale=F.lit(1024.0)),
        m("Total Duration", "duration_seconds_total", "counter"),
        m("CPUUser", "cpu_seconds_total", "gauge", type_tag="user"),
        m("CPUSystem", "cpu_seconds_total", "gauge", type_tag="system"),
        m("CPUChildrenUser", "cpu_seconds_total", "gauge", type_tag="children_user"),
        m("CPUChildrenSystem", "cpu_seconds_total", "gauge", type_tag="children_system"),
        m("CPULoad", "cpu_load", "gauge"),
        m("IdleWorkers", "workers", "gauge", state_tag="idle"),
        m("BusyWorkers", "workers", "gauge", state_tag="busy"),
        m("ConnsTotal", "connections", "gauge", state_tag="total"),
        m("ConnsAsyncWriting", "connections", "gauge", state_tag="writing"),
        m("ConnsAsyncClosing", "connections", "gauge", state_tag="closing"),
        m("ConnsAsyncKeepAlive", "connections", "gauge", state_tag="keepalive"),
        score,
    ]
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


NGINX_STATUS_SCHEMA = (
    "struct<active:bigint, accepts:bigint, handled:bigint, requests:bigint,"
    " reading:bigint, writing:bigint, waiting:bigint>"
)


def parse_nginx_stub_status(col: Column) -> Column:
    """Decode an nginx stub_status page (src/sources/nginx_metrics/
    parser.rs; public stub_status module docs):

        Active connections: 291
        server accepts handled requests
         16630948 16630948 31070465
        Reading: 6 Writing: 179 Waiting: 106

    -> struct of the seven counters/gauges the reference emits
    (connections_active, connections_accepted_total, _handled_total,
    http_requests_total, Reading/Writing/Waiting gauges). Unmatched
    input -> null struct."""
    active = F.regexp_extract(col, r"Active connections:\s+(\d+)", 1)
    ahr = r"server accepts handled requests\s+(\d+)\s+(\d+)\s+(\d+)"
    rww = r"Reading:\s*(\d+)\s+Writing:\s*(\d+)\s+Waiting:\s*(\d+)"
    ok = (active != "") & col.rlike(ahr) & col.rlike(rww)
    b = lambda c: F.when(ok, c.cast("bigint"))  # noqa: E731
    return F.struct(
        b(active).alias("active"),
        b(F.regexp_extract(col, ahr, 1)).alias("accepts"),
        b(F.regexp_extract(col, ahr, 2)).alias("handled"),
        b(F.regexp_extract(col, ahr, 3)).alias("requests"),
        b(F.regexp_extract(col, rww, 1)).alias("reading"),
        b(F.regexp_extract(col, rww, 2)).alias("writing"),
        b(F.regexp_extract(col, rww, 3)).alias("waiting"),
    )


# journald.rs:896-920 — PRIORITY number -> syslog keyword.
_JOURNALD_PRIORITY = ["EMERG", "ALERT", "CRIT", "ERR",
                      "WARNING", "NOTICE", "INFO", "DEBUG"]

JOURNALD_SCHEMA = (
    "struct<message:string, host:string, priority:string, unit:string,"
    " ts_us:bigint>"
)


def parse_journald(col: Column) -> Column:
    """Decode one `journalctl --output=json` record line
    (journald.rs:679,840-920): MESSAGE -> message (journalctl renders
    non-UTF-8-safe values as int ARRAYS of bytes — decoded back to UTF-8
    here, the reference's decode_array_as_bytes), _HOSTNAME -> host,
    PRIORITY -> syslog keyword (remap_priority), _SYSTEMD_UNIT with the
    reference's fixup_unit ('.service' appended when no extension),
    timestamp from _SOURCE_REALTIME_TIMESTAMP else __REALTIME_TIMESTAMP
    (microsecond strings). Pure expressions; the byte-array decode is a
    hex fold -> unhex -> UTF-8. Two from_json passes (MESSAGE as string /
    as int array — the parse_splunk_hec union-type pattern) instead of
    per-field get_json_object, so the record parses twice, not once per
    field."""
    common = (
        "PRIORITY string, _SYSTEMD_UNIT string, _HOSTNAME string,"
        " _SOURCE_REALTIME_TIMESTAMP string, __REALTIME_TIMESTAMP string"
    )
    a = F.from_json(col, f"struct<MESSAGE:string, {common}>")
    b = F.from_json(col, f"struct<MESSAGE:array<int>, {common}>")
    g = lambda p: a[p]  # noqa: E731

    raw_msg = a["MESSAGE"]
    arr = b["MESSAGE"]
    decoded = F.decode(
        F.unhex(F.array_join(
            F.transform(arr, lambda x: F.lpad(F.hex(x), 2, "0")), "")),
        "UTF-8",
    )
    message = F.when(
        raw_msg.rlike(r"^\[") & arr.isNotNull(), decoded
    ).otherwise(raw_msg)

    prio_n = g("PRIORITY").try_cast("int")
    # journald.rs:895-910 remap_priority: any numeric value outside 0-7
    # becomes "UNKNOWN"; only non-numeric strings pass through unchanged.
    priority = F.when(
        prio_n.between(0, 7),
        F.element_at(
            F.array(*[F.lit(p) for p in _JOURNALD_PRIORITY]), prio_n + 1
        ),
    ).when(prio_n.isNotNull(), F.lit("UNKNOWN")).otherwise(g("PRIORITY"))

    unit = g("_SYSTEMD_UNIT")
    unit = F.when(
        unit.isNotNull() & ~unit.contains("."), F.concat(unit, F.lit(".service"))
    ).otherwise(unit)

    ts_us = F.coalesce(
        g("_SOURCE_REALTIME_TIMESTAMP").cast("bigint"),
        g("__REALTIME_TIMESTAMP").cast("bigint"),
    )
    return F.struct(
        message.alias("message"),
        g("_HOSTNAME").alias("host"),
        priority.alias("priority"),
        unit.alias("unit"),
        ts_us.alias("ts_us"),
    )


DOCKER_STREAM_SCHEMA = "array<struct<stream:string, payload:string>>"


def frame_docker_stream(col: Column) -> Column:
    """Demultiplex a Docker Engine attach/logs byte stream (the transport
    behind src/sources/docker_logs — bollard demuxes the same format; the
    framing itself is the public Docker Engine API stream format): frames
    of an 8-byte header [stream_type u8, 0,0,0, payload_len u32 BE]
    followed by payload bytes. stream_type 0=stdin, 1=stdout, 2=stderr.
    A truncated tail yields the frames parsed so far. TTY-mode streams
    (no multiplexing) are raw bytes — don't frame those.

    Arrow-batched per-stream walk (the frame_octet_counting family):
    per-container streams are independent -> scan-parallel, no shuffle."""
    import struct as _struct

    from pyspark.sql.functions import pandas_udf

    names = {0: "stdin", 1: "stdout", 2: "stderr"}

    def one(b):
        if b is None:
            return None
        b = bytes(b)
        out, i, n = [], 0, len(b)
        while i + 8 <= n:
            st = b[i]
            if st not in names or b[i + 1:i + 4] != b"\x00\x00\x00":
                break
            ln = _struct.unpack_from(">I", b, i + 4)[0]
            if i + 8 + ln > n:
                break
            out.append((names[st],
                        b[i + 8:i + 8 + ln].decode("utf-8", errors="replace")))
            i += 8 + ln
        return out

    def go(data):
        return data.map(one)

    return pandas_udf(go, DOCKER_STREAM_SCHEMA)(col)
