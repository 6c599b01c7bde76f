"""Wide VRL function surface: grok, syslog, common-log, duration, int
bases, user-agent, case conversions, encode/decode, ip, redact/sieve."""

import pytest
from pyspark.sql import functions as F

from vector_spark.functions import (
    camelcase,
    decode_base64,
    encode_base16,
    encode_base64,
    encode_logfmt,
    grok_to_regex,
    ip_aton,
    ip_cidr_contains,
    ip_ntoa,
    ip_subnet,
    kebabcase,
    parse_common_log,
    parse_duration,
    parse_grok,
    parse_int,
    parse_query_string,
    parse_syslog,
    parse_user_agent,
    pascalcase,
    redact,
    screamingsnakecase,
    sieve,
    snakecase,
    truncate,
)


def one(spark, schema_and_row, cols: dict):
    df = spark.createDataFrame([schema_and_row[1]], schema_and_row[0])
    return df.select(*[c.alias(n) for n, c in cols.items()]).collect()[0]


def test_grok_expansion_and_parse(spark):
    pat = "%{IP:client} %{WORD:method} %{URIPATH:path} %{NUMBER:millis}"
    assert "(?P<client>" in grok_to_regex(pat)
    r = one(spark, ("line string", ("10.1.2.3 GET /api/v1 12.5",)),
            parse_grok(F.col("line"), pat))
    assert (r["client"], r["method"], r["path"], r["millis"]) == ("10.1.2.3", "GET", "/api/v1", "12.5")


def test_grok_unknown_pattern(spark):
    with pytest.raises(ValueError, match="unknown grok"):
        grok_to_regex("%{NOPE:x}")


def test_grok_core_alias_recursive(spark):
    """Vendored core set: %{COMBINEDAPACHELOG} expands recursively
    (COMMONAPACHELOG -> HTTPDUSER -> EMAILADDRESS -> HOSTNAME)."""
    line = (
        '1.2.3.4 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /a?x=1 HTTP/1.1" 200 2326 "http://ref/" "Mozilla/5.0"'
    )
    r = one(
        spark,
        ("line string", (line,)),
        parse_grok(F.col("line"), "%{COMBINEDAPACHELOG}"),
    )
    assert r["clientip"] == "1.2.3.4"
    assert r["auth"] == "frank"
    assert r["verb"] == "GET"
    assert r["request"] == "/a?x=1"
    assert r["response"] == "200"
    assert r["bytes"] == "2326"
    assert r["referrer"] == '"http://ref/"'
    assert r["agent"] == '"Mozilla/5.0"'


def test_grok_type_suffix_coercion(spark):
    """:int/:float suffixes coerce (logstash grok semantics)."""
    r = one(
        spark,
        ("line string", ("st=200 dur=1.25",)),
        parse_grok(F.col("line"), "st=%{INT:st:int} dur=%{NUMBER:dur:float}"),
    )
    assert r["st"] == 200 and isinstance(r["st"], int)
    assert r["dur"] == 1.25 and isinstance(r["dur"], float)


def test_grok_core_assorted(spark):
    cases = [
        ("%{UUID:u}", "123e4567-e89b-12d3-a456-426614174000"),
        ("%{MAC:u}", "aa:bb:cc:dd:ee:ff"),
        ("%{URI:u}", "https://user@host.example:8080/p/q?x=1"),
        ("%{TIMESTAMP_ISO8601:u}", "2024-01-02T03:04:05.678Z"),
        ("%{HTTPDATE:u}", "10/Oct/2000:13:55:36 -0700"),
        ("%{EMAILADDRESS:u}", "a.b+c@example.co.uk"),
        ("%{DATESTAMP_RFC2822:u}", "Tue, 02 Jan 2024 03:04:05 +00:00"),
    ]
    for pat, s in cases:
        r = one(spark, ("line string", (s,)), parse_grok(F.col("line"), pat))
        assert r["u"] == s, (pat, s, r["u"])


def test_grok_cycle_guard():
    from vector_spark.functions.parse import GROK_PATTERNS

    GROK_PATTERNS["_SELFREF"] = "x%{_SELFREF}y"
    try:
        with pytest.raises(ValueError, match="16 levels"):
            grok_to_regex("%{_SELFREF}")
    finally:
        del GROK_PATTERNS["_SELFREF"]


def test_parse_common_log(spark):
    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326'
    r = one(spark, ("line string", (line,)), parse_common_log(F.col("line")))
    assert r["host"] == "127.0.0.1"
    assert r["user"] == "frank"
    assert r["method"] == "GET"
    assert r["path"] == "/apache_pb.gif"
    assert r["status"] == 200
    assert r["size"] == 2326


def test_parse_syslog_3164(spark):
    line = "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed"
    r = one(spark, ("line string", (line,)), parse_syslog(F.col("line")))
    assert r["hostname"] == "mymachine"
    assert r["appname"] == "su"
    assert r["procid"] == "230"
    assert r["facility"] == 4 and r["severity"] == 2  # 34 = 4*8 + 2
    assert r["message"] == "'su root' failed"


def test_parse_syslog_5424(spark):
    line = "<165>1 2003-10-11T22:14:15.003Z host.example app 1234 ID47 - An application event"
    r = one(spark, ("line string", (line,)), parse_syslog(F.col("line"), rfc="5424"))
    assert r["version"] == "1"
    assert r["appname"] == "app"
    assert r["message"] == "An application event"
    assert r["facility"] == 20 and r["severity"] == 5


def test_parse_duration(spark):
    r = one(spark, ("d string", ("2.5s",)), {
        "ms": parse_duration(F.col("d")),
        "s": parse_duration(F.col("d"), "s"),
    })
    assert r["ms"] == 2500.0 and r["s"] == 2.5
    r = one(spark, ("d string", ("120ms",)), {"m": parse_duration(F.col("d"), "m")})
    assert abs(r["m"] - 0.002) < 1e-9


def test_parse_int_bases(spark):
    r = one(spark, ("s string", ("0x1f",)), {"v": parse_int(F.col("s"))})
    assert r["v"] == 31
    r = one(spark, ("s string", ("0b101",)), {"v": parse_int(F.col("s"))})
    assert r["v"] == 5
    r = one(spark, ("s string", ("42",)), {"v": parse_int(F.col("s"))})
    assert r["v"] == 42


def test_parse_query_string(spark):
    r = one(spark, ("q string", ("a=1&b=two",)), {"m": parse_query_string(F.col("q"))})
    assert r["m"] == {"a": "1", "b": "two"}


def test_parse_user_agent(spark):
    ua = "Mozilla/5.0 (Linux; Android 10) Chrome/91.0.4472.77 Mobile Safari/537.36"
    r = one(spark, ("ua string", (ua,)), parse_user_agent(F.col("ua")))
    assert r["browser_family"] == "Chrome"
    assert r["browser_major"] == "91"
    assert r["device"] == "mobile"


def test_case_conversions(spark):
    r = one(spark, ("s string", ("inputString With-mixed_case",)), {
        "snake": snakecase(F.col("s")),
        "kebab": kebabcase(F.col("s")),
        "scream": screamingsnakecase(F.col("s")),
        "camel": camelcase(F.col("s")),
        "pascal": pascalcase(F.col("s")),
    })
    assert r["snake"] == "input_string_with_mixed_case"
    assert r["kebab"] == "input-string-with-mixed-case"
    assert r["scream"] == "INPUT_STRING_WITH_MIXED_CASE"
    assert r["camel"] == "inputStringWithMixedCase"
    assert r["pascal"] == "InputStringWithMixedCase"


def test_truncate_redact_sieve(spark):
    r = one(spark, ("s string", ("hello world",)), {
        "t": truncate(F.col("s"), 5, "..."),
        "short": truncate(F.col("s"), 50, "..."),
    })
    assert r["t"] == "hello..." and r["short"] == "hello world"
    r = one(spark, ("s string", ("card 4111-1111-1111-1111 used",)), {
        "red": redact(F.col("s"), [r"\d{4}-\d{4}-\d{4}-\d{4}"]),
    })
    assert r["red"] == "card [REDACTED] used"
    r = one(spark, ("s string", ("abc§§§def",)), {"sv": sieve(F.col("s"), "[a-z]")})
    assert r["sv"] == "abcdef"


def test_encode_decode(spark):
    r = one(spark, ("s string", ("hello",)), {
        "b64": encode_base64(F.col("s")),
        "hex": encode_base16(F.col("s")),
        "rt": decode_base64(encode_base64(F.col("s"))).cast("string"),
    })
    assert r["b64"] == "aGVsbG8=" and r["hex"] == "68656c6c6f" and r["rt"] == "hello"


def test_encode_logfmt(spark):
    r = one(spark, ("a string, b int", ("x", 7)), {
        "lf": encode_logfmt({"msg": F.col("a"), "count": F.col("b")}),
    })
    assert r["lf"] == "count=7 msg=x"


def test_ip_functions(spark):
    r = one(spark, ("ip string", ("192.168.1.77",)), {
        "n": ip_aton(F.col("ip")),
        "rt": ip_ntoa(ip_aton(F.col("ip"))),
        "in24": ip_cidr_contains("192.168.1.0/24", F.col("ip")),
        "in16off": ip_cidr_contains("10.0.0.0/8", F.col("ip")),
        "net": ip_subnet(F.col("ip"), 24),
    })
    assert r["n"] == (192 << 24) + (168 << 16) + (1 << 8) + 77
    assert r["rt"] == "192.168.1.77"
    assert r["in24"] is True and r["in16off"] is False
    assert r["net"] == "192.168.1.0"


def test_parse_etld(spark):
    from vector_spark.functions import parse_etld

    df = spark.createDataFrame(
        [("news.bbc.co.uk",), ("sub.example.com",), ("example.com",), ("localhost",)],
        "host string",
    )
    p = parse_etld(F.col("host"))
    got = {r.host: (r.etld, r.etld_plus) for r in
           df.select("host", p["etld"].alias("etld"), p["etld_plus"].alias("etld_plus")).collect()}
    assert got["news.bbc.co.uk"] == ("co.uk", "bbc.co.uk")
    assert got["sub.example.com"] == ("com", "example.com")
    assert got["example.com"] == ("com", "example.com")
    assert got["localhost"] == ("localhost", "localhost")


def test_topology_remap_dropped_port(spark):
    from vector_spark.topology import compile_topology

    spec = {
        "sources": {"ev": {"type": "inline",
                            "rows": [(1, '{"k": 1}'), (2, "junk")],
                            "schema": "event_id long, props string"}},
        "transforms": {
            "parsed": {
                "type": "remap", "inputs": ["ev"],
                "set": {"k": "CAST(get_json_object(props, '$.k') AS INT)"},
                "required": ["k"], "component_id": "parsed",
            },
        },
        "sinks": {
            "good": {"type": "memory", "inputs": ["parsed.ok"]},
            "dead_letter": {"type": "memory", "inputs": ["parsed.dropped"]},
        },
    }
    out = compile_topology(spec).build(spark).run()
    assert [r.event_id for r in out["good"]] == [1]
    assert [r.event_id for r in out["dead_letter"]] == [2]
    assert out["dead_letter"][0]["dropped"]["component_id"] == "parsed"


def test_parse_nginx_error(spark):
    from vector_spark.functions import parse_nginx_error

    line = ('2024/03/05 10:11:12 [error] 1234#0: *77 open() failed'
            ', client: 10.0.0.5, server: example.com, request: "GET /x HTTP/1.1"')
    r = one(spark, ("line string", (line,)), parse_nginx_error(F.col("line")))
    assert r["severity"] == "error" and r["pid"] == "1234"
    assert r["cid"] == "77" and r["client"] == "10.0.0.5"
    assert r["server"] == "example.com" and r["request"] == "GET /x HTTP/1.1"


def test_parse_apache_error_roundtrip(spark):
    from vector_spark.functions import parse_apache_error
    from vector_spark.sources import demo_logs

    logs = demo_logs(spark, 40, fmt="apache_error", partitions=2)
    p = parse_apache_error(F.col("line"))
    parsed = logs.select(*[c.alias(n) for n, c in p.items()])
    assert parsed.filter(F.col("severity") != "error").count() == 0
    assert parsed.filter(F.col("client") == "").count() == 0


def test_parse_cef(spark):
    from vector_spark.functions import parse_cef

    line = "CEF:0|Acme|Firewall|1.2|100|blocked a thing|5|src=10.0.0.1 dst=10.0.0.2 act=block"
    r = one(spark, ("line string", (line,)), parse_cef(F.col("line")))
    assert (r["vendor"], r["product"], r["severity"]) == ("Acme", "Firewall", "5")
    assert r["extensions"] == {"src": "10.0.0.1", "dst": "10.0.0.2", "act": "block"}


def test_ensure_parallelism(spark):
    from vector_spark.session import ensure_parallelism

    one_part = spark.range(100).coalesce(1)
    out = ensure_parallelism(one_part)
    assert out.rdd.getNumPartitions() >= 2
    wide = spark.range(100, numPartitions=64)
    assert ensure_parallelism(wide) is wide  # no-op when already parallel


def test_compression_roundtrip(spark):
    import gzip, zlib

    from vector_spark.functions import (
        decode_gzip, decode_zlib, encode_gzip, encode_zlib,
    )

    df = spark.createDataFrame([(1, b"payload " * 50), (2, None)], "id long, raw binary")
    r = df.select(
        "id",
        decode_zlib(encode_zlib("raw")).alias("z_rt"),
        decode_gzip(encode_gzip("raw")).alias("g_rt"),
        encode_zlib("raw").alias("z"),
        encode_gzip("raw").alias("g"),
    ).orderBy("id").collect()
    assert bytes(r[0]["z_rt"]) == b"payload " * 50
    assert bytes(r[0]["g_rt"]) == b"payload " * 50
    assert len(bytes(r[0]["z"])) < 400  # actually compressed
    # interoperable with stdlib (not a private format)
    assert zlib.decompress(bytes(r[0]["z"])) == b"payload " * 50
    assert gzip.decompress(bytes(r[0]["g"])) == b"payload " * 50
    assert r[1]["z_rt"] is None and r[1]["g_rt"] is None


def test_parse_gelf(spark):
    from vector_spark.functions import parse_gelf

    doc = '{"version":"1.1","host":"web-01","short_message":"boom","timestamp":1700000000.5,"level":3}'
    r = one(spark, ("line string", (doc,)), {"g": parse_gelf(F.col("line"))})["g"]
    assert r["host"] == "web-01" and r["short_message"] == "boom"
    assert r["level"] == 3 and r["timestamp"] == 1700000000.5


def test_encode_cef_roundtrips_through_parse(spark):
    from vector_spark.functions import encode_cef, parse_cef

    df = spark.createDataFrame([("blocked", 7, "10.0.0.9")], "evt string, sev int, src string")
    line = encode_cef("Acme", "FW", "1.0", F.col("evt"), F.lit("thing"), F.col("sev"),
                      extensions={"src": F.col("src"), "act": F.lit("deny")})
    p = parse_cef(line)
    r = df.select(line.alias("raw"), *[c.alias(n) for n, c in p.items()]).collect()[0]
    assert r["raw"].startswith("CEF:0|Acme|FW|1.0|blocked|thing|7|")
    assert r["extensions"] == {"src": "10.0.0.9", "act": "deny"}


def test_parse_glog(spark):
    from vector_spark.functions import parse_glog

    line = "W0315 10:11:12.345678  1234 server.cc:42] cache miss on shard 7"
    r = one(spark, ("line string", (line,)), parse_glog(F.col("line")))
    assert r["level"] == "warning"
    assert (r["month"], r["day"]) == ("03", "15")
    assert r["file"] == "server.cc" and r["line"] == 42
    assert r["message"] == "cache miss on shard 7"


def test_chunks(spark):
    from vector_spark.functions import chunks

    r = one(spark, ("s string", ("abcdefgh",)), {"c": chunks(F.col("s"), 3)})
    assert r["c"] == ["abc", "def", "gh"]


def test_parse_aws_vpc_flow_log_default_format(spark):
    """The reference's own doc example (parse_aws_vpc_flow_log.cue):
    NODATA line with '-' fields -> nulls, typed numerics."""
    from vector_spark.functions import parse_aws_vpc_flow_log

    df = spark.createDataFrame(
        [("2 123456789010 eni-1235b8ca123456789 - - - - - - - 1431280876 1431280934 - NODATA",)],
        "line string",
    )
    p = parse_aws_vpc_flow_log(F.col("line"))
    r = df.select(*[v.alias(k) for k, v in p.items()]).collect()[0]
    assert r["version"] == 2
    assert r["account_id"] == "123456789010"
    assert r["interface_id"] == "eni-1235b8ca123456789"
    assert r["srcaddr"] is None and r["srcport"] is None
    assert r["start"] == 1431280876 and r["end"] == 1431280934
    assert r["action"] is None and r["log_status"] == "NODATA"


def test_parse_aws_vpc_flow_log_custom_format(spark):
    from vector_spark.functions import parse_aws_vpc_flow_log

    df = spark.createDataFrame(
        [("- eni-1235b8ca123456789 10.0.1.5 10.0.0.220 10.0.1.5 203.0.113.5",)],
        "line string",
    )
    p = parse_aws_vpc_flow_log(
        F.col("line"),
        format="instance_id interface_id srcaddr dstaddr pkt_srcaddr pkt_dstaddr",
    )
    r = df.select(*[v.alias(k) for k, v in p.items()]).collect()[0]
    assert r["instance_id"] is None
    assert r["pkt_dstaddr"] == "203.0.113.5"


def test_parse_aws_alb_log_reference_example(spark):
    """The reference's doc example line (parse_aws_alb_log.cue)."""
    from vector_spark.functions import parse_aws_alb_log

    line = (
        'http 2018-11-30T22:23:00.186641Z app/my-loadbalancer/50dc6c495c0c9188 '
        '192.168.131.39:2817 - 0.000 0.001 0.000 200 200 34 366 '
        '"GET http://www.example.com:80/ HTTP/1.1" "curl/7.46.0" - - '
        'arn:aws:elasticloadbalancing:us-east-2:123456789012:targetgroup/my-targets/73e2d6bc24d8a067 '
        '"Root=1-58337364-23a8c76965a2ef7629b185e3"'
    )
    df = spark.createDataFrame([(line,)], "line string")
    p = parse_aws_alb_log(F.col("line"))
    r = df.select(*[v.alias(k) for k, v in p.items()]).collect()[0]
    assert r["type"] == "http"
    assert r["elb"] == "app/my-loadbalancer/50dc6c495c0c9188"
    assert r["client_host"] == "192.168.131.39:2817"
    assert r["target_host"] is None
    assert r["request_processing_time"] == 0.0
    assert r["target_processing_time"] == 0.001
    assert r["elb_status_code"] == "200"
    assert r["received_bytes"] == 34 and r["sent_bytes"] == 366
    assert r["request_method"] == "GET"
    assert r["request_url"] == "http://www.example.com:80/"
    assert r["request_protocol"] == "HTTP/1.1"
    assert r["user_agent"] == "curl/7.46.0"
    assert r["ssl_cipher"] is None and r["ssl_protocol"] is None
    assert r["trace_id"] == "Root=1-58337364-23a8c76965a2ef7629b185e3"


def test_frame_length_delimited(spark):
    from vector_spark.functions import frame_length_delimited

    buf = (3).to_bytes(4, "big") + b"abc" + (2).to_bytes(4, "big") + b"xy"
    trunc = (9).to_bytes(4, "big") + b"short"
    df = spark.createDataFrame([(buf,), (trunc,), (None,)], "b binary")
    got = [r.f for r in df.select(frame_length_delimited(F.col("b")).alias("f")).collect()]
    assert [bytes(x) for x in got[0]] == [b"abc", b"xy"]
    assert got[1] == []      # payload shorter than declared length
    assert got[2] is None


def test_encode_gelf_and_csv_line(spark):
    import json

    from vector_spark.functions import encode_csv_line, encode_gelf, parse_gelf

    df = spark.createDataFrame([("web1", "disk full", 2)], "h string, m string, lvl int")
    doc = df.select(
        encode_gelf(F.col("h"), F.col("m"), {"level": F.col("lvl")}).alias("g")
    ).collect()[0]["g"]
    parsed = json.loads(doc)
    assert parsed == {"version": "1.1", "host": "web1",
                      "short_message": "disk full", "_level": 2}
    # csv quoting: embedded comma must round-trip through proper escaping
    df2 = spark.createDataFrame([("a,b", 7)], "s string, n int")
    line = df2.select(encode_csv_line(F.col("s"), F.col("n")).alias("l")).collect()[0]["l"]
    assert line == '"a,b",7'


def test_parse_linux_authorization(spark):
    from vector_spark.functions import parse_linux_authorization

    line = "Jun 14 15:16:01 combo sshd[19939]: Accepted password for root from 10.0.2.2 port 52725 ssh2"
    df = spark.createDataFrame([(line,)], "l string")
    p = parse_linux_authorization(F.col("l"))
    r = df.select(*[v.alias(k) for k, v in p.items()]).collect()[0]
    assert r["timestamp"] == "Jun 14 15:16:01"
    assert r["hostname"] == "combo"
    assert r["appname"] == "sshd"
    assert r["procid"] == 19939
    assert r["message"].startswith("Accepted password for root")


def test_parse_tokens(spark):
    from vector_spark.functions import parse_tokens

    line = 'host [10/Oct/2000:13:55:36 -0700] "GET /path HTTP/1.1" 200'
    df = spark.createDataFrame([(line,)], "l string")
    got = df.select(parse_tokens(F.col("l")).alias("t")).collect()[0]["t"]
    assert got == [
        "host", "[10/Oct/2000:13:55:36 -0700]", '"GET /path HTTP/1.1"', "200",
    ]


def test_parse_json_paths_and_bytes_and_crc(spark):
    from vector_spark.functions import crc, parse_bytes, parse_json_paths

    df = spark.createDataFrame(
        [('{"a": {"b": [10, 20]}, "name": "x"}', "1mib", "123456789")],
        "doc string, size string, payload string",
    )
    p = parse_json_paths(F.col("doc"), {"b1": "$.a.b[1]", "nm": "$.name"})
    r = df.select(
        p["b1"].cast("int").alias("b1"), p["nm"].alias("nm"),
        parse_bytes(F.col("size")).alias("bytes"),
        parse_bytes(F.col("size"), unit="KiB").alias("kib"),
        parse_bytes(F.lit("5.5 GB")).alias("gb"),
        crc(F.col("payload")).alias("crc"),
    ).collect()[0]
    assert (r["b1"], r["nm"]) == (20, "x")
    assert r["bytes"] == 1048576.0 and r["kib"] == 1024.0
    assert r["gb"] == 5.5e9
    assert r["crc"] == 0xCBF43926  # CRC-32 check value for '123456789'


def test_reassemble_gelf_chunks(spark):
    from vector_spark.functions import reassemble_gelf_chunks

    def chunk(mid: bytes, seq: int, total: int, payload: bytes) -> bytes:
        return b"\x1e\x0f" + mid + bytes([seq, total]) + payload

    mid1, mid2 = b"AAAAAAAA", b"BBBBBBBB"
    rows_in = [
        (chunk(mid1, 1, 3, b"lo wo"),        ),  # out of order on purpose
        (chunk(mid1, 0, 3, b"hel"),          ),
        (chunk(mid1, 2, 3, b"rld"),          ),
        (chunk(mid2, 0, 2, b"half"),         ),  # incomplete: 1 of 2
        (b'{"version":"1.1"}',               ),  # unchunked passthrough
    ]
    df = spark.createDataFrame(rows_in, "chunk binary")
    got = {
        (r.message_id, bool(r.complete)): (bytes(r.payload), r.n_chunks)
        for r in reassemble_gelf_chunks(df).collect()
    }
    assert got[(mid1.hex(), True)] == (b"hello world", 3)
    assert got[(mid2.hex(), False)] == (b"half", 1)
    assert got[(None, True)] == (b'{"version":"1.1"}', 1)


def test_parse_combined_log(spark):
    from vector_spark.functions import parse_combined_log

    line = ('127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" '
            '200 2326 "http://www.example.com/start.html" "Mozilla/4.08 [en] (Win98; I ;Nav)"')
    df = spark.createDataFrame([(line,)], "l string")
    p = parse_combined_log(F.col("l"))
    r = df.select(*[v.alias(k) for k, v in p.items()]).collect()[0]
    assert r["host"] == "127.0.0.1" and r["user"] == "frank"
    assert r["status"] == 200 and r["size"] == 2326
    assert r["referrer"] == "http://www.example.com/start.html"
    assert r["agent"].startswith("Mozilla/4.08")


def test_parse_netflow_v5(spark):
    import struct

    from vector_spark.functions import parse_netflow_v5

    def flow(src, dst, sport, dport, pkts, byts, proto):
        rec = bytearray(48)
        rec[0:4] = bytes(src)
        rec[4:8] = bytes(dst)
        rec[16:20] = struct.pack(">I", pkts)
        rec[20:24] = struct.pack(">I", byts)
        rec[32:34] = struct.pack(">H", sport)
        rec[34:36] = struct.pack(">H", dport)
        rec[38] = proto
        return bytes(rec)

    header = struct.pack(">HHIII", 5, 2, 123456, 1_700_000_000, 0) + b"\x00" * 8
    assert len(header) == 24
    packet = header + flow((10, 0, 0, 1), (10, 0, 0, 2), 1234, 443, 7, 512, 6) \
                    + flow((192, 168, 1, 9), (8, 8, 8, 8), 5353, 53, 1, 64, 17)
    bad = struct.pack(">HH", 9, 1) + b"\x00" * 20  # version != 5: dropped
    df = spark.createDataFrame([(packet,), (bad,)], "packet binary")
    got = sorted(
        (r.flow_idx, r.srcaddr, r.dstaddr, r.srcport, r.dstport, r.packets, r.bytes, r.proto)
        for r in parse_netflow_v5(df).collect()
    )
    assert got == [
        (0, "10.0.0.1", "10.0.0.2", 1234, 443, 7, 512, 6),
        (1, "192.168.1.9", "8.8.8.8", 5353, 53, 1, 64, 17),
    ]


def test_ensure_parallelism_file_source(spark, tmp_path):
    """File-backed inputs go through the inputFiles() estimate (no
    Catalyst->RDD conversion): a single tiny parquet file repartitions,
    a many-file input is a no-op."""
    from vector_spark.session import ensure_parallelism

    small = str(tmp_path / "one")
    spark.range(100).coalesce(1).write.parquet(small)
    df = spark.read.parquet(small)
    assert ensure_parallelism(df).rdd.getNumPartitions() >= 2

    many = str(tmp_path / "many")
    spark.range(1000).repartition(16).write.parquet(many)
    wide = spark.read.parquet(many)
    assert ensure_parallelism(wide) is wide


def test_parse_cdx_fields_and_malformed(spark):
    """CDXJ happy path parses every field; missing JSON keys and a
    malformed line go null per the house parser rule."""
    from vector_spark.functions import parse_cdx

    good = ('org,example)/ 20240101123456 {"url": "https://example.org/", '
            '"mime": "text/html", "status": "200", "digest": "ABC", '
            '"length": "42", "offset": "7", "filename": "x.warc.gz"}')
    sparse = 'com,site)/p 20230505000000 {"url": "https://site.com/p"}'
    bad = "not a cdx line"
    df = spark.createDataFrame([(good,), (sparse,), (bad,)], "line string")
    rows = df.select(parse_cdx(F.col("line")).alias("c")).select("c.*").collect()
    g, s, b = rows
    assert (g.urlkey, g.ts, g.url, g.mime, g.status, g.digest,
            g.length, g.offset, g.filename) == (
        "org,example)/", "20240101123456", "https://example.org/",
        "text/html", "200", "ABC", 42, 7, "x.warc.gz")
    assert (s.urlkey, s.url, s.mime, s.length) == (
        "com,site)/p", "https://site.com/p", None, None)
    assert b.urlkey == "not" and b.ts is None and b.url is None


def test_extract_all_onepass_parity_vs_regexp_extract(spark):
    """The branch-free one-pass extract (_extract_all's anchored fast path:
    one regexp_replace + end-indexed try_element_at) must return exactly
    what per-group regexp_extract returns — incl. unmatched lines ('' for
    every field), optional groups that did not participate (''), and lines
    with a trailing newline (Java `$` matches before it, leaving the \\n
    outside the replacement — end-indexing must be immune)."""
    import re as _re

    from vector_spark.functions.parse import SYSLOG_3164, _extract_all
    from vector_spark.functions.vrl import java_regex

    lines = [
        "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed",
        "<13>Jun  5 08:12:23 host0 app: no procid here",  # optional group off
        "not a syslog line at all",  # unmatched
        "",  # empty
        "<34>Oct 11 22:14:15 mymachine su[230]: trailing newline\n",
        "<999>Oct 11 22:14:15 h a[1]: big pri",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    fields = _extract_all(F.col("line"), SYSLOG_3164)
    jp = java_regex(SYSLOG_3164)
    gi = _re.compile(SYSLOG_3164).groupindex
    classic = {
        name: F.regexp_extract(F.col("line"), jp, idx) for name, idx in gi.items()
    }
    got = df.select(
        *[fields[n].alias(f"f_{n}") for n in gi],
        *[classic[n].alias(f"c_{n}") for n in gi],
    ).collect()
    for row in got:
        d = row.asDict()
        for n in gi:
            assert d[f"f_{n}"] == d[f"c_{n}"], (n, d)


@pytest.mark.parametrize(
    "pat_name",
    ["SYSLOG_3164", "SYSLOG_5424", "APACHE_COMMON", "APACHE_COMBINED",
     "NGINX_ERROR", "APACHE_ERROR", "CEF", "GLOG", "ALB_LOG", "LINUX_AUTH"],
)
def test_extract_all_onepass_parity_all_parsers(spark, pat_name):
    """Every ^-anchored parser pattern (incl. the prefix-match ones with no
    trailing $ — apache/ALB, where regexp_extract matches a PREFIX and junk
    may follow) must return exactly what per-group regexp_extract returns
    on: a real-ish line, that line with a junk suffix, pure junk, and
    empty."""
    import re as _re

    import vector_spark.functions.parse as P
    from vector_spark.functions.parse import _extract_all
    from vector_spark.functions.vrl import java_regex

    samples = {
        "SYSLOG_3164": "<34>Oct 11 22:14:15 host su[230]: failed",
        "SYSLOG_5424": "<165>1 2003-10-11T22:14:15.003Z h app 1234 ID47 - msg",
        "APACHE_COMMON": '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 200 2326',
        "APACHE_COMBINED": '1.2.3.4 - - [10/Oct/2000:13:55:36 -0700] "GET / HTTP/1.1" 200 5 "http://r" "UA/1.0"',
        "NGINX_ERROR": "2024/06/05 08:12:23 [error] 31#31: *1 open() failed",
        "APACHE_ERROR": "[Fri Sep 09 10:42:29 2011] [core:error] [pid 35708] msg here",
        "CEF": "CEF:0|Vendor|Product|1.0|100|name|5|src=1.2.3.4",
        "GLOG": "I0605 08:12:23.000000 1234 file.cc:42] message",
        "ALB_LOG": 'http 2018-07-02T22:23:00.186641Z app/my-lb/50dc6c495c0c9188 192.168.131.39:2817 10.0.0.1:80 0.000 0.001 0.000 200 200 34 366 "GET http://www.example.com:80/ HTTP/1.1" "curl/7.46.0" - - arn:aws:elasticloadbalancing:us-east-2:123456789012:targetgroup/my-targets/73e2d6bc24d8a067 "Root=1-58337262-36d228ad5d99923122bbe354" "-" "-" 0 2018-07-02T22:22:48.364000Z "forward" "-" "-" "10.0.0.1:80" "200" "-" "-"',
        "LINUX_AUTH": "Jun  5 08:12:23 host sshd[123]: Accepted password for root",
    }
    pat = getattr(P, pat_name)
    base = samples[pat_name]
    lines = [base, base + " trailing junk 123", "complete junk", ""]
    compiled = _re.compile(pat)
    names = list(compiled.groupindex)
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(lines)], "i long, line string"
    )
    fields = _extract_all(F.col("line"), pat)
    got = {
        r["i"]: tuple(r[n] for n in names)
        for r in df.select("i", *[fields[n].alias(n) for n in names]).collect()
    }
    for i, line in enumerate(lines):
        m = compiled.search(line)
        want = tuple((m.group(n) or "") if m else "" for n in names)
        assert got[i] == want, (pat_name, line, got[i], want)


def test_parse_otlp_logs_flatten_and_anyvalue(spark):
    """OTLP triple nesting flattens in document order across multiple
    resourceLogs/scopeLogs blocks; AnyValue collapses first-present-wins
    (string > int-as-string > double > bool); a structured (kvlist) body
    surfaces as null body; absent attribute arrays -> null map; proto3
    string-int64 timeUnixNano casts to long."""
    from pyspark.sql import functions as F

    from vector_spark.functions import parse_otlp_logs

    doc = (
        '{"resourceLogs":['
        '{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"a"}}]},'
        '"scopeLogs":[{"scope":{"name":"s1","version":"1"},"logRecords":['
        '{"timeUnixNano":"1000","severityNumber":9,"severityText":"INFO",'
        '"body":{"stringValue":"m1"},"attributes":['
        '{"key":"i","value":{"intValue":"42"}},'
        '{"key":"d","value":{"doubleValue":1.5}},'
        '{"key":"b","value":{"boolValue":false}}]},'
        '{"timeUnixNano":"2000","severityNumber":5,"severityText":"DEBUG"}]},'
        '{"scope":{"name":"s2","version":"2"},"logRecords":['
        '{"timeUnixNano":"3000","severityNumber":1,"severityText":"TRACE",'
        '"body":{"stringValue":"m3"}}]}]},'
        '{"resource":{},"scopeLogs":[{"scope":{"name":"s3"},"logRecords":['
        '{"timeUnixNano":"4000","severityNumber":2,"severityText":"TRACE2",'
        '"body":{"stringValue":"m4"}}]}]}]}'
    )
    df = spark.createDataFrame([(doc,)], "j string")
    rows = (
        df.select(F.posexplode(parse_otlp_logs(F.col("j"))).alias("i", "r"))
        .select("i", "r.*")
        .collect()
    )
    assert [r.time_unix_nano for r in rows] == [1000, 2000, 3000, 4000]
    r0 = rows[0]
    assert r0.attributes == {"i": "42", "d": "1.5", "b": "false"}
    assert r0.resource_attributes == {"service.name": "a"}
    assert r0.scope_name == "s1" and r0.body == "m1"
    assert rows[1].body is None and rows[1].attributes is None
    assert rows[2].scope_name == "s2" and rows[2].scope_version == "2"
    assert rows[3].resource_attributes is None and rows[3].scope_version is None


def test_parse_splunk_hec_shapes(spark):
    """HEC corners: numeric AND string `time` (fractional honored),
    string vs object event (the object's raw JSON must NOT leak into the
    string side), absent optional fields -> nulls, indexed fields map."""
    from pyspark.sql import functions as F

    from vector_spark.functions import parse_splunk_hec

    docs = [
        '{"time": "100.5", "host": "h1", "source": "s", "sourcetype": "t",'
        ' "index": "main", "fields": {"k": "7"}, "event": "hello"}',
        '{"time": 200, "event": {"msg": "m", "code": "5"}}',
        '{"event": "bare"}',
    ]
    rows = (
        spark.createDataFrame([(d,) for d in docs], "j string")
        .select(parse_splunk_hec(F.col("j")).alias("r"))
        .select("r.*")
        .collect()
    )
    import datetime as dt

    assert rows[0].ts == dt.datetime(1970, 1, 1, 0, 1, 40, 500000)
    assert rows[0].event == "hello" and rows[0].event_obj is None
    assert rows[0].fields == {"k": "7"} and rows[0].index_name == "main"
    assert rows[1].ts == dt.datetime(1970, 1, 1, 0, 3, 20)
    assert rows[1].event is None and rows[1].event_obj == {"msg": "m", "code": "5"}
    assert rows[1].host is None
    assert rows[2].ts is None and rows[2].event == "bare"


def test_parse_otlp_metrics_kinds(spark):
    """Gauge vs sum kind split, delta vs cumulative temporality, asInt
    (string int64) vs asDouble value coalesce, point attrs, and
    flatten order across metrics."""
    from pyspark.sql import functions as F

    from vector_spark.functions import parse_otlp_metrics

    doc = (
        '{"resourceMetrics":[{"resource":{"attributes":[]},'
        '"scopeMetrics":[{"scope":{"name":"s"},"metrics":['
        '{"name":"g","gauge":{"dataPoints":[{"timeUnixNano":"1","asDouble":2.5}]}},'
        '{"name":"d","sum":{"aggregationTemporality":1,"isMonotonic":false,'
        '"dataPoints":[{"timeUnixNano":"2","asInt":"9"}]}}]}]}]}'
    )
    rows = (
        spark.createDataFrame([(doc,)], "j string")
        .select(F.posexplode(parse_otlp_metrics(F.col("j"))).alias("i", "r"))
        .select("r.*")
        .collect()
    )
    g, d = rows
    assert (g.kind, g.value, g.temporality, g.monotonic) == ("gauge", 2.5, None, None)
    assert (d.kind, d.value, d.temporality, d.monotonic) == ("sum", 9.0, 1, False)


def test_parse_otlp_traces_spans(spark):
    """Span flatten with id lowercasing, parent linkage, derived
    duration, absent status -> nulls."""
    from pyspark.sql import functions as F

    from vector_spark.functions import parse_otlp_traces

    doc = (
        '{"resourceSpans":[{"resource":{"attributes":[]},'
        '"scopeSpans":[{"scope":{"name":"s"},"spans":['
        '{"traceId":"AABB","spanId":"CC01","name":"root","kind":2,'
        '"startTimeUnixNano":"1000","endTimeUnixNano":"4000",'
        '"status":{"code":2,"message":"x"}},'
        '{"traceId":"AABB","spanId":"dd02","parentSpanId":"CC01","name":"child",'
        '"kind":3,"startTimeUnixNano":"1500","endTimeUnixNano":"2500"}]}]}]}'
    )
    rows = (
        spark.createDataFrame([(doc,)], "j string")
        .select(F.posexplode(parse_otlp_traces(F.col("j"))).alias("i", "r"))
        .select("r.*")
        .collect()
    )
    root, child = rows
    assert root.trace_id == "aabb" and root.span_id == "cc01"
    assert root.parent_span_id is None and root.duration_nano == 3000
    assert (root.status_code, root.status_message) == (2, "x")
    assert child.parent_span_id == "cc01" and child.duration_nano == 1000
    assert child.status_code is None


def test_parse_prometheus_text_exposition(spark):
    """Exposition-format corners: histogram family attach across
    _bucket/_sum/_count suffixes, a PLAIN sample named foo_count that
    must keep its own family (no histogram decl), TYPE/HELP metadata
    join, label escapes (\\n, \\", \\\\), +Inf value, optional
    per-sample timestamp."""
    from vector_spark.functions import parse_prometheus_text

    body = "\n".join([
        "# HELP http_req Request duration.",
        "# TYPE http_req histogram",
        'http_req_bucket{le="0.1",path="/a\\nb"} 3',
        'http_req_bucket{le="+Inf"} 7 1712000000123',
        "http_req_sum 12.5",
        "http_req_count 7",
        "# TYPE up gauge",
        "up 1",
        "foo_count 9",
        'inf_g{x="\\\\esc\\""} +Inf',
    ])
    df = spark.createDataFrame([(1, body)], "scrape_id long, body string")
    rows = {r.line_pos: r for r in parse_prometheus_text(df).collect()}
    assert len(rows) == 7
    assert rows[2].family == "http_req" and rows[2].metric_type == "histogram"
    assert rows[2].labels == {"le": "0.1", "path": "/a\nb"}
    assert rows[2].help == "Request duration."
    assert rows[3].ts_ms == 1712000000123
    assert rows[5].name == "http_req_count" and rows[5].family == "http_req"
    assert rows[7].family == "up" and rows[7].metric_type == "gauge" and rows[7].help is None
    assert rows[8].family == "foo_count" and rows[8].metric_type is None
    assert rows[9].labels == {"x": '\\esc"'} and rows[9].value == float("inf")


def test_loki_push_batches_and_parse(spark):
    """One push body per label set; entries sorted (ts, line) inside the
    stream; nanos serialized as strings; parse flattens losslessly."""
    from pyspark.sql import functions as F

    from vector_spark.functions import loki_push_batches, parse_loki_push

    df = spark.createDataFrame(
        [("a", "prod", 3, "l3"), ("a", "prod", 1, "l1"), ("b", "prod", 2, "l2")],
        "app string, env string, ts_ns long, line string",
    )
    b = loki_push_batches(df, ("app", "env"))
    rows = {r.app: r for r in b.collect()}
    assert rows["a"].n_entries == 2 and rows["b"].n_entries == 1
    assert '"values":[["1","l1"],["3","l3"]]' in rows["a"].body
    back = sorted(
        (r.ts_ns, r.line, r.labels["app"], r.labels["env"])
        for r in b.select(F.explode(parse_loki_push(F.col("body"))).alias("r"))
        .select("r.*")
        .collect()
    )
    assert back == [(1, "l1", "a", "prod"), (2, "l2", "b", "prod"), (3, "l3", "a", "prod")]


def test_message_captures_keep_trailing_unicode_terminators(spark):
    """The \\Z/\\z anchor class fix (r5): Java's $ and \\Z match BEFORE a
    final NEL/U+2028/U+2029, silently dropping it from trailing message
    captures; Python's \\Z (translated to Java \\z by java_regex) keeps
    the byte-walk parity. Pin syslog + apache_error + the translation."""
    from vector_spark.functions import parse_syslog
    from vector_spark.functions.parse import parse_apache_error
    from vector_spark.functions.vrl import java_regex

    assert java_regex(r"(?P<m>.*)\Z") == r"(.*)\z"

    nel = "\x85"
    line = f"<34>1 2024-01-01T00:00:00Z h app 1 ID1 - boom{nel}"
    r = spark.createDataFrame([(line,)], "l string").select(
        parse_syslog(F.col("l"), rfc="5424")["message"].alias("m")
    ).collect()[0]
    assert r["m"] == f"boom{nel}"

    ae = "[Mon Jan 01 00:00:00 2024] [error] [client 1.2.3.4] oops "
    r2 = spark.createDataFrame([(ae,)], "l string").select(
        parse_apache_error(F.col("l"))["message"].alias("m")).collect()[0]
    assert r2["m"] == "oops "
