"""VRL-subset function surface (vector_spark.functions.vrl) — parse_regex
named groups, templates with strftime, key_value, url parts. Mirrors the
reference stdlib docs (website/cue/reference/remap/functions/)."""

from pyspark.sql import functions as F

from vector_spark.functions.vrl import (
    parse_json_field,
    parse_key_value,
    parse_regex,
    parse_url_parts,
    render_template,
)

from conftest import rows, ts


def test_parse_regex_named_groups(spark):
    df = spark.createDataFrame([("GET /idx 200",)], "line string")
    cols = parse_regex(F.col("line"), r"(?P<method>\w+) (?P<path>\S+) (?P<status>\d+)")
    out = df.select(*[c.alias(n) for n, c in cols.items()]).collect()[0]
    assert (out["method"], out["path"], out["status"]) == ("GET", "/idx", "200")


def test_parse_json_field_with_cast(spark):
    df = spark.createDataFrame([('{"k": 7, "s": "x"}',)], "props string")
    out = df.select(
        parse_json_field(F.col("props"), "k", "int").alias("k"),
        parse_json_field(F.col("props"), "s").alias("s"),
        parse_json_field(F.col("props"), "missing").alias("m"),
    ).collect()[0]
    assert (out["k"], out["s"], out["m"]) == (7, "x", None)


def test_parse_key_value(spark):
    df = spark.createDataFrame([("a=1 b=two",)], "line string")
    out = df.select(parse_key_value(F.col("line")).alias("m")).collect()[0]["m"]
    assert out == {"a": "1", "b": "two"}


def test_parse_url_parts(spark):
    df = spark.createDataFrame([("https://example.com/p/1?q=2",)], "url string")
    parts = parse_url_parts(F.col("url"))
    out = df.select(*[c.alias(n) for n, c in parts.items()]).collect()[0]
    assert out["scheme"] == "https"
    assert out["host"] == "example.com"
    assert out["path"] == "/p/1"
    assert out["query"] == "q=2"


def test_render_template_fields_and_strftime(spark):
    df = spark.createDataFrame(
        [("svc-a", ts(0, 0, hour=5, day=9))], "service string, ts timestamp"
    )
    col = render_template("logs/{{ service }}/year=%Y/month=%m/day=%d", ts_col="ts")
    assert df.select(col.alias("k")).collect()[0]["k"] == "logs/svc-a/year=2024/month=01/day=09"
    # the extended chrono token set (r5): %y %b %B %a %A %T
    col2 = render_template("%a %A %d %b %B %y %T", ts_col="ts")
    assert df.select(col2.alias("k")).collect()[0]["k"] == \
        "Tue Tuesday 09 Jan January 24 05:00:00"


def test_ipv6_family(spark):
    from vector_spark.functions import ip_to_ipv6, ipv6_expand, ipv6_to_ipv4

    df = spark.createDataFrame(
        [
            ("2001:db8::1",), ("::1",), ("fe80::a:b:c:d",),
            ("::ffff:192.168.0.1",), ("0:0:0:0:0:ffff:10.0.0.7",),
            ("::ffff:0102:0304",), ("1.2.3.4",), ("nonsense",),
        ],
        "ip string",
    )
    got = {
        r.ip: (r.exp, r.to6, r.to4)
        for r in df.select(
            "ip",
            ipv6_expand(F.col("ip")).alias("exp"),
            ip_to_ipv6(F.col("ip")).alias("to6"),
            ipv6_to_ipv4(F.col("ip")).alias("to4"),
        ).collect()
    }
    assert got["2001:db8::1"][0] == "2001:0db8:0000:0000:0000:0000:0000:0001"
    assert got["::1"][0] == "0000:0000:0000:0000:0000:0000:0000:0001"
    assert got["fe80::a:b:c:d"][0] == "fe80:0000:0000:0000:000a:000b:000c:000d"
    assert got["1.2.3.4"][1] == "::ffff:1.2.3.4"       # v4 -> mapped
    assert got["2001:db8::1"][1] == "2001:db8::1"       # v6 passthrough
    assert got["::ffff:192.168.0.1"][2] == "192.168.0.1"
    assert got["0:0:0:0:0:ffff:10.0.0.7"][2] == "10.0.0.7"
    assert got["::ffff:0102:0304"][2] == "1.2.3.4"      # hex-tail form
    assert got["1.2.3.4"][2] == "1.2.3.4"               # v4 passthrough
    assert got["nonsense"][2] is None                   # VRL errors -> null
    assert got["::ffff:192.168.0.1"][0] is None         # dotted tail: no hex expand


def test_punycode_and_charset(spark):
    from vector_spark.functions import (
        decode_charset,
        decode_punycode,
        encode_charset,
        encode_punycode,
    )

    df = spark.createDataFrame(
        [("www.café.com",), ("plain.example.com",), (None,)], "d string"
    )
    got = [
        (r.enc, r.rt)
        for r in df.select(
            encode_punycode(F.col("d")).alias("enc"),
            decode_punycode(encode_punycode(F.col("d"))).alias("rt"),
        ).collect()
    ]
    assert got[0] == ("www.xn--caf-dma.com", "www.café.com")
    assert got[1] == ("plain.example.com", "plain.example.com")
    assert got[2] == (None, None)

    df2 = spark.createDataFrame([("héllo",)], "s string")
    r = df2.select(
        decode_charset(encode_charset(F.col("s"), "latin-1"), "latin-1").alias("rt"),
        encode_charset(F.col("s"), "ascii").alias("bad"),
    ).collect()[0]
    assert r["rt"] == "héllo"
    assert r["bad"] is None  # unmappable -> null (VRL errors)


def test_uuid_v7_deterministic(spark):
    import re

    from vector_spark.functions import uuid_v7_deterministic

    df = spark.createDataFrame(
        [(1, ts(0, 0)), (2, ts(0, 0)), (1, ts(5, 0))],
        "id long, t timestamp",
    )
    out = [r.u for r in df.select(
        uuid_v7_deterministic(F.col("t"), F.col("id")).alias("u")
    ).collect()]
    pat = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$")
    assert all(pat.match(u) for u in out)          # RFC 9562 v7 layout
    assert out[0] != out[1]                        # entropy differentiates
    assert out[0] < out[2]                         # time-ordered
    # replayable: same inputs -> same uuid
    again = df.select(uuid_v7_deterministic(F.col("t"), F.col("id")).alias("u")).collect()
    assert [r.u for r in again] == out


def test_parse_native_json(spark):
    from vector_spark.functions import encode_native_json_log, parse_native_json

    df = spark.createDataFrame(
        [
            ('{"log": {"message": "hi", "host": "h1"}}',),
            ('{"metric": {"name": "reqs", "kind": "incremental", "counter": {"value": 3.5}}}',),
        ],
        "doc string",
    )
    p = parse_native_json(F.col("doc"))
    rows_out = df.select(*[v.alias(k) for k, v in p.items()]).collect()
    assert rows_out[0]["kind"] == "log"
    assert dict(rows_out[0]["log"]) == {"message": "hi", "host": "h1"}
    assert rows_out[1]["kind"] == "metric"
    assert rows_out[1]["metric_name"] == "reqs"
    assert rows_out[1]["counter_value"] == 3.5
    # serializer round-trip
    enc = spark.range(1).select(
        encode_native_json_log({"message": F.lit("x"), "level": F.lit("info")}).alias("d")
    ).collect()[0]["d"]
    assert enc == '{"log":{"level":"info","message":"x"}}'


def test_mime_q_roundtrip(spark):
    from vector_spark.functions import decode_mime_q, encode_mime_q

    df = spark.createDataFrame([("héllo wörld",), ("plain",), (None,)], "s string")
    got = [
        (r.enc, r.rt)
        for r in df.select(
            encode_mime_q(F.col("s")).alias("enc"),
            decode_mime_q(encode_mime_q(F.col("s"))).alias("rt"),
        ).collect()
    ]
    assert got[0][0] == "=?utf-8?q?h=C3=A9llo_w=C3=B6rld?="
    assert got[0][1] == "héllo wörld"
    assert got[1][1] == "plain"
    assert got[2] == (None, None)


def test_encrypt_decrypt_aes(spark):
    from vector_spark.functions import decrypt, encrypt

    df = spark.createDataFrame([("top secret",), (None,)], "s string")
    key128, key256 = "0123456789abcdef", "0123456789abcdef0123456789abcdef"
    out = df.select(
        decrypt(encrypt(F.col("s"), key128, "AES-128-CBC"), key128, "AES-128-CBC")
        .cast("string").alias("cbc"),
        decrypt(encrypt(F.col("s"), key256, "AES-256-GCM"), key256, "AES-256-GCM")
        .cast("string").alias("gcm"),
    ).collect()
    assert out[0]["cbc"] == "top secret" and out[0]["gcm"] == "top secret"
    assert out[1]["cbc"] is None
    # fixed IV -> deterministic ciphertext (replay/oracle-friendly)
    iv = b"\x01" * 16
    e1 = df.limit(1).select(F.base64(encrypt(F.col("s"), key128, "AES-128-CBC", iv=iv)).alias("e")).collect()[0]["e"]
    e2 = df.limit(1).select(F.base64(encrypt(F.col("s"), key128, "AES-128-CBC", iv=iv)).alias("e")).collect()[0]["e"]
    assert e1 == e2
    import pytest

    with pytest.raises(ValueError, match="unsupported AES mode"):
        encrypt(F.col("s"), key128, "AES-128-CTR")


def test_sha3_and_ruby_hash(spark):
    import hashlib

    from vector_spark.functions import parse_ruby_hash, sha3

    df = spark.createDataFrame(
        [('{"name" => "spark", :port => 8080, "note" => nil}', "payload")],
        "rh string, p string",
    )
    r = df.select(
        sha3(F.col("p")).alias("h"),
        parse_ruby_hash(
            F.col("rh"), "name string, port int, note string"
        ).alias("o"),
    ).collect()[0]
    assert r["h"] == hashlib.sha3_256(b"payload").hexdigest()
    assert r["o"]["name"] == "spark" and r["o"]["port"] == 8080
    assert r["o"]["note"] is None


def test_syslog_level_severity_facility(spark):
    from vector_spark.functions import (
        to_syslog_facility, to_syslog_level, to_syslog_severity,
    )

    df = spark.createDataFrame([(0,), (3,), (7,), (8,), (23,)], "n int")
    out = df.select(
        "n",
        to_syslog_level(F.col("n")).alias("lvl"),
        to_syslog_facility(F.col("n")).alias("fac"),
    ).orderBy("n").collect()
    assert [r.lvl for r in out] == ["emerg", "err", "debug", None, None]
    assert out[0].fac == "kern" and out[3].fac == "uucp" and out[4].fac == "local7"
    sev = spark.createDataFrame([("err",), ("debug",), ("bogus",)], "s string")
    got = [r.v for r in sev.select(to_syslog_severity(F.col("s")).alias("v")).collect()]
    assert got == [3, 7, None]


def test_parse_int_prefixes(spark):
    from vector_spark.functions import format_int_vrl, parse_int_vrl

    df = spark.createDataFrame(
        [("0xff",), ("0b101",), ("0o17",), ("42",)], "s string"
    )
    got = [r.v for r in df.select(parse_int_vrl(F.col("s")).alias("v")).collect()]
    assert got == [255, 5, 15, 42]
    df2 = spark.createDataFrame([(255,)], "n long")
    assert df2.select(format_int_vrl(F.col("n"), 16).alias("h")).collect()[0].h == "ff"
    assert df2.select(format_int_vrl(F.col("n"), 2).alias("b")).collect()[0].b == "11111111"


def test_friendly_id_roundtrip_and_vectors(spark):
    from vector_spark.functions import friendly_id_from_uuid, uuid_from_friendly_id

    uuids = [
        "01890a5d-ac96-774b-b94b-9ffa6e1eb1b2",
        "00000000-0000-0000-0000-000000000000",
        "ffffffff-ffff-ffff-ffff-ffffffffffff",
    ]
    df = spark.createDataFrame([(u,) for u in uuids], "u string")
    out = df.select(
        "u",
        uuid_from_friendly_id(friendly_id_from_uuid(F.col("u"))).alias("rt"),
        friendly_id_from_uuid(F.col("u")).alias("fid"),
    ).collect()
    for r in out:
        assert r.rt == r.u
        assert r.fid is not None and all(c.isalnum() for c in r.fid)
    # nil uuid encodes to the single zero digit
    assert out[1].fid == "0"
    # fallible decode: bad alphabet and >128-bit values return null
    bad = spark.createDataFrame([("!!!",), ("z" * 30,)], "s string")
    got = [r.v for r in bad.select(uuid_from_friendly_id(F.col("s")).alias("v")).collect()]
    assert got == [None, None]


def test_random_seeded_deterministic(spark):
    from vector_spark.functions import random_int_seeded, random_float_seeded

    df = spark.createDataFrame([(i,) for i in range(200)], "id long")
    a = [r.v for r in df.select(random_int_seeded(F.col("id"), 0, 10).alias("v")).collect()]
    b = [r.v for r in df.select(random_int_seeded(F.col("id"), 0, 10).alias("v")).collect()]
    assert a == b                      # replayable
    assert all(0 <= x < 10 for x in a)
    assert len(set(a)) == 10           # all residues hit over 200 seeds
    f = [r.v for r in df.select(random_float_seeded(F.col("id"), 2.0, 3.0).alias("v")).collect()]
    assert all(2.0 <= x < 3.0 for x in f)


def test_seahash_reference_doc_vectors(spark):
    """Both vectors published in the reference's own seahash.cue docs,
    plus the seahash crate's doc vector — bit-exact, including the
    signed-i64 wraparound the reference documents."""
    from vector_spark.functions import seahash
    from vector_spark.functions.strings import seahash_py

    assert seahash_py(b"to be or not to be") == 1988685042348123509
    df = spark.createDataFrame(
        [("foobar",), ("bar",), (None,)], "s string"
    )
    got = [r.h for r in df.select(seahash(F.col("s")).alias("h")).collect()]
    assert got == [5348458858952426560, -2796170501982571315, None]


def test_ip_pton_ntop_roundtrip(spark):
    from vector_spark.functions import ip_ntop, ip_pton, ipv6_expand

    df = spark.createDataFrame(
        [("10.1.2.3",), ("255.255.255.255",), ("2001:db8::1",)], "ip string"
    )
    out = df.select(
        "ip",
        F.length(ip_pton(F.col("ip"))).alias("n"),
        ip_ntop(ip_pton(F.col("ip"))).alias("rt"),
        ipv6_expand(F.col("ip")).alias("full"),
    ).collect()
    by_ip = {r.ip: r for r in out}
    assert by_ip["10.1.2.3"].n == 4 and by_ip["10.1.2.3"].rt == "10.1.2.3"
    assert by_ip["255.255.255.255"].rt == "255.255.255.255"
    r6 = by_ip["2001:db8::1"]
    assert r6.n == 16 and r6.rt == r6.full  # full 8-group form (documented)


def test_is_ipv4_is_ipv6(spark):
    from vector_spark.functions import is_ipv4, is_ipv6

    df = spark.createDataFrame(
        [("1.2.3.4",), ("256.1.1.1",), ("::1",), ("nope",)], "s string"
    )
    got = {r.s: (r.v4, r.v6) for r in df.select(
        "s", is_ipv4(F.col("s")).alias("v4"), is_ipv6(F.col("s")).alias("v6")
    ).collect()}
    assert got["1.2.3.4"] == (True, False)
    assert got["256.1.1.1"][0] is False
    assert got["::1"][1] is True
    assert got["nope"] == (False, False)


def test_parse_groks_first_match_wins(spark):
    from vector_spark.functions import parse_groks

    pats = [
        "%{INT:code} %{WORD:tag}",
        "%{WORD:tag} only",
    ]
    df = spark.createDataFrame([("42 abc",), ("xyz only",), ("n/a",)], "s string")
    fields = parse_groks(F.col("s"), pats)
    out = df.select("s", fields["code"].alias("code"), fields["tag"].alias("tag")).collect()
    by_s = {r.s: r for r in out}
    assert (by_s["42 abc"].code, by_s["42 abc"].tag) == ("42", "abc")
    assert by_s["xyz only"].code is None and by_s["xyz only"].tag == "xyz"
    assert by_s["n/a"].tag is None


def test_parse_regex_all_arrays(spark):
    from vector_spark.functions import parse_regex_all

    df = spark.createDataFrame([("a=1 b=2 a=3",)], "s string")
    fields = parse_regex_all(F.col("s"), r"(?P<key>\w+)=(?P<val>\d+)")
    r = df.select(fields["key"].alias("k"), fields["val"].alias("v")).collect()[0]
    assert list(r.k) == ["a", "b", "a"] and list(r.v) == ["1", "2", "3"]


def test_cloudwatch_subscription_message(spark):
    import json

    from vector_spark.functions import parse_aws_cloudwatch_log_subscription_message

    msg = json.dumps({
        "owner": "111111111111", "logGroup": "g", "logStream": "s",
        "subscriptionFilters": ["f1"], "messageType": "DATA_MESSAGE",
        "logEvents": [
            {"id": "e1", "timestamp": 1700000000000, "message": "hello"},
            {"id": "e2", "timestamp": 1700000000001, "message": "world"},
        ],
    })
    df = spark.createDataFrame([(msg,)], "m string")
    out = df.select(
        parse_aws_cloudwatch_log_subscription_message(F.col("m")).alias("p")
    ).select("p.owner", "p.messageType", F.explode("p.logEvents").alias("e")) \
     .select("owner", "messageType", "e.id", "e.message").collect()
    assert [(r.id, r.message) for r in out] == [("e1", "hello"), ("e2", "world")]
    assert out[0].owner == "111111111111"


def test_encode_key_value_and_secrets(spark):
    from vector_spark.functions import (
        encode_key_value, get_secret, remove_secret, set_secret,
    )

    df = spark.range(1).select(
        F.create_map(F.lit("token"), F.lit("abc")).alias("secrets")
    )
    line = encode_key_value(
        {"b": F.lit(2), "a": F.lit("x"), "skip": F.lit(None).cast("string")},
        key_value_delimiter=":", field_delimiter=",",
    )
    r = df.select(
        line.alias("kv"),
        get_secret(F.col("secrets"), "token").alias("tok"),
        get_secret(set_secret(F.col("secrets"), "token", F.lit("new")), "token").alias("tok2"),
        F.map_keys(remove_secret(F.col("secrets"), "token")).alias("left"),
    ).collect()[0]
    assert r.kv == "a:x,b:2"
    assert (r.tok, r.tok2, list(r.left)) == ("abc", "new", [])


def test_random_bytes_seeded(spark):
    from vector_spark.functions import random_bytes_seeded

    df = spark.createDataFrame([(1,), (2,)], "id long")
    out = df.select(
        F.length(random_bytes_seeded(F.col("id"), 20)).alias("n"),
        random_bytes_seeded(F.col("id"), 20).alias("b"),
    ).collect()
    assert all(r.n == 20 for r in out)
    assert bytes(out[0].b) != bytes(out[1].b)   # seed-dependent
    again = df.select(random_bytes_seeded(F.col("id"), 20).alias("b")).collect()
    assert bytes(out[0].b) == bytes(again[0].b)  # replayable


def test_unflatten_dotted_keys(spark):
    from vector_spark.functions import unflatten

    df = spark.range(1).select(
        F.create_map(
            F.lit("a.b.c"), F.lit("1"), F.lit("a.b.d"), F.lit("2"),
            F.lit("x"), F.lit("y"),
        ).alias("m")
    )
    r = df.select(unflatten(F.col("m")).alias("j")).collect()[0]
    import json

    assert json.loads(r.j) == {"a": {"b": {"c": "1", "d": "2"}}, "x": "y"}


def test_types_family_predicates_and_coercions(spark):
    """The dynamic-typing tail: predicates over string-encoded values,
    to_bool/to_int coercions with null error arms, match_array on a real
    array column."""
    from vector_spark.functions import (
        is_array_str, is_integer_str, is_json, is_nullish, match_array,
        to_bool_vrl, to_int_vrl,
    )

    df = spark.createDataFrame(
        [("[1,2]",), ("12",), ("nope",), (None,)], "v string"
    )
    got = df.select(
        is_json(F.col("v")).alias("j"),
        is_array_str(F.col("v")).alias("a"),
        is_integer_str(F.col("v")).alias("i"),
        is_nullish(F.col("v")).alias("n"),
        to_int_vrl(F.col("v")).alias("ti"),
        to_bool_vrl(F.col("v")).alias("tb"),
    ).collect()
    assert [(r.j, r.a, r.i, r.n, r.ti, r.tb) for r in got] == [
        (True, True, False, False, None, None),
        (True, False, True, False, 12, None),    # '12' -> not a bool word
        (False, False, False, False, None, None),
        # SQL NULL: conjunction short-circuits is_json/is_array to False
        # (a type check of NULL is false), bare rlike stays NULL, nullish
        (False, False, None, True, None, None),
    ]

    arr = spark.createDataFrame([(["err-1", "ok"],), (["ok"],)], "xs array<string>")
    m = arr.select(match_array(F.col("xs"), r"^err-").alias("m")).collect()
    assert [r.m for r in m] == [True, False]


def test_assert_eq_plan_embedded(spark):
    """assert_eq returns the value when equal and errors only at action
    time when not — compile stays lazy."""
    import pytest

    from vector_spark.functions import assert_eq

    ok = spark.range(3).select(assert_eq(F.col("id"), F.col("id")).alias("v"))
    assert [r.v for r in ok.collect()] == [0, 1, 2]

    bad = spark.range(3).select(
        assert_eq(F.col("id"), F.col("id") + 1, "ids diverged").alias("v")
    )  # building the plan must not raise
    with pytest.raises(Exception, match="ids diverged"):
        bad.collect()


def test_find_enrichment_table_records_multi_match(spark):
    """Multi-match lookup fans out 1 -> N (unlike find_table_row) and
    misses survive with nulls."""
    from vector_spark.operators import find_enrichment_table_records

    facts = spark.createDataFrame([(1, "a"), (2, "b")], "fid long, k string")
    dim = spark.createDataFrame(
        [("a", "x"), ("a", "y")], "dk string, payload string"
    )
    out = find_enrichment_table_records(facts, dim, [("k", "dk")])
    rows = sorted((r.fid, r.payload) for r in out.collect())
    assert rows == [(1, "x"), (1, "y"), (2, None)]
