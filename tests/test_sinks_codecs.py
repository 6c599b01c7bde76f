"""Partitioned sink layout (days(ts) x bucket(url)) and codec parse
functions (csv/json deserializers, strptime timestamps)."""

import datetime as dt

from pyspark.sql import functions as F

from vector_spark.functions import parse_csv_line, parse_json_doc, parse_timestamp
from vector_spark.sinks import iceberg_available, read_partitioned, write_partitioned
from vector_spark.sources import generate_pages


def test_iceberg_not_in_sandbox(spark):
    # documents the fallback path actually exercised below
    assert iceberg_available(spark) is False


def test_write_partitioned_layout_and_pruning(spark, tmp_path):
    path = str(tmp_path / "pages_part")
    pages = generate_pages(spark, 2000, partitions=4)
    write_partitioned(pages, path, n_buckets=8)
    back = read_partitioned(spark, path)
    assert back.count() == 2000
    assert {"day", "bucket"} <= set(back.columns)
    # day partition pruning reaches the file listing (PartitionFilters)
    one_day = back.filter(F.col("day") == dt.date(2023, 11, 15))
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day" in plan.split("PartitionFilters")[1][:200]
    assert 0 < one_day.count() < 2000


def test_write_partitioned_dynamic_overwrite_idempotent(spark, tmp_path):
    path = str(tmp_path / "pages_redo")
    pages = generate_pages(spark, 500, partitions=2)
    write_partitioned(pages, path, n_buckets=4)
    write_partitioned(pages, path, n_buckets=4)  # redo: replaces, no dupes
    assert read_partitioned(spark, path).count() == 500


def test_parse_csv_line(spark):
    df = spark.createDataFrame([("7,hello,2.5",)], "line string")
    out = df.select(
        parse_csv_line(F.col("line"), "a INT, b STRING, c DOUBLE").alias("r")
    ).select("r.*").collect()[0]
    assert (out["a"], out["b"], out["c"]) == (7, "hello", 2.5)


def test_parse_json_doc(spark):
    df = spark.createDataFrame([('{"x": 1, "tags": ["p", "q"]}',)], "line string")
    out = df.select(
        parse_json_doc(F.col("line"), "x INT, tags ARRAY<STRING>").alias("r")
    ).select("r.*").collect()[0]
    assert out["x"] == 1 and out["tags"] == ["p", "q"]


def test_parse_timestamp_strptime(spark):
    df = spark.createDataFrame([("2024-03-05 07:08:09",)], "s string")
    out = df.select(parse_timestamp(F.col("s"), "%Y-%m-%d %H:%M:%S").alias("t")).collect()[0]
    assert out["t"] == dt.datetime(2024, 3, 5, 7, 8, 9)
    df = spark.createDataFrame([("05/Mar/2024",)], "s string")
    out = df.select(parse_timestamp(F.col("s"), "%d/%b/%Y").alias("t")).collect()[0]
    assert out["t"] == dt.datetime(2024, 3, 5)


def test_hmac_rfc4231_vectors(spark):
    """RFC 4231 test case 2 (key 'Jefe', msg 'what do ya want for nothing?')
    and the standard sha1 vector — the MAC must be bit-exact."""
    from vector_spark.functions import hmac_hex

    df = spark.createDataFrame([("what do ya want for nothing?",)], "m string")
    r = df.select(
        hmac_hex(F.col("m"), "Jefe", "sha256").alias("h256"),
        hmac_hex(F.col("m"), "Jefe", "sha1").alias("h1"),
    ).collect()[0]
    assert r["h256"] == (
        "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843"
    )
    assert r["h1"] == "effcdf6ae5eb2fa2d27416d5f184df9c259a7c79"
    # null in -> null out
    df2 = spark.createDataFrame([(None,)], "m string")
    assert df2.select(hmac_hex(F.col("m"), "k").alias("h")).collect()[0]["h"] is None


def test_octet_counting_framing_edges(spark):
    from vector_spark.functions import frame_octet_counting

    df = spark.createDataFrame(
        [
            ("5 hello5 world",),        # two exact frames
            ("3 abc",),                 # single frame
            ("junk",),                  # malformed -> empty list
            ("3 abcxx",),               # trailing garbage ignored after frame
            (None,),
        ],
        "buf string",
    )
    got = [r.f for r in df.select(frame_octet_counting(F.col("buf")).alias("f")).collect()]
    assert got[0] == ["hello", "world"]
    assert got[1] == ["abc"]
    assert got[2] == []
    assert got[3] == ["abc"]
    assert got[4] is None


def test_octet_counting_counts_bytes_not_chars(spark):
    """RFC 6587 LEN is the BYTE length of the UTF-8 message: 'héllo' is 5
    chars but 6 bytes, so the frame after it must still land on a byte
    boundary (char-counting would misframe everything downstream)."""
    from vector_spark.functions import frame_octet_counting

    buf = "6 héllo5 world"  # é = 2 UTF-8 bytes
    df = spark.createDataFrame([(buf,)], "buf string")
    got = df.select(frame_octet_counting(F.col("buf")).alias("f")).collect()[0].f
    assert got == ["héllo", "world"]


def test_zstd_roundtrip_distributed(spark):
    """zstd codec always executes now: C wheel when installed, pure-Python
    RFC 8878 codec otherwise (cross-JVM validation in
    test_compression_codecs.py). Executor-side round-trip."""
    from vector_spark.functions import decode_zstd, encode_zstd

    df = spark.createDataFrame(
        [(b"payload",), (b"a" * 5000,), (None,)], "b binary")
    out = df.select(decode_zstd(encode_zstd(F.col("b"))).alias("rt")).collect()
    got = [None if r["rt"] is None else bytes(r["rt"]) for r in out]
    assert got == [b"payload", b"a" * 5000, None]


def test_avro_roundtrip(spark):
    """Avro (de)serializer: native from_avro/to_avro when the spark-avro
    jar is present, the pure-Python codec otherwise (byte-validated vs
    avro-1.12.1 in test_avro_protobuf_py.py) — always executes."""
    import pytest

    from vector_spark.functions import parse_avro, serialize_avro

    schema = (
        '{"type":"record","name":"r","fields":'
        '[{"name":"id","type":"long"},{"name":"s","type":"string"}]}'
    )
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    try:
        enc = df.select(serialize_avro(F.struct("id", "s"), schema).alias("b"))
        got = enc.select(parse_avro(F.col("b"), schema).alias("r")).select(
            "r.id", "r.s"
        ).collect()
    except Exception as e:
        if "AVRO_NOT_LOADED" in str(e) or "avro" in str(e).lower():
            pytest.skip(f"spark-avro jar not on classpath: {type(e).__name__}")
        raise
    assert sorted((r.id, r.s) for r in got) == [(1, "x"), (2, "y")]


def test_influxdb_line_roundtrip(spark):
    from vector_spark.functions import encode_influxdb_line, parse_influxdb_line

    df = spark.range(1)
    line_col = encode_influxdb_line(
        F.lit("cpu"),
        {"region": F.lit("eu"), "host": F.lit("a")},   # must sort to host,region
        {"usage": F.lit(0.5), "idle": F.lit(99)},
        F.lit(1700000000000000000),
    )
    line = df.select(line_col.alias("l")).collect()[0]["l"]
    assert line == "cpu,host=a,region=eu idle=99,usage=0.5 1700000000000000000"
    p = parse_influxdb_line(F.lit(line))
    r = df.select(
        p["measurement"].alias("m"), p["tags"].alias("t"),
        p["fields"].alias("f"), p["timestamp_ns"].alias("ts"),
    ).collect()[0]
    assert r["m"] == "cpu"
    assert dict(r["t"]) == {"host": "a", "region": "eu"}
    assert dict(r["f"]) == {"idle": "99", "usage": "0.5"}
    assert r["ts"] == 1700000000000000000
    # tagless line + integer suffix stripping
    r2 = df.select(
        parse_influxdb_line(F.lit("mem used=12i"))["fields"].alias("f")
    ).collect()[0]
    assert dict(r2["f"]) == {"used": "12"}


def test_influxdb_encode_null_tag_omitted(spark):
    """A null tag value omits the tag instead of null-propagating through
    concat and dropping the whole line (silent event loss at the sink)."""
    from vector_spark.functions import encode_influxdb_line

    df = spark.range(1)
    line_col = encode_influxdb_line(
        F.lit("cpu"),
        {"region": F.lit(None).cast("string"), "host": F.lit("a")},
        {"usage": F.lit(0.5)},
    )
    assert df.select(line_col.alias("l")).collect()[0]["l"] == "cpu,host=a usage=0.5"


def test_snappy_roundtrip_distributed(spark):
    """snappy codec always executes now: C wheel when installed, pure-Python
    raw-format codec otherwise (cross-JVM validation in
    test_compression_codecs.py). Executor-side round-trip."""
    from vector_spark.functions import decode_snappy, encode_snappy

    df = spark.createDataFrame(
        [(b"payload",), (b"the quick brown fox " * 200,), (None,)], "b binary")
    out = df.select(decode_snappy(encode_snappy(F.col("b"))).alias("rt")).collect()
    got = [None if r["rt"] is None else bytes(r["rt"]) for r in out]
    assert got == [b"payload", b"the quick brown fox " * 200, None]


def _pb(fno, wt, payload):
    tag = bytes([(fno << 3) | wt])
    if wt == 2:
        return tag + bytes([len(payload)]) + payload
    return tag + payload


def _varint(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        out += bytes([b7 | (0x80 if v else 0)])
        if not v:
            return out


def test_protobuf_descriptor_fixture(spark, tmp_path):
    """A hand-encoded FileDescriptorSet (TestEvent{int64 id=1; string s=2})
    plus a hand-encoded message (id=7, s='x') pin parse_protobuf against
    REAL bytes: native from_protobuf when the spark-protobuf jar is
    present, the pure-Python descriptor-compiling decoder
    (functions/protobuf_py.py) otherwise — either way this now EXECUTES
    (cross-JVM validation in test_avro_protobuf_py.py)."""
    import pytest

    from vector_spark.functions import parse_protobuf
    from vector_spark.functions.dnstap import _walk_proto

    field_id = (_pb(1, 2, b"id") + _pb(3, 0, _varint(1)) + _pb(4, 0, _varint(1))
                + _pb(5, 0, _varint(3)))                     # int64 id = 1
    field_s = (_pb(1, 2, b"s") + _pb(3, 0, _varint(2)) + _pb(4, 0, _varint(1))
               + _pb(5, 0, _varint(9)))                      # string s = 2
    msg_type = _pb(1, 2, b"TestEvent") + _pb(2, 2, field_id) + _pb(2, 2, field_s)
    fdp = (_pb(1, 2, b"test.proto") + _pb(4, 2, msg_type)
           + _pb(12, 2, b"proto3"))                          # syntax = proto3
    fds = _pb(1, 2, fdp)                                     # FileDescriptorSet.file
    desc_path = tmp_path / "test_event.desc"
    desc_path.write_bytes(fds)
    # self-check the fixture bytes with our own wire walker
    fields = list(_walk_proto(fds))
    assert fields[0][0] == 1 and b"TestEvent" in fields[0][2]

    payload = b"\x08\x07\x12\x01x"                           # id=7, s="x"
    df = spark.createDataFrame([(payload,)], "b binary")
    try:
        got = df.select(
            parse_protobuf(F.col("b"), "TestEvent", str(desc_path)).alias("r")
        ).select("r.id", "r.s").collect()
    except Exception as e:
        if "PROTOBUF" in str(e).upper() or "protobuf" in str(e):
            pytest.skip(f"spark-protobuf jar not on classpath: {type(e).__name__}")
        raise
    assert [(r.id, r.s) for r in got] == [(7, "x")]


def test_avro_raw_body_fixture(spark):
    """Hand-encoded raw Avro body for record{id:long, s:string} — zigzag
    long 7 = 0x0e, string 'x' = len-1 0x02 + 'x'. Decoded by native
    from_avro when the spark-avro jar is present, by the pure-Python
    binary decoder (functions/avro_py.py) otherwise — always executes."""
    import pytest

    from vector_spark.functions import parse_avro

    schema = (
        '{"type":"record","name":"r","fields":'
        '[{"name":"id","type":"long"},{"name":"s","type":"string"}]}'
    )
    body = b"\x0e\x02x"
    df = spark.createDataFrame([(body,)], "b binary")
    try:
        got = df.select(parse_avro(F.col("b"), schema).alias("r")).select(
            "r.id", "r.s"
        ).collect()
    except Exception as e:
        if "AVRO" in str(e).upper():
            pytest.skip(f"spark-avro jar not on classpath: {type(e).__name__}")
        raise
    assert [(r.id, r.s) for r in got] == [(7, "x")]
