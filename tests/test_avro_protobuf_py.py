"""Cross-library validation of the pure-Python Avro and Protobuf codecs.

Ground truth is the REAL JVM libraries on Spark's classpath, reached
driver-side via py4j: avro-1.12.1 (GenericDatumWriter/Reader) for Avro,
and the ORC-shaded protobuf-java (`org.apache.orc.protobuf`
DescriptorProtos / Descriptors / DynamicMessage) for Protobuf — so
functions/avro_py.py and functions/protobuf_py.py are proven against
independent implementations, not just self-round-trips. Reference parity:
`lib/codecs/src/decoding/format/{avro,protobuf}.rs`.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from vector_spark.functions import avro_py, protobuf_py as pb

FUZZ = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

AVRO_SCHEMA = json.dumps({
    "type": "record", "name": "Event", "fields": [
        {"name": "id", "type": "long"},
        {"name": "msg", "type": "string"},
        {"name": "lvl", "type": {"type": "enum", "name": "Lvl",
                                 "symbols": ["DEBUG", "INFO", "WARN", "ERROR"]}},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "payload", "type": "bytes"},
        {"name": "sig", "type": {"type": "fixed", "name": "Sig", "size": 4}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "note", "type": ["null", "string"]},
        {"name": "nested", "type": {"type": "record", "name": "Inner",
                                    "fields": [{"name": "a", "type": "int"},
                                               {"name": "b", "type": ["null", "double"]}]}},
    ]})

AVRO_VALUES = [
    {"id": 12345678901, "msg": "héllo", "lvl": "WARN", "score": -2.5,
     "ok": True, "payload": b"\x00\x01\xff", "sig": b"ABCD",
     "tags": ["a", "b", "c"], "attrs": {"x": 1, "y": -99},
     "note": None, "nested": {"a": -7, "b": 3.75}},
    {"id": 0, "msg": "", "lvl": "DEBUG", "score": 0.0,
     "ok": False, "payload": b"", "sig": b"\x00\x00\x00\x00",
     "tags": [], "attrs": {}, "note": "hi",
     "nested": {"a": 2147483647, "b": None}},
]


def _java_avro_encode(jvm, sch, v):
    G = jvm.org.apache.avro.generic.GenericData
    rec = G.Record(sch)
    rec.put("id", jvm.java.lang.Long(str(v["id"])))
    rec.put("msg", v["msg"])
    rec.put("lvl", G.EnumSymbol(sch.getField("lvl").schema(), v["lvl"]))
    rec.put("score", float(v["score"]))
    rec.put("ok", bool(v["ok"]))
    rec.put("payload", jvm.java.nio.ByteBuffer.wrap(bytearray(v["payload"])))
    rec.put("sig", G.Fixed(sch.getField("sig").schema(), bytearray(v["sig"])))
    tags = jvm.java.util.ArrayList()
    for t in v["tags"]:
        tags.add(t)
    rec.put("tags", tags)
    attrs = jvm.java.util.HashMap()
    for k, x in v["attrs"].items():
        attrs.put(k, jvm.java.lang.Long(str(x)))
    rec.put("attrs", attrs)
    rec.put("note", v["note"])
    inner = G.Record(sch.getField("nested").schema())
    inner.put("a", v["nested"]["a"])
    inner.put("b", None if v["nested"]["b"] is None else float(v["nested"]["b"]))
    rec.put("nested", inner)
    baos = jvm.java.io.ByteArrayOutputStream()
    enc = jvm.org.apache.avro.io.EncoderFactory.get().binaryEncoder(baos, None)
    jvm.org.apache.avro.generic.GenericDatumWriter(sch).write(rec, enc)
    enc.flush()
    return bytes(baos.toByteArray())


def test_avro_byte_identical_to_java(spark):
    """Our encoder emits the SAME bytes as avro-1.12.1's GenericDatumWriter,
    and our decoder reads Java's bytes back to the original values."""
    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(AVRO_SCHEMA)
    for v in AVRO_VALUES:
        jb = _java_avro_encode(jvm, sch, v)
        assert avro_py.encode(v, AVRO_SCHEMA) == jb
        assert avro_py.decode(jb, AVRO_SCHEMA) == v


def test_avro_java_reads_our_bytes(spark):
    """avro-1.12.1's GenericDatumReader accepts our encoding."""
    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(AVRO_SCHEMA)
    v = AVRO_VALUES[0]
    dec = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(
        bytearray(avro_py.encode(v, AVRO_SCHEMA)), None)
    jr = jvm.org.apache.avro.generic.GenericDatumReader(sch).read(None, dec)
    assert jr.get("id") == v["id"]
    assert str(jr.get("msg")) == v["msg"]
    assert str(jr.get("lvl")) == v["lvl"]
    assert jr.get("score") == v["score"]


@given(st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
       st.text(max_size=40),
       st.lists(st.integers(min_value=-1000, max_value=1000), max_size=8))
@settings(**FUZZ)
def test_avro_roundtrip_property(n, s, arr):
    schema = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "n", "type": "long"}, {"name": "s", "type": "string"},
        {"name": "arr", "type": {"type": "array", "items": "long"}}]})
    v = {"n": n, "s": s, "arr": arr}
    assert avro_py.decode(avro_py.encode(v, schema), schema) == v


def test_avro_spark_udf_roundtrip(spark):
    """serialize_avro -> parse_avro through the Arrow UDF fallback path,
    including map/array/nullable columns."""
    from vector_spark.functions import parse_avro, serialize_avro

    schema = json.dumps({"type": "record", "name": "E", "fields": [
        {"name": "id", "type": "long"}, {"name": "msg", "type": "string"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "note", "type": ["null", "string"]}]})
    df = spark.createDataFrame(
        [(1, "a", ["x"], {"k": 7}, None), (2, "b", [], {}, "note")],
        "id long, msg string, tags array<string>, attrs map<string,long>, note string")
    enc = df.select(serialize_avro(
        F.struct("id", "msg", "tags", "attrs", "note"), schema).alias("b"))
    dec = enc.select(parse_avro(F.col("b"), schema).alias("r")).select("r.*")
    rows = sorted((r.id, r.msg, list(r.tags), dict(r.attrs), r.note)
                  for r in dec.collect())
    assert rows == [(1, "a", ["x"], {"k": 7}, None), (2, "b", [], {}, "note")]


def test_avro_rejects_multibranch_union():
    schema = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "u", "type": ["null", "string", "long"]}]})
    with pytest.raises(avro_py.AvroError, match="union"):
        avro_py.spark_ddl(schema)


# --------------------------------------------------------------------------
# protobuf

def _pb_files():
    fd = pb.field_dict
    return [{
        "name": "telemetry.proto", "package": "telemetry", "syntax": "proto3",
        "message_type": [
            {"name": "Event", "field": [
                fd("id", 1, pb._T_INT64),
                fd("msg", 2, pb._T_STRING),
                fd("level", 3, pb._T_ENUM, type_name=".telemetry.Level"),
                fd("score", 4, pb._T_DOUBLE),
                fd("ratio", 5, pb._T_FLOAT),
                fd("ok", 6, pb._T_BOOL),
                fd("payload", 7, pb._T_BYTES),
                fd("tags", 8, pb._T_STRING, repeated=True),
                fd("counts", 9, pb._T_INT32, repeated=True),
                fd("inner", 10, pb._T_MESSAGE, type_name=".telemetry.Inner"),
                fd("sdelta", 11, pb._T_SINT64),
                fd("f64", 12, pb._T_FIXED64),
                fd("sf32", 13, pb._T_SFIXED32),
                fd("u32", 14, pb._T_UINT32)]},
            {"name": "Inner", "field": [
                fd("a", 1, pb._T_INT32), fd("b", 2, pb._T_STRING)]}],
        "enum_type": [{"name": "Level", "value": [
            {"name": "DEBUG", "number": 0}, {"name": "INFO", "number": 1},
            {"name": "ERROR", "number": 2}]}],
    }]


_PB_VALUE = {
    "id": 12345678901, "msg": "héllo wörld", "level": "ERROR", "score": -2.5,
    "ratio": 0.25, "ok": True, "payload": b"\x00\x01\xff",
    "tags": ["a", "bb", "ccc"], "counts": [3, -7, 2147483647],
    "inner": {"a": -42, "b": "nested"}, "sdelta": -999999,
    "f64": 123456789, "sf32": -123, "u32": 4000000000,
}


def _java_parse(spark, desc_bytes, message, payload):
    P = spark._jvm.org.apache.orc.protobuf
    fds = P.DescriptorProtos.FileDescriptorSet.parseFrom(bytearray(desc_bytes))
    deps = spark._sc._gateway.new_array(P.Descriptors.FileDescriptor, 0)
    fd = P.Descriptors.FileDescriptor.buildFrom(fds.getFile(0), deps)
    ev = fd.findMessageTypeByName(message)
    return P.DynamicMessage.parseFrom(ev, bytearray(payload)), ev


def test_protobuf_java_accepts_our_descriptor_and_bytes(spark):
    """protobuf-java parses our protoc-free FileDescriptorSet AND a message
    we encoded against it — field-exact including zigzag/fixed/repeated."""
    desc = pb.build_descriptor_set(_pb_files())
    regy = pb.compile_descriptor_set(desc)
    ours = pb.encode(_PB_VALUE, regy, "telemetry.Event")
    msg, ev = _java_parse(spark, desc, "Event", ours)
    gf = lambda n: msg.getField(ev.findFieldByName(n))  # noqa: E731
    assert gf("id") == _PB_VALUE["id"]
    assert str(gf("msg")) == _PB_VALUE["msg"]
    assert str(gf("level")) == "ERROR"
    assert gf("score") == -2.5 and gf("ratio") == 0.25
    assert list(gf("tags")) == _PB_VALUE["tags"]
    assert list(gf("counts")) == _PB_VALUE["counts"]
    assert gf("sdelta") == -999999 and gf("f64") == 123456789
    assert gf("sf32") == -123
    assert gf("u32") == _PB_VALUE["u32"] - (1 << 32)  # java's signed int view


def test_protobuf_decodes_java_packed_encoding(spark):
    """DynamicMessage re-encodes with PACKED repeated scalars (different
    bytes than our expanded form) — our decoder must read both."""
    desc = pb.build_descriptor_set(_pb_files())
    regy = pb.compile_descriptor_set(desc)
    ours = pb.encode(_PB_VALUE, regy, "telemetry.Event")
    msg, _ = _java_parse(spark, desc, "Event", ours)
    jbytes = bytes(msg.toByteArray())
    assert jbytes != ours  # proves the packed path is actually different
    assert pb.decode(jbytes, regy, "telemetry.Event") == _PB_VALUE
    assert pb.decode(ours, regy, "telemetry.Event") == _PB_VALUE


def test_protobuf_spark_udf_descriptor_file(spark, tmp_path):
    """parse_protobuf fallback: binary column -> struct via a real
    descriptor FILE, nested struct + arrays intact."""
    from vector_spark.functions import parse_protobuf

    desc = pb.build_descriptor_set(_pb_files())
    regy = pb.compile_descriptor_set(desc)
    path = tmp_path / "telemetry.desc"
    path.write_bytes(desc)
    rows = [(pb.encode({"id": i, "msg": f"m{i}", "counts": [i, i * 2],
                        "inner": {"a": i, "b": "x"}},
                       regy, "telemetry.Event"),) for i in range(4)]
    df = spark.createDataFrame(rows, "b binary")
    out = df.select(parse_protobuf(F.col("b"), "Event", str(path)).alias("r")) \
            .select("r.id", "r.msg", "r.counts", F.col("r.inner.a").alias("ia"))
    got = sorted((r.id, r.msg, list(r.counts), r.ia) for r in out.collect())
    assert got == [(i, f"m{i}", [i, i * 2], i) for i in range(4)]


def test_protobuf_resolve_message_errors():
    desc = pb.build_descriptor_set(_pb_files())
    regy = pb.compile_descriptor_set(desc)
    assert pb.resolve_message(regy, "Event") == "telemetry.Event"
    assert pb.resolve_message(regy, "telemetry.Event") == "telemetry.Event"
    with pytest.raises(pb.ProtobufError, match="not found"):
        pb.resolve_message(regy, "Nope")


@given(st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
       st.text(max_size=30),
       st.lists(st.integers(min_value=-(2 ** 31), max_value=2 ** 31 - 1),
                max_size=6))
@settings(**FUZZ)
def test_protobuf_roundtrip_property(n, s, arr):
    fd = pb.field_dict
    desc = pb.build_descriptor_set([{
        "name": "p.proto", "package": "p", "syntax": "proto3",
        "message_type": [{"name": "M", "field": [
            fd("n", 1, pb._T_SINT64), fd("s", 2, pb._T_STRING),
            fd("arr", 3, pb._T_INT32, repeated=True)]}]}])
    regy = pb.compile_descriptor_set(desc)
    v = {"n": n, "s": s, "arr": arr}
    # our encoder emits present fields explicitly (even zero values), so
    # the round-trip is exact — proto3 default-elision is a producer choice
    assert pb.decode(pb.encode(v, regy, "p.M"), regy, "p.M") == v


def test_serialize_protobuf_fallback_roundtrip(spark, tmp_path):
    """serialize_protobuf (encode_proto) pairs with parse_protobuf through
    the pure-Python wire encoder when the spark-protobuf jar is absent."""
    from vector_spark.functions import parse_protobuf, serialize_protobuf

    fd = pb.field_dict
    desc = pb.build_descriptor_set([{
        "name": "t.proto", "package": "t", "syntax": "proto3",
        "message_type": [{"name": "Msg", "field": [
            fd("id", 1, pb._T_INT64), fd("s", 2, pb._T_STRING),
            fd("vals", 3, pb._T_INT32, repeated=True)]}]}])
    path = tmp_path / "t.desc"
    path.write_bytes(desc)
    df = spark.createDataFrame([(i, f"r{i}", [i, i * 3]) for i in range(4)],
                               "id long, s string, vals array<int>")
    enc = df.select(serialize_protobuf(
        F.struct("id", "s", "vals"), "Msg", str(path)).alias("b"))
    out = enc.select(parse_protobuf(F.col("b"), "Msg", str(path)).alias("r")) \
             .select("r.*")
    rows = sorted((r.id, r.s, list(r.vals)) for r in out.collect())
    assert rows == [(i, f"r{i}", [i, i * 3]) for i in range(4)]


def test_serialize_null_struct_yields_null(spark, tmp_path):
    """A NULL struct row must serialize to NULL bytes, not crash (avro) or
    silently emit an empty message (protobuf). Arrow gives struct columns
    no row-level mask in pandas, so the codecs detect the all-None row."""
    from vector_spark.functions import (
        parse_protobuf, serialize_avro, serialize_protobuf)

    schema = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "id", "type": "long"}, {"name": "s", "type": "string"}]})
    df = spark.createDataFrame([(1, "x"), (2, None)], "id long, s string") \
        .select(F.when(F.col("id") == 1,
                       F.struct("id", "s")).alias("rec"))
    got = df.select(serialize_avro(F.col("rec"), schema).alias("b")).collect()
    assert got[0].b is not None and got[1].b is None

    fd = pb.field_dict
    desc = pb.build_descriptor_set([{
        "name": "n.proto", "package": "n", "syntax": "proto3",
        "message_type": [{"name": "M", "field": [
            fd("id", 1, pb._T_INT64), fd("s", 2, pb._T_STRING)]}]}])
    path = tmp_path / "n.desc"
    path.write_bytes(desc)
    got = df.select(
        serialize_protobuf(F.col("rec"), "M", str(path)).alias("b")).collect()
    assert got[0].b is not None and got[1].b is None
    back = df.select(parse_protobuf(
        serialize_protobuf(F.col("rec"), "M", str(path)), "M", str(path))
        .alias("r")).select("r.id").collect()
    assert back[0].id == 1 and back[1].id is None


def test_protobuf_packed_repeated_enum(spark):
    """proto3 packs repeated enums by default (wire type 2) — decode must
    map each packed varint through the enum symbol table. Ground truth:
    protobuf-java DynamicMessage's own packed encoding."""
    fd = pb.field_dict
    desc = pb.build_descriptor_set([{
        "name": "e.proto", "package": "e", "syntax": "proto3",
        "message_type": [{"name": "M", "field": [
            fd("levels", 1, pb._T_ENUM, repeated=True,
               type_name=".e.Lvl")]}],
        "enum_type": [{"name": "Lvl", "value": [
            {"name": "DEBUG", "number": 0}, {"name": "INFO", "number": 1},
            {"name": "ERROR", "number": 2}]}]}])
    regy = pb.compile_descriptor_set(desc)
    ours = pb.encode({"levels": ["DEBUG", "ERROR", "INFO"]}, regy, "e.M")
    msg, ev = _java_parse(spark, desc, "M", ours)
    jbytes = bytes(msg.toByteArray())
    assert jbytes[0] == 0x0A  # field 1, wire type 2: java packed it
    assert pb.decode(jbytes, regy, "e.M") == {"levels": ["DEBUG", "ERROR", "INFO"]}


def test_avro_negative_enum_index_rejected():
    schema = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "lvl", "type": {"type": "enum", "name": "L",
                                 "symbols": ["A", "B", "C"]}}]})
    with pytest.raises(avro_py.AvroError, match="enum index"):
        avro_py.decode(b"\x01", schema)  # zigzag -1
