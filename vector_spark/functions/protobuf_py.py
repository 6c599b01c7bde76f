"""Pure-Python Protobuf wire-format codec driven by a FileDescriptorSet.

The reference decodes protobuf events against a compiled descriptor file
(`lib/codecs/src/decoding/format/protobuf.rs`; VRL `parse_proto`). The
sandbox has neither the spark-protobuf module jar nor the protobuf wheel,
but the wire format (varint / 64-bit / length-delimited / 32-bit groups)
and descriptor.proto schema are public — so, generalizing the dnstap
walker (functions/dnstap.py:55), this module:

1. parses a real `FileDescriptorSet` (the output of `protoc
   --descriptor_set_out`) with its own walker — descriptor.proto field
   numbers: FileDescriptorSet.file=1; FileDescriptorProto name=1,
   package=2, message_type=4, enum_type=5; DescriptorProto name=1,
   field=2, nested_type=3, enum_type=4; FieldDescriptorProto name=1,
   number=3, label=4, type=5, type_name=6; EnumDescriptorProto name=1,
   value=2; EnumValueDescriptorProto name=1, number=2;
2. decodes messages against the compiled registry (all scalar types,
   zigzag sint32/64, fixed/sfixed, packed repeated scalars, nested
   messages, enums as symbol strings, repeated fields as arrays);
3. encodes the same (for fixtures and round-trip tests).

Cross-validated in tests against the REAL protobuf-java runtime (the
ORC-shaded `org.apache.orc.protobuf` on Spark's classpath) via
DynamicMessage. Scale: Arrow-batched scan-parallel map, no shuffle — the
documented Python slow-path exemption for binary wire formats.
"""

from __future__ import annotations

import struct


class ProtobufError(ValueError):
    pass


# wire types
_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5

# FieldDescriptorProto.Type numbers (descriptor.proto, public)
_T_DOUBLE, _T_FLOAT, _T_INT64, _T_UINT64, _T_INT32 = 1, 2, 3, 4, 5
_T_FIXED64, _T_FIXED32, _T_BOOL, _T_STRING, _T_GROUP = 6, 7, 8, 9, 10
_T_MESSAGE, _T_BYTES, _T_UINT32, _T_ENUM = 11, 12, 13, 14
_T_SFIXED32, _T_SFIXED64, _T_SINT32, _T_SINT64 = 15, 16, 17, 18

_LABEL_REPEATED = 3

_SCALAR_WIRETYPE = {
    _T_DOUBLE: _I64, _T_FLOAT: _I32, _T_INT64: _VARINT, _T_UINT64: _VARINT,
    _T_INT32: _VARINT, _T_FIXED64: _I64, _T_FIXED32: _I32, _T_BOOL: _VARINT,
    _T_UINT32: _VARINT, _T_ENUM: _VARINT, _T_SFIXED32: _I32,
    _T_SFIXED64: _I64, _T_SINT32: _VARINT, _T_SINT64: _VARINT,
}


def _varint(b: bytes, i: int) -> tuple[int, int]:
    out, shift = 0, 0
    while True:
        if i >= len(b):
            raise ProtobufError("truncated varint")
        x = b[i]
        i += 1
        out |= (x & 0x7F) << shift
        if not x & 0x80:
            return out, i
        shift += 7
        if shift > 70:
            raise ProtobufError("varint too long")


def _walk(b: bytes):
    """Yield (field_number, wire_type, raw_value) over one message."""
    i, n = 0, len(b)
    while i < n:
        tag, i = _varint(b, i)
        fno, wt = tag >> 3, tag & 7
        if wt == _VARINT:
            v, i = _varint(b, i)
        elif wt == _I64:
            v, i = b[i : i + 8], i + 8
        elif wt == _LEN:
            ln, i = _varint(b, i)
            if i + ln > n:
                raise ProtobufError("truncated length-delimited field")
            v, i = b[i : i + ln], i + ln
        elif wt == _I32:
            v, i = b[i : i + 4], i + 4
        else:
            raise ProtobufError(f"unsupported wire type {wt} (groups)")
        yield fno, wt, v


# --------------------------------------------------------------------------
# descriptor compilation

class Field:
    __slots__ = ("name", "number", "type", "repeated", "type_name")

    def __init__(self, name, number, ftype, repeated, type_name):
        self.name, self.number, self.type = name, number, ftype
        self.repeated, self.type_name = repeated, type_name


def compile_descriptor_set(desc: bytes) -> dict:
    """FileDescriptorSet bytes -> registry:
    {'messages': {full_name: {number: Field}}, 'enums': {full_name: {num: sym}}}."""
    messages: dict[str, dict[int, Field]] = {}
    enums: dict[str, dict[int, str]] = {}

    def read_enum(b: bytes, prefix: str):
        name, vals = "", {}
        for fno, wt, v in _walk(b):
            if fno == 1:
                name = v.decode()
            elif fno == 2:  # EnumValueDescriptorProto
                vname, vnum = "", 0
                for f2, w2, v2 in _walk(v):
                    if f2 == 1:
                        vname = v2.decode()
                    elif f2 == 2:
                        vnum = v2
                vals[vnum] = vname
        enums[f"{prefix}.{name}"] = vals

    def read_field(b: bytes) -> Field:
        name, number, ftype, label, type_name = "", 0, 0, 1, None
        for fno, wt, v in _walk(b):
            if fno == 1:
                name = v.decode()
            elif fno == 3:
                number = v
            elif fno == 4:
                label = v
            elif fno == 5:
                ftype = v
            elif fno == 6:
                type_name = v.decode().lstrip(".")
        return Field(name, number, ftype, label == _LABEL_REPEATED, type_name)

    def read_message(b: bytes, prefix: str):
        name, fields, nested, nested_enums = "", [], [], []
        for fno, wt, v in _walk(b):
            if fno == 1:
                name = v.decode()
            elif fno == 2:
                fields.append(read_field(v))
            elif fno == 3:
                nested.append(v)
            elif fno == 4:
                nested_enums.append(v)
        full = f"{prefix}.{name}" if prefix else name
        messages[full] = {f.number: f for f in fields}
        for nb in nested:
            read_message(nb, full)
        for eb in nested_enums:
            read_enum(eb, full)

    for fno, wt, v in _walk(bytes(desc)):
        if fno != 1:  # FileDescriptorSet.file
            continue
        package = ""
        msg_blobs, enum_blobs = [], []
        for f2, w2, v2 in _walk(v):  # FileDescriptorProto
            if f2 == 2:
                package = v2.decode()
            elif f2 == 4:
                msg_blobs.append(v2)
            elif f2 == 5:
                enum_blobs.append(v2)
        for mb in msg_blobs:
            read_message(mb, package)
        for eb in enum_blobs:
            read_enum(eb, package)
    return {"messages": messages, "enums": enums}


def resolve_message(registry: dict, message_name: str) -> str:
    """Accept a full name or unique suffix (protoc-style lookup)."""
    msgs = registry["messages"]
    if message_name in msgs:
        return message_name
    hits = [k for k in msgs if k.endswith("." + message_name) or k == message_name]
    if len(hits) == 1:
        return hits[0]
    raise ProtobufError(
        f"message {message_name!r} {'ambiguous' if hits else 'not found'} "
        f"in descriptor set (have: {sorted(msgs)})")


# --------------------------------------------------------------------------
# decode

def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def _convert_scalar(ftype: int, wt: int, v):
    if ftype == _T_DOUBLE:
        return struct.unpack("<d", v)[0]
    if ftype == _T_FLOAT:
        return struct.unpack("<f", v)[0]
    if ftype in (_T_INT64, _T_INT32):
        return _signed64(v)
    if ftype in (_T_UINT64, _T_UINT32):
        return v
    if ftype == _T_FIXED64:
        return int.from_bytes(v, "little")
    if ftype == _T_FIXED32:
        return int.from_bytes(v, "little")
    if ftype == _T_SFIXED64:
        return int.from_bytes(v, "little", signed=True)
    if ftype == _T_SFIXED32:
        return int.from_bytes(v, "little", signed=True)
    if ftype == _T_BOOL:
        return v != 0
    if ftype in (_T_SINT32, _T_SINT64):
        return (v >> 1) ^ -(v & 1)
    raise ProtobufError(f"unsupported scalar type {ftype}")


def _unpack_packed(ftype: int, blob: bytes, enum_syms: dict | None = None) -> list:
    out = []
    i, n = 0, len(blob)
    wt = _SCALAR_WIRETYPE[ftype]
    while i < n:
        if wt == _VARINT:
            v, i = _varint(blob, i)
        elif wt == _I64:
            v, i = blob[i : i + 8], i + 8
        else:
            v, i = blob[i : i + 4], i + 4
        if ftype == _T_ENUM:  # packed repeated enum: proto3's default form
            num = _signed64(v)
            out.append((enum_syms or {}).get(num, str(num)))
        else:
            out.append(_convert_scalar(ftype, wt, v))
    return out


def decode(data: bytes, registry: dict, message: str) -> dict:
    """Decode one message -> dict. Absent scalars are None, absent repeated
    fields are []; enums become symbol strings; unknown fields are skipped
    (forward compatibility, same as the reference's prost decode)."""
    spec = registry["messages"][message]
    out = {f.name: ([] if f.repeated else None) for f in spec.values()}
    for fno, wt, v in _walk(bytes(data)):
        f = spec.get(fno)
        if f is None:
            continue
        if f.type == _T_MESSAGE:
            val = decode(v, registry, f.type_name)
        elif f.type == _T_STRING:
            val = v.decode("utf-8", errors="replace")
        elif f.type == _T_BYTES:
            val = bytes(v)
        elif f.type == _T_ENUM and wt == _VARINT:
            syms = registry["enums"].get(f.type_name, {})
            val = syms.get(_signed64(v), str(_signed64(v)))
        elif f.repeated and wt == _LEN and f.type in _SCALAR_WIRETYPE:
            out[f.name].extend(_unpack_packed(
                f.type, v, registry["enums"].get(f.type_name)))
            continue
        else:
            val = _convert_scalar(f.type, wt, v)
        if f.repeated:
            out[f.name].append(val)
        else:
            out[f.name] = val
    return out


def spark_ddl(registry: dict, message: str, _depth: int = 0) -> str:
    """Message spec -> Spark struct DDL (uint64 maps to bigint — values
    above 2^63-1 would wrap; disclosed, same mapping as spark-protobuf)."""
    if _depth > 16:
        raise ProtobufError("message nesting too deep (recursive type?)")
    base = {
        _T_DOUBLE: "double", _T_FLOAT: "float", _T_INT64: "bigint",
        _T_UINT64: "bigint", _T_INT32: "int", _T_FIXED64: "bigint",
        _T_FIXED32: "bigint", _T_BOOL: "boolean", _T_STRING: "string",
        _T_BYTES: "binary", _T_UINT32: "bigint", _T_ENUM: "string",
        _T_SFIXED32: "int", _T_SFIXED64: "bigint", _T_SINT32: "int",
        _T_SINT64: "bigint",
    }
    parts = []
    for f in sorted(registry["messages"][message].values(),
                    key=lambda f: f.number):
        if f.type == _T_MESSAGE:
            t = f"struct<{spark_ddl(registry, f.type_name, _depth + 1)}>"
        else:
            t = base[f.type]
        if f.repeated:
            t = f"array<{t}>"
        parts.append(f"{f.name}: {t}")
    return ", ".join(parts)


# --------------------------------------------------------------------------
# encode (fixtures / round-trips)

def encode(value: dict, registry: dict, message: str) -> bytes:
    spec = registry["messages"][message]
    out = bytearray()
    for f in sorted(spec.values(), key=lambda f: f.number):
        v = value.get(f.name)
        if v is None or (f.repeated and v == []):
            continue
        items = v if f.repeated else [v]
        for item in items:
            _encode_one(item, f, registry, out)
    return bytes(out)


def _append_varint(v: int, out: bytearray) -> None:
    if v < 0:
        v += 1 << 64
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _encode_one(v, f: Field, registry: dict, out: bytearray) -> None:
    if f.type == _T_MESSAGE:
        payload = encode(v, registry, f.type_name)
        _append_varint((f.number << 3) | _LEN, out)
        _append_varint(len(payload), out)
        out += payload
        return
    if f.type in (_T_STRING, _T_BYTES):
        raw = v.encode("utf-8") if f.type == _T_STRING else bytes(v)
        _append_varint((f.number << 3) | _LEN, out)
        _append_varint(len(raw), out)
        out += raw
        return
    if f.type == _T_ENUM:
        syms = registry["enums"].get(f.type_name, {})
        num = next((k for k, s in syms.items() if s == v), None)
        if num is None:
            num = int(v)
        _append_varint((f.number << 3) | _VARINT, out)
        _append_varint(num, out)
        return
    wt = _SCALAR_WIRETYPE[f.type]
    _append_varint((f.number << 3) | wt, out)
    if f.type == _T_DOUBLE:
        out += struct.pack("<d", float(v))
    elif f.type == _T_FLOAT:
        out += struct.pack("<f", float(v))
    elif f.type == _T_FIXED64:
        out += int(v).to_bytes(8, "little")
    elif f.type == _T_FIXED32:
        out += int(v).to_bytes(4, "little")
    elif f.type == _T_SFIXED64:
        out += int(v).to_bytes(8, "little", signed=True)
    elif f.type == _T_SFIXED32:
        out += int(v).to_bytes(4, "little", signed=True)
    elif f.type == _T_BOOL:
        _append_varint(1 if v else 0, out)
    elif f.type in (_T_SINT32, _T_SINT64):
        _append_varint((int(v) << 1) ^ (int(v) >> 63), out)
    else:  # int32/int64/uint32/uint64
        _append_varint(int(v), out)


# --------------------------------------------------------------------------
# descriptor bootstrap: descriptor.proto described in its own terms, so a
# FileDescriptorSet can be BUILT without protoc (tests prove protobuf-java
# parses the output). Field numbers from the public descriptor.proto.

def _bootstrap_registry() -> dict:
    F = Field
    return {"messages": {
        "FileDescriptorSet": {
            1: F("file", 1, _T_MESSAGE, True, "FileDescriptorProto")},
        "FileDescriptorProto": {
            1: F("name", 1, _T_STRING, False, None),
            2: F("package", 2, _T_STRING, False, None),
            4: F("message_type", 4, _T_MESSAGE, True, "DescriptorProto"),
            5: F("enum_type", 5, _T_MESSAGE, True, "EnumDescriptorProto"),
            12: F("syntax", 12, _T_STRING, False, None)},
        "DescriptorProto": {
            1: F("name", 1, _T_STRING, False, None),
            2: F("field", 2, _T_MESSAGE, True, "FieldDescriptorProto"),
            3: F("nested_type", 3, _T_MESSAGE, True, "DescriptorProto"),
            4: F("enum_type", 4, _T_MESSAGE, True, "EnumDescriptorProto")},
        "FieldDescriptorProto": {
            1: F("name", 1, _T_STRING, False, None),
            3: F("number", 3, _T_INT32, False, None),
            4: F("label", 4, _T_INT32, False, None),
            5: F("type", 5, _T_INT32, False, None),
            6: F("type_name", 6, _T_STRING, False, None)},
        "EnumDescriptorProto": {
            1: F("name", 1, _T_STRING, False, None),
            2: F("value", 2, _T_MESSAGE, True, "EnumValueDescriptorProto")},
        "EnumValueDescriptorProto": {
            1: F("name", 1, _T_STRING, False, None),
            2: F("number", 2, _T_INT32, False, None)},
    }, "enums": {}}


def build_descriptor_set(files: list[dict]) -> bytes:
    """Assemble FileDescriptorSet bytes from plain dicts (the
    FileDescriptorProto shape: name/package/syntax/message_type[]/
    enum_type[]), protoc-free. The output is accepted by protobuf-java's
    FileDescriptorSet.parseFrom (pinned in tests) and by
    compile_descriptor_set above."""
    return encode({"file": files}, _bootstrap_registry(), "FileDescriptorSet")


def field_dict(name: str, number: int, type_: int, repeated: bool = False,
               type_name: str | None = None) -> dict:
    """FieldDescriptorProto dict helper for build_descriptor_set."""
    d = {"name": name, "number": number,
         "label": _LABEL_REPEATED if repeated else 1, "type": type_}
    if type_name:
        d["type_name"] = type_name
    return d


# --------------------------------------------------------------------------
# Spark integration

def parse_protobuf_py(col, message_name: str, desc_file_path: str):
    """Binary column -> struct via the pure-Python decoder. The descriptor
    file is read and compiled ONCE on the driver; the registry (plain
    dicts/Field objects) ships in the UDF closure."""
    from pyspark.sql.functions import pandas_udf

    with open(desc_file_path, "rb") as fh:
        registry = compile_descriptor_set(fh.read())
    full = resolve_message(registry, message_name)
    ddl = spark_ddl(registry, full)
    field_names = [f.name for f in sorted(
        registry["messages"][full].values(), key=lambda f: f.number)]

    def fn(data):
        import pandas as pd

        rows = [dict.fromkeys(field_names) if b is None
                else decode(bytes(b), registry, full) for b in data]
        return pd.DataFrame(rows, columns=field_names)

    return pandas_udf(fn, f"struct<{ddl}>")(col)
