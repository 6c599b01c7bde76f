"""Pure-Python Apache Avro binary codec driven by a JSON schema.

The reference decodes/encodes Avro in its codec stack
(`lib/codecs/src/decoding/format/avro.rs`, `.../encoding/format/avro.rs`)
via the apache-avro crate. The sandbox has neither the spark-avro module
jar nor an avro wheel, but the binary encoding is a public spec
(avro.apache.org/docs/1.12.0/specification — zigzag varints, length-
prefixed bytes/strings, block-coded arrays/maps, index-prefixed unions),
so — same policy as the dnstap/netflow/mmdb/zstd walkers — this module
implements it directly. Cross-validated in tests against the REAL Avro
Java library (avro-1.12.1.jar on Spark's classpath, driver-side via py4j)
in both directions.

Supported schema: all primitives, record, enum, fixed, array, map,
nested/named type refs, and unions of the ["null", X] shape (the nullable-
column form — general multi-branch unions have no stable columnar shape
and raise a clear error; Vector's event model flattens the same way).

Spark integration (functions/parse.py::parse_avro / serialize_avro falls
back here when the jar is absent): Arrow-batched pandas UDFs; the Avro
schema is compiled once per executor to a Spark StructType. Scale: pure
scan-parallel map work, no shuffle — the documented Python slow-path
exemption for binary wire formats.
"""

from __future__ import annotations

import json
import struct


class AvroError(ValueError):
    pass


# --------------------------------------------------------------------------
# schema handling

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


def parse_schema(schema: str | dict | list) -> dict | str | list:
    """Parse + resolve named-type references -> a normalized schema tree
    (dicts/strings/lists, named refs inlined)."""
    if isinstance(schema, str) and schema.lstrip().startswith(("{", "[", '"')):
        schema = json.loads(schema)
    named: dict[str, dict] = {}

    def walk(s):
        if isinstance(s, str):
            if s in _PRIMITIVES:
                return s
            if s in named:
                return named[s]
            raise AvroError(f"unknown type reference {s!r}")
        if isinstance(s, list):
            return [walk(b) for b in s]
        t = s["type"]
        if t in ("record", "error"):
            out = {"type": "record", "name": s["name"], "fields": []}
            named[s["name"]] = out
            for f in s["fields"]:
                out["fields"].append({"name": f["name"], "type": walk(f["type"])})
            return out
        if t == "enum":
            out = {"type": "enum", "name": s["name"], "symbols": list(s["symbols"])}
            named[s["name"]] = out
            return out
        if t == "fixed":
            out = {"type": "fixed", "name": s["name"], "size": int(s["size"])}
            named[s["name"]] = out
            return out
        if t == "array":
            return {"type": "array", "items": walk(s["items"])}
        if t == "map":
            return {"type": "map", "values": walk(s["values"])}
        if t in _PRIMITIVES:  # {"type": "string"} wrapper form
            return t
        return walk(t)  # {"type": {...}} nesting

    return walk(schema)


def spark_ddl(schema) -> str:
    """Avro schema -> Spark DDL string (for the UDF return type)."""
    s = parse_schema(schema)

    def ddl_struct(s):
        # struct<a: int, b: string> form accepted by Spark
        if isinstance(s, dict) and s["type"] == "record":
            return ", ".join(f"{f['name']}: {ddl_inner(f['type'])}" for f in s["fields"])
        raise AvroError("top-level schema must be a record")

    def ddl_inner(s):
        if isinstance(s, list):
            branches = [b for b in s if b != "null"]
            if len(branches) != 1:
                raise AvroError("only ['null', X] unions are supported")
            return ddl_inner(branches[0])
        if isinstance(s, str):
            return {"boolean": "boolean", "int": "int", "long": "bigint",
                    "float": "float", "double": "double", "bytes": "binary",
                    "string": "string", "null": "void"}[s]
        t = s["type"]
        if t == "record":
            inner = ", ".join(f"{f['name']}: {ddl_inner(f['type'])}"
                              for f in s["fields"])
            return f"struct<{inner}>"
        if t == "enum":
            return "string"
        if t == "fixed":
            return "binary"
        if t == "array":
            return f"array<{ddl_inner(s['items'])}>"
        if t == "map":
            return f"map<string, {ddl_inner(s['values'])}>"
        raise AvroError(f"unsupported schema node {s!r}")

    return ddl_struct(s)


# --------------------------------------------------------------------------
# binary decode

def _zigzag_decode(b: bytes, i: int) -> tuple[int, int]:
    out, shift = 0, 0
    while True:
        if i >= len(b):
            raise AvroError("truncated varint")
        x = b[i]
        i += 1
        out |= (x & 0x7F) << shift
        if not x & 0x80:
            return (out >> 1) ^ -(out & 1), i
        shift += 7
        if shift > 70:
            raise AvroError("varint too long")


def decode(data: bytes, schema) -> dict:
    """Decode one Avro binary datum against a (parsed or JSON) schema."""
    s = parse_schema(schema)
    val, i = _decode(bytes(data), 0, s)
    return val


def _decode(b: bytes, i: int, s):
    if isinstance(s, list):  # union: long index then branch value
        idx, i = _zigzag_decode(b, i)
        if not 0 <= idx < len(s):
            raise AvroError(f"union index {idx} out of range")
        return _decode(b, i, s[idx])
    if isinstance(s, str):
        if s == "null":
            return None, i
        if s == "boolean":
            return b[i] != 0, i + 1
        if s in ("int", "long"):
            return _zigzag_decode(b, i)
        if s == "float":
            return struct.unpack_from("<f", b, i)[0], i + 4
        if s == "double":
            return struct.unpack_from("<d", b, i)[0], i + 8
        if s in ("bytes", "string"):
            n, i = _zigzag_decode(b, i)
            if n < 0 or i + n > len(b):
                raise AvroError("bad bytes/string length")
            raw = b[i : i + n]
            return (raw.decode("utf-8") if s == "string" else raw), i + n
        raise AvroError(f"unknown primitive {s!r}")
    t = s["type"]
    if t == "record":
        out = {}
        for f in s["fields"]:
            out[f["name"]], i = _decode(b, i, f["type"])
        return out, i
    if t == "enum":
        idx, i = _zigzag_decode(b, i)
        # explicit bounds: a negative index would silently hit Python's
        # from-the-end indexing and return the wrong symbol
        if not 0 <= idx < len(s["symbols"]):
            raise AvroError(f"enum index {idx} out of range")
        return s["symbols"][idx], i
    if t == "fixed":
        n = s["size"]
        if i + n > len(b):
            raise AvroError("truncated fixed")
        return b[i : i + n], i + n
    if t == "array":
        out = []
        while True:
            cnt, i = _zigzag_decode(b, i)
            if cnt == 0:
                return out, i
            if cnt < 0:  # block with byte-size prefix (skippable form)
                cnt = -cnt
                _, i = _zigzag_decode(b, i)
            for _ in range(cnt):
                v, i = _decode(b, i, s["items"])
                out.append(v)
    if t == "map":
        out = {}
        while True:
            cnt, i = _zigzag_decode(b, i)
            if cnt == 0:
                return out, i
            if cnt < 0:
                cnt = -cnt
                _, i = _zigzag_decode(b, i)
            for _ in range(cnt):
                k, i = _decode(b, i, "string")
                out[k], i = _decode(b, i, s["values"])
    raise AvroError(f"unsupported schema node {s!r}")


# --------------------------------------------------------------------------
# binary encode

def _zigzag_encode(v: int, out: bytearray) -> None:
    v = (v << 1) ^ (v >> 63) if v >= 0 else ((-v - 1) << 1) | 1
    # canonical zigzag: (n << 1) ^ (n >> 63) on two's-complement; do it directly
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def encode(value, schema) -> bytes:
    s = parse_schema(schema)
    out = bytearray()
    _encode(value, s, out)
    return bytes(out)


def _encode(v, s, out: bytearray) -> None:
    if isinstance(s, list):  # union
        for idx, branch in enumerate(s):
            if (v is None) == (branch == "null"):
                if v is None and branch == "null":
                    _zigzag_encode(idx, out)
                    return
                if v is not None and branch != "null":
                    _zigzag_encode(idx, out)
                    _encode(v, branch, out)
                    return
        raise AvroError("no union branch matches value")
    if isinstance(s, str):
        if s == "null":
            return
        if s == "boolean":
            out.append(1 if v else 0)
            return
        if s in ("int", "long"):
            _zigzag_encode(int(v), out)
            return
        if s == "float":
            out += struct.pack("<f", float(v))
            return
        if s == "double":
            out += struct.pack("<d", float(v))
            return
        if s == "string":
            raw = v.encode("utf-8")
            _zigzag_encode(len(raw), out)
            out += raw
            return
        if s == "bytes":
            raw = bytes(v)
            _zigzag_encode(len(raw), out)
            out += raw
            return
        raise AvroError(f"unknown primitive {s!r}")
    t = s["type"]
    if t == "record":
        for f in s["fields"]:
            _encode(v[f["name"]], f["type"], out)
        return
    if t == "enum":
        _zigzag_encode(s["symbols"].index(v), out)
        return
    if t == "fixed":
        raw = bytes(v)
        if len(raw) != s["size"]:
            raise AvroError(f"fixed size mismatch: {len(raw)} != {s['size']}")
        out += raw
        return
    if t == "array":
        if v:
            _zigzag_encode(len(v), out)
            for item in v:
                _encode(item, s["items"], out)
        _zigzag_encode(0, out)
        return
    if t == "map":
        if v:
            _zigzag_encode(len(v), out)
            for k, item in v.items():
                _encode(k, "string", out)
                _encode(item, s["values"], out)
        _zigzag_encode(0, out)
        return
    raise AvroError(f"unsupported schema node {s!r}")
