"""Vector's NATIVE protobuf event format — the `native` codec
(lib/codecs/src/decoding/format/native.rs:41-60 /
encoding/format/native.rs:40-41): each frame is one proto `EventArray`
(lib/vector-core/proto/event.proto) carrying a LogArray or MetricArray.

Decoded with the repo's pure-Python protobuf walker (protobuf_py.py)
against a descriptor built in-process from event.proto's public field
numbers — no protoc, no wheel, always executes (the same machinery the
codec_protobuf contract pins against protobuf-java). Proto `map<k,v>`
fields are modeled as their wire-identical repeated `*Entry{key=1,
value=2}` messages; the recursive Value oneof (bytes / timestamp /
int64 / double / bool / map / array / null) resolves through the
registry naturally.

Value rendering matches parse_native_json's map<string,string> surface:
bytes -> UTF-8 text, integers/bools -> their JSON text, timestamps ->
epoch-us strings, nested maps/arrays -> compact sorted-key JSON.

Scale: Arrow-batched per-frame decode, scan-parallel, no shuffle — the
documented Python slow path for binary wire formats.
"""

from __future__ import annotations

import json
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

NATIVE_PROTO_SCHEMA = (
    "array<struct<kind:string, log:map<string,string>,"
    " metric_name:string, metric_namespace:string, metric_kind:string,"
    " counter_value:double, gauge_value:double, tag_host:string,"
    " ts_us:bigint>>"
)


@lru_cache(maxsize=1)
def _event_registry() -> dict:
    from . import protobuf_py as pb

    fd = pb.field_dict
    m = lambda name: ".event." + name  # noqa: E731
    desc = pb.build_descriptor_set([{
        "name": "event.proto", "package": "event", "syntax": "proto3",
        "message_type": [
            {"name": "Timestamp", "field": [  # google.protobuf.Timestamp
                fd("seconds", 1, pb._T_INT64), fd("nanos", 2, pb._T_INT32)]},
            {"name": "EventArray", "field": [
                fd("logs", 1, pb._T_MESSAGE, type_name=m("LogArray")),
                fd("metrics", 2, pb._T_MESSAGE, type_name=m("MetricArray"))]},
            {"name": "LogArray", "field": [
                fd("logs", 1, pb._T_MESSAGE, repeated=True,
                   type_name=m("Log"))]},
            {"name": "MetricArray", "field": [
                fd("metrics", 1, pb._T_MESSAGE, repeated=True,
                   type_name=m("Metric"))]},
            # map<string, Value> == repeated FieldsEntry{key=1, value=2}
            {"name": "FieldsEntry", "field": [
                fd("key", 1, pb._T_STRING),
                fd("value", 2, pb._T_MESSAGE, type_name=m("Value"))]},
            {"name": "TagsEntry", "field": [
                fd("key", 1, pb._T_STRING), fd("value", 2, pb._T_STRING)]},
            {"name": "Log", "field": [
                fd("fields", 1, pb._T_MESSAGE, repeated=True,
                   type_name=m("FieldsEntry")),
                fd("value", 2, pb._T_MESSAGE, type_name=m("Value"))]},
            {"name": "ValueMap", "field": [
                fd("fields", 1, pb._T_MESSAGE, repeated=True,
                   type_name=m("FieldsEntry"))]},
            {"name": "ValueArray", "field": [
                fd("items", 1, pb._T_MESSAGE, repeated=True,
                   type_name=m("Value"))]},
            {"name": "Value", "field": [
                fd("raw_bytes", 1, pb._T_BYTES),
                fd("timestamp", 2, pb._T_MESSAGE, type_name=m("Timestamp")),
                fd("integer", 4, pb._T_INT64),
                fd("float", 5, pb._T_DOUBLE),
                fd("boolean", 6, pb._T_BOOL),
                fd("map", 7, pb._T_MESSAGE, type_name=m("ValueMap")),
                fd("array", 8, pb._T_MESSAGE, type_name=m("ValueArray")),
                fd("null", 9, pb._T_INT32)]},
            {"name": "Counter", "field": [fd("value", 1, pb._T_DOUBLE)]},
            {"name": "Gauge", "field": [fd("value", 1, pb._T_DOUBLE)]},
            {"name": "Metric", "field": [
                fd("name", 1, pb._T_STRING),
                fd("timestamp", 2, pb._T_MESSAGE, type_name=m("Timestamp")),
                fd("tags_v1", 3, pb._T_MESSAGE, repeated=True,
                   type_name=m("TagsEntry")),
                fd("kind", 4, pb._T_INT32),
                fd("counter", 5, pb._T_MESSAGE, type_name=m("Counter")),
                fd("gauge", 6, pb._T_MESSAGE, type_name=m("Gauge")),
                fd("namespace", 11, pb._T_STRING)]},
        ],
    }])
    return pb.compile_descriptor_set(desc)


def _render(value: dict):
    """One proto Value -> its map<string,string> rendering (see module
    docstring). Raw python, shared by decode + tests."""
    if not isinstance(value, dict):
        return None
    # protobuf_py materializes every declared field (None when absent on
    # the wire) — presence is `is not None`, which still distinguishes an
    # explicit proto3 zero/False (oneof fields always serialize)
    v = value.get("raw_bytes")
    if v is not None:
        return v.decode("utf-8", errors="replace") if isinstance(v, bytes) else str(v)
    if value.get("integer") is not None:
        return str(int(value["integer"]))
    if value.get("float") is not None:
        return json.dumps(float(value["float"]))
    if value.get("boolean") is not None:
        return "true" if value["boolean"] else "false"
    if value.get("timestamp") is not None:
        t = value["timestamp"]
        return str(int(t.get("seconds") or 0) * 1_000_000
                   + int(t.get("nanos") or 0) // 1000)
    if value.get("map") is not None:
        return json.dumps(
            {e["key"]: _render(e.get("value") or {})
             for e in (value["map"].get("fields") or [])},
            sort_keys=True, separators=(",", ":"))
    if value.get("array") is not None:
        return json.dumps(
            [_render(x) for x in (value["array"].get("items") or [])],
            separators=(",", ":"))
    return None  # null kind (or no kind at all)


_METRIC_KINDS = {0: "incremental", 1: "absolute"}


def decode_event_array(frame: bytes) -> list[tuple]:
    """One native frame -> event tuples matching NATIVE_PROTO_SCHEMA
    (shared decode core for the UDF and driver-side tests)."""
    from . import protobuf_py as pb

    msg = pb.decode(frame, _event_registry(), "event.EventArray")
    out = []
    for log in ((msg.get("logs") or {}).get("logs") or []):
        # proto.rs:107-118: Log.value (field 2) takes precedence when set —
        # a Map value becomes the event's fields, any other kind becomes
        # the event root (rendered under "."); the repeated `fields` map
        # (field 1) is the deprecated backwards-compat path.
        val = log.get("value")
        if val is not None:
            if val.get("map") is not None:
                fields = {e["key"]: _render(e.get("value") or {})
                          for e in (val["map"].get("fields") or [])}
            else:
                fields = {".": _render(val)}
        else:
            fields = {e["key"]: _render(e.get("value") or {})
                      for e in (log.get("fields") or [])}
        out.append(("log", fields, None, None, None, None, None, None, None))
    for met in ((msg.get("metrics") or {}).get("metrics") or []):
        tags = {e["key"]: e.get("value") for e in (met.get("tags_v1") or [])}
        t = met.get("timestamp")
        ts_us = (int(t.get("seconds") or 0) * 1_000_000
                 + int(t.get("nanos") or 0) // 1000) if t else None
        counter, gauge = met.get("counter"), met.get("gauge")
        out.append((
            "metric", None, met.get("name"), met.get("namespace"),
            _METRIC_KINDS.get(met.get("kind") or 0),
            float(counter["value"] or 0.0) if counter is not None else None,
            float(gauge["value"] or 0.0) if gauge is not None else None,
            tags.get("host"), ts_us,
        ))
    return out


def encode_native_logs(events: list[dict], *, use_value: bool = False) -> bytes:
    """Fixture/test encoder: a list of {field: python value} dicts ->
    one native LogArray frame (strings/ints/bools/nested dicts/lists).
    use_value=True emits the modern Log.value Map form (proto.rs:303-310,
    what current Vector serializes) instead of the deprecated repeated
    `fields` map; decode_event_array treats both identically."""
    from . import protobuf_py as pb

    def val(v):
        if v is None:
            return {"null": 0}
        if isinstance(v, bool):
            return {"boolean": v}
        if isinstance(v, int):
            return {"integer": v}
        if isinstance(v, float):
            return {"float": v}
        if isinstance(v, bytes):
            return {"raw_bytes": v}
        if isinstance(v, dict):
            return {"map": {"fields": [
                {"key": k, "value": val(x)} for k, x in v.items()]}}
        if isinstance(v, (list, tuple)):
            return {"array": {"items": [val(x) for x in v]}}
        return {"raw_bytes": str(v).encode()}

    def one(ev):
        entries = [{"key": k, "value": val(v)} for k, v in ev.items()]
        if use_value:
            return {"value": {"map": {"fields": entries}}}
        return {"fields": entries}

    arr = {"logs": {"logs": [one(ev) for ev in events]}}
    return pb.encode(arr, _event_registry(), "event.EventArray")


def encode_native_metrics(metrics: list[dict]) -> bytes:
    """Fixture/test encoder: [{name, namespace, kind(0|1), counter|gauge,
    tags{..}, ts_us}] -> one native MetricArray frame."""
    from . import protobuf_py as pb

    ms = []
    for m in metrics:
        d = {"name": m["name"], "kind": int(m.get("kind", 0))}
        if m.get("namespace"):
            d["namespace"] = m["namespace"]
        if "counter" in m:
            d["counter"] = {"value": float(m["counter"])}
        if "gauge" in m:
            d["gauge"] = {"value": float(m["gauge"])}
        if m.get("tags"):
            d["tags_v1"] = [{"key": k, "value": v}
                            for k, v in m["tags"].items()]
        if m.get("ts_us") is not None:
            d["timestamp"] = {"seconds": m["ts_us"] // 1_000_000,
                              "nanos": (m["ts_us"] % 1_000_000) * 1000}
        ms.append(d)
    return pb.encode({"metrics": {"metrics": ms}}, _event_registry(),
                     "event.EventArray")


def parse_native_proto(col: Column) -> Column:
    """Binary native-codec frame (proto EventArray) -> array of decoded
    events at parse_native_json's surface (kind + log fields map +
    metric identity/value columns)."""
    def go(data):
        def one(b):
            if b is None:
                return None
            try:
                return decode_event_array(bytes(b))
            except Exception:
                return []
        return data.map(one)

    return pandas_udf(go, NATIVE_PROTO_SCHEMA)(col)
