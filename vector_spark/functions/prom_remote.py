"""Prometheus remote-write wire format: snappy-compressed protobuf
WriteRequest bodies (the reference's prometheus remote_write SOURCE,
src/sources/prometheus/remote_write.rs, and remote_write SINK,
src/sinks/prometheus/remote_write/ — transport out of scope per SURVEY
§2.4, the FORMAT is not).

Message layout per the public prompb/remote.proto + prompb/types.proto:

    WriteRequest { repeated TimeSeries timeseries = 1; }
    TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
    Label        { string name = 1; string value = 2; }
    Sample       { double value = 1; int64 timestamp = 2; }  // epoch ms

The body is RAW-snappy compressed (not the framed streaming format) —
decode_snappy / encode_snappy (C wheel when present, spec-direct
snappy_py otherwise) feed the pure-Python protobuf walker
(protobuf_py.py) driven by a descriptor set built in-process with
build_descriptor_set — the same registry machinery the codec_protobuf
contract pins against protobuf-java.

Like the reference's source, each decoded sample becomes one event: the
`__name__` label is the metric name, remaining labels are tags.

Scale: Arrow-batched per-request decode — requests are independent, so
the map is scan-parallel and nothing here shuffles; the documented
Python slow path for binary wire formats.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

REMOTE_WRITE_SCHEMA = (
    "array<struct<name:string, labels:map<string,string>,"
    " value:double, ts_ms:bigint>>"
)


@lru_cache(maxsize=1)
def _prompb_registry() -> dict:
    from . import protobuf_py as pb

    fd = pb.field_dict
    desc = pb.build_descriptor_set([{
        "name": "prompb.proto", "package": "prometheus", "syntax": "proto3",
        "message_type": [
            {"name": "WriteRequest", "field": [
                fd("timeseries", 1, pb._T_MESSAGE, repeated=True,
                   type_name=".prometheus.TimeSeries"),
            ]},
            {"name": "TimeSeries", "field": [
                fd("labels", 1, pb._T_MESSAGE, repeated=True,
                   type_name=".prometheus.Label"),
                fd("samples", 2, pb._T_MESSAGE, repeated=True,
                   type_name=".prometheus.Sample"),
            ]},
            {"name": "Label", "field": [
                fd("name", 1, pb._T_STRING), fd("value", 2, pb._T_STRING),
            ]},
            {"name": "Sample", "field": [
                fd("value", 1, pb._T_DOUBLE), fd("timestamp", 2, pb._T_INT64),
            ]},
        ],
    }])
    return pb.compile_descriptor_set(desc)


def _snappy():
    try:
        import snappy  # C wheel, if present

        return snappy.compress, snappy.uncompress
    except Exception:
        from . import snappy_py

        return snappy_py.compress, snappy_py.decompress


def decode_write_request(body: bytes) -> list[tuple]:
    """Driver/executor-side decode of one snappy+proto body into
    (name, labels, value, ts_ms) tuples (test + UDF shared core)."""
    from . import protobuf_py as pb

    _, uncompress = _snappy()
    msg = pb.decode(uncompress(body), _prompb_registry(),
                    "prometheus.WriteRequest")
    out = []
    for ts in msg.get("timeseries", []):
        labels = {l.get("name", ""): l.get("value", "")
                  for l in ts.get("labels", [])}
        name = labels.pop("__name__", None)
        for s in ts.get("samples", []):
            out.append((name, dict(labels),
                        float(s.get("value", 0.0)),
                        int(s.get("timestamp", 0))))
    return out


def encode_write_request(series: list[tuple]) -> bytes:
    """Inverse (the sink side): [(name, labels, [(value, ts_ms), ...])]
    -> snappy(WriteRequest). Labels are emitted sorted with __name__
    first, the reference sink's stable ordering."""
    from . import protobuf_py as pb

    compress, _ = _snappy()
    tss = []
    for name, labels, samples in series:
        lab = [{"name": "__name__", "value": name}] + [
            {"name": k, "value": v} for k, v in sorted(labels.items())
        ]
        tss.append({
            "labels": lab,
            "samples": [{"value": float(v), "timestamp": int(t)}
                        for v, t in samples],
        })
    return compress(
        pb.encode({"timeseries": tss}, _prompb_registry(),
                  "prometheus.WriteRequest")
    )


def parse_prometheus_remote_write(col: Column) -> Column:
    """Binary remote-write body -> array of flattened samples (see
    module docstring): one struct per sample, `__name__` lifted out as
    the metric name, remaining labels as tags."""
    def go(data):
        def one(b):
            if b is None:
                return None
            try:
                return decode_write_request(bytes(b))
            except Exception:
                return []  # malformed body -> no events (source 400s)
        return data.map(one)

    return pandas_udf(go, REMOTE_WRITE_SCHEMA)(col)
