"""Datadog Agent metrics SKETCH intake wire format — the protobuf
SketchPayload the agent posts to /api/beta/sketches and the reference
decodes in src/sources/datadog_agent/metrics.rs (proto:
proto/vector/dd_metric.proto:59-94; the sketch math itself is the
public DDSketch paper + the agent's interpolation constants, mirrored
in lib/vector-core/src/metrics/ddsketch.rs:18-26,82-100 — the SAME
gamma = 1 + 2*(1/128) binary-exact family our operators.aggregate
sketch mode uses).

Layout (dd_metric.proto):

    SketchPayload { repeated Sketch sketches = 1; }
    Sketch { string metric = 1; string host = 2; repeated string tags = 4;
             repeated Dogsketch dogsketches = 7; }
    Dogsketch { int64 ts = 1; int64 cnt = 2; double min/max/avg/sum = 3..6;
                repeated sint32 k = 7; repeated uint32 n = 8; }

Decoded with the pure-Python protobuf walker (packed and unpacked
repeated scalars, zigzag sint32) against an in-process descriptor — no
protoc, no wheel. One output row per (sketch, dogsketch) at the
reference's distribution grain.

Scale: Arrow-batched per-request decode, scan-parallel, no shuffle (the
binary-wire slow-path family)."""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

# the agent's mapping constants (ddsketch.rs:18-20,87-89): binary-exact
DDSKETCH_GAMMA = 1.0 + 2.0 * (1.0 / 128.0)   # 1.015625 exactly
DDSKETCH_MIN_VALUE = 1.0e-9

DDSKETCH_SCHEMA = (
    "array<struct<metric:string, host:string, tags:array<string>,"
    " ts:bigint, cnt:bigint, min:double, max:double, avg:double,"
    " sum:double, k:array<int>, n:array<bigint>>>"
)


@lru_cache(maxsize=1)
def _dd_registry() -> dict:
    from . import protobuf_py as pb

    fd = pb.field_dict
    desc = pb.build_descriptor_set([{
        "name": "dd_metric.proto", "package": "dd", "syntax": "proto3",
        "message_type": [
            {"name": "SketchPayload", "field": [
                fd("sketches", 1, pb._T_MESSAGE, repeated=True,
                   type_name=".dd.Sketch")]},
            {"name": "Sketch", "field": [
                fd("metric", 1, pb._T_STRING),
                fd("host", 2, pb._T_STRING),
                fd("tags", 4, pb._T_STRING, repeated=True),
                fd("dogsketches", 7, pb._T_MESSAGE, repeated=True,
                   type_name=".dd.Dogsketch")]},
            {"name": "Dogsketch", "field": [
                fd("ts", 1, pb._T_INT64),
                fd("cnt", 2, pb._T_INT64),
                fd("min", 3, pb._T_DOUBLE),
                fd("max", 4, pb._T_DOUBLE),
                fd("avg", 5, pb._T_DOUBLE),
                fd("sum", 6, pb._T_DOUBLE),
                fd("k", 7, pb._T_SINT32, repeated=True),
                fd("n", 8, pb._T_UINT32, repeated=True)]},
        ],
    }])
    return pb.compile_descriptor_set(desc)


def decode_sketch_payload(body: bytes) -> list[tuple]:
    """One SketchPayload -> (metric, host, tags, ts, cnt, min, max, avg,
    sum, k[], n[]) tuples, one per dogsketch (shared decode core)."""
    from . import protobuf_py as pb

    msg = pb.decode(body, _dd_registry(), "dd.SketchPayload")
    out = []
    for sk in (msg.get("sketches") or []):
        tags = list(sk.get("tags") or [])
        for d in (sk.get("dogsketches") or []):
            out.append((
                sk.get("metric"), sk.get("host"), tags,
                int(d.get("ts") or 0), int(d.get("cnt") or 0),
                float(d.get("min") or 0.0), float(d.get("max") or 0.0),
                float(d.get("avg") or 0.0), float(d.get("sum") or 0.0),
                [int(x) for x in (d.get("k") or [])],
                [int(x) for x in (d.get("n") or [])],
            ))
    return out


def encode_sketch_payload(sketches: list[dict]) -> bytes:
    """Fixture/test encoder: [{metric, host, tags[], dogsketches:[{ts,
    cnt, min, max, avg, sum, k[], n[]}]}] -> SketchPayload bytes."""
    from . import protobuf_py as pb

    return pb.encode({"sketches": sketches}, _dd_registry(),
                     "dd.SketchPayload")


def parse_sketch_payload(col: Column) -> Column:
    """Binary agent sketch body -> array of dogsketch rows (see module
    docstring). Malformed bodies -> no events (the source 400s)."""
    def go(data):
        def one(b):
            if b is None:
                return None
            try:
                return decode_sketch_payload(bytes(b))
            except Exception:
                return []
        return data.map(one)

    return pandas_udf(go, DDSKETCH_SCHEMA)(col)


def sketch_buckets(df, payload_col: str = "body", extra_cols: tuple = ()):
    """Explode decoded SketchPayloads to MERGEABLE bucket grain:
    one row per (metric, host, bucket key, count) — exactly the level-1
    state of operators.aggregate.aggregate_sketch, because the agent's
    key mapping (gamma = 1+2/128, norm bias) IS that operator's mapping.
    groupBy(metric, k).sum(n) over this output is the server-side
    AgentDDSketch::merge (ddsketch.rs:710-717): bucket counts add,
    loss-free, and partial aggregation does the client-side merge
    map-side. At 100 TB the shuffle carries (series x occupied-bucket)
    rows only — never raw samples."""
    from pyspark.sql import functions as F

    ex = df.select(
        *extra_cols,
        F.explode(parse_sketch_payload(F.col(payload_col))).alias("r"),
    )
    return ex.select(
        *extra_cols,
        F.col("r.metric").alias("metric"),
        F.col("r.host").alias("host"),
        F.col("r.ts").alias("ts_s"),
        F.explode(F.arrays_zip(F.col("r.k"), F.col("r.n"))).alias("b"),
    ).select(
        *extra_cols, "metric", "host", "ts_s",
        F.col("b.k").alias("k"),
        F.col("b.n").alias("bucket_n"),
    )
