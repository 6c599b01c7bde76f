"""Lumberjack (Beats) protocol frame decoder — the logstash source's wire
format (src/sources/logstash.rs:436-650; public spec:
logstash-plugins/logstash-input-beats PROTOCOL.md).

A connection's byte stream is a sequence of frames, each
`<version u8 '1'|'2'> <type u8>`:

- 'W' window-size: u32 (flow control — skipped, logstash.rs:500-509)
- 'A' ack:         u32 (writer-side only — skipped, logstash.rs:510-521)
- 'D' data:        u32 seq, u32 pair_count (0 = invalid, stop), then
                   pair_count of (u32 klen, key, u32 vlen, value) —
                   v1's key/value event (decode_data_frame,
                   logstash.rs:553-612)
- 'J' json:        u32 seq, u32 payload_size, JSON object payload —
                   v2 / Beats events (decode_json_frame)
- 'C' compressed:  u32 payload_size, zlib-deflated INNER FRAMES —
                   decompressed and walked recursively
                   (decode_compressed_frame)

All integers big-endian. Truncated/unknown input yields the frames
decoded so far (the reference's not-enough-data / error returns).

Like the dnstap/netflow/mmdb walkers, byte-level framing with nested
zlib has no JVM expression form, so this is the documented Arrow
pandas-UDF slow path: per-buffer decode is independent ->
embarrassingly parallel across rows/connections at 100 TB; payload
bytes never cross a shuffle.
"""

from __future__ import annotations

import json
import struct
import zlib

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

LUMBERJACK_SCHEMA = (
    "array<struct<protocol:int, seq:bigint, frame:string,"
    " fields:map<string,string>, json:string>>"
)


def _walk(b: bytes, out: list) -> None:
    i = 0
    n = len(b)
    while i + 2 <= n:
        version = b[i]
        if version not in (0x31, 0x32):  # '1' / '2'
            return
        proto = version - 0x30
        ftype = b[i + 1]
        i += 2
        if ftype in (0x57, 0x41):  # 'W' window / 'A' ack: skip u32
            if i + 4 > n:
                return
            i += 4
        elif ftype == 0x44:  # 'D' key/value data frame
            if i + 8 > n:
                return
            seq, pairs = struct.unpack_from(">II", b, i)
            i += 8
            if pairs == 0:
                return
            fields = {}
            for _ in range(pairs):
                if i + 4 > n:
                    return
                klen = struct.unpack_from(">I", b, i)[0]
                i += 4
                if i + klen > n:
                    return
                key = b[i:i + klen].decode("utf-8", errors="replace")
                i += klen
                if i + 4 > n:
                    return
                vlen = struct.unpack_from(">I", b, i)[0]
                i += 4
                if i + vlen > n:
                    return
                fields[key] = b[i:i + vlen].decode("utf-8", errors="replace")
                i += vlen
            out.append((proto, seq, "D", fields, None))
        elif ftype == 0x4A:  # 'J' json frame
            if i + 8 > n:
                return
            seq, size = struct.unpack_from(">II", b, i)
            i += 8
            if i + size > n:
                return
            payload = b[i:i + size]
            i += size
            try:
                json.loads(payload)
            except Exception:
                return  # reference: JsonFrameFailedDecode is a hard error
            out.append((proto, seq, "J", None,
                        payload.decode("utf-8", errors="replace")))
        elif ftype == 0x43:  # 'C' compressed frame: zlib inner frames
            if i + 4 > n:
                return
            size = struct.unpack_from(">I", b, i)[0]
            i += 4
            if i + size > n:
                return
            try:
                inner = zlib.decompress(b[i:i + size])
            except Exception:
                return
            i += size
            _walk(inner, out)
        else:
            return  # UnknownFrameType: hard error


def parse_lumberjack(col: Column) -> Column:
    """Decode a lumberjack byte stream into its event frames (see module
    docstring). Returns array<struct<protocol, seq, frame('D'|'J'),
    fields, json>> — window/ack frames are consumed silently, compressed
    frames are flattened into their inner events in order."""
    def decode(data):
        def one(buf):
            if buf is None:
                return None
            out: list = []
            _walk(bytes(buf), out)
            return out
        return data.map(one)

    return pandas_udf(decode, LUMBERJACK_SCHEMA)(col)


def encode_lumberjack_frames(events: list, compress: bool = False) -> bytes:
    """Test/fixture helper: build a spec-legal lumberjack byte stream
    from (proto, seq, kind, payload) tuples — kind 'D' takes a dict of
    str pairs, 'J' a JSON-serializable object; `compress` wraps the
    whole stream in one v2 'C' frame (driver-side only; the Spark-side
    builder in the contract query uses hex expressions + encode_zlib)."""
    out = b""
    for proto, seq, kind, payload in events:
        v = b"1" if proto == 1 else b"2"
        if kind == "D":
            body = struct.pack(">II", seq, len(payload))
            for k, val in payload.items():
                kb, vb = k.encode(), val.encode()
                body += struct.pack(">I", len(kb)) + kb
                body += struct.pack(">I", len(vb)) + vb
            out += v + b"D" + body
        elif kind == "J":
            pb = json.dumps(payload, separators=(",", ":")).encode()
            out += v + b"J" + struct.pack(">II", seq, len(pb)) + pb
        elif kind == "W":
            out += v + b"W" + struct.pack(">I", payload)
        elif kind == "A":
            out += v + b"A" + struct.pack(">I", payload)
    if compress:
        z = zlib.compress(out)
        return b"2C" + struct.pack(">I", len(z)) + z
    return out
