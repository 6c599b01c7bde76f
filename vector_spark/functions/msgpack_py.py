"""Spec-direct MessagePack decoder (+ a deterministic encoder for tests).

The reference's fluent source speaks the Fluent Forward protocol, which is
MessagePack on the wire (src/sources/fluent/ — its codec decodes
msgpack-rs values; the framing above it is the Forward spec). The sandbox
has no msgpack wheel, so this is a from-scratch walker against the PUBLIC
format spec (github.com/msgpack/msgpack/blob/master/spec.md), in the
house tradition of the dnstap/netflow/zstd walkers (dnstap.py:55).

Covers the full type matrix: nil/bool, positive/negative fixint,
(fix)str 8/16/32, bin 8/16/32, (fix)array 16/32, (fix)map 16/32,
float 32/64, uint/int 8-64, and ext/fixext — including the Fluent
EventTime extension (type 0: 4-byte seconds + 4-byte nanoseconds,
per the Forward spec's EventTime section).

Decoded ext values surface as ``Ext(type, data)``; EventTime helpers
convert type-0 ext to (sec, nsec). All integers are Python ints, str is
UTF-8 (errors='replace' — wire data is untrusted), bin is bytes.
"""

from __future__ import annotations

import struct
from typing import NamedTuple


class Ext(NamedTuple):
    type: int
    data: bytes


def event_time(ext: "Ext") -> tuple[int, int]:
    """Fluent EventTime ext (type 0): big-endian u32 seconds + u32 nanos."""
    if ext.type != 0 or len(ext.data) != 8:
        raise ValueError("not an EventTime ext")
    sec, nsec = struct.unpack(">II", ext.data)
    return sec, nsec


def decode(buf: bytes, pos: int = 0):
    """Decode ONE msgpack value at `pos`; returns (value, next_pos).
    Raises ValueError on truncation or a reserved byte (0xc1)."""
    if pos >= len(buf):
        raise ValueError("truncated msgpack")
    b = buf[pos]
    pos += 1
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:  # fixmap
        return _map(buf, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:  # fixarray
        return _array(buf, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:  # fixstr
        return _str(buf, pos, b & 0x1F)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b == 0xC4:  # bin8
        return _bin(buf, pos + 1, _u(buf, pos, 1))
    if b == 0xC5:
        return _bin(buf, pos + 2, _u(buf, pos, 2))
    if b == 0xC6:
        return _bin(buf, pos + 4, _u(buf, pos, 4))
    if b == 0xC7:  # ext8
        n = _u(buf, pos, 1)
        return _ext(buf, pos + 1, n)
    if b == 0xC8:
        n = _u(buf, pos, 2)
        return _ext(buf, pos + 2, n)
    if b == 0xC9:
        n = _u(buf, pos, 4)
        return _ext(buf, pos + 4, n)
    if b == 0xCA:
        _need(buf, pos, 4)
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    if b == 0xCB:
        _need(buf, pos, 8)
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if 0xCC <= b <= 0xCF:  # uint 8/16/32/64
        n = 1 << (b - 0xCC)
        return _u(buf, pos, n), pos + n
    if 0xD0 <= b <= 0xD3:  # int 8/16/32/64
        n = 1 << (b - 0xD0)
        v = _u(buf, pos, n)
        bits = 8 * n
        return (v - (1 << bits) if v >= 1 << (bits - 1) else v), pos + n
    if 0xD4 <= b <= 0xD8:  # fixext 1/2/4/8/16
        return _ext(buf, pos, 1 << (b - 0xD4))
    if b == 0xD9:
        return _str(buf, pos + 1, _u(buf, pos, 1))
    if b == 0xDA:
        return _str(buf, pos + 2, _u(buf, pos, 2))
    if b == 0xDB:
        return _str(buf, pos + 4, _u(buf, pos, 4))
    if b == 0xDC:
        return _array(buf, pos + 2, _u(buf, pos, 2))
    if b == 0xDD:
        return _array(buf, pos + 4, _u(buf, pos, 4))
    if b == 0xDE:
        return _map(buf, pos + 2, _u(buf, pos, 2))
    if b == 0xDF:
        return _map(buf, pos + 4, _u(buf, pos, 4))
    raise ValueError(f"reserved/unknown msgpack byte 0x{b:02x}")


def decode_stream(buf: bytes) -> list:
    """Decode back-to-back msgpack values until the buffer ends (the
    PackedForward entry-stream shape). A malformed tail yields the values
    parsed so far (the frame_warc convention)."""
    out, pos = [], 0
    while pos < len(buf):
        try:
            v, pos = decode(buf, pos)
        except ValueError:
            break
        out.append(v)
    return out


def _need(buf: bytes, pos: int, n: int) -> None:
    if pos + n > len(buf):
        raise ValueError("truncated msgpack")


def _u(buf: bytes, pos: int, n: int) -> int:
    _need(buf, pos, n)
    return int.from_bytes(buf[pos:pos + n], "big")


def _str(buf: bytes, pos: int, n: int):
    _need(buf, pos, n)
    return buf[pos:pos + n].decode("utf-8", errors="replace"), pos + n


def _bin(buf: bytes, pos: int, n: int):
    _need(buf, pos, n)
    return bytes(buf[pos:pos + n]), pos + n


def _ext(buf: bytes, pos: int, n: int):
    _need(buf, pos, 1 + n)
    t = buf[pos]
    t = t - 0x100 if t >= 0x80 else t
    return Ext(t, bytes(buf[pos + 1:pos + 1 + n])), pos + 1 + n


def _array(buf: bytes, pos: int, n: int):
    out = []
    for _ in range(n):
        v, pos = decode(buf, pos)
        out.append(v)
    return out, pos


def _map(buf: bytes, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = decode(buf, pos)
        v, pos = decode(buf, pos)
        out[k] = v
    return out, pos


def encode(v) -> bytes:
    """Deterministic encoder (tests/fixtures; smallest-width integers,
    insertion-order maps, float -> float64)."""
    if v is None:
        return b"\xc0"
    if v is True:
        return b"\xc3"
    if v is False:
        return b"\xc2"
    if isinstance(v, Ext):
        body = bytes([v.type & 0xFF]) + v.data
        fix = {1: 0xD4, 2: 0xD5, 4: 0xD6, 8: 0xD7, 16: 0xD8}.get(len(v.data))
        if fix:
            return bytes([fix]) + body
        if len(v.data) < 256:
            return bytes([0xC7, len(v.data)]) + body
        return b"\xc8" + struct.pack(">H", len(v.data)) + body
    if isinstance(v, int):
        if 0 <= v <= 0x7F:
            return bytes([v])
        if -32 <= v < 0:
            return bytes([v & 0xFF])
        if v >= 0:
            for code, n in ((0xCC, 1), (0xCD, 2), (0xCE, 4), (0xCF, 8)):
                if v < 1 << (8 * n):
                    return bytes([code]) + v.to_bytes(n, "big")
            raise OverflowError(v)
        for code, n in ((0xD0, 1), (0xD1, 2), (0xD2, 4), (0xD3, 8)):
            if -(1 << (8 * n - 1)) <= v:
                return bytes([code]) + (v & ((1 << 8 * n) - 1)).to_bytes(n, "big")
        raise OverflowError(v)
    if isinstance(v, float):
        return b"\xcb" + struct.pack(">d", v)
    if isinstance(v, str):
        b = v.encode("utf-8")
        if len(b) <= 31:
            return bytes([0xA0 | len(b)]) + b
        if len(b) < 256:
            return bytes([0xD9, len(b)]) + b
        return b"\xda" + struct.pack(">H", len(b)) + b
    if isinstance(v, bytes):
        if len(v) < 256:
            return bytes([0xC4, len(v)]) + v
        return b"\xc5" + struct.pack(">H", len(v)) + v
    if isinstance(v, (list, tuple)):
        if len(v) <= 15:
            head = bytes([0x90 | len(v)])
        else:
            head = b"\xdc" + struct.pack(">H", len(v))
        return head + b"".join(encode(x) for x in v)
    if isinstance(v, dict):
        if len(v) <= 15:
            head = bytes([0x80 | len(v)])
        else:
            head = b"\xde" + struct.pack(">H", len(v))
        return head + b"".join(encode(k) + encode(x) for k, x in v.items())
    raise TypeError(f"cannot msgpack-encode {type(v)}")
