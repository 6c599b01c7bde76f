"""Pure-Python Snappy raw-block codec (spec-direct, zero dependencies).

The reference ships snappy for sink payload compression and source
decompression (Vector: `src/sinks/util/buffer/compression.rs` Snappy
variant; `lib/codecs` wires it through the decoder stack). No snappy
wheel exists in this sandbox, but the *format* is public and small
(google/snappy `format_description.txt`): a varint uncompressed-length
preamble followed by literal / copy elements. This module implements
both directions against that spec so the codec path actually EXECUTES
here — Arrow-batched executor-side via functions/compress.py, with the
JVM's real snappy-java (on Spark's classpath) used driver-side in tests
as cross-library ground truth.

Scale note: pure-Python byte-walking is the documented slow-path
exemption (same family as dnstap/netflow/mmdb walkers). compress.py
prefers the C wheel when present; this fallback keeps the path
executable and correct, ~1-5 MB/s/core, embarrassingly parallel.

Format (raw snappy, not the framed streaming format):
- preamble: uncompressed length, little-endian varint
- tag byte, low 2 bits select the element:
  00 literal  — len-1 in tag>>2 if <60, else (tag>>2)-59 LE bytes hold len-1
  01 copy     — 1-byte offset: len = ((tag>>2)&7)+4, off = ((tag>>5)<<8)|next
  10 copy     — 2-byte LE offset: len = (tag>>2)+1
  11 copy     — 4-byte LE offset: len = (tag>>2)+1
Copies may overlap their output (off < len) — resolved byte-wise.
"""

from __future__ import annotations

_MAX_OFFSET_2B = 0xFFFF


class SnappyError(ValueError):
    pass


def _write_varint(n: int, out: bytearray) -> None:
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _read_varint(b: bytes, i: int) -> tuple[int, int]:
    out, shift = 0, 0
    while True:
        if i >= len(b):
            raise SnappyError("truncated varint preamble")
        x = b[i]
        i += 1
        out |= (x & 0x7F) << shift
        if not x & 0x80:
            return out, i
        shift += 7
        if shift > 35:
            raise SnappyError("varint too long")


def _emit_literal(data: bytes, start: int, end: int, out: bytearray) -> None:
    n = end - start
    while n > 0:
        # one literal element carries at most what 4 length bytes express;
        # in practice chunk at 2^24 to keep the length field at <=3 bytes
        chunk = min(n, 1 << 24)
        ln = chunk - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < 1 << 8:
            out.append(60 << 2)
            out.append(ln)
        elif ln < 1 << 16:
            out.append(61 << 2)
            out += ln.to_bytes(2, "little")
        else:
            out.append(62 << 2)
            out += ln.to_bytes(3, "little")
        out += data[start : start + chunk]
        start += chunk
        n -= chunk


def _emit_copy(offset: int, length: int, out: bytearray) -> None:
    """Emit one match as 2-byte-offset copy elements (always legal for
    offset <= 65535; every decoder must support it). Lengths chunk at 64,
    never leaving a sub-4-byte remainder (shorten the chunk instead, per
    the canonical compressor's emitter)."""
    while length > 0:
        if length > 64:
            chunk = 60 if length - 64 < 4 else 64
        else:
            chunk = length
        out.append(((chunk - 1) << 2) | 2)
        out += offset.to_bytes(2, "little")
        length -= chunk


def compress(data: bytes) -> bytes:
    """Greedy hash-match compressor (4-byte anchors, 2-byte-offset copies,
    miss-skip acceleration for incompressible input). Output is verified
    against snappy-java's decompressor in tests."""
    data = bytes(data)
    out = bytearray()
    _write_varint(len(data), out)
    n = len(data)
    if n < 4:
        if n:
            _emit_literal(data, 0, n, out)
        return bytes(out)

    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    skip = 32  # snappy's acceleration: step grows while input is incompressible
    limit = n - 4
    while i <= limit:
        key = data[i : i + 4]
        j = table.get(key, -1)
        table[key] = i
        if j >= 0 and i - j <= _MAX_OFFSET_2B and data[j : j + 4] == key:
            # extend the match forward
            m = i + 4
            k = j + 4
            while m < n and data[m] == data[k]:
                m += 1
                k += 1
            if lit_start < i:
                _emit_literal(data, lit_start, i, out)
            _emit_copy(i - j, m - i, out)
            # seed the table sparsely inside the match so later data can
            # still find it, without O(len) dict churn on long runs
            for p in range(i + 1, min(m, i + 1 + 16)):
                if p <= limit:
                    table[data[p : p + 4]] = p
            i = m
            lit_start = m
            skip = 32
        else:
            i += skip >> 5
            skip += 1
    if lit_start < n:
        _emit_literal(data, lit_start, n, out)
    return bytes(out)


def decompress(data: bytes) -> bytes:
    data = bytes(data)
    expected, i = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while i < n:
        tag = data[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if i + nb > n:
                    raise SnappyError("truncated literal length")
                ln = int.from_bytes(data[i : i + nb], "little")
                i += nb
            ln += 1
            if i + ln > n:
                raise SnappyError("truncated literal body")
            out += data[i : i + ln]
            i += ln
            continue
        if kind == 1:
            if i >= n:
                raise SnappyError("truncated 1-byte-offset copy")
            length = ((tag >> 2) & 7) + 4
            offset = ((tag >> 5) << 8) | data[i]
            i += 1
        elif kind == 2:
            if i + 2 > n:
                raise SnappyError("truncated 2-byte-offset copy")
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[i : i + 2], "little")
            i += 2
        else:
            if i + 4 > n:
                raise SnappyError("truncated 4-byte-offset copy")
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[i : i + 4], "little")
            i += 4
        if offset == 0 or offset > len(out):
            raise SnappyError(f"copy offset {offset} out of range at {len(out)}")
        if offset >= length:
            start = len(out) - offset
            out += out[start : start + length]
        else:  # overlapping copy: extend byte-wise (RLE-style)
            start = len(out) - offset
            for k in range(length):
                out.append(out[start + k])
    if len(out) != expected:
        raise SnappyError(f"length mismatch: preamble {expected}, got {len(out)}")
    return bytes(out)


# --------------------------------------------------------------------------
# framed (streaming) format — google/snappy framing_format.txt: a stream
# identifier chunk then compressed/uncompressed chunks, each carrying a
# masked CRC32C of its UNCOMPRESSED payload. This is the on-the-wire form
# sources/sinks exchange (the raw block format above has no self-framing).

_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"
_CHUNK_MAX = 65536

_CRC32C_POLY = 0x82F63B78
_crc32c_table: list[int] = []


def _crc32c(data: bytes) -> int:
    if not _crc32c_table:
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ _CRC32C_POLY if c & 1 else c >> 1
            _crc32c_table.append(c)
    crc = 0xFFFFFFFF
    for b in data:
        crc = _crc32c_table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _mask_crc(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def compress_framed(data: bytes) -> bytes:
    """Framed-format encoder: 64 KiB chunks, compressed form when it is
    smaller, uncompressed chunk otherwise (the spec's rule)."""
    data = bytes(data)
    out = bytearray(_STREAM_ID)
    # empty input = stream identifier only: zero-payload chunks are
    # rejected by reference decoders (snappy-java: "invalid length: 4")
    for i in range(0, len(data), _CHUNK_MAX):
        chunk = data[i : i + _CHUNK_MAX]
        crc = _mask_crc(_crc32c(chunk)).to_bytes(4, "little")
        comp = compress(chunk)
        if len(comp) < len(chunk):
            body = crc + comp
            out.append(0x00)
        else:
            body = crc + chunk
            out.append(0x01)
        out += len(body).to_bytes(3, "little")
        out += body
    return bytes(out)


def decompress_framed(data: bytes) -> bytes:
    data = bytes(data)
    if not data.startswith(_STREAM_ID):
        raise SnappyError("missing snappy stream identifier")
    out = bytearray()
    i = len(_STREAM_ID)
    n = len(data)
    while i < n:
        if i + 4 > n:
            raise SnappyError("truncated chunk header")
        ctype = data[i]
        ln = int.from_bytes(data[i + 1 : i + 4], "little")
        i += 4
        body = data[i : i + ln]
        if len(body) < ln:
            raise SnappyError("truncated chunk body")
        i += ln
        if ctype == 0xFF:  # repeated stream identifier
            continue
        if 0x80 <= ctype <= 0xFE:  # skippable
            continue
        if ctype == 0x00:
            payload = decompress(body[4:])
        elif ctype == 0x01:
            payload = body[4:]
        else:
            raise SnappyError(f"unskippable reserved chunk type {ctype:#x}")
        want = int.from_bytes(body[:4], "little")
        if _mask_crc(_crc32c(payload)) != want:
            raise SnappyError("chunk CRC32C mismatch")
        out += payload
    return bytes(out)
