"""MaxMind DB (.mmdb) binary format — reader, tree walker, fixture writer.

The reference reads GeoLite2/GeoIP2 ``.mmdb`` artifacts through the maxminddb
crate (src/enrichment_tables/geoip.rs:1-509 — City/ISP/ConnectionType
lookups; src/enrichment_tables/mmdb.rs:1-274 — generic mmdb table): one
longest-prefix binary-search-tree walk per event IP. This module implements
the public MaxMind DB file format spec (maxmind.github.io/MaxMind-DB/)
directly so a user can point the engine at the same artifact:

- ``read_metadata`` / ``mmdb_lookup`` — per-IP tree walk, the faithful
  analogue of the reference's per-event lookup (used as the property-test
  reference model);
- ``mmdb_to_ranges`` — full-tree DFS enumeration of every IPv4 leaf into
  ``(ip_start, ip_end, prefix_len, data)`` rows;
- ``parse_mmdb`` — the Spark surface: an Arrow-batched ``mapInPandas``
  walker (the dnstap.py pattern — Python only because the JVM has no mmdb
  expression) that explodes ``.mmdb`` blobs into the RANGE-DIM rows that
  ``operators.enrich.enrich_ip_range`` consumes;
- ``build_mmdb`` — a deterministic spec-compliant writer used to build test
  fixtures (24/28/32-bit records, whole-record dedupe, pointer-deduped
  strings — so fixtures exercise the pointer decode path for real).

Scale: an .mmdb artifact is a dim-side object (GeoLite2-City ≈ 60 MB); the
walk is one task per artifact and its exploded output becomes a broadcast
dim — the 100 TB fact side never touches Python. The enumeration is linear
in node_count (each node visited once, data decoded once per distinct
record via an offset cache).
"""

from __future__ import annotations

import json
import struct
from typing import Iterator

METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
DATA_SEPARATOR = b"\x00" * 16

# ---------------------------------------------------------------------------
# data-section decoder (spec §"Data Section")
# ---------------------------------------------------------------------------


def _decode(buf: bytes, offset: int, data_start: int) -> tuple[object, int]:
    """Decode one field at ``offset``; returns (value, next_offset).
    ``data_start`` anchors pointer resolution (pointers are relative to the
    start of the data section)."""
    ctrl = buf[offset]
    offset += 1
    typ = ctrl >> 5
    if typ == 0:  # extended type: real type = 7 + next byte
        typ = 7 + buf[offset]
        offset += 1
    if typ == 1:  # pointer
        ss = (ctrl >> 3) & 0x3
        v = ctrl & 0x7
        if ss == 0:
            p = (v << 8) | buf[offset]
            offset += 1
        elif ss == 1:
            p = ((v << 16) | (buf[offset] << 8) | buf[offset + 1]) + 2048
            offset += 2
        elif ss == 2:
            p = ((v << 24) | int.from_bytes(buf[offset : offset + 3], "big")) + 526336
            offset += 3
        else:
            p = int.from_bytes(buf[offset : offset + 4], "big")
            offset += 4
        value, _ = _decode(buf, data_start + p, data_start)
        return value, offset
    size = ctrl & 0x1F
    if size == 29:
        size = 29 + buf[offset]
        offset += 1
    elif size == 30:
        size = 285 + int.from_bytes(buf[offset : offset + 2], "big")
        offset += 2
    elif size == 31:
        size = 65821 + int.from_bytes(buf[offset : offset + 3], "big")
        offset += 3
    if typ == 2:  # UTF-8 string
        return buf[offset : offset + size].decode("utf-8"), offset + size
    if typ == 3:  # double
        return struct.unpack(">d", buf[offset : offset + 8])[0], offset + 8
    if typ == 4:  # bytes
        return bytes(buf[offset : offset + size]), offset + size
    if typ in (5, 6, 9, 10):  # uint16 / uint32 / uint64 / uint128
        return int.from_bytes(buf[offset : offset + size], "big"), offset + size
    if typ == 7:  # map: size = number of key/value pairs
        out = {}
        for _ in range(size):
            key, offset = _decode(buf, offset, data_start)
            out[key], offset = _decode(buf, offset, data_start)
        return out, offset
    if typ == 8:  # int32: left-zero-padded big-endian two's complement
        raw = buf[offset : offset + size]
        return int.from_bytes(raw.rjust(4, b"\x00"), "big", signed=True), offset + size
    if typ == 11:  # array
        out = []
        for _ in range(size):
            v, offset = _decode(buf, offset, data_start)
            out.append(v)
        return out, offset
    if typ == 14:  # boolean: value lives in the size bits, no payload
        return size != 0, offset
    if typ == 15:  # float
        return struct.unpack(">f", buf[offset : offset + 4])[0], offset + 4
    if typ == 13:  # end marker
        return None, offset
    raise ValueError(f"mmdb: unsupported data type {typ} at offset {offset - 1}")


def read_metadata(buf: bytes) -> dict:
    """Parse the metadata map (after the LAST marker occurrence, per spec:
    the marker may legitimately appear inside the data section)."""
    i = buf.rfind(METADATA_MARKER)
    if i < 0:
        raise ValueError("mmdb: metadata marker not found")
    start = i + len(METADATA_MARKER)
    meta, _ = _decode(buf, start, start)
    if not isinstance(meta, dict) or "node_count" not in meta:
        raise ValueError("mmdb: malformed metadata map")
    return meta


# ---------------------------------------------------------------------------
# search tree (spec §"Binary Search Tree Section")
# ---------------------------------------------------------------------------


def _record_reader(buf: bytes, record_size: int):
    """Returns read(node, side) -> record value for 24/28/32-bit layouts."""
    node_bytes = record_size * 2 // 8

    if record_size == 24:

        def read(node: int, side: int) -> int:
            o = node * 6 + side * 3
            return int.from_bytes(buf[o : o + 3], "big")

    elif record_size == 28:

        def read(node: int, side: int) -> int:
            o = node * 7
            if side == 0:
                return ((buf[o + 3] & 0xF0) << 20) | int.from_bytes(buf[o : o + 3], "big")
            return ((buf[o + 3] & 0x0F) << 24) | int.from_bytes(buf[o + 4 : o + 7], "big")

    elif record_size == 32:

        def read(node: int, side: int) -> int:
            o = node * 8 + side * 4
            return int.from_bytes(buf[o : o + 4], "big")

    else:
        raise ValueError(f"mmdb: unsupported record_size {record_size}")
    return read, node_bytes


def _ipv4_root(read, node_count: int, ip_version: int) -> int:
    """IPv4 subtree root: node 0 for v4 databases; for v6 databases IPv4 is
    rooted 96 zero-bit edges down (::a.b.c.d convention, as maxminddb's
    ipv4_start)."""
    node = 0
    if ip_version == 6:
        for _ in range(96):
            if node >= node_count:
                break
            node = read(node, 0)
    return node


def mmdb_lookup(buf: bytes, ip: int) -> dict | None:
    """Point lookup of one IPv4 address (uint32) — a per-IP bit walk,
    independent of the DFS enumeration below (this is the property-test
    reference model, mirroring the reference's per-event lookup)."""
    meta = read_metadata(buf)
    node_count = meta["node_count"]
    read, node_bytes = _record_reader(buf, meta["record_size"])
    data_start = node_count * node_bytes + 16
    node = _ipv4_root(read, node_count, meta.get("ip_version", 4))
    for depth in range(32):
        if node >= node_count:
            break
        node = read(node, (ip >> (31 - depth)) & 1)
    if node == node_count:
        return None  # spec: record == node_count means "no data"
    if node < node_count:
        raise ValueError("mmdb: tree walk did not terminate")
    value, _ = _decode(buf, node - node_count + node_count * node_bytes, data_start)
    return value


def mmdb_to_ranges6(buf: bytes) -> Iterator[tuple[int, int, int, dict]]:
    """Enumerate every leaf of an ip_version=6 database over the FULL
    128-bit space: yields (ip_start, ip_end, prefix_len, data) with uint128
    bounds in ascending order (the ::/96 IPv4-mapped region appears as
    ordinary v6 ranges). Same linear walk as mmdb_to_ranges; recursion
    depth <= 128."""
    meta = read_metadata(buf)
    if meta.get("ip_version", 4) != 6:
        raise ValueError("mmdb_to_ranges6: not an ip_version=6 database")
    node_count = meta["node_count"]
    read, node_bytes = _record_reader(buf, meta["record_size"])
    tree_size = node_count * node_bytes
    data_start = tree_size + 16
    data_cache: dict[int, dict] = {}

    def walk(node: int, prefix: int, depth: int):
        for side in (0, 1):
            rec = read(node, side)
            child_prefix = (prefix << 1) | side
            if rec < node_count:
                # an internal node AT depth 128 would put leaves past the
                # address width — reject before recursing (>=, not >)
                if depth + 1 >= 128:
                    raise ValueError("mmdb: IPv6 tree deeper than 128 bits")
                yield from walk(rec, child_prefix, depth + 1)
            elif rec == node_count:
                continue
            else:
                off = rec - node_count + tree_size
                if off not in data_cache:
                    data_cache[off], _ = _decode(buf, off, data_start)
                plen = depth + 1
                lo = child_prefix << (128 - plen)
                yield lo, lo | ((1 << (128 - plen)) - 1), plen, data_cache[off]

    yield from walk(0, 0, 0)


def mmdb_to_ranges(buf: bytes) -> Iterator[tuple[int, int, int, dict]]:
    """Enumerate every IPv4 leaf: yields (ip_start, ip_end, prefix_len,
    data) with uint32 bounds, in ascending ip_start order (DFS, left first).
    Each node is visited once; data records decode once per distinct offset
    (cache) — linear in the artifact, not in the address space."""
    meta = read_metadata(buf)
    node_count = meta["node_count"]
    read, node_bytes = _record_reader(buf, meta["record_size"])
    tree_size = node_count * node_bytes
    data_start = tree_size + 16
    data_cache: dict[int, dict] = {}
    root = _ipv4_root(read, node_count, meta.get("ip_version", 4))
    if root >= node_count:
        return

    # recursive in-order DFS — recursion depth is bounded by tree DEPTH
    # (<=32 for the v4 subtree), never by node_count
    def walk(node: int, prefix: int, depth: int):
        for side in (0, 1):
            rec = read(node, side)
            child_prefix = (prefix << 1) | side
            if rec < node_count:
                if depth + 1 >= 32:
                    raise ValueError("mmdb: IPv4 tree deeper than 32 bits")
                yield from walk(rec, child_prefix, depth + 1)
            elif rec == node_count:
                continue  # empty branch
            else:
                off = rec - node_count + tree_size
                if off not in data_cache:
                    data_cache[off], _ = _decode(buf, off, data_start)
                plen = depth + 1
                lo = child_prefix << (32 - plen)
                yield lo, lo | ((1 << (32 - plen)) - 1), plen, data_cache[off]

    yield from walk(root, 0, 0)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

MMDB_RANGE_SCHEMA = "ip_start long, ip_end long, prefix_len int, data_json string"


def parse_mmdb(df, bin_col: str = "content"):
    """Explode a DataFrame of ``.mmdb`` blobs (binary column) into range-dim
    rows ``(ip_start, ip_end, prefix_len, data_json)`` — one output row per
    IPv4 tree leaf, ``data_json`` the record as canonical sorted-key JSON.
    Arrow-batched mapInPandas walker (dnstap.py pattern): Python is
    justified because no JVM expression reads the mmdb wire format; the
    artifact is dim-sized, so this never touches the fact table. Feed the
    result (after extracting typed columns with get_json_object / from_json)
    to ``enrich_ip_range(..., numeric=True)``."""
    import pandas as pd

    def walk(batches):
        for pdf in batches:
            rows = []
            for blob in pdf[bin_col]:
                if blob is None:
                    continue
                for lo, hi, plen, data in mmdb_to_ranges(bytes(blob)):
                    rows.append((lo, hi, plen, json.dumps(data, sort_keys=True)))
            yield pd.DataFrame(
                rows, columns=["ip_start", "ip_end", "prefix_len", "data_json"]
            )

    return df.mapInPandas(walk, schema=MMDB_RANGE_SCHEMA)


MMDB_RANGE6_SCHEMA = (
    "ip_start_hex string, ip_end_hex string, prefix_len int, data_json string"
)


def parse_mmdb6(df, bin_col: str = "content"):
    """IPv6 twin of parse_mmdb: explodes ip_version=6 ``.mmdb`` blobs into
    (ip_start_hex, ip_end_hex, prefix_len, data_json) rows. Bounds are
    32-char zero-padded lowercase hex — fixed width, so LEXICOGRAPHIC
    string comparison equals numeric uint128 comparison, which is what
    ``operators.enrich.enrich_ip6_range`` joins on (Spark longs can't hold
    128 bits; hex strings can, order-exactly)."""
    import pandas as pd

    def walk(batches):
        for pdf in batches:
            rows = []
            for blob in pdf[bin_col]:
                if blob is None:
                    continue
                for lo, hi, plen, data in mmdb_to_ranges6(bytes(blob)):
                    rows.append(
                        (f"{lo:032x}", f"{hi:032x}", plen, json.dumps(data, sort_keys=True))
                    )
            yield pd.DataFrame(
                rows, columns=["ip_start_hex", "ip_end_hex", "prefix_len", "data_json"]
            )

    return df.mapInPandas(walk, schema=MMDB_RANGE6_SCHEMA)


# ---------------------------------------------------------------------------
# deterministic writer (fixtures / tests)
# ---------------------------------------------------------------------------


def _header(typ: int, size: int) -> bytes:
    if typ > 7:
        first, ext = 0, bytes([typ - 7])
    else:
        first, ext = typ << 5, b""
    if size < 29:
        return bytes([first | size]) + ext
    if size < 285:
        return bytes([first | 29]) + ext + bytes([size - 29])
    if size < 65821:
        return bytes([first | 30]) + ext + (size - 285).to_bytes(2, "big")
    return bytes([first | 31]) + ext + (size - 65821).to_bytes(3, "big")


def _encode_pointer(p: int) -> bytes:
    if p < 2048:
        return bytes([(1 << 5) | (p >> 8), p & 0xFF])
    if p < 526336:
        v = p - 2048
        return bytes([(1 << 5) | (1 << 3) | (v >> 16)]) + (v & 0xFFFF).to_bytes(2, "big")
    if p < 134744064:
        v = p - 526336
        return bytes([(1 << 5) | (2 << 3) | (v >> 24)]) + (v & 0xFFFFFF).to_bytes(3, "big")
    return bytes([(1 << 5) | (3 << 3)]) + p.to_bytes(4, "big")


class _DataWriter:
    """Serializes python values into a data section; repeated strings are
    written once and referenced by pointer thereafter (so fixtures exercise
    the pointer decode path)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._strings: dict[str, int] = {}

    def _emit_str(self, s: str) -> None:
        prior = self._strings.get(s)
        if prior is not None:
            ptr = _encode_pointer(prior)
            raw = s.encode("utf-8")
            if len(ptr) < len(_header(2, len(raw))) + len(raw):
                self.buf += ptr
                return
        self._strings.setdefault(s, len(self.buf))
        raw = s.encode("utf-8")
        self.buf += _header(2, len(raw)) + raw

    def emit(self, v: object) -> int:
        """Append one value; returns its offset within the data section."""
        at = len(self.buf)
        if isinstance(v, str):
            self._emit_str(v)
        elif isinstance(v, bool):
            self.buf += _header(14, int(v))
        elif isinstance(v, int):
            if v < 0:
                self.buf += _header(8, 4) + (v & 0xFFFFFFFF).to_bytes(4, "big")
            else:
                nbytes = max(1, (v.bit_length() + 7) // 8)
                typ = 5 if v < 1 << 16 else 6 if v < 1 << 32 else 9
                self.buf += _header(typ, nbytes) + v.to_bytes(nbytes, "big")
        elif isinstance(v, float):
            self.buf += _header(3, 8) + struct.pack(">d", v)
        elif isinstance(v, bytes):
            self.buf += _header(4, len(v)) + v
        elif isinstance(v, dict):
            self.buf += _header(7, len(v))
            for k in v:  # insertion order — deterministic
                self._emit_str(str(k))
                self.emit(v[k])
        elif isinstance(v, (list, tuple)):
            self.buf += _header(11, len(v))
            for x in v:
                self.emit(x)
        else:
            raise TypeError(f"mmdb writer: unsupported type {type(v)}")
        return at


def _range_to_cidrs(lo: int, hi: int, bits: int = 32) -> Iterator[tuple[int, int]]:
    """Split [lo, hi] into minimal CIDR blocks: yields (prefix_int, plen)."""
    while lo <= hi:
        # largest block aligned at lo that fits in [lo, hi]
        max_align = (lo & -lo).bit_length() - 1 if lo else bits
        max_span = (hi - lo + 1).bit_length() - 1
        nbits = min(max_align, max_span)
        yield lo, bits - nbits
        lo += 1 << nbits


def build_mmdb(
    ranges: list[tuple[int, int, dict]],
    record_size: int = 24,
    database_type: str = "vector-spark-test",
    ip_version: int = 4,
    v6_ranges: bool = False,
) -> bytes:
    """Build a spec-compliant .mmdb from disjoint uint ranges
    [(ip_start, ip_end, record_dict), ...]. Deterministic: fixed build
    epoch, insertion-order maps, whole-record dedupe by canonical JSON.
    ip_version=6 roots v4 ranges under 96 zero bits (::/96 convention) to
    exercise the reader's v6-database path; v6_ranges=True instead treats
    the bounds as native uint128 IPv6 ranges (requires ip_version=6)."""
    if v6_ranges and ip_version != 6:
        raise ValueError("v6_ranges=True requires ip_version=6")
    addr_bits = 128 if v6_ranges else 32
    root: list = [None, None, None]  # [left, right, leaf_data_index]
    records: list[dict] = []
    rec_index: dict[str, int] = {}

    def insert(prefix: int, plen: int, data_i: int) -> None:
        if plen == 0:
            # full-address-space range: the root has no "self" record in
            # the MMDB layout — set BOTH children (was silently dropped)
            insert(0, 1, data_i)
            insert(1, 1, data_i)
            return
        node = root
        for d in range(plen):
            side = (prefix >> (plen - 1 - d)) & 1
            if d == plen - 1:
                node[side] = ("data", data_i)
            else:
                if node[side] is None:
                    node[side] = [None, None, None]
                node = node[side]

    v4_bits = 96 if (ip_version == 6 and not v6_ranges) else 0
    for lo, hi, data in sorted(ranges):
        key = json.dumps(data, sort_keys=True)
        if key not in rec_index:
            rec_index[key] = len(records)
            records.append(data)
        for net, plen in _range_to_cidrs(lo, hi, addr_bits):
            # insert() consumes a plen-bit prefix value, not the full base
            insert(
                net >> (addr_bits - plen) if plen else 0,
                plen + v4_bits,
                rec_index[key],
            )

    # number internal nodes (preorder), then lay out the data section
    nodes: list[list] = []

    def number(node: list) -> int:
        i = len(nodes)
        nodes.append(node)
        for side in (0, 1):
            if isinstance(node[side], list):
                node[side] = ("node", number(node[side]))
        return i

    number(root)
    node_count = len(nodes)
    dw = _DataWriter()
    rec_offsets = [dw.emit(r) for r in records]

    node_bytes = record_size * 2 // 8

    def record_value(slot) -> int:
        if slot is None:
            return node_count
        kind, i = slot
        if kind == "node":
            return i
        return node_count + 16 + rec_offsets[i]

    tree = bytearray()
    for node in nodes:
        left, right = record_value(node[0]), record_value(node[1])
        if max(left, right) >= 1 << record_size:
            raise ValueError("mmdb writer: record_size too small for this tree")
        if record_size == 24:
            tree += left.to_bytes(3, "big") + right.to_bytes(3, "big")
        elif record_size == 28:
            tree += (
                (left & 0xFFFFFF).to_bytes(3, "big")
                + bytes([((left >> 24) << 4) | (right >> 24)])
                + (right & 0xFFFFFF).to_bytes(3, "big")
            )
        elif record_size == 32:
            tree += left.to_bytes(4, "big") + right.to_bytes(4, "big")
        else:
            raise ValueError(f"mmdb writer: unsupported record_size {record_size}")
    assert len(tree) == node_count * node_bytes

    meta_w = _DataWriter()
    meta_w.emit(
        {
            "binary_format_major_version": 2,
            "binary_format_minor_version": 0,
            "build_epoch": 1609459200,  # fixed: determinism invariant
            "database_type": database_type,
            "description": {"en": "vector_spark deterministic test fixture"},
            "ip_version": ip_version,
            "languages": ["en"],
            "node_count": node_count,
            "record_size": record_size,
        }
    )
    return bytes(tree) + DATA_SEPARATOR + bytes(dw.buf) + METADATA_MARKER + bytes(meta_w.buf)
