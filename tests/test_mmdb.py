"""MaxMind DB reader/writer tests.

The reference consumes .mmdb artifacts through the maxminddb crate
(src/enrichment_tables/geoip.rs, mmdb.rs); we test our spec implementation
(maxmind.github.io/MaxMind-DB) three ways: hand-computed decodes of
spec-layout bytes, a hypothesis property (full-tree enumeration must agree
with independent per-IP point lookups on random disjoint range sets, across
all record sizes and both ip_version roots), and the Spark mapInPandas
walker end-to-end."""

from __future__ import annotations

import json
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from vector_spark.functions.mmdb import (
    DATA_SEPARATOR,
    METADATA_MARKER,
    _decode,
    build_mmdb,
    mmdb_lookup,
    mmdb_to_ranges,
    parse_mmdb,
    read_metadata,
)

# ---------------------------------------------------------------------------
# data-section decoder against hand-assembled spec bytes
# ---------------------------------------------------------------------------


def test_decode_primitive_types():
    # utf8 "ab": type 2 (0b010 << 5) | size 2
    assert _decode(b"\x42ab", 0, 0) == ("ab", 3)
    # double 1.5: type 3, size 8
    assert _decode(b"\x68" + struct.pack(">d", 1.5), 0, 0) == (1.5, 9)
    # bytes: type 4 size 3
    assert _decode(b"\x83xyz", 0, 0) == (b"xyz", 4)
    # uint16 258: type 5 size 2
    assert _decode(b"\xa2\x01\x02", 0, 0) == (258, 3)
    # uint32 2**31: type 6 size 4
    assert _decode(b"\xc4\x80\x00\x00\x00", 0, 0) == (1 << 31, 5)
    # map {"a": 1}: type 7 size 1, key utf8 "a", value uint16 1
    assert _decode(b"\xe1\x41a\xa1\x01", 0, 0) == ({"a": 1}, 5)
    # int32 -2 (extended type 8 = 0x00 ctrl + next byte 1), 4 bytes payload
    assert _decode(b"\x04\x01\xff\xff\xff\xfe", 0, 0) == (-2, 6)
    # uint64 (extended 9): 1 byte of payload
    assert _decode(b"\x01\x02\x09", 0, 0) == (9, 3)
    # array ["a","a"] (extended 11): two utf8 entries
    assert _decode(b"\x02\x04\x41a\x41a", 0, 0) == (["a", "a"], 6)
    # booleans (extended 14): value carried in size bits
    assert _decode(b"\x00\x07", 0, 0) == (False, 2)
    assert _decode(b"\x01\x07", 0, 0) == (True, 2)
    # float 0.5 (extended 15)
    assert _decode(b"\x04\x08" + struct.pack(">f", 0.5), 0, 0) == (0.5, 6)


def test_decode_size_encodings():
    # size 29 -> one extra byte: 29 + 3 = 32-byte string
    payload = b"x" * 32
    assert _decode(b"\x5d\x03" + payload, 0, 0) == ("x" * 32, 34)
    # size 30 -> 285 + 2-byte value
    payload = b"y" * 300
    assert _decode(b"\x5e\x00\x0f" + payload, 0, 0) == ("y" * 300, 303)


def test_decode_pointers_all_widths():
    # data section: "hi" at offset 0; pointers resolve relative to data_start
    data = b"\x42hi"
    # ss=0 (11-bit): ctrl 0b001_00_000 | high bits, one byte
    buf = data + b"\x20\x00"
    assert _decode(buf, 3, 0) == ("hi", 5)
    # ss=1 (19-bit, +2048): target 0 => encoded value -2048 impossible, so
    # place the string at 2048 instead
    data2 = b"\x00" * 2048 + b"\x42hi"
    buf2 = data2 + b"\x28\x00\x00"  # ctrl ss=1 value 0 -> 0 + 2048
    assert _decode(buf2, len(data2), 0) == ("hi", len(data2) + 3)
    # ss=3 (32-bit absolute)
    buf3 = data + b"\x38\x00\x00\x00\x00"
    assert _decode(buf3, 3, 0) == ("hi", 8)


def test_writer_pointer_dedupe_roundtrip():
    """Records sharing strings must produce a pointer-containing data
    section that still decodes to the full values."""
    ranges = [
        (10, 19, {"country": "somewhat-long-name", "region": "west"}),
        (30, 39, {"country": "somewhat-long-name", "region": "east"}),
        (50, 59, {"country": "other", "region": "west"}),
    ]
    blob = build_mmdb(ranges)
    # a pointer control byte (type 1) must exist in the data section
    tree_end = blob.index(DATA_SEPARATOR)
    data = blob[tree_end + 16 : blob.rindex(METADATA_MARKER)]
    assert any((b >> 5) == 1 for b in data), "no pointers emitted"
    leaves = list(mmdb_to_ranges(blob))
    for lo, hi, want in ranges:
        for ip in (lo, (lo + hi) // 2, hi):
            got = next(d for l, h, _, d in leaves if l <= ip <= h)
            assert got == want


def test_metadata_fields():
    blob = build_mmdb([(0x0A000000, 0x0A00FFFF, {"x": 1})], record_size=24)
    meta = read_metadata(blob)
    assert meta["record_size"] == 24
    assert meta["ip_version"] == 4
    assert meta["binary_format_major_version"] == 2
    assert meta["node_count"] * 6 == blob.index(DATA_SEPARATOR)


# ---------------------------------------------------------------------------
# property: enumeration == point lookup == python interval model
# ---------------------------------------------------------------------------


@st.composite
def disjoint_ranges(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    points = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=2**32 - 2),
                min_size=2 * n,
                max_size=2 * n,
                unique=True,
            )
        )
    )
    out = []
    for i in range(n):
        lo, hi = points[2 * i], points[2 * i + 1]
        if i and lo == out[-1][1] + 1:
            lo += 1  # keep ranges strictly disjoint with a gap
        if lo > hi:
            continue
        out.append((lo, hi, {"id": i, "name": f"r{i}"}))
    return out


@settings(max_examples=30, deadline=None)
@given(
    ranges=disjoint_ranges(),
    record_size=st.sampled_from([24, 28, 32]),
    ip_version=st.sampled_from([4, 6]),
    probe=st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=5, max_size=20),
)
def test_walk_matches_point_lookup(ranges, record_size, ip_version, probe):
    if not ranges:
        return
    blob = build_mmdb(ranges, record_size=record_size, ip_version=ip_version)
    leaves = list(mmdb_to_ranges(blob))
    # leaves ascending + disjoint
    for (l1, h1, _, _), (l2, _, _, _) in zip(leaves, leaves[1:]):
        assert h1 < l2
    # probe boundary IPs of every range plus random IPs
    ips = set(probe)
    for lo, hi, _ in ranges:
        ips.update((lo, hi, max(lo - 1, 0), min(hi + 1, 2**32 - 1)))
    for ip in ips:
        want = next((d for lo, hi, d in ranges if lo <= ip <= hi), None)
        assert mmdb_lookup(blob, ip) == want
        via_leaves = next((d for lo, hi, _, d in leaves if lo <= ip <= hi), None)
        assert via_leaves == want


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def test_parse_mmdb_spark(spark):
    ranges = [
        (0x0A000000, 0x0A0000FF, {"country": "AA"}),
        (0x0B000000, 0x0B00FFFF, {"country": "BB"}),
    ]
    blob = build_mmdb(ranges)
    df = spark.createDataFrame([(bytearray(blob),), (None,)], "content binary")
    rows = sorted(
        (r.ip_start, r.ip_end, json.loads(r.data_json)["country"])
        for r in parse_mmdb(df).collect()
    )
    assert rows == [
        (0x0A000000, 0x0A0000FF, "AA"),
        (0x0B000000, 0x0B00FFFF, "BB"),
    ]


def test_v6_native_ranges_roundtrip():
    base = 0x20010DB8 << 96
    ranges = [
        (base, base | ((1 << 80) - 1), {"c": "A"}),
        (base | (5 << 80), base | (6 << 80) | ((1 << 80) - 1), {"c": "B"}),
    ]
    blob = build_mmdb(ranges, record_size=28, ip_version=6, v6_ranges=True)
    from vector_spark.functions.mmdb import mmdb_to_ranges6

    leaves = list(mmdb_to_ranges6(blob))
    # ascending + disjoint over the 128-bit space
    for (l1, h1, _, _), (l2, _, _, _) in zip(leaves, leaves[1:]):
        assert h1 < l2
    for ip, want in [
        (base, "A"),
        (base | ((1 << 80) - 1), "A"),
        (base | (1 << 80), None),
        (base | (5 << 80) + 7, "B"),
        (base | (6 << 80) | 123, "B"),
        (base | (7 << 80), None),
        (0, None),
    ]:
        got = next((d["c"] for lo, hi, _, d in leaves if lo <= ip <= hi), None)
        assert got == want, hex(ip)


def test_parse_mmdb6_and_enrich_ip6_range(spark):
    from pyspark.sql import functions as F

    from vector_spark.functions.mmdb import parse_mmdb6
    from vector_spark.operators import enrich_ip6_range

    base = 0x20010DB8 << 96
    ranges = [
        (base, base | ((1 << 80) - 1), {"country": "AA"}),
        (base | (2 << 80), base | (3 << 80) | ((1 << 80) - 1), {"country": "BB"}),
    ]
    blob = build_mmdb(ranges, ip_version=6, v6_ranges=True)
    dim = parse_mmdb6(
        spark.createDataFrame([(bytearray(blob),)], "content binary")
    ).select(
        "ip_start_hex",
        "ip_end_hex",
        F.get_json_object("data_json", "$.country").alias("country"),
    )
    facts = spark.createDataFrame(
        [
            (1, "2001:db8::1"),          # AA
            (2, "2001:0DB8:0:ffff::9"),  # AA (case + padding)
            (3, "2001:db8:2::"),         # BB
            (4, "2001:db8:4::1"),        # no match
            (5, "not-an-ip"),            # invalid -> null
        ],
        "id int, ip string",
    )
    out = {r.id: r.country for r in enrich_ip6_range(facts, dim, "ip").collect()}
    assert out == {1: "AA", 2: "AA", 3: "BB", 4: None, 5: None}
    plan = enrich_ip6_range(facts, dim, "ip")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_build_mmdb_full_space_range():
    """A range covering the ENTIRE address space (plen=0) must round-trip,
    not silently vanish (review fix: insert() now sets both root children)."""
    blob = build_mmdb([(0, (1 << 32) - 1, {"c": "ALL"})])
    from vector_spark.functions.mmdb import mmdb_to_ranges

    leaves = list(mmdb_to_ranges(blob))
    assert leaves, "full-space range was dropped"
    assert leaves[0][0] == 0 and leaves[-1][1] == (1 << 32) - 1
    assert all(d == {"c": "ALL"} for _, _, _, d in leaves)
    assert mmdb_lookup(blob, 0x12345678) == {"c": "ALL"}

    blob6 = build_mmdb(
        [(0, (1 << 128) - 1, {"c": "ALL6"})], ip_version=6, v6_ranges=True
    )
    from vector_spark.functions.mmdb import mmdb_to_ranges6

    leaves6 = list(mmdb_to_ranges6(blob6))
    assert leaves6 and leaves6[0][0] == 0 and leaves6[-1][1] == (1 << 128) - 1
