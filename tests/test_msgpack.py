"""MessagePack walker (functions/msgpack_py.py) + the Fluent Forward
decoder built on it — spec vectors from the public msgpack spec and the
Fluent Forward protocol docs."""

import gzip

import pytest

from vector_spark.functions import msgpack_py as mp


SPEC_VECTORS = [
    (b"\x00", 0),
    (b"\x7f", 127),
    (b"\xe0", -32),
    (b"\xff", -1),
    (b"\xc0", None),
    (b"\xc2", False),
    (b"\xc3", True),
    (b"\xcc\xff", 255),
    (b"\xcd\x01\x00", 256),
    (b"\xce\x00\x01\x00\x00", 65536),
    (b"\xcf\x00\x00\x00\x01\x00\x00\x00\x00", 1 << 32),
    (b"\xd0\x80", -128),
    (b"\xd1\xff\x00", -256),
    (b"\xd2\xff\xff\xff\x00", -256 * 65536 - 256 + 65280 + 0 - 65280 + -256),  # placeholder fixed below
    (b"\xd3\xff\xff\xff\xff\xff\xff\xff\xff", -1),
    (b"\xcb\x3f\xf8\x00\x00\x00\x00\x00\x00", 1.5),
    (b"\xa3abc", "abc"),
    (b"\xd9\x03abc", "abc"),
    (b"\xc4\x02\x01\x02", b"\x01\x02"),
    (b"\x92\x01\x02", [1, 2]),
    (b"\x81\xa1k\x05", {"k": 5}),
]
# fix the int32 vector: 0xfffff f00 = -256
SPEC_VECTORS[13] = (b"\xd2\xff\xff\xff\x00", -256)


@pytest.mark.parametrize("buf,expected", SPEC_VECTORS)
def test_spec_vectors(buf, expected):
    v, pos = mp.decode(buf)
    assert v == expected and pos == len(buf)


def test_float32_and_ext():
    v, _ = mp.decode(b"\xca\x3f\xc0\x00\x00")
    assert v == 1.5
    v, _ = mp.decode(b"\xd7\x00\x00\x00\x00\x64\x00\x00\x03\xe7")
    assert v == mp.Ext(0, b"\x00\x00\x00\x64\x00\x00\x03\xe7")
    assert mp.event_time(v) == (100, 999)


def test_reserved_and_truncation():
    with pytest.raises(ValueError):
        mp.decode(b"\xc1")
    with pytest.raises(ValueError):
        mp.decode(b"\xcd\x01")  # truncated uint16
    with pytest.raises(ValueError):
        mp.decode(b"\x92\x01")  # truncated array


@pytest.mark.parametrize("value", [
    None, True, False, 0, 127, 128, -32, -33, 65536, -(1 << 40), 2.25,
    "x" * 40, b"\x00" * 10, [1, [2, "a"], {"k": None}],
    {"a": 1, "b": [True, -5]}, mp.Ext(0, b"\x01" * 8),
    list(range(20)), {f"k{i}": i for i in range(20)},
])
def test_encode_decode_roundtrip(value):
    v, pos = mp.decode(mp.encode(value))
    buf = mp.encode(value)
    assert pos == len(buf) and v == value


def test_decode_stream_malformed_tail():
    good = mp.encode([1, "a"]) + mp.encode({"k": 2})
    assert mp.decode_stream(good + b"\xc1rest") == [[1, "a"], {"k": 2}]


def test_fluent_forward_modes(spark):
    """All three Forward event modes + CompressedPackedForward + a
    malformed buffer, through the Spark surface."""
    from pyspark.sql import functions as F

    from vector_spark.functions import parse_fluent_forward

    rec = {"id": 7, "ok": True}
    msg = mp.encode(["t.m", 100, rec])
    fwd = mp.encode(
        ["t.f", [[mp.Ext(0, (200).to_bytes(4, "big") + (999).to_bytes(4, "big")), rec],
                 [201, {"z": -5}]]]
    )
    packed = mp.encode(["t.p", mp.encode([300, rec]) + mp.encode([301, rec])])
    gz = mp.encode(["t.g", gzip.compress(mp.encode([400, rec]))])
    df = spark.createDataFrame(
        [(0, msg), (1, fwd), (2, packed), (3, gz), (4, b"\xc1")],
        "i long, buf binary",
    )
    rows = (
        df.select("i", F.posexplode(parse_fluent_forward(F.col("buf"))).alias("e", "r"))
        .select("i", "e", "r.*")
        .collect()
    )
    got = {(r.i, r.e): (r.tag, r.ts_sec, r.ts_nsec, dict(r.record)) for r in rows}
    assert got == {
        (0, 0): ("t.m", 100, 0, {"id": "7", "ok": "true"}),
        (1, 0): ("t.f", 200, 999, {"id": "7", "ok": "true"}),
        (1, 1): ("t.f", 201, 0, {"z": "-5"}),
        (2, 0): ("t.p", 300, 0, {"id": "7", "ok": "true"}),
        (2, 1): ("t.p", 301, 0, {"id": "7", "ok": "true"}),
        (3, 0): ("t.g", 400, 0, {"id": "7", "ok": "true"}),
    }
