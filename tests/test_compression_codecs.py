"""Cross-library validation of the pure-Python snappy/zstd codecs.

The ground truth is the REAL libraries already on Spark's JVM classpath
(snappy-java, zstd-jni), reached driver-side via py4j — so the pure-Python
walkers (functions/snappy_py.py, functions/zstd_py.py) are proven against
independent implementations, not just self-round-trips. Reference parity:
Vector compresses/decompresses snappy+zstd in its codec stack
(`src/sinks/util/buffer/compression.rs`, `lib/codecs`).

Also pins XXH64 against the published test vectors (xxHash spec repo).
"""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from vector_spark.functions import snappy_py, zstd_py

FUZZ = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _payload_corpus(seed: int = 5) -> list[bytes]:
    rnd = random.Random(seed)
    return [
        b"",
        b"x",
        b"payload",
        b"the quick brown fox jumps over the lazy dog. " * 300,
        b"a" * 65000,                                            # RLE
        bytes(rnd.randrange(256) for _ in range(40000)),         # incompressible
        bytes(rnd.randrange(4) for _ in range(40000)),           # low entropy
        "unicode: éüő 日本語 " .encode() * 500,
        bytes(range(256)) * 200,
        b"GET /index.html HTTP/1.1\r\nHost: example.com\r\n\r\n" * 800,
    ]


# --------------------------------------------------------------------------
# snappy

def test_snappy_cross_jvm_both_directions(spark):
    """Our compressor's output is readable by snappy-java, and we read
    snappy-java's output — both directions over a varied corpus."""
    J = spark._jvm.org.xerial.snappy.Snappy
    for i, c in enumerate(_payload_corpus()):
        ours = snappy_py.compress(c)
        assert bytes(J.uncompress(bytearray(ours))) == c, f"java<-ours case {i}"
        theirs = bytes(J.compress(bytearray(c)))
        assert snappy_py.decompress(theirs) == c, f"ours<-java case {i}"


@given(st.binary(max_size=4096))
@settings(**FUZZ)
def test_snappy_roundtrip_property(data):
    assert snappy_py.decompress(snappy_py.compress(data)) == data


def test_snappy_rejects_corrupt():
    with pytest.raises(snappy_py.SnappyError):
        snappy_py.decompress(b"\x0a\x00")  # preamble 10, empty body
    with pytest.raises(snappy_py.SnappyError):
        # copy element with offset beyond output start
        snappy_py.decompress(b"\x04" + bytes([((4 - 1) << 2) | 2, 9, 0]))


# --------------------------------------------------------------------------
# zstd

def test_zstd_decodes_jni_frames_all_levels(spark):
    """Entropy-coded frames from zstd-jni at representative levels
    (fast/default/lazy/btopt/btultra2) decode byte-exactly."""
    Z = spark._jvm.com.github.luben.zstd.Zstd
    for lvl in (1, 3, 9, 17, 22):
        for i, c in enumerate(_payload_corpus()):
            comp = bytes(Z.compress(bytearray(c), lvl))
            assert zstd_py.decompress(comp) == c, f"level {lvl} case {i}"


def test_zstd_jni_reads_our_raw_frames(spark):
    """Our raw-block frames are spec-legal: the reference-grade decoder
    (zstd-jni) accepts them, with and without the XXH64 checksum."""
    Z = spark._jvm.com.github.luben.zstd.Zstd
    for c in _payload_corpus():
        if not c:
            continue  # jni's simple API needs a non-zero dst size hint
        for ck in (False, True):
            frame = zstd_py.compress(c, checksum=ck)
            assert bytes(Z.decompress(bytearray(frame), len(c))) == c


def test_zstd_checksummed_frame_verified(spark):
    """A zstd-jni frame with checksum enabled passes our XXH64 verify;
    flipping a checksum byte is rejected."""
    ctx = spark._jvm.com.github.luben.zstd.ZstdCompressCtx()
    ctx.setLevel(9)
    ctx.setChecksum(True)
    payload = b"checksummed frame content " * 2000
    comp = bytes(ctx.compress(bytearray(payload)))
    assert zstd_py.decompress(comp) == payload
    bad = bytearray(comp)
    bad[-1] ^= 0xFF
    with pytest.raises(zstd_py.ZstdError, match="checksum"):
        zstd_py.decompress(bytes(bad))


def test_zstd_concatenated_and_skippable_frames(spark):
    """Multiple frames back-to-back (mixed producers) and a skippable
    frame in between decode to the concatenation, per RFC 8878 §3.1."""
    Z = spark._jvm.com.github.luben.zstd.Zstd
    a, b = b"frame-one " * 100, b"frame-two " * 100
    skippable = (0x184D2A50).to_bytes(4, "little") + (4).to_bytes(4, "little") + b"meta"
    cat = (bytes(Z.compress(bytearray(a), 3)) + skippable
           + zstd_py.compress(b) + bytes(Z.compress(bytearray(b), 19)))
    assert zstd_py.decompress(cat) == a + b + b


def test_zstd_cross_block_matches(spark):
    """Match offsets reaching across 128 KiB block boundaries (the frame
    window is larger than one block) decode correctly."""
    rnd = random.Random(17)
    t = bytes(rnd.randrange(256) for _ in range(150000))
    t = t + b"filler" * 30000 + t
    Z = spark._jvm.com.github.luben.zstd.Zstd
    assert zstd_py.decompress(bytes(Z.compress(bytearray(t), 19))) == t


@given(st.binary(max_size=4096))
@settings(**FUZZ)
def test_zstd_raw_frame_roundtrip_property(data):
    for ck in (False, True):
        assert zstd_py.decompress(zstd_py.compress(data, checksum=ck)) == data


def test_zstd_structured_fuzz_vs_jni(spark):
    """Randomized structured payloads (log-ish word soup) across random
    levels — the shape that exercises repeat offsets and FSE table reuse."""
    Z = spark._jvm.com.github.luben.zstd.Zstd
    rnd = random.Random(23)
    words = [b"error", b"warn", b"GET /index.html", b"10.0.3.7", b"the", b"zstd"]
    for _ in range(15):
        n = rnd.randrange(0, 60000)
        buf = bytearray()
        while len(buf) < n:
            buf += rnd.choice(words) * rnd.randrange(1, 8)
        t = bytes(buf[:n])
        lvl = rnd.choice([1, 2, 4, 7, 12, 19])
        assert zstd_py.decompress(bytes(Z.compress(bytearray(t), lvl))) == t


# --------------------------------------------------------------------------
# xxh64

def test_xxh64_known_answers():
    """Published xxHash known answers (seed 0)."""
    assert zstd_py.xxh64(b"") == 0xEF46DB3751D8E999
    assert zstd_py.xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert zstd_py.xxh64(b"abc") == 0x44BC2CF5AD770999


def test_xxh64_cross_jvm(spark):
    """Every length class (tail<4, <8, <32, stripes) vs lz4-java's XXHash64
    (the implementation Spark itself ships)."""
    h = spark._jvm.net.jpountz.xxhash.XXHashFactory.fastestInstance().hash64()
    rnd = random.Random(1)
    for n in (0, 1, 3, 4, 7, 8, 31, 32, 33, 40, 100, 1000, 4097):
        b = bytes(rnd.randrange(256) for _ in range(n))
        want = h.hash(bytearray(b), 0, n, 0) & ((1 << 64) - 1)
        assert zstd_py.xxh64(b) == want, f"len {n}"


# --------------------------------------------------------------------------
# snappy framed (streaming) format

def test_snappy_framed_cross_jvm_both_directions(spark):
    """Framed format (stream id + masked-CRC32C chunks) against
    snappy-java's SnappyFramedOutput/InputStream, both directions,
    including multi-chunk (>64 KiB) and empty payloads."""
    jvm = spark._jvm
    for i, c in enumerate(_payload_corpus()):
        baos = jvm.java.io.ByteArrayOutputStream()
        fo = jvm.org.xerial.snappy.SnappyFramedOutputStream(baos)
        if c:
            fo.write(bytearray(c))
        fo.close()
        assert snappy_py.decompress_framed(bytes(baos.toByteArray())) == c, \
            f"ours<-java case {i}"
        fi = jvm.org.xerial.snappy.SnappyFramedInputStream(
            jvm.java.io.ByteArrayInputStream(
                bytearray(snappy_py.compress_framed(c))))
        assert bytes(fi.readAllBytes()) == c, f"java<-ours case {i}"


def test_snappy_framed_crc_verified():
    """Incompressible payload -> an UNCOMPRESSED chunk, where a flipped
    byte still decodes cleanly and only the CRC32C can catch it."""
    rnd = random.Random(9)
    c = bytes(rnd.randrange(256) for _ in range(500))
    framed = bytearray(snappy_py.compress_framed(c))
    framed[-1] ^= 0xFF
    with pytest.raises(snappy_py.SnappyError, match="CRC32C"):
        snappy_py.decompress_framed(bytes(framed))


def test_snappy_framed_spark_udf_roundtrip(spark):
    from pyspark.sql import functions as F

    from vector_spark.functions import decode_snappy_framed, encode_snappy_framed

    df = spark.createDataFrame(
        [(b"chunked " * 20000,), (b"",), (None,)], "b binary")
    out = df.select(
        decode_snappy_framed(encode_snappy_framed(F.col("b"))).alias("rt"))
    got = [None if r.rt is None else bytes(r.rt) for r in out.collect()]
    assert got == [b"chunked " * 20000, b"", None]


def test_zstd_match_window_is_per_frame():
    """A corrupt frame whose sequence offset reaches before its own frame
    start must raise, not silently copy bytes from the PREVIOUS frame's
    output. Hand-built block: 2 raw literals + one RLE-mode sequence with
    offset_value 8 (offset 5) when only 2 bytes exist in-frame."""
    block = bytes([
        0x10, 0x58, 0x59,        # raw literals size 2: "XY"
        0x01,                    # 1 sequence
        0x54,                    # modes: LL=RLE, OF=RLE, ML=RLE
        0x00, 0x03, 0x00,        # RLE codes: ll=0, of=3, ml=0
        0x08,                    # bitstream: sentinel + 3 zero bits
    ])
    frame = (zstd_py._MAGIC.to_bytes(4, "little") + bytes([0x20, 5])
             + (1 | (2 << 1) | (len(block) << 3)).to_bytes(3, "little")
             + block)
    data = zstd_py.compress(b"ABCDE") + frame
    with pytest.raises(zstd_py.ZstdError, match="window"):
        zstd_py.decompress(data)
