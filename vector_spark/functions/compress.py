"""VRL compression codecs — encode/decode zlib & gzip.

Reference registry: encode_zlib / decode_zlib / encode_gzip / decode_gzip
(website/cue/reference/remap/functions/). No JVM builtin exists for
per-value compression, so these are the textbook case for Arrow-batched
pandas UDFs (stdlib zlib/gzip — no external wheels): binary in, binary
out, batch-at-a-time. Snappy/zstd slot in identically below: C wheel when
installed, pure-Python spec-direct codec (snappy_py.py / zstd_py.py)
otherwise — validated against the JVM's snappy-java/zstd-jni in tests.

The pandas_udf objects are built lazily (pandas_udf needs an active
SparkSession) and cached per process.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column


@lru_cache(maxsize=None)
def _udf(name: str):
    import gzip as _gzip
    import zlib as _zlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    fns = {
        "encode_zlib": lambda b: _zlib.compress(b),
        "decode_zlib": lambda b: _zlib.decompress(b),
        # fixed mtime -> deterministic output (oracle/replay friendly)
        "encode_gzip": lambda b: _gzip.compress(b, mtime=0),
        "decode_gzip": lambda b: _gzip.decompress(b),
    }
    f = fns[name]

    def codec(data):
        return data.map(lambda b: None if b is None else f(bytes(b)))

    # non-decorator form: `from __future__ import annotations` stringifies
    # type hints, which the hint-based pandas_udf signature parser rejects
    return pandas_udf(codec, "binary")


def encode_zlib(col: Column | str) -> Column:
    return _udf("encode_zlib")(col)


def decode_zlib(col: Column | str) -> Column:
    return _udf("decode_zlib")(col)


def encode_gzip(col: Column | str) -> Column:
    return _udf("encode_gzip")(col)


def decode_gzip(col: Column | str) -> Column:
    return _udf("decode_gzip")(col)


def decode_gzip_members(col: Column) -> Column:
    """Split-and-decode a MULTI-MEMBER gzip buffer -> array<binary>, one
    element per member. This is the Common Crawl WARC container layout
    (each WARC record is its own gzip member concatenated into one .gz, so
    records are independently seekable); plain decode_gzip stops after the
    first member. stdlib decompressobj(wbits=31) + unused_data walks the
    member chain. Arrow-batched, scan-parallel, no shuffle."""
    import zlib as _zlib

    from pyspark.sql.functions import pandas_udf

    def split_members(buf: bytes) -> list[bytes]:
        out = []
        rest = bytes(buf)
        while rest:
            d = _zlib.decompressobj(wbits=31)
            out.append(d.decompress(rest))
            if not d.eof:  # truncated trailing member
                break
            rest = d.unused_data
        return out

    def codec(data):
        return data.map(lambda b: None if b is None else split_members(b))

    return pandas_udf(codec, "array<binary>")(col)


# --- zstd / snappy -----------------------------------------------------------
#
# C wheel preferred (zstandard / python-snappy), pure-Python spec-direct
# fallback otherwise (functions/zstd_py.py RFC 8878, functions/snappy_py.py
# raw snappy) — so the codec path ALWAYS executes, wheel or not. The
# fallbacks are cross-validated against the JVM's real zstd-jni/snappy-java
# in tests/test_sinks_codecs.py. One asymmetry, disclosed: the pure-Python
# zstd ENcoder emits spec-legal raw-block frames (ratio 1.0, any decoder
# accepts them — zstd-jni proves it); decode handles full entropy-coded
# frames at every level.


def _zstd_fns(level: int = 3):
    """-> (compress, decompress) callables: wheel if present, else pure-Python."""
    try:
        import zstandard as zstd

        c = zstd.ZstdCompressor(level=level)
        d = zstd.ZstdDecompressor()
        return c.compress, d.decompress
    except ImportError:
        from . import zstd_py

        return zstd_py.compress, zstd_py.decompress


def _snappy_fns():
    try:
        import snappy

        return snappy.compress, snappy.decompress
    except ImportError:
        from . import snappy_py

        return snappy_py.compress, snappy_py.decompress


def _codec_udf(f):
    from pyspark.sql.functions import pandas_udf

    def codec(data):
        return data.map(lambda b: None if b is None else f(bytes(b)))

    return pandas_udf(codec, "binary")


def encode_zstd(col: Column, level: int = 3) -> Column:
    return _codec_udf(_zstd_fns(level)[0])(col)


def decode_zstd(col: Column) -> Column:
    return _codec_udf(_zstd_fns()[1])(col)


def encode_snappy(col: Column) -> Column:
    return _codec_udf(_snappy_fns()[0])(col)


def decode_snappy(col: Column) -> Column:
    return _codec_udf(_snappy_fns()[1])(col)


def encode_snappy_framed(col: Column) -> Column:
    """Snappy FRAMED (streaming) format — stream identifier + chunked
    payload with masked CRC32C per chunk (google/snappy
    framing_format.txt). Always the spec-direct codec (snappy_py);
    cross-validated against snappy-java's SnappyFramed streams."""
    from .snappy_py import compress_framed

    return _codec_udf(compress_framed)(col)


def decode_snappy_framed(col: Column) -> Column:
    from .snappy_py import decompress_framed

    return _codec_udf(decompress_framed)(col)
