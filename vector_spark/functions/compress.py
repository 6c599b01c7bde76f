"""VRL compression codecs — encode/decode zlib & gzip.

Reference registry: encode_zlib / decode_zlib / encode_gzip / decode_gzip
(website/cue/reference/remap/functions/). No JVM builtin exists for
per-value compression, so these are the textbook case for Arrow-batched
pandas UDFs (stdlib zlib/gzip — no external wheels): binary in, binary
out, batch-at-a-time. Snappy/zstd would slot in identically given wheels.

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


# --- zstd / snappy (gated: wheels not present in every environment) --------

def _optional_codec(name: str, module: str):
    """encode/decode builders for codecs whose wheel may be absent
    (zstandard, python-snappy). The reference ships zstd/snappy in
    lib/codecs; here they slot into the same Arrow-batched pattern as
    zlib/gzip, but the import is deferred and a missing wheel raises a
    clear ImportError AT CALL TIME (tests skip-if-absent)."""
    import importlib

    try:
        mod = importlib.import_module(module)
    except ImportError as e:
        raise ImportError(
            f"{name} needs the {module!r} wheel, which is not installed in "
            f"this environment; zlib/gzip codecs are always available"
        ) from e
    return mod


def encode_zstd(col: Column, level: int = 3) -> Column:
    zstd = _optional_codec("encode_zstd", "zstandard")
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    c = zstd.ZstdCompressor(level=level)

    def codec(data):
        return data.map(lambda b: None if b is None else c.compress(bytes(b)))

    return pandas_udf(codec, "binary")(col)


def decode_zstd(col: Column) -> Column:
    zstd = _optional_codec("decode_zstd", "zstandard")
    from pyspark.sql.functions import pandas_udf

    d = zstd.ZstdDecompressor()

    def codec(data):
        return data.map(lambda b: None if b is None else d.decompress(bytes(b)))

    return pandas_udf(codec, "binary")(col)


def encode_snappy(col: Column) -> Column:
    snappy = _optional_codec("encode_snappy", "snappy")
    from pyspark.sql.functions import pandas_udf

    def codec(data):
        return data.map(lambda b: None if b is None else snappy.compress(bytes(b)))

    return pandas_udf(codec, "binary")(col)


def decode_snappy(col: Column) -> Column:
    snappy = _optional_codec("decode_snappy", "snappy")
    from pyspark.sql.functions import pandas_udf

    def codec(data):
        return data.map(lambda b: None if b is None else snappy.decompress(bytes(b)))

    return pandas_udf(codec, "binary")(col)
