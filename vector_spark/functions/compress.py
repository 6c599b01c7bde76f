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
