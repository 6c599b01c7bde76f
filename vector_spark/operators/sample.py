"""sample — keep 1/N events.

Reference: /root/reference/src/transforms/sample/transform.rs:54-164 —
hash-deterministic when `key_field` is set (seahash(value) % rate == 0),
else per-group modulo counter or RNG; `exclude` condition bypasses sampling;
kept events are stamped with a `sample_rate` field.

Spark-first: xxhash64(key) % rate == 0 — deterministic, order-free, no
shuffle, fully pushed into the scan stage. (seahash != xxhash64: parity with
the reference is at the "deterministic 1-in-N" semantics level, not
byte-identical membership — SURVEY.md §2.1.) Random mode uses rand(seed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample(
    df: DataFrame,
    rate: int,
    key_field: str | None = None,
    exclude: Column | None = None,
    seed: int = 42,
    stamp: bool = True,
) -> DataFrame:
    if key_field is not None:
        keep = F.pmod(F.xxhash64(F.col(key_field)), F.lit(rate)) == 0
    else:
        keep = F.rand(seed) < (1.0 / rate)
    if exclude is not None:
        keep = keep | exclude
    out = df.filter(keep)
    return out.withColumn("sample_rate", F.lit(rate)) if stamp else out
