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


def _md5_bucket(col: Column) -> Column:
    """0..255 from the first two hex digits of md5(value-as-string) — an
    engine-portable deterministic hash (identical in ANSI SQL / DuckDB),
    used when the sample membership itself must be oracle-checkable."""
    h = F.md5(col.cast("string").cast("binary"))
    def hexval(c: Column) -> Column:
        a = F.ascii(c)
        return F.when(a <= 57, a - 48).otherwise(a - 87)
    return hexval(F.substring(h, 1, 1)) * 16 + hexval(F.substring(h, 2, 1))


def sample_group_modulo(
    df: DataFrame,
    rate: int,
    group_by: list[str],
    order_col: str,
    stamp: bool = True,
) -> DataFrame:
    """Per-group modulo counter mode (sample/transform.rs:54-164 when
    `group_by` is configured): keep the 1st, (rate+1)th, (2*rate+1)th ...
    event of each group in `order_col` order — deterministic given the
    explicit order (Spark has no stream order)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_by).orderBy(order_col)
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.pmod(F.col("_rn") - 1, F.lit(rate)) == 0)
        .drop("_rn")
    )
    return out.withColumn("sample_rate", F.lit(rate)) if stamp else out


def sample(
    df: DataFrame,
    rate: int,
    key_field: str | None = None,
    exclude: Column | None = None,
    seed: int = 42,
    stamp: bool = True,
    method: str = "xxhash",
) -> DataFrame:
    if key_field is not None:
        if method == "md5":
            if rate > 256 or 256 % rate:
                raise ValueError("md5 method supports rates dividing 256")
            keep = F.pmod(_md5_bucket(F.col(key_field)), F.lit(rate)) == 0
        else:
            keep = F.pmod(F.xxhash64(F.col(key_field)), F.lit(rate)) == 0
    else:
        keep = F.rand(seed) < (1.0 / rate)
    if exclude is not None:
        keep = keep | exclude
    out = df.filter(keep)
    return out.withColumn("sample_rate", F.lit(rate)) if stamp else out
