"""dedupe — drop events whose match-key was already seen.

Reference: /root/reference/src/transforms/dedupe/transform.rs:77-85 — an LRU
cache (default 5000 entries, dedupe/mod.rs:24-28) keyed by the typed bytes of
the `match` fields (default [message, host, timestamp], mod.rs:96-110) or
all-fields-except-`ignore`.

Spark-first realization: the reference processes a totally-ordered stream, so
"first occurrence" is well defined; Spark has no stream order, so the caller
supplies an explicit order column (FIXTURES.md: stable `event_id`).

  * dedupe(keep="any")  -> dropDuplicates: cheapest, hash-agg, map-side
    partial combine; use when any representative is acceptable.
  * dedupe(keep="first")-> exact first-occurrence semantics via
    min_by/row_number over the order column.
  * lru_window > 0      -> reproduces the bounded-cache behavior: a key is
    dropped only if seen within the last `lru_window` events (global order) —
    repeats farther apart than the window survive, like an LRU eviction.

At scale: all variants are a single shuffle on the key; the lru_window
variant additionally needs a global order, which is the same constraint the
reference has (it is inherently sequential) — only use it when bit-parity
with the reference's bounded cache is required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe(
    df: DataFrame,
    match: list[str] | None = None,
    ignore: list[str] | None = None,
    order_by: str = "event_id",
    keep: str = "first",
    lru_window: int = 0,
) -> DataFrame:
    if match and ignore:
        raise ValueError("match and ignore are mutually exclusive (dedupe/mod.rs:96)")
    keys = match if match else [c for c in df.columns if c not in set(ignore or [])]

    if lru_window > 0:
        w = Window.partitionBy(*keys).orderBy(order_by)
        prev = F.lag(order_by).over(w)
        # keep if first occurrence OR the previous occurrence is outside the
        # recency window (cache entry would have been evicted)
        return (
            df.withColumn("_prev_pos", prev)
            .filter(F.col("_prev_pos").isNull() | (F.col(order_by) - F.col("_prev_pos") > lru_window))
            .drop("_prev_pos")
        )

    if keep == "any":
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(order_by).asc() if keep == "first" else F.col(order_by).desc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
