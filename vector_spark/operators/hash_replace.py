"""hash_replace — replace repeated payload values by their hash.

Reference: /root/reference/src/transforms/hash_replace/mod.rs:161-236 — for
each configured key, always add `<hash_key>.<key> = hex(hash(value))`; if
the value was already seen (Cuckoo filter), remove the raw value, keeping
only the hash.

Spark-first: "seen before" = occurrence rank > 1 per (value) over an
explicit order column. The hash column itself is a narrow md5
(engine-portable hex).

Scale shape: ranking directly over the event rows shuffles the FULL rows
once per configured column. With one column that is optimal (one shuffle
total). With K>1 columns we instead rank over a narrow
(order_col, *cols) projection — K cheap shuffles that never move the wide
payload — and join the keep-flags back over the unique order column, so
the full rows move exactly once regardless of K.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_replace(df: DataFrame, cols: list[str], order_col: str = "event_id") -> DataFrame:
    if len(cols) <= 1:
        out = df
        for col in cols:
            out = out.withColumn(f"{col}_hash", F.md5(F.col(col).cast("string")))
            w = Window.partitionBy(col).orderBy(order_col)
            out = out.withColumn(col, F.when(F.row_number().over(w) == 1, F.col(col)))
        return out

    flags = df.select(order_col, *cols)
    for col in cols:
        w = Window.partitionBy(col).orderBy(order_col)
        flags = flags.withColumn(f"_keep_{col}", F.row_number().over(w) == 1)
    flags = flags.select(order_col, *[f"_keep_{c}" for c in cols])
    out = df.join(flags, order_col)  # order_col is the unique event id
    for col in cols:
        out = out.withColumn(f"{col}_hash", F.md5(F.col(col).cast("string")))
        out = out.withColumn(col, F.when(F.col(f"_keep_{col}"), F.col(col)))
    return out.select(*df.columns, *[f"{c}_hash" for c in cols])
