"""tag_cardinality_limit — cap the distinct values per tag key.

Reference: /root/reference/src/transforms/tag_cardinality_limit/config.rs:
18-100 — per tag key accept only the FIRST `value_limit` (default 500)
distinct values (tracked exactly or via Bloom); on exceed, either drop the
tag (null it) or drop the whole event.

Spark-first (SURVEY.md §2.1): two passes — (1) build the allow-list: first
occurrence order = min(order_col) per value, rank per key, keep rank <=
limit; (2) broadcast-join it back and null-out / drop non-allowed values.
The allow-list is <= limit rows per key — always broadcast-small. The
Probabilistic mode's analogue at scale is `approx_count_distinct` guarding
which keys need a pass at all.

Why one build pass PER key (not a single melted explode(keys) pass): each
build is a column-pruned (key, order) scan whose shuffle carries map-side
partially-aggregated distinct values only, and its orderBy+limit compiles
to TakeOrderedAndProject — per-partition top-N, no global sort. A single
melted pass would save K-1 narrow shuffles but needs a window rank
partitioned by key, which sorts EVERY distinct value of a key inside one
task — exactly the skew bomb a hot key with 10^9 distinct values sets off
at 100 TB. K is 1-3 in practice; K narrow top-N scans win.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def tag_cardinality_limit(
    df: DataFrame,
    tag_cols: list[str],
    value_limit: int = 500,
    order_col: str = "event_id",
    action: str = "drop_tag",  # drop_tag | drop_event
) -> DataFrame:
    out = df
    for col in tag_cols:
        # first `value_limit` distinct values by first occurrence. orderBy+
        # limit compiles to TakeOrderedAndProject (per-partition top-N, then
        # a driver merge of N-row partials) — no global sort, no single-
        # partition window, so a billion distinct values still works.
        first_seen = (
            df.groupBy(col).agg(F.min(order_col).alias("_first"))
            .orderBy("_first")
            .limit(value_limit)
            .select(F.col(col).alias("_allowed"))
        )
        joined = out.join(broadcast(first_seen), out[col] == F.col("_allowed"), "left")
        if action == "drop_event":
            out = joined.filter(F.col("_allowed").isNotNull()).drop("_allowed")
        else:
            out = joined.withColumn(
                col, F.when(F.col("_allowed").isNotNull(), F.col(col))
            ).drop("_allowed")
    return out
