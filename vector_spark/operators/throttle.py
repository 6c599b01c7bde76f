"""throttle — per-key rate limit: keep at most `threshold` events per
`window_secs` per key; drop the excess.

Reference: /root/reference/src/transforms/throttle.rs:147-210 (GCRA token
bucket per rendered key). Batch realization (SURVEY.md §2.1): events ranked
within (key, tumbling window) by time — rank <= threshold survives. One
shuffle; deterministic given the order column. `exclude` rows bypass the
limiter entirely (throttle.rs config :40-69).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .aggregate import tumbling_window


def throttle(
    df: DataFrame,
    threshold: int,
    window_secs: int,
    key_cols: list[str],
    ts_col: str = "ts",
    order_col: str | None = None,
    exclude: Column | None = None,
) -> DataFrame:
    order_col = order_col or ts_col
    bucket = tumbling_window(F.col(ts_col), window_secs)
    w = (
        Window.partitionBy(*key_cols, bucket)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # excluded events bypass the limiter AND consume no tokens
    # (throttle.rs config :40-69): rank only the non-excluded events via a
    # running conditional count
    inc = F.lit(1) if exclude is None else F.when(exclude, 0).otherwise(1)
    ranked = df.withColumn("_rank", F.sum(inc).over(w))
    keep = F.col("_rank") <= threshold
    if exclude is not None:
        keep = keep | exclude
    return ranked.filter(keep).drop("_rank")
