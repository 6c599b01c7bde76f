"""filter — drop events failing a condition.

Reference: /root/reference/src/transforms/filter.rs:86-95. In Spark this is
just `df.filter`; the wrapper exists so the topology compiler has a uniform
operator surface and so dropped-count lineage can be recorded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def filter_events(df: DataFrame, condition: Column | str) -> DataFrame:
    return df.filter(condition)
