"""metric_to_log — serialize a metric row into a structured log event.

Reference: /root/reference/src/transforms/metric_to_log.rs:255-345.
Spark-first: the "log" is a fixed projection with a deterministic message
rendering (logfmt-style key=value, stable key order) — pure string exprs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def metric_to_log(
    df: DataFrame,
    name_col: str = "name",
    value_col: str = "value",
    kind_col: str = "kind",
    ts_col: str | None = None,
) -> DataFrame:
    msg = F.concat(
        F.lit("metric name="), F.col(name_col),
        F.lit(" kind="), F.col(kind_col),
        F.lit(" value="), F.col(value_col).cast("string"),
    )
    out = df.withColumn("message", msg)
    if ts_col:
        out = out.withColumn("timestamp", F.col(ts_col))
    return out
