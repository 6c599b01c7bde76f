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


def metric_to_log_json(
    df: DataFrame,
    carry: list[str] | None = None,
    host_tag: str = "host",
) -> DataFrame:
    """The reference's ACTUAL metric_to_log serialization
    (metric_to_log.rs:283-335): the metric serde-serialized as a JSON
    object — `name`/`namespace`/`kind`/`tags` plus exactly one value
    object (`counter`/`gauge`/`set`/`distribution`/`histogram`/
    `summary`) — with the legacy-namespace host move: `tags.<host_tag>`
    is REMOVED from the serialized tags and surfaced as a `host` column
    (log_schema().host_key, rs:316-321).

    Input = the typed metric columns `log_to_metric_all` produces
    (name, namespace, kind, metric_type, tags, value, set_values,
    samples, statistic, buckets, quantiles, agg_count, agg_sum), so
    log_to_metric_all(metric_to_log_json(m)) == m — the transform pair
    round-trips exactly (contract-checked). Pure to_json, null fields
    omitted like serde; zero Python."""
    mt = F.col("metric_type")
    tags_wo_host = F.map_filter(
        F.col("tags"), lambda k, _v: k != F.lit(host_tag)
    )
    body = F.to_json(F.struct(
        F.col("name").alias("name"),
        F.col("namespace").alias("namespace"),
        F.col("kind").alias("kind"),
        F.when(F.col("tags").isNotNull(), tags_wo_host).alias("tags"),
        F.when(mt == "counter",
               F.struct(F.col("value").alias("value"))).alias("counter"),
        F.when(mt == "gauge",
               F.struct(F.col("value").alias("value"))).alias("gauge"),
        F.when(mt == "set",
               F.struct(F.col("set_values").alias("values"))).alias("set"),
        F.when(mt == "distribution", F.struct(
            F.col("samples").alias("samples"),
            F.col("statistic").alias("statistic"),
        )).alias("distribution"),
        F.when(mt == "histogram", F.struct(
            F.col("buckets").alias("buckets"),
            F.col("agg_count").alias("count"),
            F.col("agg_sum").alias("sum"),
        )).alias("histogram"),
        F.when(mt == "summary", F.struct(
            F.col("quantiles").alias("quantiles"),
            F.col("agg_count").alias("count"),
            F.col("agg_sum").alias("sum"),
        )).alias("summary"),
    ))
    return df.select(
        *(carry or []),
        body.alias("message"),
        F.element_at("tags", host_tag).alias("host"),
    )
