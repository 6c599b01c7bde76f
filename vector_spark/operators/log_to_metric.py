"""log_to_metric — emit 0..N metric rows per log event.

Reference: /root/reference/src/transforms/log_to_metric.rs:47-162 (config),
:400-470 (spec-mode value derivation incl. the Histogram/Summary
one-sample Distribution emissions), :489-856 (all_metrics mode
`to_metrics`): each configured MetricConfig produces a counter (by 1 or
by a field's value), gauge, set member, or a single-sample Distribution
(histogram/summary statistic) from a log field; metric name/namespace/
tags are `{{field}}` templates. `all_metrics=true` ignores the spec list
and converts metric-SHAPED log events (the metric_to_log serialization:
name/kind/tags + exactly one of counter/gauge/set/distribution/
histogram/summary) straight back into metrics — `log_to_metric_all`.

Spark-first: build one struct per metric spec and `explode` the array — a
narrow 1->N map, no shuffle, no Python. Null field values produce no metric
(matching the reference's skip-on-missing-field behavior).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class MetricSpec:
    metric_type: str  # counter | gauge | set | histogram | summary
    name: Column | str  # template-rendered name
    value: Column | None = None  # None for counter => increment by 1
    namespace: Column | str = ""
    kind: str | None = None  # default: counter/histogram/summary -> incremental, gauge/set -> absolute
    when: Column | None = None  # emission gate (condition / missing-field skip)


def log_to_metric(
    df: DataFrame,
    specs: list[MetricSpec],
    carry: list[str] | None = None,
) -> DataFrame:
    """Returns metric rows (carry..., name, namespace, kind, metric_type,
    value, statistic). Each spec may have a `when` boolean Column gating
    emission (missing-field / condition skip semantics). Histogram and
    Summary specs emit a one-sample Distribution (log_to_metric.rs:431-
    470: samples![value => 1], Incremental): metric_type="distribution",
    `statistic` histogram|summary; everything else has statistic NULL."""
    structs = []
    null_s = F.lit(None).cast("string")
    for s in specs:
        name = F.lit(s.name) if isinstance(s.name, str) else s.name
        ns = F.lit(s.namespace) if isinstance(s.namespace, str) else s.namespace
        value = F.lit(1.0) if s.value is None else s.value.cast("double")
        if s.metric_type in ("histogram", "summary"):
            kind = "incremental"
            mtype, stat = "distribution", F.lit(s.metric_type)
        else:
            kind = "incremental" if s.metric_type == "counter" else "absolute"
            mtype, stat = s.metric_type, null_s
        st = F.struct(
            name.alias("name"),
            ns.alias("namespace"),
            F.lit(s.kind or kind).alias("kind"),
            F.lit(mtype).alias("metric_type"),
            value.alias("value"),
            stat.alias("statistic"),
        )
        gate = value.isNotNull()
        if getattr(s, "when", None) is not None:
            gate = gate & s.when
        structs.append(F.when(gate, st))
    carry_cols = [F.col(c) for c in (carry or [])]
    return df.select(
        *carry_cols, F.explode(F.array_compact(F.array(*structs))).alias("m")
    ).select(*(carry or []), "m.*")


ALL_METRICS_SCHEMA = (
    "struct<name:string, namespace:string, kind:string,"
    " tags:map<string,string>,"
    " counter:struct<value:double>, gauge:struct<value:double>,"
    " set:struct<values:array<string>>,"
    " distribution:struct<samples:array<struct<value:double,rate:bigint>>,"
    " statistic:string>,"
    " histogram:struct<buckets:array<struct<upper_limit:double,"
    " count:bigint>>, count:bigint, sum:double>,"
    " summary:struct<quantiles:array<struct<quantile:double,value:double>>,"
    " count:bigint, sum:double>>"
)

# the reference picks the FIRST matching root key of the log's ObjectMap —
# a BTreeMap, so the scan order is alphabetical (log_to_metric.rs:827-843)
_VALUE_KEYS = ["counter", "distribution", "gauge", "histogram", "set",
               "summary"]


def log_to_metric_all(
    df: DataFrame,
    json_col: str = "message",
    carry: list[str] | None = None,
) -> DataFrame:
    """The `all_metrics: true` mode (log_to_metric.rs:489-856): each log
    event is a serialized metric (metric_to_log's shape) — required
    `name`, `kind` in absolute|incremental, optional namespace/tags, and
    exactly-one-of the six value objects, chosen by the reference's
    alphabetical first-present-key scan. A log failing ANY required field
    of its chosen value object is DROPPED (the reference drops the event
    on TransformError). Pure from_json + expressions, zero Python.

    Output: carry..., name, namespace, kind, metric_type, tags, plus the
    typed value columns (counter/gauge -> `value`; set -> `set_values`;
    distribution -> `samples`+`statistic`; histogram -> `buckets`+
    `agg_count`+`agg_sum`; summary -> `quantiles`+`agg_count`+`agg_sum`)."""
    m = F.from_json(F.col(json_col), ALL_METRICS_SCHEMA)
    mtype = F.coalesce(
        *[F.when(m[k].isNotNull(), F.lit(k)) for k in _VALUE_KEYS],
    )

    def _all(arr: Column, fn) -> Column:
        return F.forall(arr, fn)

    value_ok = (
        F.when(mtype == "counter", m["counter"]["value"].isNotNull())
        .when(mtype == "gauge", m["gauge"]["value"].isNotNull())
        .when(mtype == "set", m["set"]["values"].isNotNull())
        .when(
            mtype == "distribution",
            m["distribution"]["samples"].isNotNull()
            & m["distribution"]["statistic"].isin("histogram", "summary")
            & _all(m["distribution"]["samples"],
                   lambda s: s["value"].isNotNull() & s["rate"].isNotNull()),
        )
        .when(
            mtype == "histogram",
            m["histogram"]["buckets"].isNotNull()
            & m["histogram"]["count"].isNotNull()
            & m["histogram"]["sum"].isNotNull()
            & _all(m["histogram"]["buckets"],
                   lambda b: b["upper_limit"].isNotNull()
                   & b["count"].isNotNull()),
        )
        .when(
            mtype == "summary",
            m["summary"]["quantiles"].isNotNull()
            & m["summary"]["count"].isNotNull()
            & m["summary"]["sum"].isNotNull()
            & _all(m["summary"]["quantiles"],
                   lambda q: q["quantile"].isNotNull()
                   & q["value"].isNotNull()),
        )
        .otherwise(F.lit(False))
    )
    ok = (
        m["name"].isNotNull()
        & m["kind"].isin("absolute", "incremental")
        & value_ok
    )
    agg_count = (
        F.when(mtype == "histogram", m["histogram"]["count"])
        .when(mtype == "summary", m["summary"]["count"])
    )
    agg_sum = (
        F.when(mtype == "histogram", m["histogram"]["sum"])
        .when(mtype == "summary", m["summary"]["sum"])
    )
    value = (
        F.when(mtype == "counter", m["counter"]["value"])
        .when(mtype == "gauge", m["gauge"]["value"])
    )
    return df.filter(ok).select(
        *(carry or []),
        m["name"].alias("name"),
        m["namespace"].alias("namespace"),
        m["kind"].alias("kind"),
        mtype.alias("metric_type"),
        m["tags"].alias("tags"),
        value.alias("value"),
        F.when(mtype == "set", m["set"]["values"]).alias("set_values"),
        F.when(mtype == "distribution",
               m["distribution"]["samples"]).alias("samples"),
        F.when(mtype == "distribution",
               m["distribution"]["statistic"]).alias("statistic"),
        F.when(mtype == "histogram",
               m["histogram"]["buckets"]).alias("buckets"),
        F.when(mtype == "summary",
               m["summary"]["quantiles"]).alias("quantiles"),
        agg_count.alias("agg_count"),
        agg_sum.alias("agg_sum"),
    )
