"""log_to_metric — emit 0..N metric rows per log event.

Reference: /root/reference/src/transforms/log_to_metric.rs:47-162 (config),
:780 (to_metrics): each configured MetricConfig produces a counter (by 1 or
by a field's value), gauge, or set member from a log field; metric
name/namespace/tags are `{{field}}` templates.

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
    metric_type: str  # counter | gauge | set
    name: Column | str  # template-rendered name
    value: Column | None = None  # None for counter => increment by 1
    namespace: Column | str = ""
    kind: str = "incremental"  # counter default; gauge/set are absolute


def log_to_metric(df: DataFrame, specs: list[MetricSpec]) -> DataFrame:
    """Returns metric rows (name, namespace, kind, metric_type, value)."""
    structs = []
    for s in specs:
        name = F.lit(s.name) if isinstance(s.name, str) else s.name
        ns = F.lit(s.namespace) if isinstance(s.namespace, str) else s.namespace
        value = F.lit(1.0) if s.value is None else s.value.cast("double")
        kind = "incremental" if s.metric_type == "counter" else "absolute"
        st = F.struct(
            name.alias("name"),
            ns.alias("namespace"),
            F.lit(s.kind or kind).alias("kind"),
            F.lit(s.metric_type).alias("metric_type"),
            value.alias("value"),
        )
        # skip when the source value is null (missing field)
        structs.append(F.when(value.isNotNull(), st))
    return df.select(F.explode(F.array_compact(F.array(*structs))).alias("m")).select("m.*")
