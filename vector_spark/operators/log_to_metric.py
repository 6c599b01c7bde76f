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
    kind: str | None = None  # default: counter -> incremental, gauge/set -> absolute
    when: Column | None = None  # emission gate (condition / missing-field skip)


def log_to_metric(
    df: DataFrame,
    specs: list[MetricSpec],
    carry: list[str] | None = None,
) -> DataFrame:
    """Returns metric rows (carry..., name, namespace, kind, metric_type,
    value). Each spec may have a `when` boolean Column gating emission
    (missing-field / condition skip semantics)."""
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
        gate = value.isNotNull()
        if getattr(s, "when", None) is not None:
            gate = gate & s.when
        structs.append(F.when(gate, st))
    carry_cols = [F.col(c) for c in (carry or [])]
    return df.select(
        *carry_cols, F.explode(F.array_compact(F.array(*structs))).alias("m")
    ).select(*(carry or []), "m.*")
