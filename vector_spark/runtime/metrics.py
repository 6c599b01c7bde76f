"""Pipeline metrics + lineage — the Spark-native analogue of Vector's
internal event/byte counters.

Reference counters (/root/reference/lib/vector-common/src/internal_event/
events_received.rs:9-10, events_sent.rs:17-24):
`component_received_events_total`, `component_received_event_bytes_total`,
`component_sent_events_total`, `component_sent_event_bytes_total` — emitted
by every component, scraped as the source of truth for the regression
harness's ingress/egress throughput goals (BASELINE.md).

Spark-first: `DataFrame.observe(Observation, ...)` attaches aggregates that
are computed *during* the action with zero extra passes (they ride the
existing plan, accumulated per task). We attach one Observation per
instrumented component edge; after any action, `PipelineMetrics.collect()`
returns the counter map. This is exactly the executor->driver accumulator
path a 1000-executor cluster would use — no collect(), no second job.

Lineage: the reference's EventMetadata carries source_id/upstream_id
(lib/vector-core/src/event/metadata.rs); our events carry
(_source_id, _partition_id, _ingest_ts) columns, stamped at the source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_lineage(df: DataFrame, source_id: str) -> DataFrame:
    """Stamp the three lineage columns at a source boundary.
    _partition_id is the physical scan partition (spark_partition_id) —
    the unit of the checkpoint/ack protocol (checkpoint.py)."""
    return df.select(
        "*",
        F.lit(source_id).alias("_source_id"),
        F.spark_partition_id().alias("_partition_id"),
        F.current_timestamp().alias("_ingest_ts"),
    )


class PipelineMetrics:
    """Registry of per-component Observations.

    Usage:
        metrics = PipelineMetrics()
        df = metrics.instrument(df, "parse", bytes_col=F.length("html"))
        ... df.write...   # any action
        metrics.collect() -> {"parse": {"component_received_events_total": N,
                                        "component_received_event_bytes_total": B}}
    """

    def __init__(self) -> None:
        self._observations: dict[str, Observation] = {}

    def instrument(
        self,
        df: DataFrame,
        component_id: str,
        bytes_col: Column | None = None,
    ) -> DataFrame:
        if component_id in self._observations:
            raise ValueError(f"component {component_id!r} already instrumented")
        obs = Observation(component_id)
        aggs = [F.count(F.lit(1)).alias("component_received_events_total")]
        if bytes_col is not None:
            aggs.append(
                F.sum(bytes_col).cast("long").alias("component_received_event_bytes_total")
            )
        self._observations[component_id] = obs
        return df.observe(obs, *aggs)

    def collect(self) -> dict[str, dict[str, int]]:
        """Counter map for every instrumented component. Non-blocking: a
        component whose plan no action has executed yet (e.g. a resume pass
        with zero pending work never runs the instrumented scan) reports
        {} instead of waiting forever on Observation.get."""
        out: dict[str, dict[str, int]] = {}
        for name, obs in self._observations.items():
            jopt = obs._jo.getRowOrEmpty()  # Option[Row]: never blocks
            out[name] = dict(obs.get) if jopt.isDefined() else {}
        return out
