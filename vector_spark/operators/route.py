"""route / exclusive_route — condition-based fan-out.

Reference semantics:
  * route (/root/reference/src/transforms/route.rs:39-54): MULTI-MATCH —
    every named condition is checked; the event is *copied* to each matching
    output port; events matching nothing go to `_unmatched` (route.rs:17).
    An event can therefore reach several sinks — never model this as one
    label column.
  * exclusive_route (/root/reference/src/transforms/exclusive_route/
    transform.rs:40-51): FIRST-MATCH-WINS — exactly one port per event.

Spark-first realization: conditions are plain boolean Columns; each port is
`df.filter(cond)`. Catalyst pushes each port's condition into the shared
scan, and with a cached/checkpointed upstream the input is read once. For
a write fan-out at scale, prefer `routed_union` + a single
`write.partitionBy("route")` pass: one shuffle-free write instead of K scans.
"""

from __future__ import annotations

from functools import reduce as _reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNMATCHED = "_unmatched"


def _as_col(c: Column | str) -> Column:
    return F.expr(c) if isinstance(c, str) else c


def route(df: DataFrame, conditions: dict[str, Column | str], unmatched: bool = True) -> dict[str, DataFrame]:
    """Multi-match routing: returns {port_name: DataFrame}. Ports overlap."""
    conds = {name: _as_col(c) for name, c in conditions.items()}
    out = {name: df.filter(c) for name, c in conds.items()}
    if unmatched:
        none_match = ~_reduce(lambda a, b: a | b, [F.coalesce(c, F.lit(False)) for c in conds.values()])
        out[UNMATCHED] = df.filter(none_match)
    return out


def route_array(conditions: dict[str, Column | str], unmatched: bool = True) -> Column:
    """The matching-route names for a row, as an array Column (empty-match
    -> ['_unmatched'] when `unmatched`). Shared by routed_union and fused
    multi-sink plans that append pseudo-routes before exploding."""
    conds = {name: _as_col(c) for name, c in conditions.items()}
    arms = [
        F.when(F.coalesce(c, F.lit(False)), F.lit(name)) for name, c in conds.items()
    ]
    routes = F.array_compact(F.array(*arms))
    if unmatched:
        routes = F.when(F.size(routes) == 0, F.array(F.lit(UNMATCHED))).otherwise(routes)
    return routes


def routed_union(df: DataFrame, conditions: dict[str, Column | str], unmatched: bool = True) -> DataFrame:
    """Multi-match routing flattened to one DataFrame with a `route` column —
    an event appears once per matching route (the multi-match copy semantics).
    Single-pass alternative to `route` for partitioned sink writes:
    `routed_union(df, conds).write.partitionBy("route")`."""
    return df.withColumn("route", F.explode(route_array(conditions, unmatched)))


def exclusive_route(df: DataFrame, conditions: dict[str, Column | str]) -> DataFrame:
    """First-match-wins: adds a single `route` label column."""
    label = None
    for name, c in conditions.items():
        c = _as_col(c)
        label = F.when(c, F.lit(name)) if label is None else label.when(c, F.lit(name))
    label = F.lit(UNMATCHED) if label is None else label.otherwise(F.lit(UNMATCHED))
    return df.withColumn("route", label)
