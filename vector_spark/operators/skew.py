"""Skew-aware aggregation — the explicit salting lever for hot keys.

At 10^12 pages a handful of domains hold ~10% of rows (the generator
reproduces this: sources/pages.py draws domains log-uniformly). A plain
groupBy(domain) sends every hot-domain row to one reducer; salting splits
each key across `salt_buckets` reducers (phase 1) and re-merges the tiny
partials (phase 2). AQE's skew handling covers joins; aggregation salting
is ours to do.

Only works for algebraic aggregates (sum/count/min/max — anything with a
merge function). For holistic aggregates use two-level sketches instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (phase1 agg, phase2 merge) per supported strategy
_ALGEBRAIC = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    group_by: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs: {out_col: (strategy, in_col)} with algebraic strategies only.
    salt_on: expression to salt by (default: a uniform hash of the full
    row's group key + a per-partition component via spark_partition_id —
    deterministic result, uniform spread).
    """
    for name, (strategy, _) in aggs.items():
        if strategy not in _ALGEBRAIC:
            raise ValueError(
                f"{name}: strategy {strategy!r} is not algebraic; "
                f"supported: {sorted(_ALGEBRAIC)}"
            )
    salt = (
        F.pmod(salt_on, F.lit(salt_buckets))
        if salt_on is not None
        else F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    phase1 = df.groupBy(*group_by, salt.alias("_salt")).agg(
        *[
            _ALGEBRAIC[s][0](F.col(col)).alias(f"_p_{name}")
            for name, (s, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*group_by).agg(
        *[
            _ALGEBRAIC[s][1](F.col(f"_p_{name}")).alias(name)
            for name, (s, col) in aggs.items()
        ]
    )
