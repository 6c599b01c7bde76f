"""Count-min frequency sketch + heavy hitters for corpus/telemetry scale.

Completes the probabilistic-summary family (Bloom = membership in
dedup.py, gamma-bucket DDSketch analogue = quantiles in
operators/aggregate.py, count-min = frequency here). The reference's
tag_cardinality_limit and aggregate transforms bound per-key state the
same way this sketch bounds frequency state (src/transforms/
tag_cardinality_limit.rs caches value sets per tag; a count-min table is
the standard fixed-memory generalization — Cormode & Muthukrishnan 2005).

Engine-portable by construction: positions come from the md5 hash family
(row i of value v -> int(md5("i|v")[:15 hex]) % width), so a SQL oracle
reproduces the full table and estimates bit-for-bit — the same discipline
as dedup.py's minhash/bloom tiers.

100 TB scale: the build's ONLY shuffle carries (row, col) pairs — depth
rows per element, 16 bytes each — combined map-side by count partial agg
into at most depth*width cells (4*2048 = 8192 rows default, trivially
broadcastable). Estimation broadcast-joins the cell table; sketches from
disjoint corpora MERGE by cell-wise addition (count-min is linear), so a
global sketch never requires re-scanning, matching how a production
pipeline maintains rolling frequency state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# the SAME md5 position family as the Bloom tier (dedup._bloom_positions):
# one shared implementation so the engine-portability-critical hash math
# can never drift between the two sketches' oracles
from .dedup import _bloom_positions as _cm_positions  # noqa: E402


def count_min_build(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 2048,
) -> DataFrame:
    """Build the sketch as a sparse cell table (row, col_idx, cnt)."""
    pos = df.select(
        F.posexplode(_cm_positions(F.col(value_col), depth, width))
        .alias("row", "col_idx"))
    return pos.groupBy("row", "col_idx").agg(F.count(F.lit(1)).alias("cnt"))


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of sketches built with the same (depth, width) —
    count-min is linear, so disjoint-corpus sketches union exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col_idx").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(
    df: DataFrame, sketch: DataFrame, value_col: str,
    depth: int = 4, width: int = 2048,
) -> DataFrame:
    """Estimated frequency per input row's value: min over the depth cells
    (the count-min guarantee: estimate >= true count, overcount bounded by
    colliding mass e*N/width with probability 1-(1/2)^depth)."""
    pos = df.select(
        F.col(value_col),
        F.posexplode(_cm_positions(F.col(value_col), depth, width))
        .alias("row", "col_idx"))
    joined = pos.join(F.broadcast(sketch), ["row", "col_idx"], "left")
    return (
        joined.groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def heavy_hitters(
    df: DataFrame, value_col: str, min_share: float = 0.01,
) -> DataFrame:
    """Values whose frequency is >= min_share of all rows, with exact
    counts — the phi-heavy-hitter set. Two hash aggregates (value counts
    with map-side partials, then a broadcast one-row total); hot values
    are exactly the ones partial aggregation collapses best, so the
    exchange carries at most one row per distinct value per task."""
    counts = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("cnt"))
    total = df.select(F.count(F.lit(1)).alias("_n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.col("_n") * min_share)
        .select(
            value_col,
            "cnt",
            F.round(F.col("cnt") / F.col("_n"), 6).alias("share"),
        )
    )


# --------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet et al. 2007; the engine-
# portable twin of Spark's native approx_count_distinct / HLL++, which is
# preferred at scale but not reproducible by a SQL oracle)

def hll_sketch(
    df: DataFrame, value_col: str, p: int = 12,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Register table (bucket, max_rho): h = 60-bit md5 prefix of the
    value; bucket = low p bits; rho = leading-zeros+1 of the remaining
    60-p bits (via length(bin(w)) — integer-exact in any engine, no
    floating log). The ONLY shuffle carries (bucket, rho) pairs with a
    map-side MAX partial agg into at most 2^p rows.

    `group_cols` keeps one register table PER GROUP — the approx
    distinct-per-dimension rollup (distinct users per event_type,
    distinct urls per domain). The shuffle stays (groups x 2^p)-bounded
    regardless of corpus size: the map-side MAX partial collapses every
    task's contribution before the exchange, so hot groups cost no more
    than cold ones (contrast count_distinct, whose exchange carries every
    distinct value)."""
    groups = list(group_cols or [])
    m = 1 << p
    h = (F.conv(F.substring(F.md5(F.col(value_col).cast("binary")), 1, 15), 16, 10)
         .cast("long"))
    hd = df.select(*groups, h.alias("_h"))
    # integer shift, NOT division: h/m as double loses bits above 2^53
    w = F.shiftright(F.col("_h"), p)
    rho = F.when(w > 0, F.lit(60 - p + 1) - F.length(F.bin(w))) \
           .otherwise(F.lit(60 - p + 1))
    return (
        hd.select(*groups, (F.col("_h") % m).alias("bucket"),
                  rho.cast("int").alias("rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(
    *sketches: DataFrame, group_cols: list[str] | None = None,
) -> DataFrame:
    """Bucket-wise max — HLL sketches over disjoint (or overlapping!)
    inputs merge losslessly, the property that makes the register table a
    maintainable rolling summary. Grouped sketches pass the same
    `group_cols` they were built with; the register key is EXPLICITLY
    (group_cols + bucket), and incidental extra columns (batch ids,
    ingest timestamps picked up from a sink) are projected away rather
    than silently widening the key into duplicate-bucket tables."""
    keys = [*(group_cols or []), "bucket"]
    out = sketches[0].select(*keys, "max_rho")
    for s in sketches[1:]:
        out = out.unionByName(s.select(*keys, "max_rho"))
    return out.groupBy(*keys).agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(
    sketch: DataFrame, p: int = 12, group_cols: list[str] | None = None,
) -> DataFrame:
    """One row (n_est) per group from the register table (one total row
    when ungrouped). The harmonic-mean sum is computed as the EXACT
    integer sum(2^(maxrho_scale - rho)) (every term a power of two
    <= 2^49, so the BIGINT sum is exact and engine-identical); only the
    final alpha*m^2/S division and the small-range linear-counting ln are
    floating, rounded to 4 decimals (ln/round cross-engine safety per the
    repo's oracle conventions). Standard corrections: linear counting
    when E <= 2.5m and empty buckets exist."""
    groups = list(group_cols or [])
    m = 1 << p
    scale = 60 - p + 1  # max rho value; term for rho is 2^(scale - rho)
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = sketch.groupBy(*groups).agg(
        # coalesce: an EMPTY register table (empty corpus) must estimate
        # 0.0 via the linear-counting branch, not propagate NULL
        F.coalesce(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - max_rho)")),
            F.lit(0).cast("long"),
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    # empty buckets contribute rho=0 -> 2^scale each
    s_total = (F.col("s_present")
               + (F.lit(m) - F.col("n_present")) * F.lit(1 << scale).cast("long"))
    raw = F.lit(alpha * m * m * float(1 << scale)) / s_total.cast("double")
    zeros = (F.lit(m) - F.col("n_present")).cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(*groups, F.round(est, 4).alias("n_est"))
