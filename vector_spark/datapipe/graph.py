"""Link-graph analytics over a crawl: fixed-iteration PageRank.

A curation pipeline uses host/page authority as a quality prior (e.g.
Common Crawl harmonic-centrality dumps). PageRank is the canonical
iterative dataflow: each iteration is join(rank, edges on src) ->
groupBy(dst) -> sum, i.e. one co-partitionable shuffle per iteration.

Determinism across engines is the hard part: double summation is
order-dependent, so three iterations of float PageRank never hash-match
an external oracle. We instead run FIXED-POINT INTEGER PageRank: ranks
are BIGINT micro-units of `scale` (default 1e12), every division is
floor (DIV), damping is an integer percentage. Floor leakage means mass
sums to <= scale — documented, deterministic, and identical in any
engine with 64-bit integers.

At 100 TB: the per-iteration shuffle on dst is inherent to PR; the edge
side should be bucketed/pre-partitioned by src once and reused across
iterations (in a materialized pipeline, write edges bucketed by src;
here the derive is narrow and re-reads the pruned scan). Unrolled
iterations keep the whole thing ONE Catalyst plan — no driver loop
actions, no RDD checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..session import ensure_parallelism


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    out_deg: int | None = None,
    id_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-point integer PageRank, `iterations` unrolled rounds.

    r0 = scale DIV n for every node; each round
      r'(v) = teleport + (damping_pct * SUM_{u->v} (r(u) DIV outdeg(u))) DIV 100
      teleport = ((100 - damping_pct) * (scale DIV n)) DIV 100
    All arithmetic is 64-bit integer with floor division, so the result
    is bit-exact in any engine. Parallel edges each carry a contribution
    (multi-edge = weight). Dangling mass is dropped (floor-leak + no
    redistribution), matching the simple formulation.

    `out_deg`: pass a constant when the graph is k-regular by
    construction (skips the degree aggregation); otherwise the out-degree
    is computed once and joined onto the edge list.

    Returns (id_col, pagerank) with pagerank in scaled micro-units.
    """
    n_row = nodes.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    base = (
        ensure_parallelism(nodes)
        .select(F.col(id_col).alias("_id"))
        .join(broadcast(n_row))
        .select("_id", F.expr(f"CAST({scale} AS BIGINT) DIV _n").alias("_r0"), "_n")
    )
    tele = F.expr(f"CAST({100 - damping_pct} AS BIGINT) * (CAST({scale} AS BIGINT) DIV _n) DIV 100")

    e = edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
    if out_deg is not None:
        e = e.withColumn("_deg", F.lit(out_deg).cast("long"))
    else:
        deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
        e = e.join(deg, "_src")

    # teleport rides along as a column so the node-count scan is read ONCE;
    # every iteration's left join keeps the full node set (dangling nodes
    # hold their teleport floor)
    r = base.select("_id", F.col("_r0").alias("_r"), tele.alias("_t"))
    for _ in range(iterations):
        inflow = (
            r.join(e, r["_id"] == e["_src"])
            .select(F.col("_dst"), F.expr("_r DIV _deg").alias("_c"))
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_in"))
        )
        r = (
            r.join(inflow, r["_id"] == inflow["_dst"], "left")
            .select(
                "_id",
                (
                    F.col("_t")
                    + F.expr(
                        f"CAST({damping_pct} AS BIGINT) * coalesce(_in, CAST(0 AS BIGINT)) DIV 100"
                    )
                ).alias("_r"),
                "_t",
            )
        )
    return r.select(F.col("_id").alias(id_col), F.col("_r").alias("pagerank"))
