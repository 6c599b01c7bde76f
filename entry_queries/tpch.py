"""TPC-H relational checklist (SURVEY §2.9): all 22 queries + oracles."""

from .common import *  # noqa: F401,F403
from .common import _t, _dsum, DSUM_SQL, ROUTES
from .common import _BP_NAV, _BP_LEAD, _BP_TAIL  # noqa: F401
from .oracle_helpers import (  # noqa: F401
    _boilerplate_sql,
    _hexval_sql,
    _simhash_sql,
    _minhash_sql,
    _aggregate_sketch_sql,
    _langid_sql,
    _repetition_sql,
    _ann_lsh_sql,
    _near_dup_sql,
    _html_text_sql,
)

def q_tpch_q1(spark, sf_dir):
    from vector_spark.session import ensure_parallelism

    li = ensure_parallelism(_t(spark, sf_dir, "lineitem"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_tpch_q3(spark, sf_dir):
    from vector_spark.session import ensure_parallelism

    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = ensure_parallelism(_t(spark, sf_dir, "lineitem"))
    revenue = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    return revenue.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)


# ---- training-data ops ----------------------------------------------------

def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): five-way join with broadcast dims,
    hash agg, deterministic ordering — the relational-depth probe for the
    §2.9 checklist. Customer and supplier must share the nation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    out = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), (o.o_custkey == c.c_custkey))
        .join(broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(25,6)"
                )
            ).alias("_r")
        )
    )
    # decimal-domain round: .xx5 ties round HALF_UP in both engines
    return out.select("n_name", F.round(F.col("_r"), 2).cast("double").alias("revenue"))


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): pure scan + filter + one
    global agg — the predicate-pushdown probe."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(25,6)")
        ).alias("_r")
    )
    return out.select(F.round(F.col("_r"), 2).cast("double").alias("revenue"))


def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customer): agg-derived semi-join set
    (HAVING sum > 200), three-way join with a broadcast customer dim,
    re-aggregation, deterministic top-100 (totalprice desc, date,
    orderkey tie-break) — the agg-in-subquery + top-k shape q1/q3/q5/q6
    don't cover."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("_q"))
        .filter(F.col("_q") > 200)
        .select(F.col("l_orderkey").alias("_big_ok"))
    )
    out = (
        o.join(big, o["o_orderkey"] == big["_big_ok"]).drop("_big_ok")
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum(F.col("l_quantity"), "sum_qty"))
        .orderBy(
            F.desc("o_totalprice"), F.col("o_orderdate"), F.col("o_orderkey")
        )
        .limit(100)
    )
    return out.select(
        "c_name", "c_custkey", "o_orderkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "sum_qty",
    )


def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking): LEFT SEMI join — orders in
    a quarter having at least one late lineitem. The testdata schema lacks
    l_commitdate/l_receiptdate, so "late" is adapted to
    l_shipdate > o_orderdate; the shape (EXISTS -> LeftSemi, correlated
    non-equi residual on the join) is the point. The lineitem side carries
    only (l_orderkey, l_shipdate) through the join — ids-only at 100 TB."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    late = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            late,
            (o.o_orderkey == late.l_orderkey) & (late.l_shipdate > o.o_orderdate),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer distribution): LEFT OUTER join customer->orders
    (keeping order-less customers as count 0) with a join-side predicate,
    then a second aggregation over the counts — the outer-join +
    agg-of-agg shape. count("o_orderkey") counts matched rows only, the
    standard q13 trick."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): LEFT ANTI join
    (NOT IN excluded suppliers) + COUNT DISTINCT per part group. Adapted to
    the trimmed schema: the part-supplier relationship comes from lineitem
    (no partsupp table) and the supplier exclusion is s_acctbal < 2000 (no
    s_comment). Both dims broadcast; lineitem carries only
    (l_partkey, l_suppkey) through the shuffle."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").startswith("PROMO"))
        & F.col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 2000).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): scalar subquery (global
    avg of positive balances, broadcast as a 1-row cross join) + LEFT ANTI
    correlated NOT EXISTS. Adapted: cntrycode := c_nationkey (no c_phone)
    and the anti-join excludes customers with any URGENT order (every
    customer has orders in the testdata). Threshold = exact decimal sum /
    count in double — bit-identical in both engines."""
    c = _t(spark, sf_dir, "customer")
    thresh = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("t")
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.join(broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("t"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(F.count(F.lit(1)).alias("numcust"), _dsum(F.col("c_acctbal"), "totacctbal"))
    )


def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): correlated extremum subquery.
    Adapted to the trimmed schema: the part-supplier relation comes from
    DISTINCT lineitem pairs (no partsupp), the correlated extremum is
    max(s_acctbal) per part (no ps_supplycost), parts are p_type='ECONOMY'
    and suppliers sit in region EUROPE. Everything but lineitem is
    broadcast; lineitem contributes only its distinct (partkey, suppkey)
    pairs. Deterministic top-100 with full tie-breaks."""
    ps = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cand = (
        ps.join(broadcast(p), ps.l_partkey == p.p_partkey)
        .join(broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "p_type", "s_name", "n_name", "s_acctbal")
    )
    best = cand.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.max("s_acctbal").alias("_best")
    )
    return (
        cand.join(
            broadcast(best),
            (cand.p_partkey == best._pk) & (cand.s_acctbal == best._best),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping): two nation-dim joins on different keys
    (supplier nation vs customer nation) with a symmetric nation-pair
    predicate, yearly revenue rollup. NATION_15/NATION_19 replace
    FRANCE/GERMANY. Both nation dims broadcast under distinct aliases."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_15") & (F.col("cust_nation") == "NATION_19")
    ) | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_15"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n1), F.col("s_nationkey") == F.col("_snk"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("_cnk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        # round in the DECIMAL domain (HALF_UP both engines) — round(double)
        # resolves .xx5 ties differently in Spark vs DuckDB
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(25,6)"
                )
            ).alias("_r")
        )
        .select(
            "supp_nation", "cust_nation", "l_year",
            F.round(F.col("_r"), 2).cast("double").alias("revenue"),
        )
    )


def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 (national market share): conditional-aggregate ratio —
    share of NATION_21-supplied revenue among AMERICA-region customers for
    ECONOMY parts, per order year. Both sums are exact decimal sums cast
    to double, so the ratio is the same IEEE division in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    ncust = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    nsupp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(ncust), F.col("c_nationkey") == ncust.n_nationkey)
        .join(broadcast(r), ncust.n_regionkey == r.r_regionkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(nsupp), F.col("s_nationkey") == F.col("_snk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            _dsum(F.when(F.col("supp_nation") == "NATION_21", vol).otherwise(0.0), "_nat"),
            _dsum(vol, "_tot"),
        )
        .select(
            "o_year", F.round(F.col("_nat") / F.col("_tot"), 6).alias("mkt_share")
        )
    )


def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 (product-type profit): LIKE-filtered part dim fanned across
    every supplier nation and order year. Adapted: profit =
    revenue − 0.1·p_retailprice·l_quantity (no ps_supplycost); parts are
    '%widget%'. The profit expression is one IEEE double per row, cast to
    DECIMAL(25,6) before the sum on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    n = _t(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit.cast("decimal(25,6)")).alias("_p"))
        # 2-dp rounding happens in the DECIMAL domain (HALF_UP in both
        # engines: Spark round-on-decimal == DuckDB round-on-decimal),
        # never on the double — round(double, 2) resolves .xx5 ties by
        # decimal-string in Spark but by binary value in DuckDB.
        .select(
            "nation", "o_year",
            F.round(F.col("_p"), 2).cast("double").alias("sum_profit"),
        )
    )


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): quarter of orders × returned
    lineitems, grouped per customer with the nation dim, deterministic
    top-20 by unrounded revenue (identical doubles in both engines) with a
    c_custkey tie-break."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(25,6)"
                )
            ).alias("_rev")
        )
        .orderBy(F.desc("_rev"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey", "c_name",
            F.round(F.col("_rev"), 2).cast("double").alias("revenue"),
            "c_acctbal", "n_name",
        )
    )


def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 (important stock): per-part value with a HAVING threshold
    that is a scalar subquery over the SAME filtered set (broadcast 1-row
    cross join). Adapted: value = revenue shipped by EUROPE-region
    suppliers (no partsupp); threshold = 1.3x the mean per-part value
    (total / distinct parts — scale-free, unlike TPC-H's 0.0001/SF
    fraction, so the query keeps selecting rows at every SF). Both sides
    of the comparison are decimal-sum doubles scaled by the same
    literal."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    base = (
        li.join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_v"),
        )
    )
    per_part = base.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        F.sum(F.col("_v").cast("decimal(25,6)")).alias("_val")
    )
    total = base.agg(
        _dsum(F.col("_v"), "_tot"),
        F.countDistinct("l_partkey").alias("_np"),
    )
    return (
        per_part.join(broadcast(total))
        .filter(
            F.col("_val").cast("double") > F.lit(1.3) * F.col("_tot") / F.col("_np")
        )
        .select("ps_partkey", F.round(F.col("_val"), 2).cast("double").alias("value"))
    )


def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 (shipping modes / priority): join + dual conditional
    counts. Adapted: l_returnflag stands in for l_shipmode and "late" is
    l_shipdate > o_orderdate (no commit/receipt dates); counts split by
    URGENT/HIGH vs the rest, FILTER-style on both engines (BIGINT)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy(F.col("l_returnflag").alias("shipmode"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect): conditional-revenue ratio over a
    two-month ship window — 100·PROMO revenue / total revenue, both exact
    decimal sums cast to double before one IEEE division."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-03-01")
    )
    p = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            _dsum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0), "_promo"),
            _dsum(vol, "_tot"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("_promo") / F.col("_tot"), 6).alias(
                "promo_revenue"
            )
        )
    )


def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): revenue-per-supplier view over a quarter,
    filtered to the max via a broadcast 1-row scalar subquery — the
    equality is on unrounded decimal-sum doubles, identical in both
    engines, so ties (all qualifying suppliers) surface in both."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("_sk")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)")
        ).alias("_rev")
    )
    mx = rev.agg(F.max("_rev").alias("_mx"))
    return (
        rev.join(broadcast(mx))
        .filter(F.col("_rev") == F.col("_mx"))
        .join(broadcast(s), F.col("_sk") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            F.round(F.col("_rev"), 2).cast("double").alias("total_revenue"),
        )
    )


def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): correlated per-part AVG
    threshold — lineitems under 20% of their part's mean quantity, summed
    and divided by 7. Adapted part filter: Brand#13 MEDIUM (no
    p_container). The per-part average is an exact decimal sum / count in
    double; the 0.2 scaling is the same IEEE multiply on both engines."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#13") & (F.col("p_type") == "MEDIUM")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg")
    )
    return (
        li.join(broadcast(avg_q), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("_avg"))
        .agg(_dsum(F.col("l_extendedprice"), "_s"))
        .select((F.round(F.col("_s") / 7.0, 2)).alias("avg_yearly"))
    )


def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue): disjunction-of-conjunctions
    predicate spanning both join sides — the OR-of-ANDs pushdown probe.
    Adapted: p_size bands replace p_container/shipmode."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(20, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        j.filter(cond)
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(25,6)"
                )
            ).alias("_r")
        )
        .select(F.round(F.col("_r"), 2).cast("double").alias("revenue"))
    )


def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 (potential part promotion): double-nested semi-join —
    EUROPE suppliers whose 1996 shipped quantity of any 'small%' part
    exceeds 30% of that part's total (correlated aggregate threshold; no
    ps_availqty). Candidate supplier ids are distinct before the final
    semi-join, so the shuffle carries ids only."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_suppkey", "l_partkey", "l_quantity")
    )
    per_sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double").alias("_sq")
    )
    per_p = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double").alias("_tq")
    )
    cand = (
        per_sp.join(broadcast(per_p), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("_sq") > F.lit(0.3) * F.col("_tq"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(cand, s.s_suppkey == cand.l_suppkey, "leftsemi")
        .select("s_name", "s_acctbal")
    )


def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting): the EXISTS +
    NOT-EXISTS self-join pair on lineitem — multi-supplier 'F' orders
    where ONLY this supplier was late. Adapted: late means shipped >30
    days after o_orderdate (no receipt/commit dates); supplier scope is
    region EUROPE. The order join happens once; both the semi and the
    anti side reuse the same (orderkey, suppkey, late) projection, so the
    self-joins carry three columns."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lo = (
        _t(spark, sf_dir, "lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ).alias("_late"),
        )
    )
    l1 = lo.filter(F.col("_late"))
    l2 = lo.select(F.col("l_orderkey").alias("_k2"), F.col("l_suppkey").alias("_s2"))
    l3 = lo.filter(F.col("_late")).select(
        F.col("l_orderkey").alias("_k3"), F.col("l_suppkey").alias("_s3")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("_k2")) & (F.col("l_suppkey") != F.col("_s2")),
            "leftsemi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("_k3")) & (F.col("l_suppkey") != F.col("_s3")),
            "leftanti",
        )
    )
    return (
        waiting.join(broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )




def oracles() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["tpch_q1"] = f"""
SELECT l_returnflag, l_linestatus,
       {DSUM_SQL.format(col='l_quantity', alias='sum_qty')},
       {DSUM_SQL.format(col='l_extendedprice', alias='sum_base_price')},
       {DSUM_SQL.format(col='l_extendedprice * (1 - l_discount)', alias='sum_disc_price')},
       {DSUM_SQL.format(col='l_extendedprice * (1 - l_discount) * (1 + l_tax)', alias='sum_charge')},
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

    sql["tpch_q3"] = f"""
SELECT o_orderkey,
       {DSUM_SQL.format(col='l_extendedprice * (1 - l_discount)', alias='revenue')}
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

    sql["tpch_q5"] = """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""

    sql["tpch_q6"] = """
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

    sql["tpch_q18"] = """
SELECT c_name, c_custkey, o_orderkey,
       epoch_us(o_orderdate) AS o_orderdate_us,
       round(o_totalprice, 2) AS o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(25,6))) > 200
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""

    sql["tpch_q4"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
"""

    sql["tpch_q13"] = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""

    sql["tpch_q16"] = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000
  )
GROUP BY p_brand, p_type, p_size
"""

    sql["tpch_q22"] = f"""
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       {DSUM_SQL.format(col='c_acctbal', alias='totacctbal')}
FROM customer c
WHERE c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / count(*)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
"""

    sql["tpch_q2"] = """
WITH cand AS (
  SELECT p_partkey, p_type, s_name, n_name, s_acctbal
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
  JOIN part     ON ps.l_partkey = p_partkey
  JOIN supplier ON ps.l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type
FROM cand c
WHERE s_acctbal = (SELECT max(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

    sql["tpch_q7"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_15' AND n2.n_name = 'NATION_19')
   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_15')
GROUP BY 1, 2, 3
"""

    sql["tpch_q8"] = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(
         CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_21'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE),
         6) AS mkt_share
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN part      ON l_partkey = p_partkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
"""

    sql["tpch_q9"] = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           - 0.1 * p_retailprice * l_quantity
                           AS DECIMAL(25,6))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""

    sql["tpch_q10"] = """
SELECT c_custkey, c_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) DESC,
         c_custkey
LIMIT 20
"""

    sql["tpch_q11"] = """
WITH base AS (
  SELECT l_partkey, l_extendedprice * (1 - l_discount) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT l_partkey AS ps_partkey,
       CAST(round(sum(CAST(v AS DECIMAL(25,6))), 2) AS DOUBLE) AS value
FROM base
GROUP BY 1
HAVING CAST(sum(CAST(v AS DECIMAL(25,6))) AS DOUBLE) >
       (SELECT 1.3 * CAST(sum(CAST(v AS DECIMAL(25,6))) AS DOUBLE)
               / count(DISTINCT l_partkey) FROM base)
"""

    sql["tpch_q12"] = """
SELECT l_returnflag AS shipmode,
       CAST(count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS BIGINT) AS high_line_count,
       CAST(count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate
GROUP BY 1
"""

    sql["tpch_q14"] = """
SELECT round(
         100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE),
         6) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-03-01'
"""

    sql["tpch_q15"] = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(round(r, 2) AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT max(r) FROM rev)
"""

    sql["tpch_q17"] = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13' AND p_type = 'MEDIUM'
),
avg_q AS (
  SELECT l_partkey AS pk,
         CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS a
  FROM li GROUP BY 1
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM li JOIN avg_q ON l_partkey = pk
WHERE l_quantity < 0.2 * a
"""

    sql["tpch_q19"] = """
SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""

    sql["tpch_q20"] = """
WITH li AS (
  SELECT l_suppkey, l_partkey, l_quantity
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
),
sp AS (
  SELECT l_suppkey, l_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sq
  FROM li GROUP BY 1, 2
),
tp AS (
  SELECT l_partkey AS pk,
         CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS tq
  FROM li GROUP BY 1
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey FROM sp JOIN tp ON sp.l_partkey = tp.pk WHERE sq > 0.3 * tq
  )
"""

    sql["tpch_q21"] = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 30 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, count(*) AS numwait
FROM lo l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND l1.late
  AND EXISTS (
    SELECT 1 FROM lo l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lo l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.late
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


    return sql


QUERIES = {
    "tpch_q1": q_tpch_q1,
    "tpch_q10": q_tpch_q10,
    "tpch_q11": q_tpch_q11,
    "tpch_q12": q_tpch_q12,
    "tpch_q13": q_tpch_q13,
    "tpch_q14": q_tpch_q14,
    "tpch_q15": q_tpch_q15,
    "tpch_q16": q_tpch_q16,
    "tpch_q17": q_tpch_q17,
    "tpch_q18": q_tpch_q18,
    "tpch_q19": q_tpch_q19,
    "tpch_q2": q_tpch_q2,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
    "tpch_q22": q_tpch_q22,
    "tpch_q3": q_tpch_q3,
    "tpch_q4": q_tpch_q4,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
}
