"""Enrichment-table lookups as broadcast joins.

Reference: lib/enrichment/src/lib.rs:39-76 (Table trait) — `find_table_row`
(error unless exactly one match), `find_table_rows` (0..N), conditions are
AND-ed Equals (case sensitive/insensitive, lib.rs:20-35) and BetweenDates
(inclusive, lib.rs:24-28); `src/enrichment_tables/file.rs:366-445` builds a
hash index over the key columns — the exact analogue of a broadcast hash
join build side.

At scale the dim tables are small (geo/lang/domain lookups) so we force
`broadcast()`: no shuffle of the 100 TB fact side, the join runs map-side
inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.strings import ip_aton


def enrich_equi(
    df: DataFrame,
    dim: DataFrame,
    keys: list[tuple[str, str]],
    case_insensitive: bool = False,
    select: list[str] | None = None,
) -> DataFrame:
    """Left broadcast equi-join; keys = [(fact_col, dim_col), ...]."""
    if select:
        dim = dim.select(*{d for _, d in keys} | set(select))
    cond = None
    for fc, dc in keys:
        left, right = F.col(f"f.{fc}"), F.col(f"d.{dc}")
        if case_insensitive:
            left, right = F.lower(left), F.lower(right)
        c = left == right
        cond = c if cond is None else (cond & c)
    out = df.alias("f").join(broadcast(dim.alias("d")), cond, "left")
    drop = [F.col(f"d.{dc}") for _, dc in keys]
    for c in drop:
        out = out.drop(c)
    return out


def enrich_between(
    df: DataFrame,
    dim: DataFrame,
    key: tuple[str, str],
    ts_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Equality on key AND from <= ts <= to (inclusive) — the BetweenDates
    condition. Equality key keeps this a broadcast HASH join (range predicate
    applied as a post-join filter by Spark), not a BNLJ."""
    fc, dc = key
    cond = (F.col(f"f.{fc}") == F.col(f"d.{dc}")) & F.col(f"f.{ts_col}").between(
        F.col(f"d.{from_col}"), F.col(f"d.{to_col}")
    )
    return df.alias("f").join(broadcast(dim.alias("d")), cond, "left").drop(F.col(f"d.{dc}"))


def enrich_asof(
    df: DataFrame,
    dim: DataFrame,
    key: tuple[str, str],
    ts_col: str,
    dim_ts_col: str = "valid_from",
    select: list[str] | None = None,
) -> DataFrame:
    """As-of enrichment: each fact row gets the LATEST dim version whose
    `dim_ts_col` <= the fact's `ts_col` — the time-versioned lookup every
    telemetry pipeline needs (a BetweenDates table whose intervals are
    implied by version order; lib/enrichment/src/lib.rs:24-28 models the
    interval form, this derives it).

    Scale: the naive shape — join all versions then keep the max per
    event — shuffles the 100 TB fact side by event id for the dedup
    window. Instead the (tiny) dim's versions are converted into
    half-open [ts, next_ts) validity intervals with ONE lead() window
    over the dim, then a single broadcast HASH equi-join on the key with
    the interval as a residual: exactly one match per fact row by
    construction, zero fact-side shuffle, the lookup runs map-side
    inside the scan stage. Versions are assumed unique per
    (key, dim_ts) — duplicate version rows fan out (find_table_rows
    semantics), like overlapping ranges in enrich_ip_range."""
    from pyspark.sql import Window

    fc, dc = key
    keep = select or [c for c in dim.columns if c not in (dc, dim_ts_col)]
    w = Window.partitionBy(dc).orderBy(dim_ts_col)
    ivl = dim.select(dc, dim_ts_col, *keep).withColumn(
        "_valid_to", F.lead(dim_ts_col).over(w)
    )
    cond = (
        (F.col(f"f.{fc}") == F.col(f"d.{dc}"))
        & (F.col(f"f.{ts_col}") >= F.col(f"d.{dim_ts_col}"))
        & (F.col("d._valid_to").isNull()
           | (F.col(f"f.{ts_col}") < F.col("d._valid_to")))
    )
    return (
        df.alias("f")
        .join(broadcast(ivl.alias("d")), cond, "left")
        .drop(F.col(f"d.{dc}"))
        .drop(F.col(f"d.{dim_ts_col}"))
        # alias-qualified: a bare drop("_valid_to") would also remove a
        # same-named pre-existing fact column (e.g. a chained enrichment)
        .drop(F.col("d._valid_to"))
    )


def find_table_row(
    df: DataFrame,
    dim: DataFrame,
    keys: list[tuple[str, str]],
    on_ambiguous: str = "error",
    order_dim_by: str | None = None,
) -> DataFrame:
    """`find_table_row` strict semantics: exactly one dim match per fact row
    or the lookup errors (lib/enrichment/src/lib.rs:43-51). Distributed
    version: the duplicate-key check is EMBEDDED IN THE PLAN — a per-key
    window count on the (small) dim side guards the join key with
    assert_true, so building the lookup stays lazy (no Spark job at
    topology compile) and an ambiguous dim errors at action time, when
    the query actually runs."""
    from pyspark.sql import Window

    dim_keys = [dc for _, dc in keys]
    if on_ambiguous == "error":
        cnt = F.count(F.lit(1)).over(Window.partitionBy(*dim_keys))
        msg = F.concat(
            F.lit("find_table_row: ambiguous key in enrichment table: "),
            F.concat_ws(",", *[F.col(c).cast("string") for c in dim_keys]),
        )
        dc0 = dim_keys[0]
        # assert_true returns NULL on success; anchoring it on the join key
        # keeps Catalyst from pruning the check away
        guarded = F.when(F.assert_true(cnt <= 1, msg).isNull(), F.col(dc0))
        one = dim.withColumn(dc0, guarded)
    else:  # 'first': deterministic pick per key
        w_cols = [F.col(c) for c in (order_dim_by.split(",") if order_dim_by else dim.columns)]
        from pyspark.sql import Window

        w = Window.partitionBy(*dim_keys).orderBy(*w_cols)
        one = dim.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    return enrich_equi(df, one, keys)


def enrich_ip_range(
    df: DataFrame,
    dim: DataFrame,
    ip_col: str,
    start_col: str = "ip_start",
    end_col: str = "ip_end",
    prefix_bits: int = 16,
    numeric: bool = False,
    select: list[str] | None = None,
    fact_numeric: bool | None = None,
) -> DataFrame:
    """GeoIP-style IP-range lookup — the broadcast analogue of the
    reference's geoip/mmdb enrichment tables
    (src/enrichment_tables/geoip.rs:1-509, mmdb.rs:1-274: a maxminddb
    longest-prefix lookup per event). The dim carries [start, end] IPv4
    ranges (dotted strings, or uint32 longs with numeric=True) plus the
    attribute columns (country/region/...); every fact row gets the
    attributes of the range containing its IP (left join — no match ⇒
    nulls). Ranges are assumed disjoint (as geoip tables are); overlapping
    ranges emit one row per match (find_table_rows semantics).

    Scale: the naive formulation — broadcast dim + BETWEEN predicate — is a
    BroadcastNestedLoopJoin: O(ranges) comparisons per fact row. Instead we
    explode the (small) dim into the /prefix_bits blocks each range covers
    and equi-join on the fact IP's block: a broadcast HASH join with the
    BETWEEN as a residual, so the probe is O(1) per row and the whole lookup
    runs map-side inside the scan stage at 100 TB. Dim blow-up is
    ranges x blocks-per-range — pick prefix_bits so typical ranges span few
    blocks (/16 suits registry-style allocations).
    """
    shift = 32 - prefix_bits
    d = dim.alias("d")
    s_int = F.col(f"d.{start_col}").cast("long") if numeric else ip_aton(F.col(f"d.{start_col}"))
    e_int = F.col(f"d.{end_col}").cast("long") if numeric else ip_aton(F.col(f"d.{end_col}"))
    keep = select or [c for c in dim.columns if c not in (start_col, end_col)]
    exploded = d.select(
        s_int.alias("_s"),
        e_int.alias("_e"),
        *[F.col(f"d.{c}") for c in keep],
    ).withColumn(
        "_blk", F.explode(F.sequence(F.shiftright("_s", shift), F.shiftright("_e", shift)))
    )
    f = df.alias("f")
    # fact_numeric lets a numeric dim (e.g. decoded .mmdb leaves) join a
    # dotted-string fact column without materializing a converted dim
    fact_numeric = numeric if fact_numeric is None else fact_numeric
    ip_int = (
        F.col(f"f.{ip_col}").cast("long")
        if fact_numeric
        else ip_aton(F.col(f"f.{ip_col}"))
    )
    cond = (F.shiftright(ip_int, shift) == F.col("_blk")) & ip_int.between(
        F.col("_s"), F.col("_e")
    )
    return f.join(broadcast(exploded), cond, "left").drop("_s", "_e", "_blk")


def enrich_ip6_range(
    df: DataFrame,
    dim: DataFrame,
    ip_col: str,
    start_col: str = "ip_start_hex",
    end_col: str = "ip_end_hex",
    prefix_nibbles: int = 8,
    select: list[str] | None = None,
    max_blocks_per_range: int = 65536,
) -> DataFrame:
    """IPv6 twin of enrich_ip_range — the reference's geoip/mmdb tables are
    v6-capable (src/enrichment_tables/geoip.rs), so is this. The dim
    carries 32-char zero-padded lowercase hex bounds (what
    functions.mmdb.parse_mmdb6 emits); fixed width makes LEXICOGRAPHIC
    string comparison equal numeric uint128 comparison, so no 128-bit
    arithmetic is ever needed. Fact IPs are canonicalized via ipv6_expand
    (null for invalid -> left-join nulls).

    Same scale shape as the v4 operator: the dim explodes into the
    /prefix_nibbles*4 blocks each range covers (block id = leading nibbles
    as a long — 8 nibbles = /32 blocking, matching registry-sized v6
    allocations), the fact joins on its block — broadcast HASH join with
    the hex BETWEEN as a residual, never a BNLJ. Unlike the v4 twin the
    v6 block space is unbounded, so a range coarser than the blocking
    (e.g. a /16 aggregate under /32 blocks) is rejected by a
    plan-embedded assert_true at `max_blocks_per_range` blocks — lower
    `prefix_nibbles` (coarser blocks) for databases with wide
    aggregates instead of letting one row explode into millions."""
    from ..functions.strings import ipv6_expand

    d = dim.alias("d")
    keep = select or [c for c in dim.columns if c not in (start_col, end_col)]
    blk = lambda c: F.conv(F.substring(c, 1, prefix_nibbles), 16, 10).cast("long")  # noqa: E731
    span = blk(F.col("_s6x")) + F.lit(max_blocks_per_range) - 1
    guard_msg = F.concat(
        F.lit(
            f"enrich_ip6_range: dim range spans > {max_blocks_per_range} "
            f"/{prefix_nibbles * 4} blocks; lower prefix_nibbles: "
        ),
        F.col("_s6x"),
    )
    # assert_true returns NULL on success; anchoring the guard on the
    # start bound keeps Catalyst from pruning it (find_table_row pattern)
    guarded_start = F.when(
        F.assert_true(blk(F.col("_e6")) <= span, guard_msg).isNull(),
        F.col("_s6x"),
    )
    exploded = (
        d.select(
            F.col(f"d.{start_col}").alias("_s6x"),
            F.col(f"d.{end_col}").alias("_e6"),
            *[F.col(f"d.{c}") for c in keep],
        )
        .withColumn("_s6", guarded_start)
        .drop("_s6x")
        .withColumn("_blk", F.explode(F.sequence(blk(F.col("_s6")), blk(F.col("_e6")))))
    )
    f = df.alias("f")
    hex32 = F.replace(ipv6_expand(F.col(f"f.{ip_col}")), F.lit(":"), F.lit(""))
    cond = (blk(hex32) == F.col("_blk")) & hex32.between(F.col("_s6"), F.col("_e6"))
    return f.join(broadcast(exploded), cond, "left").drop("_s6", "_e6", "_blk")


def enrich_constant(df: DataFrame, fields: dict[str, object]) -> DataFrame:
    """Constant metadata enrichment — the aws_ec2_metadata analogue
    (/root/reference/src/transforms/aws_ec2_metadata.rs:95-230: every event
    gets the cached instance metadata fields). The values are resolved on
    the driver (env/instance introspection) and stamped as literal columns
    — zero per-row cost, folded by Catalyst."""
    out = df
    for name, value in fields.items():
        out = out.withColumn(name, value if isinstance(value, Column) else F.lit(value))
    return out


def find_enrichment_table_records(
    df: DataFrame,
    dim: DataFrame,
    keys: list[tuple[str, str]],
    case_insensitive: bool = False,
) -> DataFrame:
    """`find_enrichment_table_records` multi-match semantics: every dim row
    matching the key joins back (1 -> N fan-out), unlike find_table_row's
    exactly-one contract (website/cue/reference/remap/functions/
    find_enrichment_table_records.cue). Broadcast left join — facts with no
    match survive with null enrichment columns, matching the VRL
    default-on-miss arm."""
    return enrich_equi(df, dim, keys, case_insensitive=case_insensitive)


def get_enrichment_table_record(*args, **kwargs):
    """VRL `get_enrichment_table_record` (website/cue/reference/remap/
    functions/get_enrichment_table_record.cue): the strict exactly-one-
    match lookup — identical semantics to :func:`find_table_row`
    (lib/enrichment/src/lib.rs:43-51), exposed under the VRL name;
    `find_enrichment_table_records` is the 1->N sibling."""
    return find_table_row(*args, **kwargs)
