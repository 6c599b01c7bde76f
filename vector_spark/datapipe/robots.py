"""robots.txt parsing + URL admission — the crawl-politeness gate.

A Common-Crawl-style ingest must honor robots exclusion before a page
enters the corpus. Two operators:

- `parse_robots_rules`: robots.txt content -> (host, rule, allow) rows for
  one user-agent, honoring the grouping rules of RFC 9309: consecutive
  `User-agent:` lines open ONE group that owns the rules after them; a
  group applies if any of its agent lines matches (we match one literal
  agent, default `*`). Empty rule values are no-ops and drop.
- `robots_filter`: per-URL admission by longest-match (RFC 9309 §2.2.2):
  the longest rule that prefix-matches the path wins; on a length tie
  allow wins; no matching rule -> allowed.

Both are window/join dataflows keyed by host — at 100 TB the robots side
is per-HOST (millions of rows, not trillions) so every window partitions
by host and the admission join broadcasts or hash-joins on host. No
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import ensure_parallelism

_UA_RE = r"^\s*[Uu][Ss][Ee][Rr]-[Aa][Gg][Ee][Nn][Tt]\s*:\s*(\S+)"
_RULE_RE = r"^\s*([Dd][Ii][Ss])?[Aa][Ll][Ll][Oo][Ww]\s*:\s*(\S*)"


def parse_robots_rules(
    df: DataFrame,
    agent: str = "*",
    content_col: str = "robots_txt",
    key_col: str = "host",
) -> DataFrame:
    """Explode robots.txt to lines, group by User-agent runs, keep the
    groups owning `agent`, emit (host, rule, allow). One shuffle (the
    per-host line window)."""
    lines = ensure_parallelism(df).select(
        F.col(key_col),
        F.posexplode(F.split(F.col(content_col), r"\r?\n")).alias("_pos", "_line"),
    )
    is_ua = F.regexp_extract(F.col("_line"), _UA_RE, 1) != ""
    ua = F.lower(F.regexp_extract(F.col("_line"), _UA_RE, 1))
    w = Window.partitionBy(key_col).orderBy("_pos")
    lines = lines.select(
        key_col, "_pos", "_line", is_ua.alias("_is_ua"), ua.alias("_ua")
    ).withColumn(
        "_grp",
        F.sum(
            (F.col("_is_ua") & ~F.lag("_is_ua", 1, False).over(w)).cast("int")
        ).over(w),
    )
    wg = Window.partitionBy(key_col, "_grp")
    lines = lines.withColumn(
        "_has_agent",
        F.max((F.col("_is_ua") & (F.col("_ua") == agent.lower())).cast("int")).over(wg),
    )
    # non-rule lines and valueless rules ("Disallow:" = allow-all no-op)
    # both extract an empty rule value and drop on the same filter
    kind = F.regexp_extract(F.col("_line"), _RULE_RE, 1)
    rule = F.regexp_extract(F.col("_line"), _RULE_RE, 2)
    return (
        lines.filter((F.col("_has_agent") == 1) & ~F.col("_is_ua"))
        .select(key_col, kind.alias("_kind"), rule.alias("rule"))
        .filter(F.col("rule") != "")
        .select(key_col, "rule", (F.col("_kind") == "").alias("allow"))
        .dropDuplicates([key_col, "rule", "allow"])
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    path_col: str = "path",
    key_col: str = "host",
) -> DataFrame:
    """Longest-match admission: join urls to their host's rules, keep
    prefix matches, pick (longest rule, allow-wins-tie, rule text) and
    default allowed on no match. Returns urls + `allowed` boolean.

    At scale: the rules side is per-host-small — hash join on host; the
    top-1 window partitions by the unique url, both shuffles carry
    (url, rule) pairs only."""
    cand = (
        urls.join(rules, key_col, "left")
        .withColumn(
            "_m",
            F.col("rule").isNotNull() & F.col(path_col).startswith(F.col("rule")),
        )
    )
    w = Window.partitionBy(url_col).orderBy(
        F.col("_m").desc(),
        F.length("rule").desc(),
        F.col("allow").desc(),
        F.col("rule").asc(),
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *[F.col(c) for c in urls.columns],
            F.when(F.col("_m"), F.col("allow")).otherwise(F.lit(True)).alias("allowed"),
        )
    )
