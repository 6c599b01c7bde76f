"""robots.txt parsing + URL admission — the crawl-politeness gate.

A Common-Crawl-style ingest must honor robots exclusion before a page
enters the corpus. Two operators:

- `parse_robots_rules`: robots.txt content -> (host, rule, allow) rows for
  one user-agent, honoring the grouping rules of RFC 9309: consecutive
  `User-agent:` lines open ONE group that owns the rules after them; a
  group applies if any of its agent lines matches the literal agent; when
  the host has NO group for the requested agent, the `*` groups apply
  instead (RFC 9309 2.2.1 fallback). Empty rule values are no-ops and drop.
- `robots_filter`: per-URL admission by longest-match (RFC 9309 2.2.2),
  honoring the 2.2.3 special characters: `*` matches any char sequence
  and a TRAILING `$` anchors the end of the path; everything else is
  literal. The longest rule (by rule-text octets) that matches wins; on a
  length tie allow wins; no matching rule -> allowed.

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


def _applicable_lines(
    df: DataFrame, agent: str, content_col: str, key_col: str
) -> tuple[DataFrame, "F.Column"]:
    """Shared RFC 9309 group resolution: explode to lines, group by
    User-agent runs, and return (lines, applies) where `applies` marks
    lines belonging to the groups owning `agent` — or, when the host has
    none, the `*` groups (2.2.1 fallback). One shuffle (the per-host line
    window); consumers add their own record extraction on top."""
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
    lines = (
        lines.withColumn(
            "_has_agent",
            F.max((F.col("_is_ua") & (F.col("_ua") == agent.lower())).cast("int")).over(wg),
        )
        .withColumn(
            "_has_star",
            F.max((F.col("_is_ua") & (F.col("_ua") == "*")).cast("int")).over(wg),
        )
        .withColumn("_any_agent", F.max("_has_agent").over(Window.partitionBy(key_col)))
    )
    applies = (F.col("_has_agent") == 1) | (
        (F.col("_any_agent") == 0) & (F.col("_has_star") == 1)
    )
    return lines, applies


def parse_robots_rules(
    df: DataFrame,
    agent: str = "*",
    content_col: str = "robots_txt",
    key_col: str = "host",
) -> DataFrame:
    """Explode robots.txt to lines, group by User-agent runs, keep the
    groups owning `agent` — or, when the host has none, the `*` groups
    (RFC 9309 2.2.1) — and emit (host, rule, allow). One shuffle (the
    per-host line window)."""
    lines, applies = _applicable_lines(df, agent, content_col, key_col)
    # non-rule lines and valueless rules ("Disallow:" = allow-all no-op)
    # both extract an empty rule value and drop on the same filter
    kind = F.regexp_extract(F.col("_line"), _RULE_RE, 1)
    rule = F.regexp_extract(F.col("_line"), _RULE_RE, 2)
    return (
        lines.filter(applies & ~F.col("_is_ua"))
        .select(key_col, kind.alias("_kind"), rule.alias("rule"))
        .filter(F.col("rule") != "")
        .select(key_col, "rule", (F.col("_kind") == "").alias("allow"))
        .dropDuplicates([key_col, "rule", "allow"])
    )


_SITEMAP_RE = r"(?i)^\s*sitemap\s*:\s*(\S+)"
_DELAY_RE = r"(?i)^\s*crawl-delay\s*:\s*(\S+)"


def robots_sitemaps(
    df: DataFrame,
    content_col: str = "robots_txt",
    key_col: str = "host",
) -> DataFrame:
    """`Sitemap:` discovery lines — GROUP-INDEPENDENT per the sitemaps.org
    extension RFC 9309 inherits them from (a Sitemap record applies to the
    whole file, wherever it sits relative to User-agent groups). Emits
    (host, sitemap_url) distinct rows, ready to feed parse_sitemap.

    No group resolution needed -> no window, no shuffle beyond the
    distinct: a scan-speed explode + regex filter."""
    lines = ensure_parallelism(df).select(
        F.col(key_col),
        F.explode(F.split(F.col(content_col), r"\r?\n")).alias("_line"),
    )
    url = F.regexp_extract(F.col("_line"), _SITEMAP_RE, 1)
    return (
        lines.select(F.col(key_col), url.alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
        .distinct()
    )


def robots_crawl_delay(
    df: DataFrame,
    agent: str = "*",
    content_col: str = "robots_txt",
    key_col: str = "host",
) -> DataFrame:
    """`Crawl-delay:` — the de-facto politeness extension (not in RFC 9309
    but honored by Bing/Yandex; Google ignores it): GROUP-SCOPED, so the
    applicable groups are resolved exactly like Allow/Disallow. Emits
    (host, crawl_delay double) for hosts that declare one; several
    applicable groups -> the MOST CONSERVATIVE (max) delay; unparseable
    values drop. Same one-window dataflow as parse_robots_rules."""
    lines, applies = _applicable_lines(df, agent, content_col, key_col)
    delay = F.regexp_extract(F.col("_line"), _DELAY_RE, 1).try_cast("double")
    return (
        lines.filter(applies & ~F.col("_is_ua"))
        .select(F.col(key_col), delay.alias("_d"))
        .filter(F.col("_d").isNotNull())
        .groupBy(key_col)
        .agg(F.max("_d").alias("crawl_delay"))
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    path_col: str = "path",
    key_col: str = "host",
) -> DataFrame:
    """Longest-match admission: join urls to their host's rules, match
    each rule per RFC 9309 2.2.3 — `*` = any char sequence, a TRAILING
    `$` anchors the end, all else literal — pick (longest rule text,
    allow-wins-tie, rule text) and default allowed on no match. Returns
    urls + `allowed` boolean.

    The rule is translated to an anchored regex AS AN EXPRESSION (escape
    regex metachars, `*` -> `.*`, trailing `$` kept as the anchor), so
    matching stays JVM-side; RLIKE with a per-row pattern recompiles per
    rule, which is fine because the rules side is per-host-small.

    At scale: the rules side is per-host-small — hash join on host; the
    top-1 window partitions by (host, url), both shuffles carry
    (url, rule) pairs only."""
    esc = F.regexp_replace(F.col("rule"), r"([\\.\[\]\{\}\(\)\^\$\+\?\|])", r"\\$1")
    esc = F.regexp_replace(esc, r"\*", ".*")
    rx = F.when(
        F.col("rule").endswith("$"),
        F.concat(F.lit("^"), F.expr("substring(_esc, 1, length(_esc) - 2)"), F.lit("$")),
    ).otherwise(F.concat(F.lit("^"), F.col("_esc")))
    cand = (
        urls.join(rules, key_col, "left")
        .withColumn("_esc", esc)
        .withColumn("_rx", rx)
        .withColumn(
            "_m",
            F.col("rule").isNotNull() & F.expr(f"{path_col} RLIKE _rx"),
        )
    )
    w = Window.partitionBy(key_col, url_col).orderBy(
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
