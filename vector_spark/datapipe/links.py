"""Hyperlink extraction and host-graph construction from crawled HTML.

A web-corpus pipeline needs the link graph for authority priors
(PageRank/harmonic centrality over hosts — the Common Crawl ranking
recipe), for frontier expansion, and for anchor-text datasets. This
module harvests ``<a href>`` targets and anchor text from the raw HTML
column, resolves relative references against the page URL (RFC 3986
merge, simplified to the directory-of-base rule), normalizes the
result with the same canonicalization the URL-curation pass uses
(urls.py::url_normalize_exprs), and aggregates host-level edges that
feed graph.py::pagerank.

Everything is pure column expressions under whole-stage codegen —
regexp_extract_all for the anchor elements, per-element ``transform``
lambdas for href/anchor-text, one explode. Zero Python, zero shuffles
until the optional host_edges aggregation (one map-side-combining
groupBy on (src_host, dst_host) — host-pair cardinality, not page
cardinality, crosses the exchange).

At 100 TB: link extraction is scan-speed and embarrassingly parallel;
the explode multiplies rows ~50x (median links/page) but rows are
(host, host, short strings) — project BEFORE exploding so page text
never rides along. The host-edge aggregate shuffles only distinct host
pairs (~1e9 at full crawl scale — fine); the per-URL edge list, if
needed, should be written partitioned by bucket(src_host) so the
PageRank join is co-partitioned (graph.py docstring).

No reference-engine counterpart operator; the URL component semantics
follow the reference's VRL parse_url documentation
(website/cue/reference/remap/functions/parse_url.cue), and the
anchor/href handling is standard HTML (double- or single-quoted
attribute values; non-http(s) schemes, fragment-only and empty hrefs
dropped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from .urls import url_normalize_exprs

# full anchor elements, case-insensitive, inner content may span lines
ANCHOR_RE = r"(?i)<a\s[^>]*>[\s\S]*?</a>"
# href value in either quote style (lax: quotes may mismatch — harmless)
HREF_RE = "(?i)href\\s*=\\s*['\"]([^'\"]*)['\"]"
# HTML5 unquoted attribute value: runs to whitespace or '>'; cannot
# START with a quote (keeps the two patterns disjoint, so an empty
# quoted href stays empty instead of matching the closing quote)
HREF_UNQUOTED_RE = "(?i)href\\s*=\\s*([^\\s'\">][^\\s>]*)"
TAG_RE = r"<[^>]*>"
# an absolute reference: scheme ':' per RFC 3986 §3.1
SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"


def resolve_href(href: Column, scheme: Column, authority: Column, base_dir: Column) -> Column:
    """Resolve one href against the page's (scheme, authority, base_dir).

    Returns NULL for references that are not crawlable http(s) URLs:
    empty, fragment-only, or an absolute reference with a non-http(s)
    scheme (mailto:, javascript:, data:, tel:, ...).

      absolute http(s)     -> as-is
      other absolute       -> NULL (dropped)
      //network-path       -> page scheme + ':' + href
      /absolute-path       -> scheme://authority + href
      relative path        -> scheme://authority + base_dir + href
    """
    is_abs = href.rlike(SCHEME_RE)
    return (
        F.when((href == "") | href.startswith("#"), F.lit(None))
        .when(
            is_abs,
            F.when(
                F.lower(href).startswith("http://") | F.lower(href).startswith("https://"),
                href,
            ).otherwise(F.lit(None)),
        )
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(scheme, F.lit("://"), authority, href))
        .otherwise(F.concat(scheme, F.lit("://"), authority, base_dir, href))
    )


def extract_links(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Explode every page into its outgoing links.

    Output columns: ``keep_cols...``, src_url, src_host, link_pos
    (0-based position among ALL anchor elements, before junk filtering,
    so positions are stable), dst_url (canonicalized — tracking params
    dropped, query sorted, default port and fragment removed), dst_host,
    dst_domain (registrable, urls.py heuristic), anchor (inner text,
    tags stripped, trimmed), is_internal (dst_host == src_host).

    Pages with zero crawlable links produce zero rows. The page text /
    html column does NOT survive into the output projection, so the
    explode multiplies only short link strings.
    """
    html = F.col(html_col)
    if isinstance(df.schema[html_col].dataType, BinaryType):
        html = F.decode(html, "UTF-8")

    src = url_normalize_exprs(F.col(url_col))
    scheme = src["scheme"]
    # raw authority (host[:port]) lowercased — default-port stripping
    # happens in the dst normalization pass, not here
    authority = F.lower(F.coalesce(F.parse_url(F.col(url_col), F.lit("AUTHORITY")), F.lit("")))
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit(""))
    base_dir = F.regexp_replace(path, r"[^/]*$", "")
    base_dir = F.when(base_dir == "", F.lit("/")).otherwise(base_dir)

    anchors = F.regexp_extract_all(html, F.lit(ANCHOR_RE), 0)
    # project down BEFORE the explode: only short derived strings multiply
    narrow = df.select(
        *keep_cols,
        F.col(url_col).alias("src_url"),
        src["host"].alias("src_host"),
        scheme.alias("_scheme"),
        authority.alias("_auth"),
        base_dir.alias("_bdir"),
        anchors.alias("_anchors"),
    )
    exploded = narrow.select(
        *keep_cols,
        "src_url",
        "src_host",
        "_scheme",
        "_auth",
        "_bdir",
        F.posexplode("_anchors").alias("link_pos", "_a"),
    )
    quoted = F.regexp_extract(F.col("_a"), HREF_RE, 1)
    href = F.when(quoted != "", quoted).otherwise(
        F.regexp_extract(F.col("_a"), HREF_UNQUOTED_RE, 1)
    )
    resolved = resolve_href(href, F.col("_scheme"), F.col("_auth"), F.col("_bdir"))
    anchor = F.trim(F.regexp_replace(F.col("_a"), TAG_RE, ""))
    dst = url_normalize_exprs(resolved)
    return (
        exploded.select(
            *keep_cols,
            "src_url",
            "src_host",
            "link_pos",
            dst["url_norm"].alias("dst_url"),
            dst["host"].alias("dst_host"),
            dst["domain"].alias("dst_domain"),
            anchor.alias("anchor"),
            resolved.alias("_resolved"),
        )
        .filter(F.col("_resolved").isNotNull())
        .drop("_resolved")
        .withColumn("is_internal", F.col("dst_host") == F.col("src_host"))
    )


def anchor_stats(links: DataFrame, by: str = "dst_host", k: int = 5) -> DataFrame:
    """Anchor-text dataset: per link target, in-link volume and the top-k
    anchor texts — the (query, document) surrogate pairs used for
    retrieval/ranking training data and for title synthesis.

    Output: (``by``, n_links, n_anchors, top_anchors) where top_anchors is
    the '|'-joined top-k anchors by count DESC then anchor ASC (binary
    string order — engine-stable tie-break).

    Two hash aggregates: (target, anchor) counts with map-side partials —
    hot targets collapse before the exchange — then a per-target fold of
    its DISTINCT-anchor rows (bounded by the target's anchor vocabulary,
    not its in-degree; a production run caps it by pre-filtering n >= 2).
    The top-k is an in-row sort_array + slice fold, not a window — no
    per-target task serialization.
    """
    pairs = links.groupBy(F.col(by), F.col("anchor")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    ranked = F.slice(
        F.transform(
            F.sort_array(F.collect_list(F.struct((-F.col("_n")).alias("_neg"), "anchor"))),
            lambda s: s["anchor"],
        ),
        1,
        k,
    )
    return pairs.groupBy(by).agg(
        F.sum("_n").alias("n_links"),
        F.count(F.lit(1)).alias("n_anchors"),
        F.concat_ws("|", ranked).alias("top_anchors"),
    )


def crawl_frontier(
    links: DataFrame,
    corpus_urls: DataFrame,
    url_col: str = "url",
    per_host_cap: int | None = None,
) -> DataFrame:
    """Frontier expansion: the distinct crawlable URLs the corpus links to
    but has not fetched, ranked by reference count — the next-crawl seed
    list (the links.py module docstring's third consumer).

    Output: (dst_url, dst_host, n_refs, n_ref_hosts) — reference volume
    and how many DISTINCT hosts vote for the URL (off-host votes are the
    classic spam-resistant priority signal). ``per_host_cap`` keeps only
    the top-cap URLs per destination host (count DESC, url ASC), the
    politeness/budget shape of a real frontier.

    Plan: one (dst_url, src_host) dedup-aggregate -> per-url counts (both
    map-side combining, ids/short strings only), a LEFT ANTI join against
    the corpus's normalized urls (urls shuffle, never pages), and — only
    when capped — a per-host rank window. The window partitions by host
    AFTER aggregation, so its input is the frontier's distinct-url set;
    mega-hosts are exactly what the cap is for, and a production run
    pre-filters n_refs >= 2 before ranking to bound them.
    """
    seen = corpus_urls.select(
        url_normalize_exprs(F.col(url_col))["url_norm"].alias("dst_url")
    ).distinct()
    votes = links.groupBy("dst_url", "dst_host", "src_host").agg(
        F.count(F.lit(1)).alias("_n")
    )
    cand = votes.groupBy("dst_url", "dst_host").agg(
        F.sum("_n").alias("n_refs"),
        F.count(F.lit(1)).alias("n_ref_hosts"),
    )
    frontier = cand.join(seen, "dst_url", "left_anti")
    if per_host_cap is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("dst_host").orderBy(
            F.col("n_refs").desc(), F.col("dst_url")
        )
        frontier = (
            frontier.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= per_host_cap)
            .drop("_rk")
        )
    return frontier


def parse_sitemap(
    df: DataFrame,
    xml_col: str = "xml",
    keep_cols: tuple[str, ...] = ("host",),
) -> DataFrame:
    """Sitemap protocol parse (sitemaps.org/protocol.html — the crawl
    discovery channel robots.txt `Sitemap:` lines point at; the reference
    ships general XML decode as parse_xml,
    website/cue/reference/remap/functions/parse_xml.cue — this is the
    crawl-specific explode over it). Handles both document kinds in one
    pass: `<urlset><url>` page entries AND `<sitemapindex><sitemap>`
    child-sitemap entries.

    One row per entry: (keep_cols..., kind 'url'|'sitemap', loc, lastmod
    timestamp, changefreq, priority double). `<lastmod>` accepts the W3C
    datetime profile the spec allows — date-only, seconds+offset ('Z'
    included), minutes+offset — via a try_to_timestamp coalesce chain;
    unparseable/absent -> null. Whitespace inside `<loc>` is trimmed per
    spec. `priority` outside entries (urlset default) is not modeled.

    Scale: pure regexp_extract_all + in-row transforms, zero shuffle —
    sitemap files are per-host-small (the spec caps one file at 50k URLs /
    50 MB), so a fleet of them is an embarrassingly parallel scan; the
    posexplode keeps entry order within a file (entry_pos)."""
    xml = F.col(xml_col)
    body = lambda kind: F.regexp_extract_all(  # noqa: E731
        xml, F.lit(rf"(?s)<{kind}>(.*?)</{kind}>"), 1
    )
    tagged = lambda kind: F.transform(  # noqa: E731
        body(kind),
        lambda b: F.struct(F.lit(kind).alias("kind"), b.alias("body")),
    )
    entries = F.concat(tagged("url"), tagged("sitemap"))

    def field(name: str) -> Column:
        return F.nullif(
            F.regexp_extract(F.col("_e.body"), rf"(?s)<{name}>\s*(.*?)\s*</{name}>", 1),
            F.lit(""),
        )

    lastmod_s = field("lastmod")
    lastmod = F.coalesce(
        F.try_to_timestamp(lastmod_s, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(lastmod_s, F.lit("yyyy-MM-dd'T'HH:mmXXX")),
        F.try_to_timestamp(lastmod_s, F.lit("yyyy-MM-dd")),
    )
    return df.select(
        *[F.col(c) for c in keep_cols],
        F.posexplode(entries).alias("entry_pos", "_e"),
    ).select(
        *[F.col(c) for c in keep_cols],
        "entry_pos",
        F.col("_e.kind").alias("kind"),
        field("loc").alias("loc"),
        lastmod.alias("lastmod"),
        field("changefreq").alias("changefreq"),
        field("priority").try_cast("double").alias("priority"),
    )


def host_edges(links: DataFrame, external_only: bool = False) -> DataFrame:
    """Aggregate page-level links to weighted host-level edges
    (src_host, dst_host, n_links). Map-side partial aggregation means the
    exchange carries distinct host pairs, not one row per link."""
    e = links.filter(~F.col("is_internal")) if external_only else links
    return e.groupBy(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n_links"))
