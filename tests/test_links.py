"""extract_links / host_edges: resolution matrix, junk filtering,
determinism, and plan shape (no shuffle before the optional edge agg)."""

from pyspark.sql import functions as F

from vector_spark.datapipe import extract_links, host_edges


def _pages(spark):
    rows = [
        (
            1,
            "https://www.Site1.com/d/1/page.html",
            "<html><body>"
            '<a href="https://ext2.org/a/1?utm_source=x&b=2">Anchor one</a>'
            "<a href='//cdn3.net/lib.js'>cdn <b>asset</b></a>"
            '<a href="#top">top</a>'
            '<a href="mailto:x@y.z">mail</a>'
            '<a href="about.html">About us</a>'
            '<a href="/p/7">seven</a>'
            "<a name='x'>no href</a>"
            '<a href="javascript:void(0)">js</a>'
            '<a href="tel:+1555">call</a>'
            '<a href="">empty</a>'
            "<a href=unquoted.html class=plain>Unquoted</a>"
            "<a href= >just spaces</a>"
            "</body></html>",
        ),
        (2, "http://site2.co.uk:80/", "<p>no links at all</p>"),
        (3, "https://a.io/x", '<A HREF="HTTPS://B.IO/Y#frag">caps</A>'),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, html string")


def test_extract_links_resolution_matrix(spark):
    out = (
        extract_links(_pages(spark), keep_cols=("doc_id",))
        .orderBy("doc_id", "link_pos")
        .collect()
    )
    got = [(r.doc_id, r.link_pos, r.dst_url, r.anchor, r.is_internal) for r in out]
    assert got == [
        # tracking param dropped, query kept+sorted
        (1, 0, "https://ext2.org/a/1?b=2", "Anchor one", False),
        # protocol-relative + single quotes + nested tag stripped
        (1, 1, "https://cdn3.net/lib.js", "cdn asset", False),
        # bare relative resolves against the /d/1/ base directory
        (1, 4, "https://www.site1.com/d/1/about.html", "About us", True),
        # site-absolute path
        (1, 5, "https://www.site1.com/p/7", "seven", True),
        # HTML5 unquoted attribute value (terminates at whitespace/'>')
        (1, 10, "https://www.site1.com/d/1/unquoted.html", "Unquoted", True),
        # case-insensitive tag/attr; scheme+host lowercased (path case is
        # significant per RFC 3986 and preserved); fragment dropped
        (3, 0, "https://b.io/Y", "caps", False),
    ]
    # junk positions (2,3,7,8,9,11 on doc 1) and the href-less anchor are gone
    assert all(r.doc_id != 2 for r in out)


def test_extract_links_binary_html_and_domain(spark):
    df = _pages(spark).select(
        "doc_id", "url", F.encode("html", "UTF-8").alias("html")
    )
    out = {
        (r.doc_id, r.link_pos): (r.dst_host, r.dst_domain)
        for r in extract_links(df, keep_cols=("doc_id",)).collect()
    }
    assert out[(1, 4)] == ("www.site1.com", "site1.com")
    assert out[(1, 0)] == ("ext2.org", "ext2.org")


def test_host_edges_weights_and_external_only(spark):
    links = extract_links(_pages(spark))
    e = {(r.src, r.dst): r.n_links for r in host_edges(links).collect()}
    assert e[("www.site1.com", "www.site1.com")] == 3
    assert e[("www.site1.com", "ext2.org")] == 1
    ext = {(r.src, r.dst) for r in host_edges(links, external_only=True).collect()}
    assert ("www.site1.com", "www.site1.com") not in ext
    assert ("www.site1.com", "cdn3.net") in ext


def test_extract_links_partitioning_invariant(spark):
    a = extract_links(_pages(spark).repartition(1), keep_cols=("doc_id",))
    b = extract_links(_pages(spark).repartition(7), keep_cols=("doc_id",))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_extract_links_plan_is_narrow(spark):
    """Extraction itself must not shuffle: the explode + regex run inside
    the scan stage (one Exchange only appears in host_edges' groupBy)."""
    plan = extract_links(_pages(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    edge_plan = (
        host_edges(extract_links(_pages(spark)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert edge_plan.count("Exchange") == 1


def test_parse_sitemap_entries(spark):
    """Sitemap protocol corners: whitespace-trimmed <loc>, the three W3C
    lastmod profiles (seconds+Z, minutes+offset, date-only), unparseable
    lastmod -> null, missing fields -> null, sitemapindex children tagged
    'sitemap', entry order preserved, entry-free doc emits nothing, and a
    zero-Exchange plan."""
    from vector_spark.datapipe import parse_sitemap

    urlset = (
        "<urlset>"
        "<url><loc>\n  https://a.example/p1  </loc>"
        "<lastmod>2024-03-05T10:30:00Z</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>https://a.example/p2</loc><lastmod>2024-03-05T10:30+02:00</lastmod></url>"
        "<url><loc>https://a.example/p3</loc><lastmod>2024-03-06</lastmod></url>"
        "<url><loc>https://a.example/p4</loc><lastmod>yesterday</lastmod></url>"
        "</urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>https://b.example/s1.xml</loc></sitemap>"
        "<sitemap><loc>https://b.example/s2.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [("a", urlset), ("b", index), ("c", "<urlset></urlset>")],
        "host string, xml string",
    )
    out = parse_sitemap(df)
    rows = {(r.host, r.entry_pos): r for r in out.collect()}
    assert len(rows) == 6
    assert rows[("a", 0)].loc == "https://a.example/p1"
    assert str(rows[("a", 0)].lastmod) == "2024-03-05 10:30:00"
    assert rows[("a", 0)].changefreq == "daily" and rows[("a", 0)].priority == 0.8
    assert str(rows[("a", 1)].lastmod) == "2024-03-05 08:30:00"  # +02:00 -> UTC
    assert str(rows[("a", 2)].lastmod) == "2024-03-06 00:00:00"
    assert rows[("a", 3)].lastmod is None and rows[("a", 3)].priority is None
    assert rows[("b", 0)].kind == "sitemap" and rows[("b", 1)].loc.endswith("s2.xml")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
