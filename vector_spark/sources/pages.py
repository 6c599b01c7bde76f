"""Deterministic Common-Crawl-style `pages` fixture generator.

Shape is the BASELINE.json input hint: (url string, warc_ts timestamp,
html binary, text string, lang string). Modeled on the reference's
`demo_logs` synthetic source (/root/reference/src/sources/demo_logs.rs:47-170)
but generated *distributively*: every column is a pure Column expression over
`spark.range(n)` — a function of the row id only — so the same rows come out
at any partitioning and any scale, with no driver-side loops and no Python
in the generate path. At 10^12 rows this is simply `spark.range` with more
partitions.

Skew: the domain is drawn log-uniformly over ~1000 domains, so low-numbered
domains are "hot" (domain0 gets ~10% of rows) — deliberately exercises the
salted-aggregation / AQE-skew-join paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_DOMAINS = 1000
LANGS = ["en", "de", "fr", "es", "hi", "zh", "ja", "ru"]
# cumulative weights for the weighted language pick
LANG_CUM = [0.40, 0.55, 0.65, 0.75, 0.82, 0.90, 0.95, 1.00]
WORDS = [
    "the", "data", "spark", "pipeline", "event", "log", "metric", "stream",
    "crawl", "page", "index", "query", "parse", "route", "batch", "window",
    "shuffle", "join", "filter", "reduce", "sample", "vector", "engine",
    "cluster", "partition", "schema", "table", "column", "value", "record",
]
TLDS = ["com", "org", "net", "io", "dev", "edu"]
STATUSES = [200, 200, 200, 200, 301, 404, 500, 503]
CONTENT_TYPES = ["text/html", "text/html", "text/html", "application/json", "text/plain"]


def _u(seed: int) -> Column:
    """Deterministic uniform [0,1) from the row id, per-column salt."""
    return (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0).cast("double")


def _pick(seed: int, arr: list) -> Column:
    """Deterministic uniform pick from a small list."""
    idx = F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(len(arr)))
    return F.element_at(F.array(*[F.lit(x) for x in arr]), (idx + 1).cast("int"))


def generate_pages(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Generate n pages rows. Pure function of (seed, id): rerunning at any
    parallelism yields byte-identical rows (the resume-test invariant)."""
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    df = df.withColumn("id", F.xxhash64(F.col("id"), F.lit(seed)) % F.lit(2**40))

    # log-uniform domain id in [0, N_DOMAINS): heavy skew toward low ids
    domain_id = F.floor(F.pow(F.lit(float(N_DOMAINS)), _u(1))).cast("int") % N_DOMAINS
    tld = _pick(2, TLDS)
    domain = F.concat(F.lit("domain"), domain_id.cast("string"), F.lit("."), tld)
    path = F.concat(F.lit("/p/"), F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(100000)).cast("string"))
    url = F.concat(F.lit("https://"), domain, path, F.lit("?q="), F.abs(F.col("id")).cast("string"))

    warc_ts = F.timestamp_seconds(
        F.lit(1_700_000_000) + F.pmod(F.xxhash64(F.col("id"), F.lit(4)), F.lit(86400 * 30))
    )

    lang_u = _u(5)
    lang = F.lit(LANGS[-1])
    for lg, cum in zip(reversed(LANGS[:-1]), reversed(LANG_CUM[:-1])):
        lang = F.when(lang_u < cum, F.lit(lg)).otherwise(lang)

    n_words = (F.pmod(F.xxhash64(F.col("id"), F.lit(6)), F.lit(120)) + 5).cast("int")
    words_arr = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: F.element_at(
            F.array(*[F.lit(w) for w in WORDS]),
            (F.pmod(F.xxhash64(F.col("id"), i, F.lit(7)), F.lit(len(WORDS))) + 1).cast("int"),
        ),
    )
    text = F.array_join(words_arr, " ")

    status = _pick(8, STATUSES)
    ctype = _pick(9, CONTENT_TYPES)
    title = F.concat(F.lit("Page "), F.abs(F.col("id")).cast("string"))
    html_str = F.concat(
        F.lit('<html><head><meta http-equiv="status" content="'), status.cast("string"),
        F.lit('"/><meta content-type="'), ctype,
        F.lit('"/><title>'), title, F.lit("</title></head><body><p>"),
        text, F.lit("</p></body></html>"),
    )
    html = F.encode(html_str, "UTF-8")
    # ~1% of rows get a trailing non-UTF8 byte run (FIXTURES.md §1)
    html = F.when(
        F.pmod(F.xxhash64(F.col("id"), F.lit(10)), F.lit(100)) == 0,
        F.concat(html, F.unhex(F.lit("FF00FEFD"))),
    ).otherwise(html)

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def geo_dim(spark: SparkSession) -> DataFrame:
    """tld -> (region, country); exact-equality enrichment lookup
    (reference: lib/enrichment/src/lib.rs:22, src/enrichment_tables/file.rs:65-117)."""
    rows = [
        ("com", "na", "US"),
        ("org", "na", "US"),
        ("net", "eu", "DE"),
        ("io", "eu", "GB"),
        ("dev", "apac", "IN"),
        # deliberately no row for "edu": exercises the left-join null path
        ("XYZ", "na", "CA"),  # case-insensitivity test row
    ]
    return spark.createDataFrame(rows, "tld string, geo_region string, country string")


def geoip_ranges() -> list[tuple[str, str, int, int, str, str]]:
    """Deterministic GeoIP-style range table rows:
    (ip_start, ip_end, net_start, net_end, country, region) — dotted strings
    plus the uint32 bounds, like a GeoLite2-style CSV export. Ten ranges of
    twelve /16s each over 10.0.0.0–10.119.255.255; 10.120+ deliberately
    uncovered (left-join null path)."""
    rows = []
    for i in range(10):
        lo_o2, hi_o2 = i * 12, i * 12 + 11
        lo = (10 << 24) | (lo_o2 << 16)
        hi = (10 << 24) | (hi_o2 << 16) | 0xFFFF
        rows.append(
            (f"10.{lo_o2}.0.0", f"10.{hi_o2}.255.255", lo, hi, f"C{i:02d}", f"R{i % 5}")
        )
    return rows


def geoip_dim(spark: SparkSession) -> DataFrame:
    """IP-range -> (country, region) enrichment dim — the geoip/mmdb table
    analogue (src/enrichment_tables/geoip.rs:1-509). Pair with
    operators.enrich.enrich_ip_range."""
    return spark.createDataFrame(
        geoip_ranges(),
        "ip_start string, ip_end string, net_start long, net_end long, "
        "country string, region string",
    )


def lang_dim(spark: SparkSession) -> DataFrame:
    rows = [
        ("en", "germanic", False), ("de", "germanic", False), ("fr", "romance", False),
        ("es", "romance", False), ("hi", "indo-aryan", False), ("zh", "sinitic", False),
        ("ja", "japonic", False),  # no "ru" row: left-join null path
    ]
    return spark.createDataFrame(rows, "lang string, lang_family string, rtl boolean")


def domain_dim(spark: SparkSession) -> DataFrame:
    """(domain, valid_from, valid_to, category) — BetweenDates range-join
    condition (reference: lib/enrichment/src/lib.rs:24-28)."""
    import datetime as dt

    base = dt.datetime(2023, 11, 1)
    rows = []
    for i in range(0, 50):
        rows.append((f"domain{i}.com", base, base + dt.timedelta(days=60), "news"))
        rows.append((f"domain{i}.org", base, base + dt.timedelta(days=15), "blog"))
    # ambiguous 2-match window row (find_table_row "exactly one" semantics test)
    rows.append(("domain0.com", base, base + dt.timedelta(days=90), "spam"))
    return spark.createDataFrame(
        rows, "domain string, valid_from timestamp, valid_to timestamp, category string"
    )
