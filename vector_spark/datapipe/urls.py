"""URL curation for Common-Crawl-style corpora: canonicalization,
registrable-domain extraction, blocklist filtering, canonical-URL dedup.

The C4/RefinedWeb-style URL pass that runs before (and independently of)
text dedup: two crawls of the same page differ only in tracking params /
default ports / fragments, and junk domains are removed wholesale. All
pure column expressions (codegen, zero Python); the only shuffle is the
canonical-URL dedup window keyed by the normalized url, and the blocklist
is a BROADCAST join (blocklists are thousands of rows at 100 TB).

No reference-engine counterpart; the scheme/authority split semantics
follow the reference's VRL parse_url documentation
(website/cue/reference/remap/functions/parse_url.cue) — components, not
code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# exact-match tracking keys; utm_* is matched by prefix
TRACKING_KEYS = ("gclid", "fbclid", "msclkid", "mc_cid", "mc_eid")

# second-level labels that make a 3-label registrable domain under a
# 2-letter ccTLD — the zero-join fast path. For exact registrable domains
# pass `psl=functions.psl.psl_dim(spark)` to url_filter: the FULL public
# suffix list as a broadcast join ladder (still zero shuffles).
_CC_SLD = ("co", "com", "net", "org", "gov", "ac", "edu")


def url_normalize_exprs(url: Column) -> dict[str, Column]:
    """Canonicalization as an ordered name->Column dict:

      scheme    — lowercased
      host      — lowercased, port split off the authority
      port      — non-default port kept ('' when absent or default 80/443)
      url_norm  — scheme://host[:port][path][?sorted-kept-query]
                  (fragment dropped, tracking params dropped, remaining
                  params sorted, bare '/' path dropped)
      domain    — registrable domain (last 2 labels, or 3 under
                  {co,com,...}.<2-letter-cc>)
    """
    scheme = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    auth = F.lower(F.coalesce(F.parse_url(url, F.lit("AUTHORITY")), F.lit("")))
    host = F.element_at(F.split(auth, ":"), 1)
    rawport = F.when(F.size(F.split(auth, ":")) >= 2, F.element_at(F.split(auth, ":"), 2)).otherwise(F.lit(""))
    default = F.when(scheme == "https", F.lit("443")).otherwise(F.lit("80"))
    port = F.when(rawport == default, F.lit("")).otherwise(rawport)
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.when(path == "/", F.lit("")).otherwise(path)
    q = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "")
            & ~F.split(p, "=")[0].startswith("utm_")
            & ~F.split(p, "=")[0].isin(*TRACKING_KEYS),
        )
    )
    qs = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(F.lit(""))
    labels = F.split(host, r"\.")
    nl = F.size(labels)
    three = (
        (nl >= 3)
        & (F.length(F.element_at(labels, -1)) == 2)
        & F.element_at(labels, -2).isin(*_CC_SLD)
    )
    domain = F.when(
        three, F.concat_ws(".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1))
    ).otherwise(
        F.when(nl >= 2, F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))).otherwise(host)
    )
    url_norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        qs,
    )
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "url_norm": url_norm,
        "domain": domain,
    }


def url_filter(
    df: DataFrame,
    blocklist: DataFrame | None = None,
    url_col: str = "url",
    id_col: str = "doc_id",
    psl: DataFrame | None = None,
) -> DataFrame:
    """Canonicalize + flag every row:

      blocked      — registrable domain appears in `blocklist`
                     (a 1-column `domain` DataFrame; broadcast)
      is_canonical — first doc (min id) for its normalized url; the
                     crawl-dedup keep flag

    One exchange (the per-url_norm window); the blocklist join is a
    broadcast hash join on the already-computed domain column. Rows are
    flagged, not dropped, so the caller picks the policy (and the oracle
    checks every row)."""
    from pyspark.sql import Window

    e = url_normalize_exprs(F.col(url_col))
    out = df.select(
        F.col(id_col), *[v.alias(k) for k, v in e.items() if k in ("url_norm", "host", "domain")]
    )
    if psl is not None:
        # full-PSL registrable domain (eTLD+1) replaces the 2-level
        # heuristic: the broadcast join ladder of functions/psl.py — still
        # zero shuffles, so the plan shape below is unchanged
        from ..functions.psl import parse_etld_psl

        out = parse_etld_psl(out, "host", psl, plus_parts=1).withColumn(
            "domain", F.col("etld_plus")
        ).drop("etld", "etld_plus", "known_suffix")
    if blocklist is not None:
        b = blocklist.select(F.col("domain").alias("_bdom"), F.lit(True).alias("_blocked"))
        out = (
            out.join(F.broadcast(b), out["domain"] == b["_bdom"], "left")
            .withColumn("blocked", F.coalesce(F.col("_blocked"), F.lit(False)))
            .drop("_bdom", "_blocked")
        )
    else:
        out = out.withColumn("blocked", F.lit(False))
    w = Window.partitionBy("url_norm").orderBy(F.col(id_col))
    return out.withColumn("is_canonical", F.row_number().over(w) == 1)
