"""URL canonicalization and per-domain corpus statistics.

A web-scale training pipeline dedups and rate-buckets by URL before it
ever fetches or tokenizes a byte, so canonicalization (case-fold the
host, drop fragments and default ports, strip tracking params, sort the
query string) is a first-class map-only operator: two syntactically
different URLs that name the same resource must collapse to one key.
The reference has no crawler component — this belongs to the
training-data-pipeline surface the brief adds on top (same tier as
dedup/quality/lang-id).

All transformations are built-in string/regexp/array expressions —
no UDFs, fully whole-stage-codegen'd, zero shuffles until the optional
domain_stats aggregation (one groupBy). Regex patterns are restricted
to syntax with identical semantics in Java regex and RE2 so the DuckDB
oracle can replay them verbatim (the PUNCT_CLASS convention of
oracles.py).

RFC 3986 subset honored: scheme case-insensitivity (§3.1), host
case-insensitivity (§3.2.2), default-port elision (§3.2.3), fragment
removal (§3.5). Query-param sorting and utm/gclid/fbclid stripping are
the standard crawl-dedup extensions (not RFC semantics — documented
operator policy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query params dropped before sorting: pure click-tracking noise
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")


def _strip_tracking(p: Column) -> Column:
    keep = p != ""
    for pre in TRACKING_PREFIXES:
        keep = keep & ~p.startswith(pre)
    return keep


def canonical_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append (scheme, host, port, path_norm, params, canonical_url,
    domain) parsed from ``url_col``.

    Canonical form: lowercased scheme/host, userinfo dropped, leading
    ``www.`` and trailing-dot host noise stripped, default ports (http
    80 / https 443) elided, duplicate path slashes collapsed and the
    trailing slash removed (root stays ``/``), fragment dropped,
    tracking params removed and the rest byte-sorted. ``domain`` is the
    PSL registrable domain (functions/psl.py — vendored public-suffix
    snapshot compiled to a Column expression, so site.co.uk groups as
    site.co.uk, not co.uk).
    """
    from semantik_spark.functions.psl import registrable_domain
    u = F.trim(F.col(url_col))
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    authority = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    tail = F.substring(rest, F.length(authority) + 1, F.lit(1 << 30))
    no_frag = F.regexp_replace(tail, r"#.*$", "")
    raw_path = F.regexp_extract(no_frag, r"^([^?]*)", 1)
    raw_query = F.regexp_extract(no_frag, r"\?(.*)$", 1)

    host_port = F.regexp_replace(authority, r"^[^@]*@", "")
    host = F.lower(F.regexp_extract(host_port, r"^([^:]*)", 1))
    host = F.regexp_replace(host, r"\.$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(host_port, r":([0-9]+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when((port != "") & ~default_port,
                       F.concat(F.lit(":"), port)).otherwise(F.lit(""))

    path = F.regexp_replace(raw_path, r"//+", "/")
    path = F.when(F.length(path) > 1,
                  F.regexp_replace(path, r"/$", "")).otherwise(path)
    path = F.when(path == "", F.lit("/")).otherwise(path)

    params = F.array_join(
        F.array_sort(F.filter(F.split(raw_query, "&"), _strip_tracking)), "&"
    )
    query_part = F.when(params != "", F.concat(F.lit("?"), params)).otherwise(F.lit(""))

    canonical = F.concat(scheme, F.lit("://"), host, port_part, path, query_part)
    domain = registrable_domain(host)
    # garbage in a crawled URL column must be filterable, not fatal:
    # valid = has a scheme and a dot-separated host with no whitespace
    is_valid = (scheme != "") & host.rlike(r"^[^\s:/?#]+\.[^\s:/?#]+$")
    return df.select(
        "*",
        scheme.alias("scheme"),
        host.alias("host"),
        F.when(port_part != "", port.cast("int")).alias("port"),
        path.alias("path_norm"),
        params.alias("params"),
        canonical.alias("canonical_url"),
        domain.alias("domain"),
        is_valid.alias("is_valid"),
    )


def domain_stats(urls: DataFrame) -> DataFrame:
    """Per-domain crawl-frontier profile over canonicalized URLs:
    raw count, distinct canonical targets (the post-dedup fetch load),
    distinct hosts, and the https share. One map-side-combinable
    groupBy — the only shuffle in the family."""
    return urls.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.countDistinct("canonical_url").cast("bigint").alias("n_canonical"),
        F.countDistinct("host").cast("bigint").alias("n_hosts"),
        F.round(
            F.sum(F.when(F.col("scheme") == "https", 1).otherwise(0)) / F.count("*"), 6
        ).alias("https_frac"),
    )
