"""URL operators for the web-corpus ingest side of the pipeline:
normalization, host/domain parsing, domain rollups, URL-level dedup, and
blocklist filtering.

Reference has no analog (its input keys are log files, not URLs); these are
the crawl-side operators a Common-Crawl-scale pipeline applies between WARC
ingest (sources/warc.py) and document-level dedup (operators/dedup.py).

Scale notes:
- Parsing/normalization is a regexp chain — pure JVM, one narrow
  projection, whole-stage-codegen'd with the scan. Patterns are
  RE2-compatible so the DuckDB oracle executes the same regexes.
- `domain_stats` is one hash aggregate with map-side partials; crawl key
  skew (a few giant domains) collapses before the Exchange.
- `url_dedup_latest` is one groupBy on the normalized URL with a
  max(struct) argmax — no window, no sort, deterministic tie-break.
- `filter_blocked_domains` broadcasts the blocklist (always tiny relative
  to the crawl) as a left_anti hash join — zero shuffle of the big side.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SCHEME_HOST_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"


def normalize_url(u: Column) -> Column:
    """Canonical URL: drop fragment and utm_* params, strip default ports
    and a leading www., strip one trailing slash, lowercase scheme+host
    (path/query case is significant and preserved). Each step is one RE2
    regex so the oracle is the identical chain."""
    u = F.regexp_replace(u, r"#.*$", "")                       # fragment
    u = F.regexp_replace(u, r"utm_[^&#]*&", "")                # utm_ param mid-query
    u = F.regexp_replace(u, r"[?&]utm_[^&#]*$", "")            # utm_ param trailing
    u = F.regexp_replace(u, r"\?$", "")                        # dangling '?'
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?#].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?#].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^([A-Za-z]+://)www\.", r"$1")    # leading www.
    u = F.regexp_replace(u, r"/\?", "?")                       # path-final slash before query
    u = F.regexp_replace(u, r"/$", "")                         # trailing slash
    head = F.regexp_extract(u, SCHEME_HOST_RE, 1)
    return F.concat(F.lower(head), F.substring(u, F.length(head) + 1, F.lit(1 << 30)))


def url_parts(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """url → (norm_url, host, domain, tld, path). domain is the last two
    host labels (registrable-domain approximation — a public-suffix list
    is the production swap-in, noted, not vendored)."""
    nu = normalize_url(F.col(url_col))
    host = F.regexp_replace(
        F.regexp_extract(nu, r"^[a-z][a-z0-9+.\-]*://([^/?#]+)", 1), r":[0-9]+$", "")
    return pages.select(
        F.col(url_col).alias("url"),
        nu.alias("norm_url"),
        host.alias("host"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("domain"),
        F.regexp_extract(host, r"\.([^.]+)$", 1).alias("tld"),
        F.regexp_extract(nu, r"^[a-z][a-z0-9+.\-]*://[^/?#]+([^?#]*)", 1).alias("path"),
        *[c for c in pages.columns if c != url_col],
    )


def domain_stats(pages: DataFrame) -> DataFrame:
    """Crawl rollup: per registrable domain — pages, distinct hosts,
    distinct languages. One hash aggregate; partial agg handles the
    head-domain skew map-side."""
    return (
        url_parts(pages)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("host").alias("n_hosts"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


def url_dedup_latest(pages: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    """Collapse recrawls: one row per normalized URL keeping the latest
    capture (ties broken by raw URL for a total order). max(struct) argmax
    — one shuffle on norm_url, no window/sort."""
    parts = url_parts(pages).select("norm_url", "url", ts_col)
    return (
        parts.groupBy("norm_url")
        .agg(F.max(F.struct(F.col(ts_col), F.col("url"))).alias("b"),
             F.count(F.lit(1)).alias("n_versions"))
        .select("norm_url", F.col("b.url").alias("kept_url"), "n_versions")
    )


def blocked_domains_df(spark: SparkSession, domains: Iterable[str]) -> DataFrame:
    return spark.createDataFrame([(d,) for d in sorted(set(domains))], "domain string")


def filter_blocked_domains(pages: DataFrame, blocked: DataFrame) -> DataFrame:
    """Drop pages whose registrable domain is blocklisted: broadcast
    left_anti — the blocklist ships to every executor, the crawl never
    shuffles. Plan-asserted in tests."""
    parts = url_parts(pages)
    return parts.join(F.broadcast(blocked), "domain", "left_anti")
