"""J1-J3 + lookup enrichment — broadcast equi-joins.

The reference's only join topology is small-side-lookup equi-join implemented
as a manual two-phase hash join over three file passes
(TwoPassDriverStatsAccumulator.java:55-250, LogParser.java:567-594). In Spark
this collapses to ONE scan and broadcast hash joins — the auth map and the
lookup tables are tiny relative to the page stream, so no shuffle of the big
side ever happens (verify with .explain(): BroadcastHashJoin, no SortMergeJoin).

Deterministic replacements for reference nondeterminism (SURVEY.md §4 O10):
- lifetime sampling: pmod(conn_id, 10) == 0 instead of Math.random() < 0.1
- username per connection: first-by-arrival instead of racy overwrite
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXCLUDED_DRIVER_PREFIX = "NetworkInterface"
EXCLUDED_DRIVER_EXACT = "MongoDB Internal Client"


def driver_allowed(col: F.Column) -> F.Column:
    """F11 — driver exclusion (TwoPassDriverStatsAccumulator.java:150-159)."""
    return col.isNull() | ~(col.startswith(EXCLUDED_DRIVER_PREFIX) | (col == EXCLUDED_DRIVER_EXACT))


def auth_by_conn(auth: DataFrame) -> DataFrame:
    """J1 build side: conn_id → username (+sample auth line), deterministic first."""
    return auth.filter(F.col("conn_id").isNotNull()).groupBy("conn_id").agg(
        F.expr("min_by(username, concat(ts_str, url))").alias("username"),
        F.expr("min_by(text, concat(ts_str, url))").alias("sample_auth_line"),
    )


def conn_lifetimes(conn_lifecycle: DataFrame, sample_mod: int = 10) -> DataFrame:
    """J2 — lifetime per connection: max(end) − min(start), positive only,
    deterministic 1-in-`sample_mod` sample (reference: 10%)."""
    lt = (
        conn_lifecycle.groupBy("conn_id")
        .agg(
            F.min(F.when(F.col("kind") == "start", F.col("epoch_ms"))).alias("start_ms"),
            F.max(F.when(F.col("kind") == "end", F.col("epoch_ms"))).alias("end_ms"),
        )
        .withColumn("lifetime_ms", F.col("end_ms") - F.col("start_ms"))
        .filter(F.col("lifetime_ms") > 0)
    )
    return lt.filter(F.pmod(F.col("conn_id"), F.lit(sample_mod)) == 0)


def driver_stats(meta: DataFrame, auth: DataFrame, conn_lifecycle: DataFrame) -> DataFrame:
    """A11 — driver/version/os/platform/compressors/username rollup.

    One scan + two broadcast joins replaces the reference's three file passes
    (SURVEY.md §3.2).

    `enriched` feeds BOTH the identity-key rollup (base) and the per-conn key
    map (conn_key); as a lazy plan the whole meta-scan ⋈ auth subtree would
    be INLINED twice and executed twice per materialization (6 source scans
    total — plans/r06/driver_stats_before.txt). The lazy localCheckpoint
    materializes the tiny enriched subset (the client-metadata rows, ~2-4% of
    the stream) once on first use and both consumers reuse it — on the lazy
    contract path this also halves the number of full parse passes this sink
    triggers. eager=False: pipeline.build constructs sinks without running
    them; the checkpoint happens inside the consuming action."""
    m = meta.filter(driver_allowed(F.col("driver")))
    enriched = m.join(F.broadcast(auth_by_conn(auth)), "conn_id", "left") \
        .localCheckpoint(eager=False)
    keys = ["driver", "version", "os_type", "platform", "compressors", "username"]

    base = enriched.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("connection_count"),
        F.countDistinct("remote").alias("unique_hosts"),
        F.expr("min_by(text, concat(ts_str, url))").alias("sample_metadata_line"),
        F.expr("min_by(sample_auth_line, concat(ts_str, url)) FILTER (WHERE sample_auth_line IS NOT NULL)").alias(
            "sample_auth_line"
        ),
    )
    # connection → driver key (first metadata line wins, deterministic)
    conn_key = (
        enriched.filter(F.col("conn_id").isNotNull())
        .groupBy("conn_id")
        .agg(*[F.expr(f"min_by({k}, concat(ts_str, url))").alias(k) for k in keys])
    )
    lifetimes = conn_lifetimes(conn_lifecycle).join(F.broadcast(conn_key), "conn_id", "inner")
    lt_agg = lifetimes.groupBy(*keys).agg(
        F.floor(F.avg("lifetime_ms")).cast("long").alias("avg_lifetime_ms"),
        F.max("lifetime_ms").alias("max_lifetime_ms"),
        F.count(F.lit(1)).alias("sampled_lifetimes"),
    )
    # null-safe equi-join: username (and other key parts) may legitimately be
    # null for never-authenticated connections. lt_agg is an aggregate over
    # the sampled lifetimes keyed by the (small) driver-identity key set, so
    # broadcast it: SortMergeJoin → BroadcastHashJoin, removing one Exchange+
    # Sort pair on each side of the final join (plan-verified, plans/r06/
    # driver_stats_{before,after}.txt).
    cond = None
    for k in keys:
        c = base[k].eqNullSafe(lt_agg[k])
        cond = c if cond is None else cond & c
    joined = base.join(F.broadcast(lt_agg), cond, "left")
    out = joined.select(
        *[base[k] for k in keys],
        "connection_count", "unique_hosts", "sample_metadata_line", "sample_auth_line",
        "avg_lifetime_ms", "max_lifetime_ms", "sampled_lifetimes",
    )
    # A11 completeness (DriverStatsEntry.java:14-120): the entry key already
    # contains username and the (sorted) compressor set, so the per-entry
    # usernames set and per-compressor usage counts are derivable in place —
    # no extra aggregation or shuffle.
    comp_tokens = F.when(F.col("compressors") == "", F.array(F.lit("none"))).otherwise(
        F.split(F.col("compressors"), ",")
    )
    return out.withColumns(
        {
            "usernames": F.coalesce(F.col("username"), F.lit("")),
            "compressor_usage": F.array_join(
                F.transform(
                    comp_tokens,
                    lambda t: F.concat(t, F.lit("="), F.col("connection_count").cast("string")),
                ),
                "|",
            ),
        }
    )


def enrich_pages(pages: DataFrame, lang_locale: DataFrame, host_class: DataFrame) -> DataFrame:
    """Graft lookup enrich: lang → locale, host → site_class (broadcast)."""
    withhost = pages.withColumn("host", F.regexp_extract("url", r"^https?://([^/]+)", 1))
    return withhost.join(F.broadcast(lang_locale), "lang", "left").join(
        F.broadcast(host_class), "host", "left"
    )
