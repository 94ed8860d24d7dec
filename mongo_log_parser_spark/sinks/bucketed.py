"""Bucketed-table checkpointing — pay the shuffle once, amortize it forever.

SURVEY.md §2.7 names bucketing as the co-location strategy for repeated
aggregations/joins on one key; this module is its first-class implementation
over the pipeline's `ops` checkpoint. The reference has no analog (its
accumulators are a single-process hash map, LogParserTask.java:120-200 —
storage layout does not exist there); on Spark the layout IS the optimization:

  plain parquet checkpoint  → every sink that groups on query_hash pays its
                              own hash Exchange over the full ops table
  bucketed checkpoint       → ONE repartition at write time; afterwards the
                              scan itself reports HashPartitioning(key), so
                              A4 query_hash (groupBy [query_hash, ns, op] +
                              kv-submap join on the same keys), A5 plan_cache
                              and A5b plan_multi all run with ZERO Exchange —
                              Catalyst's ClusteredDistribution is satisfied
                              whenever the bucket key is a SUBSET of the
                              grouping keys, and the base⋈sub join stays
                              co-partitioned because both sides inherit the
                              same scan partitioning.

At 100 TB this is the difference between re-shuffling the ops table once per
analysis family and never shuffling it again after the checkpoint write. The
write itself repartitions by the bucket key first so each task holds exactly
one bucket (Spark's writer assigns buckets with the same Murmur3 pmod as
repartition) — one file per bucket, no small-file explosion, and the sortBy
order survives (Spark only trusts bucket sort order at one file per bucket).

Skew note (documented, measured in tests): rows with NULL query_hash all land
in one bucket. That bucket is never a straggler for the query-hash family
because (a) their first operation is `query_hash IS NOT NULL`, which pushes
down to the parquet scan, and (b) sortBy co-locates the nulls, so row-group
statistics prune the null bucket's pages at footer level. Sinks that do NOT
benefit (main_ops groups on db/coll) are unaffected: Spark's
autoBucketedScan (enabled by default) falls back to a normal splittable scan
when the query gains nothing from bucketing.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    path: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
    name: str | None = None,
) -> tuple[DataFrame, str]:
    """Write `df` as a parquet table bucketed (and bucket-sorted) by `key`;
    return (read-back DataFrame, catalog table name). The read-back scan
    reports HashPartitioning(key, n_buckets), so downstream groupBy/join with
    `key` among their keys need no Exchange.

    Bucketed scans require the session catalog (plain `read.parquet` has no
    bucket spec), so this registers an EXTERNAL table at `path` under a
    caller-provided or generated unique name — session-scoped metadata only,
    the in-memory catalog works; drop with `drop_bucketed`.
    """
    name = name or f"bucketed_{key}_{uuid.uuid4().hex[:8]}"
    writer = (
        # one shuffle, same Murmur3 pmod the bucket writer uses → each task
        # holds exactly one bucket → exactly one file per bucket
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(name)
    return df.sparkSession.table(name), name


def drop_bucketed(spark: SparkSession, name: str) -> None:
    """Drop the catalog entry (EXTERNAL table: the parquet files remain;
    callers own the directory lifecycle, e.g. PipelineResult.workdir)."""
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
