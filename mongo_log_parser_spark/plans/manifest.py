"""O14 — resumable, checkpointed ingest with a per-partition lineage manifest.

The reference has no resumability (restart = full re-run, SURVEY.md §4 O14).
The graft requires: "resumable from a checkpointed per-partition manifest
carrying lineage IDs and parse/route/agg counters".

Design (Iceberg-style without requiring an Iceberg runtime — plain parquet +
atomic directory renames; on a real deployment the same structure maps to an
Iceberg table with `days(warc_ts)` hidden partitioning and snapshot commits):

- the ingest unit is one `day(warc_ts)` partition of the pages table;
- each completed unit writes its routed outputs under
  out_dir/{kept,ops}/day=<d>/ via a temp-dir + atomic rename, then appends a
  manifest row (day, lineage_id, rows_in, oversized, ignored, kept, ops,
  committed_at_run) — the write-then-manifest order makes a crashed run
  re-do at most the in-flight partition (idempotent: rename replaces);
- a restarted run anti-joins the manifest and processes only missing days;
- aggregates (A1-A12) run over the committed `ops`/`kept` data — they are
  recomputed from the resumable ingest layer, which is exactly how the
  100 TB job stays restartable without making percentile state mergeable.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import prefilter
from ..operators import route


def day_key(col=None):
    return F.date_format(col if col is not None else F.col("warc_ts"), "yyyy-MM-dd")


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    p = manifest_path(out_dir)
    if not os.path.exists(p) or not os.listdir(p):
        return None
    return spark.read.parquet(p)


def completed_days(spark: SparkSession, out_dir: str) -> set[str]:
    m = read_manifest(spark, out_dir)
    if m is None:
        return set()
    return {r["day"] for r in m.select("day").distinct().collect()}


def _atomic_write(df: DataFrame, final_dir: str) -> None:
    tmp = final_dir + f".tmp-{uuid.uuid4().hex[:6]}"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp, final_dir)


def run_resumable(spark: SparkSession, pages_path: str, out_dir: str,
                  fail_after_days: int | None = None) -> dict:
    """Process all not-yet-committed day partitions; returns run stats.

    fail_after_days simulates a mid-run crash (for resumability tests)."""
    run_id = uuid.uuid4().hex[:12]
    os.makedirs(out_dir, exist_ok=True)
    pages = spark.read.parquet(pages_path).withColumn("day", day_key())
    done = completed_days(spark, out_dir)
    all_days = sorted(
        r["day"] for r in pages.select("day").distinct().collect()
    )
    todo = [d for d in all_days if d not in done]

    processed = []
    for i, day in enumerate(todo):
        if fail_after_days is not None and i >= fail_after_days:
            break
        # day-partition pruning: the filter reaches the scan (partition values
        # derive from warc_ts min/max per row group → parquet stats pruning)
        day_pages = pages.filter(F.col("day") == day).drop("day")
        # route/parse counters ride the WRITE jobs as observe() metrics — the
        # commit is exactly 2 jobs per partition (kept write incl. the one
        # Arrow parse, then ops write off the committed kept), with no
        # separate count re-reads.
        from pyspark.sql import Observation

        text = F.col("text")
        obs_in, obs_kept, obs_ops = Observation(), Observation(), Observation()
        observed = day_pages.observe(
            obs_in,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(prefilter.is_oversized(text).cast("long")).alias("oversized"),
            F.sum((~prefilter.is_oversized(text) & prefilter.should_ignore(text)).cast("long")).alias("ignored"),
        )
        streams = route.split_streams(observed)
        kept_dir = os.path.join(out_dir, "kept", f"day={day}")
        ops_dir = os.path.join(out_dir, "ops", f"day={day}")
        _atomic_write(streams["kept"].observe(obs_kept, F.count(F.lit(1)).alias("kept")), kept_dir)
        ops = route.extract_ops(spark.read.parquet(kept_dir))  # no re-parse
        _atomic_write(ops.observe(obs_ops, F.count(F.lit(1)).alias("ops")), ops_dir)
        c_in, kept_n, ops_n = obs_in.get, obs_kept.get, obs_ops.get
        row = spark.createDataFrame(
            [(day, run_id, c_in["rows_in"], c_in["oversized"], c_in["ignored"],
              kept_n["kept"], ops_n["ops"])],
            "day string, lineage_id string, rows_in long, oversized long, ignored long, kept long, ops long",
        )
        # manifest append is the commit point (after data rename — idempotent)
        row.write.mode("append").parquet(manifest_path(out_dir))
        processed.append(day)

    return {
        "run_id": run_id,
        "days_total": len(all_days),
        "days_already_done": len(done),
        "days_processed": len(processed),
        "processed": processed,
    }


def committed_ops(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.option("basePath", os.path.join(out_dir, "ops")).parquet(
        os.path.join(out_dir, "ops", "day=*")
    )
