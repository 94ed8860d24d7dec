#!/usr/bin/env python
"""A/B the ops-checkpoint layout: plain parquet vs query_hash-bucketed.

Measures the two halves of the trade PLANS.md ("bucketed ops checkpoint")
claims:

  checkpoint_s  build(pages, materialize=arm) — the bucketed arm pays one
                extra full-stream shuffle (repartition by query_hash) inside
                the ops write;
  family_s      the query-hash analysis family over the checkpoint:
                query_hash (A4: 2 groupBys + 1 join) + plan_cache (A5) +
                plan_multi (A5b), each materialized via a count — the plain
                arm pays a full-stream Exchange per aggregation, the bucketed
                arm pays none (plan shapes pinned in tests/test_bucketed.py;
                this script measures what the shuffle elimination is worth).

Arms interleave A/B/A/B to cancel host drift; a pure-CPU probe runs before
every measurement so co-tenant noise is visible (same protocol as
ab_arrow_batch.py). One session serves both arms — the layout is a property
of the written checkpoint, not the session.

Usage: python scripts/ab_bucketed.py [sf] [runs_per_arm]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _burn(k):
    s = 0
    for i in range(k):
        s += i * i
    return s


def cpu_probe(procs: int = 4, n: int = 3_000_000) -> float:
    t0 = time.time()
    with mp.get_context("fork").Pool(procs) as p:
        p.map(_burn, [n] * procs)
    return round(time.time() - t0, 3)


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from mongo_log_parser_spark.operators import aggregates
    from mongo_log_parser_spark.plans import pipeline
    from mongo_log_parser_spark.session import build_session
    from mongo_log_parser_spark.sources import datagen

    path = datagen.ensure_pages(sf)
    spark = build_session(app_name="ab-bucketed", master="local[16]",
                          shuffle_partitions=16)
    warm = pipeline.build(spark.read.parquet(path).limit(20000), cache=False)
    for df in warm.sinks.values():
        df.agg(F.count(F.lit(1))).collect()

    pages = spark.read.parquet(path)
    arms = ("parquet", "bucketed")
    out = {"sf": sf, "runs_per_arm": runs, "probes": [],
           "checkpoint_s": {a: [] for a in arms},
           "family_s": {a: [] for a in arms}}
    for _ in range(runs):
        for arm in arms:
            out["probes"].append(cpu_probe())
            t0 = time.time()
            res = pipeline.build(pages, materialize=arm)
            out["checkpoint_s"][arm].append(round(time.time() - t0, 2))
            t1 = time.time()
            for df in (res.sinks["query_hash"], res.sinks["plan_cache"],
                       aggregates.plan_cache_multi(res.sinks["plan_cache"])):
                df.agg(F.count(F.lit(1))).collect()
            out["family_s"][arm].append(round(time.time() - t1, 2))
            res.unpersist()
            print(f"# {arm}: checkpoint {out['checkpoint_s'][arm][-1]} s, "
                  f"qh-family {out['family_s'][arm][-1]} s "
                  f"(probe {out['probes'][-1]})", flush=True)
    for metric in ("checkpoint_s", "family_s"):
        for a in arms:
            ts = out[metric][a]
            out[f"min_{metric}_{a}"] = min(ts)
    spark.stop()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
