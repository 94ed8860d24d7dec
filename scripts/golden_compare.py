#!/usr/bin/env python
"""Exploratory diff: run the engine on the reference's real Atlas logs and
compare section-by-section against the reference's own golden report.json
(/root/reference/src/test/resources/). Prints mismatches; the hardened
assertions live in tests/test_golden_report.py."""

from __future__ import annotations

import glob
import json
import math

from pyspark.sql import functions as F

from mongo_log_parser_spark.operators import aggregates as agg
from mongo_log_parser_spark.operators import route
from mongo_log_parser_spark.session import build_session
from mongo_log_parser_spark.sources import logfiles

GOLDEN = "/root/reference/src/test/resources/report.json"
LOGS = sorted(glob.glob("/root/reference/src/test/resources/cluster0-shard-00-0*.log.gz"))


def fdiv(a, b):
    return a // b if b else 0


def main():
    golden = json.load(open(GOLDEN))
    spark = build_session(app_name="golden", master="local[8]", shuffle_partitions=8)
    pages = logfiles.read_log_files(spark, LOGS)
    streams = route.split_streams(pages)
    kept = streams["kept"]
    ops = streams["ops"]

    # --- metadata timestamps (E15)
    tr = agg.timestamp_range(kept).collect()[0]
    md = golden["metadata"]
    print("earliest:", tr["earliest"], "golden:", md["earliestTimestamp"],
          "OK" if tr["earliest"] == md["earliestTimestamp"] else "MISMATCH")
    print("latest:  ", tr["latest"], "golden:", md["latestTimestamp"],
          "OK" if tr["latest"] == md["latestTimestamp"] else "MISMATCH")

    # --- operationTypeStats (A3)
    ours = {r["op_stat"]: r["count"] for r in agg.op_stats(ops).collect()}
    gold_bd = {k: v["count"] for k, v in golden["operationTypeStats"]["breakdown"].items()}
    print("\nop_stats total:", sum(ours.values()), "golden:", golden["operationTypeStats"]["totalOperations"])
    for k in sorted(set(ours) | set(gold_bd)):
        o, g = ours.get(k), gold_bd.get(k)
        print(f"  {k}: ours={o} golden={g} {'OK' if o == g else 'MISMATCH'}")

    # --- errorCodes (A7)
    errs = {r["code_name"]: r for r in agg.error_codes(streams["errors"]).collect()}
    print("\nerrors total:", sum(r["count"] for r in errs.values()),
          "golden:", golden["errorCodes"]["summary"]["totalErrors"])
    for e in golden["errorCodes"]["errorCodes"]:
        o = errs.get(e["codeName"])
        oc = o["count"] if o else None
        print(f"  {e['codeName']}: ours={oc} golden={e['count']} {'OK' if oc == e['count'] else 'MISMATCH'}")
    for k in set(errs) - {e["codeName"] for e in golden["errorCodes"]["errorCodes"]}:
        print("  EXTRA ours:", k, errs[k]["count"])

    # --- mainOperations (A1) at (ns, op) granularity (reference key has
    # appName=null on the slow-query path, Accumulator.java:46-67)
    mo = agg.main_ops(ops.withColumn("app_name", F.lit(None).cast("string")))
    mo_rows = {(r["db"] + "." + r["coll"] if r["coll"] else r["db"], r["op"]): r
               for r in mo.collect()}
    gops = golden["mainOperations"]["operations"]
    gsum = golden["mainOperations"]["summary"]
    print("\nmain_ops patterns:", len(mo_rows), "golden:", gsum["uniqueOperationPatterns"])
    print("totalOperations:", sum(r["count"] for r in mo_rows.values()), "golden:", gsum["totalOperations"])
    tde = sum(fdiv(r["total_docs"], r["count"]) * r["count"] for r in mo_rows.values())
    tdr = sum(fdiv(r["total_returned"], r["count"]) * r["count"] for r in mo_rows.values())
    print("totalDocsExamined:", tde, "golden:", gsum["totalDocumentsExamined"])
    print("totalDocsReturned:", tdr, "golden:", gsum["totalDocumentsReturned"])
    bad = 0
    for g in gops:
        key = (g["namespace"], g["operation"])
        r = mo_rows.get(key)
        if r is None:
            print("  MISSING:", key)
            bad += 1
            continue
        checks = {
            "count": (r["count"], g["count"]),
            "min": (r["min_ms"], g["minDurationMs"]),
            "max": (r["max_ms"], g["maxDurationMs"]),
            "avg": (r["avg_ms"], g["avgDurationMs"]),
            "totalSec": (r["count"] * r["avg_ms"] // 1000, g["totalDurationSec"]),
            "avgKeys": (r["avg_keys"], g["avgKeysExamined"]),
            "avgDocs": (r["avg_docs"], g["avgDocsExamined"]),
            "avgRet": (r["avg_returned"], g["avgDocsReturned"]),
            "ratio": (r["ex_ret_ratio"], g["examineToReturnRatio"]),
            "avgShards": (r["avg_shards"], g["avgShards"]),
            "avgBytesRead": (fdiv(r["total_bytes_read"], r["count"]), g["avgBytesRead"]),
            "maxBytesRead": (r["max_bytes_read"], g["maxBytesRead"]),
            "avgBytesWritten": (fdiv(r["total_bytes_written"], r["count"]), g["avgBytesWritten"]),
            "maxBytesWritten": (r["max_bytes_written"], g["maxBytesWritten"]),
        }
        diffs = {k: v for k, v in checks.items() if v[0] != v[1]}
        p95_rel = abs(r["p95_ms"] - g["p95DurationMs"]) / max(g["p95DurationMs"], 1)
        if diffs or p95_rel > 0.1:
            bad += 1
            if bad < 15:
                print("  DIFF", key, diffs, "p95 ours/golden:", r["p95_ms"], g["p95DurationMs"])
    extra = set(mo_rows) - {(g["namespace"], g["operation"]) for g in gops}
    for k in list(extra)[:10]:
        print("  EXTRA ours:", k, mo_rows[k]["count"])
    print("main_ops rows mismatching:", bad, "extra:", len(extra))

    # --- queryHashAnalysis (A4)
    qh = agg.query_hash(ops)
    qh_rows = {(r["query_hash"], r["ns"], r["op"]): r for r in qh.collect()}
    gq = golden["queryHashAnalysis"]
    print("\nqueryHash unique:", len(qh_rows), "golden:", gq["summary"]["uniqueQueryHashes"])
    print("totalQueries:", sum(r["count"] for r in qh_rows.values()), "golden:", gq["summary"]["totalQueries"])
    bad = 0
    for g in gq["queries"]:
        key = (g["queryHash"], g["namespace"], g["operation"])
        r = qh_rows.get(key)
        if r is None:
            print("  MISSING:", key)
            bad += 1
            continue
        rp_gold = dict(
            (part.rsplit(": ", 1)[0], int(part.rsplit(": ", 1)[1]))
            for part in g["readPreference"].split("<br>")
        ) if g.get("readPreference") else {}
        rp_ours = dict(
            (kv.rsplit("=", 1)[0], int(kv.rsplit("=", 1)[1]))
            for kv in r["read_pref_counts"].split("|") if kv
        )
        checks = {
            "count": (r["count"], g["count"]),
            "min": (r["min_ms"], g["minDurationMs"]),
            "max": (r["max_ms"], g["maxDurationMs"]),
            "avg": (r["avg_ms"], g["avgDurationMs"]),
            "avgKeys": (fdiv(r["total_keys"], r["count"]), g["avgKeysExamined"]),
            "avgDocs": (fdiv(r["total_docs"], r["count"]), g["avgDocsExamined"]),
            "avgRet": (fdiv(r["total_returned"], r["count"]), g["avgDocsReturned"]),
            "avgBytesRead": (fdiv(r["total_bytes_read"], r["count"]), g["avgBytesRead"]),
            "maxBytesRead": (r["max_bytes_read"], g["maxBytesRead"]),
            "readPref": (rp_ours, rp_gold),
            "replanPct": (round(100.0 * r["replanned_count"] / r["count"], 1) if r["count"] else 0.0,
                          g["replannedPercentage"]),
        }
        diffs = {k: v for k, v in checks.items() if v[0] != v[1]}
        if diffs:
            bad += 1
            if bad < 10:
                print("  DIFF", key, diffs)
    print("queryHash top-100 mismatching:", bad)

    # --- indexStats (A6)
    ix = agg.index_stats(ops)
    ix_rows = {(r["ns"], r["plan_summary"]): r for r in ix.collect()}
    gi = golden["indexStats"]
    print("\nindexStats patterns:", len(ix_rows), "golden:", gi["summary"]["uniqueIndexUsagePatterns"])
    print("totalOperations:", sum(r["count"] for r in ix_rows.values()), "golden:", gi["summary"]["totalOperations"])
    cs = sum(r["count"] for r in ix_rows.values() if r["is_collscan"])
    print("collectionScans:", cs, "golden:", gi["summary"]["collectionScans"])
    bad = 0
    for g in gi["indexUsage"]:
        key = (g["namespace"], g["planSummary"])
        r = ix_rows.get(key)
        if r is None:
            print("  MISSING:", key)
            bad += 1
            continue
        checks = {
            "count": (r["count"], g["count"]),
            "min": (r["min_ms"], g["minDurationMs"]),
            "max": (r["max_ms"], g["maxDurationMs"]),
            "avg": (r["avg_ms"], g["avgDurationMs"]),
            "avgKeys": (r["avg_keys"], g["avgKeysExamined"]),
            "avgDocs": (r["avg_docs"], g["avgDocsExamined"]),
            "avgRet": (r["avg_returned"], g["avgReturned"]),
            "ratio": (r["examined_returned_ratio"], g["examinedReturnedRatio"]),
            "collscan": (bool(r["is_collscan"]), g["isCollectionScan"]),
        }
        diffs = {k: v for k, v in checks.items() if v[0] != v[1]}
        if diffs:
            bad += 1
            if bad < 10:
                print("  DIFF", key, diffs)
    print("indexStats rows mismatching:", bad)

    spark.stop()


if __name__ == "__main__":
    main()
