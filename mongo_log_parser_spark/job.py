"""spark-submit entrypoint — the packaged batch job.

Usage (local dev):
    python -m mongo_log_parser_spark.job --sf 0.01 --out data/run1

Usage (cluster):
    zip -r mlp.zip mongo_log_parser_spark
    spark-submit --py-files mlp.zip --master yarn \\
        mongo_log_parser_spark/job.py --pages s3://bucket/pages --out s3://bucket/out

Runs the full parse→route→aggregate pipeline, writes every sink (parquet +
CSV), the JSON report, and — with --resumable — drives the per-day lineage
manifest so a restarted job skips committed partitions.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="mongo_log_parser_spark batch job")
    ap.add_argument("--pages", help="pages table path (parquet)")
    ap.add_argument("--logs", nargs="*", help="raw MongoDB log files (.log/.log.gz) instead of --pages")
    ap.add_argument("--sf", type=float, default=None, help="generate/use synthetic pages at this scale factor")
    ap.add_argument("--out", required=True, help="output directory for sinks + report")
    ap.add_argument("--master", default=None)
    ap.add_argument("--limit", type=int, default=None, help="per-file line limit (--logs mode)")
    ap.add_argument("--ns-filter", nargs="*", default=None,
                    help="namespace filters: exact db.coll, db.*, db, or glob")
    ap.add_argument("--resumable", action="store_true", help="per-day manifest ingest (O14)")
    ap.add_argument("--csv", action="store_true", help="also write CSV sinks")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from .plans import manifest, pipeline
    from .session import build_session
    from .sinks import writers
    from .sources import datagen, logfiles

    spark = build_session(app_name="mongo-log-parser-spark-job", master=args.master)
    try:
        if args.logs:
            pages = logfiles.read_log_files(spark, args.logs, limit_per_file=args.limit)
            pages_path = None
        else:
            pages_path = args.pages or datagen.ensure_pages(args.sf if args.sf is not None else 0.001)
            pages = spark.read.parquet(pages_path)

        if args.resumable and pages_path:
            stats = manifest.run_resumable(spark, pages_path, os.path.join(args.out, "ingest"))
            print(json.dumps({"manifest": stats}))

        res = pipeline.build(pages)
        if args.ns_filter:
            pred = logfiles.namespace_filter_predicate(args.ns_filter)
            ops = res.streams["ops"].filter(pred(F.col("db"), F.col("coll")))
            from .operators import aggregates as agg

            res.sinks["main_ops"] = agg.main_ops(ops)
        os.makedirs(args.out, exist_ok=True)
        writers.write_parquet_sinks(res.sinks, os.path.join(args.out, "sinks"))
        if args.csv:
            writers.write_csv_sinks(res.sinks, os.path.join(args.out, "csv"))
        writers.write_json_report(
            res.sinks, os.path.join(args.out, "report.json"),
            metadata={"pages": pages_path or "log-files", "engine": "mongo_log_parser_spark"},
        )
        print(json.dumps({"out": args.out, "sinks": sorted(res.sinks)}))
        res.unpersist()
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
