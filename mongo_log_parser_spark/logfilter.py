"""Standalone LogFilter CLI — §3.3 (LogFilter.java:41-401).

The reference ships a second entrypoint that streams raw MongoDB log files
through the trim/redact transform and writes filtered log TEXT back out (no
aggregation). The Spark restatement is a one-stage narrow job:

    read.text → Arrow-batched trim/process UDF → write.text

so it scales to any input size with zero shuffles (the write preserves the
scan partitioning).

Usage:
    python -m mongo_log_parser_spark.logfilter --logs a.log b.log.gz --out dir/
    ... --redact       also redact values (process = trim ∘ redact, R8)
    ... --limit N      per-file line cap (S4)
"""

from __future__ import annotations

import argparse
import json


def run(spark, logs: list[str], out_dir: str, redact: bool = False,
        limit: int | None = None) -> None:
    """read.text → trim/process UDF → write.text (the whole job)."""
    from pyspark.sql import functions as F

    from .functions.redact import make_udfs
    from .sources import logfiles

    df = logfiles.read_log_files(spark, logs, limit_per_file=limit)
    udf = make_udfs()["process" if redact else "trim"]
    df.select(udf(F.col("text")).alias("value")).write.mode("overwrite").text(out_dir)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="filter/trim MongoDB log files (LogFilter analog)")
    ap.add_argument("--logs", nargs="+", required=True, help="input .log/.log.gz files")
    ap.add_argument("--out", required=True, help="output directory (text)")
    ap.add_argument("--redact", action="store_true",
                    help="redact values too (trim-only by default, like LogFilter)")
    ap.add_argument("--limit", type=int, default=None, help="per-file line limit")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from .session import build_session

    spark = build_session(app_name="mongo-log-filter", master=args.master)
    try:
        run(spark, args.logs, args.out, redact=args.redact, limit=args.limit)
        print(json.dumps({"out": args.out, "redact": args.redact}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
