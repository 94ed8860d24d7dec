#!/usr/bin/env python
"""Thin spark-submit launcher for the packaged batch job.

The package module mongo_log_parser_spark/job.py cannot be the spark-submit
main script itself: as __main__ its relative imports (`from .session import
...`) have no package context. This launcher is the file you submit; the
package arrives on driver and executors via --py-files:

    zip -r mlp.zip mongo_log_parser_spark
    spark-submit --py-files mlp.zip --master <master> scripts/submit_job.py \
        --pages s3://bucket/pages --out s3://bucket/out

Proven end-to-end on a multi-executor local-cluster master in
tests/test_spark_submit.py.
"""

from mongo_log_parser_spark.job import main

if __name__ == "__main__":
    main()
