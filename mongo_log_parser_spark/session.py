"""SparkSession factory tuned for the log pipeline.

Scale posture: these configs are chosen for a multi-executor cluster reading
~100 TB (AQE on, skew-join splitting, partial aggregation pushdown, Arrow for
the pandas-UDF boundary). Locally we run the same plan on local[N]; the bench
harness evidences scaling by running the identical job at two parallelism
levels (see bench.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "mongo-log-parser-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: match cores so one shuffle wave; on a real cluster this
        # is overridden to ~2-3x total cores (AQE coalesces the excess).
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = cpus if n == "*" else int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime re-plan, partition coalescing, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # The extract stage's dispatch projection generates >8 KB of bytecode;
        # HotSpot never JITs methods above 8000 bytes, so whole-stage codegen
        # would run *interpreted generated code* (measured 10x slower at 32
        # threads). Falling back to Catalyst's interpreted expressions (small,
        # JIT-friendly methods) above this limit restores linear scaling.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        # Arrow boundary for the pandas UDFs (redact/trim, media metadata).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # The reference drops >1 MiB lines; our text payloads stay well under
        # broadcast limits — keep autoBroadcast on for the lookup joins.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # Local-mode split sizing: the synthetic pages table is one modest file;
        # the default 128 MiB maxPartitionBytes would make it a single input
        # partition and serialize the parse. On a real cluster reading many
        # ~128 MiB parquet files this override is unnecessary — tune via env.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
