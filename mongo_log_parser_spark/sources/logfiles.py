"""S1/S2/S4/E17 — raw log-file sources.

The reference's native input is files of MongoDB structured-log lines, plain
or gzip/zip (LogParser.createReader, LogParser.java:793-808; MIME sniff 597).
Spark/Hadoop reads .gz text transparently (S2 — no codec logic needed); zip
is not a Hadoop-splittable codec, so .zip inputs should be unpacked upstream
(documented divergence — the reference's ZipInputStream reads only the first
entry anyway).

read_log_files() produces a pages-shaped DataFrame so the entire pipeline
(route/extract/aggregate) runs unchanged on real log files:
  url      = file#lineno  (stable per-row id for dedup/first-last ordering)
  warc_ts  = null         (event time comes from the parsed $date)
  text     = the line

E17: shard/node lineage extracted from the filename (`shard-(\\d+)-(\\d+)`,
ShardInfo.java:11) — included as columns so J4-style per-shard grouping is an
extra groupBy key, not a separate accumulator map.

S4: `limit_per_file` reproduces `--limit N` (LogParser.java:117-118, 634-638)
via a row_number window over input_file_name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_log_files(spark: SparkSession, paths: str | list[str],
                   limit_per_file: int | None = None) -> DataFrame:
    if isinstance(paths, str):
        paths = [paths]
    df = spark.read.text(paths).withColumn("_file", F.input_file_name())
    if limit_per_file is not None:
        # --limit N needs true per-file line numbers → one window shuffle,
        # paid only when the flag is set.
        w = Window.partitionBy("_file").orderBy(F.monotonically_increasing_id())
        df = df.withColumn("_lineno", F.row_number().over(w)).filter(
            F.col("_lineno") <= limit_per_file
        )
    else:
        # Lineage id only: monotonically_increasing_id is unique and ascends
        # within each partition — no Exchange, no single-reducer-per-file
        # bottleneck. Not a contiguous per-file line number, which nothing
        # downstream requires (url is an opaque stable id + tiebreaker).
        df = df.withColumn("_lineno", F.monotonically_increasing_id())
    return df.select(
        F.concat(F.col("_file"), F.lit("#"), F.lpad(F.col("_lineno").cast("string"), 19, "0")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("value").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.regexp_extract("_file", r"shard-(\d+)-(\d+)", 1).alias("shard"),
        F.regexp_extract("_file", r"shard-(\d+)-(\d+)", 2).alias("node"),
        F.col("_file").alias("source_file"),
    )


def namespace_filter_predicate(filters: list[str]):
    """F5 — exact / `db.*` wildcard / db-only / generic glob namespace filters;
    config db always excluded (LogParserTask.java:361-408).

    Returns a function(db_col, coll_col) -> boolean Column to AND into ns_pass.
    """
    from pyspark.sql import Column

    def pred(db: Column, coll: Column) -> Column:
        ns = F.concat_ws(".", db, coll)
        ok = F.lit(False)
        for flt in filters:
            if flt.endswith(".*"):
                ok = ok | (db == flt[:-2])
            elif "*" in flt:
                regex = "^" + flt.replace(".", r"\.").replace("*", ".*") + "$"
                ok = ok | ns.rlike(regex)
            elif "." not in flt:
                ok = ok | (db == flt)
            else:
                ok = ok | (ns == flt)
        if not filters:
            ok = F.lit(True)
        return ok & (db.isNull() | (db != "config"))

    return pred
