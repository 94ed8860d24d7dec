"""Structured Streaming variant of the parse→route→aggregate pipeline.

The reference is strictly batch (SURVEY.md §2.7) — this is graft-added
capability: the same prefilter/parse/extract stages run unchanged on a
file-source stream of pages, with

- a watermarked sliding-window operation rollup (late data handled by the
  watermark instead of the reference's implicit file ordering), and
- a custom stateful operator: connection-lifetime sessionization via
  applyInPandasWithState (start/end event matching with timeout — the
  streaming version of J2).

Tested with Trigger.AvailableNow against the batch results (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions.extract import extract_ops
from ..functions.parse import parse_lines
from ..functions import prefilter


def pages_stream(spark: SparkSession, path: str, schema=None, max_files: int = 4) -> DataFrame:
    import os

    schema = schema or spark.read.parquet(path).schema
    # the file source needs a directory; the synthetic table is a single file
    if path.endswith(".parquet") and os.path.isfile(path):
        glob = os.path.basename(path)
        path = os.path.dirname(path)
    else:
        glob = "*.parquet"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .option("pathGlobFilter", glob)
        .parquet(path)
    )


def streaming_ops(pages: DataFrame) -> DataFrame:
    text = F.col("text")
    kept = pages.filter(~prefilter.is_oversized(text)).filter(
        ~prefilter.should_ignore(text)
    ).drop("html")
    return extract_ops(parse_lines(kept))


def windowed_op_counts(ops: DataFrame, window: str = "1 day", watermark: str = "2 days") -> DataFrame:
    """Watermarked tumbling-window per-op rollup on event time (warc_ts)."""
    return (
        ops.filter(F.col("ns_pass"))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("op"))
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.sum("duration_ms").alias("total_ms"),
        )
        .select(F.col("w.start").alias("window_start"), "op", "count", "total_ms")
    )


_SESSION_OUT = StructType([
    StructField("conn_id", LongType()),
    StructField("start_ts", TimestampType()),
    StructField("end_ts", TimestampType()),
    StructField("lifetime_ms", LongType()),
    StructField("status", StringType()),
])
_SESSION_STATE = StructType([
    StructField("start_ms", LongType()),
    StructField("end_ms", LongType()),
])


def _session_fn(key, pdfs, state: GroupState):
    """Stateful start/end matcher: emits a closed session once both ends of a
    connection have been seen; unmatched halves stay in state (on a live
    stream a timeout policy would evict them — with AvailableNow drains a
    timeout would loop the no-data state-cleanup phase forever, so the batch
    analog J2 simply ignores unmatched connections)."""
    import pandas as pd

    (conn_id,) = key
    start_ms, end_ms = state.get if state.exists else (None, None)
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            ems = int(row["epoch_ms"])
            if row["kind"] == "start":
                start_ms = ems if start_ms is None else min(start_ms, ems)
            else:
                end_ms = ems if end_ms is None else max(end_ms, ems)
    if start_ms is not None and end_ms is not None and end_ms > start_ms:
        state.remove()
        yield pd.DataFrame(
            [[conn_id,
              pd.Timestamp(start_ms, unit="ms"),
              pd.Timestamp(end_ms, unit="ms"),
              end_ms - start_ms, "closed"]],
            columns=["conn_id", "start_ts", "end_ts", "lifetime_ms", "status"],
        )
    else:
        state.update((start_ms, end_ms))


def streaming_conn_sessions(pages: DataFrame) -> DataFrame:
    """applyInPandasWithState sessionization of connection lifecycles (J2)."""
    from ..operators.route import conn_lifecycle_records

    text = F.col("text")
    kept = pages.filter(~prefilter.is_oversized(text)).filter(
        ~prefilter.should_ignore(text)
    ).drop("html")
    events = conn_lifecycle_records(parse_lines(kept))
    return events.groupBy("conn_id").applyInPandasWithState(
        _session_fn,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(stream_df: DataFrame, query_name: str, checkpoint: str):
    """Drain the stream with Trigger.AvailableNow into an in-memory sink."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append" if query_name.endswith("sessions") else "complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
