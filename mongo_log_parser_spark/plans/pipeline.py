"""End-to-end pipeline assembly (SURVEY.md §3.1 Spark restatement):

  scan → prefilter (F1-F4) → vectorized parse (E1-E2) → route (F5-F11)
       → extract (E3-E20) → aggregates (A1-A12) + joins (J1-J3) → sinks

`build()` returns every sink DataFrame lazily off one cached parse — the
Spark analog of the reference's single file pass feeding nine accumulators.
Caching the parsed/dispatched intermediates is what keeps this a single scan
per materialization wave instead of one scan per sink.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..operators import aggregates as agg
from ..operators import joins, route
from ..sources import datagen


def read_pages(spark: SparkSession, sf: float | None = None, path: str | None = None) -> DataFrame:
    path = path or datagen.ensure_pages(sf if sf is not None else 0.001)
    return spark.read.parquet(path)


def read_lookup(spark: SparkSession, name: str) -> DataFrame:
    import os

    p = datagen.lookup_path(name)
    if not os.path.exists(p):
        datagen.ensure_pages(0.001)  # generates lookups as a side effect
    return spark.read.parquet(p)


@dataclass
class PipelineResult:
    streams: dict[str, DataFrame]
    sinks: dict[str, DataFrame] = field(default_factory=dict)

    def unpersist(self) -> None:
        for df in self.streams.values():
            try:
                df.unpersist()
            except Exception:
                pass


def build(pages: DataFrame, cache: bool = True) -> PipelineResult:
    streams = route.split_streams(pages)
    if cache:
        # ops is consumed by 6 aggregates; kept by 5 side channels → cache both.
        # MEMORY_AND_DISK: at 100 TB the executors spill instead of OOM.
        streams["ops"] = streams["ops"].persist(StorageLevel.MEMORY_AND_DISK)
    sinks = {
        "main_ops": agg.main_ops(streams["ops"]),
        "ttl_ops": agg.ttl_ops(streams["ttl_pre"]),
        "op_stats": agg.op_stats(streams["ops"]),
        "query_hash": agg.query_hash(streams["ops"]),
        "plan_cache": agg.plan_cache(streams["ops"]),
        "index_stats": agg.index_stats(streams["ops"]),
        "error_codes": agg.error_codes(streams["errors"]),
        "transactions": agg.transactions(streams["transactions"]),
        "slow_planning": agg.slow_planning(streams["ops"]),
        "app_conn_stats": agg.app_conn_stats(streams["ops"]),
        "driver_stats": joins.driver_stats(
            streams["client_metadata"], streams["auth"], streams["conn_lifecycle"]
        ),
        "ignored": agg.ignored_stats(streams["ignored"]),
    }
    return PipelineResult(streams=streams, sinks=sinks)


def run_metrics(pages: DataFrame) -> dict[str, int]:
    """Scan-level routing metrics (ProcessingStats analog)."""
    text = F.col("text")
    from ..functions import prefilter

    row = pages.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(prefilter.is_oversized(text).cast("long")).alias("oversized"),
        F.sum((~prefilter.is_oversized(text) & prefilter.should_ignore(text)).cast("long")).alias("ignored"),
    ).collect()[0]
    return {"total": row["total"], "oversized": row["oversized"], "ignored": row["ignored"]}
