"""O11 — explicit key-salting for heavy-hitter aggregation skew.

The reference has no skew handling (hot namespaces just contend on one
synchronized map, SURVEY.md §4 O11). At 100 TB a hot host/namespace key
overloads one reducer; the standard fix is a salted two-phase aggregate:

  phase 1: groupBy(keys + pmod(xxhash64(salt_src), S)) — partial aggregates,
           the hot key's rows spread over S reducers
  phase 2: groupBy(keys) — merge the S partials

Every SURVEY §2.5 aggregate is algebraic or sketch-mergeable, so two-phase is
always legal (SURVEY.md §7.3.5). AQE's skew handling covers joins; salting
covers aggregation skew, which AQE does not rebalance.

The synthetic pages table has a deliberate ~20%-of-traffic host and a hot
namespace, so the salted plan actually redistributes real skew in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (merge_fn, partial_fn) per algebraic aggregate
_MERGES = {
    "sum": (F.sum, F.sum),
    "count": (F.sum, lambda c: F.count(c)),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_src: str | Column = "url",
    buckets: int = 32,
) -> DataFrame:
    """Two-phase salted aggregate.

    aggs: output_name -> (agg_fn_name, input_column); agg_fn ∈ sum/count/min/max.
    Result is identical to df.groupBy(keys).agg(...) — verified against the
    plain plan (and the DuckDB oracle) in tests.
    """
    salt = F.pmod(F.xxhash64(salt_src), F.lit(buckets)).alias("_salt")
    partial = df.groupBy(*keys, salt).agg(
        *[
            _MERGES[fn][1](F.col(col)).alias(f"_p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    final = partial.groupBy(*keys).agg(
        *[
            _MERGES[fn][0](F.col(f"_p_{name}")).alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )
    return final


def salted_op_rollup(ops: DataFrame, buckets: int = 32) -> DataFrame:
    """Salted variant of the hot-namespace rollup: (db, coll, op) counts and
    duration sums with the partial phase spreading the hot key."""
    return salted_agg(
        ops.filter(F.col("ns_pass")),
        keys=["db", "coll", "op"],
        aggs={
            "count": ("count", "duration_ms"),
            "total_ms": ("sum", "duration_ms"),
            "min_ms": ("min", "duration_ms"),
            "max_ms": ("max", "duration_ms"),
        },
        salt_src="url",
        buckets=buckets,
    )
