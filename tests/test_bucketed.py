"""Bucketed ops checkpoint (sinks/bucketed.py + pipeline materialize="bucketed"):
the shuffle is paid once at write; every downstream agg/join keyed on a
superset of the bucket key must then plan with ZERO Exchange, and results
must be byte-identical to the plain-parquet path."""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(df, _keys=None):
    return sorted([tuple(r) for r in df.collect()],
                  key=lambda t: tuple(str(x) for x in t))


@pytest.fixture(scope="module")
def bucketed_kv(spark, tmp_path_factory):
    from mongo_log_parser_spark.sinks import bucketed

    plain = spark.createDataFrame(
        [(f"h{i % 7}", f"ns{i % 3}", i % 2, float(i)) for i in range(200)]
        + [(None, "ns0", 0, 1.0)] * 5,  # the null-key bucket the docstring discusses
        "query_hash string, ns string, op int, dur double")
    tbl, name = bucketed.write_bucketed(
        plain, str(tmp_path_factory.mktemp("bkt") / "t"), key="query_hash", n_buckets=4)
    yield plain, tbl, name
    bucketed.drop_bucketed(spark, name)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_kv):
    from pyspark.sql import functions as F

    plain, tbl, _ = bucketed_kv
    # exact key and superset keys both satisfy ClusteredDistribution from the
    # scan's HashPartitioning — no Exchange anywhere in the physical plan
    for keys in (["query_hash"], ["query_hash", "ns", "op"]):
        agg = tbl.groupBy(*keys).agg(F.sum("dur").alias("s"), F.count("*").alias("c"))
        assert "Exchange" not in _plan(agg), _plan(agg)
        ref = plain.groupBy(*keys).agg(F.sum("dur").alias("s"), F.count("*").alias("c"))
        assert _rows(agg, keys) == _rows(ref, keys)


def test_bucketed_selfjoin_copartitioned(spark, bucketed_kv):
    """The A4 shape: two aggregations over the same bucketed scan joined on
    [bucket_key, ...] — subset co-partitioning (requireAllClusterKeysForCoPartition
    = false in build_session) keeps BOTH sides shuffle-free, so the only thing
    to forbid in the plan is any Exchange at all (broadcast included: the test
    pins the co-partitioned SortMergeJoin path)."""
    from pyspark.sql import functions as F

    plain, tbl, _ = bucketed_kv
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def q(df):
            base = df.groupBy("query_hash", "ns").agg(F.sum("dur").alias("s"))
            sub = df.groupBy("query_hash", "ns").agg(F.max("op").alias("m"))
            return base.join(sub, ["query_hash", "ns"])

        joined = q(tbl)
        assert "Exchange" not in _plan(joined), _plan(joined)
        assert _rows(joined, None) == _rows(q(plain), None)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_bucketed_write_one_file_per_bucket(spark, bucketed_kv, tmp_path):
    """The pre-write repartition must leave at most one parquet file per
    bucket — without it each of the input's tasks writes its own file per
    bucket it touches (here: up to 8 tasks x 4 buckets = 32 files)."""
    import os

    _, tbl, name = bucketed_kv
    loc = spark.sql(f"DESCRIBE FORMATTED {name}").filter("col_name = 'Location'") \
        .collect()[0]["data_type"].replace("file:", "")
    files = [f for f in os.listdir(loc) if f.endswith(".parquet")]
    assert 0 < len(files) <= 4, files


def test_pipeline_bucketed_query_hash_family_no_exchange(spark, pages_001):
    """materialize='bucketed' end-to-end: the A4 query_hash sink (2 groupBys +
    1 join over the full ops stream) and A5 plan_cache plan with zero Exchange,
    and every sink's rows match the plain-parquet pipeline exactly."""
    from mongo_log_parser_spark.plans import pipeline

    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    res_b = res_p = None
    try:
        res_b = pipeline.build(pages_001, materialize="bucketed")
        res_p = pipeline.build(pages_001, materialize="parquet")
        for sink in ("query_hash", "plan_cache", "plan_multi"):
            if sink not in res_b.sinks:
                continue
            plan = _plan(res_b.sinks[sink])
            assert "Exchange" not in plan, f"{sink}: {plan}"
        # the per-shard variant groups on a SUPERSET [shard, query_hash, ns,
        # op] — ClusteredDistribution is still satisfied by the scan's
        # HashPartitioning(query_hash), so the report's per-shard accordion
        # family rides the same bucketed layout for free (synthetic pages
        # carry no shard column, so derive one; withColumn keeps the scan's
        # output partitioning)
        from pyspark.sql import functions as F

        from mongo_log_parser_spark.operators import aggregates

        ops_sharded = res_b.streams["ops"].withColumn(
            "shard", F.substring("url", 1, 8))
        shard_plan = _plan(aggregates.query_hash(ops_sharded, extra_keys=("shard",)))
        assert "Exchange" not in shard_plan, shard_plan
        for sink in res_b.sinks:
            got = _rows(res_b.sinks[sink], None)
            want = _rows(res_p.sinks[sink], None)
            assert got == want, sink
        # the checkpoint registered exactly one catalog table, dropped on unpersist
        assert len(res_b.tables) == 1
        name = res_b.tables[0]
        assert spark.catalog.tableExists(name)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        for r in (res_b, res_p):
            if r is not None:
                r.unpersist()
    assert not spark.catalog.tableExists(name)


def test_bucketed_null_bucket_pruned_by_pushdown(spark, bucketed_kv):
    """The documented null-bucket story: `query_hash IS NOT NULL` must reach
    the scan as a pushed filter so the all-null bucket prunes at row-group
    level instead of becoming a straggler task."""
    tbl = bucketed_kv[1]
    plan = _plan(tbl.filter("query_hash is not null").groupBy("query_hash").count())
    assert "IsNotNull(query_hash)" in plan, plan
