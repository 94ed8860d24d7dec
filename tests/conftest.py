from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from mongo_log_parser_spark.session import build_session

    s = build_session(master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_001(spark):
    from mongo_log_parser_spark.sources import datagen

    return spark.read.parquet(datagen.ensure_pages(0.001))


@pytest.fixture(scope="session")
def streams_001(pages_001):
    from mongo_log_parser_spark.operators import route

    return route.split_streams(pages_001)


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    sf_dir = "/root/testdata/sf0.001"
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con
