"""Incremental ingest dedup (new batch vs existing corpus) — DuckDB-oracle
checks for the cross-set LSH candidates and verified drops (the novel
relational shapes), hand-computed expectations on a crafted batch, and an
sf0.001 split-table oracle run. Within-batch pieces (exact_duplicates,
neardup_clusters) are already contract-oracle-checked."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mongo_log_parser_spark.contracts.data_oracle import (
    cross_candidates_sql as _cand_sql,
    incremental_drops_sql as _drops_sql,
)
from mongo_log_parser_spark.operators import dedup
from tests.util import assert_df_equals_sql


# corpus: 3 docs; batch: exact dup of corpus (100), near-dup of corpus (101),
# exact-dup pair within batch (102,103), near-dup pair within batch (104,105),
# unique (106)
BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
CORPUS = [
    (0, BASE),
    (1, "one two three four five six seven eight nine ten"),
    (2, "red orange yellow green blue indigo violet umber black white"),
]
BATCH = [
    (100, BASE),                                                  # exact vs corpus
    (101, BASE.replace("kappa", "lambda")),                       # near vs corpus
    (102, "sun moon stars comet nebula quasar pulsar nova dwarf giant"),
    (103, "sun moon stars comet nebula quasar pulsar nova dwarf giant"),
    (104, "cat dog bird fish horse cow sheep goat pig duck"),
    (105, "cat dog bird fish horse cow sheep goat pig hen"),      # near of 104
    (106, "strictly unique words nothing shared with anything else here now"),
]


@pytest.fixture(scope="module")
def crafted(spark, duck):
    cp = pd.DataFrame(CORPUS, columns=["doc_id", "text"])
    np_ = pd.DataFrame(BATCH, columns=["doc_id", "text"])
    duck.register("inc_corpus", cp)
    duck.register("inc_new", np_)
    return spark.createDataFrame(np_), spark.createDataFrame(cp)


def test_cross_candidates_vs_oracle(crafted, duck):
    new, corpus = crafted
    got = dedup.cross_lsh_candidates(new, corpus)
    assert_df_equals_sql(got, duck, _cand_sql("inc_new", "inc_corpus"), "cross-cand")


def test_neardup_drops_vs_oracle(crafted, duck):
    new, corpus = crafted
    got = dedup.incremental_neardup_drops(new, corpus)
    assert_df_equals_sql(got, duck, _drops_sql("inc_new", "inc_corpus"), "cross-drops")
    ids = {r["doc_id"] for r in got.collect()}
    assert 100 in ids and 101 in ids          # exact + near dup of corpus
    assert 106 not in ids


def test_incremental_dedup_expected_keeps(crafted):
    new, corpus = crafted
    kept = {r["doc_id"] for r in dedup.incremental_dedup(new, corpus).collect()}
    # 100 exact-dup of corpus: dropped; 101 near-dup of corpus: dropped;
    # 102/103 exact pair: keeper 102 only; 104/105 near pair: keeper 104;
    # 106 unique: kept
    assert kept == {102, 104, 106}


def test_incremental_on_sf0001_split_vs_oracle(spark, duck):
    """Split the real documents table at the median id: old half = corpus,
    new half = batch; oracle the verified-drop set on the real data."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    duck.execute("CREATE OR REPLACE VIEW split_corpus AS "
                 "SELECT * FROM documents WHERE doc_id < 250")
    duck.execute("CREATE OR REPLACE VIEW split_new AS "
                 "SELECT * FROM documents WHERE doc_id >= 250")
    got = dedup.incremental_neardup_drops(new, corpus)
    assert_df_equals_sql(got, duck, _drops_sql("split_new", "split_corpus"),
                         "sf0.001-split-drops")


def test_incremental_kept_disjoint_from_drops(crafted):
    new, corpus = crafted
    kept = dedup.incremental_dedup(new, corpus)
    drops = dedup.incremental_neardup_drops(new, corpus)
    assert kept.join(drops, "doc_id", "left_semi").count() == 0
    # kept hashes never collide with corpus hashes
    k = kept.select(F.md5("text").alias("h"))
    c = corpus.select(F.md5("text").alias("h"))
    assert k.join(c, "h", "left_semi").count() == 0
