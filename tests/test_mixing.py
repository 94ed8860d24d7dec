"""Data-mixing sampler (per-language token-budget subsampling) — DuckDB
oracle parity on sf0.001, determinism, and budget behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_log_parser_spark.contracts.data_oracle import (
    mix_sample_sql as _sample_sql,
    pack_sequences_sql,
    split_train_val_sql,
)
from mongo_log_parser_spark.operators import mixing
from tests.util import assert_df_equals_sql


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_proportional_sample_vs_oracle(docs, duck):
    got = mixing.sample_to_token_budget(docs, 20_000, tokens_col="n_chars")
    assert_df_equals_sql(got, duck, _sample_sql(20_000), "mix-prop")


def test_weighted_sample_vs_oracle(docs, duck):
    w = {"en": 3.0, "de": 1.0, "fr": 1.0}
    got = mixing.sample_to_token_budget(docs, 15_000, lang_weights=w,
                                        tokens_col="n_chars")
    assert_df_equals_sql(got, duck, _sample_sql(15_000, w), "mix-weighted")
    # unweighted languages get rate 0 → absent
    assert got.filter(~F.col("lang").isin(list(w))).count() == 0


def test_sample_deterministic_and_nested(docs):
    a = {r["doc_id"] for r in mixing.sample_to_token_budget(
        docs, 20_000, tokens_col="n_chars").collect()}
    b = {r["doc_id"] for r in mixing.sample_to_token_budget(
        docs, 20_000, tokens_col="n_chars").collect()}
    assert a == b
    # a smaller budget selects a SUBSET (same hash, lower threshold)
    small = {r["doc_id"] for r in mixing.sample_to_token_budget(
        docs, 5_000, tokens_col="n_chars").collect()}
    assert small <= a


def test_sample_hits_budget_roughly(docs):
    budget = 30_000
    got = mixing.sample_to_token_budget(docs, budget, tokens_col="n_chars")
    achieved = got.agg(F.sum("n_chars")).collect()[0][0]
    assert 0.5 * budget < achieved < 1.6 * budget  # hash sampling concentration


def test_budget_above_total_keeps_everything(docs):
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    got = mixing.sample_to_token_budget(docs, int(total) + 1, tokens_col="n_chars")
    assert got.count() == docs.count()


def test_rates_table(docs):
    rates = {r["lang"]: r["rate"] for r in mixing.lang_sampling_rates(
        docs, 10**9, tokens_col="n_chars").collect()}
    assert all(v == 1.0 for v in rates.values())


def test_split_train_val_vs_oracle(docs, duck):
    got = mixing.split_train_val(docs.select("doc_id", "lang"), val_frac=0.05)
    assert_df_equals_sql(got, duck, split_train_val_sql(0.05), "split")
    counts = {r["split"]: r["n"] for r in got.groupBy("split")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get("val", 0) > 0 and counts["train"] > counts.get("val", 0)


def test_split_stable_under_growth(docs):
    """A doc never migrates between splits when the corpus grows."""
    half = docs.filter(F.col("doc_id") < 250)
    a = dict(mixing.split_train_val(half.select("doc_id", "lang"), 0.05)
             .select("doc_id", "split").collect())
    b = dict(mixing.split_train_val(docs.select("doc_id", "lang"), 0.05)
             .select("doc_id", "split").collect())
    assert all(b[k] == v for k, v in a.items())


def test_pack_sequences_vs_oracle(docs, duck):
    got = mixing.pack_sequences(docs, 512, tokens_col="n_chars")
    assert_df_equals_sql(got, duck, pack_sequences_sql(512), "pack")


def test_pack_sequences_bins_are_contiguous_and_bounded(docs):
    rows = mixing.pack_sequences(docs, 512, tokens_col="n_chars").collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["doc_id"], r["bin_id"], r["n_chars"]))
    for lang, items in by_lang.items():
        items.sort()
        bins = [b for _, b, _ in items]
        assert bins == sorted(bins)          # monotone in id order
        assert bins[0] == 0
        # every bin's first doc starts before the boundary; combined size
        # of a bin < seq_len + its largest doc
        tot: dict[int, int] = {}
        for _, b, n in items:
            tot[b] = tot.get(b, 0) + n
        mx = max(n for _, _, n in items)
        assert all(v < 512 + mx for v in tot.values())
