"""E2E invariants for the training-corpus pipeline CLI (corpus_job.py).

Each stage operator is individually oracle-checked elsewhere
(dedup_* contract rows; tests/test_quality_urls.py); here we pin the
COMPOSITION: stage counts are monotone, the kept corpus is exactly the
filtered set minus dedup drops, no exact duplicates survive, PII scrub
reaches the output, and the run is deterministic."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mongo_log_parser_spark import corpus_job


def _run(spark, tmp, *extra):
    args = corpus_job.build_parser().parse_args(
        ["--sf", "0.001", "--out", str(tmp), *extra])
    return corpus_job.run_corpus_job(spark, args)


@pytest.fixture(scope="module")
def card_and_out(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("corpus")
    card = _run(spark, out, "--scrub-pii")
    return card, out


def test_stage_counts_monotone(card_and_out):
    c = card_and_out[0]["stages"]
    assert (c["docs_in"] >= c["pass_quality"] >= c["pass_repetition"]
            >= c["pass_filters"] >= c["kept_after_dedup"] > 0)


def test_card_matches_disk(card_and_out, spark):
    card, out = card_and_out
    on_disk = json.load(open(os.path.join(out, "dataset_card.json")))
    assert on_disk == card
    corpus = spark.read.parquet(card["corpus_path"])
    assert corpus.count() == card["stages"]["kept_after_dedup"]
    assert sum(v["n_docs"] for v in card["by_lang"].values()) == corpus.count()
    # lang-partitioned layout on disk
    assert any(d.startswith("lang=") for d in os.listdir(card["corpus_path"]))


def test_no_exact_duplicates_survive(card_and_out, spark):
    card, _ = card_and_out
    corpus = spark.read.parquet(card["corpus_path"])
    n_hashes = corpus.select(F.md5("text")).distinct().count()
    assert n_hashes == corpus.count()


def test_kept_is_filtered_minus_dedup_drops(card_and_out, spark):
    """Every kept doc passes the filters, and every filtered-out doc is
    either below a threshold or a dedup drop — set algebra over doc_ids."""
    card, out = card_and_out
    filtered = spark.read.parquet(os.path.join(out, "_filtered"))
    corpus = spark.read.parquet(card["corpus_path"])
    f_ids = {r["doc_id"] for r in filtered.select("doc_id").collect()}
    k_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert k_ids <= f_ids
    assert len(f_ids) == card["stages"]["pass_filters"]
    assert len(k_ids) == card["stages"]["kept_after_dedup"]


def test_scrubbed_corpus_has_no_emails(card_and_out, spark):
    from mongo_log_parser_spark.functions.quality import EMAIL_RE
    card, _ = card_and_out
    corpus = spark.read.parquet(card["corpus_path"])
    hits = corpus.filter(F.col("text").rlike(EMAIL_RE)).count()
    assert hits == 0


def test_deterministic_rerun(spark, tmp_path, card_and_out):
    card1, _ = card_and_out
    card2 = _run(spark, tmp_path / "again", "--scrub-pii")
    assert card1["stages"] == card2["stages"]
    assert card1["by_lang"] == card2["by_lang"]


def test_skip_neardup_keeps_more(spark, tmp_path, card_and_out):
    card_full, _ = card_and_out
    card_exact = _run(spark, tmp_path / "exact", "--scrub-pii", "--skip-neardup")
    assert card_exact["stages"]["kept_after_dedup"] >= card_full["stages"]["kept_after_dedup"]
    assert card_exact["stages"]["pass_filters"] == card_full["stages"]["pass_filters"]


def test_lang_restriction(spark, tmp_path):
    card = _run(spark, tmp_path / "en", "--langs", "en", "--skip-neardup")
    assert set(card["by_lang"]) <= {"en"}
    assert card["stages"]["kept_after_dedup"] > 0


def test_decontam_and_token_budget(spark, tmp_path, card_and_out):
    card_base, _ = card_and_out
    # eval set = 10 real docs → they (or their dups) must vanish from the corpus
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    eval_path = str(tmp_path / "eval")
    docs.filter(F.col("doc_id") < 10).select("doc_id", "text") \
        .write.parquet(eval_path)
    card = _run(spark, tmp_path / "dc", "--scrub-pii",
                "--decontam-eval", eval_path, "--decontam-n", "8",
                "--token-budget", "20000")
    assert card["stages"]["contaminated"] > 0
    assert card["stages"]["pass_filters"] == card_base["stages"]["pass_filters"]
    assert (card["stages"]["kept_after_dedup"]
            < card_base["stages"]["kept_after_dedup"])
    # budget respected in expectation (hash sampling concentration)
    assert card["stages"]["total_tokens"] < 2 * 20000
    # no surviving doc contains an eval 8-gram
    from mongo_log_parser_spark.operators import decontam
    corpus = spark.read.parquet(card["corpus_path"])
    ev = spark.read.parquet(eval_path)
    assert decontam.contamination_hits(corpus, ev, n=8).count() == 0
