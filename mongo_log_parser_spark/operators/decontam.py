"""Benchmark decontamination: drop training documents that share long word
n-grams with an evaluation set (the GPT-3 appendix-C / PaLM-style filter).

Reference has no analog (log analyzer); this is a first-class
training-data-pipeline operator per the brief.

Scale notes:
- The eval side is always tiny relative to the crawl (benchmarks are
  thousands of docs), so its distinct n-gram set BROADCASTS: the training
  side explodes its n-grams and hash-semi-joins against the broadcast —
  no shuffle of the corpus for the join itself, one doc_id-keyed partial
  aggregate for the per-doc hit counts.
- n defaults to 13 (the GPT-3 collision length); tests use smaller n so
  crafted/synthetic docs can collide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.quality import word_ngrams
from ..functions.textstats import tokens

DEFAULT_N = 13


def eval_ngrams(eval_docs: DataFrame, text_col: str = "text",
                n: int = DEFAULT_N) -> DataFrame:
    """Distinct word n-grams of the evaluation set (the broadcast side)."""
    return (
        eval_docs.select(F.explode(word_ngrams(tokens(text_col), n)).alias("ngram"))
        .distinct()
    )


def contamination_hits(docs: DataFrame, eval_docs: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       n: int = DEFAULT_N) -> DataFrame:
    """Per contaminated doc: how many distinct eval n-grams it contains and
    the lexicographically first one (deterministic evidence sample).
    Docs with zero hits are absent (the common case at corpus scale)."""
    doc_ng = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(tokens(text_col), n))).alias("ngram"),
    )
    hits = doc_ng.join(F.broadcast(eval_ngrams(eval_docs, text_col, n)), "ngram")
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("ngram").alias("first_hit"),
    )


def decontaminate(docs: DataFrame, eval_docs: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = DEFAULT_N) -> DataFrame:
    """Training docs with every eval-colliding document removed (left_anti
    on the contaminated id set, which is small and broadcasts)."""
    bad = contamination_hits(docs, eval_docs, id_col, text_col, n).select(id_col)
    return docs.join(bad, id_col, "left_anti")
