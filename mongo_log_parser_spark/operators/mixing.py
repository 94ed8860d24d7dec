"""Data mixing: deterministic per-language sampling of a corpus down to a
token budget — the "mixture weights" step of assembling a training set
from a deduplicated corpus.

Reference has no analog (log analyzer); first-class training-data operator
per the brief.

Scale notes:
- Per-language totals are one hash aggregate; the resulting rates table is
  a handful of rows and BROADCASTS back onto the corpus — the sampling
  pass itself is a narrow filter (md5-hash unit-interval test, the same
  deterministic-sampling idiom as the reference-parity 1-in-100 ignored
  sampler, operators/route.py), so no shuffle of the corpus beyond the
  totals aggregate.
- Selection is content-independent given doc_id: stable across reruns and
  cluster sizes, and exactly reproducible by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# md5-prefix → [0,1) unit interval (8 hex chars = 32 bits)
_HASH_DENOM = float(1 << 32)


def hash_unit(id_col: str = "doc_id"):
    """Deterministic per-doc uniform in [0,1): first 8 md5 hex chars of the
    id string over 2^32."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long") / F.lit(_HASH_DENOM)
    )


def lang_sampling_rates(docs: DataFrame, budget_tokens: int,
                        lang_weights: dict[str, float] | None = None,
                        tokens_col: str = "n_tokens") -> DataFrame:
    """Per-language keep rates hitting an overall token budget.

    With no weights, the budget splits proportionally to each language's
    token mass (one global rate). With weights, each language gets
    budget * w_l / Σw (weights normalized over the languages PRESENT),
    capped at its available mass (rate ≤ 1; under-full languages do not
    redistribute their slack — documented dial, keeps rates closed-form
    and oracle-exact)."""
    totals = docs.groupBy("lang").agg(F.sum(tokens_col).alias("total_tokens"))
    if lang_weights is None:
        grand = totals.agg(F.sum("total_tokens").alias("grand"))
        return (
            totals.crossJoin(F.broadcast(grand))
            .select(
                "lang", "total_tokens",
                F.round(F.least(
                    F.lit(1.0), F.lit(float(budget_tokens)) / F.col("grand")), 9)
                .alias("rate"))
        )
    spark = docs.sparkSession
    wsum = sum(lang_weights.values())
    wdf = spark.createDataFrame(
        [(k, float(v) / wsum) for k, v in sorted(lang_weights.items())],
        "lang string, weight double")
    return (
        totals.join(F.broadcast(wdf), "lang", "left")
        .select(
            "lang", "total_tokens",
            F.round(F.least(F.lit(1.0), F.coalesce(
                F.lit(float(budget_tokens)) * F.col("weight") / F.col("total_tokens"),
                F.lit(0.0))), 9).alias("rate"))
    )


def sample_to_token_budget(docs: DataFrame, budget_tokens: int,
                           lang_weights: dict[str, float] | None = None,
                           id_col: str = "doc_id",
                           tokens_col: str = "n_tokens") -> DataFrame:
    """Deterministic subsample of `docs` targeting `budget_tokens` total
    (expected value — per-doc hash sampling, so the achieved total
    concentrates around the target). Keeps a doc iff its hash-unit value
    falls below its language's rate; the rates table broadcasts."""
    rates = lang_sampling_rates(docs, budget_tokens, lang_weights, tokens_col)
    return (
        docs.join(F.broadcast(rates.select("lang", "rate")), "lang")
        .filter(hash_unit(id_col) < F.col("rate"))
        .drop("rate")
    )


def split_train_val(docs: DataFrame, val_frac: float = 0.01,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic train/validation assignment: split = 'val' iff the
    doc's hash-unit value falls below val_frac. Content-free given the id,
    so the split is stable under reruns, repartitioning, and corpus
    growth (a doc never migrates between splits). Narrow projection."""
    return docs.withColumn(
        "split", F.when(hash_unit(id_col) < F.lit(float(val_frac)),
                        F.lit("val")).otherwise(F.lit("train")))


def pack_sequences(docs: DataFrame, seq_len: int,
                   id_col: str = "doc_id",
                   tokens_col: str = "n_tokens") -> DataFrame:
    """Greedy sequence packing: assign docs (in deterministic id order,
    per language) to training-sequence bins of ~`seq_len` tokens —
    bin = floor(exclusive-prefix-sum(tokens) / seq_len), so a bin holds
    consecutive docs until their combined tokens cross the boundary
    (docs longer than seq_len take one-plus bins' worth of room; the
    trainer's tokenizer does the actual truncation).

    Scale note: the running sum is a window over (lang, id) — ONE
    range-partitioned sort shuffle. At 100 TB you'd pack per partition
    instead (mapInPandas with a local cursor, no global order guarantee);
    this global variant is the oracle-exact reference semantics and the
    default because bin numbering stays deterministic."""
    w = (Window.partitionBy("lang").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    prefix = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return docs.select(
        id_col, "lang", tokens_col,
        F.floor(prefix / F.lit(int(seq_len))).cast("long").alias("bin_id"),
    )
