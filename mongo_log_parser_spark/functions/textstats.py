"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All are pure column expressions (JVM-side) with deterministic arithmetic so
each has an exact DuckDB oracle; shared constants live here and the oracle
SQL is generated from them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small per-language stopword lists (n-gram/stopword heuristic lang-id)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en"],
    "pt": ["o", "a", "os", "e", "um", "uma", "não", "em"],
    "ja": ["の", "に", "は", "を", "た", "が", "で", "て"],
    "zh": ["的", "了", "在", "是", "我", "有", "他", "这"],
    "ru": ["и", "в", "не", "на", "я", "что", "он", "это"],
}
EN_STOPWORDS = STOPWORDS["en"]
FINGERPRINT_P = 1_000_000_007
PUNCT_CHARS = ".,!?;:"


def tokens(text_col: str = "text") -> Column:
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (letter runs / digit runs /
    single other non-space chars)."""
    return docs.select(
        id_col,
        F.size(tokens(text_col)).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))
        .cast("long").alias("bpe_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def lang_hits(text_col: str = "text") -> dict[str, Column]:
    """Per-language stopword-hit counts as pure column expressions over the
    token array — no explode, no aggregation."""
    toks = tokens(text_col)
    return {
        lang: F.size(F.filter(toks, lambda x: x.isin(words)))  # noqa: B023
        for lang, words in STOPWORDS.items()
    }


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Predicted language = argmax stopword hits, ties → lexicographically
    smallest lang (deterministic composite key, portable to the oracle).

    Single narrow projection, ZERO shuffles: hits per language are array
    expressions on the row, argmax is array_min over composite
    `lpad(1e6-hits)||lang` keys. (Replaces the previous 8-unioned-groupBys
    formulation — 8 aggregation passes over the exploded token stream.)"""
    hits = lang_hits(text_col)
    keyed = F.array(
        *[
            F.concat(F.lpad((F.lit(1000000) - h).cast("string"), 7, "0"), F.lit(lang))
            for lang, h in hits.items()
        ]
    )
    best = F.array_min(keyed)
    return docs.select(
        id_col,
        F.substring(best, 8, 10).alias("pred_lang"),
        (F.lit(1000000) - F.substring(best, 1, 7).cast("long")).alias("best_hits"),
        F.col("lang").alias("label_lang"),
    ).withColumn("match", F.col("pred_lang") == F.col("label_lang"))


def quality_cols(text_col: str = "text") -> list[Column]:
    """The quality-feature columns as aliased expressions, so composed
    pipelines (corpus_job) can fold them into one projection with other
    per-row stats instead of joining DataFrames on doc_id."""
    t = F.col(text_col)
    n_chars = F.length(t)
    punct = None
    for ch in PUNCT_CHARS:
        c = n_chars - F.length(F.replace(t, F.lit(ch), F.lit("")))
        punct = c if punct is None else punct + c
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(EN_STOPWORDS)))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    score = (
        0.4 * F.least(F.lit(1.0), n_chars / F.lit(500.0))
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * stop_ratio
    )
    return [
        n_chars.cast("long").alias("n_chars"),
        F.coalesce(punct, F.lit(0)).cast("long").alias("punct_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        stop_hits.cast("long").alias("stopword_hits"),
        F.round(score, 6).alias("quality_score"),
    ]


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality heuristic: length + punctuation + stopword-ratio features.

    score = 0.4*min(1, chars/500) + 0.3*(1 - punct_ratio) + 0.3*stop_ratio
    """
    return docs.select(id_col, *quality_cols(text_col))


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Rolling polynomial fingerprint over tokens:
    fp = Σ_pos (hex8(md5(tok)) % P) * ((pos % 997) + 1)  mod P
    (bounded terms — no 64-bit overflow on either engine)."""
    toked = docs.select(id_col, F.posexplode(tokens(text_col)).alias("pos", "tok"))
    term = (
        (F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % FINGERPRINT_P)
        * ((F.col("pos") % 997) + 1)
    )
    return toked.groupBy(id_col).agg(
        (F.sum(term) % FINGERPRINT_P).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def unigram_logprob_scores(docs: DataFrame, ref_docs: DataFrame,
                           id_col: str = "doc_id", text_col: str = "text",
                           min_count: int = 1) -> DataFrame:
    """Perplexity-proxy quality scoring (the CCNet-style LM filter with a
    unigram model standing in for KenLM, which is not in this environment):
    score each document by its mean token log-probability under an add-one
    unigram model trained on `ref_docs`.

        p(tok) = (c(tok) + 1) / (N + V + 1),  OOV → 1 / (N + V + 1)

    with N = total reference tokens, V = vocabulary size (after the
    `min_count` prune). Low avg_logprob = far from the reference
    distribution (gibberish or OOV-heavy) — the filter dial.

    Scale notes: the vocabulary broadcasts (prune with min_count at
    crawl scale so the broadcast stays bounded); N/V ride along as a
    broadcast single-row crossJoin, not a driver collect; the only
    shuffle is the per-doc aggregate. Docs with zero tokens are absent
    from the output."""
    ref = ref_docs.select(F.explode(tokens(text_col)).alias("token")) \
        .filter(F.col("token") != "")
    counts = ref.groupBy("token").agg(F.count(F.lit(1)).alias("c")) \
        .filter(F.col("c") >= min_count)
    totals = counts.agg(F.sum("c").alias("N"), F.count(F.lit(1)).alias("V"))
    d = docs.select(id_col, F.explode(tokens(text_col)).alias("token")) \
        .filter(F.col("token") != "")
    j = d.join(F.broadcast(counts), "token", "left").crossJoin(F.broadcast(totals))
    logp = F.log((F.coalesce(F.col("c"), F.lit(0)) + 1) / (F.col("N") + F.col("V") + 1))
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.sum(F.when(F.col("c").isNull(), 1).otherwise(0)).cast("long").alias("oov_toks"),
        F.round(F.avg(logp), 6).alias("avg_logprob"),
    )
