"""Web-corpus quality filters a training-data pipeline runs before dedup:
Gopher-style repetition statistics and PII scrubbing.

Reference has no analog (it is a log analyzer); these are the
training-data-pipeline operators the brief adds on top of the reference's
inventory (Rae et al. 2021 "Scaling Language Models" §A.1.1 repetition
filters; C4/RefinedWeb-style PII normalization).

Scale notes:
- `repetition_stats` is a single narrow projection — per-document line and
  n-gram statistics computed with higher-order array functions
  (transform/array_sort/aggregate), so the most-frequent-n-gram search is a
  per-row run-length scan over a sorted array, ZERO shuffles and no Python.
  At 100 TB this runs at scan speed alongside the quality/langid columns.
- `pii_scrub` is a regexp_replace/regexp_count chain — JVM-side, pushed
  into the same whole-stage-codegen span as the rest of the projection.
  Patterns are RE2-compatible (no backtracking constructs) so the DuckDB
  oracle runs the identical regexes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens

# RE2- and java.util.regex-compatible (no lookaround, no backreferences) so
# Spark and the DuckDB oracle execute the very same patterns.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9\-]+(\.[A-Za-z0-9\-]+)*\.[A-Za-z]{2,}"
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
# phone-ish: 7+ digit runs allowing separators; anchored on digits both ends
PHONE_RE = r"\+?[0-9][0-9()\-\. ]{5,}[0-9]"

# scrub order is load-bearing: emails first (their local parts contain
# digits/dots the other patterns would chew), then IPs (dotted quads match
# the phone class), then phones.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def _line_chars(lines: Column) -> Column:
    return F.aggregate(lines, F.lit(0).cast("long"),
                       lambda acc, x: acc + F.length(x))


def _top_ngram(sorted_ngrams: Column) -> Column:
    """(count, ngram) of the most frequent element of a SORTED array via a
    single run-length fold. Ties break to the lexicographically smallest
    n-gram for free: equal-count runs arrive in sort order and only a
    strictly longer run displaces the incumbent."""
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"), F.lit("").alias("best_ng"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        better = run > acc["best"]
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["best_ng"]).alias("best_ng"),
        )

    return F.aggregate(
        sorted_ngrams, zero, step,
        lambda acc: F.struct(acc["best"].alias("count"), acc["best_ng"].alias("ngram")),
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams as an array expression (empty when the
    document has fewer than n tokens)."""
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document repetition features (the Gopher §A.1.1 family):

    - dup_line_frac: fraction of lines that are repeats of an earlier line
    - dup_line_char_frac: fraction of line characters inside those repeats
    - top2gram_char_frac / top3gram_char_frac: fraction of text characters
      covered by the occurrences of the single most frequent word 2-/3-gram
      (count * ngram_length / text_length, the Gopher definition)

    All per-row array math over one scan; deterministic tie-breaks make the
    output exactly reproducible by the DuckDB oracle in the tests.
    """
    return docs.select(id_col, *repetition_cols(text_col))


def repetition_cols(text_col: str = "text") -> list[Column]:
    """The repetition features as aliased column expressions (see
    repetition_stats), foldable into a wider one-scan projection."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    n_dlines = F.size(F.array_distinct(lines))
    lc, dlc = _line_chars(lines), _line_chars(F.array_distinct(lines))
    toks = tokens(text_col)
    n_chars = F.length(F.trim(F.lower(t)))
    out: list[Column] = [n_lines.cast("long").alias("n_lines")]
    out.append(
        F.when(n_lines > 0, (n_lines - n_dlines) / n_lines)
        .otherwise(F.lit(0.0)).alias("dup_line_frac"))
    out.append(
        F.when(lc > 0, (lc - dlc) / lc).otherwise(F.lit(0.0)).alias("dup_line_char_frac"))
    for n in (2, 3):
        top = _top_ngram(F.array_sort(word_ngrams(toks, n)))
        out.append(
            F.when(
                (n_chars > 0) & (top["count"] > 0),
                top["count"] * F.length(top["ngram"]) / n_chars,
            ).otherwise(F.lit(0.0)).alias(f"top{n}gram_char_frac"))
        out.append(top["ngram"].alias(f"top{n}gram"))
        out.append(top["count"].alias(f"top{n}gram_n"))
    return out


def repetition_pass(max_dup_line_frac: float = 0.30,
                    max_top2gram_char_frac: float = 0.20,
                    max_top3gram_char_frac: float = 0.18) -> Column:
    """Keep-predicate over repetition_stats output (Gopher-flavored
    thresholds; dials, not constants from the paper — documented as such).
    The n-gram clauses only fire when the top n-gram actually REPEATS
    (count ≥ 2) — in a short clean doc every n-gram occurs once and covers
    a large character fraction without being repetition."""
    return (
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & ((F.col("top2gram_n") < 2)
           | (F.col("top2gram_char_frac") <= max_top2gram_char_frac))
        & ((F.col("top3gram_n") < 2)
           | (F.col("top3gram_char_frac") <= max_top3gram_char_frac))
    )


def pii_scrub(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Scrub emails → IPv4 → phone-like digit runs to typed placeholder
    tokens, with per-kind match counts (counted BEFORE any replacement so
    each count reflects the original text; the replacement chain then
    applies in the fixed order above)."""
    return docs.select(F.col(id_col), *pii_cols(text_col))


def pii_cols(text_col: str = "text") -> list[Column]:
    """Per-kind PII match counts + the scrubbed text, as aliased columns."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]
    scrubbed = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return [*counts, scrubbed.alias("scrubbed_text")]
