"""Training-corpus pipeline CLI — the end-to-end composition of the
LLM-data operators over the documents table:

    annotate (quality + repetition + PII, ONE narrow projection)
      → keep-filter (quality / repetition / language dials)
      → materialize the filtered set (checkpoint parquet — dedup scans it
        several times: shingles, LSH bands, verify, joins back)
      → exact dedup (md5 groupBy) + MinHash-LSH near-dup clustering
      → kept corpus parquet (lang-partitioned) + dataset-card JSON

Usage (local dev):
    python -m mongo_log_parser_spark.corpus_job --sf 0.001 --out data/corpus1

Reference has no analog (it is a log analyzer); this is the pipeline the
brief's training-data operators exist for. Every stage operator is
individually DuckDB-oracle-checked (contract rows dedup_* / text_* and
tests/test_quality_urls.py); this module contributes the composition, whose
E2E invariants are pinned in tests/test_corpus_job.py.

Scale notes:
- The annotate stage is one scan: quality_cols + repetition_cols + pii_cols
  fold into a single whole-stage-codegen projection — no doc_id joins.
- Stage counts come from ONE conditional aggregate over the annotated scan,
  not one .count() action per stage.
- The filtered set is checkpointed to parquet before dedup for the same
  reason the log pipeline checkpoints parsed ops (plans/pipeline.py): the
  dedup subtree scans it repeatedly, and at 100 TB you re-read columnar
  bytes, not re-run the annotate projection.
- Dedup itself is the bucketed LSH family (operators/dedup.py) — candidate
  pairs come from band-bucket equi-joins, never an all-pairs product.
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="training-corpus pipeline")
    ap.add_argument("--documents", help="documents table path (parquet)")
    ap.add_argument("--sf", type=float, default=None,
                    help="use the driver testdata documents table at this scale factor")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--master", default=None)
    ap.add_argument("--min-quality", type=float, default=0.5,
                    help="minimum quality_score (textstats formula)")
    ap.add_argument("--max-dup-line-frac", type=float, default=0.30)
    ap.add_argument("--max-top2gram-frac", type=float, default=0.20)
    ap.add_argument("--max-top3gram-frac", type=float, default=0.18)
    ap.add_argument("--langs", nargs="*", default=None,
                    help="keep only these language labels (default: all)")
    ap.add_argument("--scrub-pii", action="store_true",
                    help="replace emails/IPs/phones with typed placeholder tokens")
    ap.add_argument("--skip-neardup", action="store_true",
                    help="exact dedup only (skip MinHash-LSH clustering)")
    ap.add_argument("--decontam-eval",
                    help="parquet of benchmark/eval docs (doc_id, text); "
                         "training docs sharing a word n-gram with it are dropped")
    ap.add_argument("--decontam-n", type=int, default=13,
                    help="collision n-gram length (GPT-3 uses 13)")
    ap.add_argument("--token-budget", type=int, default=None,
                    help="deterministically subsample the kept corpus to ~this "
                         "many whitespace tokens (per-language proportional)")
    return ap


def run_corpus_job(spark, args) -> dict:
    """Job body, session-lifecycle-free (testable against a shared session).
    Returns the dataset card (also written to <out>/dataset_card.json)."""
    from pyspark.sql import functions as F

    from .functions import quality
    from .functions.textstats import quality_cols
    from .operators import dedup

    if args.documents:
        docs_path = args.documents
    elif args.sf is not None:
        docs_path = f"/root/testdata/sf{args.sf}/documents.parquet"
    else:
        raise SystemExit("one of --documents / --sf is required")
    os.makedirs(args.out, exist_ok=True)

    docs = spark.read.parquet(docs_path)

    # ---- annotate: ONE narrow projection over the scan
    ann = docs.select(
        "doc_id", "lang", "text",
        *quality_cols("text"), *quality.repetition_cols("text"),
    )
    q_ok = F.col("quality_score") >= args.min_quality
    rep_ok = quality.repetition_pass(
        args.max_dup_line_frac, args.max_top2gram_frac, args.max_top3gram_frac)
    lang_ok = F.col("lang").isin(args.langs) if args.langs else F.lit(True)
    keep = q_ok & rep_ok & lang_ok

    # ---- stage counts: one conditional aggregate, one pass
    cnt = ann.agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum(q_ok.cast("long")).alias("pass_quality"),
        F.sum((q_ok & rep_ok).cast("long")).alias("pass_repetition"),
        F.sum(keep.cast("long")).alias("pass_filters"),
    ).collect()[0]

    # ---- materialize the filtered set; dedup scans it several times
    filtered_path = os.path.join(args.out, "_filtered")
    (ann.filter(keep)
        .select("doc_id", "lang", "text", "n_tokens", "quality_score")
        .write.mode("overwrite").parquet(filtered_path))
    filtered = spark.read.parquet(filtered_path)

    # ---- benchmark decontamination (before dedup: contaminated docs
    # shouldn't spend dedup work or seed clusters)
    n_contaminated = 0
    if args.decontam_eval:
        from .operators import decontam

        eval_docs = spark.read.parquet(args.decontam_eval)
        hits = decontam.contamination_hits(filtered, eval_docs, n=args.decontam_n)
        n_contaminated = hits.count()  # hits table is small (colliders only)
        filtered = filtered.join(hits.select("doc_id"), "doc_id", "left_anti")

    # ---- dedup: exact keepers ∩ near-dup cluster representatives
    exact_keepers = dedup.exact_duplicates(filtered).select(
        F.col("keeper_id").alias("doc_id"))
    kept = filtered.join(exact_keepers, "doc_id", "left_semi")
    if not args.skip_neardup:
        near_dropped = (dedup.neardup_clusters(filtered)
                        .filter(~F.col("keeper")).select("doc_id"))
        kept = kept.join(near_dropped, "doc_id", "left_anti")

    # ---- optional PII scrub over the kept text (narrow, post-dedup so the
    # hash keys saw the original bytes)
    out_cols = ["doc_id", "lang", "n_tokens", "quality_score"]
    if args.scrub_pii:
        kept = kept.select(*out_cols, *quality.pii_cols("text")) \
                   .withColumnRenamed("scrubbed_text", "text")
    else:
        kept = kept.select(*out_cols, "text")

    # ---- data mixing: deterministic subsample to the token budget
    if args.token_budget is not None:
        from .operators import mixing

        kept = mixing.sample_to_token_budget(kept, args.token_budget)

    corpus_path = os.path.join(args.out, "corpus")
    kept.write.mode("overwrite").partitionBy("lang").parquet(corpus_path)
    kept_back = spark.read.parquet(corpus_path)

    # ---- dataset card
    by_lang = {
        r["lang"]: {"n_docs": r["n_docs"], "total_tokens": r["total_tokens"],
                    "avg_quality": round(r["avg_quality"], 6)}
        for r in kept_back.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.avg("quality_score").alias("avg_quality")).collect()
    }
    card = {
        "source": docs_path,
        "params": {
            "min_quality": args.min_quality,
            "max_dup_line_frac": args.max_dup_line_frac,
            "max_top2gram_frac": args.max_top2gram_frac,
            "max_top3gram_frac": args.max_top3gram_frac,
            "langs": args.langs,
            "scrub_pii": bool(args.scrub_pii),
            "neardup": not args.skip_neardup,
            "decontam_eval": args.decontam_eval,
            "decontam_n": args.decontam_n,
            "token_budget": args.token_budget,
        },
        "stages": {
            "docs_in": cnt["docs_in"],
            "pass_quality": cnt["pass_quality"],
            "pass_repetition": cnt["pass_repetition"],
            "pass_filters": cnt["pass_filters"],
            "contaminated": n_contaminated,
            "kept_after_dedup": sum(v["n_docs"] for v in by_lang.values()),
            "total_tokens": sum(v["total_tokens"] for v in by_lang.values()),
        },
        "by_lang": dict(sorted(by_lang.items())),
        "corpus_path": corpus_path,
    }
    with open(os.path.join(args.out, "dataset_card.json"), "w") as f:
        json.dump(card, f, indent=2, sort_keys=True)
    return card


def main(argv: list[str] | None = None) -> None:
    from .session import build_session

    args = build_parser().parse_args(argv)
    spark = build_session(master=args.master or "local[*]")
    try:
        card = run_corpus_job(spark, args)
        print(json.dumps(card["stages"]))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
