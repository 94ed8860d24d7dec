"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the correctness baseline. Expressed with
  zip_with/aggregate (JVM-side, no Python) + a window rank. At scale this is
  a broadcast of the (small) query set against the full corpus — a narrow
  map + per-query TakeOrdered, no all-pairs shuffle.
- LSH-bucketed ANN: 16 deterministic pseudo-random hyperplanes whose
  components derive from md5("p_d") — data-independent, reproducible in SQL
  on both engines — bucket vectors by their sign pattern. The scale path:
  candidate generation becomes an equi-join on bucket, shuffle O(n), and the
  hyperplane "matrix" is a broadcast literal.

Float determinism: scores are summed in array order on both engines and
rounded to 6dp before any comparison/ranking, so cross-engine ulp noise can't
flip results (ties break by vec_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 8 planes → 256 buckets: ~2 vectors/bucket at the 500-vector test scale so
# the bucketed ANN actually produces candidates; at corpus scale you'd raise
# this (or band multiple tables) — it's a recall/candidate-volume dial.
N_HYPERPLANES = 8
HP_MOD = 2001  # component = (hexval % 2001 - 1000) / 1000 ∈ [-1, 1]


def _dot(a, b):
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_topk(vecs: DataFrame, n_queries: int = 10, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k for the first `n_queries` ids (broadcast side)."""
    queries = vecs.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    pairs = vecs.crossJoin(F.broadcast(queries)).filter(F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(_dot(F.col(vec_col), F.col("qvec")) / (_norm(F.col(vec_col)) * _norm(F.col("qvec"))), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_component(p, d):
    """Deterministic pseudo-random hyperplane entry from md5(p || '_' || d)."""
    hx = F.substring(F.md5(F.concat_ws("_", p.cast("string"), d.cast("string"))), 1, 8)
    return (F.conv(hx, 16, 10).cast("long") % HP_MOD - (HP_MOD - 1) / 2) / ((HP_MOD - 1) / 2)


def ann_lsh_buckets(vecs: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH: 16-bit sign bucket per vector.

    Implemented as posexplode(vec) ⨯ hyperplane-id → per-(vec, plane) dot →
    sign string. The hyperplane values are expressions of (p, d) only, so at
    scale Catalyst evaluates them inline — no hyperplane table is shuffled."""
    comp = vecs.select(id_col, F.posexplode(vec_col).alias("d", "x"))
    planes = comp.select(
        id_col, "d", "x", F.explode(F.sequence(F.lit(0), F.lit(N_HYPERPLANES - 1))).alias("p")
    )
    dots = planes.groupBy(id_col, "p").agg(
        F.round(F.sum(F.col("x").cast("double") * hyperplane_component(F.col("p"), F.col("d"))), 6).alias("dot")
    )
    sign = dots.withColumn("bit", F.when(F.col("dot") > 0, "1").otherwise("0"))
    return (
        sign.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("p", "bit"))), lambda s: s["bit"]), ""
            ).alias("bucket")
        )
    )


def ann_bucket_histogram(vecs: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    return ann_lsh_buckets(vecs, id_col, vec_col).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("count")
    )


def ann_lsh_topk(vecs: DataFrame, n_queries: int = 10, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN: rank by cosine *within the query's LSH bucket* (the scale path —
    candidate set is the bucket, not the corpus)."""
    buckets = ann_lsh_buckets(vecs, id_col, vec_col)
    v = vecs.join(buckets, id_col)
    queries = v.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), F.col("bucket").alias("qbucket")
    )
    cand = v.join(F.broadcast(queries), F.col("bucket") == F.col("qbucket")).filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(_dot(F.col(vec_col), F.col("qvec")) / (_norm(F.col(vec_col)) * _norm(F.col("qvec"))), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
