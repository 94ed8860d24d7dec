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

import pandas as pd
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


def _hyperplanes_np(dims: int, n_planes: int):
    """The same deterministic md5-derived hyperplane matrix as
    hyperplane_component(), materialized as a (dims, n_planes) float64 array.
    Cached per (dims, n_planes) per executor process."""
    import hashlib

    import numpy as np

    key = (dims, n_planes)
    cache = _hyperplanes_np.__dict__.setdefault("_cache", {})
    if key not in cache:
        half = (HP_MOD - 1) / 2
        h = np.empty((dims, n_planes), dtype=np.float64)
        for p in range(n_planes):
            for d in range(dims):
                hx = hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:8]
                h[d, p] = (int(hx, 16) % HP_MOD - half) / half
        cache[key] = h
    return cache[key]


def ann_lsh_buckets(vecs: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = N_HYPERPLANES) -> DataFrame:
    """Random-hyperplane LSH: sign-pattern bucket per vector.

    Scale path: one Arrow-batched pandas UDF doing the (batch × dims) @
    (dims × planes) matrix multiply per batch — a narrow map, NO shuffle, no
    row blowup. (The previous posexplode(vec) ⨯ explode(planes) formulation
    materialized n·dims·planes rows through a groupBy — a 6000× blowup at
    768-dim embeddings; it survives as the DuckDB oracle, which independently
    recomputes the identical buckets in SQL.)

    Exact cross-engine parity: dots are computed in fp64 and rounded HALF_UP
    to 6dp before the sign test, matching Spark/DuckDB round() semantics, so
    summation-order ulp noise cannot flip a bucket bit.

    `n_planes` is the recall/candidate-volume dial: 8 (256 buckets) keeps
    buckets occupied at the 500-vector test scale; at corpus scale raise it
    and/or band multiple tables (e.g. 4 tables × 16 planes)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def bucket_udf(emb: pd.Series) -> pd.Series:
        import numpy as np

        if len(emb) == 0:
            return pd.Series([], dtype=str)
        mat = np.vstack(emb.to_numpy()).astype(np.float64)
        h = _hyperplanes_np(mat.shape[1], n_planes)
        dots = mat @ h
        # HALF_UP at 6dp (Spark/DuckDB round()), then strict > 0
        rounded = np.sign(dots) * np.floor(np.abs(dots) * 1e6 + 0.5) / 1e6
        bits = (rounded > 0).astype(np.uint8) + ord("0")
        return pd.Series(bits.astype(np.uint8).tobytes().decode("ascii")[i * n_planes:(i + 1) * n_planes]
                         for i in range(mat.shape[0]))

    return vecs.select(id_col, bucket_udf(F.col(vec_col)).alias("bucket"))


def embedding_neardup_pairs(vecs: DataFrame, threshold: float = 0.2,
                            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates from the same LSH
    bucket (O(Σ bucket²) pairs, never all-pairs), verified by exact cosine ≥
    threshold. The dedup-by-embedding path of a training-data pipeline —
    production near-dup uses ~0.9-0.95; the synthetic test embeddings are
    near-orthogonal (max in-bucket cosine ≈0.41 at sf0.001) so the contract
    default is 0.2. Threshold is a parameter, not logic."""
    b = ann_lsh_buckets(vecs, id_col, vec_col)
    v = vecs.join(b, id_col)
    left = v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "bucket")
    right = v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "bucket")
    pairs = left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a", "id_b",
        F.round(
            _dot(F.col("vec_a"), F.col("vec_b")) / (_norm(F.col("vec_a")) * _norm(F.col("vec_b"))), 6
        ).alias("cosine"),
    )
    return scored.filter(F.col("cosine") >= threshold)


def ann_bucket_histogram(vecs: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
                         n_planes: int = N_HYPERPLANES) -> DataFrame:
    return ann_lsh_buckets(vecs, id_col, vec_col, n_planes=n_planes).groupBy("bucket").agg(
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


# --------------------------------------------------------------- IVF index

# IVF (inverted-file) ANN: a coarse quantizer partitions the corpus into
# n_lists inverted lists; a query probes only its nprobe nearest lists, so
# the candidate set is ~nprobe/n_lists of the corpus instead of all of it.
# The quantizer here uses deterministic seed centroids (the vectors with
# id < n_lists) so the index is reproducible in SQL for the DuckDB oracle;
# ivf_refine() is the Lloyd/k-means training step you would run offline in
# production (pytest-verified: cost non-decreasing, deterministic).
N_LISTS = 16
N_PROBE = 2


def _round6_np(arr):
    """HALF_UP at 6dp — matches Spark/DuckDB round() so summation ulp noise
    can't flip an argmax/threshold across engines."""
    import numpy as np

    return np.sign(arr) * np.floor(np.abs(arr) * 1e6 + 0.5) / 1e6


def collect_centroids(vecs: DataFrame, n_lists: int = N_LISTS,
                      id_col: str = "vec_id", vec_col: str = "embedding"):
    """Seed centroids = the vectors with id < n_lists, as a (n_lists, dims)
    float64 array ordered by id (the id-sorted dense row index IS the
    list_id; the oracle mirrors it with row_number() OVER (ORDER BY vec_id),
    so non-contiguous seed ids stay consistent across engines). A k-row
    driver collect — control plane, same shape as Spark ML KMeans centers."""
    import numpy as np

    rows = vecs.filter(F.col(id_col) < n_lists).select(id_col, vec_col).collect()
    rows.sort(key=lambda r: r[0])
    return np.array([[float(x) for x in r[1]] for r in rows], dtype=np.float64)


def _centroid_cosines(mat, centroids):
    """(batch, dims) fp64 × (n_lists, dims) fp64 → rounded-6dp cosine matrix.

    BLAS blocked summation can differ from DuckDB's sequential fold by ulps;
    the 6dp HALF_UP rounding absorbs that except when a dot lands within an
    ulp of a rounding boundary — same accepted residual risk as the LSH
    bucket UDF (ann_lsh_buckets), which shares this formulation."""
    import numpy as np

    cnorm = np.sqrt((centroids * centroids).sum(axis=1))
    vnorm = np.sqrt((mat * mat).sum(axis=1))
    return _round6_np((mat @ centroids.T) / (vnorm[:, None] * cnorm[None, :]))


def ivf_assign(vecs: DataFrame, n_lists: int = N_LISTS, id_col: str = "vec_id",
               vec_col: str = "embedding", centroids=None,
               carry_vec: bool = False) -> DataFrame:
    """Assign each vector to its nearest-centroid inverted list.

    Scale path: one Arrow-batched mapInPandas doing the (batch × dims) @
    (dims × n_lists) matrix multiply per batch against the broadcast
    centroid matrix — a narrow map, NO shuffle, no row blowup (the n×k
    crossJoin+window formulation survives as the DuckDB oracle). Ties on the
    rounded cosine go to the lowest list_id on both engines (np.argmax
    first-occurrence == ORDER BY cosine DESC, list_id ASC)."""
    import numpy as np

    if centroids is None:
        centroids = collect_centroids(vecs, n_lists, id_col, vec_col)
    cents = np.ascontiguousarray(centroids, dtype=np.float64)

    schema = f"{id_col} long, list_id int, cent_cosine double"
    if carry_vec:
        schema += f", {vec_col} array<float>"

    def gen(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            cos = _centroid_cosines(mat, cents)
            best = cos.argmax(axis=1)
            out = {
                id_col: pdf[id_col].to_numpy(),
                "list_id": best.astype(np.int32),
                "cent_cosine": cos[np.arange(len(best)), best],
            }
            if carry_vec:
                out[vec_col] = pdf[vec_col]
            yield pd.DataFrame(out)

    return vecs.select(id_col, vec_col).mapInPandas(gen, schema)


def ivf_probes(vecs: DataFrame, n_queries: int = 10, nprobe: int = N_PROBE,
               n_lists: int = N_LISTS, id_col: str = "vec_id",
               vec_col: str = "embedding", centroids=None) -> DataFrame:
    """For each query vector (id < n_queries): its nprobe nearest inverted
    lists, ranked by centroid cosine (desc, list_id asc). Same narrow-map
    shape as ivf_assign; emits nprobe rows per query."""
    import numpy as np

    if centroids is None:
        centroids = collect_centroids(vecs, n_lists, id_col, vec_col)
    cents = np.ascontiguousarray(centroids, dtype=np.float64)

    def gen(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            cos = _centroid_cosines(mat, cents)
            # stable sort by (-cosine, list_id): lexsort's last key is primary
            order = np.lexsort((np.arange(cents.shape[0])[None, :].repeat(len(mat), 0),
                                -cos), axis=1)[:, :nprobe]
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame({
                "query_id": np.repeat(ids, order.shape[1]),
                "list_id": order.reshape(-1).astype(np.int32),
                "probe_rank": np.tile(np.arange(1, order.shape[1] + 1, dtype=np.int32), len(ids)),
            })

    return (vecs.filter(F.col(id_col) < n_queries)
                .select(id_col, vec_col)
                .mapInPandas(gen, "query_id long, list_id int, probe_rank int"))


def ivf_topk(vecs: DataFrame, n_queries: int = 10, k: int = 5,
             nprobe: int = N_PROBE, n_lists: int = N_LISTS,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids=None) -> DataFrame:
    """IVF ANN search: exact cosine top-k restricted to the query's nprobe
    probed lists. Candidate volume ≈ nprobe/n_lists of the corpus; the probe
    table (n_queries × nprobe rows) is broadcast, so the only wide operation
    is the final per-query top-k window over candidates."""
    if centroids is None:
        centroids = collect_centroids(vecs, n_lists, id_col, vec_col)
    assigned = ivf_assign(vecs, n_lists, id_col, vec_col, centroids=centroids,
                          carry_vec=True)
    probes = ivf_probes(vecs, n_queries, nprobe, n_lists, id_col, vec_col,
                        centroids=centroids)
    queries = vecs.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qvec"))
    probes_q = probes.join(queries, probes["query_id"] == queries["q_id"]).drop("q_id")
    cand = assigned.join(F.broadcast(probes_q), "list_id").filter(
        F.col(id_col) != F.col("query_id"))
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(_dot(F.col(vec_col), F.col("qvec"))
                / (_norm(F.col(vec_col)) * _norm(F.col("qvec"))), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_refine(vecs: DataFrame, n_lists: int = N_LISTS, iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding"):
    """Lloyd/k-means refinement of the IVF coarse quantizer: assign (narrow
    Arrow map) → per-list mean (posexplode + groupBy(list,dim) avg — ONE
    shuffle of n×dims skinny rows per iteration, k×dims collected to the
    driver, same control-plane shape as Spark ML KMeans). Empty lists keep
    their previous centroid. Centroids are rounded to 6dp each iteration so
    the trained index is reproducible. Returns (centroids, mean_cosine_hist).

    Offline training step (production would run this once and persist the
    centroids); not part of the oracle contract — pytest asserts the mean
    assigned cosine is non-decreasing and the result is deterministic."""
    import numpy as np

    cents = collect_centroids(vecs, n_lists, id_col, vec_col)
    hist = []
    for _ in range(iters):
        a = ivf_assign(vecs, n_lists, id_col, vec_col, centroids=cents, carry_vec=True)
        stats = (a.select("list_id", "cent_cosine", F.posexplode(vec_col).alias("d", "x"))
                  .groupBy("list_id", "d")
                  .agg(F.avg("x").alias("m"), F.avg("cent_cosine").alias("c"),
                       F.count(F.lit(1)).alias("n"))
                  .collect())
        # vector-weighted mean assigned cosine (one row per list; each list's
        # dims rows repeat the same c/n) — the Lloyd cost proxy
        per_list = {r["list_id"]: (r["c"], r["n"]) for r in stats}
        tot = sum(n for _, n in per_list.values())
        hist.append(float(sum(c * n for c, n in per_list.values()) / tot))
        new = cents.copy()
        for r in stats:
            new[r["list_id"], r["d"]] = r["m"]
        cents = _round6_np(new)
    return cents, hist
