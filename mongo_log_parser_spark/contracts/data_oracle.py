"""DuckDB oracle SQL for the testdata-table queries (data_queries.py).

SQL is generated from the same constants the Spark operators use
(dedup/similarity/textstats modules) so thresholds, hash formulas and
tokenization definitions have a single source of truth.
"""

from __future__ import annotations

from ..functions.quality import EMAIL_RE, IPV4_RE, PHONE_RE
from ..functions.textstats import EN_STOPWORDS, FINGERPRINT_P, PUNCT_CHARS, STOPWORDS
from ..functions.urls import SCHEME_HOST_RE
from ..operators.dedup import JACCARD_THRESHOLD, LSH_BANDS, N_MINHASHES, NGRAM_W, SHINGLE_W
from ..operators.similarity import HP_MOD, N_HYPERPLANES, N_LISTS, N_PROBE
from ..sources import datagen

TOKENS = r"regexp_split_to_array(trim(lower(text)), '\s+')"


def q_pricing_summary() -> str:
    return """
SELECT l_returnflag, l_linestatus,
  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
  round(sum(l_extendedprice), 3) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 3) AS sum_disc_price,
  round(avg(l_quantity), 6) AS avg_qty,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_customers() -> str:
    return """
SELECT c_custkey, c_name, c_mktsegment, revenue, n_orders FROM (
  SELECT o_custkey, round(sum(o_totalprice), 3) AS revenue, count(*) AS n_orders
  FROM orders GROUP BY o_custkey
) r JOIN customer ON r.o_custkey = c_custkey
ORDER BY revenue DESC, c_custkey ASC LIMIT 10
"""


def q_events_json() -> str:
    return """
SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
  count(*) AS count, round(sum(value), 4) AS sum_value, max(user_id) AS max_user
FROM events GROUP BY 1, 2
"""


def q_orders_window() -> str:
    return """
SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderstatus AS latest_status
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
      FROM orders) WHERE rn = 1
"""


def q_cust_no_orders() -> str:
    return """
SELECT c_mktsegment, count(*) AS n_customers, min(c_custkey) AS min_custkey
FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
GROUP BY c_mktsegment
"""


def q_pricing_rollup() -> str:
    return """
SELECT l_returnflag, l_linestatus, count(*) AS n_items,
  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_dedup_exact() -> str:
    return """
SELECT md5(text) AS text_hash, count(*) AS dup_count, min(doc_id) AS keeper_id
FROM documents GROUP BY 1
"""


_SHINGLES_CTE = f"""
toks AS (SELECT doc_id, {TOKENS} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks CROSS JOIN LATERAL unnest(generate_series(1, len(t) - {SHINGLE_W - 1})) AS g(i)
  WHERE len(t) >= {SHINGLE_W}
)"""


def _minhash_cte(n_minhashes: int = N_MINHASHES) -> str:
    cols = ", ".join(
        f"min(md5('{j}:' || shingle)) AS h{j}" for j in range(n_minhashes)
    )
    return _SHINGLES_CTE + f""",
mh AS (SELECT doc_id, {cols} FROM sh GROUP BY doc_id)"""


def q_minhash_signatures() -> str:
    sig = " || '|' || ".join(f"h{j}" for j in range(N_MINHASHES))
    return f"WITH {_minhash_cte()}\nSELECT doc_id, {sig} AS signature FROM mh"


def _bands_cte(n_minhashes: int = N_MINHASHES, n_bands: int = LSH_BANDS) -> str:
    r = n_minhashes // n_bands
    parts = [
        f"SELECT doc_id, {b} AS band_id, md5({' || '.join(f'h{b * r + i}' for i in range(r))}) AS band_key FROM mh"
        for b in range(n_bands)
    ]
    return _minhash_cte(n_minhashes) + ",\nbands AS (" + "\nUNION ALL ".join(parts) + ")"


def q_lsh_candidates(n_minhashes: int = N_MINHASHES, n_bands: int = LSH_BANDS) -> str:
    return f"""WITH {_bands_cte(n_minhashes, n_bands)}
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
WHERE a.doc_id < b.doc_id
"""


def q_neardup_pairs() -> str:
    return f"""WITH {_bands_cte()},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b, i.inter, za.n_sh AS n_a, zb.n_sh AS n_b,
  round(CAST(i.inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.inter), 6) AS jaccard
FROM inter i JOIN sizes za ON za.doc_id = i.id_a JOIN sizes zb ON zb.doc_id = i.id_b
WHERE round(CAST(i.inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.inter), 6) >= {JACCARD_THRESHOLD}
"""


def q_neardup_clusters() -> str:
    """Connected components of the verified near-dup graph as a recursive
    CTE: reach(node, label) is seeded with (n, n) for every endpoint and
    closed over edges (keeping only labels smaller than the node they reach —
    the component minimum always survives that pruning, since it is smaller
    than every other member id on its propagation path); min(label) per node
    is the representative. Independent of the Spark loop's iteration order."""
    return f"""WITH RECURSIVE {_bands_cte()},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY c.id_a, c.id_b
),
pairs AS (
  SELECT i.id_a, i.id_b
  FROM inter i JOIN sizes za ON za.doc_id = i.id_a JOIN sizes zb ON zb.doc_id = i.id_b
  WHERE round(CAST(i.inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.inter), 6) >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(node, label) AS (
    SELECT src, src FROM edges
  UNION
    SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    WHERE r.label < e.dst
),
labels AS (SELECT node, min(label) AS rep_id FROM reach GROUP BY node),
csize AS (SELECT rep_id, count(*) AS cluster_size FROM labels GROUP BY rep_id)
SELECT l.node AS doc_id, l.rep_id, c.cluster_size, l.node = l.rep_id AS keeper
FROM labels l JOIN csize c USING (rep_id)
"""


def q_ngram_jaccard() -> str:
    n = NGRAM_W
    return f"""WITH {_bands_cte()},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
),
grams AS (
  SELECT DISTINCT doc_id, substr(s, i, {n}) AS gram FROM (
    SELECT doc_id, substr(lower(text), 1, 200) AS s FROM documents
  ) CROSS JOIN LATERAL unnest(generate_series(1, greatest(length(s) - {n - 1}, 1))) AS g(i)
  WHERE length(substr(s, i, {n})) = {n}
),
gsizes AS (SELECT doc_id, count(*) AS n_g FROM grams GROUP BY doc_id),
ginter AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.id_a
  JOIN grams gb ON gb.doc_id = c.id_b AND gb.gram = ga.gram
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
  round(CAST(i.inter AS DOUBLE) / (za.n_g + zb.n_g - i.inter), 6) AS jaccard
FROM ginter i JOIN gsizes za ON za.doc_id = i.id_a JOIN gsizes zb ON zb.doc_id = i.id_b
"""


_SIMHASH_CTE = """toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok FROM documents
),
th AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM toks),
bits AS (
  SELECT doc_id, k,
    sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, 16 - (k // 4), 1)) - 1) >> (k % 4)) & 1 = 1
        THEN 1 ELSE -1 END) AS w
  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS k)
  GROUP BY doc_id, k
),
sig AS (
  SELECT doc_id, string_agg(CASE WHEN w > 0 THEN '1' ELSE '0' END, '' ORDER BY k DESC) AS simhash_bits
  FROM bits GROUP BY doc_id
)"""


def q_simhash_signatures() -> str:
    return (f"WITH {_SIMHASH_CTE}\n"
            "SELECT doc_id, simhash_bits, substr(simhash_bits, 1, 16) AS bucket FROM sig")


def q_simhash_neardup(max_hamming: int = 16) -> str:
    """Prefix-blocked SimHash pairs with exact Hamming verify — replicates
    dedup.simhash_neardup_pairs (same 16-bit prefix blocking, same 64-position
    Hamming fold) over the SQL simhash replica."""
    return f"""WITH {_SIMHASH_CTE},
sb AS (SELECT doc_id, simhash_bits, substr(simhash_bits, 1, 16) AS bucket FROM sig)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(len(list_filter(generate_series(1, 64),
    i -> substr(a.simhash_bits, i, 1) <> substr(b.simhash_bits, i, 1))) AS INTEGER) AS hamming
FROM sb a JOIN sb b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE len(list_filter(generate_series(1, 64),
    i -> substr(a.simhash_bits, i, 1) <> substr(b.simhash_bits, i, 1))) <= {max_hamming}
"""


def q_simhash_multitable(max_hamming: int = 16, n_tables: int = 4) -> str:
    """Multi-table SimHash blocking oracle: all `n_tables` disjoint 16-bit
    blocks of the signature as blocking keys (dedup.simhash_multitable_pairs),
    distinct candidate pairs, exact 64-position Hamming verify."""
    width = 64 // n_tables
    return f"""WITH {_SIMHASH_CTE},
blocks AS (
  SELECT doc_id, simhash_bits, t,
    substr(simhash_bits, t * {width} + 1, {width}) AS block_key
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {n_tables - 1})) AS t)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
    a.simhash_bits AS sa, b.simhash_bits AS sb
  FROM blocks a JOIN blocks b ON a.t = b.t AND a.block_key = b.block_key
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b,
  CAST(len(list_filter(generate_series(1, 64),
    i -> substr(sa, i, 1) <> substr(sb, i, 1))) AS INTEGER) AS hamming
FROM cand
WHERE len(list_filter(generate_series(1, 64),
    i -> substr(sa, i, 1) <> substr(sb, i, 1))) <= {max_hamming}
"""


_COSINE = (
    "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(q.qvec AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])))), 6)"
)


def q_cosine_topk(n_queries: int = 10, k: int = 5) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_COSINE} AS cosine
  FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def _buckets_cte(n_planes: int = N_HYPERPLANES) -> str:
    return f"""
comp AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d, CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
dots AS (
  SELECT vec_id, p,
    round(sum(x * ((CAST('0x' || substr(md5(p || '_' || d), 1, 8) AS BIGINT) % {HP_MOD} - {(HP_MOD - 1) // 2})
      / {(HP_MOD - 1) // 2}.0)), 6) AS dot
  FROM comp CROSS JOIN (SELECT unnest(generate_series(0, {n_planes - 1})) AS p)
  GROUP BY vec_id, p
),
buckets AS (
  SELECT vec_id, string_agg(CASE WHEN dot > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
  FROM dots GROUP BY vec_id
)"""


_BUCKETS_CTE = _buckets_cte()


def q_ann_buckets(n_planes: int = N_HYPERPLANES) -> str:
    return (f"WITH {_buckets_cte(n_planes)}\n"
            "SELECT bucket, count(*) AS count FROM buckets GROUP BY bucket")


def q_ann_lsh_topk(n_queries: int = 10, k: int = 5) -> str:
    return f"""WITH {_BUCKETS_CTE},
v AS (SELECT e.*, b.bucket FROM embeddings e JOIN buckets b USING (vec_id)),
q AS (SELECT vec_id AS query_id, embedding AS qvec, bucket AS qbucket FROM v WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_COSINE} AS cosine
  FROM v e JOIN q ON e.bucket = q.qbucket WHERE e.vec_id != q.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


_IVF_CENT_COS = (
    "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cvec)"
    " / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(c.cvec, c.cvec))), 6)"
)

# IVF CTEs: seed centroids = vectors with id < N_LISTS; list_id is the DENSE
# id-sorted rank (not vec_id itself) to match similarity.collect_centroids's
# row-index labeling when the seed ids are non-contiguous. Assignment =
# argmax rounded cosine (ties -> lowest list_id), exactly the semantics of
# similarity.ivf_assign's numpy argmax over the rounded matrix.
_IVF_CTE = f"""
cents AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings WHERE vec_id < {N_LISTS}
),
cscored AS (
  SELECT e.vec_id, c.list_id, {_IVF_CENT_COS} AS cent_cosine
  FROM embeddings e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, list_id, cent_cosine FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cent_cosine DESC, list_id ASC) AS rn
    FROM cscored
  ) WHERE rn = 1
)"""


def q_ivf_assign() -> str:
    return f"WITH {_IVF_CTE}\nSELECT vec_id, list_id, cent_cosine FROM assign"


def q_ivf_topk(n_queries: int = 10, k: int = 5, nprobe: int = N_PROBE) -> str:
    return f"""WITH {_IVF_CTE},
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cent_cosine DESC, list_id ASC) AS rn
    FROM cscored WHERE vec_id < {n_queries}
  ) WHERE rn <= {nprobe}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM assign a JOIN probes p USING (list_id) WHERE a.vec_id != p.query_id
),
q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {n_queries}),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, {_COSINE} AS cosine
  FROM cand JOIN q USING (query_id) JOIN embeddings e ON e.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def q_embedding_neardup(threshold: float = 0.2) -> str:
    # CAST to DOUBLE[] — without it DuckDB dots in float32 and diverges from
    # Spark's double fold at the 6dp rounding boundary
    cos = ("round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) / "
           "(sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) * "
           "sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6)")
    return f"""WITH {_BUCKETS_CTE},
v AS (SELECT e.*, bk.bucket FROM embeddings e JOIN buckets bk USING (vec_id))
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cosine
FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


def q_corpus_kept() -> str:
    """Kept corpus after exact dedup (min doc_id per md5(text)) and near-dup
    cluster pruning (representatives only) — the recursive-CTE components of
    q_neardup_clusters with the keeper filter applied."""
    return f"""WITH RECURSIVE {_bands_cte()},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY c.id_a, c.id_b
),
pairs AS (
  SELECT i.id_a, i.id_b
  FROM inter i JOIN sizes za ON za.doc_id = i.id_a JOIN sizes zb ON zb.doc_id = i.id_b
  WHERE round(CAST(i.inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.inter), 6) >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(node, label) AS (
    SELECT src, src FROM edges
  UNION
    SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    WHERE r.label < e.dst
),
labels AS (SELECT node, min(label) AS rep_id FROM reach GROUP BY node),
exact_keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
near_drop AS (SELECT node AS doc_id FROM labels WHERE node <> rep_id)
SELECT d.doc_id, CAST(length(d.text) AS INTEGER) AS n_chars
FROM documents d
JOIN exact_keep USING (doc_id)
WHERE d.doc_id NOT IN (SELECT doc_id FROM near_drop)
"""


def q_corpus_stats() -> str:
    """Per-language rollup over the kept corpus: the q_corpus_kept CTE chain
    with the token-count and quality-score query bodies embedded as
    subqueries (single source of truth for each expression)."""
    kept_body = q_corpus_kept()
    # strip the leading WITH RECURSIVE ... and reuse verbatim as a subquery
    return f"""WITH kept AS ({kept_body}),
tok AS ({q_token_counts()}),
qual AS ({q_quality_scores()})
SELECT d.lang,
  count(*) AS n_docs,
  CAST(sum(tok.ws_tokens) AS BIGINT) AS total_ws_tokens,
  round(avg(qual.quality_score), 6) AS avg_quality
FROM documents d
JOIN kept ON kept.doc_id = d.doc_id
JOIN tok ON tok.doc_id = d.doc_id
JOIN qual ON qual.doc_id = d.doc_id
GROUP BY d.lang
"""


def q_embedding_clusters(threshold: float = 0.2) -> str:
    """Connected components over the embedding-cosine near-dup graph — the
    same recursive-CTE reach as q_neardup_clusters, seeded from the
    q_embedding_neardup pair set."""
    cos = ("round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) / "
           "(sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) * "
           "sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6)")
    return f"""WITH RECURSIVE {_BUCKETS_CTE},
v AS (SELECT e.*, bk.bucket FROM embeddings e JOIN buckets bk USING (vec_id)),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE {cos} >= {threshold}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(node, label) AS (
    SELECT src, src FROM edges
  UNION
    SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    WHERE r.label < e.dst
),
labels AS (SELECT node, min(label) AS rep_id FROM reach GROUP BY node),
csize AS (SELECT rep_id, count(*) AS cluster_size FROM labels GROUP BY rep_id)
SELECT l.node AS vec_id, l.rep_id, c.cluster_size, l.node = l.rep_id AS keeper
FROM labels l JOIN csize c USING (rep_id)
"""


def q_token_counts() -> str:
    return f"""
SELECT doc_id,
  CAST(len({TOKENS}) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens,
  length(text) AS n_chars
FROM documents
"""


def q_lang_id() -> str:
    parts = []
    for lang, words in STOPWORDS.items():
        inlist = ", ".join(f"'{w}'" for w in words)
        parts.append(
            f"SELECT doc_id, '{lang}' AS cand_lang, "
            f"CAST(sum(CASE WHEN tok IN ({inlist}) THEN 1 ELSE 0 END) AS BIGINT) AS hits FROM toks GROUP BY doc_id"
        )
    union = "\nUNION ALL ".join(parts)
    return f"""
WITH toks AS (SELECT doc_id, unnest({TOKENS}) AS tok FROM documents),
scores AS ({union}),
pred AS (
  SELECT doc_id,
    arg_min(cand_lang, lpad(CAST(1000000 - hits AS VARCHAR), 7, '0') || cand_lang) AS pred_lang,
    CAST(max(hits) AS BIGINT) AS best_hits
  FROM scores GROUP BY doc_id
)
SELECT p.doc_id, p.pred_lang, p.best_hits, d.lang AS label_lang, p.pred_lang = d.lang AS match
FROM pred p JOIN documents d USING (doc_id)
"""


def q_quality_scores() -> str:
    punct = " + ".join(
        f"(length(text) - length(replace(text, '{c}', '')))" for c in PUNCT_CHARS
    )
    stops = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"""
SELECT doc_id,
  length(text) AS n_chars,
  {punct} AS punct_chars,
  len({TOKENS}) AS n_tokens,
  len(list_filter({TOKENS}, x -> x IN ({stops}))) AS stopword_hits,
  round(
    0.4 * least(1.0, length(text) / 500.0)
    + 0.3 * (1.0 - (CASE WHEN length(text) > 0 THEN ({punct}) / length(text) ELSE 0.0 END))
    + 0.3 * (CASE WHEN len({TOKENS}) > 0
             THEN CAST(len(list_filter({TOKENS}, x -> x IN ({stops}))) AS DOUBLE) / len({TOKENS})
             ELSE 0.0 END), 6) AS quality_score
FROM documents
"""


def q_fingerprints() -> str:
    return f"""
SELECT doc_id,
  CAST(sum((CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {FINGERPRINT_P}) * ((pos % 997) + 1)) % {FINGERPRINT_P} AS BIGINT)
    AS fingerprint,
  count(*) AS n_tokens
FROM (
  SELECT doc_id, generate_subscripts(t, 1) - 1 AS pos, unnest(t) AS tok
  FROM (SELECT doc_id, {TOKENS} AS t FROM documents)
)
GROUP BY doc_id
"""


def q_warc_scan(sf: float) -> str:
    """The WARC roundtrip oracle is simply the pages table itself: read_warc
    over datagen.ensure_warc(sf)'s segments must reproduce every (url,
    warc_ts, octet_length(html)) row of the source parquet."""
    datagen.ensure_warc(sf)
    return f"""
SELECT url, warc_ts AT TIME ZONE 'UTC' AS warc_ts,
  CAST(octet_length(html) AS BIGINT) AS n_bytes
FROM read_parquet('{datagen.pages_glob(sf)}')
"""


def q_top_tokens(k: int = 100) -> str:
    return f"""
SELECT token, count(*) AS n FROM (
  SELECT unnest({TOKENS}) AS token FROM documents
) WHERE token <> ''
GROUP BY token ORDER BY n DESC, token ASC LIMIT {k}
"""


def q_media_meta(sf: float) -> str:
    p = datagen.pages_glob(sf)
    return f"""
-- Independent recomputation of media.fake_decode's deterministic fields.
-- DuckDB 1.0 sha256 only accepts VARCHAR (blob cast escapes bytes), so the
-- oracle recomputes the hash from the generator's html construction rule:
-- html == utf8('<html><body><pre>' || text || '</pre></body></html>')
SELECT url,
  CAST(octet_length(html) AS BIGINT) AS n_bytes,
  sha256('<html><body><pre>' || text || '</pre></body></html>') AS sha256,
  CASE octet_length(html) % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_kind,
  CAST(CASE WHEN octet_length(html) % 3 != 1 THEN octet_length(html) % 1920 END AS INTEGER) AS width,
  CAST(CASE WHEN octet_length(html) % 3 != 1 THEN octet_length(html) % 1080 END AS INTEGER) AS height,
  CAST(CASE WHEN octet_length(html) % 3 = 2 THEN octet_length(html) % 240 END AS INTEGER) AS frames
FROM read_parquet('{p}')
"""


def q_media_decode(sf: float) -> str:
    from ..sources import datagen

    datagen.ensure_media(sf)
    p = datagen.media_glob(sf)
    # Mirrors datagen.ensure_media's index arithmetic (row i parsed from the
    # url): kind = i%4 in (png, jpeg, gif, opaque); image dims are
    # 16+(i*7)%113 x 16+(i*13)%97 — REAL header bytes the Spark side must
    # parse back out; opaque rows reproduce media.fake_decode's fields from
    # octet_length alone.
    return f"""
WITH m AS (
  SELECT url, payload,
    CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT) AS i,
    CAST(octet_length(payload) AS BIGINT) AS n
  FROM read_parquet('{p}')
)
SELECT url,
  CASE i % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
    ELSE (CASE n % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END)
  END AS media_kind,
  CAST(CASE WHEN i % 4 < 3 THEN 16 + (i * 7) % 113
            WHEN n % 3 != 1 THEN n % 1920 END AS INTEGER) AS width,
  CAST(CASE WHEN i % 4 < 3 THEN 16 + (i * 13) % 97
            WHEN n % 3 != 1 THEN n % 1080 END AS INTEGER) AS height,
  CAST(CASE WHEN i % 4 < 3 THEN 1
            WHEN n % 3 = 2 THEN n % 240 END AS INTEGER) AS frames,
  n AS n_bytes
FROM m
"""


# ---------------------------------------------------------------------------
# Corpus-side operators (quality/urls/decontam/incremental-dedup) — promoted
# from the round-5 in-test oracles (tests/test_quality_urls.py,
# tests/test_incremental_dedup.py, tests/test_decontam_unigram.py) to
# driver-contract rows. The SQL builders live here (single source of truth);
# the tests import them back.

def repetition_sql(src: str = "documents") -> str:
    """Gopher §A.1.1 repetition family, recomputed in DuckDB list algebra."""
    return f"""
WITH base AS (
  SELECT doc_id, text,
         string_split(text, chr(10)) AS lines,
         string_split_regex(trim(lower(text)), '\\s+') AS toks,
         length(trim(lower(text))) AS n_chars
  FROM {src}
),
linestats AS (
  SELECT doc_id,
         len(lines) AS n_lines,
         len(lines) - len(list_distinct(lines)) AS dup_lines,
         list_sum(list_transform(lines, x -> length(x))) AS lc,
         list_sum(list_transform(list_distinct(lines), x -> length(x))) AS dlc
  FROM base
),
ng2 AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1])) AS g
  FROM base WHERE len(toks) >= 2
),
best2 AS (
  SELECT doc_id, g, count(*) AS c FROM ng2 GROUP BY doc_id, g
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) = 1
),
ng3 AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
  FROM base WHERE len(toks) >= 3
),
best3 AS (
  SELECT doc_id, g, count(*) AS c FROM ng3 GROUP BY doc_id, g
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) = 1
)
SELECT b.doc_id,
       ls.n_lines::BIGINT AS n_lines,
       CASE WHEN ls.n_lines > 0 THEN ls.dup_lines / ls.n_lines ELSE 0.0 END
         AS dup_line_frac,
       CASE WHEN ls.lc > 0 THEN (ls.lc - ls.dlc) / ls.lc ELSE 0.0 END
         AS dup_line_char_frac,
       CASE WHEN b.n_chars > 0 AND coalesce(b2.c, 0) > 0
            THEN b2.c * length(b2.g) / b.n_chars ELSE 0.0 END AS top2gram_char_frac,
       coalesce(b2.g, '') AS top2gram,
       coalesce(b2.c, 0)::BIGINT AS top2gram_n,
       CASE WHEN b.n_chars > 0 AND coalesce(b3.c, 0) > 0
            THEN b3.c * length(b3.g) / b.n_chars ELSE 0.0 END AS top3gram_char_frac,
       coalesce(b3.g, '') AS top3gram,
       coalesce(b3.c, 0)::BIGINT AS top3gram_n
FROM base b
JOIN linestats ls USING (doc_id)
LEFT JOIN best2 b2 USING (doc_id)
LEFT JOIN best3 b3 USING (doc_id)
"""


def pii_sql(src: str = "documents") -> str:
    """The pii_scrub chain: count-before-replace, email → IP → phone order."""
    e, i, p = EMAIL_RE, IPV4_RE, PHONE_RE
    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{e}')) ::BIGINT AS n_email,
       len(regexp_extract_all(text, '{i}')) ::BIGINT AS n_ip,
       len(regexp_extract_all(text, '{p}')) ::BIGINT AS n_phone,
       regexp_replace(regexp_replace(regexp_replace(text,
         '{e}', '<EMAIL>', 'g'), '{i}', '<IP>', 'g'), '{p}', '<PHONE>', 'g')
         AS scrubbed_text
FROM {src}
"""


def norm_url_sql(col: str) -> str:
    """The normalize_url chain in DuckDB syntax (same regexes, same order)."""
    u = col
    u = f"regexp_replace({u}, '#.*$', '', 'g')"
    u = f"regexp_replace({u}, 'utm_[^&#]*&', '', 'g')"
    u = f"regexp_replace({u}, '[?&]utm_[^&#]*$', '', 'g')"
    u = f"regexp_replace({u}, '\\?$', '', 'g')"
    u = f"regexp_replace({u}, '^(http://[^/:?#]+):80([/?#].*)?$', '\\1\\2', 'g')"
    u = f"regexp_replace({u}, '^(https://[^/:?#]+):443([/?#].*)?$', '\\1\\2', 'g')"
    u = f"regexp_replace({u}, '^([A-Za-z]+://)www\\.', '\\1', 'g')"
    u = f"regexp_replace({u}, '/\\?', '?', 'g')"
    u = f"regexp_replace({u}, '/$', '', 'g')"
    head = f"regexp_extract({u}, '{SCHEME_HOST_RE}', 1)"
    return f"(lower({head}) || substr({u}, length({head}) + 1))"


def url_parts_sql(src: str, extra_cols: str = "") -> str:
    nu = norm_url_sql("url")
    host = (f"regexp_replace(regexp_extract({nu}, "
            f"'^[a-z][a-z0-9+.\\-]*://([^/?#]+)', 1), ':[0-9]+$', '', 'g')")
    return f"""
SELECT url, {nu} AS norm_url, {host} AS host,
       regexp_extract({host}, '([^.]+\\.[^.]+)$', 1) AS domain,
       regexp_extract({host}, '\\.([^.]+)$', 1) AS tld,
       regexp_extract({nu}, '^[a-z][a-z0-9+.\\-]*://[^/?#]+([^?#]*)', 1) AS path
       {extra_cols}
FROM {src}
"""


def q_url_parts(sf: float) -> str:
    p = datagen.pages_glob(sf)
    return url_parts_sql(f"(SELECT url FROM read_parquet('{p}'))")


def q_url_domain_stats(sf: float) -> str:
    p = datagen.pages_glob(sf)
    src = f"(SELECT url, lang FROM read_parquet('{p}'))"
    return f"""
WITH p AS ({url_parts_sql(src, extra_cols=', lang')})
SELECT domain, count(*) AS n_pages,
       count(DISTINCT host) AS n_hosts,
       count(DISTINCT lang) AS n_langs
FROM p GROUP BY domain
"""


def q_url_dedup_latest(sf: float) -> str:
    p = datagen.pages_glob(sf)
    src = f"(SELECT url, warc_ts FROM read_parquet('{p}'))"
    return f"""
WITH p AS ({url_parts_sql(src, extra_cols=', warc_ts')}),
r AS (
  SELECT norm_url, url,
         row_number() OVER (PARTITION BY norm_url ORDER BY warc_ts DESC, url DESC) AS rn,
         count(*) OVER (PARTITION BY norm_url) AS n
  FROM p)
SELECT norm_url, url AS kept_url, n AS n_versions FROM r WHERE rn = 1
"""


def _inc_band_cte(tbl: str, pfx: str) -> str:
    """shingle → minhash → bands chain for one table (same constants the
    Spark operators import)."""
    mins = ", ".join(
        f"min(md5('{j}:' || shingle)) AS h{j}" for j in range(N_MINHASHES))
    r = N_MINHASHES // LSH_BANDS
    bands = "\nUNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, "
        f"md5({' || '.join(f'h{b * r + i}' for i in range(r))}) AS band_key "
        f"FROM {pfx}mh"
        for b in range(LSH_BANDS))
    return f"""
{pfx}toks AS (SELECT doc_id, {TOKENS} AS t FROM {tbl}),
{pfx}sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM {pfx}toks CROSS JOIN LATERAL unnest(generate_series(1, len(t) - {SHINGLE_W - 1})) AS g(i)
  WHERE len(t) >= {SHINGLE_W}),
{pfx}mh AS (SELECT doc_id, {mins} FROM {pfx}sh GROUP BY doc_id),
{pfx}bands AS ({bands})"""


def cross_candidates_sql(new_tbl: str, corpus_tbl: str) -> str:
    return f"""
WITH {_inc_band_cte(new_tbl, 'n')}, {_inc_band_cte(corpus_tbl, 'c')}
SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
FROM nbands a JOIN cbands b ON a.band_id = b.band_id AND a.band_key = b.band_key
"""


def incremental_drops_sql(new_tbl: str, corpus_tbl: str) -> str:
    return f"""
WITH {_inc_band_cte(new_tbl, 'n')}, {_inc_band_cte(corpus_tbl, 'c')},
cand AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
  FROM nbands a JOIN cbands b ON a.band_id = b.band_id AND a.band_key = b.band_key),
szn AS (SELECT doc_id, count(*) AS n_a FROM nsh GROUP BY doc_id),
szc AS (SELECT doc_id, count(*) AS n_b FROM csh GROUP BY doc_id),
inter AS (
  SELECT c.new_id, c.corpus_id, count(*) AS inter
  FROM cand c
  JOIN nsh sa ON sa.doc_id = c.new_id
  JOIN csh sb ON sb.doc_id = c.corpus_id AND sb.shingle = sa.shingle
  GROUP BY c.new_id, c.corpus_id)
SELECT DISTINCT i.new_id AS doc_id
FROM inter i JOIN szn ON szn.doc_id = i.new_id JOIN szc ON szc.doc_id = i.corpus_id
WHERE round(CAST(i.inter AS DOUBLE) / (szn.n_a + szc.n_b - i.inter), 6) >= {JACCARD_THRESHOLD}
"""


def _ngram_cte(tbl: str, pfx: str, n: int) -> str:
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
{pfx}toks AS (SELECT doc_id, {TOKENS} AS t FROM {tbl}),
{pfx}ng AS (
  SELECT DISTINCT doc_id, {gram} AS ngram
  FROM {pfx}toks CROSS JOIN LATERAL unnest(generate_series(1, len(t) - {n - 1})) AS g(i)
  WHERE len(t) >= {n})"""


def contamination_sql(docs_tbl: str, eval_tbl: str, n: int) -> str:
    return f"""
WITH {_ngram_cte(docs_tbl, 'd', n)}, {_ngram_cte(eval_tbl, 'e', n)},
ev AS (SELECT DISTINCT ngram FROM eng)
SELECT doc_id, count(*) AS n_hits, min(ngram) AS first_hit
FROM dng JOIN ev USING (ngram)
GROUP BY doc_id
"""


def unigram_sql(docs_tbl: str, ref_tbl: str, min_count: int = 1) -> str:
    return f"""
WITH ref AS (SELECT unnest({TOKENS}) AS token FROM {ref_tbl}),
counts AS (SELECT token, count(*) AS c FROM ref WHERE token <> ''
           GROUP BY token HAVING count(*) >= {min_count}),
tot AS (SELECT sum(c) AS N, count(*) AS V FROM counts),
d AS (SELECT doc_id, unnest({TOKENS}) AS token FROM {docs_tbl}),
j AS (SELECT doc_id, c FROM (SELECT * FROM d WHERE token <> '') dd
      LEFT JOIN counts USING (token))
SELECT doc_id, count(*) AS n_toks,
       sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END)::BIGINT AS oov_toks,
       round(avg(ln((coalesce(c, 0) + 1) / (N + V + 1))), 6) AS avg_logprob
FROM j, tot GROUP BY doc_id
"""


# Data-mixing family (operators/mixing.py) — same md5-prefix hash unit on
# both sides; budgets/weights are fixed constants mirrored in
# data_queries.py.

HASH_U = ("(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
          " / 4294967296.0)")


def mix_sample_sql(budget: int, weights: dict[str, float] | None = None,
                   src: str = "documents") -> str:
    if weights is None:
        rates = f"""
totals AS (SELECT lang, sum(n_chars) AS total_tokens FROM {src} GROUP BY lang),
g AS (SELECT sum(total_tokens) AS grand FROM totals),
rates AS (SELECT lang, round(least(1.0, {budget} / grand), 9) AS rate FROM totals, g)"""
    else:
        wsum = sum(weights.values())
        vals = ", ".join(f"('{k}', {v / wsum})" for k, v in sorted(weights.items()))
        rates = f"""
totals AS (SELECT lang, sum(n_chars) AS total_tokens FROM {src} GROUP BY lang),
w(lang, weight) AS (VALUES {vals}),
rates AS (
  SELECT t.lang, round(least(1.0, coalesce({budget} * w.weight / t.total_tokens, 0.0)), 9) AS rate
  FROM totals t LEFT JOIN w ON w.lang = t.lang)"""
    return f"""
WITH {rates}
SELECT d.lang, d.doc_id, d.text, d.source, d.n_chars
FROM {src} d JOIN rates r ON r.lang = d.lang
WHERE {HASH_U} < r.rate
"""


def split_train_val_sql(val_frac: float, src: str = "documents") -> str:
    return f"""
SELECT doc_id, lang,
       CASE WHEN {HASH_U} < {val_frac} THEN 'val' ELSE 'train' END AS split
FROM {src}
"""


def pack_sequences_sql(seq_len: int, src: str = "documents") -> str:
    return f"""
SELECT doc_id, lang, n_chars,
       CAST(floor(coalesce(sum(n_chars) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {seq_len})
         AS BIGINT) AS bin_id
FROM {src}
"""


MIX_BUDGET = 20_000
MIX_WEIGHTED_BUDGET = 15_000
MIX_WEIGHTS = {"en": 3.0, "de": 1.0, "fr": 1.0}
SPLIT_VAL_FRAC = 0.05
PACK_SEQ_LEN = 512

# Deterministic, sf-independent splits for the two-input contract rows
# (mirrored exactly in data_queries.py):
INC_CORPUS = "(SELECT * FROM documents WHERE doc_id % 2 = 0)"
INC_NEW = "(SELECT * FROM documents WHERE doc_id % 2 = 1)"
DECONTAM_EVAL = "(SELECT doc_id, text FROM documents WHERE doc_id < 20)"
DECONTAM_N = 8
UNIGRAM_REF = "(SELECT * FROM documents WHERE doc_id % 5 = 0)"
UNIGRAM_MIN_COUNT = 2


def oracles(sf: float = 0.01) -> dict[str, str]:
    return {
        "rel_pricing_summary": q_pricing_summary(),
        "rel_top_customers": q_top_customers(),
        "rel_events_json": q_events_json(),
        "rel_orders_window": q_orders_window(),
        "rel_cust_no_orders": q_cust_no_orders(),
        "rel_pricing_rollup": q_pricing_rollup(),
        "warc_scan": q_warc_scan(sf),
        "dedup_exact": q_dedup_exact(),
        "dedup_minhash_signatures": q_minhash_signatures(),
        "dedup_lsh_candidates": q_lsh_candidates(),
        "dedup_lsh_candidates_128x32": q_lsh_candidates(128, 32),
        "dedup_neardup_pairs": q_neardup_pairs(),
        "dedup_neardup_clusters": q_neardup_clusters(),
        "dedup_corpus_kept": q_corpus_kept(),
        "text_corpus_stats": q_corpus_stats(),
        "dedup_ngram_jaccard": q_ngram_jaccard(),
        "dedup_simhash_signatures": q_simhash_signatures(),
        "dedup_simhash_neardup": q_simhash_neardup(),
        "dedup_simhash_multitable": q_simhash_multitable(),
        "sim_cosine_topk": q_cosine_topk(),
        "sim_ann_buckets": q_ann_buckets(),
        "sim_ann_buckets_p16": q_ann_buckets(16),
        "sim_ann_lsh_topk": q_ann_lsh_topk(),
        "sim_ivf_assign": q_ivf_assign(),
        "sim_ivf_topk": q_ivf_topk(),
        "dedup_embedding_neardup": q_embedding_neardup(),
        "dedup_embedding_clusters": q_embedding_clusters(),
        "text_token_counts": q_token_counts(),
        "text_lang_id": q_lang_id(),
        "text_quality_scores": q_quality_scores(),
        "text_fingerprints": q_fingerprints(),
        "text_top_tokens": q_top_tokens(),
        "media_meta": q_media_meta(sf),
        "media_decode": q_media_decode(sf),
        "text_repetition_stats": repetition_sql("documents"),
        "text_pii_scrub": pii_sql("documents"),
        "url_parts": q_url_parts(sf),
        "url_domain_stats": q_url_domain_stats(sf),
        "url_dedup_latest": q_url_dedup_latest(sf),
        "dedup_incremental_candidates": cross_candidates_sql(INC_NEW, INC_CORPUS),
        "dedup_incremental_drops": incremental_drops_sql(INC_NEW, INC_CORPUS),
        "corpus_mix_sample": mix_sample_sql(MIX_BUDGET),
        "corpus_mix_weighted": mix_sample_sql(MIX_WEIGHTED_BUDGET, MIX_WEIGHTS),
        "corpus_train_val_split": split_train_val_sql(SPLIT_VAL_FRAC),
        "corpus_pack_sequences": pack_sequences_sql(PACK_SEQ_LEN),
        "text_decontam_hits": contamination_sql("documents", DECONTAM_EVAL, DECONTAM_N),
        "text_unigram_scores": unigram_sql("documents", UNIGRAM_REF, UNIGRAM_MIN_COUNT),
    }
