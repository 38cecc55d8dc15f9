"""LLM-data-pipeline queries: dedup (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), similarity search (brute-force + LSH ANN), text
analysis (lang-ID, quality, token counts, fingerprints) and the multimodal
mapInPandas stage — each hash-checked against a DuckDB oracle that restates
the identical deterministic algorithm (same md5 hash family, same fold
order, same tie-breaks).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col

from mqtt_streamr_spark.operators import dedup as D
from mqtt_streamr_spark.operators import multimodal as M
from mqtt_streamr_spark.operators import similarity as S
from mqtt_streamr_spark.operators import text as T
from mqtt_streamr_spark.queries.registry import query
from mqtt_streamr_spark.tables import load, spread

# --- shared SQL fragments (must mirror operators/text.py exactly) -----------

_TOKS = "string_split_regex(lower(text), '\\s+')"
_SHINGLES = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(toks) - 2, 1)), "
    "i -> array_to_string(list_slice(toks, i, i + 2), ' ')))"
)
_ALL_STOP = sorted({w for ws in T.STOPWORDS.values() for w in ws})
_ALL_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in _ALL_STOP) + "]"


def _hits_sql(lang: str) -> str:
    words = "[" + ", ".join(f"'{w}'" for w in T.STOPWORDS[lang]) + "]"
    return f"len(list_filter(toks, t -> list_contains({words}, t)))"


# --- text analysis -----------------------------------------------------------

@query(
    "text_token_stats",
    oracle=f"""
    WITH d AS (SELECT source, n_chars, {_TOKS} AS toks,
                      string_split_regex(lower(text), '[^a-z0-9]+') AS words
               FROM documents)
    SELECT source,
           count(*) AS n_docs,
           sum(len(toks))::BIGINT AS total_tokens,
           round(avg(len(toks)), 4) AS avg_tokens,
           round(avg(n_chars), 2) AS avg_chars,
           sum(list_sum(list_transform(words,
               w -> CASE WHEN length(w) = 0 THEN 0
                    ELSE CAST(FLOOR((length(w) + 3) / 4) AS BIGINT) END)))
           ::BIGINT AS total_bpe_ish
    FROM d GROUP BY source
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish) per source."""
    docs = load(spark, "documents", sf_dir)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count("text")).alias("total_tokens"),
        F.round(F.avg(T.token_count("text")), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.sum(T.bpe_ish_token_count("text")).alias("total_bpe_ish"),
    )


@query(
    "text_lang_id",
    oracle=f"""
    WITH d AS (SELECT lang, text, {_TOKS} AS toks FROM documents),
    scored AS (
        SELECT lang,
               CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]')
                    THEN 'zh'
                    WHEN {_hits_sql('en')} >= {_hits_sql('de')}
                     AND {_hits_sql('en')} >= {_hits_sql('es')}
                     AND {_hits_sql('en')} >= {_hits_sql('fr')} THEN 'en'
                    WHEN {_hits_sql('de')} >= {_hits_sql('es')}
                     AND {_hits_sql('de')} >= {_hits_sql('fr')} THEN 'de'
                    WHEN {_hits_sql('es')} >= {_hits_sql('fr')} THEN 'es'
                    ELSE 'fr' END AS predicted
        FROM d)
    SELECT lang, predicted, count(*) AS n
    FROM scored GROUP BY lang, predicted
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic vs the labeled lang column (confusion counts).
    Note: the synthetic corpus is one shared vocabulary, so the heuristic's
    *accuracy* is meaningless here — the query verifies the operator's
    determinism, not linguistics."""
    docs = load(spark, "documents", sf_dir)
    return (
        docs.withColumn("predicted", T.lang_id("text"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_quality_scores",
    oracle=f"""
    WITH d AS (SELECT source, text, {_TOKS} AS toks FROM documents),
    q AS (
        SELECT source,
               0.4 * least((len(list_filter(toks,
                     t -> list_contains({_ALL_STOP_SQL}, t)))
                     / len(toks)) * 5, 1.0)
             + 0.3 * least((list_sum(list_transform(toks, t -> length(t)))
                     / len(toks)) / 8, 1.0)
             + 0.3 * (1 - least((length(regexp_replace(text, '[^0-9]', '', 'g'))
                     / length(text)) * 10, 1.0)) AS score
        FROM d)
    SELECT source, round(avg(score), 6) AS avg_quality,
           round(min(score), 6) AS min_quality,
           round(max(score), 6) AS max_quality
    FROM q GROUP BY source
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (stopword density, word lengths, digit noise)."""
    docs = load(spark, "documents", sf_dir)
    scored = docs.withColumn("score", T.quality_score("text"))
    return scored.groupBy("source").agg(
        F.round(F.avg("score"), 6).alias("avg_quality"),
        F.round(F.min("score"), 6).alias("min_quality"),
        F.round(F.max("score"), 6).alias("max_quality"),
    )


@query(
    "text_fingerprints",
    oracle=f"""
    WITH d AS (SELECT source, text, {_TOKS} AS toks FROM documents)
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT md5(array_to_string(toks, ' '))) AS n_distinct
    FROM d GROUP BY source
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: normalized-content md5 per source."""
    docs = load(spark, "documents", sf_dir)
    return (
        docs.withColumn("fp", T.fingerprint("text"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct"),
        )
    )


@query(
    "text_winnowing_fingerprints",
    oracle=f"""
    WITH d AS (SELECT doc_id, source,
                      array_to_string({_TOKS}, ' ') AS s
               FROM documents),
    hx AS (SELECT doc_id, source,
                  list_transform(
                      generate_series(1, greatest(length(s) - 4, 1)),
                      i -> ('0x' || substring(md5(substring(s, i, 5)), 1, 15))
                           ::BIGINT) AS hs
           FROM d),
    fp AS (SELECT doc_id, source,
                  list_distinct(list_transform(
                      generate_series(1, greatest(len(hs) - 3, 1)),
                      i -> least(hs[i], hs[i+1], hs[i+2], hs[i+3]))) AS fps
           FROM hx)
    SELECT source, count(*) AS n_docs,
           sum(len(fps))::BIGINT AS total_fps,
           count(DISTINCT list_min(fps)) AS distinct_min_fp
    FROM fp GROUP BY source
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling k-gram hash + window-min) fingerprints — the
    plagiarism-detection fingerprint family; guarantees shared fingerprints
    for any sufficiently long match. Per-source fingerprint stats.

    Uses the RELATIONAL formulation (explode -> codegen'd hash ->
    ROWS-frame window min -> aggregate) rather than the array-Column
    operator: identical results (differentially tested in
    test_llm_operators), but every physical node is codegen'd/first-class
    where the array form's nested higher-order functions evaluate
    interpreted (CodegenFallback) — measured 2-10x suite-time variance on
    the HOF form as JVM profiles age, vs stable on this one. The extra
    shuffle on doc_id is hash-uniform and carries (id, source, i, h) only."""
    docs = spread(load(spark, "documents", sf_dir))
    rows = T.winnowing_fingerprint_rows(
        docs, "text", "doc_id", k=5, w=4, carry_cols=("source",)
    )
    per_doc = rows.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_fps"),  # rows are already distinct
        F.min("wm").alias("min_fp"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_fps").alias("total_fps"),
        F.countDistinct("min_fp").alias("distinct_min_fp"),
    )


# --- dedup -------------------------------------------------------------------

@query(
    "dedup_exact",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    fp AS (SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp FROM d),
    g AS (SELECT fp, min(doc_id) AS keeper_id, count(*) AS n_docs
          FROM fp GROUP BY fp)
    SELECT count(*) AS n_groups,
           sum(n_docs)::BIGINT AS n_docs_total,
           sum(CASE WHEN n_docs > 1 THEN n_docs - 1 ELSE 0 END)::BIGINT
           AS n_removable,
           min(keeper_id) AS first_keeper
    FROM g
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via fingerprint hash-groupBy (one uniform-key shuffle)."""
    docs = load(spark, "documents", sf_dir)
    groups = D.exact_duplicates(docs)
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_docs").alias("n_docs_total"),
        F.sum(
            F.when(col("n_docs") > 1, col("n_docs") - 1).otherwise(0)
        ).alias("n_removable"),
        F.min("keeper_id").alias("first_keeper"),
    )


# Same affine MinHash family as operators/dedup.py: one md5 per shingle,
# h = first 60 bits mod P, sig[i] = min (A[i]*h + B[i]) mod P.
_HS = (
    "list_transform(shingles, s -> "
    f"('0x' || substring(md5(s), 1, 15))::BIGINT % {D.MINHASH_PRIME})"
)


def _minhash_sql(i: int) -> str:
    return (
        f"list_min(list_transform(hs, h -> "
        f"({D.MINHASH_A[i]} * h + {D.MINHASH_B[i]}) % {D.MINHASH_PRIME}))"
    )


_MH8 = "[" + ", ".join(_minhash_sql(i) for i in range(8)) + "]"
_BANDS_SQL = (
    "['b0|' || mh[1]::VARCHAR || '|' || mh[2]::VARCHAR, "
    " 'b1|' || mh[3]::VARCHAR || '|' || mh[4]::VARCHAR, "
    " 'b2|' || mh[5]::VARCHAR || '|' || mh[6]::VARCHAR, "
    " 'b3|' || mh[7]::VARCHAR || '|' || mh[8]::VARCHAR]"
)


@query(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS shingles FROM d),
    hsx AS (SELECT doc_id, shingles, {_HS} AS hs FROM sh),
    sig AS (SELECT doc_id, shingles, {_MH8} AS mh FROM hsx),
    bands AS (SELECT doc_id, unnest({_BANDS_SQL}) AS band_key FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b USING (band_key)
             WHERE a.doc_id < b.doc_id),
    pairs AS (
        SELECT id_a, id_b,
               len(list_filter(sa.shingles,
                   s -> list_contains(sb.shingles, s))) * 1.0 /
               (len(sa.shingles) + len(sb.shingles) -
                len(list_filter(sa.shingles,
                    s -> list_contains(sb.shingles, s)))) AS j
        FROM cand
        JOIN sh sa ON sa.doc_id = cand.id_a
        JOIN sh sb ON sb.doc_id = cand.id_b)
    SELECT id_a, id_b, round(j, 6) AS jaccard_sim
    FROM pairs WHERE j >= 0.5
    """,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8)+LSH(4 bands x 2 rows) candidates verified with exact
    3-gram Jaccard >= 0.5 — the full near-dup pipeline."""
    docs = spread(load(spark, "documents", sf_dir))
    return D.near_dup_pairs(docs, threshold=0.5, bands=4, rows=2)


@query(
    "dedup_lsh_bucket_stats",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS shingles FROM d),
    hsx AS (SELECT doc_id, {_HS} AS hs FROM sh),
    sig AS (SELECT doc_id, {_MH8} AS mh FROM hsx),
    bands AS (SELECT doc_id, unnest({_BANDS_SQL}) AS band_key FROM sig),
    buckets AS (SELECT band_key, count(*) AS n FROM bands GROUP BY band_key)
    SELECT count(*) AS n_buckets,
           sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT
           AS n_candidate_buckets,
           max(n) AS max_bucket,
           sum(n)::BIGINT AS n_entries
    FROM buckets
    """,
)
def dedup_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket distribution — the skew diagnostic for the candidate join
    (max_bucket bounds the worst self-join fan-out)."""
    docs = spread(load(spark, "documents", sf_dir))
    keys = D.lsh_band_keys("text", bands=4, rows=2)
    bands = docs.select(F.explode(keys).alias("band_key"))
    buckets = bands.groupBy("band_key").agg(F.count(F.lit(1)).alias("n"))
    return buckets.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(col("n") > 1, 1).otherwise(0)).alias("n_candidate_buckets"),
        F.max("n").alias("max_bucket"),
        F.sum("n").alias("n_entries"),
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS shingles FROM d),
    hsx AS (SELECT doc_id, shingles, {_HS} AS hs FROM sh),
    sig AS (SELECT doc_id, {_MH8} AS mh FROM hsx),
    bands AS (SELECT doc_id, unnest({_BANDS_SQL}) AS band_key FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b USING (band_key)
             WHERE a.doc_id < b.doc_id),
    ng AS (SELECT doc_id,
                  list_distinct(list_transform(
                      generate_series(1, greatest(length(s) - 3, 1)),
                      i -> substring(s, i, 4))) AS grams
           FROM (SELECT doc_id, array_to_string(toks, ' ') AS s FROM d)),
    pairs AS (
        SELECT id_a, id_b,
               len(list_filter(ga.grams,
                   g -> list_contains(gb.grams, g))) * 1.0 /
               (len(ga.grams) + len(gb.grams) -
                len(list_filter(ga.grams,
                    g -> list_contains(gb.grams, g)))) AS j
        FROM cand
        JOIN ng ga ON ga.doc_id = cand.id_a
        JOIN ng gb ON gb.doc_id = cand.id_b)
    SELECT id_a, id_b, round(j, 6) AS jaccard_sim
    FROM pairs WHERE j >= 0.6
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-4-gram Jaccard near-dup pairs: MinHash-band candidates
    (shared with the LSH pipeline) verified with exact n-gram Jaccard."""
    docs = spread(load(spark, "documents", sf_dir))
    return D.ngram_jaccard_pairs(docs, threshold=0.6, n=4)


_SIMHASH_BIT_SQL = (
    "CASE WHEN list_sum(list_transform(hs, h -> "
    "CASE WHEN substring(h, {j}, 1) IN "
    "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)) >= 0 "
    "THEN '1' ELSE '0' END"
)
_SIMHASH_SQL = " || ".join(_SIMHASH_BIT_SQL.format(j=j) for j in range(1, 17))


@query(
    "dedup_simhash_groups",
    oracle=f"""
    WITH d AS (SELECT doc_id, list_distinct({_TOKS}) AS dtoks FROM documents),
    hx AS (SELECT doc_id, list_transform(dtoks, t -> md5(t)) AS hs FROM d),
    sig AS (SELECT doc_id, {_SIMHASH_SQL} AS simhash FROM hx),
    g AS (SELECT simhash, count(*) AS n, min(doc_id) AS keeper
          FROM sig GROUP BY simhash)
    SELECT simhash, n, keeper FROM g WHERE n > 1
    """,
)
def dedup_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-16 collision groups (hamming-0 near-dup blocking)."""
    docs = spread(load(spark, "documents", sf_dir))
    sig = docs.select("doc_id", T.simhash16("text").alias("simhash"))
    return (
        sig.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keeper"))
        .filter(col("n") > 1)
    )


# --- similarity search -------------------------------------------------------

# dim-agnostic: driven by len() of the left operand, so a regenerated
# embeddings table with a different dimension keeps every oracle valid
# (the round-3 lesson: never hardcode one physical layout)
_DOT = (
    "list_sum(list_transform(generate_series(1, len({a})), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
)


def _norm_sql(a: str) -> str:
    # mirrors similarity.l2_normalize: per-element x / sqrt(dot(a, a))
    return (
        f"list_transform({a}, x -> x::DOUBLE / "
        f"sqrt({_DOT.format(a=a, b=a)}))"
    )


@query(
    "sim_topk_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_norm_sql('embedding')} AS nv
               FROM embeddings),
    q AS (SELECT nv AS q_nv FROM e WHERE vec_id = 0)
    SELECT e.vec_id,
           round({_DOT.format(a='e.nv', b='q.q_nv')}, 6) AS cos_sim
    FROM e, q
    WHERE e.vec_id != 0
    ORDER BY {_DOT.format(a='e.nv', b='q.q_nv')} DESC, e.vec_id
    LIMIT 10
    """,
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 to query vector vec_id=0 (broadcast
    query + TakeOrderedAndProject; the correctness baseline for ANN)."""
    emb = load(spark, "embeddings", sf_dir)
    return S.cosine_topk(emb, S.query_vector(emb, 0), k=10)


def _rp_sql(a: str, out_dim: int = 8, in_dim: int = 64) -> str:
    # mirrors similarity.reduce_dims: one dot fold per output dim against
    # the SAME md5-seeded ±1/sqrt(out_dim) literals
    rows = S.projection_matrix(out_dim, in_dim)
    comps = []
    for r in rows:
        lit = "[" + ", ".join(repr(c) for c in r) + "]"
        comps.append(
            f"list_sum(list_transform(generate_series(1, {in_dim}), "
            f"i -> {a}[i]::DOUBLE * ({lit})[i]))"
        )
    return "[" + ", ".join(comps) + "]"


@query(
    "sim_random_projection_topk",
    oracle=f"""
    WITH r AS (SELECT vec_id, {_rp_sql('embedding')} AS rv
               FROM embeddings),
    n AS (SELECT vec_id, {_norm_sql('rv')} AS nv FROM r),
    q AS (SELECT nv AS q_nv FROM n WHERE vec_id = 0)
    SELECT n.vec_id,
           round({_DOT.format(a='n.nv', b='q.q_nv')}, 6) AS cos_sim
    FROM n, q
    WHERE n.vec_id != 0
    ORDER BY {_DOT.format(a='n.nv', b='q.q_nv')} DESC, n.vec_id
    LIMIT 10
    """,
)
def sim_random_projection_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection (64 -> 8 dims, map-only
    sign-matrix folds) followed by exact cosine top-10 in the REDUCED
    space — the standard shrink-then-search pattern: at 100 TB the
    projection runs in the scan stage and cuts every downstream distance
    and shuffle byte by 8x, with JL-bounded distortion."""
    emb = load(spark, "embeddings", sf_dir)
    red = S.reduce_dims(emb, out_dim=8, in_dim=64)
    q = red.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("reduced").alias("q_vec")
    )
    return S.cosine_topk(red, q, k=10, vec_col="reduced")


def _coeff_sql(p: int) -> str:
    coeffs = S.hyperplane_coeffs(p, 64)
    lit = "[" + ", ".join(str(c) for c in coeffs) + "]"
    return (
        f"CASE WHEN list_sum(list_transform(generate_series(1, 64), "
        f"i -> embedding[i]::DOUBLE * ({lit})[i])) >= 0 "
        f"THEN '1' ELSE '0' END"
    )


_BUCKET_SQL = " || ".join(_coeff_sql(p) for p in range(8))
_BUCKET4_SQL = " || ".join(_coeff_sql(p) for p in range(4))


@query(
    "sim_ann_lsh_bucket",
    oracle=f"""
    WITH b AS (SELECT vec_id, {_norm_sql('embedding')} AS nv,
                      {_BUCKET_SQL} AS bucket
               FROM embeddings),
    q AS (SELECT nv AS q_nv, bucket AS q_bucket
          FROM b WHERE vec_id = 0)
    SELECT e.vec_id,
           round({_DOT.format(a='e.nv', b='q.q_nv')}, 6) AS cos_sim
    FROM b e, q
    WHERE e.bucket = q.q_bucket AND e.vec_id != 0
    ORDER BY {_DOT.format(a='e.nv', b='q.q_nv')} DESC, e.vec_id
    LIMIT 10
    """,
)
def sim_ann_lsh_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: probe only the query's bucket. At
    scale the bucket is a precomputed partition column — the probe becomes
    a partition-pruned scan instead of a full pass."""
    emb = load(spark, "embeddings", sf_dir)
    return S.ann_topk_lsh(emb, query_id=0, k=10)


@query(
    "sim_embedding_near_dups",
    oracle=f"""
    WITH n AS (SELECT vec_id, label, {_norm_sql('embedding')} AS nv
               FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_DOT.format(a='a.nv', b='b.nv')}, 6) AS cos_sim
    FROM n a JOIN n b ON a.label = b.label
    WHERE a.vec_id < b.vec_id
      AND round({_DOT.format(a='a.nv', b='b.nv')}, 6) >= 0.42
    """,
)
def sim_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label (the scale
    path swaps the label block for an LSH bucket — same join shape).
    Threshold 0.42 sits just under this synthetic embedding table's max
    pairwise cosine (0.51): the old 0.9 cut matched the oracle only
    vacuously (zero pairs exist above it at any SF)."""
    emb = spread(load(spark, "embeddings", sf_dir))
    return S.embedding_near_dups(emb, threshold=0.42)


@query(
    "sim_near_dups_lsh_blocked",
    oracle=f"""
    WITH b AS (SELECT vec_id, {_norm_sql('embedding')} AS nv,
                      {_BUCKET4_SQL} AS bucket
               FROM embeddings)
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           round({_DOT.format(a='a.nv', b='c.nv')}, 6) AS cos_sim
    FROM b a JOIN b c ON a.bucket = c.bucket
    WHERE a.vec_id < c.vec_id
      AND round({_DOT.format(a='a.nv', b='c.nv')}, 6) >= 0.42
    """,
)
def sim_near_dups_lsh_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs blocked by the LSH bucket instead of the
    label column — the actual 100 TB shape (data-independent uniform block
    key, no labels needed; same join as sim_embedding_near_dups). Planes
    and threshold sized to this table's cosine distribution (max pairwise
    0.51): 4 planes keep same-bucket recall non-zero at 0.42, where the
    old 8-plane/0.8 pair matched its oracle only vacuously (zero pairs);
    at production cardinality raise planes with the corpus so buckets
    stay verify-sized."""
    emb = spread(load(spark, "embeddings", sf_dir))
    bucketed = emb.withColumn(
        "bucket", S.lsh_bucket(F.col("embedding"), planes=4, dim=64)
    )
    return S.embedding_near_dups(bucketed, threshold=0.42,
                                 block_col="bucket")


_IVF_SEEDS = [1, 2, 3, 4, 5, 6, 7, 8]
_IVF_SEEDS_SQL = ", ".join(str(s) for s in _IVF_SEEDS)


@query(
    "sim_ann_ivf",
    oracle=f"""
    WITH n AS (SELECT vec_id, {_norm_sql('embedding')} AS nv
               FROM embeddings),
    c AS (SELECT vec_id AS cid, nv AS cv FROM n
          WHERE vec_id IN ({_IVF_SEEDS_SQL})),
    scored AS (SELECT n.vec_id, n.nv, c.cid,
                      {_DOT.format(a='n.nv', b='c.cv')} AS dotc
               FROM n CROSS JOIN c),
    assigned AS (SELECT vec_id, nv, cid FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY dotc DESC, cid) AS rn
        FROM scored) WHERE rn = 1),
    q AS (SELECT nv AS q_nv, cid AS q_cid FROM assigned WHERE vec_id = 0)
    SELECT a.vec_id,
           round({_DOT.format(a='a.nv', b='q.q_nv')}, 6) AS cos_sim
    FROM assigned a, q
    WHERE a.cid = q.q_cid AND a.vec_id != 0
    ORDER BY {_DOT.format(a='a.nv', b='q.q_nv')} DESC, a.vec_id
    LIMIT 10
    """,
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: coarse-quantize to the nearest of 8 seed centroids, probe
    only the query's cell — the data-adaptive counterpart to the
    random-hyperplane LSH path."""
    emb = load(spark, "embeddings", sf_dir)
    return S.ann_topk_ivf(emb, query_id=0, centroid_ids=_IVF_SEEDS, k=10)


@query(
    "dedup_pipeline_survivors",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    fp AS (SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp FROM d),
    keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp),
    kd AS (SELECT d.doc_id, d.toks FROM d JOIN keep USING (doc_id)),
    sh AS (SELECT doc_id, {_SHINGLES} AS shingles FROM kd),
    hsx AS (SELECT doc_id, shingles, {_HS} AS hs FROM sh),
    sig AS (SELECT doc_id, shingles, {_MH8} AS mh FROM hsx),
    bands AS (SELECT doc_id, unnest({_BANDS_SQL}) AS band_key FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b USING (band_key)
             WHERE a.doc_id < b.doc_id),
    pairs AS (
        SELECT id_a, id_b
        FROM cand
        JOIN sh sa ON sa.doc_id = cand.id_a
        JOIN sh sb ON sb.doc_id = cand.id_b
        WHERE len(list_filter(sa.shingles,
                  s -> list_contains(sb.shingles, s))) * 1.0 /
              (len(sa.shingles) + len(sb.shingles) -
               len(list_filter(sa.shingles,
                   s -> list_contains(sb.shingles, s)))) >= 0.5),
    surv AS (SELECT doc_id, toks FROM kd
             WHERE doc_id NOT IN (SELECT id_b FROM pairs))
    SELECT count(*) AS n_docs, sum(len(toks))::BIGINT AS total_tokens,
           min(doc_id) AS first_id, max(doc_id) AS last_id
    FROM surv
    """,
)
def dedup_pipeline_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full cleaning pipeline composed end-to-end: exact dedup keeps
    min-id per fingerprint, then MinHash-LSH near-dup removal drops the
    higher id of each verified pair; output is the surviving corpus size +
    token budget — the number a training-data pipeline actually needs."""
    docs = spread(load(spark, "documents", sf_dir))
    keepers = D.exact_duplicates(docs).select(
        col("keeper_id").alias("doc_id")
    )
    kept = docs.join(keepers, "doc_id")
    pairs = D.near_dup_pairs(kept, threshold=0.5, bands=4, rows=2)
    removed = pairs.select(col("id_b").alias("doc_id")).distinct()
    surv = kept.join(removed, "doc_id", "left_anti")
    return surv.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count("text")).alias("total_tokens"),
        F.min("doc_id").alias("first_id"),
        F.max("doc_id").alias("last_id"),
    )


@query(
    "dedup_duplicate_clusters",
    oracle=f"""
    WITH RECURSIVE d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS shingles FROM d),
    hsx AS (SELECT doc_id, shingles, {_HS} AS hs FROM sh),
    sig AS (SELECT doc_id, shingles, {_MH8} AS mh FROM hsx),
    bands AS (SELECT doc_id, unnest({_BANDS_SQL}) AS band_key FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b USING (band_key)
             WHERE a.doc_id < b.doc_id),
    pairs AS (
        SELECT id_a, id_b
        FROM cand
        JOIN sh sa ON sa.doc_id = cand.id_a
        JOIN sh sb ON sb.doc_id = cand.id_b
        WHERE len(list_filter(sa.shingles,
                  s -> list_contains(sb.shingles, s))) * 1.0 /
              (len(sa.shingles) + len(sb.shingles) -
               len(list_filter(sa.shingles,
                   s -> list_contains(sb.shingles, s)))) >= 0.5),
    edges AS (SELECT id_a AS n, id_b AS m FROM pairs
              UNION ALL
              SELECT id_b AS n, id_a AS m FROM pairs),
    reach(id, label) AS (
        SELECT n, n FROM edges
        UNION
        SELECT e.n, r.label FROM edges e JOIN reach r ON r.id = e.m),
    comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id)
    SELECT component AS cluster_id,
           count(*) AS n_docs,
           max(id) AS max_doc_id
    FROM comp GROUP BY component
    """,
)
def dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: verified pairs -> connected components (min-label
    propagation) -> per-cluster stats. Similarity is not transitive, so
    keeper selection must happen per component, not per pair — this is the
    missing middle of every dedup pipeline (pairs alone over-remove when
    A~B and B~C but A!~C). The oracle restates the propagation as a
    DuckDB recursive CTE (min reachable id per node)."""
    docs = spread(load(spark, "documents", sf_dir))
    pairs = D.near_dup_pairs(docs, threshold=0.5, bands=4, rows=2)
    cc = D.connected_components(pairs)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("id").alias("max_doc_id"),
    ).select(
        col("component").alias("cluster_id"), "n_docs", "max_doc_id"
    )


@query(
    "sample_stratified_exact",
    oracle="""
    WITH rk AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('sample|' || doc_id::VARCHAR)
               ) AS rk
        FROM documents),
    samp AS (SELECT * FROM rk WHERE rk <= 40)
    SELECT source,
           count(*) AS n_sampled,
           sum(n_chars)::BIGINT AS total_chars,
           min(doc_id) AS min_id,
           max(doc_id) AS max_id
    FROM samp GROUP BY source
    """,
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-stratum quota sampling (40 docs/source) by md5 hash order
    — a deterministic uniform draw, stable across reruns/repartitioning/
    engines (seeded RNG is none of those and cannot be oracle-checked).
    One shuffle on the stratum key; the map-only rate variant
    (sample_stratified_rate) is the skew-free 100 TB path."""
    docs = load(spark, "documents", sf_dir)
    samp = T.stratified_sample_exact(docs, "source", "doc_id", n_per_key=40)
    return samp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@query(
    "sample_stratified_rate",
    oracle="""
    WITH kept AS (
        SELECT source, n_chars FROM documents
        WHERE CASE
            WHEN source = 'src0' THEN
                ('0x' || substring(md5('strat|src0|' || doc_id::VARCHAR),
                                   1, 15))::BIGINT % 100 < 30
            WHEN source = 'src1' THEN
                ('0x' || substring(md5('strat|src1|' || doc_id::VARCHAR),
                                   1, 15))::BIGINT % 100 < 60
            ELSE FALSE END)
    SELECT source, count(*) AS n_kept, sum(n_chars)::BIGINT AS total_chars
    FROM kept GROUP BY source
    """,
)
def sample_stratified_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only approximate stratified sampling (30% of src0, 60% of src1,
    drop the rest): a hash-bucket filter that fuses into the scan — no
    shuffle, no skew, binomially tight quotas. The scale path when a
    percent of quota error is acceptable."""
    docs = load(spark, "documents", sf_dir)
    samp = T.stratified_sample_rate(
        docs, {"src0": 0.30, "src1": 0.60}, "source", "doc_id"
    )
    return samp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "sim_ann_ivf_indexed",
    oracle=f"""
    WITH n AS (SELECT vec_id, {_norm_sql('embedding')} AS nv
               FROM embeddings),
    c AS (SELECT vec_id AS cid, nv AS cv FROM n
          WHERE vec_id IN ({_IVF_SEEDS_SQL})),
    scored AS (SELECT n.vec_id, n.nv, c.cid,
                      {_DOT.format(a='n.nv', b='c.cv')} AS dotc
               FROM n CROSS JOIN c),
    assigned AS (SELECT vec_id, nv, cid FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY dotc DESC, cid) AS rn
        FROM scored) WHERE rn = 1),
    q AS (SELECT nv AS q_nv, cid AS q_cid FROM assigned WHERE vec_id = 0)
    SELECT a.vec_id,
           round({_DOT.format(a='a.nv', b='q.q_nv')}, 6) AS cos_sim
    FROM assigned a, q
    WHERE a.cid = q.q_cid AND a.vec_id != 0
    ORDER BY {_DOT.format(a='a.nv', b='q.q_nv')} DESC, a.vec_id
    LIMIT 10
    """,
)
def sim_ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MATERIALIZED-index ANN path: build the IVF index as
    cell-partitioned parquet (ingest half), then probe it with the query
    VECTOR — the scan carries a static cid predicate and partition-prunes
    to nprobe directories (plan-asserted). Same results as sim_ann_ivf
    (identical centroids/normalization), different physical shape: probe
    cost is proportional to the probed cells, not the corpus."""
    import hashlib as _h
    import os as _os
    import tempfile as _t

    emb = load(spark, "embeddings", sf_dir)
    tag = _h.sha1(sf_dir.encode()).hexdigest()[:12]
    index_dir = _os.path.join(_t.gettempdir(), f"ivf_index_{tag}")
    S.ivf_build_index(emb, _IVF_SEEDS, index_dir)
    # r12 (guide §5.1, VERDICT r11 #9): the query vector rides a 1-row
    # broadcast frame instead of a collect()-ed literal; only the
    # nprobe cell ids (index metadata) still reach the driver
    q_df = emb.filter(F.col("vec_id") == 0).select("embedding")
    return S.ivf_probe_index(spark, index_dir, exclude_id=0,
                             k=10, nprobe=1, q_df=q_df)


_BM25_TERMS = ("join", "hash", "scan")
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@query(
    "text_bm25_topdocs",
    oracle=f"""
    WITH toks AS (SELECT doc_id,
                         unnest({_TOKS}) AS term
                  FROM documents),
    lens AS (SELECT doc_id, len({_TOKS}) AS dl FROM documents),
    stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avg_dl
              FROM lens),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, term),
    dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf
            GROUP BY term),
    idf AS (SELECT term,
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
            FROM dfq, stats),
    sc AS (SELECT tf.doc_id,
                  sum(idf.idf * tf.tf * (1.2 + 1)
                      / (tf.tf + 1.2 * (1 - 0.75
                         + 0.75 * lens.dl / stats.avg_dl))) AS s
           FROM tf
           JOIN idf USING (term)
           JOIN lens USING (doc_id), stats
           GROUP BY tf.doc_id)
    SELECT doc_id, round(s, 6) AS bm25
    FROM sc ORDER BY bm25 DESC, doc_id LIMIT 15
    """,
)
def text_bm25_topdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword relevance over the corpus for a fixed query-term set
    — the retrieval/quality-scoring primitive of a training-data pipeline
    (e.g. topic filtering, query-based corpus slicing). Fully declarative:
    explode -> (id, term) agg -> broadcast df/idf -> broadcast corpus
    stats -> TakeOrdered top-k; no UDFs, no driver collects."""
    docs = spread(load(spark, "documents", sf_dir))
    scores = T.bm25_scores(docs, list(_BM25_TERMS))
    return scores.orderBy(F.col("bm25").desc(), F.col("doc_id")).limit(15)


@query(
    "llm_prep_corpus_end_to_end",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, text, {_TOKS} AS toks
               FROM documents),
    q AS (
        SELECT doc_id, source, toks,
               0.4 * least((len(list_filter(toks,
                     t -> list_contains({_ALL_STOP_SQL}, t)))
                     / len(toks)) * 5, 1.0)
             + 0.3 * least((list_sum(list_transform(toks, t -> length(t)))
                     / len(toks)) / 8, 1.0)
             + 0.3 * (1 - least((length(regexp_replace(text, '[^0-9]', '', 'g'))
                     / length(text)) * 10, 1.0)) AS score
        FROM d),
    filtered AS (SELECT doc_id, source, toks FROM q WHERE score >= 0.5),
    fp AS (SELECT doc_id, source, toks,
                  md5(array_to_string(toks, ' ')) AS fp
           FROM filtered),
    keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp),
    kept AS (SELECT fp.doc_id, fp.source, fp.toks
             FROM fp JOIN keep USING (doc_id)),
    lab AS (SELECT doc_id, source, toks,
                   CASE WHEN ('0x' || substring(
                            md5('split|' || doc_id::VARCHAR), 1, 15))::BIGINT
                            % 100 < 80 THEN 'train'
                        WHEN ('0x' || substring(
                            md5('split|' || doc_id::VARCHAR), 1, 15))::BIGINT
                            % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM kept),
    chunked AS (SELECT split,
                       len(toks) AS n_toks,
                       len(list_transform(
                           generate_series(1, greatest(len(toks) - 16, 1), 48),
                           i -> i)) AS n_chunks
                FROM lab)
    SELECT split,
           count(*) AS n_docs,
           sum(n_toks)::BIGINT AS total_tokens,
           sum(n_chunks)::BIGINT AS total_chunks
    FROM chunked GROUP BY split
    """,
)
def llm_prep_corpus_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE training-data prep pipeline composed end-to-end, as a
    user would run it: quality filter (composite score >= 0.5) -> exact
    dedup (keep min-id per content fingerprint) -> deterministic
    train/val/test split -> token-window chunking (64/16 overlap) ->
    per-split corpus budget. Every stage is a map-only Column expression
    except the dedup groupBy; stages fuse into one scan + two shuffles
    (dedup fingerprint, final split agg). The oracle restates all five
    stages in SQL."""
    docs = spread(load(spark, "documents", sf_dir))
    filtered = docs.filter(T.quality_score("text") >= 0.5)
    keepers = D.exact_duplicates(filtered).select(
        col("keeper_id").alias("doc_id")
    )
    kept = filtered.join(keepers, "doc_id")
    labeled = kept.select(
        "doc_id",
        T.split_label("doc_id").alias("split"),
        T.token_count("text").alias("n_toks"),
        F.size(T.chunk_token_windows("text", chunk=64, overlap=16))
        .alias("n_chunks"),
    )
    return labeled.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.sum("n_chunks").alias("total_chunks"),
    )


@query(
    "sim_ann_ivf_kmeans",
    oracle=f"""
    WITH n AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE / sqrt(list_sum(list_transform(generate_series(1, len(embedding)), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS nv FROM embeddings),
    c0 AS (SELECT vec_id AS cid, nv AS cv FROM n WHERE vec_id IN ({_IVF_SEEDS_SQL})),
    a0 AS (SELECT vec_id, nv, cid FROM (SELECT n.vec_id, n.nv, c.cid, row_number() OVER (PARTITION BY n.vec_id ORDER BY list_sum(list_transform(generate_series(1, len(n.nv)), i -> n.nv[i]::DOUBLE * c.cv[i]::DOUBLE)) DESC, c.cid) AS rn FROM n CROSS JOIN c0 c) WHERE rn = 1),
    m0 AS (SELECT cid, g.i AS pos, round(avg(nv[g.i]), 6) AS mv FROM a0, unnest(generate_series(1, len(nv))) AS g(i) GROUP BY cid, g.i),
    c1 AS (SELECT cid, list_transform(l, x -> x::DOUBLE / sqrt(list_sum(list_transform(generate_series(1, len(l)), i -> l[i]::DOUBLE * l[i]::DOUBLE)))) AS cv FROM (SELECT cid, list(mv ORDER BY pos) AS l FROM m0 GROUP BY cid)),
    a1 AS (SELECT vec_id, nv, cid FROM (SELECT n.vec_id, n.nv, c.cid, row_number() OVER (PARTITION BY n.vec_id ORDER BY list_sum(list_transform(generate_series(1, len(n.nv)), i -> n.nv[i]::DOUBLE * c.cv[i]::DOUBLE)) DESC, c.cid) AS rn FROM n CROSS JOIN c1 c) WHERE rn = 1),
    m1 AS (SELECT cid, g.i AS pos, round(avg(nv[g.i]), 6) AS mv FROM a1, unnest(generate_series(1, len(nv))) AS g(i) GROUP BY cid, g.i),
    c2 AS (SELECT cid, list_transform(l, x -> x::DOUBLE / sqrt(list_sum(list_transform(generate_series(1, len(l)), i -> l[i]::DOUBLE * l[i]::DOUBLE)))) AS cv FROM (SELECT cid, list(mv ORDER BY pos) AS l FROM m1 GROUP BY cid)),
    af AS (SELECT vec_id, nv, cid FROM (SELECT n.vec_id, n.nv, c.cid, row_number() OVER (PARTITION BY n.vec_id ORDER BY list_sum(list_transform(generate_series(1, len(n.nv)), i -> n.nv[i]::DOUBLE * c.cv[i]::DOUBLE)) DESC, c.cid) AS rn FROM n CROSS JOIN c2 c) WHERE rn = 1),
    q AS (SELECT nv AS q_nv, cid AS q_cid FROM af WHERE vec_id = 0)
    SELECT a.vec_id, round(list_sum(list_transform(generate_series(1, len(a.nv)), i -> a.nv[i]::DOUBLE * q.q_nv[i]::DOUBLE)), 6) AS cos_sim FROM af a, q WHERE a.cid = q.q_cid AND a.vec_id != 0 ORDER BY list_sum(list_transform(generate_series(1, len(a.nv)), i -> a.nv[i]::DOUBLE * q.q_nv[i]::DOUBLE)) DESC, a.vec_id LIMIT 10
    """,
)
def sim_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over TRAINED centroids: 2 spherical-Lloyd rounds refine the
    8 seed centroids (element-wise means rounded to 6 decimals before
    re-normalization — bit-identical across engines/partitionings), then
    the standard cell probe. The oracle restates both training rounds and
    the probe in SQL. Tighter cells than raw seeds at identical probe
    cost."""
    emb = load(spark, "embeddings", sf_dir)
    return S.ann_topk_ivf_trained(emb, query_id=0, seed_ids=_IVF_SEEDS,
                                  k=10, iterations=2)


# --- grouped Pandas-UDF surface (§2.8) ---------------------------------------

@query(
    "grouped_quality_zscores",
    oracle=f"""
    WITH d AS (SELECT source, text, {_TOKS} AS toks FROM documents),
    q AS (
        SELECT source,
               0.4 * least((len(list_filter(toks,
                     t -> list_contains({_ALL_STOP_SQL}, t)))
                     / len(toks)) * 5, 1.0)
             + 0.3 * least((list_sum(list_transform(toks, t -> length(t)))
                     / len(toks)) / 8, 1.0)
             + 0.3 * (1 - least((length(regexp_replace(text, '[^0-9]', '', 'g'))
                     / length(text)) * 10, 1.0)) AS score
        FROM d),
    z AS (SELECT source,
                 (score - avg(score) OVER (PARTITION BY source))
                 / stddev_samp(score) OVER (PARTITION BY source) AS z
          FROM q)
    SELECT source, count(*) AS n,
           round(min(z), 4) AS min_z, round(max(z), 4) AS max_z,
           round(avg(abs(z)), 4) AS avg_abs_z
    FROM z GROUP BY source
    """,
)
def grouped_quality_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-source z-score normalization of the
    quality score (the UDF sees the whole group — not expressible as a
    per-row Column without a window). Oracle restates it with window
    functions."""
    from mqtt_streamr_spark.operators.grouped import zscore_per_group

    docs = load(spark, "documents", sf_dir)
    scored = docs.select(
        "source", T.quality_score("text").alias("score")
    )
    z = zscore_per_group(scored, "source", "score")
    return z.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("z"), 4).alias("min_z"),
        F.round(F.max("z"), 4).alias("max_z"),
        F.round(F.avg(F.abs(F.col("z"))), 4).alias("avg_abs_z"),
    )


@query(
    "grouped_geomean_values",
    oracle="""
    SELECT event_type,
           round(exp(avg(ln(value))), 6) AS geo_mean
    FROM events WHERE value > 0
    GROUP BY event_type
    """,
)
def grouped_geomean_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDAF (vectorized custom aggregate): geometric
    mean of event values per type. Kept deliberately as the UDAF-surface
    exercise — in production use the pure built-in
    ``exp(avg(ln(value)))`` instead (exactly what the oracle runs): a
    GROUPED_AGG has no partial aggregation, so each group ships whole to
    one executor and a skewed key hurts; the built-in gets map-side
    combine for free."""
    from mqtt_streamr_spark.operators.grouped import geometric_mean

    ev = load(spark, "events", sf_dir).filter(col("value") > 0)
    return ev.groupBy("event_type").agg(
        F.round(geometric_mean("value"), 6).alias("geo_mean")
    )


# --- multimodal --------------------------------------------------------------

@query(
    "multimodal_features",
    oracle="""
    WITH f AS (
        SELECT doc_id AS content_id,
               octet_length(encode(text)) AS n_bytes,
               substring(md5(text), 1, 8) AS sha_prefix,
               (strpos('0123456789abcdef', substring(md5(text), 1, 1)) - 1)
               * 16.0 / 255
               + (strpos('0123456789abcdef', substring(md5(text), 2, 1)) - 1)
               / 255.0 AS feat0
        FROM documents)
    SELECT count(*) AS n_media,
           sum(n_bytes)::BIGINT AS total_bytes,
           count(DISTINCT sha_prefix) AS n_distinct_content,
           round(avg(feat0), 6) AS avg_feat0
    FROM f
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal mapInPandas stage end-to-end: documents as opaque
    binary blobs -> Arrow-batched feature extraction (deterministic fake
    model) -> aggregate. Verifies the real plumbing (schema, batching,
    binary handling); only the decode model itself is stubbed."""
    docs = load(spark, "documents", sf_dir)
    media = M.documents_as_media(docs)
    feats = M.extract_features(media)
    return feats.agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("sha_prefix").alias("n_distinct_content"),
        F.round(F.avg(F.element_at("feature_vec", 1)), 6).alias("avg_feat0"),
    )


@query(
    "multimodal_resize",
    oracle="""
    WITH f AS (
        SELECT doc_id AS content_id,
               length(text) AS in_chars,
               least(length(text), 1024) AS out_chars,
               substring(md5(substring(text, 1, 1024)), 1, 8) AS out_sha
        FROM documents)
    SELECT count(*) AS n_media,
           sum(in_chars)::BIGINT AS total_in_chars,
           sum(out_chars)::BIGINT AS total_out_chars,
           count(DISTINCT out_sha) AS n_distinct_thumbs
    FROM f
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing end-to-end: blobs -> mapInPandas resize stage
    (real Pillow branch when importable + image mime; deterministic
    char-crop fallback here) -> size/content aggregate. 32x32 target =
    1024-char crop in the fallback semantics the oracle restates."""
    docs = load(spark, "documents", sf_dir)
    media = M.documents_as_media(docs)
    resized = M.resize_media(media, target_w=32, target_h=32)
    return resized.agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("in_chars").alias("total_in_chars"),
        F.sum("out_chars").alias("total_out_chars"),
        F.countDistinct("out_sha").alias("n_distinct_thumbs"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH fr AS (
        SELECT doc_id AS content_id, text,
               unnest(range(0, (length(text) + 255) // 256)) AS i
        FROM documents),
    s AS (
        SELECT content_id, i,
               substring(md5(substring(text, i*256 + 1, 256)), 1, 8) AS sha,
               length(substring(text, i*256 + 1, 256)) AS fchars
        FROM fr WHERE i % 4 = 0)
    SELECT content_id, count(*) AS n_sampled,
           sum(fchars)::BIGINT AS sampled_chars,
           min(sha) AS min_sha, max(sha) AS max_sha
    FROM s GROUP BY content_id ORDER BY content_id LIMIT 20
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: one blob -> many frame rows via the
    one-to-many mapInPandas shape (every 4th 256-char frame), then a
    per-content rollup. A real decoder slots into the same stage without
    touching this plan."""
    docs = load(spark, "documents", sf_dir)
    media = M.documents_as_media(docs)
    frames = M.sample_frames(media, frame_chars=256, every_k=4)
    return (
        frames.groupBy("content_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("frame_chars").alias("sampled_chars"),
            F.min("frame_sha").alias("min_sha"),
            F.max("frame_sha").alias("max_sha"),
        )
        .orderBy("content_id")
        .limit(20)
    )


# --- PII scrubbing / chunking / repetition (training-data prep) --------------

_PII_INJECT_SQL = """
        CASE WHEN doc_id % 5 = 0
             THEN text || ' contact bob@example.com or +1 555 123 9876'
             WHEN doc_id % 7 = 0
             THEN text || ' from 10.0.42.7 today'
             ELSE text END
"""


def _pii_injected(docs: DataFrame) -> DataFrame:
    """Deterministically salt the synthetic corpus with PII (it has none),
    identically to _PII_INJECT_SQL, so the scrub pass has work to verify."""
    return docs.withColumn(
        "text",
        F.when(
            col("doc_id") % 5 == 0,
            F.concat(col("text"),
                     F.lit(" contact bob@example.com or +1 555 123 9876")),
        ).when(
            col("doc_id") % 7 == 0,
            F.concat(col("text"), F.lit(" from 10.0.42.7 today")),
        ).otherwise(col("text")),
    )


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, {_PII_INJECT_SQL} AS text
               FROM documents),
    s AS (SELECT source,
                 len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))
                 AS n_email,
                 len(regexp_extract_all(text,
                     '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b'))
                 AS n_ipv4,
                 len(regexp_extract_all(text, '\\+\\d[\\d -]{{7,}}\\d'))
                 AS n_phone,
                 length(text) - length(
                     regexp_replace(regexp_replace(regexp_replace(text,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                         '[EMAIL]', 'g'),
                         '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b',
                         '[IPV4]', 'g'),
                         '\\+\\d[\\d -]{{7,}}\\d', '[PHONE]', 'g'))
                 AS chars_removed
          FROM d)
    SELECT source,
           count(*) AS n_docs,
           sum(n_email)::BIGINT AS emails_found,
           sum(n_ipv4)::BIGINT AS ipv4_found,
           sum(n_phone)::BIGINT AS phones_found,
           sum(CASE WHEN n_email + n_ipv4 + n_phone > 0 THEN 1 ELSE 0 END)
           ::BIGINT AS docs_with_pii,
           sum(chars_removed)::BIGINT AS chars_removed
    FROM s GROUP BY source
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass (emails / IPv4 / phones redacted to placeholders) —
    the standard pre-training cleaning stage, as a map-only Column
    pipeline. The corpus is deterministically salted with PII first (the
    synthetic documents contain none)."""
    docs = _pii_injected(load(spark, "documents", sf_dir))
    per_doc = docs.select(
        "source",
        T.pii_hits("text", "email").alias("n_email"),
        T.pii_hits("text", "ipv4").alias("n_ipv4"),
        T.pii_hits("text", "phone").alias("n_phone"),
        (F.length("text") - F.length(T.pii_scrub("text")))
        .alias("chars_removed"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").alias("emails_found"),
        F.sum("n_ipv4").alias("ipv4_found"),
        F.sum("n_phone").alias("phones_found"),
        F.sum(
            F.when(
                col("n_email") + col("n_ipv4") + col("n_phone") > 0, 1
            ).otherwise(0)
        ).alias("docs_with_pii"),
        F.sum("chars_removed").alias("chars_removed"),
    )


@query(
    "text_chunking",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    c AS (SELECT doc_id, source,
                 list_transform(
                     generate_series(1, greatest(len(toks) - 16, 1), 48),
                     i -> array_to_string(list_slice(toks, i, i + 63), ' '))
                 AS chunks
          FROM d),
    doc_agg AS (SELECT source, count(*) AS n_docs,
                       sum(len(chunks))::BIGINT AS total_chunks,
                       round(avg(len(chunks)), 4) AS avg_chunks_per_doc
                FROM c GROUP BY source),
    u AS (SELECT source, unnest(chunks) AS chunk FROM c),
    chunk_agg AS (SELECT source,
                         count(DISTINCT md5(chunk)) AS n_distinct_chunks,
                         round(avg(len(string_split_regex(chunk, '\\s+'))), 4)
                         AS avg_chunk_tokens
                  FROM u GROUP BY source)
    SELECT doc_agg.source AS source, n_docs, total_chunks, avg_chunks_per_doc,
           n_distinct_chunks, avg_chunk_tokens
    FROM doc_agg JOIN chunk_agg ON doc_agg.source = chunk_agg.source
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (64-token chunks, 16-token overlap) — the
    context-window prep for embedding/training pipelines — plus chunk-level
    exact-dedup stats (distinct chunk fingerprints vs total). Chunks stay
    arrays until the explode; both aggregations are per-source."""
    docs = spread(load(spark, "documents", sf_dir))
    c = docs.select(
        "source",
        T.chunk_token_windows("text", chunk=64, overlap=16).alias("chunks"),
    )
    doc_agg = c.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("chunks")).alias("total_chunks"),
        F.round(F.avg(F.size("chunks")), 4).alias("avg_chunks_per_doc"),
    )
    u = c.select("source", F.explode("chunks").alias("chunk"))
    chunk_agg = u.groupBy("source").agg(
        F.countDistinct(F.md5("chunk")).alias("n_distinct_chunks"),
        F.round(F.avg(F.size(F.split("chunk", r"\s+"))), 4)
        .alias("avg_chunk_tokens"),
    )
    return doc_agg.join(chunk_agg, "source")


@query(
    "text_repetition_ratio",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    r AS (SELECT source,
                 1.0 - len(list_distinct(list_transform(
                           generate_series(1, greatest(len(toks) - 2, 1)),
                           i -> array_to_string(list_slice(toks, i, i + 2),
                                                ' '))))
                       / greatest(len(toks) - 2, 1)
                 AS rep
          FROM d)
    SELECT source,
           count(*) AS n_docs,
           round(avg(rep), 4) AS avg_rep,
           round(max(rep), 4) AS max_rep,
           sum(CASE WHEN rep > 0.05 THEN 1 ELSE 0 END)::BIGINT
           AS n_repetitive
    FROM r GROUP BY source
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (share of repeated word trigram positions)
    — the boilerplate/spam quality signal; per-source distribution."""
    docs = spread(load(spark, "documents", sf_dir))
    r = docs.select("source", T.repetition_ratio("text", n=3).alias("rep"))
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("rep"), 4).alias("avg_rep"),
        F.round(F.max("rep"), 4).alias("max_rep"),
        F.sum(F.when(col("rep") > 0.05, 1).otherwise(0)).alias("n_repetitive"),
    )


@query(
    "sim_ann_ivf_multiprobe",
    oracle=f"""
    WITH n AS (SELECT vec_id, {_norm_sql('embedding')} AS nv
               FROM embeddings),
    c AS (SELECT vec_id AS cid, nv AS cv FROM n
          WHERE vec_id IN ({_IVF_SEEDS_SQL})),
    scored AS (SELECT n.vec_id, n.nv, c.cid,
                      {_DOT.format(a='n.nv', b='c.cv')} AS dotc
               FROM n CROSS JOIN c),
    assigned AS (SELECT vec_id, nv, cid FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY dotc DESC, cid) AS rn
        FROM scored) WHERE rn = 1),
    qn AS (SELECT nv AS q_nv FROM n WHERE vec_id = 0),
    qcells AS (SELECT c.cid FROM qn CROSS JOIN c
               ORDER BY {_DOT.format(a='qn.q_nv', b='c.cv')} DESC, c.cid
               LIMIT 3)
    SELECT a.vec_id,
           round({_DOT.format(a='a.nv', b='q.q_nv')}, 6) AS cos_sim
    FROM assigned a, qn q
    WHERE a.cid IN (SELECT cid FROM qcells) AND a.vec_id != 0
    ORDER BY {_DOT.format(a='a.nv', b='q.q_nv')} DESC, a.vec_id
    LIMIT 10
    """,
)
def sim_ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN (nprobe=3): probe the query's three nearest
    coarse cells — the standard recall knob; cost grows linearly in probed
    cells while recall approaches exact search. At scale: a partition-
    pruned scan over nprobe partitions instead of one."""
    emb = load(spark, "embeddings", sf_dir)
    return S.ann_topk_ivf(
        emb, query_id=0, centroid_ids=_IVF_SEEDS, k=10, nprobe=3
    )


@query(
    "split_assignments",
    oracle="""
    WITH s AS (
        SELECT source,
               CAST(('0x' || substring(md5('split|' || doc_id::VARCHAR),
                                       1, 15))::BIGINT % 100 AS INTEGER)
               AS b
        FROM documents),
    lab AS (SELECT source,
                   CASE WHEN b < 80 THEN 'train'
                        WHEN b < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM s)
    SELECT source, split, count(*) AS n
    FROM lab GROUP BY source, split
    """,
)
def split_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (80/10/10) — the
    md5-mod trick that keeps membership stable across reruns,
    repartitioning, and engines (seeded RNG sampling is none of those,
    which is why it cannot be oracle-checked and does not belong in a
    reproducible pipeline). Per source x split counts."""
    docs = load(spark, "documents", sf_dir)
    return (
        docs.select("source", T.split_label("doc_id").alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "sim_quantized_topk",
    oracle=f"""
    WITH n AS (SELECT vec_id, {_norm_sql('embedding')} AS nv
               FROM embeddings),
    qz AS (SELECT vec_id,
                  list_transform(nv, x -> CAST(round(x * 127) AS BIGINT))
                  AS qv
           FROM n),
    q AS (SELECT qv AS q_qv FROM qz WHERE vec_id = 0)
    SELECT qz.vec_id,
           round(list_sum(list_transform(generate_series(1, len(qz.qv)),
                 i -> qz.qv[i] * q.q_qv[i])) / (127.0 * 127.0), 6)
           AS cos_sim_q8
    FROM qz, q
    WHERE qz.vec_id != 0
    ORDER BY cos_sim_q8 DESC, qz.vec_id
    LIMIT 10
    """,
)
def sim_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized cosine top-k: normalized vectors quantized to
    [-127,127] codes (4x less memory and shuffle than float32 — quantize
    once at ingest at 100 TB), dot products accumulated in integers and
    rescaled once. The oracle replicates the exact quantization, so this
    checks the codes, not just the ranking."""
    emb = load(spark, "embeddings", sf_dir)
    qz = emb.select(
        "vec_id",
        S.quantize_int8(S.l2_normalize(col("embedding"))).alias("qv"),
    )
    q = qz.filter(col("vec_id") == 0).select(
        col("vec_id").alias("q_id"), col("qv").alias("q_qv")
    )
    return (
        qz.crossJoin(F.broadcast(q))
        .filter(col("vec_id") != col("q_id"))
        .select(
            "vec_id",
            F.round(S.dot_int8(col("qv"), col("q_qv")), 6)
            .alias("cos_sim_q8"),
        )
        .orderBy(col("cos_sim_q8").desc(), col("vec_id"))
        .limit(10)
    )


@query(
    "mix_rebalanced_sources",
    oracle="""
    WITH kept AS (
        SELECT source FROM documents
        WHERE CASE
            WHEN source = 'src0' THEN
                ('0x' || substring(md5('mix|src0|' || doc_id::VARCHAR),
                                   1, 15))::BIGINT % 100 < 50
            WHEN source = 'src1' THEN
                ('0x' || substring(md5('mix|src1|' || doc_id::VARCHAR),
                                   1, 15))::BIGINT % 100 < 25
            ELSE TRUE END)
    SELECT source, count(*) AS n_kept
    FROM kept GROUP BY source
    """,
)
def mix_rebalanced_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixing: down-sample 'src0' to 50% and 'src1' to 25% by
    deterministic hash bucket (other sources untouched) — the corpus
    mixture-adjustment step of a training pipeline, as a map-only filter
    fused into the scan."""
    docs = load(spark, "documents", sf_dir)
    kept = T.rebalance_sources(docs, {"src0": 0.5, "src1": 0.25})
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


@query(
    "llm_pack_sequences",
    oracle=f"""
    WITH t AS (SELECT source, doc_id, len({_TOKS}) AS n_toks
               FROM documents),
    c AS (SELECT source, doc_id, n_toks,
                 sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
          FROM t),
    p AS (SELECT source,
                 CAST(floor((cum - n_toks) / 1024) AS BIGINT) AS pack_id,
                 n_toks
          FROM c),
    per_pack AS (SELECT source, pack_id,
                        count(*) AS n_docs,
                        sum(n_toks)::BIGINT AS pack_tokens
                 FROM p GROUP BY source, pack_id)
    SELECT source,
           count(*) AS n_packs,
           round(avg(pack_tokens), 4) AS avg_pack_tokens,
           max(pack_tokens) AS max_pack_tokens,
           round(avg(n_docs), 4) AS avg_docs_per_pack
    FROM per_pack GROUP BY source
    """,
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (1024-token budget per source): short documents
    concatenate into full context windows instead of being padded — the
    running-quotient window formulation keeps it one shuffle and fully
    deterministic (see operators/text.pack_sequences). Per-source pack
    utilization stats."""
    docs = load(spark, "documents", sf_dir)
    p = T.pack_sequences(docs.select("source", "doc_id", "text"),
                         budget_tokens=1024, order_col="doc_id",
                         part_col="source")
    per_pack = p.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("pack_tokens"),
    )
    return per_pack.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.round(F.avg("pack_tokens"), 4).alias("avg_pack_tokens"),
        F.max("pack_tokens").alias("max_pack_tokens"),
        F.round(F.avg("n_docs"), 4).alias("avg_docs_per_pack"),
    )


@query(
    "text_decontaminate",
    oracle="""
    WITH d AS (SELECT doc_id, string_split_regex(lower(text), '\\s+')
               AS toks FROM documents),
    ng AS (SELECT doc_id,
                  list_distinct(list_transform(
                      generate_series(1, greatest(len(toks) - 3, 1)),
                      i -> array_to_string(list_slice(toks, i, i + 3), ' ')))
                  AS grams
           FROM d),
    bench AS (SELECT DISTINCT unnest(grams) AS gram FROM ng
              WHERE doc_id % 17 = 0),
    train AS (SELECT doc_id, unnest(grams) AS gram FROM ng
              WHERE doc_id % 17 <> 0)
    SELECT doc_id, count(DISTINCT gram)::BIGINT AS shared_grams
    FROM train JOIN bench USING (gram)
    GROUP BY doc_id
    ORDER BY shared_grams DESC, doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any word 4-gram
    with the held-out "benchmark" slice (doc_id % 17 == 0 stands in for
    an eval suite). The benchmark n-gram set broadcasts; the training
    corpus is checked map-side and never shuffles (see
    operators/dedup.decontaminate)."""
    docs = spread(load(spark, "documents", sf_dir))
    bench = docs.filter(col("doc_id") % 17 == 0)
    train = docs.filter(col("doc_id") % 17 != 0)
    return (
        D.decontaminate(train, bench, n=4)
        .orderBy(col("shared_grams").desc(), "doc_id")
    )


@query(
    "text_gopher_flags",
    oracle="""
    WITH d AS (
      SELECT source, string_split_regex(lower(text), '\\s+') AS toks, text
      FROM documents
    ),
    m AS (
      SELECT source,
             len(toks) AS n,
             list_sum(list_transform(toks, t -> length(t))) * 1.0
               / len(toks) AS mean_len,
             length(regexp_replace(text, '[^#]', '', 'g'))
               + len(str_split(text, '...')) - 1 AS symbols,
             len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
               AS alpha,
             len(list_filter(toks, t -> list_contains(
                 ['the','a','and','of','to','in','is'], t))) AS stop_hits
      FROM d
    ),
    f AS (
      SELECT source,
             (n >= 20 AND n <= 100000) AS word_count_ok,
             (mean_len >= 3.0 AND mean_len <= 10.0) AS mean_word_len_ok,
             (symbols * 1.0 / n) <= 0.1 AS symbol_ratio_ok,
             (alpha * 1.0 / n) >= 0.8 AS alpha_ratio_ok,
             stop_hits >= 2 AS has_stopwords
      FROM m
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(word_count_ok::INT)::BIGINT AS n_word_count_ok,
           sum(mean_word_len_ok::INT)::BIGINT AS n_mean_word_len_ok,
           sum(symbol_ratio_ok::INT)::BIGINT AS n_symbol_ratio_ok,
           sum(alpha_ratio_ok::INT)::BIGINT AS n_alpha_ratio_ok,
           sum(has_stopwords::INT)::BIGINT AS n_has_stopwords,
           sum((word_count_ok AND mean_word_len_ok AND symbol_ratio_ok
                AND alpha_ratio_ok AND has_stopwords)::INT)::BIGINT
             AS n_passes
    FROM f GROUP BY source ORDER BY source
    """,
)
def text_gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-gate pass rates per source (see
    operators/text.gopher_quality_flags): one map-only projection over the
    scan, then a single tiny agg shuffle keyed by source."""
    docs = spread(load(spark, "documents", sf_dir))
    g = docs.select(
        "source", T.gopher_quality_flags("text").alias("g")
    )
    flag = lambda name: F.sum(col(f"g.{name}").cast("int")).alias(f"n_{name}")  # noqa: E731
    return (
        g.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            flag("word_count_ok"),
            flag("mean_word_len_ok"),
            flag("symbol_ratio_ok"),
            flag("alpha_ratio_ok"),
            flag("has_stopwords"),
            flag("passes"),
        )
        .orderBy("source")
    )


@query(
    "mix_temperature_sampled",
    oracle="""
    WITH counts AS (SELECT lang, count(*)::BIGINT AS n FROM documents
                    GROUP BY lang),
    nmin AS (SELECT min(n) AS n_min FROM counts),
    rates AS (SELECT lang, round(pow(n * 1.0 / n_min, -0.5), 6)
                     AS keep_rate
              FROM counts, nmin),
    kept AS (
      SELECT d.lang, keep_rate
      FROM documents d JOIN rates USING (lang)
      WHERE ('0x' || substring(md5('temp|' || doc_id::VARCHAR), 1, 15))
            ::BIGINT % 10000
            < round(keep_rate * 10000)::BIGINT
    )
    SELECT lang, keep_rate, count(*)::BIGINT AS n_kept
    FROM kept GROUP BY lang, keep_rate ORDER BY lang
    """,
)
def mix_temperature_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixing over the skewed ``lang`` strata (alpha=0.5):
    en (the largest) is compressed hardest, the smallest language is kept
    whole — post-mix shares ∝ n^0.5. Per-lang keep rates and kept counts
    (see operators/text.temperature_rebalance)."""
    docs = spread(load(spark, "documents", sf_dir))
    kept = T.temperature_rebalance(docs, alpha=0.5, stratum_col="lang")
    return (
        kept.groupBy("lang", "keep_rate")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("lang")
    )


@query(
    "text_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+'))
             AS term
      FROM documents
    ),
    tf AS (SELECT term, count(*)::BIGINT AS tf FROM toks GROUP BY term),
    tot AS (SELECT sum(tf) AS total_tf FROM tf),
    vocab AS (SELECT term, ln(tf * 1.0 / total_tf) AS lp FROM tf, tot),
    scored AS (
      SELECT doc_id, count(*)::BIGINT AS n_toks,
             round(avg(lp), 4) AS avg_logprob
      FROM toks JOIN vocab USING (term)
      GROUP BY doc_id
    )
    SELECT doc_id, n_toks, avg_logprob FROM scored
    ORDER BY avg_logprob ASC, doc_id LIMIT 20
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-20 documents by corpus-unigram mean log-probability — the
    CCNet-style LM quality signal surfacing rare-token/garbled docs
    (see operators/text.unigram_logprob_score)."""
    docs = spread(load(spark, "documents", sf_dir))
    s = T.unigram_logprob_score(docs)
    return (
        s.select("doc_id", "n_toks", "avg_logprob")
        .orderBy(col("avg_logprob").asc(), "doc_id")
        .limit(20)
    )


@query(
    "sim_ivf_recall",
    oracle=f"""
    WITH n AS (SELECT vec_id, {{norm}} AS nv FROM embeddings),
    q0 AS (SELECT nv AS q_nv FROM n WHERE vec_id = 0),
    exact AS (SELECT n.vec_id FROM n, q0 WHERE n.vec_id != 0
              ORDER BY {{dot_nq}} DESC, n.vec_id LIMIT 10),
    c AS (SELECT vec_id AS cid, nv AS cv FROM n
          WHERE vec_id IN ({{seeds}})),
    scored AS (SELECT n.vec_id, n.nv, c.cid, {{dot_nc}} AS dotc
               FROM n CROSS JOIN c),
    assigned AS (SELECT vec_id, nv, cid FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY dotc DESC, cid) AS rn
        FROM scored) WHERE rn = 1),
    q AS (SELECT nv AS q_nv, cid AS q_cid FROM assigned WHERE vec_id = 0),
    ivf AS (SELECT a.vec_id FROM assigned a, q
            WHERE a.cid = q.q_cid AND a.vec_id != 0
            ORDER BY {{dot_aq}} DESC, a.vec_id LIMIT 10)
    SELECT 10::BIGINT AS k, count(*)::BIGINT AS n_hits,
           round(count(*) / 10.0, 2) AS recall
    FROM exact JOIN ivf USING (vec_id)
    """.format(
        norm=_norm_sql("embedding"),
        seeds=_IVF_SEEDS_SQL,
        dot_nq=_DOT.format(a="n.nv", b="q0.q_nv"),
        dot_nc=_DOT.format(a="n.nv", b="c.cv"),
        dot_aq=_DOT.format(a="a.nv", b="q.q_nv"),
    ),
)
def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN self-evaluation: recall@10 of the IVF probe (nprobe=1) against
    the exact brute-force top-10 for the same query — the standard metric
    every ANN deployment tracks. Both sides are TakeOrdered plans over the
    same normalized scan; the overlap count is a tiny broadcast join."""
    emb = load(spark, "embeddings", sf_dir)
    exact = S.cosine_topk(emb, S.query_vector(emb, 0), k=10) \
        .select("vec_id")
    approx = S.ann_topk_ivf(emb, query_id=0, centroid_ids=_IVF_SEEDS,
                            k=10).select("vec_id")
    return (
        exact.join(F.broadcast(approx), "vec_id")
        .agg(
            F.lit(10).cast("long").alias("k"),
            F.count(F.lit(1)).alias("n_hits"),
            F.round(F.count(F.lit(1)) / 10.0, 2).alias("recall"),
        )
    )


@query(
    "text_token_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+'))
             AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
           GROUP BY doc_id, term),
    h AS (
      SELECT doc_id, sum(tf)::BIGINT AS n_toks,
             round(log2(sum(tf))
                   - sum(tf * log2(tf)) / sum(tf), 4) AS entropy_bits
      FROM tf GROUP BY doc_id
    )
    SELECT doc_id, n_toks, entropy_bits FROM h
    ORDER BY entropy_bits ASC, doc_id LIMIT 20
    """,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-20 documents by token-distribution Shannon entropy — the
    repetitive/template/spam docs a cleaning pipeline drops first (see
    operators/text.token_entropy)."""
    docs = spread(load(spark, "documents", sf_dir))
    h = T.token_entropy(docs)
    return (
        h.select("doc_id", "n_toks", "entropy_bits")
        .orderBy(col("entropy_bits").asc(), "doc_id")
        .limit(20)
    )


@query(
    "sim_semantic_dedup",
    oracle=f"""
    WITH assigned AS (SELECT vec_id, {_norm_sql('embedding')} AS nv,
                             {_BUCKET4_SQL} AS cid
                      FROM embeddings),
    dup AS (SELECT DISTINCT b.vec_id
            FROM assigned a JOIN assigned b
              ON a.cid = b.cid AND a.vec_id < b.vec_id
            WHERE round({_DOT.format(a='a.nv', b='b.nv')}, 6) >= 0.4)
    SELECT a.cid,
           count(*) AS n_vectors,
           sum(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END)::BIGINT
             AS n_dups,
           sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_survivors,
           min(CASE WHEN d.vec_id IS NULL THEN a.vec_id END)
             AS first_survivor
    FROM assigned a LEFT JOIN dup d ON a.vec_id = d.vec_id
    GROUP BY a.cid
    """,
)
def sim_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup on the SCALE-DEFAULT blocking: LSH
    hyperplane buckets (planes sized to this corpus; at production, planes
    ~ log4(N) keeps MEAN bucket size flat as the corpus grows — the hot
    tail still skews on clustered data, which sim_semantic_dedup_capped
    bounds with adaptive depth; fixed-K IVF cells measured ~26x at 16x
    input and remain available via blocking="ivf"). Flags intra-bucket cosine
    near-duplicates keeping the min-id exemplar; reports per-bucket dedup
    stats (see operators/similarity.semantic_dedup).
    Threshold note: the synthetic corpus has no >=0.85 cosine pairs at the
    verification SF, so the query runs at 0.4 to actually exercise the
    drop/exemplar path; the operator default stays 0.85 — the realistic
    SemDeDup setting. planes=4 likewise keeps same-bucket recall non-zero
    at this corpus's cosine ceiling (max pairwise 0.51)."""
    emb = spread(load(spark, "embeddings", sf_dir))
    flagged = S.semantic_dedup(emb, threshold=0.4, blocking="lsh", planes=4)
    return flagged.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.when(col("is_dup"), 1).otherwise(0)).alias("n_dups"),
        F.sum(F.when(col("is_dup"), 0).otherwise(1)).alias("n_survivors"),
        F.min(F.when(~col("is_dup"), col("vec_id"))).alias("first_survivor"),
    )


@query(
    "sim_semantic_dedup_capped",
    oracle=f"""
    WITH s AS (SELECT vec_id, {_norm_sql('embedding')} AS nv,
                      {_BUCKET_SQL} AS sig
               FROM embeddings),
    hot AS (SELECT substr(sig, 1, 4) AS b FROM s
            GROUP BY 1 HAVING count(*) > 30),
    assigned AS (SELECT s.vec_id, s.nv,
                        CASE WHEN h.b IS NULL THEN substr(s.sig, 1, 4)
                             ELSE s.sig END AS cid
                 FROM s LEFT JOIN hot h ON substr(s.sig, 1, 4) = h.b),
    dup AS (SELECT DISTINCT b.vec_id
            FROM assigned a JOIN assigned b
              ON a.cid = b.cid AND a.vec_id < b.vec_id
            WHERE round({_DOT.format(a='a.nv', b='b.nv')}, 6) >= 0.4)
    SELECT a.cid, length(a.cid)::BIGINT AS depth,
           count(*) AS n_vectors,
           sum(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END)::BIGINT
             AS n_dups,
           sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_survivors,
           min(CASE WHEN d.vec_id IS NULL THEN a.vec_id END)
             AS first_survivor
    FROM assigned a LEFT JOIN dup d ON a.vec_id = d.vec_id
    GROUP BY a.cid
    """,
)
def sim_semantic_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup under ADAPTIVE bucket depth (r11): flat hyperplane
    buckets skew on clustered corpora — the sweep measured sum(size^2)
    growing 21.4x at 16x input even with planes scheduled by log4(N) —
    so hot base buckets (size > cap) re-block at the full
    (planes+extra)-bit signature, bounding intra-block pair work to
    ~cap*N with a FIXED base plane count (no corpus-size scheduling;
    operators/similarity.lsh_bucket_adaptive). At this SF: planes=4,
    cap=30, extra=4 — 8 of 16 base buckets deepen (depth column = 8)
    while the cold half keeps the shallow signature's recall (depth 4).
    Oracle restates the full signature, the hot-bucket HAVING, the
    CASE re-block, and the intra-block dup flagging in DuckDB SQL."""
    emb = spread(load(spark, "embeddings", sf_dir))
    flagged = S.semantic_dedup(emb, threshold=0.4, blocking="lsh",
                               planes=4, bucket_cap=30, extra_planes=4)
    return (
        flagged.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.when(col("is_dup"), 1).otherwise(0)).alias("n_dups"),
            F.sum(F.when(col("is_dup"), 0).otherwise(1))
            .alias("n_survivors"),
            F.min(F.when(~col("is_dup"), col("vec_id")))
            .alias("first_survivor"),
        )
        .select("cid", F.length("cid").cast("long").alias("depth"),
                "n_vectors", "n_dups", "n_survivors", "first_survivor")
    )


_SHINGLES5 = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(toks) - 4, 1)), "
    "i -> array_to_string(list_slice(toks, i, i + 4), ' ')))"
)


@query(
    "text_dup_passage_fraction",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, source, unnest({_SHINGLES5}) AS sh FROM d),
    f AS (SELECT sh, count(*) AS doc_freq FROM sh GROUP BY sh),
    per AS (
      SELECT s.doc_id, s.source,
             count(*) AS n_shingles,
             sum(CASE WHEN f.doc_freq > 1 THEN 1 ELSE 0 END)::BIGINT
               AS n_shared
      FROM sh s JOIN f USING (sh)
      GROUP BY s.doc_id, s.source
    )
    SELECT source,
           count(*) AS n_docs,
           round(avg(n_shared / n_shingles), 4) AS avg_dup_frac,
           sum(CASE WHEN n_shared * 2 >= n_shingles THEN 1 ELSE 0 END)
             ::BIGINT AS n_docs_half_dup
    FROM per GROUP BY source
    """,
)
def text_dup_passage_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level repetition across the corpus: per-source average share
    of 5-gram shingles that also appear in another document, and how many
    docs are >=50% made of shared passages (boilerplate/mirror detector —
    see operators/text.dup_passage_stats for the scale shape)."""
    docs = spread(load(spark, "documents", sf_dir))
    per = T.dup_passage_stats(docs, n=5).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(col("n_shared") / col("n_shingles")), 4)
        .alias("avg_dup_frac"),
        F.sum(F.when(col("n_shared") * 2 >= col("n_shingles"), 1)
              .otherwise(0)).alias("n_docs_half_dup"),
    )


def _grams_sql(n: int) -> str:
    return (
        f"list_transform(generate_series(1, greatest(len(toks) - {n - 1},"
        f" 1)), i -> array_to_string(list_slice(toks, i, i + {n - 1}), ' '))"
    )


def _rep_sql(n: int, alias: str) -> str:
    return f"""
    {alias} AS (
      WITH g AS (SELECT doc_id, source, unnest({_grams_sql(n)}) AS gram
                 FROM (SELECT doc_id, source, {_TOKS} AS toks
                       FROM documents)),
      c AS (SELECT doc_id, source, gram, count(*)::BIGINT AS c
            FROM g GROUP BY doc_id, source, gram)
      SELECT doc_id, source,
             round(max(c)::DOUBLE / sum(c), 4) AS top_frac,
             round(sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE
                   / sum(c), 4) AS dup_frac
      FROM c GROUP BY doc_id, source
    )"""


@query(
    "text_ngram_repetition",
    oracle=f"""
    WITH {_rep_sql(2, 'bi')}, {_rep_sql(3, 'tri')}
    SELECT bi.source,
           count(*) AS n_docs,
           round(avg(bi.top_frac), 4) AS avg_top_bigram_frac,
           round(max(bi.top_frac), 4) AS max_top_bigram_frac,
           round(avg(tri.dup_frac), 4) AS avg_dup_trigram_frac
    FROM bi JOIN tri USING (doc_id)
    GROUP BY bi.source
    """,
)
def text_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition report per source: average and
    worst top-bigram occupancy plus average duplicated-trigram mass. One
    tokenize pass builds bi+tri grams together and the count shuffle is
    keyed on xxhash64(gram), not the raw gram string (see
    operators/text.ngram_repetition_profile for the one-exchange plan)."""
    docs = spread(load(spark, "documents", sf_dir))
    per = T.ngram_repetition_profile(docs, ns=(2, 3), keep_cols=("source",))
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("top2_frac"), 4).alias("avg_top_bigram_frac"),
        F.round(F.max("top2_frac"), 4).alias("max_top_bigram_frac"),
        F.round(F.avg("dup3_frac"), 4).alias("avg_dup_trigram_frac"),
    )


@query(
    "text_classifier_scores",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    s AS (
      SELECT source,
             round(1.0 / (1.0 + exp(-(
               list_sum(list_transform(toks, t ->
                 (('0x' || substring(md5('qw:' || t), 1, 8))::BIGINT
                  / 4294967295.0) * 2 - 1))
               / len(toks)))), 6) AS prob
      FROM d)
    SELECT source,
           count(*) AS n_docs,
           round(avg(prob), 4) AS avg_prob,
           round(min(prob), 4) AS min_prob,
           round(max(prob), 4) AS max_prob,
           sum(CASE WHEN prob >= 0.5 THEN 1 ELSE 0 END)::BIGINT AS n_keep
    FROM s GROUP BY source
    """,
)
def text_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering at scale: a hashed linear (fastText
    shape) classifier scored as a pure map-side fold — the pattern GPT-3 /
    LLaMA-style pipelines use to keep or drop documents by a trained
    quality model. Per-source score stats + keep counts (threshold 0.5).
    See operators/text.hashed_linear_score for the weight-broadcast plan
    note."""
    docs = spread(load(spark, "documents", sf_dir))
    scored = docs.select(
        "source", T.hashed_linear_score("text").alias("prob")
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("prob"), 4).alias("avg_prob"),
        F.round(F.min("prob"), 4).alias("min_prob"),
        F.round(F.max("prob"), 4).alias("max_prob"),
        F.sum(F.when(col("prob") >= 0.5, 1).otherwise(0)).alias("n_keep"),
    )


@query(
    "text_bpe_pair_stats",
    oracle=f"""
    WITH w AS (SELECT unnest(toks) AS word
               FROM (SELECT {_TOKS} AS toks FROM documents)),
    v AS (SELECT word, count(*)::BIGINT AS freq FROM w GROUP BY word),
    p AS (SELECT freq,
                 unnest(CASE WHEN length(word) > 1 THEN
                   list_transform(generate_series(1, length(word) - 1),
                                  i -> substring(word, i, 2))
                 ELSE CAST([] AS VARCHAR[]) END) AS pair
          FROM v)
    SELECT pair, sum(freq)::BIGINT AS total
    FROM p GROUP BY pair
    ORDER BY total DESC, pair LIMIT 10
    """,
)
def text_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training at scale — the first BPE merge decision: top-10
    adjacent character pairs weighted by word frequency, computed over the
    DISTINCT-word vocabulary so per-character work is bounded by vocab
    size, not corpus size (see operators/text.bpe_pair_stats)."""
    docs = spread(load(spark, "documents", sf_dir))
    return T.bpe_pair_stats(docs, top_k=10)


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH w AS (SELECT unnest(toks) AS term
               FROM (SELECT {_TOKS} AS toks FROM documents)),
    f AS (SELECT term, count(*)::BIGINT AS freq FROM w GROUP BY term),
    r AS (SELECT freq,
                 row_number() OVER (ORDER BY freq DESC, term) AS rk
          FROM f)
    SELECT count(*) AS n_terms,
           sum(freq)::BIGINT AS total_tokens,
           round(sum(CASE WHEN rk <= 100 THEN freq ELSE 0 END)::DOUBLE
                 / sum(freq), 6) AS cov_top100,
           round(sum(CASE WHEN rk <= 1000 THEN freq ELSE 0 END)::DOUBLE
                 / sum(freq), 6) AS cov_top1000
    FROM r
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage for tokenizer design: what fraction of all token
    occurrences the top-100 / top-1000 terms cover (see
    operators/text.vocab_coverage — the rank window runs over the
    metadata-sized vocabulary, not the corpus)."""
    docs = spread(load(spark, "documents", sf_dir))
    return T.vocab_coverage(docs, ks=(100, 1000))


@query(
    "sample_weighted_lengths",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             round(ln((('0x' || substring(md5('ws|' || doc_id::VARCHAR),
                                          1, 8))::BIGINT::DOUBLE + 1.0)
                      / 4294967296.0) / n_chars, 6) AS sample_key
      FROM documents),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY lang ORDER BY sample_key DESC, doc_id) AS rk
      FROM keyed)
    SELECT lang, doc_id, n_chars, sample_key
    FROM ranked WHERE rk <= 5
    """,
)
def sample_weighted_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis
    exponential keys, length-weighted, 5 docs per language) — the
    deterministic engine-stable way to build weighted training mixtures
    (see operators/text.weighted_sample_topk)."""
    docs = load(spark, "documents", sf_dir)
    s = T.weighted_sample_topk(
        docs, weight_col="n_chars", k=5, stratum_col="lang"
    )
    return s.select("lang", "doc_id", "n_chars", "sample_key")


@query(
    "text_vocab_encode",
    oracle=f"""
    WITH w AS (SELECT doc_id, unnest(toks) AS term
               FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
    f AS (SELECT term, count(*) AS freq FROM w GROUP BY term),
    v AS (SELECT term,
                 row_number() OVER (ORDER BY freq DESC, term) - 1
                     AS token_id
          FROM f QUALIFY token_id < 100),
    enc AS (SELECT w.doc_id,
                   coalesce(v.token_id,
                            100 + ('0x' || substring(md5(w.term), 1, 8))
                                  ::BIGINT % 16) AS tid
            FROM w LEFT JOIN v USING (term))
    SELECT doc_id, count(*) AS n_tokens,
           sum(CASE WHEN tid >= 100 THEN 1 ELSE 0 END)::BIGINT AS n_oov,
           sum(tid)::BIGINT AS id_sum
    FROM enc GROUP BY doc_id ORDER BY doc_id LIMIT 20
    """,
)
def text_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer application end-to-end (operators/text.build_vocab +
    encode_tokens): corpus-derived top-100 vocabulary, texts encoded to
    token-id arrays with hashing-trick OOV ids. The query verifies the
    ARRAY itself (length / OOV count / id checksum all fold over
    token_ids), so position re-assembly is exercised, while the oracle
    restates the order-free aggregates."""
    docs = spread(load(spark, "documents", sf_dir))
    vocab = T.build_vocab(docs, vocab_size=100)
    enc = T.encode_tokens(docs, vocab, vocab_size=100, oov_buckets=16)
    ids = col("token_ids")
    return (
        enc.select(
            "doc_id",
            F.size(ids).alias("n_tokens"),
            F.size(F.filter(ids, lambda t: t >= 100)).alias("n_oov"),
            F.aggregate(ids, F.lit(0).cast("long"),
                        lambda acc, t: acc + t).alias("id_sum"),
        )
        .orderBy("doc_id")
        .limit(20)
    )


@query(
    "web_domain_stats",
    oracle="""
    WITH u AS (
        SELECT doc_id, n_chars,
               CASE WHEN doc_id % 97 = 0
                    THEN 'http://rare.example.com/p/' || doc_id
                    ELSE 'http://site' || (doc_id % 7)
                         || '.example.com/p/' || doc_id END AS url
        FROM documents),
    d AS (SELECT regexp_extract(url, 'http://([^/]+)', 1) AS domain,
                 n_chars
          FROM u)
    SELECT domain, count(*) AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           round(avg(n_chars), 2) AS avg_chars,
           count(*) >= 10 AS keep
    FROM d GROUP BY domain
    """,
)
def web_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus curation by DOMAIN — the CommonCrawl-pipeline staple:
    extract the host from each document's URL (deterministically
    injected; the synthetic corpus ships none), aggregate per-domain
    volume, and flag low-volume domains for review/drop (domain-level
    filtering is how web pipelines cut spam clusters cheaply before
    any per-document scoring). Host extraction is parse_url — map-side,
    codegen; the aggregate is domain-cardinality."""
    docs = load(spark, "documents", sf_dir).select("doc_id", "n_chars")
    with_url = docs.withColumn(
        "url",
        F.when(
            col("doc_id") % 97 == 0,
            F.concat(F.lit("http://rare.example.com/p/"), col("doc_id")),
        ).otherwise(
            F.concat(F.lit("http://site"), col("doc_id") % 7,
                     F.lit(".example.com/p/"), col("doc_id"))
        ),
    )
    d = with_url.withColumn("domain", F.parse_url("url", F.lit("HOST")))
    return d.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        (F.count(F.lit(1)) >= 10).alias("keep"),
    )


@query(
    "text_top_terms_per_lang",
    oracle=f"""
    WITH w AS (SELECT lang, unnest(toks) AS term
               FROM (SELECT lang, {_TOKS} AS toks FROM documents)),
    f AS (SELECT lang, term, count(*) AS freq
          FROM w GROUP BY lang, term),
    r AS (SELECT lang, term, freq,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY freq DESC, term) AS rk
          FROM f)
    SELECT lang, term, freq, rk::INT AS rk
    FROM r WHERE rk <= 5
    """,
)
def text_top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per language — the per-stratum frequency report every
    corpus audit starts with. The corpus-sized work is one (lang, term)
    count shuffle; the rank window then runs over the vocabulary×lang
    table (metadata-sized), the same two-tier shape as vocab_coverage."""
    from pyspark.sql import Window

    docs = spread(load(spark, "documents", sf_dir))
    f = (
        docs.select("lang", F.explode(T.tokens("text")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("freq").desc(), "term")
    return (
        f.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
    )


@query(
    "dedup_incremental_ingest",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS shingles FROM d),
    hsx AS (SELECT doc_id, shingles, {_HS} AS hs FROM sh),
    sig AS (SELECT doc_id, shingles, {_MH8} AS mh FROM hsx),
    bands AS (SELECT doc_id, unnest({_BANDS_SQL}) AS band_key FROM sig),
    cand AS (SELECT DISTINCT b.doc_id AS b_id, c.doc_id AS c_id
             FROM bands b JOIN bands c USING (band_key)
             WHERE b.doc_id % 5 = 0 AND c.doc_id % 5 <> 0),
    pairs AS (
        SELECT b_id, c_id,
               len(list_filter(sb.shingles,
                   s -> list_contains(sc.shingles, s))) * 1.0 /
               (len(sb.shingles) + len(sc.shingles) -
                len(list_filter(sb.shingles,
                    s -> list_contains(sc.shingles, s)))) AS j
        FROM cand
        JOIN sh sb ON sb.doc_id = cand.b_id
        JOIN sh sc ON sc.doc_id = cand.c_id)
    SELECT b_id AS doc_id, count(*) AS n_corpus_dups,
           round(max(j), 6) AS max_sim
    FROM pairs WHERE j >= 0.5 GROUP BY b_id
    """,
)
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup (operators/dedup.near_dups_against_
    corpus): the 20% "new batch" (doc_id%5=0) checked against the 80%
    existing corpus — candidates come from the corpus band INDEX, so
    each ingest pays batch-proportional cost, never another corpus
    all-pairs pass. Oracle is the exhaustive restatement, verifying
    blocking recall exactly."""
    docs = spread(load(spark, "documents", sf_dir))
    batch = docs.filter(col("doc_id") % 5 == 0)
    corpus = docs.filter(col("doc_id") % 5 != 0)
    return D.near_dups_against_corpus(batch, corpus, threshold=0.5,
                                      bands=4, rows=2)


@query(
    "text_bpe_apply_merge",
    oracle=f"""
    WITH w AS (SELECT unnest(toks) AS word
               FROM (SELECT {_TOKS} AS toks FROM documents)),
    v AS (SELECT word, count(*)::BIGINT AS freq FROM w GROUP BY word),
    p AS (SELECT freq,
                 unnest(CASE WHEN length(word) > 1 THEN
                   list_transform(generate_series(1, length(word) - 1),
                                  i -> substring(word, i, 2))
                 ELSE CAST([] AS VARCHAR[]) END) AS pair
          FROM v),
    top1 AS (SELECT pair FROM (
                 SELECT pair, sum(freq) AS total FROM p GROUP BY pair
                 ORDER BY total DESC, pair LIMIT 1)),
    applied AS (
        SELECT v.freq, length(v.word) AS n_before,
               length(v.word) -
               (length(v.word)
                - length(replace(v.word, t.pair, ''))) / 2 AS n_after
        FROM v, top1 t)
    SELECT (SELECT pair FROM top1) AS merged_pair,
           sum(freq * n_before)::BIGINT AS tokens_before,
           sum(freq * n_after)::BIGINT AS tokens_after,
           round(1.0 - sum(freq * n_after)::DOUBLE
                 / sum(freq * n_before), 6) AS compression
    FROM applied
    """,
)
def text_bpe_apply_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second half of BPE training's first step: APPLY the winning
    merge and measure corpus-level compression. From the initial
    char-token state, applying pair xy is greedy non-overlapping
    substring replacement, so per distinct word the new token count is
    len − occurrences(xy) — all computed over the VOCABULARY (corpus
    work is the one word-count shuffle; the winning pair is a 1-row
    broadcast). Iterating (re-count pairs → merge → repeat) is this
    same plan in a loop, each round over vocab-sized data."""
    docs = spread(load(spark, "documents", sf_dir))
    v = (
        docs.select(F.explode(T.tokens("text")).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = v.select(
        "freq",
        F.explode(
            F.when(
                F.length("word") > 1,
                F.expr("transform(sequence(1, length(word) - 1), "
                       "i -> substring(word, i, 2))"),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
    )
    top1 = (
        pairs.groupBy("pair").agg(F.sum("freq").alias("total"))
        .orderBy(F.col("total").desc(), "pair").limit(1)
        .select("pair")
    )
    applied = v.crossJoin(F.broadcast(top1)).select(
        "freq", "pair",
        F.length("word").alias("n_before"),
        (F.length("word")
         - (F.length("word")
            - F.length(F.expr("replace(word, pair, '')"))) / 2
         ).alias("n_after"),
    )
    return applied.groupBy("pair").agg(
        F.sum(col("freq") * col("n_before")).alias("tokens_before"),
        F.sum(col("freq") * col("n_after")).cast("long")
        .alias("tokens_after"),
        F.round(
            1.0 - F.sum(col("freq") * col("n_after"))
            / F.sum(col("freq") * col("n_before")), 6
        ).alias("compression"),
    ).select(col("pair").alias("merged_pair"), "tokens_before",
             "tokens_after", "compression")


@query(
    "sim_centroid_drift",
    oracle=f"""
    WITH dims AS (
        SELECT vec_id % 2 AS era, i,
               embedding[i]::DOUBLE AS x
        FROM embeddings, unnest(generate_series(1, 64)) AS t(i)),
    cents AS (
        SELECT era, list(avg_x ORDER BY i) AS c
        FROM (SELECT era, i, avg(x) AS avg_x
              FROM dims GROUP BY era, i)
        GROUP BY era),
    ab AS (SELECT (SELECT c FROM cents WHERE era = 0) AS a,
                  (SELECT c FROM cents WHERE era = 1) AS b)
    SELECT round({_DOT.format(a='a', b='b')} /
                 (sqrt({_DOT.format(a='a', b='a')})
                  * sqrt({_DOT.format(a='b', b='b')})), 6)
               AS centroid_cosine,
           round(sqrt({_DOT.format(a='a', b='a')}), 6) AS norm_a,
           round(sqrt({_DOT.format(a='b', b='b')}), 6) AS norm_b
    FROM ab
    """,
)
def sim_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift between two dataset versions: per-version
    mean vector (posexplode → (era, dim) avg — ONE corpus shuffle with
    map-side partial averages), then the cosine between the two
    centroids (a 2-row computation). Low cosine = the embedding
    distribution moved — the vector-space complement of the scalar PSI
    monitor. At 100 TB the centroid is a 64-value aggregate per
    version: the comparison itself is free."""
    emb = load(spark, "embeddings", sf_dir)
    dims = emb.select(
        (col("vec_id") % 2).alias("era"),
        F.posexplode("embedding").alias("i", "x"),
    )
    cents = (
        dims.groupBy("era", "i").agg(F.avg("x").alias("avg_x"))
        .groupBy("era")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("i", "avg_x"))),
                lambda s: s["avg_x"],
            ).alias("c")
        )
    )
    a = cents.filter(col("era") == 0).select(col("c").alias("a"))
    b = cents.filter(col("era") == 1).select(col("c").alias("b"))
    from mqtt_streamr_spark.operators.similarity import dot

    ab = a.crossJoin(b)
    return ab.select(
        F.round(
            dot(col("a"), col("b"))
            / (F.sqrt(dot(col("a"), col("a")))
               * F.sqrt(dot(col("b"), col("b")))), 6
        ).alias("centroid_cosine"),
        F.round(F.sqrt(dot(col("a"), col("a"))), 6).alias("norm_a"),
        F.round(F.sqrt(dot(col("b"), col("b"))), 6).alias("norm_b"),
    )


@query(
    "dedup_containment_pairs",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS shingles FROM d),
    hsx AS (SELECT doc_id, shingles, {_HS} AS hs FROM sh),
    sig AS (SELECT doc_id, shingles, {_MH8} AS mh FROM hsx),
    bands AS (SELECT doc_id, unnest({_BANDS_SQL}) AS band_key FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b USING (band_key)
             WHERE a.doc_id <> b.doc_id),
    pairs AS (
        SELECT id_a, id_b,
               len(list_filter(sa.shingles,
                   s -> list_contains(sb.shingles, s))) * 1.0 /
               len(sa.shingles) AS containment
        FROM cand
        JOIN sh sa ON sa.doc_id = cand.id_a
        JOIN sh sb ON sb.doc_id = cand.id_b)
    SELECT id_a, id_b, round(containment, 6) AS containment
    FROM pairs WHERE containment >= 0.8
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment detection: |A∩B| / |A| >= 0.8 flags doc A
    as (near-)CONTAINED in B — catches excerpts, quotes, and
    superset/subset pairs that symmetric Jaccard misses (a short doc
    fully inside a long one can have low Jaccard but containment 1.0).
    Directional, so both (a,b) and (b,a) are evaluated from the same
    LSH candidate set; everything else shares the near-dup plan
    (banded candidates, shingle verify over candidates only). Caveat
    shared with all MinHash LSH: candidate recall follows symmetric
    resemblance, so low-Jaccard containments need the dedicated
    min-over-A signature variant at scale."""
    docs = spread(load(spark, "documents", sf_dir))
    cands = D.near_dup_candidates(docs, "text", "doc_id", 4, 2, "md5")
    txt = docs.select("doc_id", "text")
    # |A∩B| is symmetric: verify each UNORDERED candidate pair once,
    # then emit both directions — half the verify-join work of scoring
    # (a,b) and (b,a) separately. r12 (guide §2.3/§3, same shape as
    # operators/dedup._verified_pairs): texts join onto the LSH-bounded
    # candidate pairs and the shingle sets are computed per pair
    # (let-bound), instead of materializing the whole corpus's shingle
    # arrays as the build side of both joins.
    stats = T.let_bound(
        D.shingles("__text_a", 3),
        lambda sa: T.let_bound(
            D.shingles("__text_b", 3),
            lambda sb: F.struct(
                F.size(F.array_intersect(sa, sb)).alias("inter"),
                F.size(sa).alias("n_a"), F.size(sb).alias("n_b"),
            ),
        ),
    )
    scored = (
        cands.join(txt.withColumnRenamed("doc_id", "id_a")
                   .withColumnRenamed("text", "__text_a"), "id_a")
        .join(txt.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("text", "__text_b"), "id_b")
        .select("id_a", "id_b", stats.alias("__st"))
        .select("id_a", "id_b", "__st.inter", "__st.n_a", "__st.n_b")
    )
    directed = scored.select(
        F.explode(
            F.array(
                F.struct(col("id_a"), col("id_b"),
                         (col("inter") / col("n_a")).alias("containment")),
                F.struct(col("id_b").alias("id_a"),
                         col("id_a").alias("id_b"),
                         (col("inter") / col("n_b")).alias("containment")),
            )
        ).alias("r")
    ).select("r.*")
    return (
        directed.filter(col("containment") >= 0.8)
        .select("id_a", "id_b",
                F.round("containment", 6).alias("containment"))
    )


@query(
    "dedup_threshold_sweep",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS shingles FROM d),
    hsx AS (SELECT doc_id, shingles, {_HS} AS hs FROM sh),
    sig AS (SELECT doc_id, shingles, {_MH8} AS mh FROM hsx),
    bands AS (SELECT doc_id, unnest({_BANDS_SQL}) AS band_key FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b USING (band_key)
             WHERE a.doc_id < b.doc_id),
    pairs AS (
        SELECT len(list_filter(sa.shingles,
                   s -> list_contains(sb.shingles, s))) * 1.0 /
               (len(sa.shingles) + len(sb.shingles) -
                len(list_filter(sa.shingles,
                    s -> list_contains(sb.shingles, s)))) AS j
        FROM cand
        JOIN sh sa ON sa.doc_id = cand.id_a
        JOIN sh sb ON sb.doc_id = cand.id_b)
    SELECT count(*) AS n_candidates,
           sum(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END)::BIGINT AS ge_50,
           sum(CASE WHEN j >= 0.6 THEN 1 ELSE 0 END)::BIGINT AS ge_60,
           sum(CASE WHEN j >= 0.7 THEN 1 ELSE 0 END)::BIGINT AS ge_70,
           sum(CASE WHEN j >= 0.8 THEN 1 ELSE 0 END)::BIGINT AS ge_80,
           sum(CASE WHEN j >= 0.9 THEN 1 ELSE 0 END)::BIGINT AS ge_90
    FROM pairs
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold tuning in ONE pass: every LSH candidate pair verified
    once, pair counts reported at five Jaccard cutoffs simultaneously —
    how a dedup threshold is actually chosen, without re-running the
    candidate join per setting. Same banded-candidate plan as the dedup
    family; the sweep is conditional sums over the one verify result."""
    docs = spread(load(spark, "documents", sf_dir))
    cands = D.near_dup_candidates(docs, "text", "doc_id", 4, 2, "md5")
    txt = docs.select("doc_id", "text")
    # r12: per-pair shingle computation over the candidate-attached
    # texts (same shape as operators/dedup._verified_pairs) instead of
    # corpus-wide shingle arrays as both join build sides
    j = T.let_bound(
        D.shingles("__text_a", 3),
        lambda sa: T.let_bound(
            D.shingles("__text_b", 3),
            lambda sb: D.jaccard(sa, sb),
        ),
    )
    pairs = (
        cands.join(txt.withColumnRenamed("doc_id", "id_a")
                   .withColumnRenamed("text", "__text_a"), "id_a")
        .join(txt.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("text", "__text_b"), "id_b")
        .withColumn("j", j)
    )
    aggs = [F.count(F.lit(1)).alias("n_candidates")]
    for thr in (50, 60, 70, 80, 90):
        aggs.append(
            F.sum(F.when(col("j") >= thr / 100.0, 1).otherwise(0))
            .alias(f"ge_{thr}")
        )
    return pairs.agg(*aggs)


@query(
    "split_leakage_report",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS shingles FROM d),
    hsx AS (SELECT doc_id, shingles, {_HS} AS hs FROM sh),
    sig AS (SELECT doc_id, shingles, {_MH8} AS mh FROM hsx),
    bands AS (SELECT doc_id, unnest({_BANDS_SQL}) AS band_key FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b USING (band_key)
             WHERE a.doc_id < b.doc_id),
    pairs AS (
        SELECT id_a, id_b
        FROM cand
        JOIN sh sa ON sa.doc_id = cand.id_a
        JOIN sh sb ON sb.doc_id = cand.id_b
        WHERE len(list_filter(sa.shingles,
                  s -> list_contains(sb.shingles, s))) * 1.0 /
              (len(sa.shingles) + len(sb.shingles) -
               len(list_filter(sa.shingles,
                   s -> list_contains(sb.shingles, s)))) >= 0.5),
    lab AS (
        SELECT doc_id,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     CAST(('0x' || substring(md5('split|'
                          || doc_id::VARCHAR), 1, 15))::BIGINT % 100
                          AS INTEGER) AS b
              FROM documents)),
    tagged AS (
        SELECT la.split AS split_a, lb.split AS split_b
        FROM pairs
        JOIN lab la ON la.doc_id = pairs.id_a
        JOIN lab lb ON lb.doc_id = pairs.id_b)
    SELECT least(split_a, split_b) AS split_lo,
           greatest(split_a, split_b) AS split_hi,
           count(*) AS n_pairs,
           (least(split_a, split_b) <> greatest(split_a, split_b))
               AS leaks
    FROM tagged GROUP BY split_lo, split_hi
    """,
)
def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-hygiene leakage report: near-duplicate pairs crossed with
    the deterministic train/val/test assignment — any pair straddling
    splits (leaks=true) means test examples near-duplicate training
    data and eval numbers are inflated. The fix is cluster-aware
    splitting (assign by duplicate-cluster keeper id, not doc id); this
    query is the detector that says whether you need it. Same LSH
    candidate plan as the dedup family; the split join is a map-side
    hash label."""
    docs = spread(load(spark, "documents", sf_dir))
    pairs = D.near_dup_pairs(docs, threshold=0.5, bands=4, rows=2)
    lab = docs.select("doc_id", T.split_label("doc_id").alias("split"))
    tagged = (
        pairs.select("id_a", "id_b")
        .join(lab.withColumnRenamed("doc_id", "id_a")
              .withColumnRenamed("split", "split_a"), "id_a")
        .join(lab.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("split", "split_b"), "id_b")
    )
    return (
        tagged.groupBy(
            F.least("split_a", "split_b").alias("split_lo"),
            F.greatest("split_a", "split_b").alias("split_hi"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("leaks", col("split_lo") != col("split_hi"))
    )


@query(
    "text_rank_normalized_lengths",
    oracle="""
    SELECT doc_id, source, n_chars,
           round(percent_rank() OVER (
               PARTITION BY source ORDER BY n_chars), 6) AS len_pctl
    FROM documents
    ORDER BY doc_id LIMIT 20
    """,
)
def text_rank_normalized_lengths(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """Rank-based (quantile) normalization per stratum — the
    distribution-free alternative to z-scores for skewed features:
    percent_rank maps each doc's length to its within-source quantile,
    invariant to outliers and monotone transforms. One shuffle on the
    stratum key; rank ties resolve identically in any engine (rank
    with gaps), which is what makes this normalization engine-stable
    where seeded RNG jitter is not."""
    from pyspark.sql import Window

    docs = load(spark, "documents", sf_dir)
    w = Window.partitionBy("source").orderBy("n_chars")
    return (
        docs.select(
            "doc_id", "source", "n_chars",
            F.round(F.percent_rank().over(w), 6).alias("len_pctl"),
        )
        .orderBy("doc_id")
        .limit(20)
    )


@query(
    "split_cluster_aware",
    oracle=f"""
    WITH RECURSIVE d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS shingles FROM d),
    hsx AS (SELECT doc_id, shingles, {_HS} AS hs FROM sh),
    sig AS (SELECT doc_id, shingles, {_MH8} AS mh FROM hsx),
    bands AS (SELECT doc_id, unnest({_BANDS_SQL}) AS band_key FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b USING (band_key)
             WHERE a.doc_id < b.doc_id),
    pairs AS (
        SELECT id_a, id_b
        FROM cand
        JOIN sh sa ON sa.doc_id = cand.id_a
        JOIN sh sb ON sb.doc_id = cand.id_b
        WHERE len(list_filter(sa.shingles,
                  s -> list_contains(sb.shingles, s))) * 1.0 /
              (len(sa.shingles) + len(sb.shingles) -
               len(list_filter(sa.shingles,
                   s -> list_contains(sb.shingles, s)))) >= 0.5),
    edges AS (SELECT id_a AS n, id_b AS m FROM pairs
              UNION ALL
              SELECT id_b AS n, id_a AS m FROM pairs),
    reach(id, label) AS (
        SELECT n, n FROM edges
        UNION
        SELECT e.n, r.label FROM edges e JOIN reach r ON r.id = e.m),
    comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
    keyed AS (
        SELECT doc.doc_id,
               coalesce(c.component, doc.doc_id) AS split_key
        FROM documents doc LEFT JOIN comp c ON c.id = doc.doc_id),
    lab AS (
        SELECT doc_id, split_key,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, split_key,
                     CAST(('0x' || substring(md5('split|'
                          || split_key::VARCHAR), 1, 15))::BIGINT % 100
                          AS INTEGER) AS b
              FROM keyed))
    SELECT split, count(*) AS n_docs,
           count(DISTINCT split_key) AS n_keys
    FROM lab GROUP BY split
    """,
)
def split_cluster_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FIX split_leakage_report motivates: assign train/val/test by
    DUPLICATE-CLUSTER label (connected-component keeper), not doc id —
    every near-dup cluster lands in one split whole, so cross-split
    leakage is zero BY CONSTRUCTION (same md5-mod stability; singleton
    docs key by their own id). Costs the pair + CC pass once per corpus
    refresh; the assignment itself stays a map-side hash."""
    docs = spread(load(spark, "documents", sf_dir))
    pairs = D.near_dup_pairs(docs, threshold=0.5, bands=4, rows=2)
    comp = D.connected_components(pairs)
    keyed = (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .withColumn("split_key", F.coalesce("component", "doc_id"))
    )
    lab = keyed.withColumn("split", T.split_label("split_key"))
    return lab.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("split_key").alias("n_keys"),
    )


@query(
    "dedup_keep_best_quality",
    oracle=f"""
    WITH RECURSIVE d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS shingles FROM d),
    hsx AS (SELECT doc_id, shingles, {_HS} AS hs FROM sh),
    sig AS (SELECT doc_id, shingles, {_MH8} AS mh FROM hsx),
    bands AS (SELECT doc_id, unnest({_BANDS_SQL}) AS band_key FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b USING (band_key)
             WHERE a.doc_id < b.doc_id),
    pairs AS (
        SELECT id_a, id_b
        FROM cand
        JOIN sh sa ON sa.doc_id = cand.id_a
        JOIN sh sb ON sb.doc_id = cand.id_b
        WHERE len(list_filter(sa.shingles,
                  s -> list_contains(sb.shingles, s))) * 1.0 /
              (len(sa.shingles) + len(sb.shingles) -
               len(list_filter(sa.shingles,
                   s -> list_contains(sb.shingles, s)))) >= 0.5),
    edges AS (SELECT id_a AS n, id_b AS m FROM pairs
              UNION ALL
              SELECT id_b AS n, id_a AS m FROM pairs),
    reach(id, label) AS (
        SELECT n, n FROM edges
        UNION
        SELECT e.n, r.label FROM edges e JOIN reach r ON r.id = e.m),
    comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
    scored AS (
        SELECT c.component, doc.doc_id, doc.n_chars,
               row_number() OVER (PARTITION BY c.component
                                  ORDER BY doc.n_chars DESC,
                                           doc.doc_id DESC) AS rk
        FROM comp c JOIN documents doc ON doc.doc_id = c.id)
    SELECT component AS cluster_id,
           count(*) AS n_docs,
           max(CASE WHEN rk = 1 THEN doc_id END) AS keeper_id,
           max(n_chars) AS keeper_chars
    FROM scored GROUP BY component
    """,
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection per duplicate cluster by QUALITY, not id:
    within each connected component the longest document wins (n_chars
    as the quality proxy; any scoring column drops in), deterministic
    ties by doc_id — the policy step between clustering and deletion
    that min-id keeper selection gets wrong when the shortest copy
    happens to have the smallest id. One join of the component labels
    against the metadata + a max_by aggregate."""
    docs = spread(load(spark, "documents", sf_dir))
    pairs = D.near_dup_pairs(docs, threshold=0.5, bands=4, rows=2)
    comp = D.connected_components(pairs)
    scored = comp.join(
        docs.select(col("doc_id").alias("id"), "n_chars"), "id")
    return scored.groupBy(col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("max_by(id, struct(n_chars, id))").alias("keeper_id"),
        F.max("n_chars").alias("keeper_chars"),
    )


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH w AS (SELECT unnest(toks) AS term
               FROM (SELECT {_TOKS} AS toks FROM documents)),
    f AS (SELECT term, count(*) AS freq FROM w GROUP BY term),
    r AS (SELECT freq,
                 row_number() OVER (ORDER BY freq DESC, term) AS rk
          FROM f)
    SELECT count(*) AS n_terms,
           round(regr_slope(ln(freq), ln(rk)), 6) AS zipf_slope,
           round(regr_r2(ln(freq), ln(rk)), 6) AS fit_r2
    FROM r
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law (Zipf) fit of the term distribution: regression of
    log-frequency on log-rank — natural corpora slope near −1, and a
    flat or broken slope flags synthetic/templated text. Corpus-sized
    work is the one term-count shuffle; the rank window and the
    regression (constant-state aggregate) run over the vocabulary."""
    from pyspark.sql import Window

    docs = spread(load(spark, "documents", sf_dir))
    f = (
        docs.select(F.explode(T.tokens("text")).alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    )
    r = f.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.col("freq").desc(), "term")),
    )
    return r.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(F.log("freq"), F.log("rk")), 6)
        .alias("zipf_slope"),
        F.round(F.regr_r2(F.log("freq"), F.log("rk")), 6).alias("fit_r2"),
    )


@query(
    "text_heavy_hitters",
    oracle=f"""
    WITH t AS (SELECT unnest({_TOKS}) AS term FROM documents),
    n AS (SELECT count(*)::DOUBLE AS total FROM t),
    c AS (SELECT term, count(*)::BIGINT AS cnt FROM t GROUP BY term)
    SELECT term, cnt,
           round(cnt / (SELECT total FROM n), 6) AS frac
    FROM c WHERE cnt >= (SELECT total FROM n) * 0.005
    """,
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters (terms >= 0.5% of all token occurrences) via
    the Misra-Gries candidates + exact-verify two-pass — the oracle
    states the naive full-vocabulary aggregate; results agree exactly
    because the candidate set is provably complete above the support
    threshold and verification is exact (see operators/text.frequent_terms
    for the bound). The shuffled key space is counters*partitions, not
    vocabulary-sized."""
    docs = spread(load(spark, "documents", sf_dir))
    return T.frequent_terms(docs, min_support=0.005, counters=512)


@query(
    "dedup_exact_jaccard_prefix",
    oracle=f"""
    WITH d AS (SELECT doc_id,
                      list_distinct({_TOKS}) AS t
               FROM documents WHERE doc_id % 20 = 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_filter(a.t, x -> list_contains(b.t, x))) * 1.0 /
                 (len(a.t) + len(b.t) -
                  len(list_filter(a.t, x -> list_contains(b.t, x)))), 6)
               AS jaccard_sim
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE len(list_filter(a.t, x -> list_contains(b.t, x))) * 1.0 /
          (len(a.t) + len(b.t) -
           len(list_filter(a.t, x -> list_contains(b.t, x)))) >= 0.9
    """,
)
def dedup_exact_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT token-Jaccard >= 0.9 self-join via prefix filtering — unlike
    the MinHash family this provably finds EVERY qualifying pair, and the
    oracle here is the genuinely independent ground truth (a naive
    all-pairs scan), so the check proves completeness of the pruning, not
    just agreement on a shared candidate recipe. Runs on a 5% systematic
    sample because this synthetic corpus is pathologically templated: the
    TRUE >= 0.9 pair set over the full corpus is itself quadratic
    (measured ~1M pairs at sf0.1), which no join algorithm outruns —
    exact SSJoin is for the sparse regime; quadratic-output corpora get
    MinHash-clustered first (dedup_duplicate_clusters) and exact-joined
    within. See operators/dedup.jaccard_prefix_join for the bound."""
    docs = spread(load(spark, "documents", sf_dir)).filter(
        col("doc_id") % 20 == 0)
    return D.jaccard_prefix_join(docs, threshold=0.9)


@query(
    "dedup_cluster_exact_join",
    oracle=f"""
    WITH RECURSIVE d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS shingles FROM d),
    hsx AS (SELECT doc_id, shingles, {_HS} AS hs FROM sh),
    sig AS (SELECT doc_id, shingles, {_MH8} AS mh FROM hsx),
    bands AS (SELECT doc_id, unnest({_BANDS_SQL}) AS band_key FROM sig),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b USING (band_key)
             WHERE a.doc_id < b.doc_id),
    pairs AS (
        SELECT id_a, id_b
        FROM cand
        JOIN sh sa ON sa.doc_id = cand.id_a
        JOIN sh sb ON sb.doc_id = cand.id_b
        WHERE len(list_filter(sa.shingles,
                  s -> list_contains(sb.shingles, s))) * 1.0 /
              (len(sa.shingles) + len(sb.shingles) -
               len(list_filter(sa.shingles,
                   s -> list_contains(sb.shingles, s)))) >= 0.5),
    edges AS (SELECT id_a AS n, id_b AS m FROM pairs
              UNION ALL
              SELECT id_b AS n, id_a AS m FROM pairs),
    reach(id, label) AS (
        SELECT n, n FROM edges
        UNION
        SELECT e.n, r.label FROM edges e JOIN reach r ON r.id = e.m),
    comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
    tok AS (SELECT doc_id, list_distinct(toks) AS t FROM d),
    member AS (SELECT c.id AS doc_id, c.component, t.t, len(t.t) AS sz
               FROM comp c JOIN tok t ON t.doc_id = c.id),
    exact AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_filter(a.t, x -> list_contains(b.t, x))) * 1.0 /
               (a.sz + b.sz -
                len(list_filter(a.t, x -> list_contains(b.t, x)))) AS j
        FROM member a JOIN member b ON a.component = b.component
        WHERE a.doc_id < b.doc_id),
    q AS (SELECT id_a, id_b, round(j, 6) AS j FROM exact WHERE j >= 0.9)
    SELECT round(j, 2) AS sim_bucket,
           count(*) AS n_pairs,
           min(id_a) AS min_id_a,
           max(id_b) AS max_id_b
    FROM q GROUP BY round(j, 2)
    """,
)
def dedup_cluster_exact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-then-exact-join (r7): exact token-Jaccard >= 0.9 pairs
    restricted to MinHash-LSH duplicate clusters (cluster_threshold
    0.5) — the prescribed mitigation for corpora where the corpus-wide
    exact SSJoin goes quadratic (see dedup_exact_jaccard_prefix and
    operators/dedup.cluster_exact_join). The exact join shuffles on the
    CLUSTER id, so its cost follows the true duplicate structure.
    Output is bucketed by rounded similarity (counts are integer-exact
    across engines; the raw pair list is the quadratic TRUE output on
    this templated corpus and needs no per-row hash check to prove the
    plan)."""
    docs = spread(load(spark, "documents", sf_dir))
    pairs = D.cluster_exact_join(docs, threshold=0.9,
                                 cluster_threshold=0.5, bands=4, rows=2)
    return pairs.groupBy(
        F.round("jaccard_sim", 2).alias("sim_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("id_a").alias("min_id_a"),
        F.max("id_b").alias("max_id_b"),
    )


def segmented_cumsum(d: DataFrame, seg_col: str, order_col: str,
                     val_col: str) -> DataFrame:
    """Two-phase segmented prefix-sum: the global running total of
    ``val_col`` in (``seg_col`` DESC, ``order_col`` ASC) order WITHOUT a
    global ordered window (which serializes on one task at scale).
    Phase 1 prefixes per-segment sums over the segment-count-sized
    table (broadcast back); phase 2 runs segment-partitioned per-row
    cumsums in parallel; cum = segment base + in-segment running sum.
    Returns ``d`` plus a ``cum`` column (overwriting any existing
    ``cum`` — the one reserved output name; internals are
    __seg_-prefixed so caller columns can't collide). Property-tested
    against the naive global cumsum in tests/test_properties.py."""
    from pyspark.sql import Window

    seg_net = d.groupBy(seg_col).agg(F.sum(val_col).alias("__seg_net"))
    w_b = Window.orderBy(col(seg_col).desc()).rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = seg_net.select(
        seg_col,
        F.coalesce(F.sum("__seg_net").over(w_b), F.lit(0))
        .alias("__seg_base"),
    )
    w_in = Window.partitionBy(seg_col).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0)
    return (
        d.withColumn("__seg_run", F.sum(val_col).over(w_in))
        .join(F.broadcast(offsets), seg_col)
        .withColumn("cum", col("__seg_base") + col("__seg_run"))
        .drop("__seg_run", "__seg_base")
    )


@query(
    "llm_budget_selection",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
    q AS (
        SELECT doc_id, len(toks) AS n_toks,
               CAST(floor((
                 0.4 * least((len(list_filter(toks,
                       t -> list_contains({_ALL_STOP_SQL}, t)))
                       / len(toks)) * 5, 1.0)
               + 0.3 * least((list_sum(list_transform(toks,
                       t -> length(t))) / len(toks)) / 8, 1.0)
               + 0.3 * (1 - least((length(regexp_replace(text,
                       '[^0-9]', '', 'g')) / length(text)) * 10, 1.0))
               ) * 1000) AS BIGINT) AS qb
        FROM d),
    c AS (SELECT *, sum(n_toks) OVER (ORDER BY qb DESC, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS cum
          FROM q)
    SELECT count(*) AS n_selected,
           sum(n_toks)::BIGINT AS tokens_selected,
           min(qb) AS min_quality_bucket
    FROM c WHERE cum <= 20000
    """,
)
def llm_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: admit documents best-quality-first
    until a 20k-token training budget is filled — the budgeted-curation
    step between scoring and packing in a data pipeline. Selection needs
    a cumulative token count over the quality-ordered corpus; the naive
    global ordered window serializes, so this reuses the two-phase
    segmented prefix-sum from events_session_concurrency with the
    quality BUCKET (floor(score*1000)) as the coarse segment: per-bucket
    token sums prefix over the ~1000-row bucket table, per-doc cumsums
    run bucket-partitioned in parallel, and the bucket key doubles as
    the deterministic cross-engine order (integer compare; the oracle
    states the naive single cumsum). The prefix-sum itself lives in
    ``segmented_cumsum`` (shared with the property test, which checks
    it against the naive cumsum)."""
    docs = load(spark, "documents", sf_dir)
    d = docs.select(
        "doc_id",
        T.token_count("text").alias("n_toks"),
        F.floor(T.quality_score("text") * 1000).cast("long").alias("qb"),
    )
    cum = segmented_cumsum(d, "qb", "doc_id", "n_toks")
    return cum.filter(col("cum") <= 20000).agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("n_toks").alias("tokens_selected"),
        F.min("qb").alias("min_quality_bucket"),
    )


@query(
    "text_udtf_sentences",
    oracle="""
    WITH sent AS (
        SELECT lang,
               unnest(regexp_split_to_array(text, '[.!?]+[ \t\n\f\r]+'))
               AS sentence
        FROM documents WHERE doc_id % 5 = 0
    ), tok AS (
        SELECT lang,
               length(regexp_extract_all(sentence, '[^ \t\n\f\r]+')) AS nt
        FROM sent
    )
    SELECT lang,
           count(*) AS n_sentences,
           sum(nt)::BIGINT AS total_tokens,
           round(avg(nt), 4) AS avg_tokens
    FROM tok WHERE nt > 0
    GROUP BY lang
    """,
)
def text_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation through a Python UDTF in a LATERAL join
    (r8 — completes the SURVEY §2.8 engine-native UDF surface: the
    row-expanding table-function shape, alongside the existing pandas
    UDF / GROUPED_AGG / applyInPandas / mapInPandas queries). One doc
    row fans out to N sentence rows inside the FROM clause; the
    expansion is map-side (no shuffle until the per-language aggregate,
    which partial-aggregates). Arrow-batched; like the other
    Python-path demos, runs on a 20% systematic sample (doc_id % 5 = 0,
    restated in the oracle). The RE2-safe splitting contract lives in
    ``operators.text.sentence_udtf``."""
    docs = load(spark, "documents", sf_dir).filter(col("doc_id") % 5 == 0)
    spark.udtf.register("split_sentences", T.sentence_udtf())
    docs.select("lang", "text").createOrReplaceTempView("docs_udtf_in")
    out = spark.sql("""
        SELECT d.lang, s.n_tokens
        FROM docs_udtf_in d, LATERAL split_sentences(d.text) s
    """)
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sentences"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


@query(
    "text_minhash_content_defined",
    oracle=f"""
    WITH d AS (SELECT doc_id, source,
                      array_to_string({_TOKS}, ' ') AS s
               FROM documents),
    b AS (SELECT doc_id, source, s, length(s) AS n,
                 CASE WHEN length(s) >= 8 THEN
                     list_filter(
                         generate_series(1, length(s) - 7),
                         i -> ('0x' || substring(md5(substring(s, i, 8)),
                               1, 15))::BIGINT % 64 = 0)
                 ELSE [] END AS bs
          FROM d),
    cu AS (SELECT doc_id, source, s,
                  list_prepend(0, list_sort(list_distinct(
                      list_append(list_transform(bs, i -> i + 7), n))))
                  AS cuts
           FROM b),
    ch AS (SELECT doc_id, source,
                  unnest(list_transform(
                      generate_series(1, len(cuts) - 1),
                      j -> ('0x' || substring(md5(substring(
                            s, cuts[j] + 1, cuts[j + 1] - cuts[j])),
                            1, 15))::BIGINT)) AS h
           FROM cu),
    pd AS (SELECT doc_id, source, count(*) AS n_chunks, min(h) AS min_h
           FROM ch GROUP BY doc_id, source)
    SELECT pd.source,
           count(*) AS n_docs,
           CAST(sum(pd.n_chunks) AS BIGINT) AS total_chunks,
           (SELECT count(DISTINCT h) FROM ch
            WHERE ch.source = pd.source) AS distinct_chunks,
           count(DISTINCT pd.min_h) AS distinct_min_chunk
    FROM pd GROUP BY pd.source
    """,
)
def text_minhash_content_defined(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """Content-defined chunk fingerprints (r9): rolling-hash chunking
    (boundary where the k-gram hash = 0 mod 64) + per-chunk hashes —
    sub-document dedup for shared boilerplate that survives insertions,
    plus a 1-permutation minhash of each doc's chunk SET (its minimum
    chunk hash) as the doc-level near-dup candidate key. Per-source
    stats: docs, chunks, distinct chunk hashes (corpus-level chunk dedup
    potential), distinct min-chunk values (doc-level candidate buckets).
    Map-only chunking (operators/text.py cdc_chunk_hashes — one HOF
    filter + transform per row, no UDF, no shuffle) followed by one
    explode and two keyed aggregations; scales by total text bytes."""
    docs = spread(load(spark, "documents", sf_dir))
    ch = docs.select(
        "doc_id", "source",
        F.explode(T.cdc_chunk_hashes("text")).alias("h"),
    )
    per_doc = ch.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.min("h").alias("min_h"),
    )
    per_doc_stats = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chunks").alias("total_chunks"),
        F.countDistinct("min_h").alias("distinct_min_chunk"),
    )
    chunk_stats = ch.groupBy("source").agg(
        F.countDistinct("h").alias("distinct_chunks"),
    )
    return per_doc_stats.join(chunk_stats, "source").select(
        "source", "n_docs", "total_chunks",
        "distinct_chunks", "distinct_min_chunk",
    )


@query(
    "text_cdc_clamped_chunks",
    oracle=f"""
    WITH d AS (SELECT doc_id, source,
                      array_to_string({_TOKS}, ' ') AS s
               FROM documents),
    b AS (SELECT doc_id, source, s, length(s) AS n,
                 CASE WHEN length(s) >= 8 THEN
                     list_filter(
                         generate_series(1, length(s) - 7),
                         i -> ('0x' || substring(md5(substring(s, i, 8)),
                               1, 15))::BIGINT % 64 = 0)
                 ELSE [] END AS bs
          FROM d),
    cu AS (SELECT doc_id, source, s, n,
                  list_prepend(0, list_sort(list_distinct(
                      list_append(list_transform(bs, i -> i + 7), n))))
                  AS cuts0
           FROM b),
    mn AS (SELECT doc_id, source, s, n,
                  CASE WHEN n > 0 THEN
                      list_reduce(
                          list_prepend([0], list_transform(cuts0[2:],
                                                           c -> [c])),
                          (acc, x) -> CASE
                              WHEN x[1] - acc[len(acc)] >= 24
                              THEN list_append(acc, x[1]) ELSE acc END)
                  ELSE [0] END AS kept0
           FROM cu),
    mk AS (SELECT doc_id, source, s, n,
                  CASE WHEN kept0[len(kept0)] = n THEN kept0
                       ELSE list_append(kept0, n) END AS kept
           FROM mn),
    mx AS (SELECT doc_id, source, s,
                  list_sort(list_concat(kept, flatten(list_transform(
                      generate_series(1, len(kept) - 1),
                      j -> CASE WHEN kept[j + 1] - kept[j] > 120
                           THEN generate_series(kept[j] + 120,
                                                kept[j + 1] - 1, 120)
                           ELSE [] END)))) AS cuts
           FROM mk),
    ch AS (SELECT doc_id, source,
                  unnest(list_transform(
                      generate_series(1, len(cuts) - 1),
                      j -> struct_pack(
                          h := ('0x' || substring(md5(substring(
                               s, cuts[j] + 1, cuts[j + 1] - cuts[j])),
                               1, 15))::BIGINT,
                          l := cuts[j + 1] - cuts[j])
                  ), recursive := true)
           FROM mx),
    pd AS (SELECT doc_id, source, count(*) AS n_chunks,
                  max(l) AS max_l
           FROM ch GROUP BY doc_id, source)
    SELECT pd.source,
           count(*) AS n_docs,
           CAST(sum(pd.n_chunks) AS BIGINT) AS total_chunks,
           (SELECT count(DISTINCT h) FROM ch
            WHERE ch.source = pd.source) AS distinct_chunks,
           CAST(max(pd.max_l) AS BIGINT) AS max_chunk_len
    FROM pd GROUP BY pd.source
    """,
)
def text_cdc_clamped_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FastCDC-style CLAMPED content-defined chunking (r9): the plain CDC
    rule (k-gram hash = 0 mod 64) with min_len=24 (skip cuts too close
    to the previous kept cut) and max_len=120 (force cuts inside
    over-long gaps) — the production regime, where chunk sizes are
    bounded on BOTH ends regardless of content (boundary-dense or
    boundary-free). The oracle recomputes the full pipeline —
    candidates, min-fold (``list_reduce``), forced-cut injection — in
    DuckDB, and ``max_chunk_len`` structurally proves the max clamp
    (must be <= 120 for every doc). Same map-only shape as the
    unclamped query: the clamps are folds over the per-doc candidate
    array, no extra shuffle.

    r12: ONE cut derivation instead of three. The hashes frame was
    re-derived by both consumers (per-doc counts and the per-source
    distinct, different groupBy keys — no exchange to reuse) and the
    max-clamp witness derived cuts a third time via cdc_chunk_lengths;
    each derivation pays the per-character rolling-md5 boundary scan.
    Now cdc_chunk_spans (hash + span, 1:1 with cdc_chunk_hashes by
    construction: same cuts, same md5) is computed once; the per-doc
    stats (n_chunks, max chunk length = cend - cstart) are folded
    MAP-SIDE from the array before a single posexplode, and the
    doc-level sums ride the pos==0 row of each doc so one groupBy
    yields every output column. A chunkless doc emits no rows —
    exactly the old explode/oracle behavior."""
    docs = spread(load(spark, "documents", sf_dir))
    withc = docs.select(
        "source",
        T.cdc_chunk_spans("text", min_len=24, max_len=120).alias("cs"),
    )
    rows = withc.select(
        "source",
        F.size("cs").alias("n_chunks"),
        F.array_max(
            F.transform("cs", lambda c: c["cend"] - c["cstart"])
        ).alias("max_l"),
        F.posexplode("cs").alias("pos", "c"),
    ).withColumn("h", F.col("c")["h"]).drop("c")
    return (
        rows.groupBy("source").agg(
            F.count(F.when(F.col("pos") == 0, 1)).alias("n_docs"),
            F.sum(F.when(F.col("pos") == 0, F.col("n_chunks")))
            .alias("total_chunks"),
            F.countDistinct("h").alias("distinct_chunks"),
            F.max("max_l").cast("long").alias("max_chunk_len"),
        )
        .select("source", "n_docs", "total_chunks",
                "distinct_chunks", "max_chunk_len")
    )


@query(
    "dedup_cdc_chunk_overlap",
    oracle=f"""
    WITH d AS (SELECT doc_id, source,
                      array_to_string({_TOKS}, ' ') AS s
               FROM documents),
    b AS (SELECT doc_id, source, s, length(s) AS n,
                 CASE WHEN length(s) >= 8 THEN
                     list_filter(
                         generate_series(1, length(s) - 7),
                         i -> ('0x' || substring(md5(substring(s, i, 8)),
                               1, 15))::BIGINT % 64 = 0)
                 ELSE [] END AS bs
          FROM d),
    cu AS (SELECT doc_id, source, s,
                  list_prepend(0, list_sort(list_distinct(
                      list_append(list_transform(bs, i -> i + 7), n))))
                  AS cuts
           FROM b),
    ch AS (SELECT doc_id, source,
                  unnest(list_transform(
                      generate_series(1, len(cuts) - 1),
                      j -> ('0x' || substring(md5(substring(
                            s, cuts[j] + 1, cuts[j + 1] - cuts[j])),
                            1, 15))::BIGINT)) AS h
           FROM cu),
    fo AS (SELECT h, min(doc_id) AS first_doc FROM ch GROUP BY h),
    pd AS (SELECT ch.doc_id, ch.source,
                  count(*) AS n_chunks,
                  sum(CASE WHEN fo.first_doc < ch.doc_id
                      THEN 1 ELSE 0 END)::BIGINT AS shared
           FROM ch JOIN fo USING (h)
           GROUP BY ch.doc_id, ch.source),
    bo AS (SELECT source, count(*) AS n_boiler_hashes
           FROM (SELECT ch.source, ch.h
                 FROM ch GROUP BY ch.source, ch.h
                 HAVING count(DISTINCT ch.doc_id) >= 2)
           GROUP BY source)
    SELECT pd.source,
           count(*) AS n_docs,
           sum(CASE WHEN pd.shared > 0.5 * pd.n_chunks
               THEN 1 ELSE 0 END)::BIGINT AS n_dups,
           sum(CASE WHEN pd.shared > 0.5 * pd.n_chunks
               THEN 0 ELSE 1 END)::BIGINT AS n_survivors,
           round(avg(pd.shared / pd.n_chunks), 4) AS avg_share,
           CAST(sum(pd.shared) AS BIGINT) AS total_shared,
           coalesce(max(bo.n_boiler_hashes), 0)::BIGINT
               AS n_boiler_hashes
    FROM pd LEFT JOIN bo USING (source)
    GROUP BY pd.source
    """,
)
def dedup_cdc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document near-dup removal on content-defined chunks (r10,
    VERDICT r9 next-round #5): every doc's CDC chunk hashes are
    attributed to their earliest owner; a doc sharing >50% of its chunk
    instances with earlier docs is flagged a duplicate — the
    insertion-robust analog of ``text_dup_passage_fraction`` (CDC
    boundaries survive prepended/edited content where fixed blocks
    shift). Per-source survivor report plus the boilerplate-span
    signal: how many chunk hashes recur across >= 2 docs of the source.

    Scale shape (operators/dedup.py cdc_chunk_overlap): map-only
    chunking, one map-side-combined groupBy on the uniform chunk hash +
    one AQE-skew-safe hash join back, one groupBy per doc — linear in
    text bytes, never all-pairs; the boilerplate count is one extra
    keyed aggregation at (source, hash) grain.

    r12 negative result (recorded in OPTIMIZATION_r12.md): a
    shared-chunk-frame rewrite (boilerplate count aggregated off the
    first-owner join's output, betting on AQE exchange reuse) measured
    2.0 -> 5.1 s warm and was REVERTED — the small first-owner side
    broadcasts, so the probe side has NO exchange to reuse and each
    consuming branch re-derives the rolling-md5 chunking map-side."""
    docs = spread(load(spark, "documents", sf_dir))
    per_doc = D.cdc_chunk_overlap(docs, threshold=0.5)
    with_src = per_doc.join(docs.select("doc_id", "source"), "doc_id")
    chunks = docs.select(
        "doc_id", "source",
        F.explode(T.cdc_chunk_hashes("text")).alias("h"),
    )
    boiler = (
        chunks.groupBy("source", "h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(col("nd") >= 2)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_boiler_hashes"))
    )
    return (
        with_src.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(col("is_dup"), 1).otherwise(0))
            .cast("long").alias("n_dups"),
            F.sum(F.when(col("is_dup"), 0).otherwise(1))
            .cast("long").alias("n_survivors"),
            F.round(F.avg("share_frac"), 4).alias("avg_share"),
            F.sum("shared_chunks").alias("total_shared"),
        )
        .join(boiler, "source", "left")
        .withColumn(
            "n_boiler_hashes",
            F.coalesce(col("n_boiler_hashes"), F.lit(0)).cast("long"))
        .select("source", "n_docs", "n_dups", "n_survivors",
                "avg_share", "total_shared", "n_boiler_hashes")
    )


def _recall_curve_block(np_: int) -> str:
    """One nprobe point of the recall/cost oracle: scalar-subquery shaped
    so a zero-overlap probe still yields its row (a JOIN-then-COUNT
    aggregate would lose it)."""
    probed = (f"(SELECT cid FROM qrank WHERE r <= {np_})")
    dot_aq = _DOT.format(a="a.nv", b="q0.q_nv")
    return f"""
    SELECT {np_}::BIGINT AS nprobe,
           (SELECT count(*) FROM assigned a
            WHERE a.vec_id != 0 AND a.cid IN {probed})::BIGINT
               AS n_candidates,
           h.n_hits,
           round(h.n_hits / 10.0, 2) AS recall
    FROM (SELECT count(*)::BIGINT AS n_hits
          FROM exact JOIN (
              SELECT a.vec_id FROM assigned a, q0
              WHERE a.vec_id != 0 AND a.cid IN {probed}
              ORDER BY {dot_aq} DESC, a.vec_id LIMIT 10) ivf
          USING (vec_id)) h
    """


@query(
    "sim_ivf_recall_multiprobe",
    oracle="""
    WITH n AS (SELECT vec_id, {norm} AS nv FROM embeddings),
    q0 AS (SELECT nv AS q_nv FROM n WHERE vec_id = 0),
    exact AS (SELECT n.vec_id FROM n, q0 WHERE n.vec_id != 0
              ORDER BY {dot_nq} DESC, n.vec_id LIMIT 10),
    c AS (SELECT vec_id AS cid, nv AS cv FROM n
          WHERE vec_id IN ({seeds})),
    scored AS (SELECT n.vec_id, n.nv, c.cid, {dot_nc} AS dotc
               FROM n CROSS JOIN c),
    assigned AS (SELECT vec_id, nv, cid FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY dotc DESC, cid) AS rn
        FROM scored) WHERE rn = 1),
    qrank AS (SELECT c.cid, row_number() OVER (
                  ORDER BY {dot_qc} DESC, c.cid) AS r
              FROM c, q0)
    SELECT * FROM ({blocks}) ORDER BY nprobe
    """.format(
        norm=_norm_sql("embedding"),
        seeds=_IVF_SEEDS_SQL,
        dot_nq=_DOT.format(a="n.nv", b="q0.q_nv"),
        dot_nc=_DOT.format(a="n.nv", b="c.cv"),
        dot_qc=_DOT.format(a="q0.q_nv", b="c.cv"),
        blocks=" UNION ALL ".join(
            _recall_curve_block(np_) for np_ in (1, 2, 4)),
    ),
)
def sim_ivf_recall_multiprobe(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """The multiprobe recall/cost curve (r10, VERDICT r9 What's-wrong
    #3): recall@10 of the IVF probe at nprobe in (1, 2, 4) against the
    exact brute-force top-10, with the candidate count each width scans
    — THE tuning table a 100 TB ANN user reads (recall rises toward
    exact as probed cells grow ~linearly in cost). Assignment computed
    once and shared across widths; each width's candidate set is the
    partition-pruned scan shape. Complements ``sim_ivf_recall`` (the
    single nprobe=1 point) and ``sim_ann_ivf_multiprobe`` (the nprobe=3
    result set without a recall readout)."""
    emb = load(spark, "embeddings", sf_dir)
    return S.ivf_recall_curve(
        emb, query_id=0, centroid_ids=_IVF_SEEDS, k=10, nprobes=(1, 2, 4)
    ).orderBy("nprobe")


@query(
    "dedup_cdc_boilerplate_spans",
    oracle=f"""
    WITH d AS (SELECT doc_id, source,
                      array_to_string({_TOKS}, ' ') AS s
               FROM documents),
    b AS (SELECT doc_id, source, s, length(s) AS n,
                 CASE WHEN length(s) >= 8 THEN
                     list_filter(
                         generate_series(1, length(s) - 7),
                         i -> ('0x' || substring(md5(substring(s, i, 8)),
                               1, 15))::BIGINT % 64 = 0)
                 ELSE [] END AS bs
          FROM d),
    cu AS (SELECT doc_id, source, s,
                  list_prepend(0, list_sort(list_distinct(
                      list_append(list_transform(bs, i -> i + 7), n))))
                  AS cuts
           FROM b),
    ch AS (SELECT doc_id, source,
                  unnest(list_transform(
                      generate_series(1, len(cuts) - 1),
                      j -> struct_pack(
                          h := ('0x' || substring(md5(substring(
                               s, cuts[j] + 1, cuts[j + 1] - cuts[j])),
                               1, 15))::BIGINT,
                          cstart := cuts[j],
                          cend := cuts[j + 1])), recursive := true)
           FROM cu),
    fo AS (SELECT h, min(doc_id) AS first_doc FROM ch GROUP BY h),
    sh AS (SELECT ch.* FROM ch JOIN fo USING (h)
           WHERE fo.first_doc < ch.doc_id)
    SELECT doc_id, source,
           count(*) AS n_spans,
           sum(cend - cstart)::BIGINT AS boiler_chars,
           min(cstart) AS first_start,
           arg_min(cend, cstart) AS first_end
    FROM sh GROUP BY doc_id, source
    ORDER BY boiler_chars DESC, doc_id LIMIT 20
    """,
)
def dedup_cdc_boilerplate_spans(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """The boilerplate-SPAN report (r10, completing VERDICT r9 #5's
    "survivor + boilerplate-span report"): for the 20 docs carrying the
    most repeated bytes, WHERE the repeats sit — count of shared CDC
    spans, total shared characters, and the first shared span's
    character range — so a cleaning pipeline can excise the repeated
    region instead of dropping the document. Insertion-robust by
    construction (CDC boundaries are content-local). Scale shape:
    operators/dedup.py cdc_boilerplate_spans — map-only span extraction,
    one uniform-key groupBy + join back, one per-doc agg, TakeOrdered 20."""
    docs = spread(load(spark, "documents", sf_dir))
    per = D.cdc_boilerplate_spans(docs)
    return (
        per.join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "n_spans", "boiler_chars",
                "first_start", "first_end")
        .orderBy(col("boiler_chars").desc(), "doc_id")
        .limit(20)
    )


@query(
    "text_excise_boilerplate",
    oracle=f"""
    WITH d AS (SELECT doc_id, source,
                      array_to_string({_TOKS}, ' ') AS s
               FROM documents),
    b AS (SELECT doc_id, source, s, length(s) AS n,
                 CASE WHEN length(s) >= 8 THEN
                     list_filter(
                         generate_series(1, length(s) - 7),
                         i -> ('0x' || substring(md5(substring(s, i, 8)),
                               1, 15))::BIGINT % 64 = 0)
                 ELSE [] END AS bs
          FROM d),
    cu AS (SELECT doc_id, source, s,
                  list_prepend(0, list_sort(list_distinct(
                      list_append(list_transform(bs, i -> i + 7), n))))
                  AS cuts
           FROM b),
    ch AS (SELECT doc_id, source, s,
                  unnest(list_transform(
                      generate_series(1, len(cuts) - 1),
                      j -> struct_pack(
                          h := ('0x' || substring(md5(substring(
                               s, cuts[j] + 1, cuts[j + 1] - cuts[j])),
                               1, 15))::BIGINT,
                          cstart := cuts[j],
                          cend := cuts[j + 1])), recursive := true)
           FROM cu),
    fo AS (SELECT h, min(doc_id) AS first_doc FROM ch GROUP BY h),
    mk AS (SELECT ch.doc_id, ch.source, ch.s, ch.cstart, ch.cend,
                  (fo.first_doc < ch.doc_id) AS cut
           FROM ch JOIN fo USING (h)),
    agg AS (SELECT doc_id, source,
                   count(*)::BIGINT AS n_chunks,
                   sum(CASE WHEN cut THEN 1 ELSE 0 END)::BIGINT
                       AS excised_spans,
                   sum(CASE WHEN cut THEN cend - cstart ELSE 0 END)
                       ::BIGINT AS excised_chars,
                   string_agg(
                       CASE WHEN cut THEN ''
                       ELSE substring(s, cstart + 1, cend - cstart) END,
                       '' ORDER BY cstart) AS clean_text
            FROM mk GROUP BY doc_id, source)
    SELECT doc_id, source, n_chunks, excised_spans, excised_chars,
           length(clean_text)::BIGINT AS clean_chars,
           md5(clean_text) AS clean_md5
    FROM agg
    WHERE excised_spans * 2 <= n_chunks
    ORDER BY excised_chars DESC, doc_id
    LIMIT 20
    """,
)
def text_excise_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaned-corpus SURVIVORS (r11, VERDICT r10 Next-round #4 —
    the excision action dedup_cdc_boilerplate_spans only reported):
    docs sharing >50% of their CDC chunk instances with earlier docs
    are dropped (the ``cdc_chunk_overlap`` duplicate rule); every
    surviving doc is kept with its shared spans CUT OUT, so exactly one
    copy of each repeated region remains corpus-wide. Top-20 survivors
    by excised bytes, with md5(clean_text) proving the splice
    end-to-end against the oracle's independent string_agg rebuild.

    Scale shape (operators/dedup.py cdc_excise_boilerplate): the text
    NEVER shuffles — only chunk hashes and span ints move through the
    one uniform-key groupBy + join back; the splice is an F.aggregate
    fold in the map stage that already holds the doc row. The survivor
    gate reuses the same cut list (excised = shared chunk instances),
    so no second chunking pass. r12: the denominator (n_chunks) now
    rides the operator's own map stage, deleting this query's separate
    chunking frame and its join (guide §2.1); only the source label is
    still joined in (a 2-column scan, no chunking)."""
    docs = spread(load(spark, "documents", sf_dir))
    cleaned = D.cdc_excise_boilerplate(docs)
    return (
        cleaned.join(docs.select("doc_id", "source"), "doc_id")
        .filter(col("excised_spans") * 2 <= col("n_chunks"))
        .select(
            "doc_id", "source", "n_chunks", "excised_spans",
            "excised_chars",
            col("clean_chars"),
            F.md5("clean_text").alias("clean_md5"),
        )
        .orderBy(col("excised_chars").desc(), "doc_id")
        .limit(20)
    )


@query(
    "dedup_cdc_incremental_ingest",
    oracle=f"""
    WITH d AS (SELECT doc_id, source,
                      array_to_string({_TOKS}, ' ') AS s
               FROM documents),
    b AS (SELECT doc_id, source, s, length(s) AS n,
                 CASE WHEN length(s) >= 8 THEN
                     list_filter(
                         generate_series(1, length(s) - 7),
                         i -> ('0x' || substring(md5(substring(s, i, 8)),
                               1, 15))::BIGINT % 64 = 0)
                 ELSE [] END AS bs
          FROM d),
    cu AS (SELECT doc_id, source, s,
                  list_prepend(0, list_sort(list_distinct(
                      list_append(list_transform(bs, i -> i + 7), n))))
                  AS cuts
           FROM b),
    ch AS (SELECT doc_id, source,
                  unnest(list_transform(
                      generate_series(1, len(cuts) - 1),
                      j -> ('0x' || substring(md5(substring(
                            s, cuts[j] + 1, cuts[j + 1] - cuts[j])),
                            1, 15))::BIGINT)) AS h
           FROM cu),
    ci AS (SELECT DISTINCT h FROM ch WHERE doc_id % 5 <> 0),
    pd AS (SELECT ch.doc_id, ch.source,
                  count(*) AS n_chunks,
                  sum(CASE WHEN ci.h IS NULL THEN 0 ELSE 1 END)::BIGINT
                      AS corpus_chunks
           FROM ch LEFT JOIN ci USING (h)
           WHERE ch.doc_id % 5 = 0
           GROUP BY ch.doc_id, ch.source)
    SELECT source,
           count(*) AS n_batch_docs,
           sum(CASE WHEN corpus_chunks > 0.5 * n_chunks
               THEN 1 ELSE 0 END)::BIGINT AS n_dups,
           round(avg(corpus_chunks * 1.0 / n_chunks), 4) AS avg_share,
           CAST(sum(corpus_chunks) AS BIGINT) AS total_corpus_chunks
    FROM pd GROUP BY source
    """,
)
def dedup_cdc_incremental_ingest(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """Incremental SUB-DOCUMENT dedup at the ingest gate (r10): the 20%
    "new batch" (doc_id%5=0) chunked and semi-joined against the 80%
    corpus's DISTINCT-chunk index — the insertion-robust sibling of
    ``dedup_incremental_ingest`` (shingle-LSH flags whole-doc
    near-dups; CDC chunks flag copied REGIONS even inside otherwise-new
    docs). Per-source ingest report. Scale shape
    (operators/dedup.py cdc_chunks_against_corpus): the corpus side is
    a stored distinct-hash index (one long per unique chunk), so each
    ingest pays batch-proportional cost — map-only chunking, one
    uniform-key semi-join, one per-doc agg."""
    docs = spread(load(spark, "documents", sf_dir))
    batch = docs.filter(col("doc_id") % 5 == 0)
    corpus = docs.filter(col("doc_id") % 5 != 0)
    per = D.cdc_chunks_against_corpus(batch, corpus, threshold=0.5)
    return (
        per.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_batch_docs"),
            F.sum(F.when(col("is_dup"), 1).otherwise(0))
            .cast("long").alias("n_dups"),
            F.round(F.avg("share_frac"), 4).alias("avg_share"),
            F.sum("corpus_chunks").alias("total_corpus_chunks"),
        )
    )


def _lsh_recall_block(p: int) -> str:
    """One plane-count point of the LSH recall/cost oracle (prefix of
    the 8-plane signature = the p-plane bucket)."""
    dot_eq = _DOT.format(a="e.nv", b="q0.q_nv")
    return f"""
    SELECT {p}::BIGINT AS planes,
           (SELECT count(*) FROM b e, qb
            WHERE e.vec_id != 0
              AND left(e.b8, {p}) = left(qb.q_b8, {p}))::BIGINT
               AS n_candidates,
           h.n_hits,
           round(h.n_hits / 10.0, 2) AS recall
    FROM (SELECT count(*)::BIGINT AS n_hits
          FROM exact JOIN (
              SELECT e.vec_id FROM b e, qb, q0
              WHERE e.vec_id != 0
                AND left(e.b8, {p}) = left(qb.q_b8, {p})
              ORDER BY {dot_eq} DESC, e.vec_id LIMIT 10) lsh
          USING (vec_id)) h
    """


@query(
    "sim_lsh_recall_curve",
    oracle="""
    WITH b AS (SELECT vec_id, {norm} AS nv, {bucket} AS b8
               FROM embeddings),
    q0 AS (SELECT nv AS q_nv FROM b WHERE vec_id = 0),
    qb AS (SELECT b8 AS q_b8 FROM b WHERE vec_id = 0),
    exact AS (SELECT e.vec_id FROM b e, q0 WHERE e.vec_id != 0
              ORDER BY {dot_eq} DESC, e.vec_id LIMIT 10)
    SELECT * FROM ({blocks}) ORDER BY planes
    """.format(
        norm=_norm_sql("embedding"),
        bucket=_BUCKET_SQL,
        dot_eq=_DOT.format(a="e.nv", b="q0.q_nv"),
        blocks=" UNION ALL ".join(
            _lsh_recall_block(p) for p in (1, 2, 4)),
    ),
)
def sim_lsh_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH-bucket recall/cost curve (r10, the hyperplane analog of
    ``sim_ivf_recall_multiprobe``): recall@10 of the bucket probe at 1,
    2 and 4 planes vs the exact top-10, with the candidate count each
    width scans. PLANES is the LSH knob (fewer planes = bigger buckets
    = higher recall at higher cost — the mirror image of IVF nprobe);
    a p-plane bucket is the PREFIX of the full signature, so the
    signature computes once and every width probes by prefix match.
    Plane counts are sized to this synthetic table (near-uniform
    vectors, ~1k at sf0.01: measured recall 0.8/0.3/0.0 for 254/131/42
    candidates — 8 planes, the near-dup default, measures 0.0 here,
    which is exactly what the curve exists to expose); production sizes
    planes ~ log4(N) and regains recall via multiprobe. At scale the
    signature is the ingest-time partition column and each width is a
    partition-pruned scan."""
    emb = load(spark, "embeddings", sf_dir)
    return S.lsh_recall_curve(
        emb, query_id=0, k=10, planes_list=(1, 2, 4)
    ).orderBy("planes")


def _lsh_multiprobe_block(r: int) -> str:
    """One radius point of the multiprobe oracle. The probe SET (query
    bucket + every signature within Hamming distance r) is restated as
    a direct Hamming-distance predicate — same candidate set."""
    ham = ("len(list_filter(generate_series(1, 8), "
           "i -> substr(e.b8, i, 1) <> substr(qb.q_b8, i, 1)))")
    dot_eq = _DOT.format(a="e.nv", b="q0.q_nv")
    return f"""
    SELECT 8::BIGINT AS planes, {r}::BIGINT AS radius,
           (SELECT count(*) FROM b e, qb
            WHERE e.vec_id != 0 AND {ham} <= {r})::BIGINT
               AS n_candidates,
           h.n_hits,
           round(h.n_hits / 10.0, 2) AS recall
    FROM (SELECT count(*)::BIGINT AS n_hits
          FROM exact JOIN (
              SELECT e.vec_id FROM b e, qb, q0
              WHERE e.vec_id != 0 AND {ham} <= {r}
              ORDER BY {dot_eq} DESC, e.vec_id LIMIT 10) m
          USING (vec_id)) h
    """


@query(
    "sim_lsh_multiprobe_recall",
    oracle="""
    WITH b AS (SELECT vec_id, {norm} AS nv, {bucket} AS b8
               FROM embeddings),
    q0 AS (SELECT nv AS q_nv FROM b WHERE vec_id = 0),
    qb AS (SELECT b8 AS q_b8 FROM b WHERE vec_id = 0),
    exact AS (SELECT e.vec_id FROM b e, q0 WHERE e.vec_id != 0
              ORDER BY {dot_eq} DESC, e.vec_id LIMIT 10)
    SELECT * FROM ({blocks}) ORDER BY radius
    """.format(
        norm=_norm_sql("embedding"),
        bucket=_BUCKET_SQL,
        dot_eq=_DOT.format(a="e.nv", b="q0.q_nv"),
        blocks=" UNION ALL ".join(
            _lsh_multiprobe_block(r) for r in (0, 1, 2)),
    ),
)
def sim_lsh_multiprobe_recall(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """Multiprobe LSH recall at PRODUCTION plane count (r10, backing the
    sim_lsh_recall_curve docstring's claim): at 8 planes — where the
    single-bucket probe measures recall 0.0 on this table — probing the
    Hamming-adjacent buckets regains recall without shrinking the
    signature: measured 0.0 -> 0.1 -> 0.2 for 3 -> 23 -> 83 candidates
    at radius 0/1/2 (sf0.01). The probe set is 1 + planes + C(planes,2)
    literal partition keys (operators/similarity.py lsh_probe_buckets),
    so at scale each radius stays a partition-pruned scan; the oracle
    restates the set as a Hamming-distance predicate.
    r11: the three radii now come from ONE shared pass
    (similarity.lsh_multiprobe_recall_curve) — the per-radius union
    re-scanned the corpus for the exact top-k and the bucket projection
    at every radius (36 parquet scans / 36 exchanges planned; 6.6 s at
    sf0.1); sharing them and deriving each radius as a ham<=r filter
    over one tagged candidate join cuts the plan to single scans per
    role, row-for-row identical output."""
    emb = load(spark, "embeddings", sf_dir)
    return S.lsh_multiprobe_recall_curve(
        emb, query_id=0, k=10, planes=8, radii=(0, 1, 2)
    ).orderBy("radius")


def _planes_pick_block(p: int, nq: int, k: int) -> str:
    """One plane-count point of the multi-query recall curve oracle:
    candidates by signature prefix, per-query top-k by unrounded dot."""
    return f"""
    SELECT {p}::BIGINT AS planes, {nq}::BIGINT AS n_queries,
           (SELECT count(*) FROM sc
            WHERE left(b8, {p}) = left(q_b8, {p}))::BIGINT
               AS total_candidates,
           (SELECT count(*)
            FROM (SELECT q_id, vec_id FROM (
                      SELECT q_id, vec_id, row_number() OVER (
                          PARTITION BY q_id
                          ORDER BY d DESC, vec_id) AS rn
                      FROM sc
                      WHERE left(b8, {p}) = left(q_b8, {p}))
                  WHERE rn <= {k}) t
            JOIN exact USING (q_id, vec_id))::BIGINT AS n_hits
    """


_PICK_QIDS = (0, 31, 142, 333)
_PICK_TARGET = 0.25


@query(
    "sim_planes_for_recall",
    oracle="""
    WITH b AS (SELECT vec_id, {norm} AS nv, {bucket} AS b8
               FROM embeddings),
    qs AS (SELECT vec_id AS q_id, nv AS q_nv, b8 AS q_b8 FROM b
           WHERE vec_id IN ({qids})),
    sc AS (SELECT qs.q_id, qs.q_b8, e.vec_id, e.b8, {dot_eq} AS d
           FROM b e CROSS JOIN qs WHERE e.vec_id != qs.q_id),
    exact AS (SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id, row_number() OVER (
            PARTITION BY q_id ORDER BY d DESC, vec_id) AS rn
        FROM sc) WHERE rn <= 10),
    curve AS (SELECT planes, n_queries, total_candidates, n_hits,
                     round(n_hits / 40.0, 4) AS mean_recall
              FROM ({blocks})),
    pick AS (SELECT coalesce(
                 max(planes) FILTER (mean_recall >= {target}),
                 (SELECT min(planes) FROM curve)) AS p
             FROM curve)
    SELECT c.planes, c.n_queries, c.total_candidates, c.n_hits,
           c.mean_recall, (c.planes = pick.p) AS picked
    FROM curve c, pick ORDER BY c.planes
    """.format(
        norm=_norm_sql("embedding"),
        bucket=_BUCKET_SQL,
        qids=", ".join(str(q) for q in _PICK_QIDS),
        dot_eq=_DOT.format(a="e.nv", b="qs.q_nv"),
        target=_PICK_TARGET,
        blocks=" UNION ALL ".join(
            _planes_pick_block(p, len(_PICK_QIDS), 10)
            for p in (1, 2, 3, 4)),
    ),
)
def sim_planes_for_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measured curve DRIVING the knob (r11, VERDICT r10 Next-round
    #5): ``planes_for_recall`` runs the multi-query LSH recall curve
    (4 sampled queries x 4 plane counts, one corpus scan serving every
    prefix width) and picks the CHEAPEST setting meeting the recall
    target — the largest plane count (= smallest buckets = fewest
    candidates) whose measured mean recall clears it. At this corpus
    and target 0.25 the curve measures ~0.55/0.30/0.20/0.10 for planes
    1/2/3/4, so the pick is planes=2: NOT the highest-recall setting,
    the cheapest adequate one — exactly the decision semantic_dedup's
    corpus-size heuristic used to guess (operators/similarity.py
    planes_for_recall). Output: the evidence curve with the picked row
    flagged, so the tuning decision is auditable.
    r11 opt: the demo used the collecting helper, which executes the
    curve once for the pick and then AGAIN when the returned frame runs
    (guide §5.1 — no .collect() in query paths); the pick rule
    (largest planes clearing the target, else the smallest) is now a
    window aggregate over the 4 curve rows, so the curve computes once
    and the pick stays in-plan (the shared expression
    operators/similarity.recall_pick_flag — ADVICE r11: also exercised
    verbatim by the parity test). planes_for_recall (the int-returning
    library helper) keeps the collect for callers that need the knob
    value; a unit test pins both to the same rule."""
    emb = load(spark, "embeddings", sf_dir)
    curve = S.lsh_recall_curve_multi(
        emb, list(_PICK_QIDS), k=10, planes_list=(1, 2, 3, 4))
    return (
        curve.withColumn(
            "picked",
            S.recall_pick_flag("planes", _PICK_TARGET, "largest"))
        .orderBy("planes")
    )


def _nprobe_pick_block(np_: int, nq: int, k: int) -> str:
    """One nprobe point of the multi-query IVF recall curve oracle."""
    return f"""
    SELECT {np_}::BIGINT AS nprobe, {nq}::BIGINT AS n_queries,
           (SELECT count(*) FROM sc JOIN qcells qc
            ON sc.q_id = qc.q_id AND sc.cid = qc.cid
            WHERE qc.rk <= {np_})::BIGINT AS total_candidates,
           (SELECT count(*)
            FROM (SELECT q_id, vec_id FROM (
                      SELECT sc.q_id, sc.vec_id, row_number() OVER (
                          PARTITION BY sc.q_id
                          ORDER BY sc.d DESC, sc.vec_id) AS rn
                      FROM sc JOIN qcells qc
                      ON sc.q_id = qc.q_id AND sc.cid = qc.cid
                      WHERE qc.rk <= {np_})
                  WHERE rn <= {k}) t
            JOIN exact USING (q_id, vec_id))::BIGINT AS n_hits
    """


_NPROBE_TARGET = 0.55


@query(
    "sim_nprobe_for_recall",
    oracle="""
    WITH n AS (SELECT vec_id, {norm} AS nv FROM embeddings),
    c AS (SELECT vec_id AS cid, nv AS cv FROM n
          WHERE vec_id IN ({seeds})),
    assigned AS (SELECT vec_id, nv, cid FROM (
        SELECT n.vec_id, n.nv, c.cid, row_number() OVER (
            PARTITION BY n.vec_id
            ORDER BY {dot_nc} DESC, c.cid) AS rn
        FROM n CROSS JOIN c) WHERE rn = 1),
    qs AS (SELECT vec_id AS q_id, nv AS q_nv FROM n
           WHERE vec_id IN ({qids})),
    qcells AS (SELECT qs.q_id, c.cid, row_number() OVER (
                   PARTITION BY qs.q_id
                   ORDER BY {dot_qc} DESC, c.cid) AS rk
               FROM qs CROSS JOIN c),
    sc AS (SELECT qs.q_id, a.vec_id, a.cid, {dot_aq} AS d
           FROM assigned a CROSS JOIN qs WHERE a.vec_id != qs.q_id),
    exact AS (SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id, row_number() OVER (
            PARTITION BY q_id ORDER BY d DESC, vec_id) AS rn
        FROM sc) WHERE rn <= 10),
    curve AS (SELECT nprobe, n_queries, total_candidates, n_hits,
                     round(n_hits / 40.0, 4) AS mean_recall
              FROM ({blocks})),
    pick AS (SELECT coalesce(
                 min(nprobe) FILTER (mean_recall >= {target}),
                 (SELECT max(nprobe) FROM curve)) AS p
             FROM curve)
    SELECT cv.nprobe, cv.n_queries, cv.total_candidates, cv.n_hits,
           cv.mean_recall, (cv.nprobe = pick.p) AS picked
    FROM curve cv, pick ORDER BY cv.nprobe
    """.format(
        norm=_norm_sql("embedding"),
        seeds=_IVF_SEEDS_SQL,
        qids=", ".join(str(q) for q in _PICK_QIDS),
        dot_nc=_DOT.format(a="n.nv", b="c.cv"),
        dot_qc=_DOT.format(a="qs.q_nv", b="c.cv"),
        dot_aq=_DOT.format(a="a.nv", b="qs.q_nv"),
        target=_NPROBE_TARGET,
        blocks=" UNION ALL ".join(
            _nprobe_pick_block(np_, len(_PICK_QIDS), 10)
            for np_ in (1, 2, 4)),
    ),
)
def sim_nprobe_for_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF mirror of ``sim_planes_for_recall`` (r11): the
    multi-query recall curve picks ``nprobe`` — recall RISES with
    probed cells while cost grows ~linearly, so the pick is the
    SMALLEST nprobe whose measured mean recall clears the target
    (operators/similarity.py nprobe_for_recall over
    ivf_recall_curve_multi: one coarse assignment, a QxK broadcast
    cell ranking, one (corpus x Q) scored set filtered per width by a
    broadcast cell list — the partition-pruned-scan shape). Output:
    the evidence curve with the picked row flagged.
    r11 opt: same double-execution cut as ``sim_planes_for_recall`` —
    the pick rule (SMALLEST nprobe clearing the target, else the
    largest) is a window aggregate over the 3 curve rows instead of a
    collect-then-rerun (shared expression
    operators/similarity.recall_pick_flag, ADVICE r11);
    nprobe_for_recall keeps the collecting form for library callers,
    pinned to this rule by a unit test."""
    emb = load(spark, "embeddings", sf_dir)
    curve = S.ivf_recall_curve_multi(
        emb, list(_PICK_QIDS), centroid_ids=list(_IVF_SEEDS),
        k=10, nprobes=(1, 2, 4))
    return (
        curve.withColumn(
            "picked",
            S.recall_pick_flag("nprobe", _NPROBE_TARGET, "smallest"))
        .orderBy("nprobe")
    )
