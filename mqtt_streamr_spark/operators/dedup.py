"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for 100 TB from the start:
- exact dedup is a hash-groupBy on a fingerprint (one shuffle on a uniform
  md5 key — no skew by construction);
- MinHash-LSH turns all-pairs O(n^2) similarity into per-band bucket
  self-joins: shuffle on band keys only, candidates verified with exact
  Jaccard on the (tiny) candidate set;
- signatures are computed as pure Column folds over shingle arrays — no
  UDFs, no driver-side loops, no collect().

Hash family: one md5 per shingle -> 60-bit int h; minhash_i(doc) =
MIN over shingles of (A[i]*h + B[i]) mod P (P = 2^31-1). One expensive
hash pass, num_hashes cheap affine rehashes — the classic a*x+b universal
family. md5 is uniform and identical in Spark and DuckDB, keeping every
stage oracle-checkable; swap md5 for xxhash64 for cheaper production
hashing (same affine family on top).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from mqtt_streamr_spark.operators.text import (
    fingerprint,
    let_bound as _let,
    shingles,
    tokens,
)


MINHASH_PRIME = 2147483647  # 2^31 - 1, Mersenne prime
# Fixed affine-family coefficients, shared verbatim with the DuckDB oracle
# and the hashlib ground-truth tests.
MINHASH_A = [1299721, 15485863, 32452843, 49979687,
             67867967, 86028121, 104395301, 122949823]
MINHASH_B = [373587883, 533000389, 613651349, 694847533,
             776531401, 858599503, 940800361, 1020379013]


def _shingle_hash(s: Column, hash_family: str) -> Column:
    """Non-negative long hash of one shingle, mod P. ``md5`` is the
    oracle-parity family (identical in Spark and DuckDB); ``xxhash64`` is
    the production family — one cheap JVM hash instead of a cryptographic
    digest + hex parse, same affine rehashes on top."""
    if hash_family == "md5":
        return (F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
                .cast("long") % MINHASH_PRIME)
    if hash_family == "xxhash64":
        return F.pmod(F.xxhash64(s), F.lit(MINHASH_PRIME)).cast("long")
    raise ValueError(f"hash_family {hash_family!r} not in md5/xxhash64")


def shingle_hashes(text: Column | str, shingle_n: int = 3,
                   hash_family: str = "md5") -> Column:
    """array<long>: 60-bit-derived hash of each shingle, mod P."""
    return F.transform(
        shingles(text, shingle_n), lambda s: _shingle_hash(s, hash_family)
    )


def minhash_signature(text: Column | str, num_hashes: int = 8,
                      shingle_n: int = 3,
                      hash_family: str = "md5") -> Column:
    """array<long> signature: sig[i] = MIN over shingles of
    (A[i]*h + B[i]) mod P. One base-hash pass per shingle (via the
    let-binding), num_hashes cheap affine rehashes."""
    assert num_hashes <= len(MINHASH_A)
    hs = shingle_hashes(text, shingle_n, hash_family)
    a = F.array(*[F.lit(x) for x in MINHASH_A[:num_hashes]])
    b = F.array(*[F.lit(x) for x in MINHASH_B[:num_hashes]])

    def sig(xs: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.lit(num_hashes)),
            lambda i: F.array_min(
                F.transform(
                    xs,
                    lambda h: (F.element_at(a, i) * h + F.element_at(b, i))
                    % MINHASH_PRIME,
                )
            ),
        )

    return _let(hs, sig)


def lsh_band_keys(text: Column | str, bands: int = 4, rows: int = 2,
                  shingle_n: int = 3, hash_family: str = "md5") -> Column:
    """array<string> of band keys (each the concat of `rows` minhash
    values). Two docs sharing any band key are near-dup candidates;
    P[candidate] follows the (1 - (1 - j^rows)^bands) S-curve. The
    signature is let-bound so it is computed once, not once per band."""
    sig = minhash_signature(text, bands * rows, shingle_n, hash_family)

    def keys(s: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bb: F.concat_ws(
                "|",
                F.concat(F.lit("b"), bb.cast("string")),
                *[
                    F.element_at(s, (bb * rows + r + 1).cast("int"))
                    .cast("string")
                    for r in range(rows)
                ],
            ),
        )

    return _let(sig, keys)


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (post-normalization) docs: fingerprint ->
    keeper (min id) + member count. One shuffle on the md5 key."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def char_ngrams(text: Column | str, n: int = 4) -> Column:
    """Distinct character n-grams of whitespace-normalized lowercase text —
    the classic n-gram-Jaccard dedup representation (finer-grained than word
    shingles; robust to word-boundary edits)."""
    norm = F.array_join(tokens(text), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: norm.substr(i, F.lit(n)))
    )


def jaccard(sh_a: Column, sh_b: Column) -> Column:
    """Exact Jaccard similarity of two shingle arrays."""
    inter = F.size(F.array_intersect(sh_a, sh_b))
    return inter / (F.size(sh_a) + F.size(sh_b) - inter).cast("double")


def near_dup_candidates(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", bands: int = 4,
                        rows: int = 2,
                        hash_family: str = "md5") -> DataFrame:
    """Candidate pairs from LSH buckets: explode band keys, group each
    bucket's member ids, emit every in-bucket pair (id_a < id_b),
    distinct.

    r12 shape (guide §2.1/§2.4): the former bucket SELF-join evaluated
    the md5-minhash signature subtree once per join SIDE — two full
    base-hash passes over the corpus and two copies of the (large)
    signature expression in codegen. One groupBy on the band key +
    array_sort(collect_list) + an in-bucket pair explode derives the
    signatures ONCE and shuffles the same (band_key, id) rows once;
    a doc appears at most once per bucket (the band index is part of
    the key), so i<j over the sorted id array enumerates exactly the
    id_a < id_b pairs the join produced — verified row-identical.

    The band-key shuffle is uniform md5-derived, so no inherent skew;
    a pathological bucket (many identical docs — now a quadratic
    in-bucket explode, exactly the join's fan-out) is bounded by
    exact-dedup running first in a real pipeline."""
    keyed = df.select(
        F.col(id_col),
        F.explode(
            lsh_band_keys(text_col, bands, rows, hash_family=hash_family)
        ).alias("band_key"),
    )
    buckets = (
        keyed.groupBy("band_key")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pair_structs = F.flatten(F.transform(
        F.col("ids"),
        lambda x, i: F.transform(
            F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
        ),
    ))
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def _verified_pairs(df: DataFrame, set_of, text_col: str,
                    id_col: str, threshold: float, bands: int,
                    rows: int, hash_family: str = "md5") -> DataFrame:
    """LSH candidates verified with exact Jaccard >= threshold over
    ``set_of(text)`` (an array-of-elements representation of each doc).

    r12 shape (guide §2.3/§3): the TEXT is attached to the (LSH-bounded)
    candidate pairs and the element sets are computed per PAIR, let-bound
    so each side's set expression evaluates once. The former shape
    computed the set arrays for the WHOLE corpus as the build side of
    each verify join — at scale that shuffles/broadcasts every doc's
    (large) set array twice even when candidates cover a sliver of the
    corpus; now verify cost is genuinely proportional to candidates
    (a doc in k candidate pairs recomputes its set k times — bounded by
    the LSH candidate count, which is the operator's contract)."""
    cands = near_dup_candidates(df, text_col, id_col, bands, rows,
                                hash_family)
    txt = df.select(F.col(id_col), F.col(text_col))
    joined = (
        cands.join(txt.withColumnRenamed(id_col, "id_a")
                   .withColumnRenamed(text_col, "__text_a"), "id_a")
        .join(txt.withColumnRenamed(id_col, "id_b")
              .withColumnRenamed(text_col, "__text_b"), "id_b")
    )
    sim = _let(set_of(F.col("__text_a")),
               lambda sa: _let(set_of(F.col("__text_b")),
                               lambda sb: jaccard(sa, sb)))
    return (
        joined.withColumn("jaccard_sim", sim)
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", F.round("jaccard_sim", 6).alias("jaccard_sim"))
    )


def near_dup_pairs(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", threshold: float = 0.5,
                   bands: int = 4, rows: int = 2,
                   shingle_n: int = 3,
                   hash_family: str = "md5") -> DataFrame:
    """LSH candidates verified with exact word-shingle Jaccard >= threshold.
    Returns (id_a, id_b, jaccard_sim). ``hash_family="xxhash64"`` is the
    production choice (cheaper per shingle, no hex parse); md5 is kept as
    the default for DuckDB-oracle parity. Verification is exact either
    way, so the families differ only in candidate recall — property-tested
    equivalent on the fixture corpus."""
    return _verified_pairs(df, lambda t: shingles(t, shingle_n), text_col,
                           id_col, threshold, bands, rows, hash_family)


def connected_components(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iterations: int = 25) -> DataFrame:
    """Duplicate clusters from near-dup pairs: connected components by
    iterative min-label propagation. Returns ``(id, component)`` where
    ``component`` is the smallest id reachable from ``id`` — the cluster's
    deterministic keeper/label.

    The reference has no analog (it is a per-message bridge); this is the
    step every dedup pipeline needs between pair generation and keeper
    selection: near-dup similarity is not transitive, so survivors must be
    chosen per CLUSTER, not per pair.

    Scale shape (the standard MapReduce/Pregel CC): each round is one
    equi-join of edges with labels plus one min-aggregate — both shuffle
    on the uniform id key, so rounds co-partition after the first. Each
    round ALSO pointer-jumps (label := label of label, one self-join of
    the labels table), so a chain of length d converges in O(log d)
    rounds instead of O(d) — a 1000-doc duplicate chain needs ~10 rounds,
    not 1000. Near-dup clusters are dense (diameter 2-4 in practice), so
    the common case is still 1 looped round + 1 verification round. The
    driver loop holds only a changed-row COUNT per round (no .collect()
    of data); ``localCheckpoint`` truncates lineage so the plan stays
    O(1) per round instead of growing exponentially.

    Raises ``RuntimeError`` if the loop exits without converging —
    silently returning partial labels would let wrong clusters flow into
    keeper selection (the failure mode is undetectable downstream)."""
    # r12 (guide §2.1): both edge directions ride ONE pass over the pair
    # rows (2-array explode) — the former union of two projections of
    # ``pairs`` executed the whole upstream pair-generation plan (e.g.
    # the LSH pipeline) once per union branch inside the checkpoint job;
    # same multiset of (n, m) rows either way
    edges = pairs.select(F.explode(F.array(
        F.struct(F.col(src).alias("n"), F.col(dst).alias("m")),
        F.struct(F.col(dst).alias("n"), F.col(src).alias("m")),
    )).alias("e")).select(
        F.col("e.n").alias("n"), F.col("e.m").alias("m")
    ).localCheckpoint()  # materialize ONCE: edges are re-joined every
    #                      round, and without this each round would
    #                      re-execute the whole upstream pair-generation
    #                      plan from scratch
    # initial label = min(id, min direct neighbor): this IS the first
    # propagation round, fused into one aggregation (no join needed while
    # every label still equals its id). Dense diameter-2 dup clusters then
    # converge in a single looped round + one verification round.
    labels = (
        edges.groupBy("n")
        .agg(F.least(F.col("n"), F.min("m")).alias("component"))
        .select(F.col("n").alias("id"), "component")
        .localCheckpoint()
    )
    converged = False
    for _i in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["m"] == labels["id"])
            .groupBy("n")
            .agg(F.min("component").alias("nmin"))
        )
        hop = labels.join(
            neighbor_min, labels["id"] == neighbor_min["n"], "left"
        ).select(
            "id",
            F.least(
                "component", F.coalesce("nmin", "component")
            ).alias("hop_component"),
            F.col("component").alias("old_component"),
        )
        # pointer jumping: every label is itself a node id in the same
        # component, so following the label's own label halves the
        # remaining propagation distance each round (labels only ever
        # decrease, and never below the component min)
        parent = labels.select(
            F.col("id").alias("p_id"), F.col("component").alias("p_comp")
        )
        # r12 (guide §5, VERDICT r11 #6): the changed-rows count rides
        # the SAME action that materializes the round (observe metrics
        # fill during the checkpoint's internal job) — one job per
        # round instead of a checkpoint job plus a count job
        from pyspark.sql import Observation

        obs = Observation(f"cc_round_{_i}")
        updated = (
            hop.join(parent, hop["hop_component"] == parent["p_id"], "left")
            .select(
                "id",
                F.least(
                    "hop_component", F.coalesce("p_comp", "hop_component")
                ).alias("new_component"),
                "old_component",
            )
            .observe(obs, F.coalesce(
                F.sum(
                    F.when(
                        F.col("new_component") != F.col("old_component"), 1
                    ).otherwise(0)
                ), F.lit(0)).alias("n_changed"))
        ).localCheckpoint()
        changed = obs.get["n_changed"]
        labels = updated.select(
            "id", F.col("new_component").alias("component")
        )
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"rounds ({changed} labels still changing). With pointer "
            f"jumping this needs a component of diameter > "
            f"2**{max_iterations} — check for pathological input or raise "
            f"max_iterations."
        )
    return labels


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.6,
                        n: int = 4, bands: int = 4,
                        rows: int = 2,
                        hash_family: str = "md5") -> DataFrame:
    """n-gram Jaccard dedup: MinHash-band candidate generation (cheap,
    recall-tuned) + exact character-n-gram Jaccard verification. Character
    n-grams catch near-dups that word shingles miss (intra-word edits);
    the candidate stage is shared with the MinHash pipeline so the extra
    cost is only the verify join."""
    return _verified_pairs(df, lambda t: char_ngrams(t, n), text_col,
                           id_col, threshold, bands, rows, hash_family)


def decontaminate(df: DataFrame, bench_df: DataFrame, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id"
                  ) -> DataFrame:
    """Benchmark decontamination: find training documents that share any
    word ``n``-gram with an evaluation/benchmark corpus — the standard
    guard against test-set leakage when assembling LLM training data.
    (No reference analog — north-star LLM-pipeline extension.)

    Returns (id_col, shared_grams) for contaminated training docs only;
    anti-join the result against the corpus to drop them.

    100 TB shape: the benchmark side is small by nature (eval suites are
    10^3–10^6 docs), so its DISTINCT n-gram set broadcasts and the check
    is a map-side hash-semi-join against the exploded training n-grams —
    the training corpus never shuffles. Counting shared grams per doc
    aggregates on the already-partition-local doc id (one shuffle bounded
    by contaminated rows, not corpus size). n-grams are compared as full
    strings; swap in xxhash64(gram) to shrink the broadcast at scale."""
    grams = shingles(text_col, n)
    bench_grams = (
        bench_df.select(F.explode(shingles(text_col, n)).alias("gram"))
        .distinct()
    )
    exploded = df.select(
        F.col(id_col), F.explode(grams).alias("gram")
    )
    return (
        exploded.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("gram")).alias("shared_grams"))
    )


def near_dups_against_corpus(batch: DataFrame, corpus: DataFrame,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             threshold: float = 0.5, bands: int = 4,
                             rows: int = 2, shingle_n: int = 3,
                             hash_family: str = "md5") -> DataFrame:
    """INCREMENTAL ingestion dedup: flag new-batch docs that near-match
    the EXISTING corpus — batch bands join the corpus band index, so the
    candidate space is batch×matching-buckets, never corpus×corpus (the
    all-pairs pass ran once, historically; every later ingest pays only
    for its own batch). Returns per batch-doc: (doc_id, n_corpus_dups,
    max_sim) — the drop list for the ingest gate.

    At scale the corpus side of both joins is a PRECOMPUTED, stored
    table ((id, band_key) index + (id, shingles)); here both derive from
    the corpus DataFrame so the oracle can restate them. Band keys are
    uniform minhash concats, so the index join shuffles evenly; the
    shingle verify joins only candidate ids."""
    bk = lsh_band_keys(text_col, bands, rows, shingle_n, hash_family)
    b_bands = batch.select(F.col(id_col).alias("b_id"),
                           F.explode(bk).alias("band_key"))
    c_bands = corpus.select(F.col(id_col).alias("c_id"),
                            F.explode(bk).alias("band_key"))
    cands = (
        b_bands.join(c_bands, "band_key")
        .select("b_id", "c_id").distinct()
    )
    sh_b = batch.select(F.col(id_col).alias("b_id"),
                        shingles(text_col, shingle_n).alias("sh_b"))
    sh_c = corpus.select(F.col(id_col).alias("c_id"),
                         shingles(text_col, shingle_n).alias("sh_c"))
    pairs = (
        cands.join(sh_b, "b_id").join(sh_c, "c_id")
        .withColumn("j", jaccard(F.col("sh_b"), F.col("sh_c")))
        .filter(F.col("j") >= threshold)
    )
    return pairs.groupBy(F.col("b_id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_corpus_dups"),
        F.round(F.max("j"), 6).alias("max_sim"),
    )


def cluster_exact_join(df: DataFrame, threshold: float = 0.9,
                       cluster_threshold: float = 0.5,
                       text_col: str = "text", id_col: str = "doc_id",
                       bands: int = 4, rows: int = 2,
                       hash_family: str = "md5") -> DataFrame:
    """Exact token-set Jaccard >= ``threshold`` pairs WITHIN MinHash-LSH
    duplicate clusters — the scale regime for dup-heavy corpora where a
    corpus-wide exact SSJoin's candidate set (and even its TRUE output)
    goes quadratic (measured: jaccard_prefix_join 138x wall at 16x input
    on the replica corpus, scale_check_r6.jsonl). Returns
    ``(id_a, id_b, jaccard_sim)``.

    Stages: (1) LSH-verified pairs at the LOOSE ``cluster_threshold``
    (bucketed band self-join — never all-pairs), (2) connected
    components (O(log d) pointer-jumped rounds), (3) exact Jaccard
    verification equi-joined on the CLUSTER key. The exact join's cost
    is sum over clusters of |c|^2 — bounded by the true duplicate
    structure, not by token-posting lists, and its shuffle key is the
    cluster id. Within-cluster candidate pairs are a superset of the
    qualifying within-cluster pairs because cluster_threshold <
    threshold; recall vs the full corpus-wide exact join equals LSH
    banding recall at cluster_threshold, which at ``threshold >= 0.9``
    is the near-certain regime (P[miss] = (1-s^rows)^bands with s >=
    0.9). This is the mitigation jaccard_prefix_join's docstring
    prescribes for quadratic-output corpora."""
    pairs = near_dup_pairs(df, text_col, id_col, cluster_threshold,
                           bands, rows, hash_family=hash_family)
    cc = connected_components(pairs)  # (id, component)
    toks = df.select(
        F.col(id_col), F.array_distinct(tokens(text_col)).alias("t")
    ).withColumn("sz", F.size("t"))
    member = toks.join(
        cc, toks[id_col] == cc["id"]
    ).select(F.col(id_col), "component", "t", "sz")
    a = member.select(
        "component", F.col(id_col).alias("id_a"),
        F.col("t").alias("ta"), F.col("sz").alias("sza"))
    b = member.select(
        "component", F.col(id_col).alias("id_b"),
        F.col("t").alias("tb"), F.col("sz").alias("szb"))
    inter = F.size(F.array_intersect(F.col("ta"), F.col("tb")))
    return (
        a.join(b, "component")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "j", inter * F.lit(1.0) / (F.col("sza") + F.col("szb") - inter)
        )
        .filter(F.col("j") >= threshold)
        .select("id_a", "id_b", F.round("j", 6).alias("jaccard_sim"))
    )


def jaccard_prefix_join(df: DataFrame, threshold: float = 0.9,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        set_expr: Column | None = None) -> DataFrame:
    """EXACT set-similarity self-join: ALL pairs with token-set Jaccard
    >= ``threshold``, via prefix filtering (Chaudhuri et al. SSJoin /
    Bayardo et al. All-Pairs) — the exact complement of the MinHash-LSH
    family, which is probabilistic and can miss pairs. (No reference
    analog — north-star LLM-pipeline extension.)

    Principle: order every document's distinct tokens by ascending
    global document frequency (rarest first, ties by token). If
    J(A,B) >= t then |A∩B| >= ceil(t·|A|) (since the union is at least
    |A|), so A and B MUST share a token within their first
    |X| - ceil(t·|X|) + 1 tokens — sharing only suffix (common) tokens
    cannot reach the overlap bound. Candidates = pairs sharing a PREFIX
    token; exact Jaccard verification then makes the result exact, so
    correctness never depends on the pruning.

    Scale shape: doc frequency attaches via a count window over the
    token key (one shuffle, same pattern as dup_passage_stats); the
    prefix keeps ~(1-t)·|T|+1 tokens per doc, and those are the RAREST
    tokens, exactly the ones with short join postings — boilerplate
    tokens (the quadratic-blowup risk) sit in suffixes and never
    generate candidates. Verification joins token arrays only for
    candidate pairs.

    ``set_expr`` overrides the element set (default: distinct word
    tokens of ``text_col``); pass e.g. distinct char-4-grams for a more
    discriminative domain. NOTE the output itself can be quadratic on a
    heavily templated corpus regardless of algorithm — pick the domain/
    threshold so the TRUE pair set is sparse; the pruning then keeps the
    candidate set near it. For dup-heavy/templated corpora use
    ``cluster_exact_join`` (MinHash-cluster first, exact verify within
    clusters) — cost bounded by cluster sizes instead of posting
    lists."""
    from pyspark.sql import Window

    elems = (F.array_distinct(tokens(text_col))
             if set_expr is None else set_expr)
    d = df.select(
        F.col(id_col),
        elems.alias("t"),
    ).withColumn("sz", F.size("t"))
    tok = d.select(id_col, "sz", F.explode("t").alias("term"))
    ranked = tok.withColumn(
        "df_t", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy("df_t", "term")),
    )
    prefix = ranked.filter(
        F.col("pos")
        <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select(id_col, "term")
    cand = (
        prefix.select(F.col(id_col).alias("id_a"), "term")
        .join(prefix.select(F.col(id_col).alias("id_b"), "term"), "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = d.select(F.col(id_col).alias("id_a"), F.col("t").alias("ta"),
                 F.col("sz").alias("sza"))
    b = d.select(F.col(id_col).alias("id_b"), F.col("t").alias("tb"),
                 F.col("sz").alias("szb"))
    inter = F.size(F.array_intersect(F.col("ta"), F.col("tb")))
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .withColumn(
            "j",
            inter * F.lit(1.0)
            / (F.col("sza") + F.col("szb") - inter),
        )
        .filter(F.col("j") >= threshold)
        .select("id_a", "id_b", F.round("j", 6).alias("jaccard_sim"))
    )


def cdc_chunk_overlap(df: DataFrame, threshold: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id",
                      k: int = 8, divisor: int = 64,
                      min_len: int | None = None,
                      max_len: int | None = None) -> DataFrame:
    """Sub-document near-dup REMOVAL on content-defined chunks (r10):
    chunk every doc with :func:`~mqtt_streamr_spark.operators.text.
    cdc_chunk_hashes` (insertion-stable boundaries), attribute each
    chunk hash to its EARLIEST owner (min ``id_col``), and flag a doc a
    duplicate when more than ``threshold`` of its chunk instances
    already appeared in an earlier doc — the shared-shingle analog of
    ``dup_passage_stats`` that survives insertions, because a prepended
    paragraph shifts fixed blocks but not CDC boundaries (rsync/LBFS
    principle; reference scope: bin/mqtt-streamr.js processes document
    streams, this is the LLM-corpus prep layer on top).

    Returns one row per doc: ``(id_col, n_chunks, shared_chunks,
    share_frac, is_dup)`` — survivors are ``~is_dup``; callers join back
    for the survivor corpus or aggregate for a boilerplate report.

    Scale shape: chunking is map-only Column algebra (no UDF); then ONE
    map-side-combined groupBy on the uniform chunk hash and one
    hash-join back on the same key (AQE skew-join splits the hot
    boilerplate hashes — a window ``min() over (partition by h)`` would
    put every instance of a viral chunk in one task, so the
    groupBy+join shape is deliberately chosen over it), and one final
    groupBy on ``id_col``. Everything linear in total text bytes;
    never all-pairs."""
    from mqtt_streamr_spark.operators.text import cdc_chunk_hashes

    chunks = df.select(
        F.col(id_col),
        F.explode(cdc_chunk_hashes(
            text_col, k=k, divisor=divisor,
            min_len=min_len, max_len=max_len)).alias("h"),
    )
    first_owner = chunks.groupBy("h").agg(
        F.min(id_col).alias("first_doc"))
    per_doc = (
        chunks.join(first_owner, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("first_doc") < F.col(id_col), 1)
                  .otherwise(0)).cast("long").alias("shared_chunks"),
        )
        .withColumn(
            "share_frac",
            F.col("shared_chunks") / F.col("n_chunks"))
        .withColumn("is_dup", F.col("share_frac") > F.lit(threshold))
    )
    return per_doc


def cdc_boilerplate_spans(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          k: int = 8, divisor: int = 64,
                          min_len: int | None = None,
                          max_len: int | None = None) -> DataFrame:
    """WHERE the boilerplate sits (r10, the span half of
    :func:`cdc_chunk_overlap`): per doc, the character spans of CDC
    chunks whose hash already appeared in an EARLIER doc. Returns one
    row per doc that has any shared span: ``(id_col, n_spans,
    boiler_chars, first_start, first_end)`` — enough for a cleaning
    pipeline to excise the repeated region instead of dropping the doc.
    Same linear shape as cdc_chunk_overlap: map-only span extraction,
    one groupBy on the uniform chunk hash, one join back, one per-doc
    aggregation."""
    from mqtt_streamr_spark.operators.text import cdc_chunk_spans

    spans = df.select(
        F.col(id_col),
        F.explode(cdc_chunk_spans(
            text_col, k=k, divisor=divisor,
            min_len=min_len, max_len=max_len)).alias("sp"),
    ).select(id_col, "sp.h", "sp.cstart", "sp.cend")
    first_owner = spans.groupBy("h").agg(F.min(id_col).alias("first_doc"))
    shared = spans.join(first_owner, "h").filter(
        F.col("first_doc") < F.col(id_col))
    return shared.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("cend") - F.col("cstart")).cast("long")
        .alias("boiler_chars"),
        F.min("cstart").alias("first_start"),
        F.min_by("cend", F.col("cstart")).alias("first_end"),
    )


def cdc_excise_boilerplate(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           k: int = 8, divisor: int = 64,
                           min_len: int | None = None,
                           max_len: int | None = None) -> DataFrame:
    """EXCISE the boilerplate (r11, VERDICT r10 Next-round #4 — the
    cleaning action :func:`cdc_boilerplate_spans` reports): rebuild each
    doc's normalized text with every shared CDC span cut out, keeping
    the doc instead of dropping it. A chunk is excised when its hash
    already appeared in an EARLIER doc (same first-owner attribution as
    the rest of the cdc_* family), so exactly one copy of every repeated
    region survives corpus-wide.

    Returns one row per doc: ``(id_col, clean_text, orig_chars,
    excised_spans, excised_chars, clean_chars)`` — ``excised_spans`` 0
    and ``clean_text`` = the normalized text for untouched docs.

    Scale shape: span extraction is map-only Column algebra; ONE
    map-side-combined groupBy on the uniform chunk hash + join back
    (AQE-skew-safe — viral boilerplate hashes split instead of
    hot-spotting a window), then the per-doc CUT LIST (start/end ints
    only — the spans, never the text bytes) is aggregated and joined
    back to the docs on ``id_col``, where an ``F.aggregate`` fold
    splices the kept segments in place. The text shuffles ZERO times:
    only chunk hashes and span ints move; the rebuild happens in the
    map stage that already holds the doc row. Linear in total text
    bytes (reference scope: bin/mqtt-streamr.js transforms document
    payloads in flight; this is the corpus-cleaning analog)."""
    from mqtt_streamr_spark.operators.text import cdc_chunk_spans

    spans = df.select(
        F.col(id_col),
        F.explode(cdc_chunk_spans(
            text_col, k=k, divisor=divisor,
            min_len=min_len, max_len=max_len)).alias("sp"),
    ).select(id_col, "sp.h", "sp.cstart", "sp.cend")
    first_owner = spans.groupBy("h").agg(F.min(id_col).alias("first_doc"))
    cuts = (
        spans.join(first_owner, "h")
        .filter(F.col("first_doc") < F.col(id_col))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(
            F.struct("cstart", "cend"))).alias("cuts"))
    )
    s = F.array_join(tokens(text_col), " ")

    def splice(sc: Column) -> Column:
        # fold over the sorted cut list: state = (chars consumed, text
        # kept so far); each cut appends the gap before it and skips
        # itself; the finisher appends the tail. CDC spans are disjoint
        # and sorted, so gaps never overlap.
        return F.aggregate(
            F.col("cuts"),
            F.struct(F.lit(0).alias("pos"),
                     F.lit("").alias("acc")),
            lambda st, c: F.struct(
                c["cend"].alias("pos"),
                F.concat(
                    st["acc"],
                    sc.substr(st["pos"] + 1, c["cstart"] - st["pos"]),
                ).alias("acc"),
            ),
            lambda st: F.concat(
                st["acc"], sc.substr(st["pos"] + 1,
                                     F.length(sc) - st["pos"])),
        )

    out = df.join(cuts, id_col, "left")
    return out.select(
        F.col(id_col),
        F.when(F.col("cuts").isNull(), s)
        .otherwise(_let(s, splice)).alias("clean_text"),
        F.length(s).cast("long").alias("orig_chars"),
        F.coalesce(F.size("cuts"), F.lit(0)).cast("long")
        .alias("excised_spans"),
        F.coalesce(
            F.aggregate(
                "cuts", F.lit(0),
                lambda acc, c: acc + (c["cend"] - c["cstart"])),
            F.lit(0),
        ).cast("long").alias("excised_chars"),
        # total chunk count rides the map stage that already holds the
        # doc row (r12) — callers gating on excised/total no longer pay
        # a separate chunking pass + join for the denominator
        F.size(cdc_chunk_spans(
            text_col, k=k, divisor=divisor,
            min_len=min_len, max_len=max_len)).cast("long")
        .alias("n_chunks"),
    ).withColumn(
        "clean_chars", F.length("clean_text").cast("long")
    )


def cdc_chunks_against_corpus(batch: DataFrame, corpus: DataFrame,
                              threshold: float = 0.5,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              k: int = 8, divisor: int = 64,
                              min_len: int | None = None,
                              max_len: int | None = None) -> DataFrame:
    """INCREMENTAL sub-document dedup (r10): flag new-batch docs whose
    CDC chunks mostly already exist in the CORPUS chunk set — the
    ingest-gate analog of :func:`cdc_chunk_overlap`, and the
    insertion-robust sibling of :func:`near_dups_against_corpus`. Per
    batch doc: (id, n_chunks, corpus_chunks, share_frac, is_dup).

    At scale the corpus side is a PRECOMPUTED, stored DISTINCT-chunk
    index (one `long` per unique chunk — tiny next to the text); every
    later ingest pays only for its own batch: map-only chunking, one
    hash join of batch chunks against the index on the uniform hash,
    one per-doc aggregation. Here the index derives from the corpus
    DataFrame so the oracle can restate it.

    r12 (guide §2.1): total and corpus-hit chunk counts fold into ONE
    per-doc aggregation over a left join against the distinct index
    (multiplicity 1, so instance counts are unchanged) — the former
    semi-join branch re-derived the batch chunking a second time and
    paid an extra join of the two per-doc frames."""
    from mqtt_streamr_spark.operators.text import cdc_chunk_hashes

    ch = cdc_chunk_hashes(text_col, k=k, divisor=divisor,
                          min_len=min_len, max_len=max_len)
    b_chunks = batch.select(F.col(id_col), F.explode(ch).alias("h"))
    c_index = (corpus.select(F.explode(ch).alias("h")).distinct()
               .withColumn("__hit", F.lit(1)))
    per_doc = (
        b_chunks.join(c_index, "h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .alias("corpus_chunks"),
        )
        .withColumn("share_frac",
                    F.col("corpus_chunks") / F.col("n_chunks"))
        .withColumn("is_dup", F.col("share_frac") > F.lit(threshold))
    )
    return per_doc
