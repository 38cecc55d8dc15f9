"""Empirical scaling check: run representative operators at 1x/4x/16x the
sf0.1 input and report wall-clock scaling.

The point: a plan that holds at scale grows ~linearly in input size (until
cores saturate); a plan with a hidden quadratic (unblocked self-join,
driver collect, per-row recompute) blows up visibly at 16x. Keys/timestamps
are offset per replica so replication multiplies the real key space instead
of creating degenerate duplicates.

Usage: python scale_check.py   (prints one JSON line per operator)
"""

from __future__ import annotations

import json
import os
import time
from functools import reduce

import pyspark.sql.functions as F

from mqtt_streamr_spark.operators import dedup as D
from mqtt_streamr_spark.operators import similarity as S
from mqtt_streamr_spark.operators import text as T
from mqtt_streamr_spark.operators.joins import asof_join
from mqtt_streamr_spark.session import get_spark
from mqtt_streamr_spark.tables import load, spread

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# side channel: streaming ops record their state-store footprint here
# (commit ms + max state memory bytes, from the query listener) so the
# sweep rows carry state-store scaling, not just time/shuffle
LAST_STREAM_METRICS: dict | None = None


class _stream_metrics:
    """Context manager: attach a MetricsListener for one streaming op
    and publish its state-store window to LAST_STREAM_METRICS."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        from mqtt_streamr_spark.streaming.stats import MetricsListener
        self.lst = MetricsListener.attach(self.spark)
        return self

    def __exit__(self, *exc):
        global LAST_STREAM_METRICS
        time.sleep(1.0)  # listener bus is async
        s = self.lst.window_summary(0)
        self.lst.detach()
        LAST_STREAM_METRICS = {
            k: s[k] for k in ("state_commit_ms", "state_mem_bytes_max")
            if s and k in s
        } or None
        return False

MULTIPLES = (1, 4, 16)


def replicate(df, k, id_cols=(), ts_col=None, tag_text_col=None,
              vec_col=None):
    parts = []
    for i in range(k):
        p = df
        for c in id_cols:
            p = p.withColumn(c, F.col(c) + F.lit(i * 1_000_000_000))
        if ts_col:
            p = p.withColumn(
                ts_col, F.col(ts_col) + F.expr(f"INTERVAL {i} SECONDS")
            )
        if vec_col and i:
            # rotate each replica's coordinates so replicas occupy
            # genuinely NEW regions of embedding space while keeping norms
            # and intra-replica geometry (otherwise every replica is an
            # exact duplicate vector and pairwise ops blow up
            # quadratically by construction, not by plan)
            r = (i * 7) % 63 + 1
            p = p.withColumn(
                vec_col,
                F.concat(
                    F.slice(F.col(vec_col), r + 1, 64 - r),
                    F.slice(F.col(vec_col), 1, r),
                ),
            )
        if tag_text_col and i:
            # perturb text so replicas are genuinely distinct documents,
            # not exact/near duplicates of each other
            p = p.withColumn(
                tag_text_col,
                F.concat(F.col(tag_text_col), F.lit(f" replica{i} " * 3)),
            )
        parts.append(p)
    return reduce(lambda a, b: a.unionByName(b), parts)


def scan_agg(spark, k):
    li = replicate(load(spark, "lineitem", SF_DIR), k)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity"), F.avg("l_extendedprice"), F.count(F.lit(1))
    )


def minhash_buckets(spark, k):
    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k,
        id_cols=("doc_id",), tag_text_col="text",
    )
    bands = docs.select(F.explode(D.lsh_band_keys("text", 4, 2)).alias("bk"))
    return bands.groupBy("bk").count().agg(
        F.count(F.lit(1)), F.max("count")
    )


def asof(spark, k):
    ev = replicate(load(spark, "events", SF_DIR), k,
                   id_cols=("event_id", "user_id"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("p_value"))
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("v_value"))
    return asof_join(p, v, on="user_id").agg(
        F.count(F.lit(1)), F.sum("v_value_asof")
    )


def sessions(spark, k):
    ev = replicate(load(spark, "events", SF_DIR), k, id_cols=("user_id",))
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.count(F.lit(1)), F.sum("n"))
    )


def chunking(spark, k):
    # explode-shaped: output rows = ~n_tokens/48 per doc; must stay linear
    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k,
        id_cols=("doc_id",), tag_text_col="text",
    )
    u = docs.select(
        F.explode(T.chunk_token_windows("text", 64, 16)).alias("chunk")
    )
    return u.agg(F.count(F.lit(1)), F.countDistinct(F.md5("chunk")))


def pii_scrub(spark, k):
    # pure map stage: the floor case — anything superlinear here is a bug
    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k, id_cols=("doc_id",)
    )
    return docs.select(
        F.length(T.pii_scrub("text")).alias("l")
    ).agg(F.sum("l"), F.count(F.lit(1)))


def near_dup_pairs(spark, k):
    # the full dedup path: LSH banding -> candidate self-join -> Jaccard
    # verify. Replicas are text-perturbed, so dup pairs stay intra-replica
    # and the output (and candidate set) must grow linearly in k.
    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k,
        id_cols=("doc_id",), tag_text_col="text",
    )
    p = D.near_dup_pairs(docs, threshold=0.5, bands=4, rows=2)
    return p.agg(F.count(F.lit(1)), F.avg("jaccard_sim"))


def ivf_assign_emb(spark, k):
    # ANN ingest path: K fixed centroids (replica-0 seeds), every vector
    # scored against all K then top-1 per vector — one shuffle on vec_id.
    # K stays constant as data grows, which is exactly the 100 TB shape.
    emb = replicate(load(spark, "embeddings", SF_DIR), k,
                    id_cols=("vec_id",))
    a = S.ivf_assign(emb, centroid_ids=[1, 2, 3, 4, 5, 6, 7, 8])
    return a.groupBy("cid").count().agg(F.count(F.lit(1)), F.sum("count"))


def packing(spark, k):
    # scale path of pack_sequences: coarse uniform hash part key, window
    # cumsum per partition — parallelism fixed at 64 whatever the corpus
    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k, id_cols=("doc_id",)
    ).withColumn("part", F.pmod(F.xxhash64("doc_id"), F.lit(64)))
    p = T.pack_sequences(docs.select("part", "doc_id", "text"),
                         budget_tokens=1024, part_col="part")
    return p.agg(F.count(F.lit(1)), F.countDistinct("part", "pack_id"))


def unigram_scoring(spark, k):
    # explode -> term agg -> broadcast vocab -> per-doc agg; term keys are
    # uniform, vocab growth is sublinear in corpus size (vocab saturates)
    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k,
        id_cols=("doc_id",), tag_text_col="text",
    )
    s = T.unigram_logprob_score(docs)
    return s.agg(F.count(F.lit(1)), F.round(F.avg("avg_logprob"), 2))


def temperature_mix(spark, k):
    # one stratum-count agg + broadcast rates + map-side filter; the
    # stratum count is fixed (languages), so rates stay broadcast-size
    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k, id_cols=("doc_id",)
    )
    kept = T.temperature_rebalance(docs, alpha=0.5, stratum_col="lang")
    return kept.agg(F.count(F.lit(1)), F.countDistinct("lang"))


def dup_passage(spark, k):
    # explode shingles -> doc-freq agg -> join back on the SAME md5 key;
    # both shuffles are linear in corpus shingles
    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k,
        id_cols=("doc_id",), tag_text_col="text",
    )
    per = T.dup_passage_stats(docs, n=5)
    return per.agg(F.count(F.lit(1)), F.round(F.avg("dup_frac"), 3))


def classifier_scoring(spark, k):
    # pure map-side fold + one tiny agg: shuffle bytes should be flat
    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k,
        id_cols=("doc_id",), tag_text_col="text",
    )
    scored = docs.select(T.hashed_linear_score("text").alias("p"))
    return scored.agg(F.count(F.lit(1)), F.round(F.avg("p"), 4))


def semantic_dedup_emb(spark, k):
    # semantic near-dup blocking at scale: the block key must (a) cost
    # O(1) per vector and (b) keep block SIZE constant as the corpus
    # grows. Flat LSH with planes growing by log4(input ratio) delivers
    # (a) but only approximates (b): clustered occupancy skews, so the
    # hot tail keeps growing (sum(size^2) measured 21.4x at 16x input)
    # — the capped row below is the fix. force_shuffle_join pins the
    # block join to SMJ at every multiple; without it the small
    # multiples broadcast (zero shuffle written) and this row's ratio
    # read the planner crossover (45.7x in r10) instead of growth.
    # (The IVF-cell variant in semantic_dedup is the small/medium-corpus
    # shape: its coarse assignment costs O(N*K), so K cannot chase N —
    # measured here earlier: fixed K=8 at 16x input -> ~26x time.)
    emb = replicate(
        spread(load(spark, "embeddings", SF_DIR)), k,
        id_cols=("vec_id",), vec_col="embedding",
    )
    planes = {1: 8, 4: 10, 16: 12}[k]
    flagged = S.semantic_dedup(emb, threshold=0.4, blocking="lsh",
                               planes=planes, force_shuffle_join=True)
    return flagged.agg(
        F.count(F.lit(1)),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)),
    )


def semantic_dedup_capped_emb(spark, k):
    # r11: the ADAPTIVE-depth answer to the row above — the flat-LSH
    # schedule (planes ~ log4 input) still read 45.7x shuffle at 16x
    # because clustered occupancy skews: hot buckets keep growing and
    # the intra-block pair join goes quadratic where the data is dense
    # (sum(size^2) measured 21.4x at 16x input). bucket_cap re-blocks
    # hot base buckets at the full (planes+extra)-bit signature, so the
    # base plane count stays FIXED across 1x/4x/16x (no corpus-size
    # scheduling) and pair mass is bounded by ~cap*N (measured 5.0x at
    # 16x input: 17.3k -> 86.2k sum_sz2, max block == cap).
    emb = replicate(
        spread(load(spark, "embeddings", SF_DIR)), k,
        id_cols=("vec_id",), vec_col="embedding",
    )
    flagged = S.semantic_dedup(emb, threshold=0.4, blocking="lsh",
                               planes=8, bucket_cap=16, extra_planes=8,
                               force_shuffle_join=True)
    return flagged.agg(
        F.count(F.lit(1)),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)),
    )


def bpe_pairs(spark, k):
    # corpus -> distinct-word vocab agg (linear), then char explode over
    # the vocab only: 16x corpus with a saturating vocab should be FLAT
    # in the second stage
    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k,
        id_cols=("doc_id",), tag_text_col="text",
    )
    return T.bpe_pair_stats(docs, top_k=10)



def upsert_events(spark, k):
    from mqtt_streamr_spark.operators.merge import upsert

    ev = replicate(load(spark, "events", SF_DIR), k, id_cols=("event_id",))
    snap = ev.select("event_id", "value", "ts")
    chg = (
        snap.filter(F.col("event_id") % 10 == 0)
        .withColumn("value", F.col("value") + 1)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return upsert(snap, chg, ["event_id"], "ts").agg(
        F.count(F.lit(1)), F.sum("value")
    )


def snapshot_diff_events(spark, k):
    from mqtt_streamr_spark.operators.merge import snapshot_diff

    ev = replicate(load(spark, "events", SF_DIR), k, id_cols=("event_id",))
    old = ev.select("event_id", "value")
    new = (
        old.filter(F.col("event_id") % 13 != 0)
        .withColumn(
            "value",
            F.when(F.col("event_id") % 10 == 0, F.col("value") + 1)
            .otherwise(F.col("value")),
        )
        .unionByName(
            old.filter(F.col("event_id") % 50 == 0)
            .withColumn("event_id", F.col("event_id") + 10_000_000_000)
        )
    )
    return (
        snapshot_diff(old, new, ["event_id"])
        .groupBy("change_type").count()
        .agg(F.count(F.lit(1)), F.sum("count"))
    )


def fuzzy_join_names(spark, k):
    from mqtt_streamr_spark.operators.joins import symdel_fuzzy_join

    # Length-preserving replica perturbation: overwrite the first two
    # chars with a replica code whose members pairwise differ in BOTH
    # positions (chr(65+i), chr(90-i)), so cross-replica names sit at
    # Levenshtein distance 2 > max_dist and replicas are genuinely new
    # entities. Appending a tag (replicate's tag_text_col) is wrong for
    # THIS op: SymSpell variant count scales with string length, so a
    # 3x longer name inflates the variant shuffle ~2.7x beyond the
    # input ratio — measuring the harness, not the plan (r6 sweep read
    # 38.5x shuffle at 16x input from exactly that artifact).
    cust = replicate(
        load(spark, "customer", SF_DIR), k, id_cols=("c_custkey",)
    ).select(
        "c_custkey",
        F.concat(
            F.expr("char(65 + (c_custkey div 1000000000) % 26)"),
            F.expr("char(90 - (c_custkey div 1000000000) % 26)"),
            F.expr("substring(c_name, 3)"),
        ).alias("c_name"),
    )
    pert = cust.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("r_key"),
        F.expr(
            "substring(c_name, 1, 9 + c_custkey % 8) || "
            "substring(c_name, 11 + c_custkey % 8)"
        ).alias("r_name"),
    )
    return symdel_fuzzy_join(cust, pert, "c_custkey", "r_key",
                             "c_name", "r_name").agg(
        F.count(F.lit(1)), F.sum("dist")
    )


def ewma_events(spark, k):
    from mqtt_streamr_spark.operators.grouped import ewma_per_key

    ev = replicate(load(spark, "events", SF_DIR), k,
                   id_cols=("event_id", "user_id"))
    sm = ewma_per_key(ev.select("user_id", "ts", "event_id", "value"),
                      "user_id", "ts", "value", alpha=0.3,
                      order_cols=["event_id"])
    return sm.agg(F.count(F.lit(1)), F.sum("ewma"))


def vocab_encode_docs(spark, k):
    from mqtt_streamr_spark.operators.text import build_vocab, encode_tokens

    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k,
        id_cols=("doc_id",), tag_text_col="text",
    )
    vocab = build_vocab(docs, vocab_size=1000)
    enc = encode_tokens(docs, vocab, vocab_size=1000)
    return enc.agg(F.count(F.lit(1)), F.sum(F.size("token_ids")))


def multimodal_pipeline(spark, k):
    from mqtt_streamr_spark.operators import multimodal as M

    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k,
        id_cols=("doc_id",), tag_text_col="text",
    )
    media = M.documents_as_media(docs)
    feats = M.extract_features(media)
    return feats.agg(F.count(F.lit(1)), F.sum("n_bytes"))


def interval_overlap_sessions(spark, k):
    from mqtt_streamr_spark.operators.joins import interval_overlap_join

    ev = replicate(load(spark, "events", SF_DIR), k,
                   id_cols=("event_id", "user_id"))
    s = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id",
                F.col("session_window.start").alias("t0"),
                F.col("session_window.end").alias("t1"))
    )
    vip = s.filter(F.col("user_id") % 10 == 0).select(
        F.col("user_id").alias("v_user"),
        F.col("t0").alias("v_lo"), F.col("t1").alias("v_hi"))
    oth = s.filter(F.col("user_id") % 10 != 0).select(
        F.col("user_id").alias("o_user"),
        F.col("t0").alias("o_lo"), F.col("t1").alias("o_hi"))
    j = interval_overlap_join(vip, oth, "v_lo", "v_hi", "o_lo", "o_hi",
                              bin_width_s=900)
    return j.agg(F.count(F.lit(1)), F.count_distinct("v_user"))


def interval_overlap_counts_sessions(spark, k):
    # r11: the aggregate-side mitigation for the row above —
    # interval_overlap_sessions materializes pairs (quadratic TRUE
    # OUTPUT on the replica corpus: Omega(true pairs) for any exact
    # pair join, ~23x time at 16x). When the question is the COUNT per
    # VIP session, the order-statistics identity answers it with two
    # rank queries against binned+prefix-summed endpoint multisets —
    # O(n) shuffle rows of a few longs, no pair ever built.
    # sessions are MATERIALIZED once per replica set (same amortized-
    # ingest pattern as variant_pruned_scan): the operator's metadata
    # CTEs re-derive their input per consumer, which must be a pruned
    # 2-column parquet re-read — not a re-shuffle of the session
    # subplan — for the row to measure the operator itself.
    import tempfile

    from mqtt_streamr_spark.operators.joins import interval_overlap_counts

    d = os.path.join(tempfile.gettempdir(), f"scale_sessions_{k}")
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        ev = replicate(load(spark, "events", SF_DIR), k,
                       id_cols=("event_id", "user_id"))
        (
            ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select("user_id",
                    F.col("session_window.start").alias("t0"),
                    F.col("session_window.end").alias("t1"))
            .write.mode("overwrite").parquet(d)
        )
    s = spark.read.parquet(d)
    vip = s.filter(F.col("user_id") % 10 == 0).select(
        F.col("user_id").alias("v_user"),
        F.col("t0").alias("v_lo"), F.col("t1").alias("v_hi"))
    oth = s.filter(F.col("user_id") % 10 != 0).select(
        F.col("t0").alias("o_lo"), F.col("t1").alias("o_hi"))
    c = interval_overlap_counts(vip, oth, ["v_user", "v_lo"],
                                "v_lo", "v_hi", "o_lo", "o_hi",
                                bin_width_s=900, force_shuffle_join=True)
    return c.agg(F.count(F.lit(1)), F.sum("n_overlaps"))


def heavy_hitters_docs(spark, k):
    from mqtt_streamr_spark.operators.text import frequent_terms

    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k,
        id_cols=("doc_id",), tag_text_col="text",
    )
    return frequent_terms(docs, min_support=0.005, counters=512).agg(
        F.count(F.lit(1)), F.sum("cnt"))


def jaccard_prefix_docs(spark, k):
    from mqtt_streamr_spark.operators.dedup import jaccard_prefix_join

    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k,
        id_cols=("doc_id",), tag_text_col="text",
    ).filter(F.col("doc_id") % 10 == 0)
    return jaccard_prefix_join(docs, threshold=0.9).agg(
        F.count(F.lit(1)), F.sum("jaccard_sim"))


def cdc_chunk_overlap_docs(spark, k):
    # r10 sub-document near-dup removal: map-only CDC chunking, one
    # map-side-combined groupBy on the uniform chunk hash + one hash
    # join back, one per-doc agg. Replicas are text-perturbed so chunk
    # overlap stays intra-replica: time and shuffle must track corpus
    # bytes ~linearly.
    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k,
        id_cols=("doc_id",), tag_text_col="text",
    )
    per = D.cdc_chunk_overlap(docs, threshold=0.5)
    return per.agg(
        F.count(F.lit(1)),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)),
        F.round(F.avg("share_frac"), 4),
    )


def cdc_excise_boilerplate_docs(spark, k):
    # r11 boilerplate excision: same hash-groupBy+join-back shape as
    # cdc_chunk_overlap_docs, plus the map-stage F.aggregate splice —
    # the text never shuffles (only span ints do), so shuffle bytes
    # must stay ~linear in corpus bytes and well below the text size.
    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k,
        id_cols=("doc_id",), tag_text_col="text",
    )
    out = D.cdc_excise_boilerplate(docs)
    return out.agg(
        F.count(F.lit(1)),
        F.sum("excised_chars"),
        F.sum("clean_chars"),
    )


def cluster_exact_join_docs(spark, k):
    # cluster-then-exact-join (r7, the jaccard_prefix_docs mitigation):
    # replicas are TOKEN-salted (every token prefixed with its replica id)
    # so replica token sets are DISJOINT — replication multiplies the real
    # duplicate structure instead of making every replica a >=0.9 near-dup
    # of replica 0. (With the tag-perturbed corpus the TRUE >= 0.9 pair
    # set itself is quadratic in k, which no exact algorithm outruns —
    # that regime is what this operator's cluster-bounded cost model is
    # FOR; this sweep verifies the cost follows the duplicate structure:
    # linear structure -> linear wall-clock.)
    from pyspark.sql import DataFrame as _DF

    base = spread(load(spark, "documents", SF_DIR)).filter(
        F.col("doc_id") % 10 == 0)
    parts = []
    for i in range(k):
        parts.append(
            base.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000)
            ).withColumn(
                "text",
                F.regexp_replace(F.col("text"), r"(\S+)", f"r{i}$1"),
            )
        )
    docs = reduce(_DF.unionByName, parts)
    p = D.cluster_exact_join(docs, threshold=0.9, cluster_threshold=0.5)
    return p.agg(F.count(F.lit(1)), F.sum("jaccard_sim"))


def concurrency_sweep_events(spark, k):
    from mqtt_streamr_spark.queries.events import _concurrency_from_events

    ev = replicate(load(spark, "events", SF_DIR), k,
                   id_cols=("event_id", "user_id"))
    return _concurrency_from_events(ev).agg(
        F.count(F.lit(1)), F.sum("peak_concurrency"))


def forward_fill_events(spark, k):
    from mqtt_streamr_spark.queries.events import _forward_fill_from_events

    ev = replicate(load(spark, "events", SF_DIR), k,
                   id_cols=("event_id", "user_id"))
    return _forward_fill_from_events(ev).agg(
        F.count(F.lit(1)), F.sum("filled_total"))


def quantile_sketch_events(spark, k):
    from mqtt_streamr_spark.queries.events import _quantile_sketch_from_events

    ev = replicate(load(spark, "events", SF_DIR), k,
                   id_cols=("event_id", "user_id"))
    return _quantile_sketch_from_events(ev).agg(
        F.count(F.lit(1)), F.sum("p50_est"))


def ngram_repetition_docs(spark, k):
    # r6 single-pass multi-n repetition profile: one tokenize, bi+tri
    # grams off the same token array, ONE shuffle keyed on
    # (doc_id, n, xxhash64(gram)) — should scale ~linearly; the old
    # call-per-n shape paid two raw-string shuffles plus a join
    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k,
        id_cols=("doc_id",), tag_text_col="text",
    )
    per = T.ngram_repetition_profile(docs, ns=(2, 3))
    return per.agg(
        F.count(F.lit(1)), F.round(F.avg("top2_frac"), 4),
        F.round(F.avg("dup3_frac"), 4),
    )


def variant_pruned_scan_events(spark, k):
    # r6 shredded-variant scan: ingest cost is amortized (paid once per
    # replica set, like the bucketed tables); the probe reads ONLY the
    # shredded $.k subcolumn with the predicate pushed to row-group
    # stats — time should track the pruned column's bytes, ~linear
    import tempfile

    ev = replicate(load(spark, "events", SF_DIR), k, id_cols=("event_id",))
    d = os.path.join(tempfile.gettempdir(), f"scale_shred_{k}")
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        # explicit, not default-dependent: the row measures the SHREDDED
        # layout (typed_value subcolumns in the parquet footer)
        spark.conf.set("spark.sql.variant.writeShredding.enabled", "true")
        spark.conf.set("spark.sql.variant.inferShreddingSchema", "true")
        (ev.withColumn("v", F.parse_json(F.col("props"))).drop("props")
         .write.mode("overwrite").parquet(d))
    shredded = spark.read.parquet(d)
    probed = shredded.select(
        "event_type",
        F.try_variant_get(F.col("v"), "$.k", "long").alias("kv"),
    ).filter(F.col("kv") > 50)
    return probed.groupBy("event_type").agg(
        F.count(F.lit(1)), F.round(F.avg("kv"), 4)
    )


def streaming_dedup_watermark_events(spark, k):
    """STREAMING stateful op under scale (r8 — first streaming row in the
    sweep): k-replicated events drained through
    ``dropDuplicatesWithinWatermark`` under the engine defaults (RocksDB
    provider + the pinned state-partition count, streaming/tuning.py).
    The state keyspace grows with k (replicas offset event_id), so this
    measures the state store's scaling, not cache luck: expect ~linear
    time; micro-batch COUNT stays constant (2 source files at every k)
    while batch SIZE grows with input — the regime a real stream scales
    in. Includes the replicated-source write (linear, same as every
    other op's replicate cost)."""
    import shutil
    import tempfile

    from mqtt_streamr_spark.streaming.tuning import stream_state_partitions
    from mqtt_streamr_spark.tables import normalize_events_ts

    ev = replicate(
        normalize_events_ts(load(spark, "events", SF_DIR)), k,
        id_cols=("event_id",),
    )
    d = tempfile.mkdtemp(prefix="scale_streaming_dedup_")
    try:
        src_dir = os.path.join(d, "src")
        (ev.select("event_id", "user_id", "ts")
         .repartition(2).write.mode("overwrite").parquet(src_dir))
        schema = spark.read.parquet(src_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src_dir)
            .withWatermark("ts", "60 days")
            .dropDuplicatesWithinWatermark(["event_id"])
        )
        out = os.path.join(d, "out")
        with _stream_metrics(spark), stream_state_partitions(spark):
            q = (
                stream.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", os.path.join(d, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return (
            spark.read.parquet(out)
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint()  # materialize before the dir is deleted
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)



def streaming_stream_stream_join_events(spark, k):
    """STREAM-STREAM interval join under scale (r9 — VERDICT r8 #6): the
    purchases side joined to the views side on user within a 1-hour
    lookback, both watermarked, k-replicated input with OFFSET user ids
    (replicas never join across replicas, so true output grows linearly
    — any super-linear time is state-store or plan cost, not output).
    Runs under the engine defaults: RocksDB provider + the pinned
    state-partition count. Includes the replicated-source write, like
    every other row."""
    import shutil
    import tempfile

    from mqtt_streamr_spark.streaming.tuning import stream_state_partitions
    from mqtt_streamr_spark.tables import normalize_events_ts

    ev = replicate(
        normalize_events_ts(load(spark, "events", SF_DIR)), k,
        id_cols=("event_id", "user_id"),
    )
    d = tempfile.mkdtemp(prefix="scale_ssj_")
    try:
        src_dir = os.path.join(d, "src")
        (ev.select("event_id", "user_id", "event_type", "value", "ts")
         .repartition(2).write.mode("overwrite").parquet(src_dir))
        schema = spark.read.parquet(src_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src_dir)
        )
        p = (
            stream.filter(F.col("event_type") == "purchase")
            .select("user_id", F.col("ts").alias("p_ts"),
                    F.col("value").alias("p_value"))
            .withWatermark("p_ts", "60 days")
        )
        v = (
            stream.filter(F.col("event_type") == "view")
            .select(F.col("user_id").alias("v_user"),
                    F.col("ts").alias("v_ts"))
            .withWatermark("v_ts", "60 days")
        )
        joined = p.join(
            v,
            F.expr("user_id = v_user AND "
                   "v_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts"),
            "inner",
        )
        out = os.path.join(d, "out")
        with _stream_metrics(spark), stream_state_partitions(spark):
            q = (
                joined.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", os.path.join(d, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return (
            spark.read.parquet(out)
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def streaming_evicting_bridge_events(spark, k):
    """The FULL bridge under scale (r9 — VERDICT r8 #6): replay ->
    strict parse -> compiled transform -> routing -> LRU registry
    (max_size=2, eviction fires) -> real MQTT publish-back to the
    in-repo MiniBroker, k-replicated input. The subscription filter
    ('/events/purchase/u3') keeps wire egress at ~1/50 of rows so the
    row measures the Spark plan + registry + publish path, not Python
    socket throughput. Success counting is the Logger contract; the
    drain-wait is bounded."""
    import shutil
    import tempfile
    import time as _time

    from mqtt_streamr_spark.sources.minibroker import (
        MiniBroker,
        SocketMqttClient,
    )
    from mqtt_streamr_spark.streaming import PipelineSpec, StreamingBridge
    from mqtt_streamr_spark.streaming.pipeline import replay_source

    ev = replicate(load(spark, "events", SF_DIR), k,
                   id_cols=("event_id", "user_id"))
    d = tempfile.mkdtemp(prefix="scale_bridge_")
    broker = MiniBroker()
    sub = SocketMqttClient(broker.url, topics=["/s/events/#"])
    try:
        src_dir = os.path.join(d, "src")
        ev.repartition(2).write.mode("overwrite").parquet(src_dir)
        spec = PipelineSpec(
            topics=["/events/purchase/u3"],
            transform='{"u": user_id, "kind": event_type, "v2": value * 2}',
            stream_id_template="/s$topic",
            topic_levels=2,
            publish_url=broker.url,
            dead_letter_dir=os.path.join(d, "dead"),
            registry_max_size=2,
            registry_ttl_seconds=3600.0,
            log_interval=3600.0,
        )
        bridge = StreamingBridge(spec)
        src = replay_source(
            spark, src_dir, streaming=True, malformed_every=50,
            max_files_per_trigger=1,
        )
        with _stream_metrics(spark):
            q = bridge.start(src, checkpoint_dir=os.path.join(d, "ckpt"))
            q.awaitTermination()
        success, _errors = bridge.logger.report()
        got = 0
        deadline = _time.time() + 300
        while got < success and _time.time() < deadline:
            got += len(sub.drain())
            _time.sleep(0.05)
        return spark.createDataFrame(
            [(int(success), int(got))], "success bigint, received bigint"
        )
    finally:
        sub.close()
        broker.close()
        shutil.rmtree(d, ignore_errors=True)


def streaming_cdc_apply_events(spark, k):
    """CDC-apply merge-fold under scale (r10 — VERDICT r9 #6, the one
    streaming family shape with no 16x proof until now): the change
    stream folds into a keyed parquet snapshot via foreachBatch +
    merge.upsert, exactly the streaming_cdc_apply query shape. Replicas
    offset BOTH event_id and user_id, so the live keyset — and thus the
    snapshot being rewritten each batch — grows linearly with k; batch
    COUNT stays constant (2 source files at every k). Per batch: ONE
    shuffle over snapshot ∪ batch. Records the final snapshot bytes via
    the LAST_STREAM_METRICS side channel (foreachBatch has no state
    store; the snapshot IS the state)."""
    import shutil
    import tempfile

    from mqtt_streamr_spark.operators.merge import upsert
    from mqtt_streamr_spark.tables import normalize_events_ts

    global LAST_STREAM_METRICS
    ev = replicate(
        normalize_events_ts(load(spark, "events", SF_DIR)), k,
        id_cols=("event_id", "user_id"),
    )
    d = tempfile.mkdtemp(prefix="scale_cdc_apply_")
    try:
        src_dir = os.path.join(d, "src")
        (ev.select("event_id", "user_id", "event_type", "value", "ts")
         .repartition(2).write.mode("overwrite").parquet(src_dir))
        schema = spark.read.parquet(src_dir).schema
        changes = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src_dir)
        )
        ver = {"version": 0}

        def apply_batch(batch_df, batch_id: int) -> None:
            b = batch_df.sparkSession
            cur = os.path.join(d, f"snap_v{ver['version']}")
            snap = (b.read.parquet(cur) if os.path.exists(cur)
                    else b.createDataFrame([], batch_df.schema))
            merged = upsert(snap, batch_df, ["user_id"], "ts",
                            tie_cols=["event_id"])
            nxt = os.path.join(d, f"snap_v{ver['version'] + 1}")
            merged.write.mode("overwrite").parquet(nxt)
            ver["version"] += 1

        q = (
            changes.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = os.path.join(d, f"snap_v{ver['version']}")
        LAST_STREAM_METRICS = {"snapshot_bytes": sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(final) for f in fs)}
        return (
            spark.read.parquet(final)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("v"))
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def jsonata_descendants_events(spark, k):
    # r6 compiled variant-path ** descendants: map-only per-row recursion
    # over raw JSON text + a tiny group agg — time should track input
    # ~linearly with near-zero shuffle (the agg rows are kind-cardinality)
    from mqtt_streamr_spark.streaming.transform import transform_to_json

    ev = replicate(load(spark, "events", SF_DIR), k,
                   id_cols=("event_id", "user_id"))
    df = ev.withColumn(
        "payload",
        F.to_json(F.struct(
            "event_type",
            F.struct(
                F.from_json("props", "k double").getField("k").alias("k"),
                F.struct(
                    (F.col("user_id") % 7).cast("double").alias("k")
                ).alias("inner"),
            ).alias("outer"),
        )),
    )
    out_col, backend = transform_to_json(
        '{"kind": event_type, "k": $sum(**.k)}', F.col("payload"),
        mode="compiled",  # this op MEASURES the compiled variant path;
        # auto now (r8 cost model) prefers the interpreter for
        # schemaless descendants
    )
    assert backend == "compiled", backend
    m = df.withColumn("m", F.from_json(out_col, "kind string, k double"))
    return m.groupBy("m.kind").agg(
        F.count(F.lit(1)), F.sum("m.k"))


def udtf_sentences_docs(spark, k):
    """Python UDTF lateral expansion (r8): map-side row fan-out through
    the Arrow-batched table function, then one partial-aggregated
    per-lang shuffle — time should track input, shuffle should stay
    language-cardinality-flat."""
    docs = replicate(
        spread(load(spark, "documents", SF_DIR)), k,
        id_cols=("doc_id",), tag_text_col="text",
    )
    spark.udtf.register("split_sentences_sc", T.sentence_udtf())
    docs.select("lang", "text").createOrReplaceTempView("docs_udtf_sc")
    out = spark.sql(
        "SELECT d.lang, s.n_tokens "
        "FROM docs_udtf_sc d, LATERAL split_sentences_sc(d.text) s"
    )
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t")
    )


def pagerank_transitions_events(spark, k):
    """Iterative PageRank (r8): replicas get disjoint node namespaces
    (event_type tagged with the replica index), so BOTH nodes and edges
    grow with k — the honest iterative-graph scaling shape, not a
    fixed-size graph with fatter weights."""
    from pyspark.sql import Window

    from mqtt_streamr_spark.operators.graph import pagerank

    ev = replicate(
        load(spark, "events", SF_DIR)
        .select("user_id", "event_type", "ts", "event_id"),
        k, id_cols=("user_id", "event_id"),
    )
    ev = ev.withColumn(
        "etype",
        F.concat(
            "event_type", F.lit("_"),
            (F.col("user_id") / F.lit(1_000_000_000)).cast("long")
            .cast("string"),
        ),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.withColumn("next", F.lead("etype").over(w))
        .filter(F.col("next").isNotNull())
    )
    edges = seq.groupBy(
        F.col("etype").alias("src"), F.col("next").alias("dst")
    ).agg(F.count(F.lit(1)).cast("double").alias("w"))
    return pagerank(edges, weight="w", iterations=3)


OPS = {
    "scan_agg_lineitem": scan_agg,
    "minhash_lsh_buckets": minhash_buckets,
    "asof_join_events": asof,
    "session_windows_events": sessions,
    "chunking_explode_docs": chunking,
    "pii_scrub_docs": pii_scrub,
    "near_dup_pairs_docs": near_dup_pairs,
    "ivf_assign_embeddings": ivf_assign_emb,
    "pack_sequences_docs": packing,
    "unigram_scoring_docs": unigram_scoring,
    "temperature_mix_docs": temperature_mix,
    "dup_passage_docs": dup_passage,
    "classifier_scoring_docs": classifier_scoring,
    "semantic_dedup_embeddings": semantic_dedup_emb,
    "semantic_dedup_capped_embeddings": semantic_dedup_capped_emb,
    "bpe_pairs_docs": bpe_pairs,
    "upsert_events": upsert_events,
    "snapshot_diff_events": snapshot_diff_events,
    "fuzzy_join_names": fuzzy_join_names,
    "ewma_events": ewma_events,
    "vocab_encode_docs": vocab_encode_docs,
    "multimodal_pipeline": multimodal_pipeline,
    "interval_overlap_sessions": interval_overlap_sessions,
    "interval_overlap_counts_sessions": interval_overlap_counts_sessions,
    "heavy_hitters_docs": heavy_hitters_docs,
    "jaccard_prefix_docs": jaccard_prefix_docs,
    "cdc_chunk_overlap_docs": cdc_chunk_overlap_docs,
    "cdc_excise_boilerplate_docs": cdc_excise_boilerplate_docs,
    "cluster_exact_join_docs": cluster_exact_join_docs,
    "concurrency_sweep_events": concurrency_sweep_events,
    "forward_fill_events": forward_fill_events,
    "quantile_sketch_events": quantile_sketch_events,
    "ngram_repetition_docs": ngram_repetition_docs,
    "variant_pruned_scan_events": variant_pruned_scan_events,
    "jsonata_descendants_events": jsonata_descendants_events,
    "streaming_dedup_watermark_events": streaming_dedup_watermark_events,
    "streaming_cdc_apply_events": streaming_cdc_apply_events,
    "streaming_stream_stream_join_events": streaming_stream_stream_join_events,
    "streaming_evicting_bridge_events": streaming_evicting_bridge_events,
    "udtf_sentences_docs": udtf_sentences_docs,
    "pagerank_transitions_events": pagerank_transitions_events,
}


def _shuffle_stage_snapshot(spark):
    """Per-stage shuffleWriteBytes {(stageId, attemptId): bytes} across
    completed stages, via the UI REST API (the only stable surface
    PySpark exposes for stage metrics). An op's delta is the sum over
    stages ABSENT from the before-snapshot (r10, VERDICT r9 #7): the old
    cumulative-total diff went NEGATIVE when the UI evicted retained
    stages mid-sweep (r9: pagerank_transitions_events), because evicted
    stages silently left the total. Returns None when the UI is off."""
    url = spark.sparkContext.uiWebUrl
    if not url:
        return None
    import urllib.request

    def get(path):
        with urllib.request.urlopen(f"{url}/api/v1/{path}", timeout=10) as r:
            return json.load(r)

    app_id = get("applications")[0]["id"]
    stages = get(f"applications/{app_id}/stages?status=complete")
    return {(s["stageId"], s["attemptId"]): s.get("shuffleWriteBytes", 0)
            for s in stages}


def _shuffle_delta(before, after):
    if before is None or after is None:
        return None
    return sum(v for key, v in after.items() if key not in before)


def main() -> None:
    import sys

    selected = sys.argv[1:] or list(OPS)
    unknown = [n for n in selected if n not in OPS]
    if unknown:
        raise SystemExit(f"unknown ops {unknown}; choices: {list(OPS)}")
    spark = get_spark(app_name="scale-check",
                      extra_conf={"spark.ui.enabled": "true",
                                  # stage eviction between an op's two
                                  # snapshots would undercount its delta;
                                  # a sweep emits ~2-3k stages, so 20k
                                  # retention makes eviction unreachable
                                  "spark.ui.retainedStages": "20000"})
    spark.sparkContext.setLogLevel("ERROR")
    # one overall warm-up (JVM + parquet footers); per-(op, k) jobs then
    # run exactly once — the 16x configurations are too expensive to double
    scan_agg(spark, 1).collect()
    for name in selected:
        fn = OPS[name]
        times, shuffles, state = {}, {}, {}
        for k in MULTIPLES:
            global LAST_STREAM_METRICS
            LAST_STREAM_METRICS = None
            sb0 = _shuffle_stage_snapshot(spark)
            t0 = time.time()
            fn(spark, k).collect()
            times[f"x{k}"] = round(time.time() - t0, 2)
            delta = _shuffle_delta(sb0, _shuffle_stage_snapshot(spark))
            if delta is not None:
                shuffles[f"x{k}"] = delta
            if LAST_STREAM_METRICS:
                state[f"x{k}"] = LAST_STREAM_METRICS
        lo, hi = times[f"x{MULTIPLES[0]}"], times[f"x{MULTIPLES[-1]}"]
        ratio = round(hi / lo, 2) if lo else None
        rec = {
            "op": name, "times_sec": times,
            "input_ratio": MULTIPLES[-1] // MULTIPLES[0],
            "time_ratio": ratio,
        }
        if state:
            rec["state_store"] = state
        if shuffles:
            rec["shuffle_write_bytes"] = shuffles
            slo = shuffles.get(f"x{MULTIPLES[0]}")
            shi = shuffles.get(f"x{MULTIPLES[-1]}")
            if slo:
                rec["shuffle_ratio"] = round(shi / slo, 2)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
