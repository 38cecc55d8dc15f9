"""Ground-truth unit tests for the LLM-pipeline operators: Spark results
checked against plain-Python (hashlib) reimplementations on small inputs —
independent of the DuckDB oracles, so a cross-engine coincidence can't mask
a broken hash family (which bit us once via pyspark lambda-arity
inference)."""

from __future__ import annotations

import hashlib

import pytest

import pyspark.sql.functions as F

from mqtt_streamr_spark.operators import dedup as D
from mqtt_streamr_spark.operators import similarity as S
from mqtt_streamr_spark.operators import text as T

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "completely different content here entirely now"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def py_tokens(text):
    import re

    return re.split(r"\s+", text.lower())


def py_shingles(text, n=3):
    toks = py_tokens(text)
    out = []
    for i in range(max(len(toks) - (n - 1), 1)):
        s = " ".join(toks[i:i + n])
        if s not in out:
            out.append(s)
    return out


def py_minhash(text, i):
    hs = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % D.MINHASH_PRIME
        for s in py_shingles(text)
    ]
    return min(
        (D.MINHASH_A[i] * h + D.MINHASH_B[i]) % D.MINHASH_PRIME for h in hs
    )


def test_minhash_matches_hashlib(spark):
    rows = _df(spark).select(
        "doc_id", D.minhash_signature("text", num_hashes=4).alias("sig")
    ).collect()
    for row in rows:
        text = dict(DOCS)[row["doc_id"]]
        for i in range(4):
            assert row["sig"][i] == py_minhash(text, i), (row["doc_id"], i)


def test_minhash_families_differ(spark):
    """Regression: each hash family must actually differ (the lambda-arity
    bug made them all identical)."""
    row = _df(spark).select(
        D.minhash_signature("text", num_hashes=8).alias("sig")
    ).limit(1).collect()[0]
    assert len(set(row["sig"])) > 4


def test_simhash_matches_hashlib(spark):
    def py_simhash(text):
        toks = list(dict.fromkeys(py_tokens(text)))
        bits = ""
        for j in range(16):
            s = sum(
                1 if hashlib.md5(t.encode()).hexdigest()[j] in "89abcdef"
                else -1
                for t in toks
            )
            bits += "1" if s >= 0 else "0"
        return bits

    rows = _df(spark).select(
        "doc_id", T.simhash16("text").alias("sh")
    ).collect()
    for row in rows:
        assert row["sh"] == py_simhash(dict(DOCS)[row["doc_id"]])


def test_near_dup_pairs_finds_planted_pair(spark):
    pairs = D.near_dup_pairs(_df(spark), threshold=0.5).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert 0.6 < pairs[0]["jaccard_sim"] < 0.9


def test_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "Same  Text"), (2, "same text"), (3, "other")],
        "doc_id long, text string",
    )
    groups = {r["keeper_id"]: r["n_docs"]
              for r in D.exact_duplicates(df).collect()}
    # normalization (lowercase + whitespace) makes 1 and 2 identical
    assert groups == {1: 2, 3: 1}


def test_cosine_identity(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    top = S.cosine_topk(df, S.query_vector(df, 0), k=3).collect()
    assert [r["vec_id"] for r in top] == [1, 2, 3]
    assert top[0]["cos_sim"] == 1.0
    assert abs(top[1]["cos_sim"]) < 1e-9
    assert top[2]["cos_sim"] == -1.0


def test_hyperplane_deterministic():
    a = S.hyperplane_coeffs(3, 16)
    assert a == S.hyperplane_coeffs(3, 16)
    assert set(a) <= {1.0, -1.0}
    assert a != S.hyperplane_coeffs(4, 16)


def test_lang_id_stopword_sensitivity(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der hund und die katze ist hier"),
            (3, "el perro y la casa de los gatos es"),
            (4, "你好世界"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["lang"] for r in
            df.select("doc_id", T.lang_id("text").alias("lang")).collect()}
    assert rows == {1: "en", 2: "de", 3: "es", 4: "zh"}


def test_multimodal_feature_plumbing(spark):
    from mqtt_streamr_spark.operators import multimodal as M

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    feats = M.extract_features(M.documents_as_media(df)).collect()
    assert len(feats) == 3
    by_id = {r["content_id"]: r for r in feats}
    text = dict(DOCS)[1]
    assert by_id[1]["n_bytes"] == len(text.encode())
    assert by_id[1]["sha_prefix"] == hashlib.md5(text.encode()).hexdigest()[:8]
    expected_vec = M.fake_feature_extractor(text.encode())
    assert list(by_id[1]["feature_vec"]) == expected_vec


def test_multimodal_resize_crop_semantics(spark):
    """Fallback resize = crop to target_w*target_h chars; hand-computed
    md5 + lengths, plus the null-media guard."""
    from mqtt_streamr_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, b"abcdefgh", "text/plain"), (2, b"xy", "text/plain"),
         (3, None, "text/plain")],
        "content_id long, media binary, mime string",
    )
    rows = {r["content_id"]: r
            for r in M.resize_media(df, target_w=2, target_h=2).collect()}
    assert (rows[1]["in_chars"], rows[1]["out_chars"]) == (8, 4)
    assert bytes(rows[1]["out_media"]) == b"abcd"
    assert rows[1]["out_sha"] == hashlib.md5(b"abcd").hexdigest()[:8]
    assert (rows[2]["in_chars"], rows[2]["out_chars"]) == (2, 2)
    assert bytes(rows[2]["out_media"]) == b"xy"
    assert (rows[3]["in_chars"], rows[3]["out_chars"]) == (0, 0)


def test_multimodal_frame_sample_explode_shape(spark):
    """One blob -> many frame rows: 10 chars at frame=3 gives frames
    0..3 (ceil), every_k=2 keeps 0 and 2; the tail frame is short."""
    from mqtt_streamr_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, b"0123456789"), (2, None)], "content_id long, media binary"
    )
    rows = M.sample_frames(df, frame_chars=3, every_k=2).collect()
    got = {(r["content_id"], r["frame_idx"]): r for r in rows}
    assert set(got) == {(1, 0), (1, 2)}
    assert got[(1, 0)]["frame_chars"] == 3
    assert got[(1, 0)]["frame_sha"] == hashlib.md5(b"012").hexdigest()[:8]
    assert got[(1, 2)]["frame_chars"] == 3
    assert got[(1, 2)]["frame_sha"] == hashlib.md5(b"678").hexdigest()[:8]


def test_multimodal_frame_sample_tail_frame(spark):
    """11 chars / frame=4 -> frames 0,1,2; every_k=1 keeps all; frame 2
    holds the 3-char tail."""
    from mqtt_streamr_spark.operators import multimodal as M

    df = spark.createDataFrame([(7, b"abcdefghijk")],
                               "content_id long, media binary")
    rows = sorted(M.sample_frames(df, frame_chars=4, every_k=1).collect(),
                  key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    assert [r["frame_chars"] for r in rows] == [4, 4, 3]
    assert rows[2]["frame_sha"] == hashlib.md5(b"ijk").hexdigest()[:8]


def test_decode_image_import_gate():
    """Without Pillow the stub raises loudly; with Pillow it decodes a
    real 1x1 PNG. Both branches asserted wherever they apply — the gate
    itself is the contract (no silent no-op either way)."""
    import pytest

    from mqtt_streamr_spark.operators import multimodal as M

    # deterministic 1x1 red PNG, hand-assembled (no image lib needed)
    import base64

    png = base64.b64decode(
        b"iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4"
        b"nGP4z8DwHwAFBQIAX8jx0gAAAABJRU5ErkJggg=="
    )
    if M._pil_image is None:
        with pytest.raises(NotImplementedError, match="Pillow"):
            M.decode_image(png)
    else:  # pragma: no cover - container has no Pillow
        img = M.decode_image(png)
        assert img.size == (1, 1)


def test_decode_audio_import_gate():
    import pytest

    from mqtt_streamr_spark.operators import multimodal as M

    if M._soundfile is None:
        with pytest.raises(NotImplementedError, match="soundfile"):
            M.decode_audio(b"RIFF....WAVE")
    else:  # pragma: no cover - container has no soundfile
        import io
        import struct
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(struct.pack("<4h", 0, 1000, -1000, 0))
        data, rate = M.decode_audio(buf.getvalue())
        assert rate == 8000 and len(data) == 4


# --- production hash family (xxhash64) ---------------------------------------

def _sf_docs(spark):
    from tests.conftest import SF_SMOKE
    import os

    return spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))


@pytest.mark.slow  # r12 slow tier: corpus/recall sweep
def test_xxhash_family_pair_recall_equivalent(spark):
    """md5 and xxhash64 MinHash families must find the SAME verified
    near-dup pairs on the fixture corpus: verification is exact Jaccard
    either way, so any difference would be a candidate-recall gap."""
    docs = _sf_docs(spark)
    md5_pairs = {
        (r["id_a"], r["id_b"])
        for r in D.near_dup_pairs(docs, threshold=0.5).collect()
    }
    xx_pairs = {
        (r["id_a"], r["id_b"])
        for r in D.near_dup_pairs(
            docs, threshold=0.5, hash_family="xxhash64"
        ).collect()
    }
    assert md5_pairs, "fixture corpus must contain near-dups"
    assert md5_pairs == xx_pairs


@pytest.mark.slow  # r12 slow tier: corpus/recall sweep
def test_xxhash_family_ngram_recall_equivalent(spark):
    docs = _sf_docs(spark)
    md5_pairs = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.6).collect()
    }
    xx_pairs = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(
            docs, threshold=0.6, hash_family="xxhash64"
        ).collect()
    }
    assert md5_pairs == xx_pairs


def test_winnowing_xxhash_family_guarantee(spark):
    """The winnowing guarantee (any match of length >= w+k-1 shares a
    fingerprint) holds per family; identical prefixes must overlap in
    both, and exact-duplicate docs fingerprint identically."""
    rows = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "the quick brown fox jumps over the lazy dog tonight"),
         (3, "the quick brown fox leaps over the lazy dog tonight"),
         (4, "zzz completely unrelated words qqq xyzzy plugh")],
        "doc_id long, text string",
    )
    for fam in ("md5", "xxhash64"):
        got = {
            r["doc_id"]: set(r["fps"])
            for r in rows.select(
                "doc_id",
                T.winnowing_fingerprints("text", hash_family=fam).alias("fps"),
            ).collect()
        }
        assert got[1] == got[2], fam                    # identical docs
        assert got[1] & got[3], fam                     # long shared spans
        assert not (got[1] & got[4]), fam               # unrelated docs


def test_chunk_token_windows_boundaries(spark):
    rows = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))],  # 10 tokens
        "doc_id long, text string",
    )
    got = rows.select(
        T.chunk_token_windows("text", chunk=4, overlap=1).alias("c")
    ).collect()[0]["c"]
    # step=3, starts while start <= 10-1: 1,4,7 -> windows of 4 (last short)
    assert got == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9",
    ], got
    # short doc: single chunk, no empty windows
    short = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    got2 = short.select(
        T.chunk_token_windows("text", chunk=4, overlap=1).alias("c")
    ).collect()[0]["c"]
    assert got2 == ["a b"], got2


def test_pii_scrub_redacts_all_kinds(spark):
    rows = spark.createDataFrame(
        [(1, "mail a.b+c@ex.co, ip 10.0.0.1, call +44 20 7946 0958 now")],
        "doc_id long, text string",
    )
    got = rows.select(T.pii_scrub("text").alias("s")).collect()[0]["s"]
    assert got == "mail [EMAIL], ip [IPV4], call [PHONE] now", got


def test_ivf_multiprobe_recall_monotone(spark):
    """More probed cells => candidate superset => recall vs exact top-k
    can only improve."""
    import os

    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    seeds = [1, 2, 3, 4, 5, 6, 7, 8]
    exact = {
        r["vec_id"]
        for r in S.cosine_topk(
            emb, S.query_vector(emb, 0), k=10
        ).collect()
    }
    recalls = []
    for nprobe in (1, 3, 8):
        got = {
            r["vec_id"]
            for r in S.ann_topk_ivf(
                emb, query_id=0, centroid_ids=seeds, k=10, nprobe=nprobe
            ).collect()
        }
        recalls.append(len(got & exact))
    assert recalls == sorted(recalls), recalls      # monotone in nprobe
    assert recalls[-1] == 10, recalls               # all cells = exact


def test_split_label_stable_and_proportional(spark):
    docs = _sf_docs(spark)
    a = docs.select("doc_id", T.split_label("doc_id").alias("s")).collect()
    b = docs.repartition(7).select(
        "doc_id", T.split_label("doc_id").alias("s")
    ).collect()
    # stability: same assignment regardless of partitioning/order
    assert {r["doc_id"]: r["s"] for r in a} == {r["doc_id"]: r["s"] for r in b}
    from collections import Counter

    frac = Counter(r["s"] for r in a)
    n = len(a)
    assert 0.7 < frac["train"] / n < 0.9          # ~80%
    assert 0.04 < frac["val"] / n < 0.16          # ~10%
    assert 0.04 < frac["test"] / n < 0.16         # ~10%


def test_quantized_dot_close_to_exact(spark):
    import os

    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    nv = S.l2_normalize(F.col("embedding"))
    row = emb.select(
        S.dot(nv, nv).alias("exact"),
        S.dot_int8(S.quantize_int8(nv), S.quantize_int8(nv)).alias("q8"),
    ).collect()
    for r in row:
        # |error| bounded by quantization step: d * (1/127) * 2 approx
        assert abs(r["exact"] - r["q8"]) < 0.06, r


def test_winnowing_rows_matches_array_form(spark):
    """The relational winnowing formulation (explode + window min) must
    select EXACTLY the same fingerprint set per doc as the array-Column
    form, for both hash families — including boundary cases (doc shorter
    than k, doc shorter than w+k-1)."""
    rows = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "the quick brown fox leaps over the lazy dog tonight"),
         (3, "tiny"),                      # shorter than k=5 after norm
         (4, "sixchars"),                  # < w+k-1 = 8 hashes
         (5, "zzz completely unrelated words qqq xyzzy plugh")],
        "doc_id long, text string",
    )
    for fam in ("md5", "xxhash64"):
        arr = {
            r["doc_id"]: set(r["fps"])
            for r in rows.select(
                "doc_id",
                T.winnowing_fingerprints("text", hash_family=fam).alias("fps"),
            ).collect()
        }
        rel = {}
        for r in T.winnowing_fingerprint_rows(
            rows, "text", "doc_id", hash_family=fam
        ).collect():
            rel.setdefault(r["doc_id"], set()).add(r["wm"])
        assert arr == rel, fam


def test_connected_components_shapes(spark):
    """Label propagation must handle chains (diameter > 1), separate
    components, and transitive closure beyond direct pairs."""
    from mqtt_streamr_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (A~B, B~C, C~D but not A~D) + pair 10-11
        [(1, 2), (2, 3), (3, 4), (10, 11)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_converges_on_cycle(spark):
    from mqtt_streamr_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(5, 6), (6, 7), (7, 5)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == {5: 5, 6: 5, 7: 5}


def test_connected_components_long_chain(spark):
    """A 40-doc duplicate chain (diameter 39 > the 25-round cap) must
    still converge — pointer jumping makes round count O(log diameter),
    so the old one-hop propagation's silent mis-labeling (ADVICE r4)
    cannot recur."""
    from mqtt_streamr_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == {i: 1 for i in range(1, 41)}


def test_connected_components_raises_when_not_converged(spark):
    """Exhausting max_iterations must raise loudly, never return partial
    labels (wrong clusters are undetectable downstream)."""
    import pytest

    from mqtt_streamr_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=1)


def test_bm25_hand_computed(spark):
    """BM25 against hand-computed scores on a 3-doc corpus."""
    import math

    from mqtt_streamr_spark.operators.text import bm25_scores

    rows = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "dog dog dog dog"), (3, "bird fish")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_scores(rows, ["cat", "dog"]).collect()}

    n, avg_dl, k1, b = 3.0, 3.0, 1.2, 0.75

    def idf(df):
        return math.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def w(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avg_dl))

    want1 = round(idf(1) * w(2, 3) + idf(2) * w(1, 3), 6)
    want2 = round(idf(2) * w(4, 4), 6)
    assert got.keys() == {1, 2}          # doc 3 matches no query term
    assert abs(got[1] - want1) < 1e-6
    assert abs(got[2] - want2) < 1e-6


def test_kmeans_centroids_deterministic_and_trained(spark):
    """Lloyd refinement must be rerun-deterministic (bit-identical
    centroids thanks to the rounded means) and actually move the
    centroids off the raw seed vectors."""
    from mqtt_streamr_spark.operators.similarity import (
        kmeans_centroids,
        l2_normalize,
    )
    import pyspark.sql.functions as FN

    from mqtt_streamr_spark.tables import load

    emb = load(spark, "embeddings", "/root/testdata/sf0.001")
    seeds = [1, 2, 3, 4]
    a = {r["cid"]: tuple(r["cv"])
         for r in kmeans_centroids(emb, seeds, iterations=2).collect()}
    b = {r["cid"]: tuple(r["cv"])
         for r in kmeans_centroids(emb, seeds, iterations=2).collect()}
    assert a == b                       # bit-identical across reruns
    raw = {
        r["vec_id"]: tuple(r["nv"])
        for r in emb.filter(FN.col("vec_id").isin(seeds)).select(
            "vec_id", l2_normalize(FN.col("embedding")).alias("nv")
        ).collect()
    }
    moved = sum(1 for cid in seeds if a[cid] != raw[cid])
    assert moved >= len(seeds) - 1      # training moved the centroids
    # every centroid stays unit-length
    import math

    for cv in a.values():
        assert abs(math.sqrt(sum(x * x for x in cv)) - 1.0) < 1e-9


def test_kmeans_sample_fraction_deterministic(spark):
    """sample_fraction trains on a hash-sample: result must be (a)
    bit-identical across reruns AND repartitionings (hash-sample, not
    df.sample), (b) valid unit-length centroids for every seed even at a
    tiny fraction (seeds always retained in the sample), (c) generally
    different from full-corpus training (it really did subsample)."""
    import math

    import pytest

    from mqtt_streamr_spark.operators.similarity import kmeans_centroids
    from mqtt_streamr_spark.tables import load

    emb = load(spark, "embeddings", "/root/testdata/sf0.001")
    seeds = [1, 2, 3, 4]
    a = {r["cid"]: tuple(r["cv"])
         for r in kmeans_centroids(
             emb, seeds, iterations=2, sample_fraction=0.25).collect()}
    b = {r["cid"]: tuple(r["cv"])
         for r in kmeans_centroids(
             emb.repartition(13), seeds, iterations=2,
             sample_fraction=0.25).collect()}
    assert a == b                       # partitioning-independent
    assert set(a) == set(seeds)
    for cv in a.values():
        assert abs(math.sqrt(sum(x * x for x in cv)) - 1.0) < 1e-9
    full = {r["cid"]: tuple(r["cv"])
            for r in kmeans_centroids(emb, seeds, iterations=2).collect()}
    assert a != full                    # the sample actually constrained
    with pytest.raises(ValueError, match="sample_fraction"):
        kmeans_centroids(emb, seeds, sample_fraction=1.5)


def test_pack_sequences_budget_semantics(spark):
    """Packing invariants: consecutive docs share a pack until the budget
    would be crossed; an oversized doc occupies its own pack span; packs
    are contiguous in order_col order."""
    from mqtt_streamr_spark.operators.text import pack_sequences

    rows = spark.createDataFrame(
        [(1, "a " * 400), (2, "b " * 400), (3, "c " * 400),
         (4, "d " * 2000),           # oversized: > 1024 alone
         (5, "e " * 100)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["pack_id"], r["n_toks"])
           for r in pack_sequences(rows, budget_tokens=1024).collect()}
    # docs 1+2 fit pack 0 (800 < 1024); doc 3 starts at cum 800 -> still
    # pack 0 (floor(800/1024)=0); doc 4 starts at cum 1200 -> pack 1;
    # doc 5 starts at cum 3200 -> pack 3 (the oversized doc spans packs
    # 1-2 arithmetically)
    assert got[1][0] == 0 and got[2][0] == 0 and got[3][0] == 0
    assert got[4][0] == 1
    assert got[5][0] == 3
    # pack ids never decrease in doc order
    ids = [got[i][0] for i in sorted(got)]
    assert ids == sorted(ids)


def test_decontaminate_flags_overlapping_docs(spark):
    # bench doc shares the 4-gram "the quick brown fox" (and more) with
    # docs 1 and 2; doc 3 is clean
    bench = spark.createDataFrame(
        [(100, "report: the quick brown fox jumps again")],
        "doc_id long, text string",
    )
    out = D.decontaminate(_df(spark), bench, n=4).collect()
    got = {r["doc_id"]: r["shared_grams"] for r in out}
    assert set(got) == {1, 2}
    # doc 1 shares "the quick brown fox", "quick brown fox jumps" -> 2
    assert got[1] == 2 and got[2] == 2

    # ground truth by plain Python
    def grams(text, n=4):
        t = py_tokens(text)
        return {" ".join(t[i:i + n]) for i in range(max(len(t) - n + 1, 1))}

    bg = grams("report: the quick brown fox jumps again")
    for doc_id, text in DOCS:
        expected = len(grams(text) & bg)
        assert got.get(doc_id, 0) == expected


def test_decontaminate_empty_benchmark(spark):
    bench = spark.createDataFrame([], "doc_id long, text string")
    assert D.decontaminate(_df(spark), bench, n=4).count() == 0


def test_gopher_flags_gate_semantics(spark):
    rows = [
        # 25 common words, clean -> passes everything
        (1, "the quick brown fox jumps over a lazy dog and then runs "
            "to the old barn in the field of green grass near a river"),
        # too short
        (2, "the a of to in is and"),
        # symbol-heavy: many # marks -> symbol gate fails (word count too)
        (3, "# ## ### #### " * 10 + "the a of to in is"),
        # numeric/non-alpha words -> alpha gate fails
        (4, " ".join(str(i) for i in range(30)) + " the a of to in"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", T.gopher_quality_flags("text").alias("g")
        ).collect()
    }
    assert out[1]["passes"]
    assert not out[2]["word_count_ok"] and not out[2]["passes"]
    assert not out[3]["symbol_ratio_ok"] and not out[3]["passes"]
    assert not out[4]["alpha_ratio_ok"] and not out[4]["passes"]
    assert out[1]["has_stopwords"] and out[4]["has_stopwords"]


def test_temperature_rebalance_shapes_mixture(spark):
    # 400 'big' docs vs 100 'small': alpha=0.5 -> keep_rate(big) =
    # (400/100)^-0.5 = 0.5, keep_rate(small) = 1.0; post-mix shares ~ 2:1
    rows = [(i, "big" if i < 400 else "small") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = T.temperature_rebalance(df, alpha=0.5, stratum_col="source")
    rates = {r["source"]: r["keep_rate"]
             for r in kept.select("source", "keep_rate").distinct().collect()}
    assert rates["big"] == 0.5 and rates["small"] == 1.0
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    # small stratum kept whole; big stratum ~half (hash-binomial, wide tol)
    assert counts["small"] == 100
    assert 150 <= counts["big"] <= 250

    # alpha=1 keeps the natural mixture (rate 1 everywhere)
    all_kept = T.temperature_rebalance(df, alpha=1.0, stratum_col="source")
    assert all_kept.count() == 500

    # deterministic across invocations
    ids1 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in T.temperature_rebalance(
            df, alpha=0.5, stratum_col="source"
        ).select("doc_id").collect()
    )
    assert ids1 == ids2


def test_unigram_logprob_hand_computed(spark):
    import math

    rows = [(1, "a a b"), (2, "b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           T.unigram_logprob_score(df).collect()}
    # corpus tf: a=2, b=2, c=1, T=5
    lp = {"a": math.log(2 / 5), "b": math.log(2 / 5), "c": math.log(1 / 5)}
    exp1 = round((lp["a"] + lp["a"] + lp["b"]) / 3, 4)
    exp2 = round((lp["b"] + lp["c"]) / 2, 4)
    assert out[1]["n_toks"] == 3 and out[1]["avg_logprob"] == exp1
    assert out[2]["n_toks"] == 2 and out[2]["avg_logprob"] == exp2
    # rare-token doc scores lower
    assert out[2]["avg_logprob"] < out[1]["avg_logprob"]


def test_token_entropy_hand_computed(spark):
    import math

    rows = [(1, "spam spam spam spam"),      # H = 0
            (2, "a b c d"),                   # uniform over 4 -> 2 bits
            (3, "x x y")]                     # H(2/3,1/3)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in T.token_entropy(df).collect()}
    assert out[1]["entropy_bits"] == 0.0 and out[1]["n_toks"] == 4
    assert out[2]["entropy_bits"] == 2.0
    want = round(-(2 / 3 * math.log2(2 / 3) + 1 / 3 * math.log2(1 / 3)), 4)
    assert out[3]["entropy_bits"] == want


def test_semantic_dedup_min_id_exemplar_survives(spark):
    # two coarse cells (seed vecs 10 and 20); 11 duplicates 10 exactly and
    # 21 duplicates 20 — each cluster's min id survives as the exemplar;
    # the orthogonal 12 shares a cell but is no one's near-dup
    rows = [
        (10, [1.0, 0.0, 0.0, 0.0]),
        (11, [1.0, 0.0, 0.0, 0.0]),
        (12, [0.0, 0.0, 1.0, 0.0]),
        (20, [0.0, 1.0, 0.0, 0.0]),
        (21, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r["is_dup"]
        for r in S.semantic_dedup(
            df, [10, 20], threshold=0.95, blocking="ivf"
        ).collect()
    }
    assert out == {10: False, 11: True, 12: False, 20: False, 21: True}


def test_semantic_dedup_lsh_default_blocking(spark):
    # default blocking is LSH buckets (the scale path): exact duplicates
    # always share a bucket (identical signatures), so the min-id
    # exemplar logic behaves as in the IVF variant without any centroids;
    # planes=None auto-sizes from a count
    rows = [
        (10, [1.0, 0.0, 0.0, 0.0]),
        (11, [1.0, 0.0, 0.0, 0.0]),
        (20, [0.0, 1.0, 0.0, 0.0]),
        (21, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r["is_dup"]
        for r in S.semantic_dedup(df, threshold=0.95, dim=4).collect()
    }
    assert out == {10: False, 11: True, 20: False, 21: True}
    with pytest.raises(ValueError):
        S.semantic_dedup(df, blocking="ivf")  # no centroids
    with pytest.raises(ValueError):
        S.semantic_dedup(df, blocking="nope")


def test_dup_passage_stats_hand_computed(spark):
    # docs 1 and 2 differ only in the last word: their shared 5-gram
    # shingles are exactly those not touching position 9; doc 3 shares none
    out = {
        r["doc_id"]: (r["n_shingles"], r["n_shared"], r["dup_frac"])
        for r in T.dup_passage_stats(_df(spark), n=5).collect()
    }
    sh = {i: py_shingles(t, n=5) for i, t in DOCS}
    for i, (n_sh, n_shared, frac) in out.items():
        others = set().union(*(set(sh[j]) for j in sh if j != i))
        exp_shared = sum(1 for s in sh[i] if s in others)
        assert n_sh == len(sh[i])
        assert n_shared == exp_shared
        assert frac == round(exp_shared / len(sh[i]), 4)
    assert out[3][1] == 0 and out[1][1] > 0


def test_ngram_repetition_hand_computed(spark):
    # "a a a b": bigrams = [a a, a a, a b] -> top 2/3, dup-mass 2/3;
    # "x y z w": all bigrams unique -> top 1/3, dup-mass 0
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z w")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["top_frac"], r["dup_frac"])
        for r in T.ngram_repetition(df, n=2).collect()
    }
    assert out[1] == (3, round(2 / 3, 4), round(2 / 3, 4))
    assert out[2] == (3, round(1 / 3, 4), 0.0)


def test_ngram_repetition_profile_matches_per_n(spark):
    # the single-pass multi-n profile must agree with the one-n operator
    # for every n, doc by doc (hashed gram keys change nothing but the
    # shuffle width), and keep_cols must ride along unchanged
    df = spark.createDataFrame(
        [(1, "a a a b", "web"), (2, "x y z w", "book"),
         (3, "p q p q p q", "web"), (4, "lone", "book")],
        "doc_id long, text string, source string",
    )
    prof = {
        r["doc_id"]: r.asDict()
        for r in T.ngram_repetition_profile(
            df, ns=(2, 3), keep_cols=("source",)
        ).collect()
    }
    for n in (2, 3):
        single = {
            r["doc_id"]: r
            for r in T.ngram_repetition(df, n=n).collect()
        }
        for doc_id, row in single.items():
            assert prof[doc_id][f"n{n}_grams"] == row["n_grams"]
            assert prof[doc_id][f"top{n}_frac"] == row["top_frac"]
            assert prof[doc_id][f"dup{n}_frac"] == row["dup_frac"]
    assert prof[1]["source"] == "web" and prof[4]["source"] == "book"


def test_hashed_linear_score_matches_python(spark):
    # ground truth from hashlib, independent of both engines
    import math

    def py_score(text):
        toks = py_tokens(text)
        ws = [
            (int(hashlib.md5(f"qw:{t}".encode()).hexdigest()[:8], 16)
             / 0xFFFFFFFF) * 2 - 1
            for t in toks
        ]
        return round(1.0 / (1.0 + math.exp(-(sum(ws) / len(ws)))), 6)

    out = {
        r["doc_id"]: r["s"]
        for r in _df(spark)
        .select("doc_id", T.hashed_linear_score("text").alias("s"))
        .collect()
    }
    for i, t in DOCS:
        assert abs(out[i] - py_score(t)) < 1e-9, (i, out[i], py_score(t))


def test_bpe_pair_stats_hand_computed(spark):
    # vocab: aa(x2), ab, b -> pairs: 'aa' weight 2 (from both 'aa' tokens),
    # 'ab' weight 1; single-char 'b' contributes nothing
    df = spark.createDataFrame(
        [(1, "aa ab"), (2, "aa b")], "doc_id long, text string"
    )
    out = [(r["pair"], r["total"]) for r in T.bpe_pair_stats(df).collect()]
    assert out == [("aa", 2), ("ab", 1)]


def test_weighted_sample_topk_matches_python(spark):
    import math

    rows = [(i, "s" if i % 2 else "t", 10 + i * 7) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    got = sorted(
        (r["lang"], r["doc_id"])
        for r in T.weighted_sample_topk(
            df, weight_col="w", k=3, stratum_col="lang"
        ).collect()
    )

    def key(i, w):
        u = (int(hashlib.md5(f"ws|{i}".encode()).hexdigest()[:8], 16)
             + 1.0) / 2**32
        return round(math.log(u) / w, 6)

    exp = []
    for lang in ("s", "t"):
        members = [(i, w) for i, g, w in rows if g == lang]
        top = sorted(members, key=lambda p: (-key(*p), p[0]))[:3]
        exp += [(lang, i) for i, _ in top]
    assert got == sorted(exp)


def test_vocab_coverage_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b c")], "doc_id long, text string"
    )
    r = T.vocab_coverage(df, ks=(1, 2)).collect()[0]
    # freqs: a=4, b=2, c=1 -> total 7; top1 covers 4/7, top2 covers 6/7
    assert (r["n_terms"], r["total_tokens"]) == (3, 7)
    assert r["cov_top1"] == round(4 / 7, 6)
    assert r["cov_top2"] == round(6 / 7, 6)


def test_reduce_dims_matches_numpy_projection(spark):
    import numpy as np

    from mqtt_streamr_spark.operators import similarity as S

    vec = [float(i) for i in range(16)]
    df = spark.createDataFrame([(1, vec)],
                               "vec_id long, embedding array<float>")
    got = S.reduce_dims(df, out_dim=4, in_dim=16).collect()[0]["reduced"]
    R = np.array(S.projection_matrix(4, 16))
    want = R @ np.array(vec)
    assert np.allclose(got, want)


def test_reduce_dims_dim_mismatch_errors(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from mqtt_streamr_spark.operators import similarity as S

    df = spark.createDataFrame([(1, [1.0, 2.0])],
                               "vec_id long, embedding array<float>")
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                       match="in_dim"):
        S.reduce_dims(df, out_dim=2, in_dim=16).collect()


def test_encode_tokens_ids_and_order(spark):
    """Vocab ids follow freq-desc/term-asc ranks; OOV terms hash above
    vocab_size; position order is preserved in the output array."""
    from mqtt_streamr_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "b b a zzz a b"), (2, "a c b")],
        "doc_id long, text string",
    )
    # freqs: b=4, a=3, c=1, zzz=1 -> ids b=0, a=1, c=2 (vocab_size=3)
    vocab = T.build_vocab(df, vocab_size=3)
    v = {r["term"]: r["token_id"] for r in vocab.collect()}
    assert v == {"b": 0, "a": 1, "c": 2}
    oov = 3 + int(hashlib.md5(b"zzz").hexdigest()[:8], 16) % 16
    enc = {r["doc_id"]: list(r["token_ids"])
           for r in T.encode_tokens(df, vocab, vocab_size=3,
                                    oov_buckets=16).collect()}
    assert enc[1] == [0, 0, 1, oov, 1, 0]
    assert enc[2] == [1, 2, 0]


def test_incremental_dedup_finds_cross_pair_only(spark):
    """Batch docs match only CORPUS near-dups: the planted batch-batch
    duplicate must NOT appear (that's the next batch's problem), and a
    clean batch doc yields no row."""
    from mqtt_streamr_spark.operators import dedup as D

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy cat"),  # vs corpus 1
         (11, "the quick brown fox jumps over the lazy cats"),  # ~ doc 10
         (12, "completely unrelated content entirely here now")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in D.near_dups_against_corpus(
        batch, corpus, threshold=0.5).collect()}
    assert set(rows) == {10, 11}
    assert rows[10]["n_corpus_dups"] == 1
    assert 0.5 <= rows[10]["max_sim"] <= 1.0


def test_resize_image_mime_without_pillow_falls_back(spark):
    """With Pillow absent an image/* blob still flows through the
    deterministic fallback (never a crash, never a silent skip)."""
    from mqtt_streamr_spark.operators import multimodal as M

    if M._pil_image is not None:  # pragma: no cover - container has none
        import pytest

        pytest.skip("Pillow installed; real branch covered elsewhere")
    df = spark.createDataFrame(
        [(1, b"\x89PNG-fake-bytes", "image/png")],
        "content_id long, media binary, mime string",
    )
    row = M.resize_media(df, target_w=2, target_h=2).collect()[0]
    assert row["out_chars"] <= 4 and row["out_sha"]


def test_frequent_terms_exact_regardless_of_partitioning(spark):
    """The MG candidate pass is partitioning-dependent, but the verify
    pass must make the result EXACT: any repartitioning returns exactly
    the terms >= min_support, with exact counts."""
    import pyspark.sql.functions as F

    from mqtt_streamr_spark.operators.text import frequent_terms

    rows = (
        [("hot " * 40).strip()] * 5          # 200 occurrences of 'hot'
        + [f"rare{i} word word" for i in range(50)]  # 100 'word', 50 rares
    )
    df = spark.createDataFrame([(t,) for t in rows], "text string")
    # total tokens = 200 + 150; support 0.1 -> {hot: 200, word: 100}
    for parts in (1, 7):
        got = {
            r["term"]: r["cnt"]
            for r in frequent_terms(
                df.repartition(parts), min_support=0.1, counters=16
            ).collect()
        }
        assert got == {"hot": 200, "word": 100}, got

    import pytest as _pytest

    with _pytest.raises(ValueError):
        frequent_terms(df, min_support=0.001, counters=16)
    # the exact boundary is ALSO rejected: completeness needs strict
    # inequality (a term at exactly n_p/(counters+1) per partition can be
    # dropped by every MG pass yet pass the inclusive verify filter)
    with _pytest.raises(ValueError):
        frequent_terms(df, min_support=1.0 / 17, counters=16)


def test_cdc_chunk_hashes_properties(spark):
    """Content-defined chunking invariants (r9): identical docs chunk
    identically; an INSERTION far from a shared suffix leaves the
    suffix's chunks intact (boundaries are content-local — the property
    fixed-size blocking lacks); chunks reassemble the whole text (every
    character is in exactly one chunk: hashing the chunk list is
    equivalent to hashing a partition of the normalized text); empty and
    shorter-than-k docs yield a single chunk or none."""
    base = ("the quick brown fox jumps over the lazy dog tonight and "
            "every shard of this corpus repeats boilerplate text that "
            "content defined chunking should isolate into stable chunks")
    rows = spark.createDataFrame(
        [(1, base),
         (2, base),
         (3, "INSERTED PREFIX WORDS " + base),
         (4, ""),
         (5, "tiny")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: list(r["chs"])
        for r in rows.select(
            "doc_id", T.cdc_chunk_hashes("text").alias("chs")
        ).collect()
    }
    assert got[1] == got[2]                      # deterministic
    # content-locality: the shared tail's chunks survive the insertion
    # (at least the final chunk is byte-identical in both chunkings)
    assert set(got[1]) & set(got[3])
    assert got[4] == []                          # empty doc, no chunks
    assert len(got[5]) == 1                      # shorter than k: one chunk
    # partition property: chunk count == boundary count + 1 for any doc
    # with content; recompute boundaries in Python with the same rule
    import hashlib

    def md5l(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    s = " ".join(base.lower().split())
    cuts = [0] + sorted({i + 7 for i in range(1, len(s) - 6)
                         if md5l(s[i - 1:i + 7]) % 64 == 0} | {len(s)})
    expect = [md5l(s[a:b]) for a, b in zip(cuts, cuts[1:])]
    assert got[1] == expect


def test_cdc_clamped_chunks_match_python_recompute(spark):
    """FastCDC-style clamps (r9): min_len skips cuts too close to the
    previous KEPT cut; max_len forces cuts every max_len chars inside
    over-long gaps; the tail cut always survives. Recomputed exactly in
    Python over the same rules."""
    import hashlib

    def md5l(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def py_cdc(text, k=8, divisor=64, min_len=None, max_len=None):
        import re
        # Spark split(\s+) KEEPS leading/trailing empty tokens (so does
        # the DuckDB oracle's string_split_regex) — mirror that, not
        # Python str.split()'s empty-dropping
        s = " ".join(re.split(r"\s+", text.lower()))
        n = len(s)
        cand = sorted({i + k - 1 for i in range(1, max(n - k + 1, 0) + 1)
                       if n >= k and md5l(s[i - 1:i + k - 1]) % divisor == 0}
                      | ({n} if True else set()))
        cuts = [0] + [c for c in cand if c != 0] + ([n] if n not in cand else [])
        cuts = sorted(set(cuts))
        if min_len is not None and n > 0:
            kept = [0]
            for c in cuts[1:]:
                if c - kept[-1] >= min_len:
                    kept.append(c)
            if kept[-1] != n:
                kept.append(n)
            cuts = kept
        if max_len is not None and len(cuts) >= 2:
            forced = []
            for lo, hi in zip(cuts, cuts[1:]):
                if hi - lo > max_len:
                    forced.extend(range(lo + max_len, hi, max_len))
            cuts = sorted(set(cuts) | set(forced))
        return [md5l(s[a:b]) for a, b in zip(cuts, cuts[1:])]

    texts = [
        (1, "the quick brown fox jumps over the lazy dog tonight and "
            "every shard of this corpus repeats boilerplate text that "
            "content defined chunking should isolate into stable chunks"),
        (2, "x" * 300),        # boundary-free: max clamp must force cuts
        (3, "tiny"),
        (4, ""),
        (5, "word " * 60),     # repetitive: boundary-dense candidate set
    ]
    rows = spark.createDataFrame(texts, "doc_id long, text string")
    for kw in ({"min_len": 24}, {"max_len": 80},
               {"min_len": 24, "max_len": 80}):
        got = {
            r["doc_id"]: list(r["chs"])
            for r in rows.select(
                "doc_id", T.cdc_chunk_hashes("text", **kw).alias("chs")
            ).collect()
        }
        for doc_id, text in texts:
            assert got[doc_id] == py_cdc(text, **kw), (doc_id, kw)
        # max clamp bound actually holds: recompute chunk LENGTHS
        if "max_len" in kw:
            assert got[2] and len(got[2]) >= 300 // 80


def test_ivf_recall_curve_matches_pointwise_probes(spark):
    """The r10 recall/cost curve must agree with per-width ann_topk_ivf
    probes (same assignment, same tie-breaks) and be monotone in BOTH
    recall and candidate count; probing every cell is exact search."""
    import os

    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    seeds = [1, 2, 3, 4, 5, 6, 7, 8]
    curve = {
        r["nprobe"]: r
        for r in S.ivf_recall_curve(
            emb, query_id=0, centroid_ids=seeds, k=10, nprobes=(1, 2, 8)
        ).collect()
    }
    exact = {
        r["vec_id"]
        for r in S.cosine_topk(emb, S.query_vector(emb, 0), k=10).collect()
    }
    for np_ in (1, 2, 8):
        got = {
            r["vec_id"]
            for r in S.ann_topk_ivf(
                emb, query_id=0, centroid_ids=seeds, k=10, nprobe=np_
            ).collect()
        }
        assert curve[np_]["n_hits"] == len(got & exact), np_
    hits = [curve[n]["n_hits"] for n in (1, 2, 8)]
    cands = [curve[n]["n_candidates"] for n in (1, 2, 8)]
    assert hits == sorted(hits), hits
    assert cands == sorted(cands) and cands[0] < cands[-1], cands
    assert curve[8]["n_hits"] == 10          # all cells probed == exact
    assert curve[8]["recall"] == 1.0


def test_cdc_chunk_overlap_insertion_robust(spark):
    """THE property cdc_chunk_overlap exists for: a doc that is an
    earlier doc plus an inserted sentence still shares most of its CDC
    chunks (boundaries are content-local), so it is flagged — while an
    unrelated doc is not. A fixed-block scheme would shift every block
    after the insertion point and miss the overlap."""
    base = " ".join(f"w{i % 97}token{(i * 7) % 31}" for i in range(400))
    words = base.split()
    inserted = " ".join(
        words[:200] + ["brand", "new", "inserted", "sentence", "here"]
        + words[200:])
    unrelated = " ".join(f"z{i % 89}other{(i * 11) % 37}"
                         for i in range(400))
    df = spark.createDataFrame(
        [(1, base), (2, inserted), (3, unrelated)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r
            for r in D.cdc_chunk_overlap(df, threshold=0.5).collect()}
    assert rows[1]["shared_chunks"] == 0          # earliest owner
    assert not rows[1]["is_dup"]
    assert rows[2]["share_frac"] > 0.5 and rows[2]["is_dup"], rows[2]
    assert rows[3]["shared_chunks"] == 0 and not rows[3]["is_dup"]


def test_planes_for_recall_pick_rules(spark):
    """planes_for_recall (r11, VERDICT r10 #5): the pick is the LARGEST
    plane count whose measured mean recall clears the target (cheapest
    adequate buckets), falling back to the smallest plane count when
    nothing clears it; the returned curve is monotone in candidate
    count (more planes = smaller buckets)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pick, curve = S.planes_for_recall(
        emb, 0.05, query_ids=[0, 31, 142, 333], planes_list=(1, 2, 3))
    rows = {r["planes"]: r for r in curve.collect()}
    assert set(rows) == {1, 2, 3}
    cands = [rows[p]["total_candidates"] for p in (1, 2, 3)]
    assert cands == sorted(cands, reverse=True), cands
    meeting = [p for p in (1, 2, 3) if rows[p]["mean_recall"] >= 0.05]
    assert pick == (max(meeting) if meeting else 1)
    # an unreachable target falls back to the smallest (highest-recall)
    pick_hi, _ = S.planes_for_recall(
        emb, 1.01, query_ids=[0, 31], planes_list=(2, 3))
    assert pick_hi == 2


def test_nprobe_for_recall_pick_rules(spark):
    """nprobe_for_recall (r11, the IVF mirror of planes_for_recall):
    recall rises with nprobe while candidates grow, so the pick is the
    SMALLEST nprobe whose measured mean recall clears the target,
    falling back to the largest when nothing does; the curve is
    monotone non-decreasing in candidate count AND recall."""
    from mqtt_streamr_spark.queries.llm_pipeline import _IVF_SEEDS

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pick, curve = S.nprobe_for_recall(
        emb, 0.3, centroid_ids=_IVF_SEEDS,
        query_ids=[0, 31, 142, 333], nprobes=(1, 2, 4))
    rows = {r["nprobe"]: r for r in curve.collect()}
    assert set(rows) == {1, 2, 4}
    cands = [rows[n]["total_candidates"] for n in (1, 2, 4)]
    assert cands == sorted(cands), cands
    recalls = [rows[n]["mean_recall"] for n in (1, 2, 4)]
    assert recalls == sorted(recalls), recalls
    meeting = [n for n in (1, 2, 4) if rows[n]["mean_recall"] >= 0.3]
    assert pick == (min(meeting) if meeting else 4)
    # unreachable target falls back to the largest (highest-recall)
    pick_hi, _ = S.nprobe_for_recall(
        emb, 1.01, centroid_ids=_IVF_SEEDS, query_ids=[0, 31],
        nprobes=(1, 2))
    assert pick_hi == 2


def test_relational_pick_flags_match_collecting_helpers(spark):
    """The sim_planes_for_recall / sim_nprobe_for_recall demo queries
    (r11 opt) compute the pick as a window aggregate over the curve
    instead of collect-then-rerun; the flagged row must be exactly the
    helper's pick — including the fallback branch when nothing clears
    the target (both queries run against an sf where recall CAN clear,
    so force the fallback here with target > 1). ADVICE r11: exercises
    the PRODUCTION expression (S.recall_pick_flag — the same call the
    registered queries make), not an inline restatement of the rule."""
    from mqtt_streamr_spark.queries.llm_pipeline import _IVF_SEEDS

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for target in (0.05, 1.01):
        pick, curve = S.planes_for_recall(
            emb, target, query_ids=[0, 31], planes_list=(1, 2, 3))
        flagged = {r["planes"] for r in curve.withColumn(
            "picked", S.recall_pick_flag("planes", target, "largest")
        ).collect() if r["picked"]}
        assert flagged == {pick}, (target, flagged, pick)
    for target in (0.3, 1.01):
        pick, curve = S.nprobe_for_recall(
            emb, target, centroid_ids=_IVF_SEEDS, query_ids=[0, 31],
            nprobes=(1, 2, 4))
        flagged = {r["nprobe"] for r in curve.withColumn(
            "picked", S.recall_pick_flag("nprobe", target, "smallest")
        ).collect() if r["picked"]}
        assert flagged == {pick}, (target, flagged, pick)


def test_lsh_bucket_adaptive_caps_hot_blocks(spark):
    """lsh_bucket_adaptive (r11): base buckets over the cap re-block at
    the FULL (planes+extra)-bit signature, cold buckets keep the base
    key; every deep cid extends its base prefix; the partition stays a
    partition (row count preserved, every vector in exactly one block);
    and semantic_dedup(bucket_cap=...) flags exactly the vectors with a
    smaller-id >= threshold neighbor INSIDE their adaptive block."""
    import pyspark.sql.functions as F

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    planes, cap, extra = 4, 30, 4
    a = S.lsh_bucket_adaptive(emb, planes, cap, extra=extra)
    rows = a.select("vec_id", "cid").collect()
    assert len(rows) == emb.count()
    by_len = {}
    for r in rows:
        by_len.setdefault(len(r["cid"]), []).append(r["cid"])
    assert set(by_len) == {planes, planes + extra}
    # deep blocks extend a base bucket that really was hot
    base_sizes = {}
    sig = S.lsh_bucket(F.col("embedding"), planes, 64)
    for r in emb.select(sig.alias("b")).groupBy("b").count().collect():
        base_sizes[r["b"]] = r["count"]
    deep_bases = {c[:planes] for c in by_len[planes + extra]}
    shallow = set(by_len[planes])
    assert all(base_sizes[b] > cap for b in deep_bases)
    assert all(base_sizes[b] <= cap for b in shallow)
    assert deep_bases.isdisjoint(shallow)
    # flag semantics inside the adaptive blocks
    flagged = {r["vec_id"]: r for r in S.semantic_dedup(
        emb, threshold=0.4, blocking="lsh", planes=planes,
        bucket_cap=cap, extra_planes=extra).collect()}
    import numpy as np

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float)
            for r in emb.collect()}
    cids = {r["vec_id"]: r["cid"] for r in a.collect()}
    for vid, r in flagged.items():
        nbrs = [o for o, c in cids.items()
                if c == cids[vid] and o < vid]
        va = vecs[vid] / np.linalg.norm(vecs[vid])
        has = any(
            round(float(np.dot(va, vecs[o] / np.linalg.norm(vecs[o]))), 6)
            >= 0.4
            for o in nbrs)
        assert r["is_dup"] == has, vid


def test_cdc_excise_boilerplate_splice(spark):
    """cdc_excise_boilerplate (r11, VERDICT r10 #4): a doc's shared CDC
    chunks are cut out while its unique content survives verbatim, the
    first owner keeps its copy intact, untouched docs round-trip, and
    the splice accounting (orig = clean + excised) balances. Oracle:
    recompute the expected clean text from the span/first-owner rule
    driver-side over the same cdc_chunk_spans output."""
    base = " ".join(f"w{i % 97}token{(i * 7) % 31}" for i in range(400))
    words = base.split()
    wrapped = " ".join(
        ["unique", "preamble", "first"] + words
        + ["plus", "a", "unique", "tail"])
    unrelated = " ".join(f"z{i % 89}other{(i * 11) % 37}"
                         for i in range(400))
    df = spark.createDataFrame(
        [(1, base), (2, wrapped), (3, unrelated)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r
            for r in D.cdc_excise_boilerplate(df).collect()}
    # first owner and the unrelated doc round-trip untouched
    assert rows[1]["clean_text"] == base and rows[1]["excised_spans"] == 0
    assert rows[3]["clean_text"] == unrelated
    # the wrapper doc lost bytes but kept its unique affixes
    r2 = rows[2]
    assert r2["excised_spans"] > 0 and r2["excised_chars"] > 0
    assert r2["clean_text"].startswith("unique preamble first")
    assert r2["clean_text"].endswith("plus a unique tail")
    # accounting balances for every doc
    for r in rows.values():
        assert r["orig_chars"] == r["clean_chars"] + r["excised_chars"]
    # independent recompute of doc 2's clean text from spans+first-owner
    spans = {r["doc_id"]: r["sp"] for r in df.select(
        "doc_id", T.cdc_chunk_spans("text").alias("sp")).collect()}
    owner = {}
    for did in sorted(spans):
        for s in spans[did]:
            owner.setdefault(s["h"], did)
    s2 = " ".join(wrapped.lower().split())
    expect = "".join(
        s2[s["cstart"]:s["cend"]]
        for s in spans[2] if owner[s["h"]] >= 2)
    assert r2["clean_text"] == expect


def test_cdc_chunk_spans_align_with_hashes_and_lengths(spark):
    """cdc_chunk_spans must be 1:1 with cdc_chunk_hashes /
    cdc_chunk_lengths (same cuts, same hash, span width == length), with
    contiguous spans starting at 0 — the invariant that makes the
    boilerplate-span report's ranges trustworthy."""
    texts = [
        (1, " ".join(f"w{i % 53}tok{(i * 3) % 17}" for i in range(300))),
        (2, "short text"),
        (3, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rows = df.select(
        "doc_id",
        T.cdc_chunk_hashes("text").alias("hs"),
        T.cdc_chunk_lengths("text").alias("ls"),
        T.cdc_chunk_spans("text").alias("sp"),
    ).collect()
    for r in rows:
        assert [s["h"] for s in r["sp"]] == list(r["hs"])
        assert [s["cend"] - s["cstart"] for s in r["sp"]] == list(r["ls"])
        pos = 0
        for s in r["sp"]:
            assert s["cstart"] == pos
            pos = s["cend"]


def test_lsh_probe_buckets_hamming_ball(spark):
    """lsh_probe_buckets must enumerate exactly the Hamming ball: 1 +
    planes strings at radius 1, plus C(planes,2) at radius 2, each at
    the right distance from the base signature — the partition keys the
    multiprobe scan prunes on."""
    from itertools import combinations

    df = spark.createDataFrame([("10110101",)], "b string")
    for radius, expect_n in ((0, 1), (1, 9), (2, 9 + 28)):
        got = df.select(
            S.lsh_probe_buckets(F.col("b"), 8, radius).alias("p")
        ).collect()[0]["p"]
        assert len(got) == expect_n, (radius, len(got))
        assert len(set(got)) == expect_n  # all distinct
        base = "10110101"
        for s in got:
            d = sum(a != b for a, b in zip(s, base))
            assert d <= radius and len(s) == 8, (s, d)
        # and the ball is complete at radius 1
        if radius == 1:
            flips = {base[:i] + ("0" if base[i] == "1" else "1")
                     + base[i + 1:] for i in range(8)}
            assert set(got) == flips | {base}


def test_lsh_multiprobe_curve_matches_per_radius(spark):
    """lsh_multiprobe_recall_curve (r11 single-pass rewrite) must equal
    the per-radius lsh_multiprobe_recall union row-for-row — same
    candidate counts, same top-k tie-breaks, same recall — and the
    tagged probe set must tag every probe with its true Hamming
    distance (what makes ham<=r equivalent to the per-radius join)."""
    import os

    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    per_radius = None
    for r in (0, 1, 2):
        d = S.lsh_multiprobe_recall(emb, query_id=0, k=5, planes=6, radius=r)
        per_radius = d if per_radius is None else per_radius.unionByName(d)
    want = sorted(map(tuple, per_radius.collect()))
    got = sorted(map(tuple, S.lsh_multiprobe_recall_curve(
        emb, query_id=0, k=5, planes=6, radii=(0, 1, 2)).collect()))
    assert got == want
    # tag correctness: ham == Hamming distance from the base signature
    tagged = spark.createDataFrame([("101101",)], "b string").select(
        F.explode(
            S.lsh_probe_buckets_tagged(F.col("b"), 6, 2)).alias("p")
    ).collect()
    for row in tagged:
        d = sum(a != b for a, b in zip(row["p"]["bucket"], "101101"))
        assert d == row["p"]["ham"]


def test_near_dup_candidates_matches_selfjoin_reference(spark):
    """The r12 candidate generation (one groupBy(band_key) +
    array_sort(collect_list) + in-bucket pair explode) must emit exactly
    the pair set of the shape it replaced — the bucket SELF-join with
    id_a < id_b + distinct — on real corpus rows."""
    from mqtt_streamr_spark.operators.dedup import (
        lsh_band_keys,
        near_dup_candidates,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = {(r["id_a"], r["id_b"])
           for r in near_dup_candidates(docs).collect()}
    keyed = docs.select(
        F.col("doc_id"),
        F.explode(lsh_band_keys("text", 4, 2, hash_family="md5"))
        .alias("band_key"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    ref = {(r["id_a"], r["id_b"]) for r in (
        a.join(b, "band_key")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"))
        .distinct()
    ).collect()}
    assert got == ref
    assert got, "candidate set must be non-empty on this corpus"


def test_clamped_chunks_matches_three_frame_reference(spark):
    """The r12 single-derivation rewrite of text_cdc_clamped_chunks (one
    cdc_chunk_spans pass, per-doc stats folded map-side, doc-level sums
    riding the pos==0 row) must emit exactly the rows of the shape it
    replaced: hashes exploded for per-doc counts + per-source distinct,
    plus a separate cdc_chunk_lengths frame for the max-clamp witness."""
    from mqtt_streamr_spark.queries.llm_pipeline import (
        text_cdc_clamped_chunks,
    )
    from mqtt_streamr_spark.tables import load, spread

    sf = "/root/testdata/sf0.01"
    docs = spread(load(spark, "documents", sf))
    ch = docs.select(
        "doc_id", "source",
        F.explode(
            T.cdc_chunk_hashes("text", min_len=24, max_len=120)
        ).alias("h"))
    per_doc = ch.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_chunks"))
    lens = docs.select(
        "doc_id",
        F.explode(
            T.cdc_chunk_lengths("text", min_len=24, max_len=120)
        ).alias("l"),
    ).groupBy("doc_id").agg(F.max("l").alias("max_l"))
    chunk_stats = ch.groupBy("source").agg(
        F.countDistinct("h").alias("distinct_chunks"))
    ref = (
        per_doc.join(lens, "doc_id").groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chunks").alias("total_chunks"),
            F.max("max_l").cast("long").alias("max_chunk_len"))
        .join(chunk_stats, "source")
        .select("source", "n_docs", "total_chunks",
                "distinct_chunks", "max_chunk_len"))
    got = text_cdc_clamped_chunks(spark, sf)
    assert got.schema == ref.schema
    got_rows = sorted(map(tuple, got.collect()))
    ref_rows = sorted(map(tuple, ref.collect()))
    assert got_rows == ref_rows
    assert got_rows, "corpus must produce chunk stats"


def test_lsh_bucket_matches_per_plane_reference(spark):
    """The r12 low-round-trip builders (one _lit_matrix literal +
    sequence/transform generation) must produce bit-identical values to
    the per-plane / per-position Column-tree forms they replaced:
    lsh_bucket (concat of per-plane sign bits), reduce_dims (array of
    per-dim folds) and both probe builders (_flip_bit chains) — same
    strings, same doubles, same array order, same schema."""
    import os

    from itertools import combinations

    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))

    def old_lsh_bucket(vec, planes, dim=64):
        bits = []
        vd = S._as_double(vec)
        for p in range(planes):
            coeffs = F.array(*[F.lit(c)
                               for c in S.hyperplane_coeffs(p, dim)])
            d = F.aggregate(F.zip_with(vd, coeffs, lambda x, c: x * c),
                            F.lit(0.0), lambda acc, v: acc + v)
            bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    # planes 4 (near_dups/semantic_dedup), 8 (default), 12 (adaptive's
    # planes + extra deepening)
    for planes in (4, 8, 12):
        cmp = emb.select(
            old_lsh_bucket(F.col("embedding"), planes).alias("o"),
            S.lsh_bucket(F.col("embedding"), planes, 64).alias("n"))
        assert cmp.schema["o"].dataType == cmp.schema["n"].dataType
        assert cmp.filter(~F.col("o").eqNullSafe(F.col("n"))).count() == 0

    def old_reduce_dims(out_dim=8, in_dim=64):
        vd = S._as_double(F.col("embedding"))
        rows = S.projection_matrix(out_dim, in_dim)
        comps = []
        for j in range(out_dim):
            coeffs = F.array(*[F.lit(c) for c in rows[j]])
            comps.append(
                F.aggregate(F.zip_with(vd, coeffs, lambda x, c: x * c),
                            F.lit(0.0), lambda acc, v: acc + v))
        return emb.select(F.col("vec_id"), F.array(*comps).alias("o"))

    j = old_reduce_dims().join(
        S.reduce_dims(emb).withColumnRenamed("reduced", "n"), "vec_id")
    assert j.schema["o"].dataType == j.schema["n"].dataType
    assert j.filter(~F.col("o").eqNullSafe(F.col("n"))).count() == 0

    def old_probes(b, planes, radius, tagged):
        def tag(col, h):
            return F.struct(col.alias("bucket"), F.lit(h).alias("ham")) \
                if tagged else col
        probes = [tag(b, 0)]
        if radius >= 1:
            probes += [tag(S._flip_bit(b, i, planes), 1)
                       for i in range(1, planes + 1)]
        if radius >= 2:
            probes += [
                tag(S._flip_bit(S._flip_bit(b, i, planes), j2, planes), 2)
                for i, j2 in combinations(range(1, planes + 1), 2)]
        return F.array(*probes)

    buck = emb.select(S.lsh_bucket(F.col("embedding"), 8, 64).alias("b"))
    for radius in (0, 1, 2):
        for tagged, new_fn in ((False, S.lsh_probe_buckets),
                               (True, S.lsh_probe_buckets_tagged)):
            cmp = buck.select(
                old_probes(F.col("b"), 8, radius, tagged).alias("o"),
                new_fn(F.col("b"), 8, radius).alias("n"))
            assert (cmp.schema["o"].dataType == cmp.schema["n"].dataType), \
                (radius, tagged)
            assert cmp.filter(
                ~F.col("o").eqNullSafe(F.col("n"))).count() == 0, \
                (radius, tagged)


def test_cc_edge_explode_matches_union_reference(spark):
    """r12: connected_components derives both edge directions from ONE
    pass over the pair rows (2-array explode). Pin the edge multiset
    against the former union-of-two-projections reference, duplicates
    and self-loops included."""
    import pyspark.sql.functions as F

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 2), (4, 4)], "id_a long, id_b long")
    ref = pairs.select(
        F.col("id_a").alias("n"), F.col("id_b").alias("m")).union(
        pairs.select(F.col("id_b").alias("n"), F.col("id_a").alias("m")))
    got = pairs.select(F.explode(F.array(
        F.struct(F.col("id_a").alias("n"), F.col("id_b").alias("m")),
        F.struct(F.col("id_b").alias("n"), F.col("id_a").alias("m")),
    )).alias("e")).select(F.col("e.n").alias("n"), F.col("e.m").alias("m"))
    assert got.schema == ref.schema
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, ref.collect()))
