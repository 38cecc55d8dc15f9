"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for 100 TB from the start:
- exact dedup is a hash-groupBy on a fingerprint (one shuffle on a uniform
  md5 key — no skew by construction);
- MinHash-LSH turns all-pairs O(n^2) similarity into per-band bucket
  self-joins: shuffle on band keys only, candidates verified with exact
  Jaccard on the (tiny) candidate set;
- signatures are computed as pure Column folds over shingle arrays — no
  UDFs, no driver-side loops, no collect().

Hash family: minhash_i(doc) = lexicographic MIN of md5(i || '|' || shingle).
md5 hex is uniform and identical in Spark and DuckDB, which makes every
stage oracle-checkable; swap to xxhash64 for cheaper production hashing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from mqtt_streamr_spark.operators.text import fingerprint, shingles


def minhash_signature(text: Column | str, num_hashes: int = 8,
                      shingle_n: int = 3) -> list[Column]:
    """num_hashes independent MinHash values (hex-string min per family)."""
    sh = shingles(text, shingle_n)

    def family(i: int) -> Column:
        # bind i via function scope: pyspark infers lambda arity from the
        # signature, so a `lambda s, i=i` default would receive the array
        # INDEX as i, silently corrupting the hash family
        prefix = F.lit(f"{i}|")
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(prefix, s)))
        )

    return [family(i) for i in range(num_hashes)]


def lsh_band_keys(text: Column | str, bands: int = 4, rows: int = 2,
                  shingle_n: int = 3) -> list[Column]:
    """bands band keys (each the concat of `rows` minhash values). Two docs
    sharing any band key are near-dup candidates; P[candidate] follows the
    (1 - (1 - j^rows)^bands) S-curve."""
    sig = minhash_signature(text, bands * rows, shingle_n)
    return [
        F.concat_ws("|", F.lit(f"b{b}"), *sig[b * rows:(b + 1) * rows])
        for b in range(bands)
    ]


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


def jaccard(sh_a: Column, sh_b: Column) -> Column:
    """Exact Jaccard similarity of two shingle arrays."""
    inter = F.size(F.array_intersect(sh_a, sh_b))
    return inter / (F.size(sh_a) + F.size(sh_b) - inter).cast("double")


def near_dup_candidates(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", bands: int = 4,
                        rows: int = 2) -> DataFrame:
    """Candidate pairs from LSH buckets: explode band keys, self-join per
    bucket (id_a < id_b), distinct. The self-join shuffles on band keys —
    uniform md5-derived, so no inherent skew; a pathological bucket (many
    identical docs) is bounded by exact-dedup running first in a real
    pipeline."""
    keys = lsh_band_keys(text_col, bands, rows)
    keyed = df.select(
        F.col(id_col), F.explode(F.array(*keys)).alias("band_key")
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(b, "band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def near_dup_pairs(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", threshold: float = 0.5,
                   bands: int = 4, rows: int = 2,
                   shingle_n: int = 3) -> DataFrame:
    """LSH candidates verified with exact Jaccard >= threshold. Returns
    (id_a, id_b, jaccard_sim). Shingles are recomputed only for candidate
    ids (semi-joined), keeping the verify stage proportional to candidates,
    not corpus size."""
    cands = near_dup_candidates(df, text_col, id_col, bands, rows)
    sh = df.select(
        F.col(id_col).alias("sid"), shingles(text_col, shingle_n).alias("sh")
    )
    return (
        cands.join(sh.withColumnRenamed("sid", "id_a")
                   .withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("sid", "id_b")
              .withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", F.round("jaccard_sim", 6).alias("jaccard_sim"))
    )
