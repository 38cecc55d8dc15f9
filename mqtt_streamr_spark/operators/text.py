"""Text-analysis operators for LLM-data pipelines: tokenization, language-ID,
quality scoring, fingerprinting, shingling — all pure Column expressions
(whole-stage codegen, no UDFs), designed so the identical computation is
expressible in ANSI-ish SQL for the DuckDB oracle.

These have no analog in the reference (it transforms individual JSON
messages); they are the north-star extensions from BASELINE.json, built on
the same engine core.

Scale notes: every function here is embarrassingly parallel per row — at
100 TB the only shuffles are whatever aggregation the caller adds. Hash
choices (md5) are cross-engine deterministic for the correctness oracle;
at production scale xxhash64 would be the cheaper choice (one-line swap).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# small per-language stopword sets for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "es": ["el", "la", "los", "de", "y", "es", "que"],
    "fr": ["le", "les", "et", "est", "une", "dans", "que"],
}
_LANG_ORDER = ("en", "de", "es", "fr")  # deterministic tie-break order
_CJK_RE = r"[\x{4e00}-\x{9fff}]"


def let_bound(bound: Column, body) -> Column:
    """Let-binding for Column expressions: evaluate ``bound`` once and feed
    it to ``body`` as a lambda variable (HOF lambda bodies re-evaluate
    inline subtrees per use; a lambda variable binds exactly once)."""
    return F.element_at(F.transform(F.array(bound), body), 1)


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of lowercased text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """A BPE-like proxy count: word-piece-ish segments produced by splitting
    on non-alphanumerics AND counting ~4-char chunks of long words — a cheap,
    deterministic stand-in for tokenizer-based counting at scale."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.split(F.lower(c), r"[^a-z0-9]+")
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.when(F.length(w) == 0, F.lit(0).cast("long"))
        .otherwise(F.floor((F.length(w) + 3) / 4).cast("long")),
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the MinHash input set)."""
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def stopword_hits(text: Column | str, lang: str) -> Column:
    toks = tokens(text)
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(words, t)))


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: CJK codepoints -> zh, else the language whose
    stopword set scores the most hits (ties broken in _LANG_ORDER).
    Deterministic and SQL-expressible (the oracle repeats the formula)."""
    c = F.col(text) if isinstance(text, str) else text
    hits = {lang: stopword_hits(c, lang) for lang in _LANG_ORDER}
    # earlier language wins ties: en >= all later, else de >= later, ...
    chain = F.lit(_LANG_ORDER[-1])
    for i in range(len(_LANG_ORDER) - 2, -1, -1):
        lang = _LANG_ORDER[i]
        ge_all = F.lit(True)
        for later in _LANG_ORDER[i + 1:]:
            ge_all = ge_all & (hits[lang] >= hits[later])
        chain = F.when(ge_all, F.lit(lang)).otherwise(chain)
    return F.when(c.rlike(_CJK_RE), F.lit("zh")).otherwise(chain)


def digit_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    # empty text -> 0.0, not NULL (NULL would make quality_score NULL and
    # drop empty docs from BOTH sides of any threshold filter)
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(c, r"[^0-9]", "")) / F.length(c)
    )


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(c, r"[^.,;:!?]", "")) / F.length(c)
    )


def avg_token_length(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    return total / F.size(toks)


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    words = F.array(*[F.lit(w) for w in all_stop])
    return (
        F.size(F.filter(toks, lambda t: F.array_contains(words, t)))
        / F.size(toks)
    )


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality score: stopword density + reasonable word
    lengths + low digit noise. The exact formula matters less than that it
    is deterministic, monotone in sensible signals, and cheap."""
    return (
        0.4 * F.least(stopword_ratio(text) * 5, F.lit(1.0))
        + 0.3 * F.least(avg_token_length(text) / 8, F.lit(1.0))
        + 0.3 * (1 - F.least(digit_ratio(text) * 10, F.lit(1.0)))
    )


def fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.
    Exact-dup detection key that survives formatting differences."""
    return F.md5(F.array_join(tokens(text), " "))


def winnowing_fingerprints(text: Column | str, k: int = 5,
                           w: int = 4,
                           hash_family: str = "md5") -> Column:
    """Winnowing document fingerprints (the MOSS scheme): hash every
    character k-gram of normalized text, slide a window of w hashes, keep
    each window's minimum — guaranteeing any match of length >= w+k-1
    shares a fingerprint. Returns the distinct selected hashes
    (array<long>). Pure Column fold: the k-gram hash array is let-bound so
    it is computed once, not once per window. ``hash_family="xxhash64"``
    is the production choice — one JVM hash per k-gram instead of a
    cryptographic digest + hex parse; md5 stays the default for
    DuckDB-oracle parity."""
    norm = F.array_join(tokens(text), " ")
    n_grams = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    if hash_family == "md5":
        gram_hash = lambda g: F.conv(  # noqa: E731
            F.substring(F.md5(g), 1, 15), 16, 10
        ).cast("long")
    elif hash_family == "xxhash64":
        gram_hash = F.xxhash64  # raw long; min/distinct don't care for sign
    else:
        raise ValueError(f"hash_family {hash_family!r} not in md5/xxhash64")
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: gram_hash(norm.substr(i, F.lit(k))),
    )

    def windows(hs: Column) -> Column:
        n_windows = F.greatest(F.size(hs) - (w - 1), F.lit(1))

        def win_min(i: Column) -> Column:
            # least() over w try_element_at lookups, NOT array_min(slice()):
            # slice allocates a fresh w-element array per window (~300
            # per row), which made this the most allocation-heavy operator
            # in the suite; least() reads the let-bound array in place.
            # try_element_at: a doc shorter than w hashes yields NULLs past
            # the end, which least() skips — same clamping slice() did.
            if w == 1:
                return F.element_at(hs, i.cast("int"))
            return F.least(
                *[F.try_element_at(hs, (i + r).cast("int")) for r in range(w)]
            )

        return F.array_distinct(
            F.transform(F.sequence(F.lit(1), n_windows), win_min)
        )

    return let_bound(hashes, windows)


def winnowing_fingerprint_rows(df, text_col: str = "text",
                               id_col: str = "doc_id", k: int = 5,
                               w: int = 4,
                               hash_family: str = "md5",
                               carry_cols: tuple = ()):
    """Winnowing as a RELATIONAL plan: one row per selected fingerprint
    ``(id, wm)`` instead of an array column per doc.

    Same semantics as :func:`winnowing_fingerprints` (differentially
    tested), different physical shape: explode the k-gram index, hash with
    plain scalar expressions, take the sliding minimum with a ROWS-frame
    window — every operator whole-stage-codegen'd or a first-class
    physical node (Generate, WindowExec, HashAggregate), where the array
    formulation evaluates nested higher-order functions interpreted
    (CodegenFallback). Costs one shuffle on ``id_col`` (the window
    partition) that the array form doesn't have; wins whenever the
    per-element interpreted overhead dominates, and keeps per-doc memory
    bounded for pathologically long documents (rows stream through the
    window; the array form materializes all k-gram hashes per row)."""
    norm = F.array_join(tokens(text_col), " ")
    if hash_family == "md5":
        def gram_hash(g: Column) -> Column:
            return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
    elif hash_family == "xxhash64":
        gram_hash = F.xxhash64
    else:
        raise ValueError(f"hash_family {hash_family!r} not in md5/xxhash64")
    from pyspark.sql import Window

    carry = [c for c in carry_cols if c != id_col]
    d = df.select(
        F.col(id_col), *carry, norm.alias("_s"),
    ).withColumn("_ng", F.greatest(F.length("_s") - (k - 1), F.lit(1)))
    g = d.select(
        id_col, *carry, "_ng", "_s",
        F.explode(F.sequence(F.lit(1), F.col("_ng"))).alias("_i"),
    ).select(
        id_col, *carry, "_ng", "_i",
        gram_hash(F.expr(f"substring(_s, _i, {k})")).alias("_h"),
    )
    win = Window.partitionBy(id_col).orderBy("_i").rowsBetween(0, w - 1)
    return (
        g.select(
            id_col, *carry, "_i", "_ng", F.min("_h").over(win).alias("wm")
        )
        .filter(F.col("_i") <= F.greatest(F.col("_ng") - (w - 1), F.lit(1)))
        .select(id_col, *carry, "wm")
        .distinct()
    )


def simhash16(text: Column | str) -> Column:
    """16-bit SimHash over distinct tokens, as a '0'/'1' string.

    Bit j is the sign of sum_t (+1 if hex digit j of md5(t) >= 8 else -1)
    over distinct tokens t — i.e. each md5 hex digit's high bit is one
    hash-family member. md5 is computed ONCE per token (the hash array is
    let-bound; 16 inline folds would each re-hash every token). String
    output keeps it cross-engine comparable; the scale path is the same
    fold with xxhash64 into a BIGINT."""
    hx = F.transform(F.array_distinct(tokens(text)), lambda t: F.md5(t))

    def build(hs: Column) -> Column:
        def bit(j: int):
            # j bound via function scope (not a lambda default — pyspark
            # derives lambda arity from the signature and would mis-bind it)
            s = F.aggregate(
                hs,
                F.lit(0),
                lambda acc, h: acc
                + F.when(
                    F.substring(h, j, 1).isin(
                        "8", "9", "a", "b", "c", "d", "e", "f"
                    ),
                    1,
                ).otherwise(-1),
            )
            return F.when(s >= 0, F.lit("1")).otherwise(F.lit("0"))

        return F.concat(*[bit(j) for j in range(1, 17)])

    return let_bound(hx, build)


# --- PII scrubbing -----------------------------------------------------------
#
# Patterns are deliberately RE2-and-Java-compatible (no backrefs, no
# lookaround) so the identical regex runs in Spark (Java) and the DuckDB
# oracle (RE2, with the 'g' flag for global replacement).

PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d -]{7,}\d",
}
# scrub order matters (emails contain dots and digits): email -> ipv4 -> phone
PII_ORDER = ("email", "ipv4", "phone")


def pii_hits(text: Column | str, kind: str) -> Column:
    """Number of PII matches of ``kind`` in the text (pre-scrub metric)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[kind]), F.lit(0)))


def pii_scrub(text: Column | str) -> Column:
    """Redact emails, IPv4 addresses and international phone numbers with
    ``[KIND]`` placeholders — the standard pre-training scrub pass.
    Embarrassingly parallel; at 100 TB this is a map-only stage fused into
    whatever scan feeds it."""
    c = F.col(text) if isinstance(text, str) else text
    for kind in PII_ORDER:
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return c


# --- token-window chunking ---------------------------------------------------

def chunk_token_windows(text: Column | str, chunk: int = 64,
                        overlap: int = 16) -> Column:
    """array<string>: overlapping token windows of ``chunk`` tokens with
    ``overlap`` tokens carried between consecutive chunks — the standard
    context-window chunking for embedding/training pipelines. Start
    positions run while new (non-overlap) content remains, so a final
    partial chunk is kept unless the previous chunk already covers it.
    Pure Column fold (tokens let-bound: computed once, not once per
    chunk)."""
    assert 0 <= overlap < chunk
    step = chunk - overlap
    toks = tokens(text)

    def build(ts: Column) -> Column:
        starts = F.sequence(
            F.lit(1),
            F.greatest(F.size(ts) - overlap, F.lit(1)),
            F.lit(step),
        )
        return F.transform(
            starts, lambda i: F.concat_ws(" ", F.slice(ts, i, chunk))
        )

    return let_bound(toks, build)


# --- intra-document repetition ----------------------------------------------

def repetition_ratio(text: Column | str, n: int = 3) -> Column:
    """Share of repeated word n-gram positions in the document:
    ``1 - distinct_shingles / shingle_positions``. 0 = no repetition; high
    values flag boilerplate/spam — a standard quality-filter signal."""
    toks = tokens(text)

    def build(ts: Column) -> Column:
        total = F.greatest(F.size(ts) - (n - 1), F.lit(1))
        idx = F.sequence(F.lit(1), total)
        distinct = F.size(F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ts, i, n)))
        ))
        return 1.0 - distinct / total.cast("double")

    return let_bound(toks, build)


# --- deterministic splits ----------------------------------------------------

def hash_bucket_pct(key: Column | str, salt: str = "split") -> Column:
    """Deterministic [0,100) bucket from a key: the md5-mod trick every
    training pipeline uses for STABLE train/val/test splits — unlike seeded
    RNG sampling, membership survives reruns, repartitioning, and engine
    changes (and is therefore oracle-checkable)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), c.cast("string"))),
                    1, 15),
        16, 10,
    ).cast("long")
    return (h % 100).cast("int")


def split_label(key: Column | str, train_pct: int = 80, val_pct: int = 10,
                salt: str = "split") -> Column:
    """'train' / 'val' / 'test' assignment by hash bucket."""
    b = hash_bucket_pct(key, salt)
    return (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )


def rebalance_sources(df, weights: dict[str, float],
                      source_col: str = "source",
                      key_col: str = "doc_id"):
    """Deterministic dataset mixing: keep a per-source fraction of rows
    (``weights[source]`` in [0,1]) chosen by hash bucket — the stable
    down-sampling step used to hit a target corpus mixture. Unknown
    sources keep everything. Same hash-mod trick as :func:`split_label`,
    salted per source so the kept subsets are independent across sources;
    membership survives reruns and repartitioning. Map-only (fuses into
    the scan); the alternative ``sampleBy`` is RNG-seeded and neither
    stable nor oracle-checkable."""
    c = F.col(source_col)
    expr = F.lit(True)
    for src, frac in sorted(weights.items()):
        keep = hash_bucket_pct(F.col(key_col), salt=f"mix|{src}") < int(
            round(frac * 100)
        )
        expr = F.when(c == src, keep).otherwise(expr)
    return df.filter(expr)


def stratified_sample_exact(df, key_col: str = "source",
                            id_col: str = "doc_id", n_per_key: int = 50):
    """EXACT per-stratum quota sampling: keep the ``n_per_key`` rows of
    each stratum with the smallest ``md5(salt|id)`` — a deterministic
    uniform draw (md5 is uniform on ids, so hash-order is a random order
    that survives reruns, repartitioning, and engine changes; seeded RNG
    sampling is none of those, and not oracle-checkable).

    One shuffle on the stratum key (window partition). A pathological
    mega-stratum makes one partition heavy — that is inherent to exact
    quotas; when approximate quotas suffice, use
    :func:`stratified_sample_rate` (map-only, no shuffle, no skew)."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit("sample|"),
                       F.col(id_col).cast("string")))
    w = Window.partitionBy(key_col).orderBy(h.asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_key)
        .drop("_rk")
    )


def stratified_sample_rate(df, rates: dict[str, float],
                           key_col: str = "source",
                           id_col: str = "doc_id"):
    """Map-only approximate stratified sampling: keep a row iff its hash
    bucket falls under the stratum's rate. No shuffle, no skew — the 100 TB
    path when quota tolerance is a percent or two (binomial concentration).
    Same md5-bucket trick as :func:`rebalance_sources`, salted per stratum."""
    c = F.col(key_col)
    expr = F.lit(False)
    for key, rate in sorted(rates.items()):
        keep = hash_bucket_pct(F.col(id_col), salt=f"strat|{key}") < int(
            round(rate * 100)
        )
        expr = F.when(c == key, keep).otherwise(expr)
    return df.filter(expr)


def term_frequencies(df, text_col: str = "text", id_col: str = "doc_id"):
    """One row per (doc, term) with the term's in-doc count — the exploded
    representation TF-IDF/BM25 build on. Explode + count: one shuffle on
    (id, term), partial-aggregated map-side."""
    toks = tokens(text_col)
    return (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_scores(df, query_terms: list[str], text_col: str = "text",
                id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75):
    """BM25 relevance of every document against a fixed query-term list.
    (No reference analog — north-star LLM-pipeline extension; the
    reference has no batch/corpus surface at all.)

    Scale shape: term frequencies are one explode + one (id, term) agg;
    document frequencies aggregate the same rows per term; the query-term
    list and the per-term df/idf table are broadcast (a query has O(10)
    terms, idf needs only those); doc lengths reuse the token pass. Score
    = sum over query terms of idf * tf*(k1+1) / (tf + k1*(1-b+b*len/avg)).
    idf is the classic Robertson form ln((N-df+0.5)/(df+0.5)+1) — always
    positive. No UDFs anywhere."""
    spark = df.sparkSession
    # literal-array explode, not createDataFrame: no Python scan node in
    # the plan, and the term list constant-folds into the broadcast
    qt = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in query_terms])).alias("term")
    )
    lens = df.select(F.col(id_col), token_count(text_col).alias("dl"))
    # corpus stats as a broadcast 1-row aggregate — no driver-side
    # collect; the plan stays fully declarative
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avg_dl"),
    )
    tf = term_frequencies(df, text_col, id_col).join(
        F.broadcast(qt), "term"
    )
    dfreq = (
        tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5)
                  / (F.col("df") + 0.5) + 1.0),
        )
        .select("term", "idf")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats.select("avg_dl")))
        .withColumn(
            "contrib",
            F.col("idf") * F.col("tf") * (k1 + 1)
            / (F.col("tf")
               + k1 * (1 - b + b * F.col("dl") / F.col("avg_dl"))),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.sum("contrib"), 6).alias("bm25")
    )


def pack_sequences(df, budget_tokens: int = 1024,
                   order_col: str = "doc_id", part_col: str | None = None,
                   text_col: str = "text"):
    """Sequence packing: assign each document a ``pack_id`` so consecutive
    documents (in deterministic ``order_col`` order, optionally per
    ``part_col`` partition) accumulate up to ~``budget_tokens`` tokens per
    pack — the standard prep step that concatenates short documents into
    full context windows instead of padding. (No reference analog —
    north-star LLM-pipeline extension.)

    This is the RUNNING-QUOTIENT approximation: pack_id =
    floor((cumulative_tokens - doc_tokens) / budget), one window cumsum —
    deterministic, one shuffle, SQL-expressible. Exact greedy bin packing
    is inherently sequential per pack; at 100 TB the approximation's
    overfill is bounded by one document per pack and keeps the operator a
    plain window instead of a sequential loop. Oversized docs (> budget)
    get a pack of their own arithmetic span.

    SCALE NOTE: ``part_col=None`` computes ONE global cumulative sum —
    a single window partition, i.e. a single-task serial bottleneck.
    That path exists for small corpora and oracle parity only; at scale
    ``part_col`` is REQUIRED (any coarse, roughly-uniform key works —
    e.g. ``source`` or ``pmod(xxhash64(doc_id), 1024)`` — pack ids are
    then unique per (part, pack_id) and packing quality is unchanged
    because packs never need to span partitions)."""
    from pyspark.sql import Window

    w = (Window.partitionBy(part_col) if part_col
         else Window.partitionBy(F.lit(0)))
    w = w.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_toks = token_count(text_col)
    cum = F.sum(n_toks).over(w)
    return df.withColumn("n_toks", n_toks).withColumn(
        "pack_id",
        F.floor((cum - F.col("n_toks")) / F.lit(budget_tokens)).cast("long"),
    )


def gopher_quality_flags(text: Column | str,
                         min_words: int = 20, max_words: int = 100_000,
                         min_mean_word_len: float = 3.0,
                         max_mean_word_len: float = 10.0,
                         max_symbol_word_ratio: float = 0.1,
                         min_alpha_word_ratio: float = 0.8,
                         min_stop_hits: int = 2) -> Column:
    """Gopher-style document quality flags (Rae et al. 2021 §A1.1, public
    heuristics; no reference analog — north-star LLM-pipeline extension):
    a struct of boolean repetition/format gates plus the combined pass.
    All pure Column arithmetic over one tokenization — map-only, codegen,
    no shuffle; at 100 TB this runs at scan speed as a projection.

    Flags (True = passes the gate):
      word_count_ok      min_words <= #tokens <= max_words
      mean_word_len_ok   mean token length in [min, max]
      symbol_ratio_ok    (# + ellipsis occurrences) / words <= max ratio
      alpha_ratio_ok     fraction of words with an alphabetic char >= min
      has_stopwords      >= min_stop_hits hits from the English stop set
      passes             AND of the above
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n = F.size(toks)
    mean_len = avg_token_length(c)
    symbols = (
        F.length(F.regexp_replace(c, r"[^#]", ""))
        + F.size(F.split(c, r"\.\.\.", -1)) - 1
    )
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    word_count_ok = (n >= min_words) & (n <= max_words)
    mean_word_len_ok = (
        (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)
    )
    symbol_ratio_ok = (symbols / n) <= max_symbol_word_ratio
    alpha_ratio_ok = (alpha / n) >= min_alpha_word_ratio
    has_stopwords = stopword_hits(c, "en") >= min_stop_hits
    passes = (word_count_ok & mean_word_len_ok & symbol_ratio_ok
              & alpha_ratio_ok & has_stopwords)
    return F.struct(
        word_count_ok.alias("word_count_ok"),
        mean_word_len_ok.alias("mean_word_len_ok"),
        symbol_ratio_ok.alias("symbol_ratio_ok"),
        alpha_ratio_ok.alias("alpha_ratio_ok"),
        has_stopwords.alias("has_stopwords"),
        passes.alias("passes"),
    )


def temperature_rebalance(df, alpha: float = 0.5,
                          stratum_col: str = "source",
                          id_col: str = "doc_id"):
    """Temperature-based dataset mixing (the standard multilingual /
    multi-source LLM sampling scheme, e.g. XLM/mT5: post-mix share of
    stratum s ∝ n_s^alpha): down-sample each stratum at
    keep_rate_s = (n_s / n_min)^(alpha-1), so the smallest stratum is
    kept whole and larger strata are compressed toward it. alpha=1 keeps
    the natural mixture; alpha=0 equalizes all strata. (No reference
    analog — north-star LLM-pipeline extension.)

    Determinism: membership is the same md5-bucket trick as
    :func:`rebalance_sources` but at 1/10000 granularity (rates from a
    power law are rarely round percents); rates round to 1e-6 before the
    threshold so the oracle can restate them bit-identically.

    100 TB shape: one count agg over the strata (tiny result), rates
    broadcast back, filter map-side. The corpus is scanned twice (count +
    filter) — at scale feed ``precomputed_counts`` from catalog/ingest
    metadata to make it one scan. Returns df plus a ``keep_rate`` column.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n"))
    nmin = counts.agg(F.min("n").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        stratum_col,
        F.round(
            F.pow(F.col("n") / F.col("n_min"), F.lit(alpha - 1.0)), 6
        ).alias("keep_rate"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("temp|"),
                           F.col(id_col).cast("string"))), 1, 15
        ),
        16, 10,
    ).cast("long") % 10000
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(h < F.round(F.col("keep_rate") * 10000).cast("long"))
    )


def unigram_logprob_score(df, text_col: str = "text",
                          id_col: str = "doc_id"):
    """CCNet-style language-model quality proxy: score each document by
    the mean log-probability of its tokens under a unigram model fitted
    on the corpus itself — rare-token-heavy (garbled, off-distribution)
    documents score low. (No reference analog — north-star LLM-pipeline
    extension; the real CCNet uses a KenLM 5-gram, this is the same
    signal at unigram order, deterministic and oracle-checkable.)

    Returns (id_col, n_toks, avg_logprob[rounded 4dp]).

    100 TB shape: term frequencies are one explode + agg (uniform term
    keys), the vocabulary broadcasts back, scoring is a map-side join +
    per-doc agg. At web scale cap the broadcast with a top-K vocabulary
    plus an OOV floor probability — the scores change negligibly because
    the tail IS the low-probability mass."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col))
                     .alias("term"))
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    tot = tf.agg(F.sum("tf").alias("total_tf"))
    vocab = tf.crossJoin(F.broadcast(tot)).select(
        "term", F.log(F.col("tf") / F.col("total_tf")).alias("lp")
    )
    return (
        toks.join(F.broadcast(vocab), "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round(F.avg("lp"), 4).alias("avg_logprob"),
        )
    )


def token_entropy(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document Shannon entropy (bits) of the token distribution —
    near-zero for repetitive/spam documents ("buy now buy now ..."),
    high for diverse text; the standard cheap gibberish/repetition
    signal next to :func:`repetition_ratio`. (No reference analog —
    north-star LLM-pipeline extension.)

    Returns (id_col, n_toks, entropy_bits[rounded 4dp]).

    Scale shape: reuses the :func:`term_frequencies` explode + (id, term)
    agg — linear in corpus tokens with one uniform-key shuffle — then a
    per-doc rollup of -sum(p*log2(p)). A per-row array fold would be
    O(distinct x length) per document, quadratic for long docs; the
    relational shape is the one that survives 100k-token documents."""
    tf = term_frequencies(df, text_col, id_col)
    return (
        tf.groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_toks"),
            F.round(
                F.log2(F.sum("tf"))
                - F.sum(F.col("tf") * F.log2("tf")) / F.sum("tf"),
                4,
            ).alias("entropy_bits"),
        )
    )


def dup_passage_stats(df, n: int = 5, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Cross-document duplicated-passage fraction: for each document, the
    share of its distinct word ``n``-gram shingles that also occur in at
    least one OTHER document. This is the passage-level repetition signal
    (C4/Gopher-style corpus analyses) that catches boilerplate, mirrored
    pages, and template text that document-level dedup misses.

    Returns (id_col, n_shingles, n_shared, dup_frac[rounded 4dp]).

    Scale shape: shingles are xxhash64-hashed to an 8-byte uniform key
    (r11 — was a 32-char md5 hex string: the exploded shingles are this
    operator's dominant shuffle, 181 MB at the sweep's 16x point, and
    the long key cuts bytes/row ~3x and makes the window sort a long
    compare; 64-bit collisions at corpus scale are ~n^2/2^65 —
    vanishing, and only ever MERGE two shingle identities, the same
    accepted tradeoff as every other xxhash64 n-gram key in this
    package). Doc frequency is attached with a COUNT WINDOW over that
    key — one shuffle of the exploded shingles and ONE pass over the
    text. The earlier agg-then-join-back shape recomputed the whole
    tokenize/shingle/hash subtree twice (Catalyst plans the two
    consumers as two FileScans; no ReusedExchange fires because the agg
    side prunes to a single column), and at 100 TB the sort-merge join
    would re-sort both sides on ``sh`` anyway — the window pays that
    one sort once, on half the compute. Everything stays linear in
    corpus shingles; hot boilerplate shingles are exactly the rows the
    signal exists to find."""
    from pyspark.sql import Window

    sh = df.select(
        F.col(id_col),
        F.explode(shingles(text_col, n)).alias("shingle"),
    ).select(F.col(id_col), F.xxhash64("shingle").alias("sh"))
    # shingles() dedupes per doc, so count(*) per shingle == doc frequency
    return (
        sh.withColumn(
            "doc_freq", F.count(F.lit(1)).over(Window.partitionBy("sh")))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("doc_freq") > 1, 1).otherwise(0))
            .alias("n_shared"),
            F.round(
                F.sum(F.when(F.col("doc_freq") > 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                4,
            ).alias("dup_frac"),
        )
    )


def ngram_repetition(df, n: int = 2, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Within-document n-gram repetition (Gopher §A1.1 repetition filters,
    Rae et al. 2021, token-based): per document, the fraction of n-gram
    occurrences taken by the single most frequent n-gram (``top_frac`` —
    catches looping template text) and the fraction of occurrences whose
    n-gram appears more than once (``dup_frac`` — catches diffuse
    repetition). Positional n-grams, NOT deduplicated.

    Returns (id_col, n_grams, top_frac[4dp], dup_frac[4dp]).

    Scale shape: same relational explode -> (id, gram) count -> per-doc
    rollup as token_entropy — linear in corpus tokens, one uniform-key
    shuffle, no per-row quadratic array folds for long documents."""
    toks = tokens(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    g = df.select(F.col(id_col), F.explode(grams).alias("gram"))
    counts = g.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.round(F.max("c") / F.sum("c"), 4).alias("top_frac"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
            / F.sum("c"),
            4,
        ).alias("dup_frac"),
    )


def ngram_repetition_profile(df, ns=(2, 3), text_col: str = "text",
                             id_col: str = "doc_id", keep_cols=()):
    """Single-pass within-document repetition profile for several n-gram
    sizes at once (Gopher §A1.1 repetition filters, Rae et al. 2021).
    Returns one row per document with, for each ``k`` in ``ns``:
    ``n{k}_grams`` (total positional k-gram occurrences), ``top{k}_frac``
    (occupancy of the single most frequent k-gram, 4dp) and
    ``dup{k}_frac`` (fraction of occurrences whose k-gram repeats, 4dp).

    Scale shape — this is the 100 TB plan ``ngram_repetition`` (one n per
    call) is not: the corpus is tokenized ONCE, every requested gram size
    is projected off that one token array in the same map stage, and the
    only wide exchange carries ``(id, n, xxhash64(gram))`` — an 8-byte
    hashed key instead of the raw gram string (equality is all the count
    needs; a 64-bit collision *within one document* is the only way to
    perturb the stats). The exploded rows are repartitioned by ``id`` so
    the per-(id, n, gram) count and the per-document rollup both reuse
    that single exchange (HashPartitioning(id) satisfies both clustered
    distributions) — one gram-key shuffle total, versus two raw-string
    shuffles plus a join for the call-per-n composition. Measured A/B:
    repartitioning the raw docs BEFORE the explode (fewer exchange bytes)
    lost ~2× to this shape at sf0.1 — exploding in the scan stage keeps
    the tokenize/hash work in the wide input stage and the exchanged
    structs are fixed-width 20-byte rows that pack/serialize better than
    re-tokenizing text post-shuffle."""
    def gram_hashes(ts: Column, k: int) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.size(ts) - (k - 1), F.lit(1)))
        return F.transform(
            idx,
            lambda i: F.struct(
                F.lit(k).alias("n"),
                F.xxhash64(F.concat_ws(" ", F.slice(ts, i, k))).alias("gh"),
            ),
        )

    grams_all = let_bound(
        tokens(text_col),
        lambda ts: F.flatten(F.array(*[gram_hashes(ts, k) for k in ns])),
    )
    g = df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        F.explode(grams_all).alias("g"),
    ).repartition(F.col(id_col))
    counts = g.groupBy(id_col, *keep_cols, "g.n", "g.gh").agg(
        F.count(F.lit(1)).alias("c")
    )
    aggs = []
    for k in ns:
        is_k = F.col("n") == k
        tot = F.sum(F.when(is_k, F.col("c")))
        aggs += [
            tot.alias(f"n{k}_grams"),
            F.round(F.max(F.when(is_k, F.col("c"))) / tot, 4)
            .alias(f"top{k}_frac"),
            F.round(
                F.sum(F.when(is_k & (F.col("c") > 1), F.col("c"))
                      .otherwise(0)) / tot,
                4,
            ).alias(f"dup{k}_frac"),
        ]
    return counts.groupBy(id_col, *keep_cols).agg(*aggs)


def hashed_linear_score(text: Column | str, salt: str = "qw") -> Column:
    """fastText-style linear quality classifier applied at scale: each
    token maps to a weight via the hashing trick, the document score is
    mean token weight pushed through a logistic. Here the weight table is
    a deterministic md5-derived function in [-1, 1] (so the DuckDB oracle
    can restate it bit-for-bit); in production the weights come from a
    trained model and broadcast to every executor — SAME plan either way:
    a pure map-side Column fold, no UDF, no shuffle, linear in tokens.
    Returns the logistic score rounded to 6dp."""
    toks = tokens(text)

    def w(t: Column) -> Column:
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), t)), 1, 8), 16, 10
        ).cast("long")
        return (h / F.lit(float(0xFFFFFFFF))) * 2 - 1

    mean = let_bound(
        toks,
        lambda ts: F.aggregate(
            ts, F.lit(0.0), lambda acc, t: acc + w(t)
        ) / F.size(ts),
    )
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-mean)), 6)


def bpe_pair_stats(df, text_col: str = "text", top_k: int = 10):
    """The first iteration of BPE tokenizer training at corpus scale:
    frequency of each adjacent character pair, weighted by word frequency.
    The classic trick that makes BPE training corpus-size-independent:
    aggregate the corpus down to DISTINCT words with counts first (one
    uniform-key shuffle, output bounded by vocabulary size), then explode
    character pairs over that small table — the expensive per-character
    work never touches the raw corpus again. Returns the ``top_k``
    (pair, total) rows — the pairs a BPE trainer would merge first."""
    words = df.select(F.explode(tokens(text_col)).alias("word"))
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    pairs = vocab.select(
        "freq",
        F.explode(
            F.when(
                F.length("word") > 1,
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.substring(F.col("word"), i, F.lit(2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("total"))
        .orderBy(F.desc("total"), F.asc("pair"))
        .limit(top_k)
    )


def vocab_coverage(df, text_col: str = "text", ks: tuple = (100, 1000)):
    """Tokenizer/vocabulary design input: corpus term frequencies ranked,
    plus the fraction of ALL token occurrences covered by the top-k terms
    for each k. Returns one row: (n_terms, total_tokens, cov_top<k>...).

    Scale shape: the corpus collapses to the distinct-term frequency table
    in one uniform-key shuffle; the rank window then runs over the
    VOCABULARY (metadata-sized — a 100 TB corpus still has ~1e6-1e7
    distinct terms), not the corpus."""
    from pyspark.sql import Window

    terms = df.select(F.explode(tokens(text_col)).alias("term"))
    freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    ranked = freq.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("term"))),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("freq").alias("total_tokens"),
    ]
    for k in ks:
        aggs.append(
            F.round(
                F.sum(F.when(F.col("rk") <= k, F.col("freq")).otherwise(0))
                / F.sum("freq"),
                6,
            ).alias(f"cov_top{k}")
        )
    return ranked.agg(*aggs)


def weighted_sample_topk(df, weight_col, k: int = 10,
                         stratum_col: str | None = None,
                         id_col: str = "doc_id", salt: str = "ws"):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 exponential keys): each row draws u in (0,1] from an
    md5 hash of its id, gets key = u^(1/w), and the top-k keys per stratum
    are the sample — inclusion probability proportional to weight, stable
    across engines/reruns/partitionings.

    Scale shape: the key is a pure map-side expression; per-stratum top-k
    is one window (or TakeOrdered for the global case) — one shuffle on
    the stratum key, state bounded by k per stratum."""
    from pyspark.sql import Window

    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + "|"),
                               F.col(id_col).cast("string"))), 1, 8),
            16, 10,
        ).cast("double") + 1.0
    ) / float(0x100000000)  # (0, 1]
    # rank on log(key) = ln(u)/w — same ordering as key = u^(1/w), but the
    # values spread across magnitudes so the cross-engine 6dp rounding
    # (which makes the rank hash-stable between Spark and DuckDB) keeps
    # far more resolution than rounding keys clustered near 1.0
    log_key = F.round(F.log(u) / F.col(weight_col), 6)
    part = [stratum_col] if stratum_col else [F.lit(0)]
    w = Window.partitionBy(*part).orderBy(
        F.desc("sample_key"), F.asc(id_col)
    )
    return (
        df.withColumn("sample_key", log_key)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def build_vocab(df, text_col: str = "text", vocab_size: int = 100):
    """Frequency-ranked vocabulary: (term, token_id) with ids 0..V-1 by
    freq desc (ties by term). The rank window is global but runs over
    the DISTINCT-term set — metadata-sized, the same justification as
    vocab_coverage; the corpus-sized work is one (term) count shuffle."""
    from pyspark.sql import Window

    f = (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    win = Window.orderBy(F.col("freq").desc(), F.col("term"))
    return (
        f.withColumn("token_id", F.row_number().over(win) - 1)
        .filter(F.col("token_id") < vocab_size)
        .select("term", "token_id")
    )


def encode_tokens(df, vocab, vocab_size: int, oov_buckets: int = 16,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Tokenizer application: text -> array<token_id>, with
    out-of-vocabulary terms mapped to ``vocab_size + md5(term) %
    oov_buckets`` (the hashing-trick OOV scheme — deterministic in any
    engine). posexplode -> broadcast vocab join (the vocab is
    metadata-sized by construction) -> order-preserving re-assembly via
    sort_array(collect_list(struct(pos, id))). ONE data shuffle (the
    per-doc re-assembly); the join is map-side."""
    oov = vocab_size + F.pmod(
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(oov_buckets),
    )
    w = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    )
    enc = w.join(F.broadcast(vocab), "term", "left").withColumn(
        "tid", F.coalesce(F.col("token_id"), oov)
    )
    return (
        enc.groupBy(id_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s["tid"],
            ).alias("token_ids")
        )
    )


def frequent_terms(df, text_col: str = "text", min_support: float = 0.005,
                   counters: int = 512):
    """Guaranteed heavy hitters: every term whose corpus frequency is
    >= ``min_support`` of all token occurrences — found WITHOUT a
    full-vocabulary shuffle. (No reference analog — north-star
    LLM-pipeline extension; the mergeable-summary construction follows
    Misra-Gries / Agarwal et al. "Mergeable Summaries".)

    Two passes:
      1. CANDIDATES: per-partition Misra-Gries over the exploded token
         stream (``mapInPandas``, batch-merged: add batch value_counts,
         then subtract the (counters+1)-th largest and drop non-positive
         — the standard mergeable-summary step). MG guarantees any term
         with partition frequency STRICTLY > n_p/(counters+1) survives;
         by pigeonhole a term with GLOBAL frequency >= min_support*N
         (for min_support strictly > 1/(counters+1)) exceeds that bound
         in at least one partition, so the candidate union is COMPLETE.
         The strictness matters: at min_support == 1/(counters+1)
         exactly, a term with counts exactly n_p/(counters+1) in every
         partition can be dropped by every per-partition MG pass while
         still passing the inclusive verify filter — so that boundary is
         rejected below. Output is <= counters rows per partition —
         broadcast-sized.
      2. VERIFY: exact count of candidate terms only (broadcast semi
         join), filtered to min_support — false candidates die here, so
         the result is EXACT and partitioning-independent, while the
         only full-data shuffle aggregates a candidate-bounded key set.

    Returns (term, cnt, frac[6dp]). At 100 TB the vocabulary-sized
    groupBy this replaces is billions of keys; here the shuffled key
    space is <= counters * partitions."""
    if min_support <= 1.0 / (counters + 1):
        raise ValueError(
            f"min_support {min_support} at or below the completeness "
            f"bound 1/(counters+1) = {1.0 / (counters + 1):.6f} "
            f"(completeness needs STRICT inequality); raise counters"
        )

    toks = df.select(F.explode(tokens(text_col)).alias("term"))

    def mg(batches):
        import pandas as pd

        acc = pd.Series(dtype="int64")
        for pdf in batches:
            acc = acc.add(pdf["term"].value_counts(), fill_value=0)
            if len(acc) > counters:
                thresh = acc.nlargest(counters + 1).iloc[-1]
                acc = acc[acc > thresh] - thresh
        yield pd.DataFrame({"term": acc.index.astype(str)})

    cand = toks.mapInPandas(mg, "term string").distinct()
    # token total as sum-of-array-sizes: map-only partial agg over the
    # un-exploded rows — same value as count(explode) without paying a
    # third per-token row expansion over the corpus
    total = df.agg(
        F.sum(F.size(tokens(text_col))).cast("double").alias("n_tokens")
    )
    return (
        toks.join(F.broadcast(cand), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.col("n_tokens") * F.lit(min_support))
        .select(
            "term", "cnt",
            F.round(F.col("cnt") / F.col("n_tokens"), 6).alias("frac"),
        )
    )


def sentence_udtf():
    """Python UDTF (Spark 4 user-defined TABLE function) splitting a
    document into sentences — the one engine-native UDF surface SURVEY
    §2.8 lists that the other operators don't exercise (pandas UDF,
    GROUPED_AGG, applyInPandas and mapInPandas all have coverage; a UDTF
    is the lateral row-EXPANDING shape: one input row -> N output rows
    inside the FROM clause, distributed per-partition like any other
    projection — no shuffle is introduced by the expansion itself).

    Splitting rule is deliberately RE2-safe (no lookbehind, explicit
    ASCII whitespace classes) so a DuckDB oracle can restate it exactly:
    sentences are separated by a punctuation run ``[.!?]+`` followed by
    whitespace; a sentence's token count is its number of
    non-whitespace runs; empty sentences are dropped.

    Arrow-batched (``useArrow=True``): rows stream through the Python
    worker in Arrow record batches rather than pickled rows.
    """
    import re

    from pyspark.sql.functions import udtf

    sep = re.compile(r"[.!?]+[ \t\n\f\r]+")
    tok = re.compile(r"[^ \t\n\f\r]+")

    @udtf(returnType="idx int, sentence string, n_tokens int",
          useArrow=True)
    class SplitSentences:
        def eval(self, text):  # noqa: ANN001 — UDTF contract
            if text is None:
                return
            idx = 0
            for part in sep.split(text):
                n_tokens = len(tok.findall(part))
                if n_tokens == 0:
                    continue
                yield idx, part, n_tokens
                idx += 1

    return SplitSentences


def _cdc_cuts(sc: Column, k: int, divisor: int,
              min_len: int | None, max_len: int | None) -> Column:
    """Cut positions 0 < e_1 < ... < n for the CDC rule + clamps, over an
    already-normalized text column. Shared by cdc_chunk_hashes /
    cdc_chunk_lengths so hashes and lengths stay 1:1 aligned."""
    def md5l(g: Column) -> Column:
        return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")

    n = F.length(sc)
    bnds = F.when(
        n >= k,
        F.filter(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: md5l(sc.substr(i, F.lit(k))) % divisor == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    # a boundary AT n collapses into the final cut (distinct), so no
    # empty tail chunk
    cuts = F.array_sort(F.array_distinct(F.concat(
        F.array(F.lit(0)),
        F.transform(bnds, lambda i: i + (k - 1)),
        F.array(n),
    )))
    if min_len is not None:
        # fold: keep a cut only if it is >= min_len past the last KEPT
        # cut; the tail cut n is re-appended if the rule dropped it (a
        # short final chunk, never a lost tail)
        def min_fold(cs: Column) -> Column:
            rest = F.slice(cs, 2, F.greatest(F.size(cs) - 1, F.lit(0)))
            kept = F.aggregate(
                rest, F.array(F.lit(0)),
                lambda acc, c: F.when(
                    c - F.element_at(acc, -1) >= min_len,
                    F.concat(acc, F.array(c)),
                ).otherwise(acc),
            )
            return F.when(F.element_at(kept, -1) == n, kept) \
                .otherwise(F.concat(kept, F.array(n)))

        cuts = F.when(n > 0, let_bound(cuts, min_fold)) \
            .otherwise(F.array(F.lit(0)))
    if max_len is not None:
        # force a cut every max_len chars inside any over-long gap
        def max_inject(cs: Column) -> Column:
            forced = F.flatten(F.transform(
                F.sequence(F.lit(1), F.size(cs) - 1),
                lambda j: let_bound(
                    F.element_at(cs, j.cast("int")),
                    lambda lo: F.when(
                        F.element_at(cs, (j + 1).cast("int")) - lo
                        > max_len,
                        F.sequence(
                            lo + max_len,
                            F.element_at(cs, (j + 1).cast("int")) - 1,
                            F.lit(max_len)),
                    ).otherwise(F.array().cast("array<int>")),
                ),
            ))
            return F.array_sort(F.concat(cs, forced))

        cuts = F.when(
            F.size(cuts) >= 2, let_bound(cuts, max_inject)
        ).otherwise(cuts)
    return cuts


def cdc_chunk_hashes(text: Column | str, k: int = 8,
                     divisor: int = 64,
                     min_len: int | None = None,
                     max_len: int | None = None) -> Column:
    """Content-defined chunking (CDC) fingerprints: split normalized text
    at positions where the rolling k-gram hash is 0 mod ``divisor``
    (expected chunk length ~= divisor chars) and hash each chunk —
    sub-document dedup keys that are STABLE under insertions, unlike
    fixed-size blocks, because every boundary is decided by local
    content only (the rsync/LBFS principle). Returns array<long> of
    chunk hashes, in order.

    ``min_len``/``max_len`` are the FastCDC-style clamps (r9): a cut
    closer than ``min_len`` to the previous KEPT cut is skipped (bounds
    metadata blow-up on boundary-dense content), and any gap longer
    than ``max_len`` gets forced cuts every ``max_len`` chars (bounds
    chunk size on boundary-free content — forced cuts lose the
    insertion-stability property only for the affected span, exactly
    like FastCDC). The tail cut at n always survives, so a short final
    chunk is possible — the standard behavior. Both clamps are plain
    folds over the (small) candidate-cut array, so they remain
    oracle-restatable (DuckDB ``list_reduce``/``list_transform``).

    Entirely map-side Column algebra — no shuffle, no UDF: the boundary
    scan is one HOF ``filter`` over k-gram positions and the chunk hash
    one ``transform`` over cut pairs, both over let-bound arrays. The
    md5-prefix-as-long hash matches the winnowing convention so DuckDB
    oracles can recompute it verbatim."""
    s = F.array_join(tokens(text), " ")

    def md5l(g: Column) -> Column:
        return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")

    def build(sc: Column) -> Column:
        cuts = _cdc_cuts(sc, k, divisor, min_len, max_len)

        def chunks(cs: Column) -> Column:
            # guard: an empty doc has cuts == [0] and Spark's
            # sequence(1, 0) DESCENDS ([1, 0]) instead of being empty —
            # element_at(cs, 0) would throw
            return F.when(
                F.size(cs) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(cs) - 1),
                    lambda j: md5l(sc.substr(
                        F.element_at(cs, j.cast("int")) + 1,
                        F.element_at(cs, (j + 1).cast("int"))
                        - F.element_at(cs, j.cast("int")),
                    )),
                ),
            ).otherwise(F.array().cast("array<long>"))

        return let_bound(cuts, chunks)

    return let_bound(s, build)


def cdc_chunk_lengths(text: Column | str, k: int = 8,
                      divisor: int = 64,
                      min_len: int | None = None,
                      max_len: int | None = None) -> Column:
    """Chunk LENGTHS under the same CDC rule/clamps as
    :func:`cdc_chunk_hashes` (1:1 aligned with its hashes) — the
    structural witness that the max clamp holds (every length <=
    max_len) without re-deriving cuts from hashes."""
    s = F.array_join(tokens(text), " ")

    def build(sc: Column) -> Column:
        cuts = _cdc_cuts(sc, k, divisor, min_len, max_len)

        def lengths(cs: Column) -> Column:
            return F.when(
                F.size(cs) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(cs) - 1),
                    lambda j: F.element_at(cs, (j + 1).cast("int"))
                    - F.element_at(cs, j.cast("int")),
                ),
            ).otherwise(F.array().cast("array<int>"))

        return let_bound(cuts, lengths)

    return let_bound(s, build)


def cdc_chunk_spans(text: Column | str, k: int = 8,
                    divisor: int = 64,
                    min_len: int | None = None,
                    max_len: int | None = None) -> Column:
    """Chunk hash + CHARACTER SPAN per CDC chunk, 1:1 aligned with
    :func:`cdc_chunk_hashes` (same cuts, same hash):
    array<struct<h: long, cstart: int, cend: int>> over the normalized
    text. The spans make chunk-level findings actionable — a
    boilerplate report can say WHERE the shared bytes sit, not just how
    many chunks repeat (r10, the span half of the dedup_cdc_* family).
    Same map-only shape: cuts are already positions, so spans cost one
    extra struct per chunk, no second scan."""
    s = F.array_join(tokens(text), " ")

    def md5l(g: Column) -> Column:
        return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")

    def build(sc: Column) -> Column:
        cuts = _cdc_cuts(sc, k, divisor, min_len, max_len)

        def spans(cs: Column) -> Column:
            return F.when(
                F.size(cs) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(cs) - 1),
                    lambda j: F.struct(
                        md5l(sc.substr(
                            F.element_at(cs, j.cast("int")) + 1,
                            F.element_at(cs, (j + 1).cast("int"))
                            - F.element_at(cs, j.cast("int")),
                        )).alias("h"),
                        F.element_at(cs, j.cast("int")).alias("cstart"),
                        F.element_at(cs, (j + 1).cast("int")).alias("cend"),
                    ),
                ),
            ).otherwise(
                F.array().cast(
                    "array<struct<h: long, cstart: int, cend: int>>"))

        return let_bound(cuts, spans)

    return let_bound(s, build)
