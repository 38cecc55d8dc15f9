"""Cross-row join extensions: the as-of (nearest-earlier-event) join.

The reference implements no relational joins at all (SURVEY.md §2.3 —
single-stream, record-at-a-time; /root/reference/bin/mqtt-streamr.js has
only a memoized registry lookup). Standard equi/semi/anti/outer joins are
Spark built-ins exercised by the relational query set; the as-of join is
the one join shape worth a custom operator for time-series work.

Scale design: implemented with the union + partitioned-window pattern —
tag both sides, union, one shuffle on the key, sort by (ts, side) within
the partition, and carry the right side's values forward with
``last(ignorenulls)``. This is O(n log n) per key group with ONE shuffle;
the naive alternative (theta join on ``l.key = r.key AND r.ts <= l.ts``
+ max) is a range explosion that degenerates to broadcast-nested-loop at
scale. Skewed keys: the window is per key, so AQE skew handling does not
split it — pre-salt hot keys if a key's history exceeds one executor's
memory.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def salted_join(big: DataFrame, small: DataFrame, on: list[str] | str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with manual skew salting: the big (skewed) side gets a
    deterministic salt in [0, n_salts) from a hash of its rows, the small
    side is replicated n_salts times, and the join key becomes
    (on..., salt) — a hot key's rows spread over n_salts reducers.

    AQE's skew-join splitting (on by default in session.py) handles most
    skew for sort-merge joins at runtime; this operator is the explicit
    fallback for when a single key exceeds what one task can hold even
    after AQE splitting, or for shuffle-hash paths AQE won't split. Cost:
    the small side is materialized n_salts times — only use when the small
    side is broadcast-size anyway. Only inner/left are valid: an outer
    join on the small side would emit each unmatched small row once per
    salt replica."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r}"
        )
    on = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                  F.lit(n_salts)).cast("int")
    big_s = big.withColumn("__salt", salt)
    salts = (
        small.sparkSession.range(n_salts)
        .select(F.col("id").cast("int").alias("__salt"))
    )
    small_s = small.crossJoin(F.broadcast(salts))
    return big_s.join(small_s, on + ["__salt"], how).drop("__salt")


def asof_join(left: DataFrame, right: DataFrame, on: str,
              ts_col: str = "ts",
              right_value_cols: list[str] | None = None,
              suffix: str = "_asof",
              direction: str = "backward",
              tolerance_s: float | None = None) -> DataFrame:
    """For each left row, attach the nearest right row for the same ``on``
    key (pandas/DuckDB ``merge_asof`` semantics, exact-ts matches
    included). Right value columns appear with ``suffix``; unmatched left
    rows get NULLs (left-outer semantics).

    ``direction``: 'backward' (greatest right ts <= left ts — default),
    'forward' (smallest right ts >= left ts), or 'nearest' (whichever is
    closer in time; equidistant ties prefer the backward match).
    ``tolerance_s``: maximum |left ts - right ts| in seconds; a match
    farther away than this is nulled out.

    All three directions keep the single-shuffle union+window shape:
    'nearest' adds a second window PASS over the same key partitioning
    (one extra sort, no extra exchange)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction {direction!r} not in "
                         "backward/forward/nearest")
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in (on, ts_col)
    ]
    # the matched right row travels as ONE struct: last(ignorenulls) then
    # skips only left rows (whose struct is NULL), never a right row some
    # of whose values are genuinely NULL — per-column carry would smear
    # values from different right rows together and resurrect stale
    # values. The right row's own ts rides along as __rts for the
    # tolerance / nearest logic.
    rtypes = dict(right.dtypes)
    right_struct_type = (
        "struct<__rts: " + rtypes[ts_col] + ", "
        + ", ".join(f"{c}: {rtypes[c]}" for c in right_value_cols)
        + ">"
    )
    r_tagged = right.select(
        on, ts_col,
        F.struct(
            F.col(ts_col).alias("__rts"),
            *[F.col(c) for c in right_value_cols],
        ).alias("__r"),
        F.lit(0).alias("__side"),
    )
    l_tagged = left.withColumn(
        "__r", F.lit(None).cast(right_struct_type)
    ).withColumn("__side", F.lit(1))
    for c in left.columns:
        if c not in (on, ts_col):
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(dict(left.dtypes)[c])
            )
    u = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    def carry(frame: DataFrame, ascending: bool, out_col: str) -> DataFrame:
        # ts ascending + side asc => backward candidate at the current
        # row (equal-ts right sorts first, so >= matches include it);
        # ts descending + side asc => forward candidate, symmetric
        order = (F.col(ts_col).asc() if ascending
                 else F.col(ts_col).desc())
        w = (
            Window.partitionBy(on)
            .orderBy(order, F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return frame.withColumn(
            out_col, F.last("__r", ignorenulls=True).over(w)
        )

    if direction == "backward":
        u = carry(u, True, "__m")
    elif direction == "forward":
        u = carry(u, False, "__m")
    else:  # nearest: both passes share the key partitioning (one shuffle)
        u = carry(carry(u, True, "__b"), False, "__f")
        dist_b = F.abs(
            F.col(ts_col).cast("double")
            - F.col("__b").getField("__rts").cast("double")
        )
        dist_f = F.abs(
            F.col("__f").getField("__rts").cast("double")
            - F.col(ts_col).cast("double")
        )
        u = u.withColumn(
            "__m",
            F.when(F.col("__b").isNull(), F.col("__f"))
            .when(F.col("__f").isNull(), F.col("__b"))
            .when(dist_f < dist_b, F.col("__f"))
            .otherwise(F.col("__b")),  # ties prefer backward
        ).drop("__b", "__f")
    if tolerance_s is not None:
        within = (
            F.abs(
                F.col(ts_col).cast("double")
                - F.col("__m").getField("__rts").cast("double")
            ) <= F.lit(float(tolerance_s))
        )
        u = u.withColumn("__m", F.when(within, F.col("__m")))
    out = u.filter(F.col("__side") == 1).drop("__side")
    for c in right_value_cols:
        out = out.withColumn(c + suffix, F.col("__m").getField(c))
    return out.drop("__m", "__r")


def range_bin_join(left: DataFrame, right: DataFrame, on: list[str] | str,
                   lo_col: str, hi_col: str, ts_col: str,
                   bin_width_s: int = 900) -> DataFrame:
    """Interval/range join at scale: rows of ``right`` whose ``ts_col``
    falls in ``left``'s [lo_col, hi_col], matched per equi-key. (No
    reference analog — the reference is single-stream record-at-a-time,
    SURVEY.md §2.3; this is a north-star batch extension.)

    Spark has no native range-join optimization — a plain
    ``l.key = r.key AND r.ts BETWEEN l.lo AND l.hi`` join keeps the
    equi-part but every key group degenerates to an in-group nested loop
    (and with no equi-key at all, BroadcastNestedLoop). The scale shape is
    BINNING: quantize time into ``bin_width_s`` buckets, explode each
    interval over the buckets it covers, key each right row by its single
    bucket, equi-join on (key..., bucket), then apply the exact BETWEEN as
    a post-filter. One uniform shuffle on (key, bucket); fan-out is
    bounded by interval_width / bin_width (pick bin_width near the median
    interval width). A right row occupies exactly one bucket, so no
    dedup step is needed."""
    on = [on] if isinstance(on, str) else list(on)
    w_us = int(bin_width_s) * 1_000_000
    lo_bin = F.floor(F.unix_micros(F.col(lo_col)) / w_us)
    hi_bin = F.floor(F.unix_micros(F.col(hi_col)) / w_us)
    left_e = left.withColumn(
        "__bin", F.explode(F.sequence(lo_bin, hi_bin))
    )
    right_b = right.withColumn(
        "__bin", F.floor(F.unix_micros(F.col(ts_col)) / w_us)
    )
    return (
        left_e.join(right_b, on + ["__bin"])
        .filter(F.col(ts_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("__bin")
    )


def sessionize(df: DataFrame, key_col: str, ts_col: str = "ts",
               gap_s: int = 1800) -> DataFrame:
    """Assign gap-based session ids: within each key (ordered by time), a
    new session starts when the gap to the previous row exceeds
    ``gap_s``. (No reference analog — nearest concept is the per-key
    data-timeout watchdog, /root/reference/bin/mqtt-streamr.js:57-61,
    which is processing-time liveness, not event-time sessions.) Adds ``session_seq`` (1-based per key) — the classic
    lag + cumulative-sum window pattern, ONE shuffle on the key.

    This complements Spark's ``session_window`` aggregation (which yields
    per-session AGGREGATES): sessionize labels the individual rows, so
    downstream per-event logic (funnels, attribution, per-session joins)
    keeps row granularity. Same caveat as any per-key window: a
    pathologically hot key serializes within its partition."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(ts_col).over(w)
    )
    is_new = F.when(
        gap_us.isNull() | (gap_us > gap_s * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def symdel_fuzzy_join(left: DataFrame, right: DataFrame,
                      left_id: str, right_id: str,
                      left_text: str, right_text: str,
                      max_dist: int = 1) -> DataFrame:
    """Fuzzy string join (entity resolution) with symmetric-delete
    blocking (SymSpell): two strings within Levenshtein distance 1
    (insert/delete/substitute) MUST share a member of each other's
    {self} ∪ {one-char-deleted variants} set, so exploding that
    neighborhood and equi-joining on the variant generates a candidate
    superset, and an exact ``levenshtein`` filter makes the result exact.

    Why this blocking at 100 TB: prefix- or length-banding collapses
    when keys share long common prefixes (every TPC-H name starts
    'Customer#...' — one giant block, quadratic). Deletion variants
    spread candidates across len(s)+1 fine-grained buckets whose size
    tracks genuine near-matches, and the whole pipeline is explode →
    one equi-join shuffle → distinct → map-side verify. Cost: ~len(s)+1
    replica rows per string in the variant shuffle. max_dist=1 only
    (deeper distances need recursive deletes; generate them before the
    join if you need k=2)."""
    if max_dist != 1:
        raise ValueError("symdel_fuzzy_join supports max_dist=1 only")

    def variants(tc: str):
        return F.explode(F.expr(
            f"array_union(array({tc}), "
            f"transform(sequence(1, length({tc})), "
            f"i -> concat(substring({tc}, 1, i-1), "
            f"substring({tc}, i+1, length({tc})))))"
        ))

    # distinct BEFORE the join: strings with repeated-char runs generate
    # the same deletion variant many times (deleting any char of a run of
    # r identical chars yields one string), and duplicate variants on both
    # sides multiply candidate rows r_l*r_r per true pair. One extra
    # map-side-combining distinct per side caps that amplification.
    lv = left.select(
        F.col(left_id).alias("l_key"), F.col(left_text).alias("l_text")
    ).withColumn("_var", variants("l_text")).distinct()
    rv = right.select(
        F.col(right_id).alias("r_key"), F.col(right_text).alias("r_text")
    ).withColumn("_var", variants("r_text")).distinct()
    cand = (
        lv.join(rv, "_var")
        .select("l_key", "l_text", "r_key", "r_text")
        .distinct()
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein(F.col("l_text"), F.col("r_text")))
        .filter(F.col("dist") <= max_dist)
        .select("l_key", "r_key", "dist")
    )


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_lo: str, l_hi: str, r_lo: str, r_hi: str,
                          bin_width_s: int = 900,
                          on: list[str] | str | None = None) -> DataFrame:
    """Interval × interval OVERLAP join at scale: pairs where
    ``[l_lo, l_hi)`` and ``[r_lo, r_hi)`` intersect (strict half-open:
    ``l_lo < r_hi AND r_lo < l_hi``). (No reference analog — the
    reference is single-stream record-at-a-time, SURVEY.md §2.3; this
    extends range_bin_join from point-in-interval to interval-interval.)

    A naive theta join is a cross product with a post-filter
    (BroadcastNestedLoop). The scale shape: explode BOTH sides over the
    ``bin_width_s`` buckets each interval covers and equi-join on the
    bucket. Overlapping intervals share at least the bucket containing
    the overlap's start (``greatest(l_lo, r_lo)`` lies in both), so to
    count each pair exactly ONCE — without a data-sized distinct — keep
    only the join row whose bucket IS that start bucket, then apply the
    exact overlap predicate. One uniform shuffle on (keys..., bucket);
    fan-out per row is interval_width / bin_width (pick bin_width near
    the median interval width). Left/right columns must not collide
    (alias before calling); ``on`` adds optional equi-keys.

    Well-formedness: intervals must satisfy ``lo < hi`` — a half-open
    empty/inverted interval like [10, 5) overlaps NOTHING. Malformed
    rows are filtered out in the bin stage (they would otherwise both
    satisfy the pairwise predicate against a spanning partner AND feed
    ``sequence(start, stop)`` a descending range)."""
    on = [] if on is None else ([on] if isinstance(on, str) else list(on))
    w_us = int(bin_width_s) * 1_000_000

    def binned(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.filter(F.col(lo) < F.col(hi)).withColumn(
            "__bin",
            F.explode(F.sequence(
                F.floor(F.unix_micros(F.col(lo)) / w_us),
                F.floor(F.unix_micros(F.col(hi)) / w_us),
            )),
        )

    start_bin = F.floor(
        F.unix_micros(F.greatest(F.col(l_lo), F.col(r_lo))) / w_us
    )
    return (
        binned(left, l_lo, l_hi)
        .join(binned(right, r_lo, r_hi), on + ["__bin"])
        .filter(F.col("__bin") == start_bin)
        .filter((F.col(l_lo) < F.col(r_hi)) & (F.col(r_lo) < F.col(l_hi)))
        .drop("__bin")
    )


def interval_overlap_counts(left: DataFrame, right: DataFrame,
                            left_id: list[str],
                            l_lo: str, l_hi: str, r_lo: str, r_hi: str,
                            bin_width_s: int = 900,
                            force_shuffle_join: bool = False) -> DataFrame:
    """Per-left-interval COUNT of overlapping right intervals WITHOUT
    materializing the pairs — the aggregate-side mitigation for
    :func:`interval_overlap_join`'s quadratic TRUE OUTPUT (the sweep's
    ``interval_overlap_sessions`` row: pair materialization is Ω(true
    pairs) for any exact algorithm, ~23x time at 16x input on the
    replica corpus; when the question is "HOW MANY sessions overlapped
    each VIP session" the answer is computable in linear shuffle).

    Order-statistics identity (half-open [lo, hi) intervals, both sides
    well-formed): b overlaps a  ⟺  b.lo < a.hi AND b.hi > a.lo, and
    b.hi <= a.lo implies b.lo < a.hi, so

        n_overlaps(a) = #{b.lo < a.hi} − #{b.hi <= a.lo}

    — two rank queries against the multisets of right endpoints, no
    pair ever built. Plan shape: both endpoint multisets are binned
    (``bin_width_s``) into per-(kind, bin) counts — a partial-aggregated
    groupBy, metadata-sized output (time-span / W bins, INDEPENDENT of
    row count) — prefix-summed over a dense bin spine (single-partition
    window over the metadata-sized spine, same bounded-driver discipline
    as pack_sequences' segmented prefix sum) and broadcast. Each left
    row then answers its two rank queries with the broadcast full-bin
    cumulative plus ONE bin-local equi-join against the endpoints in its
    query bin (uniform key, bounded occupancy by W). Everything shuffles
    O(|left| + |right|) rows of a few longs. Feed MATERIALIZED interval
    tables: the metadata CTEs re-derive their input once per consumer,
    which is a pruned 2-column re-read for a table but a full re-shuffle
    for an inline shuffle-producing subplan (measured on
    sessions-from-events: inline ~6x the session shuffle).

    ``left_id`` must uniquely identify left rows. Malformed intervals
    (lo >= hi) are dropped on both sides — they overlap nothing, exactly
    as interval_overlap_join treats them. If left and right are the SAME
    set, each interval counts itself (lo < hi trivially overlaps
    itself): subtract 1. Exact integral-microsecond semantics:
    ``#{b.hi <= a.lo}`` is evaluated as ``hi_us < lo_us + 1``."""
    w_us = int(bin_width_s) * 1_000_000
    left = left.filter(F.col(l_lo) < F.col(l_hi))
    right = right.filter(F.col(r_lo) < F.col(r_hi))

    # one scan of each input: the two tagged branches ride an array
    # explode instead of a self-union, so an EXPENSIVE upstream (an
    # unmaterialized groupBy/join subplan) is derived once per consumer
    # rather than once per branch. Feed a MATERIALIZED table when the
    # interval set is itself the product of a shuffle — the metadata
    # CTEs (per/rng/cum) re-derive their input per consumer, which is a
    # pruned 2-column parquet re-read for a table but a re-shuffle for
    # an inline subplan.
    pts = (
        right.select(F.explode(F.array(
            F.struct(F.lit("lo").alias("pkind"),
                     F.unix_micros(F.col(r_lo)).alias("v")),
            F.struct(F.lit("hi").alias("pkind"),
                     F.unix_micros(F.col(r_hi)).alias("v")),
        )).alias("e"))
        .select("e.pkind", "e.v")
        .withColumn("pbin", F.floor(F.col("v") / w_us))
    )
    per = pts.groupBy("pkind", "pbin").agg(F.count(F.lit(1)).alias("c"))
    rng = per.groupBy("pkind").agg(
        F.min("pbin").alias("lo_bin"), F.max("pbin").alias("hi_bin"),
        F.sum("c").alias("total"))
    spine = rng.select(
        "pkind", F.explode(F.sequence("lo_bin", "hi_bin")).alias("pbin"))
    w_cum = Window.partitionBy("pkind").orderBy("pbin").rowsBetween(
        Window.unboundedPreceding, -1)
    cum = (
        spine.join(per, ["pkind", "pbin"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
        .withColumn("cum_below",
                    F.coalesce(F.sum("c").over(w_cum), F.lit(0)))
        .select("pkind", "pbin", "cum_below")
    )

    # two rank queries per left row, tagged by which multiset they
    # probe — same single-scan explode shape as pts
    qs = (
        left.select(*left_id, F.explode(F.array(
            F.struct(F.lit("lo").alias("pkind"),
                     F.unix_micros(F.col(l_hi)).alias("q")),
            F.struct(F.lit("hi").alias("pkind"),
                     (F.unix_micros(F.col(l_lo)) + F.lit(1))
                     .alias("q")),
        )).alias("e"))
        .select(*left_id, "e.pkind", "e.q")
        .withColumn("pbin", F.floor(F.col("q") / w_us))
    )
    qs = (
        qs.join(F.broadcast(rng), "pkind")
        .join(F.broadcast(cum), ["pkind", "pbin"], "left")
        .withColumn(
            "full_cnt",
            F.when(F.col("pbin") < F.col("lo_bin"), F.lit(0))
            .when(F.col("pbin") > F.col("hi_bin"), F.col("total"))
            .otherwise(F.col("cum_below")))
        .select(*left_id, "pkind", "q", "pbin", "full_cnt")
    )
    if force_shuffle_join:
        # pin the bin-local join and the count join-back to sort-merge —
        # what the planner picks anyway once the endpoint table outgrows
        # the broadcast threshold; for scale MEASUREMENT, without the
        # pin small multiples broadcast (zero shuffle written) and the
        # ratio reads the planner crossover, not operator growth
        pts = pts.hint("merge")
    partial = (
        qs.select(*left_id, "pkind", "q", "pbin")
        .join(pts, ["pkind", "pbin"])
        .filter(F.col("v") < F.col("q"))
        .groupBy(*left_id, "pkind")
        .agg(F.count(F.lit(1)).alias("pc"))
    )
    if force_shuffle_join:
        partial = partial.hint("merge")
    counts = (
        qs.join(partial, [*left_id, "pkind"], "left")
        .withColumn("cnt", F.col("full_cnt")
                    + F.coalesce(F.col("pc"), F.lit(0)))
    )
    return (
        counts.groupBy(*left_id)
        .agg(
            (F.sum(F.when(F.col("pkind") == "lo", F.col("cnt"))
                   .otherwise(0))
             - F.sum(F.when(F.col("pkind") == "hi", F.col("cnt"))
                     .otherwise(0))).alias("n_overlaps")
        )
    )
