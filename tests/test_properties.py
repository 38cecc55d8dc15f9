"""Property-based tests (SURVEY.md §5.5): randomized messages through
parse -> transform -> route, with the invariants the reference guarantees:
no crash on any payload, drop-or-route totality (valid + invalid = input),
stream ids always derivable, and compiled/interpreted JSONata agreement.

Each hypothesis example builds ONE DataFrame for the whole generated batch
(Spark jobs are too slow for per-row examples), so max_examples stays low
while each example still covers dozens of random rows.
"""

from __future__ import annotations

import pytest

# slow tier (r12): randomized fuzz — operator correctness is gated by
# the fast tier's oracle/parity tests; run with `pytest -m slow`
pytestmark = pytest.mark.slow

import json
import math

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mqtt_streamr_spark.operators.routing import (
    stream_id_from_template,
    truncate_topic,
)
from mqtt_streamr_spark.streaming import PipelineSpec, StreamingBridge

SLOW = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

json_scalars = st.one_of(
    st.none(), st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.integers(min_value=-2**31, max_value=2**31),
    st.text(max_size=20),
)
json_values = st.recursive(
    json_scalars,
    lambda child: st.one_of(
        st.lists(child, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=8), child, max_size=4),
    ),
    max_leaves=10,
)
payloads = st.one_of(
    json_values.map(json.dumps),          # valid JSON of any shape
    st.text(max_size=40),                 # mostly-invalid junk
)
topics = st.lists(
    st.text(
        alphabet="abcdefghij/",
        min_size=1, max_size=20,
    ),
    min_size=1, max_size=30,
)


@SLOW
@given(rows=st.lists(st.tuples(st.sampled_from(
    ["a/b", "/a/b/c", "x", "/", "deep/nested/topic/level"]
), payloads), min_size=1, max_size=30))
def test_parse_route_totality(spark, rows):
    """Every record either parses or is flagged invalid — none vanish, none
    crash — and every record gets a non-null stream id (bin:149-155,161-166
    semantics)."""
    df = spark.createDataFrame(rows, "topic string, payload string")
    spec = PipelineSpec(stream_id_template="/s/$topic", topic_levels=1,
                        dry_run=True)
    planned = StreamingBridge(spec).plan(df)
    out = planned.select("is_valid", "stream_id").collect()
    assert len(out) == len(rows)
    def _js_parse_ok(payload):
        # the reference's validity oracle is JS JSON.parse (bin:149-155):
        # strict on trailing content AND on NaN/Infinity, which Python's
        # json.loads would accept (parse_constant pins the JS behavior;
        # the strict_parse completeness scan pins the trailing case —
        # hypothesis found '0\n0' marked valid-but-truncated before r8)
        def _reject(tok):
            raise ValueError(tok)

        try:
            json.loads(payload, parse_constant=_reject)
            return True
        except (ValueError, TypeError):
            return False

    n_valid_expected = sum(1 for _, p in rows if _js_parse_ok(p))
    assert sum(1 for r in out if r["is_valid"]) == n_valid_expected
    assert all(r["stream_id"] is not None for r in out)


@SLOW
@given(topic_list=topics, levels=st.integers(min_value=0, max_value=6))
def test_truncation_invariants(spark, topic_list, levels):
    """truncate_topic keeps at most levels+1 '/'-parts and is always a
    prefix of the input (bin:99-106)."""
    df = spark.createDataFrame([(t,) for t in topic_list], "topic string")
    out = df.select(
        "topic", truncate_topic(F.col("topic"), levels).alias("trunc")
    ).collect()
    for r in out:
        if not levels:
            assert r["trunc"] == r["topic"]
            continue
        assert r["topic"].startswith(r["trunc"])
        assert len(r["trunc"].split("/")) <= levels + 1


@SLOW
@given(topic_list=topics)
def test_template_substitution_first_occurrence(spark, topic_list):
    """$topic substitutes the FIRST occurrence only (JS String.replace with
    a string pattern — bin:166)."""
    df = spark.createDataFrame([(t,) for t in topic_list], "topic string")
    out = df.select(
        "topic",
        stream_id_from_template(
            F.col("topic"), "$topic-mid-$topic", topic_levels=None,
        ).alias("sid"),
    ).collect()
    for r in out:
        assert r["sid"] == "$topic-mid-$topic".replace("$topic", r["topic"], 1)


@SLOW
@given(vals=st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1,
    max_size=8,
))
def test_compiled_interpreter_agree_on_random_docs(spark, vals):
    """Differential property: a fixed transform over random numeric docs
    produces identical results from both backends."""
    from mqtt_streamr_spark.jsonata import jsonata
    from mqtt_streamr_spark.jsonata.compiler import compile_column

    expr = "$sum($map(vals, function($x){ $x * 2 })) + $count(vals)"
    doc = {"vals": vals}
    expected = jsonata(expr).evaluate(doc)
    df = spark.createDataFrame([(json.dumps(doc),)], "payload string")
    tc = compile_column(expr, F.try_parse_json("payload"))
    actual = df.select(tc.col.alias("r")).collect()[0]["r"]
    assert actual is not None and math.isclose(
        float(expected), float(actual), rel_tol=1e-9
    ), (vals, expected, actual)


def test_salted_join_matches_plain_join(spark):
    """salted_join produces exactly the plain join's rows on skewed data
    (one key holding 90% of the big side)."""
    from mqtt_streamr_spark.operators.joins import salted_join

    big = spark.createDataFrame(
        [(1 if i % 10 else i, f"v{i}") for i in range(1000)], "k int, v string"
    )
    small = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 100)], "k int, d string"
    )
    plain = {tuple(r) for r in big.join(small, "k").collect()}
    salted = {tuple(r) for r in salted_join(big, small, "k", n_salts=8).collect()}
    assert salted == plain and len(plain) > 0


def test_asof_join_carries_whole_row_not_stale_values(spark):
    """A right row with a genuinely NULL value must be attached AS-IS —
    not skipped in favor of an older non-null value, and never mixed with
    fields of a different right row (merge_asof semantics)."""
    from mqtt_streamr_spark.operators.joins import asof_join

    right = spark.createDataFrame(
        [(1, 1, 5.0, "a"), (1, 2, None, "b")],
        "k int, ts int, v double, tag string",
    )
    left = spark.createDataFrame([(1, 3, "L")], "k int, ts int, who string")
    row = asof_join(left, right, on="k", ts_col="ts").collect()[0]
    # nearest right row is ts=2: v NULL, tag 'b' — atomically
    assert row["v_asof"] is None and row["tag_asof"] == "b"

    # left row earlier than any right row -> all-NULL match (left outer)
    left2 = spark.createDataFrame([(1, 0, "E")], "k int, ts int, who string")
    row2 = asof_join(left2, right, on="k", ts_col="ts").collect()[0]
    assert row2["v_asof"] is None and row2["tag_asof"] is None


def test_salted_join_rejects_outer(spark):
    import pytest as _pytest

    from mqtt_streamr_spark.operators.joins import salted_join

    df = spark.range(2).selectExpr("id as k")
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, "k", how="full")


@SLOW
@given(data=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 2)),
    min_size=1, max_size=40,
))
def test_asof_join_matches_pandas_merge_asof(spark, data):
    """Differential oracle for the as-of join: pandas merge_asof (backward,
    by key) on random data. Timestamps deduplicated per (key, side) since
    both implementations tie-break duplicate equal-ts right rows
    arbitrarily."""
    import pandas as pd

    from mqtt_streamr_spark.operators.joins import asof_join

    seen = set()
    left_rows, right_rows = [], []
    for i, (k, ts, side) in enumerate(data):
        if (k, ts, side > 0) in seen:
            continue
        seen.add((k, ts, side > 0))
        (left_rows if side > 0 else right_rows).append((k, ts, float(i)))
    if not left_rows or not right_rows:
        return
    left = spark.createDataFrame(left_rows, "k int, ts int, lv double")
    right = spark.createDataFrame(right_rows, "k int, ts int, rv double")
    got = {
        (r["k"], r["ts"]): r["rv_asof"]
        for r in asof_join(left, right, on="k", ts_col="ts").collect()
    }
    lpd = pd.DataFrame(left_rows, columns=["k", "ts", "lv"]).sort_values("ts")
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "rv"]).sort_values("ts")
    exp = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward")
    for _, row in exp.iterrows():
        want = None if pd.isna(row["rv"]) else row["rv"]
        assert got[(row["k"], row["ts"])] == want, (row, got)


@SLOW
@given(edge_list=st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.integers(min_value=0, max_value=30)),
    min_size=1, max_size=40,
))
def test_connected_components_matches_union_find(spark, edge_list):
    """connected_components == a plain union-find ground truth on random
    graphs (self-loops and duplicate edges included), with every node
    labeled by its component's MINIMUM id."""
    from mqtt_streamr_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edge_list], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(pairs).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[int, list[int]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    want = {n: min(members) for members in comps.values() for n in members}
    assert got == want


@SLOW
@given(
    intervals=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3),       # key
                  st.integers(min_value=0, max_value=7200),    # lo offset s
                  st.integers(min_value=0, max_value=5400)),   # width s
        min_size=1, max_size=12),
    points=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3),
                  st.integers(min_value=0, max_value=14400)),
        min_size=1, max_size=25),
    bin_width=st.sampled_from([60, 900, 3600]),
)
def test_range_bin_join_equals_theta_join(spark, intervals, points,
                                          bin_width):
    """Binned range join == naive BETWEEN theta join for arbitrary
    intervals, points, and bin widths (bins smaller, equal to, and larger
    than interval widths)."""
    import pyspark.sql.functions as FN

    from mqtt_streamr_spark.operators.joins import range_bin_join

    base = "2024-03-01 00:00:00"
    left = spark.createDataFrame(
        [(i, k, lo, lo + w) for i, (k, lo, w) in enumerate(intervals)],
        "iv_id long, k long, lo_s long, hi_s long",
    ).select(
        "iv_id", "k",
        (FN.lit(base).cast("timestamp")
         + FN.make_interval(secs=FN.col("lo_s"))).alias("lo"),
        (FN.lit(base).cast("timestamp")
         + FN.make_interval(secs=FN.col("hi_s"))).alias("hi"),
    )
    right = spark.createDataFrame(
        [(j, k, t) for j, (k, t) in enumerate(points)],
        "ev_id long, k long, t_s long",
    ).select(
        "ev_id", "k",
        (FN.lit(base).cast("timestamp")
         + FN.make_interval(secs=FN.col("t_s"))).alias("ts"),
    )
    binned = {
        (r["iv_id"], r["ev_id"])
        for r in range_bin_join(left, right, "k", "lo", "hi", "ts",
                                bin_width_s=bin_width).collect()
    }
    naive = {
        (r["iv_id"], r["ev_id"])
        for r in left.join(
            right,
            (left["k"] == right["k"])
            & right["ts"].between(left["lo"], left["hi"]),
        ).collect()
    }
    assert binned == naive


@SLOW
@given(gaps=st.lists(st.integers(min_value=0, max_value=4000),
                     min_size=1, max_size=30),
       threshold=st.sampled_from([600, 1800]))
def test_sessionize_matches_python_reference(spark, gaps, threshold):
    """sessionize == a sequential Python reference over random gap
    sequences (single key): session increments exactly when a gap
    strictly exceeds the threshold."""
    import pyspark.sql.functions as FN

    from mqtt_streamr_spark.operators.joins import sessionize

    ts, acc = [], 0
    for g in gaps:
        acc += g
        ts.append(acc)
    rows = spark.createDataFrame(
        [(1, t) for t in ts], "k long, t_s long"
    ).select(
        "k",
        (FN.lit("2024-05-01").cast("timestamp")
         + FN.make_interval(secs=FN.col("t_s"))).alias("ts"),
    ).distinct()  # duplicate timestamps collapse (gap 0 rows may repeat)
    got = {
        int(r["ts"].timestamp()): r["session_seq"]
        for r in sessionize(rows, "k", "ts", gap_s=threshold).collect()
    }
    base = int(__import__("datetime").datetime(2024, 5, 1).timestamp())
    want, seq, prev = {}, 0, None
    for t in sorted(set(ts)):
        if prev is None or (t - prev) > threshold:
            seq += 1
        want[base + t] = seq
        prev = t
    assert got == want


@SLOW
@given(data=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 2)),
    min_size=1, max_size=40,
))
def test_asof_join_directions_match_pandas(spark, data):
    """Differential oracle for the forward / nearest directions and the
    tolerance knob: pandas merge_asof on the same random data. Nearest
    equidistant ties are excluded (pandas resolves them forward, this
    operator documents backward — both are valid conventions; exact-tie
    inputs are filtered so the differential stays meaningful)."""
    import pandas as pd

    from mqtt_streamr_spark.operators.joins import asof_join

    seen = set()
    left_rows, right_rows = [], []
    for i, (k, ts, side) in enumerate(data):
        if (k, ts, side > 0) in seen:
            continue
        seen.add((k, ts, side > 0))
        (left_rows if side > 0 else right_rows).append((k, ts, float(i)))
    if not left_rows or not right_rows:
        return
    left = spark.createDataFrame(left_rows, "k int, ts int, lv double")
    right = spark.createDataFrame(right_rows, "k int, ts int, rv double")
    lpd = pd.DataFrame(left_rows, columns=["k", "ts", "lv"]).sort_values("ts")
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "rv"]).sort_values("ts")

    for direction, tol in (("forward", None), ("backward", 5),
                           ("forward", 5), ("nearest", None)):
        got = {
            (r["k"], r["ts"]): r["rv_asof"]
            for r in asof_join(left, right, on="k", ts_col="ts",
                               direction=direction,
                               tolerance_s=tol).collect()
        }
        exp = pd.merge_asof(
            lpd, rpd, on="ts", by="k", direction=direction,
            **({"tolerance": tol} if tol is not None else {}),
        )
        rts = {k: sorted(t for kk, t, _v in right_rows if kk == k)
               for k in {kk for kk, _t, _v in right_rows}}
        for _, row in exp.iterrows():
            if direction == "nearest":
                # skip exact equidistant ties (convention differs)
                ts_list = rts.get(row["k"], [])
                lo = max((t for t in ts_list if t <= row["ts"]),
                         default=None)
                hi = min((t for t in ts_list if t >= row["ts"]),
                         default=None)
                if (lo is not None and hi is not None and lo != hi
                        and row["ts"] - lo == hi - row["ts"]):
                    continue
            want = None if pd.isna(row["rv"]) else row["rv"]
            assert got[(row["k"], row["ts"])] == want, (
                direction, tol, dict(row), got
            )


@SLOW
@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        min_size=2, max_size=12, unique=True,
    )
)
def test_symdel_fuzzy_join_matches_brute_force(spark, words):
    """SymSpell blocking is recall-exact for Levenshtein <= 1: against
    random short strings over a tiny alphabet (maximizing collisions and
    near-misses), the blocked join must equal the brute-force cross
    check exactly."""
    import itertools

    from mqtt_streamr_spark.operators.joins import symdel_fuzzy_join

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    left = list(enumerate(words))
    right = [(100 + i, w) for i, w in enumerate(words[::-1])]
    expected = {
        (li, ri, lev(lw, rw))
        for (li, lw), (ri, rw) in itertools.product(left, right)
        if lev(lw, rw) <= 1
    }
    ldf = spark.createDataFrame(left, "id long, name string")
    rdf = spark.createDataFrame(right, "id long, name string")
    got = {
        (r["l_key"], r["r_key"], r["dist"])
        for r in symdel_fuzzy_join(ldf, rdf, "id", "id",
                                   "name", "name").collect()
    }
    assert got == expected


@SLOW
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5),      # key
                  st.integers(0, 3),      # ts
                  st.integers(0, 100)),   # value
        min_size=1, max_size=24,
    ),
    split=st.integers(1, 3),
)
def test_upsert_fold_order_invariance(spark, rows, split):
    """With value-based tie_cols the LWW upsert is associative: folding
    the change set batch-by-batch (any batching) equals one big merge.
    Random keys/timestamps WITH collisions exercise exactly the tie
    paths."""
    from mqtt_streamr_spark.operators.merge import upsert

    schema = "k long, ts long, v long"
    empty = spark.createDataFrame([], schema)

    def fold(batches):
        snap = empty
        for b in batches:
            if b:
                snap = upsert(
                    snap, spark.createDataFrame(b, schema),
                    ["k"], "ts", tie_cols=["v"],
                )
        return {(r["k"], r["ts"], r["v"]) for r in snap.collect()}

    data = [(k, t, v) for k, t, v in rows]
    one_shot = fold([data])
    n = max(1, len(data) // split)
    batched = fold([data[i:i + n] for i in range(0, len(data), n)])
    assert one_shot == batched


@SLOW
@given(
    old_rows=st.dictionaries(st.integers(0, 8), st.integers(0, 5),
                             max_size=8),
    new_rows=st.dictionaries(st.integers(0, 8), st.integers(0, 5),
                             max_size=8),
)
def test_snapshot_diff_apply_roundtrip(spark, old_rows, new_rows):
    """Algebraic identity linking the CDC operators: applying
    diff(old, new) back onto old — drop removed keys, upsert
    changed+added — reconstructs new exactly."""
    from mqtt_streamr_spark.operators.merge import snapshot_diff, upsert

    schema = "k long, v long"
    old = spark.createDataFrame(list(old_rows.items()) or [(99, 0)], schema)
    new = spark.createDataFrame(list(new_rows.items()) or [(99, 0)], schema)
    d = snapshot_diff(old, new, ["k"]).collect()
    removed = {r["k"] for r in d if r["change_type"] == "removed"}
    changes = [(r["k"], r["v"]) for r in d
               if r["change_type"] in ("added", "changed")]
    kept = old.filter(~old["k"].isin(removed)) if removed else old
    if changes:
        # ts-less apply: key the upsert on a constant clock; the batch
        # wins ties, which is exactly "the change replaces the old row"
        import pyspark.sql.functions as FN

        kept_ts = kept.withColumn("ts", FN.lit(0))
        chg = spark.createDataFrame(changes, schema).withColumn(
            "ts", FN.lit(0))
        rebuilt = upsert(kept_ts, chg, ["k"], "ts").drop("ts")
    else:
        rebuilt = kept
    got = {(r["k"], r["v"]) for r in rebuilt.collect()}
    want = {(r["k"], r["v"]) for r in new.collect()}
    assert got == want


@SLOW
@given(
    ivs=st.lists(
        st.tuples(st.integers(0, 5000), st.integers(-500, 2000)),
        min_size=0, max_size=40,
    ),
)
def test_interval_overlap_join_matches_naive(spark, ivs):
    """Binned interval-overlap join == the naive all-pairs overlap filter
    for arbitrary interval sets (including bin-boundary-touching and
    multi-bin-spanning intervals). Degenerate intervals (width <= 0,
    i.e. empty/inverted half-open ranges) overlap NOTHING — the naive
    reference enforces well-formedness on both sides, and the operator
    must agree instead of emitting phantom pairs against spanning
    partners."""
    import datetime as dt

    from mqtt_streamr_spark.operators.joins import interval_overlap_join

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=lo), base + dt.timedelta(seconds=lo + w))
        for i, (lo, w) in enumerate(ivs)
    ]
    left = spark.createDataFrame(
        rows or [(0, base, base)], "l_id long, l_lo timestamp, l_hi timestamp"
    )
    right = (
        left.selectExpr("l_id + 1000 AS r_id", "l_lo AS r_lo", "l_hi AS r_hi")
    )
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(
            left, right, "l_lo", "l_hi", "r_lo", "r_hi", bin_width_s=600
        ).collect()
    )
    naive = sorted(
        (a_id, b_id + 1000)
        for (a_id, a_lo, a_hi) in (rows or [(0, base, base)])
        for (b_id, b_lo, b_hi) in (rows or [(0, base, base)])
        if a_lo < a_hi and b_lo < b_hi and a_lo < b_hi and b_lo < a_hi
    )
    assert got == naive


@SLOW
@given(
    words=st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]),
        min_size=1, max_size=300,
    ),
)
def test_frequent_terms_matches_exact_count(spark, words):
    """frequent_terms == the exact full-vocabulary aggregate filtered at
    min_support, for arbitrary skew."""
    from collections import Counter

    from mqtt_streamr_spark.operators.text import frequent_terms

    docs = [" ".join(words[i:i + 7]) for i in range(0, len(words), 7)]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    got = {
        r["term"]: r["cnt"]
        for r in frequent_terms(
            df.repartition(3), min_support=0.25, counters=8
        ).collect()
    }
    c = Counter(words)
    n = sum(c.values())
    want = {t: k for t, k in c.items() if k >= n * 0.25}
    assert got == want


@SLOW
@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("abcdefghij")), min_size=1,
                 max_size=12).map(lambda xs: " ".join(xs)),
        min_size=2, max_size=15,
    ),
)
def test_jaccard_prefix_join_matches_naive(spark, docs):
    """Prefix-filter exact Jaccard join finds EXACTLY the naive all-pairs
    result — completeness of the pruning on arbitrary token sets."""
    from mqtt_streamr_spark.operators.dedup import jaccard_prefix_join

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in jaccard_prefix_join(df, threshold=0.6).collect()
    )
    sets = [set(t.split()) for t in docs]
    naive = sorted(
        (a, b)
        for a in range(len(sets))
        for b in range(a + 1, len(sets))
        if len(sets[a] & sets[b])
        / max(len(sets[a] | sets[b]), 1) >= 0.6
    )
    assert got == naive


@SLOW
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 999), st.integers(1, 400)),
        min_size=1, max_size=60,
    ),
)
def test_budget_selection_two_phase_equals_naive_cumsum(spark, docs):
    """The PRODUCTION segmented prefix-sum (segmented_cumsum, the one
    llm_budget_selection runs) must equal the naive global cumulative
    sum for arbitrary (quality-bucket, token-count) distributions —
    including many docs in one bucket and budget boundaries landing
    mid-bucket."""
    from mqtt_streamr_spark.queries.llm_pipeline import segmented_cumsum

    rows = [(i, qb, toks) for i, (qb, toks) in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, qb long, n_toks long")
    budget = max(sum(t for _, _, t in rows) // 2, 1)

    cum = segmented_cumsum(d, "qb", "doc_id", "n_toks")
    got = sorted(
        r["doc_id"] for r in cum.filter(cum["cum"] <= budget).collect()
    )
    cum, want = 0, []
    for i, qb, toks in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += toks
        if cum <= budget:
            want.append(i)
    assert got == sorted(want)


@settings(max_examples=200, deadline=None)
@given(
    topic=st.text(
        st.characters(codec="utf-8", exclude_characters="\x00"),
        min_size=1, max_size=80,
    ),
    payload=st.text(max_size=2000),
)
def test_mqtt_packet_codec_roundtrip(topic, payload):
    """The mini-broker's MQTT 3.1.1 packet codec round-trips arbitrary
    topics/payloads through a socketpair — covers multi-byte UTF-8
    topics, empty payloads, and remaining-length boundaries (127/128,
    16383/16384 — the varint continuation edges, spec 2.2.3)."""
    import socket
    import struct

    from mqtt_streamr_spark.sources.minibroker import (
        PUBLISH,
        _encode_remaining,
        _mqtt_str,
        read_packet,
        write_packet,
    )

    a, b = socket.socketpair()
    try:
        body = _mqtt_str(topic) + payload.encode("utf-8")
        write_packet(a, PUBLISH, 0, body)
        ptype, flags, got = read_packet(b)
        assert (ptype, flags) == (PUBLISH, 0)
        ln = struct.unpack(">H", got[:2])[0]
        assert got[2:2 + ln].decode("utf-8") == topic
        assert got[2 + ln:].decode("utf-8") == payload
    finally:
        a.close()
        b.close()
    # varint edges explicitly (one byte -> two -> three)
    for n, want in [(0, b"\x00"), (127, b"\x7f"), (128, b"\x80\x01"),
                    (16383, b"\xff\x7f"), (16384, b"\x80\x80\x01")]:
        assert _encode_remaining(n) == want


@SLOW
@given(doc=st.dictionaries(
    st.text(
        st.characters(codec="utf-8", exclude_characters='\x00"\\'),
        min_size=1, max_size=12,
    ),
    st.one_of(
        st.none(), st.booleans(), st.integers(-1000, 1000),
        st.text(max_size=8), st.lists(st.integers(0, 9), max_size=3),
        st.dictionaries(st.text("ab", min_size=1, max_size=2),
                        st.integers(0, 9), max_size=2),
    ),
    min_size=0, max_size=12,
))
def test_compiled_keys_preserves_insertion_order(spark, doc):
    """$keys($) on the compiled variant path returns keys in INSERTION
    order for arbitrary schemaless documents — the whole point of the
    raw-JSON ordered-map encoding (the variant binary sorts keys). The
    interpreter (python dicts are insertion-ordered) is the reference;
    the comparison is order-SENSITIVE."""
    from mqtt_streamr_spark.jsonata import jsonata
    from mqtt_streamr_spark.jsonata.compiler import compile_column
    from mqtt_streamr_spark.jsonata.values import UNDEFINED

    expected = jsonata("$keys($)").evaluate(doc)
    df = spark.createDataFrame([(json.dumps(doc),)], "payload string")
    tc = compile_column("$keys($)", F.try_parse_json("payload"),
                        raw_col=F.col("payload"))
    actual = df.select(tc.col.alias("r")).collect()[0]["r"]
    if expected is UNDEFINED or expected == []:
        assert actual in (None, []), (doc, actual)
    else:
        assert actual == expected, (doc, actual, expected)


@SLOW
@given(
    a=st.dictionaries(st.text("abcdefgh", min_size=1, max_size=3),
                      st.integers(-99, 99), max_size=6),
    b=st.dictionaries(st.text("abcdefgh", min_size=1, max_size=3),
                      st.one_of(st.none(), st.integers(-99, 99)),
                      max_size=6),
)
def test_compiled_merge_sift_order_parity(spark, a, b):
    """$merge and $sift on the compiled variant path match the
    interpreter for random overlapping objects — values, KEY ORDER
    (in-place override), and the JSON-null-vs-missing distinction.
    Comparison goes through the JSON serialization: the ENGINE-side map
    preserves order everywhere (map_keys/map_entries/to_json), but
    PySpark's collect() of a MapType builds the Python dict in arbitrary
    order — collecting the map directly would test the pickler, not the
    plan."""
    from mqtt_streamr_spark.jsonata import jsonata
    from mqtt_streamr_spark.jsonata.compiler import (
        compile_column,
        to_json_string,
    )

    doc = {"a": a, "b": b}
    df = spark.createDataFrame([(json.dumps(doc),)], "payload string")

    for expr in ("$merge([a, b])",
                 "$sift(a, function($v){ $v >= 0 })"):
        expected = jsonata(expr).evaluate(doc)
        tc = compile_column(expr, F.try_parse_json("payload"),
                            raw_col=F.col("payload"))
        got_json = df.select(
            to_json_string(tc).alias("r")).collect()[0]["r"]
        got = json.loads(got_json)  # python dicts keep insertion order
        assert list(got) == list(expected), (expr, doc, got, expected)
        assert got == expected, (expr, doc, got, expected)


@SLOW
@given(doc=st.dictionaries(
    st.sampled_from(["k", "a", "b", "zz"]),
    st.recursive(
        st.one_of(st.none(), st.booleans(), st.integers(-99, 99),
                  st.text("xy", max_size=4)),
        lambda c: st.one_of(
            st.lists(c, max_size=3),
            st.dictionaries(st.sampled_from(["k", "a", "b", "zz"]), c,
                            max_size=4),
        ),
        max_leaves=12,
    ),
    min_size=0, max_size=4,
))
def test_compiled_descendants_preorder_parity(spark, doc):
    """``**.k`` on the compiled variant path matches the interpreter's
    pre-order document-order descendant walk for arbitrary schemaless
    documents (r6 raw-text recursion). Order-SENSITIVE comparison; the
    one normalization applied is the documented null==absent divergence
    (compiled drops JSON-null matches) plus JSONata's top-level
    singleton unwrap."""
    from hypothesis import assume

    from mqtt_streamr_spark.jsonata import jsonata
    from mqtt_streamr_spark.jsonata.compiler import (
        VARIANT_DESC_DEPTH,
        compile_column,
    )
    from mqtt_streamr_spark.jsonata.values import UNDEFINED

    def depth(v):
        if isinstance(v, dict):
            return 1 + max((depth(x) for x in v.values()), default=0)
        if isinstance(v, list):
            return 1 + max((depth(x) for x in v), default=0)
        return 0

    def arr_chain(v):
        """Longest run of consecutive array nesting anywhere in v (a dict
        breaks the run; its values start fresh runs)."""
        if isinstance(v, list):
            here = 1 + max(
                (arr_chain(x) for x in v if isinstance(x, list)), default=0
            )
            inner = max(
                (arr_chain(x) for x in v if isinstance(x, dict)), default=0
            )
            return max(here, inner)
        if isinstance(v, dict):
            return max((arr_chain(x) for x in v.values()), default=0)
        return 0

    assume(depth(doc) <= VARIANT_DESC_DEPTH - 1)
    # matched arrays flatten recursively only _SEQ_FLATTEN_UNROLL deep —
    # the documented bounded-unroll divergence; keep inputs inside it
    from mqtt_streamr_spark.jsonata.compiler import _SEQ_FLATTEN_UNROLL

    assume(arr_chain(doc) <= _SEQ_FLATTEN_UNROLL)

    expected = jsonata("**.k").evaluate(doc)
    if expected is UNDEFINED:
        exp_list = []
    elif isinstance(expected, list):
        exp_list = list(expected)
    else:
        exp_list = [expected]
    exp_list = [e for e in exp_list if e is not None]

    df = spark.createDataFrame([(json.dumps(doc),)], "payload string")
    tc = compile_column("**.k", F.try_parse_json("payload"),
                        raw_col=F.col("payload"))
    actual = df.select(tc.col.alias("r")).collect()[0]["r"]
    if hasattr(actual, "toPython"):  # boundary-normalized variant result
        actual = actual.toPython()
    if actual is None:
        act_list = []
    elif isinstance(actual, list):
        act_list = [v.toPython() if hasattr(v, "toPython") else v
                    for v in actual]
    else:
        act_list = [actual]  # singleton sequence unwrapped at the boundary
    assert act_list == exp_list, (doc, act_list, exp_list)


# ---- differential fuzzer: random JSONata expressions, compiled vs
# interpreted over the same document ----------------------------------------

_FUZZ_DOC = {
    "user": "ada",
    "kind": "sensor/temp",
    "value": 21.5,
    "count": 3,
    "ok": True,
    "tags": ["a", "b", "c"],
    "nums": [1.5, 2.5, 3.0],
    "nested": {"k": 42, "name": "x y z"},
}

_num_atoms = ["value", "count", "nums[0]", "nested.k", "2", "7.5", "0"]
_str_atoms = ["user", "kind", "tags[1]", "'lit'", "nested.name"]
_bool_atoms = ["ok", "true", "false"]


def _num_exprs(depth):
    base = st.sampled_from(_num_atoms)
    if depth == 0:
        return base
    sub = _num_exprs(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"),
        st.sampled_from(["$sum(nums)", "$count(nums)", "$max(nums)",
                         "$min(nums)", "$count(tags)"]),
        sub.map(lambda e: f"$number($string({e}))"),
        st.tuples(_bool_exprs(0), sub, sub).map(
            lambda t: f"({t[0]} ? {t[1]} : {t[2]})"),
    )


def _str_exprs(depth):
    base = st.sampled_from(_str_atoms)
    if depth == 0:
        return base
    sub = _str_exprs(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, sub).map(lambda t: f"({t[0]} & {t[1]})"),
        sub.map(lambda e: f"$uppercase({e})"),
        sub.map(lambda e: f"$lowercase({e})"),
        sub.map(lambda e: f"$substring({e}, 1, 3)"),
        _num_exprs(depth - 1).map(lambda e: f"$string({e})"),
    )


def _bool_exprs(depth):
    base = st.sampled_from(_bool_atoms)
    if depth == 0:
        return base
    nsub = _num_exprs(depth - 1)
    ssub = _str_exprs(depth - 1)
    bsub = _bool_exprs(depth - 1)
    return st.one_of(
        base,
        st.tuples(nsub, st.sampled_from(["<", "<=", ">", ">=", "=", "!="]),
                  nsub).map(lambda t: f"({t[0]} {t[1]} {t[2]})"),
        st.tuples(ssub, st.sampled_from(["=", "!="]), ssub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"),
        st.tuples(bsub, st.sampled_from(["and", "or"]), bsub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"),
        bsub.map(lambda e: f"$not({e})"),
        ssub.map(lambda e: f"$contains({e}, 'a')"),
    )


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(expr=st.one_of(_num_exprs(3), _str_exprs(3), _bool_exprs(3)))
def test_fuzz_compiled_matches_interpreter(spark, expr):
    """Differential fuzzer (SURVEY §5.2 taken further): RANDOMLY COMPOSED
    JSONata expressions over arithmetic, comparisons, boolean logic,
    string functions, aggregates, conditionals and path/index atoms must
    evaluate identically on the compiled variant path and the
    interpreter. The fixed 240+ differential cases pin known surfaces;
    this explores their compositions. Interpreter type errors are the
    documented error→null divergence class and are skipped (asserted
    separately in test_type_error_divergence_documented)."""
    import math

    from hypothesis import assume

    import pyspark.sql.functions as F

    from mqtt_streamr_spark.jsonata import jsonata
    from mqtt_streamr_spark.jsonata.compiler import (
        NotCompilable,
        compile_column,
    )
    from mqtt_streamr_spark.jsonata.errors import JsonataError
    from mqtt_streamr_spark.jsonata.values import UNDEFINED

    try:
        expected = jsonata(expr).evaluate(_FUZZ_DOC)
    except JsonataError:
        assume(False)  # documented error->null divergence class
    try:
        tc = compile_column(expr, F.try_parse_json("payload"),
                            raw_col=F.col("payload"))
    except NotCompilable:
        assume(False)
    df = spark.createDataFrame([(json.dumps(_FUZZ_DOC),)], "payload string")
    actual = df.select(tc.col.alias("r")).collect()[0]["r"]
    if hasattr(actual, "toPython"):
        actual = actual.toPython()
    if expected is UNDEFINED:
        assert actual is None, (expr, actual)
    elif isinstance(expected, bool):
        assert actual == expected, (expr, actual, expected)
    elif isinstance(expected, (int, float)):
        assert actual is not None and math.isclose(
            float(expected), float(actual), rel_tol=1e-9
        ), (expr, actual, expected)
    else:
        assert actual == expected, (expr, actual, expected)


@SLOW
@given(
    ivs=st.lists(
        st.tuples(st.integers(0, 5000), st.integers(-500, 2000)),
        min_size=0, max_size=40,
    ),
)
def test_interval_overlap_counts_match_naive(spark, ivs):
    """interval_overlap_counts (r11) == naive per-left overlap counting
    for arbitrary interval sets: the order-statistics identity
    #{r.lo < l.hi} - #{r.hi <= l.lo} must agree with the all-pairs
    predicate, including bin-boundary-touching intervals, TOUCHING
    half-open intervals ([a,b) then [b,c) — no overlap), zero-overlap
    lefts (kept, count 0), and degenerate rows (dropped both sides)."""
    import datetime as dt

    from mqtt_streamr_spark.operators.joins import interval_overlap_counts

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=lo),
         base + dt.timedelta(seconds=lo + w))
        for i, (lo, w) in enumerate(ivs)
    ]
    left = spark.createDataFrame(
        rows or [(0, base, base)],
        "l_id long, l_lo timestamp, l_hi timestamp",
    )
    right = left.selectExpr(
        "l_id + 1000 AS r_id", "l_lo AS r_lo", "l_hi AS r_hi")
    got = {
        r["l_id"]: r["n_overlaps"]
        for r in interval_overlap_counts(
            left, right, ["l_id"], "l_lo", "l_hi", "r_lo", "r_hi",
            bin_width_s=600,
        ).collect()
    }
    naive = {
        a_id: sum(
            1
            for (_, b_lo, b_hi) in (rows or [(0, base, base)])
            if b_lo < b_hi and a_lo < b_hi and b_lo < a_hi
        )
        for (a_id, a_lo, a_hi) in (rows or [(0, base, base)])
        if a_lo < a_hi
    }
    assert got == naive
