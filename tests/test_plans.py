"""Physical-plan assertions: the scale claims made in docstrings, checked.

Each test renders .explain() and asserts the plan property that matters at
100 TB: predicate/projection pushdown reaching the parquet scan, broadcast
joins for dimension tables, TakeOrderedAndProject for top-k (no full sort),
single-shuffle shapes for the custom operators, and no Python evaluation
nodes in compiled-JSONata hot paths.
"""

from __future__ import annotations

import contextlib
import io
import re

import pyspark.sql.functions as F

from mqtt_streamr_spark.queries.registry import QUERIES

SF = "/root/testdata/sf0.001"


def plan_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_scan_filter_project_pushdown(spark):
    p = plan_str(QUERIES["scan_filter_project"](spark, SF))
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert pushed, p
    assert "l_returnflag" in pushed[0] and "l_quantity" in pushed[0], pushed
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    # projection pruning: untouched wide columns must not be read
    assert read and "l_tax" not in read[0] and "l_partkey" not in read[0], read


def test_q1_single_shuffle_partial_agg(spark):
    p = plan_str(QUERIES["q1_pricing_summary"](spark, SF))
    # partial + final hash aggregate around exactly one exchange
    # ("Exchange (" counts tree nodes once; bare "Exchange" also matches the
    # detail section)
    assert p.count("HashAggregate (") >= 2, p
    assert p.count("Exchange (") == 1, p
    assert "PushedFilters" in p and "l_shipdate" in p, p


def test_q5_broadcasts_dimension_tables(spark):
    p = plan_str(QUERIES["q5_local_supplier_volume"](spark, SF))
    assert p.count("BroadcastHashJoin") >= 2, p


def test_q14_broadcasts_part(spark):
    p = plan_str(QUERIES["q14_promo_revenue"](spark, SF))
    assert "BroadcastHashJoin" in p, p


def test_q3_topk_no_full_sort(spark):
    p = plan_str(QUERIES["q3_shipping_priority"](spark, SF))
    assert "TakeOrderedAndProject" in p, p


def test_asof_join_single_shuffle(spark):
    p = plan_str(QUERIES["join_asof_purchase_view"](spark, SF))
    assert "Window" in p, p
    # union of the two sides + one hash-partitioning exchange for the
    # window; no join node at all (the as-of is the window itself)
    assert "SortMergeJoin" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert p.count("Exchange (") <= 2, p


def test_compiled_jsonata_stays_jvm_side(spark):
    # variant expressions evaluate JVM-side (expression interpreter, not
    # codegen) — the load-bearing claim is NO Python evaluation nodes and a
    # vectorized parquet read
    for name in ("jsonata_transform_compiled", "jsonata_hof_compiled",
                 "jsonata_filter_compiled"):
        p = plan_str(QUERIES[name](spark, SF))
        assert "EvalPython" not in p, (name, p)
        assert "Batched: true" in p, (name, p)


def test_ordered_object_ops_compile_no_python(spark):
    """$keys/$each/$sift/$spread on the VARIANT path (schemaless input)
    compile to native Columns via the raw-JSON ordered-map encoding (r6):
    transform_to_json must pick the 'compiled' backend and the plan must
    contain no Python evaluation nodes."""
    import pyspark.sql.functions as FN

    from mqtt_streamr_spark.streaming.transform import transform_to_json

    df = spark.read.parquet(f"{SF}/events.parquet").select(
        FN.col("props").alias("payload")
    )
    expr = ('{"ks": $keys($), "vals": $each($, function($v, $k) '
            '{ $string($v) }), "kept": $sift($, function($v, $k) '
            '{ $k = "k" }), "pairs": $spread($)}')
    out_col, backend = transform_to_json(expr, FN.col("payload"))
    assert backend == "compiled", backend
    p = plan_str(df.select(out_col.alias("m")))
    assert "EvalPython" not in p, p
    assert "Batched: true" in p, p


def test_compiled_match_objects_stay_jvm_side(spark):
    """$match match-objects compile to native Columns (round 5): the plan
    must contain no Python evaluation nodes for match/index/groups
    extraction."""
    import pyspark.sql.functions as FN

    from mqtt_streamr_spark.jsonata.compiler import compile_column

    df = spark.createDataFrame([('{"kind": "sensor/temp"}',)], "payload string")
    tc = compile_column("$match(kind, /(t.)mp/)", FN.try_parse_json("payload"))
    p = plan_str(df.select(FN.to_json(tc.col).alias("m")))
    assert "EvalPython" not in p, p


def test_typed_jsonata_whole_stage_codegen(spark):
    """The typed path's payoff: struct navigation + concrete types keep the
    transform inside whole-stage codegen with no variant expressions.
    (Codegen markers only appear on the EXECUTED plan under AQE.)"""
    df = QUERIES["jsonata_transform_typed"](spark, SF)
    p = plan_str(df)
    assert "variant" not in p.lower(), p
    assert "EvalPython" not in p, p
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # "*(N)" prefixes mark whole-stage-codegen'd operators; the transform
    # Project must carry one (from_json itself is CodegenFallback)
    import re

    assert re.search(r"\*\(\d+\) Project \[struct", executed), executed


def test_typed_descendants_groupby_no_python(spark):
    """** descendants and group-by {} on the typed path must stay JVM-side
    (the whole point of the static schema expansion: no interpreter UDF)."""
    for name in ("jsonata_descendants_typed", "jsonata_groupby_typed"):
        p = plan_str(QUERIES[name](spark, SF))
        assert "EvalPython" not in p, (name, p)
        assert "Batched: true" in p, (name, p)


def test_text_prep_queries_prune_columns(spark):
    """The training-data prep stages must project only what they read —
    a scan pulling all document columns for a 2-3 column computation is
    wrong at 100 TB."""
    for name, needed, banned in (
        ("text_pii_scrub", ("text",), ("lang", "n_chars")),
        ("text_chunking", ("text", "source"), ("lang", "n_chars")),
        ("mix_rebalanced_sources", ("source", "doc_id"), ("text", "lang")),
    ):
        p = plan_str(QUERIES[name](spark, SF))
        m = re.search(r"ReadSchema: struct<([^>]*)>", p)
        assert m, (name, p)
        cols = m.group(1)
        for c in needed:
            assert c in cols, (name, cols)
        for c in banned:
            assert c not in cols, (name, cols)


def test_minhash_pipeline_no_python(spark):
    p = plan_str(QUERIES["dedup_minhash_lsh_pairs"](spark, SF))
    assert "EvalPython" not in p, p


def test_session_window_shuffles_once_per_key(spark):
    p = plan_str(QUERIES["events_session_windows"](spark, SF))
    assert "SessionWindow" in p or "session_window" in p, p


def test_topk_cosine_take_ordered(spark):
    p = plan_str(QUERIES["sim_topk_cosine"](spark, SF))
    assert "TakeOrderedAndProject" in p, p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p


def test_grouped_udfs_run_arrow_not_row_python(spark):
    """The pandas-UDF paths must execute via Arrow-batched nodes (never
    row-at-a-time BatchEvalPython)."""
    p = plan_str(QUERIES["grouped_quality_zscores"](spark, SF))
    assert "FlatMapGroupsInPandas" in p, p
    p2 = plan_str(QUERIES["grouped_geomean_values"](spark, SF))
    assert "ArrowAggregatePython" in p2 or "AggregateInPandas" in p2, p2
    p3 = plan_str(QUERIES["multimodal_features"](spark, SF))
    assert "MapInPandas" in p3, p3
    for plan in (p, p2, p3):
        assert "BatchEvalPython" not in plan, plan


def test_q18_no_broadcast_of_fact_tables(spark):
    """Fact-fact joins must stay shuffled joins — broadcasting lineitem or
    orders would OOM at scale. (At sf0.001 AQE may broadcast the small
    side; assert on the pre-AQE logical strategy via the bigger sf0.01.)"""
    p = plan_str(QUERIES["q18_large_orders"](spark, "/root/testdata/sf0.01"))
    # customer may broadcast (dimension-ish); lineitem join must not be a
    # broadcast NESTED LOOP under any plan
    assert "BroadcastNestedLoopJoin" not in p, p


def test_winnowing_no_python(spark):
    p = plan_str(QUERIES["text_winnowing_fingerprints"](spark, SF))
    assert "EvalPython" not in p and "InPandas" not in p, p


def test_approx_percentile_partial_agg_bounded_state(spark):
    """The 100 TB percentile path: approx_percentile must partial-aggregate
    (map-side sketch merge around one exchange) — unlike exact percentile,
    whose buffer holds every group value. Neither plan shows a Sort node,
    so assert the property that actually differs: the approx variant keeps
    partial aggregation with the sketch function visible in BOTH the
    partial and final aggregate (bounded state merges associatively)."""
    p = plan_str(QUERIES["agg_value_percentiles_approx"](spark, SF))
    assert p.count("Exchange (") == 1, p
    assert p.lower().count("approx_percentile") >= 2, p  # partial + final
    assert "Sort (" not in p, p
    assert "Python" not in p, p


def test_ivf_indexed_probe_partition_prunes(spark):
    """The materialized-IVF probe must reach the parquet scan as a
    PARTITION filter on cid (reads nprobe directories, not the corpus) —
    the physical claim behind the ANN scale story."""
    import hashlib
    import os
    import tempfile

    import pyspark.sql.functions as FN

    from mqtt_streamr_spark.operators import similarity as S
    from mqtt_streamr_spark.queries.llm_pipeline import _IVF_SEEDS
    from mqtt_streamr_spark.tables import load

    emb = load(spark, "embeddings", SF)
    tag = hashlib.sha1(SF.encode()).hexdigest()[:12]
    index_dir = os.path.join(tempfile.gettempdir(), f"ivf_index_{tag}")
    S.ivf_build_index(emb, _IVF_SEEDS, index_dir)
    q_vec = emb.filter(FN.col("vec_id") == 0).select("embedding").collect()[0][0]
    probe = S.ivf_probe_index(spark, index_dir, q_vec, exclude_id=0,
                              k=10, nprobe=1)
    p = plan_str(probe)
    part = [ln for ln in p.splitlines() if "PartitionFilters" in ln]
    assert part and "cid" in part[0], p           # pruning predicate present
    assert "cid IN" in part[0] or "cid = " in part[0] or "cid#" in part[0], part
    assert "Python" not in p, p
    # and the probed scan touches exactly one cell (nprobe=1 of 8 seeds);
    # inputFiles() lists pre-pruning, so check the scanned data itself
    data = spark.read.parquet(os.path.join(index_dir, "data"))
    assert data.select("cid").distinct().count() == 8
    probe.collect()  # force the full probe pipeline end-to-end
    probed_cells = (
        S.ivf_probe_index(spark, index_dir, q_vec, exclude_id=None,
                          k=10_000, nprobe=1)  # k > cell size: whole cell
        .join(data.select("vec_id", "cid"), "vec_id")
        .select("cid").distinct().count()
    )
    assert probed_cells == 1, probed_cells


def test_range_bin_join_no_nested_loop(spark):
    """The binned range join must plan as a shuffled EQUI-join on
    (key, bucket) — never BroadcastNestedLoop/cartesian, which is what a
    naive BETWEEN theta join degenerates to."""
    p = plan_str(QUERIES["join_range_view_attribution"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert "Join" in p, p
    assert "Python" not in p, p


def test_bm25_broadcasts_term_stats(spark):
    """BM25's df/idf and corpus stats are tiny — they must broadcast; the
    only big shuffles are the (id, term) aggregations. No Python."""
    p = plan_str(QUERIES["text_bm25_topdocs"](spark, SF))
    assert p.count("BroadcastHashJoin") >= 2, p
    assert "BroadcastNestedLoopJoin (" not in p or "stats" in p, p
    assert "TakeOrderedAndProject" in p, p
    assert "Python" not in p, p


def test_q21_exists_checks_are_hash_joins(spark):
    # the EXISTS/NOT EXISTS self-joins must run as hash joins keyed on
    # l_orderkey (supplier inequality + date comparison as residual
    # conditions), never as a nested-loop or cartesian scan of lineitem
    p = plan_str(QUERIES["q21_suppliers_kept_waiting"](spark, SF))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert re.search(r"(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin)"
                     r".*LeftSemi", p), p
    assert re.search(r"(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin)"
                     r".*LeftAnti", p), p


def test_q11_scalar_subquery_broadcasts_one_row(spark):
    # the HAVING threshold joins a 1-row global total: it must broadcast
    # (BNLJ over a 1-row build side = map-side filter), and the per-part
    # aggregate must not be recomputed with an extra big-side exchange
    p = plan_str(QUERIES["q11_important_parts"](spark, SF))
    assert "BroadcastExchange IdentityBroadcastMode" in plan_str(
        QUERIES["q11_important_parts"](spark, SF), "extended"
    ) or "BroadcastNestedLoopJoin" in p, p


def test_q2_correlated_min_is_window_not_self_join(spark):
    # the per-part minimum must be a window over the partkey partition —
    # one exchange, no join of the aggregate back to itself
    p = plan_str(QUERIES["q2_min_cost_supplier"](spark, SF))
    assert "Window" in p, p
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_decontaminate_broadcasts_benchmark_grams(spark):
    # the training corpus must never shuffle: the benchmark n-gram set is
    # the broadcast side of a map-side hash join
    p = plan_str(QUERIES["text_decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_bucketed_join_no_exchange(spark):
    # with broadcast off (the 100 TB regime — neither fact side fits),
    # the bucketed tables must sort-merge-join with NO exchange on either
    # side: the bucket layout satisfies the join's distribution
    # requirement, so the only exchanges left are the post-join agg hash
    # and the final orderBy range. (A cheap per-partition Sort above each
    # scan remains: Spark only propagates sortBy file ordering with one
    # file per bucket, which a parallel writer doesn't guarantee — the
    # property that matters at scale is the missing shuffle, not the
    # in-memory partition sort.)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["join_bucketed_colocated"](spark, SF)
        p = plan_str(df)
        assert "SortMergeJoin" in p, p
        assert p.count("Exchange (") == 2, p  # agg hash + final range
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_approx_distinct_hll_partial_agg(spark):
    # the HLL sketch must partial-aggregate map-side (sketch visible in
    # partial AND final agg) around one data exchange; exact
    # count(DISTINCT) instead plans a two-phase expand/re-shuffle
    p = plan_str(QUERIES["agg_distinct_approx_hll"](spark, SF))
    assert p.lower().count("approx_count_distinct") >= 2, p
    assert p.count("Exchange (") == 2, p  # agg hash + final orderBy range
    assert "Expand" not in p, p


def test_funnel_single_user_shuffle(spark):
    # one data-sized shuffle (user_id agg); the stage-ordering flags and
    # the global rollup ride the tiny per-user result
    p = plan_str(QUERIES["events_funnel_conversion"](spark, SF))
    assert p.count("Exchange (") <= 2, p
    assert "Join" not in p, p  # no self-joins


def test_partitioned_scan_prunes_partitions(spark):
    # the literal date filter must become a PartitionFilter on the
    # hive-partitioned layout (directory pruning — I/O proportional to one
    # day), NOT a post-scan Filter over every file
    p = plan_str(QUERIES["events_partition_pruned_scan"](spark, SF))
    part = [ln for ln in p.splitlines() if "PartitionFilters" in ln]
    assert part, p
    assert "event_date" in part[0], part
    # the equality literal is applied at partition-listing time
    assert re.search(r"PartitionFilters: \[[^\]]*=[^\]]*\]", part[0]), part


def test_all_batch_query_plans_free_of_scale_killers(spark):
    """Sweeping invariant over the WHOLE registry (not just the queries
    with dedicated plan tests): no batch query may plan a cartesian
    product or a row-at-a-time Python eval node. BroadcastNestedLoopJoin
    is allowed only because every use in this repo broadcasts a 1-row /
    K-row side (scalar totals, query vectors, centroid lists) — the
    dedicated tests pin those cases individually. Streaming queries are
    excluded: calling them RUNS a stream; their sink-side plans are
    covered by their own tests."""
    failures = []
    for name, fn in QUERIES.items():
        if name.startswith("streaming_"):
            continue
        try:
            p = plan_str(fn(spark, SF))
        except Exception as exc:  # pragma: no cover - surface loudly
            failures.append((name, f"explain failed: {exc}"))
            continue
        if "CartesianProduct" in p:
            failures.append((name, "CartesianProduct"))
        if "BatchEvalPython" in p:
            failures.append((name, "BatchEvalPython (row-at-a-time UDF)"))
    assert not failures, failures


def test_mad_outliers_broadcasts_group_sized_sides(spark):
    """Both medians-joins collapse to group cardinality and broadcast;
    no sort-merge join on the fact table."""
    p = plan_str(QUERIES["events_mad_outliers"](spark, SF))
    assert p.count("BroadcastHashJoin") >= 2, p
    assert "SortMergeJoin" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_upsert_single_shuffle_no_join(spark):
    """merge.upsert = union + per-key window: one hash-partitioning
    exchange, a Window, and NO join node at all."""
    import datetime as dt

    from mqtt_streamr_spark.operators.merge import upsert

    d = dt.date
    snap = spark.createDataFrame([(1, "a", d(2020, 1, 1))],
                                 "k long, v string, ts date")
    chg = spark.createDataFrame([(1, "b", d(2021, 1, 1))],
                                "k long, v string, ts date")
    p = plan_str(upsert(snap, chg, ["k"], "ts"))
    assert "Window" in p, p
    assert "Join" not in p, p
    assert p.count("Exchange (") <= 1, p


def test_reduce_dims_map_only_jvm_side(spark):
    """Random projection is map-only codegen: no exchange, no Python."""
    from mqtt_streamr_spark.operators import similarity as S
    from mqtt_streamr_spark.tables import load

    red = S.reduce_dims(load(spark, "embeddings", SF))
    p = plan_str(red)
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_fuzzy_join_no_cartesian(spark):
    """SymSpell blocking must produce an equi-join on the variant —
    never a nested-loop/cartesian over the name sets."""
    p = plan_str(QUERIES["join_fuzzy_name_match"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_vocab_encode_broadcasts_vocab(spark):
    """The corpus-derived vocabulary joins map-side (broadcast): the
    corpus-sized explode must not shuffle for the join itself."""
    p = plan_str(QUERIES["text_vocab_encode"](spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_zorder_key_no_shuffle_no_python(spark):
    """The z-key is a map-only codegen fold."""
    from mqtt_streamr_spark.operators.layout import zorder_bucket, zorder_key
    from mqtt_streamr_spark.tables import load

    li = load(spark, "lineitem", SF).select(
        zorder_bucket("l_orderkey", 256).alias("bx"),
        zorder_bucket("l_partkey", 256).alias("by_"),
    ).select(zorder_key(["bx", "by_"], bits=8).alias("z"))
    p = plan_str(li)
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_transition_matrix_single_data_shuffle(spark):
    """lead() sequencing shuffles once on user; the transition agg and
    normalizing window run over type-pair cardinality."""
    p = plan_str(QUERIES["events_transition_matrix"](spark, SF))
    # exchanges: user window + (from,to) agg + tiny normalize window —
    # the DATA-sized one is the first; allow the metadata-sized rest
    assert p.count("Exchange (") <= 3, p
    assert "BatchEvalPython" not in p, p


def test_scd2_merge_joins_open_slice_only(spark):
    """scd2's join must not be a nested loop and history must not add a
    join — one join node total."""
    p = plan_str(QUERIES["scd2_dimension_merge"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in p, p
    joins = [
        ln for ln in p.splitlines()
        if re.match(r"^\(\d+\) \w*(SortMergeJoin|BroadcastHashJoin|"
                    r"ShuffledHashJoin)", ln.strip())
    ]
    assert len(joins) == 1, (joins, p)


def test_histogram_partial_aggregates(spark):
    """Equi-width binning is map-side; exactly one exchange with
    partial+final hash aggregates around it."""
    p = plan_str(QUERIES["events_value_histogram"](spark, SF))
    assert p.count("HashAggregate (") >= 2, p
    assert p.count("Exchange (") == 1, p


def test_equidepth_broadcasts_boundaries(spark):
    """The quantile-boundary table is group-cardinality and must
    broadcast back onto the fact scan."""
    p = plan_str(QUERIES["events_equidepth_buckets"](spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_upsert_query_no_eval_python(spark):
    """The merge family is pure Column work: no Python eval nodes."""
    for name in ("merge_upsert_latest", "scd2_dimension_merge",
                 "snapshot_diff_changes"):
        p = plan_str(QUERIES[name](spark, SF))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, (
            name, p)


def test_interval_overlap_join_no_nested_loop(spark):
    """The binned interval-overlap join must plan as a shuffled EQUI-join
    on the bucket — never BroadcastNestedLoop/cartesian, which is what
    the naive overlap theta predicate plans."""
    p = plan_str(QUERIES["join_interval_overlap_sessions"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert "Join" in p, p
    assert "Python" not in p, p


def test_heavy_hitters_plan_shape(spark):
    """frequent_terms: the MG candidate pass must run as Arrow-batched
    MapInPandas (not row-at-a-time Python), candidates must come back as
    a broadcast join, and the only nested-loop node allowed is the 1-row
    corpus-total crossJoin (the accepted broadcast-scalar pattern)."""
    df = QUERIES["text_heavy_hitters"](spark, SF)
    p = plan_str(df)
    assert "MapInPandas" in p, p
    assert "BroadcastHashJoin" in p, p
    # simple mode lists each node once — count nested-loop nodes there
    assert plan_str(df, "simple").count("BroadcastNestedLoopJoin") <= 1, p
    assert "BatchEvalPython" not in p, p


def test_robust_mean_baseline_broadcasts(spark):
    """Trimmed/winsorized mean: the per-type percentile-bound table must
    come back as a BROADCAST join (group-cardinality sized), never a
    shuffled or nested-loop join."""
    p = plan_str(QUERIES["agg_trimmed_mean_value"](spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "Python" not in p, p


def test_seasonal_anomaly_baseline_broadcasts(spark):
    """Seasonal anomaly: the 168-cell weekday-hour baseline must join
    back by broadcast; the hourly rollup is the only data shuffle."""
    p = plan_str(QUERIES["events_seasonal_anomaly"](spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "Python" not in p, p


# Queries whose plan legitimately contains a BroadcastNestedLoopJoin: every
# one is the scalar-broadcast pattern (a crossJoin of a 1-row / K-row
# broadcast aggregate — corpus stats, query vector, avg-balance subquery),
# audited individually. Anything NEW showing a nested-loop join must either
# be added here with that justification or replanned.
SCALAR_CROSS_OK = {
    "q11_important_parts", "q22_global_sales_opportunity",
    "join_salted_skew",
    "events_gapfill_islands", "events_rolling_7d_active_users",
    "events_benford_first_digit", "events_freshness_panel",
    "events_rfm_scores", "events_decayed_user_value",
    "events_type_cooccurrence_lift",
    "mix_temperature_sampled", "drift_psi_price",
    "text_bm25_topdocs", "text_unigram_logprob", "text_bpe_apply_merge",
    "text_heavy_hitters",
    "sim_topk_cosine", "sim_ann_ivf", "sim_ann_ivf_multiprobe",
    "sim_ann_ivf_kmeans", "sim_quantized_topk", "sim_ivf_recall",
    "sim_ivf_recall_multiprobe", "sim_lsh_recall_curve",
    "sim_lsh_multiprobe_recall",
    # r11: the multi-query curves broadcast the SAMPLED QUERY SET
    # (4 rows, bounded by len(query_ids)) against the corpus scan —
    # the multi-row analog of the 1-row query-vector cross joins above
    "sim_planes_for_recall", "sim_nprobe_for_recall",
    "sim_random_projection_topk",
    "sim_centroid_drift",
    # r12: the materialized-index probe now broadcasts the 1-row query
    # VECTOR frame instead of collect()ing it (VERDICT r11 #9)
    "sim_ann_ivf_indexed",
    # pagerank: N and dangling-mass scalars ride as 1-row broadcast
    # cross joins inside each iteration (operators/graph.py docstring)
    "graph_pagerank_event_types",
}


def test_payload_from_json_single_parse_minimal_schema(spark):
    """The shared streaming-payload parser (with_payload) must produce
    exactly ONE from_json per row (not one get_json_object re-parse per
    field) and its declared schema must contain only the requested
    fields — otherwise every streaming query would pay a 6-field parse
    per row at 100 TB."""
    from mqtt_streamr_spark.queries.streaming_queries import with_payload
    from mqtt_streamr_spark.streaming.pipeline import replay_source

    src = replay_source(spark, f"{SF}/events.parquet", streaming=False)
    two = with_payload(src, "user_id", "value")
    opt = (
        plan_str(two, "extended")
        .split("== Optimized Logical Plan ==")[1]
        .split("== Physical Plan ==")[0]
    )
    assert opt.count("from_json") == 1, opt
    assert "get_json_object" not in opt, opt
    m = re.search(r"from_json\((?:StructField\([^)]*\),?\s*)+", opt)
    assert m, opt
    assert "user_id" in m.group(0) and "value" in m.group(0), m.group(0)
    for dropped in ("event_id", "event_type", "props"):
        assert dropped not in m.group(0), m.group(0)


def test_variant_scan_pruned_to_accessed_paths(spark):
    """The shredded-variant query must scan a PRUNED struct (only the
    accessed $.k path, typed), not the full variant binary, and the
    k > 50 comparison must push down to the parquet reader — the scan
    economics that make schemaless 100 TB pipelines viable."""
    p = plan_str(QUERIES["events_variant_pruned_scan"](spark, SF))
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert read, p
    # pruned: variant replaced by struct<...> of requested fields
    assert "variant" not in read[0], read
    assert "v:struct<" in read[0].replace(" ", ""), read
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert pushed and "GreaterThan" in pushed[0], pushed


def test_registry_wide_no_cartesian_no_rowwise_python(spark):
    """GLOBAL plan guard over every batch query in the registry: no
    CartesianProduct, no row-at-a-time Python (BatchEvalPython), and any
    BroadcastNestedLoopJoin must be an audited scalar-broadcast cross
    join from SCALAR_CROSS_OK. Streaming queries are skipped (their
    functions execute a streaming drain eagerly; their plans are pinned
    by the streaming tests instead)."""
    from tests.conftest import SF_SMOKE

    bad = []
    for name, fn in QUERIES.items():
        if name.startswith("streaming_"):
            continue
        p = plan_str(fn(spark, SF_SMOKE), "simple")
        if "CartesianProduct" in p:
            bad.append((name, "CartesianProduct"))
        if "BatchEvalPython" in p:
            bad.append((name, "BatchEvalPython"))
        if "BroadcastNestedLoopJoin" in p and name not in SCALAR_CROSS_OK:
            bad.append((name, "unaudited BroadcastNestedLoopJoin"))
    assert not bad, bad


def test_runtime_bloom_filter_prunes_smj_probe_side(spark):
    """100 TB shape: when a selective filter sits on one side of a
    shuffle (sort-merge) fact-fact join, Catalyst injects a runtime
    BLOOM FILTER built from the filtered side and applies it on the
    probe side's scan — rows that cannot join are dropped BEFORE the
    shuffle. The session leaves the feature at its default (enabled);
    this test lowers the size thresholds (sf0.001 parquet is below the
    production 10 MB creation threshold) only to make the injection
    observable, then asserts the semanticized plan contains the
    bloom_filter_agg build and the might_contain probe."""
    from mqtt_streamr_spark.tables import load

    assert spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime."
            "bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "10GB")
        spark.conf.set(
            "spark.sql.optimizer.runtime."
            "bloomFilter.applicationSideScanSizeThreshold", "0")
        # disable broadcast so the join is the SMJ shape the filter serves
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load(spark, "lineitem", SF)
        orders = load(spark, "orders", SF).filter(
            F.col("o_orderpriority") == "1-URGENT")
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority").count()
        )
        p = plan_str(j, "extended")
        assert "bloom_filter_agg" in p, p[:4000]
        assert "might_contain" in p, p[:4000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_cdc_chunking_map_only_no_python(spark):
    """The CDC fingerprint queries' claim: chunking is map-side Column
    algebra — no Python evaluation anywhere, and no exchange between the
    scan and the chunk explode (shuffles appear only at the declared
    aggregations)."""
    for name in ("text_minhash_content_defined", "text_cdc_clamped_chunks"):
        p = plan_str(QUERIES[name](spark, SF))
        assert "EvalPython" not in p and "PythonUDF" not in p, (name, p)
        # the Generate (explode) must sit on the scan side of every
        # exchange: everything before the first Exchange in the tree
        # section is the map phase
        tree = p.split("== Physical Plan ==")[-1]
        first_exchange = tree.find("Exchange")
        gen = tree.find("Generate")
        assert gen != -1 and first_exchange != -1, (name, p)


def test_watermark_lateness_single_shuffle_no_global_sort(spark):
    """events_watermark_lateness_audit: ONE hash exchange for the
    user-partitioned running-max window plus the final aggregate's
    exchange — and no global Sort (ordering is per-user within
    partitions)."""
    p = plan_str(QUERIES["events_watermark_lateness_audit"](spark, SF))
    assert "EvalPython" not in p, p
    # window partition shuffle + aggregate shuffle, nothing else
    assert p.count("Exchange (") <= 2, p
    # the only Sort is the window's intra-partition sort (local), never
    # a global one
    tree = p.split("== Physical Plan ==")[-1]
    for ln in tree.splitlines():
        if re.search(r"\bSort \(", ln):
            assert "Exchange rangepartitioning" not in p, p


def test_strict_audit_map_only_before_agg(spark):
    """streaming_replay_strict_audit: classification is pure map work —
    exactly the final aggregate's exchange, no Python, no join."""
    p = plan_str(QUERIES["streaming_replay_strict_audit"](spark, SF))
    assert "EvalPython" not in p, p
    assert p.count("Exchange (") == 1, p
    assert "Join" not in p, p
