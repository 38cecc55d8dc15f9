"""Import all query modules so their ``@query`` registrations populate the
registry, then rebuild the registry in an EXPLICIT priority order.

The external driver oracle-checks only the first 50 registry entries, so
ordering is load-bearing: every SURVEY.md §2 inventory row's unique covering
query must sit inside that window. ``MUST_VERIFY`` below IS the window — an
ordered list of exactly the queries the driver should check; everything else
(redundant-coverage extras like additional TPC-H variants, plus the
rows-only streaming queries) registers after it and is covered by the
pytest-side oracle gate instead (tests/test_correctness.py checks ALL of
them, driver window or not).
"""

from mqtt_streamr_spark.queries import (  # noqa: F401
    events,
    jsonata_queries,
    llm_pipeline,
    relational,
    streaming_queries,
)
from mqtt_streamr_spark.queries.registry import ORACLES, QUERIES

# The driver's check window (first 50 entries), ordered.
#
# Rotation history: r6 drove 22 never-checked queries + the 28 SURVEY §2
# covering rows; r7 drove 47 more of the backlog. The union of
# CORRECTNESS_r1-r7 green rows covers 157/193 registry queries; the 36
# still never-driver-checked get EVERY remaining slot this round, which
# completes the provenance sweep: after r8, every registry query will
# have at least one driver-green CORRECTNESS row.
MUST_VERIFY: list[str] = [
    # ROUND-11 ROTATION — freshness policy (VERDICT r10 Next-round #3).
    # This round:
    #  (a) r11-NEW queries (driven the round they ship);
    #  (b) queries whose RESULTS could change this round: every ANN
    #      top-k now orders by the UNROUNDED dot product (ADVICE r10 —
    #      k-boundary tie-breaks now match the full-precision oracle
    #      order), so the whole sim_* top-k/recall family re-verifies;
    #  (c) the 16 r6-stale rows (the generated queue's head, consumed
    #      in full — after r11 nothing is staler than r7);
    #  (d) the 20 alphabetically-first r7 rows (the remaining 27 r7
    #      rows head the r12 queue).
    # Every query rotated OUT was driver-green in r7-r10 and stays
    # hash-checked by tests/test_correctness.py.
    #
    # (a) r11-NEW:
    "text_excise_boilerplate",      # CDC boilerplate EXCISION survivors
    "sim_planes_for_recall",        # measured curve drives the LSH knob
    "sim_nprobe_for_recall",        # the IVF mirror of the above
    "sim_semantic_dedup_capped",    # adaptive-depth LSH blocks
    "join_interval_overlap_counts",  # pair-free overlap counting
    "jsonata_transform_computed_typed",  # computed |items[$i]| locations
    # (b) ANN ordering changed (unrounded tie-break, ADVICE r10):
    "sim_topk_cosine",
    "sim_random_projection_topk",   # also r7-stale
    "sim_ann_lsh_bucket",
    "sim_ann_ivf",
    "sim_ann_ivf_indexed",
    "sim_ann_ivf_kmeans",
    "sim_ann_ivf_multiprobe",
    "sim_ivf_recall",
    "sim_ivf_recall_multiprobe",
    "sim_lsh_recall_curve",
    "sim_lsh_multiprobe_recall",
    # (c) all sixteen r6 rows:
    "grouped_quality_zscores",
    "multimodal_features",
    "split_assignments",
    "mix_rebalanced_sources",
    "text_heavy_hitters",
    "llm_budget_selection",
    "q1_pricing_summary",
    "window_top2_orders_per_customer",
    "agg_cube_status_priority",
    "set_ops_customer_segments",
    "scan_filter_project",
    "q8_market_share",
    "q9_product_type_profit",
    "q21_suppliers_kept_waiting",
    "join_bucketed_colocated",
    "join_salted_skew",
    # (d) the 20 alphabetically-first r7 rows:
    "agg_distinct_approx_hll",
    "agg_revenue_concentration",
    "agg_trimmed_mean_value",
    "agg_weighted_median_price",
    "dedup_cluster_exact_join",
    "dedup_containment_pairs",
    "dedup_exact_jaccard_prefix",
    "dedup_incremental_ingest",
    "dedup_keep_best_quality",
    "dedup_threshold_sweep",
    "dq_expectations",
    "drift_psi_price",
    "events_sliding_windows",
    "join_fuzzy_name_match",
    "layout_zorder_clustering",
    "merge_upsert_latest",
    "mix_temperature_sampled",
    # (multimodal_frame_sample and multimodal_resize, r7, displaced by
    # sim_semantic_dedup_capped and join_interval_overlap_counts — they
    # join profile_join_key_skew at the head of the r12 queue)
    # (profile_join_key_skew displaced by sim_nprobe_for_recall — it
    # heads the r12 freshness queue)
]

DRIVER_WINDOW = 50

_rest = [n for n in QUERIES if n not in MUST_VERIFY]
# rows-only (no-oracle) queries always last: they can never use a window slot
_rest.sort(key=lambda n: n not in ORACLES)
_order = [n for n in MUST_VERIFY if n in QUERIES] + _rest

_reordered = {n: QUERIES[n] for n in _order}
QUERIES.clear()
QUERIES.update(_reordered)
_reordered_oracles = {n: ORACLES[n] for n in _order if n in ORACLES}
ORACLES.clear()
ORACLES.update(_reordered_oracles)

__all__ = ["QUERIES", "ORACLES", "MUST_VERIFY", "DRIVER_WINDOW"]
