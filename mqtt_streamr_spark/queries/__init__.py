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
    # ROUND-9 ROTATION — freshness policy (verdict r8, Next-round #4):
    # with the provenance sweep closed (union of r1-r8 green rows =
    # 199/200), the window now rotates by LAST-GREEN AGE. This round:
    #  (a) the single never-driver-checked query (shipped post-rotation
    #      in r8) — closes provenance to 200/200;
    #  (b) r9-NEW queries (driven the round they ship);
    #  (c) queries whose plans changed this round (strict-parse
    #      pre-filter → the replay pipeline re-earns its row; typed
    #      nested-path transforms → the transform demos re-earn theirs);
    #  (d) the stalest greens: every r1/r3/r4 row, then the oldest r5
    #      rows, so no query's last driver-green round is >4 behind.
    # Every query rotated OUT was driver-green in r6-r8 and stays
    # hash-checked by tests/test_correctness.py.
    #
    # (a) last provenance gap:
    "jsonata_transform_operator_typed",
    # (b) r9-NEW:
    "jsonata_transform_nested_typed",   # |a.b|…| compiled struct rebuild
    "streaming_replay_strict_audit",    # strict-parse pre-filter A/B row
    "text_minhash_content_defined",     # content-defined chunk fingerprints
    "events_watermark_lateness_audit",  # per-window lateness accounting
    # (c) plans changed this round:
    "streaming_replay_pipeline",        # strict-parse pre-filter (perf fix)
    "jsonata_transform_operator",       # transform-apply TypedCol now carries
    "jsonata_transform_compiled",       #   its StructType (ADVICE r8)
    # (d) stalest greens — all eleven r1 rows:
    "events_json_extract_stats",
    "events_template_first_occurrence",
    "events_hierarchical_rollup",
    "window_lag_lead_events",
    "sim_near_dups_lsh_blocked",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q18_large_orders",
    "q4_late_orders_priority",
    # (d) both r3 rows:
    "agg_distinct_counts",
    "agg_grouping_sets",
    # (d) all twenty r4 rows:
    "events_daily_windows",
    "events_topic_routing",
    "events_session_windows",
    "jsonata_filter_compiled",
    "jsonata_transform_typed",
    "jsonata_string_functions",
    "text_token_stats",
    "text_quality_scores",
    "text_fingerprints",
    "dedup_lsh_bucket_stats",
    "sim_embedding_near_dups",
    "sim_ann_ivf",
    "dedup_pipeline_survivors",
    "q3_shipping_priority",
    "join_anti_customers_without_orders",
    "join_left_outer_order_counts",
    "window_running_customer_spend",
    "topk_expensive_parts",
    "agg_rollup_region_nation",
    "agg_value_percentiles_approx",
    # (d) oldest r5 rows, filling the remaining slots:
    "events_wildcard_filter",
    "agg_value_percentiles",
    "jsonata_hof_compiled",
    "dedup_ngram_jaccard",
    "dedup_simhash_groups",
    "grouped_geomean_values",
    "join_semi_customers_with_big_orders",
    "jsonata_descendants_typed",
    "jsonata_groupby_typed",
    # r10 freshness-queue head (see COVERAGE.md's generated queue):
    # text_cdc_clamped_chunks (shipped late-r9, never windowed), then
    # events_sessionized_stats / events_jsonl_roundtrip (stalest r5).
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
