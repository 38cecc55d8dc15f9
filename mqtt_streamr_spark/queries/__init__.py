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

# The driver's check window (first 50 entries), ordered. One covering query
# per SURVEY §2 row comes first; each exiled query's row is still covered by
# an in-window sibling (e.g. q7/q13/q15 joins by q3/join_*; hierarchical
# rollup by agg_rollup_region_nation; LSH-blocked near-dups by
# sim_embedding_near_dups).
MUST_VERIFY: list[str] = [
    # §2.2/2.7 events: parse, routing, templates, windows
    "events_variant_parse_drop",
    "events_topic_routing",
    # (events_template_first_occurrence moved past the window in round 2:
    # template substitution is driver-covered end-to-end by
    # streaming_replay_pipeline's stream_id_template; pytest still checks)
    "events_wildcard_filter",
    "events_success_error_daily",
    "events_daily_windows",
    # (events_sliding_windows moved past the window in round 4: the §2.7
    # tumbling/sliding/session row keeps daily + session in-window;
    # pytest still hash-checks sliding)
    "events_session_windows",
    # §2.6/2.8 JSONata: three backends + function families
    "jsonata_transform_compiled",
    "jsonata_filter_compiled",
    "jsonata_transform_typed",
    "jsonata_hof_compiled",
    "jsonata_interpreted_fallback",
    "jsonata_string_functions",
    "jsonata_descendants_typed",
    "jsonata_groupby_typed",
    # §2.3 joins
    "join_asof_purchase_view",
    "join_semi_customers_with_big_orders",
    "join_anti_customers_without_orders",
    "join_left_outer_order_counts",
    # §2.5 windows / order-sensitive
    # (window_lag_lead_events and agg_cube_status_priority moved past the
    # window in round 2 to make room for the two typed-JSONata queries:
    # their §2 rows stay driver-covered by top2/running and
    # rollup/distinct/grouping_sets respectively; pytest still checks them)
    "window_top2_orders_per_customer",
    "window_running_customer_spend",
    "agg_value_percentiles",
    "agg_value_percentiles_approx",  # r4: the bounded-state scale path,
    #                                   driver-checked next to the exact one
    "topk_expensive_parts",
    "set_ops_customer_segments",
    # §2.4 grouping structures (round 4: agg_distinct_counts and
    # agg_grouping_sets moved past the window — their rows stay covered
    # in-window by q1 (cross-row agg+distinct) and agg_rollup_region_nation
    # (grouping structures); pytest still hash-checks both)
    "agg_rollup_region_nation",
    # §2.3/LLM extensions added in round 4
    "join_range_view_attribution",
    "dedup_duplicate_clusters",
    # §2.7 streaming runtime end-to-end (round 2: these gained real
    # oracles — the replay source is deterministic, so the routed output
    # is SQL-expressible; scan_filter_project and q5 moved out to make
    # room, their rows covered by plan assertions and q1/q3)
    "streaming_replay_pipeline",
    "streaming_stateful_dedup",
    "streaming_running_stats",
    # TPC-H core (multi-join + agg shapes)
    "q1_pricing_summary",
    "q3_shipping_priority",
    # LLM pipeline: text analysis
    "text_token_stats",
    "text_lang_id",
    "text_quality_scores",
    "text_fingerprints",
    "text_winnowing_fingerprints",
    # LLM pipeline: dedup family
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_lsh_bucket_stats",
    "dedup_ngram_jaccard",
    "dedup_simhash_groups",
    "dedup_pipeline_survivors",
    # LLM pipeline: similarity search
    "sim_topk_cosine",
    "sim_ann_lsh_bucket",
    "sim_ann_ivf",
    "sim_embedding_near_dups",
    # UDF surfaces
    "grouped_quality_zscores",
    "grouped_geomean_values",
    "multimodal_features",
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
