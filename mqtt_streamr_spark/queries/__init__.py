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
# ROUND-6 ROTATION: 22 of the 50 slots go to queries never driver-checked
# in rounds 1–5 (marked "r6-NEW"), prioritizing every query whose PLAN
# CHANGED this round (text_ngram_repetition single-pass rewrite,
# sim_semantic_dedup LSH-default blocking, events_variant_pruned_scan,
# llm_budget_selection segmented_cumsum, join_interval_overlap_sessions
# degenerate-interval guard, text_heavy_hitters strict bound, and four of
# the from_json-rewritten streaming queries). The other 28 slots retain
# one covering query per SURVEY §2 row. Every query rotated OUT remains
# hash-checked against the same DuckDB oracle by tests/test_correctness.py
# (the whole registry — len(QUERIES), 189 as of r6), and its §2 row keeps
# an in-window cover:
#   - events_wildcard_filter → wildcard matching now runs end-to-end over
#     a LIVE socket in test_mqtt_source_live_socket_soak (r6) plus the
#     broker-side match in streaming_replay_pipeline's routing.
#   - events_sessionized_stats / events_jsonl_roundtrip → event-time
#     windows stay covered by events_success_error_daily + the streaming
#     family; the file-format row swaps to the never-checked csv leg.
#   - jsonata_descendants_typed / jsonata_groupby_typed → the typed
#     backend remains exercised by the in-window backends row
#     (jsonata_transform_compiled, jsonata_interpreted_fallback);
#     descendants now driver-checked on the VARIANT path instead
#     (jsonata_descendants_variant, the new r6 plan); group-by stays
#     gate-checked + differential-tested. jsonata_hof_compiled and
#     streaming_stateful_dedup rotate out late-r6 (both driver-checked
#     in earlier rounds; see inline notes) for the two new r6 plans.
#   - join_semi_customers_with_big_orders / q22 / q13 → semi+anti+outer
#     covered in-window by q21_suppliers_kept_waiting (EXISTS + NOT
#     EXISTS in one query) and the retained TPC-H family.
#   - q7/q15/q17/q19 → multi-way equi joins covered by q8/q9 (r6-NEW,
#     deeper join trees).
#   - agg_value_percentiles → percentile surface stays gate-checked; the
#     §2.4 grouping row keeps agg_cube_status_priority.
#   - text_bm25_topdocs / text_pii_scrub / text_chunking → text-analysis
#     row keeps text_lang_id + 4 r6-NEW text entries.
#   - dedup_ngram_jaccard / dedup_simhash_groups → near-dup row keeps
#     dedup_minhash_lsh_pairs + dedup_duplicate_clusters.
#   - sim_ann_ivf_indexed / sim_ann_ivf_kmeans / sim_quantized_topk → the
#     IVF family row is covered by sim_ann_ivf_multiprobe + sim_ivf_recall
#     (r6-NEW); the quantized variant stays gate-checked.
#   - grouped_geomean_values → GROUPED_AGG surface covered by
#     grouped_quality_zscores; applyInPandas gains events_ewma_per_user.
# Still never driver-checked after r6 (82, next rotation — all hash-checked
# by tests/test_correctness.py): agg_distinct_approx_hll,
# join_asof_nearest_tolerance, window_trailing_range_avg, pivot/unpivot,
# events_orc_roundtrip, events_partition_pruned_scan, the events analytics
# family (gapfill/rolling/cohort/MAD/histogram/transition/equidepth/
# schema-evolution/RFM/decayed/trend/gaps/paths/incremental-rollup/
# cooccurrence/burstiness/growth/concurrency/LOCF/quantile-sketch/CUSUM/
# seasonal/benford/freshness), sim_random_projection_topk,
# sample_stratified_rate, multimodal_resize/frame_sample,
# text_repetition_ratio, text_decontaminate, mix_temperature_sampled,
# text_unigram_logprob, text_dup_passage_fraction, text_classifier_scores,
# the BPE/vocab family, web_domain_stats, top-terms, incremental dedup,
# sim_centroid_drift, containment/threshold-sweep, split leakage/cluster,
# keep-best-quality, zipf, exact prefix Jaccard, q2/q11/q12/q16/q20, the
# profile family, merge/SCD2/snapshot-diff, fuzzy join, dq_expectations,
# layout_zorder_clustering, drift_psi_price, fulfillment/decimal-exact/
# weighted-median/trimmed-mean/revenue-concentration,
# streaming_static_enrichment, streaming_session_windows,
# streaming_windowed_topk.
MUST_VERIFY: list[str] = [
    # §2.2/2.7 events: parse, routing, scan economics
    "events_variant_parse_drop",
    "events_variant_pruned_scan",  # r6-NEW (shredded variant pushdown)
    "events_success_error_daily",
    "events_csv_roundtrip",  # r6-NEW (file-format row swaps to the csv leg)
    "scan_filter_project",  # r6-NEW (parquet filter/projection pushdown row)
    # §2.6/2.8 JSONata: the three backends (function families gate-checked)
    # + the r6 compiled surfaces (ordered-object ops, variant descendants).
    # jsonata_hof_compiled rotates OUT (driver-checked r4+r5, gate-checked
    # always) for the brand-new variant ** path, whose plan must be driven.
    "jsonata_transform_compiled",
    "jsonata_descendants_variant",  # r6-NEW (compiled variant-path **)
    "jsonata_interpreted_fallback",
    "jsonata_object_ops_compiled",  # r6-NEW (compiled $keys/$lookup/$sift/$merge)
    # §2.3 joins (bucketed/salted rotate in, r6-NEW; semi/outer covered by
    # q21 + the TPC-H family; asof tolerance variant stays gate-checked)
    "join_asof_purchase_view",
    "join_range_view_attribution",
    "join_bucketed_colocated",  # r6-NEW (exchange-free co-located join)
    "join_salted_skew",  # r6-NEW
    "join_interval_overlap_sessions",  # r6-NEW (degenerate-interval guard)
    # §2.5 windows / order-sensitive / set ops
    "window_top2_orders_per_customer",
    "set_ops_customer_segments",
    # §2.4 grouping structures
    "agg_cube_status_priority",
    # §2.7 streaming runtime end-to-end (r6: the from_json single-parse
    # rewrite touched every streaming query — drive the changed ones).
    # streaming_stateful_dedup rotates OUT (its bounded-state dedup row is
    # covered in-window by streaming_dedup_within_watermark) for the new
    # append-mode session-window drain, whose plan must be driven.
    "streaming_replay_pipeline",
    "streaming_session_windows_append",  # r6-NEW (watermark-sealed append)
    "streaming_running_stats",
    "streaming_dedup_within_watermark",  # r6-NEW (bounded-state dedup)
    "streaming_stream_stream_join",  # r6-NEW
    "streaming_cdc_apply",  # r6-NEW
    # TPC-H (q1 flagship + never-checked tail, r6-NEW)
    "q1_pricing_summary",
    "q8_market_share",  # r6-NEW
    "q9_product_type_profit",  # r6-NEW
    "q21_suppliers_kept_waiting",  # r6-NEW (semi+anti in one query)
    # LLM pipeline: text analysis (r6: ngram_repetition rewritten to the
    # single-pass hashed-key plan; heavy_hitters guard tightened)
    "text_lang_id",
    "text_winnowing_fingerprints",
    "text_ngram_repetition",  # r6-NEW (rewritten plan this round)
    "text_token_entropy",  # r6-NEW
    "text_gopher_flags",  # r6-NEW
    "text_heavy_hitters",  # r6-NEW (strict-bound guard this round)
    # LLM pipeline: dedup family
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_duplicate_clusters",
    # LLM pipeline: similarity search
    "sim_topk_cosine",
    "sim_ann_lsh_bucket",
    "sim_semantic_dedup",  # r6-NEW (LSH-bucket default blocking this round)
    "sim_ann_ivf_multiprobe",  # r6-NEW
    "sim_ivf_recall",  # r6-NEW
    # LLM pipeline: corpus prep
    "llm_prep_corpus_end_to_end",
    "llm_pack_sequences",
    "llm_budget_selection",  # r6-NEW (segmented_cumsum helper this round)
    "split_assignments",
    "sample_stratified_exact",
    "mix_rebalanced_sources",
    # UDF surfaces
    "grouped_quality_zscores",
    "multimodal_features",
    "events_ewma_per_user",  # r6-NEW (applyInPandas ordered recurrence)
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
