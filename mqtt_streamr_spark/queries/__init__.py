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
# covering rows (see git history of this file for the full r6 rationale);
# the union of CORRECTNESS_r1-r6 green rows covers 108 of the registry.
# SURVEY §2 row coverage for r7 rests on that union (every row's covering
# query was driver-green in at least one earlier round) plus the full
# pytest oracle gate, so this window can spend its slots on provenance.
MUST_VERIFY: list[str] = [
    # ROUND-7 ROTATION: the r6 verdict's #1 ask is closing the driver-
    # provenance gap — 83 registry queries had never been driver-checked
    # (all green in the pytest oracle gate, which re-checks the WHOLE
    # registry every run). This window gives 47 of its 50 slots to that
    # backlog, plus the two r7-NEW plans and stale events_sliding_windows
    # (last driver record is the r3 loader-break error; green r1/r2 and
    # in the gate — rotate it in to clear the record). Every query
    # rotated OUT was driver-green in r1-r6 (the union criterion) and
    # stays hash-checked by tests/test_correctness.py. The ~36 still
    # never-driver-checked after this round (events analytics family,
    # pivot/unpivot, orc/partition-pruned scans, funnel, sketch rollups,
    # asof tolerance, vocab encode, web domain stats, top-terms,
    # weighted lengths, rank-normalized lengths, ngram/simhash dedup
    # variants) are the r8 rotation.
    #
    # r7-NEW plans (must be driven the round they ship):
    "dedup_cluster_exact_join",   # cluster-then-exact-join mitigation
    "jsonata_descendants_bare",   # compiled bare ** (was interpreter-only)
    # stale driver record:
    "events_sliding_windows",
    # TPC-H tail never driver-checked:
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q12_late_shipment_priority",
    "q16_part_supplier_variety",
    "q20_excess_shippers",
    # streaming queries never driver-checked (also first round under the
    # RocksDB state store default):
    "streaming_static_enrichment",
    "streaming_session_windows",
    "streaming_windowed_topk",
    # lakehouse/maintenance family:
    "merge_upsert_latest",
    "scd2_dimension_merge",
    "snapshot_diff_changes",
    "join_fuzzy_name_match",
    "dq_expectations",
    "layout_zorder_clustering",
    "drift_psi_price",
    # profiling family:
    "profile_lineitem_columns",
    "profile_lineitem_correlations",
    "profile_join_key_skew",
    # relational analytics never driver-checked:
    "q_fulfillment_latency",
    "q_revenue_decimal_exact",
    "agg_weighted_median_price",
    "agg_trimmed_mean_value",
    "agg_revenue_concentration",
    "agg_distinct_approx_hll",
    "window_trailing_range_avg",
    # dedup family tail:
    "dedup_incremental_ingest",
    "dedup_containment_pairs",
    "dedup_threshold_sweep",
    "dedup_keep_best_quality",
    "dedup_exact_jaccard_prefix",
    # similarity tail:
    "sim_centroid_drift",
    "sim_random_projection_topk",
    # splits/sampling/mixing tail:
    "split_leakage_report",
    "split_cluster_aware",
    "sample_stratified_rate",
    "mix_temperature_sampled",
    # text-analysis tail:
    "text_repetition_ratio",
    "text_decontaminate",
    "text_unigram_logprob",
    "text_dup_passage_fraction",
    "text_classifier_scores",
    "text_zipf_fit",
    "text_bpe_pair_stats",
    "text_bpe_apply_merge",
    "text_vocab_coverage",
    # multimodal mapInPandas legs:
    "multimodal_resize",
    "multimodal_frame_sample",
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
