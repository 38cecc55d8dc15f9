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
    # ROUND-10 ROTATION — freshness policy (verdict r8 #4, consumed per
    # verdict r9 Next-round #1): the window rotates by LAST-GREEN AGE.
    # This round:
    #  (a) the single never-driver-checked query (shipped late-r9 after
    #      the window closed) — closes provenance to all-green;
    #  (b) r10-NEW queries (driven the round they ship);
    #  (c) queries whose plans changed this round (the chained
    #      transform demo now rides the _let-bound linear chain);
    #  (d) the stalest greens: every r5 row, then 27 of the 43 r6 rows,
    #      so after r10 no query's last driver-green round is older
    #      than r6 (the 16 r6 rows left over head the r11 queue).
    # Every query rotated OUT was driver-green in r6-r9 and stays
    # hash-checked by tests/test_correctness.py.
    #
    # (a) last provenance gap:
    "text_cdc_clamped_chunks",
    # (b) r10-NEW:
    "jsonata_transform_predicate_typed",  # |items[p>10]|…| compiled, chained
    "dedup_cdc_chunk_overlap",            # CDC sub-document near-dup removal
    "dedup_cdc_boilerplate_spans",        # WHERE the repeated bytes sit
    "dedup_cdc_incremental_ingest",       # batch vs corpus chunk index
    "sim_ivf_recall_multiprobe",          # recall/cost curve, nprobe 1/2/4
    "sim_lsh_recall_curve",               # the hyperplane analog, 1/2/4 planes
    "sim_lsh_multiprobe_recall",          # hamming-adjacent probes at 8 planes
    # (c) plan changed this round (chained transforms are _let-bound):
    "jsonata_transform_nested_typed",
    # (d) all fourteen r5 rows:
    "events_jsonl_roundtrip",
    "events_sessionized_stats",
    "sim_ann_ivf_indexed",
    "text_bm25_topdocs",
    "sim_ann_ivf_kmeans",
    "text_pii_scrub",
    "text_chunking",
    "sim_quantized_topk",
    "q19_disjunctive_filter",
    "q7_volume_shipping",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q22_global_sales_opportunity",
    # (d) 27 of the 43 r6 rows (ANN/recall family first — they pair
    # with the new curve row — then streaming/jsonata/text/dedup/tpch):
    "sim_ivf_recall",
    "sim_ann_ivf_multiprobe",
    "sim_topk_cosine",
    "sim_ann_lsh_bucket",
    "sim_semantic_dedup",
    "events_variant_parse_drop",
    "events_variant_pruned_scan",
    "events_success_error_daily",
    "events_csv_roundtrip",
    "events_ewma_per_user",
    "join_asof_purchase_view",
    "join_range_view_attribution",
    "join_interval_overlap_sessions",
    "jsonata_interpreted_fallback",
    "jsonata_descendants_variant",
    "jsonata_object_ops_compiled",
    "text_lang_id",
    "text_winnowing_fingerprints",
    "text_gopher_flags",
    "text_token_entropy",
    "text_ngram_repetition",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_duplicate_clusters",
    "sample_stratified_exact",
    "llm_prep_corpus_end_to_end",
    "llm_pack_sequences",
    # r11 freshness-queue head (see COVERAGE.md's generated queue): the
    # 16 r6 rows left over — multimodal_features,
    # grouped_quality_zscores,
    # split_assignments and mix_rebalanced_sources (displaced by the
    # late-r10 CDC/recall queries),
    # text_heavy_hitters, llm_budget_selection,
    # q1_pricing_summary, window_top2_orders_per_customer,
    # agg_cube_status_priority, set_ops_customer_segments,
    # scan_filter_project, q8_market_share, q9_product_type_profit,
    # q21_suppliers_kept_waiting, join_bucketed_colocated,
    # join_salted_skew.
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
