"""Driver-attestation ledger + registry rotation (round-6 structural fix).

The driver's correctness gate attests only the FIRST 50 ``queries()``
entries each round (the "window").  Through round 5 the window was
hand-ordered — changed queries were manually moved to the head — which
guaranteed changed entries a driver row but put no structural bound on
how long an UNCHANGED query could go without one (by round 5 some
singletons had not had a driver row since round 2, a gap VERDICT r5
flagged).

This module makes the rotation a checked-in invariant:

* ``LAST_DRIVER_ROUND`` records, per query, the most recent round whose
  ``CORRECTNESS_r{N}.json`` contains a green row for it (hash_match, or
  rows_match with no error for the non-SQL-expressible ops).  It is
  regenerated from the committed CORRECTNESS artifacts each round
  (``tools/attest_map.py``).
* ``NEW_OR_CHANGED`` names the queries whose source or oracle changed
  this round (or that are brand new) — they are forced to the head of
  the window so the driver attests exactly what is shipping.
* ``rotation_order`` sorts the registry by
  ``(changed-this-round DESC, last-driver-round ASC, name)``.

With N queries and a 50-slot window, every query is re-attested at
least every ceil(N/50) rounds; ``tests/test_entry_contract.py``
enforces the resulting bound (no past-window entry older than
CURRENT_ROUND - 2) so staleness can never silently regrow.
"""

from __future__ import annotations

# Round currently being built (the driver will write CORRECTNESS_r{CURRENT_ROUND}).
CURRENT_ROUND = 10

# Queries that are new this round or whose source/oracle changed this
# round; forced to the head of the attestation window.
NEW_OR_CHANGED: frozenset[str] = frozenset({
    # round-10 changes (populated as queries are added/edited this round)
    "sk_lake_rollup",  # NEW: per-day KMV sketch tables persisted exactly-once in the lake, merged from the lake alone (VERDICT r9 #6)
    "dd_lsh_eval",  # plan change: pair_set_eval hit join hinted shuffle_hash (never broadcast a pair-grain side)
    "ann_pq_topk",  # pq_adc_topk candidates path now distinct()s pairs (ADVICE r9)
    "ann_ivfpq_topk",  # same pq_adc_topk change on its candidate-bounded tail
})

# query name -> last round with a green driver row (regenerate with
# tools/attest_map.py after each round's CORRECTNESS artifact lands).
LAST_DRIVER_ROUND: dict[str, int] = {
    "a1_group_topk": 8,
    "a234_dashboard_aggs": 8,
    "a5_st2_backoff_table": 8,
    "a6_max_booland": 8,
    "a7_count_over_all": 8,
    "a8_purge_returning_count": 8,
    "a9_profile": 8,
    "a9_quantiles": 9,
    "ann_centroid_assign": 9,
    "ann_ivfpq_topk": 9,
    "ann_near_dups_exact": 8,
    "ann_pq_topk": 8,
    "ann_recall": 9,
    "ann_topk": 8,
    "asof_join": 9,
    "cohort": 9,
    "contamination": 9,
    "corpus_datasheet": 8,
    "corpus_ingest": 9,
    "corpus_warc_ingest": 9,
    "cube_rollup": 8,
    "curriculum": 9,
    "dd_dup_clusters": 9,
    "dd_exact_prefix_groups": 8,
    "dd_jaccard_prefix": 9,
    "dd_lsh_capped": 9,
    "dd_lsh_eval": 9,
    "dd_lsh_incremental": 9,
    "dd_lsh_pairs": 9,
    "dd_minhash_signature": 8,
    "dd_ngram_jaccard": 9,
    "dd_paragraph_dedup": 9,
    "dd_simhash": 8,
    "dd_span_coverage": 9,
    "dd_star_clusters": 8,
    "dense_ids": 9,
    "dist_match_sample": 8,
    "domain_mix": 9,
    "domain_split": 7,
    "dq_expectations": 7,
    "dsir_select": 7,
    "dsir_weights": 7,
    "embed_standardize": 7,
    "event_transitions": 7,
    "f3_smart_cast": 8,
    "f4_date_parse_multi": 8,
    "f_scalar_surface": 8,
    "flagship_pricing_summary": 7,
    "funnel": 7,
    "fuzzy_linkage": 7,
    "gopher_quality": 7,
    "html_extract": 7,
    "interval_join": 7,
    "j1_current_state_join": 8,
    "j2_history_join": 8,
    "j3_u7_batch_select_claim": 8,
    "j4_orphan_left_join": 9,
    "j5_latest_per_key": 9,
    "j6_status_dashboard": 9,
    "k10_time_travel": 7,
    "k8_drop_table": 9,
    "k9_webhook_payload": 7,
    "k_lake_roundtrip": 9,
    "mix_shards": 7,
    "mixture_plan": 8,
    "mm_embed_vq": 8,
    "mm_exif_meta": 7,
    "mm_frame_sample": 9,
    "mm_jpeg_meta": 9,
    "mm_media_meta": 8,
    "nb_source_classifier": 8,
    "o1_top2_per_key": 9,
    "o3_deterministic_sample": 9,
    "o4_csv_sample": 9,
    "o5_ordered_scan": 9,
    "p10_retention_survivors": 9,
    "p1_point_lookup": 9,
    "p3_exclusion_filter": 9,
    "p4_date_cast_filter": 9,
    "p5_json_extract": 9,
    "p6_range_predicate": 9,
    "p78_predicate_surface": 7,
    "p9_time_window": 9,
    "pack_stream": 8,
    "pack_waste": 8,
    "pii_redact": 8,
    "pivot_activity": 8,
    "reduced_antijoin": 7,
    "s1_live_fetch": 7,
    "s4_excel_load": 9,
    "s5_catalog_load": 9,
    "s6_csv_ingest_inference": 9,
    "s7_mime_sniff": 7,
    "s9_f10_http_surface": 7,
    "scd2_merge": 8,
    "semantic_dedup": 8,
    "sessionize": 8,
    "sk_bloom_probe": 9,
    "sk_countmin_hh": 8,
    "sk_kmv_ndv": 9,
    "skew_salted_count": 7,
    "sla_streaks": 8,
    "st1_microbatch_rates": 7,
    "st3_next_check_ladder": 9,
    "st45_change_trigger": 7,
    "temporal_split": 9,
    "tfidf_vocab": 8,
    "tok_bpe_encode": 9,
    "tx_bigram_surprisal": 8,
    "tx_blocklist": 8,
    "tx_chunks": 8,
    "tx_clean": 8,
    "tx_curate_pipeline": 7,
    "tx_fingerprint": 7,
    "tx_hashed_features": 8,
    "tx_lang_id": 8,
    "tx_novelty": 8,
    "tx_surprisal": 8,
    "tx_text_metrics": 7,
    "tx_vocab_coverage": 8,
    "u1_union_tiers": 9,
    "u2_upsert_merge": 9,
    "u3_snapshot_diff": 9,
    "u456_point_dml": 7,
    "url_canonical": 8,
    "url_quality": 8,
    "variant_props": 8,
    "weighted_group_sample": 7,
    "window_surface": 7,
}


def rotation_order(names) -> list[str]:
    """Stable registry order: new/changed first, then least-recently
    driver-attested, ties by name.  Never-attested queries that are not
    flagged NEW_OR_CHANGED sort as round 0 (i.e. most urgent) — a query
    cannot dodge the window by missing from the ledger."""
    return sorted(
        names,
        key=lambda n: (
            0 if n in NEW_OR_CHANGED else 1,
            LAST_DRIVER_ROUND.get(n, 0),
            n,
        ),
    )
