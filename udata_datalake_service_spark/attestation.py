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
CURRENT_ROUND = 9

# Queries that are new this round or whose source/oracle changed this
# round; forced to the head of the attestation window.
NEW_OR_CHANGED: frozenset[str] = frozenset({
    # round-9 changes (populated as queries are added/edited this round)
    "dd_lsh_capped",  # NEW: hot-bucket-cap audit (llm/dedup.lsh_cap_scorecard)
    "ann_ivfpq_topk",  # NEW: IVFADC composition (llm/similarity.ivf_pq_topk)
    "mm_jpeg_meta",  # decode_source normalized to decoded (env-independent parity)
    "sk_bloom_probe",  # NEW: mergeable bloom membership prefilter (operators/sketch.py)
    "tok_bpe_encode",  # NEW: columnar BPE tokenizer application (llm/bpe.py)
    "sk_kmv_ndv",  # NEW: oracle-attested KMV distinct sketch (operators/sketch.py)
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
    "a9_quantiles": 7,
    "ann_centroid_assign": 7,
    "ann_near_dups_exact": 8,
    "ann_pq_topk": 8,
    "ann_recall": 7,
    "ann_topk": 8,
    "asof_join": 7,
    "cohort": 7,
    "contamination": 7,
    "corpus_datasheet": 8,
    "corpus_ingest": 7,
    "corpus_warc_ingest": 7,
    "cube_rollup": 8,
    "curriculum": 7,
    "dd_dup_clusters": 7,
    "dd_exact_prefix_groups": 8,
    "dd_jaccard_prefix": 7,
    "dd_lsh_eval": 7,
    "dd_lsh_incremental": 7,
    "dd_lsh_pairs": 7,
    "dd_minhash_signature": 8,
    "dd_ngram_jaccard": 7,
    "dd_paragraph_dedup": 7,
    "dd_simhash": 8,
    "dd_span_coverage": 7,
    "dd_star_clusters": 8,
    "dense_ids": 7,
    "dist_match_sample": 8,
    "domain_mix": 7,
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
    "j4_orphan_left_join": 6,
    "j5_latest_per_key": 6,
    "j6_status_dashboard": 6,
    "k10_time_travel": 7,
    "k8_drop_table": 6,
    "k9_webhook_payload": 7,
    "k_lake_roundtrip": 6,
    "mix_shards": 7,
    "mixture_plan": 8,
    "mm_embed_vq": 8,
    "mm_exif_meta": 7,
    "mm_frame_sample": 6,
    "mm_jpeg_meta": 8,
    "mm_media_meta": 8,
    "nb_source_classifier": 8,
    "o1_top2_per_key": 6,
    "o3_deterministic_sample": 6,
    "o4_csv_sample": 6,
    "o5_ordered_scan": 6,
    "p10_retention_survivors": 6,
    "p1_point_lookup": 6,
    "p3_exclusion_filter": 6,
    "p4_date_cast_filter": 6,
    "p5_json_extract": 6,
    "p6_range_predicate": 6,
    "p78_predicate_surface": 7,
    "p9_time_window": 6,
    "pack_stream": 8,
    "pack_waste": 8,
    "pii_redact": 8,
    "pivot_activity": 8,
    "reduced_antijoin": 7,
    "s1_live_fetch": 7,
    "s4_excel_load": 6,
    "s5_catalog_load": 6,
    "s6_csv_ingest_inference": 6,
    "s7_mime_sniff": 7,
    "s9_f10_http_surface": 7,
    "scd2_merge": 8,
    "semantic_dedup": 8,
    "sessionize": 8,
    "sk_countmin_hh": 8,
    "skew_salted_count": 7,
    "sla_streaks": 8,
    "st1_microbatch_rates": 7,
    "st3_next_check_ladder": 6,
    "st45_change_trigger": 7,
    "temporal_split": 6,
    "tfidf_vocab": 8,
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
    "u1_union_tiers": 6,
    "u2_upsert_merge": 6,
    "u3_snapshot_diff": 6,
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
