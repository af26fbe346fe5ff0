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
CURRENT_ROUND = 13

# Queries that are new this round or whose source/oracle changed this
# round; forced to the head of the attestation window.
NEW_OR_CHANGED: frozenset[str] = frozenset({
    # round-13 changes (populated as queries are added/edited this round)
    "curate_zipf",  # NEW: composed curation pipeline (gate -> exact dedup -> retrieval decontam -> mixture) on the natural-statistics zipf fixture (VERDICT r12 task 6)
    "dd_minhash_xxh",  # NEW: xxh64-family MinHash end-to-end under the identical-shingle-set invariant (the near-dup stream's r13 throughput family)
    # r13 optimization round: queries whose plan/source changed (results
    # oracle-identical; see OPTIMIZATION_r13.md for the per-query A/Bs).
    # CAPACITY NOTE: the round-12 freeze left 35 r9-attested entries that
    # MUST rotate into the 50-slot window this round, so NEW_OR_CHANGED is
    # capped at 15 (35 + 15 = 50).  The deepest restructurings get the
    # driver slot; the remaining r13-edited queries were re-attested
    # locally (tools/parity.py at sf0.01, logged in OPTIMIZATION_r13.md)
    # and re-pinned via tools/pin_hashes.py — the pin-gate path
    # test_attested_entries_pinned prescribes for edits that cannot fit
    # the window: sk_lake_rollup, corpus_warc_ingest, contamination,
    # ann_ivfpq_topk, dsir_select, tx_fingerprint, curriculum,
    # corpus_datasheet (+ the reverted-with-comments rt_bm25_topk /
    # rt_hard_negatives).
    "corpus_ingest",  # one fingerprint pass serves both audit counts; rebalance-hinted batch files
    "st1_microbatch_rates",  # lake-plane batch-file right-sizing
    "rt_lake_bm25",  # lake-plane batch-file right-sizing
    "k_lake_roundtrip",  # lake-plane batch-file right-sizing (r9-attested: window slot was due anyway)
    "tx_text_metrics",  # staged tokenize (86 -> 6 lambda nodes)
    "tx_curate_pipeline",  # staged gate + pinned filter + fp_col dedup
    "rt_decontam",  # shared persisted token pass across postings/stats/n-grams
    "ann_pq_topk",  # single-shuffle PQ cell means
    "ann_ivfpq_trained",  # single-shuffle PQ cell means (covers the _cell_means family)
    "mm_embed_vq",  # wide-aggregate dim=8 centroids
    "dd_dup_clusters",  # lazy cluster-loop init checkpoints
    "dd_star_clusters",  # lazy cluster-loop init checkpoints
    "dsir_weights",  # staged token array before feature explode
})

# Rounds whose driver window did NOT advance the rotation: the round-12
# ledger refresh was skipped (attestation.py still said CURRENT_ROUND=11
# at driver time), so CORRECTNESS_r12.json's key set is byte-identical to
# r11's — the same 50 queries were attested twice and the 86 stalest got
# no driver row.  A frozen round consumes no rotation progress, so the
# staleness bound must not count it as an elapsed rotation opportunity
# (see ``effective_gap``).  This set is NOT free-form: a test verifies
# each member against the committed artifacts (key set equal to the
# previous round's), so a round can only be declared frozen when the
# artifacts prove the window really did not move.  tools/round_open.sh
# (the round-start guard added this round) exists to keep this set from
# ever growing again.
FROZEN_ROUNDS: frozenset[int] = frozenset({12})


def effective_gap(last_round: int, current_round: int) -> int:
    """Rounds elapsed since ``last_round`` that actually offered a
    rotation slot — i.e. the raw gap minus frozen rounds inside it."""
    frozen_in_gap = sum(1 for f in FROZEN_ROUNDS if last_round < f <= current_round)
    return current_round - last_round - frozen_in_gap

# query name -> last round with a green driver row (regenerate with
# tools/attest_map.py after each round's CORRECTNESS artifact lands).
LAST_DRIVER_ROUND: dict[str, int] = {
    "a1_group_topk": 10,
    "a234_dashboard_aggs": 10,
    "a5_st2_backoff_table": 10,
    "a6_max_booland": 10,
    "a7_count_over_all": 10,
    "a8_purge_returning_count": 10,
    "a9_profile": 10,
    "a9_quantiles": 12,
    "ann_centroid_assign": 12,
    "ann_ivfpq_topk": 10,
    "ann_ivfpq_trained": 12,
    "ann_near_dups_exact": 10,
    "ann_pq_topk": 10,
    "ann_recall": 12,
    "ann_topk": 10,
    "asof_join": 12,
    "cohort": 12,
    "contamination": 12,
    "corpus_datasheet": 10,
    "corpus_ingest": 12,
    "corpus_warc_ingest": 12,
    "cube_rollup": 10,
    "curriculum": 12,
    "dd_dup_clusters": 12,
    "dd_exact_prefix_groups": 10,
    "dd_jaccard_prefix": 12,
    "dd_lsh_capped": 12,
    "dd_lsh_eval": 10,
    "dd_lsh_incremental": 9,
    "dd_lsh_pairs": 9,
    "dd_minhash_signature": 10,
    "dd_ngram_jaccard": 9,
    "dd_paragraph_dedup": 9,
    "dd_simhash": 10,
    "dd_span_coverage": 9,
    "dd_star_clusters": 10,
    "dense_ids": 9,
    "dist_match_sample": 10,
    "domain_mix": 9,
    "domain_split": 10,
    "dq_expectations": 10,
    "dsir_select": 10,
    "dsir_weights": 10,
    "embed_standardize": 10,
    "event_transitions": 10,
    "f3_smart_cast": 12,
    "f4_date_parse_multi": 12,
    "f_scalar_surface": 12,
    "flagship_pricing_summary": 10,
    "funnel": 10,
    "fuzzy_linkage": 10,
    "gopher_quality": 10,
    "html_extract": 10,
    "interval_join": 10,
    "j1_current_state_join": 12,
    "j2_history_join": 12,
    "j3_u7_batch_select_claim": 12,
    "j4_orphan_left_join": 9,
    "j5_latest_per_key": 9,
    "j6_status_dashboard": 9,
    "k10_time_travel": 10,
    "k8_drop_table": 9,
    "k9_webhook_payload": 10,
    "k_lake_roundtrip": 9,
    "mix_shards": 10,
    "mixture_plan": 12,
    "mm_embed_vq": 12,
    "mm_exif_meta": 10,
    "mm_frame_sample": 9,
    "mm_jpeg_meta": 9,
    "mm_media_meta": 12,
    "nb_source_classifier": 12,
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
    "p78_predicate_surface": 10,
    "p9_time_window": 9,
    "pack_stream": 12,
    "pack_waste": 12,
    "pii_redact": 12,
    "pivot_activity": 12,
    "reduced_antijoin": 10,
    "rt_bm25_topk": 12,
    "rt_decontam": 12,
    "rt_hard_negatives": 12,
    "rt_hybrid_rrf": 12,
    "rt_lake_bm25": 12,
    "s1_live_fetch": 10,
    "s4_excel_load": 9,
    "s5_catalog_load": 9,
    "s6_csv_ingest_inference": 9,
    "s7_mime_sniff": 10,
    "s9_f10_http_surface": 10,
    "scd2_merge": 12,
    "semantic_dedup": 12,
    "sessionize": 12,
    "sk_bloom_probe": 9,
    "sk_countmin_hh": 12,
    "sk_kmv_ndv": 9,
    "sk_lake_rollup": 10,
    "skew_salted_count": 10,
    "sla_streaks": 12,
    "st1_microbatch_rates": 10,
    "st3_next_check_ladder": 9,
    "st45_change_trigger": 10,
    "temporal_split": 9,
    "tfidf_vocab": 12,
    "tok_bpe_encode": 9,
    "tx_bigram_surprisal": 12,
    "tx_blocklist": 12,
    "tx_chunks": 12,
    "tx_clean": 12,
    "tx_curate_pipeline": 10,
    "tx_fingerprint": 10,
    "tx_hashed_features": 12,
    "tx_lang_id": 12,
    "tx_novelty": 12,
    "tx_surprisal": 12,
    "tx_text_metrics": 10,
    "tx_vocab_coverage": 12,
    "u1_union_tiers": 9,
    "u2_upsert_merge": 9,
    "u3_snapshot_diff": 9,
    "u456_point_dml": 10,
    "url_canonical": 12,
    "url_quality": 12,
    "variant_props": 12,
    "weighted_group_sample": 10,
    "window_surface": 10,
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
