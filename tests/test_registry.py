"""__ray_entry__ registry invariants: the driver correctness gate samples
the FIRST 50 queries() entries, so ordering and oracle coverage are part
of the product contract, not incidental."""

import ast
import sys

sys.path.insert(0, "/root/repo")


def _load_entry():
    import __ray_entry__ as E

    return E


# sketches have no engine-exact SQL twin by nature; the driver records a
# rows-only check and the test suite pins their error bounds instead
ROWS_ONLY = {"hll_users"}


def test_every_query_has_an_oracle():
    E = _load_entry()
    q = E.QUERIES
    o = E.ORACLES
    missing = [k for k in q if k not in o and k not in ROWS_ONLY]
    assert missing == [], f"queries without oracle_sql twins: {missing}"
    orphans = [k for k in o if k not in q]
    assert orphans == [], f"oracles without queries() entries: {orphans}"


def test_front_window_holds_new_and_never_sampled():
    """The round-5 final rotation: newest operators lead the 50-entry
    driver gate window (session-10, then session-9 — they have never had
    ANY external validation), the four VERDICT-r4 scale-path twins stay
    pinned inside it, and session-8 back-fills the remaining slots
    youngest-first (older, long-locally-verified entries yield)."""
    E = _load_entry()
    keys = list(E.QUERIES.keys())
    first50 = set(keys[:50])
    for name in (
        # session-15 operators (newest — zero external validation):
        # span-structure analytics over the interleaved payload + the
        # media-integrity and KMV sketch audits, the cohort-LTV triangle,
        # caption mining and multimodal-aware packing
        "caption_mining", "span_pack",
        "cohort_ltv", "media_ref_integrity", "kmv_intersection",
        "span_kind_transitions", "media_density",
        "span_offset_audit", "kind_runlengths",
        # session-14 operators
        "rare_token_pairs", "temporal_split",
        "join_card_estimate", "bottomk_sample",
        # session-13 operators
        "bow_dedup", "hard_negatives",
        "dedup_modality_agreement",
        "quantile_map", "effective_sample_size",
        "seasonal_naive_error", "feature_hashing",
        "cdc_families", "gini_stump",
        "motif_pairs", "regression_fit", "dup_edit_audit",
        "phonetic_keys",
        "cdc_chunks", "poisson_bootstrap", "rand_projection",
        # session-12 operators
        "churn_overlap", "value_mad",
        "late_events", "encoding_size_audit", "dup_baskets",
        "freq_of_freqs", "oov_rate", "sole_source_risk",
        "ship_lag_stats", "zonemap_prune", "open_order_backlog",
        "order_reconcile", "weekday_profile", "rfm_scores",
        "dwell_times", "vocab_drift", "edit_distance_join",
        # VERDICT-r4 scale-path twins: pinned directly behind the newest
        # ops so window pressure can never push them past slot 50
        "main_content", "substring_dedup", "dedup_resolution_cogroup",
        "asof_join_bucketed",
        # the tail past slot 50 (interarrival_stats, activity_streaks,
        # key_skew_audit, inversion_count, hist_intersection,
        # marginal_vocab, kappa_agreement,
        # minimizer_sketch, bool_retrieval, dim_covariance,
        # lsh_recall_audit, lang_fertility, mutual_knn, label_prop,
        # grid_cores,
        # hits, skipgram_counts, entity_graph,
        # cluster_inertia, dim_variance,
        # centroid_outliers, sampled_dup_rate,
        # effective_tokens, term_burstiness, full_join,
        # int8_quant_error, assortativity, blocklist_hits,
        # semantic_decontaminate, k_anonymity, stratified_kfold,
        # syndication_histogram, ewma_running,
        # term_trend, log_histogram, json_props_stats,
        # ab_assignment, semantic_families, fd_audit,
        # index_gap_stats, dataset_card, pareto_share,
        # kendall_pairs, source_prefix_audit, ktruss, fold_leakage,
        # hash_collision_audit, emd_lengths, link_jaccard and the
        # earlier session-9 yields) stays locally sweep-verified every
        # session
    ):
        assert name in first50, f"{name} fell outside the driver gate window"
    # the leading block must be exactly the declared rotation order
    assert keys[: len(E._FRONT_R5)] == E._FRONT_R5[: len(E._FRONT_R5)]


def test_entry_module_does_not_own_ray_session():
    """CLAUDE.md contract: __ray_entry__ must never call ray.init or
    ray.shutdown — the driver owns the session."""
    tree = ast.parse(open("/root/repo/__ray_entry__.py").read())
    calls = [
        n
        for n in ast.walk(tree)
        if isinstance(n, ast.Attribute) and n.attr in ("init", "shutdown")
        and isinstance(n.value, ast.Name) and n.value.id == "ray"
    ]
    assert calls == [], "ray.init/ray.shutdown found in __ray_entry__.py"
