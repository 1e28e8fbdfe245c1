"""Graded-window freeze (VERDICT r12 item 1).

After eight rotation waves the swap-out well is measurably dry (the r12
analysis: every remaining rows-only candidate is either libm-bearing —
kn, token_drift, doremi, pmi — or duplicates no oracle surface still
standing), so the 50-entry oracled window is FROZEN as of round 13.

This test pins the window's exact membership: the driver grades every
catalog entry whose ``sql`` is non-None, so an accidental edit that adds,
drops, or de-oracles an entry would silently rotate a slot past the
driver gate between rounds.  With the pin, any such edit fails the suite
immediately and must be made deliberately — by updating BOTH this list
and ROUND_NOTES with the new surface that earns the slot (the settled
house rule: new operators land rows-only with an exactness-gated parity
pytest; the window does not grow past 50).
"""

from meeseeker_spark import catalog

# The frozen window: sorted names of every oracled catalog entry.
# Identical to CORRECTNESS_r12.json's key set (checked at freeze time).
FROZEN_WINDOW = [
    "asof_last_purchase", "blocklist_screen", "bloom_screen",
    "bm25_batch_topk", "channel_volume", "cms_counts", "corpus_datacard",
    "custom_json_channels", "d1_trx_reconcile", "d3_ref_join",
    "d4_round_witnesses", "d5_sample_audit", "decontaminated_spans",
    "dedup_components", "dedup_eval", "domain_cap", "dsir_select",
    "engine_scan", "flatten_ops", "frequent_lines", "gopher_rules",
    "header_enrich", "heavy_hitters", "hll_registers", "knn_topk",
    "label_centroids", "lang_id", "leakage_safe_split", "multimodal_meta",
    "nai_amounts", "near_dup_pairs", "ngram_novelty",
    "notified_blocks_semi", "notify_get_join", "op_key_channel",
    "perplexity_ngram_counts", "pii_redacted_docs", "pii_scan",
    "point_lookup", "pricing_summary", "scan_by_type", "screen_replay",
    "sessionize", "span_cleaned_docs", "temperature_sample",
    "training_funnel", "trx_index", "unimax_sample", "url_host_counts",
    "winnow_fps",
]


def test_graded_window_membership_frozen():
    oracled = sorted(n for n, e in catalog.ENTRIES.items()
                     if e.sql is not None)
    assert oracled == FROZEN_WINDOW, (
        "the graded window changed — this must be a DELIBERATE rotation: "
        f"added={sorted(set(oracled) - set(FROZEN_WINDOW))} "
        f"removed={sorted(set(FROZEN_WINDOW) - set(oracled))}; update "
        "FROZEN_WINDOW and ROUND_NOTES together if so")


def test_window_size_is_exactly_fifty():
    assert len(FROZEN_WINDOW) == 50
    # rows-only entries may still be ADDED (they don't touch the window),
    # but none of the 110 existing entries may silently vanish
    assert len(catalog.ENTRIES) >= 110


def test_every_window_entry_has_a_runnable_callable():
    for name in FROZEN_WINDOW:
        e = catalog.ENTRIES[name]
        assert callable(e.spark) and isinstance(e.sql, str) and e.sql.strip()
