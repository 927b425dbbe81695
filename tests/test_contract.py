"""Driver-contract wiring guards (no Spark session needed).

The per-round driver checks the FIRST ~50 ``queries()`` entries against
their ``oracle_sql()`` twins; these tests pin the invariants that keep
that contract honest across rotations and new-query additions.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_has_an_oracle():
    """The ⊙ invariant COVERAGE.md claims: every queries() entry has a
    DuckDB oracle (none silently downgraded to the rows-only check)."""
    q = entry.queries()
    o = entry.oracle_sql()
    missing = [n for n in q if n not in o]
    assert missing == [], missing
    stale = [n for n in o if n not in q]
    assert stale == [], stale


def test_rotation_order_is_applied():
    """queries() must serve the _DRIVER_PRIORITY order so the 50-query
    driver cap lands on the intended entries (new + longest-unchecked
    first)."""
    q = list(entry.queries())
    prio = [n for n in entry._DRIVER_PRIORITY if n in set(q)]
    assert q[: len(prio)] == prio
    # round 6: the 3 new queries, the pre_aggregate-switched
    # t_kmv_distinct, and ALL 31 queries last driver-checked in r02
    # (VERDICT r5 item 2) must sit inside the driver's 50-query window
    head = set(q[:50])
    must_check = {
        "s_hard_negatives_ivf", "s_hard_negatives_indexed",
        "q_funnel_windowed", "st_cdc_compact", "st_apply_changes",
        "st_weighted_sample", "t_kmv_by_source", "op_check_scd2",
        "q_event_transitions", "st_mv_compact", "op_checksum",
        "op_join_explosion", "op_apply_changes", "t_quality_percentile",
        "t_sample_n_by", "t_kmv_distinct",
        "q3_shipping_priority", "q5_local_supplier_volume", "q_pivot_status",
        "q_recursive_paths", "q_recursive_spine", "q_skew_salted_join",
        "s_brute_topk", "s_centroids", "s_ivf_label_topk",
        "s_ivf_trained_topk", "s_lsh_buckets", "s_lsh_pairs", "s_quantize",
        "st_cdc_merge", "st_dedup", "st_incremental_load",
        "st_interval_join", "st_sessions", "st_static_enrich",
        "st_windowed_counts", "t_chunks", "t_corpus_prep",
        "t_dataset_card", "t_domain_mix", "t_pack_sequences",
        "t_pseudonymize", "t_quality_filter", "t_repetition", "t_shards",
        "t_stratified", "t_top_terms",
    }
    assert must_check <= head, sorted(must_check - head)


def test_oracle_sql_is_nonempty_select():
    """Each oracle is a non-empty SQL string (catches a generator
    returning None/'' after a refactor)."""
    bad = [
        n
        for n, sql in entry.oracle_sql().items()
        if not isinstance(sql, str) or "select" not in sql.lower()
    ]
    assert bad == [], bad


def test_head_50_covers_every_never_driver_checked_query():
    """The driver caps each round at ~50 queries: the rotation must put
    EVERY query that has never had a driver row inside the head-50, or
    it can wait rounds for its first verification."""
    import json
    from pathlib import Path

    checked: set[str] = set()
    for p in Path(".").glob("CORRECTNESS_r*.json"):
        checked |= set(json.loads(p.read_text()))
    if not checked:  # round 1: no driver rows exist yet
        return
    q = list(entry.queries())
    never = [n for n in q if n not in checked]
    assert set(never) <= set(q[:50]), sorted(set(never) - set(q[:50]))
