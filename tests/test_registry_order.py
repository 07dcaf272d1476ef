"""Registration-order contract.

The driver correctness-checks only the first 50 entries of
``registry.QUERIES`` (insertion order), so the window must carry the
entries that need a fresh driver signal this round: the 15 round-2
failures healed by the events-ts loader fix, every entry that has never
been in a driver window, the round-3 additions, and regression canaries
for the code paths touched this round.
"""

import json
from pathlib import Path

from tidb_large_table_compare_spark.registry import (
    _DRIVER_PRIORITY,
    ORACLES,
    QUERIES,
)

WINDOW = 50

# Round-2 driver failures (all the events-ts loader defect) that the round-3
# window must re-verify.
R2_FAILS = {
    "order_priority_counts", "json_props_by_type", "string_ops_documents",
    "extract_table_from_sql", "streaming_session_counts",
    "range_join_errors_busy_hours", "lateral_top2_orders_per_customer",
    "price_quantiles_by_status", "redact_pii_documents",
    "q2_cheapest_part_per_brand", "q7_nation_pair_volume",
    "q8_brand_share_by_year", "q9_profit_by_nation_year",
    "sketch_daily_users_merged", "asof_purchase_last_signup",
}

# New round-3 entries that have never had any driver signal.
NEW_IN_R3 = {
    "render_summary_lines",
    "neardup_minhash_lsh_capped",
    "knn_label_classify",
    "knn_label_classify_ivf",
}


def _checked_in_prior_rounds() -> set[str]:
    root = Path(__file__).resolve().parents[1]
    names: set[str] = set()
    for artifact in root.glob("CORRECTNESS_r*.json"):
        names |= set(json.loads(artifact.read_text()))
    return names


def test_priority_list_is_exactly_the_window():
    assert len(_DRIVER_PRIORITY) == WINDOW
    assert len(set(_DRIVER_PRIORITY)) == WINDOW
    assert list(QUERIES)[:WINDOW] == _DRIVER_PRIORITY


def test_window_carries_entries_needing_driver_signal():
    window = set(list(QUERIES)[:WINDOW])
    for group in (R2_FAILS, NEW_IN_R3):
        assert group <= window, sorted(group - window)


def test_every_entry_has_had_a_driver_window():
    """After this rotation, (some prior round's window) ∪ (this window)
    covers the whole registry — no entry ships without a driver signal."""
    covered = _checked_in_prior_rounds() | set(list(QUERIES)[:WINDOW])
    assert set(QUERIES) <= covered, sorted(set(QUERIES) - covered)


def test_reorder_lost_nothing():
    # structural invariants only — a hand-counted total rots every round
    assert len(QUERIES) >= WINDOW
    # every registered query carries a DuckDB oracle (round-2 invariant)
    assert set(ORACLES) == set(QUERIES)
