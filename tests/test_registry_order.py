"""Registration-order contract.

The driver correctness-checks only the first 50 entries of
``registry.QUERIES`` (insertion order), so the window must carry the
entries that need a fresh driver signal this round. The policy is derived
from the ledger (``tidb_large_table_compare_spark.ledger``) instead of a
hand-maintained per-round list: never-green entries and entries with no
driver signal at all MUST hold a window slot; the rest of the window is
oldest-green entries plus regression canaries chosen in
``registry._DRIVER_PRIORITY``.
"""

import json
from pathlib import Path

from tidb_large_table_compare_spark import ledger as L
from tidb_large_table_compare_spark.registry import (
    _DRIVER_PRIORITY,
    ORACLES,
    QUERIES,
)

WINDOW = 50
REPO = Path(__file__).resolve().parents[1]


def _checked_in_prior_rounds() -> set[str]:
    names: set[str] = set()
    for artifact in REPO.glob("CORRECTNESS_r*.json"):
        names |= set(json.loads(artifact.read_text()))
    return names


def test_priority_list_is_exactly_the_window():
    assert len(_DRIVER_PRIORITY) == WINDOW
    assert len(set(_DRIVER_PRIORITY)) == WINDOW
    assert list(QUERIES)[:WINDOW] == _DRIVER_PRIORITY


def test_window_carries_entries_needing_driver_signal():
    """Never-green entries and never-checked entries must be in the window —
    they are the only ones for which the next driver run adds a signal that
    nothing else can stand in for."""
    window = set(list(QUERIES)[:WINDOW])
    led = L.ledger(L.load_rounds(REPO))
    never_green = {n for n, r in led.items() if r["last_green"] is None} & set(QUERIES)
    never_checked = set(QUERIES) - set(led)
    assert never_green <= window, sorted(never_green - window)
    assert never_checked <= window, sorted(never_checked - window)


def test_every_entry_has_had_a_driver_window():
    """(some prior round's window) ∪ (this window) covers the whole
    registry — no entry ships without a driver signal."""
    covered = _checked_in_prior_rounds() | set(list(QUERIES)[:WINDOW])
    assert set(QUERIES) <= covered, sorted(set(QUERIES) - covered)


def _max_signal_age() -> int:
    """Rounds a green signal may age outside the window: the window covers
    the whole registry every ⌈|registry|/WINDOW⌉ rounds, so the oldest
    signal at any judge time is that minus one (it re-greens the round its
    turn comes up)."""
    return -(-len(QUERIES) // WINDOW) - 1


def test_rotation_cadence_is_bounded():
    """Structural pin on the cadence itself: the registry must stay small
    enough that the 50-slot window re-verifies every entry within three
    rounds (signal age ≤ 2). Growing past WINDOW*3 entries would silently
    stretch the guarantee — this fails first."""
    assert _max_signal_age() <= 2


def test_window_rotates_stalest_entries():
    """The rotation policy, phase-aware. The committed window is in one of
    two states relative to the newest CORRECTNESS artifact:

    - POST-RECORD (artifact's entry set == window): the driver just ran this
      very window; the invariant it was built to maintain must hold — no
      entry's latest green lags the newest round by more than the age bound.
    - ROTATED (sets differ): the window targets round ``newest+1``; any
      entry that would exceed the age bound after that round must hold a
      slot now.

    The round-5 formulation ignored the phase and demanded the NEXT round's
    window the moment the driver recorded the current one — red at the start
    of every round by construction (VERDICT r5 'What's wrong' #1)."""
    rounds = L.load_rounds(REPO)
    newest = max(rounds)
    led = L.ledger(rounds)
    window = set(list(QUERIES)[:WINDOW])
    max_age = _max_signal_age()
    greens = {
        n: r["last_green"]
        for n, r in led.items()
        if r["last_green"] is not None and n in QUERIES
    }
    if set(rounds[newest]) == window:
        overdue = {n for n, g in greens.items() if g <= newest - max_age - 1}
        assert overdue == set(), sorted(overdue)
    else:
        stale = {n for n, g in greens.items() if g <= newest - max_age}
        assert stale <= window, sorted(stale - window)


def test_reorder_lost_nothing():
    # structural invariants only — a hand-counted total rots every round
    assert len(QUERIES) >= WINDOW
    # every registered query carries a DuckDB oracle (round-2 invariant)
    assert set(ORACLES) == set(QUERIES)
