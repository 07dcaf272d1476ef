"""The driver-window ledger derives per-entry history from CORRECTNESS files."""

from __future__ import annotations

from pathlib import Path

from tidb_large_table_compare_spark import ledger as L

REPO = Path(__file__).resolve().parent.parent


def test_is_green_classification():
    ok = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    rows_only = {"rows_match": True, "schema_match": None, "hash_match": None, "err": None}
    hash_fail = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
    errored = {"rows_match": None, "schema_match": None, "hash_match": None, "err": "boom"}
    empty = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
    assert L.is_green(ok)
    assert L.is_green(rows_only)
    assert not L.is_green(hash_fail)
    assert not L.is_green(errored)
    assert not L.is_green(empty)


def test_ledger_tracks_latest_rounds():
    rounds = {
        1: {"a": {"hash_match": True, "err": None}, "b": {"err": "x"}},
        2: {"b": {"hash_match": True, "err": None}, "c": {"err": "x"}},
    }
    led = L.ledger(rounds)
    assert led["a"] == {"last_checked": 1, "last_green": 1}
    assert led["b"] == {"last_checked": 2, "last_green": 2}
    assert led["c"] == {"last_checked": 2, "last_green": None}
    # never-green first, then oldest green
    assert L.rotation_candidates(rounds) == ["c", "a", "b"]


def test_repo_ledger_covers_every_recorded_entry():
    rounds = L.load_rounds(REPO)
    assert rounds, "driver correctness files should exist from round 1 on"
    led = L.ledger(rounds)
    # every entry the driver ever checked has a ledger row with a round number
    assert all(r["last_checked"] in rounds for r in led.values())
    # the render is parseable markdown with one row per entry
    table = L.render(rounds)
    assert table.count("\n") == len(led) + 1


def test_suggest_window_lists_mandatory_cohort():
    """--suggest derives the next round's MANDATORY window mechanically:
    never-green entries plus everything whose last green is at or past
    the cadence bound behind the newest recorded round."""
    rounds = {
        6: {"old": {"hash_match": True, "err": None},
            "never": {"err": "x"}},
        7: {"mid": {"hash_match": True, "err": None},
            "never": {"err": "x"}},
        8: {"fresh": {"hash_match": True, "err": None}},
    }
    s = L.suggest_window(rounds, window=50)
    # 4 entries → bound max(1, ceil(4/50)-1) = 1: everything green ≤ r7
    # is mandatory, plus the never-green entry
    assert s["newest_round"] == 8 and s["bound"] == 1
    assert s["mandatory"] == ["mid", "never", "old"]
    assert s["free_slots"] == 47 and s["feasible"]

    # entries the history never recorded (fresh registrations) need a
    # first signal more than anything in the files — all_entries pulls
    # them in as mandatory
    s = L.suggest_window(rounds, window=50,
                         all_entries=["fresh", "brand_new", "old"])
    assert "brand_new" in s["mandatory"] and "old" in s["mandatory"]

    # an overflowing mandatory set is flagged, never a negative slot count
    s = L.suggest_window(rounds, window=2)
    assert not s["feasible"] and s["free_slots"] == 0


def test_suggest_window_matches_committed_rotation():
    """Against the real repo history, PHASE-AWARE (same two states as
    test_registry_order.test_window_rotates_stalest_entries): only in
    the ROTATED state (committed window ≠ the newest artifact's entry
    set, i.e. the window targets the next round) must every suggested
    mandatory entry hold a slot. In the POST-RECORD state the driver
    just verified this very window and the next rotation hasn't been
    chosen yet — asserting there would be red-at-round-start by
    construction (the round-5 mistake)."""
    from tidb_large_table_compare_spark.registry import _DRIVER_PRIORITY

    rounds = L.load_rounds(REPO)
    window = set(_DRIVER_PRIORITY)
    if set(rounds[max(rounds)]) == window:
        return  # POST-RECORD: nothing to assert yet
    s = L.suggest_window(rounds)
    missing = [n for n in s["mandatory"] if n not in window]
    assert missing == [], missing
