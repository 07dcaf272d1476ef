"""Driver-window ledger: per-entry correctness history from CORRECTNESS_r*.json.

The driver verifies only the first 50 registry entries per round
(``registry._DRIVER_PRIORITY``), so choosing each round's window needs the
per-entry "when was this last checked / last green" facts. This module derives
them mechanically from the driver's recorded ``CORRECTNESS_r{N}.json`` files
instead of a hand-maintained table (mirrors how the reference keeps only the
latest ``summary.txt`` per table, ``step3_run_syncdiff.sh:169-172``).

Run ``python -m tidb_large_table_compare_spark.ledger`` from the repo root to
print the ledger; the rotation recipe is then: pin never-green entries first,
then oldest-green entries until the window is full, keeping a few canaries for
recently-touched code paths.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

_CHECK_KEYS = ("rows_match", "schema_match", "hash_match")


def load_rounds(repo_dir: str | Path = ".") -> dict[int, dict[str, dict]]:
    """All driver correctness files, keyed by round number."""
    rounds: dict[int, dict[str, dict]] = {}
    for f in Path(repo_dir).glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)\.json$", f.name)
        if not m:
            continue
        rounds[int(m.group(1))] = json.loads(f.read_text())
    return rounds


def is_green(result: dict) -> bool:
    """True when a driver record counts as a passing signal.

    Oracle-backed entries need ``hash_match``; rows-only entries record null
    for the checks the weaker path skips, so null never fails an entry — but
    at least one check must be affirmatively true.
    """
    if result.get("err"):
        return False
    checks = [result.get(k) for k in _CHECK_KEYS]
    if any(c is False for c in checks):
        return False
    return any(c is True for c in checks)


def ledger(rounds: dict[int, dict[str, dict]]) -> dict[str, dict]:
    """Per-entry ``{last_checked, last_green}`` round numbers (None = never)."""
    out: dict[str, dict] = {}
    for rnd in sorted(rounds):
        for name, result in rounds[rnd].items():
            row = out.setdefault(name, {"last_checked": None, "last_green": None})
            row["last_checked"] = rnd
            if is_green(result):
                row["last_green"] = rnd
    return out


def rotation_candidates(rounds: dict[int, dict[str, dict]]) -> list[str]:
    """Entries most in need of a driver slot: never-green first, then by
    oldest last-green round, alphabetical within a tier (deterministic)."""
    led = ledger(rounds)
    return sorted(
        led,
        key=lambda n: (led[n]["last_green"] is not None, led[n]["last_green"] or 0, n),
    )


def suggest_window(
    rounds: dict[int, dict[str, dict]],
    window: int = 50,
    all_entries: list[str] | None = None,
) -> dict:
    """The NEXT round's mandatory window, mechanically.

    At N registry entries the cadence bound is ⌈N/window⌉−1 rounds of
    allowed signal age, so after the newest recorded round R every entry
    whose last green is ≤ R − bound MUST re-verify next round — plus
    never-green entries, and (when ``all_entries`` supplies the full
    registry) entries with NO recorded round at all, which need a first
    signal more than anything the history contains. Returns
    ``{"mandatory": [names...], "free_slots": int, "bound": int,
    "newest_round": int, "feasible": bool}`` — the free slots are for
    change canaries, chosen by the builder, not by history;
    ``feasible=False`` means the mandatory set alone overflows the
    window (e.g. after a skipped round) and the cadence test will flag
    whatever is left out.
    """
    led = ledger(rounds)
    newest = max(rounds, default=0)
    names = set(led) | set(all_entries or [])
    n = len(names)
    bound = max(1, -(-n // window) - 1)
    mandatory = sorted(
        name
        for name in names
        if name not in led
        or led[name]["last_green"] is None
        or led[name]["last_green"] <= newest - bound
    )
    return {
        "mandatory": mandatory,
        "free_slots": max(0, window - len(mandatory)),
        "bound": bound,
        "newest_round": newest,
        "feasible": len(mandatory) <= window,
    }


def render(rounds: dict[int, dict[str, dict]]) -> str:
    led = ledger(rounds)
    lines = ["| entry | last checked | last green |", "|---|---|---|"]
    for name in rotation_candidates(rounds):
        row = led[name]
        green = (
            f"r{row['last_green']}" if row["last_green"] is not None else "never"
        )
        lines.append(f"| {name} | r{row['last_checked']} | {green} |")
    return "\n".join(lines)


if __name__ == "__main__":
    import sys

    rounds = load_rounds(Path(__file__).resolve().parent.parent)
    if "--suggest" in sys.argv:
        # the registry import is deliberately CLI-only: the library half
        # of this module stays loadable from correctness files alone
        from tidb_large_table_compare_spark.registry import QUERIES

        s = suggest_window(rounds, all_entries=list(QUERIES))
        print(
            f"next window after r{s['newest_round']} "
            f"(signal-age bound {s['bound']}): "
            f"{len(s['mandatory'])} mandatory, {s['free_slots']} free "
            f"canary slots"
            + ("" if s["feasible"] else " — INFEASIBLE: mandatory set "
               "overflows the window; split across rounds deliberately")
        )
        for name in s["mandatory"]:
            print(f"  {name}")
        raise SystemExit(0)
    led = ledger(rounds)
    stale = [n for n, r in led.items() if r["last_green"] == min(rounds, default=0)]
    print(render(rounds))
    print(f"\nentries: {len(led)}; never green: "
          f"{sum(1 for r in led.values() if r['last_green'] is None)}; "
          f"green only in the oldest round: {len(stale)}")
