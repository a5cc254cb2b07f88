#!/usr/bin/env python
"""Print the predicted driver correctness window for the NEXT round.

The driver verifies the first ~50 registry entries each round, and the
registry order is fully determined by `registry._reorder` (failed rows,
then active rechecks, then never-checked first-rows, then stalest
evidence). This script materializes that prediction as an artifact so
each round's NOTES can STATE what evidence will land instead of
reasoning it out in prose (VERDICT r9 item 8).

Usage: python scripts/forecast_window.py [window_size]
Prints one line per predicted slot: rank, tier label, query ID, and the
round of its latest driver row (- if never checked).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opay_datalake_script_spark import registry  # noqa: E402


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    ordered = registry.load_all_queries()
    history, max_complete = registry._driver_history()
    next_wave_active = max_complete >= registry._RECHECK_NEXT_AFTER_ROUND
    print(f"# registry size: {len(ordered)}  window: {window}  "
          f"max complete round: {max_complete}")
    for rank, name in enumerate(list(ordered)[:window], 1):
        hit = history.get(name)
        rnd = hit[0] if hit else None
        # the SAME tiering _reorder sorts on — shared code, no drift
        _major, _minor, tier = registry._evidence_tier(
            name, hit, next_wave_active
        )
        # explicit None check (ADVICE r10): `rnd if rnd else ...` printed
        # the malformed 'r-' for never-checked entries and would mask a
        # legitimate round 0 (0 is falsy) as never-checked
        suffix = f"r{rnd}" if rnd is not None else "-"
        print(f"{rank:3d}  {tier:21s}  {name:32s}  {suffix}")

    # Registration-budget line (VERDICT r11 item 6): every new first-row
    # sorts into tier (2,0), AHEAD of the whole stale-refresh tier, so it
    # displaces the LAST windowed stale slot. Make that cost explicit so
    # a session sees it BEFORE registering, not in next round's verdict.
    windowed = list(ordered)[:window]
    stale_rounds = []
    priority = 0
    for name in windowed:
        hit = history.get(name)
        major, _minor, _tier = registry._evidence_tier(
            name, hit, next_wave_active
        )
        if major < 3:
            priority += 1
        else:
            stale_rounds.append(hit[0])
    if stale_rounds:
        oldest = min(stale_rounds)
        budget_oldest = sum(1 for r in stale_rounds if r > oldest)
        last_name = windowed[-1]
        last_rnd = history[last_name][0]
        print(
            f"# budget: {priority} priority slots, {len(stale_rounds)} "
            f"stale slots (oldest r{oldest}); next first-row displaces "
            f"{last_name} (r{last_rnd}); {budget_oldest} first-row "
            f"slots before an r{oldest} row defers"
        )
    else:
        print(
            f"# budget: {priority} priority slots fill the window; any "
            "first-row registration defers another priority entry"
        )


if __name__ == "__main__":
    main()
