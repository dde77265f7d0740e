"""Per-round oracle-window census — automates the bookkeeping every
round since 4 has recomputed by hand (and the r11/r12 verdicts audited
line by line): for each registry query, the LATEST round with an
all-green driver row in the committed CORRECTNESS_r*.json files; the
round's natural window at a given ORACLE_ROUND; which stale/never rows
it misses; and a ready-to-paste eviction-priority list
(freshest-driver-row-first) for ``registry._pin_window``.

Usage:
    python tools/window_census.py            # census for ORACLE_ROUND+1
    python tools/window_census.py --round 14 # explicit round
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from youtube_scraper_db_spark import registry as R  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green(row: dict) -> bool:
    return bool(
        isinstance(row, dict)
        and row.get("rows_match")
        and row.get("schema_match")
        and (row.get("hash_match") in (True, None))
        and not row.get("err")
    )


def latest_green_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name, row in json.load(open(f)).items():
            if green(row):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--round", type=int, default=R.current_round() + 1,
        help="round to plan for (default: committed ORACLE_ROUND + 1)",
    )
    args = ap.parse_args()

    latest = latest_green_rounds()
    names = [s.name for s in R.REGISTRY]
    n = len(names)
    off = ((args.round - 2) * R.ORACLE_WINDOW) % n
    window = [names[(off + i) % n] for i in range(R.ORACLE_WINDOW)]
    win_set = set(window)

    by_round = Counter(latest.get(nm, 0) for nm in names)
    print(f"registry {n} | round {args.round} | natural offset {off}")
    print(
        "latest-green distribution:",
        {f"r{r:02d}" if r else "never": c for r, c in sorted(by_round.items())},
    )

    never = [nm for nm in names if nm not in latest]
    oldest = min((r for r in by_round if r), default=0)
    stale = sorted(nm for nm in names if latest.get(nm, 0) == oldest)
    print(f"\nnever driver-checked ({len(never)}): {never}")
    print(f"oldest cohort r{oldest:02d} ({len(stale)}):")
    for nm in stale:
        mark = "in-window" if nm in win_set else "OUT"
        print(f"  {nm}  [{mark}]")

    must = never + stale
    missed = [nm for nm in must if nm not in win_set]
    print(
        f"\nnatural window covers {len(must) - len(missed)}/{len(must)} "
        f"of (never + r{oldest:02d}); {len(missed)} need pinning"
    )
    if len(must) > R.ORACLE_WINDOW:
        print(
            f"NOTE: never+oldest = {len(must)} > {R.ORACLE_WINDOW} — "
            "pin the never-checked rows first, oldest cohort fills the rest"
        )

    evict = sorted(
        (nm for nm in window if latest.get(nm, 0) > oldest),
        key=lambda nm: -latest[nm],
    )
    print("\neviction-priority list (freshest first) for _pin_window:")
    for nm in evict:
        print(f'    "{nm}",  # r{latest[nm]:02d}')


if __name__ == "__main__":
    main()
