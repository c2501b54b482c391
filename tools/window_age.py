"""Driver-check staleness audit: when was each registry entry last green
in a driver CORRECTNESS window?

    python tools/window_age.py

Prints every registry entry with the round of its last driver-green row
(rows+schema+hash all matching; hash may be absent for rows-only checks),
oldest first, plus a staleness histogram — the input to each round's
window rotation (VERDICT r11 item 1 made rotation-by-staleness the
standing policy).  Reads CORRECTNESS_r*.json from the repo root and
artifacts/.  Pure-structure: no Spark session.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import defaultdict

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def last_green_rounds() -> dict[str, int]:
    last: dict[str, int] = {}
    files = glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")) + glob.glob(
        os.path.join(HERE, "artifacts", "CORRECTNESS_r*.json")
    )
    for f in sorted(
        files, key=lambda p: int(p.rsplit("_r", 1)[1].split(".")[0])
    ):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        try:
            data = json.load(open(f))
        except (OSError, ValueError):
            continue
        for q, v in data.items():
            if not isinstance(v, dict):
                continue
            ok = v.get("rows_match", False) and v.get("schema_match", False)
            if ok and v.get("hash_match", None) in (True, None):
                last[q] = rnd
    return last


def main() -> int:
    import __spark_entry__ as E

    registry = list(E.queries())
    last = last_green_rounds()
    rows = sorted(registry, key=lambda q: (last.get(q, -1), q))
    by_round: dict[int, int] = defaultdict(int)
    for q in rows:
        r = last.get(q, -1)
        by_round[r] += 1
        tag = f"r{r:02d}" if r >= 0 else "NEVER"
        print(f"{tag}  {q}")
    print()
    for r in sorted(by_round):
        tag = f"r{r:02d}" if r >= 0 else "NEVER"
        print(f"{tag}: {by_round[r]} entries")
    never = [q for q in registry if q not in last]
    # whatever round's window is currently declared (_R<N>_WINDOW).
    # ADVICE r12: pick the HIGHEST numeric round, not dir() order — if two
    # rounds' windows ever coexist mid-transition (or _R2 vs _R12 sorts
    # oddly), alphabetical next() would audit the stale one.
    window_attrs = [
        a for a in dir(E)
        if re.fullmatch(r"_R(\d+)_WINDOW", a)
    ]
    window = (
        getattr(E, max(window_attrs,
                       key=lambda a: int(re.fullmatch(r"_R(\d+)_WINDOW", a)
                                         .group(1))))
        if window_attrs else []
    )
    uncovered_new = [q for q in never if q not in window]
    if uncovered_new:
        print(f"\nWARNING: never-checked entries NOT in the current window: "
              f"{uncovered_new}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
