"""CHECK_ORDER rotation helper.

The driver's correctness gate checks exactly the first 50 entries of
``__spark_entry__.queries()`` per round; ``queries.CHECK_ORDER``
curates that window.  This tool recomputes the rotation state from the
committed evidence so each round's window can be rebuilt mechanically:

    python tools/rotation.py

Prints, from the union of all ``CORRECTNESS_r*.json`` hash-green rows:
- queries never driver-checked (must be front-loaded next round),
- queries whose LATEST driver check failed (must be re-checked),
- registry entries vs window size, to plan the remaining slots.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def main() -> None:
    from gnocchi_spark.queries import CHECK_ORDER, QUERIES

    green: set[str] = set()
    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            ok = bool(row.get("hash_match")) and not row.get("err")
            if ok:
                green.add(name)
            if name not in latest or rnd >= latest[name][0]:
                latest[name] = (rnd, ok)

    registered = list(QUERIES)
    never = [q for q in registered if q not in green]
    regressed = [q for q, (_, ok) in latest.items() if not ok and q in QUERIES]

    print(f"registered queries : {len(registered)}")
    print(f"driver-green union : {len(green & set(QUERIES))}")
    print(f"never checked      : {len(never)}")
    for q in never:
        print(f"  {q}")
    print(f"latest-check failed: {len(regressed)}")
    for q in regressed:
        print(f"  {q}")
    stale = [q for q in CHECK_ORDER if q in green]
    print(
        f"current window: {len(CHECK_ORDER)}/{WINDOW} slots; "
        f"{len(stale)} already green (rotatable), "
        f"{len(CHECK_ORDER) - len(stale)} pending first check"
    )

    # Standing oldest-first policy (r07, VERDICT r06 next #3): each
    # round's window = queries whose implementation changed that round
    # + new queries (front, ~5-15 slots), then the STALEST green rows
    # (last-checked round ascending, name as tiebreak) filling the
    # rest.  This list is the mechanical fill order:
    by_staleness = sorted(
        (q for q in registered), key=lambda q: (latest.get(q, (0, False))[0], q)
    )
    print("\noldest-first fill order (last-checked round, name):")
    for q in by_staleness[:60]:
        print(f"  r{latest.get(q, (0, False))[0]:02d} {q}")


if __name__ == "__main__":
    main()
