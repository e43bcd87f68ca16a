"""Same-session A/B: HEAD vs a freeze worktree (BASELINE.md protocol).

Runs interleaved headline-only bench pairs (stress blocks off) in both
orderings and prints per-run compact payloads plus the shared-query
median comparison.  Usage::

    python tools/ab_bench.py /tmp/r09freeze [n_pairs]

Each side runs in its own subprocess (own JVM) so neither tree's
session state leaks into the other; the pair loop alternates which
side goes first to expose ordering bias, exactly the r09 protocol
(BASELINE.md "r09 same-session A/B").
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(tree: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SCALE_STRESS"] = "0"
    env["SPARK_GRAFT_DEEP_STRESS"] = "0"
    subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        cwd=tree,
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        check=True,
        timeout=1800,
    )
    with open(os.path.join(tree, "BENCH_LOCAL_LAST.json")) as fh:
        return json.load(fh)


def main() -> None:
    freeze = sys.argv[1]
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    runs: list[tuple[str, dict]] = []
    for i in range(n_pairs):
        order = ("head", "freeze") if i % 2 == 0 else ("freeze", "head")
        for side in order:
            tree = REPO if side == "head" else freeze
            p = run_bench(tree)
            runs.append((side, p))
            print(
                f"pair {i + 1} {side}: total {p['value']}s "
                f"({len(p['queries'])} queries)",
                flush=True,
            )
    head = [p for s, p in runs if s == "head"]
    frz = [p for s, p in runs if s == "freeze"]
    shared = sorted(
        set(head[0]["queries"]) & set(frz[0]["queries"])
    )
    def shared_total(p):
        return round(sum(p["queries"][q] for q in shared), 2)
    ht = [shared_total(p) for p in head]
    ft = [shared_total(p) for p in frz]
    out = {
        "n_pairs": n_pairs,
        "shared_queries": len(shared),
        "head_shared_totals": ht,
        "freeze_shared_totals": ft,
        "head_median": round(statistics.median(ht), 2),
        "freeze_median": round(statistics.median(ft), 2),
        "head_full_totals": [p["value"] for p in head],
        "per_query_median": {
            q: [
                round(statistics.median([p["queries"][q] for p in head]), 3),
                round(statistics.median([p["queries"][q] for p in frz]), 3),
            ]
            for q in shared
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
