"""Interleaved per-query A/B between this tree and another worktree.

Runs ``tools/profile_queries.py --passes 1 <queries>`` alternately in
both trees (fresh JVM per run, both orderings) and reports per-query
medians of t_total/t_construct/t_execute.  The machine drifts (shared
host), so ONLY interleaved pairs are attribution-bearing — sequential
whole-profile runs measured 91 s vs 109 s for the SAME workload twenty
minutes apart (r12).

Usage::

    python tools/ab_profile.py /tmp/r12base 3 ann_probe_curve dedup_semantic ...
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_profile(tree: str, queries: list[str]) -> dict[str, dict]:
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(tree, "tools", "profile_queries.py"),
            "--passes",
            "2",
            *queries,
        ],
        cwd=tree,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    rows = {}
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"query"' in line:
            r = json.loads(line)
            # warm numbers only: the 2nd pass in the same JVM — the
            # cold pass carries multi-second JIT/footer noise that
            # swamps sub-second deltas
            r["t_construct"] = r["construct_all"][-1]
            r["t_execute"] = r["execute_all"][-1]
            r["t_total"] = round(r["t_construct"] + r["t_execute"], 3)
            rows[r["query"]] = r
    if not rows:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise RuntimeError(f"no results from {tree}")
    return rows


def main() -> None:
    other = sys.argv[1]
    n_pairs = int(sys.argv[2])
    queries = sys.argv[3:]
    sides: dict[str, list[dict]] = {"head": [], "other": []}
    for i in range(n_pairs):
        order = ("head", "other") if i % 2 == 0 else ("other", "head")
        for side in order:
            tree = REPO if side == "head" else other
            rows = run_profile(tree, queries)
            sides[side].append(rows)
            tot = round(sum(r["t_total"] for r in rows.values()), 2)
            print(f"pair {i + 1} {side}: total {tot}s", flush=True)

    def med(side, q, key):
        return round(
            statistics.median(r[q][key] for r in sides[side]), 3
        )

    report = {}
    for q in queries:
        report[q] = {
            "head": [med("head", q, "t_total"), med("head", q, "t_construct"), med("head", q, "t_execute")],
            "other": [med("other", q, "t_total"), med("other", q, "t_construct"), med("other", q, "t_execute")],
        }
    print(json.dumps(report, indent=1))
    ht = round(sum(v["head"][0] for v in report.values()), 2)
    ot = round(sum(v["other"][0] for v in report.values()), 2)
    print(json.dumps({"head_total_median_sum": ht, "other_total_median_sum": ot}))


if __name__ == "__main__":
    main()
