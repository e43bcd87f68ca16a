"""Degenerate-input sweep over the full query registry (r12, VERDICT
r11 next #5): every registry query runs against empty tables,
single-row tables, and all-NULL value columns, asserting no crash and
oracle agreement where the oracle is defined.

A real user's first broken pipeline is an empty partition; before this
sweep nothing gated that.  The r12 sweep found and fixed, in the
engine: driver-side TypeErrors on NULL embeddings across the IVF/PQ/
SemDeDup stack (now filtered as unprocessable junk at the operator
entries and at tables.load), an AttributeError on reading an empty
snapshot store, an IndexError building PQ codebooks from an empty
corpus (now a deliberate ValueError), an ANN index probe miss raising
instead of returning zero neighbors, and NULL-poisoned audit counters
in rollup_consistency_audit; and aligned five oracles with the wire
contract that NULL measures never enter a series.

Exceptions are acceptable ONLY via the allowlist below, each entry
citing the contract that makes raising correct.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.degenerate_sweep import KINDS, build_fixtures, make_con, run_one  # noqa: E402

# (kind, query) -> substring the exception message must contain.
# Allowed ONLY for deliberate, documented raises:
#
# - Building/serving a vector index over a corpus with NO usable
#   vectors raises ValueError ('centroids is empty',
#   similarity.py ivf_assign; 'PQ codebooks need a non-empty corpus',
#   pq_deterministic_codebooks) — the engine's loud-contract
#   convention for impossible requests, the same shape as
#   granularity_intersection's ValueError on an empty granularity
#   intersection (operators/read.py:85-91), which mirrors the
#   reference's UnAggregableTimeseries -> HTTP 400.  The allnull
#   fixture reduces to the empty corpus after the junk-vector filter
#   (NULL embeddings are dropped at load / operator entry), so it
#   allowlists identically.
_VE = "centroids is empty"
_PQ = "PQ codebooks need a non-empty corpus"
ALLOWLIST: dict[tuple[str, str], str] = {}
for _kind in ("empty", "allnull"):
    ALLOWLIST.update(
        {
            (_kind, "ann_ivf_topk"): _VE,
            (_kind, "ann_probe_curve"): _VE,
            (_kind, "cluster_topics_kmeans"): _VE,
            (_kind, "ann_index_roundtrip"): _VE,
            (_kind, "ann_pq_topk"): _PQ,
            (_kind, "ann_pq_refine_topk"): _PQ,
        }
    )


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    return build_fixtures(str(tmp_path_factory.mktemp("degen")))


@pytest.fixture(scope="module")
def registry():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.queries(), mod.oracle_sql()


def _sweep(spark, registry, fixture_dirs, kind):
    queries, oracles = registry
    con = make_con(fixture_dirs[kind])
    violations = []
    for name in queries:
        rec = run_one(spark, con, queries, oracles, name, fixture_dirs[kind])
        if rec["status"] == "ok":
            continue
        allowed = ALLOWLIST.get((kind, name))
        if (
            allowed
            and rec["status"] == "exc"
            and rec["exc_type"] == "ValueError"
            and allowed in rec["msg"]
        ):
            continue
        violations.append((name, rec))
    assert not violations, f"{kind}: {len(violations)} violations:\n" + "\n".join(
        f"  {n}: {r}" for n, r in violations
    )


@pytest.mark.parametrize("kind", KINDS)
def test_registry_survives_degenerate_inputs(spark, registry, fixture_dirs, kind):
    _sweep(spark, registry, fixture_dirs, kind)
