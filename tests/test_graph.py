"""Unit tests for the co-occurrence graph operators
(operators/graph.py): degree-capped edge construction (determinism,
cap binding, symmetry) and label-propagation convergence on a known
two-community graph."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gnocchi_spark.operators.graph import (
    cooccurrence_edges,
    label_propagation,
    pagerank,
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


class TestCooccurrenceEdges:
    def test_small_buckets_exact_and_symmetric(self, spark):
        # two buckets below the cap: the exact co-occurrence graph
        ev = _ev(
            spark,
            [(1, ts(0)), (2, ts(0)), (3, ts(0)), (1, ts(30)), (4, ts(30))],
        )
        e = cooccurrence_edges(
            ev, F.date_trunc("minute", F.col("ts")), max_per_bucket=32
        )
        got = {(r["src"], r["dst"]) for r in e.collect()}
        want = {(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2), (1, 4), (4, 1)}
        assert got == want

    def test_cap_bounds_pairs_and_is_deterministic(self, spark):
        # one hot bucket with 20 members, cap 5: exactly 5*4 ordered
        # pairs survive, and the SAME 5 members survive on every run
        # (md5 rank is a pure function of the data)
        ev = _ev(spark, [(u, ts(0)) for u in range(20)])
        bucket = F.date_trunc("minute", F.col("ts"))
        e1 = cooccurrence_edges(ev, bucket, max_per_bucket=5)
        pairs1 = {(r["src"], r["dst"]) for r in e1.collect()}
        assert len(pairs1) == 5 * 4
        pairs2 = {
            (r["src"], r["dst"])
            for r in cooccurrence_edges(ev, bucket, max_per_bucket=5).collect()
        }
        assert pairs1 == pairs2

    def test_cap_keeps_pairspace_linear_in_buckets(self, spark):
        # 3 hot buckets x 50 members, cap 4 -> 3 * 4*3 pairs, not 3 * 50*49
        rows = [(b * 100 + u, ts(b)) for b in range(3) for u in range(50)]
        e = cooccurrence_edges(
            _ev(spark, rows), F.date_trunc("minute", F.col("ts")), max_per_bucket=4
        )
        assert e.count() == 3 * 4 * 3


class TestLabelPropagation:
    def test_two_cliques_converge_to_two_communities(self, spark):
        # two disjoint cliques (shared buckets) -> each collapses to
        # its own min-label community
        rows = [(u, ts(0)) for u in (1, 2, 3)] + [(u, ts(30)) for u in (7, 8, 9)]
        e = cooccurrence_edges(
            _ev(spark, rows), F.date_trunc("minute", F.col("ts")), max_per_bucket=32
        )
        lbl = {r["uid"]: r["lbl"] for r in label_propagation(e, 3).collect()}
        assert lbl[1] == lbl[2] == lbl[3] == 1
        assert lbl[7] == lbl[8] == lbl[9] == 7

    def test_pagerank_mass_conserves(self, spark):
        rows = [(u, ts(0)) for u in (1, 2, 3, 4)]
        e = cooccurrence_edges(
            _ev(spark, rows), F.date_trunc("minute", F.col("ts")), max_per_bucket=32
        )
        pr = pagerank(e, iterations=3).collect()
        total = sum(r["p"] for r in pr)
        assert total == pytest.approx(1.0, abs=1e-9)
        # symmetric 4-clique: uniform rank
        assert all(r["p"] == pytest.approx(0.25, abs=1e-12) for r in pr)


class TestTriangleCount:
    def _edges(self, spark, pairs):
        # symmetric closure of an undirected pair list
        sym = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
        return spark.createDataFrame(sym, "src long, dst long")

    def test_k4_every_node_in_three_triangles(self, spark):
        from gnocchi_spark.operators.graph import triangle_count

        e = self._edges(
            spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        )
        out = {r["uid"]: r for r in triangle_count(e).collect()}
        assert set(out) == {1, 2, 3, 4}
        for r in out.values():
            assert r["degree"] == 3
            assert r["n_triangles"] == 3
            assert r["clustering"] == 1.0

    def test_path_graph_has_no_triangles(self, spark):
        from gnocchi_spark.operators.graph import triangle_count

        out = {
            r["uid"]: r
            for r in triangle_count(
                self._edges(spark, [(1, 2), (2, 3), (3, 4)])
            ).collect()
        }
        assert all(r["n_triangles"] == 0 for r in out.values())
        assert all(r["clustering"] == 0.0 for r in out.values())

    def test_triangle_plus_pendant(self, spark):
        from gnocchi_spark.operators.graph import triangle_count

        # triangle 1-2-3 with pendant 4 hanging off 3
        out = {
            r["uid"]: r
            for r in triangle_count(
                self._edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
            ).collect()
        }
        assert out[1]["n_triangles"] == out[2]["n_triangles"] == 1
        assert out[3]["n_triangles"] == 1 and out[3]["degree"] == 3
        assert out[4]["n_triangles"] == 0 and out[4]["degree"] == 1
        # node 3: 1 triangle over C(3,2)=3 possible wedges
        assert out[3]["clustering"] == round(2 * 1 / (3 * 2), 6)


class TestKcorePeel:
    def _edges(self, spark, pairs):
        sym = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
        return spark.createDataFrame(sym, "src long, dst long")

    def test_pendant_chain_peels_into_core(self, spark):
        from gnocchi_spark.operators.graph import kcore_peel

        # K4 core with a chain 4-5-6 hanging off: 2-core peeling must
        # remove 6 (deg 1), then 5 (deg 1 after), leaving exactly K4
        e = self._edges(
            spark,
            [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        )
        out = {r["uid"]: r["degree"] for r in kcore_peel(e, k=2, rounds=3).collect()}
        assert set(out) == {1, 2, 3, 4}
        assert out[1] == out[2] == out[3] == 3
        # node 4 lost its pendant edge: degree inside the core is 3
        assert out[4] == 3

    def test_rounds_matter_for_cascades(self, spark):
        from gnocchi_spark.operators.graph import kcore_peel

        # a path 1-2-3-4-5: one 2-core peel removes only the endpoints;
        # the cascade needs more rounds to empty the graph
        e = self._edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        assert kcore_peel(e, k=2, rounds=1).count() == 3
        assert kcore_peel(e, k=2, rounds=3).count() == 0
