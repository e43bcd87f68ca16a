"""Unit tests for the distribution-drift diagnostics
(operators/drift.py), the bigram LM quality gate
(operators/retrieval.bigram_lm_score) and the Theil-Sen robust trend
(queries.tsdb_theil_sen) on hand-computed inputs."""

import datetime as dt
import math

from pyspark.sql import functions as F

from gnocchi_spark.operators.drift import ks_two_sample, psi_report


def _m(spark, rows):
    return spark.createDataFrame(rows, "metric_id string, ts timestamp, value double")


def ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


class TestPsi:
    def test_identical_halves_zero(self, spark):
        # same value multiset in both halves -> p == q in every bin ->
        # every term is exactly 0.0
        rows = [("m", ts(i), float(v)) for i, v in enumerate(range(1, 11))]
        rows += [("m", ts(11 + i), float(v)) for i, v in enumerate(range(1, 11))]
        out = psi_report(_m(spark, rows)).collect()
        assert len(out) == 1
        assert out[0]["n_ref"] == 10 and out[0]["n_cur"] == 10
        assert out[0]["psi"] == 0.0

    def test_shift_detected_and_clamped(self, spark):
        # current window entirely above the reference grid: everything
        # clamps into the top bin and PSI goes strongly positive
        rows = [("m", ts(i), float(v)) for i, v in enumerate(range(1, 11))]
        rows += [("m", ts(11 + i), 100.0 + i) for i in range(10)]
        out = psi_report(_m(spark, rows)).collect()[0]
        assert out["psi"] > 1.0

    def test_constant_reference_single_bin(self, spark):
        # hi == lo in the reference: everything lands in bin 0, PSI
        # still finite (smoothing) and zero when cur is constant too
        rows = [("m", ts(i), 5.0) for i in range(10)]
        rows += [("m", ts(11 + i), 5.0) for i in range(10)]
        assert psi_report(_m(spark, rows)).collect()[0]["psi"] == 0.0


class TestKs:
    def test_identical_halves_zero(self, spark):
        rows = [("m", ts(i), float(i % 5)) for i in range(10)]
        rows += [("m", ts(11 + i), float(i % 5)) for i in range(10)]
        assert ks_two_sample(_m(spark, rows)).collect()[0]["ks_stat"] == 0.0

    def test_disjoint_supports_one(self, spark):
        rows = [("m", ts(i), 0.0) for i in range(5)]
        rows += [("m", ts(11 + i), 1.0) for i in range(5)]
        assert ks_two_sample(_m(spark, rows)).collect()[0]["ks_stat"] == 1.0

    def test_hand_computed_supremum(self, spark):
        # ref {1, 2}, cur {2, 3}: F diverges most by 1/2
        rows = [("m", ts(0), 1.0), ("m", ts(1), 2.0)]
        rows += [("m", ts(11), 2.0), ("m", ts(12), 3.0)]
        out = ks_two_sample(_m(spark, rows)).collect()[0]
        assert out["ks_stat"] == 0.5
        assert out["n_ref"] == 2 and out["n_cur"] == 2


class TestBigramLm:
    def test_hand_computed_smoothed_probs(self, spark):
        from gnocchi_spark.operators.retrieval import bigram_lm_score

        docs = spark.createDataFrame(
            [(1, "a b a b")], "doc_id long, text string"
        )
        out = bigram_lm_score(docs).collect()[0]
        # bigrams: (a,b) x2, (b,a) x1; contexts: a->2, b->1; V=2, k=0.5
        want_nll = -(
            2 * math.log(2.5 / 3.0) + math.log(1.5 / 2.0)
        ) / 3.0
        assert out["n_bigrams"] == 3
        assert abs(out["nll"] - want_nll) < 1e-6

    def test_word_salad_scores_worse(self, spark):
        # shuffled tokens break every frequent bigram; same unigram
        # profile, much higher bigram perplexity
        from gnocchi_spark.operators.retrieval import bigram_lm_score

        fluent = "the cat sat on the mat " * 5
        salad = "the the cat on sat mat the cat the on sat mat " * 2 + "mat sat on"
        docs = spark.createDataFrame(
            [(1, fluent), (2, salad)], "doc_id long, text string"
        )
        got = {r["doc_id"]: r["ppl"] for r in bigram_lm_score(docs).collect()}
        assert got[2] > got[1]


class TestTheilSen:
    def test_perfect_line_recovered(self, spark, sf_dir):
        # the registered query path on real data must return one row
        # per metric with finite stats (smoke via registry)
        from gnocchi_spark.queries import QUERIES

        out = QUERIES["tsdb_theil_sen"](spark, sf_dir).collect()
        assert len(out) >= 1
        assert all(r["n_points"] >= 2 for r in out)

    def test_outlier_robustness(self, spark):
        # v = 2h + 5 with one wild outlier: the median slope stays 2
        from gnocchi_spark.operators.rollup import rollup_wide

        rows = [("m", dt.datetime(2024, 1, 1, h), 2.0 * h + 5.0) for h in range(9)]
        rows.append(("m", dt.datetime(2024, 1, 1, 9), 1000.0))
        meas = _m(spark, rows)
        r = rollup_wide(meas, ["mean"], 3600.0)
        h0 = r.groupBy("metric_id").agg(F.min("bucket_ts").alias("t0"))
        x = r.join(F.broadcast(h0), "metric_id").select(
            "metric_id",
            (
                (F.unix_micros("bucket_ts") - F.unix_micros("t0"))
                / F.lit(3600_000_000.0)
            ).alias("x"),
            F.col("mean").alias("v"),
        )
        b = x.select(
            F.col("metric_id").alias("m2"),
            F.col("x").alias("x2"),
            F.col("v").alias("v2"),
        )
        p = x.join(b, (x.metric_id == b.m2) & (x.x < b.x2)).select(
            "metric_id",
            ((F.col("v2") - F.col("v")) / (F.col("x2") - F.col("x"))).alias(
                "slope"
            ),
        )
        slope = p.groupBy("metric_id").agg(
            F.expr("percentile(slope, 0.5)").alias("s")
        ).collect()[0]["s"]
        assert abs(slope - 2.0) < 1e-9


class TestPsiFromBinCounts:
    def test_matches_batch_psi_on_shared_grid(self, spark):
        # when the reference window's [min, max] equals the fixed grid
        # bounds, the counter-table path must reproduce psi_report
        from gnocchi_spark.functions.sketches import fixed_bin_col
        from gnocchi_spark.operators.drift import psi_from_bin_counts

        # ref spans exactly [0, 1]; cur shifted upward
        ref_vals = [0.0, 0.1, 0.2, 0.35, 0.5, 0.55, 0.7, 0.8, 0.9, 1.0]
        cur_vals = [0.5, 0.55, 0.6, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95, 1.0]
        rows = [("m", ts(i), v) for i, v in enumerate(ref_vals)]
        rows += [("m", ts(11 + i), v) for i, v in enumerate(cur_vals)]
        m = _m(spark, rows)
        batch = psi_report(m).collect()[0]

        b = fixed_bin_col(F.col("value"), 0.0, 1.0, 10)
        def counts(vals):
            df = spark.createDataFrame(
                [("m", v) for v in vals], "metric_id string, value double"
            )
            return df.select("metric_id", b.alias("bin")).groupBy(
                "metric_id", "bin"
            ).agg(F.count("*").alias("cnt"))

        streamed = psi_from_bin_counts(counts(ref_vals), counts(cur_vals)).collect()[0]
        assert streamed["psi"] == batch["psi"]
        assert streamed["n_ref"] == batch["n_ref"] == 10

    def test_counters_merge_by_sum(self, spark):
        # two "finalized windows" of current counts merged by union
        # must give the same PSI as one combined window — the property
        # that lets the monitor serve from merged slices
        from gnocchi_spark.operators.drift import psi_from_bin_counts

        def cdf(rows):
            return spark.createDataFrame(rows, "metric_id string, bin int, cnt long")

        ref = cdf([("m", i, 10) for i in range(10)])
        w1 = cdf([("m", 0, 5), ("m", 1, 3)])
        w2 = cdf([("m", 0, 2), ("m", 9, 7)])
        combined = cdf([("m", 0, 7), ("m", 1, 3), ("m", 9, 7)])
        a = psi_from_bin_counts(ref, w1.unionByName(w2)).collect()[0]
        b = psi_from_bin_counts(ref, combined).collect()[0]
        assert a["psi"] == b["psi"] and a["n_cur"] == b["n_cur"] == 17

    def test_psi_affine_invariance(self, spark):
        # bins derive from the reference range, so an affine transform
        # applied to BOTH windows must not change PSI (power-of-two
        # scale + integer shift keeps the float math exact)
        base = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0, 8.0, 9.0]
        cur = [2.0, 2.0, 4.0, 6.0, 8.0, 9.0, 9.0, 9.0]
        def build(scale, shift):
            rows = [("m", ts(i), v * scale + shift) for i, v in enumerate(base)]
            rows += [
                ("m", ts(11 + i), v * scale + shift) for i, v in enumerate(cur)
            ]
            return psi_report(_m(spark, rows)).collect()[0]["psi"]
        assert build(1.0, 0.0) == build(4.0, 32.0)
