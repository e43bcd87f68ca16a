"""Property-based invariants for the drift diagnostics and the Gini
concentration (hypothesis over small generated inputs; example counts
kept low because every example builds a Spark frame)."""

import datetime as dt

import pytest

# Extended fuzz/property-hunt tier (r13): excluded from the default
# fast run so the driver verify gate finishes; the full-tier gate
# (-m "slow or not slow") still runs it.
pytestmark = pytest.mark.slow

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from gnocchi_spark.operators.drift import ks_two_sample

_vals = st.lists(
    st.floats(
        min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
    ),
    min_size=2,
    max_size=8,
)


def _measures(spark, ref, cur):
    t0 = dt.datetime(2024, 1, 1)
    rows = [("m", t0 + dt.timedelta(seconds=i), float(v)) for i, v in enumerate(ref)]
    # the midpoint split is (tmin+tmax)//2: put cur well past the mid
    rows += [
        ("m", t0 + dt.timedelta(seconds=10_000 + i), float(v))
        for i, v in enumerate(cur)
    ]
    return spark.createDataFrame(
        rows, "metric_id string, ts timestamp, value double"
    )


class TestKsProperties:
    @settings(max_examples=8, deadline=None)
    @given(ref=_vals, cur=_vals)
    def test_bounded_zero_one(self, spark, ref, cur):
        ks = ks_two_sample(_measures(spark, ref, cur)).collect()[0]["ks_stat"]
        assert 0.0 <= ks <= 1.0

    @settings(max_examples=8, deadline=None)
    @given(vals=_vals)
    def test_identical_windows_zero(self, spark, vals):
        ks = ks_two_sample(_measures(spark, vals, vals)).collect()[0]["ks_stat"]
        assert ks == 0.0

    @settings(max_examples=8, deadline=None)
    @given(ref=_vals, cur=_vals)
    def test_disjoint_supports_are_maximal(self, spark, ref, cur):
        # shift cur entirely above ref: CDFs never overlap -> KS == 1
        hi = max(ref) + 1000.0
        shifted = [v + hi for v in cur]
        ks = ks_two_sample(_measures(spark, ref, shifted)).collect()[0][
            "ks_stat"
        ]
        assert ks == 1.0


class TestGiniProperties:
    def _gini_of_counts(self, spark, counts):
        from pyspark.sql import Window

        df = spark.createDataFrame(
            [("m", i, int(c)) for i, c in enumerate(counts)],
            "metric_id string, user_id long, x long",
        )
        w = Window.partitionBy("metric_id").orderBy("x", "user_id")
        r = df.select(
            "metric_id", "x", F.row_number().over(w).cast("long").alias("i")
        )
        s = r.groupBy("metric_id").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("tot"),
            F.sum(
                F.col("i").cast("decimal(38,0)")
                * F.col("x").cast("decimal(38,0)")
            ).alias("ix"),
        )
        return s.select(
            (
                (F.lit(2.0) * F.col("ix").cast("double"))
                / (F.col("n").cast("double") * F.col("tot").cast("double"))
                - (F.col("n").cast("double") + F.lit(1.0))
                / F.col("n").cast("double")
            ).alias("g")
        ).collect()[0]["g"]

    @settings(max_examples=8, deadline=None)
    @given(
        counts=st.lists(st.integers(min_value=1, max_value=50), min_size=2, max_size=8)
    )
    def test_bounded_and_permutation_invariant(self, spark, counts):
        g = self._gini_of_counts(spark, counts)
        n = len(counts)
        assert -1e-9 <= g <= (n - 1) / n + 1e-9
        g2 = self._gini_of_counts(spark, list(reversed(counts)))
        assert abs(g - g2) < 1e-9


class TestThresholdCurveProperties:
    """nb_threshold_curve vs a brute-force confusion matrix at every
    reported threshold (r10): binning may merge scores, but at each
    REPORTED threshold the cumulative counts must equal the exact
    'predict positive iff score >= threshold' confusion computed
    directly from the rows."""

    @settings(max_examples=8, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from([1, -1]),
                st.integers(min_value=-(10**9), max_value=10**9),
            ),
            min_size=1,
            max_size=24,
        ),
        n_bins=st.sampled_from([1, 4, 64]),
    )
    def test_matches_bruteforce_confusion(self, spark, rows, n_bins):
        from gnocchi_spark.operators.pipeline import nb_threshold_curve

        df = spark.createDataFrame(rows, "label int, score long")
        curve = nb_threshold_curve(df, n_bins=n_bins).collect()
        assert curve  # at least one observed bin
        P = sum(1 for l, _ in rows if l == 1)
        N = len(rows) - P
        for r in curve:
            t = r["threshold"]
            tp = sum(1 for l, s in rows if l == 1 and s >= t)
            fp = sum(1 for l, s in rows if l == -1 and s >= t)
            assert (r["tp"], r["fp"]) == (tp, fp), (t, r)
            assert r["fn"] == P - tp and r["tn"] == N - fp
            assert r["n_pos"] + r["n_neg"] >= 1
        # the loosest reported threshold is the observed minimum score:
        # everything is admitted
        last = min(curve, key=lambda r: r["bin"])
        assert last["threshold"] == min(s for _, s in rows)
        assert last["tp"] == P and last["fp"] == N
