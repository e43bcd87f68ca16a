"""Golden-value tests for the aggregation kernels.

Inputs and expected outputs ported verbatim from the reference's
semantics spec: gnocchi/tests/test_carbonara.py:256-331 (the
13-point/3-bucket series) and the gabbi minimum slice
(gnocchi/tests/functional/gabbits/aggregation.yaml:10-80).
"""

import datetime as dt
import math

import pytest
from pyspark.sql import Row

from gnocchi_spark.operators.read import get_measures
from gnocchi_spark.operators.rollup import (
    dedup_last_write_wins,
    rollup,
    rollup_policy,
    rollup_wide,
)
from gnocchi_spark.policy import ArchivePolicy, ArchivePolicyItem


def _ts(*args):
    return dt.datetime(*args)


@pytest.fixture(scope="module")
def carbonara_series(spark):
    # test_carbonara.py:258-272 — 13 points across 3 one-minute buckets.
    pts = [
        (_ts(2014, 1, 1, 12, 0, 0), 3.0),
        (_ts(2014, 1, 1, 12, 0, 10), 5.0),
        (_ts(2014, 1, 1, 12, 0, 20), 2.0),
        (_ts(2014, 1, 1, 12, 0, 30), 3.0),
        (_ts(2014, 1, 1, 12, 0, 40), 5.0),
        (_ts(2014, 1, 1, 12, 1, 0), 8.0),
        (_ts(2014, 1, 1, 12, 1, 10), 11.0),
        (_ts(2014, 1, 1, 12, 1, 20), 22.0),
        (_ts(2014, 1, 1, 12, 1, 30), 10.0),
        (_ts(2014, 1, 1, 12, 1, 40), 42.0),
        (_ts(2014, 1, 1, 12, 1, 50), 9.0),
        (_ts(2014, 1, 1, 12, 2, 0), 4.0),
        (_ts(2014, 1, 1, 12, 2, 10), 2.0),
    ]
    return spark.createDataFrame(
        [Row(metric_id="m1", ts=t, value=v, seq=i) for i, (t, v) in enumerate(pts)]
    )


# (method, bucket0, bucket1, bucket2) from test_carbonara.py:280-331
GOLDEN = [
    ("first", 3, 8, 4),
    ("last", 5, 9, 2),
    ("count", 5, 6, 2),
    ("sum", 18, 102, 6),
    ("mean", 3.6, 17, 3),
    ("median", 3.0, 10.5, 3),
    ("50pct", 3.0, 10.5, 3),
    ("56pct", 3.4800000000000004, 10.8, 3.120000000000001),
    ("min", 2, 8, 2),
    ("max", 5, 42, 4),
    ("std", 1.3416407864998738, 13.266499161421599, 1.4142135623730951),
]


@pytest.mark.parametrize("method,v1,v2,v3", GOLDEN)
def test_aggregation_golden(carbonara_series, method, v1, v2, v3):
    out = rollup(carbonara_series, [method], 60.0, seq_col="seq")
    rows = {r["bucket_ts"]: r["value"] for r in out.collect()}
    assert len(rows) == 3
    assert rows[_ts(2014, 1, 1, 12, 0, 0)] == pytest.approx(v1, rel=1e-12)
    assert rows[_ts(2014, 1, 1, 12, 1, 0)] == pytest.approx(v2, rel=1e-12)
    assert rows[_ts(2014, 1, 1, 12, 2, 0)] == pytest.approx(v3, rel=1e-12)


def test_percentile_interpolation(spark):
    # test_carbonara.py:243-253 — 95pct of [3,5,6] is 5.9 (linear interp).
    df = spark.createDataFrame(
        [
            Row(metric_id="m", ts=_ts(2014, 1, 1, 12, 0, 0), value=3.0),
            Row(metric_id="m", ts=_ts(2014, 1, 1, 12, 0, 4), value=5.0),
            Row(metric_id="m", ts=_ts(2014, 1, 1, 12, 0, 9), value=6.0),
        ]
    )
    out = rollup(df, ["95pct", "74pct"], 60.0).collect()
    vals = {r["method"]: r["value"] for r in out}
    assert vals["95pct"] == pytest.approx(5.9)
    assert vals["74pct"] == pytest.approx(5.48)


def test_std_single_point_suppressed(spark):
    # test_carbonara.py:315-331 — std of a 1-point bucket is dropped.
    df = spark.createDataFrame(
        [
            Row(metric_id="m", ts=_ts(2014, 1, 1, 12, 0, 0), value=3.0),
            Row(metric_id="m", ts=_ts(2014, 1, 1, 12, 0, 4), value=6.0),
            Row(metric_id="m", ts=_ts(2014, 1, 1, 12, 0, 9), value=5.0),
            Row(metric_id="m", ts=_ts(2014, 1, 1, 12, 1, 6), value=9.0),
        ]
    )
    rows = rollup(df, ["std"], 60.0).collect()
    assert len(rows) == 1  # the single-point 12:01 bucket is suppressed
    assert rows[0]["bucket_ts"] == _ts(2014, 1, 1, 12, 0, 0)
    assert rows[0]["value"] == pytest.approx(1.5275252316519465)


def test_rate_mean(spark):
    # rate:mean — diff consecutive raw values then average per bucket
    # (carbonara.py:212-221).
    df = spark.createDataFrame(
        [
            Row(metric_id="m", ts=_ts(2014, 1, 1, 12, 0, 0), value=1.0),
            Row(metric_id="m", ts=_ts(2014, 1, 1, 12, 0, 10), value=3.0),
            Row(metric_id="m", ts=_ts(2014, 1, 1, 12, 0, 20), value=6.0),
            Row(metric_id="m", ts=_ts(2014, 1, 1, 12, 1, 0), value=10.0),
        ]
    )
    rows = {r["bucket_ts"]: r["value"] for r in rollup(df, ["rate:mean"], 60.0).collect()}
    # bucket0 diffs: (3-1)=2, (6-3)=3 -> mean 2.5; bucket1 diff: (10-6)=4
    assert rows[_ts(2014, 1, 1, 12, 0, 0)] == pytest.approx(2.5)
    assert rows[_ts(2014, 1, 1, 12, 1, 0)] == pytest.approx(4.0)


def test_rate_counter_reset_golden(spark):
    # test_carbonara.py:161-187 test_derived_mean — rate:mean over 12
    # points incl. a counter reset (105 -> 5 gives a -100 diff).
    stamps = [
        (12, 0, 0), (12, 0, 4), (12, 1, 2), (12, 1, 14), (12, 1, 24),
        (12, 2, 4), (12, 2, 35), (12, 2, 42), (12, 3, 2), (12, 3, 22),
        (12, 3, 42), (12, 4, 9),
    ]
    values = [50, 55, 65, 66, 70, 83, 92, 103, 105, 5, 7, 23]
    df = spark.createDataFrame(
        [
            Row(metric_id="m", ts=_ts(2014, 1, 1, h, m, s), value=float(v))
            for (h, m, s), v in zip(stamps, values)
        ]
    )
    rows = {r["bucket_ts"]: r["value"] for r in rollup(df, ["rate:mean"], 60.0).collect()}
    assert rows == {
        _ts(2014, 1, 1, 12, 0, 0): pytest.approx(5.0),
        _ts(2014, 1, 1, 12, 1, 0): pytest.approx(5.0),
        _ts(2014, 1, 1, 12, 2, 0): pytest.approx(11.0),
        _ts(2014, 1, 1, 12, 3, 0): pytest.approx(-32.0),
        _ts(2014, 1, 1, 12, 4, 0): pytest.approx(16.0),
    }


def test_rate_hole_golden(spark):
    # test_carbonara.py:189-212 test_derived_hole — rate:last with a
    # missing 12:02 bucket; the diff spans the hole (70 -> 105 = 35)
    # and lands in the later point's bucket.
    stamps = [
        (12, 0, 0), (12, 0, 4), (12, 1, 2), (12, 1, 14), (12, 1, 24),
        (12, 3, 2), (12, 3, 22), (12, 3, 42), (12, 4, 9),
    ]
    values = [50, 55, 65, 66, 70, 105, 108, 200, 202]
    df = spark.createDataFrame(
        [
            Row(metric_id="m", ts=_ts(2014, 1, 1, h, m, s), value=float(v))
            for (h, m, s), v in zip(stamps, values)
        ]
    )
    rows = {r["bucket_ts"]: r["value"] for r in rollup(df, ["rate:last"], 60.0).collect()}
    assert rows == {
        _ts(2014, 1, 1, 12, 0, 0): pytest.approx(5.0),
        _ts(2014, 1, 1, 12, 1, 0): pytest.approx(4.0),
        _ts(2014, 1, 1, 12, 3, 0): pytest.approx(92.0),
        _ts(2014, 1, 1, 12, 4, 0): pytest.approx(2.0),
    }


def test_dedup_last_write_wins(spark):
    # carbonara.py:92-105 — duplicate timestamps: latest arrival wins.
    df = spark.createDataFrame(
        [
            Row(metric_id="m", ts=_ts(2014, 1, 1), value=1.0, seq=0),
            Row(metric_id="m", ts=_ts(2014, 1, 1), value=9.0, seq=1),
            Row(metric_id="m", ts=_ts(2014, 1, 2), value=2.0, seq=2),
        ]
    )
    rows = sorted(
        dedup_last_write_wins(df, seq_col="seq").collect(), key=lambda r: r["ts"]
    )
    assert [r["value"] for r in rows] == [9.0, 2.0]


def test_minimum_slice_gabbi_aggregation(spark):
    """gabbits/aggregation.yaml:10-80 — 'low' policy [1 s, 300 s],
    measures (14:33:57, 43.1), (14:34:12, 12); mean rollups at both
    granularities."""
    policy = ArchivePolicy(
        "low",
        0,
        (ArchivePolicyItem(1.0, points=3600), ArchivePolicyItem(300.0, points=10000)),
        frozenset(["mean"]),
    )
    df = spark.createDataFrame(
        [
            Row(metric_id="metric1", ts=_ts(2015, 3, 6, 14, 33, 57), value=43.1),
            Row(metric_id="metric1", ts=_ts(2015, 3, 6, 14, 34, 12), value=12.0),
        ]
    )
    rollups = rollup_policy(df, policy)
    fine = {
        r["bucket_ts"]: r["value"]
        for r in get_measures(rollups, "metric1", "mean", 1.0).collect()
    }
    assert fine == {
        _ts(2015, 3, 6, 14, 33, 57): pytest.approx(43.1),
        _ts(2015, 3, 6, 14, 34, 12): pytest.approx(12.0),
    }
    coarse = {
        r["bucket_ts"]: r["value"]
        for r in get_measures(rollups, "metric1", "mean", 300.0).collect()
    }
    assert coarse == {_ts(2015, 3, 6, 14, 30, 0): pytest.approx((43.1 + 12.0) / 2)}


def test_cascade_matches_direct(spark, carbonara_series):
    """The cascading multi-granularity path must agree with direct
    computation from raw for every mergeable method."""
    policy = ArchivePolicy(
        "p",
        0,
        (ArchivePolicyItem(60.0, points=100), ArchivePolicyItem(300.0, points=100)),
        frozenset(["mean", "sum", "min", "max", "count", "std", "first", "last"]),
    )
    direct = rollup_policy(carbonara_series, policy, seq_col="seq", cascade=False)
    cascade = rollup_policy(carbonara_series, policy, seq_col="seq", cascade=True)
    d = {(r["method"], r["granularity"], r["bucket_ts"]): r["value"] for r in direct.collect()}
    c = {(r["method"], r["granularity"], r["bucket_ts"]): r["value"] for r in cascade.collect()}
    assert set(d) == set(c)
    for k, v in d.items():
        assert c[k] == pytest.approx(v, rel=1e-9), k


def test_cascade_non_nested_granularity(spark, carbonara_series):
    """A coarse granularity that is NOT an integer multiple of the finest
    (60 s vs 90 s) cannot fold fine partials — 90 s buckets straddle 60 s
    boundaries.  The policy path must fall back to direct rollup there
    and still agree with independent computation (the reference computes
    every granularity independently, storage/__init__.py:583-692)."""
    policy = ArchivePolicy(
        "p",
        0,
        (ArchivePolicyItem(60.0, points=100), ArchivePolicyItem(90.0, points=100)),
        frozenset(["mean", "sum", "count", "std", "first", "last"]),
    )
    direct = rollup_policy(carbonara_series, policy, seq_col="seq", cascade=False)
    cascade = rollup_policy(carbonara_series, policy, seq_col="seq", cascade=True)
    d = {(r["method"], r["granularity"], r["bucket_ts"]): r["value"] for r in direct.collect()}
    c = {(r["method"], r["granularity"], r["bucket_ts"]): r["value"] for r in cascade.collect()}
    assert set(d) == set(c)
    for k, v in d.items():
        assert c[k] == pytest.approx(v, rel=1e-9), k
    # sanity: 90 s buckets really do straddle (12:00:00 and 12:01:30 starts)
    assert _ts(2014, 1, 1, 12, 1, 30) in {k[2] for k in d if k[1] == "90"}


def test_cascade_std_large_offset_stable(spark):
    """Catastrophic-cancellation guard: values 1e9 + [0,1,2] make the
    textbook sqrt((ssq - s^2/cnt)/(cnt-1)) form go negative under the
    sqrt in fp64.  The (count, mean, M2) Chan-merge partials must return
    the true sample std (= 1.0) at both cascade levels."""
    pts = [
        (_ts(2014, 1, 1, 12, 0, 0), 1e9 + 0.0),
        (_ts(2014, 1, 1, 12, 0, 20), 1e9 + 1.0),
        (_ts(2014, 1, 1, 12, 0, 40), 1e9 + 2.0),
        (_ts(2014, 1, 1, 12, 1, 0), 1e9 + 0.0),
        (_ts(2014, 1, 1, 12, 1, 20), 1e9 + 1.0),
        (_ts(2014, 1, 1, 12, 1, 40), 1e9 + 2.0),
    ]
    df = spark.createDataFrame([Row(metric_id="m", ts=t, value=v) for t, v in pts])
    policy = ArchivePolicy(
        "p",
        0,
        (ArchivePolicyItem(60.0, points=100), ArchivePolicyItem(300.0, points=100)),
        frozenset(["std"]),
    )
    rows = {
        (r["granularity"], r["bucket_ts"]): r["value"]
        for r in rollup_policy(df, policy).collect()
    }
    assert rows[("60", _ts(2014, 1, 1, 12, 0, 0))] == pytest.approx(1.0, rel=1e-6)
    assert rows[("60", _ts(2014, 1, 1, 12, 1, 0))] == pytest.approx(1.0, rel=1e-6)
    # merged 300 s bucket: std of [0,1,2,0,1,2]+1e9 = sqrt(4/5)
    assert rows[("300", _ts(2014, 1, 1, 12, 0, 0))] == pytest.approx(
        math.sqrt(4 / 5), rel=1e-6
    )


def test_resample_read(spark, carbonara_series):
    # resample 60 s means to 180 s: mean of means (carbonara.py:594-598).
    rollups = rollup(carbonara_series, ["mean"], 60.0)
    rows = get_measures(rollups, "m1", "mean", 60.0, resample=180.0).collect()
    assert len(rows) == 1
    assert rows[0]["value"] == pytest.approx((3.6 + 17 + 3) / 3)


def test_calendar_granularity(spark):
    df = spark.createDataFrame(
        [
            Row(metric_id="m", ts=_ts(2015, 1, 15), value=1.0),
            Row(metric_id="m", ts=_ts(2015, 3, 15), value=3.0),
            Row(metric_id="m", ts=_ts(2015, 8, 15), value=5.0),
        ]
    )
    # half-year buckets (calendar.py:61-66)
    rows = {r["bucket_ts"]: r["value"] for r in rollup(df, ["sum"], "H").collect()}
    assert rows == {_ts(2015, 1, 1): 4.0, _ts(2015, 7, 1): 5.0}
    # monthly
    rows = {r["bucket_ts"]: r["value"] for r in rollup(df, ["count"], "M").collect()}
    assert rows == {_ts(2015, 1, 1): 1.0, _ts(2015, 3, 1): 1.0, _ts(2015, 8, 1): 1.0}


def test_resample_calendar_gabbi_scenario(spark):
    """Full port of gnocchi/tests/functional/gabbits/resample-calendar.yaml:
    seven measures rolled up at 1 day, then read-time calendar resample
    for Y/H/Q/M/W with the scenario's exact expected buckets (the W
    expectations pin the reference's SUNDAY-start weeks: 2015-03-01 is
    a Sunday)."""
    from gnocchi_spark.operators.read import resample_rollup

    measures = spark.createDataFrame(
        [
            Row(metric_id="m", ts=_ts(2015, 3, 1, 14, 34, 12), value=10.0),
            Row(metric_id="m", ts=_ts(2015, 3, 6, 14, 34, 12), value=12.0),
            Row(metric_id="m", ts=_ts(2015, 4, 1, 14, 34, 12), value=2.0),
            Row(metric_id="m", ts=_ts(2015, 4, 6, 14, 34, 12), value=4.0),
            Row(metric_id="m", ts=_ts(2015, 10, 6, 14, 34, 12), value=7.0),
            Row(metric_id="m", ts=_ts(2016, 1, 6, 14, 34, 12), value=12.0),
            Row(metric_id="m", ts=_ts(2016, 2, 6, 14, 34, 12), value=4.0),
        ]
    )
    daily = rollup(measures, ["mean"], 86400.0)
    got_daily = {
        r["bucket_ts"]: r["value"] for r in daily.collect()
    }
    assert got_daily == {
        _ts(2015, 3, 1): 10.0,
        _ts(2015, 3, 6): 12.0,
        _ts(2015, 4, 1): 2.0,
        _ts(2015, 4, 6): 4.0,
        _ts(2015, 10, 6): 7.0,
        _ts(2016, 1, 6): 12.0,
        _ts(2016, 2, 6): 4.0,
    }

    expected = {
        "Y": {_ts(2015, 1, 1): 7.0, _ts(2016, 1, 1): 8.0},
        "H": {
            _ts(2015, 1, 1): 7.0,
            _ts(2015, 7, 1): 7.0,
            _ts(2016, 1, 1): 8.0,
        },
        "Q": {
            _ts(2015, 1, 1): 11.0,
            _ts(2015, 4, 1): 3.0,
            _ts(2015, 10, 1): 7.0,
            _ts(2016, 1, 1): 8.0,
        },
        "M": {
            _ts(2015, 3, 1): 11.0,
            _ts(2015, 4, 1): 3.0,
            _ts(2015, 10, 1): 7.0,
            _ts(2016, 1, 1): 12.0,
            _ts(2016, 2, 1): 4.0,
        },
        "W": {
            _ts(2015, 3, 1): 11.0,
            _ts(2015, 3, 29): 2.0,
            _ts(2015, 4, 5): 4.0,
            _ts(2015, 10, 4): 7.0,
            _ts(2016, 1, 3): 12.0,
            _ts(2016, 1, 31): 4.0,
        },
    }
    for period, want in expected.items():
        got = {
            r["bucket_ts"]: r["value"]
            for r in resample_rollup(daily, "mean", period).collect()
        }
        assert got == want, f"calendar resample {period}"


def test_rate_derived_gabbi_scenario(spark):
    """Port of gnocchi/tests/functional/gabbits/metric-derived.yaml:
    18 monotone-ish measures at 1-minute granularity; rate:mean,
    rate:95pct, rate:max and plain max with the scenario's exact
    expected per-bucket values (rate pre-diffs via lag, so the first
    raw point contributes no rate sample)."""
    vals = [
        ("14:33:00", 10), ("14:34:10", 13), ("14:34:20", 13),
        ("14:34:30", 15), ("14:34:40", 18), ("14:34:50", 20),
        ("14:35:00", 22), ("14:35:10", 26), ("14:35:20", 30),
        ("14:35:30", 31), ("14:35:40", 37), ("14:35:50", 55),
        ("14:36:00", 62), ("14:36:10", 100), ("14:36:20", 102),
        ("14:36:30", 103), ("14:36:40", 104), ("14:36:50", 110),
    ]
    measures = spark.createDataFrame(
        [
            Row(
                metric_id="m",
                ts=dt.datetime(2015, 3, 6, *map(int, hms.split(":"))),
                value=float(v),
            )
            for hms, v in vals
        ]
    )
    expected = {
        "rate:mean": {
            _ts(2015, 3, 6, 14, 34): 2.0,
            _ts(2015, 3, 6, 14, 35): 5.833333333333333,
            _ts(2015, 3, 6, 14, 36): 9.166666666666666,
        },
        "rate:95pct": {
            _ts(2015, 3, 6, 14, 34): 3.0,
            _ts(2015, 3, 6, 14, 35): 15.0,
            _ts(2015, 3, 6, 14, 36): 30.25,
        },
        "rate:max": {
            _ts(2015, 3, 6, 14, 34): 3.0,
            _ts(2015, 3, 6, 14, 35): 18.0,
            _ts(2015, 3, 6, 14, 36): 38.0,
        },
        "max": {
            _ts(2015, 3, 6, 14, 33): 10.0,
            _ts(2015, 3, 6, 14, 34): 20.0,
            _ts(2015, 3, 6, 14, 35): 55.0,
            _ts(2015, 3, 6, 14, 36): 110.0,
        },
    }
    for method, want in expected.items():
        got = {
            r["bucket_ts"]: r["value"]
            for r in rollup(measures, [method], 60.0).collect()
        }
        assert got == pytest.approx(want), f"method {method}"
