"""Semantic corners of the visualization-downsampling and SLO-alert
queries that the oracle equality alone doesn't pin: LTTB must select
the visually significant point, and the burn-rate alert must require
BOTH windows to breach."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def _t(h, m, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_lttb_selects_spike_point(spark, tmp_path, monkeypatch):
    # three hourly buckets of a flat series with one spike in the
    # middle bucket: the interior pick must be the spike, and the
    # edge buckets contribute their first/last points.
    from gnocchi_spark import queries, tables

    rows = []
    eid = 0
    for h in (0, 1, 2):
        for m in (0, 10, 20, 30, 40, 50):
            v = 100.0 if (h == 1 and m == 30) else 1.0
            rows.append((eid, _t(h, m), 1, "m", v, "{}"))
            eid += 1
    df = _ev(spark, rows)
    monkeypatch.setattr(tables, "load", lambda spark_, sf, name: df)
    out = queries.tsdb_lttb_downsample(spark, "ignored")
    got = {(r["ts"], r["value"]) for r in out.collect()}
    assert (_t(1, 30), 100.0) in got            # the spike wins its bucket
    assert (_t(0, 0), 1.0) in got               # first point of first bucket
    assert (_t(2, 50), 1.0) in got              # last point of last bucket
    # one interior pick for the middle bucket only, plus two edges
    assert len(got) == 3


def test_mad_score_resists_its_own_outlier(spark, monkeypatch):
    # the point of MAD over mean/std: a single extreme spike inflates
    # the classic std (shrinking its own z) but cannot move the
    # median-of-deviations.  One event per hourly bucket, values
    # cycling 1..5 plus one 100.0 spike: the spike's robust z must
    # exceed the classic z computed over the same series.
    import statistics

    from gnocchi_spark import queries, tables

    vals = [float(i % 5 + 1) for i in range(24)]
    vals[12] = 100.0
    rows = [
        (i, dt.datetime(2024, 1, 1 + h // 24, h % 24), 1, "m", v, "{}")
        for i, (h, v) in enumerate(zip(range(24), vals))
    ]
    df = _ev(spark, rows)
    monkeypatch.setattr(tables, "load", lambda spark_, sf, name: df)
    out = {r["v"]: r["robust_z"] for r in
           queries.tsdb_mad_anomalies(spark, "ignored").collect()}
    classic_z = (100.0 - statistics.mean(vals)) / statistics.stdev(vals)
    assert out[100.0] > 3.5          # the spike pages under the MAD rule
    assert out[100.0] > classic_z    # ...and scores higher than mean/std z
    assert abs(out[2.0]) < 3.5       # inliers stay quiet


def test_slo_alert_requires_both_windows(spark, monkeypatch):
    # hour 0: one terrible 5m bucket inside an otherwise healthy hour
    # -> slow window stays under threshold -> NO alert (blip
    # suppression).  hour 1: sustained errors -> both windows breach
    # -> alert rows for the bad 5m buckets.
    from gnocchi_spark import queries, tables

    rows, eid = [], 0
    # hour 0: 12 buckets, bucket 0 is 100% errors, rest clean
    for b in range(12):
        for i in range(10):
            et = "error" if b == 0 else "click"
            rows.append((eid, _t(0, 5 * b, i), 1, et, 1.0, "{}"))
            eid += 1
    # hour 1: every bucket 60% errors (burn = 0.6/0.25 = 2.4 > 1.3)
    for b in range(12):
        for i in range(10):
            et = "error" if i < 6 else "click"
            rows.append((eid, _t(1, 5 * b, i), 1, et, 1.0, "{}"))
            eid += 1
    df = _ev(spark, rows)
    monkeypatch.setattr(tables, "load", lambda spark_, sf, name: df)
    out = queries.slo_burn_rate_alerts(spark, "ignored").collect()
    hours = {r["bucket_ts"].hour for r in out}
    assert hours == {1}                         # hour-0 blip suppressed
    assert len(out) == 12                       # every sustained 5m bucket pages
    assert all(abs(r["burn_fast"] - 2.4) < 1e-9 for r in out)
