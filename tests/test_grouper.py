"""History-aware group-by golden tests.

Scenarios ported from gnocchi/tests/test_measures_grouper.py: resources
with a constant 100-valued hourly series and mid-window flavor changes;
expected per-group date->value dicts are asserted verbatim
(:146-208 two resources, :250-285 flavor changes within one hour).
"""

import datetime as dt

import pytest
from pyspark.sql import Row

from gnocchi_spark.operators.grouper import history_grouped_aggregate


def _ts(*args):
    return dt.datetime(*args)


def _hourly_series(spark, resource_ids, start, end, value=100.0):
    rows = []
    for rid in resource_ids:
        t = start
        while t < end:
            rows.append(Row(resource_id=rid, bucket_ts=t, value=value))
            t += dt.timedelta(hours=1)
    return spark.createDataFrame(rows)


def _revs(spark, rows):
    return spark.createDataFrame(
        list(rows),
        schema="resource_id long, revision_start timestamp, "
        "revision_end timestamp, flavor_name string",
    )


def test_flavor_changes_within_hour(spark):
    # test_group_measures_changing_flavors_in_a_hour (:250-285)
    start, end = _ts(2020, 3, 10, 10), _ts(2020, 3, 10, 12)
    measures = _hourly_series(spark, [1], start, end)
    revs = _revs(
        spark,
        [
            (1, _ts(2020, 3, 10, 10, 0), _ts(2020, 3, 10, 10, 30), "1gb-mem"),
            (1, _ts(2020, 3, 10, 10, 30), _ts(2020, 3, 10, 10, 45), "2gb-mem"),
            (1, _ts(2020, 3, 10, 10, 45), None, "1gb-mem"),
        ],
    )
    out = history_grouped_aggregate(
        measures, revs, ["flavor_name"], 3600.0, start=start, stop=end
    )
    rows = {(r["flavor_name"], r["bucket_ts"]): r["value"] for r in out.collect()}
    assert rows == {
        ("1gb-mem", _ts(2020, 3, 10, 10)): pytest.approx(75.0),
        ("1gb-mem", _ts(2020, 3, 10, 11)): pytest.approx(100.0),
        ("2gb-mem", _ts(2020, 3, 10, 10)): pytest.approx(25.0),
    }


def test_two_resources_two_hours(spark):
    # test_group_measures_changing_over_two_hours_with_more_than_one_resource
    # (:146-208), grouped by (flavor_name, resource id)
    start, end = _ts(2020, 3, 10, 10), _ts(2020, 3, 10, 12)
    measures = _hourly_series(spark, [1, 2], start, end)
    revs = _revs(
        spark,
        [
            (1, _ts(2020, 3, 10, 9, 0), _ts(2020, 3, 10, 10, 30), "1gb-mem"),
            (1, _ts(2020, 3, 10, 10, 30), _ts(2020, 3, 10, 11, 30), "2gb-mem"),
            (1, _ts(2020, 3, 10, 11, 30), None, "1gb-mem"),
            (2, _ts(2020, 3, 10, 8, 0), _ts(2020, 3, 10, 11, 0), "1gb-mem"),
            (2, _ts(2020, 3, 10, 11, 0), None, "2gb-mem"),
        ],
    )
    out = history_grouped_aggregate(
        measures, revs, ["flavor_name", "resource_id"], 3600.0, start=start, stop=end
    )
    rows = {
        (r["flavor_name"], r["resource_id"], r["bucket_ts"]): r["value"]
        for r in out.collect()
    }
    assert rows == {
        ("1gb-mem", 1, _ts(2020, 3, 10, 10)): pytest.approx(50.0),
        ("1gb-mem", 1, _ts(2020, 3, 10, 11)): pytest.approx(50.0),
        ("1gb-mem", 2, _ts(2020, 3, 10, 10)): pytest.approx(100.0),
        ("2gb-mem", 1, _ts(2020, 3, 10, 10)): pytest.approx(50.0),
        ("2gb-mem", 1, _ts(2020, 3, 10, 11)): pytest.approx(50.0),
        ("2gb-mem", 2, _ts(2020, 3, 10, 11)): pytest.approx(100.0),
    }


def test_unbounded_window(spark):
    # no start/stop: first revision unbounded left, open revision right
    measures = _hourly_series(spark, [1], _ts(2020, 3, 10, 10), _ts(2020, 3, 10, 12))
    revs = _revs(spark, [(1, _ts(2020, 3, 10, 11, 0), None, "1gb-mem")])
    out = history_grouped_aggregate(measures, revs, ["flavor_name"], 3600.0)
    rows = {r["bucket_ts"]: r["value"] for r in out.collect()}
    # single revision == first revision -> search window unbounded
    assert rows == {
        _ts(2020, 3, 10, 10): pytest.approx(100.0),
        _ts(2020, 3, 10, 11): pytest.approx(100.0),
    }
