"""Unit tests for the as-of join and sessionization operators
(operators/asof.py) — semantics pinned against pandas.merge_asof
conventions: backward direction, <= inclusivity, tolerance, tie-breaks,
and the no-prior-row NULL case."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gnocchi_spark.operators.asof import asof_join, session_stats, sessionize


def ts(*a):
    return dt.datetime(*a)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", ts(2024, 1, 1, 10, 0, 0), 1),
            ("A", ts(2024, 1, 1, 10, 0, 5), 2),
            ("A", ts(2024, 1, 1, 9, 0, 0), 3),   # before any quote
            ("B", ts(2024, 1, 1, 10, 0, 0), 4),  # key with no quotes at all
        ],
        "sym string, ts timestamp, trade_id long",
    )
    quotes = spark.createDataFrame(
        [
            ("A", ts(2024, 1, 1, 9, 59, 0), 100.0, 1),
            ("A", ts(2024, 1, 1, 10, 0, 0), 101.0, 2),  # equal-ts: visible (<=)
            ("A", ts(2024, 1, 1, 10, 0, 0), 102.0, 3),  # tie: larger qid wins
            ("A", ts(2024, 1, 1, 10, 0, 4), 103.0, 4),
        ],
        "sym string, ts timestamp, px double, qid long",
    )
    return trades, quotes


def test_asof_backward_semantics(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, ["sym"], payload_cols=["px", "qid"], tie_col="qid"
    )
    got = {r["trade_id"]: (r["px"], r["qid"]) for r in out.collect()}
    assert got[1] == (102.0, 3)   # equal ts visible, max-tie wins
    assert got[2] == (103.0, 4)   # latest prior quote
    assert got[3] == (None, None)  # no quote yet
    assert got[4] == (None, None)  # key never quoted
    assert out.count() == trades.count()  # never multiplies rows


def test_asof_tolerance(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades,
        quotes,
        ["sym"],
        payload_cols=["px"],
        tie_col="qid",
        tolerance_seconds=1.0,
        matched_ts_col="qts",
    )
    got = {r["trade_id"]: (r["px"], r["qts"]) for r in out.collect()}
    assert got[1][0] == 102.0                       # 0s old: inside tolerance
    assert got[2] == (103.0, ts(2024, 1, 1, 10, 0, 4))  # 1.0s old == bound: kept
    assert got[3] == (None, None)                   # no match at all stays NULL
    # a tighter bound expires trade 2's 1.0s-old quote
    tight = asof_join(
        trades, quotes, ["sym"], payload_cols=["px"], tie_col="qid",
        tolerance_seconds=0.5,
    )
    tgot = {r["trade_id"]: r["px"] for r in tight.collect()}
    assert tgot[2] is None


def test_asof_single_shuffle_plan(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, ["sym"], payload_cols=["px"], tie_col="qid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union+window form: no join operator anywhere in the plan
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_sessionize_gap_boundaries(spark):
    ev = spark.createDataFrame(
        [
            (1, ts(2024, 1, 1, 0, 0, 0), 1.0, 1),
            (1, ts(2024, 1, 1, 0, 29, 59), 2.0, 2),   # 1799s: inside gap
            (1, ts(2024, 1, 1, 0, 59, 59), 3.0, 3),   # 1800s == gap: same session
            (1, ts(2024, 1, 1, 1, 29, 59), 4.0, 4),   # 1800s again: same
            (1, ts(2024, 1, 1, 2, 0, 0), 5.0, 5),     # 1801s: NEW session
            (2, ts(2024, 1, 1, 0, 0, 0), 6.0, 6),     # other key independent
        ],
        "user_id long, ts timestamp, value double, event_id long",
    )
    s = sessionize(ev, ["user_id"], gap_seconds=1800, tie_col="event_id")
    got = {r["event_id"]: r["session_id"] for r in s.collect()}
    assert got[1] == got[2] == got[3] == got[4] == 1  # gaps == 1800s stay
    assert got[5] == 2
    assert got[6] == 1

    stats = session_stats(
        ev, ["user_id"], gap_seconds=1800, value_col="value", tie_col="event_id"
    )
    rows = {(r["user_id"], r["session_id"]): r for r in stats.collect()}
    s1 = rows[(1, 1)]
    assert s1["n_events"] == 4 and s1["value_sum"] == 10.0
    assert s1["session_start"] == ts(2024, 1, 1, 0, 0, 0)
    assert s1["session_end"] == ts(2024, 1, 1, 1, 29, 59)
    assert s1["duration_s"] == 5399.0
    assert rows[(1, 2)]["n_events"] == 1


def test_sessionize_single_shuffle(spark):
    ev = spark.createDataFrame(
        [(1, ts(2024, 1, 1), 1.0, 1)],
        "user_id long, ts timestamp, value double, event_id long",
    )
    out = session_stats(ev, ["user_id"], value_col="value", tie_col="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # lag + running sum + groupBy all share the user_id partitioning
    assert plan.count("Exchange hashpartitioning") == 1


class TestIntervalJoinPairs:
    """Banded interval join: pairs with start_ts <= probe_ts < start_ts + W,
    verified against a brute-force cross join, including pairs that
    straddle a bucket boundary (the explode-to-two-buckets case)."""

    @pytest.fixture(scope="class")
    def frames(self, spark):
        base = dt.datetime(2024, 1, 1)

        def at(sec, us=0):
            return base + dt.timedelta(seconds=sec, microseconds=us)

        starts = spark.createDataFrame(
            [
                (1, 10, at(0)),       # bucket 0; window [0, 60)
                (2, 10, at(55)),      # straddles buckets 0/1
                (3, 10, at(120)),     # empty window
                (4, 20, at(0)),       # other key
            ],
            "sid long, k long, ts timestamp",
        )
        probes = spark.createDataFrame(
            [
                (100, 10, at(0)),            # == start 1 ts (inclusive)
                (101, 10, at(59, 999999)),   # last us of start 1's window
                (102, 10, at(60)),           # exactly W after start 1: OUT,
                                             # but IN start 2's window
                (103, 10, at(114, 999999)),  # last us of start 2's window
                (104, 10, at(115)),          # first us past it: OUT
                (105, 20, at(30)),           # matches start 4 only (key)
                (106, 30, at(10)),           # key matches nothing
            ],
            "pid long, k long, ts timestamp",
        )
        return starts, probes

    def test_matches_brute_force(self, spark, frames):
        from gnocchi_spark.operators.asof import interval_join_pairs

        starts, probes = frames
        got = sorted(
            (r["sid"], r["p_pid"])
            for r in interval_join_pairs(
                starts, probes, ["k"], 60.0
            ).collect()
        )
        brute = sorted(
            (s["sid"], p["pid"])
            for s in starts.collect()
            for p in probes.collect()
            if s["k"] == p["k"]
            and s["ts"] <= p["ts"] < s["ts"] + dt.timedelta(seconds=60)
        )
        assert got == brute
        assert (1, 100) in got and (1, 101) in got      # inclusive lower
        assert (1, 102) not in got                       # exclusive upper
        assert (2, 102) in got and (2, 103) in got       # cross-bucket
        assert (2, 104) not in got
        assert all(s != 3 for s, _ in got)               # empty window

    def test_no_duplicate_pairs_from_band_explode(self, spark, frames):
        from gnocchi_spark.operators.asof import interval_join_pairs

        starts, probes = frames
        pairs = interval_join_pairs(starts, probes, ["k"], 60.0)
        n = pairs.count()
        assert pairs.select("sid", "p_pid").distinct().count() == n
