"""Property-based differential fuzzing of the history-aware grouper.

r12, VERDICT r11 next #2: the time-weighted history group-by
(operators/grouper.py) was golden-corpus-only.  Hypothesis generates
random revision histories — adjacent chains, gaps, overlaps,
zero-length revisions, open (NULL) revision ends, revisions straddling
or wholly outside the query window, unset start/stop — plus random
per-resource measure series, and every case is checked against an
independent DuckDB interval-join translation of the REFERENCE
semantics (not of the compiler under test):

- ``create_history_period_filter`` (rest/aggregates/api.py:278-299):
  when BOTH start and stop are set, only revisions overlapping
  [start, stop) are retrieved — and ``is_first`` ranks AFTER that
  filter (api.py:325-343).  This fuzz found the gap: the operator
  previously ranked unfiltered revisions.
- ``truncate_resource_time_window`` (api.py:355-377): first retrieved
  revision opens to the query start (possibly NULL = unbounded);
  later revisions take max(revision_start, start); search_end is
  min(revision_end, stop) with NULLs propagating as unbounded.
- measure fetch (carbonara.py:809-823): buckets with
  ``bucket_ts >= round_down(search_start, g)`` and
  ``bucket_ts < search_end`` — the oracle uses this FLOOR formulation
  verbatim, deliberately different from the Spark join's
  ``bucket_end > search_start`` form, so an equivalence mistake in
  either shows up as a mismatch.
- ``usage_coefficient`` (api.py:244-259): integer-microsecond overlap
  of bucket and search window divided by the granularity; NULL bounds
  default to the bucket edges.  Same-timestamp group values summed
  (api.py:230-241).

Exactness: every boundary sits on a 225 s grid (3600/16), so all
coefficients are dyadic sixteenths; measure values are dyadic quarters
— every product and sum is exactly representable, so Spark and DuckDB
must agree bit-for-bit with no rounding tolerance.

``derandomize=True`` keeps the suite a deterministic gate.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest
# Extended fuzz/property-hunt tier (r13): excluded from the default
# fast run so the driver verify gate finishes; the full-tier gate
# (-m "slow or not slow") still runs it.
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gnocchi_spark.operators.grouper import history_grouped_aggregate

BASE = datetime.datetime(2026, 3, 1, 0, 0, 0)
TICK_S = 225  # 3600 / 16 -> dyadic coefficients
G_S = 3600
G_US = G_S * 1_000_000
VALUES = [-2.0, -0.5, 0.0, 0.25, 1.0, 3.5, 100.0]
FLAVORS = ["a", "b"]


def _tick(k: int) -> datetime.datetime:
    return BASE + datetime.timedelta(seconds=k * TICK_S)


def _hour(h: int) -> datetime.datetime:
    return BASE + datetime.timedelta(hours=h)


# --- case strategy -----------------------------------------------------------


@st.composite
def grouper_cases(draw):
    n_resources = draw(st.integers(1, 3))
    measures = []  # (resource_id, bucket_ts, value)
    revisions = []  # (resource_id, rev_start, rev_end, flavor)
    for rid in range(1, n_resources + 1):
        hours = draw(st.lists(st.integers(0, 7), min_size=1, max_size=6, unique=True))
        for h in hours:
            measures.append((rid, _hour(h), draw(st.sampled_from(VALUES))))
        starts = sorted(
            draw(st.lists(st.integers(0, 120), min_size=1, max_size=4, unique=True))
        )
        for i, s in enumerate(starts):
            kind = draw(st.sampled_from(["adjacent", "random", "open"]))
            if kind == "adjacent" and i + 1 < len(starts):
                end = _tick(starts[i + 1])
            elif kind == "open":
                end = None
            else:
                # gap, overlap, or zero-length relative to the next start
                end = _tick(min(128, s + draw(st.integers(0, 24))))
            revisions.append((rid, _tick(s), end, draw(st.sampled_from(FLAVORS))))
    # query window: each bound independently unset or on the grid
    bounds = draw(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 128)),
            st.one_of(st.none(), st.integers(0, 128)),
        )
    )
    start_k, stop_k = bounds
    if start_k is not None and stop_k is not None and start_k > stop_k:
        start_k, stop_k = stop_k, start_k
    start = _tick(start_k) if start_k is not None else None
    stop = _tick(stop_k) if stop_k is not None else None
    return measures, revisions, start, stop


# --- independent reference translation (DuckDB) ------------------------------


def _ts_sql(t) -> str:
    return f"TIMESTAMP '{t.isoformat(sep=' ')}'" if t is not None else "NULL"


def oracle_sql(start, stop) -> str:
    period = ""
    if start is not None and stop is not None:
        # create_history_period_filter — applied before ranking
        period = (
            f"WHERE revision_start < {_ts_sql(stop)} "
            f"AND (revision_end IS NULL OR revision_end >= {_ts_sql(start)})"
        )
    s, e = _ts_sql(start), _ts_sql(stop)
    return f"""
    WITH revs AS (
      SELECT resource_id, revision_start, revision_end, flavor,
             row_number() OVER (PARTITION BY resource_id
                                ORDER BY revision_start) AS rn
      FROM revisions {period}
    ), win AS (
      SELECT resource_id, flavor,
        CASE WHEN rn = 1 THEN {s}
             WHEN {s} IS NULL THEN revision_start
             ELSE CASE WHEN revision_start > {s}
                       THEN revision_start ELSE {s} END
        END AS ss,
        CASE WHEN revision_end IS NULL THEN {e}
             WHEN {e} IS NULL THEN revision_end
             ELSE CASE WHEN revision_end < {e}
                       THEN revision_end ELSE {e} END
        END AS se
      FROM revs
    )
    SELECT w.flavor, m.bucket_ts,
      sum(m.value * (
        (CASE WHEN w.se IS NULL THEN epoch_us(m.bucket_ts) + {G_US}
              ELSE least(epoch_us(w.se), epoch_us(m.bucket_ts) + {G_US}) END
         - CASE WHEN w.ss IS NULL THEN epoch_us(m.bucket_ts)
                ELSE greatest(epoch_us(w.ss), epoch_us(m.bucket_ts)) END
        ) / {G_US}.0)) AS value
    FROM measures m JOIN win w ON m.resource_id = w.resource_id
      AND (w.se IS NULL OR m.bucket_ts < w.se)
      AND (w.ss IS NULL
           OR epoch_us(m.bucket_ts) >= (epoch_us(w.ss) // {G_US}) * {G_US})
    GROUP BY 1, 2
    """


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


@settings(
    max_examples=110,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=grouper_cases())
def test_history_grouper_matches_duckdb(spark, con, case):
    measures, revisions, start, stop = case

    bucketed = spark.createDataFrame(
        measures, "resource_id long, bucket_ts timestamp, value double"
    )
    revs = spark.createDataFrame(
        revisions,
        "resource_id long, revision_start timestamp, "
        "revision_end timestamp, flavor string",
    )
    out = history_grouped_aggregate(
        bucketed, revs, ["flavor"], float(G_S), start=start, stop=stop
    )
    got = {(r["flavor"], r["bucket_ts"]): r["value"] for r in out.collect()}

    con.execute("DROP TABLE IF EXISTS measures; DROP TABLE IF EXISTS revisions")
    con.execute(
        "CREATE TABLE measures (resource_id BIGINT, bucket_ts TIMESTAMP, value DOUBLE)"
    )
    con.executemany("INSERT INTO measures VALUES (?,?,?)", measures)
    con.execute(
        "CREATE TABLE revisions (resource_id BIGINT, revision_start TIMESTAMP, "
        "revision_end TIMESTAMP, flavor VARCHAR)"
    )
    con.executemany("INSERT INTO revisions VALUES (?,?,?,?)", revisions)
    want = {
        (f, b): v for f, b, v in con.execute(oracle_sql(start, stop)).fetchall()
    }

    assert got == want, (
        f"start={start} stop={stop}\nrevisions={revisions}\n"
        f"measures={measures}\nspark={sorted(got.items())}\n"
        f"duck={sorted(want.items())}"
    )
