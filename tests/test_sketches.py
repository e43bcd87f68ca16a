"""HyperLogLog sketch: accuracy within theoretical bounds across
cardinality regimes (incl. the linear-counting small range), and
mergeability of per-partition register maxima."""

from __future__ import annotations

from pyspark.sql import functions as F

from gnocchi_spark.functions.sketches import (
    expected_standard_error,
    hll_distinct,
    hll_error_profile,
)


def test_accuracy_across_cardinalities(spark):
    # groups of 50 / 500 / 20000 distinct keys; 5-sigma bound on the
    # p=9 standard error (~4.6%) keeps the test deterministic-safe
    rows = (
        spark.range(50).select(F.lit("small").alias("g"), F.col("id"))
        .unionAll(spark.range(500).select(F.lit("mid").alias("g"), F.col("id")))
        .unionAll(spark.range(20000).select(F.lit("big").alias("g"), F.col("id")))
    )
    out = {
        r["g"]: (r["approx_distinct"], r["exact_distinct"], r["rel_error"])
        for r in hll_error_profile(
            rows, F.col("id").cast("string"), ["g"], p=9
        ).collect()
    }
    bound = 5 * expected_standard_error(9)
    for g, (approx, exact, rel) in out.items():
        assert abs(rel) < bound, f"{g}: {approx} vs {exact} (rel {rel})"
    # small range must engage linear counting and be very tight
    assert abs(out["small"][2]) < 0.02


def test_duplicates_do_not_move_the_estimate(spark):
    base = spark.range(1000).select(F.lit("g").alias("g"), F.col("id"))
    dup = base.unionAll(base).unionAll(base)
    a = hll_distinct(base, F.col("id").cast("string"), ["g"]).collect()[0][1]
    b = hll_distinct(dup, F.col("id").cast("string"), ["g"]).collect()[0][1]
    assert a == b  # max per register is idempotent under duplication


def test_binned_quantile_within_bin_width_of_exact(spark):
    from gnocchi_spark.functions.sketches import binned_quantile
    import numpy as np

    rng = [float(x) for x in range(0, 10007, 7)]
    df = spark.createDataFrame(
        [("g", v) for v in rng], "g string, value double"
    )
    got = binned_quantile(df, "value", ["g"], q=0.5, bins=256).collect()[0][1]
    exact = float(np.percentile(np.array(rng), 50))
    bin_width = (max(rng) - min(rng)) / 256
    assert abs(got - exact) <= bin_width


def test_binned_quantile_nondyadic_q_large_n(spark):
    # q=1/3's double repr is a rational with denominator ~1e16; the
    # rank numerator qn*(n-1) wraps BIGINT once n > ~2700, silently
    # returning a wrong bin in non-ANSI Spark.  decimal(38,0) rank
    # arithmetic (_exact_rank_cols) keeps it exact — verify at n=10000
    # against numpy's linear-interpolation percentile.
    from gnocchi_spark.functions.sketches import binned_quantile
    import numpy as np

    q = 1.0 / 3.0
    vals = [float(x) for x in range(10000)]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, value double"
    ).repartition(8)
    rows = binned_quantile(df, "value", ["g"], q=q, bins=256).collect()
    assert len(rows) == 1, "overflowed rank matched zero or many bins"
    exact = float(np.percentile(np.array(vals), q * 100))
    bin_width = (max(vals) - min(vals)) / 256
    assert abs(rows[0][1] - exact) <= bin_width


def test_quantile_from_bin_counts_nondyadic_q_large_n(spark):
    # same overflow scenario through the streaming-sink finalizer:
    # counter table whose total n is 60000 across 4 bins
    from gnocchi_spark.functions.sketches import quantile_from_bin_counts

    counts = spark.createDataFrame(
        [("g", 0, 15000), ("g", 1, 15000), ("g", 2, 15000), ("g", 3, 15000)],
        "g string, bin int, cnt long",
    )
    rows = quantile_from_bin_counts(
        counts, ["g"], q=1.0 / 3.0, lo=0.0, hi=4.0, bins=4
    ).collect()
    assert len(rows) == 1
    # rank = q*(n-1)+1 = 20000.666…: crossing bin 1, frac ≈ 1/3 within
    est = rows[0][1]
    assert 1.0 <= est <= 2.0, est


def test_binned_quantile_degenerate_group(spark):
    from gnocchi_spark.functions.sketches import binned_quantile

    df = spark.createDataFrame(
        [("g", 42.0)] * 5, "g string, value double"
    )
    assert binned_quantile(df, "value", ["g"], q=0.9).collect()[0][1] == 42.0


def test_cms_never_underestimates_and_is_tight_when_wide(spark):
    from gnocchi_spark.functions.sketches import cms_estimate, cms_tables

    # 100 distinct keys with known counts
    rows = [(f"k{i}",) for i in range(100) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "k string")
    cand = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    # wide sketch: w >> n so collisions are unlikely -> estimates exact
    sk = cms_tables(df, F.col("k"), d=4, w=1 << 14)
    est = cms_estimate(cand, sk, F.col("k"), d=4, w=1 << 14)
    for r in est.collect():
        assert r["cms_count"] == r["exact"]
    # narrow sketch: overestimates allowed, underestimates never
    sk2 = cms_tables(df, F.col("k"), d=4, w=32)
    est2 = cms_estimate(cand, sk2, F.col("k"), d=4, w=32)
    for r in est2.collect():
        assert r["cms_count"] >= r["exact"]
