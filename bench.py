"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Each query executes fully (noop sink — no driver collect overhead, no
result materialization skew).  A warm-up pass runs first so JIT/codegen
compilation is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from gnocchi_spark import tables  # noqa: E402
from gnocchi_spark.queries import QUERIES, ensure_session_conf  # noqa: E402
from gnocchi_spark.session import get_spark  # noqa: E402

# Headline set: the core ingest materialization, representative query
# operators from every family, and the scale-path LLM ops.
HEADLINE = [
    "tsdb_rollup_multi_1h",
    "tsdb_rollup_mean_5m",
    "tsdb_rate_mean_1h",
    "tsdb_rollup_pct_1d",
    "tsdb_ops_arith_fill0",
    "tsdb_ops_aggregate_mean",
    "history_grouped_usage",
    "tpch_q1_pricing_summary",
    "resource_metric_join",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_stats",
    "ann_cosine_topk",
    "ingest_influxdb_lines",
    "ingest_collectd",
    "tsdb_refresh_on_read",
    "maintenance_retention",
    "decontaminate_ngram",
    "tfidf_keywords",
    "pack_sequences_512",
    "asof_join_nearest",
    "sessionize_gap",
    "dedup_span_exact",
    "pii_redact",
    "dedup_semantic",
    "dedup_incremental_minhash",
    "dedup_span_apply",
    "dedup_bloom_batch",
    "vocab_induction",
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q5_local_supplier_volume",
    "bm25_retrieval",
    "chunk_documents_rag",
    "perplexity_unigram",
    "hybrid_rrf_retrieval",
    "cluster_topics_kmeans",
    "tpch_q7_nation_volume",
    "tpch_q18_large_orders",
    "metric_correlation_matrix",
    "hll_cascade_merge",
    "tsdb_m4_downsample",
    "tsdb_time_weighted_avg",
    # late-r09 operators, tracked from r10 on (VERDICT r09 wrong #3;
    # one-time headline step change recorded in BASELINE.md)
    "dedup_repeated_spans",
    "dedup_repeated_span_apply",
    "quality_nb_classifier",
    "ann_probe_curve",
    # new in r10, tracked from birth (same step change)
    "quality_nb_threshold_curve",
]


def rollup_policy_bench(spark, sf_dir):
    """End-to-end archive-policy materialization (the ingest hot path):
    all default methods at 5 min + 1 h granularities, cascaded."""
    from gnocchi_spark.operators.rollup import rollup_policy
    from gnocchi_spark.policy import ArchivePolicy, ArchivePolicyItem

    measures = tables.events_as_measures(spark, sf_dir)
    policy = ArchivePolicy(
        "bench",
        0,
        (ArchivePolicyItem(300.0, points=100000), ArchivePolicyItem(3600.0, points=100000)),
        frozenset(["mean", "sum", "min", "max", "count", "std", "first", "last"]),
    )
    return rollup_policy(measures, policy, seq_col="seq")


def _replicated_measures(spark, sf_dir, factor):
    """events x factor with distinct metric ids per replica — the shape
    of a deployment with factor-times more metrics."""
    m = tables.events_as_measures(spark, sf_dir)
    rep = spark.range(factor).select(F.col("id").cast("string").alias("__rep"))
    return (
        m.crossJoin(rep)
        .withColumn("metric_id", F.concat_ws("_", "metric_id", "__rep"))
        .drop("__rep")
    )


def _replicated_events_orders(spark, sf_dir, factor):
    """events+orders x factor with disjoint user key-spaces per replica
    — the as-of/session workload of a deployment with factor-times more
    users (per-key row counts unchanged, so growth measures the
    operators' scaling on key count, their 100-TB axis)."""
    rep = spark.range(factor).select(F.col("id").alias("__rep"))
    ev = (
        tables.load(spark, sf_dir, "events")
        .crossJoin(rep)
        .withColumn("user_id", F.col("user_id") + F.col("__rep") * 1000000)
        .drop("__rep")
    )
    orders = (
        tables.load(spark, sf_dir, "orders")
        .crossJoin(rep)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("__rep") * 1000000)
        .drop("__rep")
    )
    return ev, orders


def _asof_on(ev, orders):
    from gnocchi_spark.operators.asof import asof_join

    return asof_join(
        ev.select("event_id", "user_id", "ts"),
        orders.select(
            F.col("o_custkey").alias("user_id"),
            "o_orderdate",
            "o_orderkey",
            "o_totalprice",
        ),
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
        tie_col="o_orderkey",
    )


def _sessions_on(ev):
    from gnocchi_spark.operators.asof import session_stats

    return session_stats(
        ev, ["user_id"], gap_seconds=1800.0, value_col="value", tie_col="event_id"
    )


def _lp_on(ev):
    # label_propagation_communities shape on an arbitrary events
    # frame: degree-capped co-occurrence edges (the cap is what this
    # stress PROVES — uncapped, 10x users measured 40x wall because
    # the bucket self-join squares with concurrency), 3 unrolled sync
    # rounds, exact-integer argmin per node
    from gnocchi_spark.functions.timeutil import truncate_to_bucket
    from gnocchi_spark.operators.graph import cooccurrence_edges, label_propagation

    e = cooccurrence_edges(
        ev.where(F.col("event_type") == "purchase"),
        truncate_to_bucket(F.col("ts"), 3600.0),
        max_per_bucket=32,
    )
    return label_propagation(e, 3).groupBy("lbl").agg(F.count("*").alias("sz"))


def _tri_on(ev):
    # graph_triangle_count shape: degree-capped edges + degree-ordered
    # orientation; wedge fanout is bounded by orientation, so 10x
    # disjoint users must grow ~linearly
    from gnocchi_spark.functions.timeutil import truncate_to_bucket
    from gnocchi_spark.operators.graph import cooccurrence_edges, triangle_count

    e = cooccurrence_edges(
        ev.where(F.col("event_type") == "purchase"),
        truncate_to_bucket(F.col("ts"), 3600.0),
        max_per_bucket=32,
    )
    return triangle_count(e)


def _tfidf_on(docs):
    from gnocchi_spark.operators.retrieval import tfidf_cosine_topk

    return tfidf_cosine_topk(docs, rare_terms=4, bucket_cap=50, k=5)


def _interval_on(ev):
    # the interval_join_activity shape: purchases anchor a 15-min
    # same-user window; banded (user, bucket) equi-join + residual
    from gnocchi_spark.operators.asof import interval_join_pairs

    starts = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return (
        interval_join_pairs(starts, ev, ["user_id"], 900.0)
        .where(F.col("p_event_id") != F.col("event_id"))
        .groupBy("event_id")
        .agg(F.count("*").alias("n_events"), F.sum("p_value").alias("sum_value"))
    )


def _replicated_docs(spark, sf_dir, factor):
    """documents x factor, each replica ciphered by a distinct affine
    letter map (x -> a*x + b mod 26, gcd(a, 26) = 1; replica 0 is the
    identity): within a replica the near-dup structure is EXACTLY the
    original corpus's (a bijective character map preserves shingle
    identity); across replicas character shingles essentially never
    match.  Near-dup density stays constant, so candidate growth
    measures the algorithm, not a synthetic blowup.  (A word-suffix
    salt is NOT enough: k=5 character shingles inside words survive it
    and cross-replica Jaccard stays band-detectable — measured 113x
    candidate growth vs 11x with the cipher.  Plain Caesar rotations
    cap at 26 distinct replicas; the affine family gives 12*26 = 312,
    enough for the deep-stress factors.)"""
    assert factor <= 312, "affine cipher family supports <= 312 replicas"
    d = tables.load(spark, sf_dir, "documents")
    n = d.count()
    alpha = "abcdefghijklmnopqrstuvwxyz"
    units = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
    reps = []
    for r in range(factor):
        # distinct (a, b) per replica by construction: a cycles the 12
        # units, b increments every full cycle (replica 0 = identity)
        a, b = units[r % 12], r // 12
        rot = "".join(alpha[(a * i + b) % 26] for i in range(26))
        reps.append(
            d.withColumn("doc_id", F.col("doc_id") + F.lit(r * (n + 1))).withColumn(
                "text", F.translate(F.lower(F.col("text")), alpha, rot)
            )
        )
    out = reps[0]
    for rdf in reps[1:]:
        out = out.unionByName(rdf)
    return out


def _replicated_embeddings(spark, sf_dir, factor):
    """embeddings x factor with a deterministic per-(replica, dim) sign
    flip: cos(Sx, Sy) == cos(x, y) for a diagonal +-1 map, so
    within-replica structure is exact while replicas decorrelate."""
    e = tables.load(spark, sf_dir, "embeddings")
    rep = spark.range(factor).select(F.col("id").alias("__rep"))
    n = e.count()
    flipped = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x
            * F.when(
                F.pmod(F.xxhash64(F.col("__rep"), i, F.lit("signflip")), 2) == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
        ).cast("float"),
    )
    return (
        e.crossJoin(rep)
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * (n + 1))
        .withColumn("embedding", flipped)
        .drop("__rep")
    )


def ingest_throughput(spark, sf_dir, factor=10):
    """Spark mirror of the reference injector protocol (BASELINE.md):
    mean @ 5 min rollup over factor x the events table, measures/s."""
    from gnocchi_spark.operators.rollup import rollup

    m = _replicated_measures(spark, sf_dir, factor)
    n = m.count()  # materializes the scan once = warm-up
    t0 = time.time()
    rollup(m, ["mean"], 300.0).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    spark.catalog.clearCache()
    return {
        "n_measures": n,
        "wall_s": round(wall, 3),
        "measures_per_s": round(n / wall, 1),
    }


def per_method_throughput(spark, sf_dir, factor=10):
    """Spark mirror of the reference's per-method resample benchmark
    (BASELINE_NUMBERS.carbonara.resample_hz): one rollup per method over
    the replicated measure stream, measures/s each.  The reference
    number is single-core points/s on 3600-point buckets; the mirror is
    the same aggregation shape end to end on local[32]."""
    from gnocchi_spark.operators.rollup import rollup

    m = _replicated_measures(spark, sf_dir, factor)
    m = m.persist()
    n = m.count()
    out = {}
    for method in ["mean", "sum", "max", "min", "std", "median",
                   "first", "last", "count", "5pct", "90pct"]:
        seq = "seq" if method in ("first", "last") else None
        t0 = time.time()
        rollup(m, [method], 300.0, seq_col=seq).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        out[method] = {
            "wall_s": round(wall, 3),
            "measures_per_s": round(n / wall, 1),
        }
    m.unpersist()
    return out


def baseline_section(spark, sf_dir):
    """bench-vs-baseline ratio against the recorded reference numbers
    (tools/baseline_ref.py -> BASELINE_NUMBERS.json)."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BASELINE_NUMBERS.json")) as f:
            ref = json.load(f)["injector_equivalent"]["measures_per_s"]
    except Exception:
        ref = None
    spark_side = ingest_throughput(spark, sf_dir)
    out = {"ref_measures_per_s": ref, **spark_side}
    if ref:
        out["ratio_ref_over_spark"] = round(ref / spark_side["measures_per_s"], 3)
    out["per_method"] = per_method_throughput(spark, sf_dir)
    return out


def _decontaminate_on(docs):
    from pyspark.sql import functions as F

    from gnocchi_spark.operators.pipeline import ngram_decontaminate

    bench = docs.where(F.col("doc_id") % 20 == 0)
    train = docs.where(F.col("doc_id") % 20 != 0)
    return ngram_decontaminate(train, bench, n=5)


def _span_apply_on(docs):
    from gnocchi_spark.operators.pipeline import span_dedup_apply

    return span_dedup_apply(docs, span_words=10)


def _bloom_on(docs):
    from gnocchi_spark.operators.bloom import batch_dedup_against_corpus
    from gnocchi_spark.operators.dedup import normalize_text

    keyed = docs.select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("text_key")
    )
    # 2^16 bits at both sizes: the build shuffle is filter-size-bound,
    # which is exactly the flat-growth claim the stress run checks
    return batch_dedup_against_corpus(
        keyed.where(F.col("doc_id") % 3 == 0),
        keyed.where(F.col("doc_id") % 10 == 7),
        n_bits=1 << 16,
        k=4,
    )


def _vocab_on(docs):
    from gnocchi_spark.operators.pipeline import induce_subword_vocab

    return induce_subword_vocab(docs, max_len=6, top_n=256)


def _bm25_on(docs):
    from gnocchi_spark.operators.retrieval import bm25_topk
    from gnocchi_spark.queries import BM25_QUERIES

    return bm25_topk(docs, BM25_QUERIES, k=5)


def _ppl_on(docs):
    from gnocchi_spark.operators.retrieval import unigram_lm_score

    return unigram_lm_score(docs)


def _hll_cascade_on(m):
    """Sketch-cascade stress body: hourly HLL registers merged to daily
    + the direct daily registers, both estimated (the exact-count join
    of the registered query is omitted — the claim under stress is the
    sketch path's register-bounded growth)."""
    from gnocchi_spark.functions.sketches import (
        hll_estimate_from_registers,
        hll_register_cols,
    )
    from gnocchi_spark.functions.timeutil import truncate_to_bucket

    idx, rank = hll_register_cols(F.col("value").cast("string"), 9)
    base = m.select(
        "metric_id",
        truncate_to_bucket(F.col("ts"), 3600.0).alias("hb"),
        truncate_to_bucket(F.col("ts"), 86400.0).alias("db"),
        idx.alias("__reg"),
        rank.alias("__rank"),
    )
    hourly = base.groupBy("metric_id", "hb", "db", "__reg").agg(
        F.max("__rank").alias("__maxrank")
    )
    merged = hourly.groupBy("metric_id", "db", "__reg").agg(
        F.max("__maxrank").alias("__maxrank")
    )
    return hll_estimate_from_registers(
        merged, ["metric_id", "db"], p=9, out_col="merged_distinct"
    )


def _hist_cascade_on(m):
    from gnocchi_spark.functions.sketches import (
        histogram_counts,
        quantile_from_bin_counts,
    )
    from gnocchi_spark.functions.timeutil import truncate_to_bucket

    ev = m.select(
        "metric_id",
        truncate_to_bucket(F.col("ts"), 3600.0).alias("hb"),
        truncate_to_bucket(F.col("ts"), 86400.0).alias("db"),
        "value",
    )
    hourly = histogram_counts(ev, "value", ["metric_id", "hb", "db"], 0.0, 500.0, 256)
    merged = hourly.groupBy("metric_id", "db", "bin").agg(F.sum("cnt").alias("cnt"))
    return quantile_from_bin_counts(
        merged, ["metric_id", "db"], 0.95, 0.0, 500.0, 256, out_col="p95"
    )


def _minhash_cand_count(spark, docs, n_docs=None):
    # same autotuned banding minhash_near_duplicates defaults to —
    # r grows with log(N) so candidate volume stays ~linear
    from gnocchi_spark.operators.dedup import (
        autotune_minhash_params,
        doc_shingle_arrays,
        lsh_candidate_pairs,
        minhash_signatures_arrays,
        with_hash_words,
    )

    arrays = with_hash_words(doc_shingle_arrays(docs))
    # callers pass the already-materialized corpus count: docsD is a
    # 30-100-way replicated union whose count() is a full extra pass
    nh, r = autotune_minhash_params(
        n_docs if n_docs is not None else docs.count()
    )
    n = lsh_candidate_pairs(
        minhash_signatures_arrays(arrays, nh), nh, r
    ).count()
    spark.catalog.clearCache()
    return n


def _simhash_cand_count(spark, docs, split_out=None, n_docs=None):
    # band-collision pairs BEFORE the hamming filter, at the same
    # autotuned banding production uses — split by hamming so the
    # growth attribution is visible: background (uncorrelated)
    # pairs concentrate near (bits - w)/2, genuinely-correlated
    # pairs sit low.  If growth comes from the low bucket, it is
    # the corpus's real similar-pair growth, not a banding defect.
    from gnocchi_spark.operators.dedup import (
        autotune_simhash_params,
        simhash_band_candidates,
    )

    if n_docs is None:
        n_docs = docs.count()
    b, w = autotune_simhash_params(n_docs)
    cut = (b * w) // 4
    split = {
        ("low" if r["low"] else "background"): r["cnt"]
        for r in simhash_band_candidates(docs)
        .groupBy((F.col("hamming") <= cut).alias("low"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    if split_out is not None:
        split_out[n_docs] = {
            "hamming_cut": cut,
            "low": split.get("low", 0),
            "background": split.get("background", 0),
        }
    spark.catalog.clearCache()
    return split.get("low", 0) + split.get("background", 0)


def _emb_cand_count(spark, emb, params=None, n_items=None):
    from gnocchi_spark.operators.similarity import (
        autotune_lsh_params,
        embedding_near_duplicates,
    )

    bands, bits = (
        params
        if params is not None
        else autotune_lsh_params(
            n_items if n_items is not None else emb.count()
        )
    )
    n = embedding_near_duplicates(
        emb, threshold=-1.0, n_bands=bands, band_planes=bits
    ).count()
    spark.catalog.clearCache()
    return n


def _tfidf_cand_count(spark, docs):
    from gnocchi_spark.operators.retrieval import tfidf_pair_candidates

    n = tfidf_pair_candidates(docs, rare_terms=4, bucket_cap=50).count()
    spark.catalog.clearCache()
    return n


def deep_stress(spark, sf_dir):
    """Push the scale-stress evidence PAST one decade (VERDICT r06 next
    #1): every linearity claim was previously measured at exactly 10x.
    Text generators (minhash / simhash / tfidf — shingle-hash bound)
    run at factor 30 (150k docs from the sf0.1 base); embedding LSH —
    the one generator measured >linear at 10x, and much cheaper per
    item — runs at factor 100 (200k vectors).  The ceiling is
    wall-clock budget, not memory: factor 100 on the text generators
    is ~1G shingle-md5s (~10 min alone) against a per-round bench
    budget of ~15 min; 128 GiB fits factor 100 for every generator.

    Reported per generator: candidates at 1x and deep-x, growth, and
    growth relative to linear (cand_growth / factor) — the number that
    must stay ~<= 1.3 for the 100 TB charter.  The tfidf full verify
    join and the iterative graph family get deep wall timings too.
    """
    fac_txt = int(os.environ.get("SPARK_GRAFT_DEEP_FACTOR", "30"))
    fac_emb = int(os.environ.get("SPARK_GRAFT_DEEP_FACTOR_EMB", "100"))
    from gnocchi_spark.operators.similarity import autotune_lsh_params
    from gnocchi_spark.operators.dedup import (
        autotune_minhash_params,
        autotune_simhash_params,
    )

    docs1 = tables.load(spark, sf_dir, "documents")
    docsD = _replicated_docs(spark, sf_dir, fac_txt)
    emb1 = tables.load(spark, sf_dir, "embeddings")
    embD = _replicated_embeddings(spark, sf_dir, fac_emb)
    n1, nD = docs1.count(), docsD.count()
    ne1, neD = emb1.count(), embD.count()

    split = {}
    candidates = {}
    for name, fn, in1, inD, c_n1, c_nD, fac in [
        ("minhash", _minhash_cand_count, docs1, docsD, n1, nD, fac_txt),
        ("tfidf_pairs",
         lambda s, d, n: _tfidf_cand_count(s, d),
         docs1, docsD, n1, nD, fac_txt),
        ("simhash",
         lambda s, d, n: _simhash_cand_count(s, d, split, n_docs=n),
         docs1, docsD, n1, nD, fac_txt),
        ("embedding_lsh",
         lambda s, d, n: _emb_cand_count(s, d, n_items=n),
         emb1, embD, ne1, neD, fac_emb),
    ]:
        c1, cD = fn(spark, in1, c_n1), fn(spark, inD, c_nD)
        growth = round(cD / c1, 2) if c1 else None
        candidates[name] = {
            "n_items": [c_n1, c_nD],
            "factor": fac,
            "cand1": c1,
            "cand_deep": cD,
            "cand_growth": growth,
            "vs_linear": round(growth / fac, 2) if growth is not None else None,
        }
    if split:
        s1, sD = split.get(n1, {}), split.get(nD, {})
        candidates["simhash"]["hamming_split"] = {"x1": s1, "deep": sD}
        if s1.get("background") and sD.get("background") is not None:
            candidates["simhash"]["background_growth"] = round(
                sD["background"] / s1["background"], 2
            )

    ev1, _ = _replicated_events_orders(spark, sf_dir, 1)
    evD, _ = _replicated_events_orders(spark, sf_dir, fac_txt)
    queries = {}
    # median-of-3 (r09, VERDICT r08 next #4): single-run walls here
    # spanned 2.2-22.6x across rounds because t1 itself varies 2-7 s
    # run-to-run — medians collapse the band and make the wall claim
    # gateable rather than narrated.  Runs interleave (1x, deep, 1x,
    # deep, ...) so a load transient hits both sides, not one.
    for name, mk1, mkD in [
        ("tfidf_cosine", lambda: _tfidf_on(docs1), lambda: _tfidf_on(docsD)),
        ("triangle_count", lambda: _tri_on(ev1), lambda: _tri_on(evD)),
        ("label_propagation", lambda: _lp_on(ev1), lambda: _lp_on(evD)),
    ]:
        t1_runs, tD_runs = [], []
        for _ in range(3):
            t1_runs.append(run_query(spark, mk1))
            tD_runs.append(run_query(spark, mkD))
        t1 = sorted(t1_runs)[1]
        tD = sorted(tD_runs)[1]
        growth = round(tD / t1, 2) if t1 else None
        queries[name] = {
            "t1": round(t1, 3),
            "t_deep": round(tD, 3),
            "t1_runs": [round(t, 3) for t in t1_runs],
            "t_deep_runs": [round(t, 3) for t in tD_runs],
            "factor": fac_txt,
            "wall_growth": growth,
            "vs_linear": round(growth / fac_txt, 2) if growth is not None else None,
        }

    # r08 (VERDICT r07 next #5): the text generators' SECOND decade —
    # factor 100 on the sf0.01 base (500 -> 50k docs), counts only
    # (candidate volume is deterministic, so this probe is
    # load-insensitive; wall figures belong to the big-base probe
    # above).  The embedding generator already runs factor 100 above.
    text100 = {}
    small_dir = sf_dir.replace("sf0.1", "sf0.01")
    if small_dir != sf_dir and os.path.isdir(small_dir):
        fac2 = int(os.environ.get("SPARK_GRAFT_DEEP_FACTOR_TEXT2", "100"))
        s1 = tables.load(spark, small_dir, "documents")
        sD = _replicated_docs(spark, small_dir, fac2)
        sn1, snD = s1.count(), sD.count()
        for name, fn in [
            ("minhash", _minhash_cand_count),
            ("tfidf_pairs", lambda s, d, n: _tfidf_cand_count(s, d)),
            ("simhash", lambda s, d, n: _simhash_cand_count(s, d, n_docs=n)),
        ]:
            c1, cD = fn(spark, s1, sn1), fn(spark, sD, snD)
            growth = round(cD / c1, 2) if c1 else None
            text100[name] = {
                "n_items": [sn1, snD],
                "factor": fac2,
                "cand1": c1,
                "cand_deep": cD,
                "cand_growth": growth,
                "vs_linear": round(growth / fac2, 2)
                if growth is not None
                else None,
            }

    return {
        "factor_text": fac_txt,
        "factor_emb": fac_emb,
        "candidates": candidates,
        "text_100x": text100,
        "queries": queries,
        "emb_lsh_params": {
            "x1": dict(
                zip(("n_bands", "band_planes"), autotune_lsh_params(ne1))
            ),
            "deep": dict(
                zip(("n_bands", "band_planes"), autotune_lsh_params(neD))
            ),
        },
        "minhash_params": {
            "x1": dict(
                zip(("num_hashes", "band_size"), autotune_minhash_params(n1))
            ),
            "deep": dict(
                zip(("num_hashes", "band_size"), autotune_minhash_params(nD))
            ),
        },
        "simhash_params": {
            "x1": dict(
                zip(("n_bands", "band_bits"), autotune_simhash_params(n1))
            ),
            "deep": dict(
                zip(("n_bands", "band_bits"), autotune_simhash_params(nD))
            ),
        },
    }


def scale_stress(spark, sf_dir, factor=10):
    """Judge task: run the heaviest operators at 1x and factor-x and
    record wall growth plus dedup candidate-pair counts vs the N^2 pair
    space — the empirical sub-quadratic claim."""
    from gnocchi_spark.operators.pipeline import pack_sequences
    from gnocchi_spark.operators.dedup import (
        doc_shingle_arrays,
        lsh_candidate_pairs,
        minhash_near_duplicates,
        minhash_signatures_arrays,
        simhash_band_candidates,
        simhash_near_duplicates,
        with_hash_words,
    )
    from gnocchi_spark.operators.similarity import (
        autotune_lsh_params,
        embedding_near_duplicates,
    )

    docs1 = tables.load(spark, sf_dir, "documents")
    docs10 = _replicated_docs(spark, sf_dir, factor)
    emb1 = tables.load(spark, sf_dir, "embeddings")
    emb10 = _replicated_embeddings(spark, sf_dir, factor)
    ev1, ord1 = _replicated_events_orders(spark, sf_dir, 1)
    ev10, ord10 = _replicated_events_orders(spark, sf_dir, factor)

    # Banded hyperplane LSH must scale bits-per-band with log2(N) or the
    # background candidate volume is quadratic (band collisions for
    # uncorrelated vectors happen at a constant 2^-bits rate).  Tune the
    # parameters to each corpus size, exactly as a deployment would.
    n_emb1, n_emb10 = emb1.count(), emb10.count()
    bands1, bits1 = autotune_lsh_params(n_emb1)
    bands10, bits10 = autotune_lsh_params(n_emb10)

    def emb_neardup(emb, bands, bits, threshold=0.9):
        return embedding_near_duplicates(
            emb, threshold=threshold, n_bands=bands, band_planes=bits
        )

    def timed(make_df):
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        return dt

    queries = {}
    for name, mk1, mk10 in [
        ("dedup_minhash_lsh", lambda: minhash_near_duplicates(docs1),
         lambda: minhash_near_duplicates(docs10)),
        ("dedup_simhash", lambda: simhash_near_duplicates(docs1),
         lambda: simhash_near_duplicates(docs10)),
        ("dedup_embedding_lsh", lambda: emb_neardup(emb1, bands1, bits1),
         lambda: emb_neardup(emb10, bands10, bits10)),
        ("rollup_policy_cascade_bench", lambda: rollup_policy_bench(spark, sf_dir),
         lambda: _rollup_policy_on(_replicated_measures(spark, sf_dir, factor))),
        ("decontaminate_ngram", lambda: _decontaminate_on(docs1),
         lambda: _decontaminate_on(docs10)),
        ("pack_sequences", lambda: pack_sequences(docs1, ctx=512),
         lambda: pack_sequences(docs10, ctx=512)),
        ("asof_join", lambda: _asof_on(ev1, ord1),
         lambda: _asof_on(ev10, ord10)),
        ("sessionize", lambda: _sessions_on(ev1),
         lambda: _sessions_on(ev10)),
        # banded interval join: 10x users with constant per-user
        # density must grow ~linearly (candidates bound by temporal
        # locality per key, never by corpus row count)
        ("interval_join", lambda: _interval_on(ev1),
         lambda: _interval_on(ev10)),
        # iterative-join family: 10x users, disjoint key spaces —
        # edges never cross replicas, so rounds scale with users
        ("label_propagation", lambda: _lp_on(ev1),
         lambda: _lp_on(ev10)),
        ("dedup_span_apply", lambda: _span_apply_on(docs1),
         lambda: _span_apply_on(docs10)),
        ("dedup_bloom_batch", lambda: _bloom_on(docs1),
         lambda: _bloom_on(docs10)),
        ("vocab_induction", lambda: _vocab_on(docs1),
         lambda: _vocab_on(docs10)),
        ("bm25_retrieval", lambda: _bm25_on(docs1),
         lambda: _bm25_on(docs10)),
        ("perplexity_unigram", lambda: _ppl_on(docs1),
         lambda: _ppl_on(docs10)),
        # sketch cascades: shuffle rows = metrics x buckets x sketch
        # size — 10x metrics should grow ~linearly, never with traffic
        # inverted-index all-pairs similarity: rarest-term blocking
        # bounds candidates at N * rare_terms * bucket_cap by
        # construction, so 10x corpus (cipher replicas, disjoint
        # vocabularies) must grow the pair volume ~linearly
        ("tfidf_cosine", lambda: _tfidf_on(docs1), lambda: _tfidf_on(docs10)),
        ("triangle_count", lambda: _tri_on(ev1), lambda: _tri_on(ev10)),
        ("hll_cascade", lambda: _hll_cascade_on(_replicated_measures(spark, sf_dir, 1)),
         lambda: _hll_cascade_on(_replicated_measures(spark, sf_dir, factor))),
        ("histogram_cascade", lambda: _hist_cascade_on(_replicated_measures(spark, sf_dir, 1)),
         lambda: _hist_cascade_on(_replicated_measures(spark, sf_dir, factor))),
    ]:
        t1, t10 = timed(mk1), timed(mk10)
        queries[name] = {
            "t1": t1,
            "t10": t10,
            "wall_growth": round(t10 / t1, 2) if t1 else None,
        }

    n_docs1, n_docs10 = docs1.count(), docs10.count()
    candidates = {}
    simhash_hamming_split = {}
    for name, fn, in1, in10, n1, n10 in [
        ("minhash", _minhash_cand_count, docs1, docs10, n_docs1, n_docs10),
        ("tfidf_pairs",
         lambda s, d, n: _tfidf_cand_count(s, d),
         docs1, docs10, n_docs1, n_docs10),
        ("simhash",
         lambda s, d, n: _simhash_cand_count(
             s, d, simhash_hamming_split, n_docs=n
         ),
         docs1, docs10, n_docs1, n_docs10),
        ("embedding_lsh",
         lambda s, d, n: _emb_cand_count(s, d, n_items=n),
         emb1, emb10, n_emb1, n_emb10),
    ]:
        c1, c10 = fn(spark, in1, n1), fn(spark, in10, n10)
        candidates[name] = {
            "n_items": [n1, n10],
            "cand1": c1,
            "cand10": c10,
            "cand_growth": round(c10 / c1, 2) if c1 else None,
            "pairspace_growth": round(
                (n10 * (n10 - 1)) / (n1 * (n1 - 1)), 2
            ),
        }
        if name == "simhash" and simhash_hamming_split:
            s1 = simhash_hamming_split.get(n1, {})
            s10 = simhash_hamming_split.get(n10, {})
            candidates[name]["hamming_split"] = {"x1": s1, "x10": s10}
            if s1.get("background") and s10.get("background") is not None:
                candidates[name]["background_growth"] = round(
                    s10["background"] / s1["background"], 2
                )
    from gnocchi_spark.operators.dedup import autotune_minhash_params

    mh1 = autotune_minhash_params(n_docs1)
    mh10 = autotune_minhash_params(n_docs10)
    return {
        "factor": factor,
        "queries": queries,
        "candidates": candidates,
        "emb_lsh_params": {
            "x1": {"n_bands": bands1, "band_planes": bits1},
            "x10": {"n_bands": bands10, "band_planes": bits10},
        },
        "minhash_params": {
            "x1": {"num_hashes": mh1[0], "band_size": mh1[1]},
            "x10": {"num_hashes": mh10[0], "band_size": mh10[1]},
        },
    }


def _rollup_policy_on(measures):
    from gnocchi_spark.operators.rollup import rollup_policy
    from gnocchi_spark.policy import ArchivePolicy, ArchivePolicyItem

    policy = ArchivePolicy(
        "bench",
        0,
        (ArchivePolicyItem(300.0, points=100000), ArchivePolicyItem(3600.0, points=100000)),
        frozenset(["mean", "sum", "min", "max", "count", "std", "first", "last"]),
    )
    return rollup_policy(measures, policy, seq_col="seq")


def run_query(spark, make_df) -> float:
    # time construction AND execution: operators with eager cache
    # builds (dedup) do real work at plan-construction time
    t0 = time.time()
    make_df().write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    # queries are independent: drop persisted intermediates (e.g. the
    # dedup shingle cache) so one query's cache never skews the next
    spark.catalog.clearCache()
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("gnocchi-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_session_conf(spark)

    # warm-up: JVM/codegen/parquet-footer caches.  The second statement
    # compiles the heavy string/regex/map expression shapes (split,
    # str_to_map, rlike, explode, window-free agg) on 1k synthetic rows
    # so the first timed query measures the query, not the JIT — a
    # fresh JVM otherwise charges ~3 s of codegen warm-up to whichever
    # string-dense query happens to run first (measured on
    # ingest_influxdb_lines: 6.1 s cold vs 2.3 s warm).
    tables.load(spark, sf_dir, "events").agg(F.count("*")).collect()
    from gnocchi_spark.sources import influxdb

    warm_lines = spark.range(1000).select(
        F.format_string("m,host=h%d,dc=east value=%d 1000000", "id", "id").alias("line")
    )
    influxdb.parse_lines(warm_lines).agg(F.count("*")).collect()

    # SPARK_GRAFT_BENCH_PASSES > 1 (r11, VERDICT r10 wrong #1): run the
    # whole headline sequence N times and take the per-query MEDIAN
    # across passes, so a machine-wide drift window hitting one pass
    # can never contaminate the per-query series again.  Each pass
    # preserves the historical intra-pass semantics exactly (memo
    # reuse between queries inside a pass; the assignment memo is
    # cleared between passes so every pass pays the same cold builds).
    # Default 3 since r11 so BENCH_r{N}.json itself records medians;
    # BASELINE.md "r11 median step change" documents the one-time
    # cold->warm level shift vs the <=r10 single-pass series.
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    pass_walls: list[dict[str, float]] = []
    # r13 (VERDICT r12 next #2): record the EFFECTIVE parallelism and
    # per-pass load averages in the payload so scaling runs are
    # self-describing — the r12 driver flagged `suspect_cpus_ignored`
    # because nothing in the payload proved the env core count was
    # honored.  Additions only: the queries dict, timing methodology and
    # the one-line stdout contract are unchanged.
    pass_loadavg: list[list[float]] = []
    for _ in range(passes):
        if pass_walls:  # fresh memo for every pass after the first
            from gnocchi_spark.operators.dedup import clear_assignment_cache

            clear_assignment_cache()
        tp: dict[str, float] = {}
        tp["rollup_policy_cascade_bench"] = round(run_query(spark, lambda: rollup_policy_bench(spark, sf_dir)), 3)
        for name in HEADLINE:
            tp[name] = round(run_query(spark, lambda n=name: QUERIES[n](spark, sf_dir)), 3)
        pass_walls.append(tp)
        pass_loadavg.append([round(x, 2) for x in os.getloadavg()])
    # True median per query (r12, ADVICE): for EVEN pass counts the
    # two middle elements are averaged instead of taking the upper one,
    # so a user overriding SPARK_GRAFT_BENCH_PASSES=2 gets an unbiased
    # estimator.  The headline `value` is a SUM of per-query medians —
    # a composite robust to per-query drift spikes, not the median of
    # pass totals (documented here and in BASELINE.md).
    def _median(vals: list) -> float:
        s = sorted(vals)
        n = len(s)
        if n % 2:
            return s[n // 2]
        return round((s[n // 2 - 1] + s[n // 2]) / 2.0, 3)

    timings: dict[str, float] = {
        k: _median([tp[k] for tp in pass_walls]) for k in pass_walls[0]
    }

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # scaling observability (r13, VERDICT r12 next #2): the master
        # string get_spark built, the env request, and what the context
        # actually runs with — proof the low-core bench honored the env.
        "parallelism": {
            "master": spark.sparkContext.master,
            "spark_graft_cpus": os.environ.get("SPARK_GRAFT_CPUS"),
            "default_parallelism": spark.sparkContext.defaultParallelism,
        },
        "pass_loadavg": pass_loadavg,
    }
    if passes > 1:
        payload["passes"] = passes
        payload["pass_walls"] = pass_walls
    # Checkpoints go to STDERR and to a local file; stdout carries
    # EXACTLY ONE JSON document, printed once at the very end.  The
    # consumer retains only the LAST ~2000 characters of stdout
    # (BENCH_r04.json's "tail" field is exactly 2000 chars, truncated
    # mid-document — that's why r03/r04 recorded "parsed": null even
    # after the single-document fix), so the stdout document must stay
    # comfortably under that window: headline total + baseline ratio +
    # the slowest queries + scale-stress verdicts.  The complete
    # payload always lands in BENCH_LOCAL_LAST.json via checkpoint().
    # BENCH_LOCAL_LAST.json is SCRATCH — the driver's per-round run
    # overwrites it.  A freeze-of-record run sets SPARK_GRAFT_BENCH_FREEZE
    # to e.g. BENCH_FREEZE_r12.json so the committed payload has its own
    # filename (r12, VERDICT r11 wrong #3: two artifacts shared one name
    # and readers got the wrong series without `git show HEAD:`).
    freeze_name = os.environ.get("SPARK_GRAFT_BENCH_FREEZE")

    def checkpoint(p):
        line = json.dumps(p)
        print(line, file=sys.stderr, flush=True)
        here = os.path.dirname(os.path.abspath(__file__))
        targets = ["BENCH_LOCAL_LAST.json"]
        if freeze_name:
            targets.append(freeze_name)
        for t in targets:
            with open(os.path.join(here, t), "w") as fh:
                fh.write(line + "\n")

    checkpoint(payload)
    payload["baseline"] = baseline_section(spark, sf_dir)
    checkpoint(payload)
    if os.environ.get("SPARK_GRAFT_SCALE_STRESS", "1") != "0":
        payload["scale_stress"] = scale_stress(spark, sf_dir)
        checkpoint(payload)
    if os.environ.get("SPARK_GRAFT_DEEP_STRESS", "1") != "0":
        payload["deep_stress"] = deep_stress(spark, sf_dir)
        checkpoint(payload)

    base = payload.get("baseline", {})
    stress = payload.get("scale_stress", {})
    compact = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": payload["sf"],
        "n_queries": len(timings),
        "ratio_ref_over_spark": base.get("ratio_ref_over_spark"),
        "measures_per_s": base.get("measures_per_s"),
        "ref_measures_per_s": base.get("ref_measures_per_s"),
        # effective parallelism (r13): the scaling-run proof, compact form
        "parallelism": payload["parallelism"]["default_parallelism"],
        "cpus_env": payload["parallelism"]["spark_graft_cpus"],
        "full_payload": "BENCH_LOCAL_LAST.json",
    }
    if stress:
        sq = stress.get("queries", {})
        compact["scale_stress"] = {
            "factor": stress.get("factor"),
            "max_wall_growth": max(
                (v["wall_growth"] or 0.0) for v in sq.values()
            ) if sq else None,
            "cand_growth": {
                k: v["cand_growth"]
                for k, v in stress.get("candidates", {}).items()
            },
        }
    deep = payload.get("deep_stress", {})
    if deep:
        compact["deep_stress"] = {
            "factor": [deep.get("factor_text"), deep.get("factor_emb")],
            "cand_vs_linear": {
                k: v["vs_linear"]
                for k, v in deep.get("candidates", {}).items()
            },
        }
        if deep.get("text_100x"):
            compact["deep_stress"]["text_100x_vs_linear"] = {
                k: v["vs_linear"] for k, v in deep["text_100x"].items()
            }
    # degrade gracefully toward the 2000-char window: start with the 8
    # slowest queries, halve until the document fits with margin
    for n_slow in (8, 4, 2, 0):
        compact["queries"] = dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:n_slow]
        )
        doc = json.dumps(compact)
        if len(doc) < 1700:
            break
    print(doc, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
