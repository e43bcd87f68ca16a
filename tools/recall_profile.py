"""Measured recall gate for the banded-LSH -> IVF hand-off (r08,
VERDICT r07 next #1).

SCALE.md's r07 deep-stress section stated the slope-1.6 retune's recall
trade analytically (OR-construction formula: 0.9-recall design point to
N ~ 6k, ~0.68 by N = 50k with the 64-band cap binding).  This tool
turns the claim into MEASURED evidence against brute-force ground
truth, which the synthetic corpus cannot provide on its own (its
densest non-planted pair is < 0.6 cosine): it PLANTS near-duplicate
pairs at controlled cosine into a decorrelated replicated corpus, then
measures

- **LSH pair recall**: fraction of planted pairs with exact cosine >=
  0.9 that ``embedding_near_duplicates`` (autotuned params for the
  corpus size) recovers.  Every reported pair is exact-verified by the
  operator itself, so precision is 1.0 by construction; recall is the
  entire question.
- **IVF recall@k**: per-query overlap between ``ivf_cosine_topk``
  (sqrt(N) centroids, ~15% probe fraction) and exact brute-force
  ``cosine_topk`` over a fixed query sample.

at N in {5k, 50k} (plus the planted dups).  Output: RECALL_r8.json with
one row per N — the committed curve tests/test_llm_ops.py asserts on
(LSH holds the design point at 5k, decays at 50k; IVF >= 0.9 at both).

Planting: for every 10th vector v, append v' = v + eps * g with g a
deterministic xxhash-seeded direction and eps swept per id so exact
cosines land uniformly in ~[0.90, 0.96] — brackets the 0.9 design
threshold the autotuner promises for.  All arithmetic is Column-side;
ground-truth cosines are computed exactly per planted pair (M rows,
not N^2).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def planted_corpus(spark, sf_dir, factor, dup_every=10):
    """Replicated + decorrelated embeddings with planted near-dups.

    Returns (corpus_df, truth_df): corpus has the replicas plus one
    perturbed copy per ``dup_every``-th vector (dup ids offset by
    10_000_000); truth is (vec_a, vec_b, cosine) for every planted
    pair, exact.
    """
    from bench import _replicated_embeddings
    from gnocchi_spark.operators.similarity import cosine

    base = _replicated_embeddings(spark, sf_dir, factor).select(
        "vec_id", "embedding"
    )

    # deterministic perturbation direction g per (vec_id, dim), uniform
    # in [-1, 1]; eps varies per id so planted cosines sweep the band
    # around the 0.9 design threshold rather than sitting on one value
    g = F.transform(
        F.col("embedding"),
        lambda x, i: (
            F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit("plant")), 2001)
            - 1000
        ).cast("double")
        / 1000.0,
    )
    vnorm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    gnorm = F.sqrt(
        F.aggregate(g, F.lit(0.0), lambda a, x: a + x * x)
    )
    # cos(v, v + eps_rel*|v|*ghat) ~ 1/sqrt(1+eps_rel^2) for g ~ orthogonal
    # to v; eps_rel in [0.28, 0.47] lands cosines ~[0.90, 0.96]
    eps_rel = 0.28 + 0.19 * (
        F.pmod(F.xxhash64(F.col("vec_id"), F.lit("eps")), 1000).cast("double")
        / 1000.0
    )
    scale = eps_rel * vnorm / gnorm
    dup_vec = F.zip_with(
        F.col("embedding"),
        g,
        lambda x, y: (x.cast("double") + scale * y).cast("float"),
    )
    dups = (
        base.where(F.col("vec_id") % dup_every == 0)
        .select(
            (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
            dup_vec.alias("embedding"),
            F.col("vec_id").alias("__src"),
        )
    )
    corpus = base.unionByName(dups.drop("__src")).localCheckpoint(eager=True)
    truth = (
        dups.alias("d")
        .join(base.alias("b"), F.col("d.__src") == F.col("b.vec_id"))
        .select(
            F.col("b.vec_id").alias("vec_a"),
            F.col("d.vec_id").alias("vec_b"),
            cosine(F.col("b.embedding"), F.col("d.embedding")).alias("cosine"),
        )
        .localCheckpoint(eager=True)
    )
    return corpus, truth


def lsh_pair_recall(spark, corpus, truth, threshold=0.9):
    """Recall of embedding_near_duplicates (autotuned) against the
    planted pairs whose EXACT cosine clears the threshold (edge margin
    5e-3 keeps the operator's 5-dp rounding out of the denominator)."""
    from gnocchi_spark.operators.similarity import (
        autotune_lsh_params,
        embedding_near_duplicates,
    )

    n = corpus.count()
    n_bands, band_planes = autotune_lsh_params(n, threshold=threshold)
    found = embedding_near_duplicates(
        corpus, threshold=threshold, n_bands=n_bands, band_planes=band_planes
    ).select("vec_a", "vec_b")
    gt = truth.where(F.col("cosine") >= threshold + 5e-3).select(
        F.least("vec_a", "vec_b").alias("vec_a"),
        F.greatest("vec_a", "vec_b").alias("vec_b"),
    )
    n_true = gt.count()
    n_hit = gt.join(found, ["vec_a", "vec_b"], "left_semi").count()
    # recall by cosine band: the planted sweep brackets the design
    # threshold, and the at-threshold band is where the OR-construction
    # decay shows first (pairs well above threshold collide in some
    # band almost surely even with the cap binding)
    gt_banded = truth.where(F.col("cosine") >= threshold + 5e-3).select(
        F.least("vec_a", "vec_b").alias("vec_a"),
        F.greatest("vec_a", "vec_b").alias("vec_b"),
        F.floor((F.col("cosine") - threshold) / 0.02).alias("band"),
    )
    per_band = {
        int(r["band"]): (r["n"], r["hit"])
        for r in gt_banded.join(
            found.withColumn("__f", F.lit(1)), ["vec_a", "vec_b"], "left"
        )
        .groupBy("band")
        .agg(F.count("*").alias("n"), F.count("__f").alias("hit"))
        .collect()
    }
    bands = {
        f"[{threshold + 0.02 * b:.2f},{threshold + 0.02 * (b + 1):.2f})": round(
            hit / cnt, 4
        )
        for b, (cnt, hit) in sorted(per_band.items())
        if cnt >= 20
    }
    return {
        "n_items": n,
        "n_bands": n_bands,
        "band_planes": band_planes,
        "n_true_pairs": n_true,
        "n_recovered": n_hit,
        "recall": round(n_hit / n_true, 4) if n_true else None,
        "recall_by_cosine_band": bands,
    }


def ivf_partner_recall(spark, corpus, truth, k=10, n_queries=200, threshold=0.9):
    """The hand-off measurement: querying with a planted duplicate,
    does IVF top-k retrieve its >= ``threshold``-cosine partner?

    This is the task banded LSH starts missing when the band cap binds
    — high-cosine retrieval — and the one that matters for near-dup /
    semantic-dedup at scale.  (Full top-k-vs-brute recall on THIS
    corpus is reported separately but is a pathological task: the
    non-planted "true" neighbors of a uniform synthetic vector sit at
    ~0.35 cosine and scatter structurelessly across IVF cells — no
    index beats a scan there, and real corpora are not uniform.)
    """
    from gnocchi_spark.operators.similarity import ivf_cosine_topk

    n = corpus.count()
    n_centroids = max(8, int(math.isqrt(n)))
    n_probe = max(2, math.ceil(0.15 * n_centroids))
    gt = truth.where(F.col("cosine") >= threshold + 5e-3)
    sample = gt.orderBy("vec_b").limit(n_queries).localCheckpoint(eager=True)
    queries = corpus.join(
        sample.select(F.col("vec_b").alias("vec_id")), "vec_id", "left_semi"
    )
    approx = ivf_cosine_topk(
        corpus, queries, k=k, n_centroids=n_centroids, n_probe=n_probe
    ).select(
        F.col("query_id").alias("vec_b"), F.col("neighbor_id").alias("vec_a")
    )
    n_q = sample.count()
    n_hit = sample.join(approx, ["vec_a", "vec_b"], "left_semi").count()
    return {
        "n_items": n,
        "k": k,
        "n_queries": n_q,
        "n_centroids": n_centroids,
        "n_probe": n_probe,
        "partner_recall": round(n_hit / n_q, 4) if n_q else None,
    }


def ivf_topk_recall(spark, corpus, k=10, n_queries=100):
    """recall@k of ivf_cosine_topk (sqrt(N) centroids, ~15% probe
    fraction) vs exact brute-force cosine_topk on a fixed query
    sample."""
    from gnocchi_spark.operators.similarity import cosine_topk, ivf_cosine_topk

    n = corpus.count()
    n_centroids = max(8, int(math.isqrt(n)))
    n_probe = max(2, math.ceil(0.15 * n_centroids))
    queries = (
        corpus.where(F.col("vec_id") % 97 == 1).limit(n_queries)
    ).localCheckpoint(eager=True)
    exact = cosine_topk(corpus, queries, k=k).select("query_id", "neighbor_id")
    approx = ivf_cosine_topk(
        corpus,
        queries,
        k=k,
        n_centroids=n_centroids,
        n_probe=n_probe,
    ).select("query_id", "neighbor_id")
    n_exact = exact.count()
    n_hit = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
    return {
        "n_items": n,
        "k": k,
        "n_queries": queries.count(),
        "n_centroids": n_centroids,
        "n_probe": n_probe,
        "recall_at_k": round(n_hit / n_exact, 4) if n_exact else None,
    }


def clustered_corpus(spark, n, dim=64, n_clusters=50, sigma=0.5):
    """Planted mixture-of-Gaussians corpus (r09, VERDICT r08 next #1):
    the uniform synthetic corpus is the pathological ANN case (true
    neighbors scatter structurelessly), so the general serving claim
    needs a corpus with REAL cluster structure.  ``n_clusters`` centers
    with uniform[-1,1] coordinates, members = center + sigma *
    uniform[-1,1] noise — at sigma=0.5 within-cluster cosines land
    ~0.8 and cross-cluster ~0, the shape of real embedding corpora.
    Fully deterministic (xxhash-seeded columns, no RNG state)."""
    ids = spark.range(n).select(F.col("id").alias("vec_id"))
    cl = F.pmod(F.xxhash64(F.col("vec_id"), F.lit("cluster")), F.lit(n_clusters))
    dims = F.sequence(F.lit(0), F.lit(dim - 1))

    def u(*seed):  # uniform in [-1, 1], deterministic per seed tuple
        return (
            F.pmod(F.xxhash64(*seed), F.lit(2001)) - 1000
        ).cast("double") / 1000.0

    center = F.transform(dims, lambda d: u(cl, d, F.lit("center")))
    noise = F.transform(dims, lambda d: u(F.col("vec_id"), d, F.lit("noise")))
    emb = F.zip_with(
        center, noise, lambda c, x: (c + F.lit(float(sigma)) * x).cast("float")
    )
    return ids.select(
        "vec_id", emb.alias("embedding"), cl.cast("int").alias("label")
    ).localCheckpoint(eager=True)


def clustered_ivf_pq_point(spark, n, k=10, n_queries=100, target_recall=0.9):
    """The clustered-corpus serving gate: recall@k of ivf_cosine_topk
    at the AUTOTUNED probe depth (autotune_ivf_probe picks n_probe from
    the measured coverage curve of a disjoint tuning sample) and of
    pq_adc_topk, both against exact brute-force ground truth on a
    held-out query sample."""
    from gnocchi_spark.operators.similarity import (
        autotune_ivf_probe,
        cosine_topk,
        ivf_cosine_topk,
        pq_adc_topk,
        pq_deterministic_codebooks,
    )

    corpus = clustered_corpus(spark, n)
    n_centroids = max(8, int(math.isqrt(n)))
    n_probe, curve = autotune_ivf_probe(
        corpus, n_centroids, k=k, target_recall=target_recall
    )
    queries = (
        corpus.where(F.col("vec_id") % 97 == 1).limit(n_queries)
    ).localCheckpoint(eager=True)
    exact = cosine_topk(corpus, queries, k=k).select(
        "query_id", "neighbor_id"
    ).localCheckpoint(eager=True)
    n_exact = exact.count()

    ivf = ivf_cosine_topk(
        corpus, queries, k=k, n_centroids=n_centroids, n_probe=n_probe
    ).select("query_id", "neighbor_id")
    ivf_hit = exact.join(ivf, ["query_id", "neighbor_id"], "left_semi").count()

    codebooks = pq_deterministic_codebooks(corpus, m=8, k=16, dim=64)
    # PQ codes alone cannot rank within-cluster neighbours (32-bit
    # budget; measured 0.18 recall@10 here) — measure BOTH the honest
    # code-only number and the production two-stage shape: exact
    # refine of the ADC shortlist, depth ~2x the mean cluster
    # occupancy so the shortlist covers the true neighbours' cells
    pq_plain = pq_adc_topk(corpus, queries, codebooks, k=k).select(
        "query_id", "neighbor_id"
    )
    pq_plain_hit = exact.join(
        pq_plain, ["query_id", "neighbor_id"], "left_semi"
    ).count()
    refine = max(200, 2 * n // 50)
    pq = pq_adc_topk(corpus, queries, codebooks, k=k, refine=refine).select(
        "query_id", "neighbor_id"
    )
    pq_hit = exact.join(pq, ["query_id", "neighbor_id"], "left_semi").count()

    return {
        "n_items": corpus.count(),
        "n_clusters": 50,
        "sigma": 0.5,
        "k": k,
        "n_queries": queries.count(),
        "n_centroids": n_centroids,
        "autotuned_n_probe": n_probe,
        "probe_fraction": round(n_probe / n_centroids, 4),
        "target_recall": target_recall,
        "tune_curve_head": {
            str(p): curve[p] for p in sorted(curve)[:12]
        },
        "ivf_recall_at_k": round(ivf_hit / n_exact, 4) if n_exact else None,
        "pq_code_only_recall_at_k": (
            round(pq_plain_hit / n_exact, 4) if n_exact else None
        ),
        "pq_refine_depth": refine,
        "pq_refine_fraction": round(refine / n, 4),
        "pq_recall_at_k": round(pq_hit / n_exact, 4) if n_exact else None,
    }


def profile(spark, sf_dir, factors=(10, 100)):
    out = {"sf_dir": sf_dir, "threshold": 0.9, "points": [], "clustered": []}
    for fac in factors:
        t0 = time.time()
        corpus, truth = planted_corpus(spark, sf_dir, fac)
        row = {
            "factor": fac,
            "lsh": lsh_pair_recall(spark, corpus, truth),
            "ivf": ivf_partner_recall(spark, corpus, truth),
            "ivf_topk_vs_brute_uniform": ivf_topk_recall(spark, corpus),
        }
        row["wall_s"] = round(time.time() - t0, 1)
        out["points"].append(row)
        print(json.dumps(row), flush=True)
        spark.catalog.clearCache()
    # r09: the general-purpose serving gate on a corpus with real
    # cluster structure (the uniform corpus above is the honest hard
    # case; this is the claim users rely on for RAG-style retrieval)
    for n in (5_500, 55_000):
        t0 = time.time()
        row = clustered_ivf_pq_point(spark, n)
        row["wall_s"] = round(time.time() - t0, 1)
        out["clustered"].append(row)
        print(json.dumps(row), flush=True)
        spark.catalog.clearCache()
    return out


def main():
    from gnocchi_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("recall-profile")
    res = profile(spark, sf_dir)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "RECALL_r9.json",
    )
    with open(path, "w") as fh:
        json.dump(res, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
