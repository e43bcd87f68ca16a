"""Persisted IVF index: parity with the direct IVF query, manifest-
level file pruning, incremental adds."""

from __future__ import annotations

from pyspark.sql import functions as F

from gnocchi_spark import tables
from gnocchi_spark.operators.ann_index import IvfIndex
from gnocchi_spark.operators.similarity import ivf_cosine_topk


def _corpus_and_queries(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    return emb, queries


def test_served_results_match_direct_ivf(spark, sf_dir, tmp_path):
    emb, queries = _corpus_and_queries(spark, sf_dir)
    centroids = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid"),
        )
    )
    idx = IvfIndex(str(tmp_path / "ivf"), num_sacks=16)
    idx.build(emb, centroids)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in idx.search(queries, k=3, n_probe=2).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in ivf_cosine_topk(
            emb, queries, k=3, n_centroids=8, n_probe=2
        ).collect()
    }
    assert got == want


def test_search_prunes_unprobed_cluster_files(spark, sf_dir, tmp_path):
    emb, queries = _corpus_and_queries(spark, sf_dir)
    centroids = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid"),
        )
    )
    idx = IvfIndex(str(tmp_path / "ivf"), num_sacks=16)
    idx.build(emb, centroids)
    total = len(idx.members.current().files)
    probed = idx._files_for_centroids(spark, ["1", "2"])
    assert 0 < len(probed) < total, (len(probed), total)


def test_incremental_add_appears_in_search(spark, sf_dir, tmp_path):
    emb, queries = _corpus_and_queries(spark, sf_dir)
    centroids = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid"),
        )
    )
    base = emb.where(F.col("vec_id") % 2 == 0)
    rest = emb.where(F.col("vec_id") % 2 == 1)
    idx = IvfIndex(str(tmp_path / "ivf"), num_sacks=16)
    idx.build(base, centroids)
    before = {
        r["neighbor_id"] for r in idx.search(queries, k=5, n_probe=2).collect()
    }
    assert all(n % 2 == 0 for n in before)
    idx.add(rest)
    after = idx.search(queries, k=5, n_probe=2)
    # full-index serving now matches the direct query over everything
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_cosine_topk(
            emb, queries, k=5, n_centroids=8, n_probe=2
        ).collect()
    }
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"] for r in after.collect()
    }
    assert got == want
