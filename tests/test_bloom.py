"""Bloom filter operator: no false negatives ever; false positives
only where the exact verify disagrees; filter table stays tiny."""

from __future__ import annotations

from pyspark.sql import functions as F

from gnocchi_spark.operators.bloom import (
    batch_dedup_against_corpus,
    bloom_build,
    bloom_membership,
)


def _keyed(spark, ids):
    return spark.createDataFrame(
        [(i, f"key-{i}") for i in ids], "doc_id long, text_key string"
    )


def test_membership_has_no_false_negatives(spark):
    corpus = _keyed(spark, range(0, 200))
    batch = _keyed(spark, range(150, 250))  # 50 overlap, 50 novel
    bloom = bloom_build(corpus, F.col("text_key"), n_bits=1 << 12, k=4)
    assert bloom.count() <= (1 << 12) // 32
    got = {
        r["doc_id"]: r["bloom_hit"]
        for r in bloom_membership(
            batch, bloom, F.col("text_key"), n_bits=1 << 12, k=4
        ).collect()
    }
    for i in range(150, 200):  # every true member must hit
        assert got[i] is True


def test_confirmed_is_exact_and_subset_of_hits(spark):
    corpus = _keyed(spark, range(0, 120))
    batch = _keyed(spark, range(100, 160))
    out = batch_dedup_against_corpus(
        corpus, batch, key_col="text_key", n_bits=256, k=4
    ).collect()
    for r in out:
        if r["confirmed"]:
            assert r["bloom_hit"]  # verify only ran on candidates
        assert r["confirmed"] == (100 <= r["doc_id"] < 120)
