"""Golden tests for operators/retrieval.py: BM25 scoring, RAG chunking,
unigram-LM perplexity scoring."""

import math

import pytest
from pyspark.sql import functions as F

from gnocchi_spark.operators.retrieval import (
    bm25_topk,
    chunk_documents,
    unigram_lm_score,
)


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "spark table scan"),
        (2, "spark spark join"),
        (3, "sort merge join table"),
        (4, "hash hash hash table"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_hand_computed(tiny_docs):
    out = bm25_topk(tiny_docs, [(1, ["spark"])], k=10).collect()
    # df(spark)=2 of N=4 docs, avgdl=(3+3+4+4)/4=3.5
    idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    by_doc = {r["doc_id"]: r for r in out}
    assert set(by_doc) == {1, 2}

    def tf_norm(tf, dl):
        return (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.5))

    assert by_doc[1]["score"] == pytest.approx(idf * tf_norm(1, 3), abs=1e-6)
    assert by_doc[2]["score"] == pytest.approx(idf * tf_norm(2, 3), abs=1e-6)
    # doc 2 has higher tf at equal length -> rank 1
    assert by_doc[2]["rnk"] == 1 and by_doc[1]["rnk"] == 2


def test_bm25_multi_term_sums_and_ties_on_doc_id(tiny_docs):
    out = bm25_topk(tiny_docs, [(7, ["sort", "merge"])], k=10).collect()
    assert [r["doc_id"] for r in out] == [3]
    assert out[0]["n_terms_hit"] == 2


def test_bm25_empty_queries_raise(tiny_docs):
    with pytest.raises(ValueError):
        bm25_topk(tiny_docs, [])


def test_chunking_windows_and_tail(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    out = (
        chunk_documents(docs, chunk_tokens=4, stride=3)
        .orderBy("chunk_idx")
        .collect()
    )
    assert [r["start_tok"] for r in out] == [0, 3, 6, 9]
    assert [r["n_tok"] for r in out] == [4, 4, 4, 1]
    assert [r["chunk_idx"] for r in out] == [0, 1, 2, 3]
    # chunk content is pinned byte-for-byte via md5
    import hashlib

    assert out[0]["chunk_md5"] == hashlib.md5(b"a b c d").hexdigest()
    assert out[3]["chunk_md5"] == hashlib.md5(b"j").hexdigest()


def test_chunking_is_map_only(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_unigram_lm_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_lm_score(docs).collect()}
    # counts: a=2, b=2, c=1, total=5
    nll1 = -(math.log(2 / 5) + math.log(2 / 5) + math.log(2 / 5)) / 3
    nll2 = -(math.log(2 / 5) + math.log(1 / 5)) / 2
    assert out[1]["nll"] == pytest.approx(nll1, abs=1e-6)
    assert out[2]["nll"] == pytest.approx(nll2, abs=1e-6)
    assert out[2]["ppl"] == pytest.approx(math.exp(nll2), abs=1e-3)
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 2


def test_bm25_broadcasts_small_sides(tiny_docs):
    plan = (
        bm25_topk(tiny_docs, [(1, ["spark", "table"])], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the (doc, term) aggregation is the only wide shuffle family; the
    # ranking window partitions per query, never globally
    assert "partitionBy=[]" not in plan.replace(" ", "")


def test_rrf_fusion_combines_both_rankings(spark):
    from gnocchi_spark.operators.retrieval import rrf_hybrid_topk

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma epsilon"),
            (2, "zeta eta theta iota"),
            (3, "kappa lambda mu nu"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),   # semantically far from 0
            (2, [0.95, 0.05]), # semantically near 0
            (3, [0.0, -1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = rrf_hybrid_topk(docs, emb, n_queries=1, k=4, pool=4).collect()
    rows = {r["doc_id"]: r for r in out if r["query_id"] == 0}
    # doc 1 wins lexically (shares the "alpha beta gamma" grams),
    # doc 2 wins semantically; fusion surfaces both above doc 3
    assert rows[1]["lex_rank"] == 1
    assert rows[2]["sem_rank"] == 1
    assert rows[1]["rank"] < rows[3]["rank"]
    assert rows[2]["rank"] < rows[3]["rank"]
    # rrf value is the sum of both reciprocal ranks when present
    r1 = rows[1]
    expect = 1.0 / (60 + r1["lex_rank"]) + 1.0 / (60 + r1["sem_rank"])
    assert abs(r1["rrf"] - round(expect, 6)) < 1e-9


def test_mmr_prefers_diverse_over_redundant(spark):
    from gnocchi_spark.operators.retrieval import mmr_rerank

    # query q along +x; A duplicates the best hit, C is diverse.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),   # query
            (1, [1.0, 0.0]),   # A: rel 1.0
            (2, [1.0, 0.0]),   # B: exact duplicate of A
            (3, [0.8, 0.6]),   # C: rel 0.8, diverse
        ],
        "vec_id long, embedding array<float>",
    )
    out = mmr_rerank(
        emb, emb.where(F.col("vec_id") == 0), k=2, pool=3, lam=0.3
    ).collect()
    steps = {r["step"]: r for r in out}
    assert steps[1]["neighbor_id"] == 1  # highest relevance, lowest id
    # with a strong diversity weight the duplicate B loses to C
    assert steps[2]["neighbor_id"] == 3
    # mmr = 0.3*0.8 - 0.7*cos(C,A) = 0.24 - 0.7*0.8
    assert abs(steps[2]["mmr_score"] - round(0.3 * 0.8 - 0.7 * 0.8, 5)) < 1e-6


def test_mmr_releases_its_caches(spark):
    """mmr_rerank must not leak persisted RDDs (r10 hygiene): the
    pool/pair persists are released after the greedy rounds and the
    per-round checkpoints flow through the bounded memo, so repeated
    calls plateau instead of growing by (2 persists + k-1 checkpoints)
    per call."""
    from gnocchi_spark.operators import dedup as D
    from gnocchi_spark.operators.retrieval import mmr_rerank

    emb = spark.createDataFrame(
        [(i, [1.0 * (i % 3), 1.0 * ((i + 1) % 3)]) for i in range(12)],
        "vec_id long, embedding array<float>",
    )

    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    def run():
        mmr_rerank(
            emb, emb.where(F.col("vec_id") < 2), k=3, pool=5, lam=0.5
        ).count()

    run()  # warm: leaves at most the memo-registered final round
    before = n_persisted()
    for _ in range(4):
        run()
    # without the release, 4 calls grow by >= 8 persists + 8 round
    # checkpoints; with it, only memo-owned finals remain (LRU-bounded)
    assert n_persisted() - before <= D._ASSIGNMENT_CACHE.max_entries
