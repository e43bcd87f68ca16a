"""Training-data pipeline operators: decontamination, mixture
sampling, repetition scoring, TF-IDF, sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from gnocchi_spark.operators.pipeline import (
    domain_mixture_sample,
    mixture_thresholds,
    ngram_decontaminate,
    pack_sequences,
    repetition_profile,
    tfidf_top_terms,
    token_ngrams,
    with_token_ngrams,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# token n-grams
# ---------------------------------------------------------------------------

def test_token_ngrams_basic_and_short(spark):
    df = with_token_ngrams(
        _docs(spark, ["a b c d", "a b", ""]), n=3, out_col="g"
    )
    rows = {r["doc_id"]: r["g"] for r in df.collect()}
    assert rows[0] == ["a b c", "b c d"]
    assert rows[1] == []  # shorter than n
    # "" normalizes to one empty token -> still shorter than n
    assert rows[2] == []


def test_token_ngrams_normalizes_whitespace_and_case(spark):
    df = with_token_ngrams(_docs(spark, ["  A   b\tC  "]), n=2, out_col="g")
    assert df.collect()[0]["g"] == ["a b", "b c"]


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def test_decontaminate_flags_shared_gram(spark):
    train = _docs(
        spark,
        [
            "p q r s t u v",          # shares the bench 5-gram p..t
            "x y z w k j h",          # clean
        ],
    )
    bench = spark.createDataFrame(
        [(100, "p q r s t only here")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in ngram_decontaminate(train, bench, n=5).collect()}
    assert list(out) == [0]
    r = out[0]
    # doc 0 has 3 distinct 5-grams, exactly one of them contaminated
    assert r["n_grams"] == 3
    assert r["n_contaminated"] == 1
    assert r["n_bench_docs"] == 1
    assert abs(r["contamination_ratio"] - 1 / 3) < 1e-6


def test_decontaminate_counts_multiple_bench_docs(spark):
    train = _docs(spark, ["a b c d e f"])
    bench = spark.createDataFrame(
        [(10, "a b c d e"), (11, "b c d e f"), (12, "unrelated text here now")],
        "doc_id long, text string",
    )
    r = ngram_decontaminate(train, bench, n=5).collect()[0]
    assert r["n_grams"] == 2
    assert r["n_contaminated"] == 2
    assert r["n_bench_docs"] == 2


# ---------------------------------------------------------------------------
# domain mixture sampling
# ---------------------------------------------------------------------------

def test_mixture_sample_rate_extremes_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "keep" if i % 2 == 0 else "drop") for i in range(200)],
        "doc_id long, source string",
    )
    out = domain_mixture_sample(df, {"keep": 1.0, "drop": 0.0})
    rows = sorted(r["doc_id"] for r in out.collect())
    assert rows == [i for i in range(200) if i % 2 == 0]
    again = sorted(r["doc_id"] for r in out.collect())
    assert rows == again  # replayable


def test_mixture_sample_nested_rates(spark):
    # a higher rate must keep a superset of a lower rate (nested
    # samples property of threshold sampling)
    df = spark.createDataFrame(
        [(i, "s") for i in range(500)], "doc_id long, source string"
    )
    low = {r["doc_id"] for r in domain_mixture_sample(df, {"s": 0.2}).collect()}
    high = {r["doc_id"] for r in domain_mixture_sample(df, {"s": 0.6}).collect()}
    assert low <= high
    # rate is approximately honored (md5 is uniform)
    assert 0.1 < len(low) / 500 < 0.3
    assert 0.5 < len(high) / 500 < 0.7


def test_mixture_sample_unlisted_source_dropped(spark):
    df = spark.createDataFrame(
        [(1, "known"), (2, "unknown")], "doc_id long, source string"
    )
    out = domain_mixture_sample(df, {"known": 1.0}).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_mixture_thresholds_integer_space():
    t = mixture_thresholds({"a": 0.5, "b": 1.0})
    assert t["a"] == 2**31
    assert t["b"] == 2**32


# ---------------------------------------------------------------------------
# repetition profile
# ---------------------------------------------------------------------------

def test_repetition_profile_hand_computed(spark):
    out = {
        r["doc_id"]: r
        for r in repetition_profile(
            _docs(spark, ["a b a b a b", "u v w x y", "a b"]), n=2
        ).collect()
    }
    # grams of doc 0: [a b, b a, a b, b a, a b] -> 5 grams, 2 distinct
    assert out[0]["n_grams"] == 5
    assert out[0]["n_dup"] == 3
    assert abs(out[0]["dup_ratio"] - 0.6) < 1e-6
    # all-distinct doc
    assert out[1]["n_dup"] == 0
    # doc 2 has exactly one 2-gram -> kept, ratio 0
    assert out[2]["n_grams"] == 1
    # docs shorter than n drop out entirely
    assert set(out) == {0, 1, 2}


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------

def test_tfidf_ranks_rare_terms_first(spark):
    docs = _docs(
        spark,
        [
            "common common rare1",
            "common common rare2",
            "common common common common",
            "common rare3 rare3",
        ],
    )
    out = tfidf_top_terms(docs, k=1)
    top = {r["doc_id"]: r for r in out.collect()}
    # the corpus-unique term always beats the everywhere-term
    assert top[0]["term"] == "rare1"
    assert top[1]["term"] == "rare2"
    assert top[3]["term"] == "rare3"
    assert top[3]["tf"] == 2 and top[3]["df"] == 1
    # doc 2 only contains the ubiquitous term: idf = ln(1) = 0
    assert top[2]["term"] == "common"
    assert abs(top[2]["tfidf"]) < 1e-9
    # rank is dense 1..k and deterministic
    assert all(r["rnk"] == 1 for r in out.collect())


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def test_pack_sequences_hand_computed(spark):
    # tokens per doc: 4, 4, 4; ctx=6 -> stream [0,12) in chunks of 6:
    #   chunk 0 = [0,6): doc0 fully, doc1 tokens [4,6)
    #   chunk 1 = [6,12): doc1 tokens [6,8), doc2 fully
    docs = _docs(spark, ["a b c d", "e f g h", "i j k l"])
    out = {r["chunk_id"]: r for r in pack_sequences(docs, ctx=6).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_docs"] == 2 and out[0]["n_tokens"] == 6
    assert out[0]["first_doc"] == 0 and out[0]["last_doc"] == 1
    assert out[1]["n_docs"] == 2 and out[1]["n_tokens"] == 6
    assert out[1]["first_doc"] == 1 and out[1]["last_doc"] == 2


def test_pack_sequences_doc_spanning_many_chunks(spark):
    # one 10-token doc with ctx=3 spans chunks 0..3
    docs = _docs(spark, ["t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"])
    out = {r["chunk_id"]: r for r in pack_sequences(docs, ctx=3).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert [out[c]["n_tokens"] for c in range(4)] == [3, 3, 3, 1]


def test_pack_sequences_bands_preserve_global_order(spark):
    # band_size smaller than the doc count forces the cross-band
    # offset fold to actually carry totals between bands
    texts = [f"w{i} x y" for i in range(10)]  # 3 tokens each
    docs = _docs(spark, texts)
    out = pack_sequences(docs, ctx=7, band_size=4)
    total = out.agg(F.sum("n_tokens")).collect()[0][0]
    assert total == 30
    rows = {r["chunk_id"]: r for r in out.collect()}
    # 30 tokens in chunks of 7 -> 5 chunks, last has 2
    assert set(rows) == {0, 1, 2, 3, 4}
    assert rows[4]["n_tokens"] == 2
    # doc boundaries: doc k occupies [3k, 3k+3); chunk 2 = [14,21)
    # covers docs 4..6
    assert rows[2]["first_doc"] == 4 and rows[2]["last_doc"] == 6


def test_pack_sequences_no_global_window(spark):
    from tests.test_banding import global_window_lines

    docs = _docs(spark, ["a b c", "d e f"])
    assert global_window_lines(pack_sequences(docs, ctx=4)) == []


# ---------------------------------------------------------------------------
# quality rules / corpus shuffle / duplicated-ngram coverage
# ---------------------------------------------------------------------------

def test_token_histogram_signals_hand_computed(spark):
    from gnocchi_spark.operators.pipeline import token_histogram_signals

    # "a a a b" -> 4 tokens, 2 distinct, max ratio 0.75, ttr 0.5,
    # mean word length 1.0
    out = token_histogram_signals(_docs(spark, ["a a a b"])).collect()[0]
    assert out["n_tokens"] == 4
    assert out["n_distinct"] == 2
    assert out["max_token_ratio"] == 0.75
    assert out["type_token_ratio"] == 0.5
    assert out["mean_word_len"] == 1.0


def test_gopher_filter_verdict_matches_signals(spark):
    from gnocchi_spark.operators.pipeline import gopher_quality_filter

    # doc 0: 40 distinct 3-char words -> passes every rule
    # doc 1: "spam spam ..." -> max_token_ratio 1.0, ttr tiny -> fails
    # doc 2: too short -> fails the length floor
    good = " ".join(f"w{i:02d}" for i in range(40))
    out = {
        r["doc_id"]: r
        for r in gopher_quality_filter(
            _docs(spark, [good, "spam " * 40, "tiny doc"])
        ).collect()
    }
    assert out[0]["passes"] == 1
    assert out[1]["passes"] == 0 and out[1]["max_token_ratio"] == 1.0
    assert out[2]["passes"] == 0 and out[2]["n_tokens"] == 2


def test_corpus_shuffle_deterministic_total_order(spark):
    from gnocchi_spark.operators.pipeline import corpus_shuffle

    docs = _docs(spark, [f"doc {i}" for i in range(50)])
    a = corpus_shuffle(docs, n_shards=4, seed="s1")
    b = corpus_shuffle(docs, n_shards=4, seed="s1")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    rows = a.collect()
    # positions are a permutation of 0..49
    assert sorted(r["shuffle_pos"] for r in rows) == list(range(50))
    # round-robin: shard sizes differ by at most 1; shard/pos derive
    # from the global position
    sizes = {}
    for r in rows:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
        assert r["shard"] == r["shuffle_pos"] % 4
        assert r["shard_pos"] == r["shuffle_pos"] // 4
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_corpus_shuffle_seed_changes_order(spark):
    from gnocchi_spark.operators.pipeline import corpus_shuffle

    docs = _docs(spark, [f"doc {i}" for i in range(50)])
    a = {r["doc_id"]: r["shuffle_pos"] for r in corpus_shuffle(docs, seed="s1").collect()}
    b = {r["doc_id"]: r["shuffle_pos"] for r in corpus_shuffle(docs, seed="s2").collect()}
    assert a != b


def test_corpus_shuffle_no_global_window(spark):
    from tests.test_banding import global_window_lines

    from gnocchi_spark.operators.pipeline import corpus_shuffle

    docs = _docs(spark, ["a", "b", "c"])
    assert global_window_lines(corpus_shuffle(docs)) == []


def test_duplicated_ngram_coverage_hand_computed(spark):
    from gnocchi_spark.operators.pipeline import duplicated_ngram_coverage

    shared = "one two three four"  # the shared 4-gram
    docs = _docs(
        spark,
        [
            shared + " alpha beta",   # grams: 3, one shared
            shared + " gamma delta",  # grams: 3, one shared
            "p q r s t u",            # grams: 3, none shared
        ],
    )
    out = {
        r["doc_id"]: r for r in duplicated_ngram_coverage(docs, n=4).collect()
    }
    assert out[0]["n_grams"] == 3 and out[0]["n_dup_grams"] == 1
    assert out[1]["n_grams"] == 3 and out[1]["n_dup_grams"] == 1
    assert out[2]["n_dup_grams"] == 0
    assert out[0]["dup_coverage"] == round(1 / 3, 6)


def test_duplicated_ngram_coverage_counts_doc_once(spark):
    from gnocchi_spark.operators.pipeline import duplicated_ngram_coverage

    # the repeated gram INSIDE one doc must not count as corpus-level
    # duplication (distinct grams per doc before the df count)
    docs = _docs(spark, ["x y x y x y", "unrelated words here four"])
    out = {
        r["doc_id"]: r for r in duplicated_ngram_coverage(docs, n=2).collect()
    }
    assert out[0]["n_dup_grams"] == 0


class TestDsirImportance:
    def test_target_like_docs_score_higher(self, spark):
        from pyspark.sql import functions as F

        from gnocchi_spark.operators.pipeline import dsir_importance

        # target dialect uses one vocabulary, background another; a
        # held-out doc written in the target dialect must outscore a
        # held-out background doc.
        rows = [(i, "alpha beta gamma delta", True) for i in range(20)]
        rows += [(20 + i, "omega sigma tau rho", False) for i in range(20)]
        rows += [(99, "alpha beta beta gamma", False),   # target-like
                 (98, "omega tau tau sigma", False)]     # background-like
        docs = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
        scores = {
            r["doc_id"]: r["dsir_score"]
            for r in dsir_importance(docs, F.col("t"), n_buckets=64).collect()
        }
        assert scores[99] > 0 > scores[98]
        assert all(scores[i] > 0 for i in range(20))
        assert all(scores[i] < 0 for i in range(20, 40))

    def test_token_count_and_smoothing_floor(self, spark):
        from pyspark.sql import functions as F

        from gnocchi_spark.operators.pipeline import dsir_importance

        docs = spark.createDataFrame(
            [(1, "a b c", True), (2, "a b", False), (3, "", False)],
            "doc_id long, text string, t boolean",
        )
        out = {r["doc_id"]: r for r in dsir_importance(
            docs, F.col("t"), n_buckets=16
        ).collect()}
        assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 2
        assert 3 not in out  # empty text excluded, not scored as zero
        # every score is finite (Laplace smoothing: no log(0) anywhere)
        import math
        assert all(math.isfinite(r["dsir_score"]) for r in out.values())
