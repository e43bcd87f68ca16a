"""Unit tests for round-3 pipeline operators: span-level exact dedup,
PII redaction, and SemDeDup-style semantic dedup."""

import pytest
from pyspark.sql import functions as F

from gnocchi_spark.operators.pipeline import pii_redact, span_dedup_profile
from gnocchi_spark.operators.similarity import semantic_dedup


def test_span_dedup_profile(spark):
    # doc 1 and doc 2 share one exact 3-word span; doc 3 repeats its own
    docs = spark.createDataFrame(
        [
            (1, "a b c x y z"),            # spans: "a b c", "x y z"
            (2, "a b c q r s"),            # "a b c" duplicated with doc 1
            (3, "m m m m m m"),            # "m m m" twice (self-dup)
            (4, "unique words only here"),  # 2 spans, no dups ("only here" pads)
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in span_dedup_profile(docs, span_words=3).collect()
    }
    assert out[1]["n_spans"] == 2 and out[1]["n_dup_spans"] == 1
    assert out[2]["n_dup_spans"] == 1
    assert out[3]["n_spans"] == 2 and out[3]["n_dup_spans"] == 2  # both copies
    assert out[3]["dup_ratio"] == 1.0
    assert out[4]["n_dup_spans"] == 0


def test_pii_redact_counts_and_masking(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a.user+x@sub.example.org and b@x.io, ip 192.168.0.1, tel 555-1234"),
            (2, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert out[1]["n_email"] == 2
    assert out[1]["n_ip"] == 1
    assert out[1]["n_phone"] == 1
    assert (
        out[1]["redacted"]
        == "mail <EMAIL> and <EMAIL>, ip <IP>, tel <PHONE>"
    )
    assert out[2]["n_email"] == out[2]["n_ip"] == out[2]["n_phone"] == 0
    assert out[2]["redacted"] == "no pii here at all"


def test_semantic_dedup_drop_rule(spark):
    # vectors 0/1 are centroid-ish anchors; 10 duplicates 0 exactly,
    # 11 is near-orthogonal to everything
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (10, [2.0, 0.0, 0.0]),   # cosine 1.0 with vec 0, same cluster
        (11, [0.0, 1.0, 5.0]),   # nearest centroid 1, but cos < thr
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, n_clusters=2, threshold=0.9).collect()
    }
    assert out[0]["keep"] and out[0]["dup_of"] is None
    assert out[1]["keep"]
    assert not out[10]["keep"] and out[10]["dup_of"] == 0
    assert out[10]["dup_cosine"] == 1.0
    assert out[11]["keep"]  # same cluster as 1 but below threshold
    # every corpus vector gets exactly one verdict row
    assert len(out) == 4


def test_incremental_minhash_matches(spark):
    from gnocchi_spark.operators.dedup import incremental_minhash_matches

    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "completely different content about spark physical plans"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # near-copy of doc 0 (one word changed)
            (1, "the quick brown fox jumps over the lazy cat again and again"),
            # unrelated
            (3, "unrelated text with no overlap whatsoever in its shingles"),
        ],
        "doc_id long, text string",
    )
    out = incremental_minhash_matches(new, corpus, sig_threshold=0.5).collect()
    got = {(r["new_id"], r["corpus_id"]): r["sig_est"] for r in out}
    assert (1, 0) in got and got[(1, 0)] >= 0.5
    assert all(k[0] != 3 for k in got)  # unrelated doc matches nothing


def test_incremental_minhash_shared_build_keeps_sides_apart(spark):
    # r12: the operator builds ONE signature frame over the tagged
    # union of both inputs.  An id that appears in BOTH frames (the
    # key spaces are independent) must still land on its own side:
    # matches are (new_id, corpus_id), never new-vs-new or
    # corpus-vs-corpus, even under id collision.
    from gnocchi_spark.operators.dedup import incremental_minhash_matches

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "completely different content about spark physical plans"
    corpus = spark.createDataFrame(
        [(7, text_a), (8, text_b)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        # id 7 collides with a corpus id but carries DIFFERENT text;
        # id 9 duplicates corpus doc 7's text exactly
        [(7, text_b), (9, text_a)],
        "doc_id long, text string",
    )
    out = incremental_minhash_matches(new, corpus, sig_threshold=0.5).collect()
    got = {(r["new_id"], r["corpus_id"]): r["sig_est"] for r in out}
    assert got[(9, 7)] == 1.0  # exact copy across sides
    assert got[(7, 8)] == 1.0  # the colliding id matched by ITS text
    # no self-pair from the id collision, no same-side pairs
    assert (7, 7) not in got and (9, 8) not in got
