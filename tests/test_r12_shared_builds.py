"""Focused tests for the r12 optimization round's operator-internal
changes: the shared-build memoization (``registered_local_checkpoint``
builder form + ``fp_source`` fingerprinting) and the two semantic
restructures whose equivalence was previously argued only in comments
and the oracle gate (the probe-curve ``total_pairs`` derivation and the
shared per-granularity mean rollup).

Each test pins BOTH halves of an optimization's contract: the sharing
actually fires (the r10 ``nb_features`` memo silently never did — its
key embedded unstable Column reprs), and the shared value is exactly
what the unshared build produces.
"""

import pyspark.sql.functions as F

from gnocchi_spark import tables


def test_registered_checkpoint_builder_runs_once(spark, sf_dir):
    # The r12 builder form: on a memo hit the frame must never be
    # constructed (plan construction has driver cost, and checkpoints
    # registered inside it would add fresh memo entries per call).
    from gnocchi_spark.operators.dedup import registered_local_checkpoint

    docs = tables.load(spark, sf_dir, "documents")
    calls = []

    def build():
        calls.append(1)
        return docs.select("doc_id")

    a = registered_local_checkpoint(build, "r12_test_builder", fp_source=docs)
    b = registered_local_checkpoint(build, "r12_test_builder", fp_source=docs)
    assert b is a, "same key + same input files must be a memo hit"
    assert len(calls) == 1, "the builder must not run on a memo hit"

    c = registered_local_checkpoint(
        build, "r12_test_builder_other_key", fp_source=docs
    )
    assert c is not a
    assert len(calls) == 2, "a different key must build fresh"


def test_nb_scored_shared_build_fires_and_matches_direct(spark, sf_dir):
    # quality_nb_classifier / quality_nb_threshold_curve share one
    # scored table per pass.  The operator-level nb_features memo key
    # used str(Column), whose lambda-variable ids differ per build, so
    # the intended reuse NEVER fired (latent since r10); the query-layer
    # _nb_scored helper keys on an explicit literal.  Two calls must be
    # one build, and the shared table must equal the direct (unshared)
    # classifier output row-for-row — scores are quantized integers, so
    # equality is exact.
    from gnocchi_spark.operators.pipeline import nb_domain_classifier
    from gnocchi_spark.operators.textstats import tokens
    from gnocchi_spark.queries import _nb_scored

    a = _nb_scored(spark, sf_dir)
    b = _nb_scored(spark, sf_dir)
    assert b is a, "the shared NB build must be a memo hit on re-call"

    docs = tables.load(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    pos = F.size(F.filter(t, lambda x: x.isin("spark", "stream", "batch")))
    neg = F.size(F.filter(t, lambda x: x.isin("table", "row", "column")))
    direct = nb_domain_classifier(docs, pos > neg, n_buckets=256)

    got = sorted(map(tuple, a.select(*direct.columns).collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want


def test_mean_series_matches_direct_per_metric_rollup(spark, sf_dir):
    # The ops-DSL family derives every per-type mean series from ONE
    # shared rollup over the full measures table, filtered by metric.
    # Equivalence claim: filtering the grouped output by metric selects
    # exactly the rows a rollup over the pre-filtered measures produces,
    # bit-identically (exact=True is the quantized order-free mean).
    from gnocchi_spark.operators.rollup import rollup
    from gnocchi_spark.queries import _mean_series, _measures

    for event_type in ("click", "view"):
        shared = _mean_series(spark, sf_dir, event_type, 3600.0)
        direct = (
            rollup(
                _measures(spark, sf_dir).where(
                    F.col("metric_id") == event_type
                ),
                ["mean"],
                3600.0,
                exact=True,
            )
            .select(F.col("bucket_ts").alias("ts"), "value")
        )
        got = sorted((r["ts"], r["value"]) for r in shared.collect())
        want = sorted((r["ts"], r["value"]) for r in direct.collect())
        assert got and got == want


def test_span_and_gram_window_tables_memoized(spark, sf_dir):
    # The C4 span pair and the ExactSubstr pair each rebuild one
    # corpus-scale window table 3-4x per pass without the memo; the
    # shared builders must return the SAME checkpoint frame on re-call
    # and key on their shape parameters.
    from gnocchi_spark.operators.pipeline import (
        _positional_gram_table,
        _span_window_table,
    )

    docs = tables.load(spark, sf_dir, "documents")

    a = _span_window_table(docs, 20, "doc_id", "text")
    assert _span_window_table(docs, 20, "doc_id", "text") is a
    assert _span_window_table(docs, 12, "doc_id", "text") is not a

    g = _positional_gram_table(docs, 8, "doc_id", "text")
    assert _positional_gram_table(docs, 8, "doc_id", "text") is g
    assert _positional_gram_table(docs, 5, "doc_id", "text") is not g


def test_probe_curve_total_pairs_equals_independent_exact_count(spark):
    # r12 restructure: total_pairs is derived as the window sum of the
    # curve's own n_hits instead of a second aggregate over the exact
    # pass (which duplicated the O(|sample| x |corpus|) subtree in the
    # physical plan).  The old in-plan identity check became circular,
    # so pin it independently here: every curve row's total_pairs must
    # equal a separately computed count of the exact top-k pairs —
    # including with a NULL-embedding corpus row (dropped by
    # ivf_assign's junk contract; it can never be a top-k neighbor
    # while >= k non-null competitors exist, because NULL cosines rank
    # last).
    from gnocchi_spark.operators.similarity import cosine_topk, ivf_probe_curve

    base = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
    ]
    rows, i = [], 0
    for c in range(3):
        for _ in range(12):
            rows.append(
                (i, [base[c][d] + 0.01 * ((i * 7 + d) % 5) for d in range(4)])
            )
            i += 1
    rows.append((i, None))  # the NULL-embedding corner
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    sample = spark.createDataFrame(
        [rows[m] for m in (0, 5, 13, 25, 30)],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(c, base[c]) for c in range(3)],
        "centroid_id int, centroid array<double>",
    )

    curve = (
        ivf_probe_curve(corpus, sample, cents, k=3)
        .orderBy("probe_rank")
        .collect()
    )
    exact_n = cosine_topk(corpus, sample, k=3).count()

    assert exact_n == 5 * 3
    assert curve, "a non-degenerate fixture must produce a curve"
    assert all(r["total_pairs"] == exact_n for r in curve)
    assert curve[-1]["cum_hits"] == exact_n  # full depth reaches recall 1.0
    assert curve[-1]["recall"] == 1.0
