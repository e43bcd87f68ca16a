"""Physical-plan regression sweep over the whole query catalog.

Round-1 verdict flagged two scale anti-patterns (all-pairs joins and
empty-partition windows).  Rather than guarding individual queries,
this sweeps every registered query at sf0.001 and asserts neither
pattern can creep back in.  Plans are built and optimized but not
executed, so the sweep stays fast.
"""

from __future__ import annotations

import pytest

from gnocchi_spark.queries import QUERIES

# Queries allowed to carry a broadcast nested-loop join: the
# broadcast side is provably tiny (a handful of query vectors or
# literal codebooks), which is the sanctioned pattern for top-k
# serving — NOT a data-x-data cartesian.
BNL_ALLOWED = {
    "ann_cosine_topk",  # broadcast 10 query vectors against the corpus
    "ann_pq_topk",      # same shape: broadcast probe set, corpus streams
    "ann_pq_refine_topk",  # same ADC stage; refine adds equi joins only
    "tfidf_keywords",   # broadcast 1-row corpus-size scalar (cross)
    "bm25_retrieval",   # broadcast 1-row (N, avgdl) scalar (cross)
    "perplexity_unigram",     # broadcast 1-row vocab-total scalar (cross)
    "hybrid_rrf_retrieval",   # broadcast 5-row query slice, != condition
    "mmr_diversified_topk",   # broadcast 3-row query slice (cosine pool)
    "word_pmi_pairs",         # broadcast 1-row doc-count scalar (cross)
    "embedding_drift_matrix", # broadcast k-row centroid table, < condition
    "tpch_q22_dormant_customers",  # broadcast 1-row global-avg scalar (cross)
    "sample_temperature_mixture",  # broadcast 1-row (wsum, ntot) scalar (cross)
    "select_token_budget",  # broadcast 1-row spent-tokens scalar (cross)
    "tpch_q15_top_supplier",  # broadcast 1-row max-revenue scalar (cross)
    "ann_recall_report",  # broadcast 10-query slice (exact + LSH sides)
    "data_quality_report",  # broadcast 1-row duplicate-key scalar (cross)
    "user_pagerank",  # broadcast 1-row node-count scalar (cross, x4 iterations)
    "metric_freshness",  # broadcast 1-row high-water-mark scalar (cross)
    "hll_audience_overlap",  # broadcast 5-row event-type table, < self-pair
    "metric_lead_lag",  # broadcast 3-row lag table (cross) onto the rollup
    "dsir_importance_weights",  # broadcast 1-row token-total scalar (cross)
    "drift_psi_report",  # broadcast 1-row time-span scalar + 10-row bin grid (cross)
    "drift_ks_test",  # broadcast 1-row time-span scalar (cross)
    "perplexity_bigram",  # broadcast 1-row vocab-size scalar (cross)
    "doc_similarity_tfidf_topk",  # broadcast 1-row doc-count scalar (cross)
    "tpch_q11_important_stock",  # broadcast 1-row total-value threshold (cross)
    "event_association_lift",  # broadcast 1-row basket-total scalar (cross)
    "ann_ndcg_report",  # broadcast 10-query slice (exact + LSH sides)
    "ann_filtered_topk",  # broadcast 5-query slice against filtered corpus
    "metric_change_contributors",  # broadcast 1-row last-hour scalar (cross)
    "quality_nb_classifier",  # broadcast 1-row totals + 1-row prior scalars (cross)
    "ann_probe_curve",  # broadcast 50-query slice + 1-row total-pairs scalar (cross)
    "quality_nb_threshold_curve",  # broadcast 1-row totals/prior + 4-value curve scalars (cross)
}

# Queries allowed a global (empty partitionBy) window: single-series
# ops-DSL reads on an already-aggregated frame whose size is bounded
# by the policy's point count, documented in operators/banding.py.
GLOBAL_WINDOW_ALLOWED: set[str] = {
    # rank assignment runs AFTER limit(top_n): the window's input is at
    # most top_n (256) rows regardless of corpus size
    "vocab_induction",
    # ranking runs AFTER the pair reduce: input is the vocab-bounded,
    # min_pair_df-filtered pair table, not data
    "word_pmi_pairs",
    # cumulative-threshold window runs over the 1024-row score-bin
    # histogram, not the corpus
    "select_token_budget",
    # rank assignment runs AFTER limit(1000): bounded input
    "corpus_zipf_fit",
    # top-10 window runs over the per-user two-hour contributor table
    # (bounded by keys active in two hourly buckets, not traffic)
    "metric_change_contributors",
    # cumulative-recall window runs over the <= n_centroids-row probe
    # curve (metadata scale), never the corpus
    "ann_probe_curve",
    # descending-threshold cumulative window runs over the <= n_bins
    # (64)-row score-bin curve, never the corpus
    "quality_nb_threshold_curve",
    # descending cumulative over the fixed 20-bin jaccard grid
    "dedup_threshold_curve",
}


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    out = {}
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_products(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"cartesian product in: {bad}"


def test_no_unexpected_nested_loop_joins(plans):
    bad = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNL_ALLOWED
    ]
    assert not bad, f"unexpected nested-loop join in: {bad}"


def test_no_empty_partition_windows(plans):
    bad = [
        n
        for n, p in plans.items()
        if _has_global_window(p) and n not in GLOBAL_WINDOW_ALLOWED
    ]
    assert not bad, f"empty-partition window in: {bad}"


def _has_global_window(plan: str) -> bool:
    # A physical Window node prints "Window [funcs], [partition], [order]".
    # Empty lists are omitted, so two-group nodes are ambiguous: the
    # second group is either a partition list (unsorted window — fine)
    # or an order list (GLOBAL sorted window — the scale hazard).  Order
    # expressions always carry a sort direction, so the second group is
    # an order list iff it contains ASC/DESC.
    for line in plan.splitlines():
        s = line.strip()
        while s[:1] in "+-*: (":
            s = s[1:].strip()
        if not s.startswith("Window "):
            continue
        groups = s.split("], [")
        if len(groups) == 1:
            return True  # no partition, no order: global
        if len(groups) == 2 and (" ASC" in groups[1] or " DESC" in groups[1]):
            return True  # second group is a sort spec -> empty partition
    return False


# Shuffle budgets for the flagship operators: the scale contract is
# "this many exchanges, no more" — a regression that doubles the
# shuffle count of a core path should fail CI, not surface at 100 TB.
# Budgets = current audited count (PLAN_AUDIT.md) + 1 slack.
import re as _re

EXCHANGE_BUDGET = {
    "tsdb_rollup_mean_5m": 2,
    "tsdb_rollup_multi_1h": 2,
    "dedup_exact": 2,
    "sessionize_gap": 2,
    "asof_join_nearest": 2,
    "training_set_asof_features": 2,
    "graph_kcore_membership": 2,
    "metric_user_gini": 3,
    "metric_burstiness": 3,
    "tsdb_value_heatmap": 3,
    "tsdb_theil_sen": 4,
    "history_grouped_usage": 5,
    "graph_triangle_count": 8,
    # locks the r06 fan-out fix: the argmin aggregate and the join-back
    # must not re-derive the minhash + CC upstream per reference
    "dedup_cluster_canonical": 3,
}

_EXCH_RE = _re.compile(
    r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)"
)


def test_flagship_exchange_budgets(plans):
    over = {
        n: (len(_EXCH_RE.findall(plans[n])), budget)
        for n, budget in EXCHANGE_BUDGET.items()
        if len(_EXCH_RE.findall(plans[n])) > budget
    }
    assert not over, f"shuffle budget exceeded (got, budget): {over}"
