"""Lexical retrieval and RAG-prep operators: BM25 scoring, fixed-window
document chunking, and a corpus-trained unigram-LM score (the CCNet-style
perplexity-filter signal).

These complete the similarity-search surface next to the vector paths in
operators/similarity.py: ANN answers "what is semantically near", BM25
answers "what matches these terms" — a retrieval stack needs both, and a
pretraining pipeline uses the LM score as a quality gate (CCNet, Wenzek
et al. 2019, keeps the low-perplexity tail of each language bucket).

Scale shapes (all pure Column expressions, no Python in the loop):

- BM25 filters the exploded token stream to the query vocabulary BEFORE
  any shuffle, so the (doc, term) aggregation carries only matching
  postings — corpus size drops out of the shuffle except for the tiny
  per-doc length table.  Document frequencies over the query vocabulary
  and the corpus-level (N, avgdl) scalars broadcast back.  The final
  ranking window partitions per query, never globally.
- chunking is map-only: one ``split`` per document, one ``sequence`` of
  window starts, ``slice``/``array_join`` per chunk.  Output size is
  input tokens x (chunk/stride) — no shuffle at all, so it scales as a
  pure scan no matter the corpus size.
- the unigram LM is two aggregations: a vocabulary-sized count table
  (broadcast back onto the token stream) and the per-document mean.
  Vocabulary grows ~log corpus, so the broadcast holds at 100 TB where
  a KenLM-style external model file would be loaded per executor anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gnocchi_spark.operators.textstats import tokens


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, list[str]]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents per query under BM25 (Robertson/Lucene form:
    ``idf = ln(1 + (N - df + .5)/(df + .5))``, tf saturation ``k1``,
    length normalization ``b``).

    ``queries`` is a small literal list of (query_id, [terms]) — the
    query workload, not data — so it enters the plan as an inlined
    broadcast relation.  Ties break on doc_id for a deterministic
    total order (same device as tfidf_top_terms).
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    qvocab = sorted({t for _, ts in queries for t in ts})

    spark = docs.sparkSession
    qrows = [(int(qid), t) for qid, ts in queries for t in set(ts)]
    qdf = spark.createDataFrame(qrows, "query_id int, term string")

    t = F.col(text_col)
    # NOT spread (r12): measured +1.0 s — ``base`` feeds two branches
    # (lens + tf), so a round-robin repartition re-executes its
    # sort-before-repartition on both, costing more than the one-core
    # tokenization it parallelizes.  The vocabulary filter keeps the
    # exploded stream tiny, so the map stage is cheap even unspread.
    base = docs.where(F.length(t) > 0).select(
        F.col(id_col).alias("doc_id"), tokens(t).alias("__toks")
    )
    lens = base.select("doc_id", F.size("__toks").alias("dl"))
    stats = lens.agg(
        F.count("*").cast("double").alias("__n"),
        F.avg("dl").alias("__avgdl"),
    )
    # Filter to the query vocabulary BEFORE the (doc, term) shuffle:
    # only matching postings ever leave the map side.
    tf = (
        base.select("doc_id", F.explode("__toks").alias("term"))
        .where(F.col("term").isin(qvocab))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(lens), "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("__term_score", idf * tf_norm)
        .join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("__term_score").alias("score"),
            F.count("*").cast("long").alias("n_terms_hit"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 9).desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "query_id",
            "doc_id",
            F.round("score", 6).alias("score"),
            "n_terms_hit",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG-style fixed-window chunking: overlapping ``chunk_tokens``-token
    windows every ``stride`` tokens, with provenance (doc, index, token
    offset, token count) and the chunk text hash for downstream joins.

    Map-only: the token array is materialized once per document and each
    window is a ``slice`` over it — no shuffle, output rows ~= tokens /
    stride.  The md5 keeps oracle hashing cheap while still pinning the
    exact chunk content byte-for-byte.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    t = F.col(text_col)
    base = docs.where(F.length(t) > 0).select(
        F.col(id_col).alias("doc_id"), tokens(t).alias("__toks")
    )
    n = F.size("__toks")
    starts = F.sequence(F.lit(0), n - 1, F.lit(int(stride)))
    exploded = base.select(
        "doc_id",
        "__toks",
        n.alias("__n"),
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    chunk = F.slice(F.col("__toks"), F.col("start_tok") + 1, int(chunk_tokens))
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(F.lit(int(chunk_tokens)), F.col("__n") - F.col("start_tok"))
        .cast("long")
        .alias("n_tok"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


def unigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean negative log-likelihood under a unigram LM
    trained on the corpus itself (MLE: ``p(t) = count(t) / total``), plus
    the perplexity ``exp(nll)``.

    This is the shape of CCNet's perplexity quality gate with the
    external KenLM swapped for a self-trained table: two aggregations
    (vocabulary counts, per-doc mean) and one broadcast join — every
    token appears in its own training corpus, so no smoothing branch is
    required and the score is exactly reproducible in SQL.
    """
    t = F.col(text_col)
    tok = (
        docs.where(F.length(t) > 0)
        .select(F.col(id_col).alias("doc_id"), F.explode(tokens(t)).alias("term"))
    )
    counts = tok.groupBy("term").agg(F.count("*").cast("double").alias("c"))
    total = counts.agg(F.sum("c").alias("__total"))
    return (
        tok.join(F.broadcast(counts), "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.avg(-F.log(F.col("c") / F.col("__total"))).alias("__nll"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round("__nll", 6).alias("nll"),
            F.round(F.exp("__nll"), 4).alias("ppl"),
        )
    )


def bigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
) -> DataFrame:
    """Per-document mean negative log-likelihood under an add-k-smoothed
    bigram LM trained on the corpus itself:

        p(w_i | w_{i-1}) = (c(w_{i-1} w_i) + k) / (c_ctx(w_{i-1}) + k·V)

    where ``c_ctx`` counts non-final occurrences (so the conditional
    sums to 1 over the vocabulary before smoothing) and ``V`` is the
    corpus vocabulary size.  A sharper quality signal than the unigram
    gate (word-salad documents score badly even when their word choice
    is common); same reproducibility contract — every statistic is a
    corpus aggregate, so the score replays exactly in SQL.

    Scale: the bigram table grows with corpus (NOT broadcastable at
    100 TB), so the token stream joins it with an ordinary hash join on
    the (prev, nxt) key; the context table is attached to the bigram
    table FIRST (same `prev` key, table-sized build side) so the big
    stream shuffles once, not twice.  V is a 1-row broadcast.
    """
    t = F.col(text_col)
    base = docs.where(F.length(t) > 0).select(
        F.col(id_col).alias("doc_id"), tokens(t).alias("toks")
    )
    bg = (
        base.where(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS prev, toks[i + 1] AS nxt))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.prev").alias("prev"), F.col("b.nxt").alias("nxt"))
    )
    c2 = bg.groupBy("prev", "nxt").agg(F.count("*").cast("double").alias("c2"))
    c1 = bg.groupBy("prev").agg(F.count("*").cast("double").alias("c1"))
    vocab = (
        base.select(F.explode("toks").alias("term"))
        .agg(F.count_distinct("term").cast("double").alias("__v"))
    )
    model = c2.join(c1, "prev")
    return (
        bg.join(model, ["prev", "nxt"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.avg(
                -F.log(
                    (F.col("c2") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("__v"))
                )
            ).alias("__nll"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round("__nll", 6).alias("nll"),
            F.round(F.exp("__nll"), 4).alias("ppl"),
        )
    )


def _tfidf_weights(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, term, w, df) TF-IDF weights over the FULL vocabulary
    (idf = ln(N/df); ubiquitous terms keep ~0 weight instead of being
    dropped, so cosine stays a true full-vector cosine)."""
    t = F.col(text_col)
    tok = docs.where(F.length(t) > 0).select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(t)).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    nn = docs.where(F.length(t) > 0).agg(
        F.count("*").cast("double").alias("__n")
    )
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("__n") / F.col("df").cast("double"))).alias(
                "w"
            ),
            "df",
        )
    )


def _tfidf_weights_ckpt(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """:func:`_tfidf_weights` behind a reclaim-only registered lazy
    checkpoint — referenced by the blocking, both verification sides
    and the norms, so lineage is truncated to run tokenization once;
    the blocks belong to the bounded LRU instead of leaking (r10)."""
    from gnocchi_spark.operators.dedup import reclaimable_local_checkpoint

    return reclaimable_local_checkpoint(
        _tfidf_weights(docs, id_col, text_col), "tfidf_weights"
    )


def tfidf_pair_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_terms: int = 4,
    bucket_cap: int = 50,
    _weights: DataFrame | None = None,
) -> DataFrame:
    """Distinct (doc_a, doc_b) candidate pairs via rarest-term prefix
    blocking (Bayardo et al. WWW'07 family): each document emits its
    ``rare_terms`` lowest-df terms as blocking keys, every key's
    posting list is capped at ``bucket_cap`` members by deterministic
    md5 rank, and candidates are the within-bucket pairs.

    This bounds candidate volume BY CONSTRUCTION:
    <= N * rare_terms * bucket_cap ordered pairs — linear in the
    corpus no matter how the df distribution scales (an absolute df
    threshold goes degenerate on corpora whose every df grows with N).
    Near-duplicates share their rarest terms, so recall concentrates
    exactly where the signal is.  The md5 bucket rank replays in SQL,
    same technique as the co-occurrence graph cap."""
    w = (
        _weights
        if _weights is not None
        else _tfidf_weights_ckpt(docs, id_col, text_col)
    )
    rare = Window.partitionBy("doc_id").orderBy("df", "term")
    block = (
        w.withColumn("__rt", F.row_number().over(rare))
        .where(F.col("__rt") <= rare_terms)
        .select("term", "doc_id")
    )
    bucket = Window.partitionBy("term").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    capped = (
        block.withColumn("__rk", F.row_number().over(bucket))
        .where(F.col("__rk") <= bucket_cap)
        .select("term", "doc_id")
    )
    cb = capped.select(F.col("term").alias("t2"), F.col("doc_id").alias("doc_b"))
    return (
        capped.join(cb, (capped.term == cb.t2) & (capped.doc_id != cb.doc_b))
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )


def tfidf_cosine_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_terms: int = 4,
    bucket_cap: int = 50,
    k: int = 5,
) -> DataFrame:
    """Sparse all-pairs document similarity, two-phase like the dedup
    family: (1) rarest-term prefix blocking with md5-capped posting
    lists generates candidate pairs — volume bounded by construction
    at N * rare_terms * bucket_cap (see tfidf_pair_candidates); (2)
    each candidate is verified with a FULL-vector TF-IDF cosine via a
    relational dot product (candidates join one side\'s terms, then
    meet the other side on the (doc, term) key), top-``k`` partners
    kept per document.  Ranking ties break on (round(cosine, 6),
    partner id) so both engines select identical top-k sets."""
    w = _tfidf_weights_ckpt(docs, id_col, text_col)
    nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    cand = tfidf_pair_candidates(
        docs, id_col, text_col, rare_terms, bucket_cap, _weights=w
    )
    wa = w.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa")
    )
    wb = w.select(
        F.col("doc_id").alias("__b2"),
        F.col("term").alias("t2"),
        F.col("w").alias("wb"),
    )
    dot = (
        cand.join(wa, "doc_a")
        .join(
            wb,
            (F.col("term") == F.col("t2")) & (F.col("doc_b") == F.col("__b2")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    cos = dot.join(na, "doc_a").join(nb, "doc_b").select(
        "doc_a", "doc_b", (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cosine")
    )
    rk = Window.partitionBy("doc_a").orderBy(
        F.round("cosine", 6).desc(), F.col("doc_b")
    )
    return (
        cos.withColumn("rank", F.row_number().over(rk).cast("int"))
        .where(F.col("rank") <= k)
        .select("doc_a", "doc_b", F.round("cosine", 6).alias("cosine"), "rank")
    )


def rrf_hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    pool: int = 20,
    rrf_k: int = 60,
    ngram: int = 3,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    2009): query-by-example over the first ``n_queries`` documents,
    fusing a lexical ranking (distinct word-``ngram`` Jaccard) with a
    semantic ranking (exact cosine over the aligned embedding row) via
    ``rrf = sum 1/(rrf_k + rank)`` over each side's top-``pool``.

    Scale shape: both sides broadcast the tiny query slice against the
    corpus — the corpus itself never shuffles; each ranking window
    partitions per query; the fusion join carries at most
    ``2 * pool * n_queries`` rows.
    """
    from gnocchi_spark.operators.dedup import spread_for_compute
    from gnocchi_spark.operators.pipeline import token_ngrams
    from gnocchi_spark.operators.similarity import cosine
    from gnocchi_spark.operators.textstats import tokens

    # spread both corpus sides (r12): tokenization/n-grams and the
    # per-pair intersect/cosine are CPU-dense, and one-file scans run
    # them on a single core.  Safe: every downstream value is per-row
    # or a totally-ordered rank window — partitioning cannot show.
    docs = spread_for_compute(docs)
    embeddings = spread_for_compute(embeddings)
    toks = docs.where(F.length(F.col("text")) > 0).select(
        F.col(doc_id_col).alias("doc_id"), tokens(F.col("text")).alias("__t")
    )
    grams = toks.where(F.size("__t") >= ngram).select(
        "doc_id", F.array_distinct(token_ngrams(F.col("__t"), ngram)).alias("g")
    )
    qg = grams.where(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("query_id"), F.col("g").alias("qg")
    )
    inter = F.size(F.array_intersect(F.col("qg"), F.col("g")))
    union = F.size("qg") + F.size("g") - inter
    lex_w = Window.partitionBy("query_id").orderBy(
        F.round(inter.cast("double") / union, 6).desc(), F.col("doc_id")
    )
    lex = (
        grams.join(F.broadcast(qg), F.col("doc_id") != F.col("query_id"))
        .withColumn("lex_rank", F.row_number().over(lex_w))
        .where(F.col("lex_rank") <= pool)
        .select("query_id", "doc_id", "lex_rank")
    )
    qe = embeddings.where(F.col(vec_id_col) < n_queries).select(
        F.col(vec_id_col).alias("query_id"), F.col("embedding").alias("qv")
    )
    sem_w = Window.partitionBy("query_id").orderBy(
        F.round(cosine(F.col("embedding"), F.col("qv")), 6).desc(),
        F.col("doc_id"),
    )
    sem = (
        embeddings.select(F.col(vec_id_col).alias("doc_id"), "embedding")
        .join(F.broadcast(qe), F.col("doc_id") != F.col("query_id"))
        .withColumn("sem_rank", F.row_number().over(sem_w))
        .where(F.col("sem_rank") <= pool)
        .select("query_id", "doc_id", "sem_rank")
    )
    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer").withColumn(
        "__rrf",
        F.coalesce(F.lit(1.0) / (rrf_k + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (rrf_k + F.col("sem_rank")), F.lit(0.0)),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("__rrf"), 9).desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.round("__rrf", 6).alias("rrf"),
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("sem_rank").cast("int").alias("sem_rank"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance reranking (Carbonell & Goldstein
    1998): greedily pick ``k`` results from each query's top-``pool``
    cosine candidates, trading relevance against redundancy —
    ``mmr = lam * rel(c) - (1 - lam) * max cos(c, already_picked)``.

    Scale shape: the only corpus-sized work is the top-``pool``
    retrieval (broadcast query side, corpus never shuffles).  The
    greedy loop then runs entirely on the pooled frame — at most
    ``pool`` rows and ``pool^2`` pairwise-similarity rows PER QUERY,
    independent of corpus size — as ``k - 1`` tiny join+window rounds.
    Pairwise similarities round to 6 dp before the max so the selection
    is engine-reproducible (same device as every ranking here).
    """
    from gnocchi_spark.operators.similarity import cosine, cosine_topk

    one_minus = 1.0 - lam
    pool_df = cosine_topk(corpus, queries, k=pool, id_col=id_col, vec_col=vec_col)
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v"))
    p = cv.join(F.broadcast(pool_df), "neighbor_id").persist()
    pr = (
        p.alias("a")
        .join(
            p.alias("b"),
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.neighbor_id") != F.col("b.neighbor_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.neighbor_id").alias("a_id"),
            F.col("b.neighbor_id").alias("b_id"),
            F.round(cosine(F.col("a.__v"), F.col("b.__v")), 6).alias("pcos"),
        )
        .persist()
    )
    chosen = p.where(F.col("rank") == 1).select(
        "query_id",
        "neighbor_id",
        F.lit(1).alias("step"),
        F.round(F.lit(lam) * F.col("cosine"), 5).alias("mmr_score"),
    )
    from gnocchi_spark.operators.dedup import (
        _tracked_local_checkpoint,
        _unpersist_handles,
        register_result_handles,
    )

    prev_handles: list = []
    for step in range(2, k + 1):
        ch = chosen.select("query_id", F.col("neighbor_id").alias("b_id"))
        div = (
            pr.join(ch, ["query_id", "b_id"])
            .groupBy("query_id", F.col("a_id").alias("neighbor_id"))
            .agg(F.max("pcos").alias("__div"))
        )
        mmr = F.lit(lam) * F.col("cosine") - F.lit(one_minus) * F.coalesce(
            F.col("__div"), F.lit(0.0)
        )
        w = Window.partitionBy("query_id").orderBy(
            F.round(mmr, 6).desc(), F.col("neighbor_id")
        )
        pick = (
            p.join(
                ch.select("query_id", F.col("b_id").alias("neighbor_id")),
                ["query_id", "neighbor_id"],
                "left_anti",
            )
            .join(div, ["query_id", "neighbor_id"], "left")
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(
                "query_id",
                "neighbor_id",
                F.lit(step).alias("step"),
                F.round(mmr, 5).alias("mmr_score"),
            )
        )
        # truncate lineage per greedy round: `pick` references `chosen`
        # twice (redundancy max + anti-join), so the plan otherwise
        # doubles per step (r03 audit: 521 exchanges / 1206 scans at
        # k=5).  Per-round checkpoint hygiene (r10, the CC-loop
        # pattern): eager-checkpoint the (queries*step)-row chosen set,
        # then free the previous round's dead blocks; the final
        # round's blocks are memo-registered reclaim-only below.
        chosen, handles = _tracked_local_checkpoint(chosen.union(pick))
        _unpersist_handles(prev_handles)
        prev_handles = handles
    # the greedy rounds are done and the final chosen set is eagerly
    # materialized, so the pool/pair caches are dead — release them
    # (plain persists, lineage intact: a k=1 caller that never entered
    # the loop just recomputes the tiny pool on action)
    p.unpersist(False)
    pr.unpersist(False)
    if prev_handles:
        chosen = register_result_handles(chosen, prev_handles, "mmr_chosen")
    return chosen
