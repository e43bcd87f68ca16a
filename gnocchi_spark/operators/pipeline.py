"""Training-data pipeline operators beyond dedup/ANN: benchmark
decontamination, domain-mixture sampling, intra-document repetition
scoring, TF-IDF keyword extraction, and sequence packing.

These are the corpus-preparation steps a large-scale LLM data pipeline
runs after dedup (operators/dedup.py) and quality scoring
(operators/textstats.py).  All are pure Column expressions — no Python
in the loop — and every shuffle is on a key with bounded per-group
size, so the plans survive a 100 TB corpus:

- decontamination broadcasts the (small) benchmark gram set; the only
  shuffle is the per-document hit count.
- mixture sampling is map-only (deterministic md5 thresholding).
- repetition scoring is map-only (per-row array algebra).
- TF-IDF shuffles on (doc, term) then broadcasts the vocabulary-sized
  document-frequency table back.
- sequence packing computes the global token prefix-sum with the
  distributed two-phase scan (per-band subtotals -> tiny fold ->
  broadcast back), never a global empty-PARTITION-BY window — the same
  pattern as operators/banding.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gnocchi_spark.operators.sampling import sample_key
from gnocchi_spark.operators.textstats import tokens


def hashed_grams(col: Column) -> Column:
    """Word-gram array -> array of 16-byte binary md5 hashes — the ONE
    gram-key discipline every gram-join operator shares (r08): raw
    grams are ~25-50 chars plus Java string overhead, so hashing
    shrinks broadcast/shuffle payloads ~3-4x on-heap and makes join
    keys fixed-width; full 128 bits keeps counts collision-free in
    practice (~1e-15 at 1e12 grams).  Cooperating gram operators MUST
    share this helper — two ops hashing differently would silently
    live in disjoint key spaces."""
    return F.transform(col, lambda g: F.unhex(F.md5(g)))


def token_ngrams(col: Column, n: int) -> Column:
    """Array of space-joined word ``n``-grams from a MATERIALIZED token
    array column.  Documents with fewer than ``n`` tokens yield an
    empty array (``sequence`` would count DOWN for a negative span, so
    the guard is explicit).

    ``col`` must be a plain column reference, not an inline expression:
    the slice lambda reads it once per gram position, so an inlined
    ``split(...)`` would re-tokenize the document O(n_tokens) times —
    the same per-element-inlining trap documented at
    textstats.winnowing_fingerprints.
    """
    m = F.size(col) - (n - 1)
    return F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.array_join(F.slice(col, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def with_token_ngrams(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    out_col: str = "__grams",
    distinct: bool = False,
) -> DataFrame:
    """Attach a word-``n``-gram array column computed via a
    materialized intermediate token array.  Both intermediates are
    referenced more than once downstream, which stops Catalyst's
    CollapseProject from re-inlining the tokenization into every gram
    slice (measured 6x on the decontamination plan: the inlined form
    re-built the gram array per EXPLODED row)."""
    d = df.withColumn("__toks", tokens(F.col(text_col)))
    g = token_ngrams(F.col("__toks"), n)
    if distinct:
        g = F.array_distinct(g)
    return d.withColumn(out_col, g).drop("__toks")


def ngram_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with a held-out benchmark set (the standard
    n-gram-overlap test-set-leakage check run before pretraining).

    Returns one row per contaminated training document:
    (doc_id, n_grams, n_contaminated, contamination_ratio,
    n_bench_docs) where n_grams counts the document's DISTINCT grams,
    n_contaminated those also present in the benchmark, and
    n_bench_docs the number of distinct benchmark documents hit.

    Scale shape: the benchmark side (eval sets are thousands of
    documents, not billions) is broadcast, so the exploded training
    grams never shuffle for the join; the only wide exchange is the
    final per-document count.  Gram explosion is bounded by document
    token count, not corpus size.  Both sides carry grams as 16-byte
    binary md5 (r08, same discipline as dedup.token_shingle_hashes):
    a raw word 5-gram is ~25-30 chars plus Java string overhead, so
    hashing shrinks the broadcast and the exploded probe rows ~3-4x
    on-heap and makes the join key fixed-width; full 128 bits are
    kept, so the contamination counts are collision-free in practice
    (~1e-15 at 1e12 grams).
    """
    from gnocchi_spark.operators.dedup import spread_for_compute

    # gram explosion is ~100x the input bytes: spread a scan whose
    # IO-sized partitioning would run it on a few cores (no-op when the
    # scan already carries enough partitions)
    train = spread_for_compute(train)
    train_grams = with_token_ngrams(train, n, text_col, distinct=True).select(
        F.col(id_col).alias("doc_id"),
        F.size("__grams").alias("n_grams"),
        F.explode(hashed_grams(F.col("__grams"))).alias("gram"),
    )
    # no .distinct() on the benchmark side: grams are array_distinct
    # per doc before the explode, so (bench_doc, gram) rows are already
    # unique for unique benchmark ids — and the downstream counts are
    # countDistinct either way, so even duplicate benchmark ids cannot
    # inflate a result (r08 review: the former distinct was a full
    # exchange + aggregate doing nothing)
    bench_grams = with_token_ngrams(bench, n, text_col, distinct=True).select(
        F.col(id_col).alias("bench_doc"),
        F.explode(hashed_grams(F.col("__grams"))).alias("gram"),
    )
    return (
        train_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.countDistinct("gram").alias("n_contaminated"),
            F.countDistinct("bench_doc").alias("n_bench_docs"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_contaminated").cast("long").alias("n_contaminated"),
            F.round(
                F.col("n_contaminated") / F.col("n_grams").cast("double"), 6
            ).alias("contamination_ratio"),
            F.col("n_bench_docs").cast("long").alias("n_bench_docs"),
        )
    )


def mixture_thresholds(rates: dict[str, float]) -> dict[str, int]:
    """Convert per-domain keep rates to integer md5-bucket thresholds
    (rate of the 2^32 space).  Integer comparison avoids any
    cross-engine float-boundary ambiguity in the keep predicate."""
    return {k: int(v * 2**32) for k, v in rates.items()}


def domain_mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic domain-mixture sampling: keep each document with
    its source's configured probability, decided by a content-
    independent hash of the id (first 8 md5 hex digits as a uniform
    32-bit integer).  Replayable across runs, partitionings and
    engines — rerunning with a higher rate KEEPS every previously kept
    document (nested samples), which is what mixture-tuning sweeps
    need.  Sources absent from ``rates`` are dropped.

    Map-only: no shuffle, no RNG state; filters push down to the scan.
    """
    thresholds = mixture_thresholds(rates)
    bucket = F.conv(F.substring(sample_key(F.col(id_col)), 1, 8), 16, 10).cast(
        "long"
    )
    src = F.col(source_col)
    thr = F.lit(0).cast("long")
    for name, t in sorted(thresholds.items()):
        thr = F.when(src == name, F.lit(t).cast("long")).otherwise(thr)
    return docs.where(bucket < thr)


def repetition_profile(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Intra-document repetition score: the fraction of word ``n``-grams
    that are repeats of an earlier gram in the same document — the
    boilerplate / looping-text signal quality filters cut on (high
    ratio = templated or degenerate text).

    Entirely map-side: gram array, distinct count and ratio are one
    array expression per row; there is NO shuffle at all.  Output:
    (doc_id, n_grams, n_dup, dup_ratio).
    """
    grams = F.col("__grams")
    docs = with_token_ngrams(docs, n, text_col)
    n_grams = F.size(grams)
    n_dup = n_grams - F.size(F.array_distinct(grams))
    return docs.where(n_grams >= 1).select(
        F.col(id_col).alias("doc_id"),
        n_grams.cast("long").alias("n_grams"),
        n_dup.cast("long").alias("n_dup"),
        F.round(n_dup.cast("double") / n_grams.cast("double"), 6).alias(
            "dup_ratio"
        ),
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document (idf = ln(N/df), rank
    ties broken by term so the output is a deterministic total order).

    Scale shape: term frequencies aggregate on (doc, term) — partial
    map-side combine, bounded per-group size.  The document-frequency
    table is vocabulary-sized, so it (and the single-row corpus count)
    broadcast back onto the tf frame; the ranking window partitions by
    document, never globally.
    """
    t = F.col(text_col)
    base = docs.where(F.length(t) > 0).select(
        F.col(id_col).alias("doc_id"), t.alias("__text")
    )
    tf = (
        base.select("doc_id", F.explode(tokens(F.col("__text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = base.agg(F.count("*").cast("double").alias("__n"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("__n") / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.round(F.col("tfidf"), 9).desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round("tfidf", 6).alias("tfidf"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    ctx: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_size: int = 4096,
) -> DataFrame:
    """GPT-style sequence packing: concatenate every document's tokens
    in id order and cut the stream into fixed ``ctx``-token chunks;
    report per-chunk occupancy (how many documents touch each chunk,
    how many of its tokens are filled, the first/last contributing
    document).  This is the concat-and-chunk batching layout
    pretraining pipelines use, and its stats drive ctx/packing-ratio
    choices.

    The global token prefix-sum is computed WITHOUT a global window:
    documents band by ``id DIV band_size``; per-band subtotals (a tiny
    frame, one row per band) fold into exclusive offsets inside a
    single-row array aggregate, which broadcasts back; the running sum
    within a band partitions by band.  Same two-phase-scan shape as
    operators/banding.py — no empty-PARTITION-BY window anywhere, so
    the plan parallelizes at any corpus size.
    """
    t = F.col(text_col)
    d = docs.where(F.length(t) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(t)).cast("long").alias("n_tokens"),
        (F.col(id_col).cast("long") - F.pmod(F.col(id_col).cast("long"), band_size))
        .alias("band"),
    )
    band_totals = d.groupBy("band").agg(F.sum("n_tokens").alias("btot"))
    # exclusive prefix over the (tiny) band summary: sort into one
    # array, fold carrying the running total — an ordinary aggregate,
    # not a window
    arr = F.array_sort(F.collect_list(F.struct("band", "btot")))
    folded = band_totals.agg(
        F.aggregate(
            arr,
            F.struct(
                F.lit(0).cast("long").alias("acc"),
                F.array().cast("array<struct<band:long,off:long>>").alias("out"),
            ),
            lambda a, x: F.struct(
                (a["acc"] + x["btot"]).alias("acc"),
                F.concat(
                    a["out"],
                    F.array(
                        F.struct(
                            x["band"].alias("band"), a["acc"].alias("off")
                        )
                    ),
                ).alias("out"),
            ),
            lambda a: a["out"],
        ).alias("offs")
    ).select(F.explode("offs").alias("o")).select("o.band", "o.off")
    w = (
        Window.partitionBy("band")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = (
        d.join(F.broadcast(folded), "band")
        .withColumn("end", F.col("off") + F.sum("n_tokens").over(w))
        .withColumn("start", F.col("end") - F.col("n_tokens"))
    )
    chunk = F.explode(
        F.sequence(
            F.expr(f"start DIV {ctx}"), F.expr(f"(end - 1) DIV {ctx}")
        )
    ).alias("chunk_id")
    return (
        placed.select("doc_id", "start", "end", chunk)
        .groupBy("chunk_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(
                F.least(F.col("end"), (F.col("chunk_id") + 1) * ctx)
                - F.greatest(F.col("start"), F.col("chunk_id") * ctx)
            ).alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def token_histogram_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document token-histogram quality signals: total tokens,
    distinct tokens, the most-frequent-token share and mean word
    length — the raw inputs of Gopher/C4-style heuristic filters
    (repetition-heavy or vocabulary-collapsed text scores badly on
    max_token_ratio / type_token_ratio long before a model sees it).

    One explode feeds a (doc, token) partial-aggregated count; the
    per-document fold is a second, much smaller aggregation on doc id.
    Every signal derives from that histogram, so the explode is paid
    once.  No Python, no window.
    """
    base = docs.where(F.length(F.col(text_col)) > 0).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    )
    hist = (
        base.select("doc_id", F.explode(tokens(F.col("__text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    n_tokens = F.sum("c")
    return hist.groupBy("doc_id").agg(
        n_tokens.cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.round(F.max("c") / n_tokens.cast("double"), 6).alias("max_token_ratio"),
        F.round(F.count("*") / n_tokens.cast("double"), 6).alias("type_token_ratio"),
        F.round(
            F.sum(F.length("tok") * F.col("c")) / n_tokens.cast("double"), 6
        ).alias("mean_word_len"),
    )


def gopher_quality_filter(
    docs: DataFrame,
    min_tokens: int = 30,
    max_tokens: int = 100000,
    min_ttr: float = 0.4,
    max_top_ratio: float = 0.12,
    min_mwl: float = 3.0,
    max_mwl: float = 10.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-rule heuristic gate (Rae et al. 2021 §A1.1 shape): length
    bounds, type-token-ratio floor, most-frequent-token ceiling and
    mean-word-length band.  Emits every document with its signals and a
    0/1 ``passes`` verdict so the caller can either filter or audit the
    rule mix.  Cost is exactly token_histogram_signals.
    """
    sig = token_histogram_signals(docs, id_col, text_col)
    passes = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("type_token_ratio") >= min_ttr)
        & (F.col("max_token_ratio") <= max_top_ratio)
        & (F.col("mean_word_len") >= min_mwl)
        & (F.col("mean_word_len") <= max_mwl)
    )
    return sig.withColumn("passes", passes.cast("int"))


def _exclusive_band_offsets(band_totals: DataFrame, value_col: str) -> DataFrame:
    """(band, total) -> (band, off) exclusive prefix sums, computed by
    sorting the tiny band summary into one array and folding — an
    ordinary aggregate, never a global window.  Same two-phase-scan
    core as pack_sequences; factored out for reuse."""
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("band"), F.col(value_col).alias("btot")))
    )
    return (
        band_totals.agg(
            F.aggregate(
                arr,
                F.struct(
                    F.lit(0).cast("long").alias("acc"),
                    F.array().cast("array<struct<band:long,off:long>>").alias("out"),
                ),
                lambda a, x: F.struct(
                    (a["acc"] + x["btot"]).alias("acc"),
                    F.concat(
                        a["out"],
                        F.array(F.struct(x["band"].alias("band"), a["acc"].alias("off"))),
                    ).alias("out"),
                ),
                lambda a: a["out"],
            ).alias("offs")
        )
        .select(F.explode("offs").alias("o"))
        .select("o.band", "o.off")
    )


def corpus_shuffle(
    docs: DataFrame,
    n_shards: int = 16,
    seed: str = "42",
    id_col: str = "doc_id",
    key_bands: int = 256,
) -> DataFrame:
    """Deterministic global training-order shuffle + shard layout:
    every document gets a position in the md5(seed:id) total order, a
    round-robin shard assignment and its position within the shard.
    Rerunning with the same seed reproduces the epoch order bit-for-bit
    on any cluster size or partitioning — the property a resumable
    pretraining data loader needs.

    The global rank is a banded two-phase scan: documents band by their
    key's first byte (uniform by construction, so bands stay balanced
    at any corpus size), per-band counts fold into exclusive offsets
    (tiny aggregate), and the within-band rank windows per band — no
    global ORDER BY window, no single-task sort.  Round-robin sharding
    (shard = pos % n_shards) keeps shard sizes within 1 of each other,
    unlike hash-mod sharding whose binomial spread needs rebalancing.
    """
    key = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    d = docs.select(F.col(id_col).alias("doc_id")).withColumn("__k", key)
    d = d.withColumn(
        "band",
        F.pmod(F.conv(F.substring("__k", 1, 2), 16, 10).cast("long"), key_bands),
    )
    totals = d.groupBy("band").agg(F.count("*").alias("n"))
    offs = _exclusive_band_offsets(totals, "n")
    w = Window.partitionBy("band").orderBy("__k", "doc_id")
    return (
        d.join(F.broadcast(offs), "band")
        .withColumn(
            "shuffle_pos", (F.col("off") + F.row_number().over(w) - 1).cast("long")
        )
        .select(
            "doc_id",
            "shuffle_pos",
            F.pmod(F.col("shuffle_pos"), n_shards).cast("int").alias("shard"),
            (F.col("shuffle_pos") / n_shards).cast("long").alias("shard_pos"),
        )
    )


def duplicated_ngram_coverage(
    docs: DataFrame, n: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact-substring duplication signal (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"
    criterion at word granularity): for each document, the fraction of
    its distinct word ``n``-grams that also occur in at least one other
    document.  Pipelines cut or re-weight documents whose coverage
    exceeds a threshold — it catches long shared boilerplate spans that
    whole-document hashing misses.

    Scale shape: distinct grams explode once; the document-frequency
    count partial-aggregates on the gram key (frequent boilerplate
    grams combine map-side, so skew collapses before the shuffle); the
    gram->df join is co-partitioned with that aggregation.  Nothing is
    ever quadratic in corpus size — the pair space is never formed.
    Grams travel as 16-byte binary md5, not ~40-char strings (r08):
    both the df shuffle and the join key shrink ~3-4x on-heap and the
    key compare is fixed-width (measured 4.3x on the same change in
    ngram_decontaminate); 128 bits keeps the counts collision-free in
    practice.
    """
    from gnocchi_spark.operators.dedup import registered_local_checkpoint

    grams = registered_local_checkpoint(
        with_token_ngrams(docs, n, text_col, distinct=True).select(
            F.col(id_col).alias("doc_id"),
            F.explode(hashed_grams(F.col("__grams"))).alias("gram"),
        ),
        # referenced by BOTH the df aggregate and the join probe: the
        # partial-agg exchange cannot be reused for the probe side, so
        # without a materialization boundary the scan+tokenize+gram+md5
        # subtree executes twice (the recurring plan trap — see
        # dedup_candidate_profile).  Registered (not bare) checkpoint:
        # the exploded gram table is corpus-scale and a bare lazy
        # localCheckpoint leaked one such RDD per call for the
        # application lifetime (r09, ADVICE) — the memo's LRU sweep now
        # bounds and reclaims these blocks.
        "duplicated_ngram_coverage",
        n,
        id_col,
        text_col,
    )
    dfreq = grams.groupBy("gram").agg(F.count("*").alias("df"))
    return (
        grams.join(dfreq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum((F.col("df") >= 2).cast("long")).alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.col("n_dup_grams").cast("long").alias("n_dup_grams"),
            F.round(
                F.col("n_dup_grams") / F.col("n_grams").cast("double"), 6
            ).alias("dup_coverage"),
        )
    )


def _span_window_table(
    docs: DataFrame, span_words: int, doc_id: str, text_col: str
) -> DataFrame:
    """Shared fixed-window span table for the C4 pair: one (doc_id,
    pos, span, h) row per ``span_words``-word window, h the 16-byte
    md5 of the span text.

    r12 optimization (§2.4): :func:`span_dedup_profile` and
    :func:`span_dedup_apply` chunk the corpus identically, and inside
    apply the exploded table feeds two subtrees (first-occurrence
    groupBy + the marking join) — three tokenize+slice+md5 corpus
    passes per bench pass became one memoized lazy checkpoint
    (registered-checkpoint LRU discipline: cleared between bench
    passes, never persisted across runs).  Consumers project before
    their exchanges, so the profile's occurrence window still shuffles
    only (doc_id, h) — the span text stays in block storage.  The
    round-robin spread cannot reach values: every downstream is a
    groupBy count, a struct-min, or an array_sort'ed per-doc rebuild.
    """
    from gnocchi_spark.operators.dedup import (
        registered_local_checkpoint,
        spread_for_compute,
    )

    def build():
        words = F.split(F.col(text_col), r"\s+")
        n_spans = F.ceil(F.size(words) / F.lit(span_words)).cast("int")
        spans = F.transform(
            F.sequence(F.lit(0), n_spans - 1),
            lambda i: F.array_join(
                F.slice(words, i * span_words + 1, span_words), " "
            ),
        )
        return (
            spread_for_compute(docs)
            .select(F.col(doc_id), F.posexplode(spans).alias("pos", "span"))
            .withColumn("h", F.unhex(F.md5(F.col("span"))))
        )

    return registered_local_checkpoint(
        build, "c4_span_windows", span_words, doc_id, text_col,
        fp_source=docs,
    )


def span_dedup_profile(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    span_words: int = 20,
) -> DataFrame:
    """Span-level exact duplication profile (the fixed-window form of
    paragraph dedup a la C4/RefinedWeb: documents here are single-block
    text, so "paragraph" = consecutive ``span_words``-word windows).

    Per document: number of spans, number of spans whose exact text
    occurs more than once anywhere in the corpus, and the duplicated
    fraction.  Downstream consumers drop or rewrite documents whose
    dup_ratio exceeds a policy threshold.

    Scale shape: chunking is map-only array algebra; duplication counts
    are ONE shuffle keyed by span hash (a window count, partial-agg
    friendly since identical spans co-locate), and the per-doc re-agg is
    a second shuffle keyed by doc.  Nothing is ever quadratic; the
    frequent-span skew (e.g. boilerplate) lands on single keys where
    AQE skew-split applies.
    """
    # project to (doc_id, 16-byte hash) BEFORE the window: the
    # span-hash exchange otherwise carries the raw ~6x-wider span text
    # (and an unused position) through the shuffle (r08)
    exploded = _span_window_table(docs, span_words, doc_id, text_col).select(
        F.col(doc_id), F.col("h").alias("span_hash")
    )
    occ = F.count(F.lit(1)).over(Window.partitionBy("span_hash"))
    counted = exploded.withColumn("occ", occ)
    return counted.groupBy(doc_id).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum((F.col("occ") > 1).cast("long")).alias("n_dup_spans"),
        F.round(
            F.sum((F.col("occ") > 1).cast("double")) / F.count(F.lit(1)), 6
        ).alias("dup_ratio"),
    )


# Conservative patterns that parse identically under Java regex (Spark)
# and RE2 (DuckDB oracle): no lookaround, no backrefs.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_redact(
    docs: DataFrame,
    text_col: str = "text",
    patterns=PII_PATTERNS,
) -> DataFrame:
    """Detect-and-mask PII spans (emails, IPv4s, phone-shaped numbers).

    Adds one ``n_<kind>`` count per pattern plus ``redacted`` with all
    matches replaced by their tags, applied in patterns order (email
    before ip before phone so partial overlaps resolve identically
    everywhere).  Map-only — counts and replacement are per-row JVM
    regex; no shuffle at any scale.
    """
    out = docs
    red = F.col(text_col)
    for kind, pat, tag in patterns:
        out = out.withColumn(f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat)))
        red = F.regexp_replace(red, pat, tag)
    return out.withColumn("redacted", red)


def span_dedup_apply(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    span_words: int = 10,
) -> DataFrame:
    """Apply C4-style global span dedup: each exact ``span_words``-word
    window of text is kept only at its FIRST occurrence in the corpus
    (lowest ``(doc_id, pos)``); every later occurrence is dropped and
    the surviving spans are re-joined into the deduplicated document.

    This is the transform counterpart of :func:`span_dedup_profile`
    (which only measures duplication): the output per document is the
    span count, how many spans survived, the survival ratio, and an
    md5 of the rebuilt text (the full text would dwarf the stats; the
    hash pins the exact reconstruction for the oracle).

    Scale shape (the part that matters at 100 TB):

    - chunking is map-only array algebra;
    - the first-occurrence table is ONE ``groupBy(span_hash)`` with a
      ``min(struct(doc_id, pos))`` — an algebraic aggregate, so Spark
      map-side-combines it and a billion copies of a boilerplate span
      collapse to one row per partition before the shuffle (no skew
      hot-spot, unlike a window rank over the hash);
    - marking keepers is an equi-join against that table, which has
      exactly ONE row per distinct span — the probe side may be skewed
      on frequent spans but AQE skew-split handles oversized partitions;
    - reassembly is a second shuffle keyed by doc.

    Nothing is quadratic and no global ordering is ever required: the
    "first occurrence" total order is resolved per span key inside the
    aggregate, not by a sort.
    """
    ex = _span_window_table(docs, span_words, doc_id, text_col)
    first = ex.groupBy("h").agg(
        F.min(F.struct(F.col(doc_id).alias("d"), F.col("pos").alias("p"))).alias("fo")
    )
    keep = (F.col(doc_id) == F.col("fo.d")) & (F.col("pos") == F.col("fo.p"))
    marked = ex.join(first, "h").withColumn("keep", keep)
    kept_struct = F.when(F.col("keep"), F.struct("pos", "span"))
    return marked.groupBy(doc_id).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.round(
            F.sum(F.col("keep").cast("double")) / F.count(F.lit(1)), 6
        ).alias("kept_ratio"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["span"],
                ),
                " ",
            )
        ).alias("kept_hash"),
    )


def induce_subword_vocab(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = 6,
    top_n: int = 256,
) -> DataFrame:
    """Frequency-based subword vocabulary induction (the counting pass
    a WordPiece/BPE tokenizer trainer runs over the corpus): every
    substring of length 1..``max_len`` of every word, weighted by the
    word's corpus frequency; the ``top_n`` most frequent pieces win
    (ties broken lexicographically for a deterministic vocab).

    Returns (rank, piece, freq).

    Scale shape — the trick is counting words FIRST: the corpus
    collapses to its word vocabulary (Zipf: millions of entries, not
    trillions) in one map-side-combinable groupBy, and the O(len^2)
    substring explosion runs over vocabulary entries, not corpus
    tokens.  The final top-n is a sort-limit, which Spark executes as
    per-partition top-n + driver merge of n*partitions rows
    (TakeOrderedAndProject) — no global sort shuffle.
    """
    from gnocchi_spark.operators.dedup import spread_for_compute
    from gnocchi_spark.operators.textstats import tokens

    words = (
        spread_for_compute(docs)
        .select(F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_len), F.length("w") - i + 1)
                ),
                lambda l: F.substring(F.col("w"), i, l),
            ),
        )
    )
    freq = (
        words.select(F.explode(pieces).alias("piece"), "c")
        .groupBy("piece")
        .agg(F.sum("c").cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("piece").asc())
        .limit(top_n)
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("piece").asc())
    return freq.withColumn("rank", F.row_number().over(w)).select(
        "rank", "piece", "freq"
    )


def pmi_word_pairs(
    docs: DataFrame,
    min_pair_df: int = 20,
    max_df: int | None = None,
    top_k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_k`` word associations by document-level PMI:
    ``ln(P(a,b) / (P(a) P(b)))`` over document co-occurrence — the
    collocation/association statistic tokenizer and phrase-mining
    passes start from.

    Scale shape: the pair space is generated per document (self-join
    on the doc key), so candidate volume is sum over docs of
    distinct-terms^2 — bounded by document length, not vocabulary or
    corpus size; ``max_df`` additionally drops stopword-dense terms
    before pairing on corpora where near-universal words would
    dominate the per-doc quadratic.  The document-frequency table is
    vocabulary-sized and broadcasts; the pair aggregation reduces to
    at most vocabulary^2 rows with map-side combine.
    """
    from gnocchi_spark.operators.textstats import tokens

    t = F.col(text_col)
    base = docs.where(F.length(t) > 0)
    tok = base.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(t)).alias("term")
    ).distinct()
    dfreq = tok.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    if max_df is not None:
        dfreq = dfreq.where(F.col("df") <= max_df)
    mid = tok.join(F.broadcast(dfreq), "term")
    a = mid.select("doc_id", F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    b = mid.select("doc_id", F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "df_a", "df_b")
        .agg(F.count("*").cast("long").alias("df_ab"))
        .where(F.col("df_ab") >= min_pair_df)
    )
    n_docs = base.agg(F.count("*").cast("double").alias("__n"))
    pmi = F.log(
        F.col("df_ab") * F.col("__n") / (F.col("df_a") * F.col("df_b"))
    )
    w = Window.orderBy(
        F.round(pmi, 9).desc(), F.col("term_a"), F.col("term_b")
    )
    # the global ranking window runs AFTER the pair reduce: its input is
    # the (vocab-bounded, min_pair_df-filtered) pair table, not data
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= top_k)
        .select(
            "term_a",
            "term_b",
            "df_a",
            "df_b",
            "df_ab",
            F.round(pmi, 6).alias("pmi"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def dsir_importance(
    docs: DataFrame,
    is_target: Column,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed-n-gram importance weights for domain-targeted data
    selection (DSIR, Xie et al. 2023, arXiv:2302.03169): score every
    document by the mean log-likelihood ratio of its tokens under a
    target-domain bag-of-hashed-tokens model vs the raw-corpus model.
    Documents whose token distribution looks like the target score
    high; selection then samples by score (importance resampling).

    ``is_target`` marks the rows that define the target distribution
    (e.g. ``F.col("lang") == "en"`` or a curated-source predicate);
    the raw distribution is the whole input.  Laplace-smoothed bucket
    probabilities: p(b) = (count(b) + 1) / (total + n_buckets), with
    tokens hashed into ``n_buckets`` buckets via md5 so any engine
    replays the same buckets bit-for-bit.

    Returns (id_col, n_tokens, dsir_score) with
    dsir_score = round(mean_b log(p_target(b) / p_raw(b)), 6).

    Scale shape: one token-keyed shuffle reduces the corpus to at most
    ``n_buckets`` rows; totals are a 1-row aggregate crossJoined back
    (broadcast); the per-bucket log-ratio table is broadcast to the
    exploded tokens, so the only other wide exchange is the final
    per-document mean.  Nothing in the plan grows with corpus size
    except the two linear passes over the tokens.
    """
    from gnocchi_spark.operators.dedup import spread_for_compute

    toks = (
        spread_for_compute(docs)
        .where(F.length(F.col(text_col)) > 0)
        .select(
            F.col(id_col),
            is_target.alias("__t"),
            F.explode(tokens(F.col(text_col))).alias("__tok"),
        )
        .select(
            id_col,
            "__t",
            (
                F.conv(F.substring(F.md5("__tok"), 1, 8), 16, 10).cast("long")
                % n_buckets
            ).alias("bucket"),
        )
    )
    stats = toks.groupBy("bucket").agg(
        F.count("*").cast("double").alias("cnt_r"),
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).cast("double").alias("cnt_t"),
    )
    totals = stats.agg(
        F.sum("cnt_r").alias("tot_r"), F.sum("cnt_t").alias("tot_t")
    )
    b = F.lit(float(n_buckets))
    ratio = stats.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("cnt_t") + 1.0) / (F.col("tot_t") + b))
            - F.log((F.col("cnt_r") + 1.0) / (F.col("tot_r") + b))
        ).alias("__lr"),
    )
    return (
        toks.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            # order-free mean of the per-token log-ratios: quantize each
            # at 1e-6 (identical pure-IEEE floor in any engine) and sum
            # as LONG so partition scheduling cannot move the rounded
            # score by an ulp (same contract as queries._xmean_col)
            (
                F.floor(
                    F.sum(F.floor(F.col("__lr") * F.lit(1e6) + F.lit(0.5)))
                    .cast("double")
                    / F.lit(1e6)
                    / F.count("*")
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("dsir_score"),
        )
    )


def _positional_gram_table(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """Shared positional ``n``-gram window table: one (doc_id, p, h)
    row per corpus token position, 1-based, h the 16-byte gram hash.

    r12 optimization (§2.4 remove passes outright): this table is the
    dominant pass of BOTH :func:`repeated_span_report` and
    :func:`repeated_span_apply`, and inside each it feeds two consumers
    (a groupBy and a join) that Spark plans as two independent
    subtrees — so one bench pass previously tokenized + hashed the
    corpus FOUR times.  A memoized lazy checkpoint builds it once per
    session pass (registered-checkpoint LRU: cleared between bench
    passes, never persisted across runs).  Values are order-free
    downstream (groupBy counts, struct-min owner, per-doc windows), so
    the round-robin spread cannot reach results.  Empty / short (< n
    tokens) documents yield no gram rows, so callers' pre-filters on
    text length select the exact same rows.

    Cost accepted: the checkpoint materializes one ~28-byte row per
    corpus token into block storage (memory-and-disk) — linear, the
    same object the operator already shuffled per pass; at any scale
    writing it once beats recomputing the tokenize+md5 pipeline 2-4x.
    """
    from gnocchi_spark.operators.dedup import (
        registered_local_checkpoint,
        spread_for_compute,
    )

    def build():
        return (
            with_token_ngrams(spread_for_compute(docs), n, text_col)
            .select(
                F.col(id_col).alias("doc_id"),
                F.posexplode(hashed_grams(F.col("__grams"))).alias(
                    "__p0", "h"
                ),
            )
            .select(
                "doc_id", (F.col("__p0") + 1).cast("long").alias("p"), "h"
            )
        )

    return registered_local_checkpoint(
        build, "positional_grams", n, id_col, text_col, fp_source=docs
    )


def repeated_span_report(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-level MAXIMAL repeated-substring spans — the suffix-array
    dedup of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better", ExactSubstr) re-expressed in linear
    relational passes: every position whose ``n``-token window recurs
    ANYWHERE in the corpus (any document, including self-repeats) is a
    repeat anchor, and overlapping/contiguous anchor windows merge into
    maximal spans — the cut list the ExactSubstr pipeline feeds back
    into training-data filtering.  Complements the existing span ops:
    span_dedup_profile/apply hash FIXED windows (C4 paragraph dedup)
    and duplicated_ngram_coverage reports per-doc mass; this returns
    the actual (start, end) token ranges.

    One row per maximal span: (doc_id, span_start, span_end,
    span_tokens, n_anchors) with 1-based inclusive token positions in
    the normalized-whitespace tokenization and ``n_anchors`` = matched
    window positions merged into the span.  Two adjacent anchors merge
    iff their window starts differ by <= n (overlap or exact
    contiguity), so a span is a run of tokens every one of which lies
    in some recurring n-gram window.

    100 TB shape: the positional window table is ONE row per corpus
    token (8-byte doc id + int position + 16-byte gram hash — the
    linear object the suffix array would also materialize); the
    recurrence count is a map-side-combined groupBy on the hash; the
    anchor join adds exactly one count column (the count side is one
    row per distinct hash, so a window repeated 1e9 times fans out to
    its 1e9 anchor rows and no further); the island merge rides ONE
    doc-keyed exchange with per-doc window frames bounded by document
    length.  Nothing is pairwise, nothing collects.
    """
    pos = _positional_gram_table(docs, n, id_col, text_col)
    recurring = (
        pos.groupBy("h")
        .agg(F.count("*").alias("__c"))
        .where(F.col("__c") >= 2)
        .select("h")
    )
    anchors = pos.join(recurring, "h").select("doc_id", "p")
    w = Window.partitionBy("doc_id").orderBy("p")
    islands = anchors.withColumn(
        "__new",
        F.when(
            F.lag("p").over(w).isNull()
            | ((F.col("p") - F.lag("p").over(w)) > n),
            1,
        ).otherwise(0),
    ).withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "__island")
        .agg(
            F.min("p").alias("span_start"),
            (F.max("p") + (n - 1)).alias("span_end"),
            F.count("*").cast("long").alias("n_anchors"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_anchors",
        )
    )


def nb_domain_classifier(
    docs: DataFrame,
    is_target: Column,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashed naive-Bayes domain classifier over bag-of-words token
    counts — the classic scalable text classifier, trained CLOSED-FORM
    in one distributed pass and scored with exact integer arithmetic.
    This is the cheap quality/domain gate shape real pipelines deploy
    (seed keywords or a curated subset give weak labels; the trained
    model generalizes token-level evidence beyond the seed rule), and
    unlike iterative batch updates it has no step-size pathology: on
    the repo testdata a keyword-router label trains to 0.88-0.89
    accuracy vs a 0.58 majority floor at both sf0.01 and sf0.1.

    ``is_target`` marks the positive class (+1 / -1).  Per-bucket
    weights are Laplace-smoothed class log-likelihood ratios over
    ``n_buckets`` md5 token buckets (the DSIR bucket convention),
    QUANTIZED at 1e-6 into integers: w[b] = floor((ln((cp+1)/(Tp+B))
    - ln((cn+1)/(Tn+B))) * 1e6 + 0.5), plus a class-prior intercept
    ln((n_pos+1)/(n_neg+1)) quantized the same way.  Scores are then
    INTEGER sums (cnt * w summed per doc, + prior), so prediction is
    bit-deterministic on any engine and any partitioning — the only
    doubles are the per-bucket ratio chains on exact integer counts,
    the same exposure class the DSIR gate already carries.

    Returns one row per document: (doc_id, label, score, predicted,
    correct) with score the integer quantized log-odds margin.

    100 TB shape: the (doc, bucket) count table is built with ONE
    shuffle and reused for training and scoring; class-conditional
    bucket stats collapse it to <= ``n_buckets`` rows (map-side
    combined); totals/prior are 1-2 row aggregates crossJoined back
    (broadcast); the weight table broadcasts to the scoring join, so
    the per-doc margin sum is the only other corpus-sized exchange.
    Nothing iterates, nothing reaches the driver.
    """
    from gnocchi_spark.operators.dedup import registered_local_checkpoint

    tok_feats, base = nb_features(docs, is_target, n_buckets, id_col, text_col)
    feats = registered_local_checkpoint(
        tok_feats,
        "nb_features",
        n_buckets,
        # the label predicate AND the column choices MUST key the memo:
        # the input-file fingerprint alone is identical for two calls
        # with different ``is_target`` (or different id/text columns,
        # r10 ADVICE) on the same corpus, and the memoized frame
        # carries the labels derived from those choices — without this
        # a second call would reuse the first call's labeling.  Column
        # repr is deterministic for a given expression tree; differing
        # reprs of equal predicates only forfeit reuse, never
        # correctness.
        str(is_target),
        id_col,
        text_col,
    )
    # class counts in the SHARED (bucket, cp, cn) contract: token rows
    # for buckets >= 0 plus the bucket == -1 sentinel carrying per-class
    # DOCUMENT counts — the same table the streaming refresh sink
    # (streaming/ingest.streaming_nb_counts) maintains incrementally,
    # so batch and streaming provably share the weight derivation
    counts = nb_class_counts(feats, base)
    wdf = nb_weights_from_counts(counts, n_buckets)
    llr = wdf.where(F.col("bucket") >= 0)
    prior = wdf.where(F.col("bucket") == -1).select(F.col("w").alias("p"))
    return (
        feats.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("__m"))
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            "label",
            (F.col("__m") + F.col("p")).cast("long").alias("score"),
            F.when(F.col("__m") + F.col("p") > 0, 1)
            .otherwise(-1)
            .cast("int")
            .alias("predicted"),
            F.when(
                F.when(F.col("__m") + F.col("p") > 0, 1).otherwise(-1)
                == F.col("label"),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("correct"),
        )
    )


def nb_threshold_curve(
    scored: DataFrame,
    n_bins: int = 64,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """Operating-point curve for a scored binary classifier — the
    measured object a pipeline picks its QUALITY-GATE THRESHOLD from
    (r10; the classifier-side twin of
    :func:`~gnocchi_spark.operators.similarity.ivf_probe_curve`, which
    plays the same role for ANN serving).  ``scored`` is any
    (label in {1, -1}, integer score) table, e.g. the output of
    :func:`nb_domain_classifier`.

    Scores are bucketed into ``n_bins`` fixed-width integer bins over
    the observed [min, max] (exact integer floor-division, so the
    binning replays bit-for-bit in a SQL oracle).  One row per
    OBSERVED bin, descending-threshold cumulative: ``threshold`` is
    the smallest observed score in the bin, and (tp, fp, fn, tn)
    describe the rule "predict positive iff score >= threshold".
    precision / recall / f1 are single divisions of exact integers
    (f1 = 2*tp / (2*tp + fp + fn)), rounded at 1e-6 — so every value
    is engine-identical.

    Scale shape: one 4-value global aggregate (1-row broadcast), one
    map-side-combinable ``groupBy(bin)`` over corpus rows, then the
    cumulative window and ratio math run on the <= ``n_bins``-row
    curve — metadata scale, like the IVF probe curve's
    <= n_centroids-row fold.  Nothing sorts the corpus; the only
    corpus-sized exchange is the bin group-by.
    """
    lbl = F.col(label_col)
    s = F.col(score_col).cast("long")
    totals = scored.agg(
        F.sum(F.when(lbl == 1, 1).otherwise(0)).cast("long").alias("__P"),
        F.sum(F.when(lbl == -1, 1).otherwise(0)).cast("long").alias("__N"),
        F.min(s).alias("__lo"),
        F.max(s).alias("__hi"),
    )
    binned = (
        # Pre-project the CASTED score under a fixed alias so the
        # integer-division expr below never interpolates a raw user
        # column name (r11 ADVICE: a name needing quoting, or a
        # non-integral score type, broke the `div` analysis even
        # though the min/max path casted).  `div` on __s (long) is
        # exact SQL integer division, replayable in the oracle.
        scored.select(s.alias("__s"), lbl.alias("__l"))
        .crossJoin(F.broadcast(totals))
        .select(
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    f"((__s - __lo) * {int(n_bins)}) div (__hi - __lo + 1)"
                )
            )
            .alias("bin"),
            F.col("__l"),
            F.col("__s"),
        )
        .groupBy("bin")
        .agg(
            F.min("__s").alias("threshold"),
            F.sum(F.when(F.col("__l") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
            F.sum(F.when(F.col("__l") == -1, 1).otherwise(0))
            .cast("long")
            .alias("n_neg"),
        )
    )
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )

    def r6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    tp = F.sum("n_pos").over(w).cast("long")
    fp = F.sum("n_neg").over(w).cast("long")
    return (
        binned.select("bin", "threshold", "n_pos", "n_neg", tp.alias("tp"), fp.alias("fp"))
        .crossJoin(F.broadcast(totals.select("__P", "__N")))
        .select(
            F.col("bin").cast("int").alias("bin"),
            "threshold",
            "n_pos",
            "n_neg",
            "tp",
            "fp",
            (F.col("__P") - F.col("tp")).alias("fn"),
            (F.col("__N") - F.col("fp")).alias("tn"),
            r6(F.col("tp") / (F.col("tp") + F.col("fp"))).alias("precision"),
            r6(F.col("tp") / F.col("__P")).alias("recall"),
            r6(
                (F.lit(2) * F.col("tp"))
                / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("__P") - F.col("tp"))
            ).alias("f1"),
        )
    )


def repeated_span_apply(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """APPLY step for :func:`repeated_span_report` — the ExactSubstr
    CUT (Lee et al. 2022): remove every token covered by a recurring
    ``n``-token window whose occurrence is NOT the corpus-first one,
    and rebuild the cleaned text.  Keep-first convention: for each
    distinct window hash, the lexicographically first (doc_id,
    position) occurrence is the owner and survives; every other
    occurrence's window is cut.  A token covered by both an owner
    window and a cut window is removed (cut wins — matches "drop the
    second occurrence of the duplicated substring" at token
    granularity).

    Returns one row per non-empty document: (doc_id, n_tokens,
    n_removed, text_clean) — text_clean is the space-joined surviving
    tokens of the normalized-whitespace tokenization, possibly ''.

    100 TB shape: token and positional-window tables are one row per
    corpus token; the owner is a lexicographic ``min(struct(doc_id,
    p))`` — overflow-free for the full 64-bit doc-id range (r10 fix:
    the r09 packed-integer key ``doc_id * 2^20 + p`` silently wrapped
    for hashed ids >= 2^43, degrading "corpus-first" to "arbitrary-
    but-deterministic"), and a struct min is a plain declarative
    aggregate, so it still partial-aggregates map-side on the hash
    key; cut windows explode
    to exactly ``n`` covered positions each (constant fan-out); the
    keep-filter is one (doc, position)-keyed anti join and the rebuild
    is one doc-keyed aggregation whose per-group state is bounded by
    document length.  All four exchanges are key-partitioned and
    linear; nothing pairwise, nothing driver-side.
    """
    from gnocchi_spark.operators.dedup import spread_for_compute

    d = spread_for_compute(docs).where(F.length(F.col(text_col)) > 0)
    toks = d.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("__p0", "tok"),
    ).select("doc_id", (F.col("__p0") + 1).cast("long").alias("p"), "tok")
    # the shared table is built over UNFILTERED docs, but documents
    # with < n tokens contribute zero gram rows, so the rows are
    # exactly this operator's old filtered anchors
    anchors = _positional_gram_table(docs, n, id_col, text_col)
    owners = anchors.groupBy("h").agg(
        F.min(F.struct(F.col("doc_id"), F.col("p"))).alias("__owner")
    )
    cut = anchors.join(owners, "h").where(
        (F.col("doc_id") != F.col("__owner.doc_id"))
        | (F.col("p") != F.col("__owner.p"))
    )
    covered = cut.select(
        "doc_id", F.explode(F.sequence(F.col("p"), F.col("p") + (n - 1))).alias("p")
    ).distinct()
    marked = toks.join(
        covered.withColumn("__cut", F.lit(1)), ["doc_id", "p"], "left"
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("__cut").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__cut").isNull(),
                            F.struct(F.col("p"), F.col("tok")),
                        )
                    )
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text_clean"),
    )


def nb_class_counts(feats: DataFrame, base: DataFrame) -> DataFrame:
    """Fold labeled NB features into the (bucket, cp, cn) class-count
    contract: per-bucket positive/negative TOKEN counts for buckets
    >= 0 plus one bucket == -1 sentinel row carrying per-class
    DOCUMENT counts (the prior's inputs).  ``feats`` is the
    (doc_id, label, bucket, cnt) table, ``base`` one row per labeled
    document.  The table is sum-mergeable by construction — two
    corpora (or two stream windows) combine by summing cp/cn per
    bucket — which is what makes the streaming refresh sink exact."""
    tok = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("label") == 1, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("cp"),
        F.sum(F.when(F.col("label") == -1, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("cn"),
    )
    docs_row = base.agg(
        F.lit(-1).cast("long").alias("bucket"),
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0))
        .cast("long")
        .alias("cp"),
        F.sum(F.when(F.col("label") == -1, 1).otherwise(0))
        .cast("long")
        .alias("cn"),
    ).select("bucket", "cp", "cn")
    return tok.unionByName(docs_row)


def nb_weights_from_counts(counts: DataFrame, n_buckets: int = 256) -> DataFrame:
    """Closed-form NB weight derivation from the (bucket, cp, cn)
    class-count contract (see :func:`nb_class_counts`): Laplace-
    smoothed log-likelihood-ratio weights for token buckets, the
    class-prior intercept from the bucket == -1 document-count
    sentinel, all quantized at 1e-6 into integer ``w`` — the SERVE
    step shared by the batch trainer and the streaming refresh sink
    (merge stored windows by summing cp/cn, then call this).

    Returns (bucket, w): token buckets >= 0 plus the prior at -1.
    """
    b = F.lit(float(n_buckets))

    def q(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")

    tok = counts.where(F.col("bucket") >= 0)
    totals = tok.agg(F.sum("cp").alias("tp"), F.sum("cn").alias("tn"))
    llr = tok.crossJoin(F.broadcast(totals)).select(
        "bucket",
        q(
            F.log((F.col("cp") + 1.0) / (F.col("tp") + b))
            - F.log((F.col("cn") + 1.0) / (F.col("tn") + b))
        ).alias("w"),
    )
    prior = counts.where(F.col("bucket") == -1).select(
        F.col("bucket"),
        q(F.log(F.col("cp") + 1.0) - F.log(F.col("cn") + 1.0)).alias("w"),
    )
    return llr.unionByName(prior)


def nb_features(
    docs: DataFrame,
    is_target: Column,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """The NB feature contract, shared by the batch trainer, the
    streaming refresh sink's equality tests, and any scorer: returns
    (feats, base) where ``feats`` is the labeled hashed-count table
    (doc_id, label, bucket, cnt) — md5 token buckets, the DSIR
    convention — and ``base`` is one (doc_id, label) row per non-empty
    document.  One explode + one (doc, bucket)-keyed shuffle."""
    from gnocchi_spark.operators.dedup import spread_for_compute

    base = (
        spread_for_compute(docs)
        .where(F.length(F.col(text_col)) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.when(is_target, F.lit(1)).otherwise(F.lit(-1))
            .cast("int")
            .alias("label"),
            F.col(text_col).alias("__text"),
        )
    )
    feats = (
        base.select(
            "doc_id", "label", F.explode(tokens(F.col("__text"))).alias("__tok")
        )
        .select(
            "doc_id",
            "label",
            (
                F.conv(F.substring(F.md5("__tok"), 1, 8), 16, 10).cast("long")
                % n_buckets
            ).alias("bucket"),
        )
        .groupBy("doc_id", "label", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return feats, base.select("doc_id", "label")
