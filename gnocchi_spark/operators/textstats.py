"""Text analysis operators: quality scoring, token stats, language ID,
fingerprinting.  All pure Column expressions — at corpus scale these run
inside whole-stage codegen with zero Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gnocchi_spark.operators.dedup import normalize_text

# Tiny per-language stopword lists for the n-gram/stopword-overlap
# language-ID heuristic.  Deliberately small and deterministic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que", "de", "por"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalize_text(col), " ")


def bpe_ish_token_count(col: Column) -> Column:
    """Approximate subword token count: words + digit runs + punctuation
    marks each count (a BPE-like regex heuristic)."""
    return F.size(
        F.filter(
            F.split(col, r"(?<=\W)|(?=\W)"),
            lambda t: F.trim(t) != "",
        )
    )


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    p = F.length(F.regexp_replace(col, r"[^\p{Punct}]", ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(0.0)


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(0.0)


def mean_word_length(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, low punctuation
    noise, plausible mean word length.  Weights are arbitrary but fixed."""
    n = F.length(col)
    len_score = F.least(n.cast("double") / 200.0, F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    mwl = F.coalesce(mean_word_length(col), F.lit(0.0))
    mwl_score = F.when((mwl >= 3.0) & (mwl <= 10.0), 1.0).otherwise(0.5)
    return F.round(0.4 * len_score + 0.3 * punct_score + 0.3 * mwl_score, 6)


def detect_language(col: Column) -> Column:
    """Stopword-overlap language ID: argmax over per-language hit
    ratios, 'und' (undetermined) when nothing matches."""
    toks = tokens(col)
    n = F.size(toks)
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        scores.append(
            F.struct(
                F.when(n > 0, hits.cast("double") / n.cast("double"))
                .otherwise(0.0)
                .alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0.0, best["lang"]).otherwise("und")


def fingerprint(col: Column) -> Column:
    """Normalized-text content fingerprint (md5 of lowercased,
    whitespace-collapsed text)."""
    return F.md5(normalize_text(col))


def document_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document analysis frame: token/char counts, ratios, quality,
    detected language, fingerprint."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(t).cast("long").alias("n_chars"),
        F.size(tokens(t)).cast("long").alias("n_tokens"),
        bpe_ish_token_count(t).cast("long").alias("n_subwords"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t, "en"), 6).alias("en_stopword_ratio"),
        quality_score(t).alias("quality"),
        detect_language(t).alias("detected_lang"),
        fingerprint(t).alias("fingerprint"),
    )


def winnowing_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the MOSS algorithm): hash every character k-gram (rolling-hash
    role, here md5-derived so any engine reproduces it), slide a
    ``window``-wide window over the positional hash sequence, keep the
    minimum of each window, emit the distinct selected hashes per doc.

    Guarantees: any shared substring of length >= window+k-1 between
    two documents yields at least one shared fingerprint.

    Entirely map-side — positions, hashes, window minima and dedup all
    happen inside one array expression per row (no explode shuffle, no
    window function); the only shuffle is the caller's join/groupBy on
    the output.  Output: (doc_id, fingerprint) one row per distinct
    selected hash.
    """
    from gnocchi_spark.operators.dedup import spread_for_compute

    docs = spread_for_compute(docs)
    t = F.col(text_col)
    n_grams = F.length(t) - (k - 1)
    # The gram-hash array MUST be a materialized column: referencing the
    # transform expression from inside the window lambda would inline it
    # per element and re-hash the whole document for every window
    # position (O(n^2) md5 calls — measured 100x wall-clock).  Multiple
    # references to a non-trivial projection stop Catalyst's
    # CollapseProject from re-inlining it.
    hashed = docs.withColumn(
        "__h",
        # sequence(1, n) is DESCENDING for n < 1 (see char_shingles):
        # docs shorter than k must get an empty array explicitly
        F.when(
            n_grams >= 1,
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda i: F.conv(
                    F.substring(F.md5(F.substring(t, i, k)), 1, 8), 16, 10
                ).cast("long"),
            ),
        ).otherwise(F.array().cast("array<long>")),
    )
    hashes = F.col("__h")
    n_windows = F.size(hashes) - (window - 1)
    fps = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda j: F.array_min(F.slice(hashes, j, window)),
    )
    selected = F.when(n_windows >= 1, F.array_distinct(fps)).otherwise(
        # short docs: fall back to one fingerprint over all grams
        F.when(F.size(hashes) >= 1, F.array(F.array_min(hashes))).otherwise(
            F.array().cast("array<long>")
        )
    )
    return hashed.select(
        F.col(id_col).alias("doc_id"), F.explode(selected).alias("fingerprint")
    )
