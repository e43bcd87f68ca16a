"""Deterministic cardinality sketches as pure Column algebra.

``approx_count_distinct`` (Spark) and ``approx_count_distinct``
(DuckDB) are both HyperLogLog but with engine-private hashing — their
estimates differ, so a cross-engine oracle can only do a rows-only
check.  This module implements HyperLogLog from scratch on md5
arithmetic (Flajolet et al. 2007, the public HLL paper): every step is
deterministic integer math, so the DuckDB oracle reproduces the sketch
REGISTER-FOR-REGISTER and the estimate matches to the last bit — the
correctness gate then covers the whole algorithm, not a tolerance.

Why it matters at 100 TB: exact distinct counts shuffle every distinct
value; the sketch shuffles at most ``2^p`` small integers per group —
``groupBy(register).max`` is algebraic, so map-side combine bounds the
exchange by sketch size, not data size (the same shape as the Bloom
build in operators/bloom.py).  Sketches also MERGE (max per register),
which is what makes pre-aggregated per-partition sketches reunitable —
the property gnocchi's mergeable rollup partials rely on.

Precision: standard error ~= 1.04 / sqrt(2^p); p=9 (512 registers)
gives ~4.6%.  The classic small-range linear-counting correction is
applied when the raw estimate falls below 2.5 * 2^p.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash64(key: Column) -> Column:
    """Uniform 63-bit integer from md5 (16 hex chars = 64 bits; the
    BIGINT parse keeps it non-negative by using 15 nibbles + the sign-
    free top nibble masked via substring from position 2)."""
    return F.conv(F.substring(F.md5(key), 2, 15), 16, 10).cast("long")


def hll_register_cols(key: Column, p: int) -> tuple[Column, Column]:
    """(register_index, rank) for one value: index = low ``p`` bits of
    the hash; rank = 1 + number of leading zeros in the remaining
    ``60 - p`` bits.

    Everything stays in INTEGER arithmetic: index and shift are bit
    ops (a double division would round away low bits past 2^53), and
    floor(log2(w)) is computed as ``length(bin(w)) - 1`` — exact for
    any integer, immune to the 1-ulp libm differences a float log2
    could show between engines."""
    h = _hash64(key)
    idx = h.bitwiseAND(F.lit((1 << p) - 1))
    w = F.shiftright(h, p)  # remaining high bits, exact
    width = 60 - p
    rank = F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(w))
    )
    return idx.cast("int"), rank.cast("int")


def hll_distinct(
    df: DataFrame,
    key: Column,
    group_cols: list[str],
    p: int = 9,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Per-group approximate distinct count of ``key``.

    Two algebraic aggregations: (group, register) -> max rank, then
    group -> harmonic sum over registers.  Empty registers enter the
    harmonic sum as 2^0 via the (2^p - observed) correction term, and
    the linear-counting fallback handles the small-cardinality regime
    — both in plain SQL arithmetic (the oracle replays them).
    """
    idx, rank = hll_register_cols(key, p)
    regs = (
        df.select(*group_cols, idx.alias("__reg"), rank.alias("__rank"))
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rank").alias("__maxrank"))
    )
    return hll_estimate_from_registers(regs, group_cols, p, out_col)


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: list[str],
    p: int = 9,
    out_col: str = "approx_distinct",
    maxrank_col: str = "__maxrank",
) -> DataFrame:
    """Finalize an HLL estimate from a (group, register, max-rank)
    frame — the serving half of :func:`hll_distinct`, split out so
    register tables materialized elsewhere (e.g. the streaming
    register sink) can be estimated at read time, and so sketches
    persisted at different times MERGE by plain ``max`` per register
    before this finalize."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    width = 60 - p
    # the harmonic sum as an EXACT integer: each 2^-rank term scaled by
    # 2^(width+1) is a power-of-two long; the long sum is associative
    # (unlike float addition, whose order Spark's partial aggregation
    # does not fix), so the estimate is bit-reproducible across engines
    term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {width + 1} - {maxrank_col})"
    )
    est = regs.groupBy(*group_cols).agg(
        F.sum(term).alias("__scaled"),
        F.count(F.lit(1)).alias("__nreg"),
    )
    hsum = F.col("__scaled") / F.lit(float(1 << (width + 1)))
    zeros = F.lit(m) - F.col("__nreg")  # registers never touched
    raw = F.lit(alpha * m * m) / (hsum + zeros.cast("double"))
    # linear counting when raw <= 2.5m and some register is empty
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), lc
    ).otherwise(raw)
    return est.select(
        *group_cols, F.round(corrected, 4).alias(out_col)
    )


def hll_error_profile(
    df: DataFrame,
    key: Column,
    group_cols: list[str],
    p: int = 9,
) -> DataFrame:
    """Sketch estimate side-by-side with the exact distinct count and
    the relative error — the validation view a deployment would keep
    for sketch-precision monitoring.  The exact count is computed with
    an ordinary count-distinct (two-shuffle expand); the sketch path
    stays the two small aggregations."""
    approx = hll_distinct(df, key, group_cols, p)
    exact = df.groupBy(*group_cols).agg(
        F.countDistinct(key).cast("long").alias("exact_distinct")
    )
    return approx.join(exact, group_cols).select(
        *group_cols,
        "approx_distinct",
        "exact_distinct",
        F.round(
            (F.col("approx_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_error"),
    )


def expected_standard_error(p: int) -> float:
    return 1.04 / math.sqrt(1 << p)


def _exact_rank_cols(q: float, n_col, below_col, cnt_col):
    """Exact-integer crossing-bin rank arithmetic shared by
    :func:`binned_quantile` and :func:`quantile_from_bin_counts`.

    ``q`` is taken as the rational its decimal literal denotes
    (0.95 -> 19/20) so the crossing test is exact in every engine.
    The target rank numerator is qn*(n-1)+qd against qd-scaled
    cumulative counts; for non-dyadic q whose decimal repr has a huge
    denominator (q=1/3 -> qd ~ 1e16) the product qn*(n-1) overflows
    BIGINT once n exceeds ~2700 and non-ANSI Spark wraps silently, so
    all products are carried in decimal(38,0) — exact up to
    n ~ 1e22 even at qd = 1e16, far beyond any 100-TB group.

    Returns (tnum, below_s, cnt_s) decimal Columns; callers compare
    them and take ``(tnum - below_s) / cnt_s`` as the interpolation
    fraction (cast to double at the single final division).
    """
    from fractions import Fraction

    fr = Fraction(str(q))
    qn, qd = fr.numerator, fr.denominator
    dec = "decimal(38,0)"
    qn_d = F.lit(qn).cast(dec)
    qd_d = F.lit(qd).cast(dec)
    tnum = qn_d * (n_col - 1).cast(dec) + qd_d
    below_s = qd_d * below_col.cast(dec)
    cnt_s = qd_d * cnt_col.cast(dec)
    return tnum, below_s, cnt_s


def binned_quantile(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    q: float,
    bins: int = 256,
    out_col: str = "approx_quantile",
) -> DataFrame:
    """Two-pass fixed-bin histogram quantile — the scale path next to
    the exact interpolated percentile in functions/aggregates.py.

    Exact percentiles sort (or collect) every value per group; at
    100 TB that is the whole table through a shuffle.  This sketch is
    two algebraic aggregations: pass 1 takes per-group min/max, pass 2
    counts values into ``bins`` equal-width bins, and the quantile is
    linearly interpolated inside the bin where the cumulative count
    crosses ``q * n``.  Shuffle volume is ``bins`` longs per group.
    Error is bounded by the bin width ((max-min)/bins), which a
    deployment tunes; the estimate is DETERMINISTIC (integer bin
    counts, fixed interpolation), so the oracle replays it exactly —
    unlike t-digest/GK implementations whose internals are
    engine-private.

    Bin rule: i = clamp(floor((v - min) / width), 0, bins-1); the
    cumulative-crossing bin is interpolated as
    lo + width * (target - below) / bin_count with target = q*(n-1)+1
    (the same "linear" convention as the exact percentile kernel, so
    the two paths agree when every value is distinct and bins are
    fine enough).  Degenerate groups (min == max) return min.
    """
    stats = df.groupBy(*group_cols).agg(
        F.min(value_col).alias("__lo"),
        F.max(value_col).alias("__hi"),
        F.count(value_col).alias("__n"),
    )
    j = df.join(F.broadcast(stats), group_cols)
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    raw_bin = F.floor((F.col(value_col) - F.col("__lo")) / width)
    bin_idx = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(F.greatest(raw_bin, F.lit(0)), F.lit(bins - 1))
    )
    counts = (
        j.groupBy(*group_cols, bin_idx.cast("int").alias("__bin"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    # cumulative below each bin, ordered by bin index within the group
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = counts.withColumn(
        "__below", F.coalesce(F.sum("__c").over(w), F.lit(0))
    ).join(F.broadcast(stats), group_cols)
    # 1-based linear rank q*(n-1) + 1 == (qn*(n-1) + qd) / qd, kept
    # exact in decimal(38,0) (see _exact_rank_cols: a double q here vs
    # a DECIMAL literal in a SQL oracle flips round(…, 6) at dyadic
    # interpolation points, and BIGINT wraps for non-dyadic q at n>2700)
    tnum, below_s, cnt_s = _exact_rank_cols(
        q, F.col("__n"), F.col("__below"), F.col("__c")
    )
    hit = cum.where((below_s < tnum) & (tnum <= below_s + cnt_s))
    width2 = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    frac = (tnum - below_s).cast("double") / cnt_s.cast("double")
    est = F.when(F.col("__hi") == F.col("__lo"), F.col("__lo")).otherwise(
        F.col("__lo") + width2 * (F.col("__bin") + frac)
    )
    return hit.select(*group_cols, F.round(est, 6).alias(out_col))


def cms_tables(
    df: DataFrame,
    key: Column,
    d: int = 4,
    w: int = 1024,
    weight: Column | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of ``key``
    frequencies: ``d`` hash rows x ``w`` counters, returned as
    (row, idx, cnt) — at most d*w rows regardless of traffic.

    The d hash functions are md5 slices (8 hex chars each from one
    digest — same family trick as bloom_positions), so the sketch is
    deterministic and engine-replayable.  The build is ONE algebraic
    aggregation: map-side combine bounds the shuffle by sketch size,
    the same scaling argument as bloom_build/hll_distinct.  Sketches
    merge by adding counters, so per-partition or per-day sketches
    re-unite for free.
    """
    if not 1 <= d <= 4:
        raise ValueError("d must be in 1..4 (one md5 digest)")
    digest = F.md5(key)
    wgt = weight if weight is not None else F.lit(1).cast("long")
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row"),
                    (
                        F.conv(
                            F.substring(digest, 1 + 8 * j, 8), 16, 10
                        ).cast("long")
                        % F.lit(w)
                    ).cast("int").alias("idx"),
                    wgt.alias("wgt"),
                )
                for j in range(d)
            ]
        )
    ).alias("e")
    return (
        df.select(rows)
        .select("e.row", "e.idx", "e.wgt")
        .groupBy("row", "idx")
        .agg(F.sum("wgt").alias("cnt"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    key: Column,
    d: int = 4,
    w: int = 1024,
    out_col: str = "cms_count",
) -> DataFrame:
    """Point-estimate each candidate key's frequency from a CMS built
    with the same (d, w): min over the d counters the key hashes to —
    an overestimate by construction (collisions only add).  The sketch
    broadcasts; the candidate side stays distributed, so querying a
    million candidates is map-side + one small re-group, the corpus
    untouched."""
    digest = F.md5(key)
    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row"),
                    (
                        F.conv(
                            F.substring(digest, 1 + 8 * j, 8), 16, 10
                        ).cast("long")
                        % F.lit(w)
                    ).cast("int").alias("idx"),
                )
                for j in range(d)
            ]
        )
    ).alias("p")
    cols = candidates.columns
    probed = candidates.select(*cols, probes).select(
        *cols, "p.row", "p.idx"
    )
    joined = probed.join(F.broadcast(sketch), ["row", "idx"], "left")
    return joined.groupBy(*cols).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias(out_col)
    )


def fixed_bin_col(value: Column, lo: float, hi: float, bins: int) -> Column:
    """Bin index for FIXED bounds — the mergeable sibling of the
    data-dependent rule inside :func:`binned_quantile`.  Fixed bounds
    are what make histogram counts sum-mergeable across batches,
    windows, and engines: every producer bins against the same grid,
    so counters add.  Out-of-range values clamp into the edge bins
    (their mass is counted; only their position saturates), matching
    the clamp in the two-pass batch path."""
    width = (hi - lo) / float(bins)
    raw = F.floor((value - F.lit(lo)) / F.lit(width))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")


def histogram_counts(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float,
    hi: float,
    bins: int = 256,
    bin_col: str = "bin",
    count_col: str = "cnt",
) -> DataFrame:
    """Per-group fixed-grid histogram: one algebraic aggregation,
    shuffle bounded by ``bins`` longs per group.  Rows from different
    runs / windows / partitions MERGE by summing ``count_col`` — the
    quantile finalize happens at read time via
    :func:`quantile_from_bin_counts`."""
    b = fixed_bin_col(F.col(value_col), lo, hi, bins)
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, b.alias(bin_col))
        .agg(F.count(F.lit(1)).alias(count_col))
    )


def quantile_from_bin_counts(
    counts: DataFrame,
    group_cols: list[str],
    q: float,
    lo: float,
    hi: float,
    bins: int = 256,
    bin_col: str = "bin",
    count_col: str = "cnt",
    out_col: str = "approx_quantile",
) -> DataFrame:
    """Finalize a quantile from a (group, bin, count) table — the
    serving half of :func:`histogram_counts`, split out (exactly like
    ``hll_estimate_from_registers``) so counter tables materialized by
    the streaming sink or merged across windows estimate without
    re-reading data.  Deterministic linear interpolation inside the
    crossing bin, same 1-based rank convention as the batch
    :func:`binned_quantile`.

    The rank arithmetic runs on exact integers: ``q`` is taken as the
    rational its decimal literal denotes (0.95 -> 19/20), so the
    crossing-bin test is an integer comparison and the only float op
    is one division with identical operands in every engine — a 0.95
    double here vs a DECIMAL literal in a SQL oracle was measured to
    flip round(…, 6) by one ulp at dyadic interpolation points."""
    from pyspark.sql import Window

    totals = counts.groupBy(*group_cols).agg(
        F.sum(count_col).alias("__n")
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(bin_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = counts.withColumn(
        "__below", F.coalesce(F.sum(count_col).over(w), F.lit(0))
    ).join(F.broadcast(totals), group_cols)
    # target rank q*(n-1) + 1 == (qn*(n-1) + qd) / qd, exact in
    # decimal(38,0) against qd-scaled cumulative counts (BIGINT wraps
    # for non-dyadic q once n > ~2700 — see _exact_rank_cols)
    tnum, below_s, cnt_s = _exact_rank_cols(
        q, F.col("__n"), F.col("__below"), F.col(count_col)
    )
    hit = cum.where((below_s < tnum) & (tnum <= below_s + cnt_s))
    width = (hi - lo) / float(bins)
    frac = (tnum - below_s).cast("double") / cnt_s.cast("double")
    est = F.lit(lo) + F.lit(width) * (F.col(bin_col) + frac)
    return hit.select(*group_cols, F.round(est, 6).alias(out_col))
