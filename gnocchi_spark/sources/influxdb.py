"""InfluxDB line-protocol ingest (reference ``gnocchi/rest/influxdb.py``).

Wire format per line::

    measurement[,tag=v[,tag2=v2]] field=value[,field2=v2] [timestamp_ns]

Reference semantics reproduced (``rest/influxdb.py:154-259``):

- one tag (default ``host``) is popped as the resource id
  (``DEFAULT_TAG_RESOURCE_ID``, ``influxdb.py:121``);
- metric name is ``<measurement>.<field_key>@<tag>=<v>,...`` with the
  remaining tags sorted by key, ``/`` replaced by ``_``
  (``influxdb.py:213-227``);
- integer field values carry an ``i`` suffix, strings are quoted and
  *skipped* (only numeric fields become measures, ``influxdb.py:215-217``);
- a missing timestamp defaults to the chunk's ingest time
  (``influxdb.py:196-197``);
- duplicated tag or field keys last-win, exactly the reference's
  ``dict(list(tok))`` on both groups (``influxdb.py:74-87``): maps are
  built under ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (set by
  ``_ensure_last_win``) — the default ``EXCEPTION`` policy throws
  ``DUPLICATED_MAP_KEY`` and would let a single malformed line kill a
  whole batch (r12 fuzz finding; the conf replaces an interpreted
  O(n²) keep-last filter that cost +2.5 s per 100k-line batch).

Deliberate leniency: boolean field values parse to 1.0/0.0.  The
reference DEFINES a boolean token with that action (``influxdb.py:
40-42``) but never wires it into ``field_value`` (dead code — its
grammar rejects the line); accepting the obvious intent beats
dropping the whole line in a bulk engine.

Implementation is pure Column expressions (regexp + map functions), so
parsing stays inside whole-stage codegen — no Python in the hot path.

Escapes (reference grammar ``influxdb.py:40-55``): lines containing a
backslash or quote take a sanitize branch — quoted string field values
(``f="a b"``, escChar ``\\``) collapse to a marker token (string fields
are skipped as measures anyway, ``influxdb.py:215-217``), and the
escaped delimiters ``\\ `` ``\\,`` ``\\=`` become control-char
sentinels so the split pipeline can't see them; tokens are unescaped
after tokenization.  Clean lines never pay the extra replaces.  Quoted
*measurements/tags/field keys* remain unsupported (dropped, documented)
— the reference needs its full pyparsing grammar for those.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_TAG_RESOURCE_ID = "host"

# sentinel control chars standing in for escaped delimiters during the
# split phase; assumed absent from real payloads
_S_SPACE, _S_COMMA, _S_EQ, _S_QSTR = "\x01", "\x02", "\x03", "\x04"


def _sanitize(line: Column) -> Column:
    """Hide quoted string field values and escaped delimiters from the
    delimiter splits.  ``\\\\`` (escaped backslash) is left alone: the
    reference's unquoted_string keeps a lone backslash literal, and the
    left-to-right replace below then treats a following delimiter escape
    correctly (``\\\\ `` -> literal backslash + literal space)."""
    s = F.regexp_replace(line, r'="(?:[^"\\]|\\.)*"', "=" + _S_QSTR)
    s = F.replace(s, F.lit("\\ "), F.lit(_S_SPACE))
    s = F.replace(s, F.lit("\\,"), F.lit(_S_COMMA))
    s = F.replace(s, F.lit("\\="), F.lit(_S_EQ))
    return s


def _unescape(col: Column) -> Column:
    return F.translate(col, _S_SPACE + _S_COMMA + _S_EQ, " ,=")


def _kv_map(col: Column) -> Column:
    """``k=v[,k2=v2]`` group -> map, via the native ``str_to_map``.

    Verified drop-in for the previous split/transform/map_from_entries
    pipeline (bit-identical over the sf0.1 corpus and the same corner
    behavior: limit-2 value split so values may contain ``=``, entries
    without ``=`` get a NULL value, empty entries an empty key — both
    dropped downstream; LAST_WIN dedup applies the same).  Besides
    being one native pass, this removes an interpreted higher-order
    ``transform`` whose double ``split`` re-ran at EVERY collapsed
    use site of the map column (project-collapse duplicates the
    subtree and interpreted HOFs get neither codegen nor
    subexpression elimination — measured >5x the whole parse wall)."""
    return F.str_to_map(col, F.lit(","), F.lit("="))


def _ensure_last_win(df: DataFrame) -> None:
    """Duplicated tag/field keys must last-win, exactly the reference's
    ``dict(list(tok))`` on both groups (``influxdb.py:74-87``).  Under
    Spark's default ``EXCEPTION`` dedup policy ``str_to_map``
    instead throws ``DUPLICATED_MAP_KEY`` and a single malformed line
    kills the whole batch (r12 fuzz finding).  ``LAST_WIN`` gives the
    reference semantics natively inside codegen — the r12 optimization
    pass measured the previous pure-Column O(n²) keep-last filter at
    +2.5 s per 100k-line batch (interpreted HOF per entry), i.e. the
    conf IS the fast path, not a shortcut.  Runtime-settable; also
    pinned session-wide by ``queries.ensure_session_conf``, and set
    here so direct library calls parse identically."""
    df.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")

_NUMBER_RE = r"^[+-]?((\d+(\.\d*)?)|(\.\d+))([eE][+-]?\d+)?$"
_INTEGER_RE = r"^[+-]?\d+i$"
_BOOL_TRUE_RE = r"^(True|true|TRUE|T|t)$"
_BOOL_FALSE_RE = r"^(False|false|FALSE|F|f)$"


def _field_value(raw: Column) -> Column:
    """Numeric value of a field, NULL for (skipped) string fields.

    Booleans parse to 1.0/0.0 like the reference grammar's boolean
    action (``influxdb.py:40-42``).
    """
    # branch order + cheap prefilters minimize regex invocations on the
    # hot path: plain numbers (the common case) hit one regex; the
    # integer branch only runs its regex on 'i'-suffixed tokens, the
    # boolean branches never reach a regex at all
    return (
        F.when(
            raw.endswith("i") & raw.rlike(_INTEGER_RE),
            raw.substr(F.lit(1), F.length(raw) - 1).cast("double"),
        )
        .when(raw.rlike(_NUMBER_RE), raw.cast("double"))
        .when(raw.isin("True", "true", "TRUE", "T", "t"), F.lit(1.0))
        .when(raw.isin("False", "false", "FALSE", "F", "f"), F.lit(0.0))
        .otherwise(F.lit(None).cast("double"))
    )


def parse_lines(
    lines: DataFrame,
    line_col: str = "line",
    tag_to_rid: str = DEFAULT_TAG_RESOURCE_ID,
    now: datetime.datetime | None = None,
) -> DataFrame:
    """Parse line-protocol text rows into measures.

    Returns ``(resource_id, metric_name, ts, value)``; lines that fail
    to parse or lack the resource-id tag are dropped (the REST layer's
    400-abort has no per-row equivalent in a bulk engine; callers can
    diff counts to detect rejects).

    100 TB note: narrow map-only plan — no shuffle, no UDF; one
    ``explode`` per field set.  Safe to fuse with the downstream
    rollup ``groupBy``.
    """
    from gnocchi_spark.operators.dedup import spread_for_compute

    # a single text blob (or one-file batch) scans as one partition;
    # the per-line split/parse work is CPU-dense, so spread it first
    # (no-op when the source already has enough partitions)
    lines = spread_for_compute(lines)
    _ensure_last_win(lines)
    now_lit = F.lit(now) if now is not None else F.current_timestamp()
    raw = F.col(line_col)
    # conditional sanitize: clean lines (the overwhelming majority) skip
    # the regexp/replaces entirely — `when` branches evaluate per row
    cooked = F.when(
        raw.contains("\\") | raw.contains('"'), _sanitize(raw)
    ).otherwise(raw)
    df = (
        lines.select(cooked.alias("__line"))
        # a quote surviving sanitize = quoted measurement/tag/field-key
        # (unsupported) or unbalanced quoting -> drop
        .where(~F.col("__line").contains('"'))
    )
    df = df.select(
        F.split(F.col("__line"), " ").alias("parts"),
    ).select(
        F.element_at("parts", 1).alias("head"),
        F.element_at("parts", 2).alias("fieldset"),
        F.when(F.size("parts") >= 3, F.element_at("parts", 3)).alias("ts_str"),
    )
    # split-with-limit beats regexp_extract here: one pass per line vs
    # a regex engine invocation per field (measured on 1M-line batches)
    head_parts = F.split(F.col("head"), ",", 2)
    df = df.select(
        _unescape(F.element_at(head_parts, 1)).alias("measurement"),
        F.coalesce(F.element_at(head_parts, 2), F.lit("")).alias("tagset"),
        "fieldset",
        "ts_str",
    ).where((F.col("measurement") != "") & (F.col("fieldset").isNotNull()) & (F.col("fieldset") != ""))

    # build the tag map directly; duplicated keys last-win via the
    # LAST_WIN dedup policy (_ensure_last_win — the reference's dict()
    # semantics, natively in codegen)
    tags = F.when(F.col("tagset") == "", F.expr("map()")).otherwise(
        _kv_map(F.col("tagset"))
    )
    # unescape AFTER tokenization (keys sort in unescaped order, as the
    # reference's sorted(tags) does) — but only on rows that actually
    # carry a sentinel: `when` branches evaluate lazily per row, so the
    # overwhelmingly-common clean tagset skips both map transforms
    has_sentinel = (
        F.col("tagset").contains(_S_SPACE)
        | F.col("tagset").contains(_S_COMMA)
        | F.col("tagset").contains(_S_EQ)
    )
    tags = F.when(
        has_sentinel,
        F.transform_values(
            F.transform_keys(tags, lambda k, _: _unescape(k)),
            lambda _, v: _unescape(v),
        ),
    ).otherwise(tags)
    df = df.withColumn("tags", tags).withColumn(
        "resource_id", F.element_at("tags", tag_to_rid)
    )
    # reference aborts without the rid tag (influxdb.py:199-207); we drop
    df = df.where(F.col("resource_id").isNotNull())

    # non-rid tags, sorted by key, as "@k=v,k2=v2" (influxdb.py:213-227).
    # r13 (§4, finish the r12 job): the former map_filter("tags", k !=
    # rid) was an interpreted per-row lambda that project-collapse
    # inlined THREE times (the size() guard, the key array, and the
    # per-key element_at lookup each re-ran the filter); sorting
    # map_entries natively and folding the rid skip into the one
    # remaining transform leaves a single lambda site.  Identical
    # output: entries sort by key (keys unique after LAST_WIN dedup, so
    # struct order == key order), the rid entry maps to NULL and
    # array_join drops NULLs — exactly as the old form dropped
    # NULL-valued concat results; `size(tags) > 1` ⟺ "a non-rid tag
    # exists" because the resource_id filter above guarantees the rid
    # key is present.
    entries = F.array_sort(F.map_entries("tags"))
    body = F.array_join(
        F.transform(
            entries,
            lambda e: F.when(
                e["key"] != F.lit(tag_to_rid),
                F.concat(e["key"], F.lit("="), e["value"]),
            ),
        ),
        ",",
    )
    tags_str = F.when(
        F.size("tags") > 1, F.concat(F.lit("@"), body)
    ).otherwise(F.lit(""))
    df = df.withColumn("tags_str", tags_str)

    # timestamp is integer nanoseconds; default = ingest time
    ts = F.when(
        F.col("ts_str").rlike(r"^\d+$"),
        F.timestamp_micros((F.col("ts_str").cast("decimal(38,0)") / 1000).cast("long")),
    ).otherwise(now_lit)
    df = df.withColumn("ts", ts)

    kv = df.select(
        "resource_id",
        "measurement",
        "tags_str",
        "ts",
        # map dedup before explode: the reference's field dict() emits
        # ONE measure for a duplicated field key (last value — the
        # LAST_WIN policy, see _ensure_last_win)
        F.explode(_kv_map(F.col("fieldset"))).alias("__fk", "__fv"),
    ).select(
        "resource_id",
        "measurement",
        "tags_str",
        "ts",
        _unescape(F.col("__fk")).alias("field_key"),
        F.coalesce(F.col("__fv"), F.lit("")).alias("raw"),
    ).where((F.col("field_key") != "") & (F.col("raw") != ""))

    out = kv.select(
        "resource_id",
        F.replace(
            F.concat("measurement", F.lit("."), "field_key", "tags_str"),
            F.lit("/"),
            F.lit("_"),
        ).alias("metric_name"),
        "ts",
        _field_value(F.col("raw")).alias("value"),
    )
    # string-valued fields are skipped, not errors (influxdb.py:215-217)
    return out.where(F.col("value").isNotNull())
