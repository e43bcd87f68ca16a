"""Differential fuzz: InfluxDB line-protocol parser vs the reference
semantics (r12).

Random structured line models (measurement / ordered tag pairs /
ordered field pairs / optional ns timestamp) are RENDERED to wire text
with the reference's escaping rules (``\\ `` ``\\,`` ``\\=`` in
unquoted tokens, escChar-quoted string field values —
``/root/reference/gnocchi/rest/influxdb.py:40-55``) and parsed by the
pure-Column ``sources.influxdb.parse_lines``; the expected measures
are computed INDEPENDENTLY in Python straight from the model with the
reference's write-path semantics (``influxdb.py:196-227``):

- duplicated tag/field keys last-win (``dict(list(tok))``,
  influxdb.py:74-87) — the ``DUPLICATED_MAP_KEY`` crash
  ``str_to_map`` used to raise on a single malformed line was found
  while building this suite, and its detection is seeded-bug-checked;
- the ``tag_to_rid`` tag is popped as resource id, lines without it
  drop;
- metric name = ``<measurement>.<field_key>@<k>=<v>,...`` with
  remaining tags sorted by (unescaped) key and ``/`` -> ``_``;
- quoted string field values are skipped; integer ``i``-suffix and
  plain floats become measures; boolean field values map to 1.0/0.0
  (documented leniency — the reference's boolean token is dead code);
- integer ns timestamps floor-divide to microseconds; a missing
  timestamp takes the injected ``now``.

``derandomize=True`` keeps the suite a deterministic gate.
"""

from __future__ import annotations

import pytest
# Extended fuzz/property-hunt tier (r13): excluded from the default
# fast run so the driver verify gate finishes; the full-tier gate
# (-m "slow or not slow") still runs it.
pytestmark = pytest.mark.slow


import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gnocchi_spark.sources.influxdb import parse_lines

_NOW = datetime.datetime(2024, 3, 1, 12, 0, 0)
_EPOCH = datetime.datetime(1970, 1, 1)

# unquoted-token alphabet: no backslash, no quote (those need the
# reference's full quoted-token grammar, documented unsupported); the
# escapable delimiters space/comma/equals ARE included so every token
# position exercises the escape path, plus '/' for the /->_ rename
_TOKEN_CHARS = "abcxyzABC019_-./ ,="
# string-field alphabet exercises the quoted-string escapes
_STR_CHARS = 'abc 019,=/"\\'

_token = st.text(_TOKEN_CHARS, min_size=1, max_size=8).filter(
    lambda s: s.strip(" ") == s and s not in ("",)
)
# small key pools force duplicate-key collisions
_TAG_KEYS = ("host", "zone", "app", "a b", "x=y", "c,d", "p/q")
_FIELD_KEYS = ("usage", "free", "io time", "eq=k", "f/x", "val")

_fval = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False).map(lambda f: ("f", f)),
    st.integers(min_value=-(2**62), max_value=2**62).map(lambda n: ("i", n)),
    st.sampled_from(["t", "T", "true", "TRUE", "True"]).map(lambda b: ("bt", b)),
    st.sampled_from(["f", "F", "false", "FALSE", "False"]).map(lambda b: ("bf", b)),
    st.text(_STR_CHARS, max_size=6).map(lambda s: ("s", s)),
)

_line = st.fixed_dictionaries(
    {
        "meas": _token,
        "tags": st.lists(
            st.tuples(st.sampled_from(_TAG_KEYS), _token), max_size=4
        ),
        "fields": st.lists(
            st.tuples(st.sampled_from(_FIELD_KEYS), _fval),
            min_size=1,
            max_size=4,
        ),
        "ts": st.one_of(
            st.none(), st.integers(min_value=0, max_value=250_000_000_000_000_000)
        ),
    }
)

_batches = st.lists(_line, min_size=1, max_size=6)


def _esc(tok: str) -> str:
    return tok.replace(",", "\\,").replace(" ", "\\ ").replace("=", "\\=")


def _render_fval(kind: str, v) -> str:
    if kind == "f":
        return repr(v)
    if kind == "i":
        return f"{v}i"
    if kind in ("bt", "bf"):
        return v
    return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'


def render(line: dict) -> str:
    head = _esc(line["meas"])
    if line["tags"]:
        head += "," + ",".join(f"{_esc(k)}={_esc(v)}" for k, v in line["tags"])
    fields = ",".join(
        f"{_esc(k)}={_render_fval(kind, v)}" for k, (kind, v) in line["fields"]
    )
    out = f"{head} {fields}"
    if line["ts"] is not None:
        out += f" {line['ts']}"
    return out


def expected(batch: list[dict]) -> list[tuple]:
    rows = []
    for line in batch:
        tags = dict(line["tags"])  # last-wins, reference dict(list(tok))
        fields = dict(line["fields"])
        rid = tags.pop("host", None)
        if rid is None:
            continue
        tags_str = ("@" if tags else "") + ",".join(
            f"{k}={tags[k]}" for k in sorted(tags)
        )
        ts = (
            _EPOCH + datetime.timedelta(microseconds=line["ts"] // 1000)
            if line["ts"] is not None
            else _NOW
        )
        for fk, (kind, v) in fields.items():
            if kind == "s":
                continue
            val = {"f": lambda: float(v), "i": lambda: float(v)}.get(
                kind, lambda: 1.0 if kind == "bt" else 0.0
            )()
            name = (line["meas"] + "." + fk + tags_str).replace("/", "_")
            rows.append((rid, name, ts, val))
    return sorted(rows)


@settings(
    max_examples=80,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(batch=_batches)
def test_line_protocol_roundtrip_matches_reference(spark, batch):
    df = spark.createDataFrame([(render(l),) for l in batch], "line string")
    got = sorted(
        tuple(r) for r in parse_lines(df, now=_NOW).collect()
    )
    want = expected(batch)
    assert got == want, "\n".join(render(l) for l in batch)


def test_duplicate_keys_last_win_not_crash(spark):
    """Regression: a single duplicated tag key used to abort the whole
    batch with DUPLICATED_MAP_KEY; the reference's dict() last-wins."""
    df = spark.createDataFrame(
        [
            ("cpu,host=a,host=b usage=1.5 1000000000",),
            ("cpu,host=a usage=2.5,usage=9i 1000000000",),
            ("mem,host=c,zone=z1,zone=z2 free=1.0 1000000000",),
        ],
        "line string",
    )
    got = sorted(tuple(r) for r in parse_lines(df, now=_NOW).collect())
    t1 = _EPOCH + datetime.timedelta(seconds=1)
    assert got == [
        ("a", "cpu.usage", t1, 9.0),
        ("b", "cpu.usage", t1, 1.5),
        ("c", "mem.free@zone=z2", t1, 1.0),
    ]
