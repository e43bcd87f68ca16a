"""Property-based differential fuzzing of the filter-DSL compiler.

r10 VERDICT next #1: the filter DSL (plans/filters.py) is the most
user-facing correctness surface and was verified only by golden tests
plus a fixed oracle set.  Here hypothesis generates random filter ASTs
— nested and/or/not over every binary operator of the reference's REST
schema (gnocchi/rest/api.py:1381-1437), including comparisons against
NULL-holding attributes to stress the null-tolerant ``!=``, virtual
``lifespan`` and ``created_by_*`` attributes, empty ``in`` lists, and
LIKE patterns with metacharacters — and each AST is BOTH compiled to a
Spark Column and independently translated to DuckDB SQL over the same
rows; the selected id sets must match row-for-row.

The translation below is written from the REFERENCE semantics
(gnocchi/indexer/sqlalchemy.py:1469-1618), not from the compiler under
test, so a compiler bug cannot cancel out:

- ``!=`` is null-tolerant: ``attr IS NULL OR attr != v``;
- empty ``in`` is constant FALSE;
- ``lifespan`` = (ended_at - started_at) in seconds;
- ``created_by_user_id``/``created_by_project_id`` = prefix/suffix
  LIKE over ``creator`` with %/_ escaped, NULL-tolerant under ``!=``;
- LIKE uses backslash escape (Spark's default; DuckDB needs it spelled).

``derandomize=True`` keeps the suite a deterministic gate (the same
100+ cases replay every run); bump the hypothesis profile locally for
an open-ended hunt.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest
# Extended fuzz/property-hunt tier (r13): excluded from the default
# fast run so the driver verify gate finishes; the full-tier gate
# (-m "slow or not slow") still runs it.
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gnocchi_spark.plans.filters import compile_filter

# --- shared fixture data ---------------------------------------------------

# Rows crafted to cover: NULL in every filterable attribute, duplicate
# attribute values, LIKE metacharacters in stored strings, creator
# user/project splits sharing prefixes, zero-lifespan and NULL-ended
# resources.
_ROWS = [
    # (id, host, flavor_id, memory, display_name, started_at, ended_at, creator)
    (1, "h1", "1", 1024, "web_front", "2024-01-01 00:00:00", "2024-01-02 00:00:00", "alice:projA"),
    (2, "h1", "2", 2048, "web_back", "2024-01-01 06:00:00", None, "alice:projB"),
    (3, "h2", "1", 512, "db%prod", "2024-01-02 00:00:00", "2024-01-02 00:00:00", "bob:projA"),
    (4, "h2", None, None, "db_prod", "2024-01-03 00:00:00", "2024-01-05 12:00:00", None),
    (5, None, "3", 4096, None, "2024-01-01 00:00:00", "2024-01-10 00:00:00", "alice2:projA2"),
    (6, "h3", "2", 2048, "cache", "2024-02-01 00:00:00", None, "bob:projB"),
    (7, "H1", "10", 1024, "Web_front", "2024-01-01 00:00:00", "2024-01-01 00:30:00", "carol:projA"),
    (8, None, None, None, "%", "2024-03-01 00:00:00", "2024-03-01 01:00:00", "dave:"),
    (9, "h1", "1", 0, "_", "2024-01-04 00:00:00", "2024-01-04 00:00:01", ":projA"),
    (10, "h10", "1", 1024, "web", "2023-12-31 23:59:59", "2024-01-01 00:00:00", "alice:projA"),
]


def _parse_ts(s):
    return datetime.datetime.fromisoformat(s) if s else None


@pytest.fixture(scope="module")
def resources(spark):
    rows = [
        (i, h, f, m, d, _parse_ts(sa), _parse_ts(ea), c)
        for (i, h, f, m, d, sa, ea, c) in _ROWS
    ]
    return spark.createDataFrame(
        rows,
        "id long, host string, flavor_id string, memory long, "
        "display_name string, started_at timestamp, ended_at timestamp, "
        "creator string",
    ).cache()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE resources (id BIGINT, host VARCHAR, flavor_id VARCHAR, "
        "memory BIGINT, display_name VARCHAR, started_at TIMESTAMP, "
        "ended_at TIMESTAMP, creator VARCHAR)"
    )
    con.executemany(
        "INSERT INTO resources VALUES (?,?,?,?,?,?,?,?)",
        [
            (i, h, f, m, d, _parse_ts(sa), _parse_ts(ea), c)
            for (i, h, f, m, d, sa, ea, c) in _ROWS
        ],
    )
    yield con
    con.close()


# --- independent reference translation: AST -> DuckDB SQL ------------------


def _sql_quote(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _escape_like(s: str) -> str:
    return s.replace("%", r"\%").replace("_", r"\_")


_EQ = ("=", "==", "eq")
_NE = ("!=", "ne", "≠")
_CMP = {
    "<": "<", "lt": "<", ">": ">", "gt": ">",
    "<=": "<=", "le": "<=", "≤": "<=", ">=": ">=", "ge": ">=", "≥": ">=",
}


def _attr_sql(attr: str) -> str:
    if attr == "lifespan":
        return "((epoch_us(ended_at) - epoch_us(started_at)) / 1000000.0)"
    return attr


def _leaf_sql(op: str, attr: str, value) -> str:
    if attr in ("created_by_user_id", "created_by_project_id"):
        pat = (
            f"{_escape_like(str(value))}:%"
            if attr == "created_by_user_id"
            else f"%:{_escape_like(str(value))}"
        )
        base = f"creator LIKE {_sql_quote(pat)} ESCAPE '\\'"
        if op in _NE:
            return f"(creator IS NULL OR NOT ({base}))"
        return f"({base})"
    col = _attr_sql(attr)
    if op == "in":
        if not value:
            return "FALSE"
        return f"({col} IN ({', '.join(_sql_quote(v) for v in value)}))"
    if op == "like":
        return f"({col} LIKE {_sql_quote(str(value))} ESCAPE '\\')"
    lit = _sql_quote(value)
    if attr in ("started_at", "ended_at"):
        lit = f"CAST({lit} AS TIMESTAMP)"
    if op in _EQ:
        return f"({col} = {lit})"
    if op in _NE:
        return f"({col} IS NULL OR {col} != {lit})"
    return f"({col} {_CMP[op]} {lit})"


def ast_to_sql(node) -> str:
    (op, payload), = node.items()
    low = op.lower()
    if low in ("and", "∧", "or", "∨"):
        glue = " AND " if low in ("and", "∧") else " OR "
        return "(" + glue.join(ast_to_sql(n) for n in payload) + ")"
    if low == "not":
        return f"(NOT {ast_to_sql(payload)})"
    (attr, value), = payload.items()
    return _leaf_sql(low, attr, value)


# --- hypothesis strategies --------------------------------------------------

_STR_ATTRS = {
    "host": ["h1", "h2", "h3", "H1", "h10", "nope"],
    "flavor_id": ["1", "2", "3", "10", "99"],
    "display_name": ["web_front", "db%prod", "db_prod", "%", "_", "cache", "zz"],
}
_NUM_VALUES = [0, 512, 1024, 2048, 4096, -1, 100000]
_LIFESPAN_VALUES = [0, 1, 1800, 86400, 86400.0 * 2, 777600]
_TS_VALUES = ["2024-01-01 00:00:00", "2024-01-02 00:00:00", "2024-01-03 12:00:00",
              "2023-12-31 23:59:59", "2025-01-01 00:00:00"]
_CREATOR_TOKENS = ["alice", "bob", "carol", "alice2", "projA", "projB",
                   "projA2", "", "x%y", "a_b"]
_LIKE_PATTERNS = ["h%", "%1", "web%", "%\\_%", "db\\%%", "%front", "h_",
                  "%", "_", "zz%"]

_CMP_OPS = ["=", "==", "eq", "<", "lt", ">", "gt", "<=", "le", ">=", "ge",
            "!=", "ne", "≠", "≤", "≥"]


def _leaves():
    str_leaf = st.tuples(
        st.sampled_from(_CMP_OPS),
        st.sampled_from(sorted(_STR_ATTRS)),
    ).flatmap(
        lambda t: st.sampled_from(_STR_ATTRS[t[1]]).map(
            lambda v: {t[0]: {t[1]: v}}
        )
    )
    num_leaf = st.tuples(
        st.sampled_from(_CMP_OPS), st.sampled_from(_NUM_VALUES)
    ).map(lambda t: {t[0]: {"memory": t[1]}})
    life_leaf = st.tuples(
        st.sampled_from(_CMP_OPS), st.sampled_from(_LIFESPAN_VALUES)
    ).map(lambda t: {t[0]: {"lifespan": t[1]}})
    ts_leaf = st.tuples(
        st.sampled_from(_CMP_OPS),
        st.sampled_from(["started_at", "ended_at"]),
        st.sampled_from(_TS_VALUES),
    ).map(lambda t: {t[0]: {t[1]: t[2]}})
    creator_leaf = st.tuples(
        st.sampled_from(["=", "eq", "!=", "ne"]),
        st.sampled_from(["created_by_user_id", "created_by_project_id"]),
        st.sampled_from(_CREATOR_TOKENS),
    ).map(lambda t: {t[0]: {t[1]: t[2]}})
    in_leaf = st.tuples(
        st.sampled_from(["host", "flavor_id", "memory"]),
        st.integers(min_value=0, max_value=3),
    ).flatmap(
        lambda t: st.lists(
            st.sampled_from(
                _STR_ATTRS.get(t[0], [str(v) for v in _NUM_VALUES])
                if t[0] != "memory"
                else _NUM_VALUES
            ),
            min_size=t[1],
            max_size=t[1],
        ).map(lambda vs: {"in": {t[0]: vs}})
    )
    like_leaf = st.tuples(
        st.sampled_from(["host", "display_name"]),
        st.sampled_from(_LIKE_PATTERNS),
    ).map(lambda t: {"like": {t[0]: t[1]}})
    return st.one_of(
        str_leaf, num_leaf, life_leaf, ts_leaf, creator_leaf, in_leaf, like_leaf
    )


def filter_asts():
    return st.recursive(
        _leaves(),
        lambda children: st.one_of(
            st.lists(children, min_size=1, max_size=3).map(lambda xs: {"and": xs}),
            st.lists(children, min_size=1, max_size=3).map(lambda xs: {"or": xs}),
            st.lists(children, min_size=1, max_size=3).map(lambda xs: {"∧": xs}),
            st.lists(children, min_size=1, max_size=3).map(lambda xs: {"∨": xs}),
            children.map(lambda x: {"not": x}),
        ),
        max_leaves=8,
    )


@settings(
    max_examples=130,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ast=filter_asts())
def test_filter_dsl_matches_duckdb(spark, resources, oracle_con, ast):
    got = {
        r.id
        for r in resources.where(compile_filter(ast)).select("id").collect()
    }
    want = {
        r[0]
        for r in oracle_con.execute(
            f"SELECT id FROM resources WHERE {ast_to_sql(ast)}"
        ).fetchall()
    }
    assert got == want, f"AST {ast!r}\nsql {ast_to_sql(ast)!r}"


def test_empty_and_none_filters(spark, resources):
    # {} and None compile to constant-true (the reference's no-filter path)
    assert resources.where(compile_filter(None)).count() == len(_ROWS)
    assert resources.where(compile_filter({})).count() == len(_ROWS)
