"""Round-trip fuzzing of the query-string filter grammar.

Complements the AST-level differential fuzz (test_fuzz_filters): here
hypothesis generates random filter ASTs restricted to the wire
grammar's renderable forms (reference gnocchi/rest/api.py:1298-1378),
renders each to query-string syntax with fully-parenthesized operands,
parses it back through ``parse_query_string``, and asserts the parsed
AST equals the original — so the pyparsing grammar, the parse actions
(number/boolean/null coercion, n-ary and/or flattening, in-lists) and
the renderer's understanding of the grammar can never drift apart.

Pure driver-side parser test: no SparkSession, runs in milliseconds
per case.  ``derandomize=True`` keeps it a deterministic gate.
"""

from __future__ import annotations

import pytest
# Extended fuzz/property-hunt tier (r13): excluded from the default
# fast run so the driver verify gate finishes; the full-tier gate
# (-m "slow or not slow") still runs it.
pytestmark = pytest.mark.slow


from hypothesis import given, settings
from hypothesis import strategies as st

from gnocchi_spark.plans.filters import parse_query_string

_ATTRS = ["host", "flavor_id", "memory", "server_group", "display_name",
          "started_at", "lifespan"]
_WORD_OPS = ["=", "==", "eq", "!=", "ne", "<", "lt", ">", "gt", "<=", "le",
             ">=", "ge", "≠", "≥", "≤"]
_STR_VALUES = ["frontend", "h1", "Customer%", "web_front", "a b c", "",
               "it's"]
_IDENT_VALUES = ["frontend", "h1", "prod_east"]  # unquoted value tokens
_NUM_VALUES = [0, 1, 1024, -5, 2.5, 1e3, -0.25]


def _quote(s: str) -> str:
    # the grammar offers both quote styles; pick the one that works
    return f'"{s}"' if "'" in s else f"'{s}'"


def _render_value(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "True" if v else "False"
    if isinstance(v, (int, float)):
        return repr(float(v))
    if isinstance(v, list):
        return "[" + ", ".join(_render_value(x) for x in v) + "]"
    if isinstance(v, tuple):  # marker for an unquoted identifier value
        return v[0]
    return _quote(v)


def render(node: dict) -> str:
    (op, payload), = node.items()
    if op in ("and", "or", "∧", "∨"):
        return f" {op} ".join(f"({render(n)})" for n in payload)
    if op == "not":
        return f"not ({render(payload)})"
    (attr, value), = payload.items()
    return f"{attr} {op} {_render_value(value)}"


def _normalize(node):
    """The grammar coerces every number to float and an identifier
    value to its string — apply the same to the expected AST."""
    if isinstance(node, dict):
        return {k: _normalize(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_normalize(v) for v in node]
    if isinstance(node, tuple):
        return node[0]
    if isinstance(node, bool) or node is None:
        return node
    if isinstance(node, (int, float)):
        return float(node)
    return node


def _leaves():
    value = st.one_of(
        st.sampled_from(_STR_VALUES),
        st.sampled_from(_NUM_VALUES),
        st.sampled_from([True, False, None]),
        st.sampled_from(_IDENT_VALUES).map(lambda s: (s,)),  # unquoted
        st.lists(
            st.one_of(
                st.sampled_from(_STR_VALUES), st.sampled_from(_NUM_VALUES)
            ),
            max_size=3,
        ),
    )
    base = st.tuples(st.sampled_from(_WORD_OPS), st.sampled_from(_ATTRS), value)
    in_leaf = st.tuples(
        st.just("in"),
        st.sampled_from(_ATTRS),
        st.lists(st.sampled_from(_NUM_VALUES), min_size=1, max_size=3),
    )
    like_leaf = st.tuples(
        st.just("like"), st.sampled_from(_ATTRS), st.sampled_from(_STR_VALUES)
    )
    return st.one_of(base, in_leaf, like_leaf).map(
        lambda t: {t[0]: {t[1]: t[2]}}
    )


def query_asts():
    return st.recursive(
        _leaves(),
        lambda children: st.one_of(
            *(
                st.lists(children, min_size=2, max_size=3).map(
                    lambda xs, o=o: {o: xs}
                )
                for o in ("and", "or", "∧", "∨")
            ),
            children.map(lambda x: {"not": x}),
        ),
        max_leaves=8,
    )


@settings(max_examples=200, deadline=None, derandomize=True)
@given(ast=query_asts())
def test_query_string_roundtrip(ast):
    rendered = render(ast)
    parsed = parse_query_string(rendered)
    assert parsed == _normalize(ast), f"rendered {rendered!r}"


def test_reference_example_parses():
    # the docstring's own wire example (api.py:1298-1378)
    got = parse_query_string(
        "server_group='frontend' and not (flavor_id!='1' or memory<1024)"
    )
    assert got == {
        "and": [
            {"=": {"server_group": "frontend"}},
            {"not": {"or": [{"!=": {"flavor_id": "1"}},
                            {"<": {"memory": 1024.0}}]}},
        ]
    }
