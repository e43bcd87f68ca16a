"""Executable-documentation gate for doc/API.md (r11, VERDICT r10 #5).

Every ``python``-fenced snippet on the migration page runs here,
top-to-bottom in one shared namespace with ``spark`` and ``sf``
pre-bound (the convention the page states) — so the page cannot drift
from the installed package.  ``python no-run`` fences (streaming:
needs a live source) are parsed but not executed; their tested
equivalents live in doc/STREAMING.md.
"""

from __future__ import annotations

import os
import re

import pytest

_DOC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "doc", "API.md")

_FENCE = re.compile(r"```python([^\n`]*)\n(.*?)```", re.DOTALL)


def _blocks():
    with open(_DOC) as fh:
        text = fh.read()
    out = []
    for m in _FENCE.finditer(text):
        tag, body = m.group(1).strip(), m.group(2)
        out.append((tag, body, text[: m.start()].count("\n") + 1))
    return out


def test_api_doc_has_blocks():
    blocks = _blocks()
    assert len(blocks) >= 12, "API.md lost its snippet coverage"
    assert any(tag == "no-run" for tag, _, _ in blocks)  # streaming stays doc-only


def test_api_doc_snippets_run(spark, sf_dir):
    ns: dict = {"spark": spark, "sf": sf_dir}
    ran = 0
    for tag, body, line in _blocks():
        if tag == "no-run":
            compile(body, "doc/API.md", "exec")  # must at least parse
            continue
        try:
            exec(compile(body, f"doc/API.md:{line}", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            pytest.fail(f"doc/API.md snippet at line {line} failed: {e!r}\n{body}")
        ran += 1
    assert ran >= 11


def test_api_doc_names_resolve():
    """Every `gnocchi_spark.<name>` referenced in the page's tables and
    snippets must exist in the public API (the 92-export check, scoped
    to the doc)."""
    import gnocchi_spark as g

    with open(_DOC) as fh:
        text = fh.read()
    names = set(re.findall(r"`([a-z_][a-zA-Z0-9_]*)\(", text))
    # r12 (ADVICE): a documented name must be exported OR resolvable —
    # the old `in __all__ and not hasattr` form let names absent from
    # __all__ pass silently (nearly vacuous).
    missing = [n for n in names if not (n in g.__all__ or hasattr(g, n))]
    assert not missing, f"documented but unresolvable: {missing}"
    # and the imports the snippets use must all be exported: both the
    # parenthesized multi-line form and the single-line form
    imported = []
    for m in re.finditer(r"from gnocchi_spark import \(([^)]*)\)", text):
        imported += re.split(r"[,\s]+", m.group(1))
    for m in re.finditer(r"from gnocchi_spark import ([^(\n]+)\n", text):
        imported += re.split(r"[,\s]+", m.group(1))
    for n in imported:
        n = n.strip()
        if n and not n.startswith("#"):
            assert n in g.__all__ or hasattr(g, n), f"{n} not exported"
