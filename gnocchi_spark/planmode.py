"""Plan-only mode: build query plans without executing side effects.

Most queries are pure plan constructions, but the two storage
round-trip queries (``store_snapshot_roundtrip``,
``ann_index_roundtrip``) genuinely WRITE — they drive the persisted
store/index lifecycle, so constructing their result DataFrame runs
build jobs into a per-call tempdir.  That is correct for the
correctness gate (the round trip IS the thing under test) but wrong
for a plan audit, which must be able to sweep the whole catalog
without executing work or leaking tempdirs.

Under :func:`plan_only_mode`, those queries skip the builds and read
from tiny pre-built fixtures committed under ``tools/fixtures/``
(regenerate with ``python tools/make_plan_fixtures.py``), so the
audited plan is the real manifest-pinned read path — representative
join/scan/pruning shapes — with zero writes.
"""

from __future__ import annotations

import contextlib
import os

_PLAN_ONLY = False

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "fixtures",
)


def plan_only() -> bool:
    return _PLAN_ONLY


@contextlib.contextmanager
def plan_only_mode():
    global _PLAN_ONLY
    prev = _PLAN_ONLY
    _PLAN_ONLY = True
    try:
        yield
    finally:
        _PLAN_ONLY = prev
