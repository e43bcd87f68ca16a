"""Archive policy model.

Mirrors the reference semantics (gnocchi/archive_policy.py:32-170):
a policy is a named list of (granularity, points, timespan) definitions
with invariant ``timespan = granularity * points``
(archive_policy.py:183-226), a ``back_window`` count of
coarsest-granularity blocks tolerated for late data, and a set of
aggregation methods supporting ``"*"``, ``"+x"``, ``"-x"`` composition
(archive_policy.py:48-55,116-133).

In the Spark engine a policy drives: which ``groupBy(metric, window)``
outputs the ingest job materializes, the streaming watermark
(back_window * max granularity), and retention (``DELETE WHERE bucket <
now() - timespan``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# Valid aggregation methods, reference gnocchi/archive_policy.py:39-46.
VALID_AGGREGATION_METHODS = frozenset(
    ["mean", "sum", "last", "max", "min", "std", "median", "first", "count"]
    + ["%dpct" % i for i in range(1, 100)]
)
VALID_AGGREGATION_METHODS_VALUES = VALID_AGGREGATION_METHODS | frozenset(
    "rate:%s" % m for m in VALID_AGGREGATION_METHODS
)

# Default methods, reference gnocchi/archive_policy.py:173-180.
DEFAULT_AGGREGATION_METHODS = ("mean", "min", "max", "sum", "std", "count")

_PCT_RE = re.compile(r"^(\d{1,2})pct$")


def parse_method(method: str) -> tuple[str, str | None, float | None]:
    """Split a method name into (base, rate_base, percentile).

    ``"rate:mean"`` -> ("rate", "mean", None); ``"95pct"`` ->
    ("pct", None, 0.95).  Mirrors the name regex at
    gnocchi/carbonara.py:578,605-616.
    """
    if method.startswith("rate:"):
        base = method[len("rate:"):]
        if base not in VALID_AGGREGATION_METHODS:
            raise ValueError(f"invalid rate base aggregation {base!r}")
        return "rate", base, None
    m = _PCT_RE.match(method)
    if m:
        q = int(m.group(1))
        if not 1 <= q <= 99:
            raise ValueError(f"percentile out of range in {method!r}")
        return "pct", None, q / 100.0
    if method not in VALID_AGGREGATION_METHODS:
        raise ValueError(f"invalid aggregation method {method!r}")
    return method, None, None


def expand_aggregation_methods(methods: list[str] | tuple[str, ...]) -> frozenset[str]:
    """Expand ``*`` / ``+x`` / ``-x`` composition.

    Reference gnocchi/archive_policy.py:116-133: ``"*"`` means all
    non-rate methods; ``"+x"``/``"-x"`` add/remove from the default set.
    """
    methods = list(methods)
    if "*" in methods:
        base = set(VALID_AGGREGATION_METHODS)
        methods.remove("*")
    elif any(m.startswith(("+", "-")) for m in methods):
        base = set(DEFAULT_AGGREGATION_METHODS)
    else:
        base = set()
        for m in methods:
            if m not in VALID_AGGREGATION_METHODS_VALUES:
                raise ValueError(f"invalid aggregation method {m!r}")
            base.add(m)
        return frozenset(base)
    for m in methods:
        if m.startswith("+"):
            name = m[1:]
            if name not in VALID_AGGREGATION_METHODS_VALUES:
                raise ValueError(f"invalid aggregation method {name!r}")
            base.add(name)
        elif m.startswith("-"):
            base.discard(m[1:])
        elif m in VALID_AGGREGATION_METHODS_VALUES:
            base.add(m)
        else:
            raise ValueError(f"invalid aggregation method {m!r}")
    return frozenset(base)


@dataclass(frozen=True)
class ArchivePolicyItem:
    """One (granularity, points, timespan) rollup definition.

    Granularity in seconds (float; sub-second allowed). Exactly mirrors
    gnocchi/archive_policy.py:183-263: any two of granularity/points/
    timespan determine the third.
    """

    granularity_s: float
    points: int | None = None
    timespan_s: float | None = None

    def __post_init__(self) -> None:
        if self.granularity_s <= 0:
            raise ValueError("granularity must be > 0")
        if self.points is not None and self.timespan_s is None:
            object.__setattr__(self, "timespan_s", self.granularity_s * self.points)
        elif self.timespan_s is not None and self.points is None:
            object.__setattr__(self, "points", int(self.timespan_s / self.granularity_s))


@dataclass(frozen=True)
class ArchivePolicy:
    name: str
    back_window: int
    definition: tuple[ArchivePolicyItem, ...]
    aggregation_methods: frozenset[str] = field(
        default_factory=lambda: frozenset(DEFAULT_AGGREGATION_METHODS)
    )

    def __post_init__(self) -> None:
        grans = [d.granularity_s for d in self.definition]
        if len(set(grans)) != len(grans):
            raise ValueError("duplicate granularities in archive policy")
        object.__setattr__(
            self,
            "definition",
            tuple(sorted(self.definition, key=lambda d: d.granularity_s)),
        )

    @property
    def max_granularity_s(self) -> float:
        return max(d.granularity_s for d in self.definition)

    @property
    def back_window_s(self) -> float:
        """Late-data tolerance = back_window blocks of the coarsest
        granularity (gnocchi/carbonara.py:321-373); this is the Spark
        watermark delay."""
        return self.back_window * self.max_granularity_s


@dataclass(frozen=True)
class ArchivePolicyRule:
    """Metric-name-pattern -> policy mapping
    (gnocchi/indexer/sqlalchemy_base.py:385-396)."""

    name: str
    metric_pattern: str
    archive_policy_name: str


def rule_order(rules: list[ArchivePolicyRule]) -> list[ArchivePolicyRule]:
    """First-match evaluation order: metric_pattern DESC, name ASC
    (gnocchi/indexer/sqlalchemy.py:693-699 + fnmatch loop
    indexer/__init__.py:459-466)."""
    by_name = sorted(rules, key=lambda r: r.name)
    return sorted(by_name, key=lambda r: r.metric_pattern, reverse=True)


def assign_policy(metric_name, rules: list[ArchivePolicyRule]):
    """Column expression mapping a metric-name Column to its archive
    policy name via first-matching rule; NULL when no rule matches
    (the reference raises NoArchivePolicyRuleMatch).

    fnmatch patterns compile to Java-compatible regexes via
    ``fnmatch.translate``, so matching stays JVM-side (rlike) — the
    rule list is driver-side config, never a join.
    """
    import fnmatch as _fnmatch

    from pyspark.sql import functions as F

    expr = F.lit(None).cast("string")
    for rule in reversed(rule_order(rules)):
        expr = F.when(
            # \A start anchor: translate() only anchors the end and
            # rlike is a substring search
            metric_name.rlike(r"\A" + _fnmatch.translate(rule.metric_pattern)),
            F.lit(rule.archive_policy_name),
        ).otherwise(expr)
    return expr


def default_policies() -> dict[str, ArchivePolicy]:
    """The four built-in policies, gnocchi/archive_policy.py:266-305."""
    d = 86400.0
    return {
        "bool": ArchivePolicy(
            "bool", 3600, (ArchivePolicyItem(1.0, timespan_s=365 * d),), frozenset(["last"])
        ),
        "low": ArchivePolicy("low", 0, (ArchivePolicyItem(300.0, timespan_s=30 * d),)),
        "medium": ArchivePolicy(
            "medium",
            0,
            (ArchivePolicyItem(60.0, timespan_s=7 * d), ArchivePolicyItem(3600.0, timespan_s=365 * d)),
        ),
        "high": ArchivePolicy(
            "high",
            0,
            (
                ArchivePolicyItem(1.0, timespan_s=3600.0),
                ArchivePolicyItem(60.0, timespan_s=7 * d),
                ArchivePolicyItem(3600.0, timespan_s=365 * d),
            ),
        ),
    }


def capabilities() -> dict:
    """The ``/v1/capabilities`` contract (reference
    gnocchi/rest/api.py:2172-2177): the fixed whitelist of aggregation
    methods a client may request, including the ``rate:`` composites —
    there is no user-definable UDF surface (SURVEY.md §2.11), so this
    dict IS the engine's aggregation capability statement."""
    return {
        "aggregation_methods": sorted(VALID_AGGREGATION_METHODS_VALUES),
    }
