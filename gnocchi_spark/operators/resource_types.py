"""Dynamic resource-type schema system (SURVEY §1.3; reference
``gnocchi/resource_type.py:131-216``, per-type SQL tables
``sqlalchemy_base.py:205-218``).

The reference creates real SQL tables per resource type at runtime.
The Spark shape keeps one generic resource table with a JSON/Map
attribute side-band and *typed views* generated from the resource-type
definition: ``attributes_schema`` builds the StructType, ``typed_view``
projects the side-band into typed, bounds-validated columns.  Schema
"fill" on type change (resource_type.py:75-104) is a plain
``withColumn(default)`` over the view — no table rewrite.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# reserved attribute names, resource_type.py:23-30
INVALID_NAMES = frozenset(
    [
        "id", "type", "metrics",
        "revision", "revision_start", "revision_end",
        "started_at", "ended_at",
        "user_id", "project_id",
        "created_by_user_id", "created_by_project_id", "get_metric",
        "creator",
    ]
)

_SPARK_TYPES = {
    "string": T.StringType(),
    "uuid": T.StringType(),
    "datetime": T.TimestampType(),
    "number": T.DoubleType(),
    "bool": T.BooleanType(),
}

_UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"


@dataclass(frozen=True)
class ResourceTypeAttribute:
    """One typed attribute: string(min/max_length), uuid, datetime,
    number(min/max), bool (resource_type.py:131-216)."""

    name: str
    type: str
    required: bool = False
    min: float | None = None       # number bounds
    max: float | None = None
    min_length: int = 0            # string bounds
    max_length: int = 256

    def __post_init__(self) -> None:
        if self.name in INVALID_NAMES or self.name.startswith("_"):
            raise ValueError(f"invalid attribute name {self.name!r}")
        if self.type not in _SPARK_TYPES:
            raise ValueError(f"invalid attribute type {self.type!r}")
        if self.type == "number" and None not in (self.min, self.max) and self.min > self.max:
            raise ValueError("min > max")
        if self.type == "string" and self.min_length > self.max_length:
            raise ValueError("min_length > max_length")


def attributes_schema(attrs: list[ResourceTypeAttribute]) -> T.StructType:
    """StructType of a resource type's custom attributes."""
    return T.StructType(
        [T.StructField(a.name, _SPARK_TYPES[a.type], not a.required) for a in attrs]
    )


def _valid(a: ResourceTypeAttribute, col: Column) -> Column:
    checks: list[Column] = []
    if a.required:
        checks.append(col.isNotNull())
    if a.type == "number":
        if a.min is not None:
            checks.append(col.isNull() | (col >= F.lit(a.min)))
        if a.max is not None:
            checks.append(col.isNull() | (col <= F.lit(a.max)))
    if a.type == "string":
        checks.append(col.isNull() | (F.length(col) >= a.min_length))
        checks.append(col.isNull() | (F.length(col) <= a.max_length))
    if a.type == "uuid":
        checks.append(col.isNull() | col.rlike(_UUID_RE))
    out = F.lit(True)
    for c in checks:
        out = out & c
    return out


def typed_view(
    resources: DataFrame,
    attrs: list[ResourceTypeAttribute],
    json_col: str = "attributes",
    keep_invalid: bool = False,
) -> DataFrame:
    """Project the JSON attribute side-band into typed columns.

    Adds one typed column per attribute plus ``__valid`` (all bounds
    hold — the batch analogue of the reference's per-write voluptuous
    validation).  Rows failing validation are dropped unless
    ``keep_invalid``; the view is a pure projection, so Catalyst prunes
    unused attribute columns and pushes filters into the scan.
    """
    schema = attributes_schema(attrs)
    df = resources.withColumn("__attrs", F.from_json(F.col(json_col), schema))
    valid = F.lit(True)
    for a in attrs:
        df = df.withColumn(a.name, F.col(f"__attrs.{a.name}"))
        valid = valid & _valid(a, F.col(a.name))
    df = df.withColumn("__valid", valid).drop("__attrs")
    if keep_invalid:
        return df
    return df.where(F.col("__valid")).drop("__valid")


def fill_attribute(
    view: DataFrame, attr: ResourceTypeAttribute, fill_value
) -> DataFrame:
    """Schema-change backfill (resource_type.py:75-104): give existing
    rows a value for a newly added attribute."""
    typ = _SPARK_TYPES[attr.type]
    if attr.name in view.columns:
        return view.withColumn(
            attr.name, F.coalesce(F.col(attr.name), F.lit(fill_value).cast(typ))
        )
    return view.withColumn(attr.name, F.lit(fill_value).cast(typ))
