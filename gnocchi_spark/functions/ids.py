"""Resource-id transformation: RFC-4122 uuid5 as pure Column expressions.

The reference maps non-UUID resource ids into a fixed namespace UUID via
``uuid.uuid5(RESOURCE_ID_NAMESPACE, value + "\\x00" + creator)``
(reference ``gnocchi/utils.py:40-59``).  API parity requires bit-identical
ids, so we reproduce uuid5 (name-based, SHA-1) with Spark built-ins:
``sha1(namespace_bytes || name_bytes)`` -> first 16 bytes, then force
version=5 and the RFC variant, all JVM-side (no Python UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# uuid.UUID('0a7a15ff-aa13-4ac2-897c-9bdf30ce175b').hex — stable forever
# (reference gnocchi/utils.py:42-43).
RESOURCE_ID_NAMESPACE_HEX = "0a7a15ffaa134ac2897c9bdf30ce175b"


def uuid5(namespace_hex: str, name: Column) -> Column:
    """RFC-4122 version-5 UUID of ``name`` within the given namespace.

    100 TB note: pure Column expression -> whole-stage codegen; safe in
    ingest hot paths (one sha1 per row, no shuffle).
    """
    h = F.lower(
        F.sha1(F.concat(F.unhex(F.lit(namespace_hex)), F.encode(name, "UTF-8")))
    )
    # variant nibble: (x & 0x3) | 0x8  over hex digit 17 of the 32 kept
    variant = F.lower(
        F.hex(
            F.conv(F.substring(h, 17, 1), 16, 10)
            .cast("int")
            .bitwiseAND(F.lit(3))
            .bitwiseOR(F.lit(8))
        )
    )
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("5"), F.substring(h, 14, 3)),
        F.concat(variant, F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


_UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"


def resource_uuid(value: Column, creator: Column | str | None) -> Column:
    """Gnocchi's ResourceUUID: pass UUIDs through, hash everything else
    into the namespace (reference ``gnocchi/utils.py:45-59``)."""
    if creator is None:
        creator_col = F.lit("\x00")
    elif isinstance(creator, str):
        creator_col = F.lit(creator)
    else:
        creator_col = F.coalesce(creator, F.lit("\x00"))
    hashed = uuid5(
        RESOURCE_ID_NAMESPACE_HEX,
        F.concat(value, F.lit("\x00"), creator_col),
    )
    return F.when(value.rlike(_UUID_RE), F.lower(value)).otherwise(hashed)
