"""Minimal protobuf wire codec for the Prometheus remote-write schema.

The reference parses the snappy-decompressed body with generated
protobuf classes (``gnocchi/rest/api.py:2335-2336`` —
``remote_pb2.WriteRequest().ParseFromString``).  No protobuf runtime
ships in this container, so this module speaks the (public, stable)
protobuf wire format directly for the fixed remote-write message set
(https://github.com/prometheus/prometheus/blob/main/prompb/remote.proto
and types.proto)::

    message Sample     { double value = 1; int64 timestamp = 2; }
    message Label      { string name = 1;  string value = 2; }
    message TimeSeries { repeated Label labels = 1;
                         repeated Sample samples = 2; }
    message WriteRequest { repeated TimeSeries timeseries = 1; }

Wire types used: 0 = varint, 1 = 64-bit (double / fixed64),
2 = length-delimited, 5 = 32-bit.  Unknown fields are skipped per the
protobuf spec, so payloads produced by newer prompb revisions (which
add exemplars/histograms/metadata fields) still decode.

Decoded shape: ``[(labels: dict[str, str],
samples: list[(timestamp_ms: int, value: float)])]`` — exactly what
``gnocchi_spark.sources.prometheus.normalize`` consumes.
"""

from __future__ import annotations

import struct

_WIRE_VARINT = 0
_WIRE_I64 = 1
_WIRE_LEN = 2
_WIRE_I32 = 5


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("protobuf: truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("protobuf: varint too long")


def _write_uvarint(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _iter_fields(buf: bytes):
    """Yield (field_no, wire_type, value) over a message's fields.

    ``value`` is int for varint/i64/i32 (raw bits for the fixed types)
    and bytes for length-delimited.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_uvarint(buf, pos)
        field_no, wire = key >> 3, key & 0x07
        if wire == _WIRE_VARINT:
            value, pos = _read_uvarint(buf, pos)
        elif wire == _WIRE_I64:
            if pos + 8 > n:
                raise ValueError("protobuf: truncated fixed64")
            value = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wire == _WIRE_LEN:
            length, pos = _read_uvarint(buf, pos)
            if pos + length > n:
                raise ValueError("protobuf: truncated bytes field")
            value = buf[pos : pos + length]
            pos += length
        elif wire == _WIRE_I32:
            if pos + 4 > n:
                raise ValueError("protobuf: truncated fixed32")
            value = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"protobuf: unsupported wire type {wire}")
        yield field_no, wire, value


def _varint_to_int64(value: int) -> int:
    """Two's-complement interpretation of a 64-bit varint (int64)."""
    if value >= 1 << 63:
        value -= 1 << 64
    return value


def _parse_sample(buf: bytes) -> tuple[int, float]:
    value = 0.0
    timestamp_ms = 0
    for field_no, wire, raw in _iter_fields(buf):
        if field_no == 1 and wire == _WIRE_I64:
            value = struct.unpack("<d", raw.to_bytes(8, "little"))[0]
        elif field_no == 2 and wire == _WIRE_VARINT:
            timestamp_ms = _varint_to_int64(raw)
        # else: unknown field, skipped
    return timestamp_ms, value


def _parse_label(buf: bytes) -> tuple[str, str]:
    name = ""
    value = ""
    for field_no, wire, raw in _iter_fields(buf):
        if field_no == 1 and wire == _WIRE_LEN:
            name = raw.decode("utf-8")
        elif field_no == 2 and wire == _WIRE_LEN:
            value = raw.decode("utf-8")
    return name, value


def _parse_timeseries(buf: bytes) -> tuple[dict, list]:
    labels: dict[str, str] = {}
    samples: list[tuple[int, float]] = []
    for field_no, wire, raw in _iter_fields(buf):
        if field_no == 1 and wire == _WIRE_LEN:
            name, value = _parse_label(raw)
            labels[name] = value
        elif field_no == 2 and wire == _WIRE_LEN:
            samples.append(_parse_sample(raw))
    return labels, samples


def parse_write_request(buf: bytes) -> list[tuple[dict, list]]:
    """WriteRequest bytes -> [(labels dict, [(timestamp_ms, value)])]."""
    out = []
    for field_no, wire, raw in _iter_fields(buf):
        if field_no == 1 and wire == _WIRE_LEN:
            out.append(_parse_timeseries(raw))
    return out


# ---------------------------------------------------------------- encode
# Used by tests and fixture generators to produce real wire payloads;
# emits canonical field order, which every decoder must accept.


def _len_field(field_no: int, payload: bytes) -> bytes:
    return _write_uvarint((field_no << 3) | _WIRE_LEN) + _write_uvarint(len(payload)) + payload


def _encode_sample(timestamp_ms: int, value: float) -> bytes:
    out = bytearray()
    out += _write_uvarint((1 << 3) | _WIRE_I64)
    out += struct.pack("<d", value)
    out += _write_uvarint((2 << 3) | _WIRE_VARINT)
    out += _write_uvarint(timestamp_ms & ((1 << 64) - 1))
    return bytes(out)


def _encode_label(name: str, value: str) -> bytes:
    return _len_field(1, name.encode("utf-8")) + _len_field(2, value.encode("utf-8"))


def encode_write_request(timeseries: list[tuple[dict, list]]) -> bytes:
    """[(labels dict, [(timestamp_ms, value)])] -> WriteRequest bytes."""
    out = bytearray()
    for labels, samples in timeseries:
        ts_buf = bytearray()
        for name in labels:
            ts_buf += _len_field(1, _encode_label(name, labels[name]))
        for timestamp_ms, value in samples:
            ts_buf += _len_field(2, _encode_sample(timestamp_ms, value))
        out += _len_field(1, bytes(ts_buf))
    return bytes(out)
