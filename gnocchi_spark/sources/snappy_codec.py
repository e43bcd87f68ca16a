"""Pure-Python raw-Snappy codec.

The reference accepts Prometheus remote-write bodies as raw-snappy
compressed protobuf (``gnocchi/rest/api.py:2334`` —
``snappy.uncompress(pecan.request.body)``).  ``python-snappy`` is not
installed in this container, and the raw format (the non-framed variant
produced by ``snappy.compress``) is simple enough to implement directly
from the public format description
(https://github.com/google/snappy/blob/main/format_description.txt):

- header: varint-encoded uncompressed length;
- body: a sequence of elements, each starting with a tag byte whose low
  2 bits select literal (00) / copy-1-byte-offset (01) /
  copy-2-byte-offset (10) / copy-4-byte-offset (11).

Copies may overlap their output (offset < length) — that is Snappy's
run-length encoding — so the decoder must copy front-to-back.

``compress`` emits literal-only streams (always valid Snappy, never
smaller than the input).  It exists so tests and fixture generators can
round-trip without the C library; any conformant Snappy decoder accepts
its output, and ``uncompress`` accepts any conformant compressor's
output including copy elements.
"""

from __future__ import annotations

_MAX_INCREMENT = 1 << 32  # defensive bound for corrupt varints
_MAX_LITERAL = 1 << 16  # literal chunk size for the encoder


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    """LEB128 unsigned varint at ``pos`` -> (value, next_pos)."""
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("snappy: truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("snappy: varint too long")


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


def uncompress(buf: bytes) -> bytes:
    """Decompress a raw-Snappy buffer (``snappy.uncompress`` parity)."""
    expected, pos = _read_uvarint(buf, 0)
    if expected > _MAX_INCREMENT:
        raise ValueError("snappy: declared length too large")
    out = bytearray()
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            length = tag >> 2
            if length >= 60:  # 60..63 -> length stored in 1..4 LE bytes
                extra = length - 59
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                length = int.from_bytes(buf[pos : pos + extra], "little")
                pos += extra
            length += 1
            if pos + length > n:
                raise ValueError("snappy: truncated literal")
            out += buf[pos : pos + length]
            pos += length
            continue
        if kind == 1:  # copy, 3-bit length, 11-bit offset
            if pos >= n:
                raise ValueError("snappy: truncated copy-1")
            length = ((tag >> 2) & 0x07) + 4
            offset = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:  # copy, 6-bit length, 2-byte LE offset
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2")
            length = (tag >> 2) + 1
            offset = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 6-bit length, 4-byte LE offset
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4")
            length = (tag >> 2) + 1
            offset = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset out of range")
        if offset >= length:  # disjoint copy: one slice
            start = len(out) - offset
            out += out[start : start + length]
        else:  # overlapping copy (RLE): repeat the tail pattern
            start = len(out) - offset
            pattern = out[start:]
            reps = -(-length // offset)  # ceil
            out += (bytes(pattern) * reps)[:length]
    if len(out) != expected:
        raise ValueError(
            f"snappy: length mismatch (declared {expected}, got {len(out)})"
        )
    return bytes(out)


def compress(buf: bytes) -> bytes:
    """Literal-only raw-Snappy encoder (valid, non-compressing)."""
    out = bytearray(_write_uvarint(len(buf)))
    pos = 0
    n = len(buf)
    while pos < n:
        chunk = buf[pos : pos + _MAX_LITERAL]
        pos += len(chunk)
        length = len(chunk) - 1
        if length < 60:
            out.append(length << 2)
        else:
            extra = (length.bit_length() + 7) // 8
            out.append((59 + extra) << 2)
            out += length.to_bytes(extra, "little")
        out += chunk
    return bytes(out)
