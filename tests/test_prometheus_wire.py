"""Byte-level Prometheus remote-write decode tests.

The reference decodes request bodies with native snappy + generated
protobuf (``gnocchi/rest/api.py:2334-2336``); here the pure-Python
codecs must produce the same decoded structures.  Copy-element byte
sequences are handcrafted from the public Snappy format description
since the literal-only encoder never emits them.
"""

from __future__ import annotations

import pytest

from gnocchi_spark.sources import protowire, snappy_codec
from gnocchi_spark.sources.prometheus import (
    decode_write_request,
    decode_write_requests,
    encode_write_request,
    normalize,
)

# ---------------------------------------------------------------------------
# snappy raw format
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"hello world",
        bytes(range(256)) * 300,  # multi-chunk literal (>64 KiB)
        b"\x00" * 100,
    ],
)
def test_snappy_literal_roundtrip(data):
    assert snappy_codec.uncompress(snappy_codec.compress(data)) == data


def test_snappy_copy_1byte_offset():
    # "abcd" literal then copy(len=4, offset=4) -> "abcdabcd"
    buf = bytes([8]) + bytes([3 << 2]) + b"abcd" + bytes([0b000_000_01, 4])
    assert snappy_codec.uncompress(buf) == b"abcdabcd"


def test_snappy_copy_2byte_offset():
    # literal "xy" then copy-2 (len=6, offset=2): overlapping RLE
    buf = bytes([8]) + bytes([1 << 2]) + b"xy" + bytes([(5 << 2) | 2, 2, 0])
    assert snappy_codec.uncompress(buf) == b"xyxyxyxy"


def test_snappy_copy_4byte_offset():
    buf = (
        bytes([8])
        + bytes([3 << 2])
        + b"abcd"
        + bytes([(3 << 2) | 3, 4, 0, 0, 0])
    )
    assert snappy_codec.uncompress(buf) == b"abcdabcd"


def test_snappy_overlapping_rle():
    # literal "a" then copy(len=7, offset=1) -> "aaaaaaaa"
    buf = bytes([8]) + bytes([0]) + b"a" + bytes([(3 << 2) | 1, 1])
    assert snappy_codec.uncompress(buf) == b"aaaaaaaa"


@pytest.mark.parametrize(
    "bad",
    [
        b"",  # missing header
        bytes([10, 3 << 2]) + b"ab",  # truncated literal
        bytes([4]) + bytes([0b01, 9]),  # copy before any output
        bytes([3]) + bytes([0]) + b"a",  # declared len != produced
    ],
)
def test_snappy_corrupt_raises(bad):
    with pytest.raises(ValueError):
        snappy_codec.uncompress(bad)


# ---------------------------------------------------------------------------
# protobuf wire format
# ---------------------------------------------------------------------------

FIXTURE = [
    (
        {"__name__": "cpu_util", "job": "j1", "instance": "i1"},
        [(1700000000000, 1.5), (1700000060000, -2.25)],
    ),
    (
        {"__name__": "mem_used", "job": "j2"},
        [(1700000000000, 0.0)],
    ),
    ({"no_name_label": "x"}, [(1, 1.0)]),
    ({"__name__": "empty_series"}, []),
]


def test_protowire_roundtrip():
    buf = protowire.encode_write_request(FIXTURE)
    assert protowire.parse_write_request(buf) == [
        (labels, samples) for labels, samples in FIXTURE
    ]


def test_protowire_negative_timestamp():
    # int64 negatives encode as 10-byte two's-complement varints
    buf = protowire.encode_write_request([({"__name__": "m"}, [(-5, 1.0)])])
    [(_, samples)] = protowire.parse_write_request(buf)
    assert samples == [(-5, 1.0)]


def test_protowire_skips_unknown_fields():
    # prepend an unknown varint field (no. 7) and append an unknown
    # length-delimited field (no. 3) at the WriteRequest level — the
    # decoder must skip both (prompb adds such fields over time)
    core = protowire.encode_write_request(FIXTURE[:1])
    unknown_varint = protowire._write_uvarint((7 << 3) | 0) + protowire._write_uvarint(42)
    unknown_len = protowire._len_field(3, b"\x01\x02\x03")
    buf = unknown_varint + core + unknown_len
    assert protowire.parse_write_request(buf) == [FIXTURE[0]]


# ---------------------------------------------------------------------------
# end to end: wire bytes -> Spark decode -> normalize
# ---------------------------------------------------------------------------


def test_decode_write_request_end_to_end():
    payload = encode_write_request(FIXTURE)
    assert decode_write_request(payload) == [
        (labels, samples) for labels, samples in FIXTURE
    ]


def test_distributed_decode_and_normalize(spark):
    # two request bodies, split across the fixture
    p1 = encode_write_request(FIXTURE[:2])
    p2 = encode_write_request(FIXTURE[2:])
    payloads = spark.createDataFrame(
        [(bytearray(p1),), (bytearray(p2),)], "payload binary"
    )
    decoded = decode_write_requests(payloads)
    assert decoded.count() == len(FIXTURE)

    out = normalize(decoded, creator="cr").orderBy("metric_name", "ts").collect()
    # series without __name__ and empty-sample series contribute no rows
    assert [(r["metric_name"], r["original_resource_id"], r["value"]) for r in out] == [
        ("cpu_util", "j1@i1", 1.5),
        ("cpu_util", "j1@i1", -2.25),
        ("mem_used", "j2@none", 0.0),
    ]
    assert out[0]["ts"].timestamp() == 1700000000.0
