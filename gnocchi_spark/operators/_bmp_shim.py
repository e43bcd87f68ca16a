"""Pure-Python uncompressed-BMP decoder exposing the minimal PIL API
the multimodal operators use (``open`` -> context-managed image with
``convert("L")``, ``resize``, ``tobytes``, ``getdata``, ``seek``,
``n_frames``).

Purpose: the production decode branch in operators/multimodal.py is
import-guarded on PIL, which is absent from this container — without
this shim the real-decode branch could never execute under test.
Passing ``decoder="gnocchi_spark.operators._bmp_shim"`` to the
multimodal operators makes executors import THIS module in place of
PIL, driving the real branch end to end against a known image.  Only
24-bit BI_RGB (uncompressed) BMPs decode; anything else raises, which
also exercises the per-payload fallback.  Not a general image library
— a test fixture that happens to be a correct BMP codec.
"""

from __future__ import annotations

import struct


def encode(pixels: list[tuple[int, int, int]], width: int, height: int) -> bytes:
    """RGB top-down row-major pixels -> 24-bit BI_RGB BMP bytes."""
    assert len(pixels) == width * height
    pad = (-(width * 3)) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # BMP stores bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y * width + x]
            row += bytes((b, g, r))
        rows.append(bytes(row) + b"\x00" * pad)
    data = b"".join(rows)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + dib + data


class _Gray:
    """Grayscale image: the post-``convert("L")`` surface."""

    def __init__(self, px: bytes, width: int, height: int):
        self._px, self.width, self.height = px, width, height
        self.size = (width, height)

    def tobytes(self) -> bytes:
        return self._px

    def getdata(self) -> list[int]:
        return list(self._px)

    def resize(self, size: tuple[int, int]) -> "_Gray":
        w, h = size
        out = bytearray()
        for y in range(h):
            sy = y * self.height // h
            for x in range(w):
                out.append(self._px[sy * self.width + x * self.width // w])
        return _Gray(bytes(out), w, h)


class _BmpImage:
    n_frames = 1

    def __init__(self, pixels: list[tuple[int, int, int]], width: int, height: int):
        self._pixels, self.width, self.height = pixels, width, height
        self.size = (width, height)

    def convert(self, mode: str) -> _Gray:
        assert mode == "L", mode
        # ITU-R 601 luma, integer arithmetic (PIL's L formula)
        px = bytes(
            (299 * r + 587 * g + 114 * b) // 1000 for r, g, b in self._pixels
        )
        return _Gray(px, self.width, self.height)

    def seek(self, frame: int) -> None:
        if frame != 0:
            raise EOFError(frame)

    def __enter__(self) -> "_BmpImage":
        return self

    def __exit__(self, *exc) -> None:
        pass

    def close(self) -> None:
        pass


def open(fp) -> _BmpImage:  # noqa: A001 - mirrors PIL.Image.open
    b = fp.read()
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", b, 10)[0]
    size, width, height, planes, bpp, comp = struct.unpack_from("<IiiHHI", b, 14)
    if size != 40 or bpp != 24 or comp != 0 or width <= 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flipped = height > 0  # positive height = bottom-up storage
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    pixels: list[tuple[int, int, int]] = []
    for y in range(height):
        sy = (height - 1 - y) if flipped else y
        base = offset + sy * stride
        for x in range(width):
            bl, g, r = b[base + 3 * x : base + 3 * x + 3]
            pixels.append((r, g, bl))
    return _BmpImage(pixels, width, height)
