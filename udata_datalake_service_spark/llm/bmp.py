"""Minimal stdlib BMP decoder (BITMAPINFOHEADER, uncompressed 24/32-bit).

Companion to the from-scratch PNG codec (``llm/png.py``) in the
multimodal decode ladder: BMP is the simplest real raster container
(struct-packed headers, raw padded scanlines, no entropy coding), so
supporting it costs ~60 lines and widens the set of payloads whose REAL
pixels are exercised in CI. Out-of-subset files (RLE compression,
palettes, 16-bit) raise and fall through to the deterministic stub,
same contract as the PNG leg.
"""

from __future__ import annotations

import struct


class BmpError(ValueError):
    """Payload is not a BMP this decoder supports."""


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode → (width, height, 3, RGB pixels, top-down row-major).

    Supports the common case: 'BM' magic, BITMAPINFOHEADER (or larger),
    BI_RGB (no compression), 24- or 32-bit. BMP stores BGR(A) rows
    bottom-up (negative height = top-down) padded to 4 bytes; output is
    normalized to top-down RGB.
    """
    if len(data) < 54 or data[:2] != b"BM":
        raise BmpError("bad signature")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0:
        raise BmpError(f"unsupported compression {compression}")
    if bpp not in (24, 32):
        raise BmpError(f"unsupported bit depth {bpp}")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise BmpError("bad dimensions")

    nch = bpp // 8
    stride = (width * nch + 3) & ~3
    need = pix_off + stride * height
    if len(data) < need:
        raise BmpError("truncated pixel data")

    out = bytearray(width * height * 3)
    for row in range(height):
        src_row = row if top_down else height - 1 - row
        base = pix_off + src_row * stride
        for x in range(width):
            p = base + x * nch
            o = (row * width + x) * 3
            # BGR(A) → RGB
            out[o] = data[p + 2]
            out[o + 1] = data[p + 1]
            out[o + 2] = data[p]
    return width, height, 3, bytes(out)


def encode_bmp(width: int, height: int, pixels_rgb: bytes) -> bytes:
    """Encode top-down RGB pixels as a 24-bit bottom-up BMP (the
    test-vector generator; also lets the resize path round-trip)."""
    if len(pixels_rgb) != width * height * 3:
        raise BmpError("pixel buffer size mismatch")
    stride = (width * 3 + 3) & ~3
    img = bytearray()
    for row in range(height - 1, -1, -1):
        line = bytearray()
        for x in range(width):
            o = (row * width + x) * 3
            line += bytes((pixels_rgb[o + 2], pixels_rgb[o + 1], pixels_rgb[o]))
        line += b"\x00" * (stride - len(line))
        img += line
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(img), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(img), 2835, 2835, 0, 0
    )
    return header + bytes(img)
