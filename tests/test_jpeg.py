"""Baseline JPEG codec: spec-constructed byte tests (no Pillow anywhere)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from udata_datalake_service_spark.llm.jpeg import (
    decode_jpeg,
    encode_jpeg_gray,
    parse_jpeg_dimensions,
)


def test_flat_gray_roundtrip_exact():
    """Block-constant images with unit quantization survive the DCT
    exactly — the pixel-exact leg the oracle query leans on."""
    for g in (0, 17, 128, 254, 255):
        data = encode_jpeg_gray(16, 8, bytes([g]) * 128)
        assert parse_jpeg_dimensions(data) == (16, 8, 1)
        w, h, nc, pix = decode_jpeg(data)
        assert (w, h, nc) == (16, 8, 1)
        assert pix == bytes([g]) * 128


def test_block_flat_crop_roundtrip_exact():
    """Non-multiple-of-8 dimensions: edge padding encodes, decode crops
    back; per-block distinct values prove block addressing."""
    img = np.zeros((13, 21), dtype=np.uint8)
    for by in range(2):
        for bx in range(3):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 40 * by + 13 * bx + 5
    data = encode_jpeg_gray(21, 13, img.tobytes())
    w, h, nc, pix = decode_jpeg(data)
    assert (w, h) == (21, 13)
    assert (np.frombuffer(pix, dtype=np.uint8).reshape(13, 21) == img).all()


def test_arbitrary_content_within_idct_rounding():
    """Random and gradient images (gradient exercises long AC runs / ZRL)
    round-trip within the +-2 IDCT rounding bound at unit quantization."""
    rng = np.random.RandomState(7)
    for img in (
        rng.randint(0, 256, (24, 40), dtype=np.uint8),
        (np.add.outer(np.arange(24) * 3, np.arange(48) * 5) % 256).astype(np.uint8),
    ):
        h, w = img.shape
        _, _, _, pix = decode_jpeg(encode_jpeg_gray(w, h, img.tobytes()))
        err = np.abs(
            np.frombuffer(pix, dtype=np.uint8).reshape(h, w).astype(int)
            - img.astype(int)
        ).max()
        assert err <= 2, err


def test_restart_markers():
    """DRI/RSTn: predictor resets and byte alignment at every interval;
    block-flat content keeps the expectation pixel-exact."""
    img = np.zeros((8, 48), dtype=np.uint8)
    for bx in range(6):
        img[:, bx * 8 : bx * 8 + 8] = 30 * bx + 11
    data = encode_jpeg_gray(48, 8, img.tobytes(), restart_interval=2)
    assert b"\xff\xdd" in data and b"\xff\xd0" in data
    _, _, _, pix = decode_jpeg(data)
    assert (np.frombuffer(pix, dtype=np.uint8).reshape(8, 48) == img).all()


def test_quantized_encode_is_legal():
    """qval>1 quantizes for real: still decodes, within a coarser bound."""
    img = (np.add.outer(np.arange(16), np.arange(16)) * 7 % 256).astype(np.uint8)
    _, _, _, pix = decode_jpeg(encode_jpeg_gray(16, 16, img.tobytes(), qval=8))
    err = np.abs(
        np.frombuffer(pix, dtype=np.uint8).reshape(16, 16).astype(int)
        - img.astype(int)
    ).max()
    assert err <= 40


def test_progressive_dimensions_parse_but_decode_refuses():
    """A hand-built SOF2 (progressive) header: parse_jpeg_dimensions
    returns real dims, decode_jpeg refuses loudly."""

    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    data = (
        b"\xff\xd8"
        + seg(0xC2, struct.pack(">BHHB", 8, 31, 77, 3) + bytes(9))
        + b"\xff\xd9"
    )
    assert parse_jpeg_dimensions(data) == (77, 31, 3)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(data)


def test_malformed_is_loud():
    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg_dimensions(b"not a jpeg")
    with pytest.raises(ValueError, match="no SOF"):
        parse_jpeg_dimensions(b"\xff\xd8\xff\xd9")
    good = encode_jpeg_gray(8, 8, bytes(64))
    with pytest.raises(Exception):
        decode_jpeg(good[:40])


def test_decode_ladder_picks_jpeg():
    """multimodal._decode_image routes JPEG magic to the vendored codec:
    real dimensions and an exact single-bin luminance histogram."""
    from udata_datalake_service_spark.llm.multimodal import _decode_image

    w, h, hist = _decode_image(encode_jpeg_gray(24, 16, bytes([200]) * 384))
    assert (w, h) == (24, 16)
    assert hist[200 >> 5] == 1.0 and sum(hist) == 1.0
