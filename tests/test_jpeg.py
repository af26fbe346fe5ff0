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


def test_progressive_header_only_and_arithmetic_refusal():
    """A scanless SOF2 stream fails loudly (no entropy data to decode);
    an arithmetic-coded SOF (0xC9) still refuses with
    NotImplementedError. parse_jpeg_dimensions works on both."""

    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    sof_body = struct.pack(">BHHB", 8, 31, 77, 3) + bytes(
        (1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    )
    data = b"\xff\xd8" + seg(0xC2, sof_body) + b"\xff\xd9"
    assert parse_jpeg_dimensions(data) == (77, 31, 3)
    with pytest.raises(ValueError, match="missing SOF/SOS"):
        decode_jpeg(data)

    arith = b"\xff\xd8" + seg(0xC9, sof_body) + b"\xff\xd9"
    assert parse_jpeg_dimensions(arith) == (77, 31, 3)
    with pytest.raises(NotImplementedError):
        decode_jpeg(arith)


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

    w, h, hist, src = _decode_image(encode_jpeg_gray(24, 16, bytes([200]) * 384))
    assert (w, h) == (24, 16)
    assert hist[200 >> 5] == 1.0 and sum(hist) == 1.0
    assert src == "vendored"
    # arithmetic coding (SOF9): real header dims, stub histogram, and the
    # rung is observable as 'stub-dims'
    arith = encode_jpeg_gray(24, 16, bytes([200]) * 384).replace(
        b"\xff\xc0", b"\xff\xc9", 1
    )
    w, h, _hist, src = _decode_image(arith)
    assert (w, h) == (24, 16)
    assert src == "stub-dims"


# ------------------------------------------------------------ progressive --
def _gradient(w, h, seed=7):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    noise = rng.integers(0, 40, size=(h, w))
    return np.clip(x + noise, 0, 255).astype(np.uint8).tobytes()


def test_progressive_flat_gray_exact():
    """DC-only content: the successive-approximation DC ladder (first at
    Al=1 + refinement) must reconstruct the flat value exactly."""
    from udata_datalake_service_spark.llm.jpeg import encode_jpeg_gray_progressive

    for g in (0, 1, 127, 128, 200, 255):
        data = encode_jpeg_gray_progressive(24, 16, bytes([g]) * 384)
        w, h, nc, pix = decode_jpeg(data)
        assert (w, h, nc) == (24, 16, 1)
        assert set(pix) == {g}


def test_progressive_matches_baseline_on_arbitrary_content():
    """The whole point: progressive and baseline encodings of the same
    image carry the same coefficients (qval=1, same DCT math), so the
    two decoders must produce IDENTICAL pixels — every Annex G path
    (DC first/refine, AC first with EOBRUN, AC refinement with
    correction bits) agreeing bit-for-bit with the Annex F path."""
    from udata_datalake_service_spark.llm.jpeg import encode_jpeg_gray_progressive

    for (w, h) in ((8, 8), (24, 16), (17, 11), (64, 48)):
        img = _gradient(w, h)
        base = decode_jpeg(encode_jpeg_gray(w, h, img))
        prog = decode_jpeg(encode_jpeg_gray_progressive(w, h, img))
        assert base[:3] == prog[:3] == (w, h, 1)
        assert base[3] == prog[3], f"pixel mismatch at {w}x{h}"


def test_progressive_deeper_ac_ladder():
    """ac_al=2 produces two refinement scans — the correction-bit +
    EOBRUN machinery runs twice and must still agree with baseline."""
    from udata_datalake_service_spark.llm.jpeg import encode_jpeg_gray_progressive

    img = _gradient(32, 24, seed=13)
    base = decode_jpeg(encode_jpeg_gray(32, 24, img))
    prog = decode_jpeg(encode_jpeg_gray_progressive(32, 24, img, ac_al=2))
    assert base[3] == prog[3]


def test_progressive_restart_markers():
    """RSTn inside progressive scans: DC predictor and EOB-run state
    reset per interval in every scan type."""
    from udata_datalake_service_spark.llm.jpeg import encode_jpeg_gray_progressive

    img = _gradient(40, 24, seed=3)
    base = decode_jpeg(encode_jpeg_gray(40, 24, img))
    prog = decode_jpeg(
        encode_jpeg_gray_progressive(40, 24, img, restart_interval=3)
    )
    assert base[3] == prog[3]


def test_progressive_eobrun_spans_blocks():
    """A mostly-flat image with one detailed block: the AC first scan
    EOB-runs across the flat blocks (run > 1) and must resynchronize on
    the detailed one."""
    from udata_datalake_service_spark.llm.jpeg import encode_jpeg_gray_progressive

    w, h = 64, 8  # 8 blocks in a row
    img = np.full((h, w), 90, dtype=np.uint8)
    img[:, 40:48] = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3  # block 5 busy
    data = encode_jpeg_gray_progressive(w, h, img.tobytes())
    base = decode_jpeg(encode_jpeg_gray(w, h, img.tobytes()))
    prog = decode_jpeg(data)
    assert base[3] == prog[3]


def test_progressive_chroma_scans_skipped(monkeypatch):
    """Multi-component progressive: non-interleaved chroma scans are
    jumped over without entropy-decoding them. Build a 3-component file
    whose chroma AC scan bytes are GARBAGE after valid luminance scans —
    decode must still succeed because those scans are never read."""
    import struct as _s

    from udata_datalake_service_spark.llm import jpeg as J

    w, h = 16, 8
    img = bytes(range(0, 128))  # 16x8 gradient
    # encode single-component progressive, then rewrite SOF to claim 3
    # components and append a fake chroma AC scan full of junk
    data = bytearray(J.encode_jpeg_gray_progressive(w, h, img))

    def seg(marker, body):
        return bytes((0xFF, marker)) + _s.pack(">H", len(body) + 2) + body

    sof3 = seg(
        0xC2,
        _s.pack(">BHHB", 8, h, w, 3)
        + bytes((1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0)),
    )
    # replace the single-component SOF2 with the 3-component one
    old_sof = seg(0xC2, _s.pack(">BHHB", 8, h, w, 1) + bytes((1, 0x11, 0)))
    idx = bytes(data).index(old_sof)
    data[idx : idx + len(old_sof)] = sof3
    # DC scans in the file are ns=1 for component 1 only — legal. Append
    # a chroma AC scan (component id 2) with garbage entropy data before EOI.
    assert bytes(data[-2:]) == b"\xff\xd9"
    junk_scan = seg(0xDA, bytes((1, 2, 0x00, 1, 63, 0))) + b"\x13\x37" * 20
    data[-2:] = junk_scan + b"\xff\xd9"
    wd, hd, nc, pix = J.decode_jpeg(bytes(data))
    assert (wd, hd, nc) == (w, h, 1)
    # luminance identical to the unmangled single-component decode
    ref = J.decode_jpeg(J.encode_jpeg_gray_progressive(w, h, img))
    assert pix == ref[3]


def test_baseline_ac_overrun_is_loud():
    """ADVICE r6: a corrupt run that walks past the block end must raise
    a descriptive ValueError, not IndexError."""
    from udata_datalake_service_spark.llm.jpeg import _BASELINE_SOF  # noqa: F401

    # craft: encode a valid image, then corrupt the entropy data until a
    # run-past-end occurs; accept either the descriptive error or any
    # other *ValueError* — never IndexError
    good = encode_jpeg_gray(16, 16, bytes(range(256)))
    saw_value_error = False
    for cut in range(len(good) - 40, len(good) - 2):
        corrupted = good[:cut] + b"\xfb" + good[cut + 1 :]
        try:
            decode_jpeg(corrupted)
        except ValueError:
            saw_value_error = True
        except NotImplementedError:
            pass
        except IndexError as e:  # the defect ADVICE flagged
            raise AssertionError(f"IndexError leaked at cut={cut}") from e
    assert saw_value_error
