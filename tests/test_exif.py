"""EXIF/TIFF codec tests (llm/exif.py).

The parser is exercised three ways: against the package's own writer
(both byte orders, full field matrix), against a HAND-PACKED TIFF blob
(so parser correctness never rests on writer symmetry), and against
hostile input (truncation sweep, IFD cycles, zero-denominator
rationals, wrong magic) — on a crawl corpus malformed EXIF is data.
"""

from __future__ import annotations

import struct

import pytest

from udata_datalake_service_spark.llm.exif import (
    build_exif_app1,
    insert_app1,
    parse_exif,
)
from udata_datalake_service_spark.llm.jpeg import decode_jpeg, encode_jpeg_gray


def _tagged_jpeg(byte_order: str) -> bytes:
    app1 = build_exif_app1(
        byte_order=byte_order,
        make="CamCo",
        model="X-100",
        orientation=6,
        datetime="2026:01:02 03:04:05",
        datetime_original="2025:12:31 23:59:59",
        pixel_x=640,
        pixel_y=480,
        iso=400,
        f_number=(28, 10),
        exposure_time=(1, 250),
        focal_length=(35, 1),
        gps=(-48.5, 2.25),  # S hemisphere, exact arc-second grid
    )
    return insert_app1(encode_jpeg_gray(16, 8, bytes([100]) * 128), app1)


@pytest.mark.parametrize("byte_order", ["II", "MM"])
def test_roundtrip_full_field_matrix(byte_order):
    m = parse_exif(_tagged_jpeg(byte_order))
    assert m["byte_order"] == byte_order
    assert m["make"] == "CamCo" and m["model"] == "X-100"
    assert m["orientation"] == 6
    assert m["datetime"] == "2026:01:02 03:04:05"
    assert m["datetime_original"] == "2025:12:31 23:59:59"
    assert (m["pixel_x"], m["pixel_y"], m["iso"]) == (640, 480, 400)
    assert m["f_number"] == 2.8 and m["exposure_time"] == 1 / 250
    assert m["focal_length_mm"] == 35.0
    assert m["gps_lat"] == -48.5 and m["gps_lon"] == 2.25


def test_decode_ladder_tolerates_app1():
    w, h, _, px = decode_jpeg(_tagged_jpeg("II"))
    assert (w, h) == (16, 8) and px[0] in range(99, 102)


def test_hand_packed_tiff_little_endian():
    # Constructed byte-by-byte from TIFF 6.0, NOT via build_exif_app1:
    # header(8), one IFD — count(2) + 2×12 entries + next-ptr(4) — so the
    # out-of-line Make ASCII lands at absolute offset 38.
    tiff = (
        b"II" + struct.pack("<HI", 42, 8)
        + struct.pack("<H", 2)  # 2 entries
        + struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<H", 8) + b"\x00\x00"
        + struct.pack("<HHI", 0x010F, 2, 6) + struct.pack("<I", 38)
        + struct.pack("<I", 0)  # next IFD
        + b"Nikon\x00"
    )
    m = parse_exif(tiff)  # bare TIFF accepted (no JPEG wrapper)
    assert m["orientation"] == 8 and m["make"] == "Nikon"


def test_inline_ascii_value():
    # "abc\0" is exactly 4 bytes — stored inline, no offset indirection
    app1 = build_exif_app1(byte_order="II", make="abc")
    jpeg = insert_app1(encode_jpeg_gray(8, 8, bytes(64)), app1)
    assert parse_exif(jpeg)["make"] == "abc"


def test_truncation_sweep_never_raises():
    j = _tagged_jpeg("MM")
    for cut in range(len(j)):
        parse_exif(j[:cut])  # partial dicts, never exceptions


def test_no_app1_and_bad_magic():
    assert parse_exif(encode_jpeg_gray(8, 8, bytes(64))) == {}
    assert parse_exif(b"II" + struct.pack("<HI", 41, 8) + bytes(20)) == {}
    assert parse_exif(b"ZZ" + bytes(20)) == {}
    assert parse_exif(b"") == {}


def test_ifd_cycle_terminates():
    # EXIF pointer aimed back at IFD0's own offset: the visited-set guard
    # must cut the loop
    tiff = (
        b"II" + struct.pack("<HI", 42, 8)
        + struct.pack("<H", 1)
        + struct.pack("<HHI", 0x8769, 4, 1) + struct.pack("<I", 8)
        + struct.pack("<I", 0)
    )
    assert parse_exif(tiff)["byte_order"] == "II"


def test_zero_denominator_rational_dropped():
    tiff = (
        b"II" + struct.pack("<HI", 42, 8)
        + struct.pack("<H", 1)
        + struct.pack("<HHI", 0x8769, 4, 1) + struct.pack("<I", 26)
        + struct.pack("<I", 0)
        # EXIF IFD at 26: FNumber RATIONAL with denominator 0 at offset 44
        + struct.pack("<H", 1)
        + struct.pack("<HHI", 0x829D, 5, 1) + struct.pack("<I", 44)
        + struct.pack("<I", 0)
        + struct.pack("<II", 28, 0)
    )
    assert "f_number" not in parse_exif(tiff)


def test_out_of_range_offset_skipped():
    tiff = (
        b"II" + struct.pack("<HI", 42, 8)
        + struct.pack("<H", 1)
        # Make ASCII count 64 at offset 9999 — far past the buffer
        + struct.pack("<HHI", 0x010F, 2, 64) + struct.pack("<I", 9999)
        + struct.pack("<I", 0)
    )
    assert "make" not in parse_exif(tiff)


def test_spark_exif_pipeline(spark):
    from udata_datalake_service_spark.llm.multimodal import (
        exif_media_from_documents,
        extract_exif_features,
    )

    docs = spark.createDataFrame([(i,) for i in range(0, 40)], "doc_id long")
    out = {
        r["media_id"]: r.asDict()
        for r in extract_exif_features(exif_media_from_documents(docs)).collect()
    }
    assert sorted(out) == [0, 4, 8, 12, 16, 20, 24, 28, 32, 36]
    assert out[12]["byte_order"] == "MM" and out[4]["byte_order"] == "II"
    assert out[28]["model"] is None  # 28 % 7 == 0 → tag absent
    assert out[4]["make"] == "Cam1" and out[4]["orientation"] == 5
    # GPS closed form: doc 4 → lat_sec = (4-90)*3600 + 4*60 + 0
    assert out[4]["gps_lat"] == round(-(86 - 4 / 60), 6) + 0  # -85.933333
    assert out[4]["pixel_x"] == 16 + 8 * (4 % 3)
