"""From-scratch EXIF/TIFF metadata codec (TIFF 6.0 + EXIF 2.3, public
specs) — the camera-metadata plane of the multimodal ladder.

The reference's closest surface is MIME/type sniffing
(``udata_hydra/analysis/resource.py`` magic-byte checks); EXIF is
first-class here because a web-scale image corpus carries its only
provenance (capture time, camera, orientation, GPS) inside the files
themselves, and training-data curation needs it for dedup priors,
orientation-aware decoding, and PII (GPS) stripping — at 100 TB this
must run as a header-only distributed scan, never a full pixel decode.

Both directions are implemented so the distributed path is testable on
bytes no driver ever saw:

* ``parse_exif`` — marker scan to APP1 ``Exif\\x00\\x00``, then a
  bounds-checked TIFF walk: byte order (II/MM), IFD0, the EXIF and GPS
  sub-IFDs. Corrupt input degrades to a partial dict (every offset is
  range-checked, IFD cycles are cut by a visited set) — on a crawl
  corpus malformed EXIF is data, not an error.
* ``build_exif_app1`` / ``insert_app1`` — a writer used by fixtures to
  synthesize APP1 segments (both byte orders) and splice them into
  JPEGs from :mod:`udata_datalake_service_spark.llm.jpeg`.

Normalization contract (what the Spark columns mean):

* ``orientation`` — raw TIFF 274 value (1..8);
* ``gps_lat`` / ``gps_lon`` — signed decimal degrees from the
  (deg, min, sec) RATIONAL triplets and their N/S/E/W refs;
* rationals (``f_number``, ``exposure_time``, ``focal_length_mm``) —
  floats, numerator/denominator division; denominator 0 → None.
"""

from __future__ import annotations

import struct

# TIFF field types → (struct code, size in bytes). RATIONAL types are
# pairs of (S)LONG handled explicitly.
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

# IFD0 tags
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
# EXIF sub-IFD tags
_TAG_EXPOSURE = 0x829A
_TAG_FNUMBER = 0x829D
_TAG_ISO = 0x8827
_TAG_DT_ORIGINAL = 0x9003
_TAG_FOCAL = 0x920A
_TAG_PIXEL_X = 0xA002
_TAG_PIXEL_Y = 0xA003
# GPS sub-IFD tags
_TAG_GPS_LAT_REF = 0x0001
_TAG_GPS_LAT = 0x0002
_TAG_GPS_LON_REF = 0x0003
_TAG_GPS_LON = 0x0004

_MAX_IFD_ENTRIES = 4096


def _find_app1_tiff(data: bytes) -> bytes | None:
    """The TIFF blob inside the first ``Exif\\x00\\x00`` APP1 segment of a
    JPEG, or the data itself if it already starts with a TIFF header
    (so the parser also accepts bare TIFF/EXIF payloads)."""
    if data[:2] in (b"II", b"MM"):
        return data
    if data[:2] != b"\xff\xd8":
        return None
    from udata_datalake_service_spark.llm.jpeg import _segments

    try:
        for marker, payload, _ in _segments(data):
            if marker == 0xE1 and payload[:6] == b"Exif\x00\x00":
                return payload[6:]
            if marker == 0xDA:
                break
    except ValueError:
        return None
    return None


def _read_ifd(tiff: bytes, off: int, e: str) -> tuple[dict[int, tuple], int]:
    """Entries of the IFD at ``off`` as {tag: (type, count, raw_field)},
    plus the next-IFD offset. Malformed entries are skipped; a truncated
    IFD returns what was readable."""
    out: dict[int, tuple] = {}
    if off < 0 or off + 2 > len(tiff):
        return out, 0
    (n,) = struct.unpack_from(e + "H", tiff, off)
    n = min(n, _MAX_IFD_ENTRIES)
    pos = off + 2
    for _ in range(n):
        if pos + 12 > len(tiff):
            break
        tag, typ, cnt = struct.unpack_from(e + "HHI", tiff, pos)
        out[tag] = (typ, cnt, tiff[pos + 8 : pos + 12])
        pos += 12
    nxt = 0
    if pos + 4 <= len(tiff):
        (nxt,) = struct.unpack_from(e + "I", tiff, pos)
    return out, nxt


def _field_bytes(tiff: bytes, typ: int, cnt: int, raw: bytes, e: str) -> bytes | None:
    size = _TYPE_SIZE.get(typ, 0) * cnt
    if size == 0:
        return None
    if size <= 4:
        return raw[:size]
    (off,) = struct.unpack(e + "I", raw)
    if off + size > len(tiff):
        return None
    return tiff[off : off + size]


def _value(tiff: bytes, typ: int, cnt: int, raw: bytes, e: str):
    buf = _field_bytes(tiff, typ, cnt, raw, e)
    if buf is None:
        return None
    if typ == 2:  # ASCII, NUL-terminated
        return buf.split(b"\x00", 1)[0].decode("ascii", "replace")
    if typ in (1, 7):
        return list(buf) if cnt > 1 else buf[0]
    if typ == 3:
        vals = struct.unpack(e + f"{cnt}H", buf)
    elif typ == 4:
        vals = struct.unpack(e + f"{cnt}I", buf)
    elif typ == 9:
        vals = struct.unpack(e + f"{cnt}i", buf)
    elif typ in (5, 10):
        code = "I" if typ == 5 else "i"
        flat = struct.unpack(e + f"{2 * cnt}{code}", buf)
        vals = tuple(
            (flat[2 * i], flat[2 * i + 1]) for i in range(cnt)
        )
    else:
        return None
    return list(vals) if cnt > 1 else vals[0]


def _ratio(v) -> float | None:
    if not isinstance(v, tuple) or len(v) != 2 or v[1] == 0:
        return None
    return v[0] / v[1]


def _gps_decimal(trip, ref) -> float | None:
    """(deg, min, sec) RATIONAL triplet + hemisphere ref → signed
    decimal degrees."""
    if not isinstance(trip, list) or len(trip) != 3:
        return None
    parts = [_ratio(t) for t in trip]
    if any(p is None for p in parts):
        return None
    dec = parts[0] + parts[1] / 60 + parts[2] / 3600
    if isinstance(ref, str) and ref.upper() in ("S", "W"):
        dec = -dec
    return dec


def parse_exif(data: bytes) -> dict:
    """EXIF metadata of a JPEG (or bare TIFF blob) as a flat dict.

    Always returns a dict; missing/corrupt structures yield missing
    keys, never exceptions. Keys: make, model, orientation, datetime,
    datetime_original, pixel_x, pixel_y, iso, f_number, exposure_time,
    focal_length_mm, gps_lat, gps_lon, byte_order.
    """
    out: dict = {}
    tiff = _find_app1_tiff(data)
    if tiff is None or len(tiff) < 8:
        return out
    order = tiff[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        return out
    (magic,) = struct.unpack_from(e + "H", tiff, 2)
    if magic != 42:
        return out
    out["byte_order"] = order.decode()
    (ifd0_off,) = struct.unpack_from(e + "I", tiff, 4)

    visited: set[int] = set()

    def ifd(off: int) -> dict[int, tuple]:
        if off in visited:
            return {}
        visited.add(off)
        entries, _ = _read_ifd(tiff, off, e)
        return entries

    ifd0 = ifd(ifd0_off)

    def val(entries, tag):
        if tag not in entries:
            return None
        typ, cnt, raw = entries[tag]
        return _value(tiff, typ, cnt, raw, e)

    for key, tag in (
        ("make", _TAG_MAKE),
        ("model", _TAG_MODEL),
        ("orientation", _TAG_ORIENTATION),
        ("datetime", _TAG_DATETIME),
    ):
        v = val(ifd0, tag)
        if v is not None:
            out[key] = v

    exif_off = val(ifd0, _TAG_EXIF_IFD)
    if isinstance(exif_off, int):
        sub = ifd(exif_off)
        for key, tag in (
            ("datetime_original", _TAG_DT_ORIGINAL),
            ("pixel_x", _TAG_PIXEL_X),
            ("pixel_y", _TAG_PIXEL_Y),
            ("iso", _TAG_ISO),
        ):
            v = val(sub, tag)
            if v is not None:
                out[key] = v
        for key, tag in (
            ("f_number", _TAG_FNUMBER),
            ("exposure_time", _TAG_EXPOSURE),
            ("focal_length_mm", _TAG_FOCAL),
        ):
            v = _ratio(val(sub, tag))
            if v is not None:
                out[key] = v

    gps_off = val(ifd0, _TAG_GPS_IFD)
    if isinstance(gps_off, int):
        gps = ifd(gps_off)
        lat = _gps_decimal(val(gps, _TAG_GPS_LAT), val(gps, _TAG_GPS_LAT_REF))
        lon = _gps_decimal(val(gps, _TAG_GPS_LON), val(gps, _TAG_GPS_LON_REF))
        if lat is not None:
            out["gps_lat"] = lat
        if lon is not None:
            out["gps_lon"] = lon
    return out


# ---------------------------------------------------------------- writer


def _enc_entry(e: str, tag: int, typ: int, values) -> tuple[bytes, bytes]:
    """(12-byte-entry-with-placeholder, out-of-line payload). The entry's
    value field holds the payload inline when it fits, else the marker
    b'OFFS' to be patched by the IFD assembler."""
    if typ == 2:
        payload = values.encode("ascii") + b"\x00"
        cnt = len(payload)
    elif typ == 3:
        vals = values if isinstance(values, (list, tuple)) else [values]
        cnt = len(vals)
        payload = struct.pack(e + f"{cnt}H", *vals)
    elif typ == 4:
        vals = values if isinstance(values, (list, tuple)) else [values]
        cnt = len(vals)
        payload = struct.pack(e + f"{cnt}I", *vals)
    elif typ == 5:
        pairs = values if isinstance(values[0], (list, tuple)) else [values]
        cnt = len(pairs)
        payload = b"".join(struct.pack(e + "II", *p) for p in pairs)
    else:
        raise ValueError(f"exif writer: unsupported type {typ}")
    head = struct.pack(e + "HHI", tag, typ, cnt)
    if len(payload) <= 4:
        return head + payload.ljust(4, b"\x00"), b""
    return head + b"OFFS", payload


def _pack_ifd(e: str, abs_off: int, entries: list[tuple[bytes, bytes]]) -> bytes:
    """Serialize an IFD at absolute TIFF offset ``abs_off``: entry table,
    zero next-IFD pointer, then the out-of-line data area, with offsets
    patched."""
    table_size = 2 + 12 * len(entries) + 4
    data_off = abs_off + table_size
    table = [struct.pack(e + "H", len(entries))]
    blob = b""
    for head, payload in entries:
        if payload:
            head = head[:8] + struct.pack(e + "I", data_off + len(blob))
            blob += payload
            if len(blob) % 2:  # TIFF offsets should stay word-aligned
                blob += b"\x00"
        table.append(head)
    table.append(struct.pack(e + "I", 0))
    return b"".join(table) + blob


def build_exif_app1(
    *,
    byte_order: str = "II",
    make: str | None = None,
    model: str | None = None,
    orientation: int | None = None,
    datetime: str | None = None,
    datetime_original: str | None = None,
    pixel_x: int | None = None,
    pixel_y: int | None = None,
    iso: int | None = None,
    f_number: tuple[int, int] | None = None,
    exposure_time: tuple[int, int] | None = None,
    focal_length: tuple[int, int] | None = None,
    gps: tuple[float, float] | None = None,
) -> bytes:
    """A complete APP1 segment (marker + length + Exif header + TIFF)
    carrying the given fields, in either byte order. ``gps`` is signed
    decimal (lat, lon); it is encoded as integer-second (deg, min, sec)
    triplets, so callers should pass values on a 1/3600° grid for exact
    round-trips."""
    e = "<" if byte_order == "II" else ">"

    exif_entries: list[tuple[bytes, bytes]] = []
    if exposure_time is not None:
        exif_entries.append(_enc_entry(e, _TAG_EXPOSURE, 5, exposure_time))
    if f_number is not None:
        exif_entries.append(_enc_entry(e, _TAG_FNUMBER, 5, f_number))
    if iso is not None:
        exif_entries.append(_enc_entry(e, _TAG_ISO, 3, iso))
    if datetime_original is not None:
        exif_entries.append(_enc_entry(e, _TAG_DT_ORIGINAL, 2, datetime_original))
    if focal_length is not None:
        exif_entries.append(_enc_entry(e, _TAG_FOCAL, 5, focal_length))
    if pixel_x is not None:
        exif_entries.append(_enc_entry(e, _TAG_PIXEL_X, 4, pixel_x))
    if pixel_y is not None:
        exif_entries.append(_enc_entry(e, _TAG_PIXEL_Y, 4, pixel_y))

    gps_entries: list[tuple[bytes, bytes]] = []
    if gps is not None:
        lat, lon = gps

        def triplet(dec: float) -> list[tuple[int, int]]:
            total = round(abs(dec) * 3600)
            return [(total // 3600, 1), (total // 60 % 60, 1), (total % 60, 1)]

        gps_entries.append(
            _enc_entry(e, _TAG_GPS_LAT_REF, 2, "N" if lat >= 0 else "S")
        )
        gps_entries.append(_enc_entry(e, _TAG_GPS_LAT, 5, triplet(lat)))
        gps_entries.append(
            _enc_entry(e, _TAG_GPS_LON_REF, 2, "E" if lon >= 0 else "W")
        )
        gps_entries.append(_enc_entry(e, _TAG_GPS_LON, 5, triplet(lon)))

    ifd0_entries: list[tuple[bytes, bytes]] = []
    if make is not None:
        ifd0_entries.append(_enc_entry(e, _TAG_MAKE, 2, make))
    if model is not None:
        ifd0_entries.append(_enc_entry(e, _TAG_MODEL, 2, model))
    if orientation is not None:
        ifd0_entries.append(_enc_entry(e, _TAG_ORIENTATION, 3, orientation))
    if datetime is not None:
        ifd0_entries.append(_enc_entry(e, _TAG_DATETIME, 2, datetime))

    # Lay out: header(8) | IFD0 | EXIF IFD | GPS IFD. Pointer values
    # depend only on the SIZES of the blocks before them, so compute the
    # sizes first with placeholder pointers, then re-pack for real.
    def ifd_size(entries: list[tuple[bytes, bytes]]) -> int:
        data = sum(
            len(p) + (len(p) % 2) for _, p in entries if p
        )
        return 2 + 12 * len(entries) + 4 + data

    n_pointers = (1 if exif_entries else 0) + (1 if gps_entries else 0)
    ifd0_total = ifd_size(ifd0_entries) + 12 * n_pointers
    exif_off = 8 + ifd0_total
    gps_off = exif_off + (ifd_size(exif_entries) if exif_entries else 0)

    if exif_entries:
        ifd0_entries.append(_enc_entry(e, _TAG_EXIF_IFD, 4, exif_off))
    if gps_entries:
        ifd0_entries.append(_enc_entry(e, _TAG_GPS_IFD, 4, gps_off))
    ifd0_entries.sort(key=lambda he: struct.unpack(e + "H", he[0][:2])[0])

    tiff = struct.pack(e + "2sHI", byte_order.encode(), 42, 8)
    tiff += _pack_ifd(e, 8, ifd0_entries)
    if exif_entries:
        tiff += _pack_ifd(e, exif_off, exif_entries)
    if gps_entries:
        tiff += _pack_ifd(e, gps_off, gps_entries)

    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment immediately after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG (no SOI)")
    return jpeg[:2] + app1 + jpeg[2:]
