"""Baseline JPEG codec — stdlib+numpy, from the public ITU T.81 spec.

The dominant web image format in any real multimodal corpus is JPEG;
without this module the decode ladder (``multimodal._decode_image``)
fell from Pillow straight to the labeled stub for it. Three entry
points, mirroring the vendored PNG/BMP codecs:

* ``parse_jpeg_dimensions`` — header-only marker scan: true
  width/height/channels from any SOFn (baseline, extended, progressive),
  the metadata ``mm_media_meta`` reports. O(markers), no entropy decode.
* ``decode_jpeg`` — full baseline-sequential (SOF0/SOF1) decode of the
  LUMINANCE plane: DHT canonical Huffman tables, DC prediction +
  byte-stuffed bitstream, restart markers, dequantization, float IDCT,
  level shift. Chroma blocks are entropy-decoded (the bitstream cannot
  be skipped) but not reconstructed — the feature contract downstream
  is the 8-bin luminance histogram, which needs Y only.
* ``encode_jpeg_gray`` — grayscale baseline encoder (fixture/round-trip
  counterpart): with a flat quantization table the DC path is exact for
  block-constant images, giving spec-constructed tests pixel-exact
  expectations (tests/test_jpeg.py).

Like the PNG codec this is a correctness-first reference implementation:
the per-block numpy IDCT is vectorized, but a production pipeline with
Pillow/libjpeg available takes the ladder's faster first rung
automatically.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag scan order: index i of the scan → (row, col) flat index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                0xCD, 0xCE, 0xCF}
_BASELINE_SOF = {0xC0, 0xC1}

# orthonormal 8×8 DCT-II basis: fdct F = M @ s @ M.T, idct s = M.T @ F @ M
_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _segments(data: bytes):
    """Yield (marker, payload, next_offset) for each marker segment; stops
    after yielding SOS (whose payload is the scan header — entropy data
    follows at next_offset)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        while pos < n and data[pos] == 0xFF:  # fill bytes are legal
            pos += 1
        marker = data[pos]
        pos += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            continue
        if marker == 0xD9:  # EOI
            return
        (length,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + length]
        pos += length
        yield marker, payload, pos
        if marker == 0xDA:  # SOS — entropy-coded data follows
            return


def parse_jpeg_dimensions(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from the first SOFn segment —
    header-only, works for progressive/arithmetic files the baseline
    decoder refuses."""
    for marker, payload, _ in _segments(data):
        if marker in _SOF_MARKERS:
            _, h, w, nc = struct.unpack(">BHHB", payload[:6])
            return w, h, nc
    raise ValueError("jpeg: no SOF marker")


class _Huffman:
    """Canonical Huffman table from a DHT (bits, values) spec."""

    def __init__(self, bits: list[int], values: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1
        # encoder view: symbol → (code, length)
        self.codes = {sym: (c, ln) for (ln, c), sym in self.lookup.items()}


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 byte
    unstuffing; restart markers are consumed explicitly by the caller."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                pass  # stuffed 0xFF data byte
            else:
                raise ValueError(f"jpeg: unexpected marker 0xff{nxt:02x} in scan")
        out = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1 + (1 if b == 0xFF else 0)  # skip the stuffed 0x00
        return out

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huffman) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")

    def align_and_expect_rst(self, i: int) -> None:
        if self.bit:
            self.bit = 0
            # all-ones padding can form a 0xFF data byte, which carries a
            # stuffed 0x00 that must be skipped too
            self.pos += 2 if self.data[self.pos] == 0xFF else 1
        if self.data[self.pos : self.pos + 2] != bytes((0xFF, 0xD0 + (i % 8))):
            raise ValueError("jpeg: missing restart marker")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map a t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Baseline decode → (width, height, 1, luminance_pixels). Raises
    NotImplementedError for progressive/arithmetic scans (dimensions are
    still available via ``parse_jpeg_dimensions``)."""
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    scan: list[tuple[int, int]] = []  # per component: (dc_table, ac_table)
    w = h = 0
    restart = 0
    sos_end = None

    for marker, payload, nxt in _segments(data):
        if marker in _SOF_MARKERS and marker not in _BASELINE_SOF:
            raise NotImplementedError(
                f"jpeg: non-baseline SOF 0x{marker:02x} (progressive/arithmetic)"
            )
        if marker in _BASELINE_SOF:
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", payload, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq:
                    vals = struct.unpack_from(f">{64}H", payload, p)
                    p += 128
                else:
                    vals = payload[p : p + 64]
                    p += 64
                table = np.zeros(64)
                for i, z in enumerate(ZIGZAG):
                    table[z] = vals[i]
                qt[tq] = table.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                table = _Huffman(bits, payload[p + 17 : p + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = table
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            order = {c[0]: i for i, c in enumerate(comps)}
            resolved = [None] * len(comps)
            for i in range(ns):
                cid, tables = payload[1 + 2 * i], payload[2 + 2 * i]
                resolved[order[cid]] = (tables >> 4, tables & 0xF)
            if None in resolved or ns != len(comps):
                raise NotImplementedError("jpeg: multi-scan files")
            scan = resolved
            sos_end = nxt

    if not comps or sos_end is None:
        raise ValueError("jpeg: missing SOF/SOS")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if (comps[0][1], comps[0][2]) != (hmax, vmax):
        raise NotImplementedError("jpeg: subsampled luminance")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    reader = _BitReader(data, sos_end)
    plane = np.zeros((mcuy * vmax * 8, mcux * hmax * 8))
    pred = [0] * len(comps)
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                reader.align_and_expect_rst(mcu_i // restart - 1)
                pred = [0] * len(comps)
            for ci, (_, ch, cv, tq) in enumerate(comps):
                dc_t, ac_t = huff_dc[scan[ci][0]], huff_ac[scan[ci][1]]
                for by in range(cv):
                    for bx in range(ch):
                        coef = np.zeros(64)
                        t = reader.decode(dc_t)
                        pred[ci] += _extend(reader.read_bits(t), t)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: sixteen zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s)
                            k += 1
                        if ci == 0:  # reconstruct luminance only
                            block = coef.reshape(8, 8) * qt[tq]
                            pix = _M.T @ block @ _M + 128
                            y0 = (my * cv + by) * 8
                            x0 = (mx * ch + bx) * 8
                            plane[y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_i += 1

    pixels = np.clip(np.rint(plane[:h, :w]), 0, 255).astype(np.uint8)
    return w, h, 1, pixels.tobytes()


# ---------------------------------------------------------------- encoder --
# Annex K.3 typical luminance Huffman tables (public spec data). The
# decoder never assumes them — it reads DHT from the stream — so encoder
# and decoder stay self-consistent by construction.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = bytes(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = bytes(
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]
)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def pad(self) -> None:
        if self.nbits:
            n = 8 - self.nbits
            self.write((1 << n) - 1, n)  # pad with 1s per spec

    def marker(self, m: int) -> None:
        self.pad()
        self.out += bytes((0xFF, m))

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.out)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg_gray(
    width: int, height: int, pixels: bytes, qval: int = 1, restart_interval: int = 0
) -> bytes:
    """Baseline grayscale JPEG. ``qval=1`` (flat unit quantization) makes
    the transform the only lossy step — block-constant images round-trip
    pixel-exactly and arbitrary content round-trips within ±2 (IDCT
    rounding), both pinned by tests. ``restart_interval`` emits DRI/RSTn
    markers every N MCUs (exercises the decoder's restart path)."""
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width).astype(float)
    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    img = np.pad(img, ((0, ph - height), (0, pw - width)), mode="edge")

    dc_tab = _Huffman(_DC_BITS, _DC_VALS)
    ac_tab = _Huffman(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    pred = 0
    mcu_i = 0
    for y0 in range(0, ph, 8):
        for x0 in range(0, pw, 8):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.marker(0xD0 + (mcu_i // restart_interval - 1) % 8)
                pred = 0
            mcu_i += 1
            block = img[y0 : y0 + 8, x0 : x0 + 8] - 128
            coef = np.rint((_M @ block @ _M.T) / qval).astype(int)
            zz = [int(coef.flat[z]) for z in ZIGZAG]
            diff = zz[0] - pred
            pred = zz[0]
            t = _category(diff)
            bw.write(*dc_tab.codes[t])
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.write(*ac_tab.codes[0xF0])  # ZRL
                    run -= 16
                s = _category(zz[k])
                bw.write(*ac_tab.codes[(run << 4) | s])
                v = zz[k]
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                bw.write(*ac_tab.codes[0x00])  # EOB

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    zz_q = bytes(qval for _ in range(64))
    out = b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + zz_q)
    out += seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + bytes((1, 0x11, 0)))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS)
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + _AC_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes((1, 1, 0x00, 0, 63, 0)))
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return out
