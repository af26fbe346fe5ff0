"""S4 — stdlib ``.xls`` (BIFF8) reader, plus a minimal writer for fixtures.

Reference: utils/reader.py:60-66 reads ``.xls`` via xlrd; utils/csv.py:24-31
sniffs the OLE2 magic. xlrd is not installable in this environment, so this
module implements the subset of [MS-CFB] (the OLE2 compound-file container)
and [MS-XLS] (BIFF8 records) that real open-data workbooks exercise:

- CFB: FAT / DIFAT sector chains, directory tree, mini-stream (streams
  below the 4096-byte cutoff live in the ministream addressed by miniFAT).
- BIFF8 globals: BOUNDSHEET (sheet name → substream offset), SST with
  CONTINUE-record splits (the grbit byte restates itself at each split).
- BIFF8 cells: LABELSST, LABEL/RSTRING, NUMBER, RK, MULRK, BOOLERR,
  FORMULA (cached numeric / boolean / string-via-STRING results),
  BLANK/MULBLANK.
- Legacy BIFF5/7 workbooks (pre-1997 .xls, still common on open-data
  portals): byte-string LABELs and ShortString sheet names, detected from
  the BOF version field.

``write_xls`` emits a small-but-valid single-sheet BIFF8 workbook (used to
generate deterministic fixtures for the s4 oracle — the reference only ever
*reads* xls, so the writer is test plumbing, not an engine capability).
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC


# --------------------------------------------------------------- CFB read ----
def read_cfb_stream(path: str, names: tuple[str, ...] = ("workbook", "book")) -> bytes:
    """Extract the named stream (case-insensitive) from an OLE2 file."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _CFB_MAGIC:
        raise ValueError(f"not an OLE2 compound file: {path}")
    (sect_shift,) = struct.unpack_from("<H", data, 30)
    (mini_shift,) = struct.unpack_from("<H", data, 32)
    ssz, msz = 1 << sect_shift, 1 << mini_shift
    (dir_start,) = struct.unpack_from("<I", data, 48)
    (cutoff,) = struct.unpack_from("<I", data, 56)
    (minifat_start,) = struct.unpack_from("<I", data, 60)
    (num_minifat,) = struct.unpack_from("<I", data, 64)
    (difat_start,) = struct.unpack_from("<I", data, 68)
    (num_difat,) = struct.unpack_from("<I", data, 72)
    per = ssz // 4

    def sector(i: int) -> bytes:
        off = 512 + i * ssz
        return data[off : off + ssz]

    difat = list(struct.unpack_from("<109I", data, 76))
    s = difat_start
    for _ in range(num_difat):
        if s >= _DIFSECT:
            break
        vals = struct.unpack(f"<{per}I", sector(s))
        difat.extend(vals[:-1])
        s = vals[-1]
    fat: list[int] = []
    for fs in difat:
        if fs >= _DIFSECT:
            continue
        fat.extend(struct.unpack(f"<{per}I", sector(fs)))

    def chain(start: int) -> bytes:
        out = bytearray()
        s, guard = start, 0
        while s < _DIFSECT and guard <= len(fat):
            out += sector(s)
            s = fat[s]
            guard += 1
        return bytes(out)

    dirdata = chain(dir_start)
    root = None
    target = None
    for off in range(0, len(dirdata) - 127, 128):
        e = dirdata[off : off + 128]
        (nlen,) = struct.unpack_from("<H", e, 64)
        if nlen < 2:
            continue
        name = e[: nlen - 2].decode("utf-16-le", "replace")
        etype = e[66]
        (start,) = struct.unpack_from("<I", e, 116)
        (size,) = struct.unpack_from("<Q", e, 120)
        if etype == 5:
            root = (start, size)
        elif etype == 2 and name.lower() in names and target is None:
            target = (start, size)
    if target is None:
        raise ValueError(f"no {'/'.join(names)} stream in {path}")
    start, size = target
    if size >= cutoff:
        return chain(start)[:size]
    # small stream: bytes live in the ministream, addressed by the miniFAT
    if root is None:
        raise ValueError(f"OLE2 file without root entry: {path}")
    ministream = chain(root[0])[: root[1]]
    minifat: list[int] = []
    s = minifat_start
    for _ in range(num_minifat):
        if s >= _DIFSECT:
            break
        minifat.extend(struct.unpack(f"<{per}I", sector(s)))
        s = fat[s]
    out = bytearray()
    s, guard = start, 0
    while s < _DIFSECT and guard <= len(minifat):
        out += ministream[s * msz : (s + 1) * msz]
        s = minifat[s]
        guard += 1
    return bytes(out[:size])


# ------------------------------------------------------------- BIFF parse ----
def _iter_records(stream: bytes, pos: int = 0):
    n = len(stream)
    while pos + 4 <= n:
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield op, stream[pos + 4 : pos + 4 + ln]
        pos += 4 + ln


class _SstCursor:
    """Byte cursor over the SST record + its CONTINUE chunks. Character
    data may split at a CONTINUE boundary, where a fresh grbit byte
    (compressed/utf16 flag) restates itself — header fields never split."""

    def __init__(self, chunks: list[bytes]):
        self.chunks, self.ci, self.off = chunks, 0, 0

    def _avail(self) -> int:
        return len(self.chunks[self.ci]) - self.off

    def _skip_empty(self) -> None:
        while self.ci < len(self.chunks) - 1 and self._avail() == 0:
            self.ci += 1
            self.off = 0

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n:
            self._skip_empty()
            take = min(n, self._avail())
            if take == 0:
                raise ValueError("truncated SST")
            c = self.chunks[self.ci]
            out += c[self.off : self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def read_string(self) -> str:
        (cch,) = struct.unpack("<H", self.read(2))
        flags = self.read(1)[0]
        high = flags & 0x01
        crun = struct.unpack("<H", self.read(2))[0] if flags & 0x08 else 0
        cbext = struct.unpack("<I", self.read(4))[0] if flags & 0x04 else 0
        parts: list[str] = []
        need = cch
        while need:
            self._skip_empty()
            if self._avail() == 0:
                raise ValueError("truncated SST string")
            if self.off == 0 and parts:
                # crossed into a CONTINUE mid-string: fresh grbit byte
                high = self.read(1)[0] & 0x01
                self._skip_empty()
            if high:
                take = min(need, self._avail() // 2)
                if take == 0:
                    raise ValueError("utf16 split off char boundary")
                parts.append(self.read(take * 2).decode("utf-16-le", "replace"))
            else:
                take = min(need, self._avail())
                parts.append(self.read(take).decode("latin-1"))
            need -= take
        if crun or cbext:
            self.read(4 * crun + cbext)
        return "".join(parts)


def _parse_sst(chunks: list[bytes]) -> list[str]:
    cur = _SstCursor(chunks)
    cur.read(4)  # total refs
    (unique,) = struct.unpack("<I", cur.read(4))
    return [cur.read_string() for _ in range(unique)]


def _read_unicode_str(data: bytes, off: int, biff_ver: int = 0x0600) -> str:
    (cch,) = struct.unpack_from("<H", data, off)
    if biff_ver < 0x0600:  # BIFF5/7: plain byte string, no option flags
        return data[off + 2 : off + 2 + cch].decode("latin-1")
    flags = data[off + 2]
    p = off + 3
    if flags & 0x08:
        p += 2
    if flags & 0x04:
        p += 4
    if flags & 0x01:
        return data[p : p + 2 * cch].decode("utf-16-le", "replace")
    return data[p : p + cch].decode("latin-1")


def _decode_rk(rk: int) -> float:
    if rk & 0x02:  # 30-bit signed integer
        v: float = rk >> 2
        if rk & 0x80000000:
            v -= 0x40000000
    else:  # top 30 bits of an IEEE double
        v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100 if rk & 0x01 else v


def _read_sheet_cells(
    stream: bytes, offset: int, sst: list[str], biff_ver: int = 0x0600
) -> dict:
    cells: dict[int, dict[int, object]] = {}
    pending_formula: tuple[int, int] | None = None

    def put(r: int, c: int, v: object) -> None:
        cells.setdefault(r, {})[c] = v

    started = False
    for op, data in _iter_records(stream, offset):
        if op == 0x0809:
            if started:
                break  # ran into the next substream
            started = True
        elif op == 0x000A:
            break
        elif op == 0x00FD:  # LABELSST
            r, c, _xf, isst = struct.unpack_from("<HHHI", data)
            put(r, c, sst[isst])
        elif op in (0x0204, 0x00D6):  # LABEL / RSTRING (inline string)
            r, c, _xf = struct.unpack_from("<HHH", data)
            put(r, c, _read_unicode_str(data, 6, biff_ver))
        elif op == 0x0203:  # NUMBER
            r, c, _xf = struct.unpack_from("<HHH", data)
            put(r, c, struct.unpack_from("<d", data, 6)[0])
        elif op == 0x027E:  # RK
            r, c, _xf, rk = struct.unpack_from("<HHHI", data)
            put(r, c, _decode_rk(rk))
        elif op == 0x00BD:  # MULRK
            r, c0 = struct.unpack_from("<HH", data)
            for k in range((len(data) - 6) // 6):
                _xf, rk = struct.unpack_from("<HI", data, 4 + 6 * k)
                put(r, c0 + k, _decode_rk(rk))
        elif op == 0x0205:  # BOOLERR
            r, c, _xf, val, iserr = struct.unpack_from("<HHHBB", data)
            put(r, c, None if iserr else bool(val))
        elif op == 0x0006:  # FORMULA (cached result)
            r, c, _xf = struct.unpack_from("<HHH", data)
            res = data[6:14]
            if res[6:8] == b"\xff\xff":
                t = res[0]
                if t == 0:  # string result arrives in the next STRING record
                    pending_formula = (r, c)
                elif t == 1:
                    put(r, c, bool(res[2]))
                else:  # error / empty
                    put(r, c, None)
            else:
                put(r, c, struct.unpack("<d", res)[0])
        elif op == 0x0207 and pending_formula is not None:  # STRING
            r, c = pending_formula
            pending_formula = None
            put(r, c, _read_unicode_str(data, 0, biff_ver))
    return cells


def iter_xls_rows_stdlib(path: str, sheet_name: str | None = None):
    """Minimal BIFF8 row iterator — the ``.xls`` sibling of
    ``iter_xlsx_rows_stdlib``: yields lists of cell values per populated
    row, positional gaps as None."""
    stream = read_cfb_stream(path)
    sst: list[str] = []
    sheets: list[tuple[str, int]] = []
    glob: list[tuple[int, bytes]] = []
    for op, data in _iter_records(stream, 0):
        glob.append((op, data))
        if op == 0x000A:  # EOF of the globals substream
            break
    # BOF vers field: 0x0600 = BIFF8 (unicode strings, SST); 0x0500 =
    # BIFF5/7 (byte strings, no SST) — xlrd handles both, so do we
    biff_ver = 0x0600
    if glob and glob[0][0] == 0x0809 and len(glob[0][1]) >= 2:
        v = struct.unpack_from("<H", glob[0][1])[0]
        if v and v < 0x0600:
            biff_ver = v
    for i, (op, data) in enumerate(glob):
        if op == 0x0085:  # BOUNDSHEET
            (lbplypos,) = struct.unpack_from("<I", data)
            if biff_ver < 0x0600:  # ShortString: u8 len + bytes
                cch = data[6]
                name = data[7 : 7 + cch].decode("latin-1")
            else:
                cch, flags, raw = data[6], data[7], data[8:]
                name = (
                    raw[: 2 * cch].decode("utf-16-le", "replace")
                    if flags & 0x01
                    else raw[:cch].decode("latin-1")
                )
            sheets.append((name, lbplypos))
        elif op == 0x00FC:  # SST + immediately-following CONTINUEs
            chunks = [data]
            for op2, data2 in glob[i + 1 :]:
                if op2 != 0x003C:
                    break
                chunks.append(data2)
            sst = _parse_sst(chunks)
    if not sheets:
        raise ValueError(f"no sheets in {path}")
    if sheet_name is None:
        offset = sheets[0][1]
    else:
        match = [off for n, off in sheets if n == sheet_name]
        if not match:
            raise ValueError(f"sheet {sheet_name!r} not found in {path}")
        offset = match[0]
    cells = _read_sheet_cells(stream, offset, sst, biff_ver)
    for r in sorted(cells):
        row = cells[r]
        width = max(row) + 1
        yield [row.get(i) for i in range(width)]


# ------------------------------------------------------------ BIFF write ----
def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _xl_string(s: str, short: bool = False) -> bytes:
    try:
        body, high = s.encode("latin-1"), 0
    except UnicodeEncodeError:
        body, high = s.encode("utf-16-le"), 1
    head = struct.pack("<B" if short else "<H", len(s))
    return head + bytes([high]) + body


def write_xls(path: str, rows: list[list], sheet_name: str = "Sheet1") -> None:
    """Write a single-sheet BIFF8 workbook (strings via SST + LABELSST,
    numbers as NUMBER, bools as BOOLERR, None skipped). Fixture-sized:
    asserts the SST fits one record and the container one FAT sector."""
    strings: list[str] = []
    sidx: dict[str, int] = {}
    nrefs = 0
    for row in rows:
        for v in row:
            if isinstance(v, str):
                nrefs += 1
                if v not in sidx:
                    sidx[v] = len(strings)
                    strings.append(v)

    sst_payload = struct.pack("<II", nrefs, len(strings)) + b"".join(
        _xl_string(s) for s in strings
    )
    assert len(sst_payload) <= 8224, "fixture writer: SST would need CONTINUE"
    bof = struct.pack("<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0x0600)
    bof_sheet = struct.pack("<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0x0600)
    bs_name = _xl_string(sheet_name, short=True)
    # globals length is offset-invariant: BOUNDSHEET's payload size is fixed
    # once the name is known, so compute with a placeholder then patch
    globals_len = (
        len(_rec(0x0809, bof))
        + len(_rec(0x0085, struct.pack("<IBB", 0, 0, 0) + bs_name))
        + len(_rec(0x00FC, sst_payload))
        + 4
    )
    boundsheet = _rec(0x0085, struct.pack("<IBB", globals_len, 0, 0) + bs_name)
    glob = _rec(0x0809, bof) + boundsheet + _rec(0x00FC, sst_payload) + _rec(0x000A, b"")
    assert len(glob) == globals_len

    body = bytearray(_rec(0x0809, bof_sheet))
    for r, row in enumerate(rows):
        for c, v in enumerate(row):
            if v is None:
                continue
            if isinstance(v, str):
                body += _rec(0x00FD, struct.pack("<HHHI", r, c, 0, sidx[v]))
            elif isinstance(v, bool):
                body += _rec(0x0205, struct.pack("<HHHBB", r, c, 0, int(v), 0))
            else:
                body += _rec(0x0203, struct.pack("<HHHd", r, c, 0, float(v)))
    body += _rec(0x000A, b"")
    biff = glob + bytes(body)
    # keep the stream at/above the 4096-byte ministream cutoff so it lives
    # in regular sectors (trailing zeros past the final EOF are never read)
    if len(biff) < 4096:
        biff += b"\0" * (4096 - len(biff))
    _write_cfb(path, "Workbook", biff)


def _write_cfb(path: str, stream_name: str, payload: bytes) -> None:
    ssz = 512
    padded = payload + b"\0" * ((-len(payload)) % ssz)
    nstream = len(padded) // ssz
    # layout: sector 0 = FAT, sector 1 = directory, sectors 2.. = stream
    assert 2 + nstream <= 128, "fixture CFB writer: one FAT sector only"
    fat = [_FATSECT, _ENDOFCHAIN]
    fat += [3 + i for i in range(nstream - 1)] + [_ENDOFCHAIN]
    fat += [_FREESECT] * (128 - len(fat))

    def direntry(
        name: str, etype: int, child: int, start: int, size: int
    ) -> bytes:
        nb = name.encode("utf-16-le") + b"\0\0"
        e = nb + b"\0" * (64 - len(nb))
        e += struct.pack("<H", len(nb))
        e += bytes([etype, 1])  # colour: black
        e += struct.pack("<iii", -1, -1, child)
        e += b"\0" * 36  # clsid, state bits, timestamps
        e += struct.pack("<IQ", start, size)
        return e

    dirsec = (
        direntry("Root Entry", 5, 1, _ENDOFCHAIN, 0)
        + direntry(stream_name, 2, -1, 2, len(payload))
        + b"\0" * 256
    )
    hdr = bytearray(_CFB_MAGIC)
    hdr += b"\0" * 16  # clsid
    hdr += struct.pack("<HHHHH", 0x003E, 0x0003, 0xFFFE, 0x0009, 0x0006)
    hdr += b"\0" * 6  # reserved
    hdr += struct.pack("<IIII", 0, 1, 1, 0)  # ndir(v4), nfat, dir start, txn
    hdr += struct.pack("<III", 4096, _ENDOFCHAIN, 0)  # cutoff, minifat, nminifat
    hdr += struct.pack("<II", _ENDOFCHAIN, 0)  # difat start, ndifat
    hdr += struct.pack("<I", 0)  # difat[0] = FAT at sector 0
    hdr += struct.pack("<I", _FREESECT) * 108
    assert len(hdr) == 512
    with open(path, "wb") as f:
        f.write(bytes(hdr) + struct.pack("<128I", *fat) + dirsec + padded)
