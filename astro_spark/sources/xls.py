"""Dependency-free legacy .xls (BIFF8) codec — stdlib struct only.

The reference reads/writes legacy Excel through ``pandas.read_excel`` /
``to_excel`` with xlrd/xlwt (``files/types/excel.py:13-46``).  Neither is
installed here and installs are disallowed, so .xls support is
implemented directly against the two public formats involved:

- the OLE2/CFB compound-file container (MS-CFB): FAT chains, the
  directory, and the mini-stream (both read and written — streams under
  4096 bytes go to the mini-FAT per spec);
- the BIFF8 workbook stream (MS-XLS): BOF/BOUNDSHEET/SST(+CONTINUE)/
  LABELSST/LABEL/NUMBER/RK/MULRK/BOOLERR/BLANK/FORMULA/EOF.

Scope matches the xlsx codec (sources/xlsx.py): first worksheet, first
row is the header, numerics int/float, booleans bool, blanks None, no
formula evaluation (cached values are read), dates surface as serial
numbers.  SST continuation is handled on both sides, including
mid-string splits with the unicode flag restated.  Driver-side by
nature, like the reference: spreadsheets are small; big data belongs in
parquet.
"""

from __future__ import annotations

import struct

_CFB_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_MINI_CUTOFF = 4096
_SECT = 512
_MINISECT = 64

# BIFF8 record opcodes
_BOF = 0x0809
_EOF = 0x000A
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_BLANK = 0x0201
_MULBLANK = 0x00BE
_FORMULA = 0x0006
_STRING = 0x0207
_DIMENSIONS = 0x0200
_CODEPAGE = 0x0042
_WINDOW1 = 0x003D
_MAX_RECORD_DATA = 8224


# ==========================================================================
# CFB container — read
# ==========================================================================
def _read_cfb_stream(blob: bytes, stream_name: str) -> bytes:
    if blob[:8] != _CFB_SIG:
        raise ValueError("not an OLE2 compound file (bad signature)")
    sect_shift = struct.unpack_from("<H", blob, 30)[0]
    sect = 1 << sect_shift
    n_fat = struct.unpack_from("<I", blob, 44)[0]
    first_dir = struct.unpack_from("<I", blob, 48)[0]
    first_minifat = struct.unpack_from("<I", blob, 60)[0]
    n_minifat = struct.unpack_from("<I", blob, 64)[0]
    first_difat = struct.unpack_from("<I", blob, 68)[0]
    n_difat = struct.unpack_from("<I", blob, 72)[0]

    def sector(i: int) -> bytes:
        off = _SECT + i * sect
        return blob[off : off + sect]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", blob, 76))
    s = first_difat
    for _ in range(n_difat):
        data = sector(s)
        difat.extend(struct.unpack(f"<{sect // 4 - 1}I", data[:-4]))
        s = struct.unpack_from("<I", data, sect - 4)[0]
    fat: list[int] = []
    for fs in difat[:n_fat]:
        fat.extend(struct.unpack(f"<{sect // 4}I", sector(fs)))

    def chain(start: int) -> bytes:
        out, s = bytearray(), start
        while s not in (_ENDOFCHAIN, _FREESECT):
            out += sector(s)
            s = fat[s]
        return bytes(out)

    # directory entries (128 bytes each)
    dir_blob = chain(first_dir)
    entries = []
    for off in range(0, len(dir_blob), 128):
        e = dir_blob[off : off + 128]
        if len(e) < 128:
            break
        name_len = struct.unpack_from("<H", e, 64)[0]
        name = e[: max(name_len - 2, 0)].decode("utf-16-le", errors="replace")
        etype = e[66]
        start = struct.unpack_from("<I", e, 116)[0]
        size = struct.unpack_from("<I", e, 120)[0]
        entries.append((name, etype, start, size))
    root = next(e for e in entries if e[1] == 5)

    # mini-FAT + mini-stream (held in the root entry's regular chain)
    minifat: list[int] = []
    s = first_minifat
    for _ in range(n_minifat):
        minifat.extend(struct.unpack(f"<{sect // 4}I", sector(s)))
        s = fat[s]
    ministream = chain(root[2])[: root[3]]

    def mini_chain(start: int, size: int) -> bytes:
        out, s = bytearray(), start
        while s not in (_ENDOFCHAIN, _FREESECT):
            out += ministream[s * _MINISECT : (s + 1) * _MINISECT]
            s = minifat[s]
        return bytes(out[:size])

    for name, etype, start, size in entries:
        if etype == 2 and name == stream_name:
            if size < _MINI_CUTOFF:
                return mini_chain(start, size)
            return chain(start)[:size]
    raise ValueError(f"stream {stream_name!r} not found in compound file")


# ==========================================================================
# CFB container — write (one stream, mini-stream when small, per spec)
# ==========================================================================
def _dir_entry(name: str, etype: int, start: int, size: int, child: int = _FREESECT) -> bytes:
    raw = name.encode("utf-16-le")
    e = bytearray(128)
    e[0 : len(raw)] = raw
    struct.pack_into("<H", e, 64, len(raw) + 2)
    e[66] = etype
    e[67] = 1  # black node
    struct.pack_into("<I", e, 68, _FREESECT)  # left sibling
    struct.pack_into("<I", e, 72, _FREESECT)  # right sibling
    struct.pack_into("<I", e, 76, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<I", e, 120, size)
    return bytes(e)


def _pad(data: bytes, unit: int, fill: bytes = b"\x00") -> bytes:
    rem = len(data) % unit
    if rem == 0:
        return data
    return data + fill * ((unit - rem) // len(fill))


def _write_cfb(stream: bytes, stream_name: str = "Workbook") -> bytes:
    """Assemble a minimal valid CFB file holding one stream."""
    use_mini = len(stream) < _MINI_CUTOFF
    if use_mini:
        ministream = _pad(stream, _MINISECT)
        n_mini = len(ministream) // _MINISECT
        minifat_entries = [i + 1 for i in range(n_mini)]
        minifat_entries[-1] = _ENDOFCHAIN
        minifat_blob = _pad(
            b"".join(struct.pack("<I", v) for v in minifat_entries),
            _SECT,
            struct.pack("<I", _FREESECT),
        )
        n_minifat_sect = len(minifat_blob) // _SECT
        mini_blob = _pad(ministream, _SECT)
        n_mini_sect = len(mini_blob) // _SECT
        stream_sectors = 0
    else:
        blob = _pad(stream, _SECT)
        stream_sectors = len(blob) // _SECT
        minifat_blob = b""
        mini_blob = b""
        n_minifat_sect = n_mini_sect = 0

    # layout after FAT sectors: [dir][minifat][ministream|stream]
    payload_sectors = 1 + n_minifat_sect + (n_mini_sect if use_mini else stream_sectors)
    n_fat = 1
    while (payload_sectors + n_fat + 127) // 128 > n_fat:
        n_fat += 1
    total = n_fat + payload_sectors

    dir_sect = n_fat
    minifat_first = dir_sect + 1 if n_minifat_sect else _ENDOFCHAIN
    data_first = dir_sect + 1 + n_minifat_sect

    fat = [_FREESECT] * (n_fat * 128)
    for i in range(n_fat):
        fat[i] = _FATSECT
    fat[dir_sect] = _ENDOFCHAIN
    for i in range(n_minifat_sect):
        s = dir_sect + 1 + i
        fat[s] = s + 1 if i < n_minifat_sect - 1 else _ENDOFCHAIN
    n_data = n_mini_sect if use_mini else stream_sectors
    for i in range(n_data):
        s = data_first + i
        fat[s] = s + 1 if i < n_data - 1 else _ENDOFCHAIN

    if use_mini:
        root = _dir_entry("Root Entry", 5, data_first, len(_pad(stream, _MINISECT)), child=1)
        entry = _dir_entry(stream_name, 2, 0, len(stream))
    else:
        root = _dir_entry("Root Entry", 5, _ENDOFCHAIN, 0, child=1)
        entry = _dir_entry(stream_name, 2, data_first, len(stream))
    directory = _pad(root + entry, _SECT)

    header = bytearray(512)
    header[0:8] = _CFB_SIG
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 0x0003)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # sector shift 512
    struct.pack_into("<H", header, 32, 6)  # mini sector shift 64
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_sect)
    struct.pack_into("<I", header, 56, _MINI_CUTOFF)
    struct.pack_into("<I", header, 60, minifat_first)
    struct.pack_into("<I", header, 64, n_minifat_sect)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    if n_fat > 109:
        raise ValueError(".xls workbook too large for the single-DIFAT writer")
    for i in range(109):
        struct.pack_into("<I", header, 76 + 4 * i, i if i < n_fat else _FREESECT)
    fat_blob = b"".join(struct.pack("<I", v) for v in fat)
    body = fat_blob + directory + minifat_blob + (mini_blob if use_mini else _pad(stream, _SECT))
    assert len(body) == total * _SECT
    return bytes(header) + body


# ==========================================================================
# BIFF8 — record helpers
# ==========================================================================
def _rec(op: int, data: bytes) -> bytes:
    return struct.pack("<HH", op, len(data)) + data


def _encode_str(s: str) -> tuple[int, bytes, int]:
    """(grbit, bytes, cch): compressed latin-ish when possible else
    UTF-16LE.  cch is in UTF-16 CODE UNITS (astral chars count 2), per
    the BIFF8 XLUnicodeString spec."""
    if all(ord(c) < 256 for c in s):
        return 0, bytes(ord(c) for c in s), len(s)
    raw = s.encode("utf-16-le")
    return 1, raw, len(raw) // 2


def _build_sst(strings: list[str]) -> bytes:
    """SST record (+CONTINUE records) for the unique-string table.

    Records are split at ``_MAX_RECORD_DATA``; when a string itself must
    split, the CONTINUE record restates the unicode flag byte (the BIFF8
    continuation rule readers depend on).
    """
    chunks: list[bytearray] = [bytearray(struct.pack("<II", len(strings), len(strings)))]

    def room() -> int:
        return _MAX_RECORD_DATA - len(chunks[-1])

    for s in strings:
        grbit, raw, cch = _encode_str(s)
        unit = 2 if grbit else 1
        if room() < 3 + unit:  # header + at least one char must fit
            chunks.append(bytearray())
        chunks[-1] += struct.pack("<HB", cch, grbit)
        pos = 0
        while pos < len(raw):
            if room() <= 0:
                chunks.append(bytearray(struct.pack("<B", grbit)))
            take = min(room(), len(raw) - pos)
            take -= take % unit
            if take <= 0:
                chunks.append(bytearray(struct.pack("<B", grbit)))
                continue
            chunks[-1] += raw[pos : pos + take]
            pos += take
    out = _rec(_SST, bytes(chunks[0]))
    for c in chunks[1:]:
        out += _rec(_CONTINUE, bytes(c))
    return out


def _parse_sst(chunks: list[bytes]) -> list[str]:
    """Parse the unique-string table from SST+CONTINUE record payloads."""
    cst_unique = struct.unpack_from("<I", chunks[0], 4)[0]
    ci, pos = 0, 8

    def need(n: int) -> bytes:
        # header fields may straddle a CONTINUE with no flag byte; only
        # CHARACTER data restarts with a flag (handled in the char loop)
        nonlocal ci, pos
        while pos >= len(chunks[ci]):
            ci += 1
            pos = 0
        take = chunks[ci][pos : pos + n]
        pos += len(take)
        return bytes(take)

    def read_exact(n: int) -> bytes:
        out = b""
        while len(out) < n:
            out += need(n - len(out))
        return out

    strings: list[str] = []
    for _ in range(cst_unique):
        cch = struct.unpack("<H", read_exact(2))[0]
        grbit = read_exact(1)[0]
        rich = bool(grbit & 0x08)
        phonetic = bool(grbit & 0x04)
        n_runs = struct.unpack("<H", read_exact(2))[0] if rich else 0
        cb_ext = struct.unpack("<I", read_exact(4))[0] if phonetic else 0
        wide = bool(grbit & 0x01)
        # character data may split across CONTINUEs (flag byte restated);
        # buffer contiguous same-width runs so a UTF-16 surrogate pair
        # split at a chunk boundary still decodes as one character
        runs: list[list] = []  # [wide, bytearray]

        def emit(raw: bytes, w: bool) -> None:
            if runs and runs[-1][0] == w:
                runs[-1][1] += raw
            else:
                runs.append([w, bytearray(raw)])

        remaining = cch  # UTF-16 code units, not characters
        while remaining > 0:
            avail = len(chunks[ci]) - pos
            if avail <= 0:
                ci += 1
                pos = 0
                # continuation restates the flag byte for the string tail
                wide = bool(chunks[ci][pos] & 0x01)
                pos += 1
                avail = len(chunks[ci]) - pos
            unit = 2 if wide else 1
            take_units = min(remaining, avail // unit)
            if take_units == 0:
                ci += 1
                pos = 0
                wide = bool(chunks[ci][pos] & 0x01)
                pos += 1
                continue
            emit(bytes(chunks[ci][pos : pos + take_units * unit]), wide)
            pos += take_units * unit
            remaining -= take_units
        strings.append(
            "".join(
                bytes(raw).decode("utf-16-le")
                if w
                else "".join(chr(b) for b in raw)
                for w, raw in runs
            )
        )
        if n_runs:
            read_exact(4 * n_runs)
        if cb_ext:
            read_exact(cb_ext)
    return strings


def _decode_rk(rk: int) -> float | int:
    f100 = rk & 0x01
    fint = rk & 0x02
    if fint:
        v = rk >> 2
        if v & 0x20000000:  # sign-extend 30-bit
            v -= 0x40000000
        val: float | int = v
    else:
        val = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    if f100:
        val = val / 100
        if isinstance(val, float) and val.is_integer():
            val = int(val)
    return val


def _numify(v: float) -> int | float:
    return int(v) if isinstance(v, float) and v.is_integer() else v


# ==========================================================================
# public API
# ==========================================================================
def read_xls(path: str) -> tuple[list[str], list[list]]:
    """Parse the first worksheet of a BIFF8 .xls into (header, rows) —
    the same contract as xlsx.read_xlsx."""
    with open(path, "rb") as f:
        blob = f.read()
    try:
        stream = _read_cfb_stream(blob, "Workbook")
    except ValueError:
        stream = _read_cfb_stream(blob, "Book")  # BIFF5/7 name; records overlap

    # slice records
    records: list[tuple[int, bytes]] = []
    off = 0
    while off + 4 <= len(stream):
        op, ln = struct.unpack_from("<HH", stream, off)
        records.append((op, stream[off + 4 : off + 4 + ln]))
        off += 4 + ln
        if op == 0 and ln == 0:
            records.pop()
            break

    sst: list[str] = []
    cells: dict[tuple[int, int], object] = {}
    in_sheet = False  # globals substream first, then worksheet substreams
    pending_string_cell: tuple[int, int] | None = None
    i = 0
    while i < len(records):
        op, d = records[i]
        if op == _BOF:
            st = struct.unpack_from("<H", d, 2)[0] if len(d) >= 4 else 0x0010
            in_sheet = st != 0x0005  # anything but workbook-globals
        elif op == _EOF:
            if in_sheet:
                break  # first worksheet done
        elif op == _SST:
            chunks = [d]
            while i + 1 < len(records) and records[i + 1][0] == _CONTINUE:
                chunks.append(records[i + 1][1])
                i += 1
            sst = _parse_sst(chunks)
        elif op == _LABELSST and in_sheet:
            rw, col, _ixfe, isst = struct.unpack_from("<HHHI", d)
            cells[(rw, col)] = sst[isst] if isst < len(sst) else None
        elif op == _LABEL and in_sheet:
            rw, col, _ixfe, cch = struct.unpack_from("<HHHH", d)
            grbit = d[8]
            raw = d[9:]
            cells[(rw, col)] = (
                raw[: cch * 2].decode("utf-16-le")
                if grbit & 0x01
                else "".join(chr(b) for b in raw[:cch])
            )
        elif op == _NUMBER and in_sheet:
            rw, col, _ixfe, v = struct.unpack_from("<HHHd", d)
            cells[(rw, col)] = _numify(v)
        elif op == _RK and in_sheet:
            rw, col, _ixfe, rk = struct.unpack_from("<HHHI", d)
            cells[(rw, col)] = _numify(_decode_rk(rk))
        elif op == _MULRK and in_sheet:
            rw, col_first = struct.unpack_from("<HH", d)
            n = (len(d) - 6) // 6
            for j in range(n):
                rk = struct.unpack_from("<I", d, 4 + 6 * j + 2)[0]
                cells[(rw, col_first + j)] = _numify(_decode_rk(rk))
        elif op == _BOOLERR and in_sheet:
            rw, col, _ixfe, val, ferr = struct.unpack_from("<HHHBB", d)
            cells[(rw, col)] = bool(val) if ferr == 0 else None
        elif op == _FORMULA and in_sheet:
            rw, col = struct.unpack_from("<HH", d)
            result = d[6:14]
            if result[6:8] == b"\xff\xff":
                kind = result[0]
                if kind == 0:  # string result follows in a STRING record
                    pending_string_cell = (rw, col)
                elif kind == 1:
                    cells[(rw, col)] = bool(result[2])
                elif kind == 3:
                    cells[(rw, col)] = None
            else:
                cells[(rw, col)] = _numify(struct.unpack("<d", result)[0])
        elif op == _STRING and pending_string_cell is not None:
            cch = struct.unpack_from("<H", d)[0]
            grbit = d[2]
            cells[pending_string_cell] = (
                d[3 : 3 + cch * 2].decode("utf-16-le")
                if grbit & 0x01
                else "".join(chr(b) for b in d[3 : 3 + cch])
            )
            pending_string_cell = None
        i += 1

    if not cells:
        return [], []
    n_cols = max(c for _, c in cells) + 1
    n_rows = max(r for r, _ in cells) + 1
    header = [
        "" if (v := cells.get((0, c))) is None else str(v) for c in range(n_cols)
    ]
    rows = [
        [cells.get((r, c)) for c in range(n_cols)] for r in range(1, n_rows)
    ]
    return header, rows


def write_xls(header: list[str], rows: list[list], path: str) -> None:
    """Write (header, rows) as a single-sheet BIFF8 .xls inside a CFB
    container — round-trips through read_xls and xlrd-class readers."""
    # unique string table over header + string cells
    strings: list[str] = []
    index: dict[str, int] = {}

    def isst(s: str) -> int:
        if s not in index:
            index[s] = len(strings)
            strings.append(s)
        return index[s]

    cell_recs = bytearray()
    all_rows = [list(header)] + [list(r) for r in rows]
    n_cols = max((len(r) for r in all_rows), default=0)
    for rw, row in enumerate(all_rows):
        for col in range(n_cols):
            v = row[col] if col < len(row) else None
            if v is None or (isinstance(v, float) and v != v):
                cell_recs += _rec(_BLANK, struct.pack("<HHH", rw, col, 0))
            elif isinstance(v, bool):
                cell_recs += _rec(
                    _BOOLERR, struct.pack("<HHHBB", rw, col, 0, int(v), 0)
                )
            elif isinstance(v, (int, float)):
                cell_recs += _rec(_NUMBER, struct.pack("<HHHd", rw, col, 0, float(v)))
            else:
                cell_recs += _rec(
                    _LABELSST, struct.pack("<HHHI", rw, col, 0, isst(str(v)))
                )

    sheet = bytearray()
    sheet += _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0))
    sheet += _rec(
        _DIMENSIONS,
        struct.pack("<IIHHH", 0, len(all_rows), 0, n_cols, 0),
    )
    sheet += cell_recs
    sheet += _rec(_EOF, b"")

    # globals: BOUNDSHEET needs the sheet substream's absolute offset,
    # which depends on the globals' own length — assemble with a
    # placeholder, then patch.
    def globals_blob(sheet_off: int) -> bytes:
        g = bytearray()
        g += _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0))
        g += _rec(_CODEPAGE, struct.pack("<H", 1200))
        g += _rec(
            _WINDOW1, struct.pack("<HHHHHHHHH", 0x0168, 0x0111, 0x3C7C, 0x2907, 0x0038, 0, 0, 1, 0x0258)
        )
        name = "Sheet1"
        grbit, raw, cch = _encode_str(name)
        g += _rec(
            _BOUNDSHEET,
            struct.pack("<IHBB", sheet_off, 0, cch, grbit) + raw,
        )
        g += _build_sst(strings)
        g += _rec(_EOF, b"")
        return bytes(g)

    glen = len(globals_blob(0))
    stream = globals_blob(glen) + bytes(sheet)
    assert len(stream) == glen + len(sheet)
    with open(path, "wb") as f:
        f.write(_write_cfb(stream, "Workbook"))
