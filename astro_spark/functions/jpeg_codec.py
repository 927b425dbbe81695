"""From-scratch baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Removes the last image-format gate in ``decode_media``: JPEG previously
raised NotImplementedError ("genuinely needs libjpeg") but the baseline
sequential DCT profile — the profile virtually every .jpg on the web
uses — is a fully public spec implementable with stdlib ``struct`` +
numpy (already a hard dependency of the Arrow workers).  Same move that
de-stubbed PNG/BMP/WAV (``media_codecs.py``) and .xls (``sources/
xls.py``).

Decoder coverage: baseline sequential DCT (SOF0), 8-bit samples,
Huffman entropy coding, 1 or 3 components, sampling factors 1-2 in each
axis (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), restart intervals (DRI/RSTn),
multi-table DQT/DHT segments, 16-bit quant tables.  Progressive (SOF2)
and arithmetic coding raise cleanly.

Encoder: baseline 4:4:4 (or single-component grayscale) with the
Annex K example quantization + Huffman tables, libjpeg-style quality
scaling, optional 4:2:0 subsampling — enough to generate real JPEG
streams so round-trips exercise every decoder path (interleaved MCUs,
chroma upsampling, restart markers).

JPEG is lossy: round-trip tests assert dimensional exactness and a
small mean reconstruction error, not byte equality.  All DCT math runs
in float64 with a fixed operation order, so decode output is
deterministic for a given payload — the property the driver's oracle
hashing relies on.

Reference parity note: the reference SDK has no media codecs at all
(an Airflow ELT toolkit); this module belongs to the beyond-reference
multimodal surface (SURVEY §2 extension), feeding ``decode_media`` /
``decode_features`` (``functions/multimodal.py``).
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — the public example tables)
# --------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

_QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# (bits[1..16], values) per Annex K
_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
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
    ],
)
_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix():
    """Orthonormal 8×8 DCT-II matrix (numpy float64)."""
    import math

    import numpy as np

    m = np.empty((8, 8))
    for k in range(8):
        c = math.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            m[k, n] = c * math.cos(math.pi * k * (2 * n + 1) / 16)
    return m


_DCT_CACHE: list = []


def _dct():
    if not _DCT_CACHE:
        _DCT_CACHE.append(_dct_matrix())
    return _DCT_CACHE[0]


def _scaled_quant(base: list[int], quality: int) -> list[int]:
    """libjpeg-style quality scaling of a base quant table."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return [max(1, min(255, (q * scale + 50) // 100)) for q in base]


# --------------------------------------------------------------------------
# Huffman code construction (shared by encoder and decoder)
# --------------------------------------------------------------------------


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per T.81 C.2 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_map(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol for bit-serial decoding."""
    return {(ln, code): sym for sym, (code, ln) in _build_codes(bits, values).items()}


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended-bits value) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _extend(bits: int, cat: int) -> int:
    """Inverse of _magnitude: decoded appended bits → signed value."""
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker reached mid-read: feed zero bits (spec allows
                    # the final MCU's padding to run into the marker)
                    self.pos -= 1
                    self.acc = 0
                    self.n = 8
                    return 0
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int | None:
        """Skip to the next marker (for RSTn); returns the marker byte."""
        self.n = 0
        d, p = self.data, self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and d[p + 1] != 0x00:
                self.pos = p + 2
                return d[p + 1]
            p += 1
        return None

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 3,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode raw interleaved pixels as a baseline JPEG.

    ``channels`` 1 (grayscale) or 3 (RGB, converted to JFIF YCbCr).
    ``subsample=True`` encodes 4:2:0 (2×2 luma blocks per MCU) so
    round-trips exercise the decoder's chroma upsampling; the default
    is 4:4:4.  ``restart_interval`` (in MCUs) inserts DRI/RSTn markers
    to exercise the decoder's restart handling.
    """
    import numpy as np

    if channels not in (1, 3):
        raise ValueError(f"unsupported channel count {channels}")
    pixels = bytes(pixels)
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer length != width*height*channels")
    arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    arr = arr.reshape(height, width, channels)

    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [arr[..., 0]]
        subsample = False

    if subsample:
        # chroma planes at half resolution via 2×2 mean (pad odd dims)
        def _half(p):
            h2, w2 = (p.shape[0] + 1) // 2 * 2, (p.shape[1] + 1) // 2 * 2
            q = np.pad(p, ((0, h2 - p.shape[0]), (0, w2 - p.shape[1])), "edge")
            return (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2] + q[1::2, 1::2]) / 4

        planes = [planes[0], _half(planes[1]), _half(planes[2])]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * len(planes)

    ql = _scaled_quant(_QUANT_LUMA, quality)
    qc = _scaled_quant(_QUANT_CHROMA, quality)
    qtabs = [ql] + ([qc] if channels == 3 else [])
    qt_of_comp = [0, 1, 1][: len(planes)]

    dc_codes = [_build_codes(*_DC_LUMA), _build_codes(*_DC_CHROMA)]
    ac_codes = [_build_codes(*_AC_LUMA), _build_codes(*_AC_CHROMA)]
    ht_of_comp = [0, 1, 1][: len(planes)]

    D = _dct()
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h

    # pad each plane to its own MCU-aligned size by edge replication
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph = mcus_y * sv * 8
        pw = mcus_x * sh * 8
        padded.append(
            np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), "edge")
        )

    w = _BitWriter()
    pred = [0] * len(planes)
    zz = ZIGZAG
    qarr = [np.array(qtabs[qt_of_comp[c]], dtype=np.float64) for c in range(len(planes))]
    mcu_count = 0
    rst = 0

    def _encode_block(block, c):
        nonlocal pred
        coef = D @ (block - 128.0) @ D.T
        q = np.rint(coef.reshape(64)[zz] / qarr[c]).astype(np.int64)
        dc_diff = int(q[0]) - pred[c]
        pred[c] = int(q[0])
        cat, bits = _magnitude(dc_diff)
        code, ln = dc_codes[ht_of_comp[c]][cat]
        w.put(code, ln)
        if cat:
            w.put(bits, cat)
        run = 0
        actab = ac_codes[ht_of_comp[c]]
        for k in range(1, 64):
            v = int(q[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                zc, zl = actab[0xF0]  # ZRL
                w.put(zc, zl)
                run -= 16
            cat, bits = _magnitude(v)
            code, ln = actab[(run << 4) | cat]
            w.put(code, ln)
            w.put(bits, cat)
            run = 0
        if run:
            ec, el = actab[0x00]  # EOB
            w.put(ec, el)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                w.flush()
                w.out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                pred = [0] * len(planes)
            for c, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        _encode_block(padded[c][y0 : y0 + 8, x0 : x0 + 8], c)
            mcu_count += 1
    w.flush()

    # ---- container ----
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )  # APP0: aspect-ratio density 1:1, no thumbnail
    for tid, qt in enumerate(qtabs):
        body = bytes([tid]) + bytes(qt[zz[i]] for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    # SOF0
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for c in range(ncomp):
        sof += bytes((c + 1, (samp[c][0] << 4) | samp[c][1], qt_of_comp[c]))
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    hts = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if ncomp == 3:
        hts += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tid, (bits, vals) in hts:
        body = bytes([tid]) + bytes(bits[1:]) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes((c + 1, (ht_of_comp[c] << 4) | ht_of_comp[c]))
    sos += bytes((0, 63, 0))
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> dict:
    """Decode a baseline JPEG to interleaved 8-bit pixels.

    Returns the same shape as ``media_codecs.decode_png``:
    ``{"kind": "image", "width", "height", "channels", "pixels"}`` —
    grayscale stays 1-channel, color decodes to RGB.
    """
    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    width = height = None
    restart_interval = 0
    scan_comps: list[dict] = []

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        pos += 2 + seg_len

        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                prec = body[i] >> 4
                tid = body[i] & 0x0F
                i += 1
                if prec:
                    vals = list(struct.unpack(f">{64}H", body[i : i + 128]))
                    i += 128
                else:
                    vals = list(body[i : i + 64])
                    i += 64
                qtabs[tid] = vals
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            _prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            comps = []
            for c in range(ncomp):
                cid, sampf, qid = body[6 + c * 3 : 9 + c * 3]
                comps.append(
                    {"id": cid, "h": sampf >> 4, "v": sampf & 0x0F, "q": qid}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}) not supported"
            )
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(body):
                tclass = body[i] >> 4
                tid = body[i] & 0x0F
                bits = [0] + list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(tclass, tid)] = _build_decode_map(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tables = body[1 + c * 2 : 3 + c * 2]
                comp = next(x for x in comps if x["id"] == cid)
                comp["dc"] = tables >> 4
                comp["ac"] = tables & 0x0F
                scan_comps.append(comp)
            break
        # APPn/COM/etc: skipped

    if width is None or not scan_comps:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    D = _dct()
    import numpy as np  # noqa: F811 (worker-local import pattern)

    planes = []
    for c in scan_comps:
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        )
        c["qarr"] = np.array(qtabs[c["q"]], dtype=np.float64)

    r = _BitReader(data, pos)
    pred = [0] * len(scan_comps)
    inv_zz = np.argsort(np.array(ZIGZAG))
    mcu_count = 0

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = r.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected JPEG restart marker")
                pred = [0] * len(scan_comps)
            for ci, c in enumerate(scan_comps):
                dct_t = huff[(0, c["dc"])]
                act_t = huff[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zq = np.zeros(64, dtype=np.float64)
                        cat = r.decode_symbol(dct_t)
                        diff = _extend(r.bits(cat), cat) if cat else 0
                        pred[ci] += diff
                        zq[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = r.decode_symbol(act_t)
                            if sym == 0x00:  # EOB
                                break
                            run, cat = sym >> 4, sym & 0x0F
                            if cat == 0 and run == 15:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zq[k] = _extend(r.bits(cat), cat)
                            k += 1
                        coef = (zq * c["qarr"])[inv_zz].reshape(8, 8)
                        block = D.T @ coef @ D + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(scan_comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:height, :width])

    if len(full) == 1:
        out = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return {
            "kind": "image",
            "width": width,
            "height": height,
            "channels": 1,
            "pixels": out.tobytes(),
        }
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "channels": 3,
        "pixels": out.tobytes(),
    }
