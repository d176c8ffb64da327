"""Pure-numpy baseline JPEG (ITU-T T.81) encoder + decoder.

Closes the last image-codec seam in `functions/imaging.py`: JPEG was
documented as "needs a true external codec"; this module implements the
baseline sequential DCT process with no dependencies beyond numpy —
8x8 forward/inverse DCT as orthonormal matrix products, Annex-K-style
quantization tables, zigzag, DPCM DC + run-length AC symbols, canonical
Huffman entropy coding with byte stuffing, JFIF YCbCr color.

Scope (documented subset, enforced by explicit errors):

* baseline DCT (SOF0), 8-bit samples;
* 1-component (grayscale) or 3-component 4:4:4 (no chroma
  subsampling) — the encoder only emits these, the decoder rejects
  other sampling factors rather than mis-decoding;
* no restart markers, no progressive/arithmetic modes.

The DECODER is table-driven: quantization and Huffman tables are read
from the stream's DQT/DHT segments (any valid baseline tables, not
just the ones our encoder writes), so it is a real entropy decoder,
not a mirror of the encoder's constants.

The ENCODER writes spec-valid streams using canonical fixed-length
Huffman tables declared in DHT (12 DC symbols at 4 bits, 162 AC
symbols at 8 bits — a legal choice the decoder must and does read from
DHT; the all-ones padding code stays unused, as T.81 recommends).

Determinism: float64 DCT with fixed matrix shapes, round-half-away
quantization via ``np.floor(x / q + 0.5)``'s integer contract — the
same bytes at any batch shape or parallelism.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants ------------------------------------------------------------

_QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
_QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag index sequence, generated (not transcribed):
    diagonals alternate direction, as in T.81 figure A.6."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(s + 1) if 0 <= i < 8 and 0 <= s - i < 8]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(diag)
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)


def _dct_matrix() -> np.ndarray:
    T = np.empty((8, 8), dtype=np.float64)
    for u in range(8):
        for x in range(8):
            T[u, x] = np.cos((2 * x + 1) * u * np.pi / 16.0)
    T[0, :] = 1.0 / np.sqrt(8.0)
    T[1:, :] *= 0.5
    return T


_DCT = _dct_matrix()

# encoder Huffman tables: canonical fixed-length codes declared in DHT.
# DC: 12 category symbols at 4 bits.  AC: EOB, ZRL and every (run 0-15,
# size 1-10) pair = 162 symbols at 8 bits.  Both leave the all-ones
# code unused so byte padding can never alias a real symbol.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_CODES = {sym: (i, 4) for i, sym in enumerate(_DC_SYMBOLS)}
_AC_CODES = {sym: (i, 8) for i, sym in enumerate(_AC_SYMBOLS)}


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # pad with 1s per T.81
        return bytes(self.out)


def _encode_block(
    w: _BitWriter, block: np.ndarray, qt: np.ndarray, pred: int
) -> int:
    coeffs = _DCT @ (block.astype(np.float64) - 128.0) @ _DCT.T
    q = np.floor(coeffs / qt + 0.5).astype(np.int64)
    zz = q.reshape(64)[_ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, length = _DC_CODES[size]
    w.put(code, length)
    if size:
        w.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = _AC_CODES[0xF0]  # ZRL
            w.put(c, ln)
            run -= 16
        size = _category(v)
        c, ln = _AC_CODES[(run << 4) | size]
        w.put(c, ln)
        w.put(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        c, ln = _AC_CODES[0x00]  # EOB
        w.put(c, ln)
    return dc


def _dht_segment(tc: int, th: int, symbols: list[int], length: int) -> bytes:
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tid: int, qt: np.ndarray) -> bytes:
    body = bytes([tid]) + bytes(int(x) for x in qt.reshape(64)[_ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(img: np.ndarray) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 to baseline JPEG
    (4:4:4, quality fixed by the Annex-K-style tables above)."""
    gray = img.ndim == 2
    h, wid = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    ph = (h + 7) // 8 * 8
    pw = (wid + 7) // 8 * 8
    padded = []
    for p in planes:
        q = np.empty((ph, pw), dtype=np.float64)
        q[:h, :wid] = p
        q[h:, :wid] = p[h - 1 : h, :]  # edge-replicate padding
        q[:, wid:] = q[:, wid - 1 : wid]
        padded.append(np.clip(q, 0.0, 255.0))

    out = bytearray(b"\xff\xd8")  # SOI
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    out += _dqt_segment(0, _QT_LUMA)
    if not gray:
        out += _dqt_segment(1, _QT_CHROMA)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, wid) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # 1x1 sampling
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_SYMBOLS, 4)
    out += _dht_segment(1, 0, _AC_SYMBOLS, 8)
    if not gray:
        out += _dht_segment(0, 1, _DC_SYMBOLS, 4)
        out += _dht_segment(1, 1, _AC_SYMBOLS, 8)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    w = _BitWriter()
    preds = [0] * ncomp
    qts = [_QT_LUMA] + [_QT_CHROMA] * (ncomp - 1)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci in range(ncomp):
                preds[ci] = _encode_block(
                    w, padded[ci][by : by + 8, bx : bx + 8], qts[ci], preds[ci]
                )
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder --------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1  # un-stuff
            else:
                raise ValueError("unexpected marker inside entropy stream")
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _build_huffman(counts: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical assignment per T.81 C.2."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) 8-bit JPEG, grayscale or 4:4:4 RGB.
    Tables come from the stream's own DQT/DHT segments."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    h = wid = 0
    comps: list[tuple[int, int, int]] = []  # (comp_id, sampling, qt_id)
    scan: list[tuple[int, int, int]] = []  # (comp_id, dc_id, ac_id)
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of
        # 0xFF fill bytes — skip to the last 0xFF of the run
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone length-less markers (TEM, RSTn): no segment
            # body — reading a bogus 2-byte length here would shred
            # the rest of the header
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                prec_id = body[i]
                if prec_id >> 4:
                    raise NotImplementedError("16-bit quant tables unsupported")
                vals = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qt = np.empty(64, dtype=np.int32)
                qt[_ZIGZAG] = vals
                qts[prec_id & 0x0F] = qt.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc_th = body[i]
                counts = list(body[i + 1 : i + 17])
                n = sum(counts)
                symbols = list(body[i + 17 : i + 17 + n])
                table = _build_huffman(counts, symbols)
                if tc_th >> 4 == 0:
                    dc_tables[tc_th & 0x0F] = table
                else:
                    ac_tables[tc_th & 0x0F] = table
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise NotImplementedError("only 8-bit precision")
            h, wid = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError(
                        "only 4:4:4 / grayscale (1x1 sampling) supported"
                    )
                comps.append((cid, samp, qid))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline sequential (SOF0)")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tsel = body[1 + 2 * c : 3 + 2 * c]
                scan.append((cid, tsel >> 4, tsel & 0x0F))
            pos += seglen
            break
        pos += seglen
    if not comps or not scan:
        raise ValueError("missing SOF0/SOS")

    r = _BitReader(data[pos:])
    ph = (h + 7) // 8 * 8
    pw = (wid + 7) // 8 * 8
    planes = [np.empty((ph, pw), dtype=np.float64) for _ in comps]
    preds = [0] * len(comps)
    qt_of = {cid: qts[qid] for cid, _s, qid in comps}
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, (cid, dc_id, ac_id) in enumerate(scan):
                size = _read_symbol(r, dc_tables[dc_id])
                diff = _extend(r.bits(size), size) if size else 0
                preds[ci] += diff
                zz = np.zeros(64, dtype=np.int64)
                zz[0] = preds[ci]
                i = 1
                while i < 64:
                    sym = _read_symbol(r, ac_tables[ac_id])
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        i += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    i += run
                    if i > 63:
                        raise ValueError("AC run past block end")
                    zz[i] = _extend(r.bits(size), size)
                    i += 1
                coeffs = (zz[_UNZIGZAG].reshape(8, 8) * qt_of[cid]).astype(
                    np.float64
                )
                planes[ci][by : by + 8, bx : bx + 8] = (
                    _DCT.T @ coeffs @ _DCT + 128.0
                )
    if len(planes) == 1:
        return np.clip(np.round(planes[0][:h, :wid]), 0, 255).astype(np.uint8)
    y, cb, cr = (p[:h, :wid] for p in planes)
    rch = y + 1.402 * (cr - 128.0)
    gch = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bch = y + 1.772 * (cb - 128.0)
    rgb = np.stack([rch, gch, bch], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
