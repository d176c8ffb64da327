"""Pure-numpy baseline JPEG (ITU-T T.81) encoder + decoder.

Closes the last image-codec seam in `functions/imaging.py`: JPEG was
documented as "needs a true external codec"; this module implements the
baseline sequential DCT process with no dependencies beyond numpy —
8x8 forward/inverse DCT as orthonormal matrix products, Annex-K-style
quantization tables, zigzag, DPCM DC + run-length AC symbols, canonical
Huffman entropy coding with byte stuffing, JFIF YCbCr color.

Scope (documented subset, enforced by explicit errors):

* baseline DCT (SOF0) and PROGRESSIVE DCT (SOF2, r4) — progressive
  covers the full Annex-G huffman feature set: spectral selection,
  successive approximation (DC and AC, first and refinement passes),
  EOB runs, and any legal scan script on the decode side;
* 8-bit samples, 1-component (grayscale) or 3-component color at any
  divisor chroma sampling — 4:4:4, 4:2:2, 4:2:0 (r5), 4:4:0, 4:1:1 —
  box-mean downsampling on encode, sample-replication upsampling on
  decode, MCU-interleaved entropy coding per T.81 A.2; non-divisor
  sampling factor combinations are rejected rather than mis-decoded;
* no restart markers, no arithmetic coding, no hierarchical mode.

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


# named chroma-sampling layouts -> (Hi, Vi) of the luma component;
# chroma is always 1x1 (the JFIF convention real encoders emit)
_SUBSAMPLING = {
    "444": (1, 1),
    "422": (2, 1),
    "420": (2, 2),
    "440": (1, 2),
    "411": (4, 1),
}


def _component_planes(img: np.ndarray) -> tuple[list[np.ndarray], bool]:
    """Full-resolution Y (or Y/Cb/Cr) float64 planes of an image."""
    if img.ndim == 2:
        return [img.astype(np.float64)], True
    rgb = img.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ], False


def _pad_plane(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate ``p`` up to (ph, pw)."""
    h, wid = p.shape
    q = np.empty((ph, pw), dtype=np.float64)
    q[:h, :wid] = p
    q[h:, :wid] = p[h - 1 : h, :]
    q[:, wid:] = q[:, wid - 1 : wid]
    return np.clip(q, 0.0, 255.0)


def _downsample(p: np.ndarray, cw: int, ch: int, fh: int, fv: int) -> np.ndarray:
    """Box-mean downsample a full-resolution plane to (ch, cw) with
    factors (fh, fv), edge-replicating the partial boundary windows —
    the deterministic mirror of the decoder's replication upsampling."""
    if fh == 1 and fv == 1:
        return p
    full = _pad_plane(p, ch * fv, cw * fh)
    return full.reshape(ch, fv, cw, fh).mean(axis=(1, 3))


def _subsampled_planes(
    img: np.ndarray, subsampling: str
) -> tuple[list[np.ndarray], "_Geometry", bool, int, int]:
    """Color-convert, downsample chroma, and pad every component plane
    to its MCU-aligned block grid.  Returns (padded planes, geometry,
    gray, h, wid)."""
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"subsampling must be one of {sorted(_SUBSAMPLING)}")
    planes, gray = _component_planes(img)
    h, wid = img.shape[:2]
    luma_hv = (1, 1) if gray else _SUBSAMPLING[subsampling]
    hv = [luma_hv] + [(1, 1)] * (len(planes) - 1)
    geom = _Geometry(h, wid, hv)
    padded = []
    for ci, p in enumerate(planes):
        fh = geom.hmax // geom.hv[ci][0]
        fv = geom.vmax // geom.hv[ci][1]
        small = _downsample(p, geom.cw[ci], geom.ch[ci], fh, fv)
        padded.append(_pad_plane(small, geom.bh[ci] * 8, geom.bw[ci] * 8))
    return padded, geom, gray, h, wid


def _frame_segments(
    geom: "_Geometry", gray: bool, h: int, wid: int, sof_marker: bytes
) -> bytes:
    """JFIF header + DQT + SOF + DHT segments shared by the baseline
    and progressive encoders."""
    ncomp = 1 if gray else 3
    out = bytearray(b"\xff\xd8")  # SOI
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    out += _dqt_segment(0, _QT_LUMA)
    if not gray:
        out += _dqt_segment(1, _QT_CHROMA)
    sof = bytes([8]) + struct.pack(">HH", h, wid) + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = geom.hv[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += sof_marker + struct.pack(">H", len(sof) + 2) + sof
    return bytes(out)


def encode_jpeg(img: np.ndarray, subsampling: str = "444") -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 to baseline JPEG
    (quality fixed by the Annex-K-style tables above).  ``subsampling``
    picks the chroma layout: '444' (default, no subsampling), '422',
    '420', '440' or '411'; chroma planes are box-mean downsampled and
    the luma/chroma blocks interleave per MCU (T.81 A.2.3)."""
    padded, geom, gray, h, wid = _subsampled_planes(img, subsampling)
    ncomp = 1 if gray else 3
    out = bytearray(_frame_segments(geom, gray, h, wid, b"\xff\xc0"))
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
    scan_comps = [(ci, 0, 0) for ci in range(ncomp)]
    for si, bi in _scan_order(scan_comps, geom):
        bw = geom.bw[si]
        by, bx = (bi // bw) * 8, (bi % bw) * 8
        preds[si] = _encode_block(
            w, padded[si][by : by + 8, bx : bx + 8], qts[si], preds[si]
        )
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder (T.81 Annex G) -----------------------------------

# progressive AC table: the 16 EOBn/ZRL symbols (RRRR<<4, SSSS=0) plus
# every (run, size 1-10) pair = 176 symbols, canonical 8-bit codes
_PROG_AC_SYMBOLS = [r << 4 for r in range(16)] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_PROG_AC_CODES = {sym: (i, 8) for i, sym in enumerate(_PROG_AC_SYMBOLS)}


def _zz_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(n_blocks, 64) quantized zigzag coefficients, block row-major."""
    ph, pw = plane.shape
    out = np.empty(((ph // 8) * (pw // 8), 64), dtype=np.int64)
    bi = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            coeffs = _DCT @ (plane[by : by + 8, bx : bx + 8] - 128.0) @ _DCT.T
            q = np.floor(coeffs / qt + 0.5).astype(np.int64)
            out[bi] = q.reshape(64)[_ZIGZAG]
            bi += 1
    return out


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift with sign preserved
    (truncation toward zero, T.81 G.1.2.2)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _enc_dc_first(
    w: _BitWriter,
    comps: list[np.ndarray],
    al: int,
    order: list[tuple[int, int]],
) -> None:
    preds = [0] * len(comps)
    for ci, b in order:
        dc = int(comps[ci][b][0]) >> al  # arithmetic shift per G.1.2.1
        diff = dc - preds[ci]
        preds[ci] = dc
        size = _category(diff)
        code, ln = _DC_CODES[size]
        w.put(code, ln)
        if size:
            w.put(diff if diff >= 0 else diff + (1 << size) - 1, size)


def _enc_dc_refine(
    w: _BitWriter,
    comps: list[np.ndarray],
    al: int,
    order: list[tuple[int, int]],
) -> None:
    for ci, b in order:
        w.put((int(comps[ci][b][0]) >> al) & 1, 1)


def _enc_ac_first(
    w: _BitWriter,
    blocks: np.ndarray,
    ss: int,
    se: int,
    al: int,
    block_idx: list[int],
) -> None:
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun == 0:
            return
        rbits = eobrun.bit_length() - 1
        code, ln = _PROG_AC_CODES[rbits << 4]
        w.put(code, ln)
        if rbits:
            w.put(eobrun - (1 << rbits), rbits)
        eobrun = 0

    for b in block_idx:
        t = [_pt_ac(int(v), al) for v in blocks[b][ss : se + 1]]
        nz = [i for i, v in enumerate(t) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        last_nz = nz[-1]
        run = 0
        for i in range(last_nz + 1):
            v = t[i]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = _PROG_AC_CODES[0xF0]
                w.put(code, ln)
                run -= 16
            size = _category(v)
            code, ln = _PROG_AC_CODES[(run << 4) | size]
            w.put(code, ln)
            w.put(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if last_nz < len(t) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _enc_ac_refine(
    w: _BitWriter,
    blocks: np.ndarray,
    ss: int,
    se: int,
    al: int,
    block_idx: list[int],
) -> None:
    """T.81 G.1.2.3 (the libjpeg-style formulation): newly-significant
    coefficients (|v| >> Al == 1) carry run/size-1 symbols whose runs
    count only zero-history positions; already-nonzero coefficients
    owe one correction bit each, buffered and emitted after the next
    symbol (or after the EOBn that closes a run of blocks with no new
    significance)."""
    eobrun = 0
    pend: list[int] = []  # correction bits owed by the open EOB run

    def flush() -> None:
        nonlocal eobrun
        if eobrun == 0 and not pend:
            return
        rbits = eobrun.bit_length() - 1
        code, ln = _PROG_AC_CODES[rbits << 4]
        w.put(code, ln)
        if rbits:
            w.put(eobrun - (1 << rbits), rbits)
        for bit in pend:
            w.put(bit, 1)
        pend.clear()
        eobrun = 0

    for b in block_idx:
        band = [int(v) for v in blocks[b][ss : se + 1]]
        t = [_pt_ac(v, al) for v in band]
        new_pos = [i for i, v in enumerate(t) if abs(v) == 1]
        if not new_pos:
            # no new significance: whole band joins the EOB run; every
            # already-nonzero coefficient owes its correction bit
            eobrun += 1
            pend.extend((abs(v) >> al) & 1 for v, tv in zip(band, t) if tv)
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        eob = new_pos[-1]
        run = 0
        br: list[int] = []
        for i in range(eob + 1):
            tv = t[i]
            if tv == 0:
                run += 1
                continue
            # ZRLs flush BEFORE classifying the coefficient — the
            # decoder's ZRL walk corrects already-nonzero coefficients
            # it passes, so their bits must ride with the ZRL, not be
            # buffered past it (libjpeg orders it the same way)
            while run >= 16:
                code, ln = _PROG_AC_CODES[0xF0]
                w.put(code, ln)
                run -= 16
                for bit in br:
                    w.put(bit, 1)
                br.clear()
            if abs(tv) > 1:
                br.append((abs(band[i]) >> al) & 1)
                continue
            code, ln = _PROG_AC_CODES[(run << 4) | 1]
            w.put(code, ln)
            w.put(1 if tv > 0 else 0, 1)
            for bit in br:
                w.put(bit, 1)
            br.clear()
            run = 0
        # remainder of the band (past the last new coefficient): if
        # anything is there, open an EOB run owing its correction bits
        tail = [
            (abs(band[i]) >> al) & 1
            for i in range(eob + 1, len(t))
            if t[i]
        ]
        if eob < len(t) - 1:
            eobrun = 1
            pend.extend(tail)
            if eobrun == 0x7FFF:
                flush()
    flush()


def encode_jpeg_progressive(
    img: np.ndarray, al: int = 1, subsampling: str = "444"
) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 as a PROGRESSIVE
    (SOF2) JPEG with a full spectral-selection + successive-
    approximation scan script: DC first at point transform ``al`` then
    a DC refinement to full precision; per component, AC bands 1-5 and
    6-63 first at ``al`` then refined to full precision.  Quantized
    coefficients are identical to :func:`encode_jpeg`'s at the same
    ``subsampling``, so decoding either stream reconstructs the exact
    same pixels.  DC scans interleave per MCU; AC scans are
    non-interleaved per T.81 G (they cover each component's true block
    grid only)."""
    padded, geom, gray, h, wid = _subsampled_planes(img, subsampling)
    ncomp = 1 if gray else 3
    qts = [_QT_LUMA] + [_QT_CHROMA] * (ncomp - 1)
    comps = [_zz_blocks(p, qt) for p, qt in zip(padded, qts)]
    dc_order = _scan_order([(ci, 0, 0) for ci in range(ncomp)], geom)
    ac_idx = [
        [b for _si, b in _scan_order([(ci, 0, 0)], geom)]
        for ci in range(ncomp)
    ]

    out = bytearray(_frame_segments(geom, gray, h, wid, b"\xff\xc2"))
    out += _dht_segment(0, 0, _DC_SYMBOLS, 4)
    out += _dht_segment(1, 0, _PROG_AC_SYMBOLS, 8)

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al_: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # DC table 0 / AC table 0 for all
        body += bytes([ss, se, (ah << 4) | al_])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    all_ids = list(range(1, ncomp + 1))
    # scan 1: DC first, interleaved, point transform `al`
    out += sos(all_ids, 0, 0, 0, al)
    w = _BitWriter()
    _enc_dc_first(w, comps, al, dc_order)
    out += w.flush()
    # scans 2..: AC bands first, per component
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            out += sos([ci + 1], ss, se, 0, al)
            w = _BitWriter()
            _enc_ac_first(w, comps[ci], ss, se, al, ac_idx[ci])
            out += w.flush()
    # refinements down to full precision, one bit position at a time
    for a in range(al - 1, -1, -1):
        out += sos(all_ids, 0, 0, a + 1, a)
        w = _BitWriter()
        _enc_dc_refine(w, comps, a, dc_order)
        out += w.flush()
        for ci in range(ncomp):
            for ss, se in ((1, 5), (6, 63)):
                out += sos([ci + 1], ss, se, a + 1, a)
                w = _BitWriter()
                _enc_ac_refine(w, comps[ci], ss, se, a, ac_idx[ci])
                out += w.flush()
    out += b"\xff\xd9"
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


def _scan_order(
    scan_comps: list[tuple[int, int, int]],
    geom: "_Geometry",
) -> list[tuple[int, int]]:
    """Entropy-coded block order of one scan as (scan_pos, block_idx)
    pairs into the PADDED per-component coefficient arrays.

    Interleaved scans (Ns > 1, T.81 A.2.3): MCU raster order, within
    each MCU the scan's components in order, within each component its
    Vi x Hi block sub-grid in raster order — every padded-grid block
    is coded.  Non-interleaved scans (Ns = 1, A.2.2): the component's
    TRUE block grid in raster order (MCU padding blocks are never
    coded), mapped into the padded grid's row stride."""
    if len(scan_comps) == 1:
        ci = scan_comps[0][0]
        tbw, tbh, bw = geom.tbw[ci], geom.tbh[ci], geom.bw[ci]
        return [(0, (b // tbw) * bw + (b % tbw)) for b in range(tbh * tbw)]
    order: list[tuple[int, int]] = []
    for my in range(geom.mcuy):
        for mx in range(geom.mcux):
            for si, (ci, _dc, _ac) in enumerate(scan_comps):
                hi, vi = geom.hv[ci]
                for v in range(vi):
                    for hh in range(hi):
                        order.append(
                            (si, (my * vi + v) * geom.bw[ci] + mx * hi + hh)
                        )
    return order


class _Geometry:
    """Per-component block geometry of one frame (T.81 A.1.1/A.2.4):
    ``hv`` sampling factors, ``bw``/``bh`` the MCU-padded block grid
    (interleaved scans code all of it), ``tbw``/``tbh`` the true block
    grid (non-interleaved scans code only this), ``cw``/``ch`` the
    component's sample dimensions before upsampling."""

    def __init__(self, h: int, wid: int, hv: list[tuple[int, int]]) -> None:
        self.hv = hv
        hmax = max(x for x, _ in hv)
        vmax = max(y for _, y in hv)
        for hi, vi in hv:
            if not (1 <= hi <= 4 and 1 <= vi <= 4) or hmax % hi or vmax % vi:
                raise NotImplementedError(
                    f"non-divisor sampling factors {hv} unsupported"
                )
        self.hmax, self.vmax = hmax, vmax
        self.mcux = -(-wid // (8 * hmax))
        self.mcuy = -(-h // (8 * vmax))
        self.cw = [-(-wid * hi // hmax) for hi, _ in hv]
        self.ch = [-(-h * vi // vmax) for _, vi in hv]
        self.tbw = [-(-cw // 8) for cw in self.cw]
        self.tbh = [-(-ch // 8) for ch in self.ch]
        self.bw = [self.mcux * hi for hi, _ in hv]
        self.bh = [self.mcuy * vi for _, vi in hv]


def _decode_baseline_scan(
    r: _BitReader,
    coefs: list[np.ndarray],
    scan_comps: list[tuple[int, int, int]],
    dc_tables: dict,
    ac_tables: dict,
    order: list[tuple[int, int]],
) -> None:
    """One baseline scan (Ss=0..63, no point transform): DC DPCM + AC
    run-length straight into the coefficient arrays, blocks visited in
    the scan's interleave order."""
    preds = [0] * len(scan_comps)
    for si, b in order:
        ci, dc_id, ac_id = scan_comps[si]
        size = _read_symbol(r, dc_tables[dc_id])
        diff = _extend(r.bits(size), size) if size else 0
        preds[si] += diff
        zz = coefs[ci][b]
        zz[0] = preds[si]
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


def _decode_dc_scan(
    r: _BitReader,
    coefs: list[np.ndarray],
    scan_comps: list[tuple[int, int, int]],
    dc_tables: dict,
    order: list[tuple[int, int]],
    ah: int,
    al: int,
) -> None:
    """Progressive DC scan: first pass (Ah=0) is DPCM of the
    point-transformed DC; refinement (Ah>0) is one raw bit per block
    OR-ed in at position Al (two's-complement semantics make the plain
    ``|=`` correct for negative coefficients too).  Blocks visited in
    the scan's interleave order."""
    if ah == 0:
        preds = [0] * len(scan_comps)
        for si, b in order:
            ci, dc_id, _ac = scan_comps[si]
            size = _read_symbol(r, dc_tables[dc_id])
            diff = _extend(r.bits(size), size) if size else 0
            preds[si] += diff
            coefs[ci][b][0] = preds[si] << al
    else:
        for si, b in order:
            ci = scan_comps[si][0]
            if r.bit():
                coefs[ci][b][0] = int(coefs[ci][b][0]) | (1 << al)


def _decode_ac_first_scan(
    r: _BitReader,
    blocks: np.ndarray,
    ac_table: dict,
    ss: int,
    se: int,
    al: int,
    block_idx: list[int],
) -> None:
    """Progressive AC first scan (single component, spectral band
    Ss..Se, Ah=0): run-length symbols plus EOBn end-of-band runs
    (T.81 G.1.2.2 — RRRR with SSSS=0 codes a run of 2^RRRR + extra
    all-zero bands).  ``block_idx`` is the component's true-grid block
    order mapped into the padded array (non-interleaved scans never
    code MCU padding blocks)."""
    eobrun = 0
    for b in block_idx:
        if eobrun > 0:
            eobrun -= 1
            continue
        zz = blocks[b]
        k = ss
        while k <= se:
            sym = _read_symbol(r, ac_table)
            run, size = sym >> 4, sym & 0x0F
            if size == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << run) + (r.bits(run) if run else 0) - 1
                break
            k += run
            if k > se:
                raise ValueError("AC run past band end")
            zz[k] = _extend(r.bits(size), size) << al
            k += 1


def _decode_ac_refine_scan(
    r: _BitReader,
    blocks: np.ndarray,
    ac_table: dict,
    ss: int,
    se: int,
    al: int,
    block_idx: list[int],
) -> None:
    """Progressive AC refinement scan (T.81 G.1.2.3): already-nonzero
    coefficients take one correction bit each; zero-history positions
    carry the run lengths and may become newly significant at
    magnitude 1<<Al; EOB-run blocks still consume a correction bit per
    nonzero coefficient in the band."""
    plus = 1 << al
    eobrun = 0

    def correct(zz, k):
        v = int(zz[k])
        if r.bit() and (v & plus) == 0:
            zz[k] = v + plus if v >= 0 else v - plus

    for b in block_idx:
        zz = blocks[b]
        if eobrun > 0:
            eobrun -= 1
            for k in range(ss, se + 1):
                if zz[k] != 0:
                    correct(zz, k)
            continue
        k = ss
        while k <= se:
            sym = _read_symbol(r, ac_table)
            run, size = sym >> 4, sym & 0x0F
            newval = 0
            if size == 0:
                if run < 15:
                    eobrun = (1 << run) + (r.bits(run) if run else 0) - 1
                    # remaining nonzero coefficients of THIS band take
                    # their correction bits before the EOB run starts
                    for kk in range(k, se + 1):
                        if zz[kk] != 0:
                            correct(zz, kk)
                    k = se + 1
                    break
                # ZRL: skip 16 zero-history positions
            else:
                if size != 1:
                    raise ValueError("AC refinement size must be 1")
                newval = plus if r.bit() else -plus
            # advance over `run` zero-history positions, correcting
            # the nonzero ones passed on the way
            while k <= se:
                if zz[k] != 0:
                    correct(zz, k)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) or progressive (SOF2) 8-bit JPEG,
    grayscale or color with any divisor chroma subsampling (4:4:4,
    4:2:2, 4:2:0, 4:4:0, 4:1:1).  Tables come from the stream's own
    DQT/DHT segments; progressive streams may use any legal scan
    script (spectral selection and successive approximation, DC and
    AC, first and refinement passes).  Subsampled chroma planes are
    upsampled by sample replication (JFIF nearest-neighbor)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    h = wid = 0
    progressive = False
    comps: list[tuple[int, int]] = []  # (comp_id, qt_id)
    geom: _Geometry | None = None
    coefs: list[np.ndarray] = []  # per component: (padded blocks, 64)
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            if body[0] != 8:
                raise NotImplementedError("only 8-bit precision")
            h, wid = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            hv = []
            for c in range(ncomp):
                cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, qid))
                hv.append((samp >> 4, samp & 0x0F))
            geom = _Geometry(h, wid, hv)
            coefs = [
                np.zeros((geom.bh[i] * geom.bw[i], 64), dtype=np.int64)
                for i in range(ncomp)
            ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive (SOF2) huffman DCT"
            )
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — decode this scan, then keep parsing
            if not comps or geom is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            cid_index = {cid: i for i, (cid, _q) in enumerate(comps)}
            scan_comps = []
            for c in range(ns):
                cid, tsel = body[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cid_index[cid], tsel >> 4, tsel & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            r = _BitReader(data[pos + seglen :])
            order = _scan_order(scan_comps, geom)
            if not progressive:
                _decode_baseline_scan(
                    r, coefs, scan_comps, dc_tables, ac_tables, order
                )
            elif ss == 0:
                if se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                _decode_dc_scan(
                    r, coefs, scan_comps, dc_tables, order, ah, al
                )
            else:
                if ns != 1:
                    raise ValueError("progressive AC scans are single-component")
                ci, _dc_id, ac_id = scan_comps[0]
                idx = [b for _si, b in order]
                if ah == 0:
                    _decode_ac_first_scan(
                        r, coefs[ci], ac_tables[ac_id], ss, se, al, idx
                    )
                else:
                    _decode_ac_refine_scan(
                        r, coefs[ci], ac_tables[ac_id], ss, se, al, idx
                    )
            # resume marker parsing after the entropy bytes the scan
            # consumed (the reader stops byte-aligned before the next
            # marker; trailing pad bits are part of the consumed byte)
            pos = pos + seglen + r.pos
            continue
        pos += seglen
    if not comps or not coefs or geom is None:
        raise ValueError("missing SOF/SOS")

    qt_of = [qts[qid] for _cid, qid in comps]
    planes = []
    for ci in range(len(comps)):
        bw, tbw, tbh = geom.bw[ci], geom.tbw[ci], geom.tbh[ci]
        # IDCT only the TRUE block grid; MCU padding blocks never
        # contribute samples (they exist only for interleaved coding)
        plane = np.empty((tbh * 8, tbw * 8), dtype=np.float64)
        for r_ in range(tbh):
            for c_ in range(tbw):
                coeffs = (
                    coefs[ci][r_ * bw + c_][_UNZIGZAG].reshape(8, 8)
                    * qt_of[ci]
                ).astype(np.float64)
                plane[r_ * 8 : r_ * 8 + 8, c_ * 8 : c_ * 8 + 8] = (
                    _DCT.T @ coeffs @ _DCT + 128.0
                )
        plane = plane[: geom.ch[ci], : geom.cw[ci]]
        fh = geom.hmax // geom.hv[ci][0]
        fv = geom.vmax // geom.hv[ci][1]
        if fh > 1 or fv > 1:  # sample-replication upsampling (JFIF)
            plane = np.repeat(np.repeat(plane, fv, axis=0), fh, axis=1)
        planes.append(plane[:h, :wid])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    rch = y + 1.402 * (cr - 128.0)
    gch = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bch = y + 1.772 * (cb - 128.0)
    rgb = np.stack([rch, gch, bch], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
