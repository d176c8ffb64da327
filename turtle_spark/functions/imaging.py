"""Pure-Python/numpy image codecs + pixel features — no codec deps.

The multimodal seam (`operators/multimodal.py`) was a documented
``NotImplementedError`` until one real format could be decoded inside
this sandbox.  PPM (P6 binary portable pixmap) and uncompressed 24-bit
BMP need no external libraries, so they make the Arrow decode path
REAL end-to-end: synthesize payload bytes -> sniff magic -> decode to
an (h, w, 3) uint8 array -> compute actual pixel statistics -> resize
by nearest-neighbor -> re-encode.  PNG (RGB8, stdlib zlib) decodes
too, baseline JPEG has a real pure-numpy DCT/Huffman codec in
`functions/jpeg.py`, and video ships in the PVID frame container
below, so every synthetic media type round-trips through real
byte-level codecs; formats needing true external codecs (H.264, MP3)
still raise at the seam, by design — progressive JPEG decodes for
real since r4 and chroma-subsampled JPEG (4:2:0/4:2:2/4:4:0/4:1:1)
since r5 (`functions/jpeg.py`).

Determinism contract: every function here is pure and single-threaded
numpy; `tools/golden_ref.py` reimplements the decode + feature math
independently, so `q_media_features` is differential-tested, not
self-confirmed.
"""

from __future__ import annotations

import struct

import numpy as np

# --- PPM (P6, maxval 255) -------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 bytes."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_ppm expects (h, w, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary P6 bytes -> (h, w, 3) uint8.  Handles whitespace and
    ``#`` comments in the header per the netpbm spec."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 ASCII ints (w, h, maxval), '#' comments allowed
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    n = w * h * 3
    raster = data[pos : pos + n]
    if len(raster) != n:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


# --- BMP (BITMAPINFOHEADER, 24-bit, uncompressed) --------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP (bottom-up rows,
    BGR byte order, rows padded to 4 bytes — the classic layout)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3)")
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    pixel_size = stride * h
    # rows bottom-up, channels BGR
    bgr = np.ascontiguousarray(img[::-1, :, ::-1], dtype=np.uint8)
    if pad:
        padded = np.zeros((h, stride), dtype=np.uint8)
        padded[:, :row_bytes] = bgr.reshape(h, row_bytes)
        raster = padded.tobytes()
    else:
        raster = bgr.tobytes()
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + pixel_size, 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_size, 2835, 2835, 0, 0
    )
    return header + info + raster


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (h, w, 3) uint8 RGB.  Supports the
    layout ``encode_bmp`` writes plus top-down rows (negative height)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raster = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raster.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])


# --- deterministic synthetic images ----------------------------------------


def synth_pixels(w: int, h: int, s0: int, s1: int, s2: int) -> np.ndarray:
    """Deterministic (h, w, 3) test pattern: channel c at (row, col) =
    (seed_c + 31*row + 7*col) mod 256.  Pure integer math — any engine
    reproduces it bit-for-bit."""
    r = np.arange(h, dtype=np.int64)[:, None]
    x = np.arange(w, dtype=np.int64)[None, :]
    base = 31 * r + 7 * x
    img = np.empty((h, w, 3), dtype=np.uint8)
    for c, s in enumerate((s0, s1, s2)):
        img[:, :, c] = ((base + int(s)) % 256).astype(np.uint8)
    return img


# --- real pixel features ----------------------------------------------------

FEATURE_MIN_DIM = 16


def image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Actual pixel statistics as a fixed-width float32 vector:

    ``[w/1024, h/1024,
       mean(R)/255, mean(G)/255, mean(B)/255,
       std(R)/255,  std(G)/255,  std(B)/255,
       8-bin luminance histogram fractions]``

    zero-padded to ``dim`` (>= 16).  All math float64, cast once at
    the end — deterministic for a given image on any partitioning.
    """
    if dim < FEATURE_MIN_DIM:
        raise ValueError(f"image features need dim >= {FEATURE_MIN_DIM}")
    h, w, _ = img.shape
    flat = img.reshape(-1, 3).astype(np.float64)
    means = flat.mean(axis=0) / 255.0
    stds = flat.std(axis=0) / 255.0
    lum = (img.reshape(-1, 3).astype(np.uint32).sum(axis=1) // 3).astype(np.uint8)
    hist = np.bincount(lum >> 5, minlength=8).astype(np.float64) / lum.size
    vec = np.zeros(dim, dtype=np.float64)
    vec[0] = w / 1024.0
    vec[1] = h / 1024.0
    vec[2:5] = means
    vec[5:8] = stds
    vec[8:16] = hist
    return vec.astype(np.float32)


# --- seam implementations ---------------------------------------------------


def sniff_format(payload: bytes) -> str | None:
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    return None


def decode_image(payload: bytes) -> np.ndarray:
    fmt = sniff_format(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "jpeg":
        from turtle_spark.functions.jpeg import decode_jpeg

        img = decode_jpeg(payload)
        # grayscale JPEGs widen to (h, w, 3) so every caller sees the
        # same channel shape
        return np.stack([img] * 3, axis=-1) if img.ndim == 2 else img
    raise NotImplementedError(
        "only PPM/BMP/PNG(RGB8)/baseline-JPEG decode in this environment "
        "(no image codec libraries); payload magic = " + repr(payload[:2])
    )


def media_decoder(payload: bytes, media_type: str, dim: int) -> np.ndarray:
    """REAL decoder for `operators.multimodal.decode_features`: PPM/BMP
    /PNG payloads decode to pixels and yield actual pixel statistics;
    RIFF/WAVE PCM16 payloads decode to samples and yield actual signal
    statistics; PVID video payloads decode to their frame stack and
    yield the stack's pixel statistics.  Unknown formats fall back to
    the deterministic content-derived stub vector (the remaining seam
    for codecs this sandbox lacks)."""
    if sniff_pvid(payload or b""):
        frames, _frame_ms = decode_pvid(payload)
        return image_features(np.concatenate(frames, axis=0), dim)
    if sniff_format(payload or b"") is not None:
        return image_features(decode_image(payload), dim)
    from turtle_spark.functions.audio import audio_features, decode_wav, sniff_wav

    if sniff_wav(payload or b""):
        rate, samples = decode_wav(payload)
        return audio_features(samples, rate, dim)
    from turtle_spark.functions.flac import decode_flac, sniff_flac

    if sniff_flac(payload or b""):
        rate, samples = decode_flac(payload)
        return audio_features(samples, rate, dim)
    from turtle_spark.operators.multimodal import _stub_features

    return _stub_features(payload, dim)


def resize_nearest(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample — pure index arithmetic, no codecs."""
    h, w, _ = img.shape
    rows = (np.arange(new_h, dtype=np.int64) * h) // new_h
    cols = (np.arange(new_w, dtype=np.int64) * w) // new_w
    return img[rows][:, cols]


def media_resizer(payload: bytes, new_w: int, new_h: int) -> bytes:
    """REAL resizer for `operators.multimodal.resize_media`: decodes
    PPM/BMP/PNG/JPEG, nearest-neighbor resizes, re-encodes in the same
    format; PVID videos resize frame-by-frame; other payloads pass
    through unchanged."""
    if sniff_pvid(payload or b""):
        frames, frame_ms = decode_pvid(payload)
        return encode_pvid(
            [resize_nearest(f, new_w, new_h) for f in frames], frame_ms
        )
    fmt = sniff_format(payload or b"")
    if fmt is None:
        return payload
    img = resize_nearest(decode_image(payload), new_w, new_h)
    if fmt == "jpeg":
        from turtle_spark.functions.jpeg import encode_jpeg

        return encode_jpeg(img)
    return {"ppm": encode_ppm, "bmp": encode_bmp, "png": encode_png}[fmt](img)


# --- PNG (8-bit truecolor RGB, non-interlaced) ------------------------------
#
# Pure stdlib (zlib + struct): DEFLATE is the only compression PNG
# uses, so a real PNG codec needs no external image library.  Scope:
# the truecolor subset every synthetic/raster pipeline actually emits
# — bit depth 8, color type 2 (RGB), no interlace — with ALL FIVE
# scanline filters implemented on decode (encoders in the wild use
# them all) and CRC verification per chunk.  Paletted/alpha/16-bit
# stay at the NotImplementedError seam.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (filter 0 scanlines, one IDAT)."""
    import zlib

    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_png expects (h, w, 3)")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = np.ascontiguousarray(img, dtype=np.uint8)
    raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8.  Verifies chunk CRCs, handles all
    five scanline filters; rejects non-RGB8/interlaced files at the
    documented seam."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, w = 8, None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit truecolor non-interlaced PNG decodes here "
                    f"(depth={depth} colortype={ctype} interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG without IHDR")
    raw = zlib.decompress(idat)
    stride = 3 * w
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong length")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(3, stride):
                cur[x] = (cur[x] + cur[x - 3]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - 3] if x >= 3 else 0
                cur[x] = (cur[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = cur[x - 3] if x >= 3 else 0
                ul = prev[x - 3] if x >= 3 else 0
                cur[x] = (cur[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, 3)


# --- perceptual hash (sampled-grid aHash) -----------------------------------
#
# 64-bit resolution-invariant content hash for image dedup.  The grid
# SAMPLES pixels (nearest-neighbor at rows (i*h)//8, cols (j*w)//8)
# instead of block-averaging: nested floor division gives
# ((i*k*h)//8 * h)//(k*h) == (i*h)//8 for any integer scale k, so the
# hash is EXACTLY invariant under integer-factor nearest-neighbor
# rescales and under lossless cross-codec re-encodes (PPM/BMP/PNG) —
# the two transforms a crawl pipeline actually meets at volume.
# Brightness shifts move every sample and the mean together, flipping
# only samples pinned at the clip boundary, so jittered variants land
# within a small Hamming radius.  All arithmetic is exact-integer up
# to one IEEE division by 64 — bit-identical on any partitioning and
# in the Spark-free golden reimplementation.


def luminance_int(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w) int64 ITU-R 601 luma via exact
    integer arithmetic: (299*R + 587*G + 114*B) // 1000."""
    f = img.astype(np.int64)
    return (299 * f[:, :, 0] + 587 * f[:, :, 1] + 114 * f[:, :, 2]) // 1000


def grid_phash(img: np.ndarray) -> int:
    """64-bit sampled-grid perceptual hash (unsigned int).

    Bit (8*i + j), MSB first, is 1 iff the luma sample at grid cell
    (i, j) exceeds the mean of the 64 samples.  Mean = exact integer
    sum / 64.0 (one IEEE division; deterministic everywhere).
    """
    g = luminance_int(img)
    h, w = g.shape
    rows = (np.arange(8, dtype=np.int64) * h) // 8
    cols = (np.arange(8, dtype=np.int64) * w) // 8
    s = g[rows][:, cols]
    mean = int(s.sum()) / 64.0
    bits = (s > mean).ravel()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def perturb_image(img: np.ndarray, brightness: int = 16) -> np.ndarray:
    """Deterministic near-duplicate variant: clip-add ``brightness``
    to every channel, then 2x nearest-neighbor upscale — the
    re-encode/rescale perturbation the phash is designed to absorb."""
    h, w, _ = img.shape
    lifted = np.minimum(img.astype(np.int64) + brightness, 255).astype(np.uint8)
    return resize_nearest(lifted, w * 2, h * 2)


# --- PVID (multi-frame video container of PPM frames) ----------------------
#
# Real video codecs (H.264/VP9/AV1) need external libraries this
# sandbox lacks, but "a video" for pipeline purposes is just a timed
# frame sequence — so the synthetic corpus ships its videos in a
# trivial self-describing container: ``PVID`` magic, little-endian
# uint32 frame count + frame interval (ms), then that many binary P6
# PPM frames back-to-back.  Every byte is decodable with the codecs
# above, which makes frame sampling, per-frame pixel statistics, and
# per-frame resize REAL end-to-end (the former video stub seam).

_PVID_MAGIC = b"PVID"


def sniff_pvid(payload: bytes) -> bool:
    return payload[:4] == _PVID_MAGIC


def encode_pvid(frames: list[np.ndarray], frame_ms: int) -> bytes:
    """Timed frame sequence -> PVID container bytes."""
    if not frames:
        raise ValueError("encode_pvid needs at least one frame")
    body = b"".join(encode_ppm(f) for f in frames)
    return _PVID_MAGIC + struct.pack("<II", len(frames), int(frame_ms)) + body


def decode_pvid(data: bytes) -> tuple[list[np.ndarray], int]:
    """PVID container bytes -> (frames, frame interval ms)."""
    if not sniff_pvid(data):
        raise ValueError("not a PVID payload")
    n_frames, frame_ms = struct.unpack_from("<II", data, 4)
    frames: list[np.ndarray] = []
    off = 12
    for _ in range(n_frames):
        if data[off : off + 2] != b"P6":
            raise ValueError("corrupt PVID: frame is not P6 PPM")
        # canonical encoder header: P6\n{w} {h}\n255\n
        nl1 = data.index(b"\n", off)
        nl2 = data.index(b"\n", nl1 + 1)
        nl3 = data.index(b"\n", nl2 + 1)
        w, h = (int(v) for v in data[nl1 + 1 : nl2].split())
        end = nl3 + 1 + 3 * w * h
        frames.append(decode_ppm(data[off:end]))
        off = end
    return frames, int(frame_ms)
