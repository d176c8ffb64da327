"""Pure-Python/numpy WAV (RIFF PCM16) codec + audio features — no codec deps.

Extends the multimodal decode seam (`operators/multimodal.py`) with a
REAL audio format: canonical RIFF/WAVE PCM16 mono needs no external
libraries, so synthesized audio rows can carry actual decodable WAV
payloads and `q_media_features` / `q_audio_stats` compute genuine
signal statistics (duration, RMS, peak, zero-crossing rate, per-segment
energy) through the same Arrow path a torchaudio decoder would plug
into.  FLAC — the lossless compressed format speech corpora actually
ship — decodes for real since r5 (`functions/flac.py`); lossy
compressed audio (MP3/AAC/Opus) still raises at the seam, by design —
those codecs aren't in the sandbox.

Determinism contract: every function here is pure single-threaded
numpy over integer arithmetic; `tools/golden_ref.py` reimplements the
waveform synthesis and the feature math independently (and the tests
additionally decode engine-encoded bytes with the stdlib ``wave``
module), so the encode -> decode -> feature path is differential-tested,
not self-confirmed.
"""

from __future__ import annotations

import struct

import numpy as np

SAMPLE_RATES = (8000, 16000)

# Knuth's multiplicative-hash constant: the waveform spec is a plain
# integer recurrence so the engine and the golden can reproduce it
# bit-identically with independent code.
_LCG_MULT = np.uint64(2654435761)


def synth_pcm(n_samples: int, seed_a: int, seed_b: int) -> np.ndarray:
    """Deterministic int16 mono waveform from an integer recurrence.

    sample[i] = (((i+1) * 2654435761 * (seed_a+1) + seed_b) mod 65536)
                - 32768, exact uint64 wraparound arithmetic.
    """
    i = np.arange(1, n_samples + 1, dtype=np.uint64)
    raw = (i * _LCG_MULT * np.uint64(seed_a + 1) + np.uint64(seed_b)) % np.uint64(
        65536
    )
    return (raw.astype(np.int64) - 32768).astype(np.int16)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> canonical 44-byte-header RIFF/WAVE PCM."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * 2
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
    )
    return header + pcm


def sniff_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes -> (sample_rate, int16 mono samples).

    Walks the chunk list properly (fmt / data may be preceded by other
    chunks, e.g. LIST metadata), accepts only PCM16 mono — the format
    this pipeline writes; anything else raises."""
    if not sniff_wav(data):
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_tag != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={fmt_tag} ch={channels} bits={bits}"
                )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt or data chunk")
    return int(rate), samples


def audio_features(
    samples: np.ndarray, sample_rate: int, dim: int
) -> np.ndarray:
    """Real signal statistics, fixed layout (float64 math, one float32
    cast at the end — same convention as ``imaging.image_features``):

      f[0] = duration seconds          (n / rate)
      f[1] = RMS / 32768
      f[2] = peak |amplitude| / 32768
      f[3] = zero-crossing rate        (sign changes / (n-1))
      f[4:] = per-segment RMS / 32768 over (dim-4) equal time slices
    """
    x = samples.astype(np.float64)
    n = x.size
    out = np.zeros(dim, dtype=np.float64)
    if n == 0:
        return out.astype(np.float32)
    out[0] = n / float(sample_rate)
    out[1] = float(np.sqrt(np.mean(x * x))) / 32768.0
    out[2] = float(np.max(np.abs(x))) / 32768.0
    if n > 1:
        s = np.sign(x)
        s[s == 0] = 1.0
        out[3] = float(np.count_nonzero(s[1:] != s[:-1])) / (n - 1)
    n_seg = max(dim - 4, 0)
    for k in range(n_seg):
        lo = (k * n) // n_seg
        hi = ((k + 1) * n) // n_seg
        if hi > lo:
            seg = x[lo:hi]
            out[4 + k] = float(np.sqrt(np.mean(seg * seg))) / 32768.0
    return out.astype(np.float32)
