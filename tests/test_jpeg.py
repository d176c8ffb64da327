"""Baseline JPEG codec (functions/jpeg.py): the entropy layer must be
LOSSLESS (decode == the ideal DCT-quantize-dequantize pipeline,
bit-for-bit) and the whole codec must round-trip through the Spark
multimodal seam like every other real format."""

from __future__ import annotations

import numpy as np
import pytest

from turtle_spark.functions.imaging import (
    decode_image,
    media_resizer,
    sniff_format,
    synth_pixels,
)
from turtle_spark.functions.jpeg import (
    _DCT,
    _QT_CHROMA,
    _QT_LUMA,
    decode_jpeg,
    encode_jpeg,
)


def _ideal_pipeline(img: np.ndarray) -> np.ndarray:
    """The mathematically expected lossy result: color transform +
    per-block DCT -> quantize -> dequantize -> IDCT, with the same
    rounding rules the codec documents — everything EXCEPT the zigzag/
    Huffman/bitstream layer, which must therefore be exactly lossless."""
    rgb = img.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    h, w = img.shape[:2]
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    outs = []
    for ci, p in enumerate(planes):
        q = np.empty((ph, pw))
        q[:h, :w] = p
        q[h:, :w] = p[h - 1 : h, :]
        q[:, w:] = q[:, w - 1 : w]
        q = np.clip(q, 0.0, 255.0)
        qt = _QT_LUMA if ci == 0 else _QT_CHROMA
        rec = np.empty_like(q)
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                blk = q[by : by + 8, bx : bx + 8] - 128.0
                coeffs = _DCT @ blk @ _DCT.T
                quant = np.floor(coeffs / qt + 0.5)
                rec[by : by + 8, bx : bx + 8] = _DCT.T @ (quant * qt) @ _DCT + 128.0
        outs.append(rec[:h, :w])
    y, cb, cr = outs
    rgb = np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def test_entropy_layer_is_lossless():
    # high-frequency sawtooth content (worst case for the bitstream:
    # long symbol runs, big coefficients, byte stuffing)
    img = synth_pixels(37, 29, 10, 99, 200)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), _ideal_pipeline(img))


def test_constant_color_roundtrips_exactly():
    img = np.full((24, 40, 3), 200, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_smooth_gradient_near_lossless():
    grad = np.tile(np.arange(64, dtype=np.uint8) * 2, (64, 1))
    img = np.stack([grad, grad, grad], axis=-1)
    out = decode_jpeg(encode_jpeg(img))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_grayscale_path():
    g = synth_pixels(16, 16, 7, 7, 7)[:, :, 0]
    out = decode_jpeg(encode_jpeg(g))
    assert out.shape == (16, 16)
    # same plane through the 3-channel ideal pipeline's luma
    img3 = np.stack([g, g, g], axis=-1)
    assert np.array_equal(np.stack([out] * 3, axis=-1), _ideal_pipeline(img3))


def test_byte_stuffing_roundtrip():
    # write enough all-ones runs to force 0xFF bytes; the writer must
    # stuff 0x00 after each and the reader must un-stuff them
    from turtle_spark.functions.jpeg import _BitReader, _BitWriter

    w = _BitWriter()
    pattern = [(0xFFFF, 16), (0x0, 3), (0xFF, 8), (0x5, 3), (0x1FF, 9)]
    for code, n in pattern:
        w.put(code, n)
    data = w.flush()
    assert b"\xff\x00" in data
    r = _BitReader(data)
    for code, n in pattern:
        assert r.bits(n) == code


def test_decoder_rejects_nondivisor_sampling_and_lossless():
    img = synth_pixels(16, 16, 1, 2, 3)
    data = bytearray(encode_jpeg(img))
    i = data.index(b"\xff\xc0")
    # luma 3x1 with chroma 2x1: hmax=3 and 3 % 2 != 0 — T.81 allows
    # it but replication upsampling doesn't; must reject, not mangle
    data[i + 11] = 0x31
    data[i + 14] = 0x21
    with pytest.raises(NotImplementedError, match="sampling"):
        decode_jpeg(bytes(data))
    data = bytearray(encode_jpeg(img))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC3  # SOF3 lossless — still out of scope
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(data))


def test_sniff_and_seam_dispatch():
    img = synth_pixels(20, 12, 9, 9, 9)
    data = encode_jpeg(img)
    assert sniff_format(data) == "jpeg"
    assert np.array_equal(decode_image(data), _ideal_pipeline(img))


def test_media_resizer_keeps_jpeg_format():
    img = synth_pixels(32, 32, 4, 8, 15)
    resized = media_resizer(encode_jpeg(img), 16, 16)
    assert sniff_format(resized) == "jpeg"
    assert decode_image(resized).shape == (16, 16, 3)


def test_decode_features_real_jpeg_stats(spark):
    """The Arrow seam computes REAL pixel statistics for JPEG payloads
    via the injected media_decoder — the same path PPM/BMP/PNG use."""
    from turtle_spark.functions.imaging import image_features, media_decoder
    from turtle_spark.operators.multimodal import decode_features

    payloads = [
        (
            f"m{i}",
            str(i),
            "image/jpeg",
            bytearray(encode_jpeg(synth_pixels(24, 16, i, 2 * i, 3 * i))),
        )
        for i in range(4)
    ]
    media = spark.createDataFrame(
        payloads, "media_ref string, doc_id string, media_type string, payload binary"
    )
    out = {
        r["media_ref"]: r["features"]
        for r in decode_features(media, dim=16, decoder=media_decoder)
        .select("media_ref", "features")
        .collect()
    }
    for ref, _i, _t, payload in payloads:
        img = decode_jpeg(bytes(payload))
        expected = image_features(img, 16)
        got = np.asarray(out[ref], dtype=np.float32)
        assert np.array_equal(got, expected), ref
        # and they are REAL stats of the decoded pixels
        assert got[2] == pytest.approx(img[..., 0].astype(np.float64).mean() / 255.0, abs=1e-6)


def test_fill_bytes_and_tem_marker_are_spec_legal():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker,
    # and TEM (0xFF 0x01) is a standalone length-less marker — both are
    # legal in the header and must not derail segment parsing
    from turtle_spark.functions.imaging import synth_pixels

    img = synth_pixels(16, 16, 10, 60, 200)
    data = encode_jpeg(img)
    base = decode_jpeg(data)
    # inject a fill-byte run and a TEM marker right after SOI
    padded = data[:2] + b"\xff\xff\xff\x01" + data[2:]
    assert np.array_equal(decode_jpeg(padded), base)


def test_progressive_reconstructs_identically_to_baseline():
    # SOF2 with the full scan script (spectral selection + successive
    # approximation, DC and AC first + refinement): same quantized
    # coefficients as the baseline stream, so the decoded pixels must
    # be EXACTLY equal — any entropy-layer desync shows immediately
    from turtle_spark.functions.imaging import synth_pixels
    from turtle_spark.functions.jpeg import encode_jpeg_progressive

    for (w, h, seeds) in [(16, 16, (10, 60, 200)), (24, 17, (1, 2, 3)),
                          (33, 9, (200, 100, 50))]:
        img = synth_pixels(w, h, *seeds)
        base = decode_jpeg(encode_jpeg(img))
        for al in (0, 1, 2):
            prog = decode_jpeg(encode_jpeg_progressive(img, al=al))
            assert np.array_equal(base, prog), (w, h, al)


def test_progressive_grayscale_and_stream_structure():
    from turtle_spark.functions.imaging import synth_pixels
    from turtle_spark.functions.jpeg import encode_jpeg_progressive

    img = synth_pixels(24, 16, 5, 50, 150)
    g = img[:, :, 0]
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g)),
        decode_jpeg(encode_jpeg_progressive(g, al=2)),
    )
    data = encode_jpeg_progressive(img, al=1)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data  # SOF2, no SOF0
    assert data.count(b"\xff\xda") == 14  # DC + 6 AC first, DC + 6 AC refine


def test_progressive_noise_stress():
    # random noise maximizes nonzero AC density — the worst case for
    # the EOB-run / ZRL / correction-bit interplay
    from turtle_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(7)
    for _ in range(3):
        img = rng.randint(
            0, 256, size=(rng.randint(8, 40), rng.randint(8, 40), 3),
            dtype=np.uint8,
        )
        base = decode_jpeg(encode_jpeg(img))
        prog = decode_jpeg(encode_jpeg_progressive(img, al=int(rng.randint(0, 3))))
        assert np.array_equal(base, prog)


def _ideal_subsampled(img: np.ndarray, hmax: int, vmax: int) -> np.ndarray:
    """Independent mirror of the chroma-subsampled pipeline (shares
    only the documented spec with the codec): color transform, box-mean
    chroma downsample with edge-replicated partial windows, per-block
    DCT-quantize-dequantize-IDCT, replication upsample, color back."""
    rgb = img.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    h, w = img.shape[:2]

    def pad_to(p, ph, pw):
        q = np.empty((ph, pw))
        q[: p.shape[0], : p.shape[1]] = p
        q[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        q[:, p.shape[1] :] = q[:, p.shape[1] - 1 : p.shape[1]]
        return np.clip(q, 0.0, 255.0)

    outs = []
    for ci, p in enumerate(planes):
        if ci == 0:
            cw, ch, qt = w, h, _QT_LUMA
            small = p
        else:
            cw = -(-w // hmax)
            ch = -(-h // vmax)
            qt = _QT_CHROMA
            full = pad_to(p, ch * vmax, cw * hmax)
            small = full.reshape(ch, vmax, cw, hmax).mean(axis=(1, 3))
        pw8, ph8 = -(-cw // 8) * 8, -(-ch // 8) * 8
        q = pad_to(small, ph8, pw8)
        rec = np.empty_like(q)
        for by in range(0, ph8, 8):
            for bx in range(0, pw8, 8):
                blk = q[by : by + 8, bx : bx + 8] - 128.0
                coeffs = _DCT @ blk @ _DCT.T
                quant = np.floor(coeffs / qt + 0.5)
                rec[by : by + 8, bx : bx + 8] = _DCT.T @ (quant * qt) @ _DCT + 128.0
        rec = rec[:ch, :cw]
        if ci > 0:
            rec = np.repeat(np.repeat(rec, vmax, axis=0), hmax, axis=1)
        outs.append(rec[:h, :w])
    y, cb, cr = outs
    back = np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        axis=-1,
    )
    return np.clip(np.round(back), 0, 255).astype(np.uint8)


def test_subsampled_entropy_layer_is_lossless():
    # 4:2:0 / 4:2:2 pixel-exact against the independent spec mirror:
    # proves the MCU-interleaved entropy layer, the padded block grid
    # and the down/up-sampling all match the documented pipeline, not
    # just each other.  Odd dims exercise MCU padding in both axes.
    for sub, hmax, vmax in (("420", 2, 2), ("422", 2, 1)):
        for (w, h, seeds) in [(16, 16, (10, 60, 200)), (37, 29, (1, 2, 3)),
                              (33, 9, (200, 100, 50))]:
            img = synth_pixels(w, h, *seeds)
            got = decode_jpeg(encode_jpeg(img, subsampling=sub))
            want = _ideal_subsampled(img, hmax, vmax)
            assert np.array_equal(got, want), (sub, w, h)


def test_subsampled_sof_declares_sampling_factors():
    img = synth_pixels(24, 16, 5, 50, 150)
    data = encode_jpeg(img, subsampling="420")
    i = data.index(b"\xff\xc0")
    assert data[i + 11] == 0x22  # luma 2x2
    assert data[i + 14] == 0x11 and data[i + 17] == 0x11  # chroma 1x1
    # 4:2:0 must be smaller than 4:4:4 on real content
    assert len(data) < len(encode_jpeg(img, subsampling="444"))


def test_constant_chroma_is_subsampling_invariant():
    # grayscale content in RGB: chroma planes are constant 128, so
    # subsampling loses nothing — every layout must decode EXACTLY
    # like 4:4:4
    rng = np.random.RandomState(11)
    gray3 = np.repeat(rng.randint(0, 256, (24, 40, 1), dtype=np.uint8), 3, axis=2)
    base = decode_jpeg(encode_jpeg(gray3, subsampling="444"))
    for sub in ("420", "422", "440", "411"):
        assert np.array_equal(
            base, decode_jpeg(encode_jpeg(gray3, subsampling=sub))
        ), sub


def test_progressive_subsampled_matches_baseline():
    # progressive 4:2:0 / 4:2:2: same quantized coefficients as the
    # baseline stream at the same layout -> exact pixel equality,
    # covering interleaved DC scans + non-interleaved AC scans over
    # the true (not MCU-padded) block grid
    from turtle_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(3)
    for sub in ("420", "422", "411", "440"):
        for _ in range(2):
            img = rng.randint(
                0, 256, size=(rng.randint(8, 40), rng.randint(8, 40), 3),
                dtype=np.uint8,
            )
            base = decode_jpeg(encode_jpeg(img, subsampling=sub))
            prog = decode_jpeg(
                encode_jpeg_progressive(img, al=int(rng.randint(0, 3)), subsampling=sub)
            )
            assert np.array_equal(base, prog), sub
