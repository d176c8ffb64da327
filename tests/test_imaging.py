"""Pure-Python image codec + real-decode-path tests.

The multimodal decode seam is real for PPM/BMP: these tests pin the
codecs (round-trips, spec edge cases), the feature math, and the full
Spark path — synthetic media table carries real payloads whose decoded
pixels match the generator's pattern exactly.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from turtle_spark.functions import imaging
from turtle_spark.sources.corpus import generate_docs


def _pattern(w=13, h=7, s=(3, 101, 200)):
    return imaging.synth_pixels(w, h, *s)


# --- codecs (no Spark) ------------------------------------------------------


def test_ppm_round_trip():
    img = _pattern()
    assert np.array_equal(imaging.decode_ppm(imaging.encode_ppm(img)), img)


def test_ppm_header_comments_and_whitespace():
    img = _pattern(w=3, h=2)
    raster = img.tobytes()
    data = b"P6\n# a comment\n 3\t2 # trailing\n255\n" + raster
    assert np.array_equal(imaging.decode_ppm(data), img)


def test_bmp_round_trip_padded_and_aligned():
    # w=13 -> 39-byte rows, padded to 40; w=4 -> 12-byte rows, no pad
    for w in (13, 4):
        img = _pattern(w=w, h=5)
        assert np.array_equal(imaging.decode_bmp(imaging.encode_bmp(img)), img)


def test_bmp_top_down_rows():
    import struct

    img = _pattern(w=4, h=3)
    data = bytearray(imaging.encode_bmp(img))
    # flip to top-down: negative height + re-ordered raster
    offset = struct.unpack_from("<I", data, 10)[0]
    struct.pack_into("<i", data, 22, -3)
    rows = np.frombuffer(bytes(data[offset:]), dtype=np.uint8).reshape(3, -1)
    data[offset:] = rows[::-1].tobytes()
    assert np.array_equal(imaging.decode_bmp(bytes(data)), img)


def test_decode_rejects_unknown_magic():
    with pytest.raises(NotImplementedError):
        imaging.decode_image(b"payload:whatever")
    with pytest.raises(ValueError):
        imaging.decode_ppm(b"BM....")
    with pytest.raises(ValueError):
        imaging.decode_bmp(b"P6....")


def test_image_features_hand_computed():
    # uniform 2x1 image: means exact, stds 0, all luminance in one bin
    img = np.full((1, 2, 3), 128, dtype=np.uint8)
    vec = imaging.image_features(img, 16)
    assert vec.dtype == np.float32
    assert vec[0] == np.float32(2 / 1024)  # w
    assert vec[1] == np.float32(1 / 1024)  # h
    assert np.allclose(vec[2:5], 128 / 255)
    assert np.all(vec[5:8] == 0.0)
    hist = vec[8:16]
    assert hist[128 >> 5] == 1.0 and hist.sum() == 1.0
    with pytest.raises(ValueError):
        imaging.image_features(img, 8)


def test_resize_nearest_exact_duplication():
    img = _pattern(w=2, h=2)
    up = imaging.resize_nearest(img, 4, 4)
    # each source pixel becomes a 2x2 block
    for r in range(4):
        for c in range(4):
            assert np.array_equal(up[r, c], img[r // 2, c // 2])
    down = imaging.resize_nearest(up, 2, 2)
    assert np.array_equal(down, img)


def test_media_resizer_reencodes_same_format():
    img = _pattern(w=10, h=6)
    for enc, magic in ((imaging.encode_ppm, b"P6"), (imaging.encode_bmp, b"BM")):
        out = imaging.media_resizer(enc(img), 5, 3)
        assert out[:2] == magic
        assert imaging.decode_image(out).shape == (3, 5, 3)
    # non-image payloads pass through untouched
    assert imaging.media_resizer(b"payload:x", 5, 3) == b"payload:x"


def test_media_decoder_dispatch():
    img = _pattern(w=9, h=4)
    real = imaging.media_decoder(imaging.encode_ppm(img), "image", 16)
    assert np.array_equal(real, imaging.image_features(img, 16))
    from turtle_spark.operators.multimodal import _stub_features

    stub = imaging.media_decoder(b"payload:a", "audio", 16)
    assert np.array_equal(stub, _stub_features(b"payload:a", 16))


# --- Spark path --------------------------------------------------------------


def test_synthesized_payloads_decode_to_generator_pattern(spark):
    """End-to-end: real payload bytes written by the Arrow synthesis UDF
    decode back to exactly the deterministic pattern, dims match meta,
    and both formats appear."""
    from turtle_spark.operators.multimodal import synthesize_media_table

    media = synthesize_media_table(generate_docs(spark, 60, seed=21))
    rows = media.where(F.col("media_type") == "image").collect()
    assert rows, "seed produced no image rows"
    formats = set()
    for r in rows:
        payload = bytes(r.payload)
        fmt = imaging.sniff_format(payload)
        formats.add(fmt)
        assert fmt == r.meta.codec
        img = imaging.decode_image(payload)
        assert img.shape == (r.meta.height, r.meta.width, 3)
    assert formats == {"ppm", "bmp"}


def test_real_resize_through_spark_seam(spark):
    """resize_media with the real resizer: every image payload is
    actually resampled — decoded dims equal the JVM-computed target
    meta dims, and pixels equal nearest-neighbor of the original."""
    from turtle_spark.operators.multimodal import resize_media, synthesize_media_table

    media = synthesize_media_table(generate_docs(spark, 40, seed=21))
    orig = {
        r.media_ref: bytes(r.payload)
        for r in media.where(F.col("media_type") == "image").collect()
    }
    resized = resize_media(
        media, max_width=16, max_height=16, resizer=imaging.media_resizer
    )
    checked = 0
    for r in resized.where(F.col("media_type") == "image").collect():
        out = imaging.decode_image(bytes(r.payload))
        assert out.shape == (r.meta.height, r.meta.width, 3)
        src = imaging.decode_image(orig[r.media_ref])
        assert np.array_equal(
            out, imaging.resize_nearest(src, r.meta.width, r.meta.height)
        )
        checked += 1
    assert checked > 0


def test_real_decode_features_partitioning_independent(spark):
    from turtle_spark.functions.imaging import media_decoder
    from turtle_spark.operators.multimodal import decode_features, synthesize_media_table

    media = synthesize_media_table(generate_docs(spark, 40, seed=21))
    a = {
        r.media_ref: r.features
        for r in decode_features(
            media, dim=16, stub=False, decoder=media_decoder
        ).collect()
    }
    b = {
        r.media_ref: r.features
        for r in decode_features(
            media.repartition(9), dim=16, stub=False, decoder=media_decoder
        ).collect()
    }
    assert a == b


class TestPng:
    def test_roundtrip_and_cross_codec(self):
        from turtle_spark.functions.imaging import (
            decode_bmp, decode_png, decode_ppm,
            encode_bmp, encode_png, encode_ppm, synth_pixels,
        )

        img = synth_pixels(37, 21, 5, 11, 19)
        # same pixels through three independent codecs -> same array
        a = decode_ppm(encode_ppm(img))
        b = decode_bmp(encode_bmp(img))
        c = decode_png(encode_png(img))
        assert (a == img).all() and (b == img).all() and (c == img).all()

    def test_all_filter_types_decode(self):
        import struct as _struct
        import zlib

        import numpy as np

        from turtle_spark.functions.imaging import decode_png, synth_pixels

        img = synth_pixels(9, 7, 1, 2, 3)
        h, w, _ = img.shape
        stride = 3 * w

        # independent reference FILTERER (test-side): apply each filter
        # type per the PNG spec, then expect decode_png to invert it
        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

        raw = bytearray()
        recon = img.reshape(h, stride).astype(int)
        for y in range(h):
            ftype = y % 5
            raw.append(ftype)
            for x in range(stride):
                cur = recon[y][x]
                left = recon[y][x - 3] if x >= 3 else 0
                up = recon[y - 1][x] if y else 0
                ul = recon[y - 1][x - 3] if y and x >= 3 else 0
                if ftype == 0:
                    v = cur
                elif ftype == 1:
                    v = cur - left
                elif ftype == 2:
                    v = cur - up
                elif ftype == 3:
                    v = cur - (left + up) // 2
                else:
                    v = cur - paeth(left, up, ul)
                raw.append(v & 0xFF)

        def chunk(tag, body):
            return (
                _struct.pack(">I", len(body)) + tag + body
                + _struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        assert (decode_png(png) == img).all()

    def test_crc_and_unsupported_rejected(self):
        import pytest

        from turtle_spark.functions.imaging import (
            decode_png, encode_png, synth_pixels,
        )

        png = bytearray(encode_png(synth_pixels(5, 5, 1, 1, 1)))
        png[40] ^= 0xFF  # corrupt a data byte inside IHDR/IDAT region
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(png))
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"nope")

    def test_seam_dispatch_and_resize(self):
        from turtle_spark.functions.imaging import (
            decode_png, encode_png, media_resizer, sniff_format, synth_pixels,
        )

        payload = encode_png(synth_pixels(16, 12, 2, 4, 8))
        assert sniff_format(payload) == "png"
        resized = media_resizer(payload, 8, 6)
        out = decode_png(resized)
        assert out.shape == (6, 8, 3)


class TestPvid:
    def test_roundtrip(self):
        from turtle_spark.functions.imaging import (
            decode_pvid, encode_pvid, synth_pixels,
        )

        frames = [synth_pixels(5, 4, s, 7, 9) for s in (1, 18, 35)]
        out, fms = decode_pvid(encode_pvid(frames, 250))
        assert fms == 250 and len(out) == 3
        assert all((a == b).all() for a, b in zip(frames, out))

    def test_rejects_garbage(self):
        import pytest
        from turtle_spark.functions.imaging import decode_pvid, encode_pvid

        with pytest.raises(ValueError, match="PVID"):
            decode_pvid(b"nope")
        with pytest.raises(ValueError):
            encode_pvid([], 100)

    def test_resizer_resizes_every_frame(self):
        from turtle_spark.functions.imaging import (
            decode_pvid, encode_pvid, media_resizer, synth_pixels,
        )

        payload = encode_pvid([synth_pixels(16, 12, s, 3, 5) for s in (0, 17)], 500)
        frames, fms = decode_pvid(media_resizer(payload, 8, 6))
        assert fms == 500
        assert [f.shape for f in frames] == [(6, 8, 3), (6, 8, 3)]

    def test_decoder_uses_frame_stack(self):
        import numpy as np
        from turtle_spark.functions.imaging import (
            encode_pvid, image_features, media_decoder, synth_pixels,
        )

        frames = [synth_pixels(6, 5, s, 11, 13) for s in (2, 19, 36)]
        got = media_decoder(encode_pvid(frames, 250), "video", 16)
        expect = image_features(np.concatenate(frames, axis=0), 16)
        assert (got == expect).all()


def test_decode_image_handles_progressive_jpeg():
    # the media seam dispatches on the shared FFD8 magic: a SOF2
    # stream must reconstruct the exact same pixels as the SOF0 one
    from turtle_spark.functions.imaging import decode_image, synth_pixels
    from turtle_spark.functions.jpeg import encode_jpeg, encode_jpeg_progressive

    img = synth_pixels(24, 16, 40, 90, 140)
    assert np.array_equal(
        decode_image(encode_jpeg_progressive(img, al=1)),
        decode_image(encode_jpeg(img)),
    )
