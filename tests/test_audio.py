"""WAV codec + real audio-decode-path tests.

The multimodal decode seam is real for RIFF/WAVE PCM16: these tests pin
the codec (round-trips, chunk walking, format rejection), the feature
math, a DIFFERENTIAL decode through the stdlib ``wave`` module (an
independent RIFF reader), and the full Spark path — the synthetic media
table carries real WAV payloads whose decoded samples match the
waveform spec exactly and whose ``duration_ms`` metadata is honest.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest
from pyspark.sql import functions as F

from turtle_spark.functions import audio
from turtle_spark.sources.corpus import generate_docs


# --- codec (no Spark) -------------------------------------------------------


def test_wav_round_trip():
    samples = audio.synth_pcm(1000, 17, 93)
    rate, out = audio.decode_wav(audio.encode_wav(samples, 16000))
    assert rate == 16000
    assert np.array_equal(out, samples)


def test_decode_walks_extra_chunks():
    """fmt/data preceded and separated by foreign chunks (LIST metadata,
    odd-sized chunk with pad byte) still decode — a chunk walker, not a
    fixed-offset reader."""
    samples = audio.synth_pcm(64, 3, 5)
    canonical = audio.encode_wav(samples, 8000)
    fmt_chunk = canonical[12:36]
    data_chunk = canonical[36:]
    odd = b"junk" + struct.pack("<I", 3) + b"abc" + b"\0"  # odd size + pad
    body = b"LIST" + struct.pack("<I", 4) + b"INFO" + fmt_chunk + odd + data_chunk
    riff = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, out = audio.decode_wav(riff)
    assert rate == 8000
    assert np.array_equal(out, samples)


def test_decode_rejects_non_pcm16_mono():
    samples = audio.synth_pcm(16, 1, 2)
    data = bytearray(audio.encode_wav(samples, 8000))
    stereo = bytes(data[:22]) + struct.pack("<H", 2) + bytes(data[24:])
    with pytest.raises(ValueError):
        audio.decode_wav(stereo)
    with pytest.raises(ValueError):
        audio.decode_wav(b"payload:whatever")
    with pytest.raises(ValueError):
        audio.decode_wav(b"RIFF\0\0\0\0WAVE")  # no fmt/data chunks


def test_stdlib_wave_differential_decode():
    """The stdlib ``wave`` module — an independent RIFF implementation —
    reads engine-encoded bytes back to the identical sample stream."""
    samples = audio.synth_pcm(777, 42, 11)
    payload = audio.encode_wav(samples, 16000)
    with wave.open(io.BytesIO(payload)) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        frames = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    assert np.array_equal(frames, samples)


def test_audio_features_hand_computed():
    # constant +1 signal: rms = peak = 1/32768, zero crossings = 0
    const = np.ones(100, dtype=np.int16)
    vec = audio.audio_features(const, 8000, 16)
    assert vec.dtype == np.float32
    assert vec[0] == np.float32(100 / 8000)
    assert vec[1] == vec[2] == np.float32(1 / 32768)
    assert vec[3] == 0.0
    assert np.all(vec[4:] == np.float32(1 / 32768))  # every segment RMS
    # alternating full-scale square wave: zcr = 1, rms = peak = 1
    alt = np.where(np.arange(100) % 2 == 0, 32768 // 2, -(32768 // 2)).astype(
        np.int16
    )
    vec = audio.audio_features(alt, 8000, 16)
    assert vec[1] == vec[2] == np.float32(0.5)
    assert vec[3] == np.float32(1.0)
    assert audio.audio_features(np.array([], dtype=np.int16), 8000, 8).tolist() == [
        0.0
    ] * 8


def test_media_decoder_dispatches_wav():
    from turtle_spark.functions.imaging import media_decoder

    samples = audio.synth_pcm(256, 9, 4)
    payload = audio.encode_wav(samples, 8000)
    got = media_decoder(payload, "audio", 16)
    assert np.array_equal(got, audio.audio_features(samples, 8000, 16))


# --- Spark path --------------------------------------------------------------


def test_synthesized_wav_payloads_match_spec(spark):
    """End-to-end: audio payload bytes written by the Arrow synthesis
    UDF decode (via the INDEPENDENT stdlib wave reader) to exactly the
    spec waveform, and duration_ms is honest sample math."""
    from turtle_spark.operators.multimodal import synthesize_media_table

    media = synthesize_media_table(generate_docs(spark, 60, seed=21))
    rows = media.where(F.col("media_type") == "audio").collect()
    assert rows, "seed produced no audio rows"
    rates = set()
    for r in rows:
        payload = bytes(r.payload)
        assert r.meta.codec == "wav"
        with wave.open(io.BytesIO(payload)) as w:
            rate = w.getframerate()
            frames = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        rates.add(rate)
        assert r.meta.duration_ms == frames.size * 1000 // rate
        # waveform law: raw[i] = (i*C*A + B) mod 65536 is an arithmetic
        # progression mod 65536, so consecutive diffs are all equal —
        # checks the spec without re-deriving the per-row hash seeds
        sraw = frames.astype(np.int64) + 32768
        diffs = (sraw[1:] - sraw[:-1]) % 65536
        assert frames.size >= 400 and len(set(diffs.tolist())) == 1
    assert rates <= {8000, 16000} and rates


def test_audio_features_partitioning_independent(spark):
    from turtle_spark.functions.imaging import media_decoder
    from turtle_spark.operators.multimodal import decode_features, synthesize_media_table

    media = synthesize_media_table(generate_docs(spark, 40, seed=21)).where(
        F.col("media_type") == "audio"
    )
    a = {
        r.media_ref: r.features
        for r in decode_features(media, dim=16, stub=False, decoder=media_decoder).collect()
    }
    b = {
        r.media_ref: r.features
        for r in decode_features(
            media.repartition(9), dim=16, stub=False, decoder=media_decoder
        ).collect()
    }
    assert a == b and a
