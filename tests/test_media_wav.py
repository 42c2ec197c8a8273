"""WAV codec: encoder/decoder round-trip, chunk-walk robustness, feature
kernel determinism, and the Spark mapInPandas audio path (real decode +
per-row failure isolation)."""

import struct

import numpy as np
import pytest

from grobid_medical_report_spark.functions.wav import (MediaFormatError,
                                                       decode_wav,
                                                       encode_wav,
                                                       wav_features)


def _tone(n=800, rate=8000, freq=440.0, amp=0.5):
    t = np.arange(n) / rate
    return (np.sin(2 * np.pi * freq * t) * amp * 32767).astype("<i2")


def test_round_trip_mono_exact():
    s = _tone()
    x, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000 and x.shape == (800, 1)
    back = np.round(x[:, 0] * 32768.0).astype("<i2")
    # int16 -> [-1,1) float -> int16 must be lossless
    assert np.array_equal(back, s)


def test_round_trip_stereo():
    left, right = _tone(freq=220.0), _tone(freq=330.0)
    s = np.stack([left, right], axis=1)
    x, rate = decode_wav(encode_wav(s, 16000, n_channels=2))
    assert x.shape == (800, 2)
    assert np.array_equal(np.round(x * 32768.0).astype("<i2"), s)


def test_extra_chunks_skipped():
    """LIST/fact chunks between fmt and data are legal and skipped; odd-length
    chunks are word-aligned."""
    wav = bytearray(encode_wav(_tone(), 8000))
    # splice an odd-length junk chunk right after 'WAVE'
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    out = wav[:12] + junk + wav[12:]
    out[4:8] = struct.pack("<I", len(out) - 8)
    x, rate = decode_wav(bytes(out))
    assert x.shape == (800, 1) and rate == 8000


def test_pcm8_decode():
    data = bytes(range(0, 256))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    x, rate = decode_wav(wav)
    assert x.shape == (256, 1)
    assert x.min() == -1.0 and abs(x.max() - 127 / 128) < 1e-12


@pytest.mark.parametrize("mutate", [
    lambda b: b[:10],                                  # truncated header
    lambda b: b"RIFX" + b[4:],                         # bad magic
    lambda b: b[:len(b) // 2],                         # truncated data
    lambda b: b.replace(b"fmt ", b"xmt ", 1),          # missing fmt
    lambda b: b[:20] + struct.pack("<H", 85) + b[22:],  # mp3 format tag
])
def test_malformed_raises(mutate):
    wav = encode_wav(_tone(), 8000)
    with pytest.raises(MediaFormatError):
        decode_wav(bytes(mutate(bytearray(wav))))


def test_features_deterministic_and_sane():
    s = _tone(n=1600, rate=8000, freq=400.0)
    s[:200] = 0
    f = wav_features(encode_wav(s, 8000))
    assert f == wav_features(encode_wav(s, 8000))
    assert f["sample_rate"] == 8000 and f["n_frames"] == 1600
    assert f["duration_sec"] == 0.2
    assert 0.2 < f["rms"] < 0.5 and 0.4 < f["peak"] <= 0.5
    # a 400 Hz tone at 8 kHz crosses zero ~2*400/8000 per sample
    assert 0.05 < f["zero_cross_rate"] < 0.15
    # 200 injected zeros plus the near-zero samples at each sine crossing
    assert 0.125 < f["silence_ratio"] < 0.3


def test_spark_wav_features_path(spark):
    from grobid_medical_report_spark.operators.multimodal import \
        x_media_wav_features

    rows = x_media_wav_features(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_status = {}
    for r in rows:
        by_status.setdefault(r.status.split(":")[0], []).append(r)
    ok = by_status["ok"]
    # every 19th even doc_id is truncated and must be isolated, not raised
    assert any(s.startswith("error") for s in by_status) or \
        all(r.doc_id % 19 != 0 for r in ok)
    errs = [r for r in rows if r.status.startswith("error")]
    assert errs and all(r.doc_id % 19 == 0 for r in errs)
    for r in ok:
        assert r.sample_rate == 8000 and r.n_frames > 0
        assert r.duration_sec == round(r.n_frames / 8000, 6)
        assert 0.0 <= r.silence_ratio <= 1.0 and r.peak <= 1.0
    # silence head is injected: silence_ratio must reflect it
    assert all(r.silence_ratio >= 0.1 for r in ok)


# ---- property fuzz (hypothesis) ------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 4000), st.integers(1, 2), st.integers(0, 2**32 - 1))
    def test_fuzz_roundtrip_any_pcm(n, ch, seed):
        """Any int16 PCM signal round-trips losslessly at any length and
        channel count."""
        rng = np.random.RandomState(seed)
        s = rng.randint(-32768, 32768, size=(n, ch)).astype("<i2")
        x, rate = decode_wav(encode_wav(s, 8000, n_channels=ch))
        assert rate == 8000 and x.shape == (n, ch)
        assert np.array_equal(np.round(x * 32768.0).astype("<i2"), s)

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=400), st.integers(0, 2))
    def test_fuzz_garbage_never_crashes(data, prefix_kind):
        """Arbitrary bytes (optionally wearing a RIFF prefix) either decode
        or raise MediaFormatError — never an uncontrolled exception."""
        prefix = [b"", b"RIFF", b"RIFF\x00\x01\x00\x00WAVE"][prefix_kind]
        try:
            decode_wav(prefix + data)
        except MediaFormatError:
            pass

    @settings(max_examples=40, deadline=None)
    @given(st.integers(0, 2**32 - 1), st.floats(0.01, 0.99))
    def test_fuzz_truncation_never_crashes(seed, frac):
        """Every truncation point of a valid stream raises MediaFormatError
        or still decodes (the data chunk tolerates a short tail) — never an
        uncontrolled exception."""
        rng = np.random.RandomState(seed)
        s = (rng.randint(-32768, 32768, size=400)).astype("<i2")
        wav = encode_wav(s, 8000)
        cut = wav[: max(1, int(len(wav) * frac))]
        try:
            decode_wav(bytes(cut))
        except MediaFormatError:
            pass
except ImportError:
    pass
