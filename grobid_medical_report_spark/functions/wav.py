"""Pure-stdlib+numpy WAV (RIFF PCM) codec + audio feature kernel.

Completes the multimodal audio path the same way functions/media.py and
functions/jpeg.py completed the image path: the container/codec layer is
REAL (RIFF chunk walk, fmt validation, PCM16/PCM8 sample decode, and a
matching encoder for test-stream synthesis), and only genuinely external
codecs (mp3/aac/opus — licensed DSP stacks, not bundled) remain stubbed at
the operator layer.

The reference engine has no audio handling at all (its GraphicObject assets
are images only — MedicalReportSegmenterParser.dealWithImages:151-231); this
module exists for the LLM-training-data side of the engine, where audio
corpora ride the same opaque-binary-column contract as images.

Scale shape: decode + features are one numpy pass per payload inside an
Arrow batch (operators/multimodal.py:x_media_wav_features) — no per-sample
Python, no JVM round-trip between decode and feature-extraction.
"""

from __future__ import annotations

import struct

import numpy as np


class MediaFormatError(ValueError):
    """Malformed or unsupported media payload (quarantine, don't poison
    the partition)."""


def encode_wav(samples: np.ndarray, sample_rate: int,
               n_channels: int = 1) -> bytes:
    """Encode int16 PCM samples (shape (n,) mono or (n, ch)) as a RIFF/WAVE
    stream — the deterministic test-payload synthesizer (same role as
    media.make_ppm / jpeg.encode_jpeg)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] != n_channels:
        raise MediaFormatError("sample array shape does not match n_channels")
    data = s.tobytes()
    block_align = 2 * n_channels
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM stream -> (float64 samples in [-1, 1] of shape
    (n_frames, n_channels), sample_rate). Walks the chunk list (extra chunks
    like LIST/fact are legal and skipped), validates the fmt contract, and
    raises MediaFormatError on anything malformed or non-PCM."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaFormatError("not a RIFF/WAVE stream")
    riff_len = struct.unpack("<I", payload[4:8])[0]
    if riff_len + 8 > len(payload):
        raise MediaFormatError("truncated RIFF payload")
    pos, end = 12, 8 + riff_len
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        clen = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + clen]
        if len(body) < clen:
            raise MediaFormatError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise MediaFormatError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)      # chunks are word-aligned
    if fmt is None or data is None:
        raise MediaFormatError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _rate, block_align, bits = fmt
    if audio_format != 1:
        raise MediaFormatError(f"non-PCM audio format {audio_format} "
                               "(compressed codecs not bundled)")
    if n_channels < 1 or sample_rate < 1:
        raise MediaFormatError("invalid channel/rate")
    if bits == 16:
        if block_align != 2 * n_channels:
            raise MediaFormatError("block align mismatch")
        n = len(data) // (2 * n_channels)
        s = np.frombuffer(data[:n * 2 * n_channels], dtype="<i2")
        x = s.astype(np.float64).reshape(n, n_channels) / 32768.0
    elif bits == 8:                       # PCM8 is unsigned per the spec
        if block_align != n_channels:
            raise MediaFormatError("block align mismatch")
        n = len(data) // n_channels
        s = np.frombuffer(data[:n * n_channels], dtype=np.uint8)
        x = (s.astype(np.float64).reshape(n, n_channels) - 128.0) / 128.0
    else:
        raise MediaFormatError(f"unsupported bit depth {bits}")
    return x, sample_rate


def wav_features(payload: bytes) -> dict:
    """Decode + one-pass numpy feature kernel: the audio analog of the image
    resize/feature operators. All features are deterministic functions of
    the samples (no windowing randomness)."""
    x, rate = decode_wav(payload)
    n, ch = x.shape
    mono = x.mean(axis=1) if ch > 1 else x[:, 0]
    rms = float(np.sqrt(np.mean(mono * mono))) if n else 0.0
    peak = float(np.max(np.abs(mono))) if n else 0.0
    if n > 1:
        sign = np.signbit(mono)
        zcr = float(np.count_nonzero(sign[1:] != sign[:-1])) / (n - 1)
    else:
        zcr = 0.0
    silence = float(np.count_nonzero(np.abs(mono) < 0.01)) / n if n else 1.0
    return {
        "sample_rate": int(rate),
        "n_channels": int(ch),
        "n_frames": int(n),
        "duration_sec": round(n / rate, 6),
        "rms": round(rms, 6),
        "peak": round(peak, 6),
        "zero_cross_rate": round(zcr, 6),
        "silence_ratio": round(silence, 6),
    }
