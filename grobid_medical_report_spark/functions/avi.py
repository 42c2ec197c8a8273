"""Pure-stdlib+numpy AVI (RIFF, uncompressed DIB frames) codec.

Completes the video modality the way functions/wav.py completed audio and
functions/media.py / functions/jpeg.py completed images: the CONTAINER and
the uncompressed interchange codec are REAL (RIFF list walk, avih/strh/strf
header validation, '00db' DIB frame decode with the bottom-up BGR row
convention, plus a matching encoder for deterministic test streams), and
only genuinely external compressed codecs (h264/vp9/av1 — licensed DSP
stacks, not bundled) remain stubbed at the operator layer.

The reference engine has no video handling (its GraphicObject assets are
images — MedicalReportSegmenterParser.dealWithImages:151-231); this module
serves the LLM-training-data side, where video corpora ride the opaque
binary-column contract and the first real operation is always
container-walk + frame-sample.

Scale shape: decode + frame sampling are numpy slicing inside an Arrow
batch (operators/multimodal.py:x_media_video_frames) — no per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np


class MediaFormatError(ValueError):
    """Malformed or unsupported media payload (quarantine, don't poison
    the partition)."""


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode RGB uint8 frames of shape (n, h, w, 3) as an AVI with
    uncompressed DIB ('00db') frames — the deterministic test-payload
    synthesizer. Rows are stored bottom-up BGR with 4-byte alignment, per
    the DIB convention."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim != 4 or f.shape[3] != 3 or not f.size:
        raise MediaFormatError("frames must be (n, h, w, 3) uint8")
    n, h, w, _ = f.shape
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h
    avih = struct.pack("<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0,
                       n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, n, frame_bytes,
                                            0xFFFFFFFF, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes,
                       0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi = b""
    pad = stride - w * 3
    for i in range(n):
        # bottom-up rows, BGR channel order, padded to the stride
        dib = f[i, ::-1, :, ::-1]
        if pad:
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, :w * 3] = dib.reshape(h, w * 3)
            raw = rows.tobytes()
        else:
            raw = dib.tobytes()
        movi += _chunk(b"00db", raw)
    body = b"AVI " + hdrl + _list(b"movi", movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(payload: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        clen = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body_at = pos + 8
        if body_at + clen > end:
            raise MediaFormatError(f"truncated {cid!r} chunk")
        yield cid, body_at, clen
        pos = body_at + clen + (clen & 1)


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an AVI with uncompressed DIB frames -> (frames (n, h, w, 3)
    RGB uint8, fps). Walks the RIFF lists (index/junk chunks are legal and
    skipped), validates avih/strf, and raises MediaFormatError on anything
    malformed or on compressed streams (biCompression != 0)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise MediaFormatError("not a RIFF/AVI stream")
    riff_len = struct.unpack("<I", payload[4:8])[0]
    if riff_len + 8 > len(payload):
        raise MediaFormatError("truncated RIFF payload")
    end = 8 + riff_len
    avih = None
    strf = None
    frames_raw: list[bytes] = []

    def walk_list(pos: int, stop: int) -> None:
        nonlocal avih, strf
        for cid, at, clen in _walk(payload, pos, stop):
            if cid == b"LIST":
                walk_list(at + 4, at + clen)
            elif cid == b"avih":
                if clen < 56:
                    raise MediaFormatError("avih too short")
                avih = struct.unpack("<14I", payload[at:at + 56])
            elif cid == b"strf" and strf is None:
                if clen < 40:
                    raise MediaFormatError("strf too short")
                strf = struct.unpack("<IiiHHIIiiII", payload[at:at + 40])
            elif cid in (b"00db", b"00dc"):
                frames_raw.append(payload[at:at + clen])

    walk_list(12, end)
    if avih is None or strf is None:
        raise MediaFormatError("missing avih/strf header")
    usec_per_frame = avih[0]
    if usec_per_frame <= 0:
        raise MediaFormatError("invalid frame rate")
    fps = round(1_000_000 / usec_per_frame)
    _size, w, h, _planes, bits, compression = strf[:6]
    if compression != 0:
        raise MediaFormatError(
            f"compressed video (biCompression={compression}) not bundled")
    if bits != 24 or w <= 0 or h == 0:
        raise MediaFormatError(f"unsupported DIB format {bits}bpp {w}x{h}")
    flip = h > 0                      # positive height = bottom-up rows
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        if len(raw) < stride * h:
            raise MediaFormatError(f"frame {i}: short DIB raster")
        rows = np.frombuffer(raw[:stride * h], dtype=np.uint8)
        rows = rows.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
        if flip:
            rows = rows[::-1]
        out[i] = rows[:, :, ::-1]     # BGR -> RGB
    return out, fps


def video_stats(payload: bytes) -> dict:
    """Decode + one-pass numpy summary (the video analog of wav_features):
    per-stream shape plus mean-luma and inter-frame motion (mean abs diff)."""
    frames, fps = decode_avi(payload)
    n, h, w, _ = frames.shape
    luma = (frames.astype(np.float64)
            @ np.array([0.299, 0.587, 0.114]))
    motion = (float(np.mean(np.abs(np.diff(luma, axis=0))))
              if n > 1 else 0.0)
    return {
        "n_frames": int(n), "height": int(h), "width": int(w),
        "fps": int(fps),
        "duration_sec": round(n / fps, 6),
        "mean_luma": round(float(luma.mean()), 6),
        "motion": round(motion, 6),
    }
