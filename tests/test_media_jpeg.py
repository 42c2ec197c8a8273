"""Baseline JPEG codec: decode correctness via encode->decode round trips.

A constant-color image survives exactly (DC-only blocks, flat quant); a
smooth gradient stays within the DCT rounding bound; the Annex-K-table
path stays within the usual visual-lossy bound; malformed/progressive
streams raise MediaFormatError. The decoder is the production half
(multimodal JPG->PNG conversion, reference dealWithImages
MedicalReportSegmenterParser.java:176-206); the encoder exists to
synthesize deterministic test streams."""

from __future__ import annotations

import numpy as np
import pytest

from grobid_medical_report_spark.functions.jpeg import (decode_jpeg,
                                                        encode_jpeg,
                                                        jpg_to_png)
from grobid_medical_report_spark.functions.media import (MediaFormatError,
                                                         decode_png)


def _img(w, h, fn):
    a = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            a[y, x] = fn(x, y)
    return a.tobytes()


def test_constant_image_roundtrips_exactly():
    rgb = _img(16, 16, lambda x, y: (120, 64, 200))
    w, h, out = decode_jpeg(encode_jpeg(16, 16, rgb))
    assert (w, h) == (16, 16)
    got = np.frombuffer(out, dtype=np.uint8)
    want = np.frombuffer(rgb, dtype=np.uint8)
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1


def test_gradient_within_dct_rounding_bound():
    rgb = _img(24, 17, lambda x, y: (10 * x % 256, 8 * y % 256,
                                     (x + y) * 5 % 256))
    w, h, out = decode_jpeg(encode_jpeg(24, 17, rgb))
    assert (w, h) == (24, 17)
    got = np.frombuffer(out, dtype=np.uint8).astype(int)
    want = np.frombuffer(rgb, dtype=np.uint8).astype(int)
    # flat quant: error is DCT forward+inverse rounding plus the YCbCr
    # colorspace round trip
    assert int(np.abs(got - want).max()) <= 4


def test_annexk_tables_visually_lossy_but_close():
    rgb = _img(32, 32, lambda x, y: (128 + (x > 16) * 60, 90, 40))
    w, h, out = decode_jpeg(encode_jpeg(32, 32, rgb, quality_flat=False))
    got = np.frombuffer(out, dtype=np.uint8).astype(int)
    want = np.frombuffer(rgb, dtype=np.uint8).astype(int)
    assert float(np.abs(got - want).mean()) < 12.0


def test_non_multiple_of_8_dimensions():
    rgb = _img(13, 9, lambda x, y: (x * 19 % 256, y * 27 % 256, 77))
    w, h, out = decode_jpeg(encode_jpeg(13, 9, rgb))
    assert (w, h) == (13, 9) and len(out) == 13 * 9 * 3


def test_jpg_to_png_pipeline():
    rgb = _img(8, 8, lambda x, y: (200, x * 30 % 256, y * 30 % 256))
    png = jpg_to_png(encode_jpeg(8, 8, rgb))
    w, h, out = decode_png(png)
    assert (w, h) == (8, 8)
    got = np.frombuffer(out, dtype=np.uint8).astype(int)
    want = np.frombuffer(rgb, dtype=np.uint8).astype(int)
    assert int(np.abs(got - want).max()) <= 4


def test_malformed_streams_raise():
    with pytest.raises(MediaFormatError):
        decode_jpeg(b"notajpeg")
    rgb = _img(8, 8, lambda x, y: (1, 2, 3))
    stream = bytearray(encode_jpeg(8, 8, rgb))
    stream[20] ^= 0xFF                     # corrupt a header byte
    with pytest.raises(MediaFormatError):
        decode_jpeg(bytes(stream[:40]))    # truncated too


def test_progressive_equals_baseline_pixels():
    """r4: the progressive scan script (interleaved DC first/refine,
    per-component AC spectral bands with successive approximation and
    genuine EOB runs) carries the same quantized coefficients as the
    baseline encoding — decoded pixels must be IDENTICAL, byte for byte,
    for both quantization regimes and non-multiple-of-8 sizes."""
    rng = np.random.RandomState(7)
    for (w, h) in ((8, 8), (16, 16), (24, 17), (40, 33)):
        rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
        for flat in (True, False):
            base = decode_jpeg(encode_jpeg(w, h, rgb, quality_flat=flat))
            prog = decode_jpeg(encode_jpeg(w, h, rgb, quality_flat=flat,
                                           progressive=True))
            assert base == prog, (w, h, flat)


def test_progressive_stream_is_sof2_multiscan():
    rgb = _img(16, 16, lambda x, y: (x * 10, y * 10, 40))
    stream = encode_jpeg(16, 16, rgb, progressive=True)
    assert b"\xff\xc2" in stream and b"\xff\xc0" not in stream
    assert stream.count(b"\xff\xda") >= 8      # DC x2 + AC bands per comp


def test_lossless_jpeg_rejected():
    # SOF3 (lossless) stub must still raise
    stub = b"\xff\xd8\xff\xc3\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    with pytest.raises(MediaFormatError):
        decode_jpeg(stub)


# ---- property fuzz (hypothesis) ------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
    def test_fuzz_roundtrip_any_image(w, h, seed):
        """Any RGB image round-trips through encode->decode with the flat
        quant bound; dimensions always survive exactly."""
        rng = np.random.RandomState(seed)
        rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
        rw, rh, out = decode_jpeg(encode_jpeg(w, h, rgb))
        assert (rw, rh) == (w, h) and len(out) == w * h * 3
        # the progressive twin of the same image decodes identically
        assert decode_jpeg(encode_jpeg(w, h, rgb,
                                       progressive=True)) == (rw, rh, out)
        got = np.frombuffer(out, np.uint8).astype(int)
        want = np.frombuffer(rgb, np.uint8).astype(int)
        # random (noise) images are the DCT worst case: per-coefficient
        # quantization rounding accumulates across all 64 basis functions
        assert int(np.abs(got - want).max()) <= 40
        assert float(np.abs(got - want).mean()) <= 4.0

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=400), st.integers(0, 3))
    def test_fuzz_garbage_never_hangs_or_crashes(data, prefix_kind):
        """Arbitrary bytes (optionally wearing a JPEG prefix) either decode
        or raise MediaFormatError — never an uncontrolled exception."""
        prefix = [b"", b"\xff\xd8", b"\xff\xd8\xff\xdb",
                  b"\xff\xd8\xff\xc0"][prefix_kind]
        try:
            decode_jpeg(prefix + data)
        except MediaFormatError:
            pass
except ImportError:       # hypothesis not installed: skip the fuzz pair
    pass
