"""AVI codec: encode/decode round-trip (pixel-exact), list-walk robustness,
stats kernel, and the Spark video frame-sampling path with per-row failure
isolation."""

import struct

import numpy as np
import pytest

from grobid_medical_report_spark.functions.avi import (MediaFormatError,
                                                       decode_avi,
                                                       encode_avi,
                                                       video_stats)


def _frames(n=6, h=12, w=16, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_round_trip_exact():
    f = _frames()
    dec, fps = decode_avi(encode_avi(f, fps=10))
    assert fps == 10
    assert np.array_equal(dec, f)


def test_round_trip_unaligned_width():
    """w=15 -> 45-byte rows pad to a 48-byte stride; padding must vanish."""
    f = _frames(n=3, h=5, w=15)
    dec, _ = decode_avi(encode_avi(f, fps=25))
    assert np.array_equal(dec, f)


def test_junk_chunk_skipped():
    wav = bytearray(encode_avi(_frames(n=2), fps=10))
    junk = b"JUNK" + struct.pack("<I", 7) + b"padding" + b"\x00"
    out = wav[:12] + junk + wav[12:]
    out[4:8] = struct.pack("<I", len(out) - 8)
    dec, _ = decode_avi(bytes(out))
    assert dec.shape[0] == 2


@pytest.mark.parametrize("mutate", [
    lambda b: b[:10],                                  # truncated header
    lambda b: b[:8] + b"WAVE" + b[12:],                # wrong RIFF form
    lambda b: b[:len(b) // 2],                         # truncated movi
    lambda b: b.replace(b"avih", b"xvih", 1),          # missing avih
])
def test_malformed_raises(mutate):
    avi = encode_avi(_frames(), fps=10)
    with pytest.raises(MediaFormatError):
        decode_avi(bytes(mutate(bytearray(avi))))


def test_compressed_rejected():
    avi = bytearray(encode_avi(_frames(), fps=10))
    at = avi.find(b"strf") + 8      # strf body: biSize,i32 w,h,planes,bits
    # biCompression is at offset 16 into BITMAPINFOHEADER
    avi[at + 16:at + 20] = struct.pack("<I", 0x34363248)   # 'H264'
    with pytest.raises(MediaFormatError, match="compressed"):
        decode_avi(bytes(avi))


def test_stats_kernel():
    f = np.zeros((4, 8, 8, 3), dtype=np.uint8)
    f[2:] = 255                      # hard cut between frames 1 and 2
    st = video_stats(encode_avi(f, fps=20))
    assert st["n_frames"] == 4 and st["fps"] == 20
    assert st["duration_sec"] == 0.2
    assert abs(st["mean_luma"] - 127.5) < 0.5
    # one full-swing transition out of three diffs -> ~255/3
    assert 80 < st["motion"] < 90


def test_spark_video_frames_path(spark):
    from grobid_medical_report_spark.operators.multimodal import \
        x_media_video_frames

    rows = x_media_video_frames(spark, "/root/testdata/sf0.001").collect()
    assert rows
    errs = [r for r in rows if r.status.startswith("error")]
    oks = [r for r in rows if r.status == "ok"]
    assert errs and all(r.doc_id % 29 == 0 for r in errs)
    assert oks
    by_doc = {}
    for r in oks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for did, rs in by_doc.items():
        # sampling stride 3 over n_frames, motion constant per doc
        n = rs[0].n_frames
        assert sorted(r.frame_idx for r in rs) == list(range(0, n, 3))
        assert len({r.motion for r in rs}) == 1
        assert all(r.fps == 10 and 0.0 <= r.frame_luma <= 255.0 for r in rs)


# ---- property fuzz (hypothesis) ------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 6), st.integers(1, 24), st.integers(1, 24),
           st.integers(0, 2**32 - 1))
    def test_fuzz_roundtrip_any_video(n, h, w, seed):
        """Any uncompressed frame stack round-trips pixel-exactly, at any
        geometry (incl. strides needing row padding)."""
        rng = np.random.RandomState(seed)
        f = rng.randint(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        dec, fps = decode_avi(encode_avi(f, fps=12))
        assert fps == 12
        assert np.array_equal(dec, f)

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=400), st.integers(0, 2))
    def test_fuzz_garbage_never_crashes(data, prefix_kind):
        """Arbitrary bytes (optionally wearing a RIFF/AVI prefix) either
        decode or raise MediaFormatError — never an uncontrolled
        exception."""
        prefix = [b"", b"RIFF", b"RIFF\x00\x01\x00\x00AVI "][prefix_kind]
        try:
            decode_avi(prefix + data)
        except MediaFormatError:
            pass

    @settings(max_examples=40, deadline=None)
    @given(st.integers(0, 2**32 - 1), st.floats(0.01, 0.99))
    def test_fuzz_truncation_never_crashes(seed, frac):
        rng = np.random.RandomState(seed)
        f = rng.randint(0, 256, size=(3, 8, 8, 3), dtype=np.uint8)
        avi = encode_avi(f, fps=10)
        cut = avi[: max(1, int(len(avi) * frac))]
        try:
            decode_avi(bytes(cut))
        except MediaFormatError:
            pass
except ImportError:
    pass
