"""Pure-stdlib media codecs: PPM decode + PNG encode round-trip (the
reference's dealWithImages asset conversion, real for the PPM half)."""

from __future__ import annotations

import pytest

from grobid_medical_report_spark.functions.media import (MediaFormatError,
                                                         decode_png,
                                                         decode_ppm,
                                                         encode_png,
                                                         make_ppm,
                                                         ppm_to_png)


def _rgb(w, h):
    return bytes((x * 7 + 13) % 256 for x in range(w * h * 3))


def test_ppm_png_round_trip_pixel_exact():
    for w, h in ((1, 1), (8, 5), (16, 16), (3, 31)):
        rgb = _rgb(w, h)
        png = ppm_to_png(make_ppm(w, h, rgb))
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert decode_png(png) == (w, h, rgb)


def test_ppm_comments_and_whitespace():
    rgb = _rgb(4, 2)
    ppm = b"P6 # inline\n# a comment line\n 4\t2\n255\n" + rgb
    assert decode_ppm(ppm) == (4, 2, rgb)


def test_pgm_grayscale_expands_to_rgb():
    gray = bytes(range(12))
    w, h, rgb = decode_ppm(b"P5\n4 3\n255\n" + gray)
    assert (w, h) == (4, 3)
    assert rgb[0::3] == gray and rgb[1::3] == gray and rgb[2::3] == gray


@pytest.mark.parametrize("bad", [
    b"P3\n1 1\n255\n1 2 3",              # ASCII ppm unsupported
    b"P6\n2 2\n255\n\x00\x01",           # truncated raster
    b"P6\n2 2\n65535\n" + b"\x00" * 24,  # 16-bit maxval
    b"\x89PNG not really",
])
def test_malformed_payloads_raise_media_error(bad):
    with pytest.raises(MediaFormatError):
        decode_ppm(bad)


def test_encode_png_rejects_bad_buffer():
    with pytest.raises(MediaFormatError):
        encode_png(2, 2, b"\x00" * 5)


def test_spark_ppm_to_png_stage(spark):
    from grobid_medical_report_spark.operators.multimodal import \
        x_media_ppm_to_png

    rows = x_media_ppm_to_png(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    ok = [r for r in rows if r["status"] == "ok"]
    bad = [r for r in rows if r["status"].startswith("error")]
    assert all(r["png_bytes"] > 0 for r in ok)
    # every 17th doc carries a truncated payload -> isolated, not raised
    assert {r["doc_id"] % 17 for r in bad} == {0}
    assert len(bad) == sum(1 for r in rows if r["doc_id"] % 17 == 0)
