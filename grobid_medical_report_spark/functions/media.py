"""Real media codecs in pure stdlib: PPM decode + PNG encode/decode.

The reference's segmenter converts extracted page assets to PNG
(``dealWithImages``: JPG/PPM -> PNG, MedicalReportSegmenterParser.java:
176-206). PIL/opencv are not bundled in this container, but the PPM half
needs no codec library: PPM is a trivial header + raw RGB bytes, and an
uncompressed-filter PNG is signature + IHDR + zlib(IDAT) + IEND with CRCs —
all expressible with ``zlib``/``struct``. So PPM -> PNG here is REAL
(round-trip verified pixel-exact in tests/test_media_png.py); JPG stays
behind the honest ``NotImplementedError`` stub in operators/multimodal.py.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class MediaFormatError(ValueError):
    """Malformed media payload (maps to the kernel's per-row status)."""


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM (P6) or PGM (P5): -> (width, height, rgb bytes).

    Grayscale input is expanded to RGB so the PNG encoder has one path.
    Handles comments and arbitrary header whitespace per the netpbm spec.
    """
    if payload[:2] not in (b"P6", b"P5"):
        raise MediaFormatError(f"not a binary PPM/PGM: {payload[:2]!r}")
    gray = payload[:2] == b"P5"
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":           # comment to end of line
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise MediaFormatError("unterminated comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tok = payload[start:pos]
        if not tok.isdigit():
            raise MediaFormatError(f"bad header token {tok!r}")
        fields.append(int(tok))
    pos += 1                                       # single whitespace after maxval
    w, h, maxval = fields
    if not (0 < w and 0 < h):
        raise MediaFormatError(f"bad dimensions {w}x{h}")
    if maxval != 255:
        raise MediaFormatError(f"only maxval 255 supported, got {maxval}")
    n = w * h * (1 if gray else 3)
    raster = payload[pos:pos + n]
    if len(raster) != n:
        raise MediaFormatError(f"truncated raster: {len(raster)} != {n}")
    if gray:
        rgb = bytearray(w * h * 3)
        rgb[0::3] = raster
        rgb[1::3] = raster
        rgb[2::3] = raster
        raster = bytes(rgb)
    return w, h, raster


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal RGB8 PNG encoder: filter-0 scanlines, one zlib IDAT."""
    if len(rgb) != width * height * 3:
        raise MediaFormatError("rgb buffer does not match dimensions")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(b"\x00" + rgb[y * stride:(y + 1) * stride]
                   for y in range(height))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Reader for the encoder above (filter-0 RGB8 only) — the round-trip
    verifier; a general PNG reader would need the other filter types."""
    if payload[:8] != _PNG_SIG:
        raise MediaFormatError("not a PNG")
    pos = 8
    width = height = 0
    idat = b""
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            if (depth, ctype) != (8, 2):
                raise MediaFormatError("only RGB8 supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = width * 3
    out = bytearray()
    for y in range(height):
        row = raw[y * (stride + 1):(y + 1) * (stride + 1)]
        if row[:1] != b"\x00":
            raise MediaFormatError(f"unsupported filter {row[0]}")
        out += row[1:]
    return width, height, bytes(out)


def ppm_to_png(payload: bytes) -> bytes:
    """The reference's asset conversion (PPM -> PNG), pure stdlib."""
    return encode_png(*decode_ppm(payload))


def make_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary P6 writer (used to synthesize deterministic test assets)."""
    return b"P6\n%d %d\n255\n" % (width, height) + rgb
