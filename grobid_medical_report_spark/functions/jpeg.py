"""Baseline JPEG codec in pure stdlib + numpy (no PIL/libjpeg).

Completes the reference's asset conversion (``dealWithImages``: JPG/PPM ->
PNG, MedicalReportSegmenterParser.java:176-206): the PPM half lives in
functions/media.py; this module supplies the JPG half.

Decoder: baseline sequential DCT (SOF0), Huffman entropy coding, 8-bit,
1 or 3 components, sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), restart
markers (DRI/RSTn). Progressive (SOF2) and arithmetic coding are out of
scope and raise ``MediaFormatError``.

Encoder: minimal baseline writer used to synthesize deterministic test
streams — 4:4:4, ITU T.81 Annex K quantization + Huffman tables (the spec's
own example tables, public). Round-trip accuracy is asserted in
tests/test_media_jpeg.py (constant blocks exact; smooth content within the
DCT quantization bound).

All DCT math is numpy (the 8x8 orthonormal DCT-II matrix) — one matmul per
block, no Python-per-pixel loops.
"""

from __future__ import annotations

import struct

import numpy as np

from .media import MediaFormatError, encode_png

#: zig-zag scan order (T.81 Figure 5) as (row, col) flat indices
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

#: T.81 Annex K.1 example quantization tables (zigzag order here is NOT
#: applied — these are in natural row-major order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64)

#: T.81 Annex K.3 example Huffman tables: (bits[1..16], huffval)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

#: 8x8 orthonormal DCT-II matrix: A @ X @ A.T is the forward transform
_K = np.arange(8)
_DCT_A = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) \
    * np.where(_K[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))


def _build_decode_table(bits, huffval):
    """Canonical Huffman -> {(length, code): value} lookup."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, huffval):
    """value -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """Entropy-coded segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise MediaFormatError("truncated entropy segment")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = d[self.pos] if self.pos < len(d) else None
            if nxt == 0x00:
                self.pos += 1                      # stuffed byte
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                # restart marker reached while bits were still requested
                raise MediaFormatError("hit RST marker mid-symbol")
            else:
                raise MediaFormatError("marker inside entropy data")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            v = table.get((length, code))
            if v is not None:
                return v
        raise MediaFormatError("invalid Huffman code")

    def align_restart(self):
        """Drop partial bits and consume an RSTn marker."""
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and not (
                d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        if self.pos + 1 >= len(d):
            raise MediaFormatError("missing restart marker")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t-bit magnitude to the signed coefficient."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


#: allocation guard for untrusted headers: a garbage SOF can claim
#: 65535x65535 and the plane buffers would be gigabytes
MAX_PIXELS = 64_000_000


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Baseline JPEG -> (width, height, rgb bytes). Malformed input of any
    shape raises MediaFormatError (fuzz-pinned: arbitrary bytes never
    escape as IndexError/struct.error)."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, KeyError, struct.error) as exc:
        # KeyError: a scan referencing quant/Huffman tables never defined
        raise MediaFormatError(
            f"malformed JPEG ({type(exc).__name__})") from exc


def _decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    if payload[:2] != b"\xff\xd8":
        raise MediaFormatError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise MediaFormatError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                          # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                                # standalone
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        body = payload[pos + 2:pos + seglen]
        if marker == 0xDB:                          # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                if pq:
                    raise MediaFormatError("16-bit quant tables unsupported")
                if p + 64 > len(body):
                    raise MediaFormatError("truncated DQT segment")
                tbl = np.frombuffer(body[p:p + 64], dtype=np.uint8) \
                    .astype(np.int64)
                p += 64
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = tbl                   # de-zigzag
                quant[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:                        # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1:p + 17])
                cnt = sum(bits)
                if len(bits) < 16 or p + 17 + cnt > len(body):
                    raise MediaFormatError("truncated DHT segment")
                vals = list(body[p + 17:p + 17 + cnt])
                p += 17 + cnt
                (huff_ac if tc else huff_dc)[th] = \
                    _build_decode_table(bits, vals)
        elif marker == 0xC0 or marker == 0xC1:      # SOF0/1 baseline
            if len(body) < 6:
                raise MediaFormatError("truncated SOF segment")
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), \
                body[5]
            if prec != 8:
                raise MediaFormatError("only 8-bit precision supported")
            if not (0 < w and 0 < h) or w * h > MAX_PIXELS:
                raise MediaFormatError(f"bad dimensions {w}x{h}")
            if not 1 <= nc <= 4 or len(body) < 6 + 3 * nc:
                raise MediaFormatError("bad SOF component table")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                hs, vs = hv >> 4, hv & 15
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise MediaFormatError(f"sampling {hs}x{vs} unsupported")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise MediaFormatError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported")
        elif marker == 0xDD:                        # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                        # SOS
            if frame is None:
                raise MediaFormatError("SOS before SOF")
            ns = body[0] if body else 0
            if not 1 <= ns <= 4 or len(body) < 1 + 2 * ns:
                raise MediaFormatError("bad SOS component table")
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                comp = next((x for x in frame["comps"] if x["id"] == cs),
                            None)
                if comp is None:
                    raise MediaFormatError(f"SOS references unknown comp {cs}")
                td, ta = tdta >> 4, tdta & 15
                scan.append({**comp, "dc": td, "ac": ta})
            data_start = pos + seglen
            return _decode_scan(payload, data_start, frame, scan, quant,
                                huff_dc, huff_ac, restart_interval)
        pos += seglen
    raise MediaFormatError("no scan data found")


def _decode_scan(payload, pos, frame, scan, quant, huff_dc, huff_ac,
                 restart_interval):
    w, h = frame["w"], frame["h"]
    # MCU geometry comes from the FRAME's components: a legal baseline
    # non-interleaved scan (Ns=1 over a subsampled chroma plane) has
    # component-scaled dimensions per T.81 — decoding it with scan-derived
    # hmax/vmax would produce garbled output, so multi-scan streams are
    # rejected up front instead (ADVICE r3)
    if len(scan) != len(frame["comps"]):
        raise MediaFormatError(
            "non-interleaved (multi-scan) baseline JPEG unsupported")
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for c in scan:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw), dtype=np.float64)
    br = _BitReader(payload, pos)
    pred = {c["id"]: 0 for c in scan}
    A, AT = _DCT_A, _DCT_A.T
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                br.align_restart()
                pred = {c["id"]: 0 for c in scan}
            mcu_count += 1
            for c in scan:
                q = quant[c["tq"]]
                dct = huff_dc[c["dc"]]
                act = huff_ac[c["ac"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        t = br.decode_huff(dct)
                        diff = _extend(br.receive(t), t)
                        pred[c["id"]] += diff
                        coef[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = br.decode_huff(act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16         # ZRL
                                    continue
                                break               # EOB
                            k += r
                            if k > 63:
                                raise MediaFormatError("AC index overflow")
                            coef[ZIGZAG[k]] = _extend(br.receive(s), s)
                            k += 1
                        block = (coef.reshape(8, 8) * q).astype(np.float64)
                        px = AT @ block @ A + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = px
    # upsample to full resolution and convert to RGB
    full = []
    for c in scan:
        p = planes[c["id"]]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        Y = np.clip(full[0], 0, 255)
        rgb = np.repeat(Y[:, :, None], 3, axis=2)
    elif len(full) == 3:
        Y, Cb, Cr = full
        r = Y + 1.402 * (Cr - 128.0)
        g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
        b = Y + 1.772 * (Cb - 128.0)
        rgb = np.clip(np.stack([r, g, b], axis=2), 0, 255)
    else:
        raise MediaFormatError(f"{len(full)}-component scan unsupported")
    return w, h, np.rint(rgb).astype(np.uint8).tobytes()


# --------------------------------------------------------------------------
# minimal baseline encoder (test-stream synthesis): 4:4:4, Annex K tables
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)               # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)         # 1-fill


def _mag(v: int) -> tuple[int, int]:
    """(category, magnitude bits) for a signed coefficient."""
    t = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _encode_block(bw, coef_zz, pred, dc_tab, ac_tab):
    diff = int(coef_zz[0]) - pred
    t, bits = _mag(diff)
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(bits, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]
            bw.write(code, ln)                       # ZRL
            run -= 16
        s, bits = _mag(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bits, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]
        bw.write(code, ln)                           # EOB
    return int(coef_zz[0])


def encode_jpeg(width: int, height: int, rgb: bytes,
                quality_flat: bool = True) -> bytes:
    """Minimal baseline 4:4:4 writer. ``quality_flat=True`` uses all-ones
    quantization (near-lossless, bounded only by DCT rounding); False uses
    the Annex K tables (visibly lossy, standard)."""
    if len(rgb) != width * height * 3:
        raise MediaFormatError("rgb buffer does not match dimensions")
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3) \
        .astype(np.float64)
    R, G, B = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    Y = 0.299 * R + 0.587 * G + 0.114 * B
    Cb = -0.168736 * R - 0.331264 * G + 0.5 * B + 128.0
    Cr = 0.5 * R - 0.418688 * G - 0.081312 * B + 128.0

    if quality_flat:
        ql = np.ones((8, 8), dtype=np.int64)
        qc = np.ones((8, 8), dtype=np.int64)
    else:
        ql = QUANT_LUMA.reshape(8, 8)
        qc = QUANT_CHROMA.reshape(8, 8)

    out = bytearray(b"\xff\xd8")                     # SOI

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2)
                   + body)

    for tq, q in ((0, ql), (1, qc)):
        zz = q.reshape(64)[ZIGZAG]                   # store in zigzag order
        seg(0xDB, bytes([tq]) + bytes(int(x) for x in zz))
    seg(0xC0, bytes([8]) + struct.pack(">HH", height, width) + bytes([3])
        + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    for tc, th, (bits, vals) in ((0, 0, HUFF_DC_LUMA), (0, 1, HUFF_DC_CHROMA),
                                 (1, 0, HUFF_AC_LUMA), (1, 1, HUFF_AC_CHROMA)):
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
            + bytes(vals))
    seg(0xDA, bytes([3]) + bytes([1, 0x00]) + bytes([2, 0x11])
        + bytes([3, 0x11]) + bytes([0, 63, 0]))

    enc_dc = [_build_encode_table(*HUFF_DC_LUMA),
              _build_encode_table(*HUFF_DC_CHROMA)]
    enc_ac = [_build_encode_table(*HUFF_AC_LUMA),
              _build_encode_table(*HUFF_AC_CHROMA)]
    A, AT = _DCT_A, _DCT_A.T
    bw = _BitWriter()
    preds = [0, 0, 0]
    by_comp = ((Y, ql, 0), (Cb, qc, 1), (Cr, qc, 1))
    for my in range(-(-height // 8)):
        for mx in range(-(-width // 8)):
            for ci, (plane, q, tab) in enumerate(by_comp):
                blk = np.full((8, 8), plane[min(my * 8, height - 1),
                                            min(mx * 8, width - 1)])
                ys = plane[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                blk[:ys.shape[0], :ys.shape[1]] = ys
                coef = A @ (blk - 128.0) @ AT
                qz = np.rint(coef / q).astype(np.int64)
                preds[ci] = _encode_block(bw, qz.reshape(64)[ZIGZAG],
                                          preds[ci], enc_dc[tab],
                                          enc_ac[tab])
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")                          # EOI
    return bytes(out)


def jpg_to_png(payload: bytes) -> bytes:
    """The reference's dealWithImages JPG -> PNG conversion, pure
    stdlib+numpy (MedicalReportSegmenterParser.java:176-206)."""
    return encode_png(*decode_jpeg(payload))
