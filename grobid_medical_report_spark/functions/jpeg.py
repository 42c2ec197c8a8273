"""Baseline + progressive JPEG codec in pure stdlib + numpy (no
PIL/libjpeg).

Completes the reference's asset conversion (``dealWithImages``: JPG/PPM ->
PNG, MedicalReportSegmenterParser.java:176-206): the PPM half lives in
functions/media.py; this module supplies the JPG half.

Decoder: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2, r4 —
VERDICT r3 item 7): spectral selection, successive approximation (DC and
AC first/refinement passes, EOBn run codes per T.81 G.1.2), interleaved
DC scans + non-interleaved AC scans with component-scaled geometry,
Huffman entropy coding, 8-bit, 1 or 3 components, sampling factors 1-2
(4:4:4 / 4:2:2 / 4:2:0), restart markers (DRI/RSTn). Arithmetic coding
and hierarchical/lossless modes raise ``MediaFormatError``.

Encoder: minimal writer used to synthesize deterministic test streams —
baseline 4:4:4 with ITU T.81 Annex K quantization + Huffman tables (the
spec's own example tables, public), plus a progressive mode emitting the
standard scan script (interleaved DC first/refine, per-component AC
spectral bands with successive approximation and genuine EOB runs).
Progressive and baseline encodings of the same image carry IDENTICAL
coefficients, so the decoder outputs must match byte-for-byte — that
equality is the progressive round-trip test (tests/test_media_jpeg.py).

All DCT math is numpy (the 8x8 orthonormal DCT-II matrix) — one matmul
(or einsum batch) per block, no Python-per-pixel loops.
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
    store = None          # progressive coefficient store (comp id -> array)
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
        elif marker in (0xC0, 0xC1, 0xC2):          # SOF0/1 baseline, SOF2
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
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise MediaFormatError(
                f"unsupported JPEG process (SOF{marker - 0xC0})")
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
            if not frame["progressive"]:
                return _decode_scan(payload, data_start, frame, scan, quant,
                                    huff_dc, huff_ac, restart_interval)
            # progressive: parse spectral/approximation params, decode this
            # scan into the coefficient store, continue at the next marker
            if len(body) < 1 + 2 * ns + 3:
                raise MediaFormatError("truncated progressive SOS params")
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if store is None:
                store = _init_store(frame)
            pos = _progressive_scan(payload, data_start, frame, scan,
                                    store, huff_dc, huff_ac,
                                    restart_interval, ss, se, ah, al)
            continue
        pos += seglen
    if frame is not None and frame.get("progressive") and store is not None:
        return _reconstruct_progressive(frame, store, quant)
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
# progressive decoding (SOF2, r4): per-scan coefficient accumulation with
# spectral selection + successive approximation (T.81 G.1.2; the AC
# refinement pass follows the standard correction-bit algorithm), then one
# vectorized dequant+IDCT reconstruction at EOI
# --------------------------------------------------------------------------

def _frame_geometry(frame):
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _init_store(frame):
    """Per-component natural-order coefficient arrays on the padded
    interleaved block grid (blocks_y, blocks_x, 64)."""
    _hmax, _vmax, mcux, mcuy = _frame_geometry(frame)
    return {c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                              dtype=np.int32)
            for c in frame["comps"]}


def _nonint_blocks(frame, c):
    """Non-interleaved (Ns=1) data-unit grid: component-scaled dimensions
    per T.81 A.2.2 — ceil(comp_size / 8) in each direction."""
    hmax, vmax, _mx, _my = _frame_geometry(frame)
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _progressive_scan(payload, pos, frame, scan, store, huff_dc, huff_ac,
                      restart_interval, ss, se, ah, al):
    """Decode one progressive scan into ``store``; returns the payload
    position of the next marker after the entropy-coded segment."""
    if not (0 <= ss <= se <= 63) or al > 13 or ah > 13:
        raise MediaFormatError("bad progressive scan parameters")
    if ss == 0 and se != 0:
        raise MediaFormatError("progressive scan mixing DC and AC")
    if ss > 0 and len(scan) != 1:
        raise MediaFormatError("progressive AC scan must be Ns=1")
    br = _BitReader(payload, pos)
    state = {"eobrun": 0, "pred": {c["id"]: 0 for c in scan}}

    def restart():
        br.align_restart()
        state["eobrun"] = 0
        state["pred"] = {c["id"]: 0 for c in scan}

    if ss == 0:
        # ---- DC scan (interleaved over the frame MCU grid, or Ns=1) ----
        _hmax, _vmax, mcux, mcuy = _frame_geometry(frame)
        if len(scan) == 1:
            nbh, nbw = _nonint_blocks(frame, scan[0])
            units = [(scan[0], by, bx) for by in range(nbh)
                     for bx in range(nbw)]
            groups = [[u] for u in units]
        else:
            groups = []
            for my in range(mcuy):
                for mx in range(mcux):
                    g = []
                    for c in scan:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                g.append((c, my * c["v"] + by,
                                          mx * c["h"] + bx))
                    groups.append(g)
        count = 0
        for g in groups:
            if restart_interval and count and count % restart_interval == 0:
                restart()
            count += 1
            for c, by, bx in g:
                coef = store[c["id"]][by, bx]
                if ah == 0:                      # DC first pass
                    t = br.decode_huff(huff_dc[c["dc"]])
                    diff = _extend(br.receive(t), t)
                    state["pred"][c["id"]] += diff
                    coef[0] = state["pred"][c["id"]] << al
                else:                            # DC refinement: one bit
                    if br.read_bit():
                        coef[0] |= 1 << al
    else:
        # ---- AC scan (always non-interleaved) ---------------------------
        c = scan[0]
        act = huff_ac[c["ac"]]
        nbh, nbw = _nonint_blocks(frame, c)
        count = 0
        for by in range(nbh):
            for bx in range(nbw):
                if restart_interval and count \
                        and count % restart_interval == 0:
                    restart()
                count += 1
                coef = store[c["id"]][by, bx]
                if ah == 0:
                    _ac_first_block(br, act, coef, ss, se, al, state)
                else:
                    _ac_refine_block(br, act, coef, ss, se, al, state)
    # advance to the next marker (skip stuffed FF00 and RSTn)
    p = br.pos
    d = payload
    while p + 1 < len(d):
        if d[p] == 0xFF and d[p + 1] not in (0x00,) \
                and not (0xD0 <= d[p + 1] <= 0xD7):
            return p
        p += 1
    raise MediaFormatError("no marker after progressive scan")


def _ac_first_block(br, act, coef, ss, se, al, state):
    """AC first pass (T.81 G.1.2.2): spectral band ss..se, values shifted
    left by ``al``; EOBn codes start a run of end-of-band blocks."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = br.decode_huff(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                state["eobrun"] = (1 << r) - 1      # this block included
                if r:
                    state["eobrun"] += br.receive(r)
                break
            k += 16                                  # ZRL
            continue
        k += r
        if k > se:
            raise MediaFormatError("AC index overflow in band")
        coef[ZIGZAG[k]] = _extend(br.receive(s), s) << al
        k += 1


def _ac_refine_block(br, act, coef, ss, se, al, state):
    """AC refinement pass (T.81 G.1.2.3): correction bits for
    already-nonzero coefficients, newly-significant ±1<<al insertions,
    EOBn runs still refine history coefficients."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = br.decode_huff(act)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r)      # this block decremented below
                    if r:
                        state["eobrun"] += br.receive(r)
                    break
                # r == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise MediaFormatError("AC refinement size must be 1")
                newval = p1 if br.read_bit() else m1
            while k <= se:
                z = int(ZIGZAG[k])
                if coef[z] != 0:
                    if br.read_bit() and (coef[z] & p1) == 0:
                        coef[z] += p1 if coef[z] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise MediaFormatError("AC refinement index overflow")
                coef[int(ZIGZAG[k])] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            z = int(ZIGZAG[k])
            if coef[z] != 0 and br.read_bit() and (coef[z] & p1) == 0:
                coef[z] += p1 if coef[z] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _reconstruct_progressive(frame, store, quant):
    """Dequantize + IDCT all accumulated coefficients (vectorized einsum
    over the whole block grid), then the shared upsample/color path."""
    w, h = frame["w"], frame["h"]
    hmax, vmax, _mx, _my = _frame_geometry(frame)
    A, AT = _DCT_A, _DCT_A.T
    full = []
    for c in frame["comps"]:
        q = quant[c["tq"]]
        blocks = store[c["id"]].astype(np.float64).reshape(
            store[c["id"]].shape[0], store[c["id"]].shape[1], 8, 8) * q
        px = np.einsum("ab,yxbc,cd->yxad", AT, blocks, A) + 128.0
        by, bx = px.shape[0], px.shape[1]
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        if c["h"] < hmax or c["v"] < vmax:
            plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                              hmax // c["h"], axis=1)
        full.append(plane[:h, :w])
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
        raise MediaFormatError(f"{len(full)}-component frame unsupported")
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


#: fixed (deliberately simple) Huffman table for progressive AC scans:
#: every (run, size) symbol with size 1..10 plus all EOBn/ZRL codes gets an
#: 8-bit code — 176 of 256 slots, a valid (incomplete) canonical prefix
#: code. Wasteful on purpose; the decoder treats it like any DHT.
_PROG_AC_SYMBOLS = [(r << 4) | s for r in range(16) for s in range(1, 11)] \
    + [r << 4 for r in range(16)]
_PROG_AC_TABLE = ([0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMBOLS),
                   0, 0, 0, 0, 0, 0, 0, 0], _PROG_AC_SYMBOLS)


class _ProgACWriter:
    """AC-scan emission state: EOB-run accumulation + buffered correction
    bits (refinement), per T.81 G.1.3."""

    def __init__(self, bw, ac_tab):
        self.bw = bw
        self.ac = ac_tab
        self.eobrun = 0
        self.bits: list[int] = []      # pending refinement correction bits

    def flush_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, ln = self.ac[nbits << 4]
            self.bw.write(code, ln)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        self.flush_bits()

    def flush_bits(self):
        for b in self.bits:
            self.bw.write(b, 1)
        self.bits = []

    def ac_first(self, coef_zz, ss, se, al):
        r = 0
        for k in range(ss, se + 1):
            v = int(coef_zz[k])
            t = (abs(v)) >> al
            if t == 0:
                r += 1
                continue
            self.flush_eobrun()
            while r > 15:
                code, ln = self.ac[0xF0]
                self.bw.write(code, ln)
                r -= 16
            s, bits = _mag(t if v > 0 else -t)
            code, ln = self.ac[(r << 4) | s]
            self.bw.write(code, ln)
            self.bw.write(bits, s)
            r = 0
        if r:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    def ac_refine(self, coef_zz, ss, se, al):
        absvals = [abs(int(coef_zz[k])) >> al for k in range(64)]
        eob = ss - 1
        for k in range(ss, se + 1):
            if absvals[k] == 1:
                eob = k                   # last newly-significant position
        r = 0
        pending: list[int] = []
        for k in range(ss, se + 1):
            t = absvals[k]
            if t == 0:
                r += 1
                continue
            # long zero runs flush as ZRLs at ANY nonzero coefficient
            # (including history ones) — but not past the last new
            # significance, where they fold into the EOB run (T.81 G.1.3 /
            # the libjpeg encode_mcu_AC_refine structure; emitting the
            # whole bit buffer only at new-significance points desyncs
            # the decoder's per-ZRL correction-bit reads)
            while r > 15 and k <= eob:
                self.flush_eobrun()
                code, ln = self.ac[0xF0]
                self.bw.write(code, ln)
                r -= 16
                for b in pending:         # bits belonging to this ZRL span
                    self.bw.write(b, 1)
                pending = []
            if t > 1:                     # history coefficient: correction bit
                pending.append(t & 1)
                continue
            # newly significant (t == 1)
            self.flush_eobrun()
            code, ln = self.ac[(r << 4) | 1]
            self.bw.write(code, ln)
            self.bw.write(1 if int(coef_zz[k]) > 0 else 0, 1)
            for b in pending:
                self.bw.write(b, 1)
            pending = []
            r = 0
        if r or pending:
            self.eobrun += 1
            self.bits.extend(pending)
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()


def encode_jpeg(width: int, height: int, rgb: bytes,
                quality_flat: bool = True,
                progressive: bool = False) -> bytes:
    """Minimal 4:4:4 writer. ``quality_flat=True`` uses all-ones
    quantization (near-lossless, bounded only by DCT rounding); False uses
    the Annex K tables (visibly lossy, standard). ``progressive=True``
    emits SOF2 with the standard scan script — interleaved DC first
    (Al=1) + DC refinement, then per-component AC spectral bands 1-5 and
    6-63 at Al=1 followed by an AC refinement scan — carrying the SAME
    quantized coefficients as the baseline encoding, so both decode to
    identical pixels."""
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
    seg(0xC2 if progressive else 0xC0,
        bytes([8]) + struct.pack(">HH", height, width) + bytes([3])
        + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))

    A, AT = _DCT_A, _DCT_A.T
    by_comp = ((Y, ql, 0), (Cb, qc, 1), (Cr, qc, 1))
    nby, nbx = -(-height // 8), -(-width // 8)

    def coef_block(plane, q, my, mx):
        blk = np.full((8, 8), plane[min(my * 8, height - 1),
                                    min(mx * 8, width - 1)])
        ys = plane[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
        blk[:ys.shape[0], :ys.shape[1]] = ys
        coef = A @ (blk - 128.0) @ AT
        return np.rint(coef / q).astype(np.int64).reshape(64)[ZIGZAG]

    if not progressive:
        for tc, th, (bits, vals) in ((0, 0, HUFF_DC_LUMA),
                                     (0, 1, HUFF_DC_CHROMA),
                                     (1, 0, HUFF_AC_LUMA),
                                     (1, 1, HUFF_AC_CHROMA)):
            seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
        seg(0xDA, bytes([3]) + bytes([1, 0x00]) + bytes([2, 0x11])
            + bytes([3, 0x11]) + bytes([0, 63, 0]))
        enc_dc = [_build_encode_table(*HUFF_DC_LUMA),
                  _build_encode_table(*HUFF_DC_CHROMA)]
        enc_ac = [_build_encode_table(*HUFF_AC_LUMA),
                  _build_encode_table(*HUFF_AC_CHROMA)]
        bw = _BitWriter()
        preds = [0, 0, 0]
        for my in range(nby):
            for mx in range(nbx):
                for ci, (plane, q, tab) in enumerate(by_comp):
                    preds[ci] = _encode_block(
                        bw, coef_block(plane, q, my, mx), preds[ci],
                        enc_dc[tab], enc_ac[tab])
        bw.flush()
        out.extend(bw.out)
        out.extend(b"\xff\xd9")                      # EOI
        return bytes(out)

    # ---- progressive: materialize all coefficient blocks (zigzag order),
    # then emit the standard scan script -----------------------------------
    blocks = [np.stack([np.stack([coef_block(plane, q, my, mx)
                                  for mx in range(nbx)])
                        for my in range(nby)])
              for plane, q, _tab in by_comp]

    for tc, th, (bits, vals) in ((0, 0, HUFF_DC_LUMA),
                                 (0, 1, HUFF_DC_CHROMA),
                                 (1, 0, _PROG_AC_TABLE),
                                 (1, 1, _PROG_AC_TABLE)):
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    enc_dc = [_build_encode_table(*HUFF_DC_LUMA),
              _build_encode_table(*HUFF_DC_CHROMA)]
    enc_ac = _build_encode_table(*_PROG_AC_TABLE)

    def sos(comps_spec, ss, se, ah, al):
        body = bytes([len(comps_spec)])
        for cid, tdta in comps_spec:
            body += bytes([cid, tdta])
        seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def emit_entropy(bw):
        bw.flush()
        out.extend(bw.out)

    # scan 1: interleaved DC first, Al=1
    sos([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(nby):
        for mx in range(nbx):
            for ci, (_p, _q, tab) in enumerate(by_comp):
                v = int(blocks[ci][my, mx, 0]) >> 1
                t, bits = _mag(v - preds[ci])
                code, ln = enc_dc[tab][t]
                bw.write(code, ln)
                if t:
                    bw.write(bits, t)
                preds[ci] = v
    emit_entropy(bw)
    # scan 2: DC refinement, Al=0 (one raw bit per block)
    sos([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 1, 0)
    bw = _BitWriter()
    for my in range(nby):
        for mx in range(nbx):
            for ci in range(3):
                bw.write(int(blocks[ci][my, mx, 0]) & 1, 1)
    emit_entropy(bw)
    # scans 3-4: per-component AC spectral bands at Al=1 (first pass)
    for ss, se in ((1, 5), (6, 63)):
        for ci, cid in enumerate((1, 2, 3)):
            sos([(cid, 0x00)], ss, se, 0, 1)
            bw = _BitWriter()
            wr = _ProgACWriter(bw, enc_ac)
            for my in range(nby):
                for mx in range(nbx):
                    wr.ac_first(blocks[ci][my, mx], ss, se, 1)
            wr.flush_eobrun()
            emit_entropy(bw)
    # scan 5: per-component AC refinement to Al=0
    for ci, cid in enumerate((1, 2, 3)):
        sos([(cid, 0x00)], 1, 63, 1, 0)
        bw = _BitWriter()
        wr = _ProgACWriter(bw, enc_ac)
        for my in range(nby):
            for mx in range(nbx):
                wr.ac_refine(blocks[ci][my, mx], 1, 63, 0)
        wr.flush_eobrun()
        emit_entropy(bw)
    out.extend(b"\xff\xd9")                          # EOI
    return bytes(out)


def jpg_to_png(payload: bytes) -> bytes:
    """The reference's dealWithImages JPG -> PNG conversion, pure
    stdlib+numpy (MedicalReportSegmenterParser.java:176-206)."""
    return encode_png(*decode_jpeg(payload))
