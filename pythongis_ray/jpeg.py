"""JPEG codec — pure struct+numpy, no PIL.

Clean-room implementation of ITU-T T.81: baseline sequential DCT
(SOF0) AND progressive (SOF2 — spectral selection + successive
approximation, the dominant web encoding) with the Annex K example
quantization/Huffman tables on the encode side; the decoder reads
whatever DQT/DHT tables the stream carries (16-bit-peek LUT Huffman
decode, memoized), supports gray + YCbCr with 4:4:4 / 4:2:2 / 4:2:0
chroma subsampling, and restart intervals (DRI / RSTn) in both
directions. The progressive encoder exists chiefly so the progressive
decoder is provable in this container: progressive decode of the same
image is asserted BIT-IDENTICAL to baseline decode (same quantized
coefficients through a completely different scan structure).

Parity target: the reference loads .jpg rasters through PIL
(``/root/reference/pythongis/raster/loader.py:236-334``) and georefs
them from .jgw/.wld world files (loader.py:39-86); this module is the
codec behind the same capability here (see ``raster.read_jpg``) and
the REAL image-decode kernel for multimodal JPEG payloads.

All table constants below are the public example tables from
ITU-T T.81 Annex K (also shipped by every libjpeg).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

# --- ITU-T T.81 Annex K example tables -------------------------------

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32).reshape(8, 8)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32).reshape(8, 8)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int64)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# orthonormal 8-point DCT-II basis: forward F = T f T', inverse f = T' F T
_T = np.array([[(np.sqrt(1 / 8) if k == 0 else 0.5)
                * np.cos((2 * n + 1) * k * np.pi / 16)
                for n in range(8)] for k in range(8)])


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base quantization table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) → {symbol: (code, length)} canonical Huffman."""
    out = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DECODE_TABLE_CACHE: dict = {}


def _decode_table(bits, vals):
    """(BITS, HUFFVAL) → one 16-bit-peek lookup list: entry i packs
    ``(symbol << 8) | code_length`` for the canonical code prefixing
    the 16-bit window i (the classic libjpeg fast-decode table;
    length 0 marks an invalid prefix). Python-list entries index ~5×
    faster than numpy scalars in the per-symbol hot loop; tables are
    memoized — web corpora reuse the same handful of Huffman specs."""
    key = (tuple(bits), tuple(vals))
    hit = _DECODE_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    lut = np.zeros(1 << 16, np.int32)
    for sym, (code, ln) in _canonical_codes(bits, vals).items():
        lo = code << (16 - ln)
        hi = (code + 1) << (16 - ln)
        lut[lo:hi] = (sym << 8) | ln
    lut = lut.tolist()
    if len(_DECODE_TABLE_CACHE) < 64:      # bound worker-side memory
        _DECODE_TABLE_CACHE[key] = lut
    return lut


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)      # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # pad with 1s


def _magnitude(v: int):
    """JPEG magnitude category + amplitude bits for a coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _rgb_to_ycbcr(px: np.ndarray):
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) → (n, 8, 8) blocks in
    raster block order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _prepare_coef(px: np.ndarray, quality: int, subsampling: str):
    """Shared forward path: pad → (downsampled) planes → DCT →
    quantize. Returns zigzag-order coefficients per component:
    (zigcoef[(nblocks, 64)], samp, bdims, qtabs, gray, h, w,
    mcux, mcuy)."""
    px = np.asarray(px, np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
    else:
        planes = list(_rgb_to_ycbcr(px))
        lh, lv = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
        samp = [(lh, lv), (1, 1), (1, 1)]
    qtabs = [_scaled_quant(_QUANT_LUMA, quality)]
    if not gray:
        qtabs.append(_scaled_quant(_QUANT_CHROMA, quality))

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad to a full MCU grid by edge replication, downsample chroma
    ph, pw = mcuy * 8 * vmax, mcux * 8 * hmax
    zigcoef, bdims = [], []
    for ci, plane in enumerate(planes):
        p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        sh, sv = samp[ci]
        ry, rx = vmax // sv, hmax // sh
        if ry > 1 or rx > 1:                       # box-mean downsample
            p = p.reshape(p.shape[0] // ry, ry,
                          p.shape[1] // rx, rx).mean(axis=(1, 3))
        p = p - 128.0
        blocks = _blocks_of(p)
        f = np.einsum("ij,njk,lk->nil", _T, blocks, _T)
        q = qtabs[min(ci, len(qtabs) - 1)]
        c = np.round(f / q).astype(np.int64).reshape(-1, 64)
        zigcoef.append(c[:, ZIGZAG])               # zigzag order
        bdims.append((p.shape[0] // 8, p.shape[1] // 8))
    return zigcoef, samp, bdims, qtabs, gray, h, w, mcux, mcuy


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
        + payload


def _frame_headers(qtabs, samp, gray: bool, h: int, w: int,
                   sof_marker: int, restart_interval: int) -> list:
    """SOI → JFIF → DQT(s) → SOF → DHT(s) → optional DRI."""
    out = [b"\xff\xd8"]                            # SOI
    out.append(_seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    for ti, q in enumerate(qtabs):
        out.append(_seg(0xDB, bytes([ti])
                        + bytes(q.reshape(64)[ZIGZAG].astype(np.uint8))))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, min(ci, 1)])
    out.append(_seg(sof_marker, sof))
    for cls, tid, bits, vals in (
            (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
            (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
            (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)):
        if gray and tid == 1:
            continue
        out.append(_seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                        + bytes(vals)))
    if restart_interval:
        out.append(_seg(0xDD, struct.pack(">H", restart_interval)))
    return out


def encode_jpeg_bytes(px: np.ndarray, quality: int = 90,
                      subsampling: str = "444",
                      restart_interval: int = 0) -> bytes:
    """uint8 image → baseline JFIF JPEG bytes. ``px`` is (h, w) gray
    or (h, w, 3) RGB (YCbCr). ``subsampling`` is ``"444"``, ``"422"``
    or ``"420"`` (chroma downsampled by box mean, the web default).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (what camera/web encoders do for error resilience).
    Annex K tables scaled by IJG ``quality``."""
    zigcoef, samp, bdims, qtabs, gray, h, w, mcux, mcuy = \
        _prepare_coef(px, quality, subsampling)

    dc_enc = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
              _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_enc = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
              _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    bw = _BitWriter()
    prev_dc = [0] * len(zigcoef)

    def put_block(ci: int, zig):
        t = min(ci, 1)
        diff = int(zig[0]) - prev_dc[ci]
        prev_dc[ci] = int(zig[0])
        s, amp = _magnitude(diff)
        code, ln = dc_enc[t][s]
        bw.write(code, ln)
        if s:
            bw.write(amp, s)
        run = 0
        nz = np.flatnonzero(zig[1:])
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zig[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_enc[t][0xF0]        # ZRL
                bw.write(code, ln)
                run -= 16
            s, amp = _magnitude(v)
            code, ln = ac_enc[t][(run << 4) | s]
            bw.write(code, ln)
            bw.write(amp, s)
            run = 0
        if last < 63:
            code, ln = ac_enc[t][0x00]            # EOB
            bw.write(code, ln)

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()                         # pad to byte boundary
                bw.out += bytes([0xFF, 0xD0 + ((mcu_count
                                                // restart_interval - 1)
                                               & 7)])
                prev_dc = [0] * len(zigcoef)
            mcu_count += 1
            for ci in range(len(zigcoef)):
                sh, sv = samp[ci]
                bwid = bdims[ci][1]
                for bi in range(sv):
                    for bj in range(sh):
                        bidx = (my * sv + bi) * bwid + (mx * sh + bj)
                        put_block(ci, zigcoef[ci][bidx])
    bw.flush()

    out = _frame_headers(qtabs, samp, gray, h, w, 0xC0, restart_interval)
    ncomp = 1 if gray else 3
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = min(ci, 1)
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out.append(_seg(0xDA, sos))
    out.append(bytes(bw.out))
    out.append(b"\xff\xd9")                        # EOI
    return b"".join(out)


def encode_jpeg_progressive_bytes(px: np.ndarray, quality: int = 90,
                                  subsampling: str = "444") -> bytes:
    """uint8 image → progressive JFIF JPEG bytes (SOF2) with a
    successive-approximation scan script (DC first Al=1 → AC bands
    Al=1 → DC refine → AC refines), per T.81 G.1. EOB runs are
    flushed per block (always EOB0) so the Annex K AC tables — which
    lack the EOBn (n>0) symbols — suffice."""
    zigcoef, samp, bdims, qtabs, gray, h, w, mcux, mcuy = \
        _prepare_coef(px, quality, subsampling)
    ncomp = len(zigcoef)
    dc_enc = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
              _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_enc = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
              _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    def dc_first_scan(bw, al):
        prev = [0] * ncomp
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    sh, sv = samp[ci]
                    bwid = bdims[ci][1]
                    for bi in range(sv):
                        for bj in range(sh):
                            bidx = (my * sv + bi) * bwid + mx * sh + bj
                            dc = int(zigcoef[ci][bidx][0]) >> al
                            diff = dc - prev[ci]
                            prev[ci] = dc
                            s, amp = _magnitude(diff)
                            code, ln = dc_enc[min(ci, 1)][s]
                            bw.write(code, ln)
                            if s:
                                bw.write(amp, s)

    def dc_refine_scan(bw, al):
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    sh, sv = samp[ci]
                    bwid = bdims[ci][1]
                    for bi in range(sv):
                        for bj in range(sh):
                            bidx = (my * sv + bi) * bwid + mx * sh + bj
                            bw.write((int(zigcoef[ci][bidx][0]) >> al) & 1,
                                     1)

    def _pt(v: int, al: int) -> int:
        """AC point transform: divide by 2^al toward zero (G.1.2.2)."""
        return -((-v) >> al) if v < 0 else v >> al

    def ac_first_scan(bw, ci, ss, se, al):
        enc = ac_enc[min(ci, 1)]
        c = zigcoef[ci]
        # iterate the component's own (non-interleaved) block grid
        cw = -(-(w * samp[ci][0]) // max(s[0] for s in samp))
        ch = -(-(h * samp[ci][1]) // max(s[1] for s in samp))
        nbw, nbh = -(-cw // 8), -(-ch // 8)
        bwid = bdims[ci][1]
        for by in range(nbh):
            for bx in range(nbw):
                zig = c[by * bwid + bx]
                run = 0
                emitted = False
                for k in range(ss, se + 1):
                    v = _pt(int(zig[k]), al)
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = enc[0xF0]      # ZRL
                        bw.write(code, ln)
                        run -= 16
                    s, amp = _magnitude(v)
                    code, ln = enc[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(amp, s)
                    run = 0
                    emitted = True
                if run > 0 or not emitted:
                    code, ln = enc[0x00]          # EOB0 (run of 1)
                    bw.write(code, ln)

    def ac_refine_scan(bw, ci, ss, se, ah, al):
        enc = ac_enc[min(ci, 1)]
        c = zigcoef[ci]
        cw = -(-(w * samp[ci][0]) // max(s[0] for s in samp))
        ch = -(-(h * samp[ci][1]) // max(s[1] for s in samp))
        nbw, nbh = -(-cw // 8), -(-ch // 8)
        bwid = bdims[ci][1]
        for by in range(nbh):
            for bx in range(nbw):
                zig = c[by * bwid + bx]
                absval = [_pt(abs(int(zig[k])), al) for k in range(64)]
                eob = 0                            # last newly-nonzero k
                for k in range(ss, se + 1):
                    if absval[k] == 1:
                        eob = k
                run = 0
                pending = []                       # buffered corr. bits
                for k in range(ss, se + 1):
                    t = absval[k]
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and k <= eob:
                        code, ln = enc[0xF0]      # ZRL + its history bits
                        bw.write(code, ln)
                        run -= 16
                        for b in pending:
                            bw.write(b, 1)
                        pending = []
                    if t > 1:                      # history: buffer LSB
                        pending.append(t & 1)
                        continue
                    # newly nonzero (t == 1): runlength + sign bit
                    code, ln = enc[(run << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if int(zig[k]) > 0 else 0, 1)
                    for b in pending:
                        bw.write(b, 1)
                    pending = []
                    run = 0
                if run > 0 or pending:             # EOB0 + remaining bits
                    code, ln = enc[0x00]
                    bw.write(code, ln)
                    for b in pending:
                        bw.write(b, 1)

    def scan_seg(comp_ids, ss, se, ah, al):
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            t = min(cid - 1, 1)
            sos += bytes([cid, (t << 4) | t])
        sos += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, sos)

    out = _frame_headers(qtabs, samp, gray, h, w, 0xC2, 0)
    all_ids = list(range(1, ncomp + 1))

    def run_scan(header, emit):
        out.append(header)
        bw = _BitWriter()
        emit(bw)
        bw.flush()
        out.append(bytes(bw.out))

    run_scan(scan_seg(all_ids, 0, 0, 0, 1), lambda bw: dc_first_scan(bw, 1))
    run_scan(scan_seg([1], 1, 5, 0, 1),
             lambda bw: ac_first_scan(bw, 0, 1, 5, 1))
    run_scan(scan_seg([1], 6, 63, 0, 1),
             lambda bw: ac_first_scan(bw, 0, 6, 63, 1))
    for cid in all_ids[1:]:
        run_scan(scan_seg([cid], 1, 63, 0, 1),
                 lambda bw, ci=cid - 1: ac_first_scan(bw, ci, 1, 63, 1))
    run_scan(scan_seg(all_ids, 0, 0, 1, 0), lambda bw: dc_refine_scan(bw, 0))
    for cid in all_ids:
        run_scan(scan_seg([cid], 1, 63, 1, 0),
                 lambda bw, ci=cid - 1: ac_refine_scan(bw, ci, 1, 63, 1, 0))
    out.append(b"\xff\xd9")                        # EOI
    return b"".join(out)




class _BitReader:
    """MSB-first bit reader over destuffed scan bytes with an int
    accumulator (refilled 8 bytes at a time) and table-driven Huffman
    decode — a valid stream never reads meaningfully past its end, so
    the off-the-end refill pads with 1s (T.81 padding)."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data):
        self.data = bytes(data)
        self.pos = 0                       # next refill byte
        self.acc = 0
        self.n = 0                         # bits held in acc

    def _refill(self, need: int):
        while self.n < need:
            chunk = self.data[self.pos:self.pos + 8]
            if chunk:
                self.acc = ((self.acc << (8 * len(chunk)))
                            | int.from_bytes(chunk, "big"))
                self.n += 8 * len(chunk)
                self.pos += len(chunk)
            else:                          # pad past end with 1s
                self.acc = (self.acc << 16) | 0xFFFF
                self.n += 16
        self.acc &= (1 << self.n) - 1

    def read_bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._refill(k)
        self.n -= k
        return (self.acc >> self.n) & ((1 << k) - 1)

    def read_bit(self) -> int:
        if self.n < 1:
            self._refill(1)
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_symbol(self, table) -> int:
        if self.n < 16:
            self._refill(16)
        e = table[(self.acc >> (self.n - 16)) & 0xFFFF]
        ln = e & 0xFF
        if ln == 0:
            raise ValueError("bad Huffman code in scan")
        self.n -= ln
        return e >> 8

    def align_byte(self):
        """Drop to the next byte boundary (restart-marker re-sync)."""
        self.n -= self.n % 8


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: amplitude bits → signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _find_scan_end(data: bytes, start: int) -> int:
    """First marker position after ``start`` that is not a stuffed 00
    or an RSTn — i.e. the end of one scan's entropy-coded segment."""
    pos, n = start, len(data)
    while pos < n - 1:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _destuff(data: bytes, start: int, end: int) -> np.ndarray:
    """Entropy bytes [start, end) with stuffed 00s and RSTn markers
    removed (restart boundaries are byte-aligned, so the reader just
    re-aligns at each restart)."""
    raw = np.frombuffer(data, np.uint8, end - start, start)
    keep = np.ones(len(raw), bool)
    is_ff = raw == 0xFF
    nxt = np.r_[raw[1:], np.uint8(0)]
    keep[1:][is_ff[:-1] & (nxt[:-1] == 0x00)] = False   # stuffed 00
    rst_pos = np.flatnonzero(is_ff & (nxt >= 0xD0) & (nxt <= 0xD7))
    keep[rst_pos] = False
    keep[np.minimum(rst_pos + 1, len(raw) - 1)] = False
    return raw[keep]


class _Scan:
    """One SOS scan: member comps + spectral/approximation params."""

    __slots__ = ("comps", "ss", "se", "ah", "al")

    def __init__(self, comps, ss, se, ah, al):
        self.comps = comps
        self.ss = ss
        self.se = se
        self.ah = ah
        self.al = al


def _scan_blocks(scan, comps, mcux, mcuy):
    """Yield (component, block_index) in this scan's MCU order with
    restart-boundary flags: (comp, bidx, is_mcu_start).

    Interleaved (len > 1): T.81 A.2.3 — per MCU, each comp emits its
    v*h blocks from the MCU-padded grid. Non-interleaved: the single
    comp's OWN block grid (ceil(cw/8) x ceil(ch/8)), T.81 A.2.2."""
    if len(scan.comps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                first = True
                for c in scan.comps:
                    for bi in range(c["v"]):
                        for bj in range(c["h"]):
                            bidx = ((my * c["v"] + bi) * c["bw"]
                                    + mx * c["h"] + bj)
                            yield c, bidx, first
                            first = False
    else:
        c = scan.comps[0]
        for by in range(c["nbh"]):
            for bx in range(c["nbw"]):
                yield c, by * c["bw"] + bx, True


def _decode_scan(br, scan, comps, htabs, mcux, mcuy, restart_interval):
    """Decode one entropy-coded scan into the comps' zigzag-order
    coefficient arrays. Handles sequential (full-block) and all four
    progressive scan kinds (DC/AC x first/refine), per T.81 F.2 / G.2
    (the AC-refinement control flow follows the published libjpeg
    decode_mcu_AC_refine structure)."""
    sequential = scan.ss == 0 and scan.se == 63
    prev_dc = {c["id"]: 0 for c in comps}
    eobrun = 0
    p1 = 1 << scan.al
    m1 = -p1
    mcu_count = 0
    for c, bidx, is_start in _scan_blocks(scan, comps, mcux, mcuy):
        if is_start:
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                # RSTn bytes are already removed from the destuffed
                # stream; the segment before each was byte-aligned
                br.align_byte()
                prev_dc = {cc["id"]: 0 for cc in comps}
                eobrun = 0
            mcu_count += 1
        blk = c["coef"][bidx]
        if sequential:
            # build the block as a Python list (scalar numpy writes
            # are ~10× slower than list ops in this hot loop)
            dct = htabs[(0, c["td"])]
            act = htabs[(1, c["ta"])]
            s = br.read_symbol(dct)
            diff = _extend(br.read_bits(s), s) if s else 0
            prev_dc[c["id"]] += diff
            lst = [0] * 64
            lst[0] = prev_dc[c["id"]]
            k = 1
            while k < 64:
                sym = br.read_symbol(act)
                if sym == 0x00:                    # EOB
                    break
                run, size = sym >> 4, sym & 15
                if size == 0:
                    if run == 15:                  # ZRL
                        k += 16
                        continue
                    break
                k += run
                if k > 63:
                    raise ValueError("AC index overflow")
                lst[k] = _extend(br.read_bits(size), size)
                k += 1
            blk[:] = lst
        elif scan.ss == 0:                         # progressive DC
            if scan.ah == 0:                       # first
                s = br.read_symbol(htabs[(0, c["td"])])
                diff = _extend(br.read_bits(s), s) if s else 0
                prev_dc[c["id"]] += diff
                blk[0] = prev_dc[c["id"]] << scan.al
            else:                                  # refine: 1 bit
                if br.read_bit():
                    blk[0] |= p1
        elif scan.ah == 0:                         # progressive AC first
            if eobrun > 0:
                eobrun -= 1
                continue
            act = htabs[(1, c["ta"])]
            k = scan.ss
            while k <= scan.se:
                sym = br.read_symbol(act)
                r, s = sym >> 4, sym & 15
                if s == 0:
                    if r != 15:                    # EOBn
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.read_bits(r)
                        break
                    k += 16                        # ZRL
                    continue
                k += r
                if k > scan.se:
                    raise ValueError("AC index overflow")
                blk[k] = _extend(br.read_bits(s), s) << scan.al
                k += 1
        else:                                      # progressive AC refine
            # the band segment as a Python list: this scan reads every
            # coefficient position, where scalar numpy access dominates
            act = htabs[(1, c["ta"])]
            seg = blk[scan.ss:scan.se + 1].tolist()
            L = len(seg)
            k = 0
            if eobrun == 0:
                while k < L:
                    sym = br.read_symbol(act)
                    r, s = sym >> 4, sym & 15
                    if s == 0:
                        if r != 15:                # EOBn
                            eobrun = 1 << r
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        # r == 15: pass over 16 zero-history coefs
                    else:
                        s = p1 if br.read_bit() else m1
                    while k < L:                   # advance r zeros,
                        v = seg[k]                 # correcting nonzeros
                        if v != 0:
                            if br.read_bit() and not (v & p1):
                                seg[k] = v + (p1 if v >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if s and k < L:
                        seg[k] = s
                    k += 1
            if eobrun > 0:                         # EOB band: correct
                while k < L:                       # remaining nonzeros
                    v = seg[k]
                    if v != 0:
                        if br.read_bit() and not (v & p1):
                            seg[k] = v + (p1 if v >= 0 else m1)
                    k += 1
                eobrun -= 1
            blk[scan.ss:scan.se + 1] = seg


def decode_jpeg_bytes(data: bytes) -> np.ndarray:
    """JPEG bytes → (h, w, channels) uint8 (1 = gray, 3 = RGB).
    Supports baseline sequential (SOF0/1) AND progressive (SOF2 —
    spectral selection + successive approximation, the dominant web
    encoding), DRI restart intervals, 4:4:4 / 4:2:2 / 4:2:0 chroma."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs = {}
    htabs = {}
    comps = None
    h = w = 0
    restart_interval = 0
    hmax = vmax = 1
    mcux = mcuy = 0
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xD9:                         # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:                         # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 15
                if pq == 0:
                    vals = np.frombuffer(body, np.uint8, 64, bpos + 1) \
                        .astype(np.int32)
                    bpos += 65
                else:                              # 16-bit table
                    vals = np.frombuffer(body, ">u2", 64, bpos + 1) \
                        .astype(np.int32)
                    bpos += 129
                qtabs[tq] = vals.copy()            # zigzag order
        elif marker == 0xC4:                       # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 15
                bits = list(body[bpos + 1:bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17:bpos + 17 + nv])
                htabs[(tc, th)] = _decode_table(bits, vals)
                bpos += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):         # SOF0/1/2
            h, w = struct.unpack_from(">HH", body, 1)
            from pythongis_ray.raster import check_decode_dims
            check_decode_dims(w, h, "JPEG")
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcux * c["h"]            # MCU-padded grid
                c["bh"] = mcuy * c["v"]
                cw = -(-(w * c["h"]) // hmax)      # true comp size
                ch = -(-(h * c["v"]) // vmax)
                c["nbw"] = -(-cw // 8)             # non-interleaved grid
                c["nbh"] = -(-ch // 8)
                c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline + progressive")
        elif marker == 0xDD:                       # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                       # SOS
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            by_id = {c["id"]: c for c in comps}
            scomps = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si:3 + 2 * si]
                c = by_id[cs]
                c["td"], c["ta"] = tt >> 4, tt & 15
                scomps.append(c)
            ss, se, ahl = body[1 + 2 * ns:4 + 2 * ns]
            scan = _Scan(scomps, ss, se, ahl >> 4, ahl & 15)
            entropy_start = pos + 2 + seglen
            entropy_end = _find_scan_end(data, entropy_start)
            br = _BitReader(_destuff(data, entropy_start, entropy_end))
            _decode_scan(br, scan, comps, htabs, mcux, mcuy,
                         restart_interval)
            pos = entropy_end
            continue
        pos += 2 + seglen
    if comps is None:
        raise ValueError("JPEG missing SOF")

    planes = []
    zz = ZIGZAG
    for c in comps:
        q = qtabs[c["tq"]].astype(np.float64)      # zigzag order
        f = np.zeros((c["coef"].shape[0], 64), np.float64)
        f[:, zz] = c["coef"] * q                   # dezigzag + dequant
        f = f.reshape(-1, 8, 8)
        blocks = np.einsum("ji,njk,kl->nil", _T, f, _T)   # inverse DCT
        plane = (blocks.reshape(c["bh"], c["bw"], 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c["bh"] * 8, c["bw"] * 8)) + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:                       # chroma upsample
            plane = np.repeat(np.repeat(plane, ry, 0), rx, 1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
