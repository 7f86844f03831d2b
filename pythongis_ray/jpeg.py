"""Baseline JPEG codec — pure struct+numpy, no PIL.

Clean-room implementation of ITU-T T.81 baseline sequential DCT
(SOF0) with the Annex K example quantization/Huffman tables on the
encode side; the decoder reads whatever DQT/DHT tables the stream
carries, supports gray + YCbCr with 4:4:4 / 4:2:2 / 4:2:0 chroma
subsampling, and restart intervals (DRI / RSTn).

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


def _decode_table(bits, vals):
    """(BITS, HUFFVAL) → {(length, code): symbol} for the bit reader."""
    enc = _canonical_codes(bits, vals)
    return {(ln, cd): sym for sym, (cd, ln) in enc.items()}


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


def encode_jpeg_bytes(px: np.ndarray, quality: int = 90,
                      subsampling: str = "444") -> bytes:
    """uint8 image → baseline JFIF JPEG bytes. ``px`` is (h, w) gray
    or (h, w, 3) RGB (YCbCr). ``subsampling`` is ``"444"``, ``"422"``
    or ``"420"`` (chroma downsampled by box mean, the web default).
    Annex K tables scaled by IJG ``quality``."""
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
    coef, bdims = [], []
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
        coef.append(np.round(f / q).astype(np.int64))
        bdims.append((p.shape[0] // 8, p.shape[1] // 8))

    dc_enc = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
              _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_enc = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
              _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    bw = _BitWriter()
    prev_dc = [0] * len(planes)
    zz = ZIGZAG

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

    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(len(planes)):
                sh, sv = samp[ci]
                bwid = bdims[ci][1]
                for bi in range(sv):
                    for bj in range(sh):
                        bidx = (my * sv + bi) * bwid + (mx * sh + bj)
                        put_block(ci, coef[ci][bidx].reshape(64)[zz])
    bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
            + payload

    out = [b"\xff\xd8"]                            # SOI
    out.append(seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    for ti, q in enumerate(qtabs):
        out.append(seg(0xDB, bytes([ti])
                       + bytes(q.reshape(64)[zz].astype(np.uint8))))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, min(ci, 1)])
    out.append(seg(0xC0, sof))                     # SOF0 baseline
    for cls, tid, bits, vals in (
            (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
            (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
            (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)):
        if gray and tid == 1:
            continue
        out.append(seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                       + bytes(vals)))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = min(ci, 1)
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out.append(seg(0xDA, sos))
    out.append(bytes(bw.out))
    out.append(b"\xff\xd9")                        # EOI
    return b"".join(out)


class _BitReader:
    """MSB-first bit reader over destuffed scan bytes."""

    def __init__(self, data: np.ndarray):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        b = (int(self.data[self.pos]) >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table) -> int:
        code, ln = 0, 0
        while ln < 17:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code in scan")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: amplitude bits → signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_bytes(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, channels) uint8 (1 = gray, 3 = RGB).
    Supports SOF0, DRI restart intervals, 4:4:4 / 4:2:2 / 4:2:0."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs = {}
    htabs = {}
    comps = None
    h = w = 0
    restart_interval = 0
    scan_comps = None
    scan_start = None
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
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
                q = np.zeros(64, np.int32)
                q[ZIGZAG] = vals
                qtabs[tq] = q.reshape(8, 8)
        elif marker == 0xC4:                       # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 15
                bits = list(body[bpos + 1:bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17:bpos + 17 + nv])
                htabs[(tc, th)] = _decode_table(bits, vals)
                bpos += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:     # SOF0/1 baseline
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential")
        elif marker == 0xDD:                       # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                       # SOS
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si:3 + 2 * si]
                scan_comps.append({"id": cs, "td": tt >> 4, "ta": tt & 15})
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if comps is None or scan_start is None:
        raise ValueError("JPEG missing SOF/SOS")

    # destuff scan data, note restart-marker positions (in destuffed bytes)
    raw = np.frombuffer(data, np.uint8, count=n - scan_start,
                        offset=scan_start)
    keep = np.ones(len(raw), bool)
    is_ff = raw == 0xFF
    nxt = np.r_[raw[1:], np.uint8(0)]
    keep[1:][is_ff[:-1] & (nxt[:-1] == 0x00)] = False   # drop stuffed 00
    rst = is_ff & (nxt >= 0xD0) & (nxt <= 0xD7)
    eoi = np.flatnonzero(is_ff & (nxt == 0xD9))
    end = eoi[0] if len(eoi) else len(raw)
    keep[end:] = False
    # drop restart marker byte pairs
    rst_pos = np.flatnonzero(rst)
    rst_pos = rst_pos[rst_pos < end]
    keep[rst_pos] = False
    keep[rst_pos + 1] = False
    destuffed = raw[keep]
    # restart boundaries in destuffed coordinates
    kept_before = np.cumsum(keep) - keep.astype(np.int64)
    rst_destuffed = set(kept_before[rst_pos].tolist())

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    for sc in scan_comps:
        by_id[sc["id"]].update(td=sc["td"], ta=sc["ta"])
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), np.float64)

    br = _BitReader(destuffed)
    prev_dc = {c["id"]: 0 for c in comps}
    zz = ZIGZAG
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                # re-align to byte boundary at the (removed) RSTn
                if br.bit:
                    br.bit = 0
                    br.pos += 1
                while br.pos < len(destuffed) and \
                        br.pos not in rst_destuffed and False:
                    br.pos += 1               # markers already removed
                prev_dc = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for c in comps:
                dct = htabs[(0, c["td"])]
                act = htabs[(1, c["ta"])]
                for bi in range(c["v"]):
                    for bj in range(c["h"]):
                        zcoef = np.zeros(64, np.int64)
                        s = br.read_symbol(dct)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        prev_dc[c["id"]] += diff
                        zcoef[0] = prev_dc[c["id"]]
                        k = 1
                        while k < 64:
                            sym = br.read_symbol(act)
                            if sym == 0x00:       # EOB
                                break
                            run, size = sym >> 4, sym & 15
                            if size == 0:
                                if run == 15:     # ZRL
                                    k += 16
                                    continue
                                break
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zcoef[k] = _extend(br.read_bits(size), size)
                            k += 1
                        blk = np.zeros(64, np.float64)
                        blk[zz] = zcoef
                        bx = mx * c["h"] + bj
                        byy = my * c["v"] + bi
                        c["coef"][byy * c["bw"] + bx] = blk.reshape(8, 8) \
                            .astype(np.float64)

    planes = []
    for c in comps:
        q = qtabs[c["tq"]].astype(np.float64)
        f = c["coef"] * q
        blocks = np.einsum("ji,njk,kl->nil", _T, f, _T)   # inverse DCT
        plane = (blocks.reshape(c["bh"], c["bw"], 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c["bh"] * 8, c["bw"] * 8)) + 128.0
        # upsample to full MCU grid resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
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
