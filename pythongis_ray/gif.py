"""GIF87a/89a codec — pure struct+numpy, no PIL.

Clean-room implementation from the public GIF specification
(CompuServe GIF89a, 1990): variable-width LZW, global/local color
tables, interlacing, and multi-frame animations with graphics-control
disposal. The reference loads .gif rasters through PIL
(``/root/reference/pythongis/raster/loader.py:236-334``); this module
is the codec behind the same capability here (``raster.read_gif``)
and feeds animated frames to the multimodal video pipeline
(frame-sampling over web GIFs).

Decode returns (frames, delays_cs): frames is (n, h, w, 3) uint8 RGB
composited onto the logical screen per frame disposal; delays_cs are
per-frame delays in centiseconds (0 for plain images).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes) -> bytes:
    """GIF variable-width LZW → index stream. Codes are packed
    LSB-first; dictionary resets on CLEAR, caps at 4096. The table
    holds materialized byte strings so each code emits with one
    C-level concat instead of a per-byte chain walk."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = min_code_size + 1
    prev = None
    pos = 0
    n = len(data)
    while True:
        while nbits < width and pos < n:
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            break
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]                # KwKwK
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Index stream → GIF variable-width LZW bytes (with leading CLEAR
    and trailing END, dictionary reset at 4096)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = min_code_size + 1

    def put(code: int):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    put(clear)
    cur = b""
    for b in indices:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        put(table[cur])
        if next_code < 4096:
            # giflib timing: the code emitted when the table already
            # holds 2^width entries still uses the OLD width; widen
            # after it, before this round's add — this matches the
            # decoder, whose corresponding add lags one code behind
            if next_code == (1 << width) and width < 12:
                width += 1
            table[cand] = next_code
            next_code += 1
        else:
            put(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        put(table[cur])
    put(end)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate([np.arange(start, h, step)
                            for start, step in _INTERLACE_PASSES])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_bytes(data: bytes):
    """GIF bytes → ((n, h, w, 3) uint8 RGB frames, delays in
    centiseconds). Frames are composited onto the logical screen per
    the GIF89a disposal model (unspecified/keep, restore-background,
    restore-previous)."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    w, h, flags, bg, _ = struct.unpack_from("<HHBBB", data, 6)
    from pythongis_ray.raster import check_decode_dims
    check_decode_dims(w, h, "GIF")
    pos = 13
    gct = None
    if flags & 0x80:
        ngct = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, 3 * ngct, pos).reshape(-1, 3)
        pos += 3 * ngct

    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    frames = []
    delays = []
    transparent = -1
    delay = 0
    disposal = 0

    while pos < len(data):
        block = data[pos]
        if block == 0x3B:                          # trailer
            break
        if block == 0x21:                          # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:                      # graphics control
                sz = data[pos]
                gflags, delay = struct.unpack_from("<BH", data, pos + 1)
                disposal = (gflags >> 2) & 7
                transparent = data[pos + 4] if gflags & 1 else -1
                pos += sz + 1
            while data[pos] != 0:                  # skip sub-blocks
                pos += data[pos] + 1
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, lflags = struct.unpack_from("<HHHHB", data,
                                                       pos + 1)
        pos += 10
        pal = gct
        if lflags & 0x80:                          # local color table
            nlct = 2 << (lflags & 7)
            pal = np.frombuffer(data, np.uint8, 3 * nlct, pos) \
                .reshape(-1, 3)
            pos += 3 * nlct
        min_code = data[pos]
        pos += 1
        chunks = []
        while data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1:pos + 1 + ln])
            pos += ln + 1
        pos += 1
        idx = np.frombuffer(_lzw_decode(min_code, b"".join(chunks)),
                            np.uint8, fw * fh).reshape(fh, fw)
        if lflags & 0x40:
            idx = _deinterlace(idx)
        if pal is None:
            raise ValueError("GIF frame with no color table")
        prev_region = canvas[top:top + fh, left:left + fw].copy()
        px = pal[idx]
        if transparent >= 0:
            mask = idx != transparent
            region = canvas[top:top + fh, left:left + fw]
            region[mask] = px[mask]
        else:
            canvas[top:top + fh, left:left + fw] = px
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:                          # restore background
            canvas[top:top + fh, left:left + fw] = \
                gct[bg] if (gct is not None and bg < len(gct)) else 0
        elif disposal == 3:                        # restore previous
            canvas[top:top + fh, left:left + fw] = prev_region
        transparent = -1
        delay = 0
        disposal = 0
    if not frames:
        raise ValueError("GIF with no image data")
    return np.stack(frames), delays


def _palettize(px: np.ndarray):
    """(h, w, 3) uint8 → (palette (n, 3), indices (h, w)); raises if
    more than 256 distinct colors (quantization is out of scope — the
    caller quantizes)."""
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    key = (flat[:, 0].astype(np.uint32) << 16) \
        | (flat[:, 1].astype(np.uint32) << 8) | flat[:, 2]
    uniq, inv = np.unique(key, return_inverse=True)
    if len(uniq) > 256:
        raise ValueError(f"{len(uniq)} colors > 256; quantize first")
    pal = np.stack([(uniq >> 16) & 255, (uniq >> 8) & 255,
                    uniq & 255], axis=1).astype(np.uint8)
    return pal, inv.reshape(h, w).astype(np.uint8)


def encode_gif_bytes(frames: np.ndarray, delays=None) -> bytes:
    """(h, w) gray / (h, w, 3) RGB / (n, h, w, 3) RGB frames → GIF89a
    bytes (one global color table across all frames; ≤256 distinct
    colors total). ``delays`` (centiseconds, per frame) makes an
    animation loop."""
    frames = np.asarray(frames, np.uint8)
    if frames.ndim == 2:
        frames = np.stack([np.stack([frames] * 3, axis=2)])
    elif frames.ndim == 3:
        frames = frames[None]
    n, h, w, _ = frames.shape
    pal, _ = _palettize(frames.reshape(n * h, w, 3))
    npal = max(2, 1 << int(np.ceil(np.log2(max(2, len(pal))))))
    lut = {(int(r) << 16) | (int(g) << 8) | int(b): i
           for i, (r, g, b) in enumerate(pal)}
    out = [b"GIF89a",
           struct.pack("<HHBBB", w, h,
                       0x80 | (int(np.log2(npal)) - 1), 0, 0),
           pal.tobytes() + b"\x00" * (3 * (npal - len(pal)))]
    if delays is not None:
        # Netscape looping extension
        out.append(b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")
    min_code = max(2, int(np.log2(npal)))
    for fi in range(n):
        if delays is not None:
            out.append(b"\x21\xf9\x04\x00"
                       + struct.pack("<H", int(delays[fi])) + b"\x00\x00")
        flat = frames[fi].reshape(-1, 3)
        key = (flat[:, 0].astype(np.uint32) << 16) \
            | (flat[:, 1].astype(np.uint32) << 8) | flat[:, 2]
        idx = np.array([lut[int(k)] for k in key], np.uint8)
        out.append(struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0))
        out.append(bytes([min_code]))
        lzw = _lzw_encode(min_code, idx.tobytes())
        for off in range(0, len(lzw), 255):
            chunk = lzw[off:off + 255]
            out.append(bytes([len(chunk)]) + chunk)
        out.append(b"\x00")
    out.append(b"\x3b")
    return b"".join(out)
