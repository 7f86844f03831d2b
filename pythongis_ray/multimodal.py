"""Multimodal columns: image/audio/video as opaque binary + metadata.

Brief contract: treat media as ``payload: binary`` columns with typed
metadata; implement decode / feature-extract / resize / frame-sample as
actor-pool ``map_batches`` stages. PNG, JPEG (baseline + progressive),
GIF, TIFF and uncompressed BMP images, RIFF/WAVE PCM audio, and
YUV4MPEG2 (.y4m) + animated-GIF video decode for REAL (the repo's pure
zlib/struct/numpy codecs — no PIL/ffmpeg); formats whose codec
libraries are NOT in this container (WebP, MP3/OGG, MP4/WebM) keep an
explicit stub (``NotImplementedError`` unless ``fake=True`` selects
the deterministic fake decoder) — the Ray-side plumbing (schema, batch
sizing for wide binary rows, actor signature, output layout) is the
same either way and is tested on the real paths. Every decoder is
guarded by ``raster.check_decode_dims`` (decompression-bomb headers
raise before allocating).

Schema of a media table:
    id: int64, kind: string('image'|'audio'), payload: binary,
    meta_w: int32, meta_h: int32, meta_channels: int32   (images)
    meta_sr: int32, meta_samples: int64                  (audio)

Batch sizing rule (memory-aware): payloads are wide — batches are
capped by BYTES not rows (``MEDIA_BATCH_ROWS`` assumes ~1 MB payloads;
large media needs smaller batches so batch × concurrency fits the
worker heap).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_BATCH_ROWS = 64  # ~64 MB of 1 MB payloads per batch


def synthesize_media(n: int = 64, kind: str = "image", payload_bytes: int = 4096,
                     seed: int = 42) -> pd.DataFrame:
    """Deterministic fake media table (stands in for WARC-extracted
    images/audio)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        payload = rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes()
        if kind in ("png", "bmp", "jpg", "jpg_prog", "gif"):
            # REAL encoded payloads for the native codec path
            from pythongis_ray import gif as _gif
            from pythongis_ray import jpeg as _jpeg
            from pythongis_ray import raster as _raster

            px = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
            if kind == "gif":                  # palette-safe: 216 colors
                px = (px // 51 * 51)
            payload = (_raster.encode_png_bytes(px) if kind == "png"
                       else encode_bmp_bytes(px) if kind == "bmp"
                       else _jpeg.encode_jpeg_bytes(px, quality=90)
                       if kind == "jpg"
                       else _jpeg.encode_jpeg_progressive_bytes(
                           px, quality=90, subsampling="420")
                       if kind == "jpg_prog"
                       else _gif.encode_gif_bytes(px))
            rows.append({"id": i, "kind": "image", "payload": payload,
                         "meta_w": np.int32(64), "meta_h": np.int32(48),
                         "meta_channels": np.int32(3)})
        elif kind == "image":
            rows.append({"id": i, "kind": "image", "payload": payload,
                         "meta_w": np.int32(64), "meta_h": np.int32(48),
                         "meta_channels": np.int32(3)})
        elif kind == "video":
            # 8 frames of 16x12x3 raw bytes per clip
            nf, w, h, c = 8, 16, 12, 3
            vp = rng.integers(0, 256, nf * w * h * c,
                              dtype=np.uint8).tobytes()
            rows.append({"id": i, "kind": "video", "payload": vp,
                         "meta_frames": np.int32(nf),
                         "meta_w": np.int32(w), "meta_h": np.int32(h),
                         "meta_channels": np.int32(c)})
        elif kind == "gif_anim":
            # REAL animated GIF clips for the native video codec path
            from pythongis_ray import gif as _gif

            nf, w, h = 6, 16, 12
            frames = (rng.integers(0, 256, (nf, h, w, 3), dtype=np.uint8)
                      // 51 * 51)              # 216-color palette-safe
            rows.append({"id": i, "kind": "video",
                         "payload": _gif.encode_gif_bytes(
                             frames, delays=[10] * nf),
                         "meta_frames": np.int32(nf),
                         "meta_w": np.int32(w), "meta_h": np.int32(h),
                         "meta_channels": np.int32(3)})
        elif kind == "y4m":
            # REAL encoded clips for the native video codec path
            nf, w, h = 6, 16, 12
            frames = rng.integers(0, 256, (nf, h, w, 3), dtype=np.uint8)
            rows.append({"id": i, "kind": "video",
                         "payload": encode_y4m_bytes(frames),
                         "meta_frames": np.int32(nf),
                         "meta_w": np.int32(w), "meta_h": np.int32(h),
                         "meta_channels": np.int32(3)})
        elif kind == "wav":
            # REAL encoded clips for the native audio codec path
            wave = rng.integers(-2000, 2000, 800, dtype=np.int16)
            rows.append({"id": i, "kind": "audio",
                         "payload": encode_wav_bytes(wave, 8000),
                         "meta_sr": np.int32(8000),
                         "meta_samples": np.int64(800)})
        else:
            rows.append({"id": i, "kind": "audio", "payload": payload,
                         "meta_sr": np.int32(16000),
                         "meta_samples": np.int64(payload_bytes)})
    return pd.DataFrame(rows)


def encode_bmp_bytes(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BI_RGB BMP bytes."""
    import struct

    px = np.asarray(px, np.uint8)
    h, w, _ = px.shape
    pad = (-3 * w) % 4
    rowbytes = 3 * w + pad
    bgr = px[::-1, :, ::-1]                # bottom-up, BGR
    body = np.concatenate(
        [bgr.reshape(h, 3 * w),
         np.zeros((h, pad), np.uint8)], axis=1).tobytes()
    off = 14 + 40
    return (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                          len(body), 2835, 2835, 0, 0)
            + body)


def decode_bmp_bytes(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP bytes → (h, w, 3|4) uint8
    RGB(A)."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", data, 10)
    hdr, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    from pythongis_ray.raster import check_decode_dims
    check_decode_dims(abs(w), abs(h), "BMP")
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
    nch = bpp // 8
    bottom_up = h > 0
    h = abs(h)
    rowbytes = (nch * w + 3) & ~3
    rows = np.frombuffer(data, np.uint8, h * rowbytes, off) \
        .reshape(h, rowbytes)[:, :nch * w].reshape(h, w, nch)
    if bottom_up:
        rows = rows[::-1]
    out = rows[:, :, [2, 1, 0]] if nch == 3 \
        else rows[:, :, [2, 1, 0, 3]]      # BGR(A) → RGB(A)
    return np.ascontiguousarray(out)


def fetch_synthetic_images(batch: pa.Table, w: int = 16,
                           h: int = 16) -> pa.Table:
    """The fetch-stage stand-in for an image-ref table (no network in
    this container): each ``img_id`` deterministically becomes a REAL
    PNG payload — a solid (h, w, 3) image with color
    ``((id*37) % 256, (id*59) % 256, (id*83) % 256)``. Losslessness
    of the PNG codec makes downstream decode stats exactly
    SQL-replayable from the color formula (queries.q_media_pixels)."""
    from pythongis_ray import raster as _raster

    ids = batch["img_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    payloads = []
    px = np.empty((h, w, 3), np.uint8)
    for i in ids:
        px[:, :, 0] = (i * 37) % 256
        px[:, :, 1] = (i * 59) % 256
        px[:, :, 2] = (i * 83) % 256
        payloads.append(_raster.encode_png_bytes(px))
    out = pa.table({
        "img_id": pa.array(ids),
        "payload": pa.array(payloads, pa.binary()),
        "meta_w": pa.array(np.full(len(ids), w, np.int32)),
        "meta_h": pa.array(np.full(len(ids), h, np.int32)),
        "meta_channels": pa.array(np.full(len(ids), 3, np.int32)),
    })
    for name in batch.column_names:
        if name not in out.column_names:
            out = out.append_column(name, batch[name])
    return out


class DecodeImage:
    """Actor-pool stage: payload → decoded pixel tensor column.

    PNG, JPEG (baseline + progressive), GIF (first frame), TIFF and
    uncompressed BMP payloads decode for REAL via the repo's
    pure-numpy codecs (raster.decode_png_bytes / jpeg.decode_jpeg_bytes
    / gif.decode_gif_bytes / raster.decode_tiff_bytes /
    decode_bmp_bytes — no PIL needed); meta_w/h/channels are updated
    from the decoded shape. Other formats (WebP etc. — codec libs
    absent from this container):
    ``fake=True`` produces a deterministic pseudo-decode
    (payload bytes tiled into the declared (h, w, c) tensor) so
    downstream stages are exercised end to end; ``fake=False`` raises
    NotImplementedError at the decode call site.

    ``on_error="raise"`` (default) propagates decode failures;
    ``on_error="skip"`` DROPS undecodable rows — at web scale corrupt
    payloads are certain and must not kill the job (the CC pipeline's
    skip-bad-records norm). Skipped counts are logged per batch via
    the standard logging module.
    """

    def __init__(self, fake: bool = True, on_error: str = "raise"):
        self.fake = fake
        self.on_error = on_error

    def _decode_one(self, payload: bytes, w: int, h: int, c: int) -> np.ndarray:
        from pythongis_ray import gif as _gif
        from pythongis_ray import jpeg as _jpeg
        from pythongis_ray import raster as _raster

        if payload[:8] == _raster.PNG_MAGIC:
            return _raster.decode_png_bytes(payload)
        if payload[:2] == b"BM":
            return decode_bmp_bytes(payload)
        if payload[:3] == _jpeg.JPEG_MAGIC:
            return _jpeg.decode_jpeg_bytes(payload)
        if payload[:6] in _gif.GIF_MAGICS:
            return _gif.decode_gif_bytes(payload)[0][0]   # first frame
        if payload[:2] in (b"II", b"MM") and len(payload) > 4 \
                and payload[2:4] in (b"\x2a\x00", b"\x00\x2a"):
            arr, _meta = _raster.decode_tiff_bytes(payload)
            px = arr if arr.ndim == 3 else arr[None]      # (bands, h, w)
            return np.clip(np.moveaxis(px, 0, 2), 0, 255).astype(np.uint8)
        if w and h and c and len(payload) == w * h * c:
            # already a raw pixel tensor of the declared shape (e.g. a
            # frame emitted by SampleFrames) — no codec involved
            return np.frombuffer(payload, np.uint8).reshape(h, w, c)
        if not self.fake:
            raise NotImplementedError(
                "only PNG/JPEG/BMP decode natively; other formats need "
                "PIL/opencv, not available in this container — run with "
                "fake=True for the deterministic stub")
        raw = np.frombuffer(payload, dtype=np.uint8)
        reps = -(-(w * h * c) // len(raw))
        return np.tile(raw, reps)[: w * h * c].reshape(h, w, c)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tensors, ws, hs, cs, keep = [], [], [], [], []
        for payload, w, h, c in zip(batch["payload"].to_pylist(),
                                    batch["meta_w"].to_pylist(),
                                    batch["meta_h"].to_pylist(),
                                    batch["meta_channels"].to_pylist()):
            try:
                px = self._decode_one(payload, w, h, c)
            except Exception:
                if self.on_error != "skip":
                    raise
                keep.append(False)
                continue
            keep.append(True)
            tensors.append(px.tobytes())
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            cs.append(px.shape[2])
        out = batch
        if not all(keep):
            import logging

            logging.getLogger(__name__).warning(
                "DecodeImage skipped %d/%d undecodable payloads",
                len(keep) - sum(keep), len(keep))
            out = out.filter(pa.array(keep))
        out = out.drop_columns(["payload"])
        # meta reflects the DECODED shape (real codecs may disagree
        # with the declared metadata; decoded truth wins)
        for name, vals in (("meta_w", ws), ("meta_h", hs),
                           ("meta_channels", cs)):
            out = out.set_column(out.column_names.index(name), name,
                                 pa.array(np.asarray(vals, np.int32)))
        return out.append_column("pixels", pa.array(tensors, pa.binary()))


def _stack_uniform(batch: pa.Table, col: str):
    """(n, h, w, c) uint8 stack when every image in the batch shares
    the same shape (the overwhelmingly common case after resize /
    from a uniform corpus) — one buffer concat, no per-row numpy.
    Returns None for heterogeneous batches (caller falls back)."""
    w = batch["meta_w"].to_numpy(zero_copy_only=False)
    h = batch["meta_h"].to_numpy(zero_copy_only=False)
    c = batch["meta_channels"].to_numpy(zero_copy_only=False)
    if len(w) == 0 or (w != w[0]).any() or (h != h[0]).any() or (c != c[0]).any():
        return None
    arr = batch[col]
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if arr.null_count:
        return None
    off_dtype = (np.int64 if pa.types.is_large_binary(arr.type)
                 or pa.types.is_large_string(arr.type) else np.int32)
    offs = np.frombuffer(arr.buffers()[1], off_dtype)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    if not np.all(np.diff(offs) == int(w[0]) * int(h[0]) * int(c[0])):
        return None
    data = np.frombuffer(arr.buffers()[2], np.uint8)[offs[0]:offs[-1]]
    return data.reshape(len(arr), int(h[0]), int(w[0]), int(c[0]))


class ResizeImage:
    """Actor-pool stage: nearest-neighbour resize of decoded tensors.
    Uniform batches resize as ONE (n, h, w, c) gather; mixed-shape
    batches fall back to per-row."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        stack = _stack_uniform(batch, "pixels")
        if stack is not None:
            n, h, w, c = stack.shape
            yi = np.arange(self.out_h) * h // self.out_h
            xi = np.arange(self.out_w) * w // self.out_w
            small = stack[:, yi][:, :, xi]     # (n, oh, ow, c)
            flat = np.ascontiguousarray(small).reshape(n, -1)
            sz = flat.shape[1]
            buf = flat.tobytes()
            out = [buf[i * sz:(i + 1) * sz] for i in range(n)]
        else:
            out = []
            for b, w, h, c in zip(batch["pixels"].to_pylist(),
                                  batch["meta_w"].to_pylist(),
                                  batch["meta_h"].to_pylist(),
                                  batch["meta_channels"].to_pylist()):
                a = np.frombuffer(b, dtype=np.uint8).reshape(h, w, c)
                yi = np.arange(self.out_h) * h // self.out_h
                xi = np.arange(self.out_w) * w // self.out_w
                out.append(a[yi][:, xi].tobytes())
        t = batch.drop_columns(["pixels"])
        t = t.append_column("pixels", pa.array(out, pa.binary()))
        t = t.set_column(t.column_names.index("meta_w"), "meta_w",
                         pa.array(np.full(t.num_rows, self.out_w, np.int32)))
        return t.set_column(t.column_names.index("meta_h"), "meta_h",
                            pa.array(np.full(t.num_rows, self.out_h, np.int32)))


class ImageFeatures:
    """Actor-pool stage: per-image feature vector (channel means/stds +
    a tiny intensity histogram) — the 'model inference' slot; a real
    model would be loaded once in __init__. Uniform batches compute
    every statistic in single whole-batch numpy passes (one bincount
    for all histograms)."""

    def __init__(self, hist_bins: int = 8):
        self.bins = hist_bins
        self.edges = np.linspace(0, 256, hist_bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        stack = _stack_uniform(batch, "pixels")
        if stack is not None:
            n = stack.shape[0]
            px = stack.reshape(n, -1, stack.shape[3]).astype(np.float64)
            mu = px.mean(axis=1)                      # (n, c)
            sd = px.std(axis=1)
            step = 256 // self.bins
            bin_of = (stack.reshape(n, -1) // step).astype(np.int64)
            img_of = np.repeat(np.arange(n, dtype=np.int64), bin_of.shape[1])
            hist = np.bincount(img_of * self.bins + bin_of.ravel(),
                               minlength=n * self.bins) \
                .reshape(n, self.bins) / bin_of.shape[1]
            feats = np.concatenate([mu, sd, hist], axis=1)
            return batch.append_column(
                "features", pa.array(list(feats), pa.list_(pa.float64())))
        feats = []
        for buf, w, h, c in zip(batch["pixels"].to_pylist(),
                                batch["meta_w"].to_pylist(),
                                batch["meta_h"].to_pylist(),
                                batch["meta_channels"].to_pylist()):
            a = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c).astype(np.float64)
            mu = a.mean(axis=(0, 1))
            sd = a.std(axis=(0, 1))
            hist, _ = np.histogram(a, bins=self.edges)
            feats.append(np.concatenate([mu, sd, hist / a.size]).tolist())
        return batch.append_column("features",
                                   pa.array(feats, pa.list_(pa.float64())))


class PerceptualHash:
    """Actor-pool stage: decoded pixels → 64-bit average hash (aHash):
    grayscale by integer channel sum, 8×8 block sums (image truncated
    to the largest multiple of 8 per axis), bit_i = 64·block_i >
    total — an integer predicate, no float division, so the hash is
    bit-stable. A few flipped payload bytes flip few blocks → small
    Hamming distance: the image analogue of SimHash, feeding the same
    banded near-dup machinery (text.hash_neardup_pairs)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        stack = _stack_uniform(batch, "pixels")
        if stack is not None:
            ph = self._hash_stack(stack)
        else:
            hs = []
            for buf, w, h, c in zip(batch["pixels"].to_pylist(),
                                    batch["meta_w"].to_pylist(),
                                    batch["meta_h"].to_pylist(),
                                    batch["meta_channels"].to_pylist()):
                a = np.frombuffer(buf, dtype=np.uint8).reshape(1, h, w, c)
                hs.append(self._hash_stack(a)[0])
            ph = np.array(hs, np.uint64)
        return batch.append_column("phash", pa.array(ph.view(np.int64)))

    @staticmethod
    def _hash_stack(stack: np.ndarray) -> np.ndarray:
        n, h, w, _ = stack.shape
        gray = stack.astype(np.int64).sum(axis=3)          # (n, h, w)
        hh, ww = h - h % 8, w - w % 8
        gray = gray[:, :hh, :ww]
        blocks = gray.reshape(n, 8, hh // 8, 8, ww // 8).sum(axis=(2, 4))
        g = blocks.reshape(n, 64)
        bits = (g * 64 > g.sum(axis=1, keepdims=True)).astype(np.uint64)
        return (bits << np.arange(64, dtype=np.uint64)).sum(axis=1)


def image_neardup_pairs(media_ds, max_hamming: int = 6,
                        bucket_cap: int = 1024, concurrency: int = 2):
    """Image near-duplicate pairs over a media table: fake-decode →
    perceptual hash (one vectorized stack op per uniform batch) →
    banded-Hamming candidate buckets → exact popcount verify — the
    image-dedup slot of a multimodal corpus build. Emits
    (id_a, id_b, hamming). The decode stage is the stubbed codec
    boundary; everything downstream is real and corpus-scale (the
    only shuffle is the 16-bit band groupby)."""
    from pythongis_ray import text as _text

    px = media_ds.map_batches(DecodeImage, batch_size=MEDIA_BATCH_ROWS,
                              batch_format="pyarrow",
                              concurrency=concurrency,
                              fn_constructor_kwargs={"fake": True})
    hashed = px.map_batches(PerceptualHash, batch_size=MEDIA_BATCH_ROWS,
                            batch_format="pyarrow",
                            concurrency=concurrency)
    return _text.hash_neardup_pairs(hashed, "phash", "id",
                                    max_hamming=max_hamming,
                                    bucket_cap=bucket_cap)


def encode_wav_bytes(samples: np.ndarray, sr: int = 16000) -> bytes:
    """int16 waveform → RIFF/WAVE PCM bytes. ``samples`` is (n,) mono
    or (n, ch) interleaved-by-row multichannel."""
    import struct

    s = np.asarray(samples, "<i2")
    ch = 1 if s.ndim == 1 else s.shape[1]
    body = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * ch * 2, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)


def decode_wav_bytes(data: bytes):
    """RIFF/WAVE PCM bytes → (mono int16 waveform, sample_rate).
    Supports 8-bit (rescaled) and 16-bit PCM, any channel count
    (channels integer-averaged to mono — the usual training-pipeline
    downmix). Pure struct+numpy; no audio library needed."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, n = 12, len(data)
    fmt_ch = fmt_sr = fmt_bits = fmt_code = None
    pcm = None
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt_code, fmt_ch, fmt_sr = struct.unpack_from("<HHI", body, 0)
            (fmt_bits,) = struct.unpack_from("<H", body, 14)
        elif cid == b"data":
            pcm = body
        pos += 8 + sz + (sz & 1)           # chunks are word-aligned
    if pcm is None or fmt_code is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt_code != 1 or fmt_bits not in (8, 16):
        raise NotImplementedError(
            f"WAV format={fmt_code} bits={fmt_bits}: only PCM 8/16-bit")
    if fmt_bits == 16:
        wave = np.frombuffer(pcm, "<i2", len(pcm) // 2)
    else:                                   # 8-bit PCM is unsigned
        wave = ((np.frombuffer(pcm, np.uint8).astype(np.int16) - 128)
                << 8)
    if fmt_ch > 1:
        nfr = len(wave) // fmt_ch
        wave = wave[:nfr * fmt_ch].reshape(nfr, fmt_ch) \
            .astype(np.int32).sum(axis=1) // fmt_ch
        wave = wave.astype(np.int16)
    return wave, int(fmt_sr)


class DecodeAudio:
    """Actor-pool stage: audio payload → waveform column. RIFF/WAVE
    PCM payloads decode for REAL (pure struct+numpy, 8/16-bit, any
    channel count downmixed to mono); meta_sr/meta_samples are updated
    from the decoded truth. Other formats (MP3/OGG — codec libs absent
    from this container): ``fake=True`` interprets the raw payload
    bytes as a little-endian int16 waveform (deterministic);
    ``fake=False`` raises at the decode call site.
    ``on_error="skip"`` drops undecodable rows (logged count) instead
    of failing the job — the web-scale skip-bad-records norm."""

    def __init__(self, fake: bool = True, on_error: str = "raise"):
        self.fake = fake
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        out, srs, counts, keep = [], [], [], []
        in_sr = (batch["meta_sr"].to_pylist()
                 if "meta_sr" in batch.column_names
                 else [0] * len(batch))
        for payload, sr0 in zip(batch["payload"].to_pylist(), in_sr):
            try:
                if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                    wave, sr = decode_wav_bytes(payload)
                    out.append(wave.astype("<i2").tobytes())
                    srs.append(sr)
                    counts.append(len(wave))
                    keep.append(True)
                    continue
                if not self.fake:
                    raise NotImplementedError(
                        "only RIFF/WAVE PCM decodes natively; other audio "
                        "formats need a codec library, not available in "
                        "this container — run with fake=True for the stub")
            except Exception:
                if self.on_error != "skip":
                    raise
                keep.append(False)
                continue
            n = len(payload) // 2 * 2
            out.append(payload[:n])
            srs.append(sr0 or 0)
            counts.append(n // 2)
            keep.append(True)
        t = batch
        if not all(keep):
            import logging

            logging.getLogger(__name__).warning(
                "DecodeAudio skipped %d/%d undecodable payloads",
                len(keep) - sum(keep), len(keep))
            t = t.filter(pa.array(keep))
        t = t.drop_columns(["payload"])
        # meta reflects the DECODED waveform (decoded truth wins)
        for name, vals, typ in (("meta_sr", srs, np.int32),
                                ("meta_samples", counts, np.int64)):
            col = pa.array(np.asarray(vals, typ))
            if name in t.column_names:
                t = t.set_column(t.column_names.index(name), name, col)
            else:
                t = t.append_column(name, col)
        return t.append_column("waveform", pa.array(out, pa.binary()))


def audio_features(batch: pa.Table) -> pa.Table:
    """Vectorized per-clip features over int16 waveforms: RMS, peak,
    zero-crossing rate — computed with reduceat over the batch's
    concatenated sample run (no Python per clip)."""
    arr = batch["waveform"]
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    off_dtype = (np.int64 if pa.types.is_large_binary(arr.type)
                 or pa.types.is_large_string(arr.type) else np.int32)
    offs = np.frombuffer(arr.buffers()[1], off_dtype)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], np.uint8)[offs[0]:offs[-1]]
    wave = data.view("<i2").astype(np.float64)
    s0 = (offs[:-1] - offs[0]) // 2
    s1 = (offs[1:] - offs[0]) // 2
    ns = np.maximum(s1 - s0, 1)
    sq = np.add.reduceat(np.r_[wave * wave, 0.0], np.minimum(s0, len(wave)))
    sq[s0 == s1] = 0.0
    rms = np.sqrt(sq / ns)
    peak = np.maximum.reduceat(np.r_[np.abs(wave), 0.0],
                               np.minimum(s0, len(wave)))
    peak[s0 == s1] = 0.0
    sign = np.signbit(wave)
    flips = np.r_[(sign[1:] != sign[:-1]).astype(np.float64), 0.0, 0.0]
    # zero out flips that straddle clip boundaries
    flips[np.clip(s1 - 1, 0, len(flips) - 1)] = 0.0
    zc = np.add.reduceat(flips, np.minimum(s0, len(flips) - 1))
    zcr = zc / ns
    batch = batch.append_column("rms", pa.array(rms))
    batch = batch.append_column("peak", pa.array(peak))
    return batch.append_column("zcr", pa.array(zcr))


def audio_pipeline(ds, fake: bool = True, concurrency: int = 2):
    """decode → vectorized feature extraction for audio clips."""
    ds = ds.map_batches(DecodeAudio, fn_constructor_kwargs=dict(fake=fake),
                        batch_format="pyarrow", batch_size=MEDIA_BATCH_ROWS,
                        concurrency=concurrency, num_cpus=1)
    return ds.map_batches(audio_features, batch_format="pyarrow",
                          batch_size=MEDIA_BATCH_ROWS)


Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m_bytes(frames: np.ndarray, fps=(25, 1)) -> bytes:
    """uint8 frames → YUV4MPEG2 (Y4M) bytes. ``frames`` is
    (nf, h, w, 3) RGB (written as C444 with BT.601 full-range
    conversion) or (nf, h, w) gray (written as Cmono, lossless)."""
    frames = np.asarray(frames, np.uint8)
    nf, h, w = frames.shape[:3]
    mono = frames.ndim == 3
    hdr = (f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
           f"C{'mono' if mono else '444'}\n").encode()
    parts = [hdr]
    for f in range(nf):
        parts.append(b"FRAME\n")
        if mono:
            parts.append(frames[f].tobytes())
        else:
            rgb = frames[f].astype(np.float64)
            r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
            y = 0.299 * r + 0.587 * g + 0.114 * b
            u = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
            v = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
            for plane in (y, u, v):
                parts.append(np.clip(np.round(plane), 0, 255)
                             .astype(np.uint8).tobytes())
    return b"".join(parts)


def decode_y4m_bytes(data: bytes, sel=None):
    """YUV4MPEG2 bytes → (frames, w, h, channels) uint8 tensor:
    (nf, h, w, 3) RGB for color streams (BT.601 full-range), or
    (nf, h, w, 1) for Cmono. C420*/C422/C444 chroma subsampling
    supported (nearest-neighbor chroma upsample). ``sel`` = frame
    indices to decode (others are skipped without conversion work) —
    the frame-sample fast path."""
    if data[:9] != Y4M_MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    eol = data.index(b"\n")
    w = h = None
    cspace = "420jpeg"
    for tok in data[10:eol].split(b" "):
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            cspace = tok[1:].decode()
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if cspace.startswith("420"):
        cw, chh = (w + 1) // 2, (h + 1) // 2
    elif cspace.startswith("422"):
        cw, chh = (w + 1) // 2, h
    elif cspace.startswith("444"):
        cw, chh = w, h
    elif cspace == "mono":
        cw = chh = 0
    else:
        raise NotImplementedError(f"Y4M colorspace C{cspace}")
    fsz = w * h + 2 * cw * chh
    # index all frame payload offsets (FRAME lines may carry params)
    pos, offsets = eol + 1, []
    n = len(data)
    while pos < n:
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        fe = data.index(b"\n", pos)
        offsets.append(fe + 1)
        pos = fe + 1 + fsz
    if sel is None:
        want = range(len(offsets))
    elif isinstance(sel, range):
        want = range(sel.start, min(sel.stop, len(offsets)), sel.step)
    else:
        want = [i for i in sel if i < len(offsets)]
    nch = 1 if cspace == "mono" else 3
    out = np.empty((len(want), h, w, nch), np.uint8)
    for oi, fi in enumerate(want):
        off = offsets[fi]
        ybuf = np.frombuffer(data, np.uint8, w * h, off) \
            .reshape(h, w).astype(np.float64)
        if nch == 1:
            out[oi, :, :, 0] = ybuf
            continue
        u = np.frombuffer(data, np.uint8, cw * chh, off + w * h) \
            .reshape(chh, cw).astype(np.float64)
        v = np.frombuffer(data, np.uint8, cw * chh,
                          off + w * h + cw * chh) \
            .reshape(chh, cw).astype(np.float64)
        if (cw, chh) != (w, h):               # nearest chroma upsample
            u = np.repeat(np.repeat(u, -(-h // chh), 0)[:h],
                          -(-w // cw), 1)[:, :w]
            v = np.repeat(np.repeat(v, -(-h // chh), 0)[:h],
                          -(-w // cw), 1)[:, :w]
        u -= 128.0
        v -= 128.0
        out[oi, :, :, 0] = np.clip(np.round(ybuf + 1.402 * v), 0, 255)
        out[oi, :, :, 1] = np.clip(
            np.round(ybuf - 0.344136 * u - 0.714136 * v), 0, 255)
        out[oi, :, :, 2] = np.clip(np.round(ybuf + 1.772 * u), 0, 255)
    return out, w, h, nch


def frame_sample(batch: pa.Table, every: int = 4) -> pa.Table:
    """Row-level sampling analog: keep every k-th row (deterministic
    subsample on id). For true per-video frame extraction see
    SampleFrames."""
    ids = batch["id"].to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(ids % every == 0))


class SampleFrames:
    """Actor-pool stage: video payload → one row per SAMPLED frame
    (every k-th of meta_frames), each carrying the frame tensor bytes
    plus (id, frame_idx) — the frame-sample step of a video training
    pipeline. YUV4MPEG2 (.y4m) payloads decode for REAL (pure-numpy
    C420/C422/C444/Cmono → RGB, only the sampled frames converted);
    compressed containers (MP4/WebM — codec libs absent from this
    image) fall to ``fake=True``, which interprets the payload as raw
    concatenated frames*h*w*c bytes. Either way the REAL Ray plumbing
    is exercised: per-actor setup, row-expanding map_batches (1 video
    → n frames), byte-capped batches. Uniform-shape raw batches slice
    via ONE reshape + stride gather; zero Python per frame."""

    def __init__(self, every: int = 4, fake: bool = True,
                 on_error: str = "raise"):
        self.every = every
        self.fake = fake
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        pays = batch["payload"]
        pays = pays.combine_chunks() if isinstance(pays, pa.ChunkedArray) \
            else pays
        n = len(pays)
        is_y4m = np.zeros(n, bool)
        is_gif = np.zeros(n, bool)
        if n and not pays.null_count:
            off_dtype = (np.int64 if pa.types.is_large_binary(pays.type)
                         else np.int32)
            offs = np.frombuffer(pays.buffers()[1], off_dtype)[
                pays.offset:pays.offset + n + 1].astype(np.int64)
            data = np.frombuffer(pays.buffers()[2], np.uint8)
            cand = np.flatnonzero(np.diff(offs) >= 9)
            if cand.size:
                gathered = data[offs[:-1][cand][:, None] + np.arange(9)]
                is_y4m[cand] = (gathered ==
                                np.frombuffer(Y4M_MAGIC, np.uint8)).all(1)
                is_gif[cand] = (gathered[:, :4] ==
                                np.frombuffer(b"GIF8", np.uint8)).all(1)
        parts = []
        if is_y4m.any():
            parts.append(self._y4m_rows(batch.filter(pa.array(is_y4m))))
        if is_gif.any():
            parts.append(self._gif_rows(batch.filter(pa.array(is_gif))))
        rest = ~(is_y4m | is_gif)
        if rest.any() or not parts:
            parts.append(self._raw_rows(batch.filter(pa.array(rest))))
        return parts[0] if len(parts) == 1 else pa.concat_tables(parts)

    def _gif_rows(self, batch: pa.Table) -> pa.Table:
        from pythongis_ray import gif as _gif

        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_id, out_fidx, out_frames = [], [], []
        ws, hs, cs = [], [], []
        skipped = 0
        for i, payload in enumerate(batch["payload"].to_pylist()):
            try:
                frames, _delays = _gif.decode_gif_bytes(payload)
            except Exception:
                if self.on_error != "skip":
                    raise
                skipped += 1
                continue
            for k in range(0, frames.shape[0], self.every):
                out_id.append(ids[i])
                out_fidx.append(k)
                out_frames.append(frames[k].tobytes())
                hs.append(frames.shape[1])
                ws.append(frames.shape[2])
                cs.append(3)
        return pa.table({
            "id": pa.array(np.asarray(out_id, np.int64)),
            "frame_idx": pa.array(np.asarray(out_fidx, np.int64)),
            "payload": pa.array(out_frames, pa.binary()),
            "meta_w": pa.array(np.asarray(ws, np.int32)),
            "meta_h": pa.array(np.asarray(hs, np.int32)),
            "meta_channels": pa.array(np.asarray(cs, np.int32)),
        })

    def _y4m_rows(self, batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_id, out_fidx, out_frames = [], [], []
        ws, hs, cs = [], [], []
        skipped = 0
        for i, payload in enumerate(batch["payload"].to_pylist()):
            # count frames cheaply: decode with an open-ended stride
            try:
                frames, w, h, nch = decode_y4m_bytes(
                    payload, sel=range(0, 1 << 30, self.every))
            except Exception:
                if self.on_error != "skip":
                    raise
                skipped += 1
                continue
            for k in range(frames.shape[0]):
                out_id.append(ids[i])
                out_fidx.append(k * self.every)
                out_frames.append(frames[k].tobytes())
                ws.append(w)
                hs.append(h)
                cs.append(nch)
        return pa.table({
            "id": pa.array(np.asarray(out_id, np.int64)),
            "frame_idx": pa.array(np.asarray(out_fidx, np.int64)),
            "payload": pa.array(out_frames, pa.binary()),
            "meta_w": pa.array(np.asarray(ws, np.int32)),
            "meta_h": pa.array(np.asarray(hs, np.int32)),
            "meta_channels": pa.array(np.asarray(cs, np.int32)),
        })

    def _raw_rows(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "only YUV4MPEG2 (.y4m) decodes natively; compressed "
                "video containers need a codec library, not available "
                "in this container — run with fake=True for raw-frame "
                "payloads")
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nf = batch["meta_frames"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["meta_w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["meta_h"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["meta_channels"].to_numpy(zero_copy_only=False).astype(np.int64)
        payload = batch["payload"]
        out_id, out_fidx, out_frames = [], [], []
        uniform = len(ids) > 0 and (nf == nf[0]).all() and \
            (w == w[0]).all() and (h == h[0]).all() and (c == c[0]).all()
        if uniform:
            arr = payload.combine_chunks() if isinstance(
                payload, pa.ChunkedArray) else payload
            fsz = int(w[0] * h[0] * c[0])
            expected = int(nf[0]) * fsz
            off_dtype = (np.int64 if pa.types.is_large_binary(arr.type)
                         else np.int32)
            offs = np.frombuffer(arr.buffers()[1], off_dtype)[
                arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
            if arr.null_count or not np.all(np.diff(offs) == expected):
                uniform = False
        if uniform:
            data = np.frombuffer(arr.buffers()[2], np.uint8)[
                offs[0]:offs[-1]]
            vids = data.reshape(len(ids), int(nf[0]), fsz)
            sel = np.arange(0, int(nf[0]), self.every)
            frames = vids[:, sel, :]          # (n_videos, n_sel, fsz)
            out_id = np.repeat(ids, len(sel))
            out_fidx = np.tile(sel, len(ids))
            flat = np.ascontiguousarray(frames.reshape(-1, fsz))
            total = len(flat) * fsz
            if total > np.iinfo(np.int32).max:
                offsets = (np.arange(len(flat) + 1, dtype=np.int64)
                           * np.int64(fsz))
                arr = pa.Array.from_buffers(
                    pa.large_binary(), len(flat),
                    [None, pa.py_buffer(offsets.tobytes()),
                     pa.py_buffer(flat.tobytes())])
            else:
                offsets = (np.arange(len(flat) + 1, dtype=np.int32)
                           * np.int32(fsz))
                arr = pa.Array.from_buffers(
                    pa.binary(), len(flat),
                    [None, pa.py_buffer(offsets.tobytes()),
                     pa.py_buffer(flat.tobytes())])
        else:
            for i in range(len(ids)):
                fsz = int(w[i] * h[i] * c[i])
                buf = np.frombuffer(payload[i].as_py(), dtype=np.uint8)
                for f in range(0, int(nf[i]), self.every):
                    out_id.append(ids[i])
                    out_fidx.append(f)
                    out_frames.append(buf[f * fsz:(f + 1) * fsz].tobytes())
            arr = pa.array(out_frames, pa.binary())
            out_id = np.asarray(out_id, np.int64)
            out_fidx = np.asarray(out_fidx, np.int64)
        n_sel = len(out_id)
        if uniform:
            wcol = np.full(n_sel, w[0])
            hcol = np.full(n_sel, h[0])
            ccol = np.full(n_sel, c[0])
        else:
            reps = -(-nf // self.every)  # ceil: sampled frames/video
            wcol, hcol, ccol = (np.repeat(v, reps) for v in (w, h, c))
        return pa.table({
            "id": pa.array(np.asarray(out_id, np.int64)),
            "frame_idx": pa.array(np.asarray(out_fidx, np.int64)),
            "payload": arr,
            "meta_w": pa.array(wcol.astype(np.int32)),
            "meta_h": pa.array(hcol.astype(np.int32)),
            "meta_channels": pa.array(ccol.astype(np.int32)),
        })


def video_pipeline(ds, every: int = 4, fake: bool = True,
                   concurrency: int = 2):
    """frame-sample → per-frame image features (frames are image
    tensors, so the image featurizer applies unchanged)."""
    ds = ds.map_batches(SampleFrames,
                        fn_constructor_kwargs=dict(every=every, fake=fake),
                        batch_format="pyarrow", batch_size=MEDIA_BATCH_ROWS,
                        concurrency=concurrency, num_cpus=1)
    ds = ds.map_batches(DecodeImage, fn_constructor_kwargs=dict(fake=fake),
                        batch_format="pyarrow", batch_size=MEDIA_BATCH_ROWS,
                        concurrency=concurrency, num_cpus=1)
    return ds.map_batches(ImageFeatures, batch_format="pyarrow",
                          batch_size=MEDIA_BATCH_ROWS,
                          concurrency=concurrency, num_cpus=1)


def image_pipeline(ds, fake: bool = True, concurrency: int = 2,
                   out_w: int = 16, out_h: int = 16,
                   actors: bool = True):
    """decode → resize → featurize. ``actors=True`` chains genuine
    actor pools (the shape a real model-holding stage needs: weights
    load once per actor in ``__init__``). ``actors=False`` runs the
    same callables as stateless map_batches tasks on the
    already-warm worker pool — the right choice when the stages hold
    no heavy state, since fresh actor pools pay seconds of process
    spawn on cold workers (see CLAUDE.md first-touch notes) and fuse
    with neighbouring task stages."""
    if actors:
        ds = ds.map_batches(DecodeImage,
                            fn_constructor_kwargs=dict(fake=fake),
                            batch_format="pyarrow",
                            batch_size=MEDIA_BATCH_ROWS,
                            concurrency=concurrency, num_cpus=1)
        ds = ds.map_batches(ResizeImage,
                            fn_constructor_kwargs=dict(out_w=out_w,
                                                       out_h=out_h),
                            batch_format="pyarrow",
                            batch_size=MEDIA_BATCH_ROWS,
                            concurrency=concurrency, num_cpus=1)
        return ds.map_batches(ImageFeatures, batch_format="pyarrow",
                              batch_size=MEDIA_BATCH_ROWS,
                              concurrency=concurrency, num_cpus=1)
    dec, res, fea = (DecodeImage(fake=fake),
                     ResizeImage(out_w=out_w, out_h=out_h),
                     ImageFeatures())

    def all_stages(batch: pa.Table) -> pa.Table:
        return fea(res(dec(batch)))

    return ds.map_batches(all_stages, batch_format="pyarrow",
                          batch_size=MEDIA_BATCH_ROWS)
