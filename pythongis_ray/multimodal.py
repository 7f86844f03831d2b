"""Multimodal columns: image/audio/video as opaque binary + metadata.

Brief contract: treat media as ``payload: binary`` columns with typed
metadata; implement decode / feature-extract / resize / frame-sample as
actor-pool ``map_batches`` stages. PNG and uncompressed BMP images
decode for REAL (the repo's pure-zlib codecs — no PIL); formats whose
codec libraries are NOT in this container (JPEG, audio/video codecs)
keep an explicit stub (``NotImplementedError`` unless ``fake=True``
selects the deterministic fake decoder) — the Ray-side plumbing
(schema, batch sizing for wide binary rows, actor signature, output
layout) is the same either way and is tested on the real path.

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
        if kind in ("png", "bmp"):
            # REAL encoded payloads for the native codec path
            from pythongis_ray import raster as _raster

            px = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
            payload = (_raster.encode_png_bytes(px) if kind == "png"
                       else encode_bmp_bytes(px))
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


class DecodeImage:
    """Actor-pool stage: payload → decoded pixel tensor column.

    PNG and uncompressed BMP payloads decode for REAL via the repo's
    pure-zlib codecs (raster.decode_png_bytes / decode_bmp_bytes —
    no PIL needed); meta_w/h/channels are updated from the decoded
    shape. Other formats (JPEG etc. — codec libs absent from this
    container): ``fake=True`` produces a deterministic pseudo-decode
    (payload bytes tiled into the declared (h, w, c) tensor) so
    downstream stages are exercised end to end; ``fake=False`` raises
    NotImplementedError at the decode call site.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode_one(self, payload: bytes, w: int, h: int, c: int) -> np.ndarray:
        from pythongis_ray import raster as _raster

        if payload[:8] == _raster.PNG_MAGIC:
            return _raster.decode_png_bytes(payload)
        if payload[:2] == b"BM":
            return decode_bmp_bytes(payload)
        if not self.fake:
            raise NotImplementedError(
                "only PNG/BMP decode natively; other formats need "
                "PIL/opencv, not available in this container — run with "
                "fake=True for the deterministic stub")
        raw = np.frombuffer(payload, dtype=np.uint8)
        reps = -(-(w * h * c) // len(raw))
        return np.tile(raw, reps)[: w * h * c].reshape(h, w, c)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tensors, ws, hs, cs = [], [], [], []
        for payload, w, h, c in zip(batch["payload"].to_pylist(),
                                    batch["meta_w"].to_pylist(),
                                    batch["meta_h"].to_pylist(),
                                    batch["meta_channels"].to_pylist()):
            px = self._decode_one(payload, w, h, c)
            tensors.append(px.tobytes())
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            cs.append(px.shape[2])
        out = batch.drop_columns(["payload"])
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


class DecodeAudio:
    """Actor-pool stage: audio payload → waveform column. Real decode
    needs an audio codec (absent); ``fake=True`` interprets the raw
    payload bytes as a little-endian int16 waveform (deterministic)."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "audio decode requires a codec library, not available in "
                "this container — run with fake=True for the stub")
        out = []
        for payload in batch["payload"].to_pylist():
            n = len(payload) // 2 * 2
            out.append(payload[:n])
        t = batch.drop_columns(["payload"])
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
    pipeline. Real containers need a codec (absent in this image);
    ``fake=True`` interprets the payload as raw concatenated
    frames*h*w*c bytes, exercising the REAL Ray plumbing: per-actor
    setup, row-expanding map_batches (1 video → n frames), byte-capped
    batches. Uniform-shape batches slice via ONE reshape + stride
    gather; zero Python per frame."""

    def __init__(self, every: int = 4, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "video decode requires a codec library, not available "
                "in this container")
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
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
                   out_w: int = 16, out_h: int = 16):
    """decode → resize → featurize as chained actor-pool stages (media
    stages keep genuine actor pools: a real decoder/model holds codec
    state / weights per actor)."""
    ds = ds.map_batches(DecodeImage, fn_constructor_kwargs=dict(fake=fake),
                        batch_format="pyarrow", batch_size=MEDIA_BATCH_ROWS,
                        concurrency=concurrency, num_cpus=1)
    ds = ds.map_batches(ResizeImage,
                        fn_constructor_kwargs=dict(out_w=out_w, out_h=out_h),
                        batch_format="pyarrow", batch_size=MEDIA_BATCH_ROWS,
                        concurrency=concurrency, num_cpus=1)
    return ds.map_batches(ImageFeatures, batch_format="pyarrow",
                          batch_size=MEDIA_BATCH_ROWS,
                          concurrency=concurrency, num_cpus=1)
