"""Multimodal columns: image/audio/video as opaque binary + metadata.

Brief contract: treat media as ``payload: binary`` columns with typed
metadata; implement decode / feature-extract / resize / frame-sample as
actor-pool ``map_batches`` stages. The image/audio codec libraries are
NOT in this container, so the decode kernel is STUBBED (explicit
``NotImplementedError`` unless ``fake=True`` selects the deterministic
fake decoder) — the Ray-side plumbing (schema, batch sizing for wide
binary rows, actor signature, output layout) is real and tested.

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
        if kind == "image":
            rows.append({"id": i, "kind": "image", "payload": payload,
                         "meta_w": np.int32(64), "meta_h": np.int32(48),
                         "meta_channels": np.int32(3)})
        else:
            rows.append({"id": i, "kind": "audio", "payload": payload,
                         "meta_sr": np.int32(16000),
                         "meta_samples": np.int64(payload_bytes)})
    return pd.DataFrame(rows)


class DecodeImage:
    """Actor-pool stage: payload → decoded pixel tensor column.

    Real decode requires PIL/opencv (absent in this container):
    ``fake=False`` raises NotImplementedError at the decode call site;
    ``fake=True`` produces a deterministic pseudo-decode (payload bytes
    hashed into a (h, w, c) uint8 tensor) so downstream stages are
    exercised end to end.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode_one(self, payload: bytes, w: int, h: int, c: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/opencv, not available in this "
                "container — run with fake=True for the deterministic stub")
        raw = np.frombuffer(payload, dtype=np.uint8)
        reps = -(-(w * h * c) // len(raw))
        return np.tile(raw, reps)[: w * h * c].reshape(h, w, c)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tensors = []
        for payload, w, h, c in zip(batch["payload"].to_pylist(),
                                    batch["meta_w"].to_pylist(),
                                    batch["meta_h"].to_pylist(),
                                    batch["meta_channels"].to_pylist()):
            tensors.append(self._decode_one(payload, w, h, c).tobytes())
        out = batch.drop_columns(["payload"])
        return out.append_column("pixels", pa.array(tensors, pa.binary()))


class ResizeImage:
    """Actor-pool stage: nearest-neighbour resize of decoded tensors
    (pure numpy — real, not stubbed)."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for buf, w, h, c in zip(batch["pixels"].to_pylist(),
                                batch["meta_w"].to_pylist(),
                                batch["meta_h"].to_pylist(),
                                batch["meta_channels"].to_pylist()):
            a = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c)
            yi = (np.arange(self.out_h) * h // self.out_h)
            xi = (np.arange(self.out_w) * w // self.out_w)
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
    model would be loaded once in __init__."""

    def __init__(self, hist_bins: int = 8):
        self.bins = hist_bins
        self.edges = np.linspace(0, 256, hist_bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
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


def frame_sample(batch: pa.Table, every: int = 4) -> pa.Table:
    """Video frame sampling analog: keep every k-th row (deterministic
    subsample on id)."""
    ids = batch["id"].to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(ids % every == 0))


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
