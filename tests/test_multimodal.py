import numpy as np
import pyarrow as pa
import pytest

from pythongis_ray import multimodal as mm


def test_stub_raises_without_fake():
    dec = mm.DecodeImage(fake=False)
    with pytest.raises(NotImplementedError):
        dec._decode_one(b"xx", 4, 4, 3)


def test_image_pipeline_end_to_end(ray_session):
    import ray.data as rd

    df = mm.synthesize_media(32, "image", payload_bytes=1024)
    ds = rd.from_pandas(df)
    out = mm.image_pipeline(ds, fake=True, out_w=8, out_h=8).to_pandas()
    assert len(out) == 32
    assert (out.meta_w == 8).all() and (out.meta_h == 8).all()
    f = np.asarray(out.features.iloc[0])
    assert len(f) == 3 + 3 + 8  # means + stds + hist bins
    assert np.isclose(f[6:].sum(), 1.0)  # histogram normalized
    # determinism
    out2 = mm.image_pipeline(rd.from_pandas(df), fake=True, out_w=8, out_h=8).to_pandas()
    assert np.array_equal(np.asarray(out.features.iloc[5]),
                          np.asarray(out2.features.iloc[5]))


def test_frame_sample():
    df = mm.synthesize_media(16, "image", payload_bytes=64)
    t = pa.Table.from_pandas(df)
    out = mm.frame_sample(t, every=4)
    assert out.num_rows == 4
    assert out["id"].to_pylist() == [0, 4, 8, 12]


def test_resize_nearest_semantics(ray_session):
    # a 2x2 image upscaled: nearest must replicate source pixels
    dec = mm.DecodeImage(fake=True)
    rs = mm.ResizeImage(out_w=4, out_h=4)
    src = np.arange(2 * 2 * 3, dtype=np.uint8).tobytes()
    t = pa.table({"id": [1], "pixels": [src],
                  "meta_w": [np.int32(2)], "meta_h": [np.int32(2)],
                  "meta_channels": [np.int32(3)]})
    out = rs(t)
    a = np.frombuffer(out["pixels"].to_pylist()[0], np.uint8).reshape(4, 4, 3)
    s = np.frombuffer(src, np.uint8).reshape(2, 2, 3)
    assert (a[0, 0] == s[0, 0]).all() and (a[3, 3] == s[1, 1]).all()
    assert (a[0, 1] == s[0, 0]).all()  # nearest replication


def test_uniform_stack_matches_fallback():
    """Vectorized uniform-batch kernels must equal the per-row path."""
    rng = np.random.default_rng(1)
    n, h, w, c = 6, 5, 4, 3
    bufs = [rng.integers(0, 256, h * w * c, dtype=np.uint8).tobytes()
            for _ in range(n)]
    t = pa.table({"id": list(range(n)), "pixels": bufs,
                  "meta_w": pa.array([w] * n, pa.int32()),
                  "meta_h": pa.array([h] * n, pa.int32()),
                  "meta_channels": pa.array([c] * n, pa.int32())})
    stack = mm._stack_uniform(t, "pixels")
    assert stack is not None and stack.shape == (n, h, w, c)
    feats_vec = mm.ImageFeatures()(t)["features"].to_pylist()
    # force the fallback by a mixed-shape batch of one
    for i in range(n):
        ti = t.slice(i, 1)
        a = np.frombuffer(bufs[i], np.uint8).reshape(h, w, c).astype(np.float64)
        exp_mu = a.mean(axis=(0, 1))
        assert np.allclose(feats_vec[i][:3], exp_mu)
        hist, _ = np.histogram(a, bins=np.linspace(0, 256, 9))
        assert np.allclose(feats_vec[i][6:], hist / a.size)
    # resize: vectorized equals per-row
    rs = mm.ResizeImage(out_w=2, out_h=2)
    out_vec = rs(t)["pixels"].to_pylist()
    for i in range(n):
        a = np.frombuffer(bufs[i], np.uint8).reshape(h, w, c)
        yi = np.arange(2) * h // 2
        xi = np.arange(2) * w // 2
        assert out_vec[i] == a[yi][:, xi].tobytes()


def test_audio_pipeline(ray_session):
    import ray.data as rd

    df = mm.synthesize_media(16, "audio", payload_bytes=2048)
    out = mm.audio_pipeline(rd.from_pandas(df), fake=True).to_pandas()
    assert len(out) == 16
    # oracle: per-clip numpy on the raw payload
    for i in (0, 5, 15):
        wav = np.frombuffer(df.payload.iloc[i][:2048], dtype="<i2") \
            .astype(np.float64)
        assert np.isclose(out.rms.iloc[i], np.sqrt((wav ** 2).mean()))
        assert out.peak.iloc[i] == np.abs(wav).max()
        sign = np.signbit(wav)
        assert np.isclose(out.zcr.iloc[i],
                          (sign[1:] != sign[:-1]).sum() / len(wav))


def test_audio_stub_raises(ray_session):
    import ray.data as rd

    df = mm.synthesize_media(2, "audio", payload_bytes=64)
    with pytest.raises(Exception):
        mm.audio_pipeline(rd.from_pandas(df), fake=False).to_pandas()


def test_sample_frames_uniform_and_mixed(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from pythongis_ray import multimodal as mm

    df = mm.synthesize_media(6, kind="video")
    batch = pa.Table.from_pandas(df)
    out = mm.SampleFrames(every=3)(batch)
    # 8 frames, every 3rd -> idx 0,3,6 per video
    assert out.num_rows == 6 * 3
    assert out["frame_idx"].to_pylist()[:3] == [0, 3, 6]
    # frame bytes are the exact payload slice
    fsz = 16 * 12 * 3
    src = bytes(df.payload[0])
    got = out["payload"][1].as_py()
    assert got == src[3 * fsz:4 * fsz]
    # mixed shapes take the per-row path, same framing contract
    df2 = df.copy()
    df2.loc[0, "meta_frames"] = np.int32(5)
    out2 = mm.SampleFrames(every=3)(pa.Table.from_pandas(df2))
    assert out2.num_rows == 2 + 5 * 3  # video0: idx 0,3; others: 3 each
    assert not mm.SampleFrames(every=3).__call__.__name__ == "missing"


def test_video_pipeline_end_to_end(ray_session):
    import ray.data as rd

    from pythongis_ray import multimodal as mm

    df = mm.synthesize_media(12, kind="video")
    ds = rd.from_pandas(df)
    out = mm.video_pipeline(ds, every=4).to_pandas()
    assert len(out) == 12 * 2  # frames 0 and 4 of 8
    assert {"id", "frame_idx", "mean", "std"} <= set(out.columns) or \
        {"id", "frame_idx"} <= set(out.columns)
    assert out.groupby("id").size().eq(2).all()


def test_sample_frames_real_decode_raises(ray_session):
    import pytest as _pytest

    from pythongis_ray import multimodal as mm

    with _pytest.raises(NotImplementedError):
        mm.SampleFrames(fake=False)
