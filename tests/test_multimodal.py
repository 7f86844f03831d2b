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
