"""Round trips for the columnar/row interchange sinks added in r4:
Feather (Arrow IPC), ORC, GPX, and the clean-room Avro container."""

import numpy as np
import pandas as pd
import pyarrow as pa

from pythongis_ray import sources
from pythongis_ray.geom import wkb


def _df():
    return pd.DataFrame({
        "k": np.array([-5, 0, 7, 2**40, -(2**40)], np.int64),
        "x": np.array([0.5, -1.25, 3e300, -0.0, 2.0], np.float64),
        "s": ["", "héllo", "a,b\nc", "ζ", "plain"],
    })


def _roundtrip(ray_session, writer, reader, tmp_path, with_bytes=False):
    import ray.data as rd

    df = _df()
    if with_bytes:
        df["b"] = [b"", b"\x00\xff", b"abc", b"\x80", b"x" * 100]
    n = writer(rd.from_pandas(df), str(tmp_path))
    assert n == len(df)
    back = reader(str(tmp_path)).to_pandas().sort_values("k") \
        .reset_index(drop=True)
    exp = df.sort_values("k").reset_index(drop=True)
    for c in exp.columns:
        assert list(back[c]) == list(exp[c]), c


def test_feather_roundtrip_values(ray_session, tmp_path):
    _roundtrip(ray_session, sources.write_feather, sources.read_feather,
               tmp_path / "f", with_bytes=True)


def test_orc_roundtrip_values(ray_session, tmp_path):
    _roundtrip(ray_session, sources.write_orc, sources.read_orc,
               tmp_path / "o", with_bytes=True)


def test_avro_roundtrip_values(ray_session, tmp_path):
    _roundtrip(ray_session, sources.write_avro, sources.read_avro,
               tmp_path / "a", with_bytes=True)


def test_avro_codec_primitives():
    # zigzag varint: spec examples + 64-bit extremes
    for n, b in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                 (-2, b"\x03"), (2, b"\x04")]:
        assert sources._zz_encode(n) == b
        v, pos = sources._zz_read(memoryview(b), 0)
        assert (v, pos) == (n, len(b))
    for n in (2**62, -(2**62), 123456789012345, -987654321):
        enc = sources._zz_encode(n)
        v, _ = sources._zz_read(memoryview(enc), 0)
        assert v == n


def test_gpx_roundtrip_geometry(ray_session, tmp_path):
    import ray.data as rd

    pts = np.array([[10.125, -5.5], [11.0, 0.0078125], [-179.99, 89.5]])
    df = pd.DataFrame({"tid": [42],
                       "geometry": [wkb.encode_linestring(pts)]})
    sources.write_gpx(rd.from_pandas(df), str(tmp_path / "g"))
    back = sources.read_gpx(str(tmp_path / "g")).to_pandas()
    assert back.tid.tolist() == [42]
    got = wkb.decode(bytes(back.geometry.iloc[0]))["rings"][0]
    assert np.array_equal(got, pts)


def test_mvt_codec_line_and_point():
    from pythongis_ray import mvt

    line = mvt.encode_line_feature(
        9, np.array([5, 100, 100, 0]), np.array([7, 7, 4000, 0]))
    pt = mvt.encode_point_feature(3, 4095, 0)
    tile = mvt.encode_tile([mvt.encode_layer("roads", [line]),
                            mvt.encode_layer("pts", [pt])])
    layers = mvt.decode_tile(tile)
    assert [l["name"] for l in layers] == ["roads", "pts"]
    fid, gtype, coords = layers[0]["features"][0]
    assert (fid, gtype) == (9, 2)
    assert coords == [(5, 7), (100, 7), (100, 4000), (0, 0)]
    fid2, gtype2, coords2 = layers[1]["features"][0]
    assert (fid2, gtype2, coords2) == (3, 1, [(4095, 0)])
    assert all(l["extent"] == 4096 for l in layers)
