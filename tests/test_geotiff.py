"""Minimal GeoTIFF reader vs the reference's real pop rasters."""
import os

import numpy as np
import pytest

from pythongis_ray import raster

NE = "/root/reference/tests/data"


@pytest.mark.skipif(not os.path.exists(f"{NE}/pop2000.tif"),
                    reason="reference data absent")
def test_read_pop2000():
    arr, meta = raster.read_geotiff(f"{NE}/pop2000.tif")
    assert arr.shape == (354, 463)
    x0, px, y0, py = meta["transform"]
    assert px > 0 and py > 0
    assert abs(px - 1 / 24) < 1e-9        # 2.5-arcmin grid
    fin = arr[np.isfinite(arr)]
    assert fin.min() >= 0.0 and fin.max() > 1e5   # population counts


@pytest.mark.skipif(not os.path.exists(f"{NE}/pop2000.tif"),
                    reason="reference data absent")
def test_geotiff_to_tiles_preserves_mass_location(ray_session):
    import ray.data as rd

    tiles = raster.geotiff_to_tiles(f"{NE}/pop2000.tif", res=4)
    ds = rd.from_pandas(tiles)
    stats = raster.summarystats(ds)
    # pop2000 covers ~Yemen (lon 44..63): nonzero pixels must exist
    assert stats["count"] > 0 and stats["max"] > 1e5
    # and a tile far away (americas) must be all nodata
    arr, meta = raster.read_geotiff(f"{NE}/pop2000.tif")
    from pythongis_ray import grid
    # pick the world tile containing lon=-100, lat=40
    vec = tiles
    cnt_far = 0
    for _, row in vec.iterrows():
        xmin, ymin, xmax, ymax = (v[0] for v in grid.cell_bounds(
            np.array([np.int64(row.cell_id)], np.uint64)))
        if xmin <= -100 <= xmax and ymin <= 40 <= ymax:
            a = raster.bytes_to_tile(row.tile)
            cnt_far = (a != row.nodata).sum()
    assert cnt_far == 0


def test_world_file_roundtrip(tmp_path):
    t = (10.0, 0.5, 60.0, 0.25)
    p = str(tmp_path / "x.wld")
    raster.write_world_file(p, t)
    assert raster.read_world_file(p) == t


@pytest.mark.skipif(not os.path.exists(f"{NE}/_land_shallow_topo_2048.wld"),
                    reason="reference data absent")
def test_read_reference_world_file_tokens():
    # the reference's sample .wld is a nonstandard 2x3 affine (and is
    # underscore-disabled in its own tests); we only assert the parser
    # tokenizes it — standard A D B E C F files are covered by the
    # roundtrip test above
    vals = [float(tok) for tok in
            open(f"{NE}/_land_shallow_topo_2048.wld").read().split()]
    assert len(vals) == 6 and vals[2] == -180.0


def test_write_geotiff_roundtrip(tmp_path):
    a = (np.arange(12, dtype=np.float32).reshape(3, 4) * 1.5)
    t = (10.0, 0.5, 60.0, 0.25)
    p = str(tmp_path / "rt.tif")
    raster.write_geotiff(p, a, t, nodata=-9.0)
    back, meta = raster.read_geotiff(p)
    assert np.array_equal(back, a.astype(np.float64))
    assert meta["transform"] == t and meta["nodata"] == -9.0


@pytest.mark.skipif(not os.path.exists(f"{NE}/pop2000.tif"),
                    reason="reference data absent")
def test_write_reference_raster_roundtrip(tmp_path):
    src, smeta = raster.read_geotiff(f"{NE}/pop2000.tif")
    p = str(tmp_path / "pop.tif")
    raster.write_geotiff(p, src.astype(np.float32), smeta["transform"])
    back, meta = raster.read_geotiff(p)
    assert np.array_equal(back, src)
    assert meta["transform"] == smeta["transform"]
