import numpy as np
import pandas as pd
import pytest

from pythongis_ray import grid, raster

T = raster.TILE


def ramp(lon2, lat2, band):
    return (lon2 + 180.0 + band).astype(np.float32)


@pytest.fixture(scope="module")
def rast(ray_session):
    import ray.data as rd

    df = raster.make_raster(ramp, res=2, bands=1)
    return rd.from_pandas(df)


def test_make_raster_shape(rast):
    df = rast.to_pandas()
    nx, ny = grid.cell_dims(2)
    assert len(df) == nx * ny
    a = raster.bytes_to_tile(df.tile.iloc[0])
    assert a.shape == (T, T)


def test_band_math_scalar(ray_session, rast):
    out = raster.band_math_scalar(rast, "mul", 2.0).to_pandas()
    src = rast.to_pandas()
    m = {c: raster.bytes_to_tile(t) for c, t in zip(src.cell_id, src.tile)}
    for c, t in zip(out.cell_id, out.tile):
        assert np.allclose(raster.bytes_to_tile(t), m[c] * 2.0)


def test_band_math_two_rasters(ray_session):
    import ray.data as rd

    a = rd.from_pandas(raster.make_raster(ramp, res=1))
    b = rd.from_pandas(raster.make_raster(lambda lo, la, bd: np.full_like(lo, 3.0,
                                                                          dtype=np.float32), res=1))
    out = raster.band_math(a, b, "add").to_pandas()
    src = raster.make_raster(ramp, res=1)
    m = {c: raster.bytes_to_tile(t) for c, t in zip(src.cell_id, src.tile)}
    assert len(out) == len(src)
    for c, t in zip(out.cell_id, out.tile):
        assert np.allclose(raster.bytes_to_tile(t), m[c] + 3.0)


def test_nodata_propagation(ray_session):
    import ray.data as rd

    df = raster.make_raster(ramp, res=0)
    a0 = raster.bytes_to_tile(df.tile.iloc[0]).copy()
    a0[0, 0] = raster.NODATA
    df.at[0, "tile"] = raster.tile_to_bytes(a0)
    out = raster.band_math_scalar(rd.from_pandas(df), "add", 1.0).to_pandas()
    r = raster.bytes_to_tile(out[out.cell_id == df.cell_id.iloc[0]].tile.iloc[0])
    assert r[0, 0] == raster.NODATA
    assert r[0, 1] == a0[0, 1] + 1.0


def test_recode(ray_session, rast):
    out = raster.recode(rast, "lt", 10.0, 0.0).to_pandas()
    for t in out.tile:
        a = raster.bytes_to_tile(t)
        assert not ((a < 10.0) & (a != 0.0) & (a != raster.NODATA)).any()


def test_summarystats_exact(ray_session, rast):
    stats = raster.summarystats(rast)
    src = rast.to_pandas()
    allv = np.concatenate([raster.bytes_to_tile(t).ravel() for t in src.tile])
    assert stats["count"] == len(allv)
    assert np.isclose(stats["sum"], allv.sum(dtype=np.float64))
    assert stats["min"] == allv.min() and stats["max"] == allv.max()


def test_upscale_parent_grid(ray_session, rast):
    out = raster.upscale(rast).to_pandas()
    nx, ny = grid.cell_dims(1)
    assert len(out) == nx * ny
    r, _, _ = grid.unpack(out.cell_id.to_numpy().astype(np.int64).view(np.uint64))
    assert (r == 1).all()
    # mean preserved globally (uniform weights, no nodata)
    src_stats = raster.summarystats(rast)
    import ray.data as rd
    up_stats = raster.summarystats(rd.from_pandas(out))
    assert np.isclose(src_stats["mean"], up_stats["mean"], rtol=1e-6)


def test_mosaic_first_last(ray_session):
    import ray.data as rd

    a = raster.make_raster(lambda lo, la, b: np.full_like(lo, 1.0, dtype=np.float32), res=0)
    b = raster.make_raster(lambda lo, la, b: np.full_like(lo, 2.0, dtype=np.float32), res=0)
    first = raster.mosaic([rd.from_pandas(a), rd.from_pandas(b)], "first").to_pandas()
    last = raster.mosaic([rd.from_pandas(a), rd.from_pandas(b)], "last").to_pandas()
    assert all(raster.bytes_to_tile(t)[0, 0] == 1.0 for t in first.tile)
    assert all(raster.bytes_to_tile(t)[0, 0] == 2.0 for t in last.tile)


def test_rasterize_points_counts(ray_session):
    import ray.data as rd

    pts = pd.DataFrame({"lon": [10.0, 10.0, -20.0], "lat": [5.0, 5.0, -5.0]})
    out = raster.rasterize_points(rd.from_pandas(pts), res=2).to_pandas()
    total = sum(raster.bytes_to_tile(t).sum() for t in out.tile)
    assert total == 3.0
    # the duplicate point lands in one pixel with count 2
    maxv = max(raster.bytes_to_tile(t).max() for t in out.tile)
    assert maxv == 2.0


def test_vectorize_roundtrip(ray_session):
    import ray.data as rd

    df = raster.make_raster(ramp, res=0).head(1)
    out = raster.vectorize(rd.from_pandas(df)).to_pandas()
    assert len(out) == T * T
    a = raster.bytes_to_tile(df.tile.iloc[0])
    row = out[(out.col == 3) & (out.row == 5)].iloc[0]
    assert row.val == a[5, 3]
    from pythongis_ray.geom import wkb as _wkb
    g = _wkb.decode(bytes(row.geometry))
    assert g["type"] == "Polygon"


def test_zonal_statistics_tiles(ray_session):
    import ray.data as rd

    from pythongis_ray import fixtures
    import pyarrow.parquet as pq

    nation = pq.read_table("/root/testdata/sf0.001/nation.parquet").to_pandas()
    zones = fixtures.zones_from_nation(nation)
    tiles = rd.from_pandas(raster.make_raster(ramp, res=2))
    out = raster.zonal_statistics(tiles, zones[["zone_id", "geometry"]])
    assert len(out) == 25
    # oracle: regenerate pixel centers and test rect membership
    df = raster.make_raster(ramp, res=2)
    lons, lats, vals = [], [], []
    for cid, t in zip(df.cell_id, df.tile):
        xmin, ymin, xmax, ymax = (v[0] for v in grid.cell_bounds(
            np.array([cid], dtype=np.int64).view(np.uint64)))
        xs = xmin + (np.arange(T) + 0.5) * (xmax - xmin) / T
        ys = ymin + (np.arange(T) + 0.5) * (ymax - ymin) / T
        lon2, lat2 = np.meshgrid(xs, ys)
        lons.append(lon2.ravel()); lats.append(lat2.ravel())
        vals.append(raster.bytes_to_tile(t).ravel())
    lon = np.concatenate(lons); lat = np.concatenate(lats); val = np.concatenate(vals)
    for _, z in zones.head(5).iterrows():
        m = (lon > z.x0) & (lon < z.x1) & (lat > z.y0) & (lat < z.y1)
        got = out[out.zone_id == z.zone_id].iloc[0]
        assert got.cnt == m.sum()
        assert np.isclose(got.sum_val, val[m].sum(dtype=np.float64))


def test_resample_round_trip_res(ray_session):
    import ray.data as rd

    src = raster.make_raster(ramp, res=1)
    ds = rd.from_pandas(src)
    out = raster.resample_to_res(ds, src_res=1, dst_res=0).to_pandas()
    nx, ny = grid.cell_dims(0)
    assert len(out) == nx * ny
    # values must come from the source value set (nearest, no blending)
    srcvals = set(np.unique(np.concatenate(
        [raster.bytes_to_tile(t).ravel() for t in src.tile])).tolist())
    for t in out.tile:
        vals = set(np.unique(raster.bytes_to_tile(t)).tolist()) - {raster.NODATA}
        assert vals <= srcvals


def test_morphology_dilate_erode(ray_session):
    import ray.data as rd

    def spot(lon2, lat2, b):
        a = np.zeros_like(lon2, dtype=np.float32)
        return a

    df = raster.make_raster(spot, res=1)
    # put a single hot pixel in the middle of one tile
    a = raster.bytes_to_tile(df.tile.iloc[0]).copy()
    a[10, 10] = 5.0
    df.at[0, "tile"] = raster.tile_to_bytes(a)
    ds = rd.from_pandas(df)
    dil = raster.morphology(ds, "dilate").to_pandas()
    m = {c: raster.bytes_to_tile(t) for c, t in zip(dil.cell_id, dil.tile)}
    out = m[df.cell_id.iloc[0]]
    assert out[10, 10] == 5.0 and out[9, 10] == 5.0 and out[11, 11] == 5.0
    assert out[13, 13] == 0.0
    ero = raster.morphology(ds, "erode").to_pandas()
    e = {c: raster.bytes_to_tile(t) for c, t in zip(ero.cell_id, ero.tile)}
    assert e[df.cell_id.iloc[0]][10, 10] == 0.0  # single pixel eroded away


def test_morphology_halo_crosses_tiles(ray_session):
    import ray.data as rd

    def zero(lon2, lat2, b):
        return np.zeros_like(lon2, dtype=np.float32)

    df = raster.make_raster(zero, res=1)
    T = raster.TILE
    # hot pixel on the RIGHT edge of tile (0,0) → dilation must reach
    # the left edge of the tile to its right
    a = raster.bytes_to_tile(df.tile.iloc[0]).copy()
    a[5, T - 1] = 7.0
    df.at[0, "tile"] = raster.tile_to_bytes(a)
    cu = np.array([df.cell_id.iloc[0]], dtype=np.int64).view(np.uint64)
    r, ix, iy = grid.unpack(cu)
    right_cell = int(grid.pack(int(r[0]), np.array([int(ix[0]) + 1]),
                               np.array([int(iy[0])]))[0])
    ds = rd.from_pandas(df)
    dil = raster.morphology(ds, "dilate").to_pandas()
    m = {c: raster.bytes_to_tile(t) for c, t in zip(dil.cell_id, dil.tile)}
    assert m[np.uint64(right_cell).view(np.int64) if hasattr(np.uint64(right_cell), 'view') else right_cell][5, 0] == 7.0


def test_idw_and_distance(ray_session):
    pts = pd.DataFrame({"lon": [0.0, 90.0], "lat": [0.0, 0.0],
                        "value": [10.0, 20.0]})
    out = raster.idw_interpolate(pts, res=1).to_pandas()
    # pixel at a sample point ~ the sample value
    allv = np.concatenate([raster.bytes_to_tile(t).ravel() for t in out.tile])
    assert allv.min() >= 10.0 - 0.5 and allv.max() <= 20.0 + 0.5
    d = raster.distance_to_points(pts[["lon", "lat"]], res=1).to_pandas()
    dv = np.concatenate([raster.bytes_to_tile(t).ravel() for t in d.tile])
    assert dv.min() < 1.5  # some pixel close to a sample
    assert dv.max() > 50.0  # far side of the world is far


def test_smooth_mean(ray_session):
    import ray.data as rd

    df = raster.make_raster(lambda lo, la, b: np.zeros_like(lo, np.float32), res=1)
    a = raster.bytes_to_tile(df.tile.iloc[0]).copy()
    a[10, 10] = 9.0
    df.at[0, "tile"] = raster.tile_to_bytes(a)
    out = raster.smooth(rd.from_pandas(df)).to_pandas()
    m = {c: raster.bytes_to_tile(t) for c, t in zip(out.cell_id, out.tile)}
    s = m[df.cell_id.iloc[0]]
    assert np.isclose(s[10, 10], 1.0)  # 9 spread over 9 neighbours
    assert np.isclose(s[9, 9], 1.0)
    assert s[13, 13] == 0.0


def test_roll_remap(ray_session):
    import ray.data as rd

    df = raster.make_raster(ramp, res=1)
    out = raster.roll(rd.from_pandas(df), 1).to_pandas()
    assert set(out.cell_id) == set(df.cell_id)  # permutation of cells
    assert len(out) == len(df)


def test_sequence_lerp(ray_session):
    import ray.data as rd

    a = raster.make_raster(lambda lo, la, b: np.full_like(lo, 10.0, np.float32), res=0)
    b = raster.make_raster(lambda lo, la, b: np.full_like(lo, 20.0, np.float32), res=0)
    out = raster.sequence_lerp(rd.from_pandas(a), rd.from_pandas(b), 0.25).to_pandas()
    v = raster.bytes_to_tile(out.tile.iloc[0])
    assert np.allclose(v, 12.5)


def test_raster_algebra_threeway(ray_session):
    import ray.data as rd

    mk = lambda v: rd.from_pandas(raster.make_raster(
        lambda lo, la, b: np.full_like(lo, v, np.float32), res=0))
    out = raster.raster_algebra([mk(2.0), mk(3.0), mk(4.0)],
                                lambda ts: ts[0] * ts[1] + ts[2]).to_pandas()
    v = raster.bytes_to_tile(out.tile.iloc[0])
    assert np.allclose(v, 10.0)


def test_disperse_preserves_mass(ray_session):
    pts = pd.DataFrame({"lon": [10.0, -50.0], "lat": [5.0, 20.0],
                        "value": [100.0, 60.0]})
    out = raster.disperse(pts, res=2, spread=1).to_pandas()
    total = sum(raster.bytes_to_tile(t).sum(dtype=np.float64) for t in out.tile)
    assert np.isclose(total, 160.0, rtol=1e-5)


def test_resample_bilinear_reproduces_linear_field(ray_session):
    import ray.data as rd

    # bilinear interpolation of a field linear in (lon, lat) is exact
    src = raster.make_raster(lambda lon, lat, b: (2.0 * lon + 3.0 * lat)
                             .astype(np.float32), res=2)
    ds = rd.from_pandas(src)
    out = raster.resample_bilinear(ds, src_res=2, dst_res=3).to_pandas()
    from pythongis_ray import grid
    nx, ny = grid.cell_dims(3)
    assert len(out) == nx * ny
    t = raster.TILE
    checked = 0
    for _, row in out.iterrows():
        cu = np.array([np.int64(row.cell_id)], np.uint64)
        xmin, ymin, xmax, ymax = (v[0] for v in grid.cell_bounds(cu))
        if ymin < -80 or ymax > 80:
            continue  # pole rows clamp the stencil
        if xmin <= -179.0 or xmax >= 179.0:
            continue  # the test FIELD is discontinuous at the seam
        a = raster.bytes_to_tile(row.tile, t)
        xs = xmin + (np.arange(t) + 0.5) * (xmax - xmin) / t
        ys = ymin + (np.arange(t) + 0.5) * (ymax - ymin) / t
        lon2, lat2 = np.meshgrid(xs, ys)
        expect = (2.0 * lon2 + 3.0 * lat2).astype(np.float32)
        assert np.allclose(a, expect, atol=1e-3), row.cell_id
        checked += 1
    assert checked > 10


def test_resample_bilinear_nodata_propagates(ray_session):
    import ray.data as rd

    nd = raster.NODATA
    src = raster.make_raster(
        lambda lon, lat, b: np.where(lon < 0, nd, 5.0).astype(np.float32),
        res=2)
    out = raster.resample_bilinear(rd.from_pandas(src), 2, 3).to_pandas()
    from pythongis_ray import grid
    saw_nd = saw_val = False
    for _, row in out.iterrows():
        a = raster.bytes_to_tile(row.tile)
        saw_nd |= bool((a == nd).any())
        saw_val |= bool((a == 5.0).any())
    assert saw_nd and saw_val


def test_geodetic_area_rect(ray_session):
    import ray.data as rd

    from pythongis_ray import vector
    from pythongis_ray.geom import geodesy, wkb as _wkb

    ring = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0],
                     [0.0, 0.0]])
    df = pd.DataFrame({"gid": [1], "geometry": [_wkb.encode_polygon([ring])]})
    out = vector.geodetic_area(rd.from_pandas(df)).to_pandas()
    a = out.area_m2.iloc[0]
    assert abs(a / 1e6 - 12308.46) < 0.5       # known 1x1-deg equator quad
    # whole-earth closure via authalic surface
    assert abs(4 * np.pi * geodesy.AUTHALIC_RADIUS_M ** 2
               - 5.100656e14) < 1e9


def test_warp_to_mercator_lon_field(ray_session):
    import ray.data as rd

    # field = lon: bilinear sampling along lon is exact-linear, and the
    # mercator inverse gives lon = degrees(x/R) — every dst pixel must
    # read (approximately) its own longitude
    src = raster.make_raster(lambda lon, lat, b: lon.astype(np.float32),
                             res=2)
    out = raster.warp_to_mercator(rd.from_pandas(src), src_res=2, zoom=3) \
        .to_pandas()
    n = 1 << 3
    assert len(out) == n * n
    L = np.pi * raster.MERC_R
    px_m = 2 * L / (n * raster.TILE)
    t = raster.TILE
    bad = 0
    for _, row in out.iterrows():
        tx, ty = int(row.mcell) % n, int(row.mcell) // n
        xs = -L + (tx * t + np.arange(t) + 0.5) * px_m
        lon_exp = np.degrees(xs / raster.MERC_R)
        a = raster.bytes_to_tile(row.tile, t)
        # rows above |lat|>85 clamp out; compare covered rows only
        ys = -L + (ty * t + np.arange(t) + 0.5) * px_m
        _, lat_row = raster.merc_inverse(np.zeros(t), ys)
        ok_rows = np.abs(lat_row) < 84.0
        seam = (np.abs(lon_exp) > 178.0)  # antimeridian seam columns
        sub = a[np.ix_(ok_rows, ~seam)]
        exp = np.broadcast_to(lon_exp[~seam], sub.shape)
        if not np.allclose(sub, exp, atol=0.05):
            bad += 1
    assert bad == 0


def test_warp_roundtrip_forward_inverse():
    lon = np.array([-179.0, -10.0, 0.0, 45.0, 179.0])
    lat = np.array([-80.0, -45.0, 0.0, 60.0, 84.0])
    x, y = raster.merc_forward(lon, lat)
    lon2, lat2 = raster.merc_inverse(x, y)
    assert np.allclose(lon, lon2, atol=1e-9)
    assert np.allclose(lat, lat2, atol=1e-9)


def test_resample_bicubic_reproduces_linear_field(ray_session):
    import ray.data as rd

    # Catmull-Rom interpolation of a linear field is exact
    src = raster.make_raster(lambda lon, lat, b: (2.0 * lon + 3.0 * lat)
                             .astype(np.float32), res=2)
    out = raster.resample_bilinear(rd.from_pandas(src), 2, 3,
                                   method="bicubic").to_pandas()
    t = raster.TILE
    checked = 0
    for _, row in out.iterrows():
        cu = np.array([np.int64(row.cell_id)], np.uint64)
        xmin, ymin, xmax, ymax = (v[0] for v in grid.cell_bounds(cu))
        if ymin < -75 or ymax > 75 or xmin <= -178.0 or xmax >= 178.0:
            continue  # pole clamp / seam discontinuity of the FIELD
        a = raster.bytes_to_tile(row.tile, t)
        xs = xmin + (np.arange(t) + 0.5) * (xmax - xmin) / t
        ys = ymin + (np.arange(t) + 0.5) * (ymax - ymin) / t
        lon2, lat2 = np.meshgrid(xs, ys)
        expect = (2.0 * lon2 + 3.0 * lat2).astype(np.float32)
        assert np.allclose(a, expect, atol=5e-3), row.cell_id
        checked += 1
    assert checked > 10


def test_vectorize_merged(ray_session):
    import ray.data as rd

    nd = raster.NODATA

    def two_blobs(lon2, lat2, b):
        a = np.full_like(lon2, nd, dtype=np.float32)
        a[(lon2 > -10) & (lon2 < 10) & (lat2 > -10) & (lat2 < 10)] = 7.0
        a[(lon2 > 100) & (lon2 < 120) & (lat2 > 20) & (lat2 < 40)] = 9.0
        return a

    df = raster.make_raster(two_blobs, res=2)
    out = raster.vectorize_merged(rd.from_pandas(df)).to_pandas() \
        .sort_values("val").reset_index(drop=True)
    assert out.val.tolist() == [7.0, 9.0]
    # each contiguous block merges to ONE part whose area matches the
    # pixel count x pixel area
    t = raster.TILE
    px_area = (grid.cell_size_deg(2) / t) ** 2
    for _, r in out.iterrows():
        npix = sum((raster.bytes_to_tile(b) == r.val).sum()
                   for b in df.tile)
        assert np.isclose(r.union_area, npix * px_area)
        assert r.n_parts == 1


def test_rasterize_vector_general_polygon(ray_session):
    """Center-sampling burn of a NON-rect (diamond) polygon must equal
    the closed-form |dx|+|dy| membership of each cell center."""
    import ray.data as rd

    from pythongis_ray.geom import wkb as _wkb

    cx, cy = 10.0, 5.0
    a, b = 3.0, 2.0
    dia = _wkb.encode_polygon([np.array(
        [[cx + a, cy], [cx, cy + b], [cx - a, cy], [cx, cy - b],
         [cx + a, cy]])])
    ds = rd.from_pandas(pd.DataFrame({"val": [7], "geometry": [dia]}))
    out = raster.rasterize_vector(ds, value_col="val",
                                  specs=[("n", "val", "count")]).to_pandas()
    got = set(zip(out.cx, out.cy))
    exp = set()
    for gx in range(150, 250):
        for gy in range(60, 140):
            lon = (gx * 1024 + 512) / 1024.0 - 180.0
            lat = (gy * 1024 + 512) / 1024.0 - 90.0
            if abs(lon - cx) / a + abs(lat - cy) / b < 1.0:
                exp.add((gx, gy))
    assert got == exp and (out.n == 1).all()


def test_band_math_100k_tiles_is_seconds(ray_session):
    """Scale guard: the (cell_id, band) tile combine must stay
    vectorized per hash bucket — the sort-based groupby().map_groups
    formulation iterates keys in Python and takes MINUTES at 10^5
    tiles (the Ray 2.49 gotcha measured on mosaic)."""
    import time

    import ray.data as rd

    n, t = 100_000, 8
    rng = np.random.default_rng(7)
    tiles_a = np.arange(n * t * t, dtype=np.float32).reshape(n, t * t)
    tiles_b = rng.random((n, t * t), dtype=np.float32)
    mk = lambda arr: pd.DataFrame({
        "cell_id": np.arange(n, dtype=np.int64),
        "band": np.zeros(n, np.int32),
        "tile": [x.tobytes() for x in arr],
        "nodata": np.full(n, raster.NODATA)})
    a = rd.from_pandas(mk(tiles_a)).repartition(16)
    b = rd.from_pandas(mk(tiles_b)).repartition(16)
    t0 = time.time()
    out = raster.band_math(a, b, "add", t=t).to_pandas()
    wall = time.time() - t0
    assert len(out) == n
    assert wall < 120, f"tile combine took {wall:.0f}s — per-key regression"
    row = out[out.cell_id == 12345].iloc[0]
    assert np.allclose(raster.bytes_to_tile(row["tile"], t),
                       (tiles_a[12345] + tiles_b[12345]).reshape(t, t))


def test_warp_to_utm_lon_lat_field(ray_session):
    """Warp a lon-valued raster into UTM 33N: every destination pixel
    must read (approximately) the longitude of its own inverse
    projection — the same parity check as the mercator warp, through
    the generalized projected-warp path."""
    import ray.data as rd

    from pythongis_ray.geom import proj as proj_

    src = raster.make_raster(lambda lon, lat, b: lon.astype(np.float32),
                             res=2)
    # a 2x2-tile window around the zone 33 center (lon0=15, ~N45)
    x_min, y_min, cell = 200_000.0, 4_800_000.0, 4000.0
    w_px = h_px = 2 * raster.TILE
    out = raster.warp_to_projection(
        rd.from_pandas(src), src_res=2, crs="utm:33N",
        x_min=x_min, y_min=y_min, cell_m=cell,
        width_px=w_px, height_px=h_px).to_pandas()
    assert len(out) == 4
    t = raster.TILE
    for _, row in out.iterrows():
        tx, ty = int(row.dcell) % 2, int(row.dcell) // 2
        xs = x_min + (tx * t + np.arange(t) + 0.5) * cell
        ys = y_min + (ty * t + np.arange(t) + 0.5) * cell
        xm, ym = np.meshgrid(xs, ys)
        lon_exp, _ = proj_.utm_inverse(xm, ym, 33, True)
        a = raster.bytes_to_tile(row.tile, t)
        assert np.allclose(a, lon_exp, atol=0.05)


def test_warp_to_laea_round_trip(ray_session):
    import ray.data as rd

    from pythongis_ray.geom import proj as proj_

    src = raster.make_raster(lambda lon, lat, b: lat.astype(np.float32),
                             res=2)
    x_min, y_min, cell = -400_000.0, -400_000.0, 12_500.0
    w_px = h_px = raster.TILE
    out = raster.warp_to_projection(
        rd.from_pandas(src), src_res=2, crs="laea:10,52",
        x_min=x_min, y_min=y_min, cell_m=cell,
        width_px=w_px, height_px=h_px).to_pandas()
    assert len(out) == 1
    t = raster.TILE
    row = out.iloc[0]
    xs = x_min + (np.arange(t) + 0.5) * cell
    ys = y_min + (np.arange(t) + 0.5) * cell
    xm, ym = np.meshgrid(xs, ys)
    _, lat_exp = proj_.laea_inverse(xm, ym, 10.0, 52.0)
    a = raster.bytes_to_tile(row.tile, t)
    assert np.allclose(a, lat_exp, atol=0.05)


def test_warp_to_albers_and_lcc(ray_session):
    """Generalized projected warp through the new conic CRS tokens:
    destination pixels reproduce their own inverse projection."""
    import ray.data as rd

    from pythongis_ray.geom import proj as proj_

    src = raster.make_raster(lambda lon, lat, b: lat.astype(np.float32),
                             res=2)
    t = raster.TILE
    for crs, inv in (
            ("albers:-96,23,29.5,45.5",
             lambda x, y: proj_.albers_inverse(x, y, -96.0, 23.0,
                                               29.5, 45.5)),
            ("lcc:-96,23,33,45",
             lambda x, y: proj_.lcc_inverse(x, y, -96.0, 23.0,
                                            33.0, 45.0))):
        x_min, y_min, cell = -800_000.0, 1_000_000.0, 25_000.0
        out = raster.warp_to_projection(
            rd.from_pandas(src), src_res=2, crs=crs,
            x_min=x_min, y_min=y_min, cell_m=cell,
            width_px=t, height_px=t).to_pandas()
        assert len(out) == 1
        row = out.iloc[0]
        xs = x_min + (np.arange(t) + 0.5) * cell
        ys = y_min + (np.arange(t) + 0.5) * cell
        xm, ym = np.meshgrid(xs, ys)
        _, lat_exp = inv(xm, ym)
        a = raster.bytes_to_tile(row.tile, t)
        assert np.allclose(a, lat_exp, atol=0.05)


def test_viewshed_lattice_los(ray_session):
    """Viewshed invariants on the sf0.001 DEM: the observer cell is
    visible, g<=1 targets are always visible, and every blocked
    target has a genuine blocking interior lattice point."""
    import numpy as np

    from pythongis_ray import queries as q

    out = q.q_viewshed("/root/testdata/sf0.001").to_pandas()
    assert set(out.columns) == {"cx", "cy", "n", "visible"}
    assert out.visible.isin([0, 1]).all()
    # observer = max n, tie smallest (cx, cy): visible by definition
    gs = out.sort_values(["n", "cx", "cy"],
                         ascending=[False, True, True]).iloc[0]
    assert gs.visible == 1
    ox, oy, zo = int(gs.cx), int(gs.cy), int(gs.n)
    Z = {}
    for r in out.itertuples(index=False):
        Z[(r.cx, r.cy)] = r.n
    # replay the lattice rule per target
    for r in out.itertuples(index=False):
        dx, dy = r.cx - ox, r.cy - oy
        g = int(np.gcd(abs(dx), abs(dy)))
        blocked = False
        for k in range(1, g):
            zk = Z.get((ox + dx // g * k, oy + dy // g * k), 0)
            if (zk - zo) * g >= (r.n - zo) * k:
                blocked = True
                break
        assert r.visible == (0 if blocked else 1), (r.cx, r.cy)


def test_viewshed_multi_bounds_and_consistency(ray_session):
    """Multi-observer viewshed: vis_count in [0, K]; the top peak
    itself sees everything the single-observer viewshed marks
    visible (observer 1 of K is the same cell)."""
    from pythongis_ray import queries as q

    multi = q.q_viewshed_multi("/root/testdata/sf0.001").to_pandas()
    single = q.q_viewshed("/root/testdata/sf0.001").to_pandas()
    assert multi.vis_count.between(0, q.VSHED_K).all()
    j = multi.merge(single, on=["cx", "cy", "n"])
    assert len(j) == len(multi)
    # every cell visible from observer 1 has vis_count >= 1
    assert (j.loc[j.visible == 1, "vis_count"] >= 1).all()
    # observers see themselves: vis_count of the top-3 peaks >= 1
    top = multi.sort_values(["n", "cx", "cy"],
                            ascending=[False, True, True]).head(3)
    assert (top.vis_count >= 1).all()
