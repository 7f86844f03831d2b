import numpy as np

from pythongis_ray import grid


def test_pack_unpack_roundtrip():
    ix = np.array([0, 5, 2047], dtype=np.int64)
    iy = np.array([0, 7, 1023], dtype=np.int64)
    c = grid.pack(10, ix, iy)
    r, x, y = grid.unpack(c)
    assert (r == 10).all() and (x == ix).all() and (y == iy).all()


def test_point_to_cell_bounds_roundtrip():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    c = grid.point_to_cell(lon, lat, res=9)
    xmin, ymin, xmax, ymax = grid.cell_bounds(c)
    assert (lon >= xmin).all() and (lon < xmax).all()
    assert (lat >= ymin).all() and (lat < ymax).all()


def test_lon_wrap_lat_clamp():
    c1 = grid.point_to_cell(np.array([180.0]), np.array([0.0]), res=5)
    c2 = grid.point_to_cell(np.array([-180.0]), np.array([0.0]), res=5)
    assert c1[0] == c2[0]
    cp = grid.point_to_cell(np.array([0.0]), np.array([90.0]), res=5)
    _, _, iy = grid.unpack(cp)
    assert iy[0] == (1 << 5) - 1


def test_parent_children():
    c = grid.point_to_cell(np.array([10.0]), np.array([20.0]), res=8)
    p = grid.parent(c)
    kids = grid.children(int(p[0]))
    assert int(c[0]) in set(int(k) for k in kids)
    r, _, _ = grid.unpack(p)
    assert r[0] == 7


def test_k_ring_counts_and_membership():
    c = grid.point_to_cell(np.array([0.0]), np.array([0.0]), res=6)
    ring = grid.k_ring(c, 1)
    assert ring.shape == (1, 9)
    assert int(c[0]) in set(int(x) for x in ring[0])
    assert len(set(int(x) for x in ring[0])) == 9  # interior cell: no clamping dups


def test_bboxes_to_cells_cover():
    # one bbox spanning 2x2 cells at res 5 (cell size 5.625 deg)
    xmin = np.array([0.5])
    ymin = np.array([0.5])
    xmax = np.array([6.0])
    ymax = np.array([6.0])
    rows, cells = grid.bboxes_to_cells(xmin, ymin, xmax, ymax, res=5)
    assert (rows == 0).all()
    assert len(cells) == 4
    # every corner's containing cell must be in the cover
    for x, y in [(0.5, 0.5), (6.0, 0.5), (0.5, 6.0), (6.0, 6.0)]:
        cc = grid.point_to_cell(np.array([x]), np.array([y]), res=5)
        assert int(cc[0]) in set(int(c) for c in cells)


def test_cover_scalar_coarsens():
    cells = grid.bbox_to_cells(-170, -80, 170, 80, res=10, max_cells=64)
    assert len(cells) <= 64


def test_cell_pyramid_levels_consistent(ray_session):
    """Every pyramid level sums to the point count, and each parent
    cell's count equals the sum of its children's."""
    from pythongis_ray import queries

    out = queries.get_queries()["cell_pyramid"]("/root/testdata/sf0.001") \
        .to_pandas()
    n_pts = out[out.res == queries.PYR_BASE_RES].n_points.sum()
    for r in range(queries.PYR_MIN_RES, queries.PYR_BASE_RES + 1):
        assert out[out.res == r].n_points.sum() == n_pts
    for r in range(queries.PYR_MIN_RES + 1, queries.PYR_BASE_RES + 1):
        child = out[out.res == r].copy()
        child["pix"] = child.cell_ix // 2
        child["piy"] = child.cell_iy // 2
        rolled = child.groupby(["pix", "piy"]).n_points.sum()
        parent = out[out.res == r - 1].set_index(["cell_ix", "cell_iy"]) \
            .n_points
        assert rolled.sort_index().equals(parent.sort_index())


def test_geohash_cells_vs_float_encoder(ray_session):
    """q_geohash_cells vs the classic float-bisection geohash encoder
    (exact on the dyadic lattice — every midpoint is a dyadic
    rational, representable and comparable exactly in float64)."""
    import pandas as pd
    from pythongis_ray import fixtures
    from pythongis_ray import queries as q

    def encode(lon, lat, nchars=4):
        alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
        lo, hi = -180.0, 180.0
        la, lb = -90.0, 90.0
        bits = []
        for i in range(nchars * 5):
            if i % 2 == 0:
                mid = (lo + hi) / 2
                bits.append(lon >= mid)
                lo, hi = (mid, hi) if lon >= mid else (lo, mid)
            else:
                mid = (la + lb) / 2
                bits.append(lat >= mid)
                la, lb = (mid, lb) if lat >= mid else (la, mid)
        v = 0
        for b in bits:
            v = v * 2 + int(b)
        return "".join(alpha[(v >> (5 * (nchars - 1 - c))) & 31]
                       for c in range(nchars))

    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber"])
    pk = li.l_orderkey.to_numpy("int64") * 8 \
        + li.l_linenumber.to_numpy("int64")
    ix, iy = fixtures.geocode_units(pk)
    lon, lat = fixtures.units_to_deg(np.asarray(ix), np.asarray(iy))
    want = {}
    for o, a in zip(lon, lat):
        g = encode(float(o), float(a))
        want[g] = want.get(g, 0) + 1
    got = q.q_geohash_cells("/root/testdata/sf0.001").to_pandas()
    have = dict(zip(got.geohash, got.n.astype(int)))
    assert have == want
