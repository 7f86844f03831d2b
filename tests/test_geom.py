import pandas as pd
import numpy as np
import pytest

from pythongis_ray.geom import algo, geodesy, wkb


def rect_ring(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64)


class TestWKB:
    def test_point_roundtrip(self):
        b = wkb.encode_point(12.5, -7.25)
        g = wkb.decode(b)
        assert g["type"] == "Point"
        assert g["rings"][0].tolist() == [[12.5, -7.25]]

    def test_points_vectorized_roundtrip(self):
        lon = np.array([0.0, -179.5, 179.5, 12.125])
        lat = np.array([0.0, -89.5, 89.5, -45.0625])
        col = wkb.encode_points(lon, lat)
        lo, la = wkb.decode_points(list(col))
        assert (lo == lon).all() and (la == lat).all()

    def test_points_vectorized_arrow_fastpath(self):
        import pyarrow as pa

        lon = np.linspace(-170, 170, 100)
        lat = np.linspace(-80, 80, 100)
        col = pa.array(list(wkb.encode_points(lon, lat)), type=pa.binary())
        lo, la = wkb.decode_points(col)
        assert (lo == lon).all() and (la == lat).all()

    def test_polygon_roundtrip_with_hole(self):
        outer = rect_ring(0, 0, 10, 10)
        hole = rect_ring(4, 4, 6, 6)
        b = wkb.encode_polygon([outer, hole])
        g = wkb.decode(b)
        assert g["type"] == "Polygon"
        assert len(g["rings"]) == 2
        assert np.array_equal(g["rings"][0], outer)

    def test_multipolygon(self):
        b = wkb.encode_multi("MultiPolygon", [[rect_ring(0, 0, 1, 1)], [rect_ring(5, 5, 6, 6)]])
        g = wkb.decode(b)
        assert g["type"] == "MultiPolygon"
        assert len(g["rings"]) == 2
        assert g["ring_part"] == [0, 1]

    def test_bbox(self):
        b = wkb.encode_polygon([rect_ring(-3, 2, 7, 9)])
        assert wkb.bbox(b) == (-3, 2, 7, 9)


class TestPIP:
    def test_rect_interior_boundary_exterior(self):
        ring = rect_ring(0, 0, 10, 10)
        px = np.array([5.0, 0.0, 5.0, -1.0, 10.0, 15.0])
        py = np.array([5.0, 5.0, 0.0, 5.0, 10.0, 5.0])
        inside = algo.points_in_ring(px, py, ring)
        onb = algo.points_on_ring(px, py, ring)
        # interior
        assert inside[0] and not onb[0]
        # boundary points are on-ring
        assert onb[1] and onb[2] and onb[4]
        # exterior
        assert not inside[3] and not onb[3]
        assert not inside[5] and not onb[5]

    def test_hole(self):
        poly = algo.PreparedPolygon([rect_ring(0, 0, 10, 10), rect_ring(4, 4, 6, 6)])
        px = np.array([5.0, 2.0])
        py = np.array([5.0, 2.0])
        cov = poly.covers_points(px, py)
        assert not cov[0] and cov[1]  # hole center excluded

    def test_diamond_matches_halfplane_formula(self):
        # dyadic-lattice exactness: ray-cast PIP of a diamond must agree
        # with the closed-form b|dx|+a|dy| < ab test on every lattice point
        cx, cy, a, b = 0.0, 0.0, 15000.5 / 1024, 10000.5 / 1024
        ring = np.array([[cx + a, cy], [cx, cy + b], [cx - a, cy], [cx, cy - b], [cx + a, cy]])
        poly = algo.PreparedPolygon([ring])
        rng = np.random.default_rng(7)
        ix = rng.integers(-20000, 20000, 5000)
        iy = rng.integers(-15000, 15000, 5000)
        px = ix / 1024.0
        py = iy / 1024.0
        expect = (b * np.abs(px - cx) + a * np.abs(py - cy)) < a * b
        got = poly.covers_points(px, py)
        assert (got == expect).all()

    def test_vertex_ray_crossing(self):
        # horizontal ray passing exactly through a vertex must not double count
        ring = np.array([[0, 0], [2, 2], [4, 0], [2, -2], [0, 0]], dtype=np.float64)
        px = np.array([2.0, -1.0, 5.0])
        py = np.array([0.0, 0.0, 0.0])  # same y as left/right vertices
        inside = algo.points_in_ring(px, py, ring)
        assert inside[0] and not inside[1] and not inside[2]


class TestMeasures:
    def test_area_with_hole(self):
        assert algo.polygon_area([rect_ring(0, 0, 10, 10), rect_ring(4, 4, 6, 6)]) == 96.0

    def test_length(self):
        assert algo.line_length(np.array([[0.0, 0.0], [3.0, 4.0], [3.0, 8.0]])) == 9.0

    def test_centroid_rect(self):
        cx, cy = algo.polygon_centroid([rect_ring(2, 2, 6, 10)])
        assert (cx, cy) == (4.0, 6.0)

    def test_distance_to_polygon(self):
        poly = algo.PreparedPolygon([rect_ring(0, 0, 10, 10)])
        d = poly.distance_points(np.array([5.0, 13.0, 13.0]), np.array([5.0, 5.0, 14.0]))
        assert d[0] == 0.0
        assert d[1] == 3.0
        assert d[2] == 5.0


class TestPolyPoly:
    def test_overlap_and_disjoint(self):
        a = algo.PreparedPolygon([rect_ring(0, 0, 10, 10)])
        b = algo.PreparedPolygon([rect_ring(5, 5, 15, 15)])
        c = algo.PreparedPolygon([rect_ring(20, 20, 30, 30)])
        assert algo.polygons_intersect(a, b)
        assert not algo.polygons_intersect(a, c)

    def test_touch_only(self):
        a = algo.PreparedPolygon([rect_ring(0, 0, 10, 10)])
        b = algo.PreparedPolygon([rect_ring(10, 0, 20, 10)])
        assert algo.polygons_intersect(a, b)  # shares an edge → intersects

    def test_containment_no_edge_crossing(self):
        a = algo.PreparedPolygon([rect_ring(0, 0, 10, 10)])
        b = algo.PreparedPolygon([rect_ring(4, 4, 6, 6)])
        assert algo.polygons_intersect(a, b)
        assert algo.polygons_intersect(b, a)


class TestClip:
    def test_rect_clip(self):
        subj = rect_ring(0, 0, 10, 10)
        clip = rect_ring(5, 5, 15, 15)
        out = algo.clip_polygon_convex(subj, clip)
        assert out is not None
        assert algo.polygon_area([out]) == 25.0

    def test_clip_empty(self):
        assert algo.clip_polygon_convex(rect_ring(0, 0, 1, 1), rect_ring(5, 5, 6, 6)) is None


class TestGeodesy:
    def test_vincenty_known_distance(self):
        # 1 degree along the equator: canonical WGS84 geodesic 111,319.491 m
        d = geodesy.vincenty_inverse_m(np.array([0.0]), np.array([0.0]),
                                       np.array([1.0]), np.array([0.0]))
        assert abs(d[0] - 111319.491) < 0.01
        # 1 degree along a meridian from the equator: 110,574.389 m
        d = geodesy.vincenty_inverse_m(np.array([0.0]), np.array([0.0]),
                                       np.array([0.0]), np.array([1.0]))
        assert abs(d[0] - 110574.389) < 0.01

    def test_vincenty_zero(self):
        d = geodesy.vincenty_inverse_m(np.array([10.0]), np.array([10.0]),
                                       np.array([10.0]), np.array([10.0]))
        assert d[0] == 0.0

    def test_direct_inverse_roundtrip(self):
        lon2, lat2 = geodesy.vincenty_direct(np.array([10.0]), np.array([45.0]),
                                             np.array([60.0]), np.array([100000.0]))
        d = geodesy.vincenty_inverse_m(np.array([10.0]), np.array([45.0]), lon2, lat2)
        assert abs(d[0] - 100000.0) < 0.01

    def test_haversine_equator_degree(self):
        d = geodesy.haversine_m(np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([0.0]))
        assert abs(d[0] - 111195.0) < 10.0

    def test_buffer_ring_radius(self):
        ring = geodesy.geodetic_point_buffer(10.0, 50.0, 50000.0, n=16)
        assert ring.shape == (17, 2)
        d = geodesy.vincenty_inverse_m(np.full(16, 10.0), np.full(16, 50.0),
                                       ring[:-1, 0], ring[:-1, 1])
        assert np.allclose(d, 50000.0, atol=0.01)


class TestPolylinePredicates:
    RECT = algo.PreparedPolygon([np.array([[0.0, 0.0], [10.0, 0.0],
                                           [10.0, 10.0], [0.0, 10.0],
                                           [0.0, 0.0]])])

    def p(self, pts, pred):
        return algo.polyline_polygon_predicate(np.asarray(pts, float),
                                               self.RECT, pred)

    def test_crossing_segment(self):
        seg = [[-5.0, 5.0], [15.0, 5.0]]  # slices through
        assert self.p(seg, "intersects") and self.p(seg, "crosses")
        assert not self.p(seg, "within") and not self.p(seg, "touches")

    def test_inside_segment(self):
        seg = [[2.0, 2.0], [8.0, 8.0]]
        assert self.p(seg, "intersects") and self.p(seg, "within")
        assert not self.p(seg, "crosses") and not self.p(seg, "touches")

    def test_outside_segment(self):
        seg = [[20.0, 20.0], [30.0, 25.0]]
        assert self.p(seg, "disjoint")
        assert not self.p(seg, "intersects")

    def test_half_in_half_out(self):
        seg = [[5.0, 5.0], [15.0, 5.0]]
        assert self.p(seg, "crosses") and self.p(seg, "intersects")
        assert not self.p(seg, "within")

    def test_touch_edge_from_outside(self):
        seg = [[10.0, 5.0], [20.0, 5.0]]  # endpoint on right edge
        assert self.p(seg, "touches") and self.p(seg, "intersects")
        assert not self.p(seg, "crosses") and not self.p(seg, "within")

    def test_collinear_along_edge(self):
        seg = [[2.0, 0.0], [8.0, 0.0]]  # lies on bottom edge
        assert self.p(seg, "touches") and self.p(seg, "intersects")
        assert not self.p(seg, "crosses")

    def test_corner_graze(self):
        seg = [[-5.0, 15.0], [15.0, -5.0]]  # passes through (5,5)? no:
        # line x+y=10 touches the corner (10,0)-(0,10) diagonal... it
        # passes THROUGH the rect interior
        assert self.p(seg, "crosses")
        seg2 = [[10.0, 10.0], [20.0, 20.0]]  # endpoint at corner
        assert self.p(seg2, "touches")

    def test_multi_vertex_polyline(self):
        line = [[-5.0, 5.0], [5.0, 5.0], [5.0, 15.0]]  # enters and exits
        assert self.p(line, "crosses")


class TestClipPolylineRect:
    def test_horizontal_exact(self):
        pts = np.array([[-5.0, 5.0], [15.0, 5.0]])
        pieces = algo.clip_polyline_rect(pts, 0.0, 0.0, 10.0, 10.0)
        assert len(pieces) == 1
        assert pieces[0].tolist() == [[0.0, 5.0], [10.0, 5.0]]
        assert algo.line_length(pieces[0]) == 10.0

    def test_vertical_exact(self):
        pts = np.array([[5.0, -3.0], [5.0, 4.0]])
        pieces = algo.clip_polyline_rect(pts, 0.0, 0.0, 10.0, 10.0)
        assert pieces[0].tolist() == [[5.0, 0.0], [5.0, 4.0]]

    def test_fully_inside(self):
        pts = np.array([[1.0, 1.0], [2.0, 3.0], [4.0, 2.0]])
        pieces = algo.clip_polyline_rect(pts, 0.0, 0.0, 10.0, 10.0)
        assert len(pieces) == 1 and pieces[0].shape == (3, 2)

    def test_fully_outside(self):
        pts = np.array([[20.0, 20.0], [30.0, 30.0]])
        assert algo.clip_polyline_rect(pts, 0.0, 0.0, 10.0, 10.0) == []

    def test_reentrant(self):
        # exits the top then re-enters: two pieces
        pts = np.array([[1.0, 9.0], [3.0, 13.0], [5.0, 9.0]])
        pieces = algo.clip_polyline_rect(pts, 0.0, 0.0, 10.0, 10.0)
        assert len(pieces) == 2

    def test_complement_partitions_length(self):
        pts = np.array([[-5.0, 5.0], [15.0, 5.0]])
        inside = algo.clip_polyline_rect(pts, 0.0, 0.0, 10.0, 10.0)
        outside = algo.clip_polyline_rect_complement(pts, 0.0, 0.0, 10.0, 10.0)
        li = sum(algo.line_length(p) for p in inside)
        lo = sum(algo.line_length(p) for p in outside)
        assert li + lo == algo.line_length(pts) == 20.0
        assert li == 10.0 and lo == 10.0


class TestIsAxisRect:
    def test_detects_rect(self):
        r = np.array([[1.0, 2.0], [5.0, 2.0], [5.0, 7.0], [1.0, 7.0], [1.0, 2.0]])
        assert algo.is_axis_rect(r) == (1.0, 2.0, 5.0, 7.0)

    def test_rejects_diamond(self):
        d = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0], [1.0, 0.0]])
        assert algo.is_axis_rect(d) is None


class TestUnionRects:
    def test_disjoint(self):
        area, parts = algo.union_rects(np.array([[0, 0, 1, 1], [5, 5, 6, 7]],
                                                float))
        assert area == 1.0 + 2.0
        assert len(parts) == 2

    def test_overlapping_pair(self):
        area, parts = algo.union_rects(np.array([[0, 0, 2, 2], [1, 0, 3, 2]],
                                                float))
        assert area == 6.0          # 3 wide x 2 tall
        assert len(parts) == 1
        assert parts[0] == (0.0, 0.0, 3.0, 2.0)

    def test_touching_merge(self):
        area, parts = algo.union_rects(np.array([[0, 0, 1, 1], [1, 0, 2, 1]],
                                                float))
        assert area == 2.0 and len(parts) == 1

    def test_l_shape(self):
        # vertical + horizontal bar: union area = 3 + 3 - 1 overlap
        area, parts = algo.union_rects(np.array([[0, 0, 1, 3], [0, 0, 3, 1]],
                                                float))
        assert area == 5.0
        assert sum((x1 - x0) * (y1 - y0) for x0, y0, x1, y1 in parts) == 5.0

    def test_nested(self):
        area, parts = algo.union_rects(np.array([[0, 0, 4, 4], [1, 1, 2, 2]],
                                                float))
        assert area == 16.0 and len(parts) == 1

    def test_montecarlo_area(self):
        rng = np.random.default_rng(3)
        rects = []
        for _ in range(12):
            x0, y0 = rng.integers(0, 20, 2)
            rects.append([x0, y0, x0 + rng.integers(1, 8),
                          y0 + rng.integers(1, 8)])
        rects = np.asarray(rects, float)
        area, parts = algo.union_rects(rects)
        # exact check on the integer grid
        cov = np.zeros((30, 30), bool)
        for x0, y0, x1, y1 in rects.astype(int):
            cov[x0:x1, y0:y1] = True
        assert area == float(cov.sum())
        # parts are disjoint and cover the same area
        psum = sum((x1 - x0) * (y1 - y0) for x0, y0, x1, y1 in parts)
        assert psum == area


class TestDecodeFlat:
    def test_matches_scalar_decode(self):
        geoms = [
            wkb.encode_point(3.0, 4.0),
            wkb.encode_linestring(np.array([[0.0, 0.0], [1.0, 2.0], [3.0, 1.0]])),
            None,
            wkb.encode_polygon([rect_ring(0, 0, 4, 4), rect_ring(1, 1, 2, 2)]),
            wkb.encode_multi("MultiLineString",
                             [np.array([[0.0, 0], [1, 1]]),
                              np.array([[5.0, 5], [6, 5], [6, 6]])]),
            wkb.encode_multi("MultiPolygon",
                             [[rect_ring(0, 0, 1, 1)], [rect_ring(2, 2, 3, 3)]]),
        ]
        flat = wkb.decode_flat(geoms)
        assert flat["valid"].tolist() == [True, True, False, True, True, True]
        # reconstruct per-feature rings and compare to scalar decode
        for i, g in enumerate(geoms):
            if g is None:
                continue
            want = wkb.decode(g)
            sel = np.flatnonzero(flat["ring_feat"] == i)
            got_rings = [flat["pts"][flat["ring_off"][r]:flat["ring_off"][r + 1]]
                         for r in sel]
            assert len(got_rings) == len(want["rings"])
            for a, b in zip(got_rings, want["rings"]):
                np.testing.assert_array_equal(a, b)
            assert [int(flat["ring_part"][r]) for r in sel] == list(want["ring_part"])

    def test_arrow_input(self):
        import pyarrow as pa
        geoms = pa.array([wkb.encode_linestring(np.array([[0.0, 0], [2, 2]])),
                          None], pa.binary())
        flat = wkb.decode_flat(geoms)
        assert flat["valid"].tolist() == [True, False]
        np.testing.assert_array_equal(flat["pts"], [[0, 0], [2, 2]])

    def test_points_vs_flat_polygons(self):
        # two squares as flat closed-ring segments
        rings = [rect_ring(0, 0, 2, 2), rect_ring(10, 10, 12, 12)]
        pts = np.vstack(rings)
        off = np.array([0, 5, 10])
        keep = np.ones(10, bool)
        keep[off[1:] - 1] = False
        sa_idx = np.flatnonzero(keep)
        sa, sb = pts[sa_idx], pts[sa_idx + 1]
        grp = np.repeat([0, 1], 4)
        qx = np.array([1.0, 11.0, 5.0, 0.0])
        qy = np.array([1.0, 11.0, 5.0, 1.0])
        inside, onb = algo.points_vs_flat_polygons(qx, qy, sa, sb, grp, 2)
        np.testing.assert_array_equal(
            inside, [[True, False], [False, True],
                     [False, False], [False, False]])
        np.testing.assert_array_equal(
            onb, [[False, False], [False, False],
                  [False, False], [True, False]])


class TestUnionPolygonsExact:
    """geom.union: GEOS-free exact polygon union (rational slab sweep)."""

    def d(self, cx, cy, r):
        return np.array([[cx - r, cy], [cx, cy - r], [cx + r, cy],
                         [cx, cy + r], [cx - r, cy]], np.float64)

    def test_rect_overlap_area_matches_sweep(self):
        from pythongis_ray.geom import union as gu
        a, parts = gu.union_polygons_exact(
            [[rect_ring(0, 0, 4, 4)], [rect_ring(2, 2, 6, 6)]])
        ar, _ = algo.union_rects(np.array([[0, 0, 4, 4], [2, 2, 6, 6]]))
        assert a == ar == 28.0
        assert len(parts) == 1          # connected components

    def test_disjoint_and_edge_sharing(self):
        from pythongis_ray.geom import union as gu
        a, parts = gu.union_polygons_exact(
            [[rect_ring(0, 0, 1, 1)], [rect_ring(5, 5, 6, 6)]])
        assert a == 2.0 and len(parts) == 2
        a, parts = gu.union_polygons_exact(
            [[rect_ring(0, 0, 2, 2)], [rect_ring(2, 0, 4, 2)]])
        assert a == 8.0 and len(parts) == 1
        # merged ring is the joint rect, collinear joints removed
        np.testing.assert_array_equal(
            parts[0][0], [[0, 0], [4, 0], [4, 2], [0, 2], [0, 0]])

    def test_diamonds_closed_form(self):
        from pythongis_ray.geom import union as gu
        r1, r2, step = 3.0, 2.5, 4.0
        a, parts = gu.union_polygons_exact(
            [[self.d(0, 0, r1)], [self.d(step, 0, r2)]])
        ov = r1 + r2 - step
        assert a == 2 * r1 * r1 + 2 * r2 * r2 - ov * ov / 2
        assert len(parts) == 1

    def test_holes_even_odd(self):
        from pythongis_ray.geom import union as gu
        big = [rect_ring(0, 0, 10, 10), rect_ring(3, 3, 7, 7)]
        a, parts = gu.union_polygons_exact([big])
        assert a == 84.0 and len(parts) == 1
        a, parts = gu.union_polygons_exact([big, [rect_ring(3, 3, 7, 7)]])
        assert a == 100.0 and len(parts) == 1

    def test_triangles_rational_crossings(self):
        from pythongis_ray.geom import union as gu
        t1 = np.array([[0, 0], [4, 0], [0, 4], [0, 0]], np.float64)
        t2 = np.array([[1, 1], [5, 1], [5, 5], [1, 1]], np.float64)
        a, parts = gu.union_polygons_exact([[t1], [t2]])
        # 8 + 8 − overlap(1): exact rational even with non-lattice
        # edge crossings
        assert a == 15.0 and len(parts) == 1


class TestProjections:
    """geom.proj: Snyder-series UTM + ellipsoidal LAEA (no pyproj in
    env). Expected values cross-checked against an independent
    6th-order Krüger (Karney) transverse-Mercator series — the two
    formulations agree to ~0.4 mm."""

    def test_utm_known_point(self):
        from pythongis_ray.geom import proj
        x, y = proj.utm_forward(np.array([2.2945]), np.array([48.8584]), 31)
        assert abs(x[0] - 448252.0014) < 0.01
        assert abs(y[0] - 5411954.910) < 0.01

    def test_utm_central_meridian_and_south(self):
        from pythongis_ray.geom import proj
        x, y = proj.utm_forward(np.array([3.0]), np.array([45.0]), 31)
        assert abs(x[0] - 500000.0) < 1e-6
        xs, ys = proj.utm_forward(np.array([3.0]), np.array([-45.0]), 31)
        assert ys[0] > 4e6    # false northing applied

    def test_utm_roundtrip(self):
        from pythongis_ray.geom import proj
        rng = np.random.default_rng(0)
        lon = rng.uniform(0.5, 5.5, 1000)
        lat = rng.uniform(-79, 84, 1000)
        x, y = proj.utm_forward(lon, lat, 31)
        lon2, lat2 = proj.utm_inverse(x, y, 31, northern=lat >= 0)
        assert np.abs(lon2 - lon).max() < 1e-8
        assert np.abs(lat2 - lat).max() < 1e-8

    def test_laea_roundtrip_and_equal_area(self):
        from pythongis_ray.geom import geodesy, proj
        rng = np.random.default_rng(1)
        lon = rng.uniform(-30, 50, 1000)
        lat = rng.uniform(20, 75, 1000)
        x, y = proj.laea_forward(lon, lat, 10.0, 52.0)
        lon2, lat2 = proj.laea_inverse(x, y, 10.0, 52.0)
        assert np.abs(lon2 - lon).max() < 1e-8
        assert np.abs(lat2 - lat).max() < 1e-8
        # the defining property: planar area == ellipsoidal area
        # (straight LAEA chords vs ellipsoidal edges differ at
        # O(edge²), so use a small square)
        ring = np.array([[10.0, 48.0], [10.1, 48.0], [10.1, 48.1],
                         [10.0, 48.1], [10.0, 48.0]])
        ell = geodesy.geodetic_polygon_area_m2([ring])
        xs, ys = proj.laea_forward(ring[:, 0], ring[:, 1], 10.0, 52.0)
        planar = 0.5 * abs(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))
        assert abs(planar - ell) / ell < 2e-6


class TestClipPolylinePolygon:
    def test_matches_rect_fast_path(self):
        rng = np.random.default_rng(9)
        poly = algo.PreparedPolygon([rect_ring(-4, -4, 4, 4)])
        for _ in range(60):
            pts = rng.uniform(-8, 8, (rng.integers(2, 6), 2)).round(2)
            for mode, rectfn in (
                    ("intersection", algo.clip_polyline_rect),
                    ("difference", algo.clip_polyline_rect_complement)):
                want = rectfn(pts, -4, -4, 4, 4)
                got = algo.clip_polyline_polygon(pts, poly, mode)
                assert len(want) == len(got), (mode, pts)
                for a, b in zip(want, got):
                    np.testing.assert_allclose(a, b, atol=1e-12)

    def test_diamond_zone_closed_form(self):
        d = np.array([[-4.0, 0], [0, -4], [4, 0], [0, 4], [-4, 0]])
        poly = algo.PreparedPolygon([d])
        # horizontal line through the middle: inside piece is [-4, 4]
        line = np.array([[-10.0, 0.0], [10.0, 0.0]])
        inside = algo.clip_polyline_polygon(line, poly, "intersection")
        assert len(inside) == 1
        np.testing.assert_array_equal(inside[0], [[-4, 0], [4, 0]])
        outside = algo.clip_polyline_polygon(line, poly, "difference")
        assert len(outside) == 2
        np.testing.assert_array_equal(outside[0], [[-10, 0], [-4, 0]])
        np.testing.assert_array_equal(outside[1], [[4, 0], [10, 0]])
        # total length is conserved
        tot = sum(algo.line_length(p) for p in inside + outside)
        assert tot == 20.0

    def test_hole_splits_interior_piece(self):
        poly = algo.PreparedPolygon([rect_ring(0, 0, 10, 10),
                                     rect_ring(4, 4, 6, 6)])
        line = np.array([[-2.0, 5.0], [12.0, 5.0]])
        inside = algo.clip_polyline_polygon(line, poly, "intersection")
        assert [p.tolist() for p in inside] == \
            [[[0, 5], [4, 5]], [[6, 5], [10, 5]]]
        outside = algo.clip_polyline_polygon(line, poly, "difference")
        assert [p.tolist() for p in outside] == \
            [[[-2, 5], [0, 5]], [[4, 5], [6, 5]], [[10, 5], [12, 5]]]


def test_convex_hull_ccw_vs_bruteforce():
    """Monotone-chain hull matches the O(n^3) edge characterization
    (all other points strictly left or collinear-strictly-between),
    is CCW, and handles degenerate inputs."""
    import numpy as np

    from pythongis_ray.geom import algo

    rng = np.random.default_rng(3)

    def hull_edges_brute(pts):
        pts = np.unique(pts, axis=0)
        edges = set()
        for a in map(tuple, pts):
            for b in map(tuple, pts):
                if a == b:
                    continue
                ok = True
                for q in map(tuple, pts):
                    if q in (a, b):
                        continue
                    cr = ((b[0] - a[0]) * (q[1] - a[1])
                          - (b[1] - a[1]) * (q[0] - a[0]))
                    if cr > 0:
                        continue
                    if cr == 0:
                        dot = ((q[0] - a[0]) * (b[0] - a[0])
                               + (q[1] - a[1]) * (b[1] - a[1]))
                        l2 = ((b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2)
                        if 0 < dot < l2:
                            continue
                    ok = False
                    break
                if ok:
                    edges.add((a, b))
        return edges

    cases = [
        rng.integers(0, 50, (30, 2)),          # many interior + dup risk
        rng.integers(0, 6, (40, 2)),           # heavy duplicates/collinear
        np.array([[0, 0]]),                    # single point
        np.array([[2, 3], [7, 1]]),            # two points
        np.array([[0, 0], [2, 2], [5, 5], [9, 9]]),   # all collinear
        np.array([[0, 0], [4, 0], [8, 0], [4, 3]]),   # collinear hull edge
    ]
    for pts in cases:
        h = algo.convex_hull_ccw(pts)
        m = len(h)
        got = set()
        if m >= 2:
            for i in range(m):
                a, b = tuple(h[i]), tuple(h[(i + 1) % m])
                got.add((a, b))
        assert got == hull_edges_brute(pts), pts
        if m >= 3:   # CCW: twice signed area positive
            x, y = h[:, 0], h[:, 1]
            a2 = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
            assert a2 > 0


def test_min_enclosing_circle_vs_bruteforce():
    """MEC kernel matches an O(n^4) Fraction-exact reference (all
    pair/triple circles, min feasible) on random lattice inputs plus
    degenerate cases."""
    import itertools
    from fractions import Fraction

    import numpy as np

    from pythongis_ray.geom import algo

    def brute(pts):
        pts = [tuple(map(int, p))
               for p in np.unique(np.asarray(pts), axis=0)]
        cands = []
        for a, b in itertools.combinations(pts, 2):
            cands.append((Fraction(a[0] + b[0], 2),
                          Fraction(a[1] + b[1], 2),
                          Fraction((a[0] - b[0]) ** 2
                                   + (a[1] - b[1]) ** 2, 4)))
        for a, b, c in itertools.combinations(pts, 3):
            d0 = 2 * ((b[0] - a[0]) * (c[1] - a[1])
                      - (b[1] - a[1]) * (c[0] - a[0]))
            if d0 == 0:
                continue
            b2 = (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
            c2 = (c[0] - a[0]) ** 2 + (c[1] - a[1]) ** 2
            ux = Fraction((c[1] - a[1]) * b2 - (b[1] - a[1]) * c2, d0)
            uy = Fraction((b[0] - a[0]) * c2 - (c[0] - a[0]) * b2, d0)
            cands.append((a[0] + ux, a[1] + uy, ux * ux + uy * uy))
        best = None
        for cx, cy, r2 in cands:
            if all((x - cx) ** 2 + (y - cy) ** 2 <= r2 for x, y in pts):
                if best is None or r2 < best[2]:
                    best = (cx, cy, r2)
        return best

    rng = np.random.default_rng(5)
    for _ in range(30):
        pts = rng.integers(0, 60, (int(rng.integers(2, 12)), 2))
        cxn, cyn, cd, r2f = algo.min_enclosing_circle(pts)
        bx, by, br2 = brute(pts)
        assert Fraction(cxn, cd) == bx and Fraction(cyn, cd) == by, pts
        assert r2f == br2.numerator // br2.denominator, pts
    assert algo.min_enclosing_circle(np.array([[3, 4]])) == (3, 4, 1, 0)
    assert algo.min_enclosing_circle(
        np.array([[0, 0], [2, 2], [6, 6]])) == (3, 3, 1, 18)


class TestConicProjections:
    """geom.proj Albers Equal-Area Conic + Lambert Conformal Conic
    (Snyder PP1395 ch. 14/15, ellipsoidal 2SP). Verified against the
    projections' DEFINING invariants — properties no wrong formula
    satisfies: exact local equal-area (Albers), local conformality +
    unit scale on both standard parallels (both)."""

    ALB = (-96.0, 23.0, 29.5, 45.5)        # CONUS Albers
    LCC = (-96.0, 23.0, 33.0, 45.0)

    def test_roundtrips(self):
        from pythongis_ray.geom import proj
        rng = np.random.default_rng(1)
        lon = rng.uniform(-120, -70, 1000)
        lat = rng.uniform(20, 50, 1000)
        for fwd, inv, args in (
                (proj.albers_forward, proj.albers_inverse, self.ALB),
                (proj.lcc_forward, proj.lcc_inverse, self.LCC)):
            x, y = fwd(lon, lat, *args)
            lon2, lat2 = inv(x, y, *args)
            assert np.abs(lon2 - lon).max() < 1e-9
            assert np.abs(lat2 - lat).max() < 1e-9

    def test_albers_equal_area_invariant(self):
        from pythongis_ray.geom import proj
        dl = 1e-3
        for lam, phi in ((-100.0, 35.0), (-80.0, 28.0), (-110.0, 47.0)):
            cl = np.array([lam, lam + dl, lam + dl, lam])
            cp = np.array([phi, phi, phi + dl, phi + dl])
            x, y = proj.albers_forward(cl, cp, *self.ALB)
            planar = 0.5 * abs(np.dot(x, np.roll(y, -1))
                               - np.dot(y, np.roll(x, -1)))
            q1 = proj._q_authalic(np.sin(np.radians(phi)))
            q2 = proj._q_authalic(np.sin(np.radians(phi + dl)))
            ell = proj.A ** 2 / 2 * np.radians(dl) * (q2 - q1)
            assert abs(planar / ell - 1) < 1e-6

    def test_lcc_conformal_invariant(self):
        from pythongis_ray.geom import proj
        d = 1e-6
        for lam, phi in ((-100.0, 35.0), (-85.0, 44.0)):
            x0, y0 = proj.lcc_forward(lam, phi, *self.LCC)
            xl, yl = proj.lcc_forward(lam + d, phi, *self.LCC)
            xp, yp = proj.lcc_forward(lam, phi + d, *self.LCC)
            sin_p = np.sin(np.radians(phi))
            N = proj.A / np.sqrt(1 - proj.E2 * sin_p ** 2)
            M = proj.A * (1 - proj.E2) / (1 - proj.E2 * sin_p ** 2) ** 1.5
            kl = np.hypot(xl - x0, yl - y0) \
                / (np.radians(d) * N * np.cos(np.radians(phi)))
            kp = np.hypot(xp - x0, yp - y0) / (np.radians(d) * M)
            assert abs(kl / kp - 1) < 1e-6      # isotropic scale
            cosang = ((xl - x0) * (xp - x0) + (yl - y0) * (yp - y0)) \
                / (np.hypot(xl - x0, yl - y0) * np.hypot(xp - x0, yp - y0))
            assert abs(cosang) < 1e-6           # meridian ⟂ parallel

    def test_unit_scale_on_standard_parallels(self):
        from pythongis_ray.geom import proj
        d = 1e-6
        for fwd, args, (p1, p2) in (
                (proj.albers_forward, self.ALB, (29.5, 45.5)),
                (proj.lcc_forward, self.LCC, (33.0, 45.0))):
            for phi_s in (p1, p2):
                x0, y0 = fwd(-96.0, phi_s, *args)
                xl, yl = fwd(-96.0 + d, phi_s, *args)
                sin_p = np.sin(np.radians(phi_s))
                N = proj.A / np.sqrt(1 - proj.E2 * sin_p ** 2)
                k = np.hypot(xl - x0, yl - y0) \
                    / (np.radians(d) * N * np.cos(np.radians(phi_s)))
                assert abs(k - 1) < 1e-7


class TestMollweide:
    """Mollweide via the authalic sphere — locked by its DEFINING
    invariants (exact local equal-area against the ellipsoid, the
    pseudocylindrical shape, the 2:1 boundary ellipse) plus global
    round-trips including the poles."""

    def test_roundtrip_global(self):
        from pythongis_ray.geom import proj
        rng = np.random.default_rng(7)
        lon = rng.uniform(-179.9, 179.9, 500)
        lat = rng.uniform(-89.9, 89.9, 500)
        x, y = proj.moll_forward(lon, lat, lon0=10.0)
        lo2, la2 = proj.moll_inverse(x, y, lon0=10.0)
        dlon = (lo2 - lon + 180.0) % 360.0 - 180.0   # date-line wrap
        assert np.max(np.abs(dlon)) < 1e-7
        assert np.max(np.abs(la2 - lat)) < 1e-7
        # poles map to (0, ±sqrt(2) R) and invert to ±90 exactly
        xp, yp = proj.moll_forward(np.array([23.0, -50.0]),
                                   np.array([90.0, -90.0]))
        assert np.allclose(xp, 0.0, atol=1e-6)
        assert np.allclose(np.abs(yp), np.sqrt(2) * proj._RQ)
        _, lap = proj.moll_inverse(xp, yp)
        assert np.allclose(lap, [90.0, -90.0])

    def test_equal_area_invariant(self):
        from pythongis_ray.geom import proj
        dl = 1e-3
        for lam, phi in ((-100.0, 35.0), (20.0, -28.0), (140.0, 62.0),
                         (0.0, 0.0)):
            cl = np.array([lam, lam + dl, lam + dl, lam])
            cp = np.array([phi, phi, phi + dl, phi + dl])
            x, y = proj.moll_forward(cl, cp)
            planar = 0.5 * abs(np.dot(x, np.roll(y, -1))
                               - np.dot(y, np.roll(x, -1)))
            q1 = proj._q_authalic(np.sin(np.radians(phi)))
            q2 = proj._q_authalic(np.sin(np.radians(phi + dl)))
            ell = proj.A ** 2 / 2 * np.radians(dl) * (q2 - q1)
            # 1e-5: unlike the conics, x varies with phi, so the
            # graticule quad has a second-order trapezoid term
            assert abs(planar / ell - 1) < 1e-5

    def test_pseudocylindrical_shape(self):
        from pythongis_ray.geom import proj
        # y depends only on latitude; x is linear in Δλ at fixed lat
        lons = np.array([-120.0, -30.0, 15.0, 45.0, 160.0])
        for phi in (-60.0, 0.0, 33.0, 71.0):
            x, y = proj.moll_forward(lons, np.full(5, phi))
            assert np.ptp(y) < 1e-9
            slopes = x / np.radians(lons)
            assert np.ptp(slopes) < 1e-6 * abs(slopes[0])
        # equator along y=0; central meridian along x=0
        xe, ye = proj.moll_forward(np.array([-90.0, 90.0]),
                                   np.zeros(2))
        assert np.allclose(ye, 0.0, atol=1e-9)
        xc, _ = proj.moll_forward(np.zeros(3),
                                  np.array([-45.0, 10.0, 80.0]))
        assert np.allclose(xc, 0.0, atol=1e-9)

    def test_boundary_ellipse(self):
        from pythongis_ray.geom import proj
        # the ±180° meridian traces the 2:1 ellipse
        # (x/(2√2R))² + (y/(√2R))² = 1
        lats = np.array([-80.0, -45.0, 0.0, 30.0, 66.0, 89.0])
        x, y = proj.moll_forward(np.full(len(lats), 180.0 - 1e-9), lats)
        r = (x / (2 * np.sqrt(2) * proj._RQ)) ** 2 \
            + (y / (np.sqrt(2) * proj._RQ)) ** 2
        assert np.max(np.abs(r - 1)) < 1e-8
        # equator endpoints at ±2√2 R
        assert abs(x[2] - 2 * np.sqrt(2) * proj._RQ) < 1.0

    def test_reproject_stage_and_warp_pair(self, ray_session):
        import ray.data as rd
        from pythongis_ray import raster, vector
        df = pd.DataFrame({"lon": [10.0, -120.0, 0.0],
                           "lat": [52.0, -33.0, 0.0]})
        out = vector.reproject(rd.from_pandas(df), "to_moll",
                               lon0=0.0).to_pandas()
        back = vector.reproject(
            rd.from_pandas(out[["x", "y"]]), "from_moll",
            lon0=0.0).to_pandas()
        assert np.max(np.abs(back.lon.to_numpy()[:, None]
                             - df.lon.to_numpy()[:, None])) < 1e-7
        fwd, inv = raster._proj_pair("moll:0")
        x, y = fwd(df.lon.to_numpy(), df.lat.to_numpy())
        lo, la = inv(x, y)
        assert np.max(np.abs(lo - df.lon.to_numpy())) < 1e-7
        assert np.max(np.abs(la - df.lat.to_numpy())) < 1e-7


class TestRobinson:
    """Robinson (published-table pseudocylindrical; the reference's
    +proj=robin demo) — locked by its DEFINING invariants: exact node
    reproduction, pole line = 0.5322x the equator, C1 spline
    continuity across nodes, pseudocylindrical shape, round trips."""

    def test_nodes_exact_and_continuous(self):
        from pythongis_ray.geom import proj
        got_x = proj._rob_spline(proj._ROB_X, proj._ROB_MX, proj._ROB_LAT)
        got_y = proj._rob_spline(proj._ROB_Y, proj._ROB_MY, proj._ROB_LAT)
        assert np.max(np.abs(got_x - proj._ROB_X)) < 1e-12
        assert np.max(np.abs(got_y - proj._ROB_Y)) < 1e-12
        eps = 1e-9
        for node in (5.0, 45.0, 85.0):
            lo, hi = np.array([node - eps]), np.array([node + eps])
            for vals, m in ((proj._ROB_X, proj._ROB_MX),
                            (proj._ROB_Y, proj._ROB_MY)):
                a = proj._rob_spline(vals, m, lo)[0]
                b = proj._rob_spline(vals, m, hi)[0]
                assert abs(a - b) < 1e-6          # value continuity
                # derivative continuity (C1 of the cubic spline)
                da = (proj._rob_spline(vals, m, lo)[0]
                      - proj._rob_spline(vals, m, lo - 1e-6)[0]) / 1e-6
                db = (proj._rob_spline(vals, m, hi + 1e-6)[0]
                      - proj._rob_spline(vals, m, hi)[0]) / 1e-6
                assert abs(da - db) < 1e-3

    def test_pole_line_ratio(self):
        from pythongis_ray.geom import proj
        xp, _ = proj.robin_forward(np.array([100.0]), np.array([90.0]))
        xe, _ = proj.robin_forward(np.array([100.0]), np.array([0.0]))
        assert abs(xp[0] / xe[0] - 0.5322) < 1e-12
        # the pole is a LINE (x != 0), unlike Mollweide's point pole
        assert xp[0] != 0.0

    def test_pseudocylindrical_and_roundtrip(self):
        from pythongis_ray.geom import proj
        lons = np.array([-120.0, -30.0, 15.0, 45.0, 160.0])
        for phi in (-60.0, 0.0, 33.0, 71.0):
            x, y = proj.robin_forward(lons, np.full(5, phi))
            assert np.ptp(y) < 1e-9               # y = f(lat) only
            slopes = x / np.radians(lons)
            assert np.ptp(slopes) < 1e-6 * abs(slopes[0])
        rng = np.random.default_rng(11)
        lon = rng.uniform(-179.9, 179.9, 500)
        lat = rng.uniform(-90.0, 90.0, 500)
        x, y = proj.robin_forward(lon, lat, lon0=10.0)
        lo2, la2 = proj.robin_inverse(x, y, lon0=10.0)
        dlon = (lo2 - lon + 180.0) % 360.0 - 180.0
        assert np.max(np.abs(dlon)) < 1e-7
        assert np.max(np.abs(la2 - lat)) < 1e-7

    def test_proj4_alias_stage(self, ray_session):
        import ray.data as rd
        from pythongis_ray import vector
        from pythongis_ray.geom import proj
        df = pd.DataFrame({"lon": [10.0, -120.0, 0.0],
                           "lat": [52.0, -33.0, 0.0]})
        out = vector.reproject(rd.from_pandas(df), "+proj=robin") \
            .to_pandas()
        ex, ey = proj.robin_forward(df.lon.to_numpy(), df.lat.to_numpy())
        assert np.allclose(out.x.to_numpy(), ex)
        assert np.allclose(out.y.to_numpy(), ey)
        back = vector.reproject(
            rd.from_pandas(out[["x", "y"]]), "+proj=robin +inv") \
            .to_pandas()
        assert np.max(np.abs(back.lon.to_numpy() - df.lon.to_numpy())) < 1e-7
        # aliases cover every implemented CRS + parameter tokens
        o2 = vector.reproject(
            rd.from_pandas(df), "+proj=utm +zone=32").to_pandas()
        from pythongis_ray.geom.proj import utm_forward
        ex2, _ = utm_forward(df.lon.to_numpy(), df.lat.to_numpy(), 32)
        assert np.allclose(o2.x.to_numpy(), ex2)
        import pytest as _pytest
        with _pytest.raises(ValueError):
            proj.parse_proj4("+proj=stere")
        # raster warp CRS token pairs with the same engine
        from pythongis_ray import raster
        fwd, inv = raster._proj_pair("robin:0")
        lo, la = inv(*fwd(df.lon.to_numpy(), df.lat.to_numpy()))
        assert np.max(np.abs(lo - df.lon.to_numpy())) < 1e-7
        assert np.max(np.abs(la - df.lat.to_numpy())) < 1e-7


class TestMinAreaRect:
    def test_obb_vs_all_pairs_brute(self):
        """Rotating calipers over the hull vs the O(n^3) brute force
        over ALL directed point pairs as flush-edge candidates."""
        from fractions import Fraction

        from pythongis_ray.geom import algo

        rng = np.random.default_rng(5)
        for _ in range(25):
            n = int(rng.integers(3, 40))
            P = np.unique(rng.integers(0, 200, (n, 2)).astype(np.int64),
                          axis=0)
            if len(P) < 3:
                continue
            x, y = P[:, 0], P[:, 1]
            # brute: every ordered pair is a candidate edge direction
            best = None
            for i in range(len(P)):
                for j in range(len(P)):
                    if i == j:
                        continue
                    dx = int(P[j, 0] - P[i, 0])
                    dy = int(P[j, 1] - P[i, 1])
                    proj = x * dx + y * dy
                    w = int(proj.max()) - int(proj.min())
                    cross = dx * (y - int(P[i, 1])) \
                        - dy * (x - int(P[i, 0]))
                    h = int(cross.max()) - min(0, int(cross.min()))
                    # flush on one side only counts when all points are
                    # on one side; general support width:
                    h = int(cross.max()) - int(cross.min())
                    a = Fraction(w * h, dx * dx + dy * dy)
                    if best is None or a < best:
                        best = a
            # engine: hull walk (CCW edges put all points at cross>=0)
            hull = algo.convex_hull_ccw(P)
            hull = np.vstack([hull, hull[:1]])   # close the cycle
            got = None
            for i in range(len(hull) - 1):
                dx = int(hull[i + 1, 0] - hull[i, 0])
                dy = int(hull[i + 1, 1] - hull[i, 1])
                proj = x * dx + y * dy
                w = int(proj.max()) - int(proj.min())
                cross = dx * (y - int(hull[i, 1])) \
                    - dy * (x - int(hull[i, 0]))
                a = Fraction(w * int(cross.max()),
                             dx * dx + dy * dy)
                if got is None or a < got:
                    got = a
            assert got == best
