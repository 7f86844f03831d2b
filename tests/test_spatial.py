import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from pythongis_ray import fixtures, spatial

SF = "/root/testdata/sf0.001"


def make_points(n=2000):
    key = np.arange(n, dtype=np.int64) * 11 + 3
    ix, iy = fixtures.geocode_units(key)
    lon, lat = fixtures.units_to_deg(ix, iy)
    return pd.DataFrame({"pid": key, "lon": lon, "lat": lat,
                         "val": (key % 100).astype(np.int64)})


def oracle_rect_join(pts: pd.DataFrame, zones: pd.DataFrame) -> set:
    out = set()
    for _, z in zones.iterrows():
        m = (pts.lon > z.x0) & (pts.lon < z.x1) & (pts.lat > z.y0) & (pts.lat < z.y1)
        for pid in pts.pid[m]:
            out.add((int(pid), int(z.zone_id)))
    return out


@pytest.fixture(scope="module")
def zones():
    nation = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    return fixtures.zones_from_nation(nation)


def test_broadcast_join_matches_oracle(ray_session, zones):
    import ray.data as rd

    pts = make_points()
    ds = rd.from_pandas(pts)
    joined = spatial.spatial_join(ds, zones, predicate="within").to_pandas()
    got = set(zip(joined.pid.astype(int), joined.zone_id.astype(int)))
    assert got == oracle_rect_join(pts, zones)
    assert len(joined) > 100  # sanity: fixture produces real matches


def test_left_outer_join(ray_session, zones):
    import ray.data as rd

    pts = make_points(500)
    ds = rd.from_pandas(pts)
    joined = spatial.spatial_join(ds, zones, predicate="within", how="left").to_pandas()
    expect = oracle_rect_join(pts, zones)
    matched_pids = {p for p, _ in expect}
    # every left row appears; unmatched get null zone
    assert set(joined.pid[joined.zone_id.notna()].astype(int)) == matched_pids
    unmatched = set(pts.pid.astype(int)) - matched_pids
    assert set(joined.pid[joined.zone_id.isna()].astype(int)) == unmatched
    assert len(joined) == len(expect) + len(unmatched)


def test_semi_and_anti_join_partition(ray_session, zones):
    import ray.data as rd

    pts = make_points(800)
    ds = rd.from_pandas(pts)
    semi = spatial.spatial_where(ds, zones, predicate="intersects").to_pandas()
    anti = spatial.spatial_join(ds, zones, predicate="disjoint").to_pandas()
    matched = {p for p, _ in oracle_rect_join(pts, zones)}
    assert set(semi.pid.astype(int)) == matched
    assert set(anti.pid.astype(int)) == set(pts.pid.astype(int)) - matched
    assert len(semi) + len(anti) == len(pts)


def test_diamond_join_matches_formula(ray_session):
    import ray.data as rd

    region = pq.read_table(f"{SF}/region.parquet").to_pandas()
    dia = fixtures.diamonds_from_region(region)
    pts = make_points(3000)
    ds = rd.from_pandas(pts)
    joined = spatial.spatial_join(
        ds, dia[["region_id", "geometry"]], predicate="within").to_pandas()
    got = set(zip(joined.pid.astype(int), joined.region_id.astype(int)))
    # closed-form oracle in unit space
    ix, iy = fixtures.geocode_units(pts.pid.to_numpy())
    expect = set()
    for _, r in dia.iterrows():
        inside = (fixtures.DIA_B * np.abs(ix - r.cxu)
                  + fixtures.DIA_A * np.abs(iy - r.cyu)) < fixtures.DIA_A * fixtures.DIA_B
        for pid in pts.pid.to_numpy()[inside]:
            expect.add((int(pid), int(r.region_id)))
    assert got == expect


def test_shuffle_join_matches_broadcast(ray_session, zones):
    import ray.data as rd

    pts = make_points(1500)
    ds = rd.from_pandas(pts)
    bc = spatial.spatial_join(ds, zones, predicate="within").to_pandas()
    zds = rd.from_pandas(zones)
    # rows_per_task=20 forces the salted-split branch on the hot city
    # cells of this fixture (max cell count ~76) — verifies salting
    # preserves exact pair semantics
    from pythongis_ray import grid as _grid
    cells = _grid.point_to_cell(pts.lon.to_numpy(), pts.lat.to_numpy(),
                                spatial.DEFAULT_INDEX_RES)
    import numpy as _np
    _, counts = _np.unique(cells, return_counts=True)
    assert counts.max() > 20  # fixture really has hot cells
    sh = spatial.spatial_join_shuffle(
        rd.from_pandas(pts), zds, predicate="within", rows_per_task=20).to_pandas()
    key = lambda df: sorted(zip(df.pid.astype(int), df.zone_id.astype(int)))
    assert key(sh) == key(bc)
    # declared-dtype contract: the shuffle path must emit the SAME
    # schema as the broadcast path (round-1 regression: untyped null
    # padding promoted pk/zone_id to float64)
    assert {c: str(sh[c].dtype) for c in bc.columns} == \
        {c: str(bc[c].dtype) for c in bc.columns}


def test_shuffle_join_rejects_unsupported(ray_session, zones):
    import pytest
    import ray.data as rd

    pts = make_points(10)
    zds = rd.from_pandas(zones)
    with pytest.raises(ValueError):
        spatial.spatial_join_shuffle(rd.from_pandas(pts), zds, how="left")
    with pytest.raises(ValueError):
        spatial.spatial_join_shuffle(rd.from_pandas(pts), zds,
                                     predicate="touches")


def test_spatial_agg_exact(ray_session, zones):
    import ray.data as rd

    pts = make_points(2500)
    ds = rd.from_pandas(pts)
    out = spatial.spatial_agg(ds, zones, value_col="val", predicate="within")
    # oracle
    rows = []
    for _, z in zones.iterrows():
        m = (pts.lon > z.x0) & (pts.lon < z.x1) & (pts.lat > z.y0) & (pts.lat < z.y1)
        if m.any():
            v = pts.val[m]
            rows.append((int(z.zone_id), int(v.sum()), int(m.sum()),
                         int(v.min()), int(v.max())))
    exp = pd.DataFrame(rows, columns=["zone_id", "sum_val", "cnt", "min_val", "max_val"])
    exp = exp.sort_values("zone_id").reset_index(drop=True)
    got = out[["zone_id", "sum_val", "cnt", "min_val", "max_val"]].astype(int)
    pd.testing.assert_frame_equal(got, exp.astype(int))
    assert (out["mean_val"] == out["sum_val"] / out["cnt"]).all()


def test_knn_join_matches_bruteforce(ray_session):
    import ray.data as rd

    pts = make_points(300)
    pl_key = np.arange(50, dtype=np.int64) * 7 + 1
    ix, iy = fixtures.geocode_units(pl_key)
    plon, plat = fixtures.units_to_deg(ix, iy)
    places = pd.DataFrame({"place_id": pl_key, "lon": plon, "lat": plat})
    ds = rd.from_pandas(pts)
    out = spatial.knn_join(ds, places, k=3, id_col="place_id").to_pandas()
    # brute-force oracle with (dist, id) tie-break
    for pid in pts.pid[:20]:
        row = pts[pts.pid == pid].iloc[0]
        d2 = (row.lon - plon) ** 2 + (row.lat - plat) ** 2
        order = np.lexsort((pl_key, d2))[:3]
        got = out[out.pid == pid].sort_values("nn_rank")
        assert got.nn_id.tolist() == [int(pl_key[i]) for i in order]
    assert len(out) == 3 * len(pts)


def test_grid_knn_matches_bruteforce_direct():
    """GridKnnJoiner (expanding k-ring) must equal brute KnnJoiner
    exactly, including (distance, id) tie-breaks."""
    import pyarrow as pa

    pl_key = np.arange(3000, dtype=np.int64) * 4 + 2
    ix, iy = fixtures.geocode_units(pl_key)
    plon, plat = fixtures.units_to_deg(ix, iy)
    right = {"lon": plon, "lat": plat, "id": pl_key}
    ck = np.arange(700, dtype=np.int64) * 4 + 1
    cix, ciy = fixtures.geocode_units(ck)
    clon, clat = fixtures.units_to_deg(cix, ciy)
    batch = pa.table({"ck": ck, "lon": clon, "lat": clat})
    g = spatial.GridKnnJoiner(right, k=4)
    b = spatial.KnnJoiner(right, k=4, right_chunk=1000)
    og = g(batch).to_pandas().sort_values(["ck", "nn_rank"]).reset_index(drop=True)
    ob = b(batch).to_pandas().sort_values(["ck", "nn_rank"]).reset_index(drop=True)
    assert og.nn_id.tolist() == ob.nn_id.tolist()
    assert og.nn_dist_sq.tolist() == ob.nn_dist_sq.tolist()


def test_spatial_stats_holistic(ray_session, zones):
    import ray.data as rd

    pts = make_points(1200)
    pts["tag"] = np.where(pts.pid % 3 == 0, "a", "b")
    out = spatial.spatial_stats(
        rd.from_pandas(pts), zones,
        [("n", "val", "count"), ("maj_tag", "tag", "majority")],
        predicate="within", order_col="pid").to_pandas()
    # oracle for one zone
    z = zones.iloc[0]
    m = (pts.lon > z.x0) & (pts.lon < z.x1) & (pts.lat > z.y0) & (pts.lat < z.y1)
    if m.any():
        got = out[out.zone_id == z.zone_id].iloc[0]
        assert got.n == m.sum()
        vc = pts.tag[m].value_counts()
        best = sorted(v for v, c in vc.items() if c == vc.max())[0]
        assert got.maj_tag == best


def test_polygon_join_touch_exclusion(ray_session):
    import ray.data as rd
    from pythongis_ray.geom import wkb as _wkb

    def rect_wkb(x0, y0, x1, y1):
        return _wkb.encode_polygon([np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)])

    zones_df = pd.DataFrame({
        "zone_id": [0, 1, 2],
        "geometry": [rect_wkb(0, 0, 10, 10), rect_wkb(10, 0, 20, 10),
                     rect_wkb(40, 40, 50, 50)],
    })
    left = pd.DataFrame({
        "lid": [100],
        "geometry": [rect_wkb(5, 5, 10, 15)],  # overlaps z0, touches z1 edge
    })
    ds = rd.from_pandas(left)
    inter = spatial.spatial_join_polygons(ds, zones_df, "intersects").to_pandas()
    over = spatial.spatial_join_polygons(ds, zones_df, "overlaps").to_pandas()
    assert set(inter.zone_id) == {0, 1}   # touching counts as intersects
    assert set(over.zone_id) == {0}       # touch-only neighbour excluded


def test_shuffle_join_checkpoint_resume(ray_session, zones, tmp_path):
    """Phase-1 keyed output materialized as a resumable stage boundary:
    second run with the same checkpoint dir skips completed partitions
    and produces identical join results."""
    import os
    import ray.data as rd
    from pythongis_ray import checkpoint as ckpt

    pts = make_points(800)
    zds = rd.from_pandas(zones[["zone_id", "geometry"]])
    cdir = str(tmp_path / "phase1")
    sh1 = spatial.spatial_join_shuffle(
        rd.from_pandas(pts), zds, predicate="within", rows_per_task=20,
        num_buckets=8, checkpoint_dir=cdir).to_pandas()
    done = ckpt.completed_partitions(cdir)
    assert len(done) > 0
    # delete one partition → resume should rewrite ONLY that one
    import shutil
    victim = sorted(done)[0]
    shutil.rmtree(os.path.join(cdir, f"part={victim}"))
    os.remove(os.path.join(cdir, "_manifest", f"part-{victim}.json"))
    sh2 = spatial.spatial_join_shuffle(
        rd.from_pandas(pts), zds, predicate="within", rows_per_task=20,
        num_buckets=8, checkpoint_dir=cdir).to_pandas()
    key = lambda df: sorted(zip(df.pid.astype(int), df.zone_id.astype(int)))
    assert key(sh1) == key(sh2)
    bc = spatial.spatial_join(rd.from_pandas(pts), zones,
                              predicate="within").to_pandas()
    assert key(sh1) == key(bc)


def test_wide_rejoin_byte_identity(ray_session):
    """html/text projected out of the join and re-attached by key must
    be byte-identical (per-url invariant through the wide-row path)."""
    import pandas as _pd
    from pythongis_ray import pipelines

    out = pipelines.flagship_wide_rejoin(SF).to_pandas()
    src = _pd.read_parquet(f"{SF}/documents.parquet")
    m = dict(zip(src.doc_id, src.text))
    assert len(out) > 100
    for pid, txt, html in zip(out.page_id, out.text, out.html):
        assert m[pid] == txt
        assert bytes(html) == b"<html><body>" + txt.encode() + b"</body></html>"


def test_line_line_join(ray_session):
    import ray.data as rd

    from pythongis_ray.geom import wkb as _wkb

    def seg(a, b):
        return _wkb.encode_linestring(np.array([a, b], float))

    left = pd.DataFrame({
        "lid": [0, 1, 2, 3],
        "geometry": [
            seg((0, 0), (10, 10)),     # crosses right 0
            seg((0, 10), (10, 0)),     # crosses right 0 too
            seg((20, 20), (30, 20)),   # disjoint
            seg((5, 5), (5, 15)),      # endpoint ON right 0 (touch)
        ],
    })
    right = pd.DataFrame({
        "rid": [100, 200],
        "geometry": [seg((0, 5), (10, 5)), seg((50, 50), (60, 50))],
    })
    out = spatial.spatial_join_line_line(
        rd.from_pandas(left), right).to_pandas()
    assert set(zip(out.lid, out.rid)) == {(0, 100), (1, 100), (3, 100)}


def test_spatial_join_subkey(ray_session, zones):
    import ray.data as rd

    pts = make_points(600)
    ds = rd.from_pandas(pts)
    base = spatial.spatial_join(ds, zones, predicate="within").to_pandas()
    # extra pair predicate: only even zone ids AND val < 50
    sub = spatial.spatial_join(
        ds, zones, predicate="within",
        subkey=lambda df: (df.zone_id % 2 == 0) & (df.val < 50)).to_pandas()
    exp = base[(base.zone_id % 2 == 0) & (base.val < 50)]
    key = lambda d: sorted(zip(d.pid.astype(int), d.zone_id.astype(int)))
    assert key(sub) == key(exp)


def test_dissolve_intersection(ray_session):
    import ray.data as rd

    from pythongis_ray.geom import wkb as _wkb

    def rect(x0, y0, x1, y1):
        return _wkb.encode_polygon([np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])])

    df = pd.DataFrame({
        "g": [1, 1, 2, 2],
        "geometry": [rect(0, 0, 4, 4), rect(2, 2, 6, 6),   # overlap 2x2
                     rect(0, 0, 1, 1), rect(5, 5, 6, 6)],  # disjoint
    })
    out = spatial.dissolve(rd.from_pandas(df), "g",
                           geomfunc="intersection").to_pandas()
    assert out.g.tolist() == [1]
    assert out.inter_area.iloc[0] == 4.0


def test_line_join_multilinestring(ray_session, zones):
    import ray.data as rd

    from pythongis_ray.geom import wkb as _wkb

    z = zones.iloc[0]
    inside = np.array([[(z.x0 + z.x1) / 2, (z.y0 + z.y1) / 2],
                       [(z.x0 + z.x1) / 2 + 0.1, (z.y0 + z.y1) / 2]])
    faraway = np.array([[150.0, 80.0], [151.0, 80.0]])
    # part 2 intersects zone 0 even though part 1 is far away
    ml = _wkb.encode_multi("MultiLineString", [faraway, inside])
    df = pd.DataFrame({"lid": [1], "geometry": [ml]})
    out = spatial.spatial_join_lines(
        rd.from_pandas(df), zones[["zone_id", "geometry"]],
        predicate="intersects").to_pandas()
    assert (1, int(z.zone_id)) in set(zip(out.lid, out.zone_id))


def test_knn_join_geoms_matches_bruteforce(ray_session):
    """Grid kNN against lines == brute-force per-feature min distance
    (exact single-division kernel), ties by right id."""
    import ray.data as rd

    from pythongis_ray.geom import algo, wkb

    rng = np.random.default_rng(3)
    lines = []
    for i in range(40):
        npts = int(rng.integers(2, 5))
        pts = rng.uniform(-20, 20, (npts, 2)).round(3)
        lines.append(wkb.encode_linestring(pts))
    right = pd.DataFrame({"lid": np.arange(40, dtype=np.int64),
                          "geometry": lines})
    px = rng.uniform(-25, 25, 300).round(3)
    py = rng.uniform(-25, 25, 300).round(3)
    left = pd.DataFrame({"pid": np.arange(300, dtype=np.int64),
                         "lon": px, "lat": py})
    out = spatial.knn_join_geoms(rd.from_pandas(left), right, k=3,
                                 id_col="lid").to_pandas()
    A, B, F = [], [], []
    for i, b in enumerate(lines):
        g = wkb.decode(b)["rings"][0]
        A.append(g[:-1])
        B.append(g[1:])
        F.append(np.full(len(g) - 1, i))
    A, B, F = np.vstack(A), np.vstack(B), np.concatenate(F)
    for _, row in out.iterrows():
        d2 = algo.points_to_segments_sq_pairwise(
            np.full(len(A), row.lon), np.full(len(A), row.lat),
            A[:, 0], A[:, 1], B[:, 0], B[:, 1])
        per = np.full(40, np.inf)
        np.minimum.at(per, F, d2)
        order = np.lexsort((np.arange(40), per))
        r = int(row.nn_rank) - 1
        assert row.nn_id == order[r]
        assert row.nn_dist_sq == per[order[r]]


def test_knn_join_geoms_polygon_containment(ray_session):
    import ray.data as rd

    from pythongis_ray.geom import wkb

    polys = [wkb.encode_polygon([np.array([[0, 0], [10, 0], [10, 10],
                                           [0, 10], [0, 0]], float)]),
             wkb.encode_polygon([np.array([[20, 20], [24, 20], [24, 24],
                                           [20, 24], [20, 20]], float)])]
    rp = pd.DataFrame({"lid": np.array([7, 9], np.int64),
                       "geometry": polys})
    lp = pd.DataFrame({"pid": [0, 1], "lon": [5.0, 30.0],
                       "lat": [5.0, 30.0]})
    o2 = spatial.knn_join_geoms(rd.from_pandas(lp), rp, k=1, id_col="lid",
                                polygons=True).to_pandas()
    assert o2[o2.pid == 0].nn_dist_sq.iloc[0] == 0.0
    assert o2[o2.pid == 0].nn_id.iloc[0] == 7
    assert o2[o2.pid == 1].nn_id.iloc[0] == 9
    assert o2[o2.pid == 1].nn_dist_sq.iloc[0] == 72.0


def test_dissolve_general_intersection_diamonds(ray_session):
    """General (non-rect) dissolve intersection folds through the
    exact overlay; empty-intersection groups are dropped."""
    import ray.data as rd

    from pythongis_ray.geom import wkb

    def diamond(cx, cy, r):
        return np.array([[cx - r, cy], [cx, cy - r], [cx + r, cy],
                         [cx, cy + r], [cx - r, cy]], float)

    geoms = [wkb.encode_polygon([diamond(0, 0, 3)]),
             wkb.encode_polygon([diamond(2, 0, 3)]),
             wkb.encode_polygon([diamond(0, 0, 1)]),
             wkb.encode_polygon([diamond(10, 0, 1)])]
    df = pd.DataFrame({"grp": [0, 0, 1, 1], "geometry": geoms})
    out = spatial.dissolve(rd.from_pandas(df), "grp",
                           geomfunc="intersection").to_pandas()
    assert len(out) == 1 and out.grp.iloc[0] == 0
    assert out.inter_area.iloc[0] == 8.0


def test_line_clip_general_zone(ray_session):
    """Line clip overlay against a NON-rect (diamond) zone via the
    exact rational split-and-classify path."""
    import ray.data as rd

    from pythongis_ray.geom import algo, wkb

    zone = wkb.encode_polygon([np.array([[-4.0, 0], [0, -4], [4, 0],
                                         [0, 4], [-4, 0]])])
    zones = pd.DataFrame({"zone_id": [1], "geometry": [zone]})
    lines = pd.DataFrame({
        "lid": [0],
        "geometry": [wkb.encode_linestring(
            np.array([[-10.0, 0.0], [10.0, 0.0]]))]})
    out = spatial.spatial_join_lines(rd.from_pandas(lines), zones,
                                     predicate="intersects",
                                     clip="intersection").to_pandas()
    assert len(out) == 1 and out.clip_len.iloc[0] == 8.0
    g = wkb.decode(bytes(out.clip_geometry.iloc[0]))
    np.testing.assert_array_equal(g["rings"][0], [[-4, 0], [4, 0]])
    out2 = spatial.spatial_join_lines(rd.from_pandas(lines), zones,
                                      predicate="intersects",
                                      clip="difference").to_pandas()
    assert len(out2) == 1 and out2.clip_len.iloc[0] == 12.0


def test_lines_shuffle_matches_broadcast(ray_session):
    """The big-x-big line shuffle join must emit exactly the broadcast
    join's pair set — once per pair (canonical-cell rule), across
    multi-cell lines, hash-collided buckets and salted hot cells."""
    import ray.data as rd

    from pythongis_ray.geom import wkb

    rng = np.random.default_rng(11)
    n = 400
    ax = rng.uniform(-60, 60, n).round(2)
    ay = rng.uniform(-40, 40, n).round(2)
    bx = (ax + rng.uniform(-15, 15, n)).round(2)
    by = (ay + rng.uniform(-15, 15, n)).round(2)
    lines = pd.DataFrame({
        "lid": np.arange(n, dtype=np.int64),
        "geometry": [wkb.encode_linestring(np.array([[x1, y1], [x2, y2]]))
                     for x1, y1, x2, y2 in zip(ax, ay, bx, by)]})
    zx = rng.uniform(-60, 60, 30).round(2)
    zy = rng.uniform(-40, 40, 30).round(2)
    zones = pd.DataFrame({
        "zone_id": np.arange(30, dtype=np.int64),
        "geometry": [wkb.encode_polygon([np.array(
            [[x, y], [x + 8, y], [x + 8, y + 6], [x, y + 6], [x, y]])])
            for x, y in zip(zx, zy)]})
    for pred in ("intersects", "within", "crosses"):
        want = spatial.spatial_join_lines(
            rd.from_pandas(lines), zones, predicate=pred) \
            .to_pandas()[["lid", "zone_id"]]
        got = spatial.spatial_join_lines_shuffle(
            rd.from_pandas(lines), rd.from_pandas(zones), predicate=pred,
            num_buckets=16, rows_per_task=50) \
            .to_pandas()[["lid", "zone_id"]]
        a = set(map(tuple, want.to_numpy()))
        b = set(map(tuple, got.to_numpy()))
        assert a == b, (pred, len(a), len(b),
                        list(a - b)[:5], list(b - a)[:5])
        assert len(got) == len(b)       # exactly-once emission


def test_polygons_shuffle_matches_broadcast(ray_session):
    """Polygon-left big×big shuffle join == broadcast polygon join
    for intersects and overlaps."""
    import ray.data as rd

    from pythongis_ray.geom import wkb

    rng = np.random.default_rng(13)
    n = 300
    px = rng.uniform(-60, 60, n).round(2)
    py = rng.uniform(-40, 40, n).round(2)
    pw = rng.uniform(1, 12, n).round(2)
    ph = rng.uniform(1, 10, n).round(2)
    polys = pd.DataFrame({
        "pid": np.arange(n, dtype=np.int64),
        "geometry": [wkb.encode_polygon([np.array(
            [[x, y], [x + w, y], [x + w, y + h], [x, y + h], [x, y]])])
            for x, y, w, h in zip(px, py, pw, ph)]})
    zx = rng.uniform(-60, 60, 25).round(2)
    zy = rng.uniform(-40, 40, 25).round(2)
    zones = pd.DataFrame({
        "zone_id": np.arange(25, dtype=np.int64),
        "geometry": [wkb.encode_polygon([np.array(
            [[x, y], [x + 9, y], [x + 9, y + 7], [x, y + 7], [x, y]])])
            for x, y in zip(zx, zy)]})
    for pred in ("intersects", "overlaps"):
        want = spatial.spatial_join_polygons(
            rd.from_pandas(polys), zones, predicate=pred) \
            .to_pandas()[["pid", "zone_id"]]
        got = spatial.spatial_join_polygons_shuffle(
            rd.from_pandas(polys), rd.from_pandas(zones), predicate=pred,
            num_buckets=16, rows_per_task=40) \
            .to_pandas()[["pid", "zone_id"]]
        a = set(map(tuple, want.to_numpy()))
        b = set(map(tuple, got.to_numpy()))
        assert a == b, (pred, len(a), len(b),
                        list(a - b)[:5], list(b - a)[:5])
        assert len(got) == len(b)


def test_radius_join_geoms_matches_bruteforce(ray_session):
    import ray.data as rd

    from pythongis_ray.geom import algo, wkb

    rng = np.random.default_rng(17)
    lines = []
    for i in range(30):
        pts = rng.uniform(-20, 20, (int(rng.integers(2, 4)), 2)).round(2)
        lines.append(wkb.encode_linestring(pts))
    right = pd.DataFrame({"lid": np.arange(30, dtype=np.int64),
                          "geometry": lines})
    px = rng.uniform(-25, 25, 200).round(2)
    py = rng.uniform(-25, 25, 200).round(2)
    left = pd.DataFrame({"pid": np.arange(200, dtype=np.int64),
                         "lon": px, "lat": py})
    R = 3.0
    out = spatial.radius_join_geoms(rd.from_pandas(left), right, radius=R,
                                    id_col="lid").to_pandas()
    A, B, F = [], [], []
    for i, b in enumerate(lines):
        g = wkb.decode(b)["rings"][0]
        A.append(g[:-1])
        B.append(g[1:])
        F.append(np.full(len(g) - 1, i))
    A, B, F = np.vstack(A), np.vstack(B), np.concatenate(F)
    got = set(map(tuple, out[["pid", "nn_id"]].to_numpy()))
    want = set()
    for p in range(200):
        d2 = algo.points_to_segments_sq_pairwise(
            np.full(len(A), px[p]), np.full(len(A), py[p]),
            A[:, 0], A[:, 1], B[:, 0], B[:, 1])
        per = np.full(30, np.inf)
        np.minimum.at(per, F, d2)
        for f in np.flatnonzero(per <= R * R):
            want.add((p, f))
    assert got == want
    # reported distance is the exact per-feature min
    for _, row in out.iterrows():
        d2 = algo.points_to_segments_sq_pairwise(
            np.full(len(A), row.lon), np.full(len(A), row.lat),
            A[:, 0], A[:, 1], B[:, 0], B[:, 1])
        per = np.full(30, np.inf)
        np.minimum.at(per, F, d2)
        assert row.nn_dist_sq == per[int(row.nn_id)]


def test_lines_shuffle_checkpoint_resume(ray_session, tmp_path):
    """Killing after the phase-1 checkpoint and re-running with the
    same dir reproduces the identical pair set (resume skips the
    completed partitions)."""
    import ray.data as rd

    from pythongis_ray.geom import wkb

    rng = np.random.default_rng(21)
    n = 120
    ax = rng.uniform(-40, 40, n).round(2)
    ay = rng.uniform(-30, 30, n).round(2)
    lines = pd.DataFrame({
        "lid": np.arange(n, dtype=np.int64),
        "geometry": [wkb.encode_linestring(
            np.array([[x, y], [x + 6, y + 4]]))
            for x, y in zip(ax, ay)]})
    zones = pd.DataFrame({
        "zone_id": np.arange(10, dtype=np.int64),
        "geometry": [wkb.encode_polygon([np.array(
            [[x, y], [x + 12, y], [x + 12, y + 9], [x, y + 9], [x, y]])])
            for x, y in zip(rng.uniform(-40, 40, 10).round(2),
                            rng.uniform(-30, 30, 10).round(2))]})
    ck = str(tmp_path / "ck")
    first = spatial.spatial_join_lines_shuffle(
        rd.from_pandas(lines), rd.from_pandas(zones), num_buckets=8,
        checkpoint_dir=ck).to_pandas()
    # second run resumes from the existing checkpoint
    second = spatial.spatial_join_lines_shuffle(
        rd.from_pandas(lines), rd.from_pandas(zones), num_buckets=8,
        checkpoint_dir=ck).to_pandas()
    a = sorted(map(tuple, first[["lid", "zone_id"]].to_numpy()))
    b = sorted(map(tuple, second[["lid", "zone_id"]].to_numpy()))
    assert a == b
    want = spatial.spatial_join_lines(
        rd.from_pandas(lines), zones).to_pandas()
    c = sorted(map(tuple, want[["lid", "zone_id"]].to_numpy()))
    assert a == c


# ------------------------------------- dwithin_self_pairs (exactly-once)

def _brute_pairs(ids, ix, iy, eps):
    out = {}
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            d2 = int(ix[i] - ix[j]) ** 2 + int(iy[i] - iy[j]) ** 2
            if d2 <= eps * eps:
                a, b = sorted((int(ids[i]), int(ids[j])))
                out[(a, b)] = d2
    return out


def _pairs_df(ids, ix, iy, eps, **kw):
    import ray.data as rd
    ds = rd.from_pandas(pd.DataFrame({
        "pk": ids.astype(np.int64), "ix": ix.astype(np.int64),
        "iy": iy.astype(np.int64)}))
    got = spatial.dwithin_self_pairs(ds, "pk", "ix", "iy", eps=eps,
                                     **kw).to_pandas()
    return got


def test_dwithin_self_pairs_brute(ray_session):
    rng = np.random.default_rng(7)
    n = 600
    # clustered + uniform mix, duplicated coords, exact-eps distances
    ix = np.concatenate([rng.integers(0, 400, n // 2),
                         rng.integers(0, 100000, n // 2 - 4),
                         [500, 500 + 96, 777, 777]])
    iy = np.concatenate([rng.integers(0, 400, n // 2),
                         rng.integers(0, 100000, n // 2 - 4),
                         [9000, 9000, 42, 42]])
    ids = np.arange(n) * 3 + 1
    want = _brute_pairs(ids, ix, iy, 96)
    got = _pairs_df(ids, ix, iy, 96)
    have = {(int(a), int(b)): int(d) for a, b, d in
            zip(got["id_a"], got["id_b"], got["d2"])}
    assert len(got) == len(have), "duplicate pair emitted"
    assert have == want


def test_dwithin_self_pairs_tile_and_slab(ray_session):
    # larger tile than eps + tiny slab cap exercise the chunked path
    rng = np.random.default_rng(11)
    n = 300
    ix = rng.integers(0, 600, n)
    iy = rng.integers(0, 600, n)
    ids = np.arange(n).astype(np.int64)
    want = _brute_pairs(ids, ix, iy, 50)
    got = _pairs_df(ids, ix, iy, 50, tile=128,
                    max_candidates_per_slab=500)
    have = {(int(a), int(b)): int(d) for a, b, d in
            zip(got["id_a"], got["id_b"], got["d2"])}
    assert len(got) == len(have)
    assert have == want


def test_dwithin_self_pairs_empty(ray_session):
    got = _pairs_df(np.array([1, 2]), np.array([0, 100000]),
                    np.array([0, 100000]), 96)
    assert len(got) == 0


def test_dbscan_brute(ray_session):
    """q_dbscan vs a brute-force reference DBSCAN on sf0.001 customers."""
    from pythongis_ray import queries as q

    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(np.int64) * 4 + 1
    ix, iy = fixtures.geocode_units(ck)
    n = len(ck)
    eps2 = q.DBSCAN_EPS ** 2
    # brute neighbor counts (self included)
    nbrs = {int(k): set() for k in ck}
    for i in range(n):
        d2 = (ix - ix[i]) ** 2 + (iy - iy[i]) ** 2
        for j in np.flatnonzero(d2 <= eps2):
            if j != i:
                nbrs[int(ck[i])].add(int(ck[j]))
    core = {k for k, s in nbrs.items() if len(s) + 1 >= q.DBSCAN_MINPTS}
    # components over core-core edges (min-label)
    label = {k: k for k in core}
    changed = True
    while changed:
        changed = False
        for k in core:
            for m in nbrs[k]:
                if m in core and label[m] < label[k]:
                    label[k] = label[m]
                    changed = True
    want = {(k, label[k], 1) for k in core}
    for k, s in nbrs.items():
        if k in core:
            continue
        cs = [label[m] for m in s if m in core]
        if cs:
            want.add((k, min(cs), 0))
    got = q.q_dbscan(SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    have = {(int(a), int(b), int(c)) for a, b, c in
            zip(got["ck"], got["cluster"], got["core"])}
    assert have == want


def test_ripley_k_brute(ray_session):
    from pythongis_ray import queries as q

    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(np.int64) * 4 + 1
    ix, iy = fixtures.geocode_units(ck)
    got = q.q_ripley_k(SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    for r, np_ in zip(got["r"], got["n_pairs"]):
        n = 0
        for i in range(len(ck)):
            d2 = (ix[i+1:] - ix[i]) ** 2 + (iy[i+1:] - iy[i]) ** 2
            n += int((d2 <= int(r) * int(r)).sum())
        assert int(np_) == n


def test_dwithin_self_pairs_carry_filter(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(3)
    n = 400
    ix = rng.integers(0, 500, n).astype(np.int64)
    iy = rng.integers(0, 500, n).astype(np.int64)
    ids = np.arange(n).astype(np.int64)
    grp = (ids % 7).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame(
        {"pk": ids, "ix": ix, "iy": iy, "grp": grp}))
    got = spatial.dwithin_self_pairs(
        ds, "pk", "ix", "iy", eps=40, carry=("grp",),
        pair_filter=lambda d2, ca, cb: ca["grp"] != cb["grp"]).to_pandas()
    want = {}
    for (a, b), d2 in _brute_pairs(ids, ix, iy, 40).items():
        if a % 7 != b % 7:
            want[(a, b)] = d2
    have = {(int(a), int(b)): int(d) for a, b, d in
            zip(got["id_a"], got["id_b"], got["d2"])}
    assert have == want
    # carried columns align with the canonical order
    assert (got["grp_a"].to_numpy() == got["id_a"].to_numpy() % 7).all()
    assert (got["grp_b"].to_numpy() == got["id_b"].to_numpy() % 7).all()


def _density_grid(sf="/root/testdata/sf0.001"):
    import pandas as pd
    from pythongis_ray import fixtures
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber"])
    pk = li.l_orderkey.to_numpy(np.int64) * 8 \
        + li.l_linenumber.to_numpy(np.int64)
    ix, iy = fixtures.geocode_units(pk)
    df = pd.DataFrame({"cx": np.asarray(ix) // 8192,
                       "cy": np.asarray(iy) // 8192})
    return df.groupby(["cx", "cy"]).size().to_dict()


_D8T = ((1, 0), (-1, 0), (0, 1), (0, -1),
        (1, 1), (1, -1), (-1, 1), (-1, -1))


def _brute_flow(grid):
    """steepest-descent pointer per cell (ties by direction order)."""
    ptr = {}
    for (cx, cy), n in grid.items():
        best = None
        for d, (dx, dy) in enumerate(_D8T):
            m = grid.get((cx + dx, cy + dy))
            if m is not None and m < n and \
                    (best is None or (m, d) < best[:2]):
                best = (m, d, (cx + dx, cy + dy))
        ptr[(cx, cy)] = best[2] if best else (cx, cy)
    return ptr


def test_watershed_brute(ray_session):
    from pythongis_ray import queries as q
    grid = _density_grid()
    ptr = _brute_flow(grid)
    # brute: follow pointers to the fixpoint (sink)
    want = {}
    for c in grid:
        cur = c
        while ptr[cur] != cur:
            cur = ptr[cur]
        want[c] = cur
    got = q.q_watershed("/root/testdata/sf0.001").to_pandas()
    assert len(got) == len(grid)
    for _, r in got.iterrows():
        assert want[(r.cx, r.cy)] == (r.basin_x, r.basin_y)


def test_fill_sinks_brute(ray_session):
    from pythongis_ray import queries as q
    grid = _density_grid()
    BIG = 1 << 60
    # boundary = any missing 8-neighbor; relax to convergence
    inter = {c for c in grid
             if all((c[0] + dx, c[1] + dy) in grid for dx, dy in _D8T)}
    f = {c: (BIG if c in inter else n) for c, n in grid.items()}
    while True:
        changed = False
        for c in grid:
            if c not in inter:
                continue
            m = min(f[(c[0] + dx, c[1] + dy)] for dx, dy in _D8T)
            v = max(grid[c], m)
            if v != f[c]:
                f[c] = v
                changed = True
        if not changed:
            break
    want = {c: (grid[c], f[c]) for c in grid if f[c] > grid[c]}
    got = q.q_fill_sinks("/root/testdata/sf0.001")
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    have = {(int(r.cx), int(r.cy)): (int(r.elev), int(r.filled))
            for _, r in got.iterrows()}
    assert have == want


def test_traj_hausdorff_brute(ray_session):
    """q_traj_hausdorff's chunked reduceat kernel vs an O(n²)
    per-pair recomputation at sf0.001."""
    from pythongis_ray import fixtures
    from pythongis_ray import queries as q

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_id", "user_id"])
    ix, iy = fixtures.geocode_units(
        ev.event_id.to_numpy(np.int64) * 4 + 1)
    ev = ev.assign(ix=np.asarray(ix), iy=np.asarray(iy))
    # home tile = location of the user's smallest event_id
    first = ev.sort_values(["user_id", "event_id"]) \
        .groupby("user_id").head(1)
    home = {int(r.user_id): (int(r.ix) // q.TRAJ_CELL,
                             int(r.iy) // q.TRAJ_CELL)
            for _, r in first.iterrows()}
    pts = {u: g[["ix", "iy"]].to_numpy(np.int64)
           for u, g in ev.groupby("user_id")}

    def directed(pa_, pb_):
        return max(min(int((px - qx) ** 2 + (py - qy) ** 2)
                       for qx, qy in pb_) for px, py in pa_)

    want = {}
    users = sorted(pts)
    for i, ua in enumerate(users):
        for ub in users[i + 1:]:
            if home[ua] != home[ub]:
                continue
            want[(ua, ub)] = max(directed(pts[ua], pts[ub]),
                                 directed(pts[ub], pts[ua]))
    out = q.q_traj_hausdorff(sf)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    have = {(int(r.user_a), int(r.user_b)): int(r.h2)
            for _, r in out.iterrows()}
    assert have == want


def test_colocation_brute(ray_session):
    """q_colocation participation counts vs O(n²) recomputation."""
    from pythongis_ray import fixtures
    from pythongis_ray import queries as q

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_id", "event_type"])
    ix, iy = fixtures.geocode_units(
        ev.event_id.to_numpy(np.int64) * 4 + 1)
    x = np.asarray(ix); y = np.asarray(iy)
    et = ev.event_type.to_numpy()
    n = len(ev)
    eps2 = q.COLOC_EPS ** 2
    part = {}
    for i in range(n):
        d2 = (x - x[i]) ** 2 + (y - y[i]) ** 2
        near = (d2 <= eps2) & (et != et[i])
        near[i] = False
        for other in set(et[near]):
            part.setdefault((et[i], other), set()).add(i)
    want = {k: len(v) for k, v in part.items()}
    out = q.q_colocation(sf).to_pandas()
    have = {(r.type_a, r.type_b): int(r.n_events)
            for _, r in out.iterrows()}
    assert have == want


def test_dwithin_self_pairs_property(ray_session):
    """Randomized robustness sweep for the exactly-once tile kernel:
    duplicate coordinates, tile != eps, degenerate clusters, single
    points — every draw must equal the O(n²) reference."""
    import ray.data as rd
    rng = np.random.default_rng(17)
    for trial in range(8):
        n = int(rng.integers(1, 300))
        span = int(rng.integers(8, 600))
        eps = int(rng.integers(1, 150))
        tile = eps + int(rng.integers(0, 64))
        ix = rng.integers(0, span, n).astype(np.int64)
        iy = rng.integers(0, span, n).astype(np.int64)
        if n > 10:      # force coordinate duplicates
            ix[n // 2:n // 2 + 5] = ix[0]
            iy[n // 2:n // 2 + 5] = iy[0]
        ids = rng.permutation(n).astype(np.int64)
        ds = rd.from_pandas(pd.DataFrame(
            {"pk": ids, "ix": ix, "iy": iy}))
        got = spatial.dwithin_self_pairs(
            ds, "pk", "ix", "iy", eps=eps, tile=tile).to_pandas()
        want = _brute_pairs(ids, ix, iy, eps)
        have = {(int(a), int(b)): int(d) for a, b, d in
                zip(got["id_a"], got["id_b"], got["d2"])}
        assert have == want, (trial, n, span, eps, tile)


def test_flow_length_brute(ray_session):
    from pythongis_ray import queries as q
    grid = _density_grid()
    ptr = _brute_flow(grid)
    want = {}
    for c in grid:
        cur, hops = c, 0
        while ptr[cur] != cur:
            cur = ptr[cur]
            hops += 1
        want[c] = hops
    got = q.q_flow_length("/root/testdata/sf0.001").to_pandas()
    assert len(got) == len(grid)
    for _, r in got.iterrows():
        assert want[(r.cx, r.cy)] == r.flow_len


def test_terrain_aspect_brute(ray_session):
    from pythongis_ray import queries as q
    grid = _density_grid()
    got = q.q_terrain_aspect("/root/testdata/sf0.001").to_pandas()
    # rows = cells with all 8 neighbors
    full = {c for c in grid
            if all((c[0] + dx, c[1] + dy) in grid for dx, dy in _D8T)}
    assert set(zip(got.cx, got.cy)) == full
    for _, r in got.iterrows():
        c = (int(r.cx), int(r.cy))
        e = grid[(c[0] + 1, c[1])]
        w = grid[(c[0] - 1, c[1])]
        s = grid[(c[0], c[1] + 1)]
        n = grid[(c[0], c[1] - 1)]
        se = grid[(c[0] + 1, c[1] + 1)]
        ne = grid[(c[0] + 1, c[1] - 1)]
        sw = grid[(c[0] - 1, c[1] + 1)]
        nw = grid[(c[0] - 1, c[1] - 1)]
        gx = (ne + 2 * e + se) - (nw + 2 * w + sw)
        gy = (sw + 2 * s + se) - (nw + 2 * n + ne)
        assert r.curv == e + w + s + n - 4 * grid[c]
        if gx == 0 and gy == 0:
            assert r.aspect_oct == -1
        else:
            # octant contains the gradient angle (45-degree sectors,
            # left-closed starting at the +x axis)
            import math
            ang = math.atan2(gy, gx) % (2 * math.pi)
            lo = r.aspect_oct * math.pi / 4
            hi = lo + math.pi / 4
            eps = 1e-12
            assert lo - eps <= ang < hi + eps
