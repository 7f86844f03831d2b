"""Reference-semantics quirk micro-fixtures (FIXTURES.md §5).

Each test pins one behavioral quirk of the reference that the engine
must preserve (or deliberately deviates from, with the deviation
documented in the operator's docstring).
"""

import numpy as np
import pandas as pd
import pytest

from pythongis_ray import fixtures, relational as rel, spatial
from pythongis_ray.geom import algo, wkb


def rect_wkb(x0, y0, x1, y1):
    return wkb.encode_polygon([np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)])


def test_join_duplicate_right_fields_dropped(ray_session):
    """Reference drops right-side columns whose names collide
    (/root/reference/pythongis/vector/data.py:1040-1043)."""
    import ray.data as rd

    left = pd.DataFrame({"k": [1, 2], "name": ["L1", "L2"]})
    right = pd.DataFrame({"k": [1, 2], "name": ["R1", "R2"], "extra": [9, 8]})
    out = rel.hash_join(rd.from_pandas(left), right, on="k").to_pandas()
    assert out.name.tolist() == ["L1", "L2"]  # left wins, right 'name' dropped
    assert out.extra.tolist() == [9, 8]


def test_spatial_join_duplicate_zone_field_dropped(ray_session):
    import ray.data as rd

    pts = pd.DataFrame({"pid": [1], "name": ["left"], "lon": [5.0], "lat": [5.0]})
    zones = pd.DataFrame({"zone_id": [0], "name": ["zone"],
                          "geometry": [rect_wkb(0, 0, 10, 10)]})
    out = spatial.spatial_join(rd.from_pandas(pts), zones,
                               predicate="within").to_pandas()
    assert out.name.tolist() == ["left"]
    # with rsuffix the right column survives renamed
    out2 = spatial.spatial_join(rd.from_pandas(pts), zones,
                                predicate="within", rsuffix="_r").to_pandas()
    assert out2.name_r.tolist() == ["zone"]


def test_null_geometry_rows_never_match(ray_session):
    """Null geometries pass through spatial ops unmatched (reference
    skips them, manager.py:303-307,393-398)."""
    import ray.data as rd

    pts = pd.DataFrame({
        "pid": [1, 2],
        "geometry": [wkb.encode_point(5.0, 5.0), None],
    })
    zones = pd.DataFrame({"zone_id": [0], "geometry": [rect_wkb(0, 0, 10, 10)]})
    inner = spatial.spatial_join(rd.from_pandas(pts), zones,
                                 predicate="within",
                                 geometry_col="geometry").to_pandas()
    assert inner.pid.tolist() == [1]
    left = spatial.spatial_join(rd.from_pandas(pts), zones, predicate="within",
                                geometry_col="geometry", how="left").to_pandas()
    assert sorted(left.pid.tolist()) == [1, 2]
    assert left[left.pid == 2].zone_id.isna().all()


def test_keepall_null_padding(ray_session):
    """keepall (left outer) pads unmatched rows with nulls on every
    right column (reference manager.py:425-429)."""
    import ray.data as rd

    pts = pd.DataFrame({"pid": [1, 2], "lon": [5.0, 50.0], "lat": [5.0, 50.0]})
    zones = pd.DataFrame({"zone_id": [0], "zname": ["z"],
                          "geometry": [rect_wkb(0, 0, 10, 10)]})
    out = spatial.spatial_join(rd.from_pandas(pts), zones, predicate="within",
                               how="left").to_pandas().sort_values("pid")
    assert out.zone_id.isna().tolist() == [False, True]
    assert out.zname.isna().tolist() == [False, True]


def test_clip_geometrycollection_type_filter():
    """clip='intersection' keeps only the area-dimension result
    (reference filters GeometryCollections to the dimension type,
    manager.py:243-266): clipping two rects that only share an edge
    yields None (a line, not a polygon)."""
    subj = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    clip = np.array([[10, 0], [20, 0], [20, 10], [10, 10], [10, 0]], float)
    out = algo.clip_polygon_convex(subj, clip)
    # degenerate (zero-area) overlap must not yield a polygon
    assert out is None or algo.polygon_area([out]) == 0.0


def test_missing_values_dropped_in_aggregation(ray_session):
    """sql.aggreg drops missing values per stat (sql.py:103-118)."""
    import ray.data as rd

    df = pd.DataFrame({"k": [1, 1, 1], "v": [2.0, None, 4.0]})
    out = rel.groupby_aggregate(rd.from_pandas(df), "k",
                                [("n", "v", "count"), ("s", "v", "sum"),
                                 ("m", "v", "mean")]).to_pandas()
    r = out.iloc[0]
    assert r.n == 2 and r.s == 6.0 and r.m == 3.0


def test_all_missing_group_yields_null(ray_session):
    """Documented deviation: all-missing group → NULL (the reference
    returns '' — see relational.py docstring)."""
    import ray.data as rd

    df = pd.DataFrame({"k": [1, 1], "v": [None, None], "o": [1, 2]})
    out = rel.groupby_aggregate(rd.from_pandas(df), "k",
                                [("first_v", "v", "first")],
                                order_col="o").to_pandas()
    assert out.first_v.isna().all()


def test_dedup_keeps_first_geometry(ray_session):
    """duplicates(): exact-geometry dedup keeps the FIRST feature's
    attributes per geometry group (data.py:990-1015)."""
    import ray.data as rd

    g1 = wkb.encode_point(1.0, 2.0)
    g2 = wkb.encode_point(3.0, 4.0)
    df = pd.DataFrame({"fid": [10, 11, 12], "geometry": [g1, g1, g2],
                       "attr": ["a", "b", "c"]})

    # geometry-keyed dedup via content hash of the WKB bytes
    def add_key(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["gkey"] = [bytes(x).hex() for x in b.geometry]
        return b

    ds = rd.from_pandas(df).map_batches(add_key, batch_format="pandas")
    out = rel.dedup(ds, "gkey", order_col="fid").to_pandas().sort_values("fid")
    assert out.fid.tolist() == [10, 12]
    assert out.attr.tolist() == ["a", "c"]


def test_numeric_coercion_drops_nonnumeric(ray_session):
    """Numeric stats on a string column coerce via float() and drop
    non-numeric values (reference sql.py:120-122)."""
    import ray.data as rd

    df = pd.DataFrame({"k": [1, 1, 1, 1],
                       "pop_str": ["10", "x", "30", None],
                       "o": [1, 2, 3, 4]})
    # algebraic (partial) path
    out = rel.groupby_aggregate(rd.from_pandas(df), "k",
                                [("s", "pop_str", "sum"),
                                 ("n", "pop_str", "count")]).to_pandas()
    assert out.s.iloc[0] == 40.0
    assert out.n.iloc[0] == 3  # count stays raw: non-missing, uncoerced
    # holistic path
    out2 = rel.groupby_aggregate(rd.from_pandas(df), "k",
                                 [("m", "pop_str", "mean"),
                                  ("first_raw", "pop_str", "first")],
                                 order_col="o").to_pandas()
    assert out2.m.iloc[0] == 20.0
    assert out2.first_raw.iloc[0] == "10"  # non-numeric stats keep raw values
