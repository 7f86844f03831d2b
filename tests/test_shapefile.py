"""Pure-python Shapefile reader/writer vs the reference's real
Natural Earth test data (read-only) + round-trip property checks."""
import os

import numpy as np
import pandas as pd
import pytest

from pythongis_ray import sources
from pythongis_ray.geom import algo, wkb

NE = "/root/reference/tests/data"


@pytest.mark.skipif(not os.path.exists(f"{NE}/ne_10m_populated_places_simple.shp"),
                    reason="reference data absent")
def test_read_real_point_shapefile():
    geoms = sources.parse_shp(f"{NE}/ne_10m_populated_places_simple.shp")
    assert len(geoms) == 7322          # Natural Earth 10m populated places
    lons, lats = wkb.decode_points([bytes(g) for g in geoms if g])
    assert -180 <= lons.min() and lons.max() <= 180
    assert -90 <= lats.min() and lats.max() <= 90


@pytest.mark.skipif(not os.path.exists(f"{NE}/ne_10m_admin_0_countries.dbf"),
                    reason="reference data absent")
def test_read_real_dbf():
    df = sources.parse_dbf(f"{NE}/ne_10m_admin_0_countries.dbf")
    assert len(df) == 255
    assert "NAME" in df.columns
    assert "Afghanistan" in set(df["NAME"])
    # numeric fields parsed as numbers
    assert df["POP_EST"].dtype == np.float64 or df["POP_EST"].dtype == np.int64


def test_point_roundtrip(tmp_path):
    df = pd.DataFrame({
        "name": ["a", "b"],
        "pop": [10, 20],
        "geometry": [wkb.encode_point(1.5, 2.5), wkb.encode_point(-3.0, 4.0)],
    })
    base = str(tmp_path / "pts")
    sources.write_shapefile(df, base + ".shp")
    back = sources.read_shapefile(base + ".shp")
    assert back["name"].tolist() == ["a", "b"]
    assert back["pop"].tolist() == [10, 20]
    lons, lats = wkb.decode_points([bytes(b) for b in back["geometry"]])
    assert lons.tolist() == [1.5, -3.0] and lats.tolist() == [2.5, 4.0]


def test_polygon_roundtrip_with_hole(tmp_path):
    outer = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0],
                      [0.0, 0.0]])[::-1]  # CW exterior (ESRI winding)
    hole = np.array([[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0],
                     [2.0, 2.0]])  # CCW hole
    df = pd.DataFrame({"gid": [7],
                       "geometry": [wkb.encode_polygon([outer, hole])]})
    base = str(tmp_path / "poly")
    sources.write_shapefile(df, base + ".shp")
    back = sources.read_shapefile(base + ".shp")
    g = wkb.decode(bytes(back["geometry"].iloc[0]))
    assert g["type"] == "Polygon" and len(g["rings"]) == 2
    assert algo.polygon_area(g["rings"]) == 100.0 - 4.0


def test_line_roundtrip(tmp_path):
    line = wkb.encode_linestring(np.array([[0.0, 0.0], [5.0, 5.0], [10.0, 0.0]]))
    df = pd.DataFrame({"gid": [1], "geometry": [line]})
    base = str(tmp_path / "ln")
    sources.write_shapefile(df, base + ".shp")
    back = sources.read_shapefile(base + ".shp")
    g = wkb.decode(bytes(back["geometry"].iloc[0]))
    assert g["type"] == "LineString"
    assert g["rings"][0].tolist() == [[0.0, 0.0], [5.0, 5.0], [10.0, 0.0]]


def test_shapefile_dataset(ray_session, tmp_path):
    df = pd.DataFrame({"v": [1, 2, 3],
                       "geometry": [wkb.encode_point(float(i), float(i))
                                    for i in range(3)]})
    base = str(tmp_path / "ds")
    sources.write_shapefile(df, base + ".shp")
    ds = sources.shapefile_dataset(base + ".shp")
    assert ds.count() == 3


def test_xlsx_roundtrip(tmp_path):
    df = pd.DataFrame({"name": ["alpha", "beta"], "n": [3, 4],
                       "x": [1.5, -2.25]})
    p = str(tmp_path / "t.xlsx")
    sources.write_xlsx(df, p)
    back = sources.read_xlsx(p)
    assert back["name"].tolist() == ["alpha", "beta"]
    assert back["n"].tolist() == [3, 4]
    assert back["x"].tolist() == [1.5, -2.25]


def test_dta_roundtrip(tmp_path):
    df = pd.DataFrame({"k": [1, 2, 3], "s": ["a", "b", "c"],
                       "v": [0.5, 1.5, 2.5]})
    p = str(tmp_path / "t.dta")
    sources.write_dta(df, p)
    back = sources.read_dta(p)
    assert back["k"].tolist() == [1, 2, 3]
    assert back["s"].tolist() == ["a", "b", "c"]
    assert back["v"].tolist() == [0.5, 1.5, 2.5]


def test_multipolygon_winding_roundtrip(tmp_path):
    """A written MultiPolygon must read back as one MultiPolygon per
    row (ESRI winding: exteriors CW, holes CCW) — CCW engine-native
    exteriors must not come back as holes."""
    import pandas as pd

    from pythongis_ray.geom import algo

    def ccw_rect(x0, y0, x1, y1):
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                        np.float64)

    mp = wkb.encode_multi("MultiPolygon",
                          [[ccw_rect(0, 0, 2, 2)], [ccw_rect(5, 5, 7, 7)]])
    hole_poly = wkb.encode_polygon([ccw_rect(10, 10, 20, 20),
                                    ccw_rect(12, 12, 14, 14)])
    df = pd.DataFrame({"fid": [1, 2], "geometry": [mp, hole_poly]})
    base = str(tmp_path / "winding")
    sources.write_shapefile(df, base + ".shp")
    back = sources.read_shapefile(base + ".shp")
    g0 = wkb.decode(bytes(back.geometry.iloc[0]))
    assert g0["type"] == "MultiPolygon"
    assert len(g0["rings"]) == 2
    assert g0["ring_part"] == [0, 1] or list(g0["ring_part"]) == [0, 1]
    # both parts are exteriors with positive area
    areas = [abs(algo.ring_area(r)) for r in g0["rings"]]
    assert sorted(areas) == [4.0, 4.0]
    g1 = wkb.decode(bytes(back.geometry.iloc[1]))
    assert g1["type"] == "Polygon"
    assert len(g1["rings"]) == 2
    # hole grouped with its exterior, not split into its own polygon
    assert abs(abs(algo.ring_area(g1["rings"][0])) - 100.0) < 1e-9
    assert abs(abs(algo.ring_area(g1["rings"][1])) - 4.0) < 1e-9


def test_geopackage_roundtrip(ray_session, tmp_path):
    """GeoPackage write → read round trip: attributes + WKB geometry
    byte-identical; the GP blob header (magic/flags/srs) parses; a
    conformant gpkg_contents/geometry_columns registry is emitted."""
    import sqlite3

    import ray.data as rd

    from pythongis_ray import sources
    from pythongis_ray.geom import wkb as _wkb

    pts = [_wkb.encode_point(float(i), float(-i)) for i in range(5)]
    df = pd.DataFrame({"name": [f"n{i}" for i in range(5)],
                       "val": np.arange(5, dtype=np.int64),
                       "score": np.arange(5) * 0.5,
                       "geometry": pts})
    p = str(tmp_path / "t.gpkg")
    n = sources.write_geopackage(rd.from_pandas(df), p, layer="pts",
                                 geometry_type="POINT")
    assert n == 5

    con = sqlite3.connect(p)
    (dt,) = con.execute("SELECT data_type FROM gpkg_contents "
                        "WHERE table_name='pts'").fetchone()
    assert dt == "features"
    (blob,) = con.execute("SELECT geom FROM pts WHERE fid=1").fetchone()
    assert blob[:2] == b"GP"
    con.close()

    out = sources.read_geopackage(p).to_pandas()
    out = out.sort_values("val").reset_index(drop=True)
    assert out["name"].tolist() == df["name"].tolist()
    assert out["val"].tolist() == df["val"].tolist()
    assert out["score"].tolist() == df["score"].tolist()
    assert [bytes(b) for b in out["geometry"]] == pts


def test_geopackage_layer_selection(ray_session, tmp_path):
    import ray.data as rd

    from pythongis_ray import sources
    from pythongis_ray.geom import wkb as _wkb

    df = pd.DataFrame({"geometry": [_wkb.encode_point(1.0, 2.0)]})
    p = str(tmp_path / "one.gpkg")
    sources.write_geopackage(rd.from_pandas(df), p, layer="only")
    # single layer: layer=None resolves it
    assert sources.read_geopackage(p).count() == 1
    with pytest.raises(ValueError):
        sources.read_geopackage(p, layer="nope")


def test_geopackage_flag_bits():
    """OGC GPB flag byte: bit 4 (0x10) = empty geometry → None;
    bit 5 (0x20) = extended GPB → explicit error, never silent."""
    import struct

    from pythongis_ray.sources import _gpkg_parse_blob

    base = b"GP\x00"
    srs = struct.pack("<i", 4326)
    wkb = b"\x01\x01\x00\x00\x00" + b"\x00" * 16
    assert _gpkg_parse_blob(base + bytes([0x01]) + srs + wkb) == wkb
    assert _gpkg_parse_blob(base + bytes([0x11]) + srs) is None
    with pytest.raises(ValueError, match="Extended"):
        _gpkg_parse_blob(base + bytes([0x21]) + srs + wkb)
    # envelope indicator 1 (xy bounds): 4 doubles skipped
    env = struct.pack("<4d", 0, 1, 0, 1)
    assert _gpkg_parse_blob(base + bytes([0x03]) + srs + env + wkb) == wkb


def test_xls_roundtrip():
    import tempfile

    from pythongis_ray import sources as S

    df = pd.DataFrame({"name": ["alpha", "béta", "c"],
                       "qty": [1, 2, 30],
                       "price": [1.5, 2.25, -3.125]})
    with tempfile.TemporaryDirectory(dir="/tmp") as d:
        S.write_xls(df, f"{d}/t.xls")
        with open(f"{d}/t.xls", "rb") as f:
            assert f.read(8) == S._CFB_MAGIC  # real OLE2 container
        back = S.read_xls(f"{d}/t.xls")
    assert list(back.columns) == ["name", "qty", "price"]
    assert back["qty"].tolist() == [1, 2, 30]
    assert back["price"].tolist() == [1.5, 2.25, -3.125]
    assert back["name"].tolist() == ["alpha", "béta", "c"]


def test_xls_reader_rk_mulrk_sst_records():
    """Hand-built BIFF8 stream per [MS-XLS]: RK (int, /100 and float
    forms), MULRK, SST + LABELSST — the record vocabulary real Excel
    writers emit, which the minimal writer does not."""
    import struct

    from pythongis_ray import sources as S

    def rec(op, payload):
        return struct.pack("<HH", op, len(payload)) + payload

    def bof(dt):
        return rec(0x0809, struct.pack("<HHHHII", 0x0600, dt,
                                       0x0DBB, 0x07CC, 0, 0))

    # SST with two compressed strings
    sst = struct.pack("<II", 2, 2)
    for s in (b"hdr", b"val"):
        sst += struct.pack("<HB", len(s), 0) + s
    glob = bytearray(bof(0x0005))
    bs_at = len(glob) + 4 + 12 + 4 + len(sst) + 4  # after BOUNDSHEET+SST+EOF
    name = b"S1"
    bs = struct.pack("<IHBB", 0, 0, len(name), 0) + name
    glob2 = bytearray(bof(0x0005))
    glob2 += rec(0x0085, struct.pack("<IHBB", 0, 0, len(name), 0) + name)
    glob2 += rec(0x00FC, sst)
    glob2 += rec(0x000A, b"")
    sheet_off = len(glob2)
    glob2[len(bof(0x0005)) + 4:len(bof(0x0005)) + 8] = \
        struct.pack("<I", sheet_off)
    sheet = bytearray(bof(0x0010))
    # row0: LABELSST x2 (headers)
    sheet += rec(0x00FD, struct.pack("<HHHI", 0, 0, 15, 0))
    sheet += rec(0x00FD, struct.pack("<HHHI", 0, 1, 15, 1))
    # row1: RK int 42 | RK 3.14*100 div100 int form (314<<2)|3|1
    sheet += rec(0x027E, struct.pack("<HHHI", 1, 0, 15, (42 << 2) | 2))
    sheet += rec(0x027E, struct.pack("<HHHI", 1, 1, 15,
                                     ((314 << 2) | 2) | 1))
    # row2: MULRK two float-form RKs: top 30 bits of 2.5 and 0.75
    def rkf(x):
        (q,) = struct.unpack("<Q", struct.pack("<d", x))
        return (q >> 32) & ~0x3
    mul = struct.pack("<HH", 2, 0) \
        + struct.pack("<HI", 15, rkf(2.5)) \
        + struct.pack("<HI", 15, rkf(0.75)) + struct.pack("<H", 1)
    sheet += rec(0x00BD, mul)
    sheet += rec(0x000A, b"")
    stream = bytes(glob2) + bytes(sheet)
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".xls", dir="/tmp",
                                     delete=False) as f:
        f.write(stream)
        p = f.name
    back = S.read_xls(p)
    assert list(back.columns) == ["hdr", "val"]
    assert back.iloc[0].tolist() == [42, 3.14]
    assert back.iloc[1].tolist() == [2.5, 0.75]
