import json
import os

import numpy as np
import pandas as pd
import pytest

from pythongis_ray import classify, sources, sqlish
from pythongis_ray.geom import wkb

SF = "/root/testdata/sf0.001"


class TestClassify:
    def test_equal_breaks(self):
        br = classify.equal([0, 10, 20, 50], 5)
        assert br == [0, 10, 20, 30, 40, 50]

    def test_quantile_breaks(self):
        v = np.arange(101)
        br = classify.quantile(v, 4)
        assert br[0] == 0 and br[-1] == 100
        assert br[2] == 50.0

    def test_jenks_separates_clusters(self):
        v = np.concatenate([np.random.default_rng(1).normal(0, 1, 200),
                            np.random.default_rng(2).normal(100, 1, 200)])
        br = classify.jenks_sample(v, 2, sample=200)
        # the class boundary must separate the two clusters (~50/50)
        assert len(br) == 3
        assert abs((v < br[1]).mean() - 0.5) < 0.1

    def test_headtail(self):
        v = np.array([1] * 90 + [100] * 10, float)
        br = classify.headtail(v, 3)
        assert br[0] == 1.0 and br[-1] == 100.0

    def test_find_class(self):
        br = [0.0, 10.0, 20.0, 30.0]
        cls = classify.find_class([5, 10, 29.9, 30, -5], br)
        assert cls.tolist() == [0, 1, 2, 2, 0]

    def test_breaks_for_dataset_and_apply(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"v": np.arange(100, dtype=np.float64)})
        ds = rd.from_pandas(df)
        br = classify.breaks_for_dataset(ds, "v", "equal", 4)
        assert br == [0.0, 24.75, 49.5, 74.25, 99.0]
        out = classify.apply_classes(ds, "v", br).to_pandas()
        assert out["class"].min() == 0 and out["class"].max() == 3

    def test_rescale(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"v": [0.0, 5.0, 10.0]})
        out = classify.rescale(rd.from_pandas(df), "v", (0, 100)).to_pandas()
        assert out.v_scaled.tolist() == [0.0, 50.0, 100.0]


class TestSqlish:
    def test_where_select_groupby_limit(self, ray_session):
        import ray.data as rd

        li = rd.read_parquet(f"{SF}/lineitem.parquet")
        out = (sqlish.Query(li)
               .where(lambda b: b.l_quantity > 25)
               .select(flag="l_returnflag", qty=lambda b: b.l_quantity * 2)
               .groupby("flag", [("n", "qty", "count"), ("sum_q", "qty", "sum")])
               .collect())
        pdf = pd.read_parquet(f"{SF}/lineitem.parquet")
        pdf = pdf[pdf.l_quantity > 25]
        exp = pdf.groupby("l_returnflag").agg(n=("l_quantity", "count"),
                                              sum_q=("l_quantity", lambda v: (v * 2).sum()))
        got = out.set_index("flag").sort_index()
        assert got.n.tolist() == exp.n.tolist()
        assert got.sum_q.tolist() == exp.sum_q.tolist()

    def test_cross_guard(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(pd.DataFrame({"a": [1, 2]}))
        big = pd.DataFrame({"b": range(sqlish.CROSS_JOIN_LIMIT + 1)})
        with pytest.raises(ValueError):
            sqlish.Query(ds).cross(big)

    def test_cross_product(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(pd.DataFrame({"a": [1, 2, 3]}))
        out = sqlish.Query(ds).cross(pd.DataFrame({"b": ["x", "y"]})).collect()
        assert len(out) == 6


class TestSources:
    def test_geojson_roundtrip(self, ray_session, tmp_path):
        path = str(tmp_path / "t.geojson")
        fc = {"type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"name": "a", "v": 1},
             "geometry": {"type": "Point", "coordinates": [10.0, 20.0]}},
            {"type": "Feature", "properties": {"name": "b", "v": 2},
             "geometry": {"type": "Polygon", "coordinates": [
                 [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]}},
        ]}
        json.dump(fc, open(path, "w"))
        ds = sources.read_geojson(path)
        df = ds.to_pandas()
        assert df.name.tolist() == ["a", "b"]
        assert wkb.geom_type(bytes(df.geometry.iloc[1])) == "Polygon"
        out_path = str(tmp_path / "out.geojson")
        n = sources.write_geojson(ds, out_path)
        assert n == 2
        rt = json.load(open(out_path))
        assert rt["features"][0]["geometry"]["coordinates"] == [10.0, 20.0]

    def test_points_csv(self, ray_session, tmp_path):
        path = str(tmp_path / "pts.csv")
        pd.DataFrame({"id": [1, 2], "x": [10.5, -20.25], "y": [5.0, 60.0]}) \
            .to_csv(path, index=False)
        ds = sources.read_points_csv(path, "x", "y")
        df = ds.to_pandas()
        g = wkb.decode(bytes(df.geometry.iloc[1]))
        assert g["rings"][0].tolist() == [[-20.25, 60.0]]

    def test_write_csv_with_geometry(self, ray_session, tmp_path):
        import ray.data as rd

        df = pd.DataFrame({"id": [1], "geometry": [wkb.encode_point(1.5, 2.5)]})
        out_dir = str(tmp_path / "csvout")
        sources.write_csv_with_geometry(rd.from_pandas(df), out_dir)
        files = [f for f in os.listdir(out_dir) if f.endswith(".csv")]
        body = open(os.path.join(out_dir, files[0])).read()
        assert "Point" in body and "1.5" in body


class TestPrettyNaturalBreaks:
    """Parity with the reference classypie breaks (expected values
    generated by running /root/reference/pythongis/classypie/breaks.py
    on these inputs)."""

    def test_pretty_reference_outputs(self):
        from pythongis_ray import classify
        assert classify.pretty(list(range(0, 101)), 5) == \
            [0.0, 20.0, 40.0, 60.0, 80.0, 100.0]
        assert classify.pretty([0.3, 2.7, 5.1, 9.9, 14.2, 20.0], 4) == \
            [0.3, 5.0, 10.0, 15.0, 20.0]
        assert classify.pretty([-37.5, -12.0, 0.0, 8.8, 123.4], 5) == \
            [-37.5, 0.0, 50.0, 100.0, 123.4]
        assert classify.pretty([1000, 2000, 3000, 50000], 6) == \
            [1000, 10000.0, 20000.0, 30000.0, 40000.0, 50000.0]
        # quirk case: the reference's ceil-before-divide count blows up
        # the break list for sub-unit spans — preserved for parity
        quirk = classify.pretty([0.001, 0.005, 0.0099], 3)
        assert quirk[0] == 0.001 and quirk[-1] == 0.0099
        assert len(quirk) == 201 and quirk[1] == 0.005 and quirk[2] == 0.01

    def test_natural_full_reference_outputs(self):
        from pythongis_ray import classify
        assert classify.natural(
            [1, 2, 3, 4, 5, 10, 11, 12, 13, 30, 31, 32, 33, 100, 101],
            4) == [1.0, 5.0, 13.0, 33.0, 101.0]
        assert classify.natural(
            sorted([12.1, 3.4, 5.6, 18.2, 19.0, 2.2, 8.8, 9.1, 25.0,
                    26.1, 2.5]), 3) == [2.2, 5.6, 12.1, 26.1]
        # n <= classes degenerates to the value list + repeated max
        assert classify.natural([5, 6, 7], 5) == [5.0, 6.0, 7.0, 7.0]

    def test_natural_large_is_deterministic(self):
        import numpy as np

        from pythongis_ray import classify
        rng = np.random.default_rng(1)
        v = rng.normal(0, 10, 5000)
        a = classify.natural(v, 5, maxsize=500)
        b = classify.natural(v, 5, maxsize=500)
        assert a == b and len(a) == 6
        assert a[0] == v.min() and a[-1] == v.max()
