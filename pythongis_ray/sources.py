"""Sources & sinks beyond parquet.

The reference reads Shapefile/GeoJSON/CSV/XLS/DTA
(/root/reference/pythongis/vector/loader.py:42-215) and writes
SHP/GeoJSON/CSV/XLS (vector/saver.py:24-169). In this engine parquet is
the canonical format (BASELINE input_hint); this module adds:

  read_geojson / write_geojson   GeoJSON FeatureCollection ⟷ Dataset
                                 with a WKB geometry column
  read_points_csv                CSV with xfield/yfield → point layer
                                 (reference loader xfield/yfield option,
                                 loader.py:48,180-196)
  write_csv_with_geometry        CSV sink with geometry as GeoJSON text

Shapefile/XLS/DTA are intentionally out of scope: their parsers
(pyshp/xlrd/openpyxl) are not in this environment and the reference
treats them as interchange formats, not engine semantics. The loader
shape (format branch → batch parser → Dataset) is the same.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

from pythongis_ray.geom import wkb


# ------------------------------------------------------------- GeoJSON

def _geojson_geom_to_wkb(geom: dict | None) -> bytes | None:
    if geom is None:
        return None
    t = geom["type"]
    c = geom["coordinates"]
    if t == "Point":
        return wkb.encode_point(c[0], c[1])
    if t == "LineString":
        return wkb.encode_linestring(np.asarray(c, np.float64))
    if t == "Polygon":
        return wkb.encode_polygon([np.asarray(r, np.float64) for r in c])
    if t == "MultiPoint":
        return wkb.encode_multi("MultiPoint", c)
    if t == "MultiLineString":
        return wkb.encode_multi("MultiLineString",
                                [np.asarray(l, np.float64) for l in c])
    if t == "MultiPolygon":
        return wkb.encode_multi("MultiPolygon",
                                [[np.asarray(r, np.float64) for r in p] for p in c])
    raise ValueError(f"unsupported GeoJSON type {t}")


def wkb_to_geojson_geom(buf: bytes | None) -> dict | None:
    if buf is None:
        return None
    g = wkb.decode(bytes(buf))
    t = g["type"]
    if t == "Point":
        p = g["rings"][0][0]
        return {"type": "Point", "coordinates": [float(p[0]), float(p[1])]}
    if t in ("LineString", "MultiPoint"):
        return {"type": t, "coordinates": g["rings"][0].tolist()}
    if t == "Polygon":
        return {"type": t, "coordinates": [r.tolist() for r in g["rings"]]}
    if t == "MultiLineString":
        return {"type": t, "coordinates": [r.tolist() for r in g["rings"]]}
    if t == "MultiPolygon":
        parts: dict[int, list] = {}
        for r, p in zip(g["rings"], g["ring_part"]):
            parts.setdefault(p, []).append(r.tolist())
        return {"type": t, "coordinates": [parts[k] for k in sorted(parts)]}
    raise ValueError(t)


def read_geojson(path: str):
    """GeoJSON FeatureCollection file → Dataset with property columns +
    ``geometry`` (WKB binary). The file-level parse is a single driver
    read (GeoJSON is not splittable); rows then stream as blocks —
    for large inputs prefer newline-delimited GeoJSON via read_json."""
    import ray.data as rd

    with open(path) as f:
        fc = json.load(f)
    rows = []
    for feat in fc.get("features", []):
        row = dict(feat.get("properties") or {})
        row["geometry"] = _geojson_geom_to_wkb(feat.get("geometry"))
        rows.append(row)
    df = pd.DataFrame(rows)
    return rd.from_pandas(df)


def write_geojson(ds, path: str, geometry_col: str = "geometry"):
    """Dataset → one GeoJSON FeatureCollection (driver-side assembly;
    for big outputs use write_parquet — this is the interchange sink)."""
    feats = []
    for batch in ds.iter_batches(batch_size=4096, batch_format="pandas"):
        for _, row in batch.iterrows():
            props = {k: (v.item() if hasattr(v, "item") else v)
                     for k, v in row.items() if k != geometry_col}
            feats.append({"type": "Feature", "properties": props,
                          "geometry": wkb_to_geojson_geom(row[geometry_col])})
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return len(feats)


# ----------------------------------------------------------------- CSV

def read_points_csv(path: str, xfield: str, yfield: str):
    """CSV with coordinate columns → point layer (adds WKB geometry).
    Column type inference is Arrow's CSV reader (replacing the
    reference's per-cell str→number coercion, loader.py:109-119)."""
    import ray.data as rd

    ds = rd.read_csv(path)

    def add_geom(batch: pa.Table) -> pa.Table:
        lon = batch[xfield].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch[yfield].to_numpy(zero_copy_only=False).astype(np.float64)
        geoms = wkb.encode_points(lon, lat)
        return batch.append_column("geometry", pa.array(list(geoms), pa.binary()))

    return ds.map_batches(add_geom, batch_format="pyarrow", batch_size=65536)


def write_csv_with_geometry(ds, dir_path: str, geometry_col: str = "geometry"):
    """CSV sink: geometry serialized as GeoJSON text column (the
    reference CSV saver writes geojson strings, saver.py:150-160)."""
    def stringify(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[geometry_col] = [
            json.dumps(wkb_to_geojson_geom(b)) if b is not None else ""
            for b in batch[geometry_col]]
        return batch

    return ds.map_batches(stringify, batch_format="pandas",
                          batch_size=8192).write_csv(dir_path)
