"""Deterministic spatial fixtures derived from the driver's test tables.

The driver provides TPC-H-ish parquet tables (region nation customer
supplier part orders lineitem events documents embeddings) but no
geometry. Every spatial fixture here is *derived* from those tables by
pure integer arithmetic, so the exact same derivation can be written as
ANSI SQL for the DuckDB oracle (`__ray_entry__.oracle_sql`) and the
results hash-match bit-for-bit.

Exactness contract (see geom/algo.py docstring):
* all coordinates are dyadic — ``lon = ix/1024 - 180`` with integer
  ``ix`` (half-integers for zone boundaries) — so every float64
  comparison/cross-product in the engine and every double expression in
  DuckDB is exact, with no boundary ties by construction;
* all integer expressions avoid negative modulo (DuckDB ``%`` is
  C-style) and stay far below 2^63.

The skewed geocode mirrors the reference's expected input profile
(FIXTURES.md: ~70% of pages hash into a small set of hotspot "cities",
power-law — forcing the hot-cell salting path of the spatial join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pythongis_ray.geom import wkb

# lattice: 1024 units per degree → world = 368640 x 184320 units
UNITS = 1024
LX = 360 * UNITS  # 368640
LY = 180 * UNITS  # 184320

# geocode hash constants (shared by numpy + SQL)
H_MUL = 2654435761  # Knuth multiplicative hash
H_MOD = 2147483647
N_CITIES = 32
HOT_NUM, HOT_DEN = 7, 10  # 70% of rows hit a city


# ------------------------------------------------------------- geocode

def geocode_units(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """key (int64) → (ix, iy) integer lattice units. Mirrors SQL_GEOCODE."""
    key = np.asarray(key, dtype=np.int64)
    h = (key * H_MUL) % H_MOD
    hot = (h % HOT_DEN) < HOT_NUM
    # triangular city popularity (city 0 hottest ~6% of hot rows) →
    # genuine hot cells for the salting path
    city = np.minimum(h % N_CITIES, (h // N_CITIES) % N_CITIES)
    cityx = (city * 1103515245 + 12345) % LX
    cityy = (city * 69069 + 7) % LY
    jx = (h // 7) % 256
    jy = (h // 13) % 256
    ix_hot = (cityx + jx) % LX
    iy_hot = (cityy + jy) % LY
    ux = (h * 48271) % LX
    uy = (h * 16807) % LY
    ix = np.where(hot, ix_hot, ux)
    iy = np.where(hot, iy_hot, uy)
    return ix, iy


def sql_geocode(key_expr: str) -> str:
    """SQL fragment computing (ix, iy) from an integer key expression —
    textually mirrors :func:`geocode_units`. Emits columns ix, iy."""
    return f"""
        SELECT *,
          CASE WHEN (h % {HOT_DEN}) < {HOT_NUM}
               THEN ((city * 1103515245 + 12345) % {LX} + (h // 7) % 256) % {LX}
               ELSE (h * 48271) % {LX} END AS ix,
          CASE WHEN (h % {HOT_DEN}) < {HOT_NUM}
               THEN ((city * 69069 + 7) % {LY} + (h // 13) % 256) % {LY}
               ELSE (h * 16807) % {LY} END AS iy
        FROM (SELECT *, least(h % {N_CITIES}, (h // {N_CITIES}) % {N_CITIES}) AS city
              FROM (SELECT *, (({key_expr}) * {H_MUL}) % {H_MOD} AS h FROM __SRC__) _h) _g
    """


def units_to_deg(ix: np.ndarray, iy: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(ix, np.float64) / 1024.0 - 180.0
    lat = np.asarray(iy, np.float64) / 1024.0 - 90.0
    return lon, lat


SQL_UNITS_TO_DEG = "ix / 1024.0 - 180.0 AS lon, iy / 1024.0 - 90.0 AS lat"


# ------------------------------------------------------- zone fixtures

# 5x5 nation rectangles tiling the world with half-unit inset boundaries.
RECT_W_CELLS = LX // 5        # 73728 units per column
RECT_H_CELLS = LY // 5        # 36864 units per row
RECT_SPAN_X = 72000           # rect width in units (gap ≈ 1.7 units)
RECT_SPAN_Y = 36000


def zones_from_nation(nation_df: pd.DataFrame) -> pd.DataFrame:
    """25 rectangle zones, one per nation. Columns: zone_id, name,
    x0, y0, x1, y1 (degrees, exact dyadic) + geometry (WKB polygon).

    The rectangles play the role of the reference's country polygons
    (`ne_10m_admin_0_countries`, /root/reference/tests/data/) as the
    right side of the flagship spatial join
    (/root/reference/pythongis/vector/manager.py:160-489)."""
    k = nation_df["n_nationkey"].to_numpy().astype(np.int64)
    col = k % 5
    row = k // 5
    x0u = col * RECT_W_CELLS + 0.5
    y0u = row * RECT_H_CELLS + 0.5
    x1u = x0u + RECT_SPAN_X
    y1u = y0u + RECT_SPAN_Y
    x0 = x0u / 1024.0 - 180.0
    x1 = x1u / 1024.0 - 180.0
    y0 = y0u / 1024.0 - 90.0
    y1 = y1u / 1024.0 - 90.0
    geoms = [
        wkb.encode_polygon([np.array([[a, b], [c, b], [c, d], [a, d], [a, b]])])
        for a, b, c, d in zip(x0, y0, x1, y1)
    ]
    return pd.DataFrame({
        "zone_id": k,
        "name": nation_df["n_name"].to_numpy(),
        "x0": x0, "y0": y0, "x1": x1, "y1": y1,
        "geometry": geoms,
    })


SQL_ZONES_FROM_NATION = f"""
    SELECT n_nationkey AS zone_id, n_name AS name,
      ((n_nationkey % 5) * {RECT_W_CELLS} + 0.5) / 1024.0 - 180.0 AS x0,
      ((n_nationkey // 5) * {RECT_H_CELLS} + 0.5) / 1024.0 - 90.0 AS y0,
      ((n_nationkey % 5) * {RECT_W_CELLS} + 0.5 + {RECT_SPAN_X}) / 1024.0 - 180.0 AS x1,
      ((n_nationkey // 5) * {RECT_H_CELLS} + 0.5 + {RECT_SPAN_Y}) / 1024.0 - 90.0 AS y1
    FROM nation
"""

# Diamond (convex, non-axis-aligned) zones from region: 5 diamonds along
# the equator band. Semi-axes are half-odd-integers in units so that
# b*|dx| + a*|dy| == a*b has no integer solutions → no boundary points.
DIA_A = 15000.5  # lon semi-axis, units
DIA_B = 10000.5  # lat semi-axis, units


def diamonds_from_region(region_df: pd.DataFrame) -> pd.DataFrame:
    """5 diamond zones (region_id, cx, cy in units; geometry WKB).
    Convex non-rectangular polygons exercising the general ray-casting
    refine path of the join (vs. the closed-form SQL oracle)."""
    k = region_df["r_regionkey"].to_numpy().astype(np.int64)
    cxu = k * RECT_W_CELLS + 36864
    cyu = np.full_like(k, LY // 2)
    cx, cy = units_to_deg(cxu, cyu)
    a = DIA_A / 1024.0
    b = DIA_B / 1024.0
    geoms = [
        wkb.encode_polygon([np.array([
            [x + a, y], [x, y + b], [x - a, y], [x, y - b], [x + a, y]])])
        for x, y in zip(cx, cy)
    ]
    return pd.DataFrame({
        "region_id": k, "rname": region_df["r_name"].to_numpy(),
        "cxu": cxu, "cyu": cyu, "geometry": geoms,
    })


def sql_diamond_pred(ix: str = "ix", iy: str = "iy") -> str:
    """SQL strict-interior predicate for the region diamonds, in unit
    space: b*|dx| + a*|dy| < a*b (exact; matches ray-casting PIP on the
    dyadic lattice — see tests/test_geom.py diamond test)."""
    return (f"({DIA_B} * abs({ix} - (r_regionkey * {RECT_W_CELLS} + 36864))"
            f" + {DIA_A} * abs({iy} - {LY // 2})) < {DIA_A} * {DIA_B}")


# ----------------------------------------------------- raster fixture

GRID_N_X = 360  # raster grid: 1-degree-ish cells
GRID_N_Y = 180
VAL_MOD = 1000


def raster_cells() -> pd.DataFrame:
    """Synthetic raster as a cell table: (ci, cj, value:int64, lon, lat)
    with cell centers on the integer+0.5-unit... (ci*1024+512 units —
    integer, never on a half-unit zone boundary). value is a pure
    function of (ci, cj) so the SQL oracle regenerates it with
    generate_series. Stands in for the reference's GeoTIFF fixtures
    (/root/reference/tests/data/pop2000.tif) for zonal statistics
    (/root/reference/pythongis/raster/analyzer.py:16-88)."""
    ci, cj = np.meshgrid(np.arange(GRID_N_X, dtype=np.int64),
                         np.arange(GRID_N_Y, dtype=np.int64), indexing="ij")
    ci, cj = ci.ravel(), cj.ravel()
    value = (ci * 73 + cj * 151) % VAL_MOD
    lon = (ci * 1024 + 512) / 1024.0 - 180.0
    lat = (cj * 1024 + 512) / 1024.0 - 90.0
    return pd.DataFrame({"ci": ci, "cj": cj, "value": value, "lon": lon, "lat": lat})


SQL_RASTER_CELLS = f"""
    SELECT ci, cj, (ci * 73 + cj * 151) % {VAL_MOD} AS value,
           (ci * 1024 + 512) / 1024.0 - 180.0 AS lon,
           (cj * 1024 + 512) / 1024.0 - 90.0 AS lat
    FROM (SELECT unnest(generate_series(0, {GRID_N_X - 1})) AS ci) a
    CROSS JOIN (SELECT unnest(generate_series(0, {GRID_N_Y - 1})) AS cj) b
"""
