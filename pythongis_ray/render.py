"""Distributed headless map renderer — the data-product core of the
reference's renderer (``/root/reference/pythongis/renderer.py``:
Map/Layout/ColorPalette render layers to an image and ``save()`` it;
2434 lines on PIL/aggdraw). This module re-expresses the headless
part Ray-Data-first: every layer rasterizes to ASSOCIATIVE per-batch
partial canvases (count-sum or class-max — order-free, so the
streaming executor may combine them in any order), partials fold in a
two-level tree (per-block fold → bounded driver fold), symbology
comes from classify.py break algorithms, and the canvas writes
through the repo's own PNG/JPEG codecs with a world-file sidecar so
the output is itself a georeferenced raster.

Out of scope (GUI surface, correctly): tkinter view, interactive
zoom, legends/labels/antialiasing.

Scale shape: POINT layers stream any cardinality (dense per-batch
canvases for small canvases, sparse (pixel, value) partials + one
bucketed shuffle above 2^18 px — O(touched pixels) moved, not
O(batches x canvas)). POLYGON layers loop features inside each batch
(each feature's pixel window is PIP-vectorized) — right for the
10^2..10^5 polygons a map draws; a 10^7-polygon choropleth should
pre-dissolve (spatial.dissolve) first. Giant outputs go through
``render_tile_pyramid`` (independent, resumable per-tile jobs), not
one driver-side canvas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# a small categorical palette (ColorBrewer Set1-like, public values)
PALETTE = [(228, 26, 28), (55, 126, 184), (77, 175, 74),
           (152, 78, 163), (255, 127, 0), (255, 255, 51),
           (166, 86, 40), (247, 129, 191), (153, 153, 153)]

# sequential ramp for density/graduated rendering (light → dark blue)
SEQUENTIAL = [(239, 243, 255), (198, 219, 239), (158, 202, 225),
              (107, 174, 214), (66, 146, 198), (33, 113, 181),
              (8, 69, 148)]


def _fold_canvases(partials, h: int, w: int, dtype, op):
    """Fold a Dataset of ``{"canvas": bytes}`` rows into one (h, w)
    array. Two levels: per-arrow-block fold inside map_batches, then
    a bounded driver fold over the surviving one-row-per-block
    partials (#blocks, not #features)."""
    npop = np.maximum if op == "max" else np.add

    def fold_block(b: pa.Table) -> pa.Table:
        acc = None
        for buf in b["canvas"].to_pylist():
            a = np.frombuffer(buf, dtype).reshape(h, w)
            acc = a.astype(dtype) if acc is None else npop(acc, a)
        if acc is None:                    # empty upstream block
            return pa.table({"canvas": pa.array([], pa.binary())})
        return pa.table({"canvas": pa.array([acc.tobytes()], pa.binary())})

    folded = partials.map_batches(fold_block, batch_format="pyarrow",
                                  batch_size=64)
    acc = np.zeros((h, w), dtype)
    for row in folded.iter_rows():
        npop(acc, np.frombuffer(row["canvas"], dtype).reshape(h, w),
             out=acc)
    return acc


class MapCanvas:
    """Headless map: ``add_points`` / ``add_lines`` / ``add_polygons``
    queue distributed layer rasterizations; ``render()`` executes
    them (each layer = one streaming map_batches + tree fold) and
    composes in painter order; ``save()`` writes PNG/JPEG (by
    extension) + a world-file sidecar."""

    def __init__(self, width: int = 512, height: int = 256,
                 bbox=(-180.0, -90.0, 180.0, 90.0),
                 background=(255, 255, 255)):
        self.width = int(width)
        self.height = int(height)
        self.bbox = tuple(float(v) for v in bbox)
        self.background = tuple(background)
        self._layers: list = []       # (classval (h,w) int, colors list)

    # --- coordinate mapping (mirrored verbatim in the SQL oracle) ---

    def to_px(self, lon: np.ndarray, lat: np.ndarray):
        """lon/lat → (col, row, in_bounds). floor mapping; points on
        the right/bottom edge fall out of bounds (half-open pixels)."""
        x0, y0, x1, y1 = self.bbox
        col = np.floor((lon - x0) / (x1 - x0) * self.width)
        row = np.floor((y1 - lat) / (y1 - y0) * self.height)
        ok = (col >= 0) & (col < self.width) & (row >= 0) \
            & (row < self.height)
        return col.astype(np.int64), row.astype(np.int64), ok

    # ------------------------------------------------------- layers

    def add_points(self, ds, lon_col: str = "lon", lat_col: str = "lat",
                   value_col: str | None = None, breaks=None,
                   color=None, radius: int = 0, mode: str = "class",
                   sparse: bool | None = None):
        """Point layer. ``mode="class"``: pixel takes the max class
        (1-based; classes from ``breaks`` over ``value_col``, else
        constant class 1 colored ``color``). ``mode="count"``: pixel
        counts points (density map; colored by a sequential ramp over
        quantile breaks of the nonzero counts at render time).

        ``sparse`` (default: auto — on for canvases > 2^18 px when
        radius is 0): partials are (pixel, value) TABLES combined by
        one bucketed shuffle instead of dense per-batch canvases —
        the scale-safe form: dense partials move O(batches × h × w)
        bytes; sparse moves O(touched pixels) regardless of batch
        count."""
        h, w = self.height, self.width
        to_px = self.to_px
        rad = int(radius)
        if sparse is None:
            sparse = rad == 0 and h * w > (1 << 18)
        if sparse and rad == 0:
            def sparse_partial(b: pa.Table) -> pd.DataFrame:
                lon = b[lon_col].to_numpy(zero_copy_only=False)
                lat = b[lat_col].to_numpy(zero_copy_only=False)
                col, row, ok = to_px(lon, lat)
                pix = row[ok] * w + col[ok]
                if mode == "count":
                    val = np.ones(len(pix), np.int64)
                elif value_col is not None and breaks is not None:
                    from pythongis_ray import classify
                    v = b[value_col].to_numpy(zero_copy_only=False)
                    val = classify.find_class(v, breaks) \
                        .astype(np.int64)[ok] + 1
                else:
                    val = np.ones(len(pix), np.int64)
                agg = "sum" if mode == "count" else "max"
                d = pd.DataFrame({"pix": pix, "val": val})
                g = d.groupby("pix", sort=False)["val"] \
                    .agg(agg).reset_index()
                g["val"] = g["val"].astype(np.int64)
                return g

            self._layers.append(("points_sparse", ds, sparse_partial,
                                 "sum" if mode == "count" else "max",
                                 mode, color, breaks))
            return self

        def partial(b: pa.Table) -> pa.Table:
            lon = b[lon_col].to_numpy(zero_copy_only=False)
            lat = b[lat_col].to_numpy(zero_copy_only=False)
            col, row, ok = to_px(lon, lat)
            if mode == "count":
                canvas = np.zeros((h, w), np.int64)
                np.add.at(canvas, (row[ok], col[ok]), 1)
            else:
                if value_col is not None and breaks is not None:
                    from pythongis_ray import classify
                    v = b[value_col].to_numpy(zero_copy_only=False)
                    cls = classify.find_class(v, breaks).astype(np.int64) + 1
                else:
                    cls = np.ones(len(lon), np.int64)
                canvas = np.zeros((h, w), np.int64)
                np.maximum.at(canvas, (row[ok], col[ok]), cls[ok])
            if rad > 0:                      # disc stamp (small radii)
                base = canvas.copy()
                for dy in range(-rad, rad + 1):
                    for dx in range(-rad, rad + 1):
                        if dx * dx + dy * dy > rad * rad or (dx, dy) == (0, 0):
                            continue
                        sh = np.zeros_like(base)
                        ys = slice(max(0, dy), min(h, h + dy))
                        yd = slice(max(0, -dy), min(h, h - dy))
                        xs = slice(max(0, dx), min(w, w + dx))
                        xd = slice(max(0, -dx), min(w, w - dx))
                        sh[yd, xd] = base[ys, xs]
                        canvas = (canvas + sh if mode == "count"
                                  else np.maximum(canvas, sh))
            return pa.table({"canvas": pa.array([canvas.tobytes()],
                                                pa.binary())})

        self._layers.append(("points", ds, partial,
                             "sum" if mode == "count" else "max",
                             mode, color, breaks))
        return self

    def add_lines(self, ds, geometry_col: str = "geometry",
                  color=(55, 126, 184)):
        """Polyline layer (WKB LineStrings): segments sample at ~1 px
        steps and stamp a binary mask — vectorized over all sample
        points of a batch."""
        h, w = self.height, self.width
        to_px = self.to_px
        x0, y0, x1, y1 = self.bbox
        sx = self.width / (x1 - x0)
        sy = self.height / (y1 - y0)

        def partial(b: pa.Table) -> pa.Table:
            from pythongis_ray.geom import wkb as _wkb

            flat = _wkb.decode_flat(b[geometry_col])
            pts, off = flat["pts"], flat["ring_off"]
            canvas = np.zeros((h, w), np.int64)
            ax_l, ay_l, bx_l, by_l = [], [], [], []
            for r in range(len(off) - 1):
                s, e = off[r], off[r + 1]
                if e - s < 2:
                    continue
                ax_l.append(pts[s:e - 1, 0])
                ay_l.append(pts[s:e - 1, 1])
                bx_l.append(pts[s + 1:e, 0])
                by_l.append(pts[s + 1:e, 1])
            if ax_l:
                ax = np.concatenate(ax_l)
                ay = np.concatenate(ay_l)
                bx = np.concatenate(bx_l)
                by = np.concatenate(by_l)
                # samples per segment ~ 2x its pixel length (the
                # oversampling closes float-rounding gaps at column
                # boundaries, the classic DDA fix)
                npx = np.maximum(np.abs((bx - ax) * sx),
                                 np.abs((by - ay) * sy))
                nseg = 2 * np.maximum(1, np.ceil(npx).astype(np.int64)) + 1
                segi = np.repeat(np.arange(len(ax)), nseg)
                # t = k / (nseg-1) per segment, flattened
                k = np.concatenate([np.arange(n) for n in nseg])
                t = k / np.maximum(1, np.repeat(nseg - 1, nseg))
                lx = ax[segi] + (bx - ax)[segi] * t
                ly = ay[segi] + (by - ay)[segi] * t
                col, row, ok = to_px(lx, ly)
                canvas[row[ok], col[ok]] = 1
            return pa.table({"canvas": pa.array([canvas.tobytes()],
                                                pa.binary())})

        self._layers.append(("lines", ds, partial, "max", "class",
                             color, None))
        return self

    def add_polygons(self, ds, geometry_col: str = "geometry",
                     value_col: str | None = None, breaks=None,
                     color=(77, 175, 74)):
        """Filled polygon layer (WKB Polygons/MultiPolygons): per
        feature, the pixel centers inside its bbox run the exact
        vectorized PIP (geom.algo crossing-number); pixel takes the
        max class value (choropleth via ``breaks``, else class 1)."""
        h, w = self.height, self.width
        x0b, y0b, x1b, y1b = self.bbox
        pxw = (x1b - x0b) / w
        pxh = (y1b - y0b) / h

        def partial(b: pa.Table) -> pa.Table:
            from pythongis_ray import classify
            from pythongis_ray.geom import algo as _algo
            from pythongis_ray.geom import wkb as _wkb

            flat = _wkb.decode_flat(b[geometry_col])
            pts, off = flat["pts"], flat["ring_off"]
            feat = flat["ring_feat"]
            if value_col is not None and breaks is not None:
                v = b[value_col].to_numpy(zero_copy_only=False)
                cls = classify.find_class(v, breaks).astype(np.int64) + 1
            else:
                cls = np.ones(b.num_rows, np.int64)
            canvas = np.zeros((h, w), np.int64)
            for fi in np.unique(feat):
                rsel = np.flatnonzero(feat == fi)
                sa_l, sb_l = [], []
                for r in rsel:
                    s, e = off[r], off[r + 1]
                    sa_l.append(pts[s:e - 1])
                    sb_l.append(pts[s + 1:e])
                sa = np.concatenate(sa_l)
                sb = np.concatenate(sb_l)
                gxmin, gymin = sa.min(0)
                gxmax, gymax = sa.max(0)
                c0 = max(0, int(np.floor((gxmin - x0b) / pxw)))
                c1 = min(w - 1, int(np.floor((gxmax - x0b) / pxw)))
                r1 = min(h - 1, int(np.floor((y1b - gymin) / pxh)))
                r0 = max(0, int(np.floor((y1b - gymax) / pxh)))
                if c1 < c0 or r1 < r0:
                    continue
                cols = np.arange(c0, c1 + 1)
                rows = np.arange(r0, r1 + 1)
                cx = x0b + (cols + 0.5) * pxw
                cy = y1b - (rows + 0.5) * pxh
                gx, gy = np.meshgrid(cx, cy)
                inside, onb = _algo.points_vs_flat_polygons(
                    gx.ravel(), gy.ravel(), sa, sb,
                    np.zeros(len(sa), np.int64), 1)
                hit = (inside[:, 0] | onb[:, 0]).reshape(len(rows),
                                                         len(cols))
                sub = canvas[r0:r1 + 1, c0:c1 + 1]
                np.maximum(sub, np.where(hit, cls[fi], 0), out=sub)
            return pa.table({"canvas": pa.array([canvas.tobytes()],
                                                pa.binary())})

        self._layers.append(("polygons", ds, partial, "max", "class",
                             color, breaks))
        return self

    # ------------------------------------------------------- output

    def render(self) -> np.ndarray:
        """Execute every queued layer and compose → (h, w, 3) uint8."""
        from pythongis_ray import classify

        h, w = self.height, self.width
        img = np.empty((h, w, 3), np.uint8)
        img[:] = np.asarray(self.background, np.uint8)
        for kind, ds, partial, op, mode, color, breaks in self._layers:
            if kind == "points_sparse":
                from pythongis_ray.relational import bucketed_group_apply

                parts = ds.map_batches(partial, batch_format="pyarrow",
                                       batch_size=65536)
                agg = "sum" if op == "sum" else "max"

                def combine(b: pd.DataFrame, _agg=agg) -> pd.DataFrame:
                    g = b.groupby("pix", sort=False)["val"] \
                        .agg(_agg).reset_index()
                    g["val"] = g["val"].astype(np.int64)
                    return g

                folded = bucketed_group_apply(parts, ["pix"], combine) \
                    .to_pandas()
                canvas = np.zeros(h * w, np.int64)
                canvas[folded["pix"].to_numpy(np.int64)] = \
                    folded["val"].to_numpy(np.int64)
                canvas = canvas.reshape(h, w)
            else:
                partials = ds.map_batches(partial, batch_format="pyarrow",
                                          batch_size=8192)
                canvas = _fold_canvases(partials, h, w, np.int64, op)
            if mode == "count":
                nz = canvas[canvas > 0]
                if len(nz) == 0:
                    continue
                bks = classify.quantile(nz.astype(np.float64),
                                        len(SEQUENTIAL))
                cls = classify.find_class(
                    canvas.ravel().astype(np.float64), bks) \
                    .reshape(h, w)
                mask = canvas > 0
                ramp = np.asarray(SEQUENTIAL, np.uint8)
                img[mask] = ramp[np.clip(cls[mask], 0,
                                         len(SEQUENTIAL) - 1)]
            else:
                mask = canvas > 0
                if breaks is not None:
                    ramp = np.asarray(
                        (SEQUENTIAL if color is None else PALETTE),
                        np.uint8)
                    img[mask] = ramp[np.clip(canvas[mask] - 1, 0,
                                             len(ramp) - 1)]
                else:
                    img[mask] = np.asarray(
                        color if color is not None else PALETTE[0],
                        np.uint8)
        return img

    def save(self, path: str, quality: int = 90) -> str:
        """Render and write PNG (lossless) or JPEG by extension, plus
        a world-file sidecar — the saved map IS a georeferenced
        raster (reference Map.save, renderer.py:~337)."""
        from pythongis_ray import raster as _raster

        img = self.render()
        x0, y0, x1, y1 = self.bbox
        transform = (x0, (x1 - x0) / self.width, y1,
                     (y1 - y0) / self.height)
        arr = np.moveaxis(img, 2, 0).astype(np.float64)
        low = path.lower()
        if low.endswith((".jpg", ".jpeg")):
            return _raster.write_jpg(path, arr, transform=transform,
                                     quality=quality)
        return _raster.write_png(path, arr, transform=transform)


# ------------------------------------------------- slippy tile pyramid

def tile_bbox(z: int, x: int, y: int):
    """Slippy z/x/y (plate carrée here — the engine's canonical
    lon/lat canvas, not web-mercator) → (x0, y0, x1, y1) degrees.
    2^(z+1) x 2^z tiles cover the world (2:1 aspect)."""
    n = 1 << z
    w = 360.0 / (2 * n)
    h = 180.0 / n
    x0 = -180.0 + x * w
    y1 = 90.0 - y * h
    return (x0, y1 - h, x0 + w, y1)


def render_tile_pyramid(layer_fn, out_dir: str, zmin: int = 0,
                        zmax: int = 2, tile_px: int = 256,
                        fmt: str = "png"):
    """Write a z/x/y tile pyramid (the standard web-map deliverable;
    the reference's renderer draws one Map, this writes the tiled
    version a tile server consumes). ``layer_fn(canvas)`` adds layers
    to a MapCanvas bounded to one tile. Every tile renders
    INDEPENDENTLY — one Ray task per tile via the driver loop at
    small z; at scale, tiles of one zoom level are an embarrassingly
    parallel map over the (z, x, y) list (documented partitioning
    assumption: the layer source dataset must be re-readable, which
    Ray Datasets are — lineage re-executes per tile with the tile's
    bbox filter pushed into the layer).

    Returns the list of written paths. Layout: out_dir/z/x/y.png —
    resumable: existing files are skipped, so a killed run continues
    where it stopped."""
    import os

    paths = []
    for z in range(zmin, zmax + 1):
        for x in range(2 * (1 << z)):
            for y in range(1 << z):
                p = os.path.join(out_dir, str(z), str(x),
                                 f"{y}.{fmt}")
                if os.path.exists(p):      # resume: skip finished
                    paths.append(p)
                    continue
                os.makedirs(os.path.dirname(p), exist_ok=True)
                m = MapCanvas(width=tile_px, height=tile_px,
                              bbox=tile_bbox(z, x, y))
                layer_fn(m)
                m.save(p)
                paths.append(p)
    return paths
