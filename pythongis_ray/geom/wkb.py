"""WKB codec (pure numpy, little-endian).

Geometry types supported: Point (1), LineString (2), Polygon (3),
MultiPoint (4), MultiLineString (5), MultiPolygon (6). This mirrors the
geometry universe of the reference, whose canonical storage is GeoJSON
dicts of exactly these types
(/root/reference/pythongis/vector/data.py:132-150, 176-199).

Two layers:

* scalar encode/decode — Python-level, used at fixture-build time and
  in refine actors to parse the (small) polygon side ONCE per actor.
* vectorized point codec — encodes/decodes a whole column of WKB
  points with zero Python-per-row work; this is the hot path (the
  geocoded pages side of every join is points).

Internal parsed form: a ``Geom`` namedtuple-ish dict
``{"type": str, "rings": [ndarray (n,2), ...], "parts": [...]}``;
polygons keep ring 0 = exterior, rest = holes (GeoJSON convention,
reference data.py:176-199).
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6

_TYPE_NAMES = {
    WKB_POINT: "Point",
    WKB_LINESTRING: "LineString",
    WKB_POLYGON: "Polygon",
    WKB_MULTIPOINT: "MultiPoint",
    WKB_MULTILINESTRING: "MultiLineString",
    WKB_MULTIPOLYGON: "MultiPolygon",
}
_NAME_TYPES = {v: k for k, v in _TYPE_NAMES.items()}

# ---------------------------------------------------------------- scalar

def encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, x, y)


def encode_linestring(coords) -> bytes:
    arr = np.asarray(coords, dtype="<f8")
    return struct.pack("<BII", 1, WKB_LINESTRING, len(arr)) + arr.tobytes()


def encode_polygon(rings) -> bytes:
    """rings: list of (n,2) coord arrays; ring 0 exterior, rest holes.
    Rings are closed automatically if first != last point."""
    out = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    for ring in rings:
        arr = np.asarray(ring, dtype="<f8")
        if not np.array_equal(arr[0], arr[-1]):
            arr = np.vstack([arr, arr[:1]])
        out.append(struct.pack("<I", len(arr)))
        out.append(arr.tobytes())
    return b"".join(out)


def encode_multi(kind: str, parts) -> bytes:
    """kind: 'MultiPoint'|'MultiLineString'|'MultiPolygon'; parts are
    scalar geometries in coordinate form (points / coord lists / ring
    lists respectively)."""
    code = _NAME_TYPES[kind]
    enc = {WKB_MULTIPOINT: lambda p: encode_point(*p),
           WKB_MULTILINESTRING: encode_linestring,
           WKB_MULTIPOLYGON: encode_polygon}[code]
    body = b"".join(enc(p) for p in parts)
    return struct.pack("<BII", 1, code, len(parts)) + body


def decode(buf: bytes) -> dict:
    """Parse one WKB geometry → {"type": name, "rings": [arrays]} where
    for Point/MultiPoint rings is one (n,2) array; for LineString /
    MultiLineString one array per line; for Polygon one per ring; for
    MultiPolygon a flat ring list plus "ring_part" part index."""
    geom, _ = _decode_at(buf, 0)
    return geom


def _decode_at(buf: bytes, off: int):
    byteorder = buf[off]
    bo = "<" if byteorder == 1 else ">"
    (code,) = struct.unpack_from(bo + "I", buf, off + 1)
    off += 5
    code &= 0xFF  # strip any SRID/Z flags (not produced by this engine)
    if code == WKB_POINT:
        x, y = struct.unpack_from(bo + "dd", buf, off)
        return {"type": "Point", "rings": [np.array([[x, y]])], "ring_part": [0]}, off + 16
    if code in (WKB_LINESTRING,):
        (n,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        arr = np.frombuffer(buf, dtype=bo + "f8", count=2 * n, offset=off).reshape(n, 2)
        return {"type": "LineString", "rings": [arr], "ring_part": [0]}, off + 16 * n
    if code == WKB_POLYGON:
        (nr,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(bo + "I", buf, off)
            off += 4
            rings.append(np.frombuffer(buf, dtype=bo + "f8", count=2 * n, offset=off).reshape(n, 2))
            off += 16 * n
        return {"type": "Polygon", "rings": rings, "ring_part": [0] * nr}, off
    if code in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON):
        (np_,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings, ring_part = [], []
        for i in range(np_):
            sub, off = _decode_at(buf, off)
            rings.extend(sub["rings"])
            ring_part.extend([i] * len(sub["rings"]))
        if code == WKB_MULTIPOINT:
            pts = np.vstack(rings) if rings else np.empty((0, 2))
            return {"type": "MultiPoint", "rings": [pts], "ring_part": [0]}, off
        return {"type": _TYPE_NAMES[code], "rings": rings, "ring_part": ring_part}, off
    raise ValueError(f"unsupported WKB geometry code {code}")


# ------------------------------------------------------------- vectorized

_POINT_HDR = struct.pack("<BI", 1, WKB_POINT)


def encode_points(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Vectorized: (n,) lon/lat float64 → (n,) object array of 21-byte
    WKB point buffers. One ``tobytes`` + view split; no per-row struct."""
    n = len(lon)
    raw = np.empty((n, 21), dtype=np.uint8)
    raw[:, 0] = 1
    raw[:, 1:5] = np.frombuffer(_POINT_HDR[1:], dtype=np.uint8)
    raw[:, 5:13] = np.asarray(lon, dtype="<f8").view(np.uint8).reshape(n, 8)
    raw[:, 13:21] = np.asarray(lat, dtype="<f8").view(np.uint8).reshape(n, 8)
    flat = raw.tobytes()
    return np.fromiter(
        (flat[i * 21:(i + 1) * 21] for i in range(n)), dtype=object, count=n
    )


_RECT_HDR = struct.pack("<BIII", 1, WKB_POLYGON, 1, 5)


def encode_rects(x0, y0, x1, y1) -> np.ndarray:
    """Vectorized: four (n,) float64 bounds → (n,) object array of
    93-byte WKB rect polygons (one coord-matrix view + tobytes; no
    per-row struct packing)."""
    n = len(x0)
    raw = np.empty((n, 93), dtype=np.uint8)
    raw[:, :13] = np.frombuffer(_RECT_HDR, dtype=np.uint8)
    coords = np.empty((n, 10), dtype="<f8")
    coords[:, 0::8] = np.asarray(x0, "<f8")[:, None]   # cols 0, 8
    coords[:, 1] = coords[:, 3] = y0
    coords[:, 2] = coords[:, 4] = x1
    coords[:, 5] = coords[:, 7] = y1
    coords[:, 6] = x0
    coords[:, 9] = y0
    raw[:, 13:] = coords.view(np.uint8).reshape(n, 80)
    flat = raw.tobytes()
    return np.fromiter((flat[i * 93:(i + 1) * 93] for i in range(n)),
                       dtype=object, count=n)


def encode_polygons_uniform(rings: np.ndarray) -> np.ndarray:
    """Vectorized: (m, k, 2) float64 CLOSED rings → (m,) object array
    of single-ring WKB polygons. One coord-matrix view + tobytes — no
    per-row struct packing (the buffer-build pattern of encode_rects)."""
    m, k, _ = rings.shape
    rec = 13 + 16 * k
    raw = np.empty((m, rec), dtype=np.uint8)
    raw[:, :13] = np.frombuffer(
        struct.pack("<BIII", 1, WKB_POLYGON, 1, k), np.uint8)
    raw[:, 13:] = np.ascontiguousarray(rings, "<f8").view(np.uint8) \
        .reshape(m, 16 * k)
    flat = raw.tobytes()
    return np.fromiter((flat[i * rec:(i + 1) * rec] for i in range(m)),
                       dtype=object, count=m)


def encode_linestrings_uniform(paths: np.ndarray) -> np.ndarray:
    """Vectorized: (m, k, 2) float64 paths → (m,) object array of
    k-point WKB LineStrings. One coord-matrix view + tobytes (the
    encode_polygons_uniform pattern)."""
    m, k, _ = paths.shape
    rec = 9 + 16 * k
    raw = np.empty((m, rec), dtype=np.uint8)
    raw[:, :9] = np.frombuffer(
        struct.pack("<BII", 1, WKB_LINESTRING, k), np.uint8)
    raw[:, 9:] = np.ascontiguousarray(paths, "<f8").view(np.uint8) \
        .reshape(m, 16 * k)
    flat = raw.tobytes()
    return np.fromiter((flat[i * rec:(i + 1) * rec] for i in range(m)),
                       dtype=object, count=m)


def decode_points(wkbs) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode of a column of WKB *points* → (lon, lat).

    Accepts a pyarrow BinaryArray, numpy object array, or list of
    bytes. Fast path: when every buffer is the standard 21-byte LE
    point, a single frombuffer reshape decodes the whole column.
    """
    try:  # pyarrow array → zero-copy-ish contiguous buffers fast path
        import pyarrow as pa
        if isinstance(wkbs, (pa.Array, pa.ChunkedArray)):
            if isinstance(wkbs, pa.ChunkedArray):
                wkbs = wkbs.combine_chunks()
            if wkbs.null_count == 0:
                offs = np.frombuffer(wkbs.buffers()[1], dtype=np.int32)[
                    wkbs.offset:wkbs.offset + len(wkbs) + 1]
                if len(offs) > 1 and np.all(np.diff(offs) == 21):
                    data = np.frombuffer(wkbs.buffers()[2], dtype=np.uint8)
                    block = data[offs[0]:offs[-1]].reshape(-1, 21)
                    if np.all(block[:, 0] == 1):
                        lon = block[:, 5:13].copy().view("<f8").ravel()
                        lat = block[:, 13:21].copy().view("<f8").ravel()
                        return lon, lat
            wkbs = wkbs.to_pylist()
    except ImportError:  # pragma: no cover
        pass
    n = len(wkbs)
    lon = np.empty(n, dtype=np.float64)
    lat = np.empty(n, dtype=np.float64)
    for i, b in enumerate(wkbs):
        if b is None:
            lon[i] = np.nan
            lat[i] = np.nan
            continue
        x, y = struct.unpack_from("<dd" if b[0] == 1 else ">dd", b, 5)
        lon[i] = x
        lat[i] = y
    return lon, lat


def decode_flat(wkbs):
    """Batch WKB decode → flat coordinate arrays: the feed for the
    vectorized refine kernels (spatial.py line/polygon joins,
    raster.py rasterize). One Python step per RING HEADER; the
    coordinate bulk moves in a single ``np.concatenate`` of zero-copy
    ``frombuffer`` views — no per-feature dict building.

    Accepts a pyarrow Binary (Chunked)Array, numpy object array, or
    list of bytes/None. Returns a dict:

      ``pts``       (M,2) float64 — all coordinates, feature-major
      ``ring_off``  (P+1,) int64  — point offsets per ring/part
      ``ring_feat`` (P,)  int64   — owning row per ring
      ``ring_part`` (P,)  int64   — part index within the feature
                                    (MultiPolygon grouping; else 0)
      ``ring_type`` (P,)  int64   — WKB code of the ring's (sub)geometry
                                    (2 line, 3 polygon, 1 point)
      ``valid``     (N,)  bool    — False for null rows

    Rings appear grouped by feature in row order, so each feature's
    points are contiguous in ``pts``.
    """
    try:
        import pyarrow as pa
        if isinstance(wkbs, pa.ChunkedArray):
            wkbs = wkbs.combine_chunks()
        if isinstance(wkbs, pa.Array):
            wkbs = wkbs.to_pylist()
    except ImportError:  # pragma: no cover
        pass
    n = len(wkbs)
    valid = np.ones(n, dtype=bool)
    views: list = []
    ring_feat: list = []
    ring_part: list = []
    ring_len: list = []
    ring_type: list = []

    for i, buf in enumerate(wkbs):
        if buf is None:
            valid[i] = False
            continue
        buf = bytes(buf)
        _flat_feature(buf, 0, i, views, ring_feat, ring_part, ring_len,
                      ring_type)
    pts = (np.concatenate(views) if views
           else np.empty((0, 2), np.float64))
    lens = np.asarray(ring_len, np.int64)
    return {
        "pts": pts,
        "ring_off": np.concatenate(([0], np.cumsum(lens))).astype(np.int64),
        "ring_feat": np.asarray(ring_feat, np.int64),
        "ring_part": np.asarray(ring_part, np.int64),
        "ring_type": np.asarray(ring_type, np.int64),
        "valid": valid,
    }


def _flat_feature(buf: bytes, off: int, i: int, views, ring_feat,
                  ring_part, ring_len, ring_type, part0: int = 0) -> int:
    """Append one geometry's rings to the flat accumulators; → next
    offset. Sub-geometries of a Multi* get increasing part indices."""
    bo = "<" if buf[off] == 1 else ">"
    (code,) = struct.unpack_from(bo + "I", buf, off + 1)
    off += 5
    code &= 0xFF
    if code == WKB_POINT:
        views.append(np.frombuffer(buf, bo + "f8", 2, off).reshape(1, 2))
        ring_feat.append(i)
        ring_part.append(part0)
        ring_len.append(1)
        ring_type.append(code)
        return off + 16
    if code == WKB_LINESTRING:
        (npts,) = struct.unpack_from(bo + "I", buf, off)
        views.append(np.frombuffer(buf, bo + "f8", 2 * npts, off + 4)
                     .reshape(npts, 2))
        ring_feat.append(i)
        ring_part.append(part0)
        ring_len.append(npts)
        ring_type.append(code)
        return off + 4 + 16 * npts
    if code == WKB_POLYGON:
        (nr,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        for _ in range(nr):
            (npts,) = struct.unpack_from(bo + "I", buf, off)
            views.append(np.frombuffer(buf, bo + "f8", 2 * npts, off + 4)
                         .reshape(npts, 2))
            ring_feat.append(i)
            ring_part.append(part0)
            ring_len.append(npts)
            ring_type.append(code)
            off += 4 + 16 * npts
        return off
    if code in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON):
        (nparts,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        for p in range(nparts):
            off = _flat_feature(buf, off, i, views, ring_feat, ring_part,
                                ring_len, ring_type, part0 + p)
        return off
    raise ValueError(f"unsupported WKB geometry code {code}")


def geom_type(buf: bytes) -> str:
    bo = "<" if buf[0] == 1 else ">"
    (code,) = struct.unpack_from(bo + "I", buf, 1)
    return _TYPE_NAMES[code & 0xFF]


def bbox(buf: bytes) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) of one WKB geometry.
    Mirrors the per-type bbox derivation of the reference
    (/root/reference/pythongis/vector/data.py:172-199)."""
    g = decode(buf)
    pts = np.vstack(g["rings"])
    return (float(pts[:, 0].min()), float(pts[:, 1].min()),
            float(pts[:, 0].max()), float(pts[:, 1].max()))
