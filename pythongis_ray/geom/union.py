"""Exact polygon union without GEOS: vertical (slab) decomposition
over rational arithmetic.

The reference dissolves arbitrary geometry groups with shapely's
cascaded_union (/root/reference/pythongis/vector/sql.py:129-137). This
module reproduces the union MEASURES (area, part count) and a valid
region decomposition exactly, for any simple polygons with float64
vertices:

1. every vertex x plus every pairwise edge-crossing x (solved in
   ``fractions.Fraction`` — float64 inputs convert exactly, so the
   slab boundaries are exact rationals) splits the x-axis into slabs;
2. inside one slab no edges cross, so each polygon's coverage is an
   even-odd pairing of its edges ordered by y, and the union coverage
   is a 1-D interval merge;
3. each union interval over a slab is a trapezoid with linear top and
   bottom; areas sum exactly in rationals, and intervals that share y
   at a slab boundary connect into parts via union-find (touching
   counts as connected, matching cascaded_union).

Output geometry: one ring per part assembled from the lower/upper
chains when the part is single-interval per slab (simply connected);
parts with holes or pinches fall back to their trapezoid
decomposition (area-identical, boundary-subdivided) — documented
deviation, the MEASURES stay exact either way.

Complexity per group: O(E^2) crossing detection + O(slabs * E log E)
sweep — dissolve groups co-locate via the bucketed hash shuffle and
are small; this is driver-free, per-group work inside map_groups.
"""

from __future__ import annotations

from fractions import Fraction as Fr

import numpy as np


def _edges_of(polys):
    """→ list of (x0, y0, x1, y1, poly_id) Fractions with x0 < x1
    (vertical edges dropped — they bound no slab interior)."""
    edges = []
    xs = set()
    for pid, rings in enumerate(polys):
        for ring in rings:
            r = np.asarray(ring, np.float64)
            for k in range(len(r) - 1):
                ax, ay = Fr(float(r[k, 0])), Fr(float(r[k, 1]))
                bx, by = Fr(float(r[k + 1, 0])), Fr(float(r[k + 1, 1]))
                xs.add(ax)
                xs.add(bx)
                if ax == bx:
                    continue
                if ax < bx:
                    edges.append((ax, ay, bx, by, pid))
                else:
                    edges.append((bx, by, ax, ay, pid))
    return edges, xs


def _crossing_xs(edges, xs):
    """Add every pairwise edge-crossing x (strictly inside both
    x-ranges) to the slab boundary set."""
    n = len(edges)
    for i in range(n):
        ax0, ay0, ax1, ay1, _ = edges[i]
        mi = ax0
        ma = ax1
        si = (ay1 - ay0) / (ax1 - ax0)
        for j in range(i + 1, n):
            bx0, by0, bx1, by1, _ = edges[j]
            lo = max(mi, bx0)
            hi = min(ma, bx1)
            if hi <= lo:
                continue
            sj = (by1 - by0) / (bx1 - bx0)
            if si == sj:
                continue
            # y_i(x) = ay0 + si (x - ax0) ; solve equality
            x = (by0 - ay0 + si * ax0 - sj * bx0) / (si - sj)
            if lo < x < hi:
                xs.add(x)
    return xs


def _y_at(e, x):
    x0, y0, x1, y1, _ = e
    return y0 + (y1 - y0) * (x - x0) / (x1 - x0)


def union_polygons_exact(polys):
    """Exact union of a list of polygons (each: list of rings, ring 0
    exterior, rest holes, even-odd semantics).

    Returns ``(area: float, parts: list[list[rings]])`` where each
    part is a ring list for one connected component (single exterior
    ring when simply connected, else its trapezoid decomposition as
    consecutive rings). Area is the exact rational union area
    converted to float at the very end.
    """
    polys = [p for p in polys if p]
    if not polys:
        return 0.0, []
    edges, xs = _edges_of(polys)
    if not edges:
        return 0.0, []
    xs = sorted(_crossing_xs(edges, xs))
    npoly = len(polys)
    area = Fr(0)
    # per slab: list of union intervals; each interval keeps its
    # bounding y values at both slab edges for connectivity + geometry
    slabs = []  # (xa, xb, [(yl_a, yh_a, yl_b, yh_b), ...])
    for xa, xb in zip(xs[:-1], xs[1:]):
        if xb <= xa:
            continue
        xm = (xa + xb) / 2
        per_poly_ivals = []
        for pid in range(npoly):
            ys = sorted((_y_at(e, xm), e) for e in edges
                        if e[4] == pid and e[0] <= xa and xb <= e[2])
            # even-odd pairing: edges sorted by y at midpoint
            for k in range(0, len(ys) - 1, 2):
                lo_e, hi_e = ys[k][1], ys[k + 1][1]
                per_poly_ivals.append((
                    _y_at(lo_e, xa), _y_at(hi_e, xa),
                    _y_at(lo_e, xb), _y_at(hi_e, xb),
                    ys[k][0], ys[k + 1][0]))
        if not per_poly_ivals:
            continue
        # union merge ordered by midpoint y (no crossings inside the
        # slab → midpoint order is the slab-wide order)
        per_poly_ivals.sort(key=lambda t: t[4])
        merged = []
        cur = list(per_poly_ivals[0])
        for iv in per_poly_ivals[1:]:
            if iv[4] <= cur[5]:  # midpoints overlap/touch → union
                if iv[5] > cur[5]:
                    cur[1], cur[3], cur[5] = iv[1], iv[3], iv[5]
            else:
                merged.append(tuple(cur))
                cur = list(iv)
        merged.append(tuple(cur))
        ivals = []
        for yl_a, yh_a, yl_b, yh_b, _, _ in merged:
            area += ((yh_a - yl_a) + (yh_b - yl_b)) * (xb - xa) / 2
            ivals.append((yl_a, yh_a, yl_b, yh_b))
        slabs.append((xa, xb, ivals))
    # ---- connectivity across slab boundaries (union-find)
    ids = []  # global interval ids per slab
    parent = {}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def join(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    gid = 0
    for s, (xa, xb, ivals) in enumerate(slabs):
        row = []
        for _ in ivals:
            parent[gid] = gid
            row.append(gid)
            gid += 1
        ids.append(row)
        if s > 0 and slabs[s - 1][1] == xa:
            pxa, pxb, pivals = slabs[s - 1]
            for i, (yl_a, yh_a, _, _) in enumerate(ivals):
                for j, (_, _, pyl_b, pyh_b) in enumerate(pivals):
                    if yl_a <= pyh_b and pyl_b <= yh_a:
                        join(ids[s - 1][j], row[i])
    # ---- assemble geometry per part
    comp: dict[int, list] = {}
    for s, (xa, xb, ivals) in enumerate(slabs):
        for i, iv in enumerate(ivals):
            comp.setdefault(find(ids[s][i]), []).append((s, xa, xb, iv))
    parts = []
    for trap_list in comp.values():
        by_slab: dict[int, list] = {}
        for s, xa, xb, iv in trap_list:
            by_slab.setdefault(s, []).append((xa, xb, iv))
        simple = all(len(v) == 1 for v in by_slab.values())
        ss = sorted(by_slab)
        contiguous = all(b - a == 1 and slabs[a][1] == slabs[b][0]
                         for a, b in zip(ss[:-1], ss[1:]))
        if simple and contiguous:
            lower, upper = [], []
            for s in ss:
                xa, xb, (yl_a, yh_a, yl_b, yh_b) = by_slab[s][0]
                lower.append((xa, yl_a))
                lower.append((xb, yl_b))
                upper.append((xa, yh_a))
                upper.append((xb, yh_b))
            ring = lower + upper[::-1]
            ring = _dedupe_ring(ring)
            parts.append([np.array(ring, np.float64)])
        else:
            rings = []
            for s, xa, xb, (yl_a, yh_a, yl_b, yh_b) in trap_list:
                quad = _dedupe_ring([(xa, yl_a), (xb, yl_b),
                                     (xb, yh_b), (xa, yh_a)])
                if len(quad) >= 4:
                    rings.append(np.array(quad, np.float64))
            parts.append(rings)
    return float(area), parts


def _dedupe_ring(pts):
    """Drop consecutive duplicates and collinear midpoints; close the
    ring. Fraction inputs → float output (exact for dyadic values)."""
    pts = [(float(x), float(y)) for x, y in pts]
    out = []
    for p in pts:
        if not out or p != out[-1]:
            out.append(p)
    if len(out) > 1 and out[0] == out[-1]:
        out.pop()
    # collinear removal (cyclic)
    changed = True
    while changed and len(out) > 3:
        changed = False
        keep = []
        n = len(out)
        for i in range(n):
            a, b, c = out[i - 1], out[i], out[(i + 1) % n]
            cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            if cross != 0:
                keep.append(b)
            else:
                changed = True
        out = keep if len(keep) >= 3 else out
        if len(keep) < 3:
            break
    out.append(out[0])
    return out
