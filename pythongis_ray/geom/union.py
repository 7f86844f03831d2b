"""Exact polygon boolean overlays without GEOS: vertical (slab)
decomposition over rational arithmetic.

The reference dissolves / overlays arbitrary geometry groups with
shapely (cascaded_union /root/reference/pythongis/vector/sql.py:129-137,
clip overlays manager.py:208-266). This module reproduces the overlay
MEASURES (area, part count) and a valid region decomposition exactly,
for any simple polygons with float64 vertices:

1. every vertex x plus every pairwise edge-crossing x (solved in
   ``fractions.Fraction`` — float64 inputs convert exactly, so the
   slab boundaries are exact rationals) splits the x-axis into slabs;
2. inside one slab no edges cross, so each polygon's coverage is an
   even-odd pairing of its edges ordered by y, a layer's coverage is
   a 1-D interval union, and the overlay (union / intersection /
   difference of two layers) is a 1-D interval boolean;
3. each result interval over a slab is a trapezoid with linear top
   and bottom; areas sum exactly in rationals, and intervals that
   share y at a slab boundary connect into parts via union-find
   (touching counts as connected, matching cascaded_union).

Output geometry: one ring per part assembled from the lower/upper
chains when the part is single-interval per slab (simply connected);
parts with holes or pinches fall back to their trapezoid
decomposition (area-identical, boundary-subdivided) — documented
deviation, the MEASURES stay exact either way.

Complexity per call: O(E^2) crossing detection + O(slabs * E log E)
sweep — dissolve groups and clip pairs are small; this is
driver-free work inside map_groups / map_batches.
"""

from __future__ import annotations

from fractions import Fraction as Fr

import numpy as np


def _edges_of(layers):
    """→ (edges, xs): edges are (x0, y0, x1, y1, layer, poly) Fraction
    tuples with x0 < x1 (vertical edges dropped — they bound no slab
    interior); xs the vertex x set."""
    edges = []
    xs = set()
    for lid, polys in enumerate(layers):
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
                        edges.append((ax, ay, bx, by, lid, pid))
                    else:
                        edges.append((bx, by, ax, ay, lid, pid))
    return edges, xs


def _crossing_xs(edges, xs):
    """Add every pairwise edge-crossing x (strictly inside both
    x-ranges) to the slab boundary set. A vectorized float bbox
    prefilter narrows the O(E²) pair set before any exact Fraction
    work (floats bound the rationals exactly here — the endpoints ARE
    floats), so groups with hundreds of edges stay fast."""
    n = len(edges)
    if n < 2:
        return xs
    fx0 = np.array([float(e[0]) for e in edges])
    fx1 = np.array([float(e[2]) for e in edges])
    fy_lo = np.array([min(float(e[1]), float(e[3])) for e in edges])
    fy_hi = np.array([max(float(e[1]), float(e[3])) for e in edges])
    slopes = [None] * n
    for i in range(n):
        cand = np.flatnonzero(
            (np.minimum(fx1[i], fx1[i + 1:]) > np.maximum(fx0[i], fx0[i + 1:]))
            & (fy_lo[i] <= fy_hi[i + 1:]) & (fy_lo[i + 1:] <= fy_hi[i])
        ) + i + 1
        if not len(cand):
            continue
        ax0, ay0, ax1, ay1 = edges[i][:4]
        if slopes[i] is None:
            slopes[i] = (ay1 - ay0) / (ax1 - ax0)
        si = slopes[i]
        for j in cand:
            bx0, by0, bx1, by1 = edges[j][:4]
            lo = max(ax0, bx0)
            hi = min(ax1, bx1)
            if hi <= lo:
                continue
            if slopes[j] is None:
                slopes[j] = (by1 - by0) / (bx1 - bx0)
            sj = slopes[j]
            if si == sj:
                continue
            x = (by0 - ay0 + si * ax0 - sj * bx0) / (si - sj)
            if lo < x < hi:
                xs.add(x)
    return xs


def _y_at(e, x):
    x0, y0, x1, y1 = e[:4]
    return y0 + (y1 - y0) * (x - x0) / (x1 - x0)


# An interval is (yl_a, yh_a, yl_b, yh_b, ym_l, ym_h): its bounding
# edges evaluated at the slab's left edge, right edge, and midpoint.
# Midpoint values give the slab-wide ordering (no crossings inside).

def _merge_union(ivs):
    if not ivs:
        return []
    ivs = sorted(ivs, key=lambda t: t[4])
    merged = []
    cur = list(ivs[0])
    for iv in ivs[1:]:
        if iv[4] <= cur[5]:     # overlap or touch → union
            if iv[5] > cur[5]:
                cur[1], cur[3], cur[5] = iv[1], iv[3], iv[5]
        else:
            merged.append(tuple(cur))
            cur = list(iv)
    merged.append(tuple(cur))
    return merged


def _iv_intersection(A, B):
    out = []
    for a in A:
        for b in B:
            lo = (a[0], a[2], a[4]) if a[4] >= b[4] else (b[0], b[2], b[4])
            hi = (a[1], a[3], a[5]) if a[5] <= b[5] else (b[1], b[3], b[5])
            if lo[2] < hi[2]:
                out.append((lo[0], hi[0], lo[1], hi[1], lo[2], hi[2]))
    return sorted(out, key=lambda t: t[4])


def _iv_difference(A, B):
    out = []
    Bs = sorted(B, key=lambda t: t[4])
    for a in A:
        cur = (a[0], a[2], a[4])
        hi_a = (a[1], a[3], a[5])
        for b in Bs:
            b_lo = (b[0], b[2], b[4])
            b_hi = (b[1], b[3], b[5])
            if b_hi[2] <= cur[2] or b_lo[2] >= hi_a[2]:
                continue
            if b_lo[2] > cur[2]:
                out.append((cur[0], b_lo[0], cur[1], b_lo[1],
                            cur[2], b_lo[2]))
            if b_hi[2] > cur[2]:
                cur = b_hi
            if cur[2] >= hi_a[2]:
                break
        if cur[2] < hi_a[2]:
            out.append((cur[0], hi_a[0], cur[1], hi_a[1], cur[2], hi_a[2]))
    return out


def _sweep(layers, combine):
    """Core sweep: layers is a list of polygon lists; ``combine`` maps
    the per-layer union interval lists of one slab to the result
    intervals. → (area: float, parts: list[list[rings]])."""
    layers = [[p for p in polys if p] for polys in layers]
    edges, xs = _edges_of(layers)
    if not edges:
        return 0.0, []
    xs = sorted(_crossing_xs(edges, xs))
    area = Fr(0)
    slabs = []  # (xa, xb, [(yl_a, yh_a, yl_b, yh_b), ...])
    for xa, xb in zip(xs[:-1], xs[1:]):
        if xb <= xa:
            continue
        xm = (xa + xb) / 2
        active = [e for e in edges if e[0] <= xa and xb <= e[2]]
        per_layer = []
        for lid, polys in enumerate(layers):
            ivs = []
            for pid in range(len(polys)):
                ys = sorted((_y_at(e, xm), e) for e in active
                            if e[4] == lid and e[5] == pid)
                for k in range(0, len(ys) - 1, 2):   # even-odd pairing
                    lo_e, hi_e = ys[k][1], ys[k + 1][1]
                    ivs.append((_y_at(lo_e, xa), _y_at(hi_e, xa),
                                _y_at(lo_e, xb), _y_at(hi_e, xb),
                                ys[k][0], ys[k + 1][0]))
            per_layer.append(_merge_union(ivs))
        res = combine(per_layer)
        if not res:
            continue
        ivals = []
        for yl_a, yh_a, yl_b, yh_b, _, _ in res:
            area += ((yh_a - yl_a) + (yh_b - yl_b)) * (xb - xa) / 2
            ivals.append((yl_a, yh_a, yl_b, yh_b))
        slabs.append((xa, xb, ivals))
    return float(area), _assemble(slabs)


def union_polygons_exact(polys):
    """Exact union of a list of polygons (each: list of rings, ring 0
    exterior, rest holes, even-odd semantics). → (area, parts): one
    ring list per connected component (see module docstring for the
    geometry contract)."""
    return _sweep([polys], lambda per: per[0])


def overlay_exact(polys_a, polys_b, op: str):
    """Exact boolean overlay of two polygon layers:
    ``op`` ∈ 'union' | 'intersection' | 'difference' (A − B).
    → (area, parts), same contract as :func:`union_polygons_exact`.
    This is the GEOS-free general clip kernel behind the reference's
    overlay rewrite (manager.py:208-266)."""
    if op == "union":
        return _sweep([polys_a, polys_b],
                      lambda per: _merge_union(per[0] + per[1]))
    if op == "intersection":
        return _sweep([polys_a, polys_b],
                      lambda per: _iv_intersection(per[0], per[1]))
    if op == "difference":
        return _sweep([polys_a, polys_b],
                      lambda per: _iv_difference(per[0], per[1]))
    raise ValueError(f"unsupported overlay op {op!r}")


def _assemble(slabs):
    """Connectivity + ring assembly over the slab interval structure."""
    ids = []
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
            pivals = slabs[s - 1][2]
            for i, (yl_a, yh_a, _, _) in enumerate(ivals):
                for j, (_, _, pyl_b, pyh_b) in enumerate(pivals):
                    if yl_a <= pyh_b and pyl_b <= yh_a:
                        join(ids[s - 1][j], row[i])
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
            ring = _dedupe_ring(lower + upper[::-1])
            parts.append([np.array(ring, np.float64)])
        else:
            rings = []
            for s, xa, xb, (yl_a, yh_a, yl_b, yh_b) in trap_list:
                quad = _dedupe_ring([(xa, yl_a), (xb, yl_b),
                                     (xb, yh_b), (xa, yh_a)])
                if len(quad) >= 4:
                    rings.append(np.array(quad, np.float64))
            parts.append(rings)
    return parts


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
