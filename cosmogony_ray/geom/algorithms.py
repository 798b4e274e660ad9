"""Geometric scalar functions: area, centroid, bbox, ring assembly.

Replaces the reference's geo/geos crate calls:
- ``bounding_rect`` — /root/reference/src/zone_ext.rs:184
- ``centroid`` with NaN guard — /root/reference/src/zone_ext.rs:195-210
- ``build_boundary`` (relation member ways → closed rings → MultiPolygon) —
  external crate osm_boundaries_utils 0.11, used at
  /root/reference/src/zone_ext.rs:183
"""

from __future__ import annotations

import numpy as np

from .wkb import MultiPolygon, _close_ring


def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area (CCW positive). Planar degrees² — used only for
    relative comparisons (tie-breaks, hole assignment), matching the
    reference's use of planar geo-types ops."""
    x = ring[:, 0]
    y = ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def polygon_area(rings: list[np.ndarray]) -> float:
    """Positive area of exterior minus holes (assumes normalized orientation
    is NOT required: uses abs of each ring, holes subtract)."""
    if not rings:
        return 0.0
    a = abs(ring_signed_area(rings[0]))
    for hole in rings[1:]:
        a -= abs(ring_signed_area(hole))
    return a


def multipolygon_area(mpoly: MultiPolygon) -> float:
    return sum(polygon_area(rings) for rings in mpoly)


def multipolygon_bbox(mpoly: MultiPolygon) -> tuple[float, float, float, float]:
    minx = miny = np.inf
    maxx = maxy = -np.inf
    for rings in mpoly:
        ext = rings[0]
        minx = min(minx, ext[:, 0].min())
        miny = min(miny, ext[:, 1].min())
        maxx = max(maxx, ext[:, 0].max())
        maxy = max(maxy, ext[:, 1].max())
    return (float(minx), float(miny), float(maxx), float(maxy))


def multipolygon_centroid(mpoly: MultiPolygon) -> tuple[float, float]:
    """Area-weighted centroid; NaN-guarded fallback to vertex mean (the
    reference guards NaN centroids the same way,
    /root/reference/src/zone_ext.rs:195-210)."""
    cx_sum = cy_sum = a_sum = 0.0
    for rings in mpoly:
        for i, ring in enumerate(rings):
            x = ring[:-1, 0]
            y = ring[:-1, 1]
            xn = ring[1:, 0]
            yn = ring[1:, 1]
            cross = x * yn - xn * y
            raw = 0.5 * float(np.sum(cross))
            if raw == 0.0:
                continue
            cx = float(np.sum((x + xn) * cross)) / (6.0 * raw)
            cy = float(np.sum((y + yn) * cross)) / (6.0 * raw)
            w = abs(raw) if i == 0 else -abs(raw)  # holes subtract
            cx_sum += cx * w
            cy_sum += cy * w
            a_sum += w
    if a_sum == 0.0 or not np.isfinite(cx_sum / a_sum) or not np.isfinite(cy_sum / a_sum):
        pts = np.vstack([rings[0][:-1] for rings in mpoly])
        return float(pts[:, 0].mean()), float(pts[:, 1].mean())
    return cx_sum / a_sum, cy_sum / a_sum


def normalize_orientation(mpoly: MultiPolygon) -> MultiPolygon:
    """Exterior rings CCW, holes CW (canonical form for WKB output)."""
    out = []
    for rings in mpoly:
        fixed = []
        for i, ring in enumerate(rings):
            a = ring_signed_area(ring)
            want_ccw = i == 0
            if (a < 0 and want_ccw) or (a > 0 and not want_ccw):
                ring = ring[::-1].copy()
            fixed.append(ring)
        out.append(fixed)
    return out


def assemble_rings(segments: list[np.ndarray]) -> list[np.ndarray]:
    """Join open way segments into closed rings by greedy endpoint matching —
    the semantics of osm_boundaries_utils' build_boundary (used at
    /root/reference/src/zone_ext.rs:183). Segments may need reversal.
    Unclosable leftovers are dropped (the reference logs and skips broken
    boundaries, yielding None → zone skipped at /root/reference/src/lib.rs:74-88).
    """
    pending = [np.asarray(s, dtype=np.float64) for s in segments if len(s) >= 2]
    rings: list[np.ndarray] = []
    while pending:
        cur = pending.pop(0)
        # already closed?
        progressed = True
        while not np.array_equal(cur[0], cur[-1]):
            if not progressed:
                cur = None
                break
            progressed = False
            for j, seg in enumerate(pending):
                if np.array_equal(seg[0], cur[-1]):
                    cur = np.vstack([cur, seg[1:]])
                elif np.array_equal(seg[-1], cur[-1]):
                    cur = np.vstack([cur, seg[::-1][1:]])
                elif np.array_equal(seg[-1], cur[0]):
                    cur = np.vstack([seg, cur[1:]])
                elif np.array_equal(seg[0], cur[0]):
                    cur = np.vstack([seg[::-1], cur[1:]])
                else:
                    continue
                pending.pop(j)
                progressed = True
                break
        if cur is not None and len(cur) >= 4:
            rings.append(_close_ring(cur))
    return rings


def build_polygons(
    outer_rings: list[np.ndarray], inner_rings: list[np.ndarray]
) -> MultiPolygon:
    """Assign inner rings (holes) to the smallest outer ring whose bbox
    contains them; orientation-normalized MultiPolygon out."""
    from .predicates import PreparedPolygon

    polys: list[list[np.ndarray]] = [[r] for r in outer_rings]
    if inner_rings and polys:
        preps = [PreparedPolygon([[r]]) for r in outer_rings]
        areas = [abs(ring_signed_area(r)) for r in outer_rings]
        order = np.argsort(areas)  # smallest container wins
        for hole in inner_rings:
            hx, hy = hole[0, 0], hole[0, 1]
            for k in order:
                if preps[k].covers_points(np.array([hx]), np.array([hy]))[0]:
                    polys[int(k)].append(hole)
                    break
    return normalize_orientation(polys)
