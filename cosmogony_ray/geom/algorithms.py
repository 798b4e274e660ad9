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


def multipolygon_metrics(
    mpoly: MultiPolygon, want_centroid: bool = True
) -> tuple[tuple[float, float, float, float], float, tuple[float, float] | None]:
    """(bbox, area, centroid) in ONE walk: each ring's shoelace cross
    array is computed once and reused for area AND centroid.

    BIT-EXACT vs the separate multipolygon_bbox / multipolygon_area /
    multipolygon_centroid calls (pinned by tests/test_geom_properties.py):
    ``cross = x·yn − xn·y`` over ``ring[:-1]``/``ring[1:]`` is elementwise
    identical to ring_signed_area's ``x[:-1]·y[1:] − x[1:]·y[:-1]`` on a
    closed ring, and each per-ring reduction is the same ``np.sum`` over
    the same values in the same order; accumulation order across rings
    mirrors the originals. With ``want_centroid=False`` the centroid slot
    is None (callers with an admin_centre/label node skip that math)."""
    minx = miny = np.inf
    maxx = maxy = -np.inf
    cx_sum = cy_sum = a_sum = 0.0
    area_total = 0.0
    for rings in mpoly:
        poly_area = 0.0
        for i, ring in enumerate(rings):
            x = ring[:-1, 0]
            y = ring[:-1, 1]
            xn = ring[1:, 0]
            yn = ring[1:, 1]
            cross = x * yn - xn * y
            raw = 0.5 * float(np.sum(cross))
            if i == 0:
                minx = min(minx, ring[:, 0].min())
                miny = min(miny, ring[:, 1].min())
                maxx = max(maxx, ring[:, 0].max())
                maxy = max(maxy, ring[:, 1].max())
                poly_area = abs(raw)
            else:
                poly_area -= abs(raw)
            if want_centroid and raw != 0.0:
                cx = float(np.sum((x + xn) * cross)) / (6.0 * raw)
                cy = float(np.sum((y + yn) * cross)) / (6.0 * raw)
                w = abs(raw) if i == 0 else -abs(raw)  # holes subtract
                cx_sum += cx * w
                cy_sum += cy * w
                a_sum += w
        area_total += poly_area
    bbox = (float(minx), float(miny), float(maxx), float(maxy))
    if not want_centroid:
        return bbox, area_total, None
    if a_sum == 0.0 or not np.isfinite(cx_sum / a_sum) or not np.isfinite(cy_sum / a_sum):
        pts = np.vstack([rings[0][:-1] for rings in mpoly])
        centroid = (float(pts[:, 0].mean()), float(pts[:, 1].mean()))
    else:
        centroid = (cx_sum / a_sum, cy_sum / a_sum)
    return bbox, area_total, centroid


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
    # endpoint tuples cached per segment: the greedy matcher compares
    # Python floats (identical semantics to np.array_equal on 2-float
    # rows, incl. NaN≠NaN) without ufunc dispatch per probe
    ends = [((s[0, 0], s[0, 1]), (s[-1, 0], s[-1, 1])) for s in pending]
    while pending:
        cur = pending.pop(0)
        head, tail = ends.pop(0)
        progressed = True
        while head != tail:  # not closed yet
            if not progressed:
                cur = None
                break
            progressed = False
            for j in range(len(pending)):
                shead, stail = ends[j]
                seg = pending[j]
                if shead == tail:
                    cur = np.vstack([cur, seg[1:]])
                    tail = stail
                elif stail == tail:
                    cur = np.vstack([cur, seg[::-1][1:]])
                    tail = shead
                elif stail == head:
                    cur = np.vstack([seg, cur[1:]])
                    head = shead
                elif shead == head:
                    cur = np.vstack([seg[::-1], cur[1:]])
                    head = stail
                else:
                    continue
                pending.pop(j)
                ends.pop(j)
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
