"""Voronoi partitioning + clipping for the additional-zones pipeline.

Replaces the reference's GEOS calls (`voronoi`, `intersection`, `difference`,
/root/reference/src/additional_zones.rs:198-401) with pure numpy:

- ``voronoi_cells``: per-point convex cell via half-plane (perpendicular
  bisector) clipping of an expanded bounding rectangle — O(k²) per group,
  fine for the small per-parent place groups (§2.9 step 5). Cells come back
  **in input point order** (GEOS returns them unordered and the reference has
  to match cells back by containment, additional_zones.rs:364-383; our
  construction makes that matching implicit).
- ``clip_by_convex``: Sutherland–Hodgman clip of an arbitrary (possibly
  concave, holed) MultiPolygon against a convex ring — exact for convex
  clips.
- ``subtract``: difference A − B implemented as even-odd geometry: B∩A's
  rings are appended reversed as holes. Exact under the engine's even-odd
  predicates whenever each subtrahend lies inside the subject (the sibling-
  zone case this pipeline needs); degenerate/touching overlaps reduce to
  zero-area rings and are dropped. If the difference comes out empty the
  caller keeps the ORIGINAL boundary — faithfully mirroring the reference's
  convert_to_geo(empty)→None → "no update" behavior
  (additional_zones.rs:219-233).
"""

from __future__ import annotations

import numpy as np

from .algorithms import multipolygon_area, normalize_orientation, ring_signed_area
from .wkb import MultiPolygon, _close_ring

_EPS_AREA = 1e-12


def _clip_ring_halfplane(ring: np.ndarray, a: float, b: float, c: float) -> np.ndarray | None:
    """Keep the side a*x + b*y <= c of an open ring (first != last ok);
    returns closed ring or None if empty."""
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    n = len(pts)
    out = []
    for i in range(n):
        p = pts[i]
        q = pts[(i + 1) % n]
        dp = a * p[0] + b * p[1] - c
        dq = a * q[0] + b * q[1] - c
        if dp <= 0:
            out.append(p)
            if dq > 0:
                t = dp / (dp - dq)
                out.append(p + t * (q - p))
        elif dq <= 0:
            t = dp / (dp - dq)
            out.append(p + t * (q - p))
    if len(out) < 3:
        return None
    return _close_ring(np.asarray(out))


def voronoi_cells(
    points: np.ndarray, bbox: tuple[float, float, float, float], margin: float = 1.0
) -> list[np.ndarray | None]:
    """Convex voronoi cell ring per input point, clipped to the expanded
    bbox envelope (the GEOS envelope-clip analog). None for degenerate cells
    (coincident points: the later duplicate keeps None)."""
    pts = np.asarray(points, dtype=np.float64)
    minx, miny, maxx, maxy = bbox
    w = max(maxx - minx, 1e-9) * margin
    h = max(maxy - miny, 1e-9) * margin
    env = np.array(
        [
            [minx - w, miny - h],
            [maxx + w, miny - h],
            [maxx + w, maxy + h],
            [minx - w, maxy + h],
            [minx - w, miny - h],
        ]
    )
    cells: list[np.ndarray | None] = []
    for i in range(len(pts)):
        cell: np.ndarray | None = env.copy()
        for j in range(len(pts)):
            if i == j or cell is None:
                continue
            # bisector half-plane: closer to pts[i] than pts[j]
            d = pts[j] - pts[i]
            if d[0] == 0.0 and d[1] == 0.0:
                # coincident: first occurrence keeps the cell
                if j < i:
                    cell = None
                continue
            mid = (pts[i] + pts[j]) / 2.0
            a, b = d[0], d[1]
            c = a * mid[0] + b * mid[1]
            cell = _clip_ring_halfplane(cell, a, b, c)
        cells.append(cell)
    return cells


def clip_by_convex(mpoly: MultiPolygon, convex_ring: np.ndarray) -> MultiPolygon:
    """mpoly ∩ convex region (ring CCW or CW accepted). Holes are clipped
    independently (even-odd semantics downstream)."""
    ring = _close_ring(np.asarray(convex_ring, dtype=np.float64))
    if ring_signed_area(ring) < 0:
        ring = ring[::-1].copy()
    pts = ring[:-1]
    out: MultiPolygon = []
    for rings in mpoly:
        new_rings = []
        for k, r in enumerate(rings):
            cur: np.ndarray | None = r
            for i in range(len(pts)):
                if cur is None:
                    break
                p = pts[i]
                q = pts[(i + 1) % len(pts)]
                # inside = left of edge p→q (CCW ring): cross((q-p),(x-p)) >= 0
                a = q[1] - p[1]
                b = -(q[0] - p[0])
                c = a * p[0] + b * p[1]
                cur = _clip_ring_halfplane(cur, a, b, c)
            if cur is not None and abs(ring_signed_area(cur)) > _EPS_AREA:
                if k == 0:
                    new_rings.append(cur)
                elif new_rings:
                    new_rings.append(cur)
        if new_rings:
            out.append(new_rings)
    return normalize_orientation(out)


def subtract(subject: MultiPolygon, subtrahends: list[MultiPolygon]) -> MultiPolygon | None:
    """subject − ∪subtrahends via even-odd holes; returns None when the
    difference is (near-)empty — callers then keep the original boundary
    (reference quirk, see module docstring).

    Every subtrahend is first CLIPPED to the subject (exact even-odd
    boolean intersection, geom.boolean): inserting an unclipped straddling
    ring flips parity OUTSIDE the subject too, and its full area
    over-counted ``removed_area`` into false empty-difference results
    (round-1 ADVICE). Fully-inside subtrahends skip the clip (covers fast
    path); disjoint ones contribute nothing. The emptiness check uses the
    even-odd area of the ACTUAL output ring set, so it is consistent with
    the emitted geometry even when subtrahends overlap each other.

    Known approximation (round-2 ADVICE, accepted): when two subtrahends
    MUTUALLY overlap, their clipped rings can properly cross each other,
    and ``even_odd_area``'s containment-parity area is then inexact for
    the crossing region (their overlap flips back to "kept" under even-odd
    instead of staying removed). This only affects the near-empty-
    difference decision — point location on the emitted ring soup remains
    exact because even-odd PIP is well-defined for crossing rings — and in
    the reference's own pipeline subtrahends are sibling admin zones,
    which tile rather than overlap (additional_zones.rs:238-252). A true
    pre-merge needs a polygon UNION operator, out of scope for this
    kernel."""
    from .boolean import even_odd_area, intersection_even_odd
    from .predicates import PreparedPolygon, bbox_contains, covers

    if not subtrahends:
        return subject
    try:
        subj_prep = PreparedPolygon(subject)
    except ValueError:
        return subject
    holes: list[np.ndarray] = []
    for sub in subtrahends:
        try:
            sub_prep = PreparedPolygon(sub)
        except ValueError:
            continue
        if bbox_contains(subj_prep.bbox, sub_prep.bbox) and covers(
            subj_prep, sub_prep
        ):
            # fully inside — rings carry over unchanged (exact)
            for rings in sub:
                for ring in rings:
                    if abs(ring_signed_area(ring)) > _EPS_AREA:
                        holes.append(ring[::-1].copy())
            continue
        clipped = intersection_even_odd(sub, subject)
        for ring in clipped:
            if abs(ring_signed_area(ring)) > _EPS_AREA:
                holes.append(ring[::-1].copy())
    if not holes:
        return subject
    subj_rings = [r for rings in subject for r in rings]
    if even_odd_area(subj_rings + holes) <= _EPS_AREA:
        return None  # empty difference
    out = [list(rings) for rings in subject]
    # attach all clipped rings to the first polygon (even-odd semantics:
    # ring membership in a particular polygon does not change parity)
    out[0] = list(out[0]) + holes
    return normalize_orientation(out)
