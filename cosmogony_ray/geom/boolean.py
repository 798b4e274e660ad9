"""Even-odd polygon boolean intersection (pure numpy).

The reference subtracts sibling zones with GEOS ``difference``
(/root/reference/src/additional_zones.rs:198-235). This module provides the
piece our even-odd representation needs to match that soundly: an exact
**intersection** of a subtrahend with the subject, so ``subtract`` only ever
inserts rings that lie inside the subject (a subtrahend ring straddling the
subject used to flip parity OUTSIDE the subject too).

Algorithm (classic fragmentation + classification):
1. split every edge of A at its intersections with B's edges (and vice
   versa), including collinear-overlap endpoints;
2. keep A-fragments whose midpoint is covered by B (boundary-inclusive) and
   B-fragments whose midpoint is STRICTLY inside A (strict on one side so a
   shared boundary contributes exactly one copy);
3. re-assemble rings from the kept fragments with coordinate snapping;
   dangling chains (zero-area touches) drop out naturally.

Even-odd semantics throughout — ring orientation and nesting order are
irrelevant to downstream point-location, and ``even_odd_area`` computes the
area a ring soup encloses under the same parity rule.
"""

from __future__ import annotations

import numpy as np

from .predicates import PreparedPolygon
from .wkb import MultiPolygon

_SNAP = 1e-9


def _edges_of(mpoly: MultiPolygon) -> np.ndarray:
    """(n, 2, 2) array of edges (p, q) over all rings."""
    segs = []
    for rings in mpoly:
        for ring in rings:
            p = ring[:-1]
            q = ring[1:]
            segs.append(np.stack([p, q], axis=1))
    if not segs:
        return np.zeros((0, 2, 2))
    return np.concatenate(segs)


def _split_params(edges_a: np.ndarray, edges_b: np.ndarray) -> list[list[float]]:
    """For each edge of A, the sorted parameter values t ∈ (0,1) where it
    meets an edge of B (proper crossings, endpoint touches, and collinear
    overlap endpoints)."""
    na = edges_a.shape[0]
    out: list[list[float]] = [[] for _ in range(na)]
    if na == 0 or edges_b.shape[0] == 0:
        return out
    p = edges_a[:, 0][:, None, :]   # (na, 1, 2)
    r = (edges_a[:, 1] - edges_a[:, 0])[:, None, :]
    q = edges_b[:, 0][None, :, :]   # (1, nb, 2)
    s = (edges_b[:, 1] - edges_b[:, 0])[None, :, :]
    qmp = q - p
    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]          # (na, nb)
    qpxr = qmp[..., 0] * r[..., 1] - qmp[..., 1] * r[..., 0]
    qpxs = qmp[..., 0] * s[..., 1] - qmp[..., 1] * s[..., 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = qpxs / rxs
        u = qpxr / rxs
    crossing = (np.abs(rxs) > 1e-18) & (t > -1e-12) & (t < 1 + 1e-12) & (
        u > -1e-12
    ) & (u < 1 + 1e-12)
    ai, bi = np.nonzero(crossing)
    for k in range(ai.size):
        tv = float(t[ai[k], bi[k]])
        if 1e-12 < tv < 1 - 1e-12:
            out[ai[k]].append(tv)
    # collinear overlaps: project B endpoints onto collinear A edges
    collinear = (np.abs(rxs) <= 1e-18) & (np.abs(qpxr) <= 1e-12)
    ai, bi = np.nonzero(collinear)
    if ai.size:
        rlen2 = (r[..., 0] ** 2 + r[..., 1] ** 2)[:, 0]
        for k in range(ai.size):
            a_, b_ = ai[k], bi[k]
            if rlen2[a_] <= 0:
                continue
            for endpoint in (edges_b[b_, 0], edges_b[b_, 1]):
                d = endpoint - edges_a[a_, 0]
                tv = float(
                    (d[0] * (edges_a[a_, 1] - edges_a[a_, 0])[0]
                     + d[1] * (edges_a[a_, 1] - edges_a[a_, 0])[1]) / rlen2[a_]
                )
                if 1e-12 < tv < 1 - 1e-12:
                    out[a_].append(tv)
    for lst in out:
        lst.sort()
    return out


def _fragments(edges: np.ndarray, params: list[list[float]]) -> np.ndarray:
    """Split edges at their parameter lists → (m, 2, 2) fragment array."""
    frags = []
    for i in range(edges.shape[0]):
        p, q = edges[i, 0], edges[i, 1]
        ts = [0.0] + params[i] + [1.0]
        for a, b in zip(ts[:-1], ts[1:]):
            if b - a <= 1e-12:
                continue
            frags.append([p + a * (q - p), p + b * (q - p)])
    if not frags:
        return np.zeros((0, 2, 2))
    return np.asarray(frags)


def _assemble_snapped(frags: np.ndarray) -> list[np.ndarray]:
    """Greedy ring assembly with snapped endpoints; open chains dropped."""

    def key(pt) -> tuple:
        return (round(float(pt[0]) / _SNAP) * _SNAP, round(float(pt[1]) / _SNAP) * _SNAP)

    # adjacency: endpoint key → list of (frag index, which end)
    adj: dict[tuple, list[tuple[int, int]]] = {}
    for i in range(frags.shape[0]):
        adj.setdefault(key(frags[i, 0]), []).append((i, 0))
        adj.setdefault(key(frags[i, 1]), []).append((i, 1))
    used = np.zeros(frags.shape[0], dtype=bool)
    rings: list[np.ndarray] = []
    for start in range(frags.shape[0]):
        if used[start]:
            continue
        used[start] = True
        chain = [frags[start, 0], frags[start, 1]]
        start_key = key(frags[start, 0])
        while key(chain[-1]) != start_key:
            found = False
            for fi, end in adj.get(key(chain[-1]), ()):
                if used[fi]:
                    continue
                used[fi] = True
                nxt = frags[fi, 1] if end == 0 else frags[fi, 0]
                chain.append(nxt)
                found = True
                break
            if not found:
                chain = None
                break
        if chain is not None and len(chain) >= 4:
            # snap coordinates to the matching grid: intersection arithmetic
            # leaves ±1e-17 noise that would put ring points an ulp OUTSIDE
            # the clip region (breaking downstream containment tests)
            ring = np.round(np.asarray(chain) / _SNAP) * _SNAP
            ring[-1] = ring[0]
            area = 0.5 * abs(
                np.sum(
                    ring[:-1, 0] * ring[1:, 1] - ring[1:, 0] * ring[:-1, 1]
                )
            )
            if area > 1e-15:
                rings.append(ring)
    return rings


def intersection_even_odd(a: MultiPolygon, b: MultiPolygon) -> list[np.ndarray]:
    """Rings of A ∩ B under even-odd semantics (flat ring list — nesting
    carries the parity; empty list when the intersection has no area)."""
    edges_a = _edges_of(a)
    edges_b = _edges_of(b)
    if edges_a.shape[0] == 0 or edges_b.shape[0] == 0:
        return []
    prep_a = PreparedPolygon(a)
    prep_b = PreparedPolygon(b)
    frags_a = _fragments(edges_a, _split_params(edges_a, edges_b))
    frags_b = _fragments(edges_b, _split_params(edges_b, edges_a))
    keep = []
    if frags_a.shape[0]:
        mids = (frags_a[:, 0] + frags_a[:, 1]) / 2.0
        inside = prep_b.covers_points(mids[:, 0], mids[:, 1])
        keep.append(frags_a[inside])
    if frags_b.shape[0]:
        mids = (frags_b[:, 0] + frags_b[:, 1]) / 2.0
        inb, onb = prep_a.locate_points(mids[:, 0], mids[:, 1])
        keep.append(frags_b[inb & ~onb])
    if not keep:
        return []
    return _assemble_snapped(np.concatenate(keep))


def _interior_point(ring: np.ndarray) -> np.ndarray | None:
    """A point strictly inside the ring: scanline at mid-height (nudged off
    vertex rows), midpoint of the first crossing interval."""
    ys = ring[:-1, 1]
    ymin, ymax = float(ys.min()), float(ys.max())
    h = ymax - ymin
    if h <= 0:
        return None
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    for k in range(12):
        yt = ymin + h * (0.5 + ((-1) ** k) * (k + 1) * 0.013719)
        if not (ymin < yt < ymax) or np.any(np.abs(ys - yt) < 1e-12):
            continue
        straddle = (y1 > yt) != (y2 > yt)
        if not straddle.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x1 + (yt - y1) / (y2 - y1) * (x2 - x1)
        xs = np.sort(xi[straddle])
        if xs.size >= 2:
            return np.array([(xs[0] + xs[1]) / 2.0, yt])
    return None


def _ring_contained(inner: np.ndarray, outer_prep: PreparedPolygon) -> bool:
    """inner ⊆ outer for NON-CROSSING rings (they may touch): probe inner's
    vertices and edge midpoints — any strictly outside → False; else any
    strictly inside → True; all on the boundary → True (identical rings
    cancel under even-odd)."""
    mids = (inner[:-1] + inner[1:]) / 2.0
    px = np.concatenate([inner[:-1, 0], mids[:, 0]])
    py = np.concatenate([inner[:-1, 1], mids[:, 1]])
    inside, onb = outer_prep.locate_points(px, py)
    strictly_out = ~inside
    if strictly_out.any():
        return False
    return True


def even_odd_area(rings: list[np.ndarray]) -> float:
    """Area enclosed by a ring soup under even-odd parity: |ring| signed by
    the parity of how many other rings CONTAIN it (ring containment, not
    point containment — a small ring can contain a big ring's interior
    probe point without containing the ring). Assumes rings do not properly
    cross (they may touch) — true for clipped-to-subject soups."""
    if not rings:
        return 0.0
    areas = []
    preps = []
    for r in rings:
        areas.append(
            0.5 * abs(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))
        )
        preps.append(PreparedPolygon([[r]]))
    total = 0.0
    for i, r in enumerate(rings):
        depth = 0
        for j, p in enumerate(preps):
            if i == j:
                continue
            # area tie-break: only a ring with area ≥ ours can contain us
            # (touching equal-area rings count once — i < j breaks the tie)
            if areas[j] < areas[i] or (areas[j] == areas[i] and j > i):
                continue
            if _ring_contained(r, p):
                depth += 1
        total += areas[i] if depth % 2 == 0 else -areas[i]
    return max(total, 0.0)
