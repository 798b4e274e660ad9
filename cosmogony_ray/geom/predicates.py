"""Vectorized geometric predicates over the rings representation.

Semantics mirror the reference's GEOS usage:

- ``covers`` is boundary-inclusive ("covers", not "contains") — a zone whose
  boundary touches its parent's boundary is still covered
  (/root/reference/src/zone_ext.rs:236-277, comment at :244-246). Errors on
  invalid geometry must yield ``False`` (zone_ext.rs:247-273) — callers wrap in
  try/except.
- ``contains_center`` is a point-in-polygon test of the other zone's center
  (/root/reference/src/zone_ext.rs:279-284).

Implementation is pure numpy (no GEOS in this environment): even-odd
ray-casting with an explicit on-boundary check so boundary points count as
covered. Polygon-covers-polygon is the standard "every vertex of B covered by
A and no proper edge crossing between the boundaries" test — exact for the
non-degenerate admin-boundary geometries this engine processes (nested and
edge-sharing rectangles, voronoi cells, ring-assembled OSM boundaries); known
not to handle a hole of A passing *between* B's vertices without crossing any
B edge (impossible for closed rings).
"""

from __future__ import annotations

import numpy as np

from .wkb import MultiPolygon

_EDGE_CHUNK = 1024


class PreparedPolygon:
    """Edge-array form of a MultiPolygon for repeated vectorized queries
    (the analog of shapely's prepared geometry / the reference's cloned GEOS
    geoms in /root/reference/src/additional_zones.rs:364-368)."""

    __slots__ = ("x1", "y1", "x2", "y2", "bbox", "mpoly", "vx", "vy", "_stripes")

    def __init__(self, mpoly: MultiPolygon):
        xs1, ys1, xs2, ys2 = [], [], [], []
        for rings in mpoly:
            for ring in rings:
                xs1.append(ring[:-1, 0])
                ys1.append(ring[:-1, 1])
                xs2.append(ring[1:, 0])
                ys2.append(ring[1:, 1])
        if not xs1:
            raise ValueError("empty multipolygon")
        self.x1 = np.concatenate(xs1)
        self.y1 = np.concatenate(ys1)
        self.x2 = np.concatenate(xs2)
        self.y2 = np.concatenate(ys2)
        # ring start vertices (== x1/y1 by construction): cached so repeated
        # polygon-vs-polygon tests don't re-concatenate ring arrays per call
        self.vx = self.x1
        self.vy = self.y1
        self.bbox = (
            float(min(self.x1.min(), self.x2.min())),
            float(min(self.y1.min(), self.y2.min())),
            float(max(self.x1.max(), self.x2.max())),
            float(max(self.y1.max(), self.y2.max())),
        )
        self.mpoly = mpoly
        self._stripes = None  # lazy y-stripe edge index (big polygons)

    @classmethod
    def from_edges(cls, x1, y1, x2, y2) -> "PreparedPolygon":
        """Construct directly from flat edge arrays (a GeomPack slice) —
        no WKB parse, no Python ring loop. ``x1/y1`` double as the ring
        start vertices (same invariant as ``__init__``); ``mpoly`` is not
        materialized (nothing reads it after construction)."""
        if x1.size == 0:
            raise ValueError("empty multipolygon")
        self = cls.__new__(cls)
        self.x1, self.y1, self.x2, self.y2 = x1, y1, x2, y2
        self.vx = x1
        self.vy = y1
        self.bbox = (
            float(min(x1.min(), x2.min())),
            float(min(y1.min(), y2.min())),
            float(max(x1.max(), x2.max())),
            float(max(y1.max(), y2.max())),
        )
        self.mpoly = None
        self._stripes = None
        return self

    # real admin boundaries carry 10^4-10^5 edges; a flat O(edges) scan per
    # point made one covers() call on a country polygon cost seconds. The
    # stripe index buckets edges by the y-stripes they span, so a point only
    # tests the edges of its own stripe — classic scanline bucketing (the
    # in-kernel analog of GEOS prepared geometries' edge index).
    _STRIPE_MIN_EDGES = 512

    def _stripe_index(self):
        if self._stripes is None:
            n_bins = max(8, min(1024, self.x1.size // 16))
            ymin, ymax = self.bbox[1], self.bbox[3]
            height = max(ymax - ymin, 1e-300)
            elo = np.minimum(self.y1, self.y2)
            ehi = np.maximum(self.y1, self.y2)
            blo = np.clip(((elo - ymin) / height * n_bins).astype(np.int64), 0, n_bins - 1)
            bhi = np.clip(((ehi - ymin) / height * n_bins).astype(np.int64), 0, n_bins - 1)
            counts = bhi - blo + 1
            edge_rep = np.repeat(np.arange(self.x1.size, dtype=np.int64), counts)
            within = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            bin_of = blo[edge_rep] + within
            order = np.argsort(bin_of, kind="stable")
            sorted_edges = edge_rep[order]
            bin_sorted = bin_of[order]
            starts = np.searchsorted(bin_sorted, np.arange(n_bins + 1))
            self._stripes = (n_bins, ymin, height, sorted_edges, starts)
        return self._stripes

    def covers_points(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Boundary-inclusive point-in-multipolygon, vectorized over points.

        Even-odd crossing count (holes handled for free) with an explicit
        on-segment test so boundary points return True (GEOS `covers`
        semantics, /root/reference/src/zone_ext.rs:244-246).
        """
        return self.locate_points(px, py)[0]

    def _locate_kernel(self, qx, qy, edge_sel=None):
        """(crossing count, on-edge flag) for points against (a subset of)
        the edge arrays, chunked over edges."""
        if edge_sel is None:
            x1, y1, x2, y2 = self.x1, self.y1, self.x2, self.y2
        else:
            x1, y1 = self.x1[edge_sel], self.y1[edge_sel]
            x2, y2 = self.x2[edge_sel], self.y2[edge_sel]
        cross = np.zeros(qx.size, dtype=np.int64)
        on_edge = np.zeros(qx.size, dtype=bool)
        for s in range(0, x1.size, _EDGE_CHUNK):
            ex1 = x1[s : s + _EDGE_CHUNK][:, None]
            ey1 = y1[s : s + _EDGE_CHUNK][:, None]
            ex2 = x2[s : s + _EDGE_CHUNK][:, None]
            ey2 = y2[s : s + _EDGE_CHUNK][:, None]
            # crossing test: edge straddles the horizontal line through qy
            straddle = (ey1 > qy[None, :]) != (ey2 > qy[None, :])
            # x of intersection of edge with that horizontal line
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (qy[None, :] - ey1) / (ey2 - ey1)
                xi = ex1 + t * (ex2 - ex1)
            cross += np.count_nonzero(straddle & (qx[None, :] < xi), axis=0)
            # on-segment: collinear and within bbox of the edge
            dx = ex2 - ex1
            dy = ey2 - ey1
            cp = dx * (qy[None, :] - ey1) - dy * (qx[None, :] - ex1)
            within = (
                (qx[None, :] >= np.minimum(ex1, ex2))
                & (qx[None, :] <= np.maximum(ex1, ex2))
                & (qy[None, :] >= np.minimum(ey1, ey2))
                & (qy[None, :] <= np.maximum(ey1, ey2))
            )
            on_edge |= np.any((cp == 0.0) & within, axis=0)
        return cross, on_edge

    def locate_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Return ``(covered, on_boundary)`` boolean masks for the points."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        n = px.shape[0]
        inside = np.zeros(n, dtype=bool)
        boundary = np.zeros(n, dtype=bool)
        minx, miny, maxx, maxy = self.bbox
        in_bbox = (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
        idx = np.nonzero(in_bbox)[0]
        if idx.size == 0:
            return inside, boundary
        qx = px[idx]
        qy = py[idx]
        if self.x1.size >= self._STRIPE_MIN_EDGES:
            # stripe path: each point only tests its y-stripe's edges
            n_bins, ymin, height, sorted_edges, starts = self._stripe_index()
            bins = np.clip(
                ((qy - ymin) / height * n_bins).astype(np.int64), 0, n_bins - 1
            )
            order = np.argsort(bins, kind="stable")
            bins_s = bins[order]
            runs = np.nonzero(np.r_[True, bins_s[1:] != bins_s[:-1]])[0]
            ends = np.append(runs[1:], bins_s.size)
            cross = np.zeros(qx.size, dtype=np.int64)
            on_edge = np.zeros(qx.size, dtype=bool)
            for rs, re_ in zip(runs, ends):
                b = int(bins_s[rs])
                sel = order[rs:re_]
                edges = sorted_edges[starts[b] : starts[b + 1]]
                if edges.size == 0:
                    continue
                c, o = self._locate_kernel(qx[sel], qy[sel], edges)
                cross[sel] = c
                on_edge[sel] = o
        else:
            cross, on_edge = self._locate_kernel(qx, qy)
        inside[idx] = (cross % 2 == 1) | on_edge
        boundary[idx] = on_edge
        return inside, boundary


def bbox_contains(outer: tuple, inner: tuple, eps: float = 0.0) -> bool:
    return (
        outer[0] <= inner[0] + eps
        and outer[1] <= inner[1] + eps
        and outer[2] >= inner[2] - eps
        and outer[3] >= inner[3] - eps
    )


def bbox_intersects(a: tuple, b: tuple) -> bool:
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def _cross_matrix_any(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> bool:
    """Any proper crossing between the two edge sets (full matrix)."""
    a1x, a1y = ax1[None, :], ay1[None, :]
    a2x, a2y = ax2[None, :], ay2[None, :]
    b1x, b1y = bx1[:, None], by1[:, None]
    b2x, b2y = bx2[:, None], by2[:, None]
    d1 = (a2x - a1x) * (b1y - a1y) - (a2y - a1y) * (b1x - a1x)
    d2 = (a2x - a1x) * (b2y - a1y) - (a2y - a1y) * (b2x - a1x)
    d3 = (b2x - b1x) * (a1y - b1y) - (b2y - b1y) * (a1x - b1x)
    d4 = (b2x - b1x) * (a2y - b1y) - (b2y - b1y) * (a2x - b1x)
    proper = (np.sign(d1) * np.sign(d2) < 0) & (np.sign(d3) * np.sign(d4) < 0)
    return bool(proper.any())


def _stripe_assign(y_lo, y_hi, ymin, height, n_bins):
    blo = np.clip(((y_lo - ymin) / height * n_bins).astype(np.int64), 0, n_bins - 1)
    bhi = np.clip(((y_hi - ymin) / height * n_bins).astype(np.int64), 0, n_bins - 1)
    return blo, bhi


def _proper_crossings(prep_a: PreparedPolygon, prep_b: PreparedPolygon) -> bool:
    """True iff any edge of B *properly* crosses an edge of A (interiors
    intersect transversally). Shared endpoints / collinear overlap do NOT
    count — `covers` is boundary-inclusive.

    A edges prefiltered to B's bbox; when both sides stay large (long shared
    borders between a country and a commune), the sets are y-stripe-bucketed
    and only co-stripe edge pairs are tested (the full cross matrix on two
    10^4-edge sets cost seconds per pair)."""
    bb = prep_b.bbox
    eminx = np.minimum(prep_a.x1, prep_a.x2)
    emaxx = np.maximum(prep_a.x1, prep_a.x2)
    eminy = np.minimum(prep_a.y1, prep_a.y2)
    emaxy = np.maximum(prep_a.y1, prep_a.y2)
    esel = (eminx <= bb[2]) & (emaxx >= bb[0]) & (eminy <= bb[3]) & (emaxy >= bb[1])
    ax1, ay1 = prep_a.x1[esel], prep_a.y1[esel]
    ax2, ay2 = prep_a.x2[esel], prep_a.y2[esel]
    na, nb = ax1.size, prep_b.x1.size
    if na == 0 or nb == 0:
        return False
    if na * nb <= 1024 * 1024:
        return _cross_matrix_any(
            ax1, ay1, ax2, ay2, prep_b.x1, prep_b.y1, prep_b.x2, prep_b.y2
        )
    # stripe-bucketed: only co-stripe pairs can cross
    ymin = min(float(np.minimum(ay1, ay2).min()), bb[1])
    ymax = max(float(np.maximum(ay1, ay2).max()), bb[3])
    height = max(ymax - ymin, 1e-300)
    n_bins = int(min(1024, max(8, (na + nb) // 32)))
    alo, ahi = _stripe_assign(np.minimum(ay1, ay2), np.maximum(ay1, ay2), ymin, height, n_bins)
    blo_, bhi_ = _stripe_assign(
        np.minimum(prep_b.y1, prep_b.y2),
        np.maximum(prep_b.y1, prep_b.y2),
        ymin,
        height,
        n_bins,
    )
    a_bins: list[list[int]] = [[] for _ in range(n_bins)]
    for i in range(na):
        for b in range(alo[i], ahi[i] + 1):
            a_bins[b].append(i)
    b_bins: list[list[int]] = [[] for _ in range(n_bins)]
    for i in range(nb):
        for b in range(blo_[i], bhi_[i] + 1):
            b_bins[b].append(i)
    for b in range(n_bins):
        if not a_bins[b] or not b_bins[b]:
            continue
        ai = np.asarray(a_bins[b])
        bi = np.asarray(b_bins[b])
        if _cross_matrix_any(
            ax1[ai], ay1[ai], ax2[ai], ay2[ai],
            prep_b.x1[bi], prep_b.y1[bi], prep_b.x2[bi], prep_b.y2[bi],
        ):
            return True
    return False


def covers_many(prep_a: PreparedPolygon, preps_b: list) -> np.ndarray:
    """Vectorized ``covers(prep_a, b) for b in preps_b`` — one set of numpy
    kernels over the CONCATENATED vertices/edges of all B polygons with
    segmented (``reduceat``) reductions, instead of ~25 tiny numpy calls per
    pair. Same three sub-tests and semantics as ``covers``; measured ~5-10×
    per pair on small admin polygons, and far fewer Python-level ops (the
    per-pair version's overhead density collapsed under many workers)."""
    n = len(preps_b)
    out = np.zeros(n, dtype=bool)
    cand = []
    for i in range(n):
        if preps_b[i] is None or not bbox_contains(prep_a.bbox, preps_b[i].bbox):
            continue
        if preps_b[i].x1.size > 1024:
            # big child (real OSM boundaries reach 10^4+ edges): the scalar
            # path has stripe-indexed PIP + bucketed crossings; the batched
            # matrices below would be edge_count-wide
            try:
                out[i] = covers(prep_a, preps_b[i])
            except Exception:
                out[i] = False
            continue
        cand.append(i)
    if not cand:
        return out

    counts = np.fromiter(
        (preps_b[i].vx.size for i in cand), dtype=np.int64, count=len(cand)
    )
    segs = np.concatenate([[0], np.cumsum(counts)])
    bx1 = np.concatenate([preps_b[i].x1 for i in cand])
    by1 = np.concatenate([preps_b[i].y1 for i in cand])
    bx2 = np.concatenate([preps_b[i].x2 for i in cand])
    by2 = np.concatenate([preps_b[i].y2 for i in cand])
    out[np.asarray(cand)] = covers_concat(prep_a, bx1, by1, bx2, by2, segs)
    return out


def covers_concat(
    prep_a: PreparedPolygon,
    bx1: np.ndarray,
    by1: np.ndarray,
    bx2: np.ndarray,
    by2: np.ndarray,
    segs: np.ndarray,
) -> np.ndarray:
    """``covers(prep_a, B_k)`` for B polygons given as CONCATENATED edge
    arrays with segment bounds ``segs`` (len = n_polys + 1). ``bx1/by1``
    double as each B's ring-start vertices (closed-ring invariant: edge
    count == vertex count, same bounds apply). This is the kernel both
    ``covers_many`` (list-of-prepared API) and the GeomPack covers stage
    (zero-copy slices of the broadcast edge pack) share."""
    # ---- test 1: every vertex of B inside-or-on A (one covers_points call)
    cov = prep_a.covers_points(bx1, by1).astype(np.int8)
    ok1 = np.minimum.reduceat(cov, segs[:-1]) == 1

    # ---- test 2: no vertex of A strictly inside B (hole-in-B catch)
    # only A vertices inside the B set's overall bbox can be strictly inside
    bminx, bmaxx = bx1.min(), bx1.max()
    bminy, bmaxy = by1.min(), by1.max()
    vsel = (
        (prep_a.vx >= min(bminx, bx2.min()))
        & (prep_a.vx <= max(bmaxx, bx2.max()))
        & (prep_a.vy >= min(bminy, by2.min()))
        & (prep_a.vy <= max(bmaxy, by2.max()))
    )
    ax = prep_a.vx[vsel]
    ay = prep_a.vy[vsel]
    strict_in = np.zeros(len(segs) - 1, dtype=bool)
    for s in range(0, ax.size, _EDGE_CHUNK):
        qx = ax[s : s + _EDGE_CHUNK][None, :]
        qy = ay[s : s + _EDGE_CHUNK][None, :]
        e_x1 = bx1[:, None]
        e_y1 = by1[:, None]
        e_x2 = bx2[:, None]
        e_y2 = by2[:, None]
        straddle = (e_y1 > qy) != (e_y2 > qy)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (qy - e_y1) / (e_y2 - e_y1)
            xi = e_x1 + t * (e_x2 - e_x1)
        crossings = (straddle & (qx < xi)).astype(np.int64)
        # per-B crossing count per query point
        cross_b = np.add.reduceat(crossings, segs[:-1], axis=0)
        cp = (e_x2 - e_x1) * (qy - e_y1) - (e_y2 - e_y1) * (qx - e_x1)
        within = (
            (qx >= np.minimum(e_x1, e_x2))
            & (qx <= np.maximum(e_x1, e_x2))
            & (qy >= np.minimum(e_y1, e_y2))
            & (qy <= np.maximum(e_y1, e_y2))
        )
        on_b = np.add.reduceat(((cp == 0.0) & within).astype(np.int64), segs[:-1], axis=0) > 0
        strict_in |= ((cross_b % 2 == 1) & ~on_b).any(axis=1)
    ok2 = ~strict_in

    # ---- test 3: no proper edge crossing between A's and B's boundaries
    # only A edges whose bbox meets the B set's bbox can cross a B edge
    eminx = np.minimum(prep_a.x1, prep_a.x2)
    emaxx = np.maximum(prep_a.x1, prep_a.x2)
    eminy = np.minimum(prep_a.y1, prep_a.y2)
    emaxy = np.maximum(prep_a.y1, prep_a.y2)
    esel = (
        (eminx <= max(bmaxx, bx2.max()))
        & (emaxx >= min(bminx, bx2.min()))
        & (eminy <= max(bmaxy, by2.max()))
        & (emaxy >= min(bminy, by2.min()))
    )
    a_x1, a_y1 = prep_a.x1[esel], prep_a.y1[esel]
    a_x2, a_y2 = prep_a.x2[esel], prep_a.y2[esel]
    prop_edge = np.zeros(bx1.size, dtype=bool)
    for s in range(0, a_x1.size, _EDGE_CHUNK):
        ax1c = a_x1[s : s + _EDGE_CHUNK][None, :]
        ay1c = a_y1[s : s + _EDGE_CHUNK][None, :]
        ax2c = a_x2[s : s + _EDGE_CHUNK][None, :]
        ay2c = a_y2[s : s + _EDGE_CHUNK][None, :]
        b1x = bx1[:, None]
        b1y = by1[:, None]
        b2x = bx2[:, None]
        b2y = by2[:, None]
        d1 = (ax2c - ax1c) * (b1y - ay1c) - (ay2c - ay1c) * (b1x - ax1c)
        d2 = (ax2c - ax1c) * (b2y - ay1c) - (ay2c - ay1c) * (b2x - ax1c)
        d3 = (b2x - b1x) * (ay1c - b1y) - (b2y - b1y) * (ax1c - b1x)
        d4 = (b2x - b1x) * (ay2c - b1y) - (b2y - b1y) * (ax2c - b1x)
        proper = (np.sign(d1) * np.sign(d2) < 0) & (np.sign(d3) * np.sign(d4) < 0)
        prop_edge |= proper.any(axis=1)
    ok3 = np.add.reduceat(prop_edge.astype(np.int64), segs[:-1]) == 0

    return ok1 & ok2 & ok3


def covers(prep_a: PreparedPolygon, prep_b: PreparedPolygon) -> bool:
    """A covers B (boundary-inclusive), the reference's parent test
    (/root/reference/src/zone_ext.rs:236-277 via GEOS covers).

    Test: bbox(A) ⊇ bbox(B); every vertex of B inside-or-on A; no vertex of A
    strictly inside B (catches a hole of A sitting in B's interior, which the
    vertex test alone would miss); no proper edge crossing between the
    boundaries.
    """
    if not bbox_contains(prep_a.bbox, prep_b.bbox):
        return False
    if not prep_a.covers_points(prep_b.vx, prep_b.vy).all():
        return False
    a_in_b, a_on_b = prep_b.locate_points(prep_a.vx, prep_a.vy)
    if (a_in_b & ~a_on_b).any():
        return False
    return not _proper_crossings(prep_a, prep_b)
