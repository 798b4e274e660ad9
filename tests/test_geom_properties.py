"""Property-based geometry tests (hypothesis) — randomized counterpart of the
hand-built cases, pinning the invariants the engine's joins rely on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cosmogony_ray.geom import wkb
from cosmogony_ray.geom.algorithms import multipolygon_area, multipolygon_bbox
from cosmogony_ray.geom.cells import GridCells
from cosmogony_ray.geom.predicates import PreparedPolygon, covers


def rect(a, b, c, d):
    return np.array([[a, b], [c, b], [c, d], [a, d], [a, b]], dtype=np.float64)


rect_coords = st.tuples(
    st.floats(-170, 160), st.floats(-80, 70), st.floats(0.01, 20), st.floats(0.01, 20)
)


def _mk(t):
    x, y, w, h = t
    return (x, y, x + w, y + h)


@given(rect_coords)
@settings(max_examples=50, deadline=None)
def test_wkb_roundtrip_property(t):
    bbox = _mk(t)
    mp = [[rect(*bbox)]]
    back = wkb.multipolygon_from_wkb(wkb.multipolygon_to_wkb(mp))
    np.testing.assert_array_equal(back[0][0], mp[0][0])
    assert multipolygon_bbox(back) == bbox


@given(rect_coords, st.floats(0.05, 0.4), st.floats(0.05, 0.4))
@settings(max_examples=50, deadline=None)
def test_covers_nested_shrink(t, fx, fy):
    """A rect always covers any rect shrunk inside it (incl. shared corner)."""
    minx, miny, maxx, maxy = _mk(t)
    w, h = maxx - minx, maxy - miny
    inner = (minx, miny, minx + w * fx + 1e-9, miny + h * fy + 1e-9)
    a = PreparedPolygon([[rect(minx, miny, maxx, maxy)]])
    b = PreparedPolygon([[rect(*inner)]])
    assert covers(a, b)
    if inner != (minx, miny, maxx, maxy):
        assert not covers(b, a)


@given(rect_coords, st.floats(0.1, 5.0))
@settings(max_examples=50, deadline=None)
def test_covers_disjoint_false(t, gap):
    minx, miny, maxx, maxy = _mk(t)
    a = PreparedPolygon([[rect(minx, miny, maxx, maxy)]])
    shifted = (maxx + gap, miny, maxx + gap + 1.0, maxy)
    b = PreparedPolygon([[rect(*shifted)]])
    assert not covers(a, b)
    assert not covers(b, a)


@given(
    rect_coords,
    st.lists(st.tuples(st.floats(0, 1), st.floats(0, 1)), min_size=1, max_size=20),
)
@settings(max_examples=50, deadline=None)
def test_pip_matches_rect_arithmetic(t, pts):
    bbox = _mk(t)
    prep = PreparedPolygon([[rect(*bbox)]])
    lon = np.array([bbox[0] + (bbox[2] - bbox[0]) * 1.5 * u - 0.2 for u, _ in pts])
    lat = np.array([bbox[1] + (bbox[3] - bbox[1]) * 1.5 * v - 0.2 for _, v in pts])
    got = prep.covers_points(lon, lat)
    want = (lon >= bbox[0]) & (lon <= bbox[2]) & (lat >= bbox[1]) & (lat <= bbox[3])
    np.testing.assert_array_equal(got, want)


@given(rect_coords)
@settings(max_examples=50, deadline=None)
def test_probe_meets_cover(t):
    """Hierarchical-grid invariant: a point inside a zone's bbox shares at
    least one ladder cell with the zone's covering — the correctness
    precondition of the inclusion cell join."""
    bbox = _mk(t)
    g = GridCells(min_res=2, max_res=12, max_cells_per_zone=64)
    res = g.cover_res_for_bbox(bbox)
    cover = set(int(c) for c in g.cover_bbox(bbox, res))
    cx = (bbox[0] + bbox[2]) / 2
    cy = (bbox[1] + bbox[3]) / 2
    probe = set(int(c) for c in g.cells_of_ladder(np.array([cx]), np.array([cy]))[:, 0])
    assert cover & probe


@given(rect_coords)
@settings(max_examples=30, deadline=None)
def test_area_positive_and_consistent(t):
    bbox = _mk(t)
    mp = [[rect(*bbox)]]
    a = multipolygon_area(mp)
    assert abs(a - (bbox[2] - bbox[0]) * (bbox[3] - bbox[1])) < 1e-6 * max(1, a)


@given(rect_coords, rect_coords)
@settings(max_examples=40, deadline=None)
def test_metrics_bit_exact_vs_separate_kernels(t1, t2):
    """multipolygon_metrics (the fused assemble epilogue) must be BIT-
    identical to the three separate kernels — incl. a holed polygon and a
    second disjoint polygon."""
    from cosmogony_ray.geom.algorithms import (
        multipolygon_area,
        multipolygon_bbox,
        multipolygon_centroid,
        multipolygon_metrics,
    )

    b1 = _mk(t1)
    b2 = _mk(t2)
    # polygon 1 with a centered hole at 1/3 scale; polygon 2 plain
    hx = (2 * b1[0] + b1[2]) / 3, (2 * b1[1] + b1[3]) / 3, (b1[0] + 2 * b1[2]) / 3, (b1[1] + 2 * b1[3]) / 3
    mp = [[rect(*b1), rect(*hx)[::-1].copy()], [rect(*b2)]]
    bbox, area, centroid = multipolygon_metrics(mp)
    assert bbox == multipolygon_bbox(mp)
    assert area == multipolygon_area(mp)
    assert centroid == multipolygon_centroid(mp)
    bbox2, area2, c2 = multipolygon_metrics(mp, want_centroid=False)
    assert (bbox2, area2, c2) == (bbox, area, None)
