"""Unit tests for the pure-numpy geometry core.

Mirrors the reference's synthetic-geometry unit-test style
(/root/reference/src/hierarchy_builder.rs:133-288 builds nested squares by
hand and asserts containment)."""

import numpy as np
import pytest

from cosmogony_ray.geom import wkb
from cosmogony_ray.geom.algorithms import (
    assemble_rings,
    build_polygons,
    multipolygon_area,
    multipolygon_bbox,
    multipolygon_centroid,
)
from cosmogony_ray.geom.cells import GridCells
from cosmogony_ray.geom.predicates import PreparedPolygon, covers


def rect(minx, miny, maxx, maxy):
    return np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]],
        dtype=np.float64,
    )


def test_wkb_roundtrip():
    mp = [[rect(0, 0, 10, 10), rect(2, 2, 3, 3)], [rect(20, 20, 21, 21)]]
    buf = wkb.multipolygon_to_wkb(mp)
    back = wkb.multipolygon_from_wkb(buf)
    assert len(back) == 2
    assert len(back[0]) == 2
    np.testing.assert_array_equal(back[0][0], mp[0][0])
    lon, lat = wkb.point_from_wkb(wkb.point_to_wkb(1.5, -2.5))
    assert (lon, lat) == (1.5, -2.5)


def test_polygon_wkb_decodes_as_multipolygon():
    buf = wkb.polygon_to_wkb([rect(0, 0, 1, 1)])
    assert len(wkb.multipolygon_from_wkb(buf)) == 1


def test_area_bbox_centroid():
    mp = [[rect(0, 0, 4, 4), rect(1, 1, 2, 2)]]
    assert multipolygon_area(mp) == pytest.approx(15.0)
    assert multipolygon_bbox(mp) == (0, 0, 4, 4)
    cx, cy = multipolygon_centroid([[rect(0, 0, 4, 4)]])
    assert (cx, cy) == pytest.approx((2.0, 2.0))
    # centroid with hole shifts away from the hole
    cx, cy = multipolygon_centroid([[rect(0, 0, 4, 4), rect(0, 0, 2, 2)]])
    assert cx > 2.0 and cy > 2.0


def test_pip_boundary_inclusive():
    prep = PreparedPolygon([[rect(0, 0, 10, 10)]])
    px = np.array([5.0, 0.0, 10.0, 10.1, -0.1, 5.0])
    py = np.array([5.0, 5.0, 10.0, 5.0, 5.0, 0.0])
    got = prep.covers_points(px, py)
    np.testing.assert_array_equal(got, [True, True, True, False, False, True])


def test_pip_hole():
    prep = PreparedPolygon([[rect(0, 0, 10, 10), rect(4, 4, 6, 6)]])
    px = np.array([5.0, 3.0, 4.0])  # in hole / solid / on hole boundary
    py = np.array([5.0, 3.0, 5.0])
    got = prep.covers_points(px, py)
    # hole interior excluded; hole boundary is part of the polygon boundary → covered
    np.testing.assert_array_equal(got, [False, True, True])


def test_covers_nested_and_touching():
    country = PreparedPolygon([[rect(0, 0, 8, 8)]])
    state = PreparedPolygon([[rect(0, 0, 4, 8)]])  # shares two edges with country
    city = PreparedPolygon([[rect(1, 1, 3, 3)]])
    other = PreparedPolygon([[rect(3.5, 1, 5, 3)]])  # straddles state boundary
    assert covers(country, state)  # boundary-touching child IS covered (GEOS covers)
    assert covers(country, city)
    assert covers(state, city)
    assert not covers(state, other)
    assert not covers(city, state)
    # identical geometry covers itself
    assert covers(city, PreparedPolygon([[rect(1, 1, 3, 3)]]))


def test_covers_hole_breaks_containment():
    donut = PreparedPolygon([[rect(0, 0, 10, 10), rect(3, 3, 7, 7)]])
    inner = PreparedPolygon([[rect(4, 4, 6, 6)]])  # sits inside the hole
    ring_child = PreparedPolygon([[rect(1, 1, 2, 2)]])  # in the solid part
    assert not covers(donut, inner)
    assert covers(donut, ring_child)
    # child spanning the hole is not covered
    spanning = PreparedPolygon([[rect(2, 2, 8, 8)]])
    assert not covers(donut, spanning)


def test_assemble_rings_from_segments():
    # square split into two open ways, one reversed
    w1 = np.array([[0, 0], [1, 0], [1, 1]], dtype=float)
    w2 = np.array([[0, 0], [0, 1], [1, 1]], dtype=float)  # needs reversal
    rings = assemble_rings([w1, w2])
    assert len(rings) == 1
    assert rings[0].shape[0] == 5 or rings[0].shape[0] == 6
    assert np.array_equal(rings[0][0], rings[0][-1])


def test_build_polygons_hole_assignment():
    mp = build_polygons([rect(0, 0, 10, 10), rect(20, 0, 30, 10)], [rect(2, 2, 3, 3)])
    assert len(mp) == 2
    assert len(mp[0]) == 2  # hole went to the first outer
    assert len(mp[1]) == 1


def test_grid_cells():
    g = GridCells(min_res=2, max_res=8, max_cells_per_zone=16)
    # point cell stable and decodable
    cid = int(g.cell_of(np.array([1.0]), np.array([1.0]), 5)[0])
    assert g.res_of(cid) == 5
    bb = g.cell_bbox(cid)
    assert bb[0] <= 1.0 <= bb[2] and bb[1] <= 1.0 <= bb[3]
    # covering respects the cap
    cover = g.cover_bbox((0, 0, 90, 45))
    assert 1 <= len(cover) <= 16
    # ladder cells: parent relationship holds
    ladder = g.cells_of_ladder(np.array([10.0]), np.array([20.0]))
    assert ladder.shape == (len(g.ladder), 1)
    fine = int(ladder[-1, 0])
    coarse = int(ladder[0, 0])
    assert g.parent(fine, g.ladder[0]) == coarse


def test_cover_then_probe_meet():
    """A zone covered at its chosen res is found by a point probing the ladder."""
    g = GridCells(min_res=2, max_res=10, max_cells_per_zone=32)
    bbox = (5.0, 5.0, 5.5, 5.4)
    res = g.cover_res_for_bbox(bbox)
    cover = set(int(c) for c in g.cover_bbox(bbox, res))
    ladder = g.cells_of_ladder(np.array([5.2]), np.array([5.2]))
    probe_cells = set(int(c) for c in ladder[:, 0])
    assert cover & probe_cells


def test_covers_many_matches_scalar_covers():
    """covers_many must agree with covers on nested, overlapping, touching,
    disjoint, and hole-bearing cases."""
    import numpy as np

    from cosmogony_ray.geom.predicates import PreparedPolygon, covers, covers_many

    def rect(x0, y0, w, h=None):
        h = w if h is None else h
        ring = np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]]
        )
        return PreparedPolygon([[ring]])

    def rect_with_hole(x0, y0, w, hx, hy, hw):
        outer = np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + w], [x0, y0 + w], [x0, y0]]
        )
        hole = np.array(
            [[hx, hy], [hx + hw, hy], [hx + hw, hy + hw], [hx, hy + hw], [hx, hy]]
        )
        return PreparedPolygon([[outer, hole]])

    parent = rect(0, 0, 10)
    holey = rect_with_hole(0, 0, 10, 4, 4, 2)
    cases = [
        rect(1, 1, 2),            # fully inside
        rect(0, 0, 10),           # identical (covers: True, boundary-inclusive)
        rect(0, 0, 5),            # corner-sharing inside
        rect(-1, -1, 3),          # straddles boundary
        rect(20, 20, 1),          # disjoint
        rect(9, 9, 2),            # partially outside
        rect(4.5, 4.5, 1),        # inside the hole region (for holey parent)
        rect(1, 1, 8),            # spans across the hole (for holey parent)
    ]
    for pp in (parent, holey):
        expected = np.array([covers(pp, c) for c in cases])
        got = covers_many(pp, cases)
        assert (got == expected).all(), (got, expected)
    # rng fuzz: random small rects vs parent
    rng = np.random.default_rng(7)
    fuzz = [rect(*rng.uniform(-2, 9, 2), rng.uniform(0.1, 4)) for _ in range(200)]
    expected = np.array([covers(parent, c) for c in fuzz])
    got = covers_many(parent, fuzz)
    assert (got == expected).all()
