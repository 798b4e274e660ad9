"""subtract() soundness for partially-overlapping subtrahends (round-1
ADVICE): a subtrahend straddling the subject must be clipped to it — the
even-odd result may not cover any point outside the subject, the removed
region must be excluded, and the area must be exact."""

import numpy as np

from cosmogony_ray.geom.boolean import even_odd_area, intersection_even_odd
from cosmogony_ray.geom.predicates import PreparedPolygon
from cosmogony_ray.geom.voronoi import subtract


def rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])


def area_of(mpoly):
    return even_odd_area([r for rings in mpoly for r in rings])


def test_straddling_subtrahend_clipped():
    subject = [[rect(0, 0, 1, 1)]]
    sub = [[rect(0.5, -0.5, 1.0, 0.5)]]  # half outside (below)
    out = subtract(subject, [sub])
    assert out is not None
    prep = PreparedPolygon(out)
    cov, _ = prep.locate_points(np.array([0.75, 0.75, 0.25]), np.array([-0.25, 0.25, 0.5]))
    assert not cov[0]  # outside the subject: NOT covered
    assert not cov[1]  # removed region: NOT covered
    assert cov[2]      # kept region: covered
    assert abs(area_of(out) - 0.75) < 1e-9


def test_covering_subtrahend_empty_difference():
    assert subtract([[rect(0, 0, 1, 1)]], [[[rect(-1, -1, 2, 2)]]]) is None


def test_disjoint_and_adjacent_subtrahends_noop_area():
    subject = [[rect(0, 0, 1, 1)]]
    out = subtract(subject, [[[rect(5, 5, 6, 6)]]])
    assert abs(area_of(out) - 1.0) < 1e-9
    out = subtract(subject, [[[rect(1, 0, 2, 1)]]])  # shares an edge only
    assert abs(area_of(out) - 1.0) < 1e-9


def test_intersection_even_odd_area():
    inter = intersection_even_odd([[rect(0.5, -0.5, 1.0, 0.5)]], [[rect(0, 0, 1, 1)]])
    assert abs(even_odd_area(inter) - 0.25) < 1e-9


def test_straddling_sibling_property():
    """Randomized: subject unit square, subtrahend rect anywhere around it;
    area(subject - sub) == 1 - area(subject ∩ sub) exactly."""
    rng = np.random.default_rng(11)
    for _ in range(50):
        x0, y0 = rng.uniform(-1, 1, 2)
        w, h = rng.uniform(0.1, 1.5, 2)
        subject = [[rect(0, 0, 1, 1)]]
        sub = [[rect(x0, y0, x0 + w, y0 + h)]]
        ix0, iy0 = max(0, x0), max(0, y0)
        ix1, iy1 = min(1, x0 + w), min(1, y0 + h)
        inter_area = max(0.0, ix1 - ix0) * max(0.0, iy1 - iy0)
        out = subtract(subject, [sub])
        if 1 - inter_area < 1e-9:
            assert out is None
            continue
        assert abs(area_of(out) - (1 - inter_area)) < 1e-8, (x0, y0, w, h)
