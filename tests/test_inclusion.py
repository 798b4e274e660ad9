"""Inclusion cell-join against mini-lux goldens (analog of the nested-squares
R-tree tests, /root/reference/src/hierarchy_builder.rs:133-288)."""

import pytest

from cosmogony_ray.config import EngineConfig
from cosmogony_ray.fixtures.synth import expected_inclusion_edges
from cosmogony_ray.stages.inclusion import find_inclusion_edges
from cosmogony_ray.stages.zone_build import assemble_zones
from cosmogony_ray.sources.osm import read_osm_tables


@pytest.fixture(scope="session")
def inclusion_edges(ray_session, mini_lux_dir):
    rels, ways, nodes = read_osm_tables(mini_lux_dir)
    zones = assemble_zones(rels, ways, nodes)
    edges = find_inclusion_edges(zones, EngineConfig())
    return {(r["child"], r["parent"]) for r in edges.take_all()}


def test_edges_match_golden(inclusion_edges):
    golden = expected_inclusion_edges()
    assert inclusion_edges == golden


def test_boundary_touching_children_covered(inclusion_edges):
    # suburbs tile their city exactly (shared edges) — covers, not contains
    for s in range(4001, 4005):
        assert (f"relation:{s}", "relation:3001") in inclusion_edges
    # node zones (no boundary) never appear
    assert not any("node:" in c or "node:" in p for c, p in inclusion_edges)


def test_big_parent_routes_children_through_scalar_covers(ray_session):
    """A parent boundary above the batched-kernel edge cap must still yield
    exactly the contained children (the big-parent branch in
    covers_tester_fn routes ALL its children through the stripe-indexed
    scalar path — parity with the batched kernel on the same geometry)."""
    import numpy as np

    from cosmogony_ray.config import EngineConfig
    from cosmogony_ray.geom.wkb import multipolygon_to_wkb
    from cosmogony_ray.model import ZONE_SCHEMA
    from cosmogony_ray.stages.inclusion import find_inclusion_edges
    import pyarrow as pa
    import ray.data as rd

    # parent: a 2000-edge near-circle (well above _BIG_CHILD_EDGES=1024)
    t = np.linspace(0.0, 2 * np.pi, 2001)
    ring = np.column_stack([10 + 5 * np.cos(t), 10 + 5 * np.sin(t)])
    ring[-1] = ring[0]

    def rect(a, b, c, d):
        return np.array([[a, b], [c, b], [c, d], [a, d], [a, b]])

    def zone(osm_id, mp, bbox):
        row = {n: None for n in ZONE_SCHEMA.names}
        row.update(
            osm_id=osm_id, zone_uid=osm_id, kind="relation", name=osm_id,
            zip_codes=[], tags=[], center_tags=[], international_labels=[],
            loc_name="", alt_name="", label="", is_generated=False,
            boundary_wkb=multipolygon_to_wkb(mp),
            minx=float(bbox[0]), miny=float(bbox[1]),
            maxx=float(bbox[2]), maxy=float(bbox[3]),
            area=float((bbox[2] - bbox[0]) * (bbox[3] - bbox[1])),
        )
        return row

    rows = [zone("relation:big", [[ring]], (5, 5, 15, 15))]
    # inside, straddling (not covered), and outside children
    rows.append(zone("relation:in", [[rect(9, 9, 11, 11)]], (9, 9, 11, 11)))
    rows.append(zone("relation:straddle", [[rect(13, 9, 17, 11)]], (13, 9, 17, 11)))
    rows.append(zone("relation:out", [[rect(20, 20, 21, 21)]], (20, 20, 21, 21)))
    zones = rd.from_arrow(pa.Table.from_pylist(rows, schema=ZONE_SCHEMA))
    edges = {
        (r["child"], r["parent"])
        for r in find_inclusion_edges(zones, EngineConfig()).take_all()
    }
    assert edges == {("relation:in", "relation:big")}
