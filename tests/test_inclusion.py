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
