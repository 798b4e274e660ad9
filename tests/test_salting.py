"""Mega-zone coarsening path: a zone whose bbox spans most of the world must
cap its build-cell covering at ``max_cells_per_zone`` (the hot-key mitigation
of SURVEY §7.4 — a country polygon never explodes into millions of index
rows), and must still be found as a parent by the map-side cell join. Also
pins the canonical-cell uniqueness invariant: every (child, parent) pair is
emitted exactly once with no dedup shuffle."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from cosmogony_ray.config import EngineConfig
from cosmogony_ray.geom.wkb import multipolygon_to_wkb
from cosmogony_ray.model import ZONE_SCHEMA
from cosmogony_ray.stages.inclusion import (
    _candidates_fn,
    build_geom_pack,
    find_inclusion_edges,
)


def rect(a, b, c, d):
    return np.array([[a, b], [c, b], [c, d], [a, d], [a, b]], dtype=np.float64)


def _zone(osm_id, bbox):
    mp = [[rect(*bbox)]]
    row = {n: None for n in ZONE_SCHEMA.names}
    row.update(
        {
            "osm_id": osm_id,
            "zone_uid": osm_id,
            "kind": "relation",
            "name": osm_id,
            "zip_codes": [],
            "tags": [],
            "center_tags": [],
            "international_labels": [],
            "loc_name": "",
            "alt_name": "",
            "label": "",
            "is_generated": False,
            "boundary_wkb": multipolygon_to_wkb(mp),
            "minx": float(bbox[0]),
            "miny": float(bbox[1]),
            "maxx": float(bbox[2]),
            "maxy": float(bbox[3]),
            "area": float((bbox[2] - bbox[0]) * (bbox[3] - bbox[1])),
        }
    )
    return row


MEGA = (-170.0, -80.0, 170.0, 80.0)  # covers most of the world → coarse res
SMALL = (10.0, 10.0, 10.5, 10.5)


def test_mega_zone_build_cells_capped(ray_session):
    cfg = EngineConfig()
    zones = rd.from_arrow(
        pa.Table.from_pylist([_zone("relation:1", MEGA)], schema=ZONE_SCHEMA)
    )
    import ray

    pack = ray.get(build_geom_pack(zones, cfg))
    assert 0 < pack["bcell"].size <= cfg.max_cells_per_zone
    assert (np.diff(pack["bcell"]) >= 0).all(), "build index must be sorted"


def test_mega_zone_still_found_as_parent(ray_session):
    cfg = EngineConfig()
    zones = rd.from_arrow(
        pa.Table.from_pylist(
            [_zone("relation:1", MEGA), _zone("relation:2", SMALL)],
            schema=ZONE_SCHEMA,
        )
    )
    edges = {(r["child"], r["parent"]) for r in find_inclusion_edges(zones, cfg).take_all()}
    assert edges == {("relation:2", "relation:1")}


def test_candidate_pairs_unique_by_construction(ray_session):
    """Nested quadrants: each pair must appear exactly once in the raw
    candidate stream (canonical-cell dedup), before the covers test."""
    cfg = EngineConfig()
    rows = [_zone("relation:1", (0.0, 0.0, 8.0, 8.0))]
    k = 2
    for i in range(4):
        for j in range(4):
            rows.append(
                _zone(f"relation:{k}", (i * 2.0, j * 2.0, (i + 1) * 2.0, (j + 1) * 2.0))
            )
            k += 1
    tbl = pa.Table.from_pylist(rows, schema=ZONE_SCHEMA)
    zones = rd.from_arrow(tbl)
    pack_ref = build_geom_pack(zones, cfg)
    fn = _candidates_fn(pack_ref, cfg)
    cands = fn(tbl.select(["osm_id", "minx", "miny", "maxx", "maxy", "area"]))
    pairs = list(zip(cands["child"].to_pylist(), cands["parent"].to_pylist()))
    assert len(pairs) == len(set(pairs)), "canonical-cell dedup must hold"
    assert set(pairs) == {(f"relation:{i}", "relation:1") for i in range(2, 18)}
