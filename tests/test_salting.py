"""Mega-zone salting path: a zone whose covering lands on the coarsest grid
resolutions must replicate its build rows across every salt, and probes (one
salt each) must still meet it — the hot-key mitigation of SURVEY §7.4."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from cosmogony_ray.config import EngineConfig
from cosmogony_ray.geom.wkb import multipolygon_to_wkb
from cosmogony_ray.model import ZONE_SCHEMA
from cosmogony_ray.stages.inclusion import _covering_rows_fn, find_inclusion_edges


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


def test_build_rows_replicated_across_salts():
    cfg = EngineConfig()
    fn = _covering_rows_fn(cfg)
    batch = pa.Table.from_pylist([_zone("relation:1", MEGA)], schema=ZONE_SCHEMA)
    out = fn(batch.select(["osm_id", "minx", "miny", "maxx", "maxy", "area"]))
    df = out.to_pandas()
    build = df[df["role"] == 0]
    coarse = build[build["cell"].map(lambda c: (c >> 58) <= cfg.min_res + 1)]
    assert len(coarse) > 0, "mega zone must cover coarse cells"
    # every coarse build cell appears once per salt
    per_cell = coarse.groupby("cell")["salt"].nunique()
    assert (per_cell == cfg.num_salts).all()
    # probe rows carry exactly one salt per coarse cell
    probe = df[(df["role"] == 1) & (df["cell"].map(lambda c: (c >> 58) <= cfg.min_res + 1))]
    assert (probe.groupby("cell")["salt"].nunique() == 1).all()


def test_salted_mega_zone_still_found_as_parent(ray_session):
    cfg = EngineConfig()
    zones = rd.from_arrow(
        pa.Table.from_pylist(
            [_zone("relation:1", MEGA), _zone("relation:2", SMALL)],
            schema=ZONE_SCHEMA,
        )
    )
    edges = {(r["child"], r["parent"]) for r in find_inclusion_edges(zones, cfg).take_all()}
    assert edges == {("relation:2", "relation:1")}
