"""Multi-place voronoi partition (additional_zones.rs:293-401 path) +
filter_langs label restriction (P13)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from cosmogony_ray.config import EngineConfig
from cosmogony_ray.geom.predicates import PreparedPolygon
from cosmogony_ray.geom.wkb import multipolygon_from_wkb, multipolygon_to_wkb
from cosmogony_ray.model import ZONE_SCHEMA
from cosmogony_ray.stages.voronoi_zones import compute_additional_zones


def rect(a, b, c, d):
    return np.array([[a, b], [c, b], [c, d], [a, d], [a, b]], float)


def _zone_row(osm_id, bbox, ztype, level, parent=None):
    mp = [[rect(*bbox)]]
    return {
        "osm_id": osm_id,
        "zone_uid": osm_id,
        "kind": "relation",
        "name": osm_id,
        "admin_level": level,
        "zone_type": ztype,
        "loc_name": "",
        "alt_name": "",
        "zip_codes": [],
        "wikidata": None,
        "tags": [],
        "center_tags": [],
        "center_lon": (bbox[0] + bbox[2]) / 2,
        "center_lat": (bbox[1] + bbox[3]) / 2,
        "boundary_wkb": multipolygon_to_wkb(mp),
        "minx": float(bbox[0]),
        "miny": float(bbox[1]),
        "maxx": float(bbox[2]),
        "maxy": float(bbox[3]),
        "area": float((bbox[2] - bbox[0]) * (bbox[3] - bbox[1])),
        "is_generated": False,
        "country_code": "SY",
        "parent": parent,
        "label": "",
        "international_labels": [],
    }


TAGS_T = pa.map_(pa.string(), pa.string())


def _node(osm_id, lon, lat, tags):
    return {"osm_id": osm_id, "lon": lon, "lat": lat, "tags": sorted(tags.items())}


def test_multi_place_voronoi_partitions_city(ray_session):
    zones = rd.from_arrow(
        pa.Table.from_pylist(
            [
                _zone_row("relation:1", (0, 0, 8, 8), "state", 4),
                _zone_row("relation:2", (0, 0, 4, 4), "city", 8, "relation:1"),
            ],
            schema=ZONE_SCHEMA,
        )
    )
    nodes = rd.from_arrow(
        pa.table(
            {
                "osm_id": pa.array([10, 11], type=pa.int64()),
                "lon": pa.array([1.0, 3.0]),
                "lat": pa.array([2.0, 2.0]),
                "tags": pa.array(
                    [
                        sorted({"name": "West Q", "place": "suburb"}.items()),
                        sorted({"name": "East Q", "place": "suburb"}.items()),
                    ],
                    type=TAGS_T,
                ),
            }
        )
    )
    out = compute_additional_zones(zones, nodes, EngineConfig()).to_pandas()
    out = out.set_index("name")
    assert set(out.index) == {"West Q", "East Q"}
    # both children of the city, each taking one half of its rect
    for name, xr in [("West Q", (0.0, 2.0)), ("East Q", (2.0, 4.0))]:
        z = out.loc[name]
        assert z["parent"] == "relation:2"
        assert z["zone_type"] == "suburb"
        assert (z["minx"], z["maxx"]) == xr
        assert (z["miny"], z["maxy"]) == (0.0, 4.0)
        # generating point inside its cell
        prep = PreparedPolygon(multipolygon_from_wkb(z["boundary_wkb"]))
        lon = 1.0 if name == "West Q" else 3.0
        assert prep.covers_points(np.array([lon]), np.array([2.0]))[0]


def test_filter_langs_restricts_international_labels(ray_session, mini_lux_dir):
    import os

    from cosmogony_ray.pipelines.cosmogony import build_cosmogony

    cfg = EngineConfig(
        rules_dir=os.path.join(mini_lux_dir, "rules"), filter_langs=("fr",)
    )
    zones = build_cosmogony(mini_lux_dir, cfg, with_stats=False).zones.to_pandas()
    langs = {l for ils in zones["international_labels"] for l, _ in ils}
    assert langs == {"fr"}  # 'ak' filtered out (zone_ext.rs:317-321)