"""Doc geotagging: span-sequence invariant + brute-force cross-check of the
cell-index path (no cells in the oracle — direct PIP over every zone)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from cosmogony_ray.config import EngineConfig
from cosmogony_ray.geom.predicates import PreparedPolygon
from cosmogony_ray.geom.wkb import multipolygon_from_wkb
from cosmogony_ray.model import ZONE_TYPE_RANK
from cosmogony_ray.pipelines.cosmogony import build_cosmogony
from cosmogony_ray.stages.geotag import (
    GeotagActor,
    _haversine,
    build_zone_index,
    geotag_docs,
)


@pytest.fixture(scope="session")
def tagged_and_zones(ray_session, mini_lux_dir):
    cfg = EngineConfig(rules_dir=os.path.join(mini_lux_dir, "rules"))
    cosmo = build_cosmogony(mini_lux_dir, cfg, with_stats=False)
    idx_ref = build_zone_index(cosmo.zones, cfg)
    docs = rd.read_parquet(os.path.join(mini_lux_dir, "docs.parquet"))
    tagged = geotag_docs(docs, idx_ref, cfg).to_pandas()
    zones = cosmo.zones.to_pandas()
    return tagged, zones


def test_span_sequence_preserved(tagged_and_zones, mini_lux_dir):
    tagged, _ = tagged_and_zones
    orig = pq.read_table(os.path.join(mini_lux_dir, "docs.parquet")).to_pandas()
    got = tagged.set_index("doc_id")["spans"]
    want = orig.set_index("doc_id")["spans"]
    assert set(got.index) == set(want.index)
    for doc_id in want.index:
        g, w = got[doc_id], want[doc_id]
        assert len(g) == len(w), doc_id
        for a, b in zip(g, w):
            assert dict(a) == dict(b), doc_id  # (kind, text, media_ref, offset)


def test_every_span_tagged_in_order(tagged_and_zones):
    tagged, _ = tagged_and_zones
    for _, row in tagged.iterrows():
        assert len(row["tiles"]) == len(row["spans"])
        assert [t["span_index"] for t in row["tiles"]] == list(range(len(row["spans"])))


def test_matches_bruteforce_oracle(tagged_and_zones):
    tagged, zones = tagged_and_zones
    preps, meta = [], []
    for _, z in zones.iterrows():
        if z["boundary_wkb"] is None:
            continue
        preps.append(PreparedPolygon(multipolygon_from_wkb(z["boundary_wkb"])))
        meta.append((ZONE_TYPE_RANK[z["zone_type"]], z["area"], z["osm_id"]))
    cen = [
        (z["osm_id"], z["center_lon"], z["center_lat"])
        for _, z in zones.iterrows()
        if z["zone_type"] not in (None, "non_administrative")
        and z["center_lon"] is not None
        and not np.isnan(z["center_lon"])
    ]

    def oracle(lon, lat):
        best = None
        for prep, key in zip(preps, meta):
            if prep.covers_points(np.array([lon]), np.array([lat]))[0]:
                if best is None or key < best:
                    best = key
        if best is not None:
            return best[2]
        d = [( _haversine(lon, lat, c[1], c[2]), c[0]) for c in cen]
        return min(d)[1]

    checked = 0
    for _, row in tagged.iterrows():
        for span, tile in zip(row["spans"], row["tiles"]):
            s = dict(span)
            src = s["text"] or s["media_ref"]
            if "@" in src:
                lon, lat = map(float, src.split("@")[1].split(","))
            else:
                q = src.split("?lon=")[1]
                lon, lat = float(q.split("&lat=")[0]), float(q.split("&lat=")[1])
            assert tile["zone_osm_id"] == oracle(lon, lat), (lon, lat)
            checked += 1
    assert checked > 100


def test_write_tiles_partitioned(ray_session, mini_lux_dir, tmp_path):
    import glob

    import ray.data as rd

    from cosmogony_ray.stages.geotag import build_zone_index, geotag_docs, write_tiles

    cfg = EngineConfig(rules_dir=os.path.join(mini_lux_dir, "rules"))
    from cosmogony_ray.pipelines.cosmogony import build_cosmogony

    cosmo = build_cosmogony(mini_lux_dir, cfg, with_stats=False)
    idx = build_zone_index(cosmo.zones, cfg)
    docs = rd.read_parquet(os.path.join(mini_lux_dir, "docs.parquet"))
    out = str(tmp_path / "tiles")
    write_tiles(geotag_docs(docs, idx, cfg), out)
    parts = glob.glob(os.path.join(out, "zone_osm_id=*"))
    assert len(parts) > 5  # one dir per zone
    back = rd.read_parquet(out).to_pandas()
    orig = rd.read_parquet(os.path.join(mini_lux_dir, "docs.parquet")).to_pandas()
    assert len(back) == sum(len(s) for s in orig["spans"])


def test_actor_and_task_modes_identical(ray_session, mini_lux_dir):
    """geotag_mode="actors" (the SURVEY §7.2 actor-pool shape, kept for
    deployments that want bounded per-stage resources) must produce
    byte-identical tile assignments to the round-4 task-pool default."""
    import pandas as pd

    cfg_t = EngineConfig(rules_dir=os.path.join(mini_lux_dir, "rules"))
    cosmo = build_cosmogony(mini_lux_dir, cfg_t, with_stats=False)
    idx_ref = build_zone_index(cosmo.zones, cfg_t)
    docs = rd.read_parquet(os.path.join(mini_lux_dir, "docs.parquet"))

    def flat(cfg):
        out = geotag_docs(docs, idx_ref, cfg).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        return out["doc_id"].tolist(), [
            [(t["span_index"], t["zone_osm_id"], t["cell_id"]) for t in tiles]
            for tiles in out["tiles"]
        ]

    import dataclasses

    cfg_a = dataclasses.replace(cfg_t, geotag_mode="actors")
    assert cfg_a.geotag_mode == "actors" and cfg_t.geotag_mode == "tasks"
    ids_t, tiles_t = flat(cfg_t)
    ids_a, tiles_a = flat(cfg_a)
    assert ids_t == ids_a
    assert tiles_t == tiles_a
