"""Zone-assembly stage against the mini-lux fixture (golden analog of
/root/reference/tests/cosmogony_test.rs construction assertions)."""

import numpy as np
import pytest

from cosmogony_ray.sources.osm import read_osm_tables
from cosmogony_ray.stages.zone_build import assemble_zones


@pytest.fixture(scope="session")
def zones_df(ray_session, mini_lux_dir):
    rels, ways, nodes = read_osm_tables(mini_lux_dir)
    return assemble_zones(rels, ways, nodes).to_pandas().set_index("osm_id")


def test_zone_count_and_skips(zones_df):
    # 29 named admin relations + 1 level-10 relation + 1 place=suburb node;
    # unnamed 5001 skipped (zone_ext.rs:126-135)
    assert len(zones_df) == 31
    assert "relation:5001" not in zones_df.index
    assert "relation:5002" in zones_df.index
    assert "node:6002" in zones_df.index
    # base scan does NOT admit place=town / capital nodes (lib.rs:72-77)
    assert "node:6001" not in zones_df.index
    assert "node:6003" not in zones_df.index


def test_country_record(zones_df):
    c = zones_df.loc["relation:1000"]
    assert c["name"] == "Sylvania"
    assert c["admin_level"] == 2
    assert (c["minx"], c["miny"], c["maxx"], c["maxy"]) == (0.0, 0.0, 8.0, 8.0)
    # label node is the center (no admin_centre; zone_ext.rs:183-199)
    assert (c["center_lon"], c["center_lat"]) == (3.9, 3.9)
    # label-node name:* merged into tags at construction (zone_ext.rs:166-181)
    tags = dict(c["tags"])
    assert tags["name:fr"] == "Sylvanie"
    assert tags["population"] == "650000"
    assert c["boundary_wkb"] is not None


def test_city_record_with_admin_centre(zones_df):
    z = zones_df.loc["relation:3001"]
    assert z["admin_level"] == 8
    assert (z["center_lon"], z["center_lat"]) == (1.0, 1.0)
    ct = dict(z["center_tags"])
    assert ct["name:fr"] == "Ville Capitale"
    # admin_centre tags NOT merged into tags at construction (only compute_names does)
    assert "name:fr" not in dict(z["tags"])


def test_zip_codes_sorted(zones_df):
    assert list(zones_df.loc["relation:3003", "zip_codes"]) == ["1000", "2000"]
    assert list(zones_df.loc["relation:3004", "zip_codes"]) == ["4000"]


def test_centroid_center_fallback(zones_df):
    z = zones_df.loc["relation:2001"]  # no member nodes → centroid of (0,0,4,4)
    assert (z["center_lon"], z["center_lat"]) == pytest.approx((2.0, 2.0))


def test_node_zone(zones_df):
    z = zones_df.loc["node:6002"]
    assert z["name"] == "Oldquarter"
    assert z["zone_type"] == "suburb"  # from the place tag (zone.rs:39-51)
    assert z["boundary_wkb"] is None
    # center/bbox stay unset for base-scan node zones (only voronoi sets them)
    assert z["center_lon"] is None or np.isnan(z["center_lon"])
    assert z["minx"] is None or np.isnan(z["minx"])
    assert bool(z["is_generated"]) is True


def test_boundary_geometry_roundtrip(zones_df):
    from cosmogony_ray.geom.wkb import multipolygon_from_wkb

    mp = multipolygon_from_wkb(zones_df.loc["relation:4005", "boundary_wkb"])
    assert len(mp) == 1
    ring = mp[0][0]
    assert ring[:, 0].min() == 6.0 and ring[:, 0].max() == 7.0
    assert ring[:, 1].min() == 0.0 and ring[:, 1].max() == 1.0
