"""End-to-end cosmogony pipeline vs hand-computed mini-lux goldens — the
analog of /root/reference/tests/cosmogony_test.rs:107-285 (zone counts,
per-level counts, types, parents, labels, international labels)."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from cosmogony_ray.config import EngineConfig
from cosmogony_ray.pipelines.cosmogony import build_cosmogony


@pytest.fixture(scope="session")
def cosmo(ray_session, mini_lux_dir):
    cfg = EngineConfig(rules_dir=os.path.join(mini_lux_dir, "rules"))
    return build_cosmogony(mini_lux_dir, cfg)


@pytest.fixture(scope="session")
def final_df(cosmo):
    return cosmo.zones.to_pandas().set_index("osm_id").sort_index()


@pytest.fixture(scope="session")
def golden_df(mini_lux_dir):
    t = pq.read_table(os.path.join(mini_lux_dir, "expected_zones.parquet"))
    return t.to_pandas().set_index("osm_id").sort_index()


def test_zone_count(final_df, golden_df):
    assert sorted(final_df.index) == sorted(golden_df.index)  # 30 zones


def test_level_and_type_counts(cosmo):
    lv = cosmo.stats["level_counts"]
    assert {int(k): v for k, v in lv.items() if k == k and k is not None and not pd.isna(k)} == {
        2: 1,
        6: 4,
        8: 16,
        9: 8,
    }
    assert cosmo.stats["zone_type_counts"] == {
        "country": 1,
        "state_district": 4,
        "city": 16,
        "city_district": 4,  # 4001-4004 via the contained_by override
        "suburb": 5,  # 4005-4008 + the Oldquarter node zone
    }


def test_types_countries_parents(final_df, golden_df):
    for osm_id, g in golden_df.iterrows():
        f = final_df.loc[osm_id]
        assert f["zone_type"] == g["zone_type"], osm_id
        assert (f["country_code"] or None) == (
            g["country_code"] if pd.notna(g["country_code"]) else None
        ), osm_id
        got_parent = f["parent"] if pd.notna(f["parent"]) else None
        want_parent = g["parent_osm_id"] if pd.notna(g["parent_osm_id"]) else None
        assert got_parent == want_parent, osm_id


def test_labels(final_df, golden_df):
    for osm_id, g in golden_df.iterrows():
        f = final_df.loc[osm_id]
        assert f["label"] == g["label"], osm_id
        assert dict(f["international_labels"]) == dict(g["international_labels"]), osm_id


def test_error_stats(cosmo):
    # node:6002 has no boundary → no inclusions → no country
    assert cosmo.stats["zone_without_country"] == 1
    # relation:5002 (level 10) is unmapped in the SY rules
    assert cosmo.stats["unhandled_admin_level"].get("SY", {}).get(10) == 1


def test_deterministic_across_runs(ray_session, mini_lux_dir, final_df):
    cfg = EngineConfig(rules_dir=os.path.join(mini_lux_dir, "rules"))
    again = build_cosmogony(mini_lux_dir, cfg, with_stats=False).zones.to_pandas()
    again = again.set_index("osm_id").sort_index()
    pd.testing.assert_series_equal(final_df["parent"], again["parent"])
    pd.testing.assert_series_equal(final_df["label"], again["label"])
    pd.testing.assert_series_equal(final_df["zone_type"], again["zone_type"])
