"""Rules-engine unit tests replicating the reference's override matrix
(/root/reference/src/zone_typer.rs:240-501): YAML parse, malformed-file skip,
id > contained_by > admin_level precedence, explicit-null suppression,
scoped-ruleset fallback to the outer level map."""

import os

import pytest
import yaml

from cosmogony_ray.state.rules import RuleSet, ZoneTyper


BASIC = {
    "admin_level": {"2": "country", "4": "state", "8": "city"},
}

WITH_OVERRIDES = {
    "admin_level": {"2": "country", "4": "state", "8": "city"},
    "overrides": {
        "id": {
            "relation": {"42": "state_district", "43": None},  # null = suppress
        },
        "contained_by": {
            "relation": {
                "100": {
                    "admin_level": {"8": "city_district"},
                    "overrides": {"id": {"relation": {"44": "suburb"}}},
                }
            }
        },
    },
}


def test_admin_level_map():
    rs = RuleSet.from_dict(BASIC)
    assert rs.get_zone_type("relation:1", 2, []) == "country"
    assert rs.get_zone_type("relation:1", 8, []) == "city"
    assert rs.get_zone_type("relation:1", 9, []) is None  # unknown level
    assert rs.get_zone_type("relation:1", None, []) is None  # level "0"


def test_id_override_beats_level():
    rs = RuleSet.from_dict(WITH_OVERRIDES)
    assert rs.get_zone_type("relation:42", 8, []) == "state_district"


def test_null_id_override_suppresses():
    rs = RuleSet.from_dict(WITH_OVERRIDES)
    # explicit null → typing suppressed even though level 8 maps to city
    assert rs.get_zone_type("relation:43", 8, []) is None


def test_contained_by_scoped_rules():
    rs = RuleSet.from_dict(WITH_OVERRIDES)
    # inside relation:100, level 8 → city_district (not city)
    assert rs.get_zone_type("relation:50", 8, ["relation:100"]) == "city_district"
    # outside → city
    assert rs.get_zone_type("relation:50", 8, ["relation:999"]) == "city"
    # nested id override inside the scoped ruleset
    assert rs.get_zone_type("relation:44", 8, ["relation:100"]) == "suburb"


def test_contained_by_falls_back_when_scoped_yields_nothing():
    rs = RuleSet.from_dict(WITH_OVERRIDES)
    # scoped ruleset has no level-4 mapping → outer map wins
    assert rs.get_zone_type("relation:60", 4, ["relation:100"]) == "state"


def test_id_override_beats_contained_by():
    rs = RuleSet.from_dict(WITH_OVERRIDES)
    assert (
        rs.get_zone_type("relation:42", 8, ["relation:100"]) == "state_district"
    )


def test_first_matching_ancestor_wins():
    d = {
        "admin_level": {"8": "city"},
        "overrides": {
            "contained_by": {
                "relation": {
                    "100": {"admin_level": {"8": "city_district"}},
                    "200": {"admin_level": {"8": "suburb"}},
                }
            }
        },
    }
    rs = RuleSet.from_dict(d)
    assert rs.get_zone_type("relation:1", 8, ["relation:200", "relation:100"]) == "suburb"
    assert rs.get_zone_type("relation:1", 8, ["relation:100", "relation:200"]) == "city_district"


def test_invalid_zone_type_rejected():
    with pytest.raises(ValueError):
        RuleSet.from_dict({"admin_level": {"2": "galaxy"}})


def test_typer_dir_load_and_skip_malformed(tmp_path):
    with open(tmp_path / "aa.yaml", "w") as f:
        yaml.safe_dump(BASIC, f)
    with open(tmp_path / "bb.yaml", "w") as f:
        f.write("admin_level: {2: [not, a, type]}\n")  # malformed → skipped
    with open(tmp_path / "notyaml.txt", "w") as f:
        f.write("ignored")
    t = ZoneTyper.from_dir(str(tmp_path))
    assert t.contains_rule("AA")
    assert not t.contains_rule("BB")
    assert t.get_zone_type("relation:1", 2, "AA", []) == ("ok", "country")
    assert t.get_zone_type("relation:1", 9, "AA", []) == ("unknown_level", None)
    assert t.get_zone_type("relation:1", 2, "ZZ", []) == ("invalid_country", None)


def test_empty_rules_dir_fails(tmp_path):
    with pytest.raises(ValueError):
        ZoneTyper.from_dir(str(tmp_path))


def test_shipped_rule_corpus_loads_and_is_sane():
    """Every shipped per-country YAML must parse, map level 2 -> country,
    and define at least one city-typed level (the corpus is authored against
    the libpostal schema of /root/reference/src/zone_typer.rs:198-229 from
    public OSM admin_level conventions; see each file's header)."""
    import os

    from cosmogony_ray.state.rules import ZoneTyper

    rules_dir = os.path.join(
        os.path.dirname(__file__), "..", "cosmogony_ray", "assets", "rules"
    )
    typer = ZoneTyper.from_dir(rules_dir)
    # full ISO-3166-1 alpha-2 coverage: 249 assigned codes, a superset of
    # the reference's 242 libpostal files (zone_typer.rs:385-392 asserts the
    # count only; its submodule is empty so the exact 242-code set is unknown)
    assert len(typer.rules) == 249
    # uninhabited / single-settlement territories with no sub-national admin
    # boundaries in OSM: a bare {2: country} map is the correct rule file
    country_only = {
        "AQ", "BV", "GS", "HM", "IO", "NF", "PN", "SJ", "TF", "UM", "VA"
    }
    for cc, rs in typer.rules.items():
        assert rs.type_by_level.get("2") == "country", cc
        if cc in country_only:
            assert rs.type_by_level == {"2": "country"}, cc
            continue
        # every other country must type at least one sub-country level; most
        # have an explicit city level (a few — city-states, ward-based
        # systems — legitimately map only city_district/suburb tiers)
        assert any(
            v in ("city", "city_district", "suburb") for v in rs.type_by_level.values()
        ), cc
        assert len(rs.type_by_level) >= 2, cc


def test_type_batch_vectorized_override_branches(tmp_path):
    """The vectorized typing kernel (typing.type_batch) must reproduce the
    per-row rules semantics on its override fast paths: id override, id
    suppression (explicit null), contained_by scoped ruleset, and the plain
    level map — all in one batch."""
    import pyarrow as pa

    from cosmogony_ray.state.country import CountryFinder
    from cosmogony_ray.state.rules import ZoneTyper
    from cosmogony_ray.stages.typing import country_arrays, type_batch

    (tmp_path / "xx.yaml").write_text(
        """
admin_level:
  "2": "country"
  "8": "city"
overrides:
  id:
    relation:
      "77": "state"
      "88": null
  contained_by:
    relation:
      "1":
        admin_level:
          "8": "city_district"
"""
    )
    typer = ZoneTyper.from_dir(str(tmp_path))
    finder = CountryFinder({"relation:1": ("XX", 2)})
    batch = pa.table(
        {
            "osm_id": [
                "relation:1",   # the country itself
                "relation:10",  # plain level map -> city
                "relation:77",  # id override -> state
                "relation:88",  # id suppression -> unknown_level, keeps old
                "relation:99",  # contained_by 1 at level 8 -> city_district
                "relation:50",  # no matching level -> unknown_level
            ],
            "admin_level": [2, 8, 8, 8, 8, 5],
            "zone_type": ["suburb", None, None, "suburb", None, None],
            "country_code": pa.nulls(6, pa.string()),
            "ancestors": [
                [],
                [],
                ["relation:1"],
                ["relation:1"],
                ["relation:1"],
                ["relation:1"],
            ],
        }
    )
    out = type_batch(batch, typer, finder, None, country_arrays(finder))
    got = dict(zip(out["osm_id"].to_pylist(), out["zone_type"].to_pylist()))
    st = dict(zip(out["osm_id"].to_pylist(), out["type_status"].to_pylist()))
    cc = dict(zip(out["osm_id"].to_pylist(), out["country_code"].to_pylist()))
    assert got["relation:1"] == "country" and st["relation:1"] == "ok"
    assert got["relation:10"] is None and st["relation:10"] == "no_country"
    assert got["relation:77"] == "state" and st["relation:77"] == "ok"
    assert got["relation:88"] == "suburb" and st["relation:88"] == "unknown_level"
    assert got["relation:99"] == "city_district" and st["relation:99"] == "ok"
    assert got["relation:50"] is None and st["relation:50"] == "unknown_level"
    assert cc["relation:77"] == "XX" and cc["relation:10"] is None


def test_new_country_rules_e2e(ray_session, tmp_path):
    """Round-4 corpus growth gate: a shipped country added this round (SK,
    Slovakia) typed end-to-end through the full pipeline — a synthetic
    grid world re-tagged ISO=SK, typed against the SHIPPED assets/rules
    corpus (not a fixture-local rules dir)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from cosmogony_ray.config import EngineConfig
    from cosmogony_ray.fixtures.bigworld import grid_world_tables
    from cosmogony_ray.pipelines.cosmogony import build_cosmogony

    tables = grid_world_tables(depth=5)  # levels 2,3,4,5,6 → 341 zones
    rels = tables["relations"]
    tags = rels["tags"].to_pylist()
    tags = [
        [("ISO3166-1:alpha2", "SK") if k == "ISO3166-1:alpha2" else (k, v) for k, v in t]
        for t in tags
    ]
    rels = rels.set_column(
        rels.column_names.index("tags"), "tags", pa.array(tags, type=rels["tags"].type)
    )
    d = str(tmp_path)
    pq.write_table(rels, os.path.join(d, "relations.parquet"))
    pq.write_table(tables["ways"], os.path.join(d, "ways.parquet"))
    pq.write_table(tables["nodes"], os.path.join(d, "nodes.parquet"))

    shipped = os.path.join(
        os.path.dirname(__file__), "..", "cosmogony_ray", "assets", "rules"
    )
    cosmo = build_cosmogony(d, EngineConfig(rules_dir=shipped), with_stats=False)
    counts = (
        cosmo.zones.to_pandas().groupby("zone_type").size().to_dict()
    )
    # SK maps 2→country, 4→state, 6→state_district; grid levels 3 and 5
    # have no SK rule → untyped → cleaned (P11)
    assert counts == {"country": 1, "state": 16, "state_district": 256}


def test_round4_batch_countries_type_expected_levels():
    """Spot-check the second round-4 corpus batch (the 141 files completing
    ISO-3166-1 coverage): representative level→type mappings resolve through
    the real ZoneTyper for a spread of government shapes — federal (ye),
    city-state (mc), parish-based (je), SAR (hk), and a plain 4/6/8 country
    (hr)."""
    import os

    from cosmogony_ray.state.rules import ZoneTyper

    rules_dir = os.path.join(
        os.path.dirname(__file__), "..", "cosmogony_ray", "assets", "rules"
    )
    typer = ZoneTyper.from_dir(rules_dir)
    expected = {
        ("HR", 2): "country",
        ("HR", 4): "state",
        ("HR", 6): "city",
        ("YE", 6): "state_district",
        ("YE", 8): "city",
        ("MC", 10): "suburb",
        ("JE", 8): "city",
        ("HK", 6): "city_district",
        ("VA", 2): "country",
        ("BQ", 4): "state",
    }
    for (cc, lvl), want in expected.items():
        got = typer.get_zone_type(f"relation:{lvl}", lvl, cc, [])
        assert got == ("ok", want), (cc, lvl, got, want)
