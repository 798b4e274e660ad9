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
    assert len(typer.rules) >= 30
    for cc, rs in typer.rules.items():
        assert rs.type_by_level.get("2") == "country", cc
        assert any(v == "city" for v in rs.type_by_level.values()), cc
