"""End-to-end conformance on the reference's REAL fixtures
(/root/reference/tests/data/*.pbf) — the canonical golden-count tests of
/root/reference/tests/cosmogony_test.rs, run through the PBF ingestion
frontend + the full Ray pipeline.

Reference-parity mode is ``place_node_zones=False``: the reference's own e2e
pins prove its RUNNING binary emits no boundary-less place-node zones —
``tests/cosmogony_test.rs:173`` pins Luxembourg at exactly 198 zones whose
per-level counts {2:1, 6:13, 8:105, 9:79} sum to 198 (every zone has an
admin_level; node zones have none), and ``cosmogony_test.rs:329`` pins
ivory-coast's base scan at 118 == the boundary-yielding relation count
(the fixture also carries 21 named place=suburb nodes — they'd make 139).
The checked-out SOURCE (src/lib.rs:85-91) does construct node zones; the
pins win, so parity mode drops them.

Voronoi-ON totals are SELF-PINNED, not reference pins: the reference pins
208 (lux) and 4471 (ivory-coast, cosmogony_test.rs:313-333), but neither
is derivable from the checked-out source. Data-driven proof (round 3, see
scripts/voronoi_variant_search.py for the reproducible search):

1. ivory-coast as-written candidates are
   ``(admin_level none ∧ Suburb) ∨ capital=yes`` nodes
   (additional_zones.rs:47-51). Measured from the fixture itself: ALL 21
   named place=suburb nodes carry ``admin_level=9`` and the single
   capital=yes node (Yamoussoukro) carries ``admin_level=2`` — exactly ONE
   node passes, independent of any geometry library. Voronoi generation
   can add at most one zone per surviving candidate, so the checked-out
   source caps ivory-coast at ≤119 zones; 4471 is unreachable.
2. A 40-variant search over the plausible historical semantics (candidate
   set ∈ {as-written, admin_level-none, all place nodes, city-parse only}
   × parent-admissibility {≥City, >City} × type ordering {>=, >} ×
   already-covered-by-a-City exclusion on/off, evaluated with this
   engine's exact covers kernel on BOTH fixtures) finds NO variant that
   reproduces both pins: lux lands on {0, 17, 18, 464–481} generated
   (208−195=13 needed) while ivory-coast lands on {1, 4340–4395}
   (4471−118=4353 needed). The two pins are mutually inconsistent under
   every candidate semantics; they are stale goldens from an earlier
   algorithm + fixture state (the repo's own e2e suite cannot pass them
   with the checked-out additional_zones.rs).

This engine therefore implements the as-written semantics and pins its own
deterministic counts (lux 216 = 198 + 17 quarters + capital; ivory-coast
119 = 118 + Yamoussoukro).
"""

import collections
import os

import pytest

DATA = "/root/reference/tests/data"
LUX_PBF = os.path.join(DATA, "luxembourg_filtered.osm.pbf")
CI_PBF = os.path.join(DATA, "ivory-coast.pbf")
GAT_PBF = os.path.join(DATA, "gatineau.osm.pbf")
RULES = os.path.join(os.path.dirname(__file__), "..", "cosmogony_ray", "assets", "rules")


def _tables(pbf: str, out: str) -> str:
    from cosmogony_ray.sources.pbf import pbf_to_parquet

    if not os.path.exists(os.path.join(out, "relations.parquet")):
        pbf_to_parquet(pbf, out)
    return out


def _build(tables: str, **cfg_kwargs):
    from cosmogony_ray.config import EngineConfig
    from cosmogony_ray.pipelines.cosmogony import build_cosmogony

    cfg = EngineConfig(rules_dir=RULES, place_node_zones=False, **cfg_kwargs)
    return build_cosmogony(tables, cfg, with_stats=False).zones.to_pandas()


@pytest.mark.skipif(not os.path.exists(LUX_PBF), reason="reference fixture not present")
def test_luxembourg_golden_counts(ray_session):
    out = _tables(LUX_PBF, "/tmp/lux_tables_test")
    df = _build(out, country_code="lu", disable_voronoi=True)

    # the reference's pinned total (cosmogony_test.rs:173) — EXACT
    assert len(df) == 198
    assert (df["kind"] == "relation").all()
    levels = collections.Counter(df["admin_level"].dropna().astype(int))
    assert dict(levels) == {2: 1, 6: 13, 8: 105, 9: 79}
    types = collections.Counter(df["zone_type"].dropna())
    assert dict(types) == {
        "city": 105,
        "city_district": 24,
        "country": 1,
        "state_district": 13,
        "suburb": 55,
    }

    esch = df[(df["name"] == "Esch-sur-Alzette") & (df["zone_type"] == "city")].iloc[0]
    assert abs(esch["minx"] - 5.9432118) < 1e-8
    assert abs(esch["miny"] - 49.460907) < 1e-8
    assert abs(esch["maxx"] - 6.005144) < 1e-8
    assert abs(esch["maxy"] - 49.518616) < 1e-8

    lux = df[df["osm_id"] == "relation:407489"].iloc[0]
    assert lux["zone_type"] == "city"
    assert lux["admin_level"] == 8
    assert lux["country_code"] == "LU"
    assert lux["label"] == "Luxembourg, Canton Luxembourg, Lëtzebuerg"
    intl = dict(lux["international_labels"])
    assert intl["fr"] == "Luxembourg, Canton Luxembourg, Luxembourg"
    assert intl["de"] == "Luxemburg, Kanton Luxemburg, Luxemburg"
    # the br name comes from the label node's center_tags (compute_names)
    assert intl["br"] == "Luksembourg, Canton Luxembourg, Luksembourg"
    assert lux["wikidata"] == "Q1842"
    parent = df[df["osm_id"] == lux["parent"]].iloc[0]
    assert parent["name"] == "Canton Luxembourg"

    country = df[df["osm_id"] == "relation:2171347"].iloc[0]
    assert country["name"] == "Lëtzebuerg"
    assert country["zone_type"] == "country"


@pytest.mark.skipif(not os.path.exists(LUX_PBF), reason="reference fixture not present")
def test_luxembourg_voronoi_on(ray_session):
    """First real-geometry exercise of the voronoi pipeline + boolean ops.

    Self-pinned 216 = 198 relations + 18 generated (17 quarter nodes + the
    capital=yes node), all parented to Luxembourg City — the as-written
    semantics of additional_zones.rs:47-73 (see module docstring for why
    the reference's 208 pin is not derivable from its checked-out source).
    """
    out = _tables(LUX_PBF, "/tmp/lux_tables_test")
    df = _build(out, country_code="lu", disable_voronoi=False)

    assert len(df) == 216
    gen = df[df["kind"] == "node"]
    assert len(gen) == 18
    assert (gen["parent"] == "relation:407489").all()
    assert set(gen["zone_type"]) == {"suburb", "city"}
    # every generated zone got a real boundary clipped into the parent
    lux = df[df["osm_id"] == "relation:407489"].iloc[0]
    assert (gen["minx"] >= lux["minx"] - 1e-9).all()
    assert (gen["maxx"] <= lux["maxx"] + 1e-9).all()
    assert (gen["miny"] >= lux["miny"] - 1e-9).all()
    assert (gen["maxy"] <= lux["maxy"] + 1e-9).all()
    assert gen["boundary_wkb"].notna().all()


@pytest.mark.skipif(not os.path.exists(CI_PBF), reason="reference fixture not present")
def test_ivory_coast_golden(ray_session):
    """Ivory-coast base scan == 118 (cosmogony_test.rs:329, EXACT) and the
    voronoi run published-count self-pin (119: + Yamoussoukro, the only
    candidate that clears the as-written parent filters)."""
    out = _tables(CI_PBF, "/tmp/ci_tables_r3")
    df = _build(out, country_code=None, disable_voronoi=True)
    assert len(df) == 118
    assert (df["kind"] == "relation").all()
    # country found without an explicit country_code (CountryFinder, ST2)
    assert (df["country_code"] == "CI").all()

    dfv = _build(out, country_code=None, disable_voronoi=False)
    assert len(dfv) == 119
    gen = dfv[dfv["kind"] == "node"].iloc[0]
    assert gen["name"] == "Yamoussoukro"
    assert gen["zone_type"] == "city"
    assert gen["boundary_wkb"] is not None


@pytest.mark.skipif(not os.path.exists(GAT_PBF), reason="reference fixture not present")
def test_gatineau_center_label(ray_session):
    """Center-from-label-node e2e parity (cosmogony_test.rs:287-311):
    Gatineau relation:5356213, admin_level 8, typed City, center == the
    label node's exact coordinates."""
    out = _tables(GAT_PBF, "/tmp/gatineau_tables_r3")
    df = _build(out, country_code="ca", disable_voronoi=True)

    gati = df[(df["name"] == "Gatineau") & (df["zone_type"] == "city")].iloc[0]
    assert gati["osm_id"] == "relation:5356213"
    assert gati["admin_level"] == 8
    assert abs(gati["center_lon"] - -75.72326699999999) < 1e-12
    assert abs(gati["center_lat"] - 45.457240999999996) < 1e-12
