"""Zone data model constants: zone-type total order and Arrow schema.

The ZoneType declaration order is a semantic total order used for parent
admissibility and smallest-parent selection
(/root/reference/cosmogony/src/zone.rs:12-23, consumed at
/root/reference/src/hierarchy_builder.rs:127 and
/root/reference/src/zone_ext.rs:360-362)."""

from __future__ import annotations

import pyarrow as pa

ZONE_TYPES = [
    "suburb",
    "city_district",
    "city",
    "state_district",
    "state",
    "country_region",
    "country",
    "non_administrative",
]
ZONE_TYPE_RANK = {t: i for i, t in enumerate(ZONE_TYPES)}
# rank used in argmin shuffles; None (untyped) sorts AFTER everything and is
# never admissible as a parent (hierarchy_builder.rs:271-287 test)
UNTYPED_RANK = len(ZONE_TYPES)

# place-tag synonyms (/root/reference/cosmogony/src/zone.rs:39-51)
PLACE_SYNONYMS = {
    "suburb": "suburb",
    "quarter": "suburb",
    "neighbourhood": "suburb",
    "city_district": "city_district",
    "city": "city",
    "town": "city",
    "village": "city",
    "state_district": "state_district",
    "state": "state",
    "country_region": "country_region",
    "country": "country",
    "non_administrative": "non_administrative",
}


def parse_zone_type(s: str | None) -> str | None:
    if s is None:
        return None
    return PLACE_SYNONYMS.get(s)


TAGS_T = pa.map_(pa.string(), pa.string())

ZONE_SCHEMA = pa.schema(
    [
        ("osm_id", pa.string()),       # "relation:<id>" / "node:<id>"
        # unique engine key: equals osm_id except for voronoi-generated zones
        # (the reference can hold two Zone records for one OSM node —
        # base-scan + generated — distinguished only by dense id)
        ("zone_uid", pa.string()),
        ("kind", pa.string()),
        ("name", pa.string()),
        ("admin_level", pa.int32()),
        ("zone_type", pa.string()),
        ("loc_name", pa.string()),
        ("alt_name", pa.string()),
        ("zip_codes", pa.list_(pa.string())),
        ("wikidata", pa.string()),
        ("tags", TAGS_T),
        ("center_tags", TAGS_T),
        ("center_lon", pa.float64()),
        ("center_lat", pa.float64()),
        ("boundary_wkb", pa.binary()),
        ("minx", pa.float64()),
        ("miny", pa.float64()),
        ("maxx", pa.float64()),
        ("maxy", pa.float64()),
        ("area", pa.float64()),   # planar deg² — tie-break key only

        ("is_generated", pa.bool_()),
        ("country_code", pa.string()),
        ("parent", pa.string()),
        ("label", pa.string()),
        ("international_labels", TAGS_T),
    ]
)


def empty_zone_row() -> dict:
    return {name: None for name in ZONE_SCHEMA.names}
