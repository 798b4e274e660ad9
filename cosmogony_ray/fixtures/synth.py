"""Deterministic synthetic fixtures (seed-free: fully literal world).

``mini-lux`` is the engine's analog of the reference's
``luxembourg_filtered.osm.pbf`` e2e fixture
(/root/reference/tests/cosmogony_test.rs, /root/repo/FIXTURES.md §2): a nested
rectangle world small enough to hand-verify, expressed as the three OSM-shaped
Arrow tables (nodes / ways / relations) plus libpostal-style YAML rules and
hand-computed golden outputs.

Layout (lon/lat degrees, world square (0,0)-(8,8)):
- relation 1000  country "Sylvania" (SY), level 2, label-role node w/ name:*
- relations 2001-2004  level-6 districts tiling the country 2x2
- relations 3001-3016  level-8 cities tiling each district 2x2 (3001 is
  "Capital City" with a contained_by rules override mapping level 9 →
  city_district inside it)
- relations 4001-4008  level-9 suburbs tiling cities 3001 and 3006
- relation 5001  unnamed (skipped at construction,
  /root/reference/src/zone_ext.rs:126-135)
- relation 5002  level 10, unmapped in rules (typed None → filtered,
  /root/reference/src/lib.rs:196-201)
- nodes 6001-6003  place/capital nodes for the voronoi path
  (/root/reference/src/additional_zones.rs:122-157); 6002 (place=suburb) also
  enters the base scan (/root/reference/src/lib.rs:72-77)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# ---------------------------------------------------------------- world spec

DISTRICT_NAMES = ["Nord District", "Est District", "Sud District", "West District"]


def _rect(minx, miny, maxx, maxy):
    return (float(minx), float(miny), float(maxx), float(maxy))


def _quadrants(minx, miny, maxx, maxy):
    mx, my = (minx + maxx) / 2.0, (miny + maxy) / 2.0
    return [
        _rect(minx, miny, mx, my),
        _rect(mx, miny, maxx, my),
        _rect(minx, my, mx, maxy),
        _rect(mx, my, maxx, maxy),
    ]


def world_spec() -> dict:
    """All zone relations of mini-lux as literal dicts."""
    rels = []
    rels.append(
        dict(
            osm_id=1000,
            rect=_rect(0, 0, 8, 8),
            tags={
                "boundary": "administrative",
                "admin_level": "2",
                "name": "Sylvania",
                "ISO3166-1:alpha2": "SY",
                "wikidata": "Q1000",
            },
            label_node=dict(
                lon=3.9,
                lat=3.9,
                tags={
                    "name": "Sylvania",
                    "name:fr": "Sylvanie",
                    "name:ak": "Sylvania-AK",
                    "population": "650000",
                },
            ),
            admin_centre=None,
        )
    )
    districts = _quadrants(0, 0, 8, 8)
    for d, drect in enumerate(districts):
        rels.append(
            dict(
                osm_id=2001 + d,
                rect=drect,
                tags={
                    "boundary": "administrative",
                    "admin_level": "6",
                    "name": DISTRICT_NAMES[d],
                },
                label_node=None,
                admin_centre=None,
            )
        )
    city_id = 3001
    for d, drect in enumerate(districts):
        for crect in _quadrants(*drect):
            i = city_id - 3000
            name = "Capital City" if city_id == 3001 else f"City {i:02d}"
            tags = {
                "boundary": "administrative",
                "admin_level": "8",
                "name": name,
            }
            centre_tags = {"name": name, "population": str(1000 * i)}
            if city_id == 3001:
                tags["wikidata"] = "Q3001"
                centre_tags.update({"name:fr": "Ville Capitale", "wikidata": "Q3001"})
            elif city_id == 3002:
                tags["wikidata"] = "Q3002"
                # distinct wikidata → name:fr must NOT be merged
                # (/root/reference/src/zone_ext.rs:337-355)
                centre_tags.update({"name:fr": "Ville Deux", "wikidata": "Q9999"})
            elif city_id == 3006:
                centre_tags.update({"name:fr": "Ville Six"})
            if city_id == 3003:
                tags["addr:postcode"] = "2000;1000"
            if city_id == 3004:
                tags["postal_code"] = "4000"
            cx = (crect[0] + crect[2]) / 2.0
            cy = (crect[1] + crect[3]) / 2.0
            rels.append(
                dict(
                    osm_id=city_id,
                    rect=crect,
                    tags=tags,
                    label_node=None,
                    admin_centre=dict(lon=cx, lat=cy, tags=centre_tags),
                )
            )
            city_id += 1
    suburb_letters = ["A", "B", "C", "D"]
    for j, srect in enumerate(_quadrants(0, 0, 2, 2)):  # city 3001
        rels.append(
            dict(
                osm_id=4001 + j,
                rect=srect,
                tags={
                    "boundary": "administrative",
                    "admin_level": "9",
                    "name": f"Quarter {suburb_letters[j]}",
                },
                label_node=None,
                admin_centre=None,
            )
        )
    for j, srect in enumerate(_quadrants(6, 0, 8, 2)):  # city 3006
        rels.append(
            dict(
                osm_id=4005 + j,
                rect=srect,
                tags={
                    "boundary": "administrative",
                    "admin_level": "9",
                    "name": f"Suburb {suburb_letters[j]}",
                },
                label_node=None,
                admin_centre=None,
            )
        )
    # pathological pair
    rels.append(
        dict(
            osm_id=5001,
            rect=_rect(0.2, 0.2, 0.4, 0.4),
            tags={"boundary": "administrative", "admin_level": "8"},  # no name
            label_node=None,
            admin_centre=None,
        )
    )
    rels.append(
        dict(
            osm_id=5002,
            rect=_rect(2.2, 2.2, 2.4, 2.4),
            tags={
                "boundary": "administrative",
                "admin_level": "10",
                "name": "Weird Zone",
            },
            label_node=None,
            admin_centre=None,
        )
    )

    place_nodes = [
        dict(osm_id=6001, lon=5.0, lat=5.0, tags={"name": "Freetown", "place": "town"}),
        dict(osm_id=6002, lon=5.5, lat=4.5, tags={"name": "Oldquarter", "place": "suburb"}),
        dict(
            osm_id=6003,
            lon=1.5,
            lat=0.5,
            tags={"name": "Sylvania City", "place": "city", "capital": "yes"},
        ),
    ]
    return dict(relations=rels, place_nodes=place_nodes)


RULES_SY = {
    "admin_level": {"2": "country", "6": "state_district", "8": "city", "9": "suburb"},
    "overrides": {
        "contained_by": {
            "relation": {"3001": {"admin_level": {"9": "city_district"}}}
        }
    },
}


# ------------------------------------------------------- OSM-shaped tables

TAGS_T = pa.map_(pa.string(), pa.string())
MEMBER_T = pa.struct([("role", pa.string()), ("ref_kind", pa.string()), ("ref_id", pa.int64())])


def build_tables() -> dict[str, pa.Table]:
    spec = world_spec()
    node_rows: dict[int, tuple[float, float, dict]] = {}
    coord_ids: dict[tuple[float, float], int] = {}
    next_coord_id = [100000]

    def coord_node(x: float, y: float) -> int:
        key = (x, y)
        if key not in coord_ids:
            nid = next_coord_id[0]
            next_coord_id[0] += 1
            coord_ids[key] = nid
            node_rows[nid] = (x, y, {})
        return coord_ids[key]

    way_rows = []
    rel_rows = []
    special_node_id = [7000]
    for rel in spec["relations"]:
        minx, miny, maxx, maxy = rel["rect"]
        # two open ways per rectangle — exercises ring assembly with reversal
        w1 = [(minx, miny), (maxx, miny), (maxx, maxy)]
        w2 = [(minx, miny), (minx, maxy), (maxx, maxy)]  # reversed orientation
        members = []
        for pts in (w1, w2):
            wid = rel["osm_id"] * 10 + len(members)
            way_rows.append(dict(osm_id=wid, node_ids=[coord_node(x, y) for x, y in pts]))
            members.append(dict(role="outer", ref_kind="way", ref_id=wid))
        for role in ("admin_centre", "label_node"):
            info = rel[role if role == "admin_centre" else "label_node"]
            if info is not None:
                nid = special_node_id[0]
                special_node_id[0] += 1
                node_rows[nid] = (info["lon"], info["lat"], info["tags"])
                members.append(
                    dict(
                        role="admin_centre" if role == "admin_centre" else "label",
                        ref_kind="node",
                        ref_id=nid,
                    )
                )
        rel_rows.append(dict(osm_id=rel["osm_id"], tags=rel["tags"], members=members))

    for pn in spec["place_nodes"]:
        node_rows[pn["osm_id"]] = (pn["lon"], pn["lat"], pn["tags"])

    nodes = pa.table(
        {
            "osm_id": pa.array(sorted(node_rows), type=pa.int64()),
            "lon": pa.array([node_rows[i][0] for i in sorted(node_rows)], type=pa.float64()),
            "lat": pa.array([node_rows[i][1] for i in sorted(node_rows)], type=pa.float64()),
            "tags": pa.array(
                [list(node_rows[i][2].items()) for i in sorted(node_rows)], type=TAGS_T
            ),
        }
    )
    ways = pa.table(
        {
            "osm_id": pa.array([w["osm_id"] for w in way_rows], type=pa.int64()),
            "node_ids": pa.array([w["node_ids"] for w in way_rows], type=pa.list_(pa.int64())),
        }
    )
    relations = pa.table(
        {
            "osm_id": pa.array([r["osm_id"] for r in rel_rows], type=pa.int64()),
            "tags": pa.array([list(r["tags"].items()) for r in rel_rows], type=TAGS_T),
            "members": pa.array([r["members"] for r in rel_rows], type=pa.list_(MEMBER_T)),
        }
    )
    return {"nodes": nodes, "ways": ways, "relations": relations}


# ----------------------------------------------------------------- goldens

def expected_zones() -> "pa.Table":
    """Hand-computed golden output of the base pipeline (voronoi OFF,
    country_code=None) — the analog of the 198-zone assertions in
    /root/reference/tests/cosmogony_test.rs:107-285.

    Computed from the spec, independently of the engine: parent chains and
    types are literal; labels are joined here following the documented rule
    (consecutive-dedup of hierarchy names, zips appended to the head,
    /root/reference/src/zone_ext.rs:365-395)."""
    spec = world_spec()
    by_id = {r["osm_id"]: r for r in spec["relations"]}

    def parent_of(osm_id: int) -> int | None:
        if osm_id == 1000:
            return None
        if 2001 <= osm_id <= 2004:
            return 1000
        if 3001 <= osm_id <= 3016:
            return 2001 + (osm_id - 3001) // 4
        if 4001 <= osm_id <= 4004:
            return 3001
        if 4005 <= osm_id <= 4008:
            return 3006
        return None

    def ztype(osm_id: int) -> str:
        if osm_id == 1000:
            return "country"
        if 2001 <= osm_id <= 2004:
            return "state_district"
        if 3001 <= osm_id <= 3016:
            return "city"
        if 4001 <= osm_id <= 4004:
            return "city_district"  # contained_by override inside 3001
        if 4005 <= osm_id <= 4008:
            return "suburb"
        raise KeyError(osm_id)

    def zips(osm_id: int) -> list[str]:
        t = by_id[osm_id]["tags"]
        raw = t.get("addr:postcode", t.get("postal_code", ""))
        return sorted(s for s in raw.split(";") if s)

    def intl_names(osm_id: int) -> dict[str, str]:
        """name:<lang> visible on the zone AFTER the two merge passes
        (label-node merge at construction + compute_names center merge),
        minus entries equal to the default name."""
        rel = by_id[osm_id]
        tags = dict(rel["tags"])
        if rel["label_node"] is not None:
            for k, v in rel["label_node"]["tags"].items():
                if k.startswith("name:") or k == "population":
                    tags.setdefault(k, v)
        centre = rel["admin_centre"]
        if centre is not None:
            cw = centre["tags"].get("wikidata")
            rw = rel["tags"].get("wikidata")
            is_city = ztype(osm_id) == "city"
            if (rw is not None and rw == cw) or (is_city and (cw is None or rw is None)):
                for k, v in centre["tags"].items():
                    if k.startswith("name:"):
                        tags.setdefault(k, v)
        name = rel["tags"]["name"]
        return {
            k.split(":", 1)[1]: v
            for k, v in tags.items()
            if k.startswith("name:") and v != name
        }

    def chain(osm_id: int) -> list[int]:
        out = []
        cur: int | None = osm_id
        while cur is not None:
            out.append(cur)
            cur = parent_of(cur)
        return out

    def fmt_zip(zz: list[str]) -> str:
        if not zz:
            return ""
        if len(zz) == 1:
            return f" ({zz[0]})"
        return f" ({zz[0]}-{zz[-1]})"

    def label_for(osm_id: int, lang: str | None) -> str:
        names = []
        for cid in chain(osm_id):
            n = by_id[cid]["tags"]["name"]
            if lang is not None:
                n = intl_names(cid).get(lang, n)
            if not names or names[-1] != n:
                names.append(n)
        names[0] += fmt_zip(zips(osm_id))
        return ", ".join(names)

    rows = []
    admin_ids = (
        [1000]
        + list(range(2001, 2005))
        + list(range(3001, 3017))
        + list(range(4001, 4009))
    )
    for osm_id in admin_ids:
        langs = sorted({l for cid in chain(osm_id) for l in intl_names(cid)})
        rows.append(
            dict(
                osm_id=f"relation:{osm_id}",
                name=by_id[osm_id]["tags"]["name"],
                admin_level=int(by_id[osm_id]["tags"]["admin_level"]),
                zone_type=ztype(osm_id),
                country_code="SY",
                parent_osm_id=(
                    f"relation:{parent_of(osm_id)}" if parent_of(osm_id) else None
                ),
                label=label_for(osm_id, None),
                international_labels={l: label_for(osm_id, l) for l in langs},
                zip_codes=zips(osm_id),
            )
        )
    # the place=suburb node zone: no boundary → no inclusions → no country,
    # type from the place tag survives UnknownLevel
    # (/root/reference/src/lib.rs:146-181)
    rows.append(
        dict(
            osm_id="node:6002",
            name="Oldquarter",
            admin_level=None,
            zone_type="suburb",
            country_code=None,
            parent_osm_id=None,
            label="Oldquarter",
            international_labels={},
            zip_codes=[],
        )
    )
    return pa.table(
        {
            "osm_id": pa.array([r["osm_id"] for r in rows]),
            "name": pa.array([r["name"] for r in rows]),
            "admin_level": pa.array([r["admin_level"] for r in rows], type=pa.int32()),
            "zone_type": pa.array([r["zone_type"] for r in rows]),
            "country_code": pa.array([r["country_code"] for r in rows]),
            "parent_osm_id": pa.array([r["parent_osm_id"] for r in rows]),
            "label": pa.array([r["label"] for r in rows]),
            "international_labels": pa.array(
                [sorted(r["international_labels"].items()) for r in rows], type=TAGS_T
            ),
            "zip_codes": pa.array([r["zip_codes"] for r in rows], type=pa.list_(pa.string())),
        }
    )


def expected_inclusion_edges() -> set[tuple[str, str]]:
    """(child_osm_id, parent_osm_id) covers-edges among boundary zones —
    golden for the inclusion join (/root/reference/src/hierarchy_builder.rs:76-95).
    Rect nesting is literal: A covers B iff A's rect contains B's rect
    (boundary-inclusive), excluding self."""
    spec = world_spec()
    zones = [
        r
        for r in spec["relations"]
        if "name" in r["tags"]  # unnamed 5001 never becomes a zone
    ]
    edges = set()
    for child in zones:
        for parent in zones:
            if child["osm_id"] == parent["osm_id"]:
                continue
            c, p = child["rect"], parent["rect"]
            if p[0] <= c[0] and p[1] <= c[1] and p[2] >= c[2] and p[3] >= c[3]:
                edges.add((f"relation:{child['osm_id']}", f"relation:{parent['osm_id']}"))
    return edges


# ------------------------------------------------------------------- docs

def build_docs(n_docs: int, seed: int = 42) -> pa.Table:
    """Interleaved text+media document table per FIXTURES.md §3 /
    BASELINE.json input_hint. Span points: ~80% inside leaf zones, ~15%
    elsewhere inside the country, ~5% outside all boundaries (kNN fallback)."""
    rng = np.random.RandomState(seed)
    doc_ids = []
    spans_col = []
    leaf_rects = [q for base in [(0, 0, 2, 2), (6, 0, 8, 2)] for q in _quadrants(*base)]
    for i in range(n_docs):
        doc_id = f"doc-{i:09d}"
        n_spans = int(rng.randint(1, 17))
        spans = []
        offset = 0
        for j in range(n_spans):
            u = rng.rand()
            if u < 0.80:
                r = leaf_rects[rng.randint(len(leaf_rects))]
                lon = float(rng.uniform(r[0] + 1e-3, r[2] - 1e-3))
                lat = float(rng.uniform(r[1] + 1e-3, r[3] - 1e-3))
            elif u < 0.95:
                lon = float(rng.uniform(0.001, 7.999))
                lat = float(rng.uniform(2.001, 7.999))
            else:
                lon = float(rng.uniform(8.5, 9.5))
                lat = float(rng.uniform(0.0, 8.0))
            kind = ["text", "image", "audio"][int(rng.randint(3))]
            if kind == "text":
                text = f"span {j} of {doc_id} @{lon:.6f},{lat:.6f}"
                media_ref = ""
            else:
                text = ""
                media_ref = f"media://store/{doc_id}/{j}.{kind} ?lon={lon:.6f}&lat={lat:.6f}".replace(
                    " ", ""
                )
            spans.append(
                dict(kind=kind, text=text, media_ref=media_ref, offset=offset)
            )
            offset += max(len(text), 1)
        doc_ids.append(doc_id)
        spans_col.append(spans)
    span_t = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "spans": pa.array(spans_col, type=pa.list_(span_t)),
        }
    )


# ------------------------------------------------------------------ writer

def write_mini_lux(out_dir: str, n_docs: int = 1000, seed: int = 42) -> dict[str, str]:
    """Write the full fixture set under ``out_dir``; returns path map.
    Idempotent (same bytes for same args)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, tbl in build_tables().items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    rules_dir = os.path.join(out_dir, "rules")
    os.makedirs(rules_dir, exist_ok=True)
    import yaml

    rp = os.path.join(rules_dir, "sy.yaml")
    with open(rp, "w") as f:
        yaml.safe_dump(RULES_SY, f)
    paths["rules_dir"] = rules_dir
    dp = os.path.join(out_dir, "docs.parquet")
    pq.write_table(build_docs(n_docs, seed), dp)
    paths["docs"] = dp
    ep = os.path.join(out_dir, "expected_zones.parquet")
    pq.write_table(expected_zones(), ep)
    paths["expected_zones"] = ep
    return paths
