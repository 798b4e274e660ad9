"""Zone assembly: OSM-shaped tables → zones Dataset.

Ray-Data-native re-expression of the reference's scan+construct stage:
- predicate P1/P4 (admin relations ∨ place=suburb objects)
  /root/reference/src/lib.rs:31-42,66-95
- `Zone::from_osm_relation` /root/reference/src/zone_ext.rs:118-234
- `Zone::from_osm_node`     /root/reference/src/zone_ext.rs:49-116
- boundary assembly (member ways → rings → MultiPolygon) — the
  osm_boundaries_utils semantics, via geom.algorithms.assemble_rings

Dataflow (all distributed, no driver-side materialization):
  ways ⨝ nodes (hash join on node_id) → per-way coord arrays (groupby way_id)
  relations → member explode → way-members ⨝ way_geo, node-members ⨝ nodes
  → groupby(rel_id) → one Zone row per relation (map_groups)
  ∪ place=suburb nodes → node zones (map_batches)

The dependency closure of S1 (relation → ways → nodes) is exactly these two
hash joins — only referenced ways/nodes survive the inner joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..config import EngineConfig
from ..functions.arrowtools import explode_list_column, map_to_pydicts, tags_get
from ..functions.joins import hash_join
from ..functions.shuffle import grouped_map
from ..geom.algorithms import (
    assemble_rings,
    build_polygons,
    multipolygon_area,
    multipolygon_bbox,
    multipolygon_centroid,
)
from ..geom.wkb import multipolygon_to_wkb
from ..model import ZONE_SCHEMA, parse_zone_type

_EMPTY_TAGS: list = []


def _parse_zips(tags: dict) -> list[str]:
    raw = tags.get("addr:postcode") or tags.get("postal_code") or ""
    return sorted(s for s in raw.split(";") if s)


def _filter_relations(batch: pa.Table) -> pa.Table:
    """is_admin ∨ place=suburb (/root/reference/src/lib.rs:31-42,72-77)."""
    boundary = tags_get(batch["tags"], "boundary")
    level = tags_get(batch["tags"], "admin_level")
    place = tags_get(batch["tags"], "place")
    is_admin = pc.and_(
        pc.equal(pc.fill_null(boundary, ""), "administrative"), pc.is_valid(level)
    )
    keep = pc.or_(is_admin, pc.equal(pc.fill_null(place, ""), "suburb"))
    return batch.filter(keep)


def _explode_members(batch: pa.Table) -> pa.Table:
    t = batch.rename_columns(
        ["rel_id" if c == "osm_id" else c for c in batch.column_names]
    )
    out = explode_list_column(t, "members", ["rel_id"], pos_col="seq")
    return out  # rel_id, role, ref_kind, ref_id, seq


def _way_points(batch: pa.Table) -> pa.Table:
    t = batch.rename_columns(
        ["way_id" if c == "osm_id" else c for c in batch.column_names]
    )
    return explode_list_column(t, "node_ids", ["way_id"], pos_col="pos")


_WAY_GEO_SCHEMA = pa.schema(
    [("way_id", pa.int64()), ("xs", pa.list_(pa.float64())), ("ys", pa.list_(pa.float64()))]
)


def _assemble_way(key: tuple, group: pa.Table) -> pa.Table:
    g = group.sort_by([("pos", "ascending")])
    # explicit list<f64> (NOT numpy-in-pandas, which becomes a tensor
    # extension type that pyarrow's join kernel rejects)
    return pa.table(
        {
            "way_id": pa.array([key[0]], type=pa.int64()),
            "xs": pa.array([g["lon"].to_pylist()], type=pa.list_(pa.float64())),
            "ys": pa.array([g["lat"].to_pylist()], type=pa.list_(pa.float64())),
        },
        schema=_WAY_GEO_SCHEMA,
    )


_PART_SCHEMA = pa.schema(
    [
        ("rel_id", pa.int64()),
        ("src", pa.string()),
        ("role", pa.string()),
        ("seq", pa.int32()),
        ("xs", pa.list_(pa.float64())),
        ("ys", pa.list_(pa.float64())),
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("tags", pa.map_(pa.string(), pa.string())),
    ]
)


def _part_table(cols: dict) -> pa.Table:
    n = len(next(iter(cols.values())))
    data = {}
    for f in _PART_SCHEMA:
        if f.name in cols:
            c = cols[f.name]
            data[f.name] = c if isinstance(c, (pa.Array, pa.ChunkedArray)) else pa.array(
                c, type=f.type
            )
            if data[f.name].type != f.type:
                data[f.name] = data[f.name].cast(f.type)
        else:
            data[f.name] = pa.nulls(n, type=f.type)
    return pa.table(data, schema=_PART_SCHEMA)


def _build_zone_group(key: tuple, group: pa.Table) -> pa.Table:
    """One relation's parts → 0..1 Zone rows (from_osm_relation,
    /root/reference/src/zone_ext.rs:118-234)."""
    src = group["src"].to_pylist()
    rel_rows = [i for i, s in enumerate(src) if s == "rel"]
    if not rel_rows:
        return _empty_zone_table()
    rel_id = key[0]
    tags = dict(group["tags"][rel_rows[0]].as_py() or [])
    name = tags.get("name")
    if not name:
        return _empty_zone_table()  # unnamed → skipped (zone_ext.rs:126-135)

    roles = group["role"].to_pylist()
    seqs = group["seq"].to_pylist()

    # label-node tag merge at construction (zone_ext.rs:166-181)
    node_rows = [i for i, s in enumerate(src) if s == "node"]
    label_rows = sorted(
        (i for i in node_rows if roles[i] == "label"), key=lambda i: seqs[i]
    )
    centre_rows = sorted(
        (i for i in node_rows if roles[i] == "admin_centre"), key=lambda i: seqs[i]
    )
    if label_rows:
        ln_tags = dict(group["tags"][label_rows[0]].as_py() or [])
        for k, v in ln_tags.items():
            if k.startswith("name:") or k == "population":
                tags.setdefault(k, v)

    # boundary from member ways (build_boundary semantics)
    way_rows = [i for i, s in enumerate(src) if s == "way"]
    outer_segs, inner_segs = [], []
    for i in sorted(way_rows, key=lambda i: seqs[i]):
        xs = group["xs"][i].as_py()
        ys = group["ys"][i].as_py()
        if xs is None or len(xs) < 2:
            continue
        seg = np.column_stack([xs, ys])
        if roles[i] == "inner":
            inner_segs.append(seg)
        else:  # outer / enclave / empty role all treated as outer
            outer_segs.append(seg)
    outer_rings = assemble_rings(outer_segs)
    if not outer_rings:
        return _empty_zone_table()  # no boundary → zone skipped (lib.rs:78-81)
    inner_rings = assemble_rings(inner_segs)
    mpoly = build_polygons(outer_rings, inner_rings)
    bbox = multipolygon_bbox(mpoly)

    # center: admin_centre else label else NaN-guarded centroid
    # (zone_ext.rs:183-210); center_tags from the same node
    center_row = centre_rows[0] if centre_rows else (label_rows[0] if label_rows else None)
    if center_row is not None:
        center = (group["lon"][center_row].as_py(), group["lat"][center_row].as_py())
        center_tags = dict(group["tags"][center_row].as_py() or [])
    else:
        center = multipolygon_centroid(mpoly)
        if not (np.isfinite(center[0]) and np.isfinite(center[1])):
            center = (None, None)
        center_tags = {}

    row = {
        "osm_id": f"relation:{rel_id}",
        "zone_uid": f"relation:{rel_id}",
        "kind": "relation",
        "name": name,
        "admin_level": _parse_level(tags.get("admin_level")),
        "zone_type": None,
        "loc_name": tags.get("loc_name", ""),
        "alt_name": tags.get("alt_name", ""),
        "zip_codes": _parse_zips(tags),
        "wikidata": tags.get("wikidata"),
        "tags": sorted(tags.items()),
        "center_tags": sorted(center_tags.items()),
        "center_lon": center[0],
        "center_lat": center[1],
        "boundary_wkb": multipolygon_to_wkb(mpoly),
        "minx": bbox[0],
        "miny": bbox[1],
        "maxx": bbox[2],
        "maxy": bbox[3],
        "area": multipolygon_area(mpoly),
        "is_generated": False,
        "country_code": None,
        "parent": None,
        "label": "",
        "international_labels": _EMPTY_TAGS,
    }
    return pa.Table.from_pylist([row], schema=ZONE_SCHEMA)


def _parse_level(s: str | None) -> int | None:
    if s is None:
        return None
    try:
        return int(s)
    except ValueError:
        return None  # unparsable admin_level → None (zone_ext.rs:136-139)


def _empty_zone_table() -> pa.Table:
    return ZONE_SCHEMA.empty_table()


def _node_zones(batch: pa.Table) -> pa.Table:
    """place=suburb nodes → boundary-less zones (from_osm_node,
    /root/reference/src/zone_ext.rs:49-116; note center/bbox stay None —
    only the voronoi path sets them, additional_zones.rs:122-157)."""
    place = tags_get(batch["tags"], "place")
    keep = pc.equal(pc.fill_null(place, ""), "suburb")
    batch = batch.filter(keep)
    if batch.num_rows == 0:
        return _empty_zone_table()
    rows = []
    tag_dicts = map_to_pydicts(batch["tags"])
    ids = batch["osm_id"].to_pylist()
    for i, tags in enumerate(tag_dicts):
        name = tags.get("name")
        if not name:
            continue
        rows.append(
            {
                "osm_id": f"node:{ids[i]}",
                "zone_uid": f"node:{ids[i]}",
                "kind": "node",
                "name": name,
                "admin_level": _parse_level(tags.get("admin_level")),
                "zone_type": parse_zone_type(tags.get("place")),
                "loc_name": tags.get("loc_name", ""),
                "alt_name": tags.get("alt_name", ""),
                "zip_codes": _parse_zips(tags),
                "wikidata": tags.get("wikidata"),
                "tags": sorted(tags.items()),
                "center_tags": _EMPTY_TAGS,
                "center_lon": None,
                "center_lat": None,
                "boundary_wkb": None,
                "minx": None,
                "miny": None,
                "maxx": None,
                "maxy": None,
                "area": None,
                "is_generated": True,
                "country_code": None,
                "parent": None,
                "label": "",
                "international_labels": _EMPTY_TAGS,
            }
        )
    if not rows:
        return _empty_zone_table()
    return pa.Table.from_pylist(rows, schema=ZONE_SCHEMA)


def assemble_zones(
    relations: rd.Dataset,
    ways: rd.Dataset,
    nodes: rd.Dataset,
    cfg: EngineConfig | None = None,
) -> rd.Dataset:
    cfg = cfg or EngineConfig()

    rels = relations.map_batches(_filter_relations, batch_format="pyarrow")
    members = rels.map_batches(_explode_members, batch_format="pyarrow")

    # --- ways ⨝ nodes → per-way coordinate arrays -------------------------
    way_pts = ways.map_batches(_way_points, batch_format="pyarrow")
    node_coords = nodes.select_columns(["osm_id", "lon", "lat"]).map_batches(
        lambda t: t.rename_columns(["node_id", "lon", "lat"]), batch_format="pyarrow"
    )
    way_pts = way_pts.map_batches(
        lambda t: t.rename_columns(
            ["node_id" if c == "node_ids" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    wp = hash_join(
        way_pts,
        node_coords,
        "node_id",
        left_schema=pa.schema(
            [("way_id", pa.int64()), ("node_id", pa.int64()), ("pos", pa.int32())]
        ),
        right_schema=pa.schema(
            [("node_id", pa.int64()), ("lon", pa.float64()), ("lat", pa.float64())]
        ),
    )
    way_geo = grouped_map(wp, ["way_id"], _assemble_way, empty_schema=_WAY_GEO_SCHEMA)

    # --- member branches --------------------------------------------------
    way_members = members.map_batches(
        lambda t: t.filter(pc.equal(t["ref_kind"], "way")).rename_columns(
            ["rel_id", "role", "ref_kind", "way_id", "seq"]
        ),
        batch_format="pyarrow",
    )
    wm = hash_join(
        way_members.drop_columns(["ref_kind"]),
        way_geo,
        "way_id",
        left_schema=pa.schema(
            [
                ("rel_id", pa.int64()),
                ("role", pa.string()),
                ("way_id", pa.int64()),
                ("seq", pa.int32()),
            ]
        ),
        right_schema=pa.schema(
            [
                ("way_id", pa.int64()),
                ("xs", pa.list_(pa.float64())),
                ("ys", pa.list_(pa.float64())),
            ]
        ),
    )
    wm_part = wm.map_batches(
        lambda t: _part_table(
            {
                "rel_id": t["rel_id"],
                "src": ["way"] * t.num_rows,
                "role": t["role"],
                "seq": t["seq"],
                "xs": t["xs"],
                "ys": t["ys"],
            }
        ),
        batch_format="pyarrow",
    )

    node_members = members.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.equal(t["ref_kind"], "node"),
                pc.is_in(t["role"], value_set=pa.array(["label", "admin_centre"])),
            )
        ).rename_columns(["rel_id", "role", "ref_kind", "node_id", "seq"]),
        batch_format="pyarrow",
    )
    nm = hash_join(
        node_members.drop_columns(["ref_kind"]),
        nodes.map_batches(
            lambda t: t.rename_columns(
                ["node_id" if c == "osm_id" else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        ),
        "node_id",
        left_schema=pa.schema(
            [
                ("rel_id", pa.int64()),
                ("role", pa.string()),
                ("node_id", pa.int64()),
                ("seq", pa.int32()),
            ]
        ),
        right_schema=pa.schema(
            [
                ("node_id", pa.int64()),
                ("lon", pa.float64()),
                ("lat", pa.float64()),
                ("tags", pa.map_(pa.string(), pa.string())),
            ]
        ),
    )
    nm_part = nm.map_batches(
        lambda t: _part_table(
            {
                "rel_id": t["rel_id"],
                "src": ["node"] * t.num_rows,
                "role": t["role"],
                "seq": t["seq"],
                "lon": t["lon"],
                "lat": t["lat"],
                "tags": t["tags"],
            }
        ),
        batch_format="pyarrow",
    )

    rel_part = rels.map_batches(
        lambda t: _part_table(
            {
                "rel_id": t["osm_id"],
                "src": ["rel"] * t.num_rows,
                "tags": t["tags"],
            }
        ),
        batch_format="pyarrow",
    )

    parts = rel_part.union(wm_part, nm_part)
    rel_zones = grouped_map(
        parts, ["rel_id"], _build_zone_group, empty_schema=ZONE_SCHEMA
    )
    node_zones = nodes.map_batches(_node_zones, batch_format="pyarrow")
    return rel_zones.union(node_zones)
