"""Parametric nested-quadtree world for benchmarks.

``levels`` quadtree depths of axis-aligned zones (4^k zones at depth k) over
a (0,0)-(W,W) square: depth 0 = country (ISO tag), deeper levels map onto the
zone-type ladder. Emits the same three OSM-shaped tables as mini-lux (two
open ways per rect, admin_centre node for leaf zones) plus a rules YAML —
so the benchmark exercises the identical pipeline code path at tunable zone
counts (1365 zones at depth 6, 5461 at 7, ...)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .synth import MEMBER_T, TAGS_T

# admin_level per depth and its zone type
_LEVELS = [
    (2, "country"),
    (3, "country_region"),
    (4, "state"),
    (5, "state"),          # two state tiers — same type, finer level
    (6, "state_district"),
    (8, "city"),
    (9, "city_district"),
    (10, "suburb"),
]


def grid_world_tables(depth: int, world: float = 8.0) -> dict[str, pa.Table]:
    if not (1 <= depth <= len(_LEVELS)):
        raise ValueError(f"depth must be 1..{len(_LEVELS)}")
    node_rows: dict[int, tuple[float, float, dict]] = {}
    coord_ids: dict[tuple[float, float], int] = {}
    nxt = [10_000_000]

    def coord_node(x: float, y: float) -> int:
        key = (x, y)
        if key not in coord_ids:
            nid = nxt[0]
            nxt[0] += 1
            coord_ids[key] = nid
            node_rows[nid] = (x, y, {})
        return coord_ids[key]

    way_rows, rel_rows = [], []
    rel_id = [1000]
    centre_id = [20_000_000]

    def emit(depth_i: int, minx: float, miny: float, maxx: float, maxy: float):
        level, _ = _LEVELS[depth_i]
        rid = rel_id[0]
        rel_id[0] += 1
        tags = {
            "boundary": "administrative",
            "admin_level": str(level),
            "name": f"Zone L{level} #{rid}",
        }
        if depth_i == 0:
            tags["ISO3166-1:alpha2"] = "BW"
        w1 = [(minx, miny), (maxx, miny), (maxx, maxy)]
        w2 = [(minx, miny), (minx, maxy), (maxx, maxy)]
        members = []
        for pts in (w1, w2):
            wid = rid * 10 + len(members)
            way_rows.append(dict(osm_id=wid, node_ids=[coord_node(x, y) for x, y in pts]))
            members.append(dict(role="outer", ref_kind="way", ref_id=wid))
        if depth_i == depth - 1:  # leaves get an admin_centre node
            nid = centre_id[0]
            centre_id[0] += 1
            cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
            node_rows[nid] = (cx, cy, {"name": tags["name"], "population": str(rid)})
            members.append(dict(role="admin_centre", ref_kind="node", ref_id=nid))
        rel_rows.append(dict(osm_id=rid, tags=tags, members=members))
        if depth_i + 1 < depth:
            mx, my = (minx + maxx) / 2, (miny + maxy) / 2
            emit(depth_i + 1, minx, miny, mx, my)
            emit(depth_i + 1, mx, miny, maxx, my)
            emit(depth_i + 1, minx, my, mx, maxy)
            emit(depth_i + 1, mx, my, maxx, maxy)

    emit(0, 0.0, 0.0, world, world)

    nodes = pa.table(
        {
            "osm_id": pa.array(sorted(node_rows), type=pa.int64()),
            "lon": pa.array([node_rows[i][0] for i in sorted(node_rows)], type=pa.float64()),
            "lat": pa.array([node_rows[i][1] for i in sorted(node_rows)], type=pa.float64()),
            "tags": pa.array([list(node_rows[i][2].items()) for i in sorted(node_rows)], type=TAGS_T),
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


RULES_BW = {
    "admin_level": {str(lv): zt for lv, zt in _LEVELS}
}


def write_grid_world(out_dir: str, depth: int) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for name, tbl in grid_world_tables(depth).items():
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
    rules_dir = os.path.join(out_dir, "rules")
    os.makedirs(rules_dir, exist_ok=True)
    import yaml

    with open(os.path.join(rules_dir, "bw.yaml"), "w") as f:
        yaml.safe_dump(RULES_BW, f)
    return out_dir
