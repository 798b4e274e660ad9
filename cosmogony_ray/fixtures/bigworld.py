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
    (11, "suburb"),        # second suburb tier → depth 9 (87,381 zones)
    (12, "suburb"),        # third suburb tier → depth 10 (349,525 zones)
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
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"), row_group_size=2048)
    rules_dir = os.path.join(out_dir, "rules")
    os.makedirs(rules_dir, exist_ok=True)
    import yaml

    with open(os.path.join(rules_dir, "bw.yaml"), "w") as f:
        yaml.safe_dump(RULES_BW, f)
    return out_dir


# ---------------------------------------------------------------- tiled world

_TILE_OFF = 1 << 30  # id offset per tile; way/node/relation id ranges stay disjoint


def _codes(k: int) -> list[str]:
    out = []
    for i in range(k):
        out.append(chr(ord("A") + i // 26) + chr(ord("A") + i % 26))
    return out


def tiled_world_tables(depth: int, k: int, world: float = 8.0) -> dict[str, pa.Table]:
    """K disjoint copies of the depth-``depth`` quadtree world laid out on a
    grid of countries (each with its own ISO code) — vectorized Arrow column
    arithmetic, not K recursive generations. 4^0+…+4^(depth-1) zones per
    tile; the scalable input for bench scaling runs."""
    import numpy as np
    import pyarrow.compute as pc

    base = grid_world_tables(depth, world)
    codes = _codes(k)
    cols = max(1, int(np.ceil(np.sqrt(k))))
    rel_parts, way_parts, node_parts = [], [], []
    iso_key = "ISO3166-1:alpha2"
    for i in range(k):
        off = i * _TILE_OFF
        dx = (i % cols) * (world + 1.0)
        dy = (i // cols) * (world + 1.0)

        rel = base["relations"]
        rel_ids = pc.add(rel["osm_id"], off)
        # members: offset every ref_id (way/node ranges are disjoint per tile)
        mem = rel["members"].combine_chunks()
        flat = mem.flatten()
        new_flat = pa.StructArray.from_arrays(
            [
                pc.struct_field(flat, "role"),
                pc.struct_field(flat, "ref_kind"),
                pc.add(pc.struct_field(flat, "ref_id"), off),
            ],
            names=["role", "ref_kind", "ref_id"],
        )
        members = pa.LargeListArray.from_arrays(
            pa.array(mem.offsets.to_numpy(zero_copy_only=False).astype(np.int64)),
            new_flat,
        ).cast(rel["members"].type)
        # tags: swap the country ISO code per tile (one relation per tile)
        tags_py = rel["tags"].to_pylist()
        new_tags = []
        for kvs in tags_py:
            kvs = list(kvs or [])
            if any(kk == iso_key for kk, _ in kvs):
                kvs = [(kk, codes[i] if kk == iso_key else vv) for kk, vv in kvs]
            new_tags.append(kvs)
        rel_parts.append(
            pa.table(
                {
                    "osm_id": rel_ids,
                    "tags": pa.array(new_tags, type=TAGS_T),
                    "members": members,
                }
            )
        )

        way = base["ways"]
        nid = way["node_ids"].combine_chunks()
        new_nid = pa.LargeListArray.from_arrays(
            pa.array(nid.offsets.to_numpy(zero_copy_only=False).astype(np.int64)),
            pc.add(nid.flatten(), off),
        ).cast(way["node_ids"].type)
        way_parts.append(
            pa.table({"osm_id": pc.add(way["osm_id"], off), "node_ids": new_nid})
        )

        node = base["nodes"]
        node_parts.append(
            pa.table(
                {
                    "osm_id": pc.add(node["osm_id"], off),
                    "lon": pc.add(node["lon"], dx),
                    "lat": pc.add(node["lat"], dy),
                    "tags": node["tags"],
                }
            )
        )
    return {
        "relations": pa.concat_tables(rel_parts).combine_chunks(),
        "ways": pa.concat_tables(way_parts).combine_chunks(),
        "nodes": pa.concat_tables(node_parts).combine_chunks(),
    }


def write_tiled_world(out_dir: str, depth: int, k: int) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for name, tbl in tiled_world_tables(depth, k).items():
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"), row_group_size=2048)
    rules_dir = os.path.join(out_dir, "rules")
    os.makedirs(rules_dir, exist_ok=True)
    import yaml

    for code in _codes(k):
        with open(os.path.join(rules_dir, f"{code.lower()}.yaml"), "w") as f:
            yaml.safe_dump(RULES_BW, f)
    return out_dir
