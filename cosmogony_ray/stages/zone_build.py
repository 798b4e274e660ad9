"""Zone assembly: OSM-shaped tables → zones Dataset.

Ray-Data-native re-expression of the reference's scan+construct stage:
- predicate P1/P4 (admin relations ∨ place=suburb objects)
  /root/reference/src/lib.rs:31-42,66-95
- `Zone::from_osm_relation` /root/reference/src/zone_ext.rs:118-234
- `Zone::from_osm_node`     /root/reference/src/zone_ext.rs:49-116
- boundary assembly (member ways → rings → MultiPolygon) — the
  osm_boundaries_utils semantics, via geom.algorithms.assemble_rings

Dataflow (all distributed, no driver-side materialization):
  ways ⨝ nodes (hash join on node_id) → fused way-assembly + member-attach
  partition pass (ONE way_id shuffle; coord lists built vectorized from
  list offsets) ∥ node-members ⨝ nodes
  → partition by rel_id → Zone rows batched per partition
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
from ..functions.shuffle import partitioned_map
from ..geom.algorithms import (
    assemble_rings,
    multipolygon_metrics,
    build_polygons,
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


_WAYS_UNIFIED_SCHEMA = pa.schema(
    [
        ("way_id", pa.int64()),
        ("src", pa.int8()),           # 0 = way point row, 1 = member row
        ("pos", pa.int32()),
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("rel_id", pa.int64()),
        ("role", pa.string()),
        ("seq", pa.int32()),
    ]
)

_WAYPART_SCHEMA = pa.schema(
    [
        ("rel_id", pa.int64()),
        ("role", pa.string()),
        ("seq", pa.int32()),
        ("xs", pa.list_(pa.float64())),
        ("ys", pa.list_(pa.float64())),
    ]
)


def _ways_partition(part: pa.Table) -> pa.Table | None:
    """One fused partition pass replacing the former per-way grouped map +
    way_id hash join: assemble each way's coordinate list (vectorized via
    list offsets) and attach it to the relation member rows referencing it.
    Inner-join semantics both ways (members without an assembled way and
    ways without members drop), matching the dependency-closure behavior."""
    src = part["src"].to_numpy(zero_copy_only=False)
    pts = part.filter(pa.array(src == 0))
    mems = part.filter(pa.array(src == 1))
    if pts.num_rows == 0 or mems.num_rows == 0:
        return None
    pts = pts.sort_by([("way_id", "ascending"), ("pos", "ascending")])
    wid = pts["way_id"].to_numpy(zero_copy_only=False)
    change = np.empty(len(wid), dtype=bool)
    change[0] = True
    change[1:] = wid[1:] != wid[:-1]
    starts = np.nonzero(change)[0]
    offsets = np.append(starts, len(wid)).astype(np.int64)
    lon = pts["lon"].combine_chunks()
    lat = pts["lat"].combine_chunks()
    off_arr = pa.array(offsets, type=pa.int64())
    xs = pa.LargeListArray.from_arrays(off_arr, lon).cast(pa.list_(pa.float64()))
    ys = pa.LargeListArray.from_arrays(off_arr, lat).cast(pa.list_(pa.float64()))
    uniq = wid[starts]
    mwid = mems["way_id"].to_numpy(zero_copy_only=False)
    idx = np.searchsorted(uniq, mwid)
    idx_c = np.minimum(idx, len(uniq) - 1)
    valid = uniq[idx_c] == mwid
    vmask = pa.array(valid)
    take = pa.array(idx_c[valid], type=pa.int64())
    return pa.table(
        {
            "rel_id": mems["rel_id"].filter(vmask),
            "role": mems["role"].filter(vmask),
            "seq": mems["seq"].filter(vmask),
            "xs": xs.take(take),
            "ys": ys.take(take),
        },
        schema=_WAYPART_SCHEMA,
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


def _build_zones_partition(part: pa.Table) -> pa.Table | None:
    """All relations of one hash partition → Zone rows: per-relation Python
    construction (ring assembly is inherently per-relation), but ONE output
    table per partition instead of a 1-row table per relation (the former
    per-key emission made every zone block a chunk-per-row table)."""
    from ..functions.shuffle import iter_key_groups

    rows = []
    for key, group in iter_key_groups(part, ["rel_id"]):
        row = _build_zone_row(key, group)
        if row is not None:
            rows.append(row)
    if not rows:
        return None
    return pa.Table.from_pylist(rows, schema=ZONE_SCHEMA)


def _build_zone_row(key: tuple, group: pa.Table) -> dict | None:
    """One relation's parts → 0..1 Zone row dicts (from_osm_relation,
    /root/reference/src/zone_ext.rs:118-234)."""
    src = group["src"].to_pylist()
    rel_rows = [i for i, s in enumerate(src) if s == "rel"]
    if not rel_rows:
        return None
    rel_id = key[0]
    tags = dict(group["tags"][rel_rows[0]].as_py() or [])
    name = tags.get("name")
    if not name:
        return None  # unnamed → skipped (zone_ext.rs:126-135)

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
        return None  # no boundary → zone skipped (lib.rs:78-81)
    inner_rings = assemble_rings(inner_segs)
    mpoly = build_polygons(outer_rings, inner_rings)

    # center: admin_centre else label else NaN-guarded centroid
    # (zone_ext.rs:183-210); center_tags from the same node
    center_row = centre_rows[0] if centre_rows else (label_rows[0] if label_rows else None)
    bbox, area, centroid = multipolygon_metrics(mpoly, want_centroid=center_row is None)
    if center_row is not None:
        center = (group["lon"][center_row].as_py(), group["lat"][center_row].as_py())
        center_tags = dict(group["tags"][center_row].as_py() or [])
    else:
        center = centroid
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
        "area": area,
        "is_generated": False,
        "country_code": None,
        "parent": None,
        "label": "",
        "international_labels": _EMPTY_TAGS,
    }
    return row


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
    """Dispatch: broadcast assembly (zero-shuffle; ways/nodes tables fit in
    the object store — the reference holds the whole object map in RAM,
    src/lib.rs:247) vs distributed hash-join assembly for beyond-memory
    inputs. ``cfg.assembly_mode``: "broadcast" (default) | "distributed"."""
    cfg = cfg or EngineConfig()
    if cfg.assembly_mode == "distributed":
        return assemble_zones_distributed(relations, ways, nodes, cfg)
    return assemble_zones_broadcast(relations, ways, nodes, cfg)


def _collect_table(ds: rd.Dataset, cols: list[str] | None = None) -> pa.Table:
    parts = []
    src = ds.select_columns(cols) if cols else ds
    for b in src.iter_batches(batch_size=65536, batch_format="pyarrow"):
        parts.append(b)
    if not parts:
        raise ValueError("empty dataset")
    return pa.concat_tables(parts).combine_chunks()


def _build_node_pack(*tbls: pa.Table) -> dict:
    """Runs as ONE Ray task: node blocks → presorted flat numpy pack
    {ids, lon, lat (numpy, sorted by id), tags (Arrow, same order)}.
    The pack lives in the object store (task return) — its bytes never
    cross the driver, workers read the numpy arrays zero-copy, and NO
    per-worker index build is needed (see broadcast.lookup_sorted_ids)."""
    t = pa.concat_tables(list(tbls), promote_options="default").combine_chunks()
    ids = t["osm_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    take = pa.array(order, type=pa.int64())
    return {
        "ids": ids[order],
        "lon": t["lon"].to_numpy(zero_copy_only=False)[order],
        "lat": t["lat"].to_numpy(zero_copy_only=False)[order],
        "tags": pc.take(t["tags"].combine_chunks(), take),
    }


def _build_way_pack(*tbls: pa.Table) -> dict:
    """Runs as ONE Ray task: way-geometry blocks → presorted CSR pack
    {ids (sorted), offs (int64, len+1), xs, ys (flat float64)} — the
    ring-assembly loop slices numpy VIEWS per member instead of converting
    Arrow lists to Python lists per way."""
    t = pa.concat_tables(list(tbls), promote_options="default").combine_chunks()
    ids = t["osm_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    take = pa.array(order, type=pa.int64())
    xs = pc.take(t["xs"].combine_chunks(), take)
    ys = pc.take(t["ys"].combine_chunks(), take)
    if isinstance(xs, pa.ChunkedArray):
        xs = xs.combine_chunks()
        ys = ys.combine_chunks()
    # interleaved (n, 2) coordinate matrix: a member's segment is ONE
    # contiguous view slice xy[s:e] — no per-member column_stack copy in
    # the ring-assembly hot loop (43k copies/d8-batch before round 5)
    xs_np = xs.values.to_numpy(zero_copy_only=False)
    ys_np = ys.values.to_numpy(zero_copy_only=False)
    xy = np.empty((xs_np.size, 2), dtype=np.float64)
    xy[:, 0] = xs_np
    xy[:, 1] = ys_np
    return {
        "ids": ids[order],
        "offs": xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64),
        "xy": xy,
    }


def _way_geo_fn(nodes_ref):
    """ways batch → (osm_id, xs, ys): node-coordinate lookup against the
    broadcast node pack (presorted ids → direct ``searchsorted``), list
    rebuild via offsets — fully vectorized, no shuffle, no per-worker
    setup."""
    from ..functions.broadcast import get_cached, lookup_sorted_ids

    def fn(batch: pa.Table) -> pa.Table:
        nd = get_cached(nodes_ref)
        nid = batch["node_ids"].combine_chunks()
        flat = nid.flatten()
        raw = lookup_sorted_ids(nd["ids"], flat.to_numpy(zero_copy_only=False))
        # Dangling node refs (clipped extracts) are DROPPED from the way's
        # coordinate list — inner-join semantics matching the distributed
        # assembly path and the reference (osmpbfreader get_objs_and_deps
        # simply lacks the node); a null element here would poison
        # np.column_stack downstream with object dtype.
        valid = raw >= 0
        offs_np = nid.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        if not valid.all():
            cum = np.concatenate(([0], np.cumsum(valid, dtype=np.int64)))
            offs_np = cum[offs_np]
            raw = raw[valid]
        offs = pa.array(offs_np)
        xs = pa.LargeListArray.from_arrays(offs, pa.array(nd["lon"][raw])).cast(
            pa.list_(pa.float64())
        )
        ys = pa.LargeListArray.from_arrays(offs, pa.array(nd["lat"][raw])).cast(
            pa.list_(pa.float64())
        )
        return pa.table({"osm_id": batch["osm_id"], "xs": xs, "ys": ys})

    return fn


def _zones_from_relations_fn(ways_ref, nodes_ref):
    """relations batch → Zone rows: member ways/nodes resolved against the
    broadcast CSR packs (presorted ids → direct ``searchsorted``; way
    coordinates sliced as numpy VIEWS), then the per-relation ring-assembly
    loop — ZERO shuffles end-to-end and zero per-worker setup (round 4:
    the former per-worker concat + argsort + bulk Arrow→pylist conversion
    was ~30% of the stage's CPU at 32 workers and grew with worker count)."""
    from ..functions.broadcast import get_cached, lookup_sorted_ids

    def fn(batch: pa.Table) -> pa.Table:
        batch = _filter_relations(batch)
        if batch.num_rows == 0:
            return _empty_zone_table()
        w = get_cached(ways_ref)
        nd = get_cached(nodes_ref)
        woffs, wxy = w["offs"], w["xy"]
        mem = batch["members"].combine_chunks()
        flat = mem.flatten()
        roles = pc.struct_field(flat, "role").to_pylist()
        kinds = pc.struct_field(flat, "ref_kind").to_pylist()
        refs = pc.struct_field(flat, "ref_id").to_numpy(zero_copy_only=False)
        widx = lookup_sorted_ids(w["ids"], refs)
        nidx = lookup_sorted_ids(nd["ids"], refs)
        nlon, nlat = nd["lon"], nd["lat"]
        ntags = nd["tags"]
        offs = mem.offsets.to_numpy(zero_copy_only=False)
        rel_ids = batch["osm_id"].to_pylist()
        rel_tags = batch["tags"].to_pylist()
        # scalar tag fields pulled vectorized ONCE per batch; the per-row
        # dict(tags) conversion is only paid on label-node-merge rows
        tcol = batch["tags"]
        names_v = tags_get(tcol, "name").to_pylist()
        loc_v = tags_get(tcol, "loc_name").to_pylist()
        alt_v = tags_get(tcol, "alt_name").to_pylist()
        wiki_v = tags_get(tcol, "wikidata").to_pylist()
        lvl_v = tags_get(tcol, "admin_level").to_pylist()
        pc1_v = tags_get(tcol, "addr:postcode").to_pylist()
        pc2_v = tags_get(tcol, "postal_code").to_pylist()
        cols: dict[str, list] = {k: [] for k in ZONE_SCHEMA.names}
        for i in range(batch.num_rows):
            name = names_v[i]
            if not name:
                continue  # unnamed → skipped (zone_ext.rs:126-135)
            lo, hi = offs[i], offs[i + 1]
            outer_segs, inner_segs = [], []
            label_node = None
            centre_node = None
            for j in range(lo, hi):
                kind = kinds[j]
                if kind == "way" and widx[j] >= 0:
                    r = widx[j]
                    s, e = woffs[r], woffs[r + 1]
                    if e - s < 2:
                        continue
                    seg = wxy[s:e]  # contiguous zero-copy view
                    if roles[j] == "inner":
                        inner_segs.append(seg)
                    else:  # outer / enclave / empty role all treated as outer
                        outer_segs.append(seg)
                elif kind == "node" and nidx[j] >= 0:
                    if roles[j] == "label" and label_node is None:
                        label_node = j
                    elif roles[j] == "admin_centre" and centre_node is None:
                        centre_node = j
            # label-node tag merge at construction (zone_ext.rs:166-181)
            tags_out = rel_tags[i] or []
            loc, alt, wiki = loc_v[i], alt_v[i], wiki_v[i]
            zraw = pc1_v[i] or pc2_v[i] or ""
            if label_node is not None:
                tags = dict(tags_out)
                lt = ntags[int(nidx[label_node])].as_py()
                for k, v in dict(lt or []).items():
                    if k.startswith("name:") or k == "population":
                        tags.setdefault(k, v)
                tags_out = tags.items()
            outer_rings = assemble_rings(outer_segs)
            if not outer_rings:
                continue  # no boundary → zone skipped (lib.rs:78-81)
            inner_rings = assemble_rings(inner_segs)
            mpoly = build_polygons(outer_rings, inner_rings)
            center_j = centre_node if centre_node is not None else label_node
            # one fused walk for bbox/area(/centroid) — bit-exact vs the
            # separate kernels (multipolygon_metrics docstring)
            bbox, area, centroid = multipolygon_metrics(
                mpoly, want_centroid=center_j is None
            )
            if center_j is not None:
                ci = int(nidx[center_j])
                center = (float(nlon[ci]), float(nlat[ci]))
                center_tags = sorted(ntags[ci].as_py() or [])
            else:
                center = centroid
                if not (np.isfinite(center[0]) and np.isfinite(center[1])):
                    center = (None, None)
                center_tags = []
            uid = f"relation:{rel_ids[i]}"
            cols["osm_id"].append(uid)
            cols["zone_uid"].append(uid)
            cols["kind"].append("relation")
            cols["name"].append(name)
            cols["admin_level"].append(_parse_level(lvl_v[i]))
            cols["zone_type"].append(None)
            cols["loc_name"].append(loc or "")
            cols["alt_name"].append(alt or "")
            cols["zip_codes"].append(sorted(s for s in zraw.split(";") if s))
            cols["wikidata"].append(wiki)
            cols["tags"].append(sorted(tags_out))
            cols["center_tags"].append(center_tags)
            cols["center_lon"].append(center[0])
            cols["center_lat"].append(center[1])
            cols["boundary_wkb"].append(multipolygon_to_wkb(mpoly))
            cols["minx"].append(bbox[0])
            cols["miny"].append(bbox[1])
            cols["maxx"].append(bbox[2])
            cols["maxy"].append(bbox[3])
            cols["area"].append(area)
            cols["is_generated"].append(False)
            cols["country_code"].append(None)
            cols["parent"].append(None)
            cols["label"].append("")
            cols["international_labels"].append(_EMPTY_TAGS)
        if not cols["osm_id"]:
            return _empty_zone_table()
        return pa.table(
            {k: pa.array(cols[k], type=ZONE_SCHEMA.field(k).type) for k in ZONE_SCHEMA.names},
            schema=ZONE_SCHEMA,
        )

    return fn


def assemble_zones_broadcast(
    relations: rd.Dataset,
    ways: rd.Dataset,
    nodes: rd.Dataset,
    cfg: EngineConfig,
) -> rd.Dataset:
    """Zero-shuffle assembly: nodes and way geometries are broadcast Arrow
    tables (``ray.put`` once, zero-copy per worker); relation construction
    is an embarrassingly-parallel ``map_batches`` over the relations table.
    Scale bound: ways+nodes of the admin closure must fit in the object
    store (the reference's own operating point, src/lib.rs:243-249); use
    ``cfg.assembly_mode="distributed"`` beyond that.

    Broadcast handles are presorted CSR numpy PACKS built by single Ray
    tasks from the materialized block refs: the bytes never cross the
    driver, workers read them zero-copy from the object store, and the
    per-worker concat/argsort setup of the table-broadcast design is gone
    (it cost ~30% of the stage CPU at 32 workers and grew with workers)."""
    import ray

    node_src = nodes.select_columns(["osm_id", "lon", "lat", "tags"])
    nodes_ref = ray.remote(_build_node_pack).remote(
        *node_src.materialize().to_arrow_refs()
    )
    way_geo = ways.map_batches(_way_geo_fn(nodes_ref), batch_format="pyarrow")
    ways_ref = ray.remote(_build_way_pack).remote(
        *way_geo.materialize().to_arrow_refs()
    )
    rel_zones = relations.map_batches(
        _zones_from_relations_fn(ways_ref, nodes_ref), batch_format="pyarrow"
    )
    if not cfg.place_node_zones:
        return rel_zones
    node_zones = nodes.map_batches(_node_zones, batch_format="pyarrow")
    return rel_zones.union(node_zones)


def assemble_zones_distributed(
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
        right_unique=True,  # one coordinate row per node id
        left_schema=pa.schema(
            [("way_id", pa.int64()), ("node_id", pa.int64()), ("pos", pa.int32())]
        ),
        right_schema=pa.schema(
            [("node_id", pa.int64()), ("lon", pa.float64()), ("lat", pa.float64())]
        ),
        num_partitions=cfg.join_num_partitions,
    )

    # --- fused way assembly + member attach (ONE way_id shuffle) ----------
    way_members = members.map_batches(
        lambda t: t.filter(pc.equal(t["ref_kind"], "way")).rename_columns(
            ["rel_id", "role", "ref_kind", "way_id", "seq"]
        ),
        batch_format="pyarrow",
    )

    def _pad_unified(cols_fixed: dict):
        def fn(t: pa.Table) -> pa.Table:
            data = {}
            for f in _WAYS_UNIFIED_SCHEMA:
                if f.name in t.column_names:
                    c = t[f.name]
                    data[f.name] = c.cast(f.type) if c.type != f.type else c
                elif f.name in cols_fixed:
                    data[f.name] = pa.array(
                        np.full(t.num_rows, cols_fixed[f.name]), type=f.type
                    )
                else:
                    data[f.name] = pa.nulls(t.num_rows, type=f.type)
            return pa.table(data, schema=_WAYS_UNIFIED_SCHEMA)

        return fn

    wp_tagged = wp.map_batches(_pad_unified({"src": 0}), batch_format="pyarrow")
    wm_tagged = way_members.drop_columns(["ref_kind"]).map_batches(
        _pad_unified({"src": 1}), batch_format="pyarrow"
    )
    wm_with_geo = partitioned_map(
        wp_tagged.union(wm_tagged),
        ["way_id"],
        _ways_partition,
        num_partitions=cfg.join_num_partitions,
        empty_schema=_WAYPART_SCHEMA,
    )
    wm_part = wm_with_geo.map_batches(
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
        right_unique=True,  # one node row per node id
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
        num_partitions=cfg.join_num_partitions,
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
    rel_zones = partitioned_map(
        parts,
        ["rel_id"],
        _build_zones_partition,
        num_partitions=cfg.join_num_partitions,
        empty_schema=ZONE_SCHEMA,
    )
    if not cfg.place_node_zones:
        return rel_zones
    node_zones = nodes.map_batches(_node_zones, batch_format="pyarrow")
    return rel_zones.union(node_zones)
