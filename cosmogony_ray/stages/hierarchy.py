"""Smallest-enclosing-parent selection (A1).

Re-expresses ``build_hierarchy`` (/root/reference/src/hierarchy_builder.rs:107-131)
as a grouped argmin over the inclusion edge table:

admissible parent: parent.is_admin() ∧ (child not admin ∨
child.zone_type < parent.zone_type) (``can_be_child_of``,
/root/reference/src/zone_ext.rs:360-362); winner = min by
(zone_type rank, area, osm_id) — the reference's ``min_by_key(zone_type)``
is stable on inclusion-list order; our total tie-break (area asc = most
specific, then osm_id) matches the north_star's "admin_level then area"
refinement deterministically.

Zone type/admin metadata is broadcast (zone-side small); the argmin itself is
a ``groupby(child)`` shuffle (#3 in SURVEY §7.3).
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data as rd

from ..functions.joins import hash_join
from ..functions.shuffle import grouped_map
from ..model import ZONE_TYPE_RANK

_PARENT_SCHEMA = pa.schema([("osm_id", pa.string()), ("parent", pa.string())])


_META_SCHEMA = pa.schema(
    [("osm_id", pa.string()), ("rank", pa.float64()), ("area", pa.float64())]
)


def build_zone_meta(typed_zones: rd.Dataset) -> pa.Table:
    """(osm_id, zone_type rank as float64 w/ NaN for untyped, area) — Arrow
    table from the MATERIALIZED typed zones, executor-free and vectorized
    (rank via ``pc.index_in`` against the rank-ordered type names)."""
    from ..functions.arrowtools import materialized_table

    return zone_meta_from_table(materialized_table(typed_zones))


def zone_meta_from_table(tbl: pa.Table) -> pa.Table:
    """Table-input variant of ``build_zone_meta`` (driver fast path — the
    fused build already holds the typed columns on the driver)."""
    import numpy as np
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return _META_SCHEMA.empty_table()
    names_by_rank = sorted(ZONE_TYPE_RANK, key=ZONE_TYPE_RANK.get)
    ridx = pc.index_in(tbl["zone_type"], value_set=pa.array(names_by_rank))
    rank_np = np.where(
        pc.is_valid(ridx).to_numpy(zero_copy_only=False),
        pc.fill_null(ridx, 0).to_numpy(zero_copy_only=False).astype(np.float64),
        np.nan,
    )
    area = pc.fill_null(pc.cast(tbl["area"], pa.float64()), 0.0)
    return pa.table(
        {
            "osm_id": tbl["osm_id"],
            "rank": pa.array(rank_np, type=pa.float64()),
            "area": area,
        },
        schema=_META_SCHEMA,
    )


def meta_table_to_dict(meta: pa.Table) -> dict[str, tuple[int | None, float]]:
    """osm_id → (rank|None, area) — for the distributed grouped-map path."""
    import math

    ids = meta["osm_id"].to_pylist()
    ranks = meta["rank"].to_pylist()
    areas = meta["area"].to_pylist()
    return {
        ids[i]: (
            None if ranks[i] is None or math.isnan(ranks[i]) else int(ranks[i]),
            areas[i],
        )
        for i in range(len(ids))
    }


def _is_admin(rank: int | None) -> bool:
    # admin = typed and not non_administrative (zone.rs:137-139)
    return rank is not None and rank != ZONE_TYPE_RANK["non_administrative"]


def _select_parent_fn(meta_ref):
    from ..functions.broadcast import get_cached

    def fn(key: tuple, group: pa.Table) -> pa.Table | None:
        meta = get_cached(meta_ref)  # deserialized once per worker
        child = key[0]
        c_rank, _ = meta.get(child, (None, 0.0))
        child_admin = _is_admin(c_rank)
        best = None
        best_key = None
        for p in group["parent"].to_pylist():
            p_rank, p_area = meta.get(p, (None, 0.0))
            if not _is_admin(p_rank):
                continue
            if child_admin and not (c_rank < p_rank):
                continue
            k = (p_rank, p_area, p)
            if best_key is None or k < best_key:
                best, best_key = p, k
        if best is None:
            return None
        return pa.table(
            {"osm_id": pa.array([child]), "parent": pa.array([best])},
            schema=_PARENT_SCHEMA,
        )

    return fn


def select_parents(edges: rd.Dataset, meta: dict) -> rd.Dataset:
    """edges (child,parent,parent_area) → (osm_id, parent) winners."""
    meta_ref = ray.put(meta)
    return grouped_map(
        edges, ["child"], _select_parent_fn(meta_ref), empty_schema=_PARENT_SCHEMA
    )


_ANC_TABLE_SCHEMA = pa.schema(
    [("osm_id", pa.string()), ("ancestors", pa.list_(pa.string()))]
)


def ancestors_from_edges_df(edges_tbl: pa.Table) -> pa.Table:
    """Driver-side ancestor lists as an **Arrow table** (osm_id, ancestors):
    child → parents ordered by (parent_area asc, parent_osm_id) — identical
    ordering to ``typing._collect_ancestors`` but one vectorized Arrow sort
    instead of a grouped-map shuffle. Arrow because the table is broadcast:
    zero-copy reads per worker, where a Python dict-of-lists cost ~8 s of
    unpickling per worker at 87k zones. Valid under the
    zones-side-fits-on-driver assumption (SURVEY §7.0); the pipeline falls
    back to the distributed path above ``cfg.driver_hierarchy_max_edges``."""
    import numpy as np

    if edges_tbl.num_rows == 0:
        return _ANC_TABLE_SCHEMA.empty_table()
    d = edges_tbl.sort_by(
        [("child", "ascending"), ("parent_area", "ascending"), ("parent", "ascending")]
    )
    child = d["child"].to_numpy(zero_copy_only=False)
    change = np.empty(len(child), dtype=bool)
    change[0] = True
    change[1:] = child[1:] != child[:-1]
    starts = np.nonzero(change)[0]
    offsets = pa.array(np.append(starts, len(child)).astype(np.int64))
    parents = d["parent"].combine_chunks()
    anc = pa.LargeListArray.from_arrays(offsets, parents).cast(pa.list_(pa.string()))
    return pa.table(
        {"osm_id": pa.array(child[starts], type=pa.string()), "ancestors": anc},
        schema=_ANC_TABLE_SCHEMA,
    )


def select_parents_df(edges_tbl: pa.Table, meta: pa.Table) -> pa.Table:
    """Driver-side smallest-enclosing-parent as an Arrow (osm_id, parent)
    table: same admissibility + argmin key (p_rank, p_area, parent_osm_id)
    as ``_select_parent_fn``, fully vectorized — id→meta lookups via
    ``pc.index_in`` (a pandas ``.map(dict)`` here is a Python loop over the
    edge table)."""
    import numpy as np
    import pyarrow.compute as pc

    if edges_tbl.num_rows == 0:
        return _PARENT_SCHEMA.empty_table()
    ids = meta["osm_id"].combine_chunks()
    ranks = meta["rank"].to_numpy(zero_copy_only=False)
    areas = meta["area"].to_numpy(zero_copy_only=False)

    def look(col, arr, default):
        idx = pc.fill_null(
            pc.index_in(edges_tbl[col], value_set=ids), pa.scalar(-1, pa.int32())
        ).to_numpy(zero_copy_only=False)
        out = np.where(idx >= 0, arr[np.maximum(idx, 0)], default)
        return out

    p_rank = look("parent", ranks, np.nan)
    c_rank = look("child", ranks, np.nan)
    p_area = look("parent", areas, 0.0)
    nonadmin = float(ZONE_TYPE_RANK["non_administrative"])
    p_admin = ~np.isnan(p_rank) & (p_rank != nonadmin)
    c_admin = ~np.isnan(c_rank) & (c_rank != nonadmin)
    admissible = p_admin & (~c_admin | (c_rank < p_rank))
    mask = pa.array(admissible)
    child = edges_tbl["child"].combine_chunks().filter(mask)
    parent = edges_tbl["parent"].combine_chunks().filter(mask)
    d = pa.table(
        {
            "child": child,
            "parent": parent,
            "p_rank": pa.array(p_rank[admissible], type=pa.float64()),
            "p_area": pa.array(p_area[admissible], type=pa.float64()),
        }
    ).sort_by(
        [
            ("child", "ascending"),
            ("p_rank", "ascending"),
            ("p_area", "ascending"),
            ("parent", "ascending"),
        ]
    )
    # first row per child after the total-order sort
    carr = d["child"].to_numpy(zero_copy_only=False)
    keep = np.empty(len(carr), dtype=bool)
    if len(carr):
        keep[0] = True
        keep[1:] = carr[1:] != carr[:-1]
    sel = pa.array(keep)
    return pa.table(
        {
            "osm_id": d["child"].filter(sel),
            "parent": d["parent"].filter(sel),
        },
        schema=_PARENT_SCHEMA,
    )


def attach_parents_broadcast(zones: rd.Dataset, parents_ref) -> rd.Dataset:
    """Set the ``parent`` column from a broadcast (osm_id, parent) Arrow
    table via one vectorized ``pc.index_in`` per batch (the zero-shuffle
    replacement for ``attach_parents`` when the map was computed
    driver-side)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.broadcast import get_cached

    def fn(t: pa.Table) -> pa.Table:
        tbl = get_cached(parents_ref)
        idx = (
            pc.index_in(t["osm_id"], value_set=tbl["osm_id"].combine_chunks())
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        vals = pc.take(
            tbl["parent"].combine_chunks(),
            pa.array(np.where(idx >= 0, idx, None), type=pa.int64()),
        )
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        return t.set_column(
            t.column_names.index("parent"), "parent", vals.cast(pa.string())
        )

    return zones.map_batches(fn, batch_format="pyarrow")


def attach_parents(typed_zones: rd.Dataset, parents: rd.Dataset) -> rd.Dataset:
    zschema = typed_zones.schema()
    left = typed_zones.drop_columns(["parent"])
    lschema = pa.schema(
        [(n, t) for n, t in zip(zschema.names, zschema.types) if n != "parent"]
    )
    return hash_join(
        left,
        parents,
        "osm_id",
        how="left",
        right_unique=True,  # one best parent per child (select_parents)
        left_schema=lschema,
        right_schema=_PARENT_SCHEMA,
    )
