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


def build_zone_meta(typed_zones: rd.Dataset) -> dict[str, tuple[int | None, float]]:
    """osm_id → (zone_type_rank or None, area). Broadcast-sized."""
    meta = {}
    for b in typed_zones.select_columns(["osm_id", "zone_type", "area"]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        ids = b["osm_id"].to_pylist()
        types = b["zone_type"].to_pylist()
        areas = b["area"].to_pylist()
        for i in range(len(ids)):
            rank = ZONE_TYPE_RANK.get(types[i]) if types[i] is not None else None
            meta[ids[i]] = (rank, areas[i] if areas[i] is not None else 0.0)
    return meta


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
        left_schema=lschema,
        right_schema=_PARENT_SCHEMA,
    )
