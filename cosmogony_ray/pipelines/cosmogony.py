"""The flagship pipeline: OSM-shaped tables → fully-resolved zones Dataset.

Mirrors ``build_cosmogony`` / ``create_ontology``
(/root/reference/src/lib.rs:203-277) as a chain of Dataset → Dataset stages:

  assemble (scan+construct) → inclusion cell join → typing (rules + country)
  → hierarchy (smallest enclosing parent) → names → labels → cleanup → stats

Materialization policy: the zones table (small side, 10²–10⁶ rows) is
materialized once after assembly and once after typing because four stages
fan out from each; the docs side (10¹² design point) never flows through this
module. Broadcast maps (geometry WKB, country finder, zone meta, label map)
are ``ray.put`` once per build (SURVEY §7.0/#7.2).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import ray.data as rd

from ..config import EngineConfig
from ..model import ZONE_SCHEMA
from ..sources.osm import read_osm_tables
from ..stages.hierarchy import attach_parents, build_zone_meta, select_parents
from ..stages.inclusion import find_inclusion_edges
from ..stages.labels import (
    attach_labels_broadcast,
    build_label_map,
    clean_untagged_zones,
    compute_labels_table,
    compute_names,
)
from ..stages.stats import compute_stats
from ..stages.typing import attach_ancestors, type_zones
from ..stages.zone_build import assemble_zones
from ..state.rules import ZoneTyper


def _finalize_fast_fn(attach_ref):
    """ONE fused finalize map for the driver fast path: per batch, attach
    the driver-computed (zone_type, country_code, parent, label,
    international_labels) columns via a single broadcast ``index_in`` +
    five takes, run the names merge (post-typing city rule), drop untyped
    zones (P11, lib.rs:196-201) and project the public schema."""
    import numpy as np
    import pyarrow.compute as pc

    from ..stages.labels import compute_names_batch

    def fn(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import get_cached

        tbl = get_cached(attach_ref)
        idx_np = (
            pc.index_in(batch["zone_uid"], value_set=tbl["zone_uid"].combine_chunks())
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        idx = pa.array(np.where(idx_np >= 0, idx_np, None), type=pa.int64())
        for col in ("zone_type", "country_code", "parent"):
            vals = pc.take(tbl[col].combine_chunks(), idx)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            batch = batch.set_column(
                batch.column_names.index(col), col, vals.cast(pa.string())
            )
        batch = compute_names_batch(batch)
        for col in ("label", "international_labels"):
            vals = pc.take(tbl[col].combine_chunks(), idx)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            if col == "label":
                vals = pc.fill_null(vals, "").cast(pa.string())
            else:
                vals = pc.fill_null(vals, []).cast(batch.schema.field(col).type)
            batch = batch.set_column(batch.column_names.index(col), col, vals)
        batch = batch.filter(pc.is_valid(batch["zone_type"]))
        return batch.select(list(ZONE_SCHEMA.names))

    return fn


@dataclass
class CosmogonyResult:
    zones: rd.Dataset          # final (post-cleanup) zones
    edges: rd.Dataset          # inclusion edge table (child, parent)
    stats: dict
    # broadcast GeomPack ObjectRef (parse-once edge arrays, built during the
    # inclusion phase) — downstream consumers (geotag index) reuse it so a
    # build parses each boundary WKB exactly once (VERDICT r3 task 2)
    geom_pack_ref: object | None = None


def _build_ctx(cfg: EngineConfig):
    """Context manager: small target block size for the whole build. MUST
    wrap dataset CREATION, not just execution — a Ray Dataset captures a
    copy of DataContext when created, so overriding after ``read_parquet``
    silently does nothing (measured: 128 MiB blocks → 1-2 map tasks per
    stage regardless of cluster size)."""
    from contextlib import contextmanager

    from ray.data import DataContext

    @contextmanager
    def _cm():
        ctx = DataContext.get_current()
        prev = ctx.target_max_block_size
        ctx.target_max_block_size = cfg.build_block_size_bytes
        try:
            yield
        finally:
            ctx.target_max_block_size = prev

    return _cm()


def build_cosmogony(
    osm_dir: str, cfg: EngineConfig, with_stats: bool = True
) -> CosmogonyResult:
    with _build_ctx(cfg):
        relations, ways, nodes = read_osm_tables(osm_dir)
        return _build_inner(relations, ways, nodes, cfg, with_stats)


def build_cosmogony_from_datasets(
    relations: rd.Dataset,
    ways: rd.Dataset,
    nodes: rd.Dataset,
    cfg: EngineConfig,
    with_stats: bool = True,
) -> CosmogonyResult:
    # NOTE: input datasets were created by the caller and carry the caller's
    # captured DataContext; the block-size override only applies to datasets
    # created inside the build. Callers who care about build parallelism
    # should create inputs under ``_build_ctx`` (as ``build_cosmogony`` does).
    with _build_ctx(cfg):
        return _build_inner(relations, ways, nodes, cfg, with_stats)


def _build_inner(
    relations: rd.Dataset,
    ways: rd.Dataset,
    nodes: rd.Dataset,
    cfg: EngineConfig,
    with_stats: bool,
) -> CosmogonyResult:
    import os
    import time

    import ray

    from ..stages.inclusion import build_geom_pack
    from ..stages.zone_state import collect_country_rows
    from ..state.country import CountryFinder

    _dbg = bool(os.environ.get("COSMOGONY_RAY_TIMINGS"))
    _t = [time.time()]

    def _tick(name):
        if _dbg:
            now = time.time()
            print(f"[build] {name}: {now - _t[0]:.2f}s", flush=True)
            _t[0] = now

    zones = assemble_zones(relations, ways, nodes, cfg).materialize()
    _tick("assemble")

    # thin driver pull: only (osm_id, ISO tag, admin_level) — never WKB/tags
    country_rows = collect_country_rows(zones)
    _tick("zone_state")
    # geometry broadcast is the edge-array GeomPack, built distributed ONCE
    # per build and shared by the inclusion join AND the geotag zone index
    # (exposed on the result as geom_pack_ref)
    pack_ref = build_geom_pack(zones, cfg)
    edges = find_inclusion_edges(zones, cfg, pack_ref=pack_ref).materialize()
    _tick("inclusion")

    typer = ZoneTyper.from_dir(cfg.rules_dir)
    finder = CountryFinder.from_zone_rows(country_rows, typer)

    from ..functions.arrowtools import materialized_count

    n_edges = materialized_count(edges)
    if n_edges <= cfg.driver_hierarchy_max_edges:
        # zone-scale fast path: ancestor lists and parent selection computed
        # once on the driver from the small edge table and broadcast —
        # removes four shuffle barriers (ancestor grouped-map + join, parent
        # grouped-map + join) that dominated build latency at fixture scale
        from ..stages.hierarchy import (
            ancestors_from_edges_df,
            attach_parents_broadcast,
            select_parents_df,
        )
        from ..stages.typing import attach_ancestors_broadcast

        from ..functions.arrowtools import materialized_table

        # explicit schema: a world with zero inclusion edges (e.g. the tiny
        # Gatineau fixture) materializes to an empty dataset whose schema()
        # is None, and the ancestor/parent tables must still be well-typed
        edges_schema = pa.schema(
            [("child", pa.string()), ("parent", pa.string()), ("parent_area", pa.float64())]
        )
        edges_tbl = materialized_table(edges, schema=edges_schema).select(
            ["child", "parent", "parent_area"]
        )
        anc_tbl = ancestors_from_edges_df(edges_tbl)
        _tick("edges_collect")
        if cfg.disable_voronoi:
            # FUSED fast path: typing, parent selection and labels all run
            # driver-side on the already-pulled zones table (vectorized
            # kernels, ~seconds at 350k zones), then ONE distributed map
            # attaches everything and finalizes. Removes two full-table
            # materialize copies and three executor runs versus the staged
            # path (typed/named re-materialized the whole zone table,
            # boundary WKB included, per stage).
            import numpy as np
            import pyarrow.compute as pc

            from ..stages.hierarchy import zone_meta_from_table
            from ..stages.labels import driver_label_table
            from ..stages.typing import type_zones_table
            from ..stages.zone_state import collect_label_state

            # fused fast path: pull the label/typing columns (thin — no
            # boundary WKB ever reaches the driver on any path)
            ztbl = collect_label_state(zones)
            aidx = (
                pc.index_in(
                    ztbl["osm_id"], value_set=anc_tbl["osm_id"].combine_chunks()
                )
                .fill_null(-1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            anc_lists = pc.take(
                anc_tbl["ancestors"].combine_chunks(),
                pa.array(np.where(aidx >= 0, aidx, None), type=pa.int64()),
            )
            if isinstance(anc_lists, pa.ChunkedArray):
                anc_lists = anc_lists.combine_chunks()
            zlite = pa.table(
                {
                    "osm_id": ztbl["osm_id"],
                    "admin_level": ztbl["admin_level"],
                    "zone_type": ztbl["zone_type"],
                    "ancestors": anc_lists,
                }
            )
            forced = cfg.country_code.upper() if cfg.country_code else None
            if cfg.country_code is None and finder.is_empty():
                raise ValueError(
                    "no country_code provided and no country found; cannot "
                    "build a cosmogony"
                )  # lib.rs:121-127
            typed_tbl = type_zones_table(zlite, typer, finder, forced)
            _tick("typing")
            meta = zone_meta_from_table(
                pa.table(
                    {
                        "osm_id": ztbl["osm_id"],
                        "zone_type": typed_tbl["zone_type"],
                        "area": ztbl["area"],
                    }
                )
            )
            parents_tbl = select_parents_df(edges_tbl, meta)
            _tick("parents")
            labels_tbl = driver_label_table(
                ztbl, typed_tbl, parents_tbl, tuple(cfg.filter_langs)
            )
            _tick("label_map")
            pidx = (
                pc.index_in(
                    ztbl["osm_id"], value_set=parents_tbl["osm_id"].combine_chunks()
                )
                .fill_null(-1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            parent_col = pc.take(
                parents_tbl["parent"].combine_chunks(),
                pa.array(np.where(pidx >= 0, pidx, None), type=pa.int64()),
            )
            if isinstance(parent_col, pa.ChunkedArray):
                parent_col = parent_col.combine_chunks()
            attach = pa.table(
                {
                    "zone_uid": ztbl["zone_uid"],
                    "zone_type": typed_tbl["zone_type"],
                    "country_code": typed_tbl["country_code"],
                    "parent": parent_col.cast(pa.string()),
                    "label": labels_tbl["label"],
                    "international_labels": labels_tbl["international_labels"],
                }
            )
            final = zones.map_batches(
                _finalize_fast_fn(ray.put(attach)), batch_format="pyarrow"
            ).materialize()
            _tick("final")
            if with_stats:
                typed_lite = rd.from_arrow(
                    pa.table(
                        {
                            "type_status": typed_tbl["type_status"],
                            "country_code": typed_tbl["country_code"],
                            "admin_level": ztbl["admin_level"],
                        }
                    )
                )
                stats = compute_stats(final, typed_lite)
            else:
                stats = {}
            _tick("stats")
            return CosmogonyResult(
                zones=final, edges=edges, stats=stats, geom_pack_ref=pack_ref
            )
        anc_ref = ray.put(anc_tbl)
        zones_anc = attach_ancestors_broadcast(zones, anc_ref)
        typed = type_zones(zones_anc, cfg, finder, typer=typer).materialize()
        _tick("typing")
        meta = build_zone_meta(typed)
        parents_ref = ray.put(select_parents_df(edges_tbl, meta))
        with_parents = attach_parents_broadcast(typed, parents_ref)
        _tick("parents")
    else:
        # Distributed tail: ancestors join → typing → parents join over the
        # full zone table. A "thin tail" variant (all computation on thin
        # keyed columns + ONE final full-table attach join) was built and
        # MEASURED SLOWER in round 5 — interleaved A/B at d10/32 CPUs:
        # thin 103/119/192 s vs this path's 81/83/92 s. At this world size
        # hash-join cost is ROW-dominated (per-partition merge machinery +
        # the sort-based exchange), not payload-dominated, so trading two
        # full-table joins for two thin joins PLUS a third full-table join
        # loses. Revisit only if the join kernel itself gets cheaper.
        from ..stages.hierarchy import meta_table_to_dict

        zones_anc = attach_ancestors(zones, edges)
        typed = type_zones(zones_anc, cfg, finder, typer=typer).materialize()
        _tick("typing(dist)")
        meta = build_zone_meta(typed)
        parents = select_parents(edges, meta_table_to_dict(meta))
        _tick("parents(dist)")
        with_parents = attach_parents(typed, parents)

    if not cfg.disable_voronoi:
        from ..stages.voronoi_zones import compute_additional_zones

        with_parents = with_parents.materialize()
        generated = compute_additional_zones(with_parents, nodes, cfg)
        # pad generated rows to the with_parents schema (ancestors/type_status)
        wschema = with_parents.schema()
        extra = [
            (n, t)
            for n, t in zip(wschema.names, wschema.types)
            if n not in ZONE_SCHEMA.names
        ]

        def pad(t: pa.Table) -> pa.Table:
            for n, typ in extra:
                t = t.append_column(n, pa.nulls(t.num_rows, type=typ))
            return t.select(wschema.names)

        with_parents = with_parents.union(
            generated.map_batches(pad, batch_format="pyarrow")
        )

    named = compute_names(with_parents).materialize()
    _tick("names")
    # labels computed once on the driver (zone-side small) and attached via
    # a broadcast index_in map: the per-worker chain-map build of the
    # distributed compute_labels made the stage slower the MORE workers the
    # cluster had (0.5 s transform x n_workers of tiny tasks)
    label_map = build_label_map(named)
    labels_tbl = compute_labels_table(label_map, tuple(cfg.filter_langs))
    labeled = attach_labels_broadcast(named, ray.put(labels_tbl))
    _tick("label_map")

    # public schema only: working columns (ancestors, type_status) stay
    # internal — object-array columns also break Ray's pandas tensor cast in
    # downstream grouped aggregations
    final = (
        clean_untagged_zones(labeled)
        .select_columns(list(ZONE_SCHEMA.names))
        .materialize()
    )
    _tick("final")
    stats = compute_stats(final, typed) if with_stats else {}
    _tick("stats")
    return CosmogonyResult(
        zones=final, edges=edges, stats=stats, geom_pack_ref=pack_ref
    )
