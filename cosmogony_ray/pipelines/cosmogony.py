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
    build_label_map,
    clean_untagged_zones,
    compute_labels,
    compute_names,
)
from ..stages.stats import compute_stats
from ..stages.typing import attach_ancestors, type_zones
from ..stages.zone_build import assemble_zones
from ..state.rules import ZoneTyper


@dataclass
class CosmogonyResult:
    zones: rd.Dataset          # final (post-cleanup) zones
    edges: rd.Dataset          # inclusion edge table (child, parent)
    stats: dict


def build_cosmogony(
    osm_dir: str, cfg: EngineConfig, with_stats: bool = True
) -> CosmogonyResult:
    relations, ways, nodes = read_osm_tables(osm_dir)
    return build_cosmogony_from_datasets(relations, ways, nodes, cfg, with_stats)


def build_cosmogony_from_datasets(
    relations: rd.Dataset,
    ways: rd.Dataset,
    nodes: rd.Dataset,
    cfg: EngineConfig,
    with_stats: bool = True,
) -> CosmogonyResult:
    import ray

    from ..stages.zone_state import collect_zone_state
    from ..state.country import CountryFinder

    # compact before materializing: the zones table is small — dozens of
    # shuffle-shaped blocks would make every driver scan and downstream
    # stage latency-bound
    zones = assemble_zones(relations, ways, nodes, cfg).materialize()

    state = collect_zone_state(zones)  # ONE driver pass for all broadcast maps
    geom_ref = ray.put(state.geoms)
    edges = find_inclusion_edges(zones, cfg, geom_ref).materialize()

    typer = ZoneTyper.from_dir(cfg.rules_dir)
    finder = CountryFinder.from_zone_rows(state.country_rows, typer)
    zones_anc = attach_ancestors(zones, edges)
    typed = type_zones(zones_anc, cfg, finder).materialize()

    meta = build_zone_meta(typed)
    parents = select_parents(edges, meta)
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
    label_map = build_label_map(named)
    labeled = compute_labels(named, label_map, cfg)

    # public schema only: working columns (ancestors, type_status) stay
    # internal — object-array columns also break Ray's pandas tensor cast in
    # downstream grouped aggregations
    final = (
        clean_untagged_zones(labeled)
        .select_columns(list(ZONE_SCHEMA.names))
        .materialize()
    )
    stats = compute_stats(final, typed) if with_stats else {}
    return CosmogonyResult(zones=final, edges=edges, stats=stats)
