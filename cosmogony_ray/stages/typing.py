"""Zone typing: country resolution + libpostal-style rules (actor pool).

The Ray-Data re-expression of ``type_zones`` (/root/reference/src/lib.rs:110-184):

1. ``attach_ancestors``: inclusion edges → per-zone ancestor list, ordered by
   (parent_area asc, parent_osm_id) — the engine's deterministic replacement
   for the reference's R-tree iteration order (SURVEY §7.4 "ordering/tie-break
   determinism"); most-specific ancestor first.
2. ``_typer_fn`` stateless-task stage: rules parsed once on the driver
   (ST1), broadcast with the country map (ST2) and cached per worker; per row:
   country = forced ``cfg.country_code`` (lib.rs:97-108) else
   max-admin-level country over ancestors∪self; then rules lookup.
   Outcomes mirror lib.rs:146-181:
   - ok            → zone_type := rule type, country_code := country
   - no_country    → untouched (stats: zone_without_country)
   - invalid_country → country_code set, type untouched
   - unknown_level → country_code set, type untouched (node zones keep their
     place-tag type and survive; untyped relations are filtered later)
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data as rd

from ..config import EngineConfig
from ..functions.joins import hash_join
from ..functions.shuffle import grouped_map
from ..model import ZONE_SCHEMA
from ..state.country import COUNTRY_CODE_TAG, CountryFinder
from ..state.rules import ZoneTyper

ANCESTORS_T = pa.list_(pa.string())


_ANC_SCHEMA = pa.schema([("osm_id", pa.string()), ("ancestors", pa.list_(pa.string()))])


def _collect_ancestors(key: tuple, group: pa.Table) -> pa.Table:
    g = group.sort_by([("parent_area", "ascending"), ("parent", "ascending")])
    return pa.table(
        {
            "osm_id": pa.array([key[0]], type=pa.string()),
            "ancestors": pa.array([g["parent"].to_pylist()], type=ANCESTORS_T),
        },
        schema=_ANC_SCHEMA,
    )


def attach_ancestors(zones: rd.Dataset, edges: rd.Dataset) -> rd.Dataset:
    anc = grouped_map(edges, ["child"], _collect_ancestors, empty_schema=_ANC_SCHEMA)
    return hash_join(
        zones,
        anc,
        "osm_id",
        how="left",
        left_schema=ZONE_SCHEMA,
        right_schema=pa.schema([("osm_id", pa.string()), ("ancestors", ANCESTORS_T)]),
    )


def attach_ancestors_broadcast(zones: rd.Dataset, anc_ref) -> rd.Dataset:
    """Append the ``ancestors`` list column from a broadcast (osm_id,
    ancestors) Arrow table via one vectorized ``pc.index_in`` + ``take`` per
    batch — zero-copy broadcast, no per-worker dict unpickling
    (zero-shuffle replacement for ``attach_ancestors`` when the table was
    computed driver-side via ``hierarchy.ancestors_from_edges_df``)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.broadcast import get_cached, lookup_str_indices

    def fn(t: pa.Table) -> pa.Table:
        tbl = get_cached(anc_ref)
        idx = lookup_str_indices(anc_ref, "osm_id", t["osm_id"].to_pylist())
        lists = pc.take(
            tbl["ancestors"].combine_chunks(),
            pa.array(np.where(idx >= 0, idx, None), type=pa.int64()),
        )
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        return t.append_column("ancestors", lists.cast(ANCESTORS_T))

    return zones.map_batches(fn, batch_format="pyarrow")


def build_country_finder(zones: rd.Dataset, typer: ZoneTyper) -> CountryFinder:
    """Scan the (small) zones table for ISO-tagged zones → broadcastable map.
    Streams batches to the driver; zones-side-fits-in-memory assumption
    (SURVEY §7.0)."""
    rows = []
    for b in zones.select_columns(["osm_id", "tags", "admin_level"]).iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        ids = b["osm_id"].to_pylist()
        tags = b["tags"].to_pylist()
        lvls = b["admin_level"].to_pylist()
        for i in range(len(ids)):
            t = dict(tags[i] or [])
            if COUNTRY_CODE_TAG in t:
                rows.append((ids[i], t, lvls[i]))
    return CountryFinder.from_zone_rows(rows, typer)


def _typer_fn(state_ref):
    """Stateless-task typing stage over broadcast (typer, finder, forced)
    state: rules are parsed ONCE on the driver, shipped via ``ray.put``, and
    deserialized once per worker (``get_cached``). Replaces the former actor
    pool, whose per-actor rules re-parse + autoscaling ramp dominated the
    stage at fixture scale."""
    from ..functions.broadcast import get_cached

    def fn(batch: pa.Table) -> pa.Table:
        typer, finder, forced = get_cached(state_ref)
        ids = batch["osm_id"].to_pylist()
        levels = batch["admin_level"].to_pylist()
        old_types = batch["zone_type"].to_pylist()
        ancestors = batch["ancestors"].to_pylist()
        new_types, new_cc, status = [], [], []
        for i in range(len(ids)):
            anc = ancestors[i] or []
            cc = forced or finder.find(ids[i], anc)
            if cc is None:
                new_types.append(old_types[i])
                new_cc.append(None)
                status.append("no_country")
                continue
            st, t = typer.get_zone_type(ids[i], levels[i], cc, anc)
            new_cc.append(cc)
            if st == "ok":
                new_types.append(t)
            else:
                new_types.append(old_types[i])  # keep place-tag type (lib.rs:165-180)
            status.append(st)
        batch = batch.drop_columns(["zone_type", "country_code"])
        batch = batch.append_column("zone_type", pa.array(new_types, type=pa.string()))
        batch = batch.append_column("country_code", pa.array(new_cc, type=pa.string()))
        batch = batch.append_column("type_status", pa.array(status, type=pa.string()))
        return batch

    return fn


def type_zones(
    zones_with_ancestors: rd.Dataset,
    cfg: EngineConfig,
    finder: CountryFinder,
    typer: ZoneTyper | None = None,
) -> rd.Dataset:
    if cfg.rules_dir is None:
        raise ValueError("cfg.rules_dir is required for typing")
    if cfg.country_code is None and finder.is_empty():
        raise ValueError(
            "no country_code provided and no country found; cannot build a cosmogony"
        )  # lib.rs:121-127
    if typer is None:
        typer = ZoneTyper.from_dir(cfg.rules_dir)
    forced = cfg.country_code.upper() if cfg.country_code else None
    state_ref = ray.put((typer, finder, forced))
    return zones_with_ancestors.map_batches(
        _typer_fn(state_ref),
        batch_format="pyarrow",
        batch_size=4096,
        num_cpus=1,
    )
