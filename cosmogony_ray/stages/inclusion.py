"""Inclusion spatial self-join: which zones cover which.

Ray-Data-native replacement of the reference's in-process R-tree join
(`find_inclusions`, /root/reference/src/hierarchy_builder.rs:34-95): instead
of tree probes, a hierarchical-grid **cell join** (north_rule):

1. every boundary zone emits BUILD rows — its bbox covering cells at the
   finest ladder resolution that stays under ``max_cells_per_zone``
   (mega-zone coarsening: a country never explodes into millions of rows);
2. every boundary zone also emits PROBE rows — its covering cells at its own
   resolution plus their ancestors at every coarser ladder resolution
   (a parent's bbox ⊇ child's bbox ⇒ parent's chosen resolution is coarser
   or equal, so probe-side ancestor expansion is sufficient to meet it);
3. cells at the coarsest resolutions are **salted**: build rows are
   replicated across ``num_salts`` sub-keys and probe rows pick one by child
   hash — a country-level cell would otherwise collect every probe in the
   country into one group (the mega-zone hot key, SURVEY.md §7.4);
4. ``groupby(cell, salt)`` → per-cell candidate pairs (bbox-containment
   prefiltered, self excluded);
5. exact-dedup shuffle on (child, parent);
6. exact boundary-inclusive ``covers`` test (GEOS semantics,
   /root/reference/src/zone_ext.rs:236-277) in an actor-pool ``map_batches``
   stage holding a broadcast ``osm_id → WKB`` map and a per-actor prepared
   geometry cache.

Scale assumption (documented per SURVEY §7.4): the zones side fits in a
broadcast object (~10^6 zones); the docs side never flows through here.
Errors in geometry conversion yield covers=False, matching the reference
(zone_ext.rs:247-273).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..config import EngineConfig
from ..functions.shuffle import distinct_rows, grouped_map
from ..geom.predicates import PreparedPolygon, covers
from ..geom.wkb import multipolygon_from_wkb
from ..functions.cluster import default_pool

_CAND_SCHEMA = pa.schema(
    [("child", pa.string()), ("parent", pa.string()), ("parent_area", pa.float64())]
)


def _covering_rows_fn(cfg: EngineConfig):
    cells = cfg.cells()
    salt_res_max = cfg.min_res + 1
    n_salts = cfg.num_salts

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["osm_id"].to_pylist()
        minx = batch["minx"].to_numpy(zero_copy_only=False)
        miny = batch["miny"].to_numpy(zero_copy_only=False)
        maxx = batch["maxx"].to_numpy(zero_copy_only=False)
        maxy = batch["maxy"].to_numpy(zero_copy_only=False)
        areas = batch["area"].to_numpy(zero_copy_only=False)
        out_cell, out_salt, out_id, out_role, out_area = [], [], [], [], []
        out_bbox = [[], [], [], []]
        for i, osm_id in enumerate(ids):
            if not np.isfinite(minx[i]):
                continue
            bbox = (minx[i], miny[i], maxx[i], maxy[i])
            res = cells.cover_res_for_bbox(bbox)
            own = cells.cover_bbox(bbox, res)
            # build rows at own resolution
            probe_cells = {int(c) for c in own}
            build_cells = probe_cells
            # probe rows: ancestors at every coarser ladder resolution
            for r in cells.ladder:
                if r >= res:
                    break
                probe_cells = probe_cells | {
                    int(c) for c in cells.cover_bbox(bbox, r)
                }
            salt_of_child = hash(osm_id) % n_salts
            for role, cellset in ((0, build_cells), (1, probe_cells)):
                for c in cellset:
                    r = cells.res_of(c)
                    if r <= salt_res_max:
                        salts = range(n_salts) if role == 0 else (salt_of_child,)
                    else:
                        salts = (0,)
                    for s in salts:
                        out_cell.append(c)
                        out_salt.append(s)
                        out_id.append(osm_id)
                        out_role.append(role)
                        out_area.append(float(areas[i]))
                        for k in range(4):
                            out_bbox[k].append(bbox[k])
        return pa.table(
            {
                "cell": pa.array(out_cell, type=pa.int64()),
                "salt": pa.array(out_salt, type=pa.int8()),
                "osm_id": pa.array(out_id, type=pa.string()),
                "role": pa.array(out_role, type=pa.int8()),
                "area": pa.array(out_area, type=pa.float64()),
                "minx": pa.array(out_bbox[0], type=pa.float64()),
                "miny": pa.array(out_bbox[1], type=pa.float64()),
                "maxx": pa.array(out_bbox[2], type=pa.float64()),
                "maxy": pa.array(out_bbox[3], type=pa.float64()),
            }
        )

    return fn


def _emit_candidates(key: tuple, group: pa.Table) -> pa.Table:
    role = group["role"].to_numpy(zero_copy_only=False)
    bmask = role == 0
    pmask = role == 1
    if not bmask.any() or not pmask.any():
        return _CAND_SCHEMA.empty_table()
    ids = np.asarray(group["osm_id"].to_pylist(), dtype=object)
    minx = group["minx"].to_numpy(zero_copy_only=False)
    miny = group["miny"].to_numpy(zero_copy_only=False)
    maxx = group["maxx"].to_numpy(zero_copy_only=False)
    maxy = group["maxy"].to_numpy(zero_copy_only=False)
    bi = np.nonzero(bmask)[0]
    pi = np.nonzero(pmask)[0]
    # parent bbox must contain child bbox (covers ⇒ bbox-contains prefilter)
    contains = (
        (minx[bi][None, :] <= minx[pi][:, None])
        & (miny[bi][None, :] <= miny[pi][:, None])
        & (maxx[bi][None, :] >= maxx[pi][:, None])
        & (maxy[bi][None, :] >= maxy[pi][:, None])
    )
    ci, bj = np.nonzero(contains)
    child = ids[pi[ci]]
    parent = ids[bi[bj]]
    parea = group["area"].to_numpy(zero_copy_only=False)[bi[bj]]
    keep = child != parent
    return pa.table(
        {
            "child": pa.array(child[keep].tolist(), type=pa.string()),
            "parent": pa.array(parent[keep].tolist(), type=pa.string()),
            "parent_area": pa.array(parea[keep], type=pa.float64()),
        },
        schema=_CAND_SCHEMA,
    )




class CoversTester:
    """Actor-pool exact-covers stage: broadcast osm_id→WKB map, per-actor
    prepared-geometry cache (the shapely-prepared analog of the reference's
    GEOS usage; state loaded once per actor per SURVEY §7.2)."""

    def __init__(self, geom_ref):
        self._geoms: dict[str, bytes] = ray.get(geom_ref)
        self._prepared: dict[str, PreparedPolygon] = {}

    def _prep(self, osm_id: str) -> PreparedPolygon | None:
        p = self._prepared.get(osm_id)
        if p is None:
            wkb = self._geoms.get(osm_id)
            if wkb is None:
                return None
            try:
                p = PreparedPolygon(multipolygon_from_wkb(wkb))
            except Exception:
                return None  # invalid geometry → covers false (zone_ext.rs:247-273)
            self._prepared[osm_id] = p
        return p

    def __call__(self, batch: pa.Table) -> pa.Table:
        childs = batch["child"].to_pylist()
        parents = batch["parent"].to_pylist()
        keep = np.zeros(len(childs), dtype=bool)
        for i, (c, p) in enumerate(zip(childs, parents)):
            pp = self._prep(p)
            cp = self._prep(c)
            if pp is None or cp is None:
                continue
            try:
                keep[i] = covers(pp, cp)
            except Exception:
                keep[i] = False
        return batch.filter(pa.array(keep))


def broadcast_geometries(zones: rd.Dataset):
    """Collect osm_id→boundary WKB into one broadcast object (``ray.put``
    once, read by every covers task — never re-shipped per batch)."""
    geoms: dict[str, bytes] = {}
    for b in zones.select_columns(["osm_id", "boundary_wkb"]).iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        ids = b["osm_id"].to_pylist()
        wkbs = b["boundary_wkb"].to_pylist()
        for i, w in zip(ids, wkbs):
            if w is not None:
                geoms[i] = w
    return ray.put(geoms)


def find_inclusion_edges(
    zones: rd.Dataset, cfg: EngineConfig | None = None, geom_ref=None
) -> rd.Dataset:
    """zones Dataset → inclusion edge Dataset (child, parent): parent's
    boundary covers child (/root/reference/src/hierarchy_builder.rs:76-95)."""
    cfg = cfg or EngineConfig()
    boundary_zones = zones.map_batches(
        lambda t: t.filter(pa.compute.is_valid(t["boundary_wkb"])),
        batch_format="pyarrow",
    )
    lite = boundary_zones.select_columns(
        ["osm_id", "minx", "miny", "maxx", "maxy", "area"]
    )
    cover = lite.map_batches(
        _covering_rows_fn(cfg), batch_format="pyarrow", batch_size=cfg.zone_batch_size
    )
    cands = grouped_map(
        cover, ["cell", "salt"], _emit_candidates, empty_schema=_CAND_SCHEMA
    )
    dedup = distinct_rows(cands, ["child", "parent"])
    if geom_ref is None:
        geom_ref = broadcast_geometries(boundary_zones)
    edges = dedup.map_batches(
        CoversTester,
        fn_constructor_kwargs={"geom_ref": geom_ref},
        batch_format="pyarrow",
        batch_size=cfg.zone_batch_size,
        concurrency=default_pool(cap=16),
        num_cpus=1,
    )
    return edges
