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
   prefiltered, self excluded), emitted ONLY in the canonical cell — the
   cell containing the child's bbox min corner at the parent's build
   resolution. A pair shares that cell exactly once (parent's bbox contains
   the child's min corner; the child probes every resolution ≤ its own), so
   pairs are globally unique BY CONSTRUCTION and no dedup shuffle is needed;
5. exact boundary-inclusive ``covers`` test (GEOS semantics,
   /root/reference/src/zone_ext.rs:236-277) in an actor-pool ``map_batches``
   stage holding a broadcast ``osm_id → WKB`` map and a per-actor prepared
   geometry cache.

Scale assumption (documented per SURVEY §7.4): the zones side fits in a
broadcast object (~10^6 zones); the docs side never flows through here.
Errors in geometry conversion yield covers=False, matching the reference
(zone_ext.rs:247-273).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..config import EngineConfig
from ..functions.shuffle import grouped_map
from ..geom.predicates import PreparedPolygon, covers_many
from ..geom.wkb import multipolygon_from_wkb

_CAND_SCHEMA = pa.schema(
    [("child", pa.string()), ("parent", pa.string()), ("parent_area", pa.float64())]
)


def _covering_rows_fn(cfg: EngineConfig):
    """Vectorized covering-row emitter: for a batch of zones, emit build
    rows at each zone's own cover resolution and probe rows at every ladder
    resolution ≤ it, with coarse-cell salting — all via numpy repeat/arange
    (the per-zone Python-loop version cost ~1 ms/zone and dominated the
    inclusion phase)."""
    cells = cfg.cells()
    salt_res_max = cfg.min_res + 1
    n_salts = cfg.num_salts
    ladder = cells.ladder
    cap = cells.max_cells_per_zone

    def fn(batch: pa.Table) -> pa.Table:
        minx = batch["minx"].to_numpy(zero_copy_only=False)
        miny = batch["miny"].to_numpy(zero_copy_only=False)
        maxx = batch["maxx"].to_numpy(zero_copy_only=False)
        maxy = batch["maxy"].to_numpy(zero_copy_only=False)
        areas = batch["area"].to_numpy(zero_copy_only=False)
        valid = np.isfinite(minx)
        ids_arr = batch["osm_id"].combine_chunks() if isinstance(
            batch["osm_id"], pa.ChunkedArray
        ) else batch["osm_id"]
        # stable per-zone salt (crc32, not the process-randomized str hash)
        salts_of = np.array(
            [zlib.crc32(s.encode()) % n_salts for s in ids_arr.to_pylist()],
            dtype=np.int8,
        )
        # per zone per ladder res: grid index ranges + cell counts
        nz = len(minx)
        counts = np.empty((len(ladder), nz), dtype=np.int64)
        ix0s = np.empty((len(ladder), nz), dtype=np.int64)
        iy0s = np.empty((len(ladder), nz), dtype=np.int64)
        nxs = np.empty((len(ladder), nz), dtype=np.int64)
        for li, r in enumerate(ladder):
            ix0, iy0 = cells._grid_index(minx, miny, r)
            ix1, iy1 = cells._grid_index(maxx, maxy, r)
            ix0s[li], iy0s[li] = ix0, iy0
            nxs[li] = ix1 - ix0 + 1
            counts[li] = nxs[li] * (iy1 - iy0 + 1)
        # own resolution = finest ladder index with count ≤ cap (cummax trick:
        # once a resolution exceeds the cap all finer ones do too on a grid)
        ok = counts <= cap
        own_li = np.maximum(ok.cumprod(axis=0).sum(axis=0) - 1, 0)

        out = {k: [] for k in ("cell", "salt", "osm_id_idx", "role")}
        for li, r in enumerate(ladder):
            # zones emitting at this resolution: probes where own_li >= li,
            # builds where own_li == li
            probe_sel = np.nonzero(valid & (own_li >= li))[0]
            if probe_sel.size == 0:
                continue
            cnt = counts[li][probe_sel]
            zrep = np.repeat(probe_sel, cnt)
            total = int(cnt.sum())
            within = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(cnt) - cnt, cnt
            )
            nx = nxs[li][zrep]
            ix = ix0s[li][zrep] + within % nx
            iy = iy0s[li][zrep] + within // nx
            cell = cells._encode(r, ix, iy)
            is_build = (own_li[zrep] == li).astype(np.int8)
            if r <= salt_res_max:
                # probe rows: one salt (the zone's); build rows: replicated
                # across every salt (emitted below)
                out["cell"].append(cell)
                out["salt"].append(salts_of[zrep])
                out["osm_id_idx"].append(zrep)
                out["role"].append(np.ones(cell.size, dtype=np.int8))
                bmask = is_build.astype(bool)
                if bmask.any():
                    bcell = np.tile(cell[bmask], n_salts)
                    bidx = np.tile(zrep[bmask], n_salts)
                    bsalt = np.repeat(
                        np.arange(n_salts, dtype=np.int8), int(bmask.sum())
                    )
                    out["cell"].append(bcell)
                    out["salt"].append(bsalt)
                    out["osm_id_idx"].append(bidx)
                    out["role"].append(np.zeros(bcell.size, dtype=np.int8))
            else:
                zero = np.zeros(cell.size, dtype=np.int8)
                out["cell"].append(cell)
                out["salt"].append(zero)
                out["osm_id_idx"].append(zrep)
                out["role"].append(np.ones(cell.size, dtype=np.int8))
                bmask = is_build.astype(bool)
                if bmask.any():
                    out["cell"].append(cell[bmask])
                    out["salt"].append(zero[: int(bmask.sum())])
                    out["osm_id_idx"].append(zrep[bmask])
                    out["role"].append(np.zeros(int(bmask.sum()), dtype=np.int8))
        if not out["cell"]:
            idx = np.array([], dtype=np.int64)
            cell = np.array([], dtype=np.int64)
            salt = np.array([], dtype=np.int8)
            role = np.array([], dtype=np.int8)
        else:
            cell = np.concatenate(out["cell"])
            salt = np.concatenate(out["salt"])
            idx = np.concatenate(out["osm_id_idx"])
            role = np.concatenate(out["role"])
        take = pa.array(idx, type=pa.int64())
        return pa.table(
            {
                "cell": pa.array(cell, type=pa.int64()),
                "salt": pa.array(salt, type=pa.int8()),
                "osm_id": ids_arr.take(take),
                "role": pa.array(role, type=pa.int8()),
                "area": pa.array(areas[idx], type=pa.float64()),
                "minx": pa.array(minx[idx], type=pa.float64()),
                "miny": pa.array(miny[idx], type=pa.float64()),
                "maxx": pa.array(maxx[idx], type=pa.float64()),
                "maxy": pa.array(maxy[idx], type=pa.float64()),
            }
        )

    return fn


def _emit_candidates_fn(cells):
    """Per-(cell,salt)-group candidate emitter with canonical-cell dedup.

    A (child, parent) pair can only match in groups at the parent's build
    resolution r_p (build rows exist only there). Among those, exactly one
    cell contains the child's bbox min corner: the parent's bbox covering
    includes it (parent bbox ⊇ child bbox after the prefilter) and the
    child's probe covering at r_p includes it (probes cover the child bbox
    at every ladder resolution ≤ its own, and r_p ≤ r_child since the
    child's bbox is smaller). Emitting only in that cell yields each pair
    exactly once globally — no dedup shuffle downstream."""

    def fn(key: tuple, group: pa.Table) -> pa.Table:
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
        cell = int(key[0])
        canon = cells.cell_of(minx[pi[ci]], miny[pi[ci]], cells.res_of(cell))
        keep = (child != parent) & (np.atleast_1d(canon) == cell)
        return pa.table(
            {
                "child": pa.array(child[keep].tolist(), type=pa.string()),
                "parent": pa.array(parent[keep].tolist(), type=pa.string()),
                "parent_area": pa.array(parea[keep], type=pa.float64()),
            },
            schema=_CAND_SCHEMA,
        )

    return fn




def covers_tester_fn(geom_ref):
    """Stateless-task exact-covers stage over a broadcast **Arrow** geometry
    table (osm_id, boundary_wkb) — zero-copy from the object store, unlike a
    Python dict broadcast (seconds of unpickling per worker at 10⁵ zones).
    id→row lookup is one vectorized ``pc.index_in`` per batch; prepared
    geometries are cached per worker keyed by row index (tasks reuse worker
    processes, so state is still built once per worker — SURVEY §7.2)."""
    from ..functions.broadcast import get_cached_transformed, lookup_str_indices

    def _entry(tbl: pa.Table) -> dict:
        import gc

        # freeze the broadcast state out of cyclic-GC scans: at 10⁵+ zones
        # the per-worker prepared cache grows to millions of tracked numpy
        # objects and gen-2 collections dominated wall time (run-to-run 2×
        # variance at K=16 worlds)
        gc.collect()
        gc.freeze()
        return {
            "wkb": tbl["boundary_wkb"].combine_chunks(),
            "prep": {},
        }

    def _prep(entry, idx: int) -> PreparedPolygon | None:
        if idx < 0:
            return None
        cache = entry["prep"]
        p = cache.get(idx)
        if p is None:
            if len(cache) > 150_000:
                cache.clear()  # bound per-worker heap (GC pressure)
            try:
                p = PreparedPolygon(
                    multipolygon_from_wkb(entry["wkb"][idx].as_py())
                )
            except Exception:
                return None  # invalid geometry → covers false (zone_ext.rs:247-273)
            cache[idx] = p
        return p

    def fn(batch: pa.Table) -> pa.Table:
        entry = get_cached_transformed(geom_ref, "prep", _entry)
        ci = lookup_str_indices(geom_ref, "osm_id", batch["child"].to_pylist())
        pi = lookup_str_indices(geom_ref, "osm_id", batch["parent"].to_pylist())
        keep = np.zeros(len(ci), dtype=bool)
        # group pairs by parent → one vectorized covers_many per parent run
        # (bounded at ~4096 child edges per call for memory)
        order = np.argsort(pi, kind="stable")
        pi_s = pi[order]
        runs = np.nonzero(np.r_[True, pi_s[1:] != pi_s[:-1]])[0]
        run_ends = np.append(runs[1:], len(pi_s))
        for rs, re_ in zip(runs, run_ends):
            p_idx = int(pi_s[rs])
            pp = _prep(entry, p_idx)
            rows = order[rs:re_]
            if pp is None:
                continue
            preps_b = [_prep(entry, int(ci[r])) for r in rows]
            # split so total child edges per call stays bounded (memory of
            # the edge × point matrices in covers_many)
            start = 0
            while start < len(rows):
                end = start
                edges_acc = 0
                while end < len(rows):
                    e = preps_b[end].x1.size if preps_b[end] is not None else 0
                    if end > start and edges_acc + e > 4096:
                        break
                    edges_acc += e
                    end += 1
                sub = preps_b[start:end]
                try:
                    res = covers_many(pp, sub)
                except Exception:
                    res = np.zeros(len(sub), dtype=bool)
                keep[rows[start:end]] = res
                start = end
        return batch.filter(pa.array(keep))

    return fn


def broadcast_geometries(zones: rd.Dataset):
    """Collect the (osm_id, boundary_wkb) Arrow table into one broadcast
    object (``ray.put`` once, zero-copy read by every covers task — never
    re-shipped per batch, never a Python dict)."""
    parts = []
    for b in zones.select_columns(["osm_id", "boundary_wkb"]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        parts.append(b.filter(pa.compute.is_valid(b["boundary_wkb"])))
    tbl = (
        pa.concat_tables(parts).combine_chunks()
        if parts
        else pa.schema(
            [("osm_id", pa.string()), ("boundary_wkb", pa.binary())]
        ).empty_table()
    )
    return ray.put(tbl)


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
    # pairs are globally unique by canonical-cell construction — no
    # distinct_rows shuffle between candidate generation and the exact test
    cands = grouped_map(
        cover,
        ["cell", "salt"],
        _emit_candidates_fn(cfg.cells()),
        num_partitions=cfg.join_num_partitions,
        empty_schema=_CAND_SCHEMA,
    )
    if geom_ref is None:
        geom_ref = broadcast_geometries(boundary_zones)
    # exact test partitioned BY PARENT: every pair of a parent lands in one
    # partition, so one vectorized covers_many call handles a parent's whole
    # child set (canonical-cell partitions left parent runs of 1-2 pairs per
    # batch, collapsing covers_many back to per-pair overhead)
    from ..functions.shuffle import partitioned_map

    edges = partitioned_map(
        cands,
        ["parent"],
        covers_tester_fn(geom_ref),
        num_partitions=cfg.join_num_partitions,
        empty_schema=_CAND_SCHEMA,
    )
    return edges
