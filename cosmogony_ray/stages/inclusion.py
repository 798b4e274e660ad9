"""Inclusion spatial self-join: which zones cover which.

Ray-Data-native replacement of the reference's in-process R-tree join
(`find_inclusions`, /root/reference/src/hierarchy_builder.rs:34-95): a
hierarchical-grid **cell join** (north_rule), executed as a SHUFFLE-FREE
map-side broadcast join:

1. every boundary WKB is parsed ONCE (distributed) into the **GeomPack** —
   flat CSR edge arrays plus a per-zone bbox table — and broadcast via one
   ``ray.put`` (``build_geom_pack``);
2. the pack carries a sorted **build-cell index**: each zone's bbox covering
   cells at the finest ladder resolution that stays under
   ``max_cells_per_zone`` (mega-zone coarsening: a country never explodes
   into millions of rows), as two parallel arrays ``(bcell sorted, bzone)``;
3. candidate generation is a ``map_batches`` over the zone table: each batch
   emits its zones' PROBE cells at every ladder resolution ≤ their own
   (a parent's bbox ⊇ child's bbox ⇒ the parent's chosen resolution is
   coarser or equal, so probing the coarser rungs meets every parent) and
   binary-searches them against the broadcast build index — **no groupby**
   (the previous groupby(cell) shuffle of the covering rows cost 24 s of a
   28 s inclusion phase at the 87k-zone world; the kernel itself was 2 s);
4. a (child, parent) pair can only match at the parent's build resolution,
   and is kept ONLY in the canonical cell — the cell containing the child's
   bbox min corner at that resolution (the parent's covering contains it
   because parent bbox ⊇ child bbox; the child probes that resolution). A
   pair is therefore emitted exactly once globally BY CONSTRUCTION — no
   dedup shuffle;
5. exact boundary-inclusive ``covers`` test (GEOS semantics,
   /root/reference/src/zone_ext.rs:236-277) as a second fused
   ``map_batches`` over zero-copy GeomPack slices.

Scale assumption (documented per SURVEY §7.4): the zones side fits in the
object store as one broadcast (~10^6 zones; edge arrays ≈ 32 B/edge ≈ 2× the
WKB payload, build-cell index ≤ 64 cells/zone ≈ 0.8 GB at 10^6 zones); the
docs side never flows through here. Both stages are plain map transforms, so
the whole phase streams with backpressure and scales with input blocks — the
all-to-all exchange the groupby design paid is gone. Errors in geometry
conversion yield covers=False, matching the reference (zone_ext.rs:247-273).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..config import EngineConfig
from ..geom.predicates import PreparedPolygon
from ..geom.wkb import multipolygon_from_wkb

_CAND_SCHEMA = pa.schema(
    [("child", pa.string()), ("parent", pa.string()), ("parent_area", pa.float64())]
)

_CAND_IDX_SCHEMA = pa.schema(
    [
        ("child", pa.string()),
        ("parent", pa.string()),
        ("parent_area", pa.float64()),
        ("child_idx", pa.int64()),
        ("parent_idx", pa.int64()),
    ]
)

_BIG_CHILD_EDGES = 1024  # children above this use the stripe-indexed scalar path


def _grid_arrays(cells, minx, miny, maxx, maxy):
    """Per-zone, per-ladder-resolution covering-grid arrays (vectorized over
    a zone batch): returns ``(own_li, ix0s, iy0s, nxs, counts)`` where
    ``own_li`` is the index into ``cells.ladder`` of each zone's own cover
    resolution — the finest whose bbox covering stays under
    ``max_cells_per_zone`` (cummax trick: once a resolution exceeds the cap,
    all finer ones do too on a regular grid)."""
    ladder = cells.ladder
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
    ok = counts <= cells.max_cells_per_zone
    own_li = np.maximum(ok.cumprod(axis=0).sum(axis=0) - 1, 0)
    return own_li, ix0s, iy0s, nxs, counts


def _expand_cells(cells, li_sel, r, ix0s, iy0s, nxs, counts):
    """Expand the bbox coverings of the selected zones at ladder index
    ``li_sel``'s resolution ``r`` into (cell_id, zone_row) arrays via the
    segmented repeat/arange trick — no per-zone Python."""
    cnt = counts[li_sel[0]][li_sel[1]]
    zrep = np.repeat(li_sel[1], cnt)
    total = int(cnt.sum())
    within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    nx = nxs[li_sel[0]][zrep]
    ix = ix0s[li_sel[0]][zrep] + within % nx
    iy = iy0s[li_sel[0]][zrep] + within // nx
    return cells._encode(r, ix, iy), zrep


def build_geom_pack(zones: rd.Dataset, cfg: EngineConfig | None = None):
    """Parse every boundary WKB ONCE (distributed) into a columnar edge pack
    + build-cell index, broadcast as one object-store blob of numpy arrays.

    Round-3 fix for the covers-stage prep storm: the previous design
    broadcast raw WKB and each worker re-parsed + re-prepared every child
    geometry it saw — children are duplicated across their parents'
    partitions (avg edge fan-in ≈ 7.7 at the 87k-zone world), so ~670k WKB
    parses + PreparedPolygon builds (~30 µs each ≈ 20 s of CPU) ran
    redundantly per build, and got WORSE with more workers (less per-worker
    cache reuse). The pack parses each zone exactly once in a map_batches
    stage; workers then take zero-copy slices.

    Layout (CSR over edges): ``x1/y1/x2/y2`` float64 edge arrays for all
    zones concatenated, ``off`` int64 (n_zones+1) zone offsets, per-zone
    ``bminx/bminy/bmaxx/bmaxy`` bboxes and ``area``, ``osm_id`` (Arrow
    string array, for vectorized ``pc.index_in`` lookups), and the sorted
    build-cell index ``(bcell, bzone)``. Zones whose WKB fails to parse are
    absent → id lookup miss → covers false, matching the reference
    (zone_ext.rs:247-273)."""
    cfg = cfg or EngineConfig()
    pack_schema = pa.schema(
        [
            ("osm_id", pa.string()),
            ("n", pa.int64()),
            ("x1", pa.list_(pa.float64())),
            ("y1", pa.list_(pa.float64())),
            ("x2", pa.list_(pa.float64())),
            ("y2", pa.list_(pa.float64())),
            ("bminx", pa.float64()),
            ("bminy", pa.float64()),
            ("bmaxx", pa.float64()),
            ("bmaxy", pa.float64()),
            ("area", pa.float64()),
            ("cells", pa.list_(pa.int64())),
        ]
    )
    cells = cfg.cells()

    def parse_batch(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["boundary_wkb"]))
        ids = t["osm_id"].to_pylist()
        wkbs = t["boundary_wkb"].to_pylist()
        areas = t["area"].to_numpy(zero_copy_only=False)
        rows = {k: [] for k in pack_schema.names if k != "cells"}
        for i, (zid, wkb) in enumerate(zip(ids, wkbs)):
            try:
                p = PreparedPolygon(multipolygon_from_wkb(wkb))
            except Exception:
                continue  # absent from pack → covers false
            rows["osm_id"].append(zid)
            rows["n"].append(p.x1.size)
            rows["x1"].append(p.x1)
            rows["y1"].append(p.y1)
            rows["x2"].append(p.x2)
            rows["y2"].append(p.y2)
            rows["bminx"].append(p.bbox[0])
            rows["bminy"].append(p.bbox[1])
            rows["bmaxx"].append(p.bbox[2])
            rows["bmaxy"].append(p.bbox[3])
            rows["area"].append(float(areas[i]))
        # build-cell covering computed HERE (distributed, from this batch's
        # bboxes) instead of in the single pack-assembly task — that serial
        # _grid_arrays/_expand_cells pass was ~1.4 s of the 349k-zone
        # build's fixed cost (round-5 inclusion-scaling work); the assembly
        # task now only flattens + argsorts
        nz = len(rows["osm_id"])
        cell_lists: pa.Array
        if nz:
            bminx = np.asarray(rows["bminx"])
            bminy = np.asarray(rows["bminy"])
            bmaxx = np.asarray(rows["bmaxx"])
            bmaxy = np.asarray(rows["bmaxy"])
            own_li, ix0s, iy0s, nxs, ccounts = _grid_arrays(
                cells, bminx, bminy, bmaxx, bmaxy
            )
            zidx = np.arange(nz, dtype=np.int64)
            cnt_z = ccounts[own_li, zidx]
            offs = np.zeros(nz + 1, dtype=np.int64)
            np.cumsum(cnt_z, out=offs[1:])
            vals = np.empty(int(offs[-1]), dtype=np.int64)
            zrep = np.repeat(zidx, cnt_z)
            within = np.arange(vals.size, dtype=np.int64) - np.repeat(offs[:-1], cnt_z)
            li_rep = own_li[zrep]
            for li, r in enumerate(cells.ladder):
                m = li_rep == li
                if not m.any():
                    continue
                zm = zrep[m]
                nx = nxs[li][zm]
                ix = ix0s[li][zm] + within[m] % nx
                iy = iy0s[li][zm] + within[m] // nx
                vals[m] = cells._encode(r, ix, iy)
            cell_lists = pa.ListArray.from_arrays(
                pa.array(offs.astype(np.int32)), pa.array(vals)
            )
        else:
            cell_lists = pa.array([], type=pa.list_(pa.int64()))
        out = {k: rows[k] for k in rows}
        tbl_out = pa.table(
            {**{k: pa.array(v, type=pack_schema.field(k).type) for k, v in out.items()},
             "cells": cell_lists.cast(pa.list_(pa.int64()))},
        )
        return tbl_out.select(pack_schema.names).cast(pack_schema)

    packed = zones.select_columns(["osm_id", "boundary_wkb", "area"]).map_batches(
        parse_batch, batch_format="pyarrow"
    )
    # pack assembly (concat + flatten + cell-index argsort) runs as ONE Ray
    # task over the materialized block refs — the edge arrays never cross
    # the driver (round 4; the driver pull + re-put was ~100 MB of serial,
    # CPU-count-independent work at the 349k-zone world) and the returned
    # ObjectRef is broadcast exactly as the ray.put ref was
    refs = packed.materialize().to_arrow_refs()
    return ray.remote(_assemble_geom_pack).remote(cfg, pack_schema, *refs)


def _assemble_geom_pack(cfg: EngineConfig, pack_schema: pa.Schema, *tbls) -> dict:
    tbl = pa.concat_tables(
        [t for t in tbls if t.num_rows] or [pack_schema.empty_table()],
        promote_options="default",
    ).combine_chunks()
    counts = tbl["n"].to_numpy(zero_copy_only=False)
    off = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])

    def _flat(col: str) -> np.ndarray:
        arr = tbl[col].combine_chunks()
        return np.ascontiguousarray(arr.flatten().to_numpy(zero_copy_only=False))

    pack = {
        "osm_id": tbl["osm_id"].combine_chunks(),
        "off": off,
        "x1": _flat("x1"),
        "y1": _flat("y1"),
        "x2": _flat("x2"),
        "y2": _flat("y2"),
        "bminx": tbl["bminx"].to_numpy(zero_copy_only=False),
        "bminy": tbl["bminy"].to_numpy(zero_copy_only=False),
        "bmaxx": tbl["bmaxx"].to_numpy(zero_copy_only=False),
        "bmaxy": tbl["bmaxy"].to_numpy(zero_copy_only=False),
        "area": tbl["area"].to_numpy(zero_copy_only=False),
    }
    # build-cell index: coverings were computed DISTRIBUTED in parse_batch
    # (round 5); this task only flattens the list column to (cell, zone)
    # pairs and argsorts by cell for binary-search probes — O(total cells)
    # with no per-zone grid math left on the serial path (≤ 64 cells/zone
    # by the coarsening cap, so ≤ 64M rows at the 10^6-zone assumption)
    cells_col = tbl["cells"].combine_chunks()
    bcell = cells_col.flatten().to_numpy(zero_copy_only=False)
    cell_counts = np.diff(cells_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
    bzone = np.repeat(np.arange(len(cell_counts), dtype=np.int64), cell_counts)
    if bcell.size:
        order = np.argsort(bcell, kind="stable")
        pack["bcell"] = np.ascontiguousarray(bcell[order])
        pack["bzone"] = bzone[order]
    else:
        pack["bcell"] = np.array([], dtype=np.int64)
        pack["bzone"] = np.array([], dtype=np.int64)
    return pack


def _candidates_fn(pack_ref, cfg: EngineConfig):
    """Map-side candidate join: for a batch of zones (as children), probe
    the broadcast build-cell index at every ladder resolution ≤ each
    child's own, expand matches via searchsorted runs, and apply the three
    vectorized pair filters (parent-bbox-contains-child prefilter,
    self-exclusion, canonical-cell dedup). One numpy pass per batch — no
    shuffle, no per-group Python."""
    cells = cfg.cells()
    from ..functions.broadcast import get_cached

    def fn(batch: pa.Table) -> pa.Table:
        pack = get_cached(pack_ref)
        bcell, bzone = pack["bcell"], pack["bzone"]
        if batch.num_rows == 0 or bcell.size == 0:
            return _CAND_IDX_SCHEMA.empty_table()
        minx = batch["minx"].to_numpy(zero_copy_only=False)
        miny = batch["miny"].to_numpy(zero_copy_only=False)
        maxx = batch["maxx"].to_numpy(zero_copy_only=False)
        maxy = batch["maxy"].to_numpy(zero_copy_only=False)
        ids = batch["osm_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        # child's pack row (self-exclusion vs parent pack rows); children
        # absent from the pack (unparseable boundary) emit no pairs
        cpack = (
            pc.index_in(ids, value_set=pack["osm_id"])
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        valid = np.isfinite(minx) & (cpack >= 0)
        own_li, ix0s, iy0s, nxs, counts = _grid_arrays(cells, minx, miny, maxx, maxy)
        pcell_parts, prow_parts = [], []
        for li, r in enumerate(cells.ladder):
            sel = np.nonzero(valid & (own_li >= li))[0]
            if sel.size == 0:
                continue
            cell, zrep = _expand_cells(cells, (li, sel), r, ix0s, iy0s, nxs, counts)
            pcell_parts.append(cell)
            prow_parts.append(zrep)
        if not pcell_parts:
            return _CAND_IDX_SCHEMA.empty_table()
        pcell = np.concatenate(pcell_parts)
        prow = np.concatenate(prow_parts)
        lo = np.searchsorted(bcell, pcell, side="left")
        hi = np.searchsorted(bcell, pcell, side="right")
        nm = hi - lo
        hit = nm > 0
        if not hit.any():
            return _CAND_IDX_SCHEMA.empty_table()
        lo, nm, pcell, prow = lo[hit], nm[hit], pcell[hit], prow[hit]
        total = int(nm.sum())
        child_rows = np.repeat(prow, nm)
        within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(nm) - nm, nm)
        bpos = np.repeat(lo, nm) + within
        parent_pack = bzone[bpos]
        matched_cell = np.repeat(pcell, nm)
        # parent bbox must contain child bbox (covers ⇒ bbox-contains prefilter)
        keep = (
            (pack["bminx"][parent_pack] <= minx[child_rows])
            & (pack["bminy"][parent_pack] <= miny[child_rows])
            & (pack["bmaxx"][parent_pack] >= maxx[child_rows])
            & (pack["bmaxy"][parent_pack] >= maxy[child_rows])
            & (parent_pack != cpack[child_rows])
        )
        # canonical-cell dedup at each pair's matched (= parent's build)
        # resolution — via the injectable cell scheme, vectorized per
        # distinct resolution (ladder is ≤ ~11 entries)
        ucells, inv = np.unique(matched_cell, return_inverse=True)
        ures = np.fromiter(
            (cells.res_of(int(c)) for c in ucells), dtype=np.int64, count=ucells.size
        )
        pair_res = ures[inv]
        canon = np.empty(matched_cell.size, dtype=np.int64)
        for r in np.unique(ures):
            sel = pair_res == r
            canon[sel] = cells.cell_of(minx[child_rows[sel]], miny[child_rows[sel]], int(r))
        keep &= canon == matched_cell
        child_rows = child_rows[keep]
        parent_pack = parent_pack[keep]
        # pack row indices ride along so the covers stage never re-hashes
        # the 10^5-row osm_id value_set per batch (pc.index_in rebuilds its
        # hash table on every call)
        return pa.table(
            {
                "child": ids.take(pa.array(child_rows, type=pa.int64())),
                "parent": pack["osm_id"].take(
                    pa.array(parent_pack, type=pa.int64())
                ),
                "parent_area": pa.array(
                    pack["area"][parent_pack], type=pa.float64()
                ),
                "child_idx": pa.array(cpack[child_rows], type=pa.int64()),
                "parent_idx": pa.array(parent_pack, type=pa.int64()),
            },
            schema=_CAND_IDX_SCHEMA,
        )

    return fn


def covers_tester_fn(pack_ref):
    """Exact-covers stage over the broadcast GeomPack (see
    ``build_geom_pack``): per batch, pairs are grouped by parent (one
    in-batch argsort); the parent gets one ``PreparedPolygon.from_edges``
    (cached per worker — stripe index built lazily for big boundaries), and
    each parent's SMALL children are tested with ONE ``covers_concat`` call
    over gathered slices of the pack (no per-child parse, no per-child
    Python object). Big children (>1k edges, real OSM boundaries) fall back
    to the stripe-indexed scalar ``covers``."""
    from ..functions.broadcast import get_cached, get_cached_transformed
    from ..geom.predicates import covers, covers_concat

    def _entry(pack: dict) -> dict:
        import gc

        # freeze the broadcast out of cyclic-GC scans (gen-2 collections
        # dominated wall time at 10⁵-zone worlds before freezing)
        gc.collect()
        gc.freeze()
        return {"pack": pack, "prep": {}}

    def _prep(entry, idx: int) -> PreparedPolygon | None:
        cache = entry["prep"]
        p = cache.get(idx)
        if p is None:
            if len(cache) > 50_000:
                cache.clear()  # bound per-worker heap
            pk = entry["pack"]
            s, e = pk["off"][idx], pk["off"][idx + 1]
            if e <= s:
                return None
            p = PreparedPolygon.from_edges(
                pk["x1"][s:e], pk["y1"][s:e], pk["x2"][s:e], pk["y2"][s:e]
            )
            cache[idx] = p
        return p

    def fn(batch: pa.Table) -> pa.Table:
        has_idx = "child_idx" in batch.column_names
        if batch.num_rows == 0:
            return batch.select(_CAND_SCHEMA.names) if has_idx else batch
        pack = get_cached(pack_ref)
        entry = get_cached_transformed(pack_ref, "prep", _entry)
        ids = pack["osm_id"]
        if has_idx:
            # pack rows already resolved by the candidate stage — no
            # per-batch value_set re-hash
            ci = batch["child_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
            pi = batch["parent_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
            batch = batch.select(_CAND_SCHEMA.names)
        else:
            ci = (
                pc.index_in(batch["child"], value_set=ids)
                .fill_null(-1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            pi = (
                pc.index_in(batch["parent"], value_set=ids)
                .fill_null(-1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        off = pack["off"]
        x1, y1, x2, y2 = pack["x1"], pack["y1"], pack["x2"], pack["y2"]
        keep = np.zeros(len(ci), dtype=bool)
        order = np.argsort(pi, kind="stable")
        pi_s = pi[order]
        runs = np.nonzero(np.r_[True, pi_s[1:] != pi_s[:-1]])[0]
        run_ends = np.append(runs[1:], len(pi_s))
        for rs, re_ in zip(runs, run_ends):
            p_idx = int(pi_s[rs])
            if p_idx < 0:
                continue
            pp = _prep(entry, p_idx)
            if pp is None:
                continue
            rows = order[rs:re_]
            cidx = ci[rows]
            valid = cidx >= 0
            cnt = np.zeros(len(rows), dtype=np.int64)
            cnt[valid] = off[cidx[valid] + 1] - off[cidx[valid]]
            # BIG PARENTS (real OSM country/state boundaries, 10^4+ edges)
            # take the stripe-indexed scalar path for EVERY child: the
            # batched kernel's test-2/3 matrices are (child_edges ×
            # parent_chunk) with a bbox prefilter over the CHILD SET's
            # combined bbox — when children span the whole parent, nothing
            # prefilters and one call touches ~0.3B cells (measured: 122 s
            # inclusion on the 198-zone real-Luxembourg fixture, vs ~1 s
            # scalar). The scalar path is O(points × stripe_bucket) per
            # pair — the GEOS prepared-geometry operating point.
            if pp.x1.size > _BIG_CHILD_EDGES:
                for r in np.nonzero(valid & (cnt > 0))[0]:
                    cp = _prep(entry, int(cidx[r]))
                    if cp is None:
                        continue
                    try:
                        keep[rows[r]] = covers(pp, cp)
                    except Exception:
                        keep[rows[r]] = False
                continue
            small = valid & (cnt > 0) & (cnt <= _BIG_CHILD_EDGES)
            # big children: stripe-indexed scalar covers (rare; cached prep)
            for r in np.nonzero(valid & (cnt > _BIG_CHILD_EDGES))[0]:
                cp = _prep(entry, int(cidx[r]))
                if cp is None:
                    continue
                try:
                    keep[rows[r]] = covers(pp, cp)
                except Exception:
                    keep[rows[r]] = False
            srows = np.nonzero(small)[0]
            # chunk so total gathered child edges per call stays bounded
            # (memory of the edge × point matrices in covers_concat)
            start = 0
            while start < len(srows):
                acc = 0
                end = start
                while end < len(srows):
                    e = int(cnt[srows[end]])
                    if end > start and acc + e > 8192:
                        break
                    acc += e
                    end += 1
                sub = srows[start:end]
                subc = cidx[sub]
                subcnt = cnt[sub]
                segs = np.zeros(len(sub) + 1, dtype=np.int64)
                np.cumsum(subcnt, out=segs[1:])
                gidx = np.repeat(off[subc], subcnt) + (
                    np.arange(int(subcnt.sum()), dtype=np.int64)
                    - np.repeat(segs[:-1], subcnt)
                )
                try:
                    res = covers_concat(
                        pp, x1[gidx], y1[gidx], x2[gidx], y2[gidx], segs
                    )
                except Exception:
                    res = np.zeros(len(sub), dtype=bool)
                keep[rows[sub]] = res
                start = end
        return batch.filter(pa.array(keep))

    return fn


def find_inclusion_edges(
    zones: rd.Dataset, cfg: EngineConfig | None = None, pack_ref=None
) -> rd.Dataset:
    """zones Dataset → inclusion edge Dataset (child, parent): parent's
    boundary covers child (/root/reference/src/hierarchy_builder.rs:76-95).

    Both stages are plain ``map_batches`` over the broadcast GeomPack —
    Ray fuses them into one streaming task chain with no all-to-all
    exchange (see module docstring for the uniqueness argument)."""
    cfg = cfg or EngineConfig()
    boundary_zones = zones.map_batches(
        lambda t: t.filter(pc.is_valid(t["boundary_wkb"])),
        batch_format="pyarrow",
    )
    if pack_ref is None:
        pack_ref = build_geom_pack(boundary_zones, cfg)
    lite = boundary_zones.select_columns(
        ["osm_id", "minx", "miny", "maxx", "maxy", "area"]
    )
    # batch sizes: the lite table is narrow, so candidate batches are large
    # (amortizes the one index_in per batch); the covers stage takes each
    # candidate batch whole (batch_size=None) — a row-count batch_size here
    # would make Ray bundle several input blocks per fused task and CAP the
    # stage's parallelism below the cluster size (measured: 19 tasks at the
    # 349k-zone world with batch_size=16384)
    cands = lite.map_batches(
        _candidates_fn(pack_ref, cfg),
        batch_format="pyarrow",
        batch_size=4096,
    )
    edges = cands.map_batches(
        covers_tester_fn(pack_ref), batch_format="pyarrow", batch_size=None
    )
    return edges
