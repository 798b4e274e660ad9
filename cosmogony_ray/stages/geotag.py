"""Doc-span geotagging (J7) — the engine's streaming hot path.

Streams interleaved text+media documents (``doc_id``, ``spans`` per
BASELINE.json input_hint), resolves each span's point to its containing zone
(smallest by zone_type, ties by area then osm_id — same total order as the
hierarchy argmin), with a kNN fallback to the nearest admin centroid for
points outside every boundary (coastal/boundary points).

Design (north_rule): a **cell→zone inverted index** built once from the
(small) zones table, held by actor-pool workers (``ray.put`` once, read in
every actor ``__init__`` — never re-shipped per batch). Per batch:

- span points parsed with vectorized ``pyarrow.compute.extract_regex``;
- candidate zones via ladder-cell lookups (numpy);
- exact PIP per candidate zone over all of its candidate points in ONE
  vectorized call (points grouped by zone, not zone-per-point);
- kNN fallback: ring-expanding search over a coarse centroid grid, exact
  haversine argmin.

The ``spans`` column is passed through untouched — the per-row span-sequence
invariant (kind, text, media_ref, order) is preserved by construction and
asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..config import EngineConfig
from ..geom.cells import GridCells
from ..geom.predicates import PreparedPolygon
from ..model import ZONE_TYPE_RANK

_NUM = r"-?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?"
_TEXT_RE = rf"@(?P<lon>{_NUM}),(?P<lat>{_NUM})"
_MEDIA_RE = rf"\?lon=(?P<lon>{_NUM})&lat=(?P<lat>{_NUM})"

TILE_T = pa.struct(
    [("span_index", pa.int32()), ("zone_osm_id", pa.string()), ("cell_id", pa.int64())]
)


class ZoneIndexData:
    """Numpy-friendly zone index: covering-cell dict + per-zone metadata.
    Built once from the GeomPack (boundaries parsed DISTRIBUTED, exactly
    once per build — see ``stages/inclusion.build_geom_pack``) plus a thin
    metadata pull; broadcast via ray.put. Round-4 rework (VERDICT r3 task 2):
    the old ``from_zones`` iterated ``to_pylist()`` rows on the driver and
    re-parsed every boundary WKB single-threaded — the third parse of the
    same geometry per build. ``from_pack`` is fully vectorized and touches
    no WKB at all; geometry enters only as pack edge-array slices."""

    # zones with more edges than this stay on the stripe-indexed prepared
    # path (their edges dominate total vertex count; exploding them into the
    # flat pair kernel would blow pair×edge memory) — the flat kernel serves
    # the numerous small leaf zones where per-call Python overhead dominated
    FLAT_MAX_EDGES = 4096

    def __init__(self, cfg: EngineConfig):
        self.cells = cfg.cells()
        self.ids: list[str] = []
        self.rank: np.ndarray | None = None
        self.area: np.ndarray | None = None
        self.clon: np.ndarray | None = None
        self.clat: np.ndarray | None = None
        self.admin: np.ndarray | None = None
        self.wkb: list[bytes | None] = []   # probe/synthetic path only
        self.cell_map: dict[int, np.ndarray] = {}

    @classmethod
    def from_pack(
        cls, pack: dict, meta: pa.Table, cfg: EngineConfig
    ) -> "ZoneIndexData":
        """Vectorized index build from the broadcast GeomPack + thin zone
        metadata (osm_id, zone_type, area, center_lon/lat, minx..maxy — NO
        boundary_wkb). Pack rows are matched by osm_id; meta rows absent
        from the pack (no/unparseable boundary) get zero edges and fall to
        the kNN path, matching the old per-row semantics. The edge arrays
        are shared (zero-copy references) with the pack."""
        self = cls(cfg)
        ids_arr = meta["osm_id"]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        self.ids = ids_arr.to_pylist()
        n = len(self.ids)

        def _f64(col: str) -> np.ndarray:
            return meta[col].to_numpy(zero_copy_only=False).astype(np.float64)

        # rank: ~10 distinct zone_type values → dictionary-encode and map
        zt = meta["zone_type"]
        if isinstance(zt, pa.ChunkedArray):
            zt = zt.combine_chunks()
        ztd = zt.dictionary_encode()
        dflt = len(ZONE_TYPE_RANK)
        per_val = np.array(
            [ZONE_TYPE_RANK.get(v, dflt) for v in ztd.dictionary.to_pylist()]
            or [dflt],
            dtype=np.int16,
        )
        code = (
            pc.fill_null(ztd.indices, -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        self.rank = np.where(code >= 0, per_val[np.maximum(code, 0)], dflt).astype(
            np.int16
        )
        self.admin = (
            pc.fill_null(pc.not_equal(zt, "non_administrative"), False)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        self.area = np.nan_to_num(_f64("area"), nan=0.0)
        clon, clat = _f64("center_lon"), _f64("center_lat")
        minx, miny = _f64("minx"), _f64("miny")
        maxx, maxy = _f64("maxx"), _f64("maxy")
        use_bb = ~np.isfinite(clon) & np.isfinite(minx)
        self.clon = np.where(use_bb, (minx + maxx) / 2.0, clon)
        self.clat = np.where(use_bb, (miny + maxy) / 2.0, clat)

        # pack row per index row (-1 = no parsed boundary)
        pk = (
            pc.index_in(ids_arr, value_set=pack["osm_id"])
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        has = pk >= 0
        off = pack["off"]
        pk0 = np.maximum(pk, 0)
        self.estart = np.where(has, off[pk0], 0).astype(np.int64)
        self.ecnt = np.where(has, off[pk0 + 1] - off[pk0], 0).astype(np.int64)
        self.big = self.ecnt > self.FLAT_MAX_EDGES
        self.ex1, self.ey1 = pack["x1"], pack["y1"]
        self.ex2, self.ey2 = pack["x2"], pack["y2"]
        # zone bbox: the metadata bbox when present (as before); the parsed
        # pack bbox covers the wkb-without-bbox edge case
        self.bminx = np.full(n, np.nan)
        self.bminy = np.full(n, np.nan)
        self.bmaxx = np.full(n, np.nan)
        self.bmaxy = np.full(n, np.nan)
        use_meta = has & np.isfinite(minx)
        for dst, src in (
            ("bminx", minx), ("bminy", miny), ("bmaxx", maxx), ("bmaxy", maxy),
        ):
            getattr(self, dst)[use_meta] = src[use_meta]
        use_pack = has & ~np.isfinite(minx)
        if use_pack.any():
            for dst, key in (
                ("bminx", "bminx"), ("bminy", "bminy"),
                ("bmaxx", "bmaxx"), ("bmaxy", "bmaxy"),
            ):
                getattr(self, dst)[use_pack] = pack[key][pk[use_pack]]

        # covering-cell inverted index, vectorized (same helpers as the
        # inclusion join); registered zones = boundary + metadata bbox,
        # identical to the old per-row registration rule
        from .inclusion import _expand_cells, _grid_arrays

        self.cell_map = {}
        sel = np.nonzero(use_meta)[0]
        if sel.size:
            own_li, ix0s, iy0s, nxs, counts = _grid_arrays(
                self.cells, minx[sel], miny[sel], maxx[sel], maxy[sel]
            )
            cparts, zparts = [], []
            for li, r in enumerate(self.cells.ladder):
                s2 = np.nonzero(own_li == li)[0]
                if s2.size == 0:
                    continue
                cell, zrep = _expand_cells(
                    self.cells, (li, s2), r, ix0s, iy0s, nxs, counts
                )
                cparts.append(cell)
                zparts.append(sel[zrep])
            if cparts:
                allc = np.concatenate(cparts)
                allz = np.concatenate(zparts).astype(np.int32)
                order = np.argsort(allc, kind="stable")
                sc, sz = allc[order], allz[order]
                uniq, starts = np.unique(sc, return_index=True)
                ends = np.append(starts[1:], sc.size)
                self.cell_map = {
                    int(uniq[i]): sz[starts[i] : ends[i]] for i in range(uniq.size)
                }

        # permutation rank of osm_id in sorted order → numeric tie-break key
        order_np = pc.sort_indices(ids_arr).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        self.id_rank = np.empty(n, dtype=np.int64)
        self.id_rank[order_np] = np.arange(n, dtype=np.int64)
        # kNN candidate set: admin zones with a finite centroid, SORTED by
        # osm_id so a first-occurrence argmin is the deterministic tie-break
        okm = self.admin & np.isfinite(self.clon)
        self.knn_idx = order_np[okm[order_np]]
        self.knn_lon = self.clon[self.knn_idx]
        self.knn_lat = self.clat[self.knn_idx]
        self._build_knn_grid()
        return self

    def _build_flat_edges(self, bbs=None) -> None:
        """Synthetic/probe path only (``self.wkb`` populated by hand, e.g.
        ``scripts/geotag_scale_probe.py``): parse the WKB list into the same
        estart/ecnt/flat-edge layout ``from_pack`` produces. Production
        builds never take this path — their geometry arrives pre-parsed in
        the GeomPack."""
        from ..geom.predicates import PreparedPolygon as _PP
        from ..geom.wkb import multipolygon_from_wkb as _from_wkb

        n = len(self.ids)
        self.bminx = np.full(n, np.nan)
        self.bminy = np.full(n, np.nan)
        self.bmaxx = np.full(n, np.nan)
        self.bmaxy = np.full(n, np.nan)
        self.estart = np.zeros(n, dtype=np.int64)
        self.ecnt = np.zeros(n, dtype=np.int64)
        self.big = np.zeros(n, dtype=bool)
        xs1, ys1, xs2, ys2 = [], [], [], []
        total = 0
        for i in range(n):
            wkb = self.wkb[i]
            if wkb is None:
                continue
            try:
                p = _PP(_from_wkb(wkb))
            except Exception:
                continue
            if bbs is not None and bbs[i] is not None:
                bb = bbs[i]
            else:
                bb = p.bbox
            self.bminx[i], self.bminy[i], self.bmaxx[i], self.bmaxy[i] = bb
            xs1.append(p.x1)
            ys1.append(p.y1)
            xs2.append(p.x2)
            ys2.append(p.y2)
            self.estart[i] = total
            self.ecnt[i] = p.x1.size
            total += p.x1.size
            self.big[i] = p.x1.size > self.FLAT_MAX_EDGES
        if xs1:
            self.ex1 = np.ascontiguousarray(np.concatenate(xs1))
            self.ey1 = np.ascontiguousarray(np.concatenate(ys1))
            self.ex2 = np.ascontiguousarray(np.concatenate(xs2))
            self.ey2 = np.ascontiguousarray(np.concatenate(ys2))
        else:
            self.ex1 = self.ey1 = self.ex2 = self.ey2 = np.empty(0)

    # kNN centroid grid: below this candidate count a brute-force matrix is
    # cheaper than ring bookkeeping (one 512-wide row per point is ~µs)
    KNN_BRUTE_MAX = 512

    def _build_knn_grid(self) -> None:
        """Coarse uniform grid over admin centroids for the ring-expanding
        nearest-centroid search. Resolution is sized to candidate count
        (~2 candidates per occupied cell) so ring searches terminate in a
        handful of rings at any zone-world scale — per-point cost is
        O(candidates in a few rings), not O(all zones)."""
        n = int(self.knn_idx.size)
        if n <= self.KNN_BRUTE_MAX:
            self.knn_grid = None
            return
        # size cells to the CANDIDATE extent (a country extract occupies a
        # few degrees — a globe-sized grid would collapse every centroid
        # into one cell), targeting ~2 candidates per occupied cell
        k = np.sqrt(n / 2.0)
        lon_span = max(float(self.knn_lon.max() - self.knn_lon.min()), 1e-6)
        lat_span = max(float(self.knn_lat.max() - self.knn_lat.min()), 1e-6)
        want = max(360.0 * k / lon_span, 180.0 * k / lat_span)
        res = int(np.clip(round(np.log2(want)), 3, 18))
        self.knn_res = res
        # multi-level: factor-8 coarser grids so a query point far from the
        # candidate extent escalates (a few rings per level) instead of
        # crawling hundreds of fine empty rings
        self.knn_levels = []
        for r in range(res, 2, -3):
            nside = 1 << r
            ix = np.clip(((self.knn_lon + 180.0) / 360.0 * nside).astype(np.int64), 0, nside - 1)
            iy = np.clip(((self.knn_lat + 90.0) / 180.0 * nside).astype(np.int64), 0, nside - 1)
            key = iy * nside + ix
            order = np.argsort(key, kind="stable")  # keeps osm_id order per cell
            sk = key[order]
            uniq, starts = np.unique(sk, return_index=True)
            ends = np.append(starts[1:], sk.size)
            grid = {int(uniq[i]): order[starts[i] : ends[i]] for i in range(uniq.size)}
            self.knn_levels.append((r, nside, grid))
            if len(self.knn_levels) >= 4 or uniq.size < 64:
                break
        self.knn_grid = self.knn_levels[0][2]
        self.knn_nside = self.knn_levels[0][1]


def _haversine(lon1, lat1, lon2, lat2):
    r = np.radians
    dlon = r(lon2 - lon1)
    dlat = r(lat2 - lat1)
    a = np.sin(dlat / 2) ** 2 + np.cos(r(lat1)) * np.cos(r(lat2)) * np.sin(dlon / 2) ** 2
    return 2 * 6371.0 * np.arcsin(np.sqrt(a))


class GeotagActor:
    """The geotag kernel: holds the broadcast zone index and a per-worker
    prepared-geometry cache. Runs either as an actor-pool stage (setup once
    per actor, SURVEY §7.2) or — the round-4 default — wrapped by
    ``_geotag_fn`` as a worker-cached task-pool stage (state built once per
    worker PROCESS via ``get_cached_transformed``, no actor spin-up)."""

    def __init__(self, index_ref=None, idx: "ZoneIndexData | None" = None):
        self.idx: ZoneIndexData = idx if idx is not None else ray.get(index_ref)
        self.prepared: dict[int, PreparedPolygon] = {}

    def assign_points(
        self, lon: np.ndarray, lat: np.ndarray, *, knn_fill: bool = False
    ) -> np.ndarray:
        """Public point→zone assignment: index of the smallest covering zone
        per point (-1 = none). ``knn_fill=True`` resolves uncovered finite
        points to the nearest admin centroid (the geotag fallback). This is
        the kernel every point-shaped consumer shares — doc spans
        (``__call__``), raster pixels (stages/raster.py)."""
        zone_i = self._containing_zone(lon, lat)
        if knn_fill:
            miss = np.nonzero((zone_i < 0) & np.isfinite(lon))[0]
            if miss.size:
                zone_i[miss] = self._knn_fallback_batch(lon[miss], lat[miss])
        return zone_i

    def _prep(self, zi: int) -> PreparedPolygon | None:
        """Prepared geometry for a (big) zone from its flat edge slice — no
        WKB parse anywhere in the actor (the slice is zero-copy into the
        broadcast index's edge arrays; the stripe index builds lazily)."""
        p = self.prepared.get(zi)
        if p is None:
            idx = self.idx
            s, c = int(idx.estart[zi]), int(idx.ecnt[zi])
            if c <= 0:
                return None
            try:
                p = PreparedPolygon.from_edges(
                    idx.ex1[s : s + c], idx.ey1[s : s + c],
                    idx.ex2[s : s + c], idx.ey2[s : s + c],
                )
            except Exception:
                return None
            self.prepared[zi] = p
        return p

    # ---------------------------------------------------------------- parse
    @staticmethod
    def _span_points(spans_col: pa.ChunkedArray | pa.Array):
        """Flatten spans; extract (lon, lat) per span via vectorized regex.
        Returns (doc_index per span, span_index per span, lon, lat)."""
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        if spans_col.null_count:
            # flatten() drops values of null slots while the offsets keep
            # them, silently misaligning span→point mapping; the output
            # ListArray rebuild would also discard the validity bitmap
            # (round-1 ADVICE). Null spans rows are an ingest error.
            raise ValueError(
                "geotag input has null `spans` rows; fill with [] at ingest"
            )
        offsets = spans_col.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offsets)
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        span_idx = np.arange(offsets[-1], dtype=np.int64) - np.repeat(offsets[:-1], counts)
        flat = spans_col.values
        text = pc.struct_field(flat, "text")
        media = pc.struct_field(flat, "media_ref")
        t = pc.extract_regex(pc.fill_null(text, ""), _TEXT_RE)
        m = pc.extract_regex(pc.fill_null(media, ""), _MEDIA_RE)
        lon = np.full(len(flat), np.nan)
        lat = np.full(len(flat), np.nan)
        for ext in (t, m):
            valid = pc.is_valid(ext).to_numpy(zero_copy_only=False)
            if valid.any():
                # vectorized C string→float parse (nulls pass through)
                lo = pc.cast(pc.struct_field(ext, "lon"), pa.float64()).to_numpy(
                    zero_copy_only=False
                )
                la = pc.cast(pc.struct_field(ext, "lat"), pa.float64()).to_numpy(
                    zero_copy_only=False
                )
                lon = np.where(valid, lo, lon)
                lat = np.where(valid, la, lat)
        return doc_idx, span_idx, lon, lat

    # ---------------------------------------------------------------- match
    # per-chunk cap on exploded pair×edge elements in the flat PIP kernel
    FLAT_CHUNK_EDGES = 1 << 22

    def _flat_cover(self, ppc, pzc, cntc, lon, lat) -> np.ndarray:
        """Boundary-inclusive PIP for a chunk of (point, zone) candidate
        pairs against the index's concatenated edge arrays — ONE vectorized
        even-odd pass over all pairs (same crossing/on-edge math as
        ``PreparedPolygon._locate_kernel``), instead of one Python call per
        zone. Work is Σ pairs×edges(zone); zones flagged ``big`` never reach
        here."""
        idx = self.idx
        T = int(cntc.sum())
        pr = np.repeat(np.arange(ppc.size, dtype=np.int64), cntc)
        within = np.arange(T, dtype=np.int64) - np.repeat(
            np.cumsum(cntc) - cntc, cntc
        )
        ei = np.repeat(idx.estart[pzc], cntc) + within
        ex1, ey1, ex2, ey2 = idx.ex1[ei], idx.ey1[ei], idx.ex2[ei], idx.ey2[ei]
        qx = lon[ppc][pr]
        qy = lat[ppc][pr]
        straddle = (ey1 > qy) != (ey2 > qy)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (qy - ey1) / (ey2 - ey1)
            xi = ex1 + t * (ex2 - ex1)
        crossing = straddle & (qx < xi)
        cross = np.bincount(pr[crossing], minlength=ppc.size)
        cp = (ex2 - ex1) * (qy - ey1) - (ey2 - ey1) * (qx - ex1)
        win = (
            (qx >= np.minimum(ex1, ex2))
            & (qx <= np.maximum(ex1, ex2))
            & (qy >= np.minimum(ey1, ey2))
            & (qy <= np.maximum(ey1, ey2))
        )
        on_edge = np.zeros(ppc.size, dtype=bool)
        on_edge[pr[(cp == 0.0) & win]] = True
        return (cross % 2 == 1) | on_edge

    def _containing_zone(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Per point: index of smallest covering zone, or -1.

        Candidate (point, zone) pairs are generated per unique ladder cell
        with repeat/tile (no per-zone Python), bbox-prefiltered in one
        vectorized compare, then resolved by the flat multi-zone PIP kernel
        (big polygons fall back to the stripe-indexed prepared path, grouped
        per zone). The (rank, area, id) argmin is a single lexsort. Per-batch
        cost scales with candidate pairs × edges — independent of total zone
        count (the round-2 87k-zone wall was one Python PIP call per touched
        zone)."""
        idx = self.idx
        n = lon.shape[0]
        ok = np.isfinite(lon)
        ladder_cells = idx.cells.cells_of_ladder(lon, lat)  # (L, n)
        pp_parts: list[np.ndarray] = []
        pz_parts: list[np.ndarray] = []
        for li in range(ladder_cells.shape[0]):
            cells_r = ladder_cells[li]
            uniq, inv = np.unique(cells_r, return_inverse=True)
            # argsort grouping: O(n log n) total, not O(n·U) boolean scans
            order = np.argsort(inv, kind="stable")
            sorted_inv = inv[order]
            starts = np.searchsorted(sorted_inv, np.arange(uniq.size))
            ends = np.append(starts[1:], inv.size)
            for ui in range(uniq.size):
                arr = idx.cell_map.get(int(uniq[ui]))
                if arr is None:
                    continue
                pts = order[starts[ui] : ends[ui]]
                pts = pts[ok[pts]]
                if pts.size == 0:
                    continue
                # cross product points × zones in this cell, vectorized
                pp_parts.append(np.repeat(pts, arr.size))
                pz_parts.append(np.tile(arr.astype(np.int64), pts.size))
        best = np.full(n, -1, dtype=np.int64)
        if not pp_parts:
            return best
        pp = np.concatenate(pp_parts)
        pz = np.concatenate(pz_parts)
        px, py = lon[pp], lat[pp]
        keep = (
            (px >= idx.bminx[pz]) & (px <= idx.bmaxx[pz])
            & (py >= idx.bminy[pz]) & (py <= idx.bmaxy[pz])
        )
        pp, pz = pp[keep], pz[keep]
        hit_pts: list[np.ndarray] = []
        hit_zone: list[np.ndarray] = []
        bigm = idx.big[pz]
        fpp, fpz = pp[~bigm], pz[~bigm]
        cnt = idx.ecnt[fpz]
        nzm = cnt > 0
        fpp, fpz, cnt = fpp[nzm], fpz[nzm], cnt[nzm]
        csum = np.cumsum(cnt)
        start = 0
        while start < fpp.size:
            base = csum[start - 1] if start else 0
            end = int(np.searchsorted(csum, base + self.FLAT_CHUNK_EDGES)) + 1
            end = min(max(end, start + 1), fpp.size)
            covered = self._flat_cover(
                fpp[start:end], fpz[start:end], cnt[start:end], lon, lat
            )
            if covered.any():
                hit_pts.append(fpp[start:end][covered])
                hit_zone.append(fpz[start:end][covered])
            start = end
        bpp, bpz = pp[bigm], pz[bigm]
        if bpp.size:
            order = np.argsort(bpz, kind="stable")
            spz = bpz[order]
            runs = np.nonzero(np.r_[True, spz[1:] != spz[:-1]])[0]
            rends = np.append(runs[1:], spz.size)
            for rs, re_ in zip(runs, rends):
                z = int(spz[rs])
                pts = bpp[order[rs:re_]]
                prep = self._prep(z)
                if prep is None:
                    continue
                inside = prep.covers_points(lon[pts], lat[pts])
                if inside.any():
                    hit_pts.append(pts[inside])
                    hit_zone.append(np.full(int(inside.sum()), z, dtype=np.int64))
        if not hit_pts:
            return best
        hp = np.concatenate(hit_pts)
        hz = np.concatenate(hit_zone)
        # argmin by (rank, area, id_rank) per point: lexsort then first-per-point
        order = np.lexsort((idx.id_rank[hz], idx.area[hz], idx.rank[hz], hp))
        hp_s = hp[order]
        hz_s = hz[order]
        first = np.ones(hp_s.size, dtype=bool)
        first[1:] = hp_s[1:] != hp_s[:-1]
        best[hp_s[first]] = hz_s[first]
        return best

    def _knn_hav_a(self, lon, lat, cand: np.ndarray) -> np.ndarray:
        """(points × candidates) haversine ``a`` term against candidate
        POSITIONS (indices into the osm_id-sorted knn arrays). ``a`` is
        monotone in distance, so argmin over it is argmin over distance; a
        first-occurrence argmin over position-sorted candidates resolves
        distance ties to the smallest osm_id — identical to a brute-force
        argmin over the full array."""
        clon_r, clat_r, ccos = self._knn_rad
        plon = np.radians(lon)[:, None]
        plat = np.radians(lat)[:, None]
        sd_lat = np.sin((clat_r[cand][None, :] - plat) / 2)
        sd_lon = np.sin((clon_r[cand][None, :] - plon) / 2)
        return sd_lat * sd_lat + np.cos(plat) * ccos[cand][None, :] * sd_lon * sd_lon

    def _knn_brute(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Full-scan fallback (small candidate sets / polar edge cases):
        point-chunked (chunk × n_candidates) haversine matrices."""
        idx = self.idx
        best = np.full(lon.shape[0], -1, dtype=np.int64)
        allc = np.arange(idx.knn_idx.size, dtype=np.int64)
        chunk = max(1, (1 << 19) // max(1, idx.knn_idx.size))
        for s in range(0, lon.shape[0], chunk):
            a = self._knn_hav_a(lon[s : s + chunk], lat[s : s + chunk], allc)
            best[s : s + chunk] = idx.knn_idx[np.argmin(a, axis=1)]
        return best

    # hard cap on ring radius before giving up and brute-forcing a cell's
    # points (only reachable for near-polar points or a near-empty grid)
    KNN_MAX_RING = 64

    def _knn_fallback_batch(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Exact nearest-admin-centroid per point via ring-expanding search
        over the coarse centroid grid (built once in the broadcast index).

        Fallback points are grouped by grid cell; per unique cell, rings of
        neighbor cells are gathered outward until a provable distance bound
        guarantees the true nearest is among the gathered candidates, then
        one small (points × candidates) haversine matrix resolves the argmin.
        Ties resolve to the smallest osm_id (candidates kept position-sorted).
        Replaces the O(all zones) brute-force scan per point — per-point cost
        is now O(candidates within a few rings), independent of zone count
        (the round-2 scale ceiling: ~10× spans/s drop from 5.4k→87k zones)."""
        idx = self.idx
        if idx.knn_idx.size == 0:
            return np.full(lon.shape[0], -1, dtype=np.int64)
        if not hasattr(self, "_knn_rad"):
            # candidate radians precomputed once per actor
            self._knn_rad = (
                np.radians(idx.knn_lon),
                np.radians(idx.knn_lat),
                np.cos(np.radians(idx.knn_lat)),
            )
        if not getattr(idx, "knn_levels", None):
            return self._knn_brute(lon, lat)
        best = np.full(lon.shape[0], -1, dtype=np.int64)
        pending = np.arange(lon.shape[0], dtype=np.int64)
        for li, (res, nside, grid) in enumerate(idx.knn_levels):
            last = li == len(idx.knn_levels) - 1
            find_cap = self.KNN_MAX_RING if last else self.KNN_LEVEL_RING
            vals = self._knn_level_search(
                lon[pending], lat[pending], nside, grid, find_cap
            )
            got = vals >= 0
            best[pending[got]] = vals[got]
            pending = pending[~got]
            if pending.size == 0:
                return best
        best[pending] = self._knn_brute(lon[pending], lat[pending])
        return best

    # rings to try per level before escalating to the next coarser grid
    KNN_LEVEL_RING = 3

    def _knn_level_search(
        self, lon: np.ndarray, lat: np.ndarray, nside: int, grid: dict, find_cap: int
    ) -> np.ndarray:
        """One grid level of the ring search: group points by cell, expand
        rings until a hit (≤ ``find_cap`` rings), then keep expanding until
        the ring distance bound proves the true nearest is gathered. Returns
        the nearest candidate index per point, or -1 for cells that found
        nothing within ``find_cap`` (escalated by the caller)."""
        idx = self.idx
        s_lat_deg = 180.0 / nside
        s_lon_deg = 360.0 / nside
        best = np.full(lon.shape[0], -1, dtype=np.int64)
        pix = np.clip(((lon + 180.0) / 360.0 * nside).astype(np.int64), 0, nside - 1)
        piy = np.clip(((lat + 90.0) / 180.0 * nside).astype(np.int64), 0, nside - 1)
        key = piy * nside + pix
        order = np.argsort(key, kind="stable")
        sk = key[order]
        uniq, starts = np.unique(sk, return_index=True)
        ends = np.append(starts[1:], sk.size)

        def ring_min_km(cy: int, r: int) -> float:
            """Provable lower bound on the distance from any point in a cell
            at row cy to any point in a cell at Chebyshev ring r. Longitude
            legs use cos(max |lat|) over the band the rings span — the
            pole-ward worst case."""
            if r <= 1:
                return 0.0
            steps = r - 1  # whole cells strictly between the two cells
            dlat_km = steps * s_lat_deg * 110.567
            lat_lo = -90.0 + (cy - r) * s_lat_deg
            lat_hi = -90.0 + (cy + 1 + r) * s_lat_deg
            max_abs = min(90.0, max(abs(lat_lo), abs(lat_hi)))
            dlon_rad = min(np.pi, np.radians(steps * s_lon_deg))
            dlon_km = 2 * 6371.0 * np.cos(np.radians(max_abs)) * np.sin(dlon_rad / 2)
            return min(dlat_km, dlon_km) * 0.999

        def ring_cells(cx: int, cy: int, r: int):
            """Keys of ring-r cells; ix wraps at the antimeridian, iy clips
            at the poles."""
            if r == 0:
                yield cy * nside + cx
                return
            xs = np.arange(cx - r, cx + r + 1) % nside
            for yy in (cy - r, cy + r):
                if 0 <= yy < nside:
                    for xx in xs:
                        yield yy * nside + int(xx)
            for yy in range(max(0, cy - r + 1), min(nside, cy + r)):
                yield yy * nside + int(xs[0])
                yield yy * nside + int(xs[-1])

        for ui in range(uniq.size):
            pts = order[starts[ui] : ends[ui]]
            k = int(uniq[ui])
            cx, cy = k % nside, k // nside
            cand: list[np.ndarray] = []
            r = 0
            r_stop = None  # set once a hit fixes the guarantee radius
            while True:
                if r_stop is not None and r > r_stop:
                    break
                if r_stop is None and r > find_cap:
                    cand = None  # nothing nearby at this level: escalate
                    break
                hit_any = False
                for ck in ring_cells(cx, cy, r):
                    arr = grid.get(ck)
                    if arr is not None:
                        cand.append(arr)
                        hit_any = True
                if hit_any and r_stop is None:
                    # cheap upper bound on every cell point's nearest
                    # distance: (cell center → nearest gathered candidate) +
                    # cell half-diagonal (triangle inequality); expand until
                    # the ring bound clears it
                    cpos = np.concatenate(cand)
                    c_lon = np.array([-180.0 + (cx + 0.5) * s_lon_deg])
                    c_lat = np.array([-90.0 + (cy + 0.5) * s_lat_deg])
                    a0 = self._knn_hav_a(c_lon, c_lat, cpos)
                    d_center = 2 * 6371.0 * float(np.arcsin(np.sqrt(a0.min())))
                    lat_lo = -90.0 + cy * s_lat_deg
                    lat_hi = lat_lo + s_lat_deg
                    cell_cos = 1.0 if lat_lo <= 0.0 <= lat_hi else np.cos(
                        np.radians(min(abs(lat_lo), abs(lat_hi)))
                    )
                    half_diag = 0.5 * np.hypot(
                        s_lat_deg * 111.2, s_lon_deg * 111.33 * cell_cos
                    ) * 1.01
                    d_max = d_center + half_diag
                    r_stop = r
                    while (
                        r_stop < max(find_cap, self.KNN_MAX_RING)
                        and ring_min_km(cy, r_stop + 1) < d_max
                    ):
                        r_stop += 1
                    # cost model: if the remaining ring probes (≈4·Δr² dict
                    # gets) cost more than brute-forcing this cell's points
                    # (vectorized over all candidates), brute-force — exact
                    # either way; this bounds the near-polar worst case where
                    # the longitude bound collapses and r_stop explodes
                    ring_cost = 4.0 * (r_stop * r_stop - r * r)
                    brute_cost = 60.0 + 0.002 * idx.knn_idx.size * pts.size
                    if ring_cost > brute_cost:
                        cand = "brute"
                        break
                r += 1
            if cand is None:
                continue  # caller escalates these points
            if cand == "brute":
                best[pts] = self._knn_brute(lon[pts], lat[pts])
                continue
            cpos = np.unique(np.concatenate(cand))
            a = self._knn_hav_a(lon[pts], lat[pts], cpos)
            best[pts] = idx.knn_idx[cpos[np.argmin(a, axis=1)]]
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_idx, span_idx, lon, lat = self._span_points(batch["spans"])
        zone_i = self._containing_zone(lon, lat)
        miss = np.nonzero((zone_i < 0) & np.isfinite(lon))[0]
        if miss.size:
            zone_i[miss] = self._knn_fallback_batch(lon[miss], lat[miss])
        max_res = self.idx.cells.ladder[-1]
        cell_ids = np.where(
            np.isfinite(lon),
            self.idx.cells.cell_of(np.nan_to_num(lon), np.nan_to_num(lat), max_res),
            -1,
        )
        # tiles list column built zero-copy from the spans offsets (span k of
        # doc d is row k in the flat arrays — same order as the spans column)
        if not hasattr(self, "_ids_arrow"):
            self._ids_arrow = pa.array(self.idx.ids, type=pa.string())
        zi = pa.array(np.where(zone_i >= 0, zone_i, 0), type=pa.int64())
        zone_str = self._ids_arrow.take(zi)
        zone_str = pc.if_else(pa.array(zone_i >= 0), zone_str, pa.scalar(None, pa.string()))
        tile_struct = pa.StructArray.from_arrays(
            [
                pa.array(span_idx.astype(np.int32)),
                zone_str,
                pa.array(cell_ids, type=pa.int64()),
            ],
            fields=list(TILE_T),
        )
        spans_col = batch["spans"]
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        tiles = pa.ListArray.from_arrays(spans_col.offsets, tile_struct)
        return batch.append_column("tiles", tiles)


_META_COLS = [
    "osm_id", "zone_type", "area", "center_lon", "center_lat",
    "minx", "miny", "maxx", "maxy",
]


def build_zone_index(zones: rd.Dataset, cfg: EngineConfig, pack_ref=None):
    """Broadcast-ready zone index (ray.put once).

    Geometry comes from the GeomPack: pass the build's ``pack_ref``
    (``CosmogonyResult.geom_pack_ref``) to reuse the inclusion join's
    parse — ONE WKB parse per zone per build. Zones carrying a boundary
    that is absent from the supplied pack (voronoi-generated zones are
    created AFTER the build pack) are parsed distributed as a small delta
    pack and merged. With ``pack_ref=None`` the pack is built here
    (distributed map_batches parse — never a driver row loop).

    Pack rows are keyed by osm_id; the voronoi base/generated osm_id
    collision is safe because base place-node zones never carry a
    boundary (boundaries come from relations), so a generated zone's id
    either misses the pack (delta-parsed) or uniquely names its own
    relation boundary."""
    import pyarrow.compute as _pc

    from .inclusion import build_geom_pack

    if pack_ref is None:
        pack_ref = build_geom_pack(zones, cfg)

    def thin_meta(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in _META_COLS}
        cols["has_wkb"] = _pc.is_valid(t["boundary_wkb"])
        return pa.table(cols)

    from ..functions.arrowtools import materialized_table

    meta = materialized_table(
        zones.map_batches(thin_meta, batch_format="pyarrow")
    )
    # only the pack's ID COLUMN reaches the driver (for the delta check) —
    # the edge arrays stay in the object store; the index build itself runs
    # as one Ray task (round 4: the former driver get + from_pack + re-put
    # round-tripped the full pack through driver heap on every build)
    pack_ids = ray.get(ray.remote(lambda p: p["osm_id"]).remote(pack_ref))
    if meta.num_rows:
        pk = _pc.index_in(meta["osm_id"], value_set=pack_ids)
        missing = _pc.and_(meta["has_wkb"], _pc.is_null(pk))
        miss_ids = meta["osm_id"].filter(missing)
        if len(miss_ids):
            # rare path (voronoi-generated zones created after the build
            # pack): small delta, merged driver-side as before
            pack = _merge_delta_pack(ray.get(pack_ref), zones, miss_ids, cfg)
            return ray.put(ZoneIndexData.from_pack(pack, meta, cfg))
    return ray.remote(_index_from_pack_task).remote(pack_ref, meta, cfg)


def _index_from_pack_task(pack: dict, meta: pa.Table, cfg) -> "ZoneIndexData":
    return ZoneIndexData.from_pack(pack, meta, cfg)


def _merge_delta_pack(pack: dict, zones: rd.Dataset, miss_ids, cfg) -> dict:
    """Parse ONLY the pack-missing zones (distributed) and concatenate
    their edge arrays onto the pack (driver-side numpy concat — delta is
    voronoi-scale, not corpus-scale)."""
    import pyarrow.compute as _pc

    from .inclusion import build_geom_pack

    if isinstance(miss_ids, pa.ChunkedArray):
        miss_ids = miss_ids.combine_chunks()

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(
            _pc.fill_null(_pc.is_in(t["osm_id"], value_set=miss_ids), False)
        )

    delta_ref = build_geom_pack(
        zones.map_batches(keep, batch_format="pyarrow"), cfg
    )
    delta = ray.get(delta_ref)
    if len(delta["osm_id"]) == 0:
        return pack
    base_edges = pack["x1"].size
    merged = {
        "osm_id": pa.concat_arrays(
            [pack["osm_id"].combine_chunks() if isinstance(pack["osm_id"], pa.ChunkedArray) else pack["osm_id"],
             delta["osm_id"].combine_chunks() if isinstance(delta["osm_id"], pa.ChunkedArray) else delta["osm_id"]]
        ),
        "off": np.concatenate([pack["off"], delta["off"][1:] + base_edges]),
    }
    for k in ("x1", "y1", "x2", "y2", "bminx", "bminy", "bmaxx", "bmaxy", "area"):
        merged[k] = np.concatenate([pack[k], delta[k]])
    # bcell/bzone are inclusion-join state; the geotag index builds its own
    # covering from bboxes, so the merged pack omits them
    return merged


def _geotag_fn(index_ref):
    """Task-pool wrapper: the GeotagActor state (index deserialize +
    prepared-geometry cache) is built ONCE PER WORKER PROCESS and shared by
    every task that lands there — the same worker-cached-broadcast pattern
    as the inclusion join. Results are identical to the actor path (the
    kernel is stateless math; the cache only memoizes prepared geometry)."""
    from ..functions.broadcast import get_cached_transformed

    def fn(batch: pa.Table) -> pa.Table:
        actor = get_cached_transformed(
            index_ref, "geotag", lambda idx: GeotagActor(idx=idx)
        )
        return actor(batch)

    return fn


def geotag_docs(
    docs: rd.Dataset, index_ref, cfg: EngineConfig | None = None
) -> rd.Dataset:
    """docs(doc_id, spans, ...) → same rows + ``tiles`` column; ``spans``
    passes through untouched (span-sequence invariant).

    Default is the task-pool stage (``cfg.geotag_mode="tasks"``): no actor
    pool to ramp (measured ~2 s fixed per run at 32 CPUs, half the driver
    bench's 2M-span wall), scheduler free to use every CPU, and worker
    processes cache the index across tasks AND across runs in a session.
    ``geotag_mode="actors"`` keeps the bounded actor pool for deployments
    that need pinned state."""
    cfg = cfg or EngineConfig()
    if cfg.geotag_mode == "actors":
        return docs.map_batches(
            GeotagActor,
            fn_constructor_kwargs={"index_ref": index_ref},
            batch_format="pyarrow",
            batch_size=cfg.doc_batch_size,
            concurrency=cfg.geotag_concurrency,
            num_cpus=1,
        )
    return docs.map_batches(
        _geotag_fn(index_ref),
        batch_format="pyarrow",
        batch_size=cfg.doc_batch_size,
        num_cpus=1,
    )


def tiles_table(tagged: rd.Dataset) -> rd.Dataset:
    """Explode (doc_id, tiles) → flat tile assignments
    (doc_id, span_index, zone_osm_id, cell_id)."""
    from ..functions.arrowtools import explode_list_column

    return tagged.select_columns(["doc_id", "tiles"]).map_batches(
        lambda t: explode_list_column(t, "tiles", ["doc_id"]),
        batch_format="pyarrow",
    )


def write_tiles(tagged: rd.Dataset, out_dir: str) -> None:
    """Per-zone tile sink (shuffle #4, SURVEY §7.3): hive-partitioned parquet
    ``out_dir/zone_osm_id=<zone>/...`` — one directory per zone so reruns and
    per-zone consumers address partitions independently. The osm_id's ':' is
    encoded as '_' for path safety."""
    ds = tiles_table(tagged).map_batches(
        lambda t: t.set_column(
            t.column_names.index("zone_osm_id"),
            "zone_osm_id",
            pa.compute.replace_substring(
                pa.compute.fill_null(t["zone_osm_id"], "none"), ":", "_"
            ),
        ),
        batch_format="pyarrow",
    )
    ds.write_parquet(out_dir, partition_cols=["zone_osm_id"])
