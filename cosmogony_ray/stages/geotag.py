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
from ..geom.wkb import multipolygon_from_wkb
from ..model import ZONE_TYPE_RANK

_NUM = r"-?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?"
_TEXT_RE = rf"@(?P<lon>{_NUM}),(?P<lat>{_NUM})"
_MEDIA_RE = rf"\?lon=(?P<lon>{_NUM})&lat=(?P<lat>{_NUM})"

TILE_T = pa.struct(
    [("span_index", pa.int32()), ("zone_osm_id", pa.string()), ("cell_id", pa.int64())]
)


class ZoneIndexData:
    """Numpy-friendly zone index: covering-cell dict + per-zone metadata.
    Built once on the driver from the final zones table (zone side is small;
    SURVEY §7.0), broadcast via ray.put."""

    def __init__(self, cfg: EngineConfig):
        self.cells = cfg.cells()
        self.ids: list[str] = []
        self.rank: np.ndarray | None = None
        self.area: np.ndarray | None = None
        self.clon: np.ndarray | None = None
        self.clat: np.ndarray | None = None
        self.admin: np.ndarray | None = None
        self.wkb: list[bytes | None] = []
        self.cell_map: dict[int, np.ndarray] = {}

    @classmethod
    def from_zones(cls, zones: rd.Dataset, cfg: EngineConfig) -> "ZoneIndexData":
        self = cls(cfg)
        ranks, areas, clons, clats, admins = [], [], [], [], []
        bbs: list[tuple[float, float, float, float] | None] = []
        tmp_cells: dict[int, list[int]] = {}
        cols = [
            "osm_id", "zone_type", "area", "center_lon", "center_lat",
            "boundary_wkb", "minx", "miny", "maxx", "maxy",
        ]
        for b in zones.select_columns(cols).iter_batches(
            batch_size=2048, batch_format="pyarrow"
        ):
            for row in b.to_pylist():
                i = len(self.ids)
                self.ids.append(row["osm_id"])
                rank = ZONE_TYPE_RANK.get(row["zone_type"], len(ZONE_TYPE_RANK))
                ranks.append(rank)
                areas.append(row["area"] if row["area"] is not None else 0.0)
                admins.append(
                    row["zone_type"] is not None
                    and row["zone_type"] != "non_administrative"
                )
                wkb = row["boundary_wkb"]
                self.wkb.append(wkb)
                if row["center_lon"] is not None:
                    clons.append(row["center_lon"])
                    clats.append(row["center_lat"])
                elif row["minx"] is not None:
                    clons.append((row["minx"] + row["maxx"]) / 2.0)
                    clats.append((row["miny"] + row["maxy"]) / 2.0)
                else:
                    clons.append(np.nan)
                    clats.append(np.nan)
                if wkb is not None and row["minx"] is not None:
                    bbox = (row["minx"], row["miny"], row["maxx"], row["maxy"])
                    bbs.append(bbox)
                    res = self.cells.cover_res_for_bbox(bbox)
                    for c in self.cells.cover_bbox(bbox, res):
                        tmp_cells.setdefault(int(c), []).append(i)
                else:
                    bbs.append(None)
        self._build_flat_edges(bbs)
        self.rank = np.array(ranks, dtype=np.int16)
        self.area = np.array(areas, dtype=np.float64)
        self.clon = np.array(clons, dtype=np.float64)
        self.clat = np.array(clats, dtype=np.float64)
        self.admin = np.array(admins, dtype=bool)
        # permutation rank of osm_id in sorted order → numeric tie-break key
        order = sorted(range(len(self.ids)), key=lambda i: self.ids[i])
        self.id_rank = np.empty(len(self.ids), dtype=np.int64)
        for r, i in enumerate(order):
            self.id_rank[i] = r
        self.cell_map = {c: np.array(v, dtype=np.int32) for c, v in tmp_cells.items()}
        # kNN candidate set: admin zones with a finite centroid, SORTED by
        # osm_id so a first-occurrence argmin is the deterministic tie-break
        ok = np.nonzero(self.admin & np.isfinite(self.clon))[0]
        order = sorted(ok, key=lambda i: self.ids[i])
        self.knn_idx = np.array(order, dtype=np.int64)
        self.knn_lon = self.clon[self.knn_idx]
        self.knn_lat = self.clat[self.knn_idx]
        self._build_knn_grid()
        return self

    # zones with more edges than this stay on the stripe-indexed prepared
    # path (their edges dominate total vertex count; exploding them into the
    # flat pair kernel would blow pair×edge memory) — the flat kernel serves
    # the numerous small leaf zones where per-call Python overhead dominated
    FLAT_MAX_EDGES = 4096

    def _build_flat_edges(self, bbs=None) -> None:
        """Concatenated per-zone edge arrays + bbox arrays for the one-shot
        multi-zone PIP kernel (``GeotagActor._containing_zone``). Numpy
        arrays broadcast zero-copy through the object store. ``bbs`` (zone
        bboxes) is derived from the decoded geometry when not supplied."""
        from ..geom.wkb import multipolygon_from_wkb as _from_wkb

        n = len(self.ids)
        self.bminx = np.full(n, np.nan)
        self.bminy = np.full(n, np.nan)
        self.bmaxx = np.full(n, np.nan)
        self.bmaxy = np.full(n, np.nan)
        eoff = np.zeros(n + 1, dtype=np.int64)
        self.big = np.zeros(n, dtype=bool)
        xs1, ys1, xs2, ys2 = [], [], [], []
        total = 0
        for i in range(n):
            wkb = self.wkb[i]
            if wkb is None:
                eoff[i + 1] = total
                continue
            try:
                mp = _from_wkb(wkb)
            except Exception:
                eoff[i + 1] = total
                continue
            if bbs is not None and bbs[i] is not None:
                bb = bbs[i]
            else:
                allx = np.concatenate([r[:, 0] for rings in mp for r in rings])
                ally = np.concatenate([r[:, 1] for rings in mp for r in rings])
                bb = (allx.min(), ally.min(), allx.max(), ally.max())
            self.bminx[i], self.bminy[i], self.bmaxx[i], self.bmaxy[i] = bb
            nedge = sum(r.shape[0] - 1 for rings in mp for r in rings)
            if nedge > self.FLAT_MAX_EDGES:
                self.big[i] = True
                eoff[i + 1] = total
                continue
            for rings in mp:
                for ring in rings:
                    xs1.append(ring[:-1, 0])
                    ys1.append(ring[:-1, 1])
                    xs2.append(ring[1:, 0])
                    ys2.append(ring[1:, 1])
            total += nedge
            eoff[i + 1] = total
        self.eoff = eoff
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
    """Actor-pool ``map_batches`` stage holding the broadcast zone index and a
    per-actor prepared-geometry cache (setup once per actor, SURVEY §7.2)."""

    def __init__(self, index_ref):
        self.idx: ZoneIndexData = ray.get(index_ref)
        self.prepared: dict[int, PreparedPolygon] = {}

    def _prep(self, zi: int) -> PreparedPolygon | None:
        p = self.prepared.get(zi)
        if p is None:
            wkb = self.idx.wkb[zi]
            if wkb is None:
                return None
            try:
                p = PreparedPolygon(multipolygon_from_wkb(wkb))
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
        ei = np.repeat(idx.eoff[pzc], cntc) + within
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
        cnt = idx.eoff[fpz + 1] - idx.eoff[fpz]
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


def build_zone_index(zones: rd.Dataset, cfg: EngineConfig):
    """Broadcast-ready zone index (ray.put once)."""
    return ray.put(ZoneIndexData.from_zones(zones, cfg))


def geotag_docs(
    docs: rd.Dataset, index_ref, cfg: EngineConfig | None = None
) -> rd.Dataset:
    """docs(doc_id, spans, ...) → same rows + ``tiles`` column; ``spans``
    passes through untouched (span-sequence invariant)."""
    cfg = cfg or EngineConfig()
    return docs.map_batches(
        GeotagActor,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=cfg.doc_batch_size,
        concurrency=cfg.geotag_concurrency,
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
