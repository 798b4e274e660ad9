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
                    res = self.cells.cover_res_for_bbox(bbox)
                    for c in self.cells.cover_bbox(bbox, res):
                        tmp_cells.setdefault(int(c), []).append(i)
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
        return self


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
    def _containing_zone(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Per point: index of smallest covering zone, or -1.

        Candidate lookup iterates UNIQUE cells (points cluster heavily per
        cell), PIP runs once per candidate zone over all its points, and the
        (rank, area, id) argmin is a single vectorized lexsort — no per-point
        Python in the common path."""
        idx = self.idx
        n = lon.shape[0]
        ok = np.isfinite(lon)
        ladder_cells = idx.cells.cells_of_ladder(lon, lat)  # (L, n)
        zone_points: dict[int, list[np.ndarray]] = {}
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
                for z in arr:
                    zone_points.setdefault(int(z), []).append(pts)
        # hit rows: (point, zone) where PIP passes
        hit_pts: list[np.ndarray] = []
        hit_zone: list[np.ndarray] = []
        for z, pts_list in zone_points.items():
            pts = np.unique(np.concatenate(pts_list))
            prep = self._prep(z)
            if prep is None:
                continue
            inside = prep.covers_points(lon[pts], lat[pts])
            if inside.any():
                sel = pts[inside]
                hit_pts.append(sel)
                hit_zone.append(np.full(sel.size, z, dtype=np.int64))
        best = np.full(n, -1, dtype=np.int64)
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

    def _knn_fallback_batch(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Exact nearest-admin-centroid per point, vectorized over the whole
        batch of fallback points in edge-chunked matrix form; ties resolve to
        the smallest osm_id (candidate array is pre-sorted by osm_id).

        The fallback rate is a few percent of spans; a chunked
        (n_miss × n_zones) haversine matrix keeps it numpy-bound. An
        LSH/cell-pruned variant is the documented scale path if the fallback
        share ever dominates (SURVEY §2.4 J7)."""
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
        clon_r, clat_r, ccos = self._knn_rad
        best = np.full(lon.shape[0], -1, dtype=np.int64)
        # chunk over POINTS so the (chunk × n_candidates) temporaries stay
        # cache-sized — full-batch matrices caused an allocation storm that
        # collapsed multi-actor scaling
        chunk = max(1, (1 << 19) // max(1, idx.knn_idx.size))
        for s in range(0, lon.shape[0], chunk):
            plon = np.radians(lon[s : s + chunk])[:, None]
            plat = np.radians(lat[s : s + chunk])[:, None]
            sd_lat = np.sin((clat_r[None, :] - plat) / 2)
            sd_lon = np.sin((clon_r[None, :] - plon) / 2)
            a = sd_lat * sd_lat + np.cos(plat) * ccos[None, :] * sd_lon * sd_lon
            ci = np.argmin(a, axis=1)  # monotone in distance; first min = smallest id
            best[s : s + chunk] = idx.knn_idx[ci]
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
