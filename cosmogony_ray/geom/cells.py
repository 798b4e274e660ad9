"""Injectable spatial cell scheme — the H3/S2 stand-in.

The north_rule mandates an "H3/S2 cell covering of each boundary stored in a
per-partition cell→zone inverted index". No h3/s2 wheel exists in this
environment, so the default scheme is a hierarchical integer lat/lon grid
(quadtree-flavored: resolution r splits the world into 2^r × 2^r cells).
The scheme is injectable (SURVEY.md §7.0): any object with the same methods
(``cell_of``, ``cover_bbox``, ``ladder``, ``parent``) can replace it — an h3
adapter would implement the identical surface.

Cell ids are int64: ``(res << 58) | (iy << 29) | ix`` — res ≤ 29, ix/iy < 2^29.
A point probed at every ladder resolution meets any build-side zone covered at
its own (possibly coarser) resolution — the classic hierarchical-grid spatial
join (replaces the reference's in-process R-tree,
/root/reference/src/hierarchy_builder.rs:34-74).
"""

from __future__ import annotations

import numpy as np

WORLD = (-180.0, -90.0, 180.0, 90.0)


class GridCells:
    """Hierarchical lat/lon grid over WORLD bounds.

    ``ladder`` is the ordered list of resolutions probes must check; build
    zones pick, per zone, the finest ladder resolution whose bbox covering
    stays under ``max_cells_per_zone`` (mega-zone coarsening — a country
    polygon never explodes into millions of covering rows; SURVEY.md §7.4).
    """

    def __init__(self, min_res: int = 2, max_res: int = 12, max_cells_per_zone: int = 64):
        if not (0 <= min_res <= max_res <= 29):
            raise ValueError("resolutions must satisfy 0 <= min <= max <= 29")
        self.ladder = list(range(min_res, max_res + 1))
        self.max_cells_per_zone = max_cells_per_zone

    @staticmethod
    def _encode(res: int, ix, iy):
        return (np.int64(res) << np.int64(58)) | (iy.astype(np.int64) << np.int64(29)) | ix.astype(np.int64)

    @staticmethod
    def res_of(cell_id: int) -> int:
        return int(cell_id >> 58)

    def _grid_index(self, lon, lat, res: int):
        n = 1 << res
        fx = (np.asarray(lon, dtype=np.float64) - WORLD[0]) / (WORLD[2] - WORLD[0])
        fy = (np.asarray(lat, dtype=np.float64) - WORLD[1]) / (WORLD[3] - WORLD[1])
        ix = np.clip((fx * n).astype(np.int64), 0, n - 1)
        iy = np.clip((fy * n).astype(np.int64), 0, n - 1)
        return ix, iy

    def cell_of(self, lon, lat, res: int):
        """Vectorized: cell id at one resolution for arrays of lon/lat."""
        ix, iy = self._grid_index(lon, lat, res)
        return self._encode(res, ix, iy)

    def cells_of_ladder(self, lon, lat) -> np.ndarray:
        """(len(ladder), n_points) int64 — every ladder cell of each point."""
        lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
        lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
        return np.stack([self.cell_of(lon, lat, r) for r in self.ladder])

    def parent(self, cell_id: int, res: int) -> int:
        r = self.res_of(cell_id)
        if res > r:
            raise ValueError("parent resolution must be coarser")
        ix = cell_id & ((1 << 29) - 1)
        iy = (cell_id >> 29) & ((1 << 29) - 1)
        shift = r - res
        return int(self._encode(res, np.int64(ix >> shift), np.int64(iy >> shift)))

    def _bbox_cover_count(self, bbox, res: int) -> int:
        ix0, iy0 = self._grid_index(bbox[0], bbox[1], res)
        ix1, iy1 = self._grid_index(bbox[2], bbox[3], res)
        return int((ix1 - ix0 + 1) * (iy1 - iy0 + 1))

    def cover_res_for_bbox(self, bbox) -> int:
        """Finest ladder resolution keeping the bbox covering ≤ max cells."""
        chosen = self.ladder[0]
        for r in self.ladder:
            if self._bbox_cover_count(bbox, r) <= self.max_cells_per_zone:
                chosen = r
            else:
                break
        return chosen

    def cover_bbox(self, bbox, res: int | None = None) -> np.ndarray:
        """int64 cell ids covering the bbox at ``res`` (auto-chosen if None)."""
        if res is None:
            res = self.cover_res_for_bbox(bbox)
        ix0, iy0 = self._grid_index(bbox[0], bbox[1], res)
        ix1, iy1 = self._grid_index(bbox[2], bbox[3], res)
        ix = np.arange(int(ix0), int(ix1) + 1, dtype=np.int64)
        iy = np.arange(int(iy0), int(iy1) + 1, dtype=np.int64)
        gx, gy = np.meshgrid(ix, iy)
        return self._encode(res, gx.ravel(), gy.ravel())

    def cell_bbox(self, cell_id: int) -> tuple[float, float, float, float]:
        res = self.res_of(cell_id)
        n = 1 << res
        ix = cell_id & ((1 << 29) - 1)
        iy = (cell_id >> 29) & ((1 << 29) - 1)
        w = (WORLD[2] - WORLD[0]) / n
        h = (WORLD[3] - WORLD[1]) / n
        return (
            WORLD[0] + ix * w,
            WORLD[1] + iy * h,
            WORLD[0] + (ix + 1) * w,
            WORLD[1] + (iy + 1) * h,
        )


DEFAULT_CELLS = GridCells()
