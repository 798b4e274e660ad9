"""Raster ↔ vector stage (stages/raster.py): rasterization against the
geotag point→zone kernel, vectorization (run-length + CC region merge)
against hand-drawn rasters including cross-band stitching."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from cosmogony_ray.stages.raster import vectorize_raster


def _raster_from_grid(grid: list[str]) -> rd.Dataset:
    """ASCII grid → raster Dataset ('.' = background/null)."""
    px, py, val = [], [], []
    for y, row in enumerate(grid):
        for x, ch in enumerate(row):
            px.append(x)
            py.append(y)
            val.append(None if ch == "." else ch)
    return rd.from_arrow(
        pa.table(
            {
                "px": pa.array(px, type=pa.int32()),
                "py": pa.array(py, type=pa.int32()),
                "zone_osm_id": pa.array(val, type=pa.string()),
            }
        )
    )


def _regions(grid: list[str], band_rows: int = 64):
    width = len(grid[0])
    out = vectorize_raster(
        _raster_from_grid(grid), width=width, band_rows=band_rows
    ).to_pandas()
    return sorted(
        (r.value, int(r.min_px), int(r.min_py), int(r.max_px), int(r.max_py), int(r.n_pixels))
        for r in out.itertuples()
    )


class TestVectorize:
    def test_two_disjoint_regions_same_value(self, ray_session):
        got = _regions([
            "aa..aa",
            "aa..aa",
        ])
        assert got == [
            ("a", 0, 0, 1, 1, 4),
            ("a", 4, 0, 5, 1, 4),
        ]

    def test_ring_is_one_region(self, ray_session):
        got = _regions([
            "aaaa",
            "ab.a",
            "abaa",
            "aaaa",
        ])
        # ring 'a' is 4-connected around the hole; 'b' is a vertical domino;
        # '.' background. a-pixels: 16 - 2(b) - 1(.) = 13
        assert got == [
            ("a", 0, 0, 3, 3, 13),
            ("b", 1, 1, 1, 2, 2),
        ]

    def test_diagonal_not_connected(self, ray_session):
        got = _regions([
            "a.",
            ".a",
        ])
        assert got == [
            ("a", 0, 0, 0, 0, 1),
            ("a", 1, 1, 1, 1, 1),
        ]

    def test_cross_band_stitching(self, ray_session):
        # a vertical bar spanning 10 rows with band_rows=3 forces region
        # merges ACROSS four band partitions (halo-exchange correctness)
        grid = ["ba"] + [".a"] * 8 + ["ca"]
        got = _regions(grid, band_rows=3)
        assert got == [
            ("a", 1, 0, 1, 9, 10),
            ("b", 0, 0, 0, 0, 1),
            ("c", 0, 9, 0, 9, 1),
        ]


class TestRasterize:
    def test_rasterize_matches_geotag_semantics(self, ray_session, mini_lux_dir):
        import os

        from cosmogony_ray.config import EngineConfig
        from cosmogony_ray.pipelines.cosmogony import build_cosmogony
        from cosmogony_ray.stages.geotag import GeotagActor, build_zone_index
        from cosmogony_ray.stages.raster import rasterize_zones

        import ray

        cfg = EngineConfig(rules_dir=os.path.join(mini_lux_dir, "rules"))
        cosmo = build_cosmogony(mini_lux_dir, cfg, with_stats=False)
        idx_ref = build_zone_index(cosmo.zones, cfg, pack_ref=cosmo.geom_pack_ref)
        W = H = 32
        bbox = (0.0, 0.0, 8.0, 8.0)
        ras = rasterize_zones(
            idx_ref, bbox=bbox, width=W, height=H, tile_px=16
        ).to_pandas()
        assert len(ras) == W * H
        # every pixel center resolves to the SAME zone the geotag kernel
        # gives the raw point
        actor = GeotagActor(idx=ray.get(idx_ref))
        px = ras["px"].to_numpy()
        py = ras["py"].to_numpy()
        lon = (px + 0.5) * (8.0 / W)
        lat = (py + 0.5) * (8.0 / H)
        zi = actor._containing_zone(lon.astype(np.float64), lat.astype(np.float64))
        want = [actor.idx.ids[i] if i >= 0 else None for i in zi]
        got = [None if v is None else v for v in ras["zone_osm_id"]]
        assert got == want
        # round-trip: vectorize the raster; per-zone pixel totals match
        regions = vectorize_raster(
            _raster_from_grid_df(ras, W), width=W
        ).to_pandas()
        per_zone = regions.groupby("value")["n_pixels"].sum().to_dict()
        import collections

        want_counts = collections.Counter(v for v in want if v is not None)
        assert per_zone == dict(want_counts)


def _raster_from_grid_df(df, width):
    return rd.from_arrow(
        pa.table(
            {
                "px": pa.array(df["px"].to_numpy(), type=pa.int32()),
                "py": pa.array(df["py"].to_numpy(), type=pa.int32()),
                "zone_osm_id": pa.array(
                    [None if v is None else v for v in df["zone_osm_id"]],
                    type=pa.string(),
                ),
            }
        )
    )


def test_write_raster_tiles_partitioned(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from cosmogony_ray.stages.raster import write_raster_tiles

    ras = _raster_from_grid(["aaaa", "aabb", "bbbb", "...."])
    out = str(tmp_path / "tiles")
    write_raster_tiles(ras, out, tile_px=2)
    # 4x4 raster at tile_px=2 -> 2x2 tile dirs
    dirs = sorted(
        f"{ty}/{tx}"
        for ty in os.listdir(out)
        for tx in os.listdir(os.path.join(out, ty))
    )
    assert dirs == ["tile_y=0/tile_x=0", "tile_y=0/tile_x=1", "tile_y=1/tile_x=0", "tile_y=1/tile_x=1"]
    back = pq.read_table(out)
    assert back.num_rows == 16


def test_rasterize_knn_fill(ray_session, mini_lux_dir):
    """knn_fill=True assigns outside-world pixels the nearest admin
    centroid (the geotag fallback) instead of null."""
    import os

    from cosmogony_ray.config import EngineConfig
    from cosmogony_ray.pipelines.cosmogony import build_cosmogony
    from cosmogony_ray.stages.geotag import build_zone_index
    from cosmogony_ray.stages.raster import rasterize_zones

    cfg = EngineConfig(rules_dir=os.path.join(mini_lux_dir, "rules"))
    cosmo = build_cosmogony(mini_lux_dir, cfg, with_stats=False)
    idx_ref = build_zone_index(cosmo.zones, cfg, pack_ref=cosmo.geom_pack_ref)
    # bbox extends well past the [0,8]^2 world -> the outer ring of pixels
    # is outside every boundary
    kw = dict(bbox=(-8.0, -8.0, 24.0, 24.0), width=16, height=16, tile_px=8)
    plain = rasterize_zones(idx_ref, knn_fill=False, **kw).to_pandas()
    filled = rasterize_zones(idx_ref, knn_fill=True, **kw).to_pandas()
    assert plain["zone_osm_id"].isna().sum() > 0
    assert filled["zone_osm_id"].isna().sum() == 0
    # where the plain raster had a zone, knn_fill must not change it
    m = plain["zone_osm_id"].notna()
    key = ["px", "py"]
    a = plain[m].sort_values(key)["zone_osm_id"].tolist()
    b = filled.merge(plain[m][key], on=key).sort_values(key)["zone_osm_id"].tolist()
    assert a == b


def test_vectorize_band_rows_one_extreme_halo(ray_session):
    """band_rows=1: every row pair crosses a band boundary — the halo
    (ghost-row) machinery carries ALL vertical adjacency."""
    from cosmogony_ray.stages.raster import vectorize_raster

    grid = ["aa", "aa", "aa", "aa"]
    out = vectorize_raster(
        _raster_from_grid(grid), width=2, band_rows=1
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["min_px"], r["min_py"], r["max_px"], r["max_py"], r["n_pixels"]) == (0, 0, 1, 3, 8)


def test_vectorize_driver_cc_equals_distributed(ray_session):
    """The round-5 driver union-find fast path must produce IDENTICAL
    regions to the distributed large-star/small-star CC on the same
    raster (driver_cc_max_edges=0 forces the distributed path)."""
    import numpy as np

    from cosmogony_ray.stages.raster import vectorize_raster

    rng = np.random.RandomState(11)
    grid = ["".join(rng.choice(list("abc"), size=24)) for _ in range(24)]
    fast = (
        vectorize_raster(_raster_from_grid(grid), width=24, band_rows=4)
        .to_pandas().sort_values("region_id").reset_index(drop=True)
    )
    dist = (
        vectorize_raster(
            _raster_from_grid(grid), width=24, band_rows=4, driver_cc_max_edges=0
        )
        .to_pandas().sort_values("region_id").reset_index(drop=True)
    )
    assert fast.equals(dist)
    assert len(fast) > 10  # random grid → many regions
