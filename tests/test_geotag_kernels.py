"""Round-3 geotag kernel regressions: the ring-expanding multi-level kNN
must be EXACTLY equivalent to the brute-force nearest-centroid argmin
(including smallest-osm_id tie-breaks), and the flat multi-zone PIP kernel
must match the per-zone prepared-polygon path. Both replaced O(all zones)
per-point work (round-2 VERDICT top task)."""

import numpy as np
import pytest

from cosmogony_ray.stages.geotag import GeotagActor, ZoneIndexData


class _FakeIdx(ZoneIndexData):
    def __init__(self, lons, lats):
        n = lons.size
        self.ids = [f"relation:{i}" for i in range(n)]
        self.knn_idx = np.arange(n, dtype=np.int64)
        self.knn_lon = lons
        self.knn_lat = lats
        self._build_knn_grid()


class _Actor(GeotagActor):
    def __init__(self, idx):
        self.idx = idx
        self.prepared = {}


def _mk_actor(clon, clat):
    idx = _FakeIdx(clon, clat)
    a = _Actor(idx)
    a._knn_rad = (np.radians(clon), np.radians(clat), np.cos(np.radians(clat)))
    return a


@pytest.mark.parametrize(
    "spread", ["world", "cluster", "antimeridian", "polar", "edgeband"]
)
def test_ring_knn_matches_brute(spread):
    rng = np.random.default_rng(11)
    nc, npts = 4000, 3000
    if spread == "world":
        clon = rng.uniform(-180, 180, nc)
        clat = rng.uniform(-85, 85, nc)
        plon = rng.uniform(-180, 180, npts)
        plat = rng.uniform(-90, 90, npts)
    elif spread == "cluster":
        clon = rng.normal(6, 0.5, nc)
        clat = rng.normal(49.6, 0.3, nc)
        plon = rng.normal(6, 2.0, npts)
        plat = rng.normal(49.6, 1.0, npts)
    elif spread == "antimeridian":
        clon = np.where(
            rng.random(nc) < 0.5,
            rng.uniform(170, 180, nc),
            rng.uniform(-180, -170, nc),
        )
        clat = rng.uniform(-60, 60, nc)
        plon = np.where(
            rng.random(npts) < 0.5,
            rng.uniform(170, 180, npts),
            rng.uniform(-180, -170, npts),
        )
        plat = rng.uniform(-60, 60, npts)
    elif spread == "polar":
        clon = rng.uniform(-180, 180, nc)
        clat = rng.uniform(60, 89.9, nc)
        plon = rng.uniform(-180, 180, npts)
        plat = rng.uniform(60, 90, npts)
    else:  # points in a band OUTSIDE the candidate extent (coastal shape)
        clon = rng.uniform(0, 8, nc)
        clat = rng.uniform(0, 8, nc)
        plon = rng.uniform(8, 9, npts)
        plat = rng.uniform(0, 8, npts)
    a = _mk_actor(clon, clat)
    got = a._knn_fallback_batch(plon, plat)
    want = a._knn_brute(plon, plat)
    np.testing.assert_array_equal(got, want)


def test_ring_knn_tie_breaks_to_smallest_osm_id():
    # two equidistant candidates: position order (== osm_id order) must win
    clon = np.concatenate([np.array([1.0, -1.0]), np.linspace(30, 40, 600)])
    clat = np.zeros(clon.size)
    a = _mk_actor(clon, clat)
    got = a._knn_fallback_batch(np.array([0.0]), np.array([0.0]))
    assert got[0] == 0  # relation:0 sorts before relation:1


def test_flat_pip_matches_prepared_path():
    """Flat kernel vs per-zone PreparedPolygon on a nested-rect world with
    boundary-touching points."""
    from cosmogony_ray.config import EngineConfig
    from cosmogony_ray.geom.wkb import multipolygon_to_wkb

    def rect(a, b, c, d):
        return np.array([[a, b], [c, b], [c, d], [a, d], [a, b]], float)

    cfg = EngineConfig()
    idx = ZoneIndexData(cfg)
    ranks, areas = [], []
    tmp = {}
    for d in range(4):
        n = 2**d
        w = 8.0 / n
        for i in range(n):
            for j in range(n):
                bbox = (i * w, j * w, (i + 1) * w, (j + 1) * w)
                idx.ids.append(f"relation:{len(idx.ids)}")
                ranks.append(4 - d)
                areas.append(w * w)
                idx.wkb.append(multipolygon_to_wkb([[rect(*bbox)]]))
                res = idx.cells.cover_res_for_bbox(bbox)
                for c in idx.cells.cover_bbox(bbox, res):
                    tmp.setdefault(int(c), []).append(len(idx.ids) - 1)
    nz = len(idx.ids)
    idx.rank = np.array(ranks, dtype=np.int16)
    idx.area = np.array(areas)
    idx.admin = np.ones(nz, dtype=bool)
    idx.clon = np.full(nz, np.nan)
    idx.clat = np.full(nz, np.nan)
    idx.cell_map = {c: np.array(v, dtype=np.int32) for c, v in tmp.items()}
    idx.id_rank = np.empty(nz, dtype=np.int64)
    for r, i in enumerate(sorted(range(nz), key=lambda i: idx.ids[i])):
        idx.id_rank[i] = r
    idx.knn_idx = np.empty(0, dtype=np.int64)
    idx.knn_lon = idx.knn_lat = np.empty(0)
    idx._build_knn_grid()
    idx._build_flat_edges()
    a = _Actor(idx)

    rng = np.random.default_rng(3)
    lon = np.concatenate([rng.uniform(-1, 9, 2000), np.array([0.0, 8.0, 4.0, 2.0])])
    lat = np.concatenate([rng.uniform(-1, 9, 2000), np.array([0.0, 8.0, 4.0, 2.0])])
    got = a._containing_zone(lon, lat)

    # reference: per-zone prepared path over every zone (no cells, no flat)
    from cosmogony_ray.geom.predicates import PreparedPolygon
    from cosmogony_ray.geom.wkb import multipolygon_from_wkb

    hp, hz = [], []
    for z in range(nz):
        prep = PreparedPolygon(multipolygon_from_wkb(idx.wkb[z]))
        inside = prep.covers_points(lon, lat)
        s = np.nonzero(inside)[0]
        if s.size:
            hp.append(s)
            hz.append(np.full(s.size, z, dtype=np.int64))
    want = np.full(lon.size, -1, dtype=np.int64)
    hp = np.concatenate(hp)
    hz = np.concatenate(hz)
    order = np.lexsort((idx.id_rank[hz], idx.area[hz], idx.rank[hz], hp))
    hps, hzs = hp[order], hz[order]
    first = np.ones(hps.size, dtype=bool)
    first[1:] = hps[1:] != hps[:-1]
    want[hps[first]] = hzs[first]
    np.testing.assert_array_equal(got, want)
