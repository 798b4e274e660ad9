"""Deterministic doc→point derivation for correctness oracles.

Maps each doc_id to a (lon, lat) in/around the mini-lux world via md5 — the
identical arithmetic is expressible in DuckDB
(``('0x' || substring(md5(id),1,8))::UBIGINT / 2^32 * scale``), giving the
geotag pipeline a bit-exact SQL oracle. Lon spans [0, 9): ~11% of points fall
outside the (0..8) world and exercise the kNN-centroid fallback."""

from __future__ import annotations

import hashlib

import numpy as np

LON_SCALE = 9.0
LAT_SCALE = 8.0


def doc_point(doc_id) -> tuple[float, float]:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    lon = int(h[0:8], 16) / 4294967296.0 * LON_SCALE
    lat = int(h[8:16], 16) / 4294967296.0 * LAT_SCALE
    return lon, lat


def doc_points(doc_ids) -> tuple[np.ndarray, np.ndarray]:
    lons = np.empty(len(doc_ids))
    lats = np.empty(len(doc_ids))
    for i, d in enumerate(doc_ids):
        lons[i], lats[i] = doc_point(d)
    return lons, lats


SQL_POINT_EXPRS = (
    "('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8))::UBIGINT / 4294967296.0 * 9.0",
    "('0x' || substring(md5(CAST(doc_id AS VARCHAR)),9,8))::UBIGINT / 4294967296.0 * 8.0",
)
