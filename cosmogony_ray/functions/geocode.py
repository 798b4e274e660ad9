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
    """Batched ``doc_point``: one md5 digest per id is unavoidable, but the
    hex-substring parsing is replaced by a single big-endian u4 reinterpret
    of the concatenated first-8-byte digests (hexdigest[0:8]/[8:16] ARE
    digest bytes 0-4 / 4-8 big-endian, so this is bit-exact vs doc_point)."""
    md5 = hashlib.md5
    raw = b"".join(md5(str(d).encode()).digest()[:8] for d in doc_ids)
    words = np.frombuffer(raw, dtype=">u4").reshape(-1, 2).astype(np.float64)
    return words[:, 0] * (LON_SCALE / 4294967296.0), words[:, 1] * (LAT_SCALE / 4294967296.0)


SQL_POINT_EXPRS = (
    "('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,8))::UBIGINT / 4294967296.0 * 9.0",
    "('0x' || substring(md5(CAST(doc_id AS VARCHAR)),9,8))::UBIGINT / 4294967296.0 * 8.0",
)
