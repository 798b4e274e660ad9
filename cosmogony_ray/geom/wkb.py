"""Minimal WKB (well-known binary) codec for Point / Polygon / MultiPolygon.

Geometry travels through Ray Data blocks as WKB ``binary`` columns
(SURVEY.md §1.4); inside ``map_batches`` stages we decode to a
numpy-friendly "rings" representation:

    MultiPolygon  = list[Polygon]
    Polygon       = list[Ring]      # rings[0] = exterior, rest = holes
    Ring          = np.ndarray (N, 2) float64, closed (first row == last row)

This replaces the reference's geo-types/GEOS geometry model
(/root/reference/cosmogony/src/zone.rs:77-95 serializes boundary as GeoJSON;
we keep WKB internally and emit GeoJSON only at the JSON sink).

Only little-endian WKB is produced; both byte orders are accepted on read.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6

MultiPolygon = list  # list[list[np.ndarray]]


def _close_ring(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if ring.shape[0] < 3:
        raise ValueError("ring needs >= 3 points")
    # scalar compares, not array_equal: this runs per ring in the assembly
    # hot loop and array_equal's dispatch cost dominated it (NaN endpoints
    # compare unequal either way, so behavior is identical)
    if ring[0, 0] != ring[-1, 0] or ring[0, 1] != ring[-1, 1]:
        ring = np.vstack([ring, ring[:1]])
    return ring


def point_to_wkb(lon: float, lat: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, lon, lat)


def point_from_wkb(buf: bytes) -> tuple[float, float]:
    bo = "<" if buf[0] == 1 else ">"
    gtype, lon, lat = struct.unpack(bo + "Idd", buf[1:21])
    if gtype != WKB_POINT:
        raise ValueError(f"not a WKB point: type={gtype}")
    return lon, lat


def _ring_bytes(ring: np.ndarray) -> bytes:
    ring = _close_ring(ring)
    return struct.pack("<I", ring.shape[0]) + ring.astype("<f8").tobytes()


def polygon_to_wkb(rings: list[np.ndarray]) -> bytes:
    out = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    out.extend(_ring_bytes(r) for r in rings)
    return b"".join(out)


def multipolygon_to_wkb(mpoly: MultiPolygon) -> bytes:
    out = [struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(mpoly))]
    for rings in mpoly:
        out.append(polygon_to_wkb(rings))
    return b"".join(out)


def _read_rings(buf: bytes, off: int, bo: str) -> tuple[list[np.ndarray], int]:
    (nrings,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    rings = []
    for _ in range(nrings):
        (npts,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        arr = np.frombuffer(buf, dtype=bo + "f8", count=npts * 2, offset=off)
        rings.append(arr.reshape(npts, 2).astype(np.float64, copy=False))
        off += npts * 16
    return rings, off


def multipolygon_from_wkb(buf: bytes) -> MultiPolygon:
    """Decode WKB Polygon or MultiPolygon into the rings representation."""
    bo = "<" if buf[0] == 1 else ">"
    (gtype,) = struct.unpack_from(bo + "I", buf, 1)
    if gtype == WKB_POLYGON:
        rings, _ = _read_rings(buf, 5, bo)
        return [rings]
    if gtype != WKB_MULTIPOLYGON:
        raise ValueError(f"unsupported WKB type {gtype}")
    (npoly,) = struct.unpack_from(bo + "I", buf, 5)
    off = 9
    mpoly = []
    for _ in range(npoly):
        pbo = "<" if buf[off] == 1 else ">"
        (ptype,) = struct.unpack_from(pbo + "I", buf, off + 1)
        if ptype != WKB_POLYGON:
            raise ValueError("multipolygon member is not a polygon")
        rings, off = _read_rings(buf, off + 5, pbo)
        mpoly.append(rings)
    return mpoly


def multipolygon_to_geojson(mpoly: MultiPolygon) -> dict:
    """GeoJSON geometry dict (the JSON-sink format of the reference,
    /root/reference/cosmogony/src/zone.rs:185-201)."""
    return {
        "type": "MultiPolygon",
        "coordinates": [[r.tolist() for r in rings] for rings in mpoly],
    }


def geojson_to_multipolygon(geom: dict) -> MultiPolygon:
    t = geom["type"]
    if t == "Polygon":
        return [[_close_ring(np.asarray(r, dtype=np.float64)) for r in geom["coordinates"]]]
    if t == "MultiPolygon":
        return [
            [_close_ring(np.asarray(r, dtype=np.float64)) for r in rings]
            for rings in geom["coordinates"]
        ]
    raise ValueError(f"unsupported geojson type {t}")
