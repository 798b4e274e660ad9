"""Pure-Python .osm.pbf reader → the engine's three OSM-shaped tables.

The ingestion frontend for S1 parity: the reference reads PBF extracts with
``osmpbfreader`` (/root/reference/src/lib.rs:243-249); this module decodes
the same format (OSM PBF: length-prefixed BlobHeader/Blob frames of
zlib-compressed PrimitiveBlock protobufs) with a hand-rolled protobuf
wire-format decoder — no compiled schemas needed. The transitive dependency
closure itself stays where it already lives: the assembly joins
(stages.zone_build) only keep referenced ways/nodes.

Format reference (public): https://wiki.openstreetmap.org/wiki/PBF_Format.
Supported: DenseNodes, plain Nodes, Ways, Relations; zlib and raw blobs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

# ------------------------------------------------------- protobuf wire layer


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message.
    wire 0 → varint int, wire 2 → bytes, wire 5/1 → fixed32/64 (skipped)."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _varint(buf, pos)
            yield field, wire, v
        elif wire == 2:
            ln, pos = _varint(buf, pos)
            yield field, wire, buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            yield field, wire, buf[pos : pos + 4]
            pos += 4
        elif wire == 1:
            yield field, wire, buf[pos : pos + 8]
            pos += 8
        else:  # pragma: no cover - groups unused in OSM PBF
            raise ValueError(f"unsupported wire type {wire}")


def _packed_varints(buf: bytes) -> list[int]:
    out = []
    pos = 0
    n = len(buf)
    while pos < n:
        v, pos = _varint(buf, pos)
        out.append(v)
    return out


def _packed_sint_delta(buf: bytes) -> list[int]:
    out = []
    acc = 0
    for v in _packed_varints(buf):
        acc += _zigzag(v)
        out.append(acc)
    return out


# ------------------------------------------------------------- PBF framing


def _blobs(path: str):
    """Yield (blob_type, decompressed bytes) for each blob in the file."""
    with open(path, "rb") as f:
        while True:
            lenbuf = f.read(4)
            if len(lenbuf) < 4:
                return
            (hlen,) = struct.unpack(">I", lenbuf)
            header = f.read(hlen)
            btype = None
            datasize = 0
            for field, wire, v in _fields(header):
                if field == 1 and wire == 2:
                    btype = v.decode()
                elif field == 3 and wire == 0:
                    datasize = v
            blob = f.read(datasize)
            raw = None
            other = None
            for field, wire, v in _fields(blob):
                if field == 1 and wire == 2:  # raw
                    raw = v
                elif field == 3 and wire == 2:  # zlib_data
                    raw = zlib.decompress(v)
                elif field in (4, 5, 6, 7) and wire == 2:  # lzma/bzip2/lz4/zstd
                    other = field
            if raw is not None:
                yield btype, raw
            elif other is not None:
                names = {4: "lzma", 5: "bzip2", 6: "lz4", 7: "zstd"}
                raise ValueError(
                    f"unsupported blob compression: {names[other]} "
                    "(only raw and zlib blobs are supported)"
                )


# ------------------------------------------------------ PrimitiveBlock layer

MEMBER_KIND = {0: "node", 1: "way", 2: "relation"}


class _Tables:
    def __init__(self):
        self.node_id: list[int] = []
        self.node_lon: list[float] = []
        self.node_lat: list[float] = []
        self.node_tags: list[list] = []
        self.way_id: list[int] = []
        self.way_refs: list[list[int]] = []
        self.rel_id: list[int] = []
        self.rel_tags: list[list] = []
        self.rel_members: list[list[dict]] = []


def _decode_dense(buf: bytes, strings: list[str], gran, lat_off, lon_off, out: _Tables):
    ids = lats = lons = kvs = None
    for field, wire, v in _fields(buf):
        if field == 1:
            ids = _packed_sint_delta(v)
        elif field == 8:
            lats = _packed_sint_delta(v)
        elif field == 9:
            lons = _packed_sint_delta(v)
        elif field == 10:
            kvs = _packed_varints(v)
    if ids is None:
        return
    tags_per = [[] for _ in ids]
    if kvs:
        di = 0
        i = 0
        while i < len(kvs):
            if kvs[i] == 0:
                di += 1
                i += 1
            else:
                tags_per[di].append((strings[kvs[i]], strings[kvs[i + 1]]))
                i += 2
    for j, nid in enumerate(ids):
        out.node_id.append(nid)
        out.node_lat.append(1e-9 * (lat_off + gran * lats[j]))
        out.node_lon.append(1e-9 * (lon_off + gran * lons[j]))
        out.node_tags.append(tags_per[j])


def _decode_node(buf: bytes, strings, gran, lat_off, lon_off, out: _Tables):
    nid = lat = lon = None
    keys = vals = ()
    for field, wire, v in _fields(buf):
        if field == 1:
            # Node.id is sint64 in the PBF spec — zigzag like lat/lon below
            nid = _zigzag(v) if wire == 0 else None
        elif field == 2:
            keys = _packed_varints(v)
        elif field == 3:
            vals = _packed_varints(v)
        elif field == 8:
            lat = _zigzag(v) if wire == 0 else None
        elif field == 9:
            lon = _zigzag(v) if wire == 0 else None
    if nid is None:
        return
    out.node_id.append(nid)
    out.node_lat.append(1e-9 * (lat_off + gran * (lat or 0)))
    out.node_lon.append(1e-9 * (lon_off + gran * (lon or 0)))
    out.node_tags.append([(strings[k], strings[w]) for k, w in zip(keys, vals)])


def _decode_way(buf: bytes, strings, out: _Tables):
    wid = None
    keys = vals = ()
    refs: list[int] = []
    for field, wire, v in _fields(buf):
        if field == 1:
            wid = v
        elif field == 2:
            keys = _packed_varints(v)
        elif field == 3:
            vals = _packed_varints(v)
        elif field == 8:
            refs = _packed_sint_delta(v)
    if wid is None:
        return
    out.way_id.append(wid)
    out.way_refs.append(refs)


def _decode_relation(buf: bytes, strings, out: _Tables):
    rid = None
    keys = vals = roles = types = ()
    memids: list[int] = []
    for field, wire, v in _fields(buf):
        if field == 1:
            rid = v
        elif field == 2:
            keys = _packed_varints(v)
        elif field == 3:
            vals = _packed_varints(v)
        elif field == 8:
            roles = _packed_varints(v)
        elif field == 9:
            memids = _packed_sint_delta(v)
        elif field == 10:
            types = _packed_varints(v)
    if rid is None:
        return
    out.rel_id.append(rid)
    out.rel_tags.append([(strings[k], strings[w]) for k, w in zip(keys, vals)])
    out.rel_members.append(
        [
            {
                "role": strings[roles[i]] if i < len(roles) else "",
                "ref_kind": MEMBER_KIND.get(types[i] if i < len(types) else 0, "node"),
                "ref_id": memids[i],
            }
            for i in range(len(memids))
        ]
    )


def _decode_block(buf: bytes, out: _Tables):
    strings: list[str] = []
    groups: list[bytes] = []
    gran = 100
    lat_off = 0
    lon_off = 0
    for field, wire, v in _fields(buf):
        if field == 1 and wire == 2:  # stringtable
            for f2, w2, v2 in _fields(v):
                if f2 == 1 and w2 == 2:
                    strings.append(v2.decode("utf-8", "replace"))
        elif field == 2 and wire == 2:
            groups.append(v)
        elif field == 17 and wire == 0:
            gran = v
        elif field == 19 and wire == 0:
            lat_off = v
        elif field == 20 and wire == 0:
            lon_off = v
    for g in groups:
        for field, wire, v in _fields(g):
            if field == 1 and wire == 2:
                _decode_node(v, strings, gran, lat_off, lon_off, out)
            elif field == 2 and wire == 2:
                _decode_dense(v, strings, gran, lat_off, lon_off, out)
            elif field == 3 and wire == 2:
                _decode_way(v, strings, out)
            elif field == 4 and wire == 2:
                _decode_relation(v, strings, out)


def read_pbf_tables(path: str) -> dict[str, pa.Table]:
    """Decode a .osm.pbf file into the engine's three Arrow tables
    (nodes / ways / relations — FIXTURES.md schemas)."""
    from ..fixtures.synth import MEMBER_T, TAGS_T

    out = _Tables()
    for btype, raw in _blobs(path):
        if btype == "OSMData":
            _decode_block(raw, out)
    nodes = pa.table(
        {
            "osm_id": pa.array(out.node_id, type=pa.int64()),
            "lon": pa.array(out.node_lon, type=pa.float64()),
            "lat": pa.array(out.node_lat, type=pa.float64()),
            "tags": pa.array(out.node_tags, type=TAGS_T),
        }
    )
    ways = pa.table(
        {
            "osm_id": pa.array(out.way_id, type=pa.int64()),
            "node_ids": pa.array(out.way_refs, type=pa.list_(pa.int64())),
        }
    )
    relations = pa.table(
        {
            "osm_id": pa.array(out.rel_id, type=pa.int64()),
            "tags": pa.array(out.rel_tags, type=TAGS_T),
            "members": pa.array(out.rel_members, type=pa.list_(MEMBER_T)),
        }
    )
    return {"nodes": nodes, "ways": ways, "relations": relations}


def pbf_to_parquet(pbf_path: str, out_dir: str, row_group_size: int = 16384) -> str:
    """``cosmogony_ray ingest``: split a .osm.pbf into the three parquet
    tables the pipeline reads (small row groups so Ray can split reads)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for name, tbl in read_pbf_tables(pbf_path).items():
        pq.write_table(
            tbl, os.path.join(out_dir, f"{name}.parquet"), row_group_size=row_group_size
        )
    return out_dir
