"""Round-2 ADVICE regression tests: plain (non-dense) Node ids are sint64
(zigzag), unsupported blob compressions raise instead of silently skipping,
and dangling way→node refs are dropped (inner-join semantics) in the
broadcast assembly path.

Uses a minimal test-only PBF *encoder* (protobuf wire format by hand) since
no real extract with plain Nodes ships with the reference fixtures — modern
extracts all use DenseNodes."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

# ---------------------------------------------------------------- wire enc


def _enc_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _tag(field: int, wire: int) -> bytes:
    return _enc_varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _enc_varint(len(payload)) + payload


def _vint_field(field: int, v: int) -> bytes:
    return _tag(field, 0) + _enc_varint(v)


def _packed(field: int, values: list[int]) -> bytes:
    return _len_field(field, b"".join(_enc_varint(v) for v in values))


def _plain_node(nid: int, lon_deg: float, lat_deg: float, kv: list[tuple[int, int]]) -> bytes:
    # granularity 100, offsets 0: raw = deg * 1e9 / 100
    lat = round(lat_deg * 1e7)
    lon = round(lon_deg * 1e7)
    msg = _vint_field(1, _zz(nid))
    if kv:
        msg += _packed(2, [k for k, _ in kv]) + _packed(3, [v for _, v in kv])
    msg += _vint_field(8, _zz(lat)) + _vint_field(9, _zz(lon))
    return msg


def _block(nodes: list[bytes], strings: list[str]) -> bytes:
    st = b"".join(_len_field(1, s.encode()) for s in strings)
    group = b"".join(_len_field(1, n) for n in nodes)
    return _len_field(1, st) + _len_field(2, group)


def _frame(btype: str, raw: bytes, blob_field: int = 3) -> bytes:
    """One BlobHeader/Blob frame. blob_field 3 = zlib_data (the normal
    case); any other value is written verbatim as that Blob field."""
    if blob_field == 3:
        blob = _vint_field(2, len(raw)) + _len_field(3, zlib.compress(raw))
    elif blob_field == 1:
        blob = _len_field(1, raw)
    else:
        blob = _len_field(blob_field, raw)
    header = _len_field(1, btype.encode()) + _vint_field(3, len(blob))
    return struct.pack(">I", len(header)) + header + blob


# ------------------------------------------------------------------- tests


def test_plain_node_ids_are_zigzag(tmp_path):
    from cosmogony_ray.sources.pbf import read_pbf_tables

    strings = ["", "place", "city"]
    nodes = [
        _plain_node(42, 6.13, 49.61, [(1, 2)]),
        _plain_node(7001, -71.2, 46.8, []),
    ]
    path = tmp_path / "plain.osm.pbf"
    path.write_bytes(
        _frame("OSMHeader", b"") + _frame("OSMData", _block(nodes, strings))
    )
    t = read_pbf_tables(str(path))
    assert t["nodes"]["osm_id"].to_pylist() == [42, 7001]
    lon = t["nodes"]["lon"].to_pylist()
    lat = t["nodes"]["lat"].to_pylist()
    assert abs(lon[0] - 6.13) < 1e-7 and abs(lat[0] - 49.61) < 1e-7
    assert abs(lon[1] + 71.2) < 1e-7 and abs(lat[1] - 46.8) < 1e-7
    assert t["nodes"]["tags"].to_pylist()[0] == [("place", "city")]


def test_raw_blob_roundtrip(tmp_path):
    from cosmogony_ray.sources.pbf import read_pbf_tables

    path = tmp_path / "raw.osm.pbf"
    path.write_bytes(
        _frame("OSMData", _block([_plain_node(5, 1.0, 2.0, [])], [""]), blob_field=1)
    )
    t = read_pbf_tables(str(path))
    assert t["nodes"]["osm_id"].to_pylist() == [5]


def test_unsupported_blob_compression_raises(tmp_path):
    from cosmogony_ray.sources.pbf import read_pbf_tables

    path = tmp_path / "lz4.osm.pbf"
    path.write_bytes(_frame("OSMData", b"\x00junk", blob_field=6))  # lz4_data
    with pytest.raises(ValueError, match="unsupported blob compression: lz4"):
        read_pbf_tables(str(path))


def test_way_geo_drops_dangling_node_refs(ray_session):
    """Broadcast assembly: a way referencing a missing node keeps the valid
    coordinates only (inner-join semantics, same as the distributed path)."""
    import ray

    from cosmogony_ray.stages.zone_build import _build_node_pack, _way_geo_fn

    tag_t = pa.list_(pa.struct([("key", pa.string()), ("value", pa.string())]))
    nodes = pa.table(
        {
            # unsorted on purpose: the pack builder sorts
            "osm_id": pa.array([2, 1, 3], type=pa.int64()),
            "lon": pa.array([11.0, 10.0, 12.0]),
            "lat": pa.array([21.0, 20.0, 22.0]),
            "tags": pa.array([[], [], []], type=tag_t),
        }
    )
    ref = ray.put(_build_node_pack(nodes))
    fn = _way_geo_fn(ref)
    batch = pa.table(
        {
            "osm_id": pa.array([100, 101], type=pa.int64()),
            "node_ids": pa.array([[1, 999, 2], [3, 1]], type=pa.list_(pa.int64())),
        }
    )
    out = fn(batch)
    assert out["xs"].to_pylist() == [[10.0, 11.0], [12.0, 10.0]]
    assert out["ys"].to_pylist() == [[20.0, 21.0], [22.0, 20.0]]
    # all-valid batch goes down the fast path untouched
    out2 = fn(
        pa.table(
            {
                "osm_id": pa.array([102], type=pa.int64()),
                "node_ids": pa.array([[2, 3]], type=pa.list_(pa.int64())),
            }
        )
    )
    assert out2["xs"].to_pylist() == [[11.0, 12.0]]
