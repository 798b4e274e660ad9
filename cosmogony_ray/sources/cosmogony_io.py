"""Cosmogony JSON sinks / sources / merge (S2-S5).

- Output format by filename extension (``OutputFormat::from_filename``,
  /root/reference/cosmogony/src/file_format.rs:20-44).
- JSON/JSONL (.gz) zone serialization matching the reference schema
  (README.md:110-145; serde on Zone, cosmogony/src/zone.rs:59-107,185-283):
  geometry as GeoJSON MultiPolygon, center as GeoJSON Point, bbox as
  ``[minx,miny,maxx,maxy]``, ``id``/``parent`` as dense u64 indices.
- Dense ids are deterministic: sorted by (kind rank, numeric osm id) — the
  reference's ids are BTreeMap<OsmId> insertion order, i.e. nodes before
  relations, each ascending (/root/reference/src/lib.rs:66-95).
- ``merge_cosmogonies``: concat N jsonl(.gz) outputs remapping id/parent by
  running offset (/root/reference/src/merger.rs:35-77).
"""

from __future__ import annotations

import gzip
import json
import os

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..geom.wkb import (
    geojson_to_multipolygon,
    multipolygon_from_wkb,
    multipolygon_to_geojson,
    multipolygon_to_wkb,
)
from ..model import ZONE_SCHEMA


class OutputFormat:
    JSON = "json"
    JSON_GZ = "json_gz"
    JSONL = "jsonl"
    JSONL_GZ = "jsonl_gz"

    @staticmethod
    def from_filename(name: str) -> str:
        if name.endswith(".jsonl.gz") or name.endswith(".json.gz.stream"):
            return OutputFormat.JSONL_GZ
        if name.endswith(".jsonl"):
            return OutputFormat.JSONL
        if name.endswith(".json.gz"):
            return OutputFormat.JSON_GZ
        if name.endswith(".json"):
            return OutputFormat.JSON
        raise ValueError(f"unsupported output filename {name!r}")

    @staticmethod
    def is_streamable(fmt: str) -> bool:
        return fmt in (OutputFormat.JSONL, OutputFormat.JSONL_GZ)


def _uid_sort_key(zone_uid: str) -> tuple[int, int, int, str]:
    """Base zones in BTreeMap<OsmId> order (nodes then relations, ascending),
    generated zones appended after (the reference publishes voronoi zones at
    the end, additional_zones.rs:418-423)."""
    osm_id, _, suffix = zone_uid.partition("#")
    kind, _, num = osm_id.partition(":")
    rank = {"node": 0, "way": 1, "relation": 2}.get(kind, 3)
    return (1 if suffix else 0, rank, int(num), suffix)


def dense_id_map(zones: rd.Dataset) -> dict[str, int]:
    """zone_uid → dense id, deterministic (see module docstring).

    Driver-side by design: parent pointers cross partitions, so every writer
    task needs the GLOBAL uid→id map (broadcast once via ray.put downstream).
    Collecting only the uid column is ~40 B/row — bounded by the zones-table
    design point (≤10^6 admin zones world-wide ⇒ ≤40 MB); doc-scale data
    never flows through this sink. If zone worlds ever exceed that, switch to
    a sort_by(uid_sort_key) + per-partition offset scan (two small passes)."""
    ids = [r["zone_uid"] for r in zones.select_columns(["zone_uid"]).take_all()]
    return {o: i for i, o in enumerate(sorted(ids, key=_uid_sort_key))}


def zone_row_to_json_dict(row: dict, id_map: dict[str, int]) -> dict:
    geom = None
    if row.get("boundary_wkb") is not None:
        geom = multipolygon_to_geojson(multipolygon_from_wkb(row["boundary_wkb"]))
    center = None
    if row.get("center_lon") is not None:
        center = {"type": "Point", "coordinates": [row["center_lon"], row["center_lat"]]}
    bbox = None
    if row.get("minx") is not None and np.isfinite(row["minx"]):
        bbox = [row["minx"], row["miny"], row["maxx"], row["maxy"]]
    parent = row.get("parent")
    return {
        "id": id_map[row["zone_uid"]],
        "osm_id": row["osm_id"],
        "admin_level": row.get("admin_level"),
        "zone_type": row.get("zone_type"),
        "name": row.get("name") or "",
        "loc_name": row.get("loc_name") or "",
        "alt_name": row.get("alt_name") or "",
        "label": row.get("label") or "",
        "international_labels": dict(row.get("international_labels") or []),
        "zip_codes": list(row.get("zip_codes") or []),
        "center": center,
        "geometry": geom,
        "bbox": bbox,
        "parent": id_map.get(parent) if parent is not None else None,
        "tags": dict(row.get("tags") or []),
        "center_tags": dict(row.get("center_tags") or []),
        "wikidata": row.get("wikidata"),
        "is_generated": bool(row.get("is_generated")),
        "country_code": row.get("country_code"),
    }


def write_zones(zones: rd.Dataset, path: str, meta: dict | None = None) -> None:
    """Serialize zones to ``path`` in the format its extension implies
    (the CLI sink, /root/reference/src/bin/cosmogony.rs:124-149).

    jsonl formats stream batch-by-batch through the driver writer; json
    formats wrap zones in the ``{"zones": [...], "meta": {...}}`` envelope.
    """
    fmt = OutputFormat.from_filename(path)
    id_map = dense_id_map(zones)
    gz = fmt in (OutputFormat.JSON_GZ, OutputFormat.JSONL_GZ)
    opener = (lambda p: gzip.open(p, "wt")) if gz else (lambda p: open(p, "w"))
    streaming = OutputFormat.is_streamable(fmt)
    # rows in dense-id order, like the reference's zones vector
    ordered = zones.map_batches(
        lambda t: t.append_column(
            "__dense__",
            pa.array([id_map[u] for u in t["zone_uid"].to_pylist()], type=pa.int64()),
        ),
        batch_format="pyarrow",
    ).sort("__dense__")
    with opener(path) as f:
        if not streaming:
            f.write('{"zones":[')
        first = True
        for b in ordered.iter_batches(batch_size=1024, batch_format="pyarrow"):
            for row in b.drop_columns(["__dense__"]).to_pylist():
                d = zone_row_to_json_dict(row, id_map)
                s = json.dumps(d, ensure_ascii=False)
                if streaming:
                    f.write(s + "\n")
                else:
                    f.write(("" if first else ",") + s)
                    first = False
        if not streaming:
            f.write('],"meta":' + json.dumps(meta or {}, ensure_ascii=False) + "}")


def _zone_dict_to_row(d: dict) -> dict:
    wkb = None
    if d.get("geometry"):
        wkb = multipolygon_to_wkb(geojson_to_multipolygon(d["geometry"]))
    bbox = d.get("bbox") or [None] * 4
    c = d.get("center") or {}
    coords = c.get("coordinates") or [None, None]
    return {
        "osm_id": d["osm_id"],
        "zone_uid": d["osm_id"],
        "kind": d["osm_id"].split(":", 1)[0],
        "name": d.get("name") or "",
        "admin_level": d.get("admin_level"),
        "zone_type": d.get("zone_type"),
        "loc_name": d.get("loc_name") or "",
        "alt_name": d.get("alt_name") or "",
        "zip_codes": list(d.get("zip_codes") or []),
        "wikidata": d.get("wikidata"),
        "tags": sorted((d.get("tags") or {}).items()),
        "center_tags": sorted((d.get("center_tags") or {}).items()),
        "center_lon": coords[0],
        "center_lat": coords[1],
        "boundary_wkb": wkb,
        "minx": bbox[0],
        "miny": bbox[1],
        "maxx": bbox[2],
        "maxy": bbox[3],
        "area": None,
        "is_generated": bool(d.get("is_generated")),
        "country_code": d.get("country_code"),
        "parent": str(d["parent"]) if d.get("parent") is not None else None,
        "label": d.get("label") or "",
        "international_labels": sorted((d.get("international_labels") or {}).items()),
    }


def read_zones(path: str) -> rd.Dataset:
    """Read a cosmogony file (any of the 4 formats) back into a zones Dataset
    (S4, /root/reference/cosmogony/src/read.rs:26-54). ``parent`` holds the
    dense id as a string (readers match on osm_id or dense id downstream)."""
    fmt = OutputFormat.from_filename(path)
    gz = fmt in (OutputFormat.JSON_GZ, OutputFormat.JSONL_GZ)
    opener = (lambda p: gzip.open(p, "rt")) if gz else (lambda p: open(p))
    rows = []
    with opener(path) as f:
        if OutputFormat.is_streamable(fmt):
            dicts = (json.loads(line) for line in f if line.strip())
            rows = [_zone_dict_to_row(d) for d in dicts]
        else:
            doc = json.load(f)
            rows = [_zone_dict_to_row(d) for d in doc["zones"]]
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=ZONE_SCHEMA))


def merge_cosmogonies(inputs: list[str], output: str) -> int:
    """Concat N streamable cosmogony files, remapping ``id``/``parent`` by a
    running offset per file (/root/reference/src/merger.rs:35-77). Returns the
    total zone count. Refuses non-streamable formats (merger.rs:64-67)."""
    out_fmt = OutputFormat.from_filename(output)
    if not OutputFormat.is_streamable(out_fmt):
        raise ValueError("merge requires a streamable (jsonl) output format")
    gz_out = out_fmt == OutputFormat.JSONL_GZ
    opener_out = (lambda p: gzip.open(p, "wt")) if gz_out else (lambda p: open(p, "w"))
    offset = 0
    total = 0
    with opener_out(output) as out:
        for path in inputs:
            fmt = OutputFormat.from_filename(path)
            if not OutputFormat.is_streamable(fmt):
                raise ValueError(f"merge input {path} is not streamable")
            gz = fmt == OutputFormat.JSONL_GZ
            opener = (lambda p: gzip.open(p, "rt")) if gz else (lambda p: open(p))
            max_id = -1
            with opener(path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    d = json.loads(line)
                    d["id"] = d["id"] + offset
                    if d.get("parent") is not None:
                        d["parent"] = d["parent"] + offset
                    max_id = max(max_id, d["id"])
                    out.write(json.dumps(d, ensure_ascii=False) + "\n")
                    total += 1
            # keep the RUNNING offset: an empty (or all-blank) input in the
            # middle of the list must not reset it to 0 and collide later
            # files' ids with earlier output (round-1 ADVICE; the reference
            # has the same quirk, merger.rs:35-55)
            offset = max(offset, max_id + 1)
    return total
