"""One-pass driver collection of all broadcast zone-side state.

Operates on the MATERIALIZED zones table fetched straight from the object
store (`materialized_table`) — no streaming-executor run, no per-row Python.

Geometry is kept as an **Arrow table**, not a Python dict: Arrow broadcasts
are zero-copy out of the object store, while unpickling a dict of 10⁵ bytes
objects cost seconds per worker (measured 8 s/worker for a same-sized
dict-of-lists broadcast)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..state.country import COUNTRY_CODE_TAG

GEOM_SCHEMA = pa.schema([("osm_id", pa.string()), ("boundary_wkb", pa.binary())])


class ZoneStateMaps:
    def __init__(self):
        self.geom_table: pa.Table = GEOM_SCHEMA.empty_table()  # osm_id, wkb
        self.country_rows: list[tuple] = []         # (osm_id, tags, admin_level)
        self.table: pa.Table | None = None           # full materialized zones


def collect_zone_state(zones: rd.Dataset) -> ZoneStateMaps:
    from ..functions.arrowtools import materialized_table, tags_get

    out = ZoneStateMaps()
    tbl = materialized_table(zones)
    out.table = tbl
    if tbl.num_rows == 0:
        return out
    out.geom_table = (
        tbl.select(["osm_id", "boundary_wkb"])
        .filter(pc.is_valid(tbl["boundary_wkb"]))
        .cast(GEOM_SCHEMA)
    )
    # vectorized single-key lookup — NOT per-row dict conversion of the
    # whole tags map (measured 15 s driver-serial at 21.8k zones)
    iso = tags_get(tbl["tags"], COUNTRY_CODE_TAG)
    hit = pc.is_valid(iso)
    if pc.any(hit).as_py():
        sub = tbl.select(["osm_id", "admin_level"]).filter(hit)
        iso_vals = iso.filter(hit).to_pylist()
        ids = sub["osm_id"].to_pylist()
        lvls = sub["admin_level"].to_pylist()
        out.country_rows = [
            (ids[i], {COUNTRY_CODE_TAG: iso_vals[i]}, lvls[i])
            for i in range(len(ids))
        ]
    return out
