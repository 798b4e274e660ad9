"""Additional (voronoi-generated) zones — §2.9.

Re-expresses ``compute_additional_places``
(/root/reference/src/additional_zones.rs:34-100) Ray-Data-first:

1. ``read_places`` (P12): ``is_additional_place`` nodes
   (place ∈ {city,town,village,suburb,quarter,neighbourhood} ∨ capital=yes,
   /root/reference/src/lib.rs:54-64), named, center = node coords, point bbox.
2. Keep (admin_level None ∧ type Suburb) ∨ capital=yes
   (additional_zones.rs:47-51).
3. Parent lookup (J3): zone candidates with admin type ≥ City sorted by
   (type, area, uid), first whose boundary contains the center
   (additional_zones.rs:102-120); drop pairs where parent type < place type,
   or Country parent with different name (additional_zones.rs:56-73).
4. ``groupby(parent)`` → per-group voronoi (A3 + §2.9 step 5): 1 place →
   whole parent boundary; Country parent with >1 places → none; else
   per-point convex voronoi cells clipped to the parent. Existing
   same-type / same-parent intersecting zones are subtracted; an EMPTY
   difference leaves the boundary unchanged (faithful to the reference's
   convert_to_geo(empty)→no-update path, additional_zones.rs:219-233).
5. Generated zones append with unique ``zone_uid`` suffixes ("#v0", ...)
   since the same OSM node may already exist as a base-scan zone.

Zone-side state (geometries, types, parents) is a ray.put broadcast — places
and zones are both small sides; the stage stays a Dataset pipeline so the
same code path scales to large place sets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..config import EngineConfig
from ..functions.arrowtools import map_to_pydicts, tags_get
from ..geom.algorithms import multipolygon_area, multipolygon_bbox
from ..geom.predicates import PreparedPolygon, bbox_intersects
from ..geom.voronoi import clip_by_convex, subtract, voronoi_cells
from ..geom.wkb import multipolygon_from_wkb, multipolygon_to_wkb
from ..model import ZONE_SCHEMA, ZONE_TYPE_RANK, parse_zone_type
from ..stages.zone_build import _parse_level, _parse_zips

_EPS = np.finfo(float).eps


def read_places(nodes: rd.Dataset) -> rd.Dataset:
    """is_additional_place nodes → place rows (P12)."""

    def fn(batch: pa.Table) -> pa.Table:
        place = tags_get(batch["tags"], "place")
        capital = tags_get(batch["tags"], "capital")
        place_t = pa.array(
            [parse_zone_type(p) in ("city", "suburb") for p in place.to_pylist()]
        )
        keep = pc.or_(place_t, pc.equal(pc.fill_null(capital, ""), "yes"))
        batch = batch.filter(keep)
        if batch.num_rows == 0:
            return pa.schema(
                [
                    ("osm_id", pa.string()),
                    ("name", pa.string()),
                    ("zone_type", pa.string()),
                    ("admin_level", pa.int32()),
                    ("capital", pa.bool_()),
                    ("lon", pa.float64()),
                    ("lat", pa.float64()),
                    ("tags", pa.map_(pa.string(), pa.string())),
                ]
            ).empty_table()
        tagd = map_to_pydicts(batch["tags"])
        ids = batch["osm_id"].to_pylist()
        lons = batch["lon"].to_pylist()
        lats = batch["lat"].to_pylist()
        rows = {"osm_id": [], "name": [], "zone_type": [], "admin_level": [], "capital": [], "lon": [], "lat": [], "tags": []}
        for i, t in enumerate(tagd):
            name = t.get("name")
            if not name:
                continue
            rows["osm_id"].append(f"node:{ids[i]}")
            rows["name"].append(name)
            rows["zone_type"].append(parse_zone_type(t.get("place")))
            rows["admin_level"].append(_parse_level(t.get("admin_level")))
            rows["capital"].append(t.get("capital") == "yes")
            rows["lon"].append(lons[i])
            rows["lat"].append(lats[i])
            rows["tags"].append(sorted(t.items()))
        return pa.table(
            {
                "osm_id": pa.array(rows["osm_id"], type=pa.string()),
                "name": pa.array(rows["name"], type=pa.string()),
                "zone_type": pa.array(rows["zone_type"], type=pa.string()),
                "admin_level": pa.array(rows["admin_level"], type=pa.int32()),
                "capital": pa.array(rows["capital"], type=pa.bool_()),
                "lon": pa.array(rows["lon"], type=pa.float64()),
                "lat": pa.array(rows["lat"], type=pa.float64()),
                "tags": pa.array(rows["tags"], type=pa.map_(pa.string(), pa.string())),
            }
        )

    return nodes.map_batches(fn, batch_format="pyarrow")


class ZoneState:
    """Broadcast zone-side state for parent lookup + subtraction."""

    def __init__(self, zones: rd.Dataset, cfg: "EngineConfig | None" = None):
        self.uid: list[str] = []
        self.name: list[str] = []
        self.ztype: list[str | None] = []
        self.parent: list[str | None] = []
        self.wkb: list[bytes | None] = []
        self.bbox: list[tuple | None] = []
        self.rank: list[int] = []
        self.area: list[float] = []
        cols = ["zone_uid", "name", "zone_type", "parent", "boundary_wkb", "minx", "miny", "maxx", "maxy", "area"]
        for b in zones.select_columns(cols).iter_batches(batch_size=2048, batch_format="pyarrow"):
            for r in b.to_pylist():
                self.uid.append(r["zone_uid"])
                self.name.append(r["name"])
                self.ztype.append(r["zone_type"])
                self.parent.append(r["parent"])
                self.wkb.append(r["boundary_wkb"])
                self.bbox.append(
                    (r["minx"], r["miny"], r["maxx"], r["maxy"])
                    if r["minx"] is not None
                    else None
                )
                self.rank.append(
                    ZONE_TYPE_RANK.get(r["zone_type"], 99) if r["zone_type"] else 99
                )
                self.area.append(r["area"] if r["area"] is not None else 0.0)
        self._prepared: dict[int, PreparedPolygon] = {}
        # cell → zone-index inverted index (the R-tree analog the reference
        # probes in additional_zones.rs:102-120); parent lookup and
        # subtraction prefilter probe cells instead of scanning every zone
        from ..config import EngineConfig

        self.cells = (cfg or EngineConfig()).cells()
        self.cell_map: dict[int, list[int]] = {}
        for i, bb in enumerate(self.bbox):
            if bb is None or self.wkb[i] is None:
                continue
            res = self.cells.cover_res_for_bbox(bb)
            for c in self.cells.cover_bbox(bb, res):
                self.cell_map.setdefault(int(c), []).append(i)

    def candidates_for_point(self, lon: float, lat: float) -> list[int]:
        """Zone indices whose covering cells contain the point (all ladder
        resolutions probed — zones index at their own coarsened res)."""
        out: list[int] = []
        seen: set[int] = set()
        for c in self.cells.cells_of_ladder(lon, lat)[:, 0]:
            for i in self.cell_map.get(int(c), ()):
                if i not in seen:
                    seen.add(i)
                    out.append(i)
        return out

    def candidates_for_bbox(self, bbox: tuple) -> list[int] | None:
        """Zone indices whose covering cells intersect the bbox; None when
        the bbox is so large that cell enumeration would exceed the full
        scan it replaces (caller falls back to the linear pass)."""
        out: list[int] = []
        seen: set[int] = set()
        for r in self.cells.ladder:
            if self.cells._bbox_cover_count(bbox, r) > 4096:
                return None
            for c in self.cells.cover_bbox(bbox, r):
                for i in self.cell_map.get(int(c), ()):
                    if i not in seen:
                        seen.add(i)
                        out.append(i)
        return out

    def prep(self, i: int) -> PreparedPolygon | None:
        p = self._prepared.get(i)
        if p is None:
            if self.wkb[i] is None:
                return None
            try:
                p = PreparedPolygon(multipolygon_from_wkb(self.wkb[i]))
            except Exception:
                return None
            self._prepared[i] = p
        return p

    def admin_type_rank(self, i: int) -> int | None:
        zt = self.ztype[i]
        if zt is None or zt == "non_administrative":
            return None
        return ZONE_TYPE_RANK[zt]


def _find_parent(state: ZoneState, lon: float, lat: float) -> int | None:
    """J3: cell-index candidates with admin type ≥ City, sorted (type, area,
    uid), first containing the center — the reference's R-tree probe
    (additional_zones.rs:102-120) at the same complexity; the former
    O(zones) Python scan per place was the ivory-coast-scale bottleneck."""
    city_rank = ZONE_TYPE_RANK["city"]
    cand = [
        i
        for i in state.candidates_for_point(lon, lat)
        if (r := state.admin_type_rank(i)) is not None
        and r >= city_rank
        and state.bbox[i] is not None
        and state.bbox[i][0] <= lon <= state.bbox[i][2]
        and state.bbox[i][1] <= lat <= state.bbox[i][3]
    ]
    cand.sort(key=lambda i: (state.rank[i], state.area[i], state.uid[i]))
    for i in cand:
        prep = state.prep(i)
        if prep is not None and prep.covers_points(np.array([lon]), np.array([lat]))[0]:
            return i
    return None


def _places_to_subtract(
    state: ZoneState, bbox: tuple, ztype: str | None, parent_uid: str
) -> list[int]:
    """zones intersecting bbox with admin type == ztype or parent == parent
    (additional_zones.rs:237-254); candidates from the cell index, exact
    intersect deferred to clipping."""
    cand = state.candidates_for_bbox(bbox)
    if cand is None:
        cand = range(len(state.uid))
    out = []
    for i in cand:
        r = state.admin_type_rank(i)
        if r is None or state.bbox[i] is None:
            continue
        if not (state.ztype[i] == ztype or state.parent[i] == parent_uid):
            continue
        if bbox_intersects(state.bbox[i], bbox):
            out.append(i)
    return sorted(out)


def _make_zone_row(place: dict, uid: str, parent_uid: str, mpoly) -> dict:
    bbox = multipolygon_bbox(mpoly)
    return {
        "osm_id": place["osm_id"],
        "zone_uid": uid,
        "kind": "node",
        "name": place["name"],
        "admin_level": place["admin_level"],
        "zone_type": place["zone_type"],
        "loc_name": "",
        "alt_name": "",
        "zip_codes": _parse_zips(dict(place["tags"] or [])),
        "wikidata": dict(place["tags"] or []).get("wikidata"),
        "tags": place["tags"],
        "center_tags": [],
        "center_lon": place["lon"],
        "center_lat": place["lat"],
        "boundary_wkb": multipolygon_to_wkb(mpoly),
        "minx": bbox[0],
        "miny": bbox[1],
        "maxx": bbox[2],
        "maxy": bbox[3],
        "area": multipolygon_area(mpoly),
        "is_generated": True,
        "country_code": None,
        "parent": parent_uid,
        "label": "",
        "international_labels": [],
    }


def _voronoi_group_fn(state_ref):
    def fn(group: pa.Table) -> pa.Table:
        from ..functions.broadcast import get_cached

        state: ZoneState = get_cached(state_ref)
        rows = group.to_pylist()
        rows.sort(key=lambda r: r["osm_id"])
        parent_uid = rows[0]["parent_uid"]
        pi = state.uid.index(parent_uid)
        parent_wkb = state.wkb[pi]
        if parent_wkb is None:
            return ZONE_SCHEMA.empty_table()
        parent_poly = multipolygon_from_wkb(parent_wkb)
        out_rows = []
        if len(rows) == 1:
            place = rows[0]
            subs = _places_to_subtract(
                state, state.bbox[pi], state.ztype[pi], parent_uid
            )
            clipped = []
            for si in subs:
                if state.wkb[si] is None:
                    continue
                clipped.append(multipolygon_from_wkb(state.wkb[si]))
            diff = subtract(parent_poly, clipped)
            mpoly = diff if diff is not None else parent_poly
            out_rows.append(
                _make_zone_row(place, f"{place['osm_id']}#v0", parent_uid, mpoly)
            )
        elif state.ztype[pi] == "country":
            return ZONE_SCHEMA.empty_table()  # additional_zones.rs:283-292
        else:
            pts = np.array([[r["lon"], r["lat"]] for r in rows])
            bbox = state.bbox[pi]
            cells = voronoi_cells(pts, bbox)
            for k, (place, cell) in enumerate(zip(rows, cells)):
                if cell is None:
                    continue
                mpoly = clip_by_convex(parent_poly, cell)
                if not mpoly:
                    continue
                pb = multipolygon_bbox(mpoly)
                subs = _places_to_subtract(state, pb, place["zone_type"], parent_uid)
                clipped = []
                for si in subs:
                    if state.wkb[si] is None:
                        continue
                    sp = multipolygon_from_wkb(state.wkb[si])
                    c = clip_by_convex(sp, cell)
                    if c:
                        clipped.append(c)
                diff = subtract(mpoly, clipped)
                if diff is None:
                    diff = mpoly  # empty difference → keep (reference quirk)
                out_rows.append(
                    _make_zone_row(place, f"{place['osm_id']}#v{k}", parent_uid, diff)
                )
        if not out_rows:
            return ZONE_SCHEMA.empty_table()
        return pa.Table.from_pylist(out_rows, schema=ZONE_SCHEMA)

    return fn


def compute_additional_zones(
    zones: rd.Dataset, nodes: rd.Dataset, cfg: EngineConfig
) -> rd.Dataset:
    """→ Dataset of generated zones (may be empty); callers union with zones."""
    state = ZoneState(zones, cfg)
    state_ref = ray.put(state)
    places = read_places(nodes)

    def pair_fn(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import get_cached

        st: ZoneState = get_cached(state_ref)
        rows = batch.to_pylist()
        keep_rows = []
        for r in rows:
            if r["zone_type"] is None:
                continue
            if not ((r["admin_level"] is None and r["zone_type"] == "suburb") or r["capital"]):
                continue  # additional_zones.rs:47-51
            pi = _find_parent(st, r["lon"], r["lat"])
            if pi is None:
                continue
            p_rank = st.admin_type_rank(pi)
            place_rank = ZONE_TYPE_RANK[r["zone_type"]]
            if p_rank is None or p_rank < place_rank:
                continue  # strictly-increasing check (additional_zones.rs:66-71)
            if st.ztype[pi] == "country" and st.name[pi] != r["name"]:
                continue
            r["parent_uid"] = st.uid[pi]
            keep_rows.append(r)
        out_schema = batch.schema.append(pa.field("parent_uid", pa.string()))
        if not keep_rows:
            return out_schema.empty_table()
        return pa.Table.from_pylist(keep_rows, schema=out_schema)

    paired = places.map_batches(pair_fn, batch_format="pyarrow")
    return paired.groupby("parent_uid").map_groups(
        _voronoi_group_fn(state_ref), batch_format="pyarrow"
    )
