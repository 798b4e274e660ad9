"""DuckDB oracle-SQL generators for the geospatial query surface.

The mini-lux world is axis-aligned rectangles, so every geometric predicate
the engine runs (covers, point-in-polygon, smallest-enclosing argmin, kNN
haversine) has an exact relational formulation over literal VALUES derived
from the fixture SPEC (not from engine output): containment is bbox
comparison, the smallest parent is a window-function argmin, haversine is
plain trig. The driver runs these side-by-side with the Ray pipelines."""

from __future__ import annotations

from .fixtures.synth import world_spec
from .functions.geocode import SQL_POINT_EXPRS
from .model import ZONE_TYPE_RANK

_NAMED = None


def _zone_rows():
    """(osm_id, rect, zone_type, admin) literal rows for all boundary zones,
    types resolved from the rules spec by hand (same derivation as the
    golden: levels map + the contained_by override inside relation 3001;
    relation 5002 level 10 is untyped)."""
    global _NAMED
    if _NAMED is not None:
        return _NAMED
    rows = []
    for r in world_spec()["relations"]:
        tags = r["tags"]
        if "name" not in tags:
            continue  # unnamed: never a zone
        oid = r["osm_id"]
        level = int(tags["admin_level"])
        if level == 2:
            zt = "country"
        elif level == 6:
            zt = "state_district"
        elif level == 8:
            zt = "city"
        elif level == 9:
            zt = "city_district" if 4001 <= oid <= 4004 else "suburb"
        else:
            zt = None
        # center: admin_centre else label else rect centroid
        if r["admin_centre"] is not None:
            c = (r["admin_centre"]["lon"], r["admin_centre"]["lat"])
        elif r["label_node"] is not None:
            c = (r["label_node"]["lon"], r["label_node"]["lat"])
        else:
            c = ((r["rect"][0] + r["rect"][2]) / 2, (r["rect"][1] + r["rect"][3]) / 2)
        rows.append(dict(osm_id=f"relation:{oid}", rect=r["rect"], zone_type=zt, center=c))
    _NAMED = rows
    return rows


def zones_values_cte(typed_only: bool = True) -> str:
    vals = []
    for z in _zone_rows():
        if typed_only and z["zone_type"] is None:
            continue
        rank = ZONE_TYPE_RANK[z["zone_type"]] if z["zone_type"] else 99
        minx, miny, maxx, maxy = z["rect"]
        area = (maxx - minx) * (maxy - miny)
        zt = f"'{z['zone_type']}'" if z["zone_type"] else "NULL"
        vals.append(
            f"('{z['osm_id']}', {minx!r}, {miny!r}, {maxx!r}, {maxy!r}, {rank}, {area!r}, {zt})"
        )
    return (
        "zones(osm_id, minx, miny, maxx, maxy, rank, area, zone_type) AS (VALUES "
        + ", ".join(vals)
        + ")"
    )


def centroids_values_cte() -> str:
    vals = []
    for z in sorted(_zone_rows(), key=lambda z: z["osm_id"]):
        if z["zone_type"] is None:
            continue  # only admin zones are kNN candidates
        vals.append(f"('{z['osm_id']}', {z['center'][0]!r}, {z['center'][1]!r})")
    return "cens(osm_id, clon, clat) AS (VALUES " + ", ".join(vals) + ")"


def sql_inclusion_edges() -> str:
    """Oracle for the cell-join inclusion edges: rect containment, self
    excluded, untyped zones included (edges are computed pre-typing)."""
    return f"""
WITH {zones_values_cte(typed_only=False)}
SELECT c.osm_id AS child, p.osm_id AS parent
FROM zones c JOIN zones p
  ON p.minx <= c.minx AND p.miny <= c.miny AND p.maxx >= c.maxx AND p.maxy >= c.maxy
WHERE c.osm_id <> p.osm_id
"""


def sql_zone_parents() -> str:
    """Oracle for smallest-enclosing-parent: admissible = admin parent with
    strictly larger rank; argmin (rank, area, osm_id). Returns every typed
    boundary zone with its parent (NULL for the root)."""
    return f"""
WITH {zones_values_cte(typed_only=True)},
cand AS (
  SELECT c.osm_id AS child, p.osm_id AS parent,
         ROW_NUMBER() OVER (PARTITION BY c.osm_id ORDER BY p.rank, p.area, p.osm_id) AS rn
  FROM zones c JOIN zones p
    ON p.minx <= c.minx AND p.miny <= c.miny AND p.maxx >= c.maxx AND p.maxy >= c.maxy
   AND c.osm_id <> p.osm_id AND c.rank < p.rank
)
SELECT z.osm_id, c.parent
FROM zones z LEFT JOIN cand c ON c.child = z.osm_id AND c.rn = 1
"""


def sql_zone_type_counts() -> str:
    return f"""
WITH {zones_values_cte(typed_only=True)}
SELECT zone_type, COUNT(*)::BIGINT AS n
FROM zones GROUP BY zone_type
"""


def sql_geotag_docs() -> str:
    """Oracle for doc geotagging over md5-derived points: containing zone =
    argmin (rank, area, osm_id) over covering rects; outside-world points →
    nearest admin centroid by haversine (ties by osm_id)."""
    lon_e, lat_e = SQL_POINT_EXPRS
    return f"""
WITH pts AS (
  SELECT doc_id, {lon_e} AS lon, {lat_e} AS lat FROM documents
),
{zones_values_cte(typed_only=True)},
{centroids_values_cte()},
cover AS (
  SELECT p.doc_id, z.osm_id,
         ROW_NUMBER() OVER (PARTITION BY p.doc_id ORDER BY z.rank, z.area, z.osm_id) AS rn
  FROM pts p JOIN zones z
    ON p.lon >= z.minx AND p.lon <= z.maxx AND p.lat >= z.miny AND p.lat <= z.maxy
),
hit AS (SELECT doc_id, osm_id FROM cover WHERE rn = 1),
missed AS (SELECT p.* FROM pts p LEFT JOIN hit h USING (doc_id) WHERE h.doc_id IS NULL),
knn AS (
  SELECT m.doc_id, c.osm_id,
         ROW_NUMBER() OVER (PARTITION BY m.doc_id ORDER BY
           2*6371.0*asin(sqrt(
             pow(sin(radians(c.clat - m.lat)/2), 2) +
             cos(radians(m.lat))*cos(radians(c.clat))*pow(sin(radians(c.clon - m.lon)/2), 2)
           )), c.osm_id) AS rn
  FROM missed m CROSS JOIN cens c
)
SELECT doc_id, osm_id AS zone_osm_id FROM hit
UNION ALL
SELECT doc_id, osm_id AS zone_osm_id FROM knn WHERE rn = 1
"""


def sql_raster_zone_counts(width: int = 64, height: int = 64) -> str:
    """Oracle for vector→raster: the same pixel centers the engine samples
    ((px+0.5)·8/W over the [0,8]² rect-world extent — 8/64 = 0.125 is a
    power of two, so both sides compute bit-identical float64 centers),
    assigned by the same (rank, area, osm_id) argmin over covering rects,
    counted per zone. Pixel centers never land on rect boundaries (centers
    are odd multiples of 1/16; boundaries are multiples of 1/2)."""
    dx = 8.0 / width
    dy = 8.0 / height
    return f"""
WITH pts AS (
  SELECT a.range AS px, b.range AS py,
         (a.range + 0.5) * {dx!r} AS lon, (b.range + 0.5) * {dy!r} AS lat
  FROM range({width}) a, range({height}) b
),
{zones_values_cte(typed_only=True)},
cover AS (
  SELECT p.px, p.py, z.osm_id,
         ROW_NUMBER() OVER (PARTITION BY p.px, p.py ORDER BY z.rank, z.area, z.osm_id) AS rn
  FROM pts p JOIN zones z
    ON p.lon >= z.minx AND p.lon <= z.maxx AND p.lat >= z.miny AND p.lat <= z.maxy
)
SELECT osm_id AS zone_osm_id, COUNT(*)::BIGINT AS n_pixels
FROM cover WHERE rn = 1 GROUP BY 1
"""


def sql_raster_filled_counts(width: int = 32, height: int = 32) -> str:
    """Oracle for knn-filled rasterization over a bbox extending past the
    world: covered pixels take the (rank, area, osm_id) argmin zone;
    uncovered pixels take the nearest admin centroid by haversine (ties by
    osm_id) — exactly the geotag fallback (sql_geotag_docs). bbox
    (-8,-8,24,24) at 32×32 → dx=dy=1.0 (exact float), centers at
    half-integers (never on rect boundaries)."""
    return f"""
WITH pts AS (
  SELECT a.range AS px, b.range AS py,
         -8.0 + (a.range + 0.5) * 1.0 AS lon, -8.0 + (b.range + 0.5) * 1.0 AS lat
  FROM range({width}) a, range({height}) b
),
{zones_values_cte(typed_only=True)},
{centroids_values_cte()},
cover AS (
  SELECT p.px, p.py, z.osm_id,
         ROW_NUMBER() OVER (PARTITION BY p.px, p.py ORDER BY z.rank, z.area, z.osm_id) AS rn
  FROM pts p JOIN zones z
    ON p.lon >= z.minx AND p.lon <= z.maxx AND p.lat >= z.miny AND p.lat <= z.maxy
),
hit AS (SELECT px, py, osm_id FROM cover WHERE rn = 1),
missed AS (
  SELECT p.* FROM pts p LEFT JOIN hit h ON h.px = p.px AND h.py = p.py
  WHERE h.px IS NULL
),
knn AS (
  SELECT m.px, m.py, c.osm_id,
         ROW_NUMBER() OVER (PARTITION BY m.px, m.py ORDER BY
           2*6371.0*asin(sqrt(
             pow(sin(radians(c.clat - m.lat)/2), 2) +
             cos(radians(m.lat))*cos(radians(c.clat))*pow(sin(radians(c.clon - m.lon)/2), 2)
           )), c.osm_id) AS rn
  FROM missed m CROSS JOIN cens c
),
assigned AS (
  SELECT osm_id FROM hit
  UNION ALL
  SELECT osm_id FROM knn WHERE rn = 1
)
SELECT osm_id AS zone_osm_id, COUNT(*)::BIGINT AS n_pixels
FROM assigned GROUP BY 1
"""
