"""Reproducible search over historical voronoi-candidate semantics.

The reference pins 208 zones for luxembourg (voronoi on, CLI defaults;
/root/reference/tests/cosmogony_test.rs:34-93) and 4471 for ivory-coast
(cosmogony_test.rs:313-333), but the checked-out additional_zones.rs
cannot produce either (see tests/test_lux_conformance.py docstring). This
script makes that claim checkable: it evaluates every plausible variant of
the candidate/parent filters over the REAL fixture data with this engine's
exact geometry kernel and prints the generated-zone count per variant per
fixture. No variant reproduces both pins.

Usage:  python scripts/voronoi_variant_search.py
        (needs /root/reference/tests/data/*.pbf; writes scratch under /tmp)

Semantics searched (all from additional_zones.rs:34-120 plus the obvious
historical relaxations):
  candidate set    as-written ((admin_level none AND Suburb) OR capital)
                   | admin_level-none any parse | all named place-parse
                   | city-parse only
  parent minimum   zone_type >= City (as written) | > City
  type ordering    parent >= place (as written) | strict >
  city exclusion   none (as written) | drop candidates covered by a City
plus the as-written country-parent group rule (multi-point groups under a
Country parent are dropped, single-point groups survive;
additional_zones.rs:280-292, 254-262).
"""

import os
import pickle
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CITYR, COUNTRYR = 2, 6
TYPE_RANK = {
    "suburb": 0, "city_district": 1, "city": 2, "state_district": 3,
    "state": 4, "country_region": 5, "country": 6, "non_administrative": 7,
}
SUBURB = {"suburb", "quarter", "neighbourhood"}
CITY = {"city", "town", "village"}

FIXTURES = {
    "lux": ("/root/reference/tests/data/luxembourg_filtered.osm.pbf", 208),
    "ci": ("/root/reference/tests/data/ivory-coast.pbf", 4471),
}


def prepare(tag: str, pbf: str) -> dict:
    """Build the default-country zone set and the place-node covering matrix."""
    cache = f"/tmp/vsim_{tag}.pkl"
    if os.path.exists(cache):
        return pickle.load(open(cache, "rb"))
    import pyarrow.parquet as pq

    from cosmogony_ray.config import EngineConfig
    from cosmogony_ray.geom.predicates import PreparedPolygon
    from cosmogony_ray.geom.wkb import multipolygon_from_wkb
    from cosmogony_ray.pipelines.cosmogony import build_cosmogony
    from cosmogony_ray.sources.pbf import pbf_to_parquet

    tables = f"/tmp/vsim_tables_{tag}"
    if not os.path.exists(os.path.join(tables, "relations.parquet")):
        pbf_to_parquet(pbf, tables)
    cfg = EngineConfig(
        rules_dir=os.path.join(os.path.dirname(__file__), "..", "cosmogony_ray", "assets", "rules"),
        place_node_zones=False, country_code=None, disable_voronoi=True,
    )
    zdf = build_cosmogony(tables, cfg, with_stats=False).zones.to_pandas()
    nodes = pq.read_table(os.path.join(tables, "nodes.parquet")).to_pandas()
    recs = []
    for _, r in nodes.iterrows():
        t = dict(r["tags"]) if r["tags"] is not None else {}
        p, n = t.get("place"), t.get("name")
        cap = t.get("capital") == "yes"
        parse = "suburb" if p in SUBURB else ("city" if p in CITY else None)
        if n and (parse or cap):
            recs.append(dict(osm_id=r["osm_id"], lon=r["lon"], lat=r["lat"],
                             name=n, ptype=parse, cap=cap, admin_level=t.get("admin_level")))
    pl = pd.DataFrame(recs)
    px, py = pl["lon"].to_numpy(), pl["lat"].to_numpy()
    cover = np.zeros((len(pl), len(zdf)), dtype=bool)
    zmeta = []
    for j, (_, z) in enumerate(zdf.iterrows()):
        zmeta.append(dict(osm_id=z["osm_id"], name=z["name"], zt=z["zone_type"],
                          rank=TYPE_RANK.get(z["zone_type"], 99)))
        if z["boundary_wkb"] is None:
            continue
        pp = PreparedPolygon(multipolygon_from_wkb(z["boundary_wkb"]))
        sel = (px >= z["minx"]) & (px <= z["maxx"]) & (py >= z["miny"]) & (py <= z["maxy"])
        if sel.any():
            cover[np.where(sel)[0], j] = pp.covers_points(px[sel], py[sel])
    out = dict(places=pl, cover=cover, zmeta=zmeta, nzones=len(zdf))
    pickle.dump(out, open(cache, "wb"))
    return out


def survivors(pl, cover, zm, cand_mode, parent_min_rank, strict, drop_city_covered):
    ranks, znames = zm["rank"].to_numpy(), zm["name"].to_numpy()
    place_rank = {"suburb": 0, "city": 2}
    al, pt, cap = pl["admin_level"].to_numpy(), pl["ptype"].to_numpy(), pl["cap"].to_numpy()
    has_pt, alnone = pd.notna(pt), pd.isna(al)
    cmask = {
        "aswritten": ((alnone & (pt == "suburb")) | cap) & has_pt,
        "alnone": (alnone | cap) & has_pt,
        "all": has_pt,
        "cityonly": ((pt == "city") | cap) & has_pt,
    }[cand_mode]
    if drop_city_covered:
        cmask = cmask & ~cover[:, ranks == CITYR].any(axis=1)
    groups, names = {}, pl["name"].to_numpy()
    for i in np.where(cmask)[0]:
        covz = np.where(cover[i])[0]
        covz = covz[ranks[covz] >= parent_min_rank]
        if len(covz) == 0:
            continue
        j = covz[ranks[covz] == ranks[covz].min()][0]
        prank, prk = ranks[j], place_rank[pt[i]]
        if (strict and prank <= prk) or (not strict and prank < prk):
            continue
        if not (prank < COUNTRYR or znames[j] == names[i]):
            continue
        groups.setdefault(j, []).append(i)
    return sum(len(v) for j, v in groups.items()
               if not (ranks[j] == COUNTRYR and len(v) > 1))


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    data = {}
    for tag, (pbf, _) in FIXTURES.items():
        if not os.path.exists(pbf):
            print(f"fixture missing: {pbf}")
            return
        data[tag] = prepare(tag, pbf)
    print("(candidates, parent_min, strict, drop_city_covered) -> generated per fixture")
    any_hit = False
    for cand in ("aswritten", "alnone", "all", "cityonly"):
        for pmin in (2, 3):
            for strict in (False, True):
                for drop in (False, True):
                    row = {}
                    for tag in FIXTURES:
                        d = data[tag]
                        row[tag] = survivors(d["places"], d["cover"],
                                             pd.DataFrame(d["zmeta"]), cand, pmin, strict, drop)
                    hits = [tag for tag, (pbf, pin) in FIXTURES.items()
                            if data[tag]["nzones"] + row[tag] == pin]
                    if hits:
                        any_hit = True
                    print(f"  {cand:9s} pmin={pmin} strict={int(strict)} drop={int(drop)}: "
                          + "  ".join(f"{t}={data[t]['nzones']}+{row[t]}" for t in FIXTURES)
                          + (f"   HITS pin: {hits}" if hits else ""))
    print("\nreference pins: "
          + ", ".join(f"{t}={pin}" for t, (_, pin) in FIXTURES.items()))
    print("conclusion:", "some variant hits a pin" if any_hit
          else "NO variant reproduces either pin — the pins are stale goldens")
    ray.shutdown()


if __name__ == "__main__":
    main()
