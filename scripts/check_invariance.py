"""Cross-parallelism invariance: the cosmogony output and geotag tiles must
be IDENTICAL at different ray parallelism levels (SURVEY §5.2e).

Runs the mini-lux build + geotag in fresh subprocesses at num_cpus=2 and
num_cpus=8 and diffs the outputs. Exit 0 = identical."""

from __future__ import annotations

import json
import subprocess
import sys

CODE = '''
import json, os, sys
import ray
ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
sys.path.insert(0, "/root/repo")
from cosmogony_ray.config import EngineConfig
from cosmogony_ray.fixtures.synth import write_mini_lux
from cosmogony_ray.pipelines.cosmogony import build_cosmogony
from cosmogony_ray.stages.geotag import build_zone_index, geotag_docs

d = "/tmp/cosmogony_invariance_fixture"
write_mini_lux(d, n_docs=300)
cfg = EngineConfig(rules_dir=os.path.join(d, "rules"), disable_voronoi=False)
cosmo = build_cosmogony(d, cfg, with_stats=False)
zdf = cosmo.zones.to_pandas().sort_values("zone_uid")
zones_sig = [
    (r["zone_uid"], r["zone_type"], r["parent"], r["label"])
    for _, r in zdf.iterrows()
]
idx = build_zone_index(cosmo.zones, cfg, pack_ref=cosmo.geom_pack_ref)
docs = rd.read_parquet(os.path.join(d, "docs.parquet"))
tdf = geotag_docs(docs, idx, cfg).to_pandas().sort_values("doc_id")
tiles_sig = [
    (r["doc_id"], tuple(t["zone_osm_id"] for t in r["tiles"]))
    for _, r in tdf.iterrows()
]
# round-4 operator family: connected-components dedup clustering must be
# parallelism-invariant too (star fixpoint + deterministic tie-breaks)
import __ray_entry__ as entry
cdf = entry.queries()["dedup_clusters"]("/root/testdata/sf0.01").to_pandas()
cdf = cdf.sort_values("doc_id").reset_index(drop=True)
clusters_sig = [(int(r["doc_id"]), int(r["cluster_id"])) for _, r in cdf.iterrows()]
print(json.dumps({"zones": zones_sig, "tiles": [[d, list(z)] for d, z in tiles_sig], "clusters": clusters_sig}))
ray.shutdown()
'''


def run(ncpu: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CODE.replace("NCPU", str(ncpu))],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    if out.returncode != 0:
        print(out.stderr[-1500:])
        sys.exit(2)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    lo, hi = 2, 8
    a = run(lo)
    b = run(hi)
    same_zones = a["zones"] == b["zones"]
    same_tiles = a["tiles"] == b["tiles"]
    same_clusters = a["clusters"] == b["clusters"]
    print(
        json.dumps(
            {
                "zones_identical": same_zones,
                "tiles_identical": same_tiles,
                "clusters_identical": same_clusters,
                "n_zones": len(a["zones"]),
                "n_docs": len(a["tiles"]),
                "n_clustered_docs": len(a["clusters"]),
                "cpus": [lo, hi],
            }
        )
    )
    sys.exit(0 if same_zones and same_tiles and same_clusters else 1)


if __name__ == "__main__":
    main()
