"""Distributed hierarchy-tail handover bench (round-4 verdict ask #1).

Runs the FULL build over the grid-d10 world (349,525 zones / ~3.03M
inclusion edges) with ``driver_hierarchy_max_edges=1_000_000`` — the edge
table EXCEEDS the configured threshold, so the pipeline takes the
distributed tail (attach_ancestors → type_zones → select_parents →
attach_parents → compute_names) end-to-end, exactly the path a >5M-edge
planetary world would take with the default threshold. Interleaved with
driver-fused runs and a contemporaneous host-ceiling probe (the round-3/4
measurement protocol: raw pairs + same-window mp.Pool ideal-work ceiling).

Each leg is a fresh subprocess (own ray.init at the requested CPU count).
Equality between the two tails is asserted in-line via an order-invariant
signature over (zone_uid, zone_type, parent, label, country_code).

Usage: python scripts/distributed_tail_bench.py [reps=2] [out_json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

DEPTH = 10
WORLD_DIR = f"/tmp/cosmogony_bench_world_d{DEPTH}"
LOW_THRESHOLD = 1_000_000  # < 3.03M d10 edges → forces the distributed tail
DEFAULT_THRESHOLD = 5_000_000

_LEG_SRC = r"""
import json, os, sys, time
import ray

num_cpus = int(sys.argv[1])
mode = sys.argv[2]            # "dist" | "fused"
world_dir = sys.argv[3]

ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, "/root/repo")
from cosmogony_ray.config import EngineConfig
from cosmogony_ray.pipelines.cosmogony import build_cosmogony
from cosmogony_ray.functions.arrowtools import materialized_count

cfg = EngineConfig(
    rules_dir=os.path.join(world_dir, "rules"),
    driver_hierarchy_max_edges=({LOW} if mode == "dist" else {DEFAULT}),
)
t0 = time.time()
cosmo = build_cosmogony(world_dir, cfg, with_stats=False)
n_zones = materialized_count(cosmo.zones)
wall = time.time() - t0

# order-invariant output signature (sum of row hashes) for tail equality
import pyarrow.compute as pc
import numpy as np
sig = 0
n_parents = 0
for batch in cosmo.zones.select_columns(
    ["zone_uid", "zone_type", "parent", "label", "country_code"]
).iter_batches(batch_format="pyarrow"):
    key = None
    for c in batch.column_names:
        col = pc.fill_null(pc.cast(batch[c], "string"), "~")
        key = col if key is None else pc.binary_join_element_wise(key, col, "|")
    import zlib
    sig = (sig + sum(zlib.crc32(s.encode()) for s in key.to_pylist())) % (1 << 62)
    n_parents += int(pc.sum(pc.is_valid(batch["parent"])).as_py() or 0)

print(json.dumps({"mode": mode, "num_cpus": num_cpus, "wall": wall,
                  "zones": n_zones, "sig": sig, "n_parents": n_parents}))
ray.shutdown()
"""


def run_leg(num_cpus: int, mode: str) -> dict:
    src = _LEG_SRC.replace("{LOW}", str(LOW_THRESHOLD)).replace(
        "{DEFAULT}", str(DEFAULT_THRESHOLD)
    )
    out = subprocess.run(
        [sys.executable, "-c", src, str(num_cpus), mode, WORLD_DIR],
        capture_output=True, text=True, timeout=1800,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"leg {mode}@{num_cpus} failed (rc={out.returncode}):\n{out.stderr[-4000:]}"
        )
    return json.loads(lines[-1])


def run_ceiling() -> float:
    """8→32 mp.Pool ideal-work efficiency (wall8 / wall32)."""
    out = subprocess.run(
        [sys.executable, "scripts/host_ceiling_probe.py"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    import re

    walls = {}
    for line in out.stdout.splitlines():
        m = re.match(r"procs=(\d+) tasks=\d+ wall=([\d.]+)s", line)
        if m:
            walls[int(m.group(1))] = float(m.group(2))
    return walls[8] / walls[32]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/distributed_tail_bench.json"
    if not os.path.exists(os.path.join(WORLD_DIR, "relations.parquet")):
        from cosmogony_ray.fixtures.bigworld import write_grid_world

        print(f"generating d{DEPTH} world ...", flush=True)
        write_grid_world(WORLD_DIR, DEPTH)

    legs = []
    ceilings = []
    for rep in range(reps):
        ceilings.append(run_ceiling())
        print(f"[rep {rep}] host ceiling 8→32: {ceilings[-1]:.3f}", flush=True)
        for cpus in (8, 32):
            for mode in ("dist", "fused"):
                t0 = time.time()
                r = run_leg(cpus, mode)
                r["rep"] = rep
                legs.append(r)
                print(
                    f"[rep {rep}] {mode} @{cpus}cpu: build {r['wall']:.1f}s "
                    f"(zones={r['zones']}, sig={r['sig']}, "
                    f"leg total {time.time()-t0:.0f}s)",
                    flush=True,
                )
    sigs = {l["sig"] for l in legs}
    zones = {l["zones"] for l in legs}
    assert len(zones) == 1, f"zone counts diverged: {zones}"
    # HARD gate, not just a recorded field: this script IS the equality
    # evidence BASELINE.md cites, so divergent tails must fail the run
    assert len(sigs) == 1, f"distributed/fused tail outputs diverged: sigs={sigs}"
    equal = True

    def med(vals):
        s = sorted(vals)
        return s[len(s) // 2] if len(s) % 2 else (s[len(s)//2 - 1] + s[len(s)//2]) / 2

    summary = {"world": f"grid_d{DEPTH}", "zones": zones.pop(),
               "threshold": LOW_THRESHOLD, "tails_equal": equal,
               "ceiling_8_to_32": ceilings, "legs": legs}
    for mode in ("dist", "fused"):
        w8 = med([l["wall"] for l in legs if l["mode"] == mode and l["num_cpus"] == 8])
        w32 = med([l["wall"] for l in legs if l["mode"] == mode and l["num_cpus"] == 32])
        summary[f"{mode}_wall_8"] = w8
        summary[f"{mode}_wall_32"] = w32
        summary[f"{mode}_eff_8_to_32"] = w8 / w32 / 4
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "legs"}, indent=2))


if __name__ == "__main__":
    main()
