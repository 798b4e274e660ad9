"""Round-5 scaling evidence runner (the round-3/4 measurement protocol).

Interleaved 8↔32-CPU pairs on identical inputs, each rep bracketed by a
contemporaneous mp.Pool ideal-work ceiling probe, for BOTH headline
workloads:
- geotag: `bench.py --scaling` with BENCH_DOC_REPL so the stage is
  compute-dominated (24M spans on the depth-7 world),
- build: full zone build on the grid-d10 world (349k zones / 3.03M
  edges), fused tail (the default path), fresh subprocess per leg.

Writes the merged JSON to the path in argv[2] (default
/tmp/scaling_r5.json). Usage:
    python scripts/scaling_r5.py [reps=3] [out_json]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BUILD_LEG = r"""
import json, os, sys, time
import ray
num_cpus = int(sys.argv[1])
ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
from cosmogony_ray.config import EngineConfig
from cosmogony_ray.pipelines.cosmogony import build_cosmogony
from cosmogony_ray.functions.arrowtools import materialized_count
cfg = EngineConfig(rules_dir="/tmp/cosmogony_bench_world_d10/rules")
t0 = time.time()
cosmo = build_cosmogony("/tmp/cosmogony_bench_world_d10", cfg, with_stats=False)
n_zones = materialized_count(cosmo.zones)
n_edges = materialized_count(cosmo.edges)
print(json.dumps({"num_cpus": num_cpus, "build_s": time.time() - t0,
                  "zones": n_zones, "edges": n_edges}))
ray.shutdown()
"""


def ceiling() -> float:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/host_ceiling_probe.py")],
        capture_output=True, text=True, timeout=600,
    )
    walls = {}
    for line in out.stdout.splitlines():
        m = re.match(r"procs=(\d+) tasks=\d+ wall=([\d.]+)s", line)
        if m:
            walls[int(m.group(1))] = float(m.group(2))
    return round(walls[8] / walls[32], 3)


def build_leg(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _BUILD_LEG, str(cpus)],
        capture_output=True, text=True, timeout=1800,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(f"build leg @{cpus} failed (rc={out.returncode}):\n{out.stderr[-4000:]}")
    return json.loads(lines[-1])


def geotag_pair(repl: int) -> dict:
    env = dict(os.environ, BENCH_DOC_REPL=str(repl))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
        capture_output=True, text=True, timeout=3600, env=env, cwd=REPO,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(f"geotag pair failed (rc={out.returncode}):\n{out.stderr[-4000:]}")
    return json.loads(lines[-1])


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaling_r5.json"
    if not os.path.exists("/tmp/cosmogony_bench_world_d10/relations.parquet"):
        sys.path.insert(0, REPO)
        from cosmogony_ray.fixtures.bigworld import write_grid_world

        write_grid_world("/tmp/cosmogony_bench_world_d10", 10)

    ceilings, gpairs, bruns = [], [], []
    for rep in range(reps):
        c = ceiling()
        ceilings.append(c)
        print(f"[rep {rep}] ceiling 8→32 = {c}", flush=True)
        g = geotag_pair(1200)
        gpairs.append(g)
        print(f"[rep {rep}] geotag eff = {g['value']} "
              f"({g['throughput_lo']['spans_geotagged_per_sec']:.0f} → "
              f"{g['throughput_hi']['spans_geotagged_per_sec']:.0f} spans/s)",
              flush=True)
        for cpus in (8, 32):
            b = build_leg(cpus)
            bruns.append(b)
            print(f"[rep {rep}] build @{cpus}: {b['build_s']:.1f}s", flush=True)

    def med(v):
        s = sorted(v)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    g8 = med([g["throughput_lo"]["spans_geotagged_per_sec"] for g in gpairs])
    g32 = med([g["throughput_hi"]["spans_geotagged_per_sec"] for g in gpairs])
    b8 = med([b["build_s"] for b in bruns if b["num_cpus"] == 8])
    b32 = med([b["build_s"] for b in bruns if b["num_cpus"] == 32])
    ceil = med(ceilings)
    summary = {
        "metric": "scaling_efficiency_geotag",
        "value": round(g32 / (4 * g8), 3),
        "unit": "ratio",
        "protocol": (
            f"interleaved 8/32-CPU pairs ×{reps} (geotag 24M spans d7 via "
            "bench.py --scaling BENCH_DOC_REPL=1200; build 349k-zone d10 "
            "fused, fresh subprocess per leg), medians; same-window "
            "mp.Pool ideal-work ceiling per rep"
        ),
        "geotag_eff_runs": sorted(round(g["value"], 3) for g in gpairs),
        "geotag_spans_per_sec_8": round(g8, 1),
        "geotag_spans_per_sec_32": round(g32, 1),
        "geotag_spans_per_sec_32_best": round(
            max(g["throughput_hi"]["spans_geotagged_per_sec"] for g in gpairs), 1
        ),
        "scaling_efficiency_build_349k": round(b8 / (4 * b32), 3),
        "build_sec_8_median": round(b8, 2),
        "build_sec_32_median": round(b32, 2),
        "build_runs": bruns,
        "host_ideal_work_ceiling": ceil,
        "host_ceiling_runs": ceilings,
        "geotag_eff_normalized_to_ceiling": round(g32 / (4 * g8) / ceil, 3),
        "build_eff_normalized_to_ceiling": round(b8 / (4 * b32) / ceil, 3),
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
