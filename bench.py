"""Benchmark harness.

Headline pipelines (BASELINE.md targets: zones geotagged/sec +
hierarchy-join rows/sec):

- ``cosmogony_build``: full zone pipeline (assembly → inclusion cell join →
  typing → hierarchy → labels) on a depth-6 quadtree world (1,365 zones,
  ~6.4k inclusion edges; BENCH_WORLD_DEPTH up to 8 = 21,845 zones).
- ``geotag_docs``: span geotagging of interleaved docs (4 spans/doc) derived
  from ``$GRAFT_SF_DIR/documents.parquet`` against the built zone index.
- ``q1_pricing_summary`` / ``q3_top_orders``: relational pipelines on the
  TPC-H-ish tables.

Prints ONE JSON line:
{"metric": "e2e_sec", "value": N, "unit": "sec", "queries": {...},
 "sf": ..., "num_cpus": N, "throughput": {...}}

``--scaling``: runs the whole bench in two fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same input and reports both plus
efficiency = T8/(4*T32)... see BASELINE.md (sandbox substitute for N vs 4N
nodes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
WORLD_DEPTH = int(os.environ.get("BENCH_WORLD_DEPTH", "6"))
SPANS_PER_DOC = 4
# input docs are replicated so the geotag stage is compute-dominated (the
# scaling-efficiency criterion needs work >> fixed overheads); the SAME
# replicated input is used at every parallelism level
DOC_REPLICATION = int(os.environ.get("BENCH_DOC_REPL", "100"))


def run_bench() -> dict:
    import numpy as np
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            object_store_memory=50 * 1024**3,
        )
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    # Ray's streaming executor logs a warning per empty block ("RefBundle
    # with a different schema ... new schema: .") and one per unhashable
    # input schema ("Failed to hash the schemas"). Both are Ray-internal
    # false alarms: the latter fires on a BARE read_parquet of the
    # driver-generated testdata because those files carry b'pandas' schema
    # metadata, which makes pa.Schema.__hash__ raise inside Ray's
    # unify_schemas fast path — proven by scripts/schema_hash_warning_repro.py
    # with zero engine code involved. Filtered for log hygiene only.
    import logging

    class _NoiseFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not (
                "RefBundle with a different schema" in msg
                or "Failed to hash the schemas" in msg
            )

    for name in ("ray.data", "ray.data._internal.execution.streaming_executor_state"):
        logging.getLogger(name).addFilter(_NoiseFilter())

    from cosmogony_ray.config import EngineConfig
    from cosmogony_ray.fixtures.bigworld import write_grid_world
    from cosmogony_ray.functions.geocode import doc_points
    from cosmogony_ray.pipelines.cosmogony import build_cosmogony
    from cosmogony_ray.stages.geotag import build_zone_index, geotag_docs

    world_dir = f"/tmp/cosmogony_bench_world_d{WORLD_DEPTH}"
    if not os.path.exists(os.path.join(world_dir, "relations.parquet")):
        write_grid_world(world_dir, WORLD_DEPTH)
    pool = max(2, NUM_CPUS - 2)  # leave CPUs for the consuming stage
    cfg = EngineConfig(
        rules_dir=os.path.join(world_dir, "rules"),
        geotag_concurrency=pool,
        doc_batch_size=4096,
    )

    # warm page cache (measure compute+shuffle, not first disk read)
    import pyarrow.parquet as pq

    pq.read_table(os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id"])

    times: dict[str, float] = {}
    meta: dict[str, float] = {}

    from cosmogony_ray.functions.arrowtools import materialized_count

    t0 = time.time()
    cosmo = build_cosmogony(world_dir, cfg, with_stats=False)
    n_zones = materialized_count(cosmo.zones)
    n_edges = materialized_count(cosmo.edges)
    times["cosmogony_build"] = time.time() - t0
    meta["zones"] = n_zones
    meta["inclusion_edges"] = n_edges
    meta["hierarchy_join_rows_per_sec"] = round(n_edges / times["cosmogony_build"], 1)

    # --- geotag: interleaved docs with SPANS_PER_DOC spans each ----------
    span_t = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )

    def mk_docs(batch: pa.Table) -> pa.Table:
        base = batch["doc_id"].to_pylist()
        ids = [d * DOC_REPLICATION + r for d in base for r in range(DOC_REPLICATION)]
        lons, lats = doc_points(ids)
        spans = []
        for i, d in enumerate(ids):
            row = []
            for j in range(SPANS_PER_DOC):
                lon = (lons[i] + 0.37 * j) % 9.0
                lat = (lats[i] + 0.53 * j) % 8.0
                if j % 2 == 0:
                    row.append(
                        {"kind": "text", "text": f"s{j} @{lon!r},{lat!r}", "media_ref": "", "offset": j}
                    )
                else:
                    row.append(
                        {
                            "kind": "image",
                            "text": "",
                            "media_ref": f"media://b/{d}/{j}.jpg?lon={lon!r}&lat={lat!r}",
                            "offset": j,
                        }
                    )
            spans.append(row)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "spans": pa.array(spans, type=pa.list_(span_t)),
            }
        )

    # synthesize + MATERIALIZE the doc table first so the timed section is
    # the geotag stage itself, not input synthesis
    # repartition: actor-pool concurrency is bounded by block count — a
    # handful of fat blocks would cap the pool at a handful of tasks
    docs = (
        rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id"])
        .repartition(NUM_CPUS * 2)  # parallelize the synthesis itself
        .map_batches(mk_docs, batch_format="pyarrow", batch_size=256)
        .repartition(NUM_CPUS * 4)
        .materialize()
    )

    idx_ref = build_zone_index(cosmo.zones, cfg, pack_ref=cosmo.geom_pack_ref)
    # warm the FULL actor pool untimed: enough leading blocks to give every
    # actor at least one task (blocks = NUM_CPUS*4, pool = NUM_CPUS-2).
    # n_docs is arithmetic (synthesis is deterministic): count() spins an
    # executor that intermittently stalls on this host.
    import pyarrow.parquet as _pq

    base_rows = _pq.ParquetFile(
        os.path.join(SF_DIR, "documents.parquet")
    ).metadata.num_rows
    n_docs = base_rows * DOC_REPLICATION
    warm_rows = int(n_docs * (pool + 2) * 1.5 / (NUM_CPUS * 4))
    geotag_docs(docs.limit(max(warm_rows, 10_000)), idx_ref, cfg).count()
    # timed section = the geotag stage alone (materialize). Piping a count
    # stage behind the actor pool inside the timed section steals CPU slots
    # from the actors (streaming executor shares the CPU budget) — measured
    # ~2x apparent-throughput loss at 8 CPUs, and the r2 32-CPU "regression"
    # was exactly this: the consumer stage contending with a full-width pool.
    t0 = time.time()
    tagged = geotag_docs(docs, idx_ref, cfg).materialize()
    times["geotag_docs"] = time.time() - t0
    import pyarrow.compute as _pc

    n_spans = tagged.map_batches(
        lambda t: pa.table(
            {"n": [int(_pc.sum(_pc.list_value_length(t["tiles"])).as_py() or 0)]}
        ),
        batch_format="pyarrow",
    ).sum("n")
    meta["spans_geotagged"] = n_spans
    meta["spans_geotagged_per_sec"] = round(n_spans / times["geotag_docs"], 1)

    # --- relational ------------------------------------------------------
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entry

    for q in ["q1_pricing_summary", "q3_top_orders"]:
        t0 = time.time()
        res = entry.queries()[q](SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        times[q] = time.time() - t0

    total = sum(times.values())
    return {
        "metric": "e2e_sec",
        "value": round(total, 2),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in times.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "throughput": meta,
    }


def run_scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    factor = hi / lo
    eff_e2e = (r_lo["value"] / r_hi["value"]) / factor
    # the authoritative metric (BASELINE.md) is throughput of the two
    # headline pipelines: spans geotagged/sec and hierarchy-join rows/sec
    g_lo = r_lo["throughput"]["spans_geotagged_per_sec"]
    g_hi = r_hi["throughput"]["spans_geotagged_per_sec"]
    h_lo = r_lo["throughput"]["hierarchy_join_rows_per_sec"]
    h_hi = r_hi["throughput"]["hierarchy_join_rows_per_sec"]
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_geotag",
                "value": round(g_hi / (factor * g_lo), 3),
                "unit": "ratio",
                "scaling_efficiency_hierarchy": round(h_hi / (factor * h_lo), 3),
                "scaling_efficiency_e2e": round(eff_e2e, 3),
                f"sec_{lo}": r_lo["value"],
                f"sec_{hi}": r_hi["value"],
                f"queries_{lo}": r_lo["queries"],
                f"queries_{hi}": r_hi["queries"],
                "throughput_lo": r_lo["throughput"],
                "throughput_hi": r_hi["throughput"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        result = run_bench()
        print(json.dumps(result))
        import ray

        ray.shutdown()
