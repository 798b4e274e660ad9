"""Isolated geotag scaling probe: synthetic depth-6 rect index, synthetic
docs, times ONLY the steady-state geotag stage. Usage:
RAY_GRAFT_CPUS=8 N_DOCS=500000 python scripts/geotag_scale_probe.py
"""

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
N_DOCS = int(os.environ.get("N_DOCS", "500000"))
SPANS = int(os.environ.get("SPANS_PER_DOC", "4"))
BATCH = int(os.environ.get("DOC_BATCH", "2048"))
DEPTH = int(os.environ.get("DEPTH", "6"))

import ray

ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
import ray.data as rd
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, "/root/repo")
from cosmogony_ray.config import EngineConfig
from cosmogony_ray.geom.wkb import multipolygon_to_wkb
from cosmogony_ray.stages.geotag import ZoneIndexData, geotag_docs


def rect(a, b, c, d):
    return np.array([[a, b], [c, b], [c, d], [a, d], [a, b]], float)


def build_synth_index(cfg: EngineConfig, depth: int = DEPTH) -> ZoneIndexData:
    idx = ZoneIndexData(cfg)
    ranks, areas, clons, clats, admins = [], [], [], [], []
    tmp = {}
    for d in range(depth):
        n = 2**d
        w = 8.0 / n
        for i in range(n):
            for j in range(n):
                bbox = (i * w, j * w, (i + 1) * w, (j + 1) * w)
                idx.ids.append(f"relation:{len(idx.ids)}")
                ranks.append(depth - d)
                areas.append(w * w)
                admins.append(True)
                clons.append(bbox[0] + w / 2)
                clats.append(bbox[1] + w / 2)
                idx.wkb.append(multipolygon_to_wkb([[rect(*bbox)]]))
                res = idx.cells.cover_res_for_bbox(bbox)
                for c in idx.cells.cover_bbox(bbox, res):
                    tmp.setdefault(int(c), []).append(len(idx.ids) - 1)
    idx.rank = np.array(ranks, dtype=np.int16)
    idx.area = np.array(areas)
    idx.clon = np.array(clons)
    idx.clat = np.array(clats)
    idx.admin = np.array(admins)
    idx.cell_map = {c: np.array(v, dtype=np.int32) for c, v in tmp.items()}
    order = sorted(range(len(idx.ids)), key=lambda i: idx.ids[i])
    idx.id_rank = np.empty(len(idx.ids), dtype=np.int64)
    for r, i in enumerate(order):
        idx.id_rank[i] = r
    ok = np.nonzero(idx.admin & np.isfinite(idx.clon))[0]
    o2 = sorted(ok, key=lambda i: idx.ids[i])
    idx.knn_idx = np.array(o2, dtype=np.int64)
    idx.knn_lon = idx.clon[idx.knn_idx]
    idx.knn_lat = idx.clat[idx.knn_idx]
    idx._build_knn_grid()
    idx._build_flat_edges()
    return idx


span_t = pa.struct(
    [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
)


def mk(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy(zero_copy_only=False)
    rng = np.random.RandomState(int(ids[0]) % 2**31)
    spans = []
    for i in ids:
        row = []
        for j in range(SPANS):
            lon = float(rng.uniform(0, 9))
            lat = float(rng.uniform(0, 8))
            row.append({"kind": "text", "text": f"s @{lon!r},{lat!r}", "media_ref": "", "offset": j})
        spans.append(row)
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in ids]),
            "spans": pa.array(spans, type=pa.list_(span_t)),
        }
    )


cfg = EngineConfig(geotag_concurrency=max(2, NCPU - 2), doc_batch_size=BATCH)
idx_ref = ray.put(build_synth_index(cfg))
docs = rd.range(N_DOCS).map_batches(mk, batch_format="pyarrow").repartition(NCPU * 4).materialize()

import pyarrow.compute as pc


def count_spans(ds):
    return ds.map_batches(
        lambda t: pa.table({"n": [int(pc.sum(pc.list_value_length(t["tiles"])).as_py() or 0)]}),
        batch_format="pyarrow",
    ).sum("n")


# warmup full pass; timed section is the geotag stage alone (materialize)
# — a pipelined count stage behind the actor pool steals CPU slots from the
# actors and halves apparent throughput (measured 2x at 8 CPUs)
geotag_docs(docs, idx_ref, cfg).materialize()
t0 = time.time()
m = geotag_docs(docs, idx_ref, cfg).materialize()
el = time.time() - t0
n = count_spans(m)
print(
    json.dumps(
        {"num_cpus": NCPU, "spans": n, "sec": round(el, 2), "spans_per_sec": round(n / el)}
    )
)
ray.shutdown()
