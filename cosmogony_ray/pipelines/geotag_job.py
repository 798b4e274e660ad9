"""Resumable geotag job: per-partition checkpointing with lineage + metrics.

The north_rule requires the doc pipeline to be "resumable from checkpoint
with per-partition lineage + metrics — a killed ray job resumes without
recomputing completed cell ranges". Implementation (ray_guide "Sources &
sinks" layout):

- the input is sharded deterministically: one shard per (file, row-group
  range) with ~``target_rows_per_shard`` rows;
- each shard is geotagged independently and written to
  ``out/part-NNNNN/`` ATOMICALLY (write to ``out/.tmp-part-NNNNN``, fsync,
  rename), then a manifest ``out/manifest/part-NNNNN.json`` records the
  lineage hash (input path + row-group range + config fingerprint), row/span
  counts, and wall time;
- on restart, shards whose manifest exists with a MATCHING lineage hash are
  skipped; mismatched manifests (input or config changed) are recomputed.

Shards are processed through the normal streaming Dataset pipeline; the
shard loop only bounds the unit of recovery, not the parallelism inside it.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass

import pyarrow.parquet as pq

import ray.data as rd

from ..config import EngineConfig
from ..stages.geotag import geotag_docs


@dataclass
class Shard:
    index: int
    path: str
    rg_start: int
    rg_end: int  # exclusive
    rows: int

    def lineage(self, config_fp: str) -> str:
        key = f"{os.path.abspath(self.path)}|{self.rg_start}-{self.rg_end}|{self.rows}|{config_fp}"
        return hashlib.md5(key.encode()).hexdigest()


def plan_shards(paths: list[str], target_rows_per_shard: int) -> list[Shard]:
    shards: list[Shard] = []
    for path in sorted(paths):
        meta = pq.ParquetFile(path)
        n_rg = meta.num_row_groups
        i = 0
        while i < n_rg:
            rows = 0
            j = i
            while j < n_rg and (rows == 0 or rows < target_rows_per_shard):
                rows += meta.metadata.row_group(j).num_rows
                j += 1
            shards.append(Shard(len(shards), path, i, j, rows))
            i = j
    return shards


def _config_fingerprint(cfg: EngineConfig) -> str:
    key = f"{cfg.min_res}|{cfg.max_res}|{cfg.max_cells_per_zone}|{cfg.doc_batch_size}"
    return hashlib.md5(key.encode()).hexdigest()[:12]


def run_geotag_job(
    doc_paths: list[str],
    index_ref,
    out_dir: str,
    cfg: EngineConfig,
    target_rows_per_shard: int = 500_000,
    max_shards: int | None = None,
) -> dict:
    """Returns job metrics; skips shards already completed with matching
    lineage. ``max_shards`` bounds work for kill/resume testing."""
    os.makedirs(out_dir, exist_ok=True)
    manifest_dir = os.path.join(out_dir, "manifest")
    os.makedirs(manifest_dir, exist_ok=True)
    config_fp = _config_fingerprint(cfg)
    shards = plan_shards(doc_paths, target_rows_per_shard)
    done = skipped = 0
    t_job = time.time()
    for shard in shards:
        if max_shards is not None and done >= max_shards:
            break
        mpath = os.path.join(manifest_dir, f"part-{shard.index:05d}.json")
        lineage = shard.lineage(config_fp)
        if os.path.exists(mpath):
            with open(mpath) as f:
                m = json.load(f)
            if m.get("lineage") == lineage:
                skipped += 1
                continue  # completed in a previous run
        part_dir = os.path.join(out_dir, f"part-{shard.index:05d}")
        tmp_dir = os.path.join(out_dir, f".tmp-part-{shard.index:05d}")
        for d in (part_dir, tmp_dir):
            if os.path.exists(d):
                shutil.rmtree(d)
        t0 = time.time()
        pf = pq.ParquetFile(shard.path)
        table = pf.read_row_groups(list(range(shard.rg_start, shard.rg_end)))
        ds = rd.from_arrow(table)
        tagged = geotag_docs(ds, index_ref, cfg)
        tagged.write_parquet(tmp_dir)
        os.rename(tmp_dir, part_dir)
        dur = time.time() - t0
        with open(mpath + ".tmp", "w") as f:
            json.dump(
                {
                    "lineage": lineage,
                    "input": shard.path,
                    "row_groups": [shard.rg_start, shard.rg_end],
                    "rows": shard.rows,
                    "seconds": round(dur, 3),
                },
                f,
            )
        os.rename(mpath + ".tmp", mpath)
        done += 1
    return {
        "shards_total": len(shards),
        "shards_done": done,
        "shards_skipped": skipped,
        "seconds": round(time.time() - t_job, 3),
        "out_dir": out_dir,
    }
