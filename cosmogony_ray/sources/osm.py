"""Sources: OSM-shaped parquet tables (nodes / ways / relations).

The engine's replacement for the reference's PBF reader + dependency closure
(/root/reference/src/lib.rs:243-249): input arrives pre-split as three
columnar tables (FIXTURES.md §1); the closure is realized as the inner hash
joins in stages.zone_build."""

from __future__ import annotations

import os

import ray.data as rd


def _read_sized(path: str) -> rd.Dataset:
    """Block count proportional to ROW count (4k rows/block, capped at 128)
    — a tiny table must not explode into dozens of near-empty blocks, but a
    big one must not become ONE block either: every downstream map stage's
    parallelism is bounded by the read's block count (zone construction is
    ~1 ms/row, so a one-block read serializes it). Row count, not file
    bytes: these tables compress so well that a 100k-row file can be
    <2 MiB. Actual splitting is still bounded by parquet row groups."""
    import pyarrow.parquet as pq

    rows = pq.ParquetFile(path).metadata.num_rows
    blocks = max(1, min(128, rows // 4096))
    return rd.read_parquet(path, override_num_blocks=int(blocks))


def read_osm_tables(dir_path: str) -> tuple[rd.Dataset, rd.Dataset, rd.Dataset]:
    """(relations, ways, nodes) Datasets from ``<dir>/{relations,ways,nodes}.parquet``."""
    relations = _read_sized(os.path.join(dir_path, "relations.parquet"))
    ways = _read_sized(os.path.join(dir_path, "ways.parquet"))
    nodes = _read_sized(os.path.join(dir_path, "nodes.parquet"))
    return relations, ways, nodes
