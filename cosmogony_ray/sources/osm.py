"""Sources: OSM-shaped parquet tables (nodes / ways / relations).

The engine's replacement for the reference's PBF reader + dependency closure
(/root/reference/src/lib.rs:243-249): input arrives pre-split as three
columnar tables (FIXTURES.md §1); the closure is realized as the inner hash
joins in stages.zone_build."""

from __future__ import annotations

import os

import ray.data as rd


def _read_sized(path: str) -> rd.Dataset:
    """Block count proportional to bytes (16 MiB/block, capped) — a tiny
    table must not explode into dozens of near-empty blocks whose per-task
    overhead then dominates every downstream shuffle."""
    size = os.path.getsize(path)
    blocks = max(1, min(64, size // (16 << 20)))
    return rd.read_parquet(path, override_num_blocks=int(blocks))


def read_osm_tables(dir_path: str) -> tuple[rd.Dataset, rd.Dataset, rd.Dataset]:
    """(relations, ways, nodes) Datasets from ``<dir>/{relations,ways,nodes}.parquet``."""
    relations = _read_sized(os.path.join(dir_path, "relations.parquet"))
    ways = _read_sized(os.path.join(dir_path, "ways.parquet"))
    nodes = _read_sized(os.path.join(dir_path, "nodes.parquet"))
    return relations, ways, nodes
