"""Sources: OSM-shaped parquet tables (nodes / ways / relations).

The engine's replacement for the reference's PBF reader + dependency closure
(/root/reference/src/lib.rs:243-249): input arrives pre-split as three
columnar tables (FIXTURES.md §1); the closure is realized as the inner hash
joins in stages.zone_build."""

from __future__ import annotations

import os

import ray.data as rd


def read_osm_tables(dir_path: str) -> tuple[rd.Dataset, rd.Dataset, rd.Dataset]:
    """(relations, ways, nodes) Datasets from ``<dir>/{relations,ways,nodes}.parquet``."""
    relations = rd.read_parquet(os.path.join(dir_path, "relations.parquet"))
    ways = rd.read_parquet(os.path.join(dir_path, "ways.parquet"))
    nodes = rd.read_parquet(os.path.join(dir_path, "nodes.parquet"))
    return relations, ways, nodes
